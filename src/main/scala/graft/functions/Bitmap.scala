package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `bitmap_from_bits(bits)` — fold an array of non-negative bit positions
  * into a packed bitmap (ARRAY<BIGINT> of 64-bit blocks, little-endian by
  * block: position p sets bit p%64 of block p/64). The bitmap self-sizes
  * to max(bits)/64+1, so no global vocabulary size is needed; consumers
  * treat missing high blocks as zeros (`bitmap_and_count` below).
  *
  * With `bitmap_and_count`, this is the vocabulary-unbounded, fully
  * codegen'd form of the dictionary-bitmap set intersection used by the
  * exact Jaccard path (TextOps.jaccardPairs): the MAP<block, mask> +
  * HOF-aggregate formulation it replaces interpreted 2 lambdas per pair
  * and measured 2.3× slower at sf0.1.
  */
case class BitmapFromBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // containsNull is REJECTED at analysis time: getInt on a null slot
      // would silently read 0 and set bit 0 — a wrong bitmap, not an error.
      // Callers with nullable arrays must filter/coalesce first.
      case ArrayType(IntegerType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(IntegerType, true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "bitmap_from_bits expects ARRAY<INT> with non-nullable elements " +
            "(a null element would silently set bit 0); filter nulls first")
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_from_bits expects ARRAY<INT>, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var max = -1
    var i = 0
    while (i < n) {
      val b = arr.getInt(i)
      if (b < 0)
        throw new IllegalArgumentException(
          s"bitmap_from_bits: bit position must be non-negative, got $b")
      if (b > max) max = b
      i += 1
    }
    val blocks = new Array[Long](max / 64 + 1)
    i = 0
    while (i < n) {
      val b = arr.getInt(i)
      blocks(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
    new GenericArrayData(blocks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val max = ctx.freshName("max")
      val blocks = ctx.freshName("blocks")
      s"""
         |int $n = $a.numElements();
         |int $max = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $b = $a.getInt($i);
         |  if ($b < 0) throw new IllegalArgumentException(
         |    "bitmap_from_bits: bit position must be non-negative, got " + $b);
         |  if ($b > $max) $max = $b;
         |}
         |long[] $blocks = new long[$max / 64 + 1];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $b = $a.getInt($i);
         |  $blocks[$b >>> 6] |= (1L << ($b & 63));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($blocks);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bitmap_and_count(a, b)` — popcount of the intersection of two packed
  * bitmaps (as produced by `bitmap_from_bits`). Bitmaps may have different
  * lengths: blocks beyond either length are zeros, so only the common
  * prefix is scanned. */
case class BitmapAndCount(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // containsNull = false required, mirroring BitmapFromBits: getLong on
    // a null block would silently read 0/garbage into the popcount — the
    // exact silent-wrong-result the sibling rejects at analysis time
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, false) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bitmap_and_count expects two ARRAY<BIGINT> with non-null elements, " +
          s"got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), xb.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(xa.getLong(i) & xb.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Bitmap {
  def bitmapFromBits(bits: Column): Column =
    GraftBridge.column(BitmapFromBits(GraftBridge.expression(bits)))
  def bitmapAndCount(a: Column, b: Column): Column =
    GraftBridge.column(BitmapAndCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}
