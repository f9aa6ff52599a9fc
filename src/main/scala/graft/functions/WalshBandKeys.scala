package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** `walsh_band_keys(embedding)` — all LSH band keys of a vector in ONE
  * pass over the array, as a codegen'd expression.
  *
  * `hyperplanes(b)(r)` is the Walsh index of bit r in band b: component i
  * of hyperplane j has sign (-1)^popcount(i AND j). Key of band b =
  * Σ_r (dot_{b,r} > 0) << r.
  *
  * Bit-identical to the HOF formulation it replaces
  * (per-hyperplane `aggregate(transform(e, x·sign))`): each dot is
  * accumulated over i ascending exactly as the per-hyperplane left fold
  * does, so the doubles — and therefore the sign bits and keys — match
  * bit-for-bit (ExpressionsSpec asserts this). The HOF version evaluates
  * 2 interpreted lambdas × hyperplanes per row (48 closure calls/row for
  * the 24-plane multiband config); this is one generated loop nest.
  */
case class WalshBandKeys(child: Expression, hyperplanes: Seq[Seq[Int]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private val flatPlanes: Array[Int] = hyperplanes.flatten.toArray
  private val bandOffsets: Array[Int] = hyperplanes.scanLeft(0)(_ + _.size).init.toArray
  private val bandBits: Array[Int] = hyperplanes.map(_.size).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"walsh_band_keys expects ARRAY<FLOAT>, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val nH = flatPlanes.length
    val dots = new Array[Double](nH)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // element null → null keys (the MinHashSig convention): getFloat
      // would silently read the slot as 0.0f and flip band bits
      if (arr.isNullAt(i)) return null
      val x = arr.getFloat(i).toDouble
      var h = 0
      while (h < nH) {
        dots(h) += x * (1.0 - 2.0 * (Integer.bitCount(i & flatPlanes(h)) & 1))
        h += 1
      }
      i += 1
    }
    val keys = new Array[Long](bandBits.length)
    var b = 0
    while (b < bandBits.length) {
      var key = 0L
      var r = 0
      while (r < bandBits(b)) {
        if (dots(bandOffsets(b) + r) > 0.0) key |= (1L << r)
        r += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hp = ctx.addMutableState("int[]", "whHp",
      v => s"$v = new int[]{${flatPlanes.mkString(",")}};")
    val off = ctx.addMutableState("int[]", "whOff",
      v => s"$v = new int[]{${bandOffsets.mkString(",")}};")
    val bits = ctx.addMutableState("int[]", "whBits",
      v => s"$v = new int[]{${bandBits.mkString(",")}};")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val dots = ctx.freshName("dots")
      val keys = ctx.freshName("keys")
      val key = ctx.freshName("key")
      s"""
         |int $n = $a.numElements();
         |double[] $dots = new double[${flatPlanes.length}];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = (double) $a.getFloat($i);
         |  for (int $h = 0; $h < ${flatPlanes.length}; $h++) {
         |    $dots[$h] += $x * (1.0 - 2.0 * (java.lang.Integer.bitCount($i & $hp[$h]) & 1));
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long[] $keys = new long[${bandBits.length}];
         |  for (int $b = 0; $b < ${bandBits.length}; $b++) {
         |    long $key = 0L;
         |    for (int $r = 0; $r < $bits[$b]; $r++) {
         |      if ($dots[$off[$b] + $r] > 0.0) $key |= (1L << $r);
         |    }
         |    $keys[$b] = $key;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WalshBandKeys {
  def walshBandKeys(c: Column, hyperplanes: Seq[Seq[Int]]): Column =
    GraftBridge.column(WalshBandKeys(GraftBridge.expression(c), hyperplanes))
}
