package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StructType}

/** `iou(box_a, box_b)` over STRUCT<x:INT, y:INT, w:INT, h:INT> — the one
  * genuinely custom scalar of the reference's analytics (SURVEY §4 custom
  * piece #1; `cv2.dnn.NMSBoxes`'s overlap predicate, `main.py:125,
  * 222-223`), as a codegen'd Catalyst expression so the E-JOIN-THETA
  * dominance join and any SQL caller stay inside whole-stage codegen.
  *
  * Integer intersection/union arithmetic in long, one double division at
  * the end — exactly graft.operators.Nms.iou and the DuckDB oracle
  * formulation (greatest/least on ints, then CAST ... AS DOUBLE division).
  */
case class Iou(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case s: StructType => s.length == 4 && s.forall(_.dataType == IntegerType)
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iou expects two STRUCT<x INT, y INT, w INT, h INT>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  /** A null FIELD in either box → null (the SqDistance/CosineSimilarity
    * convention): the type check only sees STRUCT<4×INT>, not field
    * nullability, and getInt would silently read a null coordinate as 0 —
    * a wrong overlap number that kills/keeps the wrong boxes instead of
    * a missing one. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val ra = a.asInstanceOf[InternalRow]
    val rb = b.asInstanceOf[InternalRow]
    var j = 0
    while (j < 4) {
      if (ra.isNullAt(j) || rb.isNullAt(j)) return null
      j += 1
    }
    graft.operators.Nms.iou(
      ra.getInt(0), ra.getInt(1), ra.getInt(2), ra.getInt(3),
      rb.getInt(0), rb.getInt(1), rb.getInt(2), rb.getInt(3))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ix = ctx.freshName("ix"); val iy = ctx.freshName("iy")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
      val anyNull = ctx.freshName("anyNull")
      // NEVER start a generated line with '|': Spark's codegen Block
      // re-applies stripMargin, so a leading "||" loses a pipe and the
      // emitted Java fails to parse — Janino then silently drops the
      // WHOLE predicate to interpreted mode (a 4.4x q_nms_dominance
      // regression the r11 fleet bench caught; operators go at line END)
      s"""
         |boolean $anyNull = $a.isNullAt(0) || $a.isNullAt(1) || $a.isNullAt(2) || $a.isNullAt(3) ||
         |  $b.isNullAt(0) || $b.isNullAt(1) || $b.isNullAt(2) || $b.isNullAt(3);
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $ix = java.lang.Math.max(0, java.lang.Math.min($a.getInt(0) + $a.getInt(2), $b.getInt(0) + $b.getInt(2)) - java.lang.Math.max($a.getInt(0), $b.getInt(0)));
         |  int $iy = java.lang.Math.max(0, java.lang.Math.min($a.getInt(1) + $a.getInt(3), $b.getInt(1) + $b.getInt(3)) - java.lang.Math.max($a.getInt(1), $b.getInt(1)));
         |  long $inter = (long) $ix * (long) $iy;
         |  long $union = (long) $a.getInt(2) * (long) $a.getInt(3) + (long) $b.getInt(2) * (long) $b.getInt(3) - $inter;
         |  ${ev.value} = ($union <= 0L) ? 0.0 : (double) $inter / (double) $union;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Iou {
  /** Column-API surface over struct columns. */
  def iou(a: Column, b: Column): Column =
    GraftBridge.column(Iou(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Convenience: build the box struct from four int columns. */
  def box(x: Column, y: Column, w: Column, h: Column): Column = struct(x, y, w, h)
}
