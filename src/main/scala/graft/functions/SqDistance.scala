package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `sq_dist(a, b)` over ARRAY<FLOAT> / ARRAY<DOUBLE> lanes — squared L2
  * distance as a native
  * Catalyst expression with whole-stage codegen (the [[CosineSimilarity]]
  * promotion applied to the clustering hot path: Spark's higher-order
  * functions evaluate lambdas interpreted, one closure call per element,
  * and the k×N assignment sweep in VectorOps.seedAssign paid ~0.25 s of
  * that interpreter overhead per run at sf0.1).
  *
  * Semantics are EXACTLY the HOF formulation it replaces
  * (`aggregate(zip_with(a, b, (x,y) => (x−y)²), 0.0, _+_)`) and the
  * DuckDB oracle mirror `list_sum(list_transform(...))`: float→double
  * casts per element, one left-to-right accumulation — bit-identical
  * doubles, so swapping it under the oracle-checked q_kmeans_assign /
  * q_semdedup / q_outlier_embed is safe (ExpressionsSpec pins the
  * equivalence on fixture data).
  *
  * Mismatched lengths → null, mirroring the HOF twin: zip_with null-pads
  * the shorter lane, the lambda then yields null, and the aggregate sum
  * absorbs it to null. Element NULLS → null for the same reason — the
  * engine's embedding columns are containsNull=false so this never fires
  * on the hot path, but the expression is registered on the public SQL
  * surface (`sq_dist`), where a caller can pass a nullable array and
  * ArrayData.getFloat would otherwise silently read the null slot as
  * 0.0f — a wrong NUMBER instead of a missing one.
  *
  * Reference analog: the YOLO/CLIP embedding-distance comparisons the
  * surveillance pipeline runs per frame (`main.py:74-79`).
  */
case class SqDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // Each lane may be ARRAY<FLOAT> or ARRAY<DOUBLE> (r16: the
  // deterministic IVF quantizer assigns in NORMALIZED double space, so
  // the clustering hot path feeds double arrays; float lanes keep the
  // original float→double cast per element — the same arithmetic the
  // DuckDB mirror's CAST(x AS DOUBLE) performs on either input type).
  private def laneIsFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq_dist expects ARRAY<FLOAT> or ARRAY<DOUBLE> lanes, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val lf = laneIsFloat(left.dataType)
    val rf = laneIsFloat(right.dataType)
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def get(arr: String, idx: String, isFloat: Boolean): String =
        if (isFloat) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ${get(a, i, laneIsFloat(left.dataType))} - ${get(b, i, laneIsFloat(right.dataType))};
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqDistance {
  /** Column-API surface. */
  def sqDist(a: Column, b: Column): Column =
    GraftBridge.column(SqDistance(GraftBridge.expression(a), GraftBridge.expression(b)))
}
