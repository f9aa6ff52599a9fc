package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `sq_dist(a, b)` over ARRAY<FLOAT> — squared L2 distance as a native
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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq_dist expects two ARRAY<FLOAT>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val d = xs.getFloat(i).toDouble - ys.getFloat(i).toDouble
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
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
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
