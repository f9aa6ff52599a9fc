package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain_long(key)` against a prebuilt Bloom filter — the
  * runtime-filter primitive behind Scale.bloomSemiJoin: a compact sketch of
  * the build-side join keys rides into the probe side's task closures
  * (the filter object is a codegen reference, serialized once per
  * executor), so non-matching fact rows are dropped BEFORE the join
  * shuffle. False positives pass (and are cleared by the exact join
  * downstream); false negatives cannot occur.
  *
  * Same role as Spark's own AQE runtime bloom
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), made explicit and
  * library-controlled for when the build side is known small at authoring
  * time (the reference's dim-table pattern, SURVEY §2.2 P7).
  */
case class MightContainLong(child: Expression, bf: BloomFilter) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"might_contain_long expects BIGINT, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    bf.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.mightContainLong($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MightContainLong {
  def mightContainLong(key: Column, bf: BloomFilter): Column =
    GraftBridge.column(MightContainLong(GraftBridge.expression(key), bf))
}
