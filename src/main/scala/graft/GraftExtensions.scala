package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSimilarity, Iou}

/** SQL-surface registration for the engine's custom Catalyst expressions
  * (SURVEY §7.1 SQL-first testability): `cosine_sim(arr, arr)` and
  * `iou(box, box)` become callable from `spark.sql`.
  *
  * Two registration paths:
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build
  *     (cluster-wide, the production path);
  *   - `GraftExtensions.register(spark)` on a live session (tests, REPL).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("iou"),
      new ExpressionInfo(classOf[Iou].getName, "iou"),
      exprs => Iou(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  /** Late registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "iou", exprs => Iou(exprs(0), exprs(1)), "built-in")
  }
}
