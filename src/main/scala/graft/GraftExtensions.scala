package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BitmapAndCount, BitmapFromBits, CosineSimilarity, Iou, JaroWinkler, MinHashSig, SimHash16, TokenCode, WalshBandKeys}
import graft.operators.{TextOps, VectorOps}

/** SQL-surface registration for the engine's custom Catalyst expressions
  * (SURVEY §7.1 SQL-first testability): `cosine_sim(arr, arr)`,
  * `iou(box, box)`, `token_code(str)`, and the sketch family —
  * `minhash_sig(codes)`, `simhash16(codes)`, `walsh_band_keys(embedding)`,
  * bound to the engine's canonical parameters (TextOps.MinhashParams,
  * VectorOps.MultibandPlanes) — become callable from `spark.sql`.
  *
  * Two registration paths:
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build
  *     (cluster-wide, the production path);
  *   - `GraftExtensions.register(spark)` on a live session (tests, REPL).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(builder.getClass.getName, name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.GreedyNmsStrategy)
    // 100 TB guardrail: reject unconditioned fact×fact cartesian joins at
    // analysis time (plans/CartesianGuard.scala). Extensions path only —
    // check rules cannot be late-registered on a live session, so
    // register(spark) below does NOT install it.
    e.injectCheckRule(spark => graft.plans.CartesianGuard(spark))
  }
}

object GraftExtensions {
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "iou" -> (exprs => Iou(exprs(0), exprs(1))),
    "token_code" -> (exprs => TokenCode(exprs(0))),
    "minhash_sig" -> (exprs =>
      MinHashSig(exprs(0), TextOps.MinhashParams.map(_._2),
        TextOps.MinhashParams.map(_._3), TextOps.MinhashPrime)),
    "simhash16" -> (exprs =>
      SimHash16(exprs(0), TextOps.MinhashParams.map(_._2),
        TextOps.MinhashParams.map(_._3), TextOps.MinhashPrime)),
    "walsh_band_keys" -> (exprs =>
      WalshBandKeys(exprs(0), VectorOps.MultibandPlanes)),
    "bitmap_from_bits" -> (exprs => BitmapFromBits(exprs(0))),
    "bitmap_and_count" -> (exprs => BitmapAndCount(exprs(0), exprs(1))),
    "jaro_winkler" -> (exprs => JaroWinkler(exprs(0), exprs(1))))

  /** Late registration on an existing session: functions + the planner
    * strategy for graft's custom logical operators. */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.GreedyNmsStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.GreedyNmsStrategy
  }
}
