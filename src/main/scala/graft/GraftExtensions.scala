package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BitmapAndCount, BitmapFromBits, CondEntropySum, CosineSimilarity, DecaySum, Iou, JaroWinkler, MinHashSig, PlogpSum, SimHash16, SortedTermSum, SqDistance, TokenCode, WalshBandKeys}
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
    // 100 TB guardrail #2 (r12 verdict task #7): reject plans that build
    // ≥ 2 distinct broadcast exchanges over one lazy cached frame — the
    // correctness-invisible materialization race the r12 profiling pass
    // found five times (plans/BroadcastRaceGuard.scala). Query-stage-prep
    // scope: runs on the whole initial physical plan under AQE.
    e.injectQueryStagePrepRule(spark => graft.plans.BroadcastRaceGuard(spark))
  }
}

object GraftExtensions {
  /** Arity-checked builder: a wrong-argument-count SQL call must surface
    * Spark's standard invalid-arity analysis error, not an opaque
    * IndexOutOfBoundsException from `exprs(1)` inside resolution. */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> n.toString,
            "actualNum" -> exprs.length.toString, "docroot" -> ""))
      build(exprs)
    }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> arity("cosine_sim", 2)(exprs => CosineSimilarity(exprs(0), exprs(1))),
    "sq_dist" -> arity("sq_dist", 2)(exprs => SqDistance(exprs(0), exprs(1))),
    "iou" -> arity("iou", 2)(exprs => Iou(exprs(0), exprs(1))),
    "token_code" -> arity("token_code", 1)(exprs => TokenCode(exprs(0))),
    "minhash_sig" -> arity("minhash_sig", 1)(exprs =>
      MinHashSig(exprs(0), TextOps.MinhashParams.map(_._2),
        TextOps.MinhashParams.map(_._3), TextOps.MinhashPrime)),
    "simhash16" -> arity("simhash16", 1)(exprs =>
      SimHash16(exprs(0), TextOps.MinhashParams.map(_._2),
        TextOps.MinhashParams.map(_._3), TextOps.MinhashPrime)),
    "walsh_band_keys" -> arity("walsh_band_keys", 1)(exprs =>
      WalshBandKeys(exprs(0), VectorOps.MultibandPlanes)),
    "bitmap_from_bits" -> arity("bitmap_from_bits", 1)(exprs => BitmapFromBits(exprs(0))),
    "bitmap_and_count" -> arity("bitmap_and_count", 2)(exprs => BitmapAndCount(exprs(0), exprs(1))),
    "jaro_winkler" -> arity("jaro_winkler", 2)(exprs => JaroWinkler(exprs(0), exprs(1))),
    // the order-pinned fold kernels (functions/SortedFolds.scala); the
    // negated lm_score fold is Column-API-only (SortedFolds.sortedTermSumNeg)
    "sorted_term_sum" -> arity("sorted_term_sum", 1)(exprs =>
      SortedTermSum(exprs(0), negate = false)),
    "plogp_sum" -> arity("plogp_sum", 2)(exprs => PlogpSum(exprs(0), exprs(1))),
    "cond_entropy_sum" -> arity("cond_entropy_sum", 2)(exprs =>
      CondEntropySum(exprs(0), exprs(1))),
    "decay_sum" -> arity("decay_sum", 2)(exprs => DecaySum(exprs(0), exprs(1))))

  /** Late registration on an existing session: functions + the planner
    * strategy for graft's custom logical operators.
    *
    * The whole method is synchronized on this object (r11 concurrency
    * audit): `extraStrategies` is a bare session var, and the
    * check-then-append below is a read-modify-write — two concurrent
    * registrations (register runs on EVERY greedyExecQuery call) could
    * both pass the !contains check and install the strategy twice, or
    * overwrite a strategy another library appended in the same window.
    * A JVM-wide lock is the right scope for the common one-session case;
    * cross-library races on the same var remain the caller's to
    * serialize (Spark offers no atomic append there). */
  def register(spark: SparkSession): Unit = synchronized {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.GreedyNmsStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.GreedyNmsStrategy
  }
}
