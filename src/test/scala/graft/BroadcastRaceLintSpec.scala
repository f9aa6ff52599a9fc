package graft

import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Fleet-wide broadcast-over-lazy-cache lint (r12): Spark submits
  * broadcast-exchange jobs CONCURRENTLY, so two broadcast subtrees
  * scanning the same not-yet-materialized cached frame race to compute
  * it — each runs the frame's whole pipeline, and the cost is invisible
  * to every correctness check (q_ccnet_buckets paid 3× its tf⋈vocab
  * fold, q_basket up to 4× its order-grain collect_set, both for
  * rounds, both found only by profiling). The precondition is
  * mechanical: ≥ 2 BroadcastExchangeExec nodes over one InMemoryRelation
  * in a cold plan. This sweep walks every bench shape and fails on any
  * such pair — the fix is an EAGER materialization (localCheckpoint, or
  * an up-front count the operator needs anyway) before the consumers
  * plan, never a lazy persist.
  *
  * Plans are built at sf0.001 (analysis only for most queries; eager
  * constructors hit their content-keyed caches). The pre-AQE sparkPlan
  * is inspected — broadcast placement is decided there, and AQE's
  * re-planning only ever converts MORE joins to broadcast. */
class BroadcastRaceLintSpec extends SparkSpec {

  /** Max DISTINCT broadcast-exchange count over any single cached frame
    * in a fully-prepared physical plan — ≥ 2 is the race precondition.
    * Two subtleties the first draft got wrong:
    *  - the exchanges only exist after EnsureRequirements, so the plan
    *    must be the EXECUTED plan (built with AQE off — statically, AQE
    *    reuses stages by the same canonicalization at runtime);
    *  - identical builds collapse via ReuseExchange into ONE exchange
    *    plus ReusedExchange references — those cannot race, so only
    *    distinct live BroadcastExchangeExec nodes count. */
  private def racyBroadcasts(df: org.apache.spark.sql.DataFrame): Int = {
    val prevAqe = df.sparkSession.conf.get("spark.sql.adaptive.enabled")
    try {
      df.sparkSession.conf.set("spark.sql.adaptive.enabled", "false")
      val perBroadcast = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          b.collect { case s: InMemoryTableScanExec => s.relation.cacheBuilder }.distinct
      }
      val counts = perBroadcast.flatten.groupBy(identity).view.mapValues(_.size)
      if (counts.isEmpty) 0 else counts.values.max
    } finally df.sparkSession.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("positive control: the detector fires on a reconstructed q_basket-shaped race") {
    import org.apache.spark.sql.functions._
    val sess = spark
    import sess.implicits._
    val cached = (1 to 100).map(i => (i % 7, i.toLong)).toDF("k", "v").persist()
    try {
      val agg1 = cached.groupBy("k").agg(sum("v").as("s1"))
      val agg2 = cached.groupBy("k").agg(max("v").as("m2"))
      val racy = cached
        .join(broadcast(agg1), "k")
        .join(broadcast(agg2), "k")
      assert(racyBroadcasts(racy) >= 2,
        "two broadcast builds over one lazy cache must be detected:\n" +
          racy.queryExecution.sparkPlan)
    } finally cached.unpersist()
  }

  test("no query plans two broadcast exchanges over the same cached frame") {
    val offenders = Seq.newBuilder[String]
    SparkEntry.benchShapes.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = racyBroadcasts(fn(spark, sf))
      if (n >= 2)
        offenders += s"$name: $n broadcast exchanges scan one cached frame " +
          "— concurrent broadcast jobs will race to materialize it; " +
          "replace the lazy persist with an eager localCheckpoint " +
          "(the q_ccnet_buckets/q_basket fix)"
      spark.catalog.clearCache()
    }
    assert(offenders.result().isEmpty, offenders.result().mkString("\n"))
  }
}
