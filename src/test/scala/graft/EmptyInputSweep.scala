package graft

import org.apache.spark.sql.Row

/** Empty-input sweep: every registered query runs against ZERO-ROW copies
  * of the fixture tables (exact schemas, written once per suite). At
  * 100 TB an empty input is routine — a date filter matching nothing, a
  * fresh partition, an empty crawl delta — and an operator that throws on
  * it turns a no-op into a pipeline page. Contract: a query either
  * returns rows (global aggregates legitimately emit an all-null/zero
  * row) or returns empty — it must not throw.
  *
  * First run of this sweep (r11) caught four real defects, all fixed:
  * Spark's `stat.bloomFilter` NPEs on an empty build frame (q_bloom_join
  * guarded by its existing sizing count; q_contamination by a sentinel
  * build row), pageRank divided the teleport term by a zero node count,
  * and q_rfm interpolated NaN quintile boundaries into percentile_approx
  * SQL text where NaN parses as an unresolvable identifier.
  *
  * Exception, pinned separately below: model-FIT operators (MLlib
  * k-means / PQ codebooks / logistic regression) require non-empty
  * training data — fitting on nothing is a caller error that must fail
  * LOUDLY, not return a degenerate model. */
class EmptyInputSweep extends SparkSpec {

  /** Queries whose contract is to THROW on an empty corpus: they fit a
    * model (Ivf k-means, Pq codebooks, MlScoring logistic regression)
    * before serving, and a model of nothing is a caller error. */
  private val fitRequired = Set("q_ivf_topk", "q_pq_topk", "q_ml_risk")

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables) {
      // schemas come from the real fixture footers, so the sweep can
      // never drift from what the driver ships (ts unit included: the
      // empty events file keeps a TIMESTAMP annotation Tables.events'
      // footer probe understands)
      val schema = spark.read.parquet(s"$sf/$t.parquet").schema
      spark.createDataFrame(
          spark.sparkContext.parallelize(Seq.empty[Row], 1), schema)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    if (fitRequired(name))
      test(s"$name fails loudly on an empty corpus (model-fit contract)") {
        intercept[Throwable] { fn(spark, emptyDir).count() }
        spark.catalog.clearCache()
      }
    else
      test(s"$name tolerates empty input") {
        fn(spark, emptyDir).count() // any row count is fine; throwing is not
        spark.catalog.clearCache()
      }
  }
}
