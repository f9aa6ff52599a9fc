package graft

import org.apache.spark.sql.Row

/** Degenerate-input sweeps: every registered query runs against (a)
  * ZERO-ROW and (b) SINGLE-ROW copies of the fixture tables. At 100 TB
  * both are routine — a date filter matching nothing, a fresh partition,
  * a one-document crawl delta — and an operator that throws turns a
  * no-op into a pipeline page. Contract: a query either returns rows
  * (global aggregates legitimately emit an all-null/zero row) or returns
  * empty — it must not throw.
  *
  * First run of this sweep (r11) caught six real defects, all fixed:
  * Spark's `stat.bloomFilter` NPEs on an empty build frame (q_bloom_join
  * guarded by its existing sizing count; q_contamination by a sentinel
  * build row), pageRank divided the teleport term by a zero node count,
  * q_rfm interpolated NaN quintile boundaries into percentile_approx SQL
  * text where NaN parses as an unresolvable identifier, and the IVF/PQ
  * fits returned fewer centroids than K on tiny corpora, turning every
  * downstream centers(i) lookup into an opaque AIOOBE (now a named
  * fit-time require).
  *
  * Exception, pinned separately below: model-FIT operators require
  * enough training data — fitting an index or classifier on nothing is a
  * caller error that must fail LOUDLY, not return a degenerate model. */
class EmptyInputSweep extends SparkSpec {

  /** Queries whose contract is to THROW when the corpus cannot train
    * their model: IVF/PQ need ≥ K vectors for their codebooks (named
    * require at fit), MlScoring's logistic regression needs a non-empty
    * frame. On ONE row ml_risk trains (a 1-point fit is degenerate but
    * valid); the index fits still lack K distinct points. */
  private val fitRequiredEmpty = Set("q_ivf_topk", "q_pq_topk", "q_ml_risk")
  private val fitRequiredOneRow = Set("q_ivf_topk", "q_pq_topk")

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
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

  private lazy val oneRowDir: String = {
    // limit(1) of a single-file scan; WHICH row is unpinned and
    // irrelevant — the sweep asserts only that nothing throws
    val dir = java.nio.file.Files.createTempDirectory("graft-onerow").toString
    for (t <- tables)
      spark.read.parquet(s"$sf/$t.parquet")
        .limit(1).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  private def sweep(label: String, dirOf: () => String, fitRequired: Set[String]): Unit =
    SparkEntry.queries.foreach { case (name, fn) =>
      if (fitRequired(name))
        test(s"$name fails loudly on $label input (model-fit contract)") {
          try intercept[Throwable] { fn(spark, dirOf()).count() }
          finally spark.catalog.clearCache()
        }
      else
        test(s"$name tolerates $label input") {
          try fn(spark, dirOf()).count() // any count is fine; throwing is not
          finally spark.catalog.clearCache()
        }
    }

  sweep("empty", () => emptyDir, fitRequiredEmpty)
  sweep("single-row", () => oneRowDir, fitRequiredOneRow)
}
