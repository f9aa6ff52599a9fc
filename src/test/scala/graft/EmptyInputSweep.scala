package graft

import org.apache.spark.sql.Row

/** Degenerate-input sweeps: every registered query runs against (a)
  * ZERO-ROW, (b) SINGLE-ROW, and (c) NULL-ROW copies of the fixture
  * tables (the declared schemas are all-nullable, so dirty rows are
  * inside the contract). At 100 TB all three are routine — a date filter
  * matching nothing, a one-document crawl delta, a corrupt ingest row —
  * and an operator that throws OPAQUELY turns a no-op into an
  * undiagnosable pipeline page. Contract: a query either handles the
  * input (SQL-form operators follow SQL null semantics) or rejects it
  * with a NAMED error telling the caller what to filter or impute
  * (object-boundary operators: typed NMS, typed top-k aggregators, the
  * NMS plan node — the GreedyNmsPlan discipline).
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
  private val fitRequiredEmpty =
    Set("q_ivf_topk", "q_pq_topk", "q_ml_risk", "q_ivf_delta", "q_lm_delta")
  private val fitRequiredOneRow = Set("q_ivf_topk", "q_pq_topk", "q_ivf_delta")

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

  private lazy val nullRowDir: String = {
    // three real rows plus one row that is null in EVERY column
    val dir = java.nio.file.Files.createTempDirectory("graft-nullrow").toString
    for (t <- tables) {
      val src = spark.read.parquet(s"$sf/$t.parquet")
      val nullRow = Row.fromSeq(src.schema.map(_ => null))
      src.limit(3)
        .unionByName(spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(nullRow), 1), src.schema))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private lazy val weirdTextDir: String = {
    // adversarial CONTENT (not shape): empty text, whitespace runs, a
    // single char, a 5000-token single-vocab doc, CJK, tabs/newlines,
    // accented repeats, odd lang/source values — every text operator
    // must process these, not page (first run: zero defects; kept as
    // regression cover for future text operators)
    val dir = java.nio.file.Files.createTempDirectory("graft-weird").toString
    for (t <- tables.filterNot(_ == "documents"))
      spark.read.parquet(s"$sf/$t.parquet")
        .limit(5).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val src = spark.read.parquet(s"$sf/documents.parquet")
    val weird = Seq(
      Row(800001L, "", "en", "srcW", 0L),
      Row(800002L, "   ", "en", "srcW", 3L),
      Row(800003L, "x", "en", "srcW", 1L),
      Row(800004L, ("tok " * 5000).trim, "en", "srcW", 20000L),
      Row(800005L, "日本語 テキスト 漢字 ひらがな カタカナ", "ja", "srcW", 20L),
      Row(800006L, "a\tb\nc  d", "en", "srcW", 9L),
      Row(800007L, "ünïcödé tökens éverywhere ünïcödé", "de", "srcW", 33L),
      Row(800008L, (1 to 300).map(i => s"w$i").mkString(" "), "zz", "s.w", 2000L))
    src.limit(5)
      .unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(weird, 1), src.schema))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val weirdEventsDir: String = {
    // adversarial events: negative/zero/huge values, an exact duplicate
    // row (same event_id), epoch and far-future timestamps, an odd and
    // an empty event_type, corrupt/truncated JSON props (first run:
    // zero defects; kept as regression cover — the q_corrupt/benford/
    // cents-arithmetic class is the one this would catch)
    val dir = java.nio.file.Files.createTempDirectory("graft-wev").toString
    for (t <- tables.filterNot(_ == "events"))
      spark.read.parquet(s"$sf/$t.parquet")
        .limit(5).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val src = spark.read.parquet(s"$sf/events.parquet")
    def ts(s: String) = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
    val weird = Seq(
      Row(900001L, ts("2024-01-02 00:00:00"), 7L, "click", -42.5, "{}"),
      Row(900002L, ts("2024-01-02 00:00:00"), 7L, "view", 0.0, "{}"),
      Row(900003L, ts("2024-01-02 00:00:01"), 7L, "purchase", 1.0e15, "{}"),
      Row(900003L, ts("2024-01-02 00:00:01"), 7L, "purchase", 1.0e15, "{}"),
      Row(900004L, ts("1970-01-01 00:00:00"), 8L, "click", 1.0, "{}"),
      Row(900005L, ts("2099-12-31 23:59:59"), 8L, "view", 2.0, "{}"),
      Row(900006L, ts("2024-01-03 12:00:00"), 9L, "weird type", 3.0, "not json"),
      Row(900007L, ts("2024-01-03 12:00:00"), 9L, "", 0.001, "{\"k\":"))
    src.limit(10)
      .unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(weird, 1), src.schema))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Object-boundary operators REJECT null keys/geometry with a named
    * error (plus the two index fits, which reject a < K corpus). The
    * expected marker pins the error to the NAMED guard — a regression
    * back to the generic encoder NOT_NULL_ASSERT_VIOLATION fails here. */
  private val loudOnNull: Map[String, String] = Map(
    "q_nms_greedy" -> "GreedyNms",
    "q_nms_exec" -> "GreedyNms",
    "q_domain_cap" -> "domainCap",
    "q_topk_agg" -> "topkAggregator",
    "q_ivf_topk" -> "IVF quantizer",
    "q_ivf_delta" -> "IVF quantizer",
    "q_pq_topk" -> "PQ codebooks")

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
  // 5-row fixtures: the index fits reject < K vectors, same named guard
  sweep("adversarial-text", () => weirdTextDir, fitRequiredOneRow)
  sweep("adversarial-events", () => weirdEventsDir, fitRequiredOneRow)

  SparkEntry.queries.foreach { case (name, fn) =>
    loudOnNull.get(name) match {
      case Some(marker) =>
        test(s"$name rejects a null row with its named guard") {
          val e = try intercept[Throwable] { fn(spark, nullRowDir).count() }
          finally spark.catalog.clearCache()
          val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .map(t => String.valueOf(t.getMessage)).mkString("\n")
          assert(msgs.contains(marker),
            s"expected the named '$marker' guard, got: ${msgs.take(300)}")
        }
      case None =>
        test(s"$name tolerates a null row") {
          try fn(spark, nullRowDir).count()
          finally spark.catalog.clearCache()
        }
    }
  }
}
