package graft.tools

import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off empirical probe for the incremental legs' 100 TB claim (r13
  * verdict task #6): the PLAN-shape argument (no Exchange on the index
  * side, delta-only shuffles) predicts probe cost grows with DELTA size
  * and stays flat in INDEX size. This measures it: build the band /
  * gram / unigram-model state at 1× and 10× corpus scale from a
  * seed-stamped synthetic documents table, then time the same fixed
  * deltas against both. Results land in PLANS.md as a table.
  *
  * Run: sbt "Test/runMain graft.tools.ScaleProbe [nBase] [reps]"
  * (defaults 5000 docs ≈ the sf0.1 documents row count, 3 reps).
  * Timings are medians of `reps` runs; dedup/substring increments FOLD
  * as well as probe, so each rep uses fresh delta doc_ids (state grows
  * by a few deltas over the run — still ≪ the 10× index gap probed).
  */
object ScaleProbe {

  /** Deterministic synthetic docs: ~100 tokens each, vocabulary scaled
    * with the corpus so model/index row counts actually grow 10×. */
  def synthDocs(spark: SparkSession, n: Long, idOffset: Long, seed: Long,
                vocab: Int): DataFrame =
    spark.range(n).select(
      (col("id") + idOffset).as("doc_id"),
      array_join(transform(sequence(lit(0), lit(99)),
        i => concat(lit("t"),
          pmod(hash(col("id") + idOffset, i, lit(seed)), lit(vocab)))), " ")
        .as("text"))

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val nBase = args.lift(0).map(_.toLong).getOrElse(5000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("scaleprobe-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val seed = 20260816L

    def base(tag: String) =
      java.nio.file.Files.createTempDirectory(s"scaleprobe-$tag").toString

    // two corpora: 1× and 10×, disjoint id ranges, vocab scaled with size
    val corpora = Seq(
      ("1x", nBase, (nBase / 10).toInt max 1000),
      ("10x", nBase * 10, nBase.toInt max 1000))

    // fixed deltas, ids far above both corpora, 1× vocab (identical
    // content probed against both indexes)
    val deltaIds = new java.util.concurrent.atomic.AtomicLong(100_000_000L)
    def freshDelta(rows: Long): DataFrame =
      synthDocs(spark, rows, deltaIds.getAndAdd(rows), seed + 7,
        (nBase / 10).toInt max 1000).localCheckpoint(true)

    case class Cell(leg: String, index: String, deltaRows: Long, secs: Double)
    val cells = Seq.newBuilder[Cell]

    for ((tag, n, vocab) <- corpora) {
      val corpus = synthDocs(spark, n, 0L, seed, vocab)
      val dedupIdx = base(s"dedup-$tag") + "/index.parquet"
      val substrIdx = base(s"substr-$tag") + "/index.parquet"
      val modelPath = base(s"lm-$tag") + "/model.parquet"
      println(s"[probe] building $tag state ($n docs, vocab $vocab)…")
      val tBuild = time {
        TextOps.dedupIncrement(spark, dedupIdx, corpus).count()
        TextOps.substringIncrement(spark, substrIdx, corpus).count()
        TextOps.lmModelAppend(spark, modelPath, corpus, 1L)
      }
      println(f"[probe] $tag state built in $tBuild%.1f s")
      var lmBatch = 1L
      for (deltaRows <- Seq(500L, 2500L)) {
        def medianOfReps(leg: String)(run: DataFrame => Unit): Double =
          median((1 to reps).map { _ =>
            val d = freshDelta(deltaRows)
            val s = time(run(d))
            spark.catalog.clearCache()
            s
          })
        cells += Cell("dedupIncrement", tag, deltaRows, medianOfReps("dedup") {
          d => TextOps.dedupIncrement(spark, dedupIdx, d).count() })
        cells += Cell("substringIncrement", tag, deltaRows, medianOfReps("substr") {
          d => TextOps.substringIncrement(spark, substrIdx, d).count() })
        cells += Cell("lmScoreDelta", tag, deltaRows, medianOfReps("lm") {
          d => TextOps.lmScoreDelta(spark, modelPath, d).count() })
        // keep the model's fold leg honest too: one timed fold per size
        lmBatch += 1
        cells += Cell("lmModelAppend", tag, deltaRows, {
          val d = freshDelta(deltaRows)
          time(TextOps.lmModelAppend(spark, modelPath, d, lmBatch))
        })
      }
    }

    val all = cells.result()
    println("\n| leg | delta rows | 1x index (s) | 10x index (s) | 10x/1x |")
    println("|---|---|---|---|---|")
    for (leg <- all.map(_.leg).distinct; dr <- all.map(_.deltaRows).distinct.sorted) {
      val a = all.find(c => c.leg == leg && c.index == "1x" && c.deltaRows == dr).get.secs
      val b = all.find(c => c.leg == leg && c.index == "10x" && c.deltaRows == dr).get.secs
      println(f"| $leg | $dr | $a%.2f | $b%.2f | ${b / a}%.2f |")
    }
    spark.stop()
  }
}
