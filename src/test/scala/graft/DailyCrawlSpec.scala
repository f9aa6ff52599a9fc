package graft

import graft.operators.{Ivf, TextOps}
import org.apache.spark.sql.functions._

/** The daily-crawl loop END-TO-END: three day-slices of the fixture run
  * through all five incremental legs TOGETHER — dedup-admit the day's
  * documents, span-strip the admitted text keep-first, fold the
  * ADMITTED set into the unigram corpus model, bucket under frozen
  * cuts, index the day's embeddings — with the shared maintenance
  * policy forcing real mid-loop compactions. The per-leg specs
  * (IncrementalDedupSpec / IncrementalSubstringSpec / IncrementalLmSpec
  * / IncrementalIvfSpec / CcnetDeltaSpec / BucketedStateSpec) pin each
  * leg in isolation; this is the COMPOSITION a production loop actually
  * runs: the model sees only what dedup admitted, state compacts while
  * later days still fold into it, and the end state must equal the
  * one-shot build on every leg. */
class DailyCrawlSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("three coupled days ≡ one-shot on all four legs, with mid-loop maintenance") {
    val docs = Tables.documents(spark, sfDir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val slices = Seq(
      docs.filter(col("doc_id") < c1),
      docs.filter(col("doc_id") >= c1 && col("doc_id") < c2),
      docs.filter(col("doc_id") >= c2))
    val emb = Tables.embeddings(spark, sfDir)
    val vids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    val (v1, v2) = (vids(vids.length / 3), vids(2 * vids.length / 3))
    val embSlices = Seq(
      emb.filter(col("vec_id") < v1),
      emb.filter(col("vec_id") >= v1 && col("vec_id") < v2),
      emb.filter(col("vec_id") >= v2))

    val dedupIdx = tmp("crawl-dedup") + "/index.parquet"
    val modelPath = tmp("crawl-lm") + "/model.parquet"
    val ivfIdx = tmp("crawl-ivf") + "/postings.parquet"
    // frozen calibration: cuts from the snapshot, reused for every day
    val cuts = TextOps.ccnetCuts(spark, sfDir).localCheckpoint(true)

    val substrIdx = tmp("crawl-substr") + "/index.parquet"
    var admitted = Set.empty[Long]
    var stripped = Seq.empty[(Long, Long, Long, String)]
    for ((day, i) <- slices.zipWithIndex) {
      val adm = TextOps.dedupIncrement(spark, dedupIdx, day)
        .localCheckpoint(true) // consumed by the folds below AND collected
      TextOps.lmModelAppend(spark, modelPath, adm, batchId = i + 1L)
      // substring leg runs AFTER doc-level dedup: admitted docs are
      // span-stripped keep-first against text seen on earlier days
      stripped ++= TextOps.substringIncrement(spark, substrIdx, adm)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      Ivf.ivfAppend(spark, ivfIdx, embSlices(i))
      // threshold 1 forces real rewrites INSIDE the loop (days 2 and 3
      // fold into already-compacted state), not just a final cleanup
      TextOps.maintainDedupIndex(spark, dedupIdx, maxFileSetsPerBucket = 1)
      TextOps.maintainLmModel(spark, modelPath, maxFileSetsPerBucket = 1)
      TextOps.maintainSubstringIndex(spark, substrIdx, maxFileSetsPerBucket = 1)
      Ivf.maintainIvfIndex(spark, ivfIdx, maxFileSetsPerBucket = 1)
      admitted ++= adm.select("doc_id").collect().map(_.getLong(0))
    }

    // dedup leg: the loop admits exactly the one-shot set
    val oneShotAdm = TextOps.dedupIncrement(spark,
        tmp("crawl-dedup-ref") + "/index.parquet", docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == oneShotAdm)
    assert(admitted.size < ids.length, "fixture must exercise rejection")

    // model leg: the loop model (admitted-only folds, compacted mid-loop)
    // scores BIT-identically to a reference folded once from the same
    // admitted corpus
    val admDocs = docs.filter(col("doc_id").isInCollection(admitted))
    val refModel = tmp("crawl-lm-ref") + "/model.parquet"
    TextOps.lmModelAppend(spark, refModel, admDocs, batchId = 1L)
    val gotScores = TextOps.lmScoreDelta(spark, modelPath, admDocs).collect().toSeq
    val refScores = TextOps.lmScoreDelta(spark, refModel, admDocs).collect().toSeq
    assert(gotScores == refScores)
    assert(gotScores.size == admitted.size)

    // substring leg: the per-day keep-first strips over admitted docs
    // compose to the one-shot strip of the admitted corpus (slices are
    // doc_id-ordered because the day cuts are)
    val oneShotStrip = TextOps.substringIncrement(spark,
        tmp("crawl-substr-ref") + "/index.parquet", admDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(stripped.sortBy(_._1) == oneShotStrip.sortBy(_._1))

    // ccnet leg: frozen-cut bucketing under the loop model ≡ under the
    // reference model, doc-for-doc
    val gotBuckets = TextOps.ccnetBucketDelta(spark, modelPath, cuts, admDocs).collect().toSeq
    val refBuckets = TextOps.ccnetBucketDelta(spark, refModel, cuts, admDocs).collect().toSeq
    assert(gotBuckets == refBuckets)

    // ivf leg: the three-append index answers searches exactly like a
    // two-append reference sharing the same day-1 quantizer fit
    val refIvf = tmp("crawl-ivf-ref") + "/postings.parquet"
    Ivf.ivfAppend(spark, refIvf, embSlices(0))
    Ivf.ivfAppend(spark, refIvf, embSlices(1).unionByName(embSlices(2)))
    val probes = emb.filter(col("vec_id") < 20)
    val gotSearch = Ivf.ivfSearch(spark, ivfIdx, probes, k = 3).collect().toSeq
    val refSearch = Ivf.ivfSearch(spark, refIvf, probes, k = 3).collect().toSeq
    assert(gotSearch == refSearch)
    assert(gotSearch.nonEmpty)
  }
}
