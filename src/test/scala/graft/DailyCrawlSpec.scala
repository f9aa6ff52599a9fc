package graft

import graft.operators.{Ivf, TextOps, VectorOps}
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

  /** r13 verdict task #1: the SAME coupled loop, but as chained REAL
    * streaming queries — the reference's actual deployment shape (a
    * long-lived streaming job). The head query dedup-admits crawl
    * deltas arriving as JSON payloads on the FILE-LOG transport (the
    * offset-ranged Kafka twin, r14 verdict task #6 — the r14 pin
    * covered the dedup sink alone; the full five-leg loop now heads on
    * FileLog.stream through the SAME kafkaProject projection a real
    * Kafka deployment uses, so a head restart resumes from checkpointed
    * log offsets, not replayed driver memory); the model and substring
    * legs are DOWNSTREAM streams tailing the head's committed batch
    * directories through a file source; the IVF leg indexes an
    * embedding stream.
    * Two checkpoint restarts happen MID-LOOP, while the other legs keep
    * folding — the composition failure mode the batch folds above
    * cannot exhibit (leg A restarts while leg B's state has moved on):
    *  - the model leg is killed for all of day 2 and restarted — it
    *    must catch up on day-2 admitted files without refolding day 1
    *    (file-source offsets + the model's monotone batch-id guard);
    *  - the head is killed after day 2 and restarted before day 3 —
    *    a redelivered head batch must keep its committed decisions
    *    verbatim (the sink's decide-commit-then-fold order).
    * Mid-loop compactions run between triggers on all four tables.
    * End state must equal the one-shot build on every leg, and the
    * frozen-model scoring + bucketing legs then run as streams over the
    * final admitted output. */
  test("the coupled loop as chained streaming queries ≡ one-shot across mid-loop restarts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sfDir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    // crawl deltas as JSON payloads, rendered by the engine itself
    // (escaping-safe) — the wire format the file-log head consumes
    val payloads = docs
      .select(col("doc_id"),
        to_json(struct(col("doc_id"), col("lang"), col("text"))).as("j"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val days = Seq(payloads.filter(_._1 < c1),
      payloads.filter(t => t._1 >= c1 && t._1 < c2), payloads.filter(_._1 >= c2))
    val emb = Tables.embeddings(spark, sfDir)
    val vids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    val (v1, v2) = (vids(vids.length / 3), vids(2 * vids.length / 3))
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val vdays = Seq(vecs.filter(_._1 < v1),
      vecs.filter(v => v._1 >= v1 && v._1 < v2), vecs.filter(_._1 >= v2))

    val base = tmp("crawl-streaming")
    val dedupIdx = base + "/dedup/index.parquet"
    val admittedOut = base + "/admitted"
    val substrIdx = base + "/substr/index.parquet"
    val strippedOut = base + "/stripped"
    val modelPath = base + "/lm/model.parquet"
    val ivfIdx = base + "/ivf/postings.parquet"

    val admSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    // head: crawl deltas arrive on the FILE-LOG transport (two log
    // partitions, doc_id parity — the admission decision is
    // partition-layout-agnostic), parsed by the kafka projection →
    // dedup decisions committed per batch dir, band keys folded into
    // the bucketed index
    val crawlLog = base + "/crawl-log"
    // each day splits into ID-CONTIGUOUS halves (p0 = lower ids,
    // written first), NOT parity: the head polls continuously, so a
    // trigger can land between the two partition appends — under a
    // parity layout that delivered a larger-id near-dup one micro-batch
    // BEFORE its smaller-id twin and flipped the keep-first-by-ARRIVAL
    // admission (the operator's contract) away from the one-shot's
    // keep-first-by-id that this test compares against. With contiguous
    // halves every observable append prefix is id-downward-closed, so
    // ANY poll timing yields id-ordered arrival and the comparison is
    // race-free. (Caught live in r16 once the folds got slower.)
    def appendDay(day: Array[(Long, String)]): Unit = {
      val half = day.length / 2
      graft.sources.FileLog.appendValues(crawlLog, 0,
        day.take(half).map(_._2).toSeq)
      graft.sources.FileLog.appendValues(crawlLog, 1,
        day.drop(half).map(_._2).toSeq)
    }
    def startHead() = StreamOps.dedupIncrementSink(
      graft.sources.StreamSource.kafkaProject(
        graft.sources.FileLog.stream(spark, crawlLog), admSchema),
      dedupIdx, admittedOut, base + "/ckpt-dedup")
    // embeddings leg (first batch fits the quantizer: |day 1| ≥ Ivf.K)
    val vecIn = MemoryStream[(Long, Array[Float])]
    val ivfQ = StreamOps.ivfAppendSink(
      vecIn.toDF().toDF("vec_id", "embedding"), ivfIdx, base + "/ckpt-ivf")
    // semantic-dedup leg (r15): the SAME embedding stream also drives
    // the frozen-geometry SemDeDup admission sink — the sixth leg
    val semIdx = base + "/semdedup/index.parquet"
    val semOut = base + "/sem-admitted"
    val semIn = MemoryStream[(Long, Array[Float])]
    val semQ = StreamOps.semDedupIncrementSink(
      semIn.toDF().toDF("vec_id", "embedding"), semIdx, semOut, base + "/ckpt-sem")

    // downstream legs tail the head's committed batch dirs as a file
    // source (the glob skips partition discovery; _SUCCESS is ignored)
    def admittedStream() =
      spark.readStream.schema(admSchema).parquet(admittedOut + "/batch_id=*")
    def startLm() = StreamOps.lmModelSink(
      admittedStream().select("doc_id", "text"), modelPath, base + "/ckpt-lm")
    def startSub() = StreamOps.substringIncrementSink(
      admittedStream().select("doc_id", "text"),
      substrIdx, strippedOut, base + "/ckpt-sub")

    def maintainAll(): Unit = {
      TextOps.maintainDedupIndex(spark, dedupIdx, maxFileSetsPerBucket = 1)
      TextOps.maintainLmModel(spark, modelPath, maxFileSetsPerBucket = 1)
      TextOps.maintainSubstringIndex(spark, substrIdx, maxFileSetsPerBucket = 1)
      Ivf.maintainIvfIndex(spark, ivfIdx, maxFileSetsPerBucket = 1)
      VectorOps.maintainSemDedupIndex(spark, semIdx, maxFileSetsPerBucket = 1)
    }

    var head = startHead()
    var lmQ: org.apache.spark.sql.streaming.StreamingQuery = null
    var subQ: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      // ---- day 1: all legs live ----
      appendDay(days(0)); head.processAllAvailable()
      vecIn.addData(vdays(0).toSeq); ivfQ.processAllAvailable()
      semIn.addData(vdays(0).toSeq); semQ.processAllAvailable()
      lmQ = startLm(); subQ = startSub()
      lmQ.processAllAvailable(); subQ.processAllAvailable()
      maintainAll() // compaction between triggers, queries still live

      // ---- day 2: model leg DOWN for the whole day ----
      lmQ.stop()
      appendDay(days(1)); head.processAllAvailable()
      subQ.processAllAvailable()
      vecIn.addData(vdays(1).toSeq); ivfQ.processAllAvailable()
      semIn.addData(vdays(1).toSeq); semQ.processAllAvailable()
      // restart from its checkpoint: catches up on day-2 admitted files
      // without refolding day 1
      lmQ = startLm(); lmQ.processAllAvailable()
      maintainAll()

      // ---- day 3: HEAD restarts from its checkpoint ----
      head.stop()
      head = startHead()
      appendDay(days(2)); head.processAllAvailable()
      lmQ.processAllAvailable(); subQ.processAllAvailable()
      vecIn.addData(vdays(2).toSeq); ivfQ.processAllAvailable()
      semIn.addData(vdays(2).toSeq); semQ.processAllAvailable()
      maintainAll()
    } finally {
      Seq(Option(head), Option(lmQ), Option(subQ), Option(ivfQ), Option(semQ)).flatten
        .foreach(q => if (q.isActive) q.stop())
    }

    // dedup leg: the streamed loop admits exactly the one-shot set
    val admitted = spark.read.parquet(admittedOut + "/batch_id=*")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val oneShotAdm = TextOps.dedupIncrement(spark,
        tmp("crawl-sdedup-ref") + "/index.parquet", docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == oneShotAdm)
    assert(admitted.size < ids.length, "fixture must exercise rejection")

    val admDocs = docs.filter(col("doc_id").isInCollection(admitted))
    val refModel = tmp("crawl-slm-ref") + "/model.parquet"
    TextOps.lmModelAppend(spark, refModel, admDocs, batchId = 1L)

    // model leg: the streamed model (folded across a mid-loop restart
    // and compactions) scores bit-identically to the one-shot reference
    val gotScores = TextOps.lmScoreDelta(spark, modelPath, admDocs).collect().toSeq
    val refScores = TextOps.lmScoreDelta(spark, refModel, admDocs).collect().toSeq
    assert(gotScores == refScores && gotScores.size == admitted.size)

    // substring leg: streamed keep-first strips ≡ one-shot strip
    val streamedStrip = spark.read.parquet(strippedOut + "/batch_id=*")
      .select("doc_id", "n_tokens", "n_dup_tokens", "text_clean").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val oneShotStrip = TextOps.substringIncrement(spark,
        tmp("crawl-ssub-ref") + "/index.parquet", admDocs)
      .select("doc_id", "n_tokens", "n_dup_tokens", "text_clean").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(streamedStrip == oneShotStrip)

    // frozen-model SCORING leg as a stream over the admitted output
    val scoresOut = base + "/scores"
    val scoreQ = StreamOps.lmScoreSink(
      admittedStream().select("doc_id", "text"),
      modelPath, scoresOut, base + "/ckpt-score")
    try scoreQ.processAllAvailable() finally scoreQ.stop()
    val streamedScores = spark.read.parquet(scoresOut + "/batch_id=*")
      .select("doc_id", "n_tokens", "lm_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val refScoresS = refScores
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(streamedScores == refScoresS)

    // frozen-cut BUCKETING leg as a stream under the loop's final model
    val cuts = TextOps.ccnetCuts(spark, sfDir).localCheckpoint(true)
    val bucketsOut = base + "/buckets"
    val bucketQ = StreamOps.ccnetBucketSink(
      admittedStream().select("doc_id", "lang", "text"),
      modelPath, cuts, bucketsOut, base + "/ckpt-bucket")
    try bucketQ.processAllAvailable() finally bucketQ.stop()
    val streamedBuckets = spark.read.parquet(bucketsOut + "/batch_id=*")
      .select("doc_id", "lang", "bucket", "rarity").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    val refBuckets = TextOps.ccnetBucketDelta(spark, refModel, cuts, admDocs)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(streamedBuckets == refBuckets)

    // semantic-dedup leg: the three-day streamed admissions equal the
    // one-shot SemDeDup increment over the whole embedding corpus
    val semStreamed = spark.read.parquet(semOut + "/batch_id=*")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val semOneShot = VectorOps.semDedupIncrement(spark,
        tmp("crawl-ssem-ref") + "/index.parquet", emb.select("vec_id", "embedding"))
      .filter(col("admitted")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(semStreamed == semOneShot && semStreamed.nonEmpty)

    // ivf leg: the streamed index answers searches exactly like a
    // two-append reference sharing the same day-1 quantizer fit
    val refIvf = tmp("crawl-sivf-ref") + "/postings.parquet"
    Ivf.ivfAppend(spark, refIvf, emb.filter(col("vec_id") < v1))
    Ivf.ivfAppend(spark, refIvf, emb.filter(col("vec_id") >= v1))
    val probes = emb.filter(col("vec_id") < 20)
    val gotSearch = Ivf.ivfSearch(spark, ivfIdx, probes, k = 3).collect().toSeq
    val refSearch = Ivf.ivfSearch(spark, refIvf, probes, k = 3).collect().toSeq
    assert(gotSearch == refSearch && gotSearch.nonEmpty)
  }

  /** r15 verdict task #5: TaskRetrySpec pins task-grain retry on the
    * four BATCH folds; this drives the STREAMING composition itself
    * under injected once-failing tasks (local[4,2] — one retry, like a
    * real cluster): day 1 fails a task inside the HEAD's admission
    * micro-batch, day 2 fails one inside the restarted downstream
    * MODEL leg's fold. The retried attempts must leave every leg's end
    * state identical to the one-shot build — the streaming sinks'
    * decide-commit-then-fold and novel-only-append disciplines compose
    * with Spark's task commit protocol, or duplicated work would land
    * twice. */
  test("streaming loop under injected task failures ≡ one-shot (head day 1, model leg day 2)") {
    import graft.streaming.StreamOps
    val docs = Tables.documents(spark, sfDir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val mid = ids(ids.length / 2)
    val payloads = docs
      .select(col("doc_id"),
        to_json(struct(col("doc_id"), col("lang"), col("text"))).as("j"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val days = Seq(payloads.filter(_._1 < mid), payloads.filter(_._1 >= mid))

    val base = tmp("crawl-inject")
    val dedupIdx = base + "/dedup/index.parquet"
    val admittedOut = base + "/admitted"
    val substrIdx = base + "/substr/index.parquet"
    val strippedOut = base + "/stripped"
    val modelPath = base + "/lm/model.parquet"
    val admSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val crawlLog = base + "/crawl-log"
    // each day splits into ID-CONTIGUOUS halves (p0 = lower ids,
    // written first), NOT parity: the head polls continuously, so a
    // trigger can land between the two partition appends — under a
    // parity layout that delivered a larger-id near-dup one micro-batch
    // BEFORE its smaller-id twin and flipped the keep-first-by-ARRIVAL
    // admission (the operator's contract) away from the one-shot's
    // keep-first-by-id that this test compares against. With contiguous
    // halves every observable append prefix is id-downward-closed, so
    // ANY poll timing yields id-ordered arrival and the comparison is
    // race-free. (Caught live in r16 once the folds got slower.)
    def appendDay(day: Array[(Long, String)]): Unit = {
      val half = day.length / 2
      graft.sources.FileLog.appendValues(crawlLog, 0,
        day.take(half).map(_._2).toSeq)
      graft.sources.FileLog.appendValues(crawlLog, 1,
        day.drop(half).map(_._2).toSeq)
    }
    // the bomb rides INSIDE the streams whose tasks we mean to fail —
    // head and model leg only, so concurrent triggers of other legs
    // can never absorb an armed injection
    def startHead() = StreamOps.dedupIncrementSink(
      graft.sources.StreamSource.kafkaProject(
        graft.sources.FileLog.stream(spark, crawlLog), admSchema)
        .filter(FaultInjection.bomb),
      dedupIdx, admittedOut, base + "/ckpt-dedup")
    def admittedStream() =
      spark.readStream.schema(admSchema).parquet(admittedOut + "/batch_id=*")
    def startLm() = StreamOps.lmModelSink(
      admittedStream().select("doc_id", "text").filter(FaultInjection.bomb),
      modelPath, base + "/ckpt-lm")
    def startSub() = StreamOps.substringIncrementSink(
      admittedStream().select("doc_id", "text"),
      substrIdx, strippedOut, base + "/ckpt-sub")

    val head = startHead()
    var lmQ: org.apache.spark.sql.streaming.StreamingQuery = null
    var subQ: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      // ---- day 1: head takes the failure mid-admission ----
      FaultInjection.arm(afterRows = 50)
      try { appendDay(days(0)); head.processAllAvailable() }
      finally FaultInjection.disarm()
      assert(FaultInjection.tripped.get,
        "the day-1 head injection must actually fire")
      lmQ = startLm(); subQ = startSub()
      lmQ.processAllAvailable(); subQ.processAllAvailable()

      // ---- day 2: model leg takes the failure on restart catch-up ----
      lmQ.stop()
      appendDay(days(1)); head.processAllAvailable()
      subQ.processAllAvailable()
      FaultInjection.arm(afterRows = 50)
      try { lmQ = startLm(); lmQ.processAllAvailable() }
      finally FaultInjection.disarm()
      assert(FaultInjection.tripped.get,
        "the day-2 model-leg injection must actually fire")
    } finally {
      Seq(Option(head), Option(lmQ), Option(subQ)).flatten
        .foreach(q => if (q.isActive) q.stop())
    }

    // dedup leg ≡ one-shot
    val admitted = spark.read.parquet(admittedOut + "/batch_id=*")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val oneShotAdm = TextOps.dedupIncrement(spark,
        tmp("crawl-inj-dedup-ref") + "/index.parquet", docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == oneShotAdm)
    assert(admitted.size < ids.length, "fixture must exercise rejection")

    // model leg ≡ one-shot, bit for bit, despite the retried fold task
    val admDocs = docs.filter(col("doc_id").isInCollection(admitted))
    val refModel = tmp("crawl-inj-lm-ref") + "/model.parquet"
    TextOps.lmModelAppend(spark, refModel, admDocs, batchId = 1L)
    val gotScores = TextOps.lmScoreDelta(spark, modelPath, admDocs).collect().toSeq
    val refScores = TextOps.lmScoreDelta(spark, refModel, admDocs).collect().toSeq
    assert(gotScores == refScores && gotScores.size == admitted.size)

    // substring leg (no injection, but folding beside both) ≡ one-shot
    val streamedStrip = spark.read.parquet(strippedOut + "/batch_id=*")
      .select("doc_id", "n_tokens", "n_dup_tokens", "text_clean").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val oneShotStrip = TextOps.substringIncrement(spark,
        tmp("crawl-inj-sub-ref") + "/index.parquet", admDocs)
      .select("doc_id", "n_tokens", "n_dup_tokens", "text_clean").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(streamedStrip == oneShotStrip)
  }
}
