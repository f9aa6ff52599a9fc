package graft

import graft.operators.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextOps.ccnetCuts / ccnetBucketDelta — the frozen-tercile face of
  * the CCNet loop: bucket a crawl delta against the cuts of a corpus
  * snapshot, scored under that snapshot's persisted unigram model. */
class CcnetDeltaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private def freshModel(): String =
    java.nio.file.Files.createTempDirectory("graft-ccnet-model").toString + "/model.parquet"
  private def docs() = Tables.documents(spark, sfDir)
    .select("doc_id", "lang", "text")

  /** ntile(3)'s per-document assignment over the same rarity key — the
    * reference the two-level batch query reproduces bit-for-bit. */
  private def ntileReference(): Map[Long, (String, String, Double)] = {
    val tf = docs()
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy("tok").agg(sum("tf").as("c"))
    val nv = cf.agg(sum("c").as("n"), count(lit(1)).as("v"))
    val w = Window.partitionBy("lang").orderBy("rarity", "doc_id")
    tf.join(cf, "tok").crossJoin(broadcast(nv))
      .withColumn("term",
        col("tf") * ((col("n") + col("v")).cast("double") / (col("c") + 1)))
      .groupBy("doc_id", "lang")
      .agg(collect_list(struct(col("tok"), col("term"))).as("l"),
        sum("tf").as("n_tokens"))
      .select(col("doc_id"), col("lang"),
        (graft.functions.SortedFolds.sortedTermSum(col("l"))
          / col("n_tokens")).as("rarity"))
      .withColumn("b", ntile(3).over(w))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        Seq("head", "middle", "tail")(r.getInt(3) - 1), r.getDouble(2))))
      .toMap
  }

  test("delta-bucketing the snapshot corpus ≡ ntile, except boundary tie groups to the lower bucket") {
    val m = freshModel()
    TextOps.lmModelAppend(spark, m, docs(), 0L)
    val cuts = TextOps.ccnetCuts(spark, sfDir)
    val cutVals = cuts.collect()
      .flatMap(r => Seq(1, 2).flatMap(i => if (r.isNullAt(i)) None else Some(r.getDouble(i))))
      .toSet
    val delta = TextOps.ccnetBucketDelta(spark, m, cuts, docs()).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val ref = ntileReference()
    assert(delta.keySet == ref.keySet && delta.nonEmpty)
    val order = Seq("head", "middle", "tail")
    var same = 0
    delta.foreach { case (id, b) =>
      val (_, refB, rarity) = ref(id)
      if (b == refB) same += 1
      else {
        // ntile split an equal-rarity tie group across the boundary; the
        // value-deterministic rule keeps the whole group on the LOWER
        // side — so any mismatch must sit exactly ON a frozen cut and
        // move DOWN, never up
        assert(cutVals.contains(rarity),
          s"doc $id moved buckets ($refB -> $b) off a cut boundary (rarity $rarity)")
        assert(order.indexOf(b) < order.indexOf(refB),
          s"doc $id moved UP ($refB -> $b) — frozen cuts may only pull ties down")
      }
    }
    assert(same > delta.size / 2, "most documents must bucket identically")
  }

  test("cuts carry exact boundaries: every head rarity ≤ cut1 < some middle rarity") {
    val cuts = TextOps.ccnetCuts(spark, sfDir).collect()
    assert(cuts.nonEmpty)
    cuts.foreach { r =>
      if (!r.isNullAt(1) && !r.isNullAt(2))
        assert(r.getDouble(1) <= r.getDouble(2),
          s"cut1 must not exceed cut2: $r")
    }
  }

  test("unseen language reports uncalibrated; OOV tokens score under add-1") {
    import spark.implicits._
    val m = freshModel()
    TextOps.lmModelAppend(spark, m,
      Seq((1L, "en", "alpha beta alpha"), (2L, "en", "beta beta gamma"),
        (3L, "en", "alpha gamma gamma")).toDF("doc_id", "lang", "text"), 0L)
    val cuts = Seq(("en", 2.0, 4.0)).toDF("lang", "cut1", "cut2")
    val out = TextOps.ccnetBucketDelta(spark, m,
      cuts, Seq((9L, "xx", "alpha beta"), (10L, "en", "zzz zzz"))
        .toDF("doc_id", "lang", "text")).collect()
    val byId = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(9L) == "uncalibrated", s"unseen language must not ride en's cuts: ${byId(9L)}")
    // model: alpha=3 beta=3 gamma=3 → n=9 v=3; OOV zzz term = 12/1 = 12
    // per occurrence → rarity 12 > cut2 → tail
    assert(byId(10L) == "tail")
    val r10 = out.find(_.getLong(0) == 10L).get.getDouble(3)
    assert(r10 == 12.0, s"OOV rarity must be (n+v)/1 = 12.0, got $r10")
  }

  test("a language with ANY null cut reports uncalibrated (single-tercile case)") {
    import spark.implicits._
    // r12 advice: with cut1 non-null and cut2 null, the pre-r13 shape
    // sent every rarity > cut1 to 'tail' ('middle' unreachable via the
    // null comparison falling through to otherwise) — a silently
    // half-calibrated language. The contract is now: any null cut →
    // 'uncalibrated', same as an unseen language.
    val m = freshModel()
    TextOps.lmModelAppend(spark, m,
      Seq((1L, "en", "alpha beta alpha")).toDF("doc_id", "lang", "text"), 0L)
    val cuts = Seq(("en", Some(2.0), None: Option[Double]))
      .toDF("lang", "cut1", "cut2")
    val out = TextOps.ccnetBucketDelta(spark, m, cuts,
      Seq((1L, "en", "alpha alpha"), (2L, "en", "zzz zzz"))
        .toDF("doc_id", "lang", "text")).collect()
    out.foreach { r =>
      assert(r.getString(2) == "uncalibrated",
        s"single-tercile language must be uncalibrated for EVERY doc " +
          s"(low and high rarity alike): $r")
    }
  }

  test("streaming bucket sink: slices under frozen cuts ≡ one batch; replay writes once") {
    import graft.streaming.StreamOps
    val sess = spark
    import sess.implicits._
    val m = freshModel()
    val corpus = Seq(
      (1L, "en", "alpha beta alpha"), (2L, "en", "beta beta gamma"),
      (3L, "en", "alpha gamma gamma"), (4L, "en", "alpha beta gamma"))
      .toDF("doc_id", "lang", "text")
    TextOps.lmModelAppend(spark, m, corpus, 0L)
    // every corpus token occurs 4× → per-occurrence term (n+v)/(c+1) =
    // 15/5 = 3.0, so corpus docs have rarity 3.0; the delta adds an
    // all-OOV doc at rarity 15.0 — cuts (3.5, 10.0) put them in
    // different buckets so the compose check isn't vacuous
    val delta = corpus.unionByName(
      Seq((5L, "en", "zzz zzz")).toDF("doc_id", "lang", "text"))
    val cuts = Seq(("en", 3.5, 10.0)).toDF("lang", "cut1", "cut2")
    val base = java.nio.file.Files.createTempDirectory("graft-ccnet-sink").toString
    val out = base + "/buckets"
    // two slices through the per-batch body (the sink's exact code path)
    StreamOps.ccnetBucketSinkBatch(delta.filter(col("doc_id") <= 2), m, cuts, out, 0L)
    StreamOps.ccnetBucketSinkBatch(delta.filter(col("doc_id") > 2), m, cuts, out, 1L)
    val streamed = spark.read.parquet(out)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    val oneShot = TextOps.ccnetBucketDelta(spark, m, cuts, delta).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("bucket")).toSet
    assert(streamed == oneShot,
      "bucketing under frozen model+cuts must compose over any slicing")
    assert(streamed.map(_._2).size > 1, "fixture should straddle a cut")
    // duplicate delivery: the committed batch dir is kept verbatim
    val dir = new java.io.File(s"$out/batch_id=0")
    def fileSet() = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified, f.length)).toSet
    val first = fileSet()
    StreamOps.ccnetBucketSinkBatch(delta.filter(col("doc_id") <= 2), m, cuts, out, 0L)
    assert(fileSet() == first, "replay of a committed batch must write nothing")
  }

  test("scoring under an empty or absent model fails loudly") {
    import spark.implicits._
    val cuts = Seq(("en", 1.0, 2.0)).toDF("lang", "cut1", "cut2")
    intercept[IllegalStateException] {
      TextOps.ccnetBucketDelta(spark, freshModel(), cuts,
        Seq((1L, "en", "a")).toDF("doc_id", "lang", "text")).count()
    }
    intercept[IllegalStateException] {
      TextOps.lmScoreDelta(spark, freshModel(),
        Seq((1L, "a")).toDF("doc_id", "text")).count()
    }
  }
}
