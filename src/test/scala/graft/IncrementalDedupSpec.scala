package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** TextOps.dedupIncrement — the persisted-band-index admission loop:
  * batch-grain equivalence to the oracle-checked LSH pair graph, slice
  * composability, replay rejection, and the short-doc pass-through. */
class IncrementalDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private def freshIndex(): String =
    java.nio.file.Files.createTempDirectory("graft-dedup-idx").toString + "/index.parquet"
  private def docs() = Tables.documents(spark, sfDir).select("doc_id", "text")

  test("one full-corpus increment rejects exactly the larger side of the LSH pair graph") {
    val admitted = TextOps.dedupIncrement(spark, freshIndex(), docs())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs().select("doc_id").collect().map(_.getLong(0)).toSet
    // rejected ≡ docs with ANY smaller-id band-mate ≡ the d2 column of
    // the oracle-checked pair listing (pairs are exactly bucket-mates)
    val d2s = TextOps.minhashLsh(spark, sfDir)
      .select("d2").collect().map(_.getLong(0)).toSet
    assert(all -- admitted == d2s)
  }

  test("a fresh one-batch increment admits exactly the oracle-checked q_dedup_admit set") {
    val incr = TextOps.dedupIncrement(spark, freshIndex(), docs())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val query = TextOps.dedupAdmissions(spark, sfDir)
      .filter(col("admitted")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(incr == query)
  }

  test("doc_id-ordered slices compose: two increments ≡ one batch") {
    val ids = docs().select("doc_id").collect().map(_.getLong(0)).sorted
    val mid = ids(ids.length / 2)
    val idx2 = freshIndex()
    val a1 = TextOps.dedupIncrement(spark, idx2, docs().filter(col("doc_id") < mid))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val a2 = TextOps.dedupIncrement(spark, idx2, docs().filter(col("doc_id") >= mid))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = TextOps.dedupIncrement(spark, freshIndex(), docs())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((a1 ++ a2) == batch)
  }

  test("replaying a batch admits nothing; a planted pair is caught across increments") {
    val idx = freshIndex()
    val first = TextOps.dedupIncrement(spark, idx, docs())
    assert(first.count() > 0)
    assert(TextOps.dedupIncrement(spark, idx, docs()).count() == 0,
      "every key of a replayed batch is already in the index")
    // cross-increment catch: feed a known pair's smaller side into a
    // fresh index, then its larger side alone — it must be rejected
    val pair = TextOps.minhashLsh(spark, sfDir).limit(1).collect().head
    val (d1, d2) = (pair.getLong(0), pair.getLong(1))
    val idxP = freshIndex()
    TextOps.dedupIncrement(spark, idxP, docs().filter(col("doc_id") === d1)).count()
    assert(TextOps.dedupIncrement(spark, idxP,
      docs().filter(col("doc_id") === d2)).count() == 0,
      s"planted near-dup $d2 of $d1 must be rejected by the index")
  }

  test("docs too short to shingle carry no keys and always pass") {
    val sess = spark
    import sess.implicits._
    val shorts = Seq((900001L, "solitary"), (900002L, "solitary"))
      .toDF("doc_id", "text")
    val idx = freshIndex()
    assert(TextOps.dedupIncrement(spark, idx, shorts).count() == 2)
    // no keys were stored either — replay still passes (documented:
    // band-grain dedup cannot see sub-shingle documents)
    assert(TextOps.dedupIncrement(spark, idx, shorts).count() == 2)
  }
}
