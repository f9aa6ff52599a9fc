package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity.cosineSim
import graft.operators.VectorOps

/** Recall of the LSH ANN paths against the brute-force cosine ground
  * truth — the scale-path guarantee: the multiband (4 bands × 6 bits)
  * OR-amplified code must recover at least as much of the true top-3 as
  * the legacy single 4-bit code while using 2^6-sized buckets per band. */
class AnnSpec extends SparkSpec {

  /** sf0.01 (500 vectors), not the sf0.001 default: with ~50 vectors the
    * 2^6-per-band buckets are nearly all singletons and recall measures
    * bucket starvation, not code quality. */
  private val annSf = "/root/testdata/sf0.01"

  /** Exact top-3 neighbors per probe (vec_id < 20) — brute force. */
  private lazy val truth: Set[(Long, Long)] = {
    val e = Tables.embeddings(spark, annSf)
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val cands = e.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
    cands.join(broadcast(probes), col("cand_id") =!= col("probe_id"))
      .withColumn("cos", cosineSim(col("p_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("probe_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def recallOf(df: DataFrame): Double = {
    val got = df.select("probe_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.intersect(truth).size.toDouble / truth.size
  }

  test("multiband ANN recall is at least the legacy single-code recall") {
    // The fixture's true neighbors are only weakly similar (top-3 cosine
    // 0.32-0.49), so absolute sign-LSH recall is inherently modest here;
    // the structural claim is multiband ≥ single-code at far finer buckets
    // (4 × 2^6 vs one 2^4). The high-similarity regime the code is FOR is
    // covered by the planted-twin test below.
    val multi = recallOf(VectorOps.annTopKMultiband(spark, annSf))
    val legacy = recallOf(VectorOps.annTopK(spark, annSf))
    info(f"recall@3: multiband=$multi%.3f legacy=$legacy%.3f (truth=${truth.size} pairs)")
    assert(multi >= legacy,
      f"multiband recall $multi%.3f below legacy $legacy%.3f")
    assert(multi >= 0.1)
  }

  test("multiband ANN recovers planted near-duplicate twins (cos ≈ 0.999)") {
    // Near-dup detection is the production workload: for each vector plant
    // a twin (components scaled ±5% alternately → cos ≈ 1 - ε²/2 ≈ 0.9988).
    // Per-bit collision p = 1 - θ/π ≈ 0.984 → band p^6 ≈ 0.91 → 4-band
    // OR-amplified ≈ 0.9999. Assert ≥ 90% of twins surface in the top-3.
    val base = Tables.embeddings(spark, annSf).filter(col("vec_id") < 100)
    val twins = base.select(
      (col("vec_id") + 1000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        x.cast("double") * (lit(1.0) + lit(0.05) * ((i % 2) * 2 - 1)))
        .cast("array<float>").as("embedding"))
    val emb = base.select(col("vec_id"), col("embedding")).unionByName(twins)
    val got = VectorOps.annMultibandOn(emb, col("vec_id") < 1000, 3)
      .select("probe_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nProbes = 100
    val found = (0 until nProbes).count(id => got.contains((id.toLong, id.toLong + 1000)))
    info(f"planted-twin recall: ${found.toDouble / nProbes}%.3f ($found/$nProbes)")
    assert(found >= (nProbes * 0.9).toInt,
      s"only $found/$nProbes planted twins recovered")
  }

  test("hard negatives: top-3 label-mismatched ≡ brute-force recompute; no same-label leak") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, annSf)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])].collect().sortBy(_._1)
    // same fold order as the CosineSimilarity expression: three
    // left-to-right accumulations, sqrt·sqrt denominator
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.filter(_._1 < 10).flatMap { case (aid, albl, aemb) =>
      vecs.filter(_._2 != albl)
        .map { case (cid, clbl, cemb) => (cos(aemb, cemb), cid, clbl) }
        .sortBy { case (c, cid, _) => (-c, cid) }
        .take(3).zipWithIndex
        .map { case ((c, cid, clbl), i) =>
          (aid, i + 1L, cid, clbl.toLong,
            BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = VectorOps.hardNegatives(spark, annSf)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == expected, s"got=${got.take(3)} expected=${expected.take(3)}")
    val labelOf = vecs.map(v => v._1 -> v._2.toLong).toMap
    assert(got.forall { case (aid, _, _, neg, _) => labelOf(aid) != neg },
      "a same-label candidate leaked into the negatives")
  }

  test("semdedup: cluster-bounded dedup ≡ brute-force recompute; dedup is cluster-local") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, annSf)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val cents = vecs.filter(_._1 < 8)
    def assign(v: Array[Float]): Long = cents.map { case (cid, c) =>
      val d2 = (0 until v.length).foldLeft(0.0) { (acc, i) =>
        val d = v(i).toDouble - c(i).toDouble; acc + d * d
      }
      (d2, cid)
    }.min._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = (0 until a.length).foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
      val na = math.sqrt((0 until a.length).foldLeft(0.0)((acc, i) => acc + a(i).toDouble * a(i).toDouble))
      val nb = math.sqrt((0 until b.length).foldLeft(0.0)((acc, i) => acc + b(i).toDouble * b(i).toDouble))
      dot / (na * nb)
    }
    val clusters = vecs.map { case (id, v) => (id, v, assign(v)) }
    val expected = clusters.map { case (id, v, cl) =>
      val mates = clusters.filter(m => m._3 == cl && m._1 < id)
        .map(m => (m._1, cos(v, m._2))).filter(_._2 >= 0.3)
      if (mates.isEmpty) (id, cl, false, None: Option[Long])
      else (id, cl, true, Some(mates.map(_._1).min))
    }.toSeq
    val got = VectorOps.semDedup(spark, annSf)
      .select("vec_id", "cluster", "is_dup", "dup_of")
      .as[(Long, Long, Boolean, Option[Long])].collect().toSeq
    assert(got == expected, s"got=${got.take(3)} expected=${expected.take(3)}")
    assert(got.exists(_._3) && got.exists(!_._3),
      s"dup flag constant: ${got.count(_._3)}/${got.size}")
  }
}
