package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** P14-P16 laws (SURVEY §5.3): softmax sums to 1, cosine ∈ [-1,1],
  * normalized vectors have unit norm, dot/norm consistency. */
class VectorFunctionsSpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf).limit(100).cache()

  test("softmax sums to 1 ± 1e-9") {
    val sums = emb.select(
      aggregate(softmax(col("embedding")), lit(0.0), (a, x) => a + x).as("s"))
      .collect().map(_.getDouble(0))
    assert(sums.nonEmpty && sums.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("l2Normalize produces unit vectors") {
    val norms = emb.select(l2Norm(l2Normalize(col("embedding"))).as("n"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
  }

  test("cosine is within [-1, 1] and cosine(v, v) == 1") {
    import spark.implicits._
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val cosines = a.crossJoin(b).limit(500)
      .select(cosine(col("ea"), col("eb")).as("c"), (col("ia") === col("ib")).as("same"))
      .as[(Double, Boolean)].collect()
    assert(cosines.forall { case (c, _) => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 })
    assert(cosines.filter(_._2).forall { case (c, _) => math.abs(c - 1.0) < 1e-9 })
  }

  test("dot(v, v) == normSq(v)") {
    val diffs = emb.select((dot(col("embedding"), col("embedding")) - normSq(col("embedding"))).as("d"))
      .collect().map(_.getDouble(0))
    assert(diffs.forall(d => math.abs(d) < 1e-12))
  }
}
