package graft

import org.apache.spark.sql.functions._

/** Int8 embedding quantization (`VectorOps.quantizeEmbeddings` /
  * `quantizedTopK`): the compressed path must stay faithful — bounded
  * reconstruction error per component and high top-k agreement with the
  * exact float path — and deterministic. */
class QuantizeSpec extends SparkSpec {

  test("quantization reconstructs within one step and top-10 recall vs exact is >= 0.8") {
    import graft.operators.VectorOps
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val q = VectorOps.quantizeEmbeddings(e)

    // per-component reconstruction error is at most half a quantization
    // step (scale/127), plus float slop
    val worst = q.join(e, "vec_id")
      .select(aggregate(
        zip_with(col("embedding"), col("q"),
          (x, b) => abs(x.cast("double") - b.cast("double") * col("scale") / 127.0)),
        lit(0.0), (acc, d) => greatest(acc, d)).as("err"),
        (col("scale") / 127.0 * 0.5001).as("bound"))
      .filter(col("err") > col("bound")).count()
    assert(worst == 0L, "a component reconstructed outside half a quantization step")

    // rank agreement: top-10 per probe overlaps the exact top-10 in >= 8
    // of 10 slots on average (int8 only reorders near-ties)
    val approx = VectorOps.quantizedTopK(spark, sf)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exactW = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val exact = e.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
      .join(broadcast(probes), col("cand_id") =!= col("probe_id"))
      .withColumn("cos", graft.functions.CosineSimilarity.cosineSim(col("p_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(exactW))
      .filter(col("rank") <= 10)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (p, want) => approx(p).intersect(want).size.toDouble / want.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean top-10 recall $mean")

    // deterministic across plans/runs
    val once = VectorOps.quantizedTopK(spark, sf).collect().toSeq
    assert(VectorOps.quantizedTopK(spark, sf).collect().toSeq == once)
  }
}
