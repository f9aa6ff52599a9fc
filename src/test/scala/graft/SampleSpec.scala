package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Stratified sampling: per-stratum rates near their configured fractions
  * and seed-determinism (the properties the rows-only driver check cannot
  * see). */
class SampleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("per-stratum sample rates track the configured fractions") {
    val totals = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("total"))
    val sampled = TextOps.stratifiedSample(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("kept"))
    val rates = totals.join(sampled, "lang")
      .select(col("lang"), (col("kept") / col("total")).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    TextOps.SampleFractions.foreach { case (lang, f) =>
      val rate = rates.getOrElse(lang, 0.0)
      // Bernoulli draw over 60-220 docs per stratum: allow ±0.15 absolute
      assert(math.abs(rate - f) < 0.15, f"$lang: rate $rate%.3f vs fraction $f")
    }
    // zh is kept whole — exact, not approximate
    assert(rates("zh") == 1.0)
  }

  test("same seed, same sample — deterministic across runs") {
    val a = TextOps.stratifiedSample(spark, sfDir).select("doc_id").collect().map(_.getLong(0)).toSeq
    val b = TextOps.stratifiedSample(spark, sfDir).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a.nonEmpty && a == b)
  }
}
