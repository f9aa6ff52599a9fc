package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Stratified sampling: per-stratum rates near their configured fractions
  * and determinism. Since r14 the draw is the engine-neutral integer-hash
  * Bernoulli (u(doc_id) ≤ fraction(lang)) and q_sample is hash-checked
  * against DuckDB — these laws guard the semantics the oracle compare
  * takes for granted (rates actually track fractions; membership is a
  * pure function of doc_id and lang). */
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

  test("membership is a pure function of (doc_id, lang) — the stateless draw") {
    // recompute the engine's draw in plain Scala over the raw table and
    // compare exact membership: proves the sample needs no sample-table
    // join at 100 TB (recompute-from-id, the splitOf property) and that
    // the arithmetic is the documented knuthFold → Knuth multiply →
    // mod-prime chain, not an opaque engine stream
    val raw = Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = raw.collect { case (id, lang)
      if TextOps.SampleFractions.get(lang).exists { f =>
        val u = ((java.lang.Math.floorMod(id, 2147483647L) * 2654435761L)
          % 1000003L + 1L).toDouble / 1000003.0
        u <= f
      } => id }.sorted.toSeq
    val got = TextOps.stratifiedSample(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == expected, "engine sample must equal the recomputed draw")
  }
}
