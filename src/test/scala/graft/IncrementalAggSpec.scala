package graft

import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (`Scale.maintainAggState`): folding
  * per-slice partials into stored state must equal the one-shot aggregate
  * over everything — the monoid-merge property two-phase aggregation
  * already depends on, here carried across separate jobs via parquet
  * state. */
class IncrementalAggSpec extends SparkSpec {

  test("three maintained slices equal the one-shot aggregate; state schema stays fixed") {
    import graft.operators.Scale
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    val statePath = s"$dir/state"
    val events = Tables.events(spark, sf)
    // three disjoint exhaustive slices, as three arriving days would be
    val slices = Seq(
      events.filter(col("user_id") % 3 === 0),
      events.filter(col("user_id") % 3 === 1),
      events.filter(col("user_id") % 3 === 2))
    slices.foreach(s => Scale.maintainAggState(spark, statePath, s, "event_type", "value"))

    val got = Scale.readAggState(spark, statePath)
      .select("event_type", "n", "s", "mean")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString, r.getDouble(3))).toSet
    val want = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("s"))
      .select(col("event_type"), col("n"), col("s"),
        round(col("s") / col("n"), 2).cast("double").as("mean"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString, r.getDouble(3))).toSet
    assert(got == want)
    // decimal precision must not creep across merges — pinned at the
    // r11 overflow-proof state width (38,2): an (18,2) cap overflows at a
    // hot key's lifetime total of 10^16 (ANSI: permanent maintenance
    // outage; non-ANSI: silent state reset)
    val sField = spark.read.parquet(statePath).schema("s")
    assert(sField.dataType.simpleString == "decimal(38,2)", sField.dataType.simpleString)
    // crash-safety staging leaves no litter
    assert(!new java.io.File(dir).listFiles().exists(_.getName.contains("maintain_")))
  }
}
