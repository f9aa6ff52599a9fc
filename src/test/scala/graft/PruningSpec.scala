package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Partition-pruning proof (E-SCAN, SURVEY §2.3): a date-ranged filter
  * over the date-partitioned events twin must resolve against directory
  * names — the scan carries PartitionFilters and opens only the matching
  * day-partitions, never the whole table. */
class PruningSpec extends SparkSpec {

  test("date filter prunes partitions: PartitionFilters set, 7 of 30 days read") {
    // AQE wraps materialized stages in leaf QueryStageExec nodes that
    // plan.collect cannot cross; pruning is orthogonal to AQE, so turn it
    // off for this one measurement to get a traversable plan with metrics.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val (scans, _) = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Relational.datePruned(spark, sf)
      df.collect() // execute so scan metrics are populated
      (df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }, ())
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert(scans.nonEmpty, "no FileSourceScanExec in the plan")
    val scan = scans.head
    val pf = scan.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("event_date"), s"no event_date partition filter in scan: $pf")

    val filesRead = scan.metrics("numFiles").value
    val totalDays = Tables.eventsByDate(spark, sf)
      .select("event_date").distinct().count()
    assert(totalDays == 30, s"fixture spans $totalDays days, expected 30")
    // eventsByDate repartitions by event_date before the partitioned write,
    // so each day directory holds exactly one file: 7 pruned days = 7 files
    assert(filesRead == 7, s"scan read $filesRead files; pruning + one-file-per-day should make it exactly 7")
  }

  test("pruned result equals the unpartitioned filter") {
    val pruned = Relational.datePruned(spark, sf).collect().toSeq
    val plain = Tables.events(spark, sf)
      .filter(col("ts").cast("date").between(lit("2024-01-08").cast("date"), lit("2024-01-14").cast("date")))
      .groupBy(date_format(col("ts").cast("date"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("total_value"))
      .orderBy("day", "event_type")
      .collect().toSeq
    assert(pruned == plain)
  }

  test("dynamic partition pruning: runtime dim values reach the fact scan's PartitionFilters") {
    // static pruning (above) resolves literals at plan time; q_dpp's
    // Sunday set only exists after the dim scan runs, so the fact scan
    // must carry a dynamicpruningexpression instead of a literal IN.
    // (AQE leaf-stage wrapping hides FileSourceScanExec from collect —
    // same workaround as the static test above.)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val pf = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val scans = operators.Scale.dppQuery(spark, sf)
        .queryExecution.executedPlan.collect {
          case s: FileSourceScanExec
            if s.metadata.get("Location").exists(_.contains("graft_events_by_date")) => s
        }
      assert(scans.nonEmpty, "no partitioned-events scan in the plan")
      scans.head.metadata.getOrElse("PartitionFilters", "")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert(pf.contains("dynamicpruning"),
      s"fact scan lacks a dynamic pruning filter: $pf")
    val df = operators.Scale.dppQuery(spark, sf)
    // and the result matches the unpartitioned recomputation
    val viaDpp = df.collect().toSeq
    val plain = Tables.events(spark, sf)
      .filter(dayofweek(to_date(col("ts"))) === 1)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("total_value"))
      .orderBy("day").collect().toSeq
    assert(viaDpp.nonEmpty && viaDpp == plain)
  }

  test("multi-distinct aggregates via one Expand, not repeated fact scans") {
    val df = Relational.multiDistinct(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"multi-distinct should plan an Expand:\n${plan.take(1200)}")
    val factScans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(factScans == 1, s"expected a single events scan, got $factScans")
  }
}
