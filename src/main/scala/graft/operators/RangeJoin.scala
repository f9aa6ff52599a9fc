package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E-RANGE (bonus operator beyond the reference surface): interval
  * containment join — match point-timestamped left rows into right-side
  * time windows on a shared key.
  *
  * Scale shape: a raw `l.ts BETWEEN r.start AND r.end` predicate gives
  * Catalyst no equi-key, so it plans a per-key nested loop (quadratic in
  * the key's row count). This operator buckets time into fixed-width
  * cells: each window explodes to the cells it overlaps, each point maps
  * to exactly one cell, and the match becomes a (key, cell) EQUI-join
  * followed by the exact range filter. Every true pair meets exactly once
  * (a point lives in one cell), so no dedupe is needed. Shuffle volume is
  * rows × (window_span/cell + 1) — linear, the plan that holds at 100 TB.
  */
object RangeJoin {

  /** q_range_join: clicks within the hour before each purchase, counted
    * per purchase — "interactions inside the attribution window". Cell
    * width = window length (1 h), so each window spans ≤ 2 cells. */
  def rangeJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val cellUs = 3600L * 1000000L // 1 hour in microseconds
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("cus"))
      .withColumn("cell", expr(s"cus div ${cellUs}L"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("pus"),
        col("event_id").as("purchase_id"))
      .withColumn("cell",
        explode(sequence(expr(s"(pus - ${cellUs}L) div ${cellUs}L"),
          expr(s"pus div ${cellUs}L"))))
    clicks.join(purchases, Seq("user_id", "cell"))
      .filter(col("cus") >= col("pus") - cellUs && col("cus") <= col("pus"))
      .groupBy("user_id", "purchase_id")
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy("user_id", "purchase_id")
  }
}
