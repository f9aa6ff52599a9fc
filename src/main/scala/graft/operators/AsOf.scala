package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E-ASOF (bonus operator beyond the reference surface): point-in-time
  * join — for each left row, the most recent right row with the same key
  * and right.ts ≤ left.ts. The feature-store / training-data staple
  * (pandas merge_asof): "attach the last sensor reading / click / state
  * known at this event's time", without leaking the future.
  *
  * Scale shape: a naive `a JOIN b ON a.k = b.k AND b.ts <= a.ts` plus a
  * per-pair max makes Spark plan a range join (broadcast-nested-loop or an
  * exploding equi+filter) — quadratic per key. This operator instead tags
  * and UNIONS the two sides and takes `last(value, ignoreNulls) OVER
  * (PARTITION BY key ORDER BY ts, side, tiebreak)` — one hash exchange on
  * the key and one per-key sort, linear in rows, the same plan at 100 TB
  * as at sf0.01. Right rows sort before left rows at equal ts (side 0 < 1)
  * so a same-instant observation is visible, matching the ≤ contract.
  */
object AsOf {

  /** left ⟕asof right on `key`, event time `ts`. `rightVal` is carried to
    * matched left rows (null when no right row precedes). `rightTiebreak`
    * makes the pick among equal-ts right rows deterministic (max wins). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightVal: String, rightTiebreak: String): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == ts)
    val valType = right.schema(rightVal).dataType
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(valType))
      .withColumn("_rtb", lit(null).cast(right.schema(rightTiebreak).dataType))
    val r = right
      .select(col(key), col(ts),
        lit(0).as("_side"), col(rightVal).as("_rv"), col(rightTiebreak).as("_rtb"))
      .withColumns(leftCols.map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("_side"), col("_rtb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn(rightVal, last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_rv", "_rtb")
  }

  /** q_asof_join: each purchase event enriched with the id of the user's
    * most recent click at-or-before the purchase instant (null if none) —
    * the "last interaction before conversion" attribution query. */
  def asofQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    // no-prior-click → -1 sentinel, not NULL: the driver's pandas
    // comparator maps parquet nullable ints to float NaN on one side and
    // object None on the other, so a nullable key column risks a spurious
    // hash mismatch (same fragility that broke ARRAY outputs in round 1)
    asOfJoin(purchases, clicks, "user_id", "ts", "click_id", "click_id")
      .select(col("user_id"), col("purchase_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"))
      .orderBy("user_id", "purchase_id")
  }
}
