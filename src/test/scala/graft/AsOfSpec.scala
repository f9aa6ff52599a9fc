package graft

import java.sql.Timestamp
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** E-ASOF point-in-time join: known-answer micro cases (no-match,
  * strictly-prior match, same-instant match, equal-ts tiebreak) and the
  * scale-shape guarantee — one hash exchange, no nested-loop range join. */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("as-of semantics: latest right row at or before each left ts") {
    val purchases = Seq(
      (1L, ts(0), 5L),   // before any click -> null
      (1L, ts(2), 20L),  // same instant as click 30 -> 30 (<= contract)
      (1L, ts(9), 21L),  // after clicks 10,30 -> latest is 30 (ts 2)
      (2L, ts(5), 50L),  // two clicks at ts 5 -> max tiebreak 41
      (3L, ts(1), 60L)   // user with no clicks at all -> null
    ).toDF("user_id", "ts", "purchase_id")
    val clicks = Seq(
      (1L, ts(1), 10L),
      (1L, ts(2), 30L),
      (2L, ts(5), 40L),
      (2L, ts(5), 41L)
    ).toDF("user_id", "ts", "click_id")
    val got = AsOf.asOfJoin(purchases, clicks, "user_id", "ts", "click_id", "click_id")
      .select("purchase_id", "click_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(
      5L -> None, 20L -> Some(30L), 21L -> Some(30L), 50L -> Some(41L), 60L -> None))
  }

  test("range join: bucketed equi-join equals the naive range predicate, no nested loop") {
    import graft.operators.RangeJoin
    val got = RangeJoin.rangeJoinQuery(spark, sf)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n${plan.take(1500)}")
    // naive formulation (range predicate in the join) — correctness oracle
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("purchase_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val naive = p.join(c, col("cu") === col("pu")
        && col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") && col("cts") <= col("pts"))
      .groupBy(col("pu").as("user_id"), col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"))
    assert(got.collect().toSeq == naive.orderBy("user_id", "purchase_id").collect().toSeq)
  }

  test("asOfJoin ≡ naive per-row latest-at-or-before on randomized data") {
    // seeded generative check: ties on ts, keys with no right rows, and
    // interleavings the micro cases don't enumerate
    val rnd = new scala.util.Random(42)
    val leftRows = (0 until 300).map(i => (rnd.nextInt(12).toLong, ts(rnd.nextInt(40).toLong), i.toLong))
    val rightRows = (0 until 300).map(i => (rnd.nextInt(12).toLong, ts(rnd.nextInt(40).toLong), (1000 + i).toLong))
    val left = leftRows.toDF("user_id", "ts", "purchase_id")
    val right = rightRows.toDF("user_id", "ts", "click_id")
    val got = AsOf.asOfJoin(left, right, "user_id", "ts", "click_id", "click_id")
      .select("purchase_id", "click_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val expected = leftRows.map { case (k, lts, pid) =>
      val matches = rightRows.filter { case (rk, rts, _) => rk == k && !rts.after(lts) }
      pid -> (if (matches.isEmpty) None
              else Some(matches.maxBy { case (_, rts, rid) => (rts.getTime, rid) }._3))
    }.toMap
    assert(got == expected)
  }

  test("plan shape: one hash exchange on the key, no nested-loop range join") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val plan = AsOf.asOfJoin(purchases, clicks, "user_id", "ts", "click_id", "click_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"as-of degenerated to a range join:\n${plan.take(1500)}")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one key exchange:\n${plan.take(1500)}")
  }
}
