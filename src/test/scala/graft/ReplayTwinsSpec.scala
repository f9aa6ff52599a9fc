package graft

import java.sql.Timestamp
import graft.operators.Relational
import graft.streaming.{Alert, AlarmLatch, FireSignal, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The replay-twin contract behind q_latch_replay / q_session_replay: the
  * batch formulations must emit EXACTLY what the streaming operators emit
  * when the same rows are replayed one-per-micro-batch in arrival order.
  * (AlarmLatchSpec separately pins AlarmLatch ≡ AlarmLatchV2 on replay, so
  * driving the fMGWS latch here binds the twin to both APIs.)
  *
  * These scenarios are chosen to force every branch the fixture queries
  * rely on: out-of-order arrival, a late row below the watermark, a
  * watermark-boundary row, an idle-timeout split (fresh session after
  * eviction), and an open session withheld at end of stream.
  */
class ReplayTwinsSpec extends SparkSpec {

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  test("latch replay twin: arrival-order lag formulation ≡ streaming latch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (camera, event ts, fire) in ARRIVAL order — deliberately not ts order
    val arrived = Seq(
      ("c1", 5L, false), ("c1", 3L, true), ("c1", 9L, true),
      ("c2", 7L, true),
      ("c1", 1L, false), ("c1", 2L, true),
      ("c2", 8L, false), ("c2", 4L, true))
    val input = MemoryStream[FireSignal]
    val q = AlarmLatch(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("latch_replay_out").start()
    try arrived.foreach { case (cam, t, f) =>
      input.addData(FireSignal(cam, ts(t), f)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("latch_replay_out").as[Alert].collect()
      .map(a => (a.camera_id, a.ts.getTime / 1000)).sorted.toSeq

    val sig = arrived.zipWithIndex
      .map { case ((cam, t, f), i) => (cam, i.toLong, i.toLong, f, t) }
      .toDF("user_id", "event_id", "arr", "fire", "sig_ts")
    val batch = Relational.latchReplayOn(sig)
      .select("user_id", "sig_ts").as[(String, Long)].collect().sorted.toSeq
    assert(streamed == batch && streamed.nonEmpty,
      s"streamed=$streamed batch=$batch")
  }

  test("session replay twin: window formulation ≡ sessionFinalize eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (event_id, user, sec) in arrival order; gap 1800 s, delay 600 s.
    //  u1 opens at 1000; u9's 10000 advances the watermark to 9400, so
    //  u1's 9400 row probes the exact watermark boundary (dropped — the
    //  late filter is strict, pinned by this test) and 9000 is plainly
    //  late; u9's 20000 then pushes the watermark past u1's deadline →
    //  u1's next row 20000 starts a FRESH session; u9's own rows keep
    //  merging (deadline never passed) → withheld at the end.
    //  Tail rows probe the TIMEOUT boundary: u2 opens at 100000 (deadline
    //  101800); u9's 102400 advances the watermark to exactly 101800 —
    //  the timeout must NOT fire at equality (strict), so u2's 103000
    //  merges into the same session rather than starting a fresh one.
    val arrived = Seq(
      (0L, 1L, 1000L), (1L, 9L, 10000L), (2L, 1L, 9400L), (3L, 1L, 9000L),
      (4L, 9L, 20000L), (5L, 1L, 20000L), (6L, 9L, 100000L),
      (7L, 2L, 100000L), (8L, 9L, 102400L), (9L, 2L, 103000L),
      (10L, 9L, 200000L))
    val input = MemoryStream[Ev]
    val q = StreamOps.sessionFinalize(input.toDF(), "30 minutes", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("session_replay_out").start()
    try arrived.foreach { case (id, u, s) =>
      input.addData(Ev(id, ts(s), u, "view", 1.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("session_replay_out")
      .select(col("user_id"), unix_timestamp(col("sess_start")).as("s"),
        unix_timestamp(col("sess_end")).as("e"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

    val ev = arrived.zipWithIndex
      .map { case ((id, u, s), i) => (id, u, s, i.toLong) }
      .toDF("event_id", "user_id", "sec", "arr")
    val batch = Relational.sessionReplayOn(ev, delaySec = 600L, gapSec = 1800L)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(streamed == batch && streamed.nonEmpty,
      s"streamed=$streamed batch=$batch")
    // the withheld open session is the contract's other half: u9 must not
    // appear in either output
    assert(!streamed.exists(_._1 == 9L), s"u9's open session leaked: $streamed")
  }
}
