package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation of the fire signal for a camera (FIXTURES.md
  * `fire_signal` shape; semantics from `main.py:171-185`). */
case class FireSignal(camera_id: String, ts: Timestamp, fire: Boolean)

/** Emitted exactly once per rising edge. */
case class Alert(camera_id: String, ts: Timestamp)

/** Per-camera latch state. */
case class AlarmState(latched: Boolean)

/** E-STATE — edge-triggered alarm latch (SURVEY §2.2 P13, §7.4 hard part
  * #2): the engine form of the reference's `Alarm_Status`/`Sound_Played`
  * module globals (`main.py:11-23, 171-185, 264-266`).
  *
  * Truth table (per camera, event-time order):
  *   F→T  emit alert, latch
  *   T→T  silent (latched)
  *   T→F  re-arm, silent
  *   F→F  silent
  *
  * The reference's flags are racy (`threading.Thread` + unsynchronized
  * globals, `main.py:51-57`); here the latch is per-key state in
  * `flatMapGroupsWithState`, so exactly-once-per-edge holds across
  * micro-batch boundaries and checkpoint recovery by construction.
  * Batch/oracle analog: `lag(fire) OVER (PARTITION BY camera ORDER BY ts)`
  * — Relational.windowAlarmEdge / q_win_edge.
  */
object AlarmLatch {

  /** The latch step. Sorts the micro-batch's rows for the key by event
    * time (micro-batch delivery order is not guaranteed). */
  def latchFn(camera: String, rows: Iterator[FireSignal],
              state: GroupState[AlarmState]): Iterator[Alert] = {
    var latched = state.getOption.exists(_.latched)
    val alerts = scala.collection.mutable.ArrayBuffer.empty[Alert]
    rows.toSeq.sortBy(s => (s.ts.getTime, s.fire)).foreach { s =>
      if (s.fire) {
        if (!latched) { alerts += Alert(camera, s.ts); latched = true }
      } else latched = false
    }
    state.update(AlarmState(latched))
    alerts.iterator
  }

  /** Apply the latch to a (streaming or batch) dataset of fire signals. */
  def apply(signals: Dataset[FireSignal]): Dataset[Alert] = {
    implicit val alertEnc = Encoders.product[Alert]
    implicit val stateEnc = Encoders.product[AlarmState]
    import signals.sparkSession.implicits._
    signals
      .groupByKey(_.camera_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(latchFn)
  }
}
