package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The alarm latch on Spark 4's `transformWithState` arbitrary-state API —
  * same truth table as AlarmLatch (`main.py:171-185`), but with the
  * engine's forward-looking state surface: named `ValueState` handles,
  * per-state TTL, timer support, and RocksDB-backed state with changelog
  * checkpointing on a real cluster.
  *
  * Kept alongside the `flatMapGroupsWithState` version deliberately: both
  * APIs are part of the committed engine surface (SURVEY E-STATE), and the
  * spec asserts they emit identical alerts on the same replay.
  */
class LatchProcessor extends StatefulProcessor[String, FireSignal, Alert] {

  @transient private var latched: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    latched = getHandle.getValueState[Boolean]("latched", Encoders.scalaBoolean, TTLConfig.NONE)

  override def handleInputRows(camera: String, rows: Iterator[FireSignal],
                               timerValues: TimerValues): Iterator[Alert] = {
    var isLatched = Option(latched.get()).getOrElse(false)
    val alerts = scala.collection.mutable.ArrayBuffer.empty[Alert]
    rows.toSeq.sortBy(s => (s.ts.getTime, s.fire)).foreach { s =>
      if (s.fire) {
        if (!isLatched) { alerts += Alert(camera, s.ts); isLatched = true }
      } else isLatched = false
    }
    latched.update(isLatched)
    alerts.iterator
  }
}

object AlarmLatchV2 {
  /** Apply the latch via transformWithState (streaming only). */
  def apply(signals: Dataset[FireSignal]): Dataset[Alert] = {
    import signals.sparkSession.implicits._
    signals
      .groupByKey(_.camera_id)
      .transformWithState(new LatchProcessor, TimeMode.None(), OutputMode.Append())
  }
}
