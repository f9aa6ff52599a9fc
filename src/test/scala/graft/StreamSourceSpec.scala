package graft

import graft.sources.StreamSource
import org.apache.spark.sql.functions._

/** S1 source matrix (SURVEY §2.2): the rate source drives a live
  * multi-camera union with no external broker; the Kafka wiring is present
  * behind the same surface and fails loudly (not silently) when the
  * connector jar is absent, which is this container's deploy contract. */
class StreamSourceSpec extends SparkSpec {

  test("rate source: two synthetic cameras union into one live stream") {
    val cams = Seq("cam_a", "cam_b").map(StreamSource.rateEvents(spark, 200, _))
    val unioned = StreamSource.multiCamera(cams)
      .groupBy("camera_id", "event_type")
      .agg(count(lit(1)).as("n"))
    val q = unioned.writeStream
      .outputMode("complete").format("memory").queryName("rate_cams").start()
    try {
      // rate is wall-clock-driven: give it time to emit, then drain
      val deadline = System.currentTimeMillis() + 20000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        q.processAllAvailable()
        done = spark.table("rate_cams")
          .select(countDistinct("camera_id")).head().getLong(0) == 2
      }
    } finally q.stop()
    val rows = spark.table("rate_cams").collect()
    val cameras = rows.map(_.getString(0)).toSet
    assert(cameras == Set("cam_a", "cam_b"), s"missing cameras in $cameras")
    assert(rows.map(_.getLong(2)).sum > 0)
  }

  test("rate source rows carry the events schema downstream pipelines expect") {
    val df = StreamSource.rateEvents(spark, 1, "c")
    assert(df.isStreaming)
    assert(df.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "camera_id"))
  }

  test("kafka wiring: parses to the events schema with the connector jar, fails loudly without it") {
    // deploy-adaptive: the connector (spark-sql-kafka-0-10) is a
    // deploy-time jar. When a deployment ships it, building the source
    // needs no broker until .start(), so the declared-schema projection is
    // checkable right here; in this container (jar absent) the same call
    // must fail with the standard missing-data-source error, not degrade
    // silently.
    val jarPresent =
      try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
      catch { case _: ClassNotFoundException => false }
    if (jarPresent) {
      val df = StreamSource.kafka(spark, "localhost:9092", "events", Schemas.events)
      assert(df.isStreaming)
      assert(df.columns.toSeq == Schemas.events.fieldNames.toSeq)
    } else {
      val e = intercept[Exception] {
        StreamSource.kafka(spark, "localhost:9092", "events", Schemas.events)
      }
      val msg = e.getMessage.toLowerCase
      assert(msg.contains("kafka"), s"unexpected error: $msg")
    }
  }
}
