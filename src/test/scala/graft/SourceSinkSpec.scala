package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.streaming.{AlarmLatch, FireSignal, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Sources & sinks (SURVEY S1/S5/S7): a real parquet file-stream source
  * driving the crowd pipeline, the append sink (S5 row insert), the
  * foreachBatch side-effect sink (S7), HLL approx-distinct at the scan,
  * and latch state surviving a checkpoint restart. */
class SourceSinkSpec extends SparkSpec {

  test("S1: parquet file source streams the events fixture through crowdAlert") {
    val dir = Files.createTempDirectory("events_stream").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(Schemas.events).parquet(dir)
    val q = StreamOps.crowdAlert(stream)
      .writeStream.outputMode("update").format("memory").queryName("file_crowd").start()
    try q.processAllAvailable() finally q.stop()
    import spark.implicits._
    val streamed = spark.table("file_crowd")
      .select(unix_timestamp(col("win_start")).as("w"), col("user_id"))
      .as[(Long, Long)].collect().toSet
    val batch = StreamOps.crowdAlert(Tables.events(spark, sf))
      .select(unix_timestamp(col("win_start")).as("w"), col("user_id"))
      .as[(Long, Long)].collect().toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("S2/S5: orc round-trips with schema carried in the file (the non-parquet columnar store)") {
    val base = Files.createTempDirectory("graft_orc").toString
    val src = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
    src.write.orc(s"$base/orc")
    val back = spark.read.orc(s"$base/orc")
    // columnar self-describing format: schema survives without re-declaring
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // predicate pushdown reaches the ORC scan like parquet's
    val plan = back.filter(org.apache.spark.sql.functions.col("event_id") < 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), LessThan(event_id,10)]"),
      s"no pushed filter in ORC scan:\n$plan")
  }

  test("S2/S5: csv and json formats round-trip under a declared schema") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_fmt").toString
    val src = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").limit(100)
    // text formats are interchange surfaces, not storage: always written
    // and re-read under the DECLARED schema (inference is a job of its
    // own and type-drifts silently — the S2 lesson)
    src.write.option("header", "true").csv(s"$base/csv")
    src.write.json(s"$base/json")
    def back(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, String, Double)].collect().toSet
    val want = back(src)
    assert(back(spark.read.option("header", "true").schema(src.schema).csv(s"$base/csv")) == want)
    assert(back(spark.read.schema(src.schema).json(s"$base/json")) == want)
  }

  test("S5: append sink — row inserts accumulate (the register() path)") {
    val dir = Files.createTempDirectory("users_sink").toString + "/users"
    val u1 = Tables.customer(spark, sf).limit(10)
    u1.write.mode("append").parquet(dir)
    u1.write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 20)
  }

  test("S7: foreachBatch alert sink fires per micro-batch with the alert rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val input = MemoryStream[FireSignal]
    val q = AlarmLatch(input.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.Alert], id: Long) =>
        seen.synchronized { seen ++= batch.collect().map(a => (id, a.camera_id)) }
        ()
      }
      .start()
    try {
      input.addData(Seq(FireSignal("c1", new Timestamp(1000), true)))
      q.processAllAvailable()
      input.addData(Seq(FireSignal("c1", new Timestamp(2000), false),
        FireSignal("c1", new Timestamp(3000), true)))
      q.processAllAvailable()
    } finally q.stop()
    assert(seen.map(_._2).toSeq == Seq("c1", "c1")) // one alert per rising edge
    assert(seen.map(_._1).distinct.length == 2)     // delivered across two micro-batches
  }

  test("E-AGG HLL: approx_count_distinct within 5% of exact at the fixture scale") {
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("exact"),
        approx_count_distinct("user_id").as("approx"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$t: $approx vs $exact")
    }
  }

  test("E-AGG sketch quantiles: percentile_approx within 5% of the exact percentile") {
    import spark.implicits._
    val approx = operators.Relational.quantilesApprox(spark, sf)
      .select("source", "p50", "p90").as[(String, Long, Long)].collect()
      .map { case (s, a, b) => s -> ((a, b)) }.toMap
    val exact = operators.Relational.quantiles(spark, sf)
      .select("source", "p50", "p90").as[(String, Double, Double)].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (s, e50, e90) =>
      val (a50, a90) = approx(s)
      assert(math.abs(a50 - e50) / e50 < 0.05, s"$s p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.05, s"$s p90: $a90 vs $e90")
    }
  }

  test("E-STATE: latch state survives a checkpoint restart (no duplicate alert)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("latch_ckpt").toString
    val out = Files.createTempDirectory("latch_out").toString
    val input = MemoryStream[FireSignal]

    // memory sink can't recover from a checkpoint; the parquet sink can
    def start() = AlarmLatch(input.toDS()).writeStream
      .outputMode("append").format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    try { input.addData(Seq(FireSignal("c", new Timestamp(1000), true))); q1.processAllAvailable() }
    finally q1.stop()

    // restart from the checkpoint: still latched — a continuing T must NOT re-alert
    val q2 = start()
    try {
      input.addData(Seq(FireSignal("c", new Timestamp(2000), true),
        FireSignal("c", new Timestamp(3000), false),
        FireSignal("c", new Timestamp(4000), true)))
      q2.processAllAvailable()
    } finally q2.stop()

    val alerts = spark.read.parquet(out).as[graft.streaming.Alert]
      .collect().map(_.ts.getTime / 1000).sorted.toSeq
    assert(alerts == Seq(1L, 4L)) // edge before restart + edge after re-arm; t=2000 suppressed
  }
}
