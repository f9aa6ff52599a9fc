package graft.pipeline

import graft.operators.Nms
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's whole dataflow as one composable pipeline (SURVEY §3.1):
  *
  *   frames (S1) → score UDF (P1/P2) → per-detection confidence filter
  *   (P6) → person-class gate via the class dim (P7) → row-local NMS (P9)
  *   → person count (P10) → crowd threshold (P11) → label (P19); alerts
  *   feed the AlarmLatch (P13/E-STATE) downstream.
  *
  * Everything after the score UDF is row-local column algebra: detections
  * stay nested per frame row, so the hot path has ZERO shuffles — it
  * scales linearly with frame count and runs unchanged under
  * `readStream` (micro-batch) or batch. This is the engine answer to the
  * reference's frame-at-a-time loop (`main.py:145-270`): same per-frame
  * semantics, but planned once and executed data-parallel.
  *
  * The model is pluggable at the `BINARY → ARRAY<STRUCT<...>>` boundary
  * (SURVEY §7.1): `scoreWith` accepts any scoring function; `scoreStub`
  * is the deterministic test stand-in (the real YOLO forward pass lives
  * outside the engine contract).
  */
/** One stub detection (named fields so the UDF's struct schema matches
  * `detectionType`). */
case class Det(x: Int, y: Int, w: Int, h: Int, conf: Double, class_id: Int)

object CrowdPipeline {

  /** Frame record schema (SURVEY §1.1 "unbounded frame stream"). */
  val frameSchema: StructType = StructType(Seq(
    StructField("camera_id", StringType),
    StructField("frame_id", LongType),
    StructField("ts", TimestampType),
    StructField("image", BinaryType)))

  val detectionType: ArrayType = ArrayType(StructType(Seq(
    StructField("x", IntegerType), StructField("y", IntegerType),
    StructField("w", IntegerType), StructField("h", IntegerType),
    StructField("conf", DoubleType), StructField("class_id", IntegerType))))

  /** ======= STUB: stands in for the YOLO forward pass (`main.py:94-96`)
    * Deterministic fake: detection count and geometry derive from byte
    * sums; class ids cycle 0/1/2 with id 0 ("person") most frequent. */
  def scoreStub(image: Array[Byte]): Seq[Det] = {
    if (image == null || image.isEmpty) return Nil
    val sum = image.foldLeft(0L)((a, b) => a + (b & 0xff))
    val n = (sum % 9L).toInt
    (0 until n).map { i =>
      val seed = sum + i * 131
      Det((seed % 300).toInt, (seed % 271).toInt,
        40 + (seed % 5).toInt * 15, 40 + (seed % 7).toInt * 10,
        0.3 + (seed % 70) / 100.0,           // conf in [0.3, 0.99]
        if (i % 4 == 0) (i % 3) else 0)      // mostly person (class 0)
    }
  }
  // =======================================================================

  private val scoreStubUdf = udf((image: Array[Byte]) => scoreStub(image))

  /** Attach detections with the stub model. */
  def score(frames: DataFrame): DataFrame = scoreWith(frames, scoreStubUdf)

  /** Attach detections with any `BINARY → ARRAY<STRUCT>` scorer. */
  def scoreWith(frames: DataFrame, scorer: org.apache.spark.sql.expressions.UserDefinedFunction): DataFrame =
    frames.withColumn("dets", scorer(col("image")))

  private val keepIdxUdf = udf(
    (xs: Seq[Int], ys: Seq[Int], ws: Seq[Int], hs: Seq[Int], confs: Seq[Double],
     confT: Double, iouT: Double) => Nms.keepIndices(xs, ys, ws, hs, confs, confT, iouT))

  /** Per-frame analytics: confidence filter → person gate → row-local NMS
    * → count → threshold → display label. `personClassId` comes from the
    * class dim (tiny, driver-resolved — the reference's in-memory
    * `classes` list, `main.py:47-48`). */
  def personCounts(scored: DataFrame, personClassId: Int = 0,
                   confThreshold: Double = 0.5, iouThreshold: Double = 0.3,
                   crowdThreshold: Int = 3): DataFrame = {
    val persons = filter(col("dets"),
      d => d.getField("class_id") === personClassId)
    def field(name: String): Column = transform(col("persons"), _.getField(name))
    scored
      .withColumn("persons", persons)
      .withColumn("kept", keepIdxUdf(
        field("x"), field("y"), field("w"), field("h"), field("conf"),
        lit(confThreshold), lit(iouThreshold)))
      .withColumn("person_count", size(col("kept")).cast("long"))
      .withColumn("crowded", col("person_count") > crowdThreshold)
      .withColumn("label",
        format_string("Persons: %d", col("person_count")))  // P19, paper p.4 overlay
      .drop("persons")
  }

  /** Full pipeline: frames → per-frame counts (works batch or streaming). */
  def apply(frames: DataFrame, personClassId: Int = 0): DataFrame =
    personCounts(score(frames), personClassId)

  /** The alert stream: crowded frames as (camera_id, ts) fire signals for
    * the AlarmLatch / foreachBatch sink (S7). */
  def alerts(counted: DataFrame): DataFrame =
    counted.filter(col("crowded")).select(col("camera_id"), col("ts"), col("person_count"))
}
