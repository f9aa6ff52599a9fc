package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A minimal OFFSET-RANGED micro-batch source over an append-only
  * file-backed log — the admissible half of the Kafka boundary (r13
  * verdict task #4). The spark-sql-kafka connector jar is
  * environment-blocked in this container (zero egress, not in any local
  * cache — see [[StreamSource.kafka]]'s scaladoc), so this source
  * implements, from the public DataSource V2 API alone, the exact
  * source-progress surface that connector exercises:
  *
  *   - records live at offsets within partitions (`dir/p<N>.log`, one
  *     record per line, offset = line index) — not at file grain, which
  *     is what separates this from [[StreamSource.fileDrop]]'s
  *     FileStreamSource semantics;
  *   - [[MicroBatchStream.latestOffset]] reports current per-partition
  *     line counts; the engine persists the consumed range in its
  *     checkpoint offset log; [[MicroBatchStream.planInputPartitions]]
  *     serves exactly the (start, end] range the engine asks for, one
  *     [[InputPartition]] per log partition;
  *   - replay is DETERMINISTIC: the same offset range always yields the
  *     same lines, so a restarted query re-reads precisely its
  *     uncommitted range and nothing else (StreamSourceSpec pins
  *     no-reprocessing across a stop/restart);
  *   - `commit(end)` is a no-op — the log retains data like a Kafka
  *     topic under retention; `initialOffset` is all-partitions-at-0
  *     (the `startingOffsets=earliest` contract).
  *
  * The record schema is the CONNECTOR'S fixed shape — (key, value,
  * topic, partition, offset, timestamp, timestampType) — so
  * [[StreamSource.kafkaProject]] (the Spark-side projection with the
  * poison-message contract) runs on top of this source end-to-end,
  * unchanged. Swapping in the real connector at deploy time changes
  * ONLY the `.format(...)` line.
  *
  * Line format: `base64(key)\tbase64(value)\ttimestampMillis`, with `-`
  * for a null key/value (a `-` value is a tombstone, which
  * kafkaProject drops). The producer ([[FileLog.append]]) is a
  * test/spec utility: single-writer, append-only, newline-terminated
  * writes so a concurrent reader never sees a torn record.
  */
object FileLog {

  /** The Kafka connector's record schema, verbatim. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Open the log at `dir` as a streaming DataFrame. */
  def stream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .format(classOf[FileLogSourceProvider].getName)
      .option("path", dir)
      .load()

  /** Append records (key, value, timestampMillis) to one log partition;
    * null key/value allowed (tombstones). Spec-side producer. */
  def append(dir: String, partition: Int,
             records: Seq[(Array[Byte], Array[Byte], Long)]): Unit = {
    val d = new File(dir); d.mkdirs()
    val f = new File(d, s"p$partition.log")
    def b64(a: Array[Byte]): String =
      if (a == null) "-" else Base64.getEncoder.encodeToString(a)
    val lines = records
      .map { case (k, v, ts) => s"${b64(k)}\t${b64(v)}\t$ts\n" }.mkString
    val out = new java.io.FileOutputStream(f, true)
    try { out.write(lines.getBytes(UTF_8)); out.getFD.sync() }
    finally out.close()
  }

  /** Convenience: append UTF-8 string payloads with null keys. */
  def appendValues(dir: String, partition: Int, values: Seq[String],
                   tsMillis: Long = 0L): Unit =
    append(dir, partition,
      values.map(v => (null: Array[Byte], Option(v).map(_.getBytes(UTF_8)).orNull, tsMillis)))

  private[sources] def partitionFiles(dir: String): Map[Int, File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        val m = "^p(\\d+)\\.log$".r.findFirstMatchIn(f.getName)
        m.map(g => g.group(1).toInt -> f)
      }.toMap

  private[sources] def lineCount(f: File): Long = {
    // count TERMINATED lines only: a half-flushed final line (torn
    // write) is invisible until its newline lands
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
    try {
      var n = 0L; var c = in.read()
      while (c >= 0) { if (c == '\n') n += 1; c = in.read() }
      n
    } finally in.close()
  }
}

/** Per-partition consumed positions; `json()` is the engine's durable
  * representation in the checkpoint offset log, so it must be
  * deterministic — keys sorted. */
case class FileLogOffset(counts: Map[Int, Long]) extends Offset {
  override def json(): String =
    counts.toSeq.sorted
      .map { case (p, n) => s""""$p":$n""" }.mkString("{", ",", "}")
}

object FileLogOffset {
  def fromJson(s: String): FileLogOffset = {
    val body = s.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) FileLogOffset(Map.empty)
    else FileLogOffset(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":").map(_.trim)
      k.stripPrefix("\"").stripSuffix("\"").toInt -> v.toLong
    }.toMap)
  }
}

/** Zero-arg provider, addressed by class name:
  * `spark.readStream.format(classOf[FileLogSourceProvider].getName)`. */
class FileLogSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "filelog source requires .option(\"path\", <log dir>)")
    new FileLogTable(path)
  }
}

class FileLogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"filelog($path)"
  override def schema(): StructType = FileLog.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // the kafka connector's maxOffsetsPerTrigger knob, record-grained:
    // bounds how far one micro-batch may advance — the day-one
    // production control for catch-up batch sizes after downtime
    val maxPerTrigger = Option(options.get("maxRecordsPerTrigger")).map(_.toLong)
    // startingOffsets ∈ {earliest (default), latest}: latest begins a
    // FRESH query at the current log end (live tailing without the
    // backlog); like the connector, it only governs the first start —
    // a checkpointed restart always resumes from its own offsets
    val startLatest =
      Option(options.get("startingOffsets")).exists(_.equalsIgnoreCase("latest"))
    () => new Scan {
      override def readSchema(): StructType = FileLog.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new FileLogMicroBatchStream(path, maxPerTrigger, startLatest)
      // batch read: everything currently in the log — the connector's
      // startingOffsets=earliest/endingOffsets=latest backfill shape
      // (`spark.read.format("kafka")`), sharing the streaming reader
      override def toBatch(): org.apache.spark.sql.connector.read.Batch =
        new org.apache.spark.sql.connector.read.Batch {
          private val stream = new FileLogMicroBatchStream(path)
          override def planInputPartitions(): Array[InputPartition] =
            stream.planInputPartitions(
              FileLogOffset(Map.empty), stream.latestOffset())
          override def createReaderFactory(): PartitionReaderFactory =
            new FileLogReaderFactory
        }
    }
  }
}

class FileLogMicroBatchStream(path: String, maxPerTrigger: Option[Long] = None,
                              startLatest: Boolean = false)
  extends MicroBatchStream with SupportsAdmissionControl {
  private def topicName = new File(path).getName

  /** earliest (default): every partition present NOW starts at 0;
    * latest: at its current line count, so a fresh query tails only
    * what arrives after start. Partitions that appear later enter
    * `latestOffset` and default to start 0 in `planInputPartitions`
    * (Kafka's new-partition discovery contract). */
  override def initialOffset(): Offset =
    if (startLatest) latestOffset()
    else FileLogOffset(FileLog.partitionFiles(path).keys.map(_ -> 0L).toMap)

  override def latestOffset(): Offset =
    FileLogOffset(FileLog.partitionFiles(path)
      .map { case (p, f) => p -> FileLog.lineCount(f) })

  /** Admission control (the connector's maxOffsetsPerTrigger surface):
    * when the engine passes a ReadMaxRows limit, the returned end offset
    * advances at most `cap` records past `start`, allocated across
    * partitions PROPORTIONALLY to their backlog (Kafka's rate-limit
    * rule) with any rounding remainder dealt deterministically by
    * ascending partition id — so a bounded catch-up after downtime
    * drains every partition, not just the first listed. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val unbounded = latestOffset().asInstanceOf[FileLogOffset]
    limit match {
      case m: ReadMaxRows =>
        val s = start.asInstanceOf[FileLogOffset].counts
        val avail = unbounded.counts.map { case (p, end) =>
          p -> (end - s.getOrElse(p, 0L)).max(0L) }
        val total = avail.values.sum
        val cap = m.maxRows()
        if (total <= cap) unbounded
        else {
          val base = avail.map { case (p, a) => p -> cap * a / total }
          var leftover = cap - base.values.sum
          val counts = avail.toSeq.sorted.map { case (p, a) =>
            val extra = if (leftover > 0 && base(p) < a) { leftover -= 1; 1L } else 0L
            p -> (s.getOrElse(p, 0L) + math.min(a, base(p) + extra))
          }.toMap
          FileLogOffset(counts)
        }
      case _: ReadAllAvailable => unbounded
      case _ => unbounded // composite/minRows: serve everything available
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def reportLatestOffset(): Offset = latestOffset()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileLogOffset].counts
    val e = end.asInstanceOf[FileLogOffset].counts
    val files = FileLog.partitionFiles(path)
    e.toSeq.sorted.flatMap { case (p, endLine) =>
      val startLine = s.getOrElse(p, 0L)
      if (endLine > startLine)
        files.get(p).map(f =>
          FileLogInputPartition(f.getAbsolutePath, topicName, p, startLine, endLine))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FileLogReaderFactory

  override def deserializeOffset(json: String): Offset = FileLogOffset.fromJson(json)
  override def commit(end: Offset): Unit = () // retention: the log keeps data
  override def stop(): Unit = ()
}

case class FileLogInputPartition(file: String, topic: String, partition: Int,
                                 startLine: Long, endLine: Long) extends InputPartition

class FileLogReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ip = p.asInstanceOf[FileLogInputPartition]
    new PartitionReader[InternalRow] {
      private val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
        new java.io.FileInputStream(ip.file), UTF_8))
      private var line: String = _
      private var pos = 0L
      // seek to startLine (offsets are line indexes; ranges are replayed
      // deterministically — the exactly-once contract)
      while (pos < ip.startLine && reader.readLine() != null) pos += 1

      override def next(): Boolean = {
        if (pos >= ip.endLine) return false
        line = reader.readLine()
        if (line == null) return false // torn tail: unreachable via lineCount
        pos += 1
        true
      }

      override def get(): InternalRow = {
        val parts = line.split("\t", -1)
        // a corrupt frame (truncated disk, torn producer) degrades to a
        // TOMBSTONE (null key/value) instead of throwing: a throw here
        // wedges the stream forever — the offset range replays on every
        // restart and re-hits the same bad line. Downstream drops null
        // values at the kafkaProject boundary like any tombstone.
        def bytes(s: String): Array[Byte] =
          if (s == "-") null
          else try Base64.getDecoder.decode(s)
          catch { case _: IllegalArgumentException => null }
        val ok = parts.length >= 2
        val ts =
          if (parts.length > 2)
            try parts(2).toLong catch { case _: NumberFormatException => 0L }
          else 0L
        InternalRow(
          if (ok) bytes(parts(0)) else null,
          if (ok) bytes(parts(1)) else null,
          UTF8String.fromString(ip.topic),
          ip.partition,
          pos - 1, // offset of the record just read
          ts * 1000L, // millis → micros
          0) // timestampType: CREATE_TIME, the connector's default
      }

      override def close(): Unit = reader.close()
    }
  }
}
