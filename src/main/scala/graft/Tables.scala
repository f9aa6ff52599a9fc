package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** Explicit schemas for the driver fixtures (`/root/repo/FIXTURES.md`).
  *
  * Schemas are declared, never inferred, mirroring the reference's stance:
  * its layouts are fixed positional conventions (the 85-float YOLO tensor,
  * `crowd_detection_backend_model/main.py:107`; positional class ids from
  * `coco.names`, `main.py:47-48`; Django-migration-fixed `auth_user`).
  * Passing the expected schema to the Parquet reader also skips the
  * footer-sampling inference pass — one less scan at 100 TB.
  */
object Schemas {
  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))
}

/** Readers for the fixture tables. Every read carries the explicit schema so
  * Catalyst can prune columns against a known shape and the scan shows the
  * right `ReadSchema` without an inference pass. */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region", Schemas.region)
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation", Schemas.nation)
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer", Schemas.customer)
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier", Schemas.supplier)
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part", Schemas.part)
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders", Schemas.orders)
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem", Schemas.lineitem)
  /** events.ts has shipped as both parquet TIMESTAMP(MICROS) and
    * TIMESTAMP(NANOS) across fixture generations, so the unit is SNIFFED
    * from the parquet footer (a KB-sized driver-side read, no Spark job)
    * rather than assumed. MICROS maps natively to Spark's TimestampType;
    * NANOS is unsupported by the vectorized reader and is read as a nanos
    * long (legacy conf) then converted with integer division — ns epochs
    * exceed 2^53, so a double-typed `/` would silently lose microseconds.
    * Round 8 burned entirely on assuming the wrong unit; never again. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (eventsTsIsNanos(spark, dir)) {
      // deliberately session-scoped, NOT restored: the returned frame is
      // lazy and consults the conf at ACTION time, so an eager restore
      // would break its execution. Blast radius of the leak: a later
      // schema-INFERRED read of some other nanos-annotated parquet in
      // the same session yields LongType instead of the loud
      // unsupported-type error — every engine read declares its schema
      // through this object, so only ad-hoc session reads are affected.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = StructType(Schemas.events.map {
        case StructField("ts", _, n, m) => StructField("ts", LongType, n, m)
        case f => f
      })
      spark.read.schema(raw).parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      read(spark, dir, "events", Schemas.events)
    }
  }

  /** mtime+size signature of `$dir/$table.parquet` — the cache key
    * discipline every fixture-derived cache uses (tsUnitCache,
    * eventsByDate scratch, MlScoring.modelCache): a fixture regenerated
    * IN PLACE must never be answered from state recorded for the
    * previous generation. */
  private[graft] def parquetContentSig(dir: String, table: String): String = {
    val src = new java.io.File(s"$dir/$table.parquet")
    // a path the local File API cannot STAT at all — a remote URI
    // (s3://, hdfs://) or a not-yet-materialized local file — must yield
    // a sig that never equals ANY sig including itself across calls:
    // File(\"s3://...\").lastModified/length both return 0, so a constant
    // here would make every remote-corpus generation look identical and
    // serve stale cached models/units forever. The unique sentinel
    // instead forces every consumer cache to re-probe/refit per call —
    // correct (if slow) until sig computation is routed through the
    // Hadoop FileSystem for the scheme.
    if (!src.exists()) return s"unstat_${System.nanoTime()}"
    val files =
      if (src.isDirectory) Option(src.listFiles()).map(_.toSeq).getOrElse(Nil)
      else Seq(src)
    // empty/unlistable dir:
    // a constant sentinel sig — the footer sniff behind the cache then
    // raises ITS context-bearing error instead of an `empty.max` here.
    // The sentinel deliberately never matches a real sig, so a fixture
    // that MATERIALIZES mid-JVM is re-probed rather than answered stale.
    if (files.isEmpty) "absent"
    else s"${files.map(_.lastModified).max}_${files.map(_.length).sum}"
  }

  private def eventsContentSig(dir: String): String =
    parquetContentSig(dir, "events")

  /** True iff the fixture's `ts` column is annotated TIMESTAMP(NANOS) in
    * the parquet footer. Cached per (directory, content signature): the
    * unit is a property of the fixture GENERATION, not the path — a
    * fixture regenerated in place during one JVM's lifetime flips the
    * entry instead of being read with the stale unit (the exact silent-
    * drift class Preflight guards the process boundary against; this
    * guards the intra-process boundary). */
  private val tsUnitCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def eventsTsIsNanos(spark: SparkSession, dir: String): Boolean = {
    val sig = eventsContentSig(dir)
    // an unstat_ sig is unique PER CALL (non-File-statable path): caching
    // under it would grow the map by one dead entry per events() read —
    // probe fresh instead (the probe itself goes through the Hadoop
    // FileSystem, so remote schemes still resolve correctly)
    if (sig.startsWith("unstat_")) probeTsIsNanos(spark, dir)
    else tsUnitCache.computeIfAbsent(s"$sig|$dir",
      _ => probeTsIsNanos(spark, dir))
  }
  private def probeTsIsNanos(spark: SparkSession, dir: String): Boolean = {
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val hconf = spark.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
      val fs = root.getFileSystem(hconf)
      val file =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).toSeq
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
            .map(_.getPath).minBy(_.getName)
        else root
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, hconf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val ts = schema.getType(schema.getFieldIndex("ts"))
        ts.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        }
      } finally reader.close()
  }

  /** events re-written once per sf dir as a date-partitioned table
    * (`event_date=YYYY-MM-DD/` directories) in scratch space, then read
    * back. Partition layout is THE 100 TB scan lever: a date-ranged query
    * reads only matching directories (the scan's `PartitionFilters`), so
    * cost tracks the queried window, not table size. The fixture ships as
    * a single file, so the partitioned twin is materialized here; a real
    * deployment would ingest straight into this layout. */
  def eventsByDate(spark: SparkSession, dir: String): DataFrame = {
    // scratch key = layout version (v3; bump on layout OR reader-logic
    // change — v2 scratch was written by the stale nanos reader) + fixture
    // content signature (mtime+size of events.parquet), so a regenerated
    // fixture at the same path is never answered from stale scratch
    val sig = eventsContentSig(dir)
    // an unstat_ sig is unique per call — the scratch key would never
    // match, so every call would materialize ANOTHER full copy of the
    // table into local tmp (unbounded disk growth). This fixture helper
    // is local-FS test infrastructure by design; fail loudly for remote
    // dirs instead of silently filling the host.
    require(!sig.startsWith("unstat_"),
      s"eventsByDate requires a locally-statable fixture dir (got $dir); " +
        "for remote storage, ingest into the date-partitioned layout directly")
    val base = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_events_by_date")
    val prefix = "v3_" + dir.replaceAll("[^A-Za-z0-9.]", "_") + "_"
    val scratch = new java.io.File(base, prefix + sig)
    if (!new java.io.File(scratch, "_SUCCESS").exists()) {
      // GC superseded generations of THIS dir before writing the new one:
      // an in-place fixture regeneration changes the sig, and without the
      // sweep every regeneration would leak a full table copy in tmp.
      // A reader STILL SCANNING a superseded generation (a lazy frame
      // obtained before an in-place regeneration) dies with a loud
      // FileNotFoundException when its files vanish — the deliberate
      // trade (r11 audit): regeneration already invalidates in-flight
      // frames semantically, and a loud abort beats both unbounded
      // scratch growth and silently mixing generations
      Option(base.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.startsWith(prefix) && f.getName != prefix + sig
          && !f.getName.contains(".tmp_"))
        .foreach { stale =>
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory)
              Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
            f.delete()
          }
          rm(stale)
        }
      // write into a process-private temp dir, publish by atomic rename:
      // two JVMs (Verify and Bench) may race here and a reader must never
      // see a half-written layout. rename onto an existing dir fails, so
      // the loser just discards its copy and reads the winner's.
      val tmp = new java.io.File(scratch.getPath +
        s".tmp_${ProcessHandle.current().pid()}_${System.nanoTime()}")
      events(spark, dir)
        .withColumn("event_date", expr("CAST(ts AS DATE)"))
        // one shuffle partition per date -> exactly one file per day
        // directory: deterministic file counts for pruning evidence and
        // right-sized files (the 100 TB ingest shape: cluster by the
        // partition key before writing a partitioned layout)
        .repartition(col("event_date"))
        .write.mode("overwrite").partitionBy("event_date").parquet(tmp.getPath)
      if (!tmp.renameTo(scratch)) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(tmp)
      }
    }
    spark.read
      .schema(StructType(Schemas.events :+ StructField("event_date", DateType)))
      .parquet(scratch.getPath)
  }

  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents", Schemas.documents)
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings", Schemas.embeddings)

  /** Exact table row count from parquet FOOTER metadata — a driver-side
    * file-listing + footer read, NO Spark job and no data pages touched.
    * Parquet stores the row count per row group in the footer, so summing
    * footers over the table's files is exact and costs milliseconds even
    * when the table is 100 TB (footers are KB-sized). Used to size
    * sketches (e.g. the contamination Bloom filter) where an exact
    * `count()` would add a full scan to every invocation. */
  def parquetRowCount(spark: SparkSession, dir: String, name: String): Long = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = root.getFileSystem(hconf)
    val files: Seq[org.apache.hadoop.fs.Path] =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map(_.getPath)
      else Seq(root)
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, hconf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try reader.getRecordCount finally reader.close()
    }.sum
  }

  /** S4: relational-store source — the reference keeps its users in an
    * RDBMS (SQLite via the Django ORM: `crowd_surveillance/crowd_surveillance/
    * settings.py:78-83`, point lookups in `app/views.py:27`). Spark's JDBC
    * source covers that substrate; this container ships the Derby embedded
    * driver, and the semantics (pushdown, partitioned read) are
    * driver-agnostic.
    *
    * Filters on the returned frame push down INTO the database
    * (`PushedFilters` on the JDBC scan — the `views.py:27` point lookup
    * becomes a `WHERE username = ?` on the DB side, not a full-table pull). */
  def usersJdbc(spark: SparkSession, url: String, table: String = "users",
                driver: String = "org.apache.derby.jdbc.EmbeddedDriver"): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .load()

  /** Parallel form of `usersJdbc` for big tables: split the key range into
    * `numPartitions` concurrent reads — the JDBC-side analog of a
    * partitioned file scan. Each executor issues its own bounded-range
    * query, so a dimension too big for one connection still loads wide. */
  def usersJdbcPartitioned(spark: SparkSession, url: String, table: String,
                           partitionColumn: String, lowerBound: Long, upperBound: Long,
                           numPartitions: Int,
                           driver: String = "org.apache.derby.jdbc.EmbeddedDriver"): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  private val viewCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Run `body` with each frame registered under a UNIQUE per-call temp
    * view name (base + a JVM-wide counter); the views are dropped before
    * returning. For library operators whose SQL-only features (ROLLUP /
    * GROUPING SETS / LATERAL / recursive CTE / approx_top_k) force a
    * spark.sql round-trip: `spark.sql` analyzes EAGERLY, so the resolved
    * plan no longer consults the catalog and the drop is safe — and the
    * unique names make concurrent callers on one shared SparkSession
    * collision-free (r11 concurrency audit: a FIXED view name let thread
    * B swap the view under thread A's in-flight analysis — same schema,
    * no error, silently wrong data). `body` receives base → unique.
    *
    * Do NOT register a .persist()ed frame: dropTempView also uncaches
    * any entry whose plan sameResults the view (Catalog semantics), so
    * the finally-drop would silently unpersist it before the caller's
    * action and the "drop is safe" claim below would not hold. Every
    * current site registers unpersisted frames; the safety argument is
    * spark.sql's EAGER analysis — the resolved plan (incl. Spark 4.1's
    * recursive-CTE UnionLoop re-iteration) never consults the catalog
    * again. */
  private[graft] def withTempViews[A](spark: SparkSession, frames: (String, DataFrame)*)(
      body: Map[String, String] => A): A = {
    // registration happens INSIDE the try: if the Nth view fails to
    // register, the first N−1 unique names are still dropped — with
    // per-call names a leak would otherwise accumulate analyzed plans
    // in the catalog across retries for the session's lifetime
    val registered = scala.collection.mutable.ListBuffer.empty[String]
    try {
      val names = frames.map { case (base, df) =>
        val unique = s"${base}_${viewCounter.incrementAndGet()}"
        df.createOrReplaceTempView(unique)
        registered += unique
        base -> unique
      }.toMap
      body(names)
    } finally registered.foreach(spark.catalog.dropTempView(_))
  }

  /** Register every fixture table as a temp view and the engine's custom
    * expressions as SQL functions: the full surface becomes usable from
    * pure `spark.sql` (the dashboard/ad-hoc entry the reference exposes
    * through Django views, SURVEY §3.2 — here it's ANSI SQL over the same
    * operators).
    *
    * Deliberately SESSION-GLOBAL fixed names — this helper IS the
    * catalog mirror (`SELECT ... FROM lineitem` must work verbatim), so
    * two threads registering DIFFERENT dirs on one session would
    * repoint each other's tables, exactly like two threads fighting
    * over any shared catalog entry. Concurrent multi-dir tenants use
    * `spark.newSession()` (temp views are session-scoped). */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    region(spark, dir).createOrReplaceTempView("region")
    nation(spark, dir).createOrReplaceTempView("nation")
    customer(spark, dir).createOrReplaceTempView("customer")
    supplier(spark, dir).createOrReplaceTempView("supplier")
    part(spark, dir).createOrReplaceTempView("part")
    orders(spark, dir).createOrReplaceTempView("orders")
    lineitem(spark, dir).createOrReplaceTempView("lineitem")
    events(spark, dir).createOrReplaceTempView("events")
    documents(spark, dir).createOrReplaceTempView("documents")
    embeddings(spark, dir).createOrReplaceTempView("embeddings")
    GraftExtensions.register(spark)
  }
}
