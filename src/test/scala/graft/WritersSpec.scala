package graft

import java.nio.file.Files
import graft.sources.Writers

/** Write-side layout levers (S5 at scale): partitioned writes must give
  * one file per partition directory; compaction must shrink file counts
  * without changing contents. */
class WritersSpec extends SparkSpec {

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    walk(dir)
  }

  test("writePartitioned: one file per partition directory, contents round-trip") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_writers").toString + "/byday"
    val src = (0 until 1000).map(i => (i.toLong, f"2024-01-${i % 10 + 1}%02d", i * 1.5))
      .toDF("id", "day", "v")
    Writers.writePartitioned(src, out, Seq("day"))
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("day="))
    assert(dirs.length == 10)
    dirs.foreach { d =>
      val files = parquetFiles(d)
      assert(files.length == 1, s"${d.getName} has ${files.length} files, expected 1")
    }
    val back = spark.read.parquet(out).select("id", "v").as[(Long, Double)].collect().toSet
    assert(back == src.select("id", "v").as[(Long, Double)].collect().toSet)
  }

  test("writePartitioned with maxRecordsPerFile splits hot partitions into capped files") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_writers").toString + "/capped"
    // 250 rows per day; a 100-row cap must roll each day into 3 files
    val src = (0 until 1000).map(i => (i.toLong, f"2024-01-${i % 4 + 1}%02d", i * 1.5))
      .toDF("id", "day", "v")
    Writers.writePartitioned(src, out, Seq("day"), maxRecordsPerFile = 100L)
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("day="))
    assert(dirs.length == 4)
    dirs.foreach { d =>
      val n = parquetFiles(d).length
      assert(n == 3, s"${d.getName}: expected 3 capped files (ceil(250/100)), got $n")
    }
    val back = spark.read.parquet(out).select("id", "v").as[(Long, Double)].collect().toSet
    assert(back == src.select("id", "v").as[(Long, Double)].collect().toSet)
  }

  test("streaming ingest lands in the partitioned layout; a date filter scans only its partition") {
    import java.sql.Timestamp
    import org.apache.spark.sql.functions.{col, to_date}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_writers").toString + "/stream_ingest"
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp, Double)]
    val q = input.toDF().toDF("id", "ts", "v")
      .withColumn("day", to_date(col("ts")))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Writers.appendPartitioned(batch, out, Seq("day"))
      }
      .start()
    def t(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    try {
      input.addData(Seq((1L, t(1), 1.0), (2L, t(2), 2.0)))
      q.processAllAvailable()
      input.addData(Seq((3L, t(1), 3.0), (4L, t(3), 4.0)))
      q.processAllAvailable()
    } finally q.stop()
    // layout: day=2024-01-01 touched by both batches -> 2 files; days 2, 3 one each
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("day="))
      .map(d => d.getName -> parquetFiles(d).length).toMap
    assert(dirs == Map("day=2024-01-01" -> 2, "day=2024-01-02" -> 1, "day=2024-01-03" -> 1))
    // a date filter reads ONLY its partition
    val scan = spark.read.parquet(out).filter(col("day") === "2024-01-01")
    assert(scan.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("overwritePartitions replaces only the partitions present in the frame (backfill)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_writers").toString + "/dyn"
    val init = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0), (3L, "2024-01-03", 3.0))
      .toDF("id", "day", "v")
    Writers.writePartitioned(init, out, Seq("day"))
    val day1File = parquetFiles(new java.io.File(out + "/day=2024-01-01")).head
    val day1Mtime = day1File.lastModified()
    // backfill ONLY day 2 with corrected rows
    val fix = Seq((20L, "2024-01-02", 20.0), (21L, "2024-01-02", 21.0)).toDF("id", "day", "v")
    Writers.overwritePartitions(fix, out, Seq("day"))
    val back = spark.read.parquet(out).select("id", "v").as[(Long, Double)].collect().toSet
    // day 2 replaced wholesale; days 1 and 3 untouched (same file, same mtime)
    assert(back == Set((1L, 1.0), (20L, 20.0), (21L, 21.0), (3L, 3.0)))
    assert(day1File.exists() && day1File.lastModified() == day1Mtime,
      "day=2024-01-01 must not be rewritten by a day-2 backfill")
  }

  test("mergeUpsert rewrites only partitions containing an updated key; untouched partitions keep their files") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_writers").toString + "/merge"
    val init = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0),   // partition a: key 2 will be updated
      (3L, "b", 3.0), (4L, "b", 4.0),   // partition b: untouched
      (5L, "c", 5.0))                   // partition c: untouched
      .toDF("id", "grp", "v")
    Writers.writePartitioned(init, out, Seq("grp"))
    val bFile = parquetFiles(new java.io.File(out + "/grp=b")).head
    val bMtime = bFile.lastModified()
    // one correction in partition a, one insert into a NEW partition d
    val updates = Seq((2L, "a", 20.0), (9L, "d", 9.0)).toDF("id", "grp", "v")
    Writers.mergeUpsert(spark, out, updates, "id", Seq("grp"))
    val back = spark.read.parquet(out).select("id", "v").as[(Long, Double)].collect().toSet
    assert(back == Set((1L, 1.0), (2L, 20.0), (3L, 3.0), (4L, 4.0), (5L, 5.0), (9L, 9.0)))
    assert(bFile.exists() && bFile.lastModified() == bMtime,
      "grp=b holds no updated key and must not be rewritten")
    // the staging dir is cleaned up after the swap
    assert(!new java.io.File(out).getParentFile.listFiles()
      .exists(_.getName.startsWith("merge.merge_")))
  }

  test("deleteByKeys rewrites only partitions holding a doomed key; a fully-emptied partition's directory is removed") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_writers").toString + "/del"
    val init = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0),   // partition a: key 2 deleted
      (3L, "b", 3.0), (4L, "b", 4.0),   // partition b: untouched
      (5L, "c", 5.0), (6L, "c", 6.0))   // partition c: ALL keys deleted
      .toDF("id", "grp", "v")
    Writers.writePartitioned(init, out, Seq("grp"))
    val bFile = parquetFiles(new java.io.File(out + "/grp=b")).head
    val bMtime = bFile.lastModified()
    val doomed = Seq(2L, 5L, 6L).toDF("id")
    Writers.deleteByKeys(spark, out, doomed, "id", Seq("grp"))
    val back = spark.read.parquet(out).select("id", "v").as[(Long, Double)].collect().toSet
    assert(back == Set((1L, 1.0), (3L, 3.0), (4L, 4.0)))
    assert(bFile.exists() && bFile.lastModified() == bMtime,
      "grp=b holds no doomed key and must not be rewritten")
    assert(!new java.io.File(out + "/grp=c").exists(),
      "dynamic overwrite alone would leave the emptied partition's files; the dir must be gone")
    assert(!new java.io.File(out).getParentFile.listFiles()
      .exists(_.getName.startsWith("del.delete_")), "staging cleaned")
  }

  test("deleteByKeys with no matching key is a no-op that rewrites nothing") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_writers").toString + "/del2"
    val init = Seq((1L, "a", 1.0), (3L, "b", 3.0)).toDF("id", "grp", "v")
    Writers.writePartitioned(init, out, Seq("grp"))
    val mtimes = Seq("a", "b").map(g => parquetFiles(new java.io.File(out + s"/grp=$g")).head)
      .map(f => f -> f.lastModified()).toMap
    Writers.deleteByKeys(spark, out, Seq(99L).toDF("id"), "id", Seq("grp"))
    assert(spark.read.parquet(out).count() == 2)
    mtimes.foreach { case (f, t) =>
      assert(f.exists() && f.lastModified() == t, s"$f must be untouched")
    }
  }

  test("compact swap failure on the final rename restores the original table") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_writers").toString
    val live = base + "/t"
    val src = (0 until 100).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    src.coalesce(1).write.parquet(live)
    // a missing tmp dir makes step "tmp -> live" fail AFTER the live table
    // was parked aside: swapIn must put it back and name the kept copy
    val err = intercept[java.io.IOException] {
      Writers.swapIn(new java.io.File(live),
        new java.io.File(base + "/missing_tmp"), new java.io.File(base + "/t.old"))
    }
    assert(err.getMessage.contains("original restored"))
    assert(err.getMessage.contains("missing_tmp"))
    val back = spark.read.parquet(live).as[(Long, Double)].collect().toSet
    assert(back == src.as[(Long, Double)].collect().toSet)
  }

  test("compact swap failure on the first rename leaves the live table and the compacted copy intact") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_writers").toString
    val tmp = base + "/t.compact_x"
    val src = (0 until 100).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    src.coalesce(1).write.parquet(tmp)
    // live dir doesn't exist -> step "live -> old" fails before anything moved
    val err = intercept[java.io.IOException] {
      Writers.swapIn(new java.io.File(base + "/nonexistent_live"),
        new java.io.File(tmp), new java.io.File(base + "/t.old"))
    }
    assert(err.getMessage.contains("table untouched"))
    // the compacted copy is still on disk at the path the error names
    val kept = spark.read.parquet(tmp).as[(Long, Double)].collect().toSet
    assert(kept == src.as[(Long, Double)].collect().toSet)
  }

  test("compact: many small files collapse to the row-targeted count, data unchanged") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_writers").toString + "/frag"
    val src = (0 until 900).map(i => (i.toLong, i % 7)).toDF("id", "k")
    src.repartition(30).write.mode("overwrite").parquet(out)
    val before = parquetFiles(new java.io.File(out)).length
    assert(before >= 25, s"fixture should start fragmented, got $before files")
    Writers.compact(spark, out, targetRows = 300)
    val after = parquetFiles(new java.io.File(out)).length
    assert(after == 3, s"expected 3 compacted files, got $after")
    val back = spark.read.parquet(out).as[(Long, Int)].collect().toSet
    assert(back == src.as[(Long, Int)].collect().toSet)
  }

  test("upsertSinkBatch: empty first batch skipped; crashed-first-batch dir recovered") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_writers").toString + "/upsert"
    val schema = Seq.empty[(Long, String, Double)].toDF("id", "day", "v")
    // 1) empty batch before any committed data file: no layout written —
    //    an empty frame carries no schema worth pinning
    graft.streaming.StreamOps.upsertSinkBatch(schema, out, "id", Seq("day"))
    assert(!new java.io.File(out).exists() || parquetFiles(new java.io.File(out)).isEmpty)
    // 2) crashed first batch: a directory with only _SUCCESS (no data
    //    file) must be treated as ABSENT — the layout (re)write path, not
    //    the mergeUpsert read that would die on schema inference
    new java.io.File(out).mkdirs()
    new java.io.File(out, "_SUCCESS").createNewFile()
    val first = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0)).toDF("id", "day", "v")
    graft.streaming.StreamOps.upsertSinkBatch(first, out, "id", Seq("day"))
    assert(spark.read.parquet(out).count() == 2)
    // 3) committed data present: the next batch goes through mergeUpsert
    //    (update row 2, insert row 3; replaying it changes nothing)
    val second = Seq((2L, "2024-01-02", 20.0), (3L, "2024-01-03", 3.0)).toDF("id", "day", "v")
    graft.streaming.StreamOps.upsertSinkBatch(second, out, "id", Seq("day"))
    graft.streaming.StreamOps.upsertSinkBatch(second, out, "id", Seq("day"))
    val back = spark.read.parquet(out).select("id", "v").as[(Long, Double)].collect().toMap
    assert(back == Map(1L -> 1.0, 2L -> 20.0, 3L -> 3.0))
  }
}
