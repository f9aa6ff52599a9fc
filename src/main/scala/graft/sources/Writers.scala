package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Write-side library (S5 row-insert sink at scale): the layouts the read
  * side depends on are produced here, not assumed.
  *
  * The two levers a 100 TB table lives or dies by:
  *   - PARTITION LAYOUT: directory-level pruning (see Tables.eventsByDate /
  *     PruningSpec). Written by `writePartitioned`, which clusters rows by
  *     the partition key first so each partition directory gets one
  *     right-sized file instead of one file per upstream task.
  *   - FILE SIZING: streaming ingest and fine-grained partitions produce
  *     small files whose per-file open/footer cost dominates scans.
  *     `compact` rewrites a table at a target rows-per-file without
  *     changing its contents — the standard maintenance pass.
  */
object Writers {

  /** Recursive local-FS delete (staging dirs, parked table copies).
    * `listFiles` returns null for non-directories AND on I/O errors, so
    * the null is absorbed rather than thrown mid-cleanup. */
  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRecursively)
    f.delete()
  }

  /** Partitioned parquet write: repartition by the partition column(s)
    * before `partitionBy`, so every partition directory is written by
    * exactly one task → one file. Without the repartition, every upstream
    * task appends its own file to every directory it has rows for:
    * task-count × partition-count small files.
    *
    * `maxRecordsPerFile` (> 0) caps rows per file — the writer rolls a
    * new file once a task exceeds it, which is how a HOT partition splits
    * into several right-sized files while cold ones stay single-file.
    * (Not a repartition salt: hashing (key, salt) into the task pool
    * cannot guarantee a key's salts land in distinct tasks.) */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 0L): Unit = {
    val keys = partitionCols.map(col)
    df.repartition(keys: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile) // 0 = no cap
      .partitionBy(partitionCols: _*).parquet(path)
  }

  /** Streaming-ingest form: append micro-batches into the partitioned
    * layout (the `foreachBatch` body of a stream → table pipeline). Same
    * clustering as `writePartitioned`, append semantics — each batch adds
    * one file per touched partition, and `compact` is the maintenance
    * pass that later folds those per-batch files together. */
  def appendPartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                        maxRecordsPerFile: Long = 0L): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*).parquet(path)

  /** Backfill form: DYNAMIC partition overwrite — replaces only the
    * partition directories present in `df`, leaving every other partition
    * untouched. Re-running one day of a 100 TB date-partitioned table
    * rewrites one day; the static overwrite `writePartitioned` uses would
    * first drop the whole table. Same clustering as `writePartitioned`
    * so each replaced directory is rewritten by one task. */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String],
                          maxRecordsPerFile: Long = 0L): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*).parquet(path)

  /** Spread 16 bits over 32, zeros between (abcd… → a0b0c0d0…): the
    * 4-step magic-mask half of the Morton interleave. private[graft] so
    * LayoutSpec can prove it equals the 32-term specification form
    * (`operators.Layout.zkey16`) the q_zorder oracle checks. */
  private[graft] def spread16(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft}
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Z-ORDER clustered write: interleave the bits of two rank-quantized
    * numeric columns into a Morton code, range-partition + sort the rows
    * by it, and write — every produced file then covers a small
    * rectangle of the (x, y) space, so its parquet footer min/max are
    * NARROW ON BOTH columns and a filter on EITHER column alone skips
    * most files. A single-column sort gives perfect skipping on that
    * column and none on the other; directory partitioning gives exact
    * pruning but only at directory granularity and only on the partition
    * key. Z-order is the layout for the 100 TB table queried by more
    * than one selective column (Delta/Iceberg expose the same verb as
    * OPTIMIZE ZORDER).
    *
    * Everything is codegen'd builtin arithmetic: the quantizer is a
    * min/max affine map to 16 bits (one cheap pre-pass agg — the same
    * lifecycle as a broadcast build), the bit spread is the standard
    * 4-step magic-mask sequence, and the layout comes from
    * `repartitionByRange` + `sortWithinPartitions` on the code (dropped
    * before write; order survives the projection). */
  def zorderWrite(df: DataFrame, path: String, xCol: String, yCol: String,
                  files: Int): Unit = {
    import org.apache.spark.sql.functions.{least, greatest, lit, min, max, shiftleft}
    import org.apache.spark.sql.Column
    val b = df.agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    // empty (or all-null-column) input: the min/max row is all nulls and
    // getDouble would NPE deep in the quantizer — write the empty layout
    // and return (the no-op a maintenance pass expects)
    if (b.isNullAt(0) || b.isNullAt(2)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    def quant(c: Column, lo: Double, hi: Double): Column =
      least(lit(65535L), greatest(lit(0L),
        ((c.cast("double") - lit(lo)) / lit(math.max(hi - lo, 1e-300)) * 65535.0).cast("long")))
    val z = spread16(quant(col(xCol), b.getDouble(0), b.getDouble(1)))
      .bitwiseOR(shiftleft(spread16(quant(col(yCol), b.getDouble(2), b.getDouble(3))), 1))
    df.withColumn("_z", z)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Keyed upsert (MERGE) into a partitioned parquet table — the physical
    * twin of `Relational.mergeUpsertQuery` (reference semantics: the ORM
    * save in `app/views.py:49-52` inserts or updates by key). Scope is
    * partition-surgical: only partition directories that CONTAIN an
    * updated or inserted key are rewritten (via dynamic partition
    * overwrite); a day of corrections against a 100 TB table touches that
    * day, not the table. Inside each affected partition the merge is the
    * anti-join-union plan: surviving target rows (broadcast anti-join on
    * the dim-sized update keyset) + all update rows.
    *
    * Contract: `updates` has the target's schema, and the partition
    * column value is part of row identity — an update that MOVES a key
    * across partitions must be expressed as delete+insert (same
    * restriction as Hive/Iceberg dynamic-partition upserts).
    *
    * Spark refuses to overwrite a path its plan is also reading, so the
    * merged slice is staged next to the table first, then swapped in with
    * dynamic overwrite from the staged copy; the staging dir is removed
    * after the swap, and a crash before the swap leaves the live table
    * untouched. */
  def mergeUpsert(spark: SparkSession, path: String, updates: DataFrame,
                  key: String, partitionCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.broadcast
    val target = spark.read.parquet(path)
    val cols = target.columns.toIndexedSeq
    val hitParts = updates.select(partitionCols.map(col): _*).distinct()
    val affected = target.join(broadcast(hitParts), partitionCols, "left_semi")
    // row identity is (key, partition values) — anti-joining on the key
    // alone would also delete a SAME-KEY row living in a sibling hit
    // partition (two updates touching partitions a and c would silently
    // drop c's row for a key updated only in a)
    val idCols = (key +: partitionCols.filterNot(_ == key)).toIndexedSeq
    val merged = affected
      .join(broadcast(updates.select(idCols.map(col): _*)), idCols, "left_anti")
      .unionByName(updates.select(cols.map(col): _*))
    val staging = new java.io.File(
      path + s".merge_${ProcessHandle.current().pid()}_${System.nanoTime()}")
    merged.write.parquet(staging.getPath)
    // schema pinned on the re-read: an empty `updates` frame stages zero
    // data files and inference would fail with 'Unable to infer schema'
    // instead of the correct no-op swap (the deleteByKeys lesson). Pinned
    // to the MERGED frame's schema, not the target's — the unionByName
    // reconciles types (an updates column may be wider) and the staged
    // files carry exactly that reconciled shape.
    try overwritePartitions(
      spark.read.schema(merged.schema).parquet(staging.getPath),
      path, partitionCols)
    finally deleteRecursively(staging)
  }

  /** Keyed deletion from a partitioned parquet table — the
    * right-to-be-forgotten verb (and [[mergeUpsert]]'s third leg:
    * insert/update there, delete here). Partition-surgical like the
    * merge: the doomed keys are located first (one broadcast semi-join),
    * and only partitions that CONTAIN one are rewritten; deleting one
    * user from a 100 TB table touches the partitions that user appears
    * in, not the table.
    *
    * The dynamic-overwrite subtlety this method exists to get right: a
    * partition whose EVERY row is deleted produces no output rows, and
    * dynamic partition overwrite only replaces partitions PRESENT in the
    * written data — the emptied partition's old files would silently
    * survive the pass. So fully-emptied partitions are computed
    * explicitly (affected minus surviving) and their directories removed
    * after the swap. Partition values must be filesystem-safe scalars
    * (the hive `col=value` layout the writers here already use). */
  def deleteByKeys(spark: SparkSession, path: String, keys: DataFrame,
                   key: String, partitionCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.broadcast
    val target = spark.read.parquet(path)
    val doomed = keys.select(col(key))
    val hitParts = target.join(broadcast(doomed), Seq(key), "left_semi")
      .select(partitionCols.map(col): _*).distinct()
    val affected = target.join(broadcast(hitParts), partitionCols, "left_semi")
    val remaining = affected.join(broadcast(doomed), Seq(key), "left_anti")
    // partition directories with no survivors — collected BEFORE the
    // overwrite (both frames read the pre-swap table); dim-sized rows
    val emptied = hitParts
      .join(remaining.select(partitionCols.map(col): _*).distinct(),
        partitionCols, "left_anti")
      .collect()
    val staging = new java.io.File(
      path + s".delete_${ProcessHandle.current().pid()}_${System.nanoTime()}")
    remaining.write.parquet(staging.getPath)
    try {
      // schema pinned explicitly: when every affected row is doomed the
      // staged copy has no data files and an inferring read would fail
      overwritePartitions(
        spark.read.schema(target.schema).parquet(staging.getPath), path, partitionCols)
      emptied.foreach { row =>
        val dir = new java.io.File(path + partitionCols.zipWithIndex
          .map { case (c, i) => s"/$c=${row.get(i)}" }.mkString)
        if (dir.exists()) deleteRecursively(dir)
      }
    } finally deleteRecursively(staging)
  }

  /** S5 row-insert sink into a relational store: the reference writes new
    * users through the ORM into SQLite (`app/views.py:49-52`); the engine
    * side is `df.write.jdbc`. Each partition opens its own connection and
    * batches inserts, so write parallelism is the partition count —
    * `coalesce` first when the target DB can't take that many writers. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: String = "append",
                driver: String = "org.apache.derby.jdbc.EmbeddedDriver"): Unit = {
    val props = new java.util.Properties()
    props.setProperty("driver", driver)
    df.write.mode(mode).jdbc(url, table, props)
  }

  /** Small-file compaction: rewrite `path` so files hold ~`targetRows`
    * rows each. Row-count proxy for byte sizing (the fixture rows are
    * near-constant width; a production pass would target bytes via
    * `spark.sql.files.maxRecordsPerFile` the same way). Contents are
    * unchanged.
    *
    * Swap protocol — the live table is never deleted before its
    * replacement is in place:
    *   1. write the compacted copy to `path.compact_<pid>_<nonce>`
    *   2. rename live → `path.old_<nonce>`   (live table intact, just moved)
    *   3. rename tmp  → `path`               (replacement goes live)
    *   4. delete the old copy
    * If step 2 fails, the live table was never touched. If step 3 fails,
    * the old copy is renamed back and the tmp copy is KEPT — the error
    * names its path so the data is recoverable either way. Same-directory
    * renames are single filesystem ops, so a reader never sees a
    * partially deleted tree — but between steps 2 and 3 there is a brief
    * window with NO directory at the live path, so a concurrent reader
    * must tolerate (retry on) FileNotFoundException. */
  def compact(spark: SparkSession, path: String, targetRows: Long): Unit = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
    val nonce = s"${ProcessHandle.current().pid()}_${System.nanoTime()}"
    val tmp = new java.io.File(path + s".compact_$nonce")
    // a hive-partitioned layout (appendPartitioned's col=value dirs) must
    // be REWRITTEN partitioned: the schema-inferred read turns the dir
    // keys into data columns, and a flat rewrite would silently destroy
    // the directory pruning the partitioned readers depend on. The key
    // chain is recovered from the first directory chain (one col=value
    // level per depth — the layout appendPartitioned produces).
    def partChain(dir: java.io.File): Seq[String] =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .find(f => f.isDirectory && f.getName.contains("=")) match {
        case Some(d) => d.getName.split("=", 2)(0) +: partChain(d)
        case None => Nil
      }
    val partCols = partChain(new java.io.File(path))
    if (partCols.nonEmpty)
      // partitioned layout: coalesce(files) + partitionBy would leave every
      // task writing into every directory it holds rows for — up to
      // files × partitions fragments, each far below targetRows (compaction
      // could INCREASE the file count). Cluster by the partition key
      // instead — one task per directory — with the per-file row cap
      // rolling hot partitions, exactly writePartitioned's recipe.
      df.repartition(partCols.map(col): _*)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", targetRows)
        .partitionBy(partCols: _*)
        .parquet(tmp.getPath)
    else
      // coalesce, not repartition: narrowing the file count needs no shuffle
      df.coalesce(files).write.mode("overwrite").parquet(tmp.getPath)
    swapIn(new java.io.File(path), tmp, new java.io.File(path + s".old_$nonce"))
  }

  /** The swap step of `compact`, separated so the failure paths are
    * unit-testable: replace live dir `dst` with `tmp` via `old` as the
    * parking spot. NOT atomic — two renames, so there is a window with
    * no directory at `dst`, and a failure between them is recovered by
    * renaming the original back (best-effort: if THAT rename also fails,
    * the original survives at `old` rather than `dst`). In every outcome
    * both copies still exist on disk — nothing is deleted until the
    * replacement is live — and the exception names the kept paths. */
  private[graft] def swapIn(dst: java.io.File, tmp: java.io.File, old: java.io.File): Unit = {
    if (!dst.renameTo(old))
      throw new java.io.IOException(
        s"compaction swap failed for $dst: could not move live table aside; " +
          s"table untouched, compacted copy kept at $tmp")
    if (!tmp.renameTo(dst)) {
      old.renameTo(dst) // put the original back; same-dir rename
      throw new java.io.IOException(
        s"compaction swap failed for $dst: could not move compacted copy in; " +
          s"original restored, compacted copy kept at $tmp")
    }
    deleteRecursively(old)
  }
}
