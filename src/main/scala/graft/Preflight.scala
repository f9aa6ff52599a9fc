package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Fail-fast fixture preflight: diff every fixture parquet's FOOTER schema
  * against the declared `Schemas.*` and abort with a NAMED mismatch before
  * any query runs.
  *
  * Why this exists: the round-8 fixtures were silently regenerated with
  * `events.ts` as TIMESTAMP(MICROS) while the reader still assumed NANOS —
  * every events query produced plausible-looking wrong answers and the
  * whole round burned on one silent drift. Declared-schema reads
  * (`spark.read.schema(...)`) do NOT detect this: parquet happily serves a
  * compatible-but-differently-annotated column. The only authority on what
  * a fixture actually contains is its footer, so that is what is checked —
  * a driver-side KB-sized read per table, no Spark job.
  *
  * `events.ts` is the one sanctioned variance: MICROS and NANOS are both
  * accepted because [[Tables.events]] sniffs the unit and handles either.
  */
object Preflight {
  private val expected: Seq[(String, StructType)] = Seq(
    "region" -> Schemas.region,
    "nation" -> Schemas.nation,
    "customer" -> Schemas.customer,
    "supplier" -> Schemas.supplier,
    "part" -> Schemas.part,
    "orders" -> Schemas.orders,
    "lineitem" -> Schemas.lineitem,
    "events" -> Schemas.events,
    "documents" -> Schemas.documents,
    "embeddings" -> Schemas.embeddings)

  /** Throws IllegalStateException naming every (table, column, want, got)
    * mismatch if any fixture's footer disagrees with its declared schema.
    *
    * Synchronized (r11 concurrency audit): the nanosAsLong save/set/
    * restore below is a non-atomic read-modify-write of SESSION-shared
    * conf — two concurrent checks would restore each other's temporary
    * value. The lock serializes checks; the remaining contract is
    * TEMPORAL, not lock-enforceable: run the gate BEFORE submitting
    * queries on the session, not concurrently with them — a
    * [[Tables.events]] call interleaved inside the check's window could
    * set the conf session-wide (nanos fixture) only to have the restore
    * unset it under the lazy frame's later action. Both harness mains
    * honor this (gate first, queries after). */
  def check(spark: SparkSession, dir: String): Unit = synchronized {
    // nanos columns surface as LongType under this conf instead of
    // aborting footer inference outright; the events.ts special case
    // below decides whether that is acceptable. The previous value is
    // restored afterwards — the gate must not leak session state into
    // everything that runs behind it ([[Tables.events]] sets the conf
    // SESSION-WIDE when the fixture really is nanos — deliberately, and
    // documented there: the lazy frame consults it at action time, so a
    // restore here-and-now would break its later execution).
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, "true")
    val problems =
      try expected.flatMap { case (name, want) =>
        val path = s"$dir/$name.parquet"
        try diff(name, want, spark.read.parquet(path).schema)
        catch {
          case e: Exception => Seq(s"$name: footer unreadable: ${e.getMessage}")
        }
      }
      finally prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    if (problems.nonEmpty)
      throw new IllegalStateException(
        s"fixture schema drift under $dir — refusing to run against " +
          s"unexpected data:\n  ${problems.mkString("\n  ")}")
  }

  private def diff(table: String, want: StructType, got: StructType): Seq[String] = {
    val gotByName = got.fields.map(f => f.name -> f.dataType).toMap
    val missing = want.fields.filterNot(f => gotByName.contains(f.name))
      .map(f => s"$table.${f.name}: declared ${f.dataType.sql} but ABSENT from footer")
    val extra = got.fields.filterNot(f => want.fieldNames.contains(f.name))
      .map(f => s"$table.${f.name}: in footer (${f.dataType.sql}) but not declared")
    val mismatched = want.fields.flatMap { f =>
      gotByName.get(f.name).filterNot(g => accepts(table, f.name, f.dataType, g))
        .map(g => s"$table.${f.name}: declared ${f.dataType.sql}, footer has ${g.sql}")
    }
    missing ++ extra ++ mismatched
  }

  /** Two sanctioned variances, everything else must match exactly:
    *  - any timestamp column: the fixtures carry isAdjustedToUTC=false, so
    *    footer inference reports TIMESTAMP_NTZ while the declared read
    *    maps the same physical micros to TimestampType (LTZ) — identical
    *    instants under the engine's pinned UTC session zone;
    *  - events.ts additionally accepts TIMESTAMP(NANOS) (LongType under
    *    nanosAsLong), the fixture generation Tables.events sniffs for. */
  private def accepts(table: String, column: String, want: DataType, got: DataType): Boolean =
    (want == got) ||
      (want == TimestampType && got == TimestampNTZType) ||
      (table == "events" && column == "ts" && want == TimestampType && got == LongType)
}
