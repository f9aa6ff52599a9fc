package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve key as an oracle-checkable query (SURVEY §4 /
  * 100 TB mandate). The LAYOUT side — quantize, range-partition and sort
  * by the code, write — is `graft.sources.Writers.zorderWrite`, whose
  * file-rectangle pruning ZorderSpec measures; THIS module pins the key
  * arithmetic itself against the DuckDB oracle, term by term, so the
  * curve both engines agree on is the one the layout actually sorts by.
  */
object Layout {

  /** Morton interleave of the low 16 bits of two non-negative integral
    * columns: bit i of x lands at position 2i, bit i of y at 2i+1. The
    * 32 explicit shift/mask terms are the SPECIFICATION form (exactly
    * reproducible in ANSI SQL — [[zkey16Sql]] generates the same terms
    * from the same loop); `Writers.zorderWrite` uses the 4-step
    * magic-mask spread, the fast equivalent, and LayoutSpec proves the
    * two agree bit-for-bit. Disjoint target bits make the combine a
    * plain sum; the whole expression is codegen'd integer arithmetic. */
  def zkey16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)).cast("long")
    }.reduce(_ + _)

  /** The same 32-term interleave as ANSI SQL (DuckDB syntax), generated
    * from the same bit-index loop as [[zkey16]] so the two cannot
    * drift. */
  def zkey16Sql(x: String, y: String): String =
    (0 until 16).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** q_zorder: lineitem keyed by zkey16(l_partkey, l_suppkey) — two
    * independent dimensions real queries filter on separately — top-50
    * along the curve. TakeOrdered shape: no full sort materializes. */
  def zorderQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        zkey16(col("l_partkey"), col("l_suppkey")).as("zkey"))
      .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      .limit(50)
}
