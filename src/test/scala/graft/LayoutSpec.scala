package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** The Morton key is one function, written three ways: a plain-Scala
  * bit loop (reference), the 32-term column specification the q_zorder
  * oracle checks (Layout.zkey16), and the 4-step magic-mask spread the
  * production writer sorts by (Writers.spread16). All three must agree
  * bit-for-bit, otherwise the layout ZorderSpec proves is not the curve
  * the oracle pinned. */
class LayoutSpec extends SparkSpec {

  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zkey16 equals the plain-Scala Morton reference on edge and random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L),
      (1L, 2L), (21845L, 43690L)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zkey16(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y), s"zkey16($x, $y)")
    }
  }

  test("the writer's magic-mask spread assembles the same key as zkey16") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("x", "y")
    val fast = graft.sources.Writers.spread16(col("x"))
      .bitwiseOR(shiftleft(graft.sources.Writers.spread16(col("y")), 1))
    val n = df.filter(Layout.zkey16(col("x"), col("y")) =!= fast).count()
    assert(n == 0, s"$n rows where spec and magic-mask keys diverge")
  }

  test("keys above 16 bits are masked, not corrupted") {
    import spark.implicits._
    // zkey16 only reads the low 16 bits of each input (shiftright+&1 per
    // term), so 65536 + v must collide with v rather than set stray bits
    val df = Seq((65536L + 5L, 3L), (5L, 3L)).toDF("x", "y")
      .select(Layout.zkey16(col("x"), col("y")).as("z"))
    val zs = df.collect().map(_.getLong(0))
    assert(zs(0) == zs(1) && zs(1) == mortonRef(5L, 3L))
  }
}
