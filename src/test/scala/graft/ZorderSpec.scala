package graft

import org.apache.spark.sql.functions._

/** Z-order clustered layout (`Writers.zorderWrite`): every file covers a
  * narrow range on BOTH clustered columns, so a selective filter on either
  * column alone can skip most files. The assertion computes the exact
  * per-file min/max overlap a footer-stats scan prunes with — the same
  * predicate Spark's parquet reader evaluates against row-group
  * statistics — rather than scraping scan metrics. */
class ZorderSpec extends SparkSpec {

  test("z-ordered files prune on both dimensions; a single-column sort prunes on one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val data = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("user_id"), col("value"))
    graft.sources.Writers.zorderWrite(data, s"$dir/z", "user_id", "value", files = 16)
    // comparison layout: same file count, clustered by value alone
    data.repartitionByRange(16, col("value")).sortWithinPartitions("value")
      .write.parquet(s"$dir/v")

    // fraction of files a range predicate on `c` must still read: files
    // whose [min, max] intersects the probe window (footer-stats pruning)
    def mustRead(path: String, c: String, lo: Double, hi: Double): Double = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(c).cast("double")).as("mn"), max(col(c).cast("double")).as("mx"))
        .collect()
      assert(stats.length == 16, s"expected 16 files, saw ${stats.length}")
      stats.count(r => r.getDouble(1) <= hi && r.getDouble(2) >= lo).toDouble / stats.length
    }
    val r = data.agg(
      min(col("user_id").cast("double")), max(col("user_id").cast("double")),
      min(col("value").cast("double")), max(col("value").cast("double"))).head()
    def window(lo: Double, hi: Double): (Double, Double) =
      (lo + 0.45 * (hi - lo), lo + 0.55 * (hi - lo)) // middle 10%
    val (uLo, uHi) = window(r.getDouble(0), r.getDouble(1))
    val (vLo, vHi) = window(r.getDouble(2), r.getDouble(3))

    val zUser = mustRead(s"$dir/z", "user_id", uLo, uHi)
    val zValue = mustRead(s"$dir/z", "value", vLo, vHi)
    val sUser = mustRead(s"$dir/v", "user_id", uLo, uHi)
    val sValue = mustRead(s"$dir/v", "value", vLo, vHi)

    // the value-sorted layout: near-perfect on its sort column, no
    // pruning on the other (every file spans the full user range)
    assert(sValue <= 0.25, s"value-sorted layout should prune value probes, read $sValue")
    assert(sUser >= 0.9, s"value-sorted layout cannot prune user probes, read $sUser")
    // z-order: genuine pruning on BOTH dimensions (16 files tile a 4x4
    // grid; a 10% mid-range window intersects ~1 of 4 strips per dim)
    assert(zUser <= 0.5, s"z-order pruned too little on user_id: read $zUser")
    assert(zValue <= 0.5, s"z-order pruned too little on value: read $zValue")
    // and the layouts hold identical data
    assert(spark.read.parquet(s"$dir/z").count() == data.count())
  }
}
