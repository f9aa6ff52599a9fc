package graft

import graft.functions.MightContainLong
import graft.operators.Scale
import org.apache.spark.sql.functions._

/** Runtime-filter semi-join (Scale.bloomSemiJoin): the Bloom sketch must
  * prune the probe side without ever changing the result. */
class BloomSpec extends SparkSpec {

  test("no false negatives: every build key passes, most foreign keys are pruned") {
    val hot = Tables.orders(spark, sf).filter(col("o_totalprice") > 300000.0)
      .select("o_orderkey")
    val bf = hot.stat.bloomFilter("o_orderkey", 1000L, 0.01)
    val li = Tables.lineitem(spark, sf).select("l_orderkey")
    val matching = li.join(hot, li("l_orderkey") === hot("o_orderkey"), "left_semi")
    val passed = li.filter(MightContainLong.mightContainLong(col("l_orderkey"), bf))
    // completeness: the bloom passes every truly-matching row
    assert(matching.count() <= passed.count())
    assert(matching.join(passed, Seq("l_orderkey"), "left_anti").count() == 0)
    // effectiveness: the sketch rejects the bulk of non-matching rows
    // (hot orders are a small fraction; fpp 1% adds ~1% leakage)
    assert(passed.count() < li.count() / 2,
      s"bloom passed ${passed.count()} of ${li.count()} rows - not pruning")
  }

  test("bloomSemiJoin result equals the plain semi-join aggregate") {
    val hot = Tables.orders(spark, sf).filter(col("o_totalprice") > 300000.0)
      .select("o_orderkey")
    val li = Tables.lineitem(spark, sf)
    val plain = li.join(hot, li("l_orderkey") === hot("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity").cast("decimal(18,2)")), 2).cast("double").as("sum_qty"))
      .orderBy("l_returnflag")
      .collect().toSeq
    val bloomed = Scale.bloomSemiJoin(spark, sf).collect().toSeq
    assert(bloomed == plain && plain.nonEmpty)
  }
}
