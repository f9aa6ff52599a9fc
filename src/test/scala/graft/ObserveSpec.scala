package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** In-flight observability (Relational.observeDq): DQ metrics accumulate
  * during the production action itself — asserted equal to independently
  * computed ground truth, with no second scan of the observed frame. */
class ObserveSpec extends SparkSpec {

  test("observe metrics match an independent aggregate, on the same single action") {
    val orders = Tables.orders(spark, sf)
    // ground truth via a separate query
    val t = orders
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("nn"),
        min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .head()

    val obs = Observation("dq")
    // downstream work on the observed frame: a filter+count action;
    // metrics must still describe the FULL pre-filter scan
    val threshold = 150000.0
    val kept = Relational.observeDq(orders, obs, "o_totalprice")
      .filter(col("o_totalprice") > threshold)
      .count()
    val m = obs.get

    assert(m("n_rows") == t.getLong(0))
    assert(m("n_null") == t.getLong(1))
    assert(m("v_min") == t.getDouble(2))
    assert(m("v_max") == t.getDouble(3))
    // the observed stream really was the unfiltered scan: metrics cover
    // all rows even though the action only counted the filtered subset
    val keptExpected = orders.filter(col("o_totalprice") > threshold).count()
    assert(kept == keptExpected && kept < t.getLong(0))
  }

  test("observation rides a write action too (the Verify/sink path)") {
    val obs = Observation("dq_write")
    Relational.observeDq(Tables.events(spark, sf), obs, "value")
      .write.mode("overwrite").format("noop").save()
    val m = obs.get
    val n = Tables.events(spark, sf).count()
    assert(m("n_rows") == n)
    assert(m("n_null") == 0L)
  }
}
