package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** AQE skew handling (SURVEY §4: "skewed keys → salting or AQE skew-join"):
  * a planted hot key makes one shuffle partition ~100× the median; AQE
  * must split it (skew=true on the join) and the result must equal the
  * non-adaptive join. */
class SkewSpec extends SparkSpec {

  test("AQE splits the hot partition in a skewed sort-merge join") {
    import spark.implicits._
    val dir = Files.createTempDirectory("skew").toString
    // key 0: 200k rows; keys 1..50: 200 rows each
    val skewed = spark.range(200000).select(lit(0L).as("k"), col("id").as("v"))
      .unionByName(spark.range(10000).select((col("id") % 50 + 1).as("k"), col("id").as("v")))
    skewed.write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(51).select(col("id").as("k"), (col("id") * 7).as("w"))
      .write.mode("overwrite").parquet(s"$dir/dim")

    // capture EVERY config this test mutates — leaking the aggressive
    // 100KB/64KB AQE tuning into the shared session would silently change
    // how later suites plan their shuffles
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val prev = tuned.keys.map(k => k -> spark.conf.get(k)).toMap
    try {
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }

      val joined = spark.read.parquet(s"$dir/fact")
        .join(spark.read.parquet(s"$dir/dim"), "k")
      // execute THIS QueryExecution (count() would plan a separate one and
      // the adaptive plan would never finalize here)
      val n = joined.toLocalIterator().asScala.length
      assert(n == 210000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not mark the skewed join:\n${plan.take(2000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("salted replicated join equals the plain join and shuffles on (key, salt)") {
    import graft.operators.Scale
    val fact = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val dim = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salted = Scale.saltedJoin(fact, dim, "l_orderkey", buckets = 8)
      .select("l_orderkey", "l_extendedprice", "o_orderpriority")
    val plain = fact.join(dim, "l_orderkey")
      .select("l_orderkey", "l_extendedprice", "o_orderpriority")
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
        .sorted(Ordering.Tuple3(Ordering.Long, Ordering.Double.TotalOrdering, Ordering.String))
    assert(multiset(salted).sameElements(multiset(plain)))
    // the join really runs on the salted composite key (hot-key rows are
    // spread over `buckets` reducers), on the shuffled-hash path — not
    // collapsed back to a broadcast of the replicated dim
    val plan = salted.queryExecution.sparkPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected ShuffledHashJoin:\n${plan.take(1500)}")
    assert(plan.contains("_salt"), "join keys must include the salt column")
  }
}
