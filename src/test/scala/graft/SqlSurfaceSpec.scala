package graft

import org.apache.spark.sql.functions._

/** Pure-SQL entry surface: Tables.registerViews exposes the fixture tables
  * and the custom expression family to `spark.sql`, so a SQL-only consumer
  * can run the engine's queries verbatim. */
class SqlSurfaceSpec extends SparkSpec {

  test("fixture views + custom functions answer from pure SQL") {
    Tables.registerViews(spark, sf)
    // relational: dim join + agg in SQL equals the DataFrame twin
    val sql = spark.sql(
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin).collect().toSeq
    val df = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
      .orderBy("n_name").collect().toSeq
    assert(sql == df && sql.nonEmpty)
    // custom expressions resolve in SQL over the views
    val sim = spark.sql(
      """SELECT a.vec_id, round(cosine_sim(a.embedding, b.embedding), 4) AS cs
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 3 ORDER BY a.vec_id""".stripMargin).collect()
    assert(sim.length == 3 && sim.forall(r => math.abs(r.getDouble(1)) <= 1.0))
    val tc = spark.sql("SELECT token_code('ab') AS c").head().getLong(0)
    // Σ codepoint(char_j)·j, 1-based: 'a'*1 + 'b'*2
    assert(tc == 'a'.toLong + 2 * 'b'.toLong)
  }

  test("SQL oracle statements run against the views directly (spot check)") {
    Tables.registerViews(spark, sf)
    // the oracle SQL for q_agg-style aggregates is ANSI enough for Spark:
    // same GROUP BY + ORDER BY semantics over the registered views
    val out = spark.sql(
      """SELECT l_returnflag, count(*) AS n_items
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect()
    assert(out.map(_.getLong(1)).sum == Tables.lineitem(spark, sf).count())
  }
}
