package graft

/** Smoke over the full driver surface: every registered query runs at
  * sf0.001, has a non-empty schema, and every oracle key points at a real
  * query. entry() must return rows (driver t1 gate). */
class QueriesSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sf)
      assert(df.schema.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
