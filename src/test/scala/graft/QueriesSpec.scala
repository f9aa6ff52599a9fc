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

  test("no duplicate keys in the oracleSql source literal") {
    // Map literals silently keep the last duplicate key; count the key
    // literals in the source text against the materialized map size.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")), "UTF-8")
    def keysIn(section: String): Seq[String] =
      "\"(q_\\w+)\" ->".r.findAllMatchIn(section).map(_.group(1)).toSeq
    val querySection = src.substring(src.indexOf("def queries"), src.indexOf("def benchShapes"))
    val oracleSection = src.substring(src.indexOf("def oracleSql"))
    for ((lits, map, label) <- Seq(
        (keysIn(querySection), SparkEntry.queries, "queries"),
        (keysIn(oracleSection), SparkEntry.oracleSql, "oracleSql"))) {
      val dups = lits.groupBy(identity).filter(_._2.size > 1).keys
      assert(dups.isEmpty, s"duplicate $label key literals: $dups")
      assert(lits.size == map.size,
        s"source has ${lits.size} $label key literals but map has ${map.size}")
    }
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sf)
      assert(df.schema.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  // every Core bench override must compute the SAME multiset of rows as
  // its oracle-checked twin — a divergence (an edit landing on one form
  // only) would silently bench a different computation than the one the
  // correctness gate certifies. Sorted-row compare at sf0.001.
  SparkEntry.benchShapes.foreach { case (name, coreFn) =>
    if (!SparkEntry.queries.get(name).contains(coreFn))
      test(s"$name bench core ≡ oracle form (rows, up to order)") {
        def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
          df.collect().map(_.toString).sorted.toSeq
        val core = coreFn(spark, sf)
        val oracleForm = SparkEntry.queries(name)(spark, sf)
        assert(core.schema == oracleForm.schema,
          s"schema drift: core=${core.schema} oracle=${oracleForm.schema}")
        assert(rows(core) == rows(oracleForm))
      }
  }
}
