package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution at the scan (E-SCAN): a 100 TB table is written over
  * months by evolving jobs — new columns appear, old files never get
  * rewritten. The engine's declared-schema stance (Tables) must absorb
  * that: files missing a declared column yield nulls, no inference pass,
  * no rewrite. `mergeSchema` is the exploration-time fallback, paid for
  * with a footer scan of every file — never the production path. */
class SchemaEvolutionSpec extends SparkSpec {

  test("declared schema reads pre-evolution files with nulls, post-evolution with data") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString
    // epoch 1: (id, v); epoch 2 adds tag
    Seq((1L, 1.5), (2L, 2.5)).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, 3.5, "new")).toDF("id", "v", "tag")
      .write.mode("append").parquet(dir)
    val declared = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("tag", StringType)))
    val rows = spark.read.schema(declared).parquet(dir)
      .orderBy("id")
      .as[(Long, Double, Option[String])].collect().toSeq
    assert(rows == Seq((1L, 1.5, None), (2L, 2.5, None), (3L, 3.5, Some("new"))))
  }

  test("mergeSchema discovers the union schema for exploration") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve2").toString
    Seq((1L, 1.5)).toDF("id", "v").write.mode("append").parquet(dir)
    Seq((2L, "x")).toDF("id", "tag").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "tag", "v"))
    assert(merged.count() == 2)
  }

  test("declared schema tolerates column reorder in files (name-based resolution)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve3").toString
    Seq((1L, "a", 1.5)).toDF("id", "tag", "v").write.mode("append").parquet(dir)
    Seq((2.5, 2L, "b")).toDF("v", "id", "tag").write.mode("append").parquet(dir)
    val declared = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("tag", StringType)))
    val rows = spark.read.schema(declared).parquet(dir)
      .orderBy("id").as[(Long, Double, String)].collect().toSeq
    assert(rows == Seq((1L, 1.5, "a"), (2L, 2.5, "b")))
  }
}
