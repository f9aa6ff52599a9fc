package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The fixture-drift gate (round-8 lesson): Preflight must pass on the
  * real fixtures and must ABORT, naming the table and column, when a
  * fixture's footer type disagrees with the declared schema. */
class PreflightSpec extends SparkSpec {

  test("preflight passes on the shipped fixtures") {
    Preflight.check(spark, sf) // must not throw
  }

  test("a mistyped column aborts with the table and column named") {
    val dir = Files.createTempDirectory("graft_preflight").toFile
    // copy every real fixture, then REWRITE region with r_regionkey as
    // LONG where the declared schema says INT — the exact class of silent
    // drift that burned round 8
    for (name <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val src = new java.io.File(s"$sf/$name.parquet")
      Files.copy(src.toPath, new java.io.File(dir, s"$name.parquet").toPath)
    }
    new java.io.File(dir, "region.parquet").delete()
    Tables.region(spark, sf)
      .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/region.parquet")
    val e = intercept[IllegalStateException](Preflight.check(spark, dir.getPath))
    assert(e.getMessage.contains("region.r_regionkey"), e.getMessage)
    assert(e.getMessage.contains("INT"), e.getMessage)
  }

  test("a missing column aborts and is named") {
    val dir = Files.createTempDirectory("graft_preflight2").toFile
    for (name <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val src = new java.io.File(s"$sf/$name.parquet")
      Files.copy(src.toPath, new java.io.File(dir, s"$name.parquet").toPath)
    }
    new java.io.File(dir, "documents.parquet").delete()
    Tables.documents(spark, sf).drop("lang")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](Preflight.check(spark, dir.getPath))
    assert(e.getMessage.contains("documents.lang"), e.getMessage)
    assert(e.getMessage.contains("ABSENT"), e.getMessage)
  }
}
