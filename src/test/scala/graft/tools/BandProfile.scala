package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scratch profiler (test scope, not shipped): splits each query's wall
  * time into DataFrame construction + analysis/optimization (plan) vs
  * job execution (exec), to localize where the 1.5x band's overhead
  * lives. Run: sbt "Test/runMain graft.tools.BandProfile q_wau q_locf". */
object BandProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    SparkEntry.benchShapes("q_agg")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_wau", "q_locf", "q_repetition", "q_winnow", "q_contamination")
    for (_ <- 1 to 3; name <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.benchShapes(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis + optimization + planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      spark.catalog.clearCache()
      println(f"$name%-18s build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f")
    }
    spark.stop()
  }
}
