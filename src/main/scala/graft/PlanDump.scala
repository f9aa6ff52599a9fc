package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of the named queries at the given
  * sf dir — the source for PLANS.md evidence sections.
  * Usage: runMain graft.PlanDump <sfDir> <name>[,<name>...] [bench|benchexec] [k=v ...]
  * ("bench" plans the benchShapes form — the production shape without
  * verify-only total sorts; "benchexec" additionally EXECUTES the query
  * through the noop sink first, so the printed plan is the FINAL
  * adaptive plan — ReusedExchange / AQEShuffleRead / runtime join
  * rewrites visible — not the conservative initial one. Trailing k=v
  * args become session confs — r17, for dumping the CLUSTER-SHAPED plan
  * a fixture-scale session hides, e.g.
  * spark.sql.autoBroadcastJoinThreshold=-1
  * spark.graft.eagerMaterialize=persist.)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = (args(0), args(1).split(",").toSeq)
    val mode = args.lift(2)
    val shapes = if (mode.exists(_.startsWith("bench"))) SparkEntry.benchShapes
                 else SparkEntry.queries
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    args.drop(3).filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"## $name")
      println()
      println("```")
      val df = shapes(name)(spark, sfDir)
      if (mode.contains("benchexec")) {
        // drive df's OWN QueryExecution (a noop write wraps the plan in
        // a separate command whose execution never finalizes df's
        // AdaptiveSparkPlan) so the print shows the final runtime plan
        df.collect()
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        spark.catalog.clearCache()
      } else
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println("```")
    }
    spark.stop()
  }
}
