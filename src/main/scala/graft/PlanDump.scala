package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of the named queries at the given
  * sf dir — the source for PLANS.md evidence sections.
  * Usage: runMain graft.PlanDump <sfDir> <name>[,<name>...] [bench]
  * ("bench" plans the benchShapes form — the production shape without
  * verify-only total sorts.)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = (args(0), args(1).split(",").toSeq)
    val shapes = if (args.lift(2).contains("bench")) SparkEntry.benchShapes
                 else SparkEntry.queries
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"## $name")
      println()
      println("```")
      println(shapes(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("```")
    }
    spark.stop()
  }
}
