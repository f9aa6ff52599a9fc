package graft.tools

/** Ad-hoc plan inspection: prints the formatted physical plan of the
  * named queries at the given sf dir (plan-audit workflow — PLANS.md). */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    for (name <- args(0).split(",")) {
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
