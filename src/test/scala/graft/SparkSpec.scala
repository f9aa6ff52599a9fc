package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session per suite (guide: one SparkSession per suite). */
trait SparkSpec extends AnyFunSuite {
  // local[4, 2]: allow ONE task retry, like any real cluster
  // (spark.task.maxFailures defaults to 4 there; plain local[4] pins it
  // to 1, which makes task-retry behavior untestable — TaskRetrySpec
  // injects once-failing tasks into the state-fold write paths). Guard
  // exceptions are planning-time, so intercept-based specs see no retry.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}
