package graft

import graft.plans.Eager
import org.apache.spark.storage.StorageLevel

/** Eager.eagerly — the shared materialize-once helper (r15 advice):
  * localCheckpoint on local masters, lineage-keeping eager persist on
  * clusters, same rows either way. */
class EagerSpec extends SparkSpec {

  private def frame() = {
    val sess = spark
    import sess.implicits._
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
  }

  test("auto mode on local[*] localCheckpoints: lineage truncated, rows intact") {
    val e = Eager.eager(frame())
    assert(e.collect().length == 100)
    // localCheckpoint shows up as a checkpointed plan root, not a persist
    assert(e.queryExecution.analyzed.collectLeaves().exists(
      _.getClass.getSimpleName.contains("LogicalRDD")),
      "local master must take the localCheckpoint arm")
  }

  test("persist mode keeps lineage: eagerly materialized, recomputable, rows intact") {
    spark.conf.set("spark.graft.eagerMaterialize", "persist")
    try {
      val e = Eager.eager(frame())
      assert(e.storageLevel != StorageLevel.NONE,
        "persist arm must leave the frame cached")
      // lineage kept: the plan still roots at the original local relation
      assert(!e.queryExecution.analyzed.collectLeaves().exists(
        _.getClass.getSimpleName.contains("LogicalRDD")),
        "persist arm must not truncate lineage")
      assert(e.collect().length == 100)
      e.unpersist()
    } finally spark.conf.unset("spark.graft.eagerMaterialize")
  }

  test("explicit localCheckpoint mode overrides auto") {
    spark.conf.set("spark.graft.eagerMaterialize", "localCheckpoint")
    try {
      val e = Eager.eager(frame())
      assert(e.queryExecution.analyzed.collectLeaves().exists(
        _.getClass.getSimpleName.contains("LogicalRDD")))
    } finally spark.conf.unset("spark.graft.eagerMaterialize")
  }
}
