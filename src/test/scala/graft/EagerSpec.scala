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

  test("layoutPartitions derives the width from rows, capped at session parallelism") {
    val cap = spark.sessionState.conf.numShufflePartitions
    assert(Eager.layoutPartitions(spark, 0L) == 1, "empty input still needs one partition")
    assert(Eager.layoutPartitions(spark, 1L) == 1)
    assert(Eager.layoutPartitions(spark, 4L << 20) == 1, "exactly one target-full partition")
    assert(Eager.layoutPartitions(spark, (4L << 20) + 1) == math.min(2, cap))
    assert(Eager.layoutPartitions(spark, Long.MaxValue / 4) == cap,
      "huge inputs clamp to the session shuffle width")
    spark.conf.set("spark.graft.layoutRowsPerPartition", "10")
    try assert(Eager.layoutPartitions(spark, 25L) == math.min(3, cap),
      "target rows per partition is configurable")
    finally spark.conf.unset("spark.graft.layoutRowsPerPartition")
  }

  test("pinnedLayout keeps the frozen partitioning+ordering visible to the planner") {
    // the defect pinnedLayout exists to fix: localCheckpoint under AQE
    // records UnknownPartitioning(0), so a downstream join re-exchanges
    // and re-sorts the frame every time it is referenced (the r16
    // pageRank/CC finding); an eager persist keeps the layout
    import org.apache.spark.sql.functions.col
    val laid = frame()
      .repartition(3, col("id"))
      .sortWithinPartitions("id")
    val pinned = Eager.pinnedLayout(laid)
    try {
      val other = frame().select(col("id").as("id2"), col("v").as("v2"))
      // the frames are pinned with AQE ON (production conditions — AQE
      // is where localCheckpoint loses the layout); the JOIN assertion
      // then plans with AQE/broadcast off so the plain executed tree
      // exposes exactly which sides EnsureRequirements re-exchanges
      // (the IncrementalSemDedupSpec plan-pin discipline)
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.SortExec
      val ckpt = laid.localCheckpoint(true)
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        def shape(left: org.apache.spark.sql.DataFrame) = {
          val j = left.join(other, col("id") === col("id2"))
          val p = j.queryExecution.executedPlan
          (p.collect { case e: ShuffleExchangeExec => e }.size,
            p.collect { case s: SortExec => s }.size)
        }
        // pinned side reaches the join bare: only the OTHER side is
        // exchanged and sorted
        assert(shape(pinned) == ((1, 1)),
          s"pinned layout not honored: ${shape(pinned)} (exchanges, sorts)")
        // contrast pin for the defect pinnedLayout exists to fix: the
        // SAME layout through localCheckpoint is UnknownPartitioning(0),
        // so BOTH sides re-exchange and re-sort — if Spark ever starts
        // preserving it, pinnedLayout can go back to checkpointing
        assert(shape(ckpt) == ((2, 2)),
          "localCheckpoint now PRESERVES partitioning — revisit pinnedLayout")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    } finally pinned.unpersist()
  }
}
