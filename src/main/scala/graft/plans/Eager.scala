package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Eager one-shot materialization of a frame that is about to fan out
  * into several consumers (the cache-race rule: materialize ONCE,
  * before any consumer plans against it — a lazy persist lets N
  * consumers race to build the cache and duplicates the upstream work
  * up to N×; BroadcastRaceGuard rejects exactly that shape).
  *
  * TWO mechanisms, picked by master (r15 advice — the availability
  * trade is real on clusters):
  *  - `local[*]`: `localCheckpoint(eager = true)` — cheapest, and the
  *    truncated lineage / non-replicated blocks cost nothing in a
  *    single-JVM runtime where losing an "executor" is losing the JVM.
  *  - cluster masters: eager `persist(MEMORY_AND_DISK)` + count —
  *    same materialize-before-fan-out guarantee, but LINEAGE IS KEPT:
  *    an executor loss (or a dynamic-allocation decommission, which
  *    Spark explicitly warns about under localCheckpoint) transparently
  *    recomputes the lost blocks instead of failing the query or
  *    micro-batch.
  *
  * `spark.graft.eagerMaterialize` overrides the choice:
  * `localCheckpoint` | `persist` | `auto` (default).
  *
  * NOT for loop-carried frames (pointer-doubling CC, power iteration):
  * there lineage TRUNCATION is the point — persist keeps the whole
  * iterative plan growing per round. Those sites stay on
  * localCheckpoint explicitly, with the cluster caveat documented. */
object Eager {

  def eager(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val mode = spark.conf.getOption("spark.graft.eagerMaterialize")
      .getOrElse("auto")
    val useLocal = mode match {
      case "localCheckpoint" => true
      case "persist" => false
      case _ => spark.sparkContext.master.startsWith("local")
    }
    if (useLocal) df.localCheckpoint(true)
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    }
  }

  /** Eager materialization that PRESERVES the frame's physical layout
    * (outputPartitioning + outputOrdering) for downstream planning —
    * for loop-INVARIANT frames laid out once so every iteration's join
    * can elide its Exchange/Sort (pageRank's edge list, CC's edge list).
    *
    * Why not [[eager]]: `localCheckpoint` under AQE records the frozen
    * RDD as `UnknownPartitioning(0)` (observed r16 — the executed plan
    * is an AdaptiveSparkPlanExec and the checkpoint does not recover the
    * final stage's partitioning), so EnsureRequirements re-exchanged and
    * re-sorted the "pinned" frame in EVERY iteration — silently undoing
    * the layout the repartition+sort paid for. An eager
    * `persist(MEMORY_AND_DISK)` + count keeps the layout: the
    * InMemoryRelation's outputPartitioning/outputOrdering are the cached
    * plan's, and an explicit-N repartition is never coalesced by AQE.
    * Lineage is also kept, which is the CORRECT trade for loop-invariant
    * frames on clusters (executor loss recomputes; the r15 advice
    * caveat) — unlike loop-CARRIED frames, the plan does not grow with
    * iterations. */
  def pinnedLayout(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** Partition count for a pinned layout, derived from the frame's row
    * count (guide §2: scale-adaptive partitioning, "derive from input
    * size rather than a constant tuned for either local mode or the
    * cluster"). A pinned layout freezes its partition count — AQE can
    * no longer coalesce it, and every co-partitioned consumer must run
    * at that width — so pinning at `spark.sql.shuffle.partitions`
    * over-partitions small inputs (measured r16: the pageRank loop at
    * a fixture-scale 32-way pinned layout ran 5 iterations of 32-task
    * SortMergeJoins that AQE used to collapse to one partition —
    * ~1.7 s of pure scheduling). Target rows per partition is
    * `spark.graft.layoutRowsPerPartition` (default 4M rows ≈ 100-300 MB
    * of narrow key/metadata rows, the guide §2.2 partition-size band);
    * the count is capped at the session shuffle parallelism so a huge
    * frame still matches the cluster's configured width. */
  def layoutPartitions(spark: org.apache.spark.sql.SparkSession, rows: Long): Int = {
    val perPart = spark.conf.getOption("spark.graft.layoutRowsPerPartition")
      .map(_.toLong).getOrElse(4L << 20)
    val cap = spark.sessionState.conf.numShufflePartitions
    math.max(1L, math.min(cap.toLong, (rows + perPart - 1) / perPart)).toInt
  }

  implicit class EagerOps(private val df: DataFrame) extends AnyVal {
    /** `frame.eagerly` — see [[Eager.eager]]. */
    def eagerly: DataFrame = eager(df)

    /** `frame.pinned` — see [[Eager.pinnedLayout]]. */
    def pinned: DataFrame = pinnedLayout(df)
  }
}
