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

  implicit class EagerOps(private val df: DataFrame) extends AnyVal {
    /** `frame.eagerly` — see [[Eager.eager]]. */
    def eagerly: DataFrame = eager(df)
  }
}
