package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager lifecycle for `localCheckpoint`-pinned frames.
  *
  * Every eager `localCheckpoint()` leaves its materialized partitions in
  * the block manager until the RDD is unpersisted or the JVM dies —
  * nothing scopes them to the computation that needed them. In a
  * long-lived session (the bench JVM runs ~100 queries × 4 executions;
  * a production notebook session is worse) superseded checkpoint blocks
  * accumulate and squeeze execution memory: round-7 measured
  * `dedup_near` 0.58 → 3.54 s and `dedup_embedding` 1.47 → 4.83 s with
  * zero code change, with monotonically growing within-query run times —
  * the signature of block pressure, not plan regressions.
  *
  * Two remedies, both here:
  *  - [[release]] frees ONE checkpointed frame's blocks — iterative
  *    operators call it on each superseded iterate as soon as the next
  *    checkpoint has materialized (pageRank, k-means, PQ codebooks,
  *    label propagation), so peak footprint is O(one iterate), not
  *    O(iterations).
  *  - [[sweepAll]] frees every persisted RDD in the session — harness
  *    code (Bench) calls it between query executions so no run inherits
  *    the previous one's blocks. Callers must not hold live references
  *    to checkpointed frames across a sweep: a local checkpoint has no
  *    lineage to recompute from, so a swept frame is dead, not cold.
  */
private[graft] object Blocks {

  /** Unpersisting a lineage-truncated checkpoint logs one WARN per RDD
    * ("cannot be recomputed after unpersisting") — in the harness mains
    * that is pure by-design noise (~100 queries' worth of deliberate
    * releases would drown the captured output tail), so Bench/Verify/
    * CadenceSweep/Soak call this to silence exactly that logger. It is
    * deliberately NOT a static init: a library must not reconfigure
    * logging as an import side effect, and in a user session the WARN is
    * the one early signal if a future code path ever releases a frame
    * something still reads — production keeps it. */
  def quietReleaseWarnings(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD", org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }

  /** Eager `localCheckpoint()` that actually KEEPS the frame's hash
    * partitioning visible to downstream plans.
    *
    * Under AQE (the session default), the executed plan a checkpoint
    * captures is an `AdaptiveSparkPlanExec`, and `LogicalRDD.fromDataset`
    * reads its `outputPartitioning` as `UnknownPartitioning` — so every
    * `repartition(k, key).localCheckpoint()` "pinned partitioning" frame
    * in the iterative family silently lost its partitioning and every
    * per-round join/aggregate re-exchanged it from scratch (measured at
    * sf0.1: sccPivot re-shuffled the full 21 MB tagged edge frame TWICE
    * per round; a post-checkpoint `groupBy(key)` planned 1 exchange
    * instead of 0). Disabling AQE for just the checkpoint's own
    * materialization restores the documented behavior — the cut plan is
    * a deterministic exchange+narrow chain with nothing adaptive left to
    * decide, so AQE has no value to add THERE, while the per-round
    * consumers (which keep running under AQE) can now reuse the
    * partitioning instead of re-exchanging. Scale-independent: this is
    * a plan-correctness fix (results are bit-identical either way), and
    * at 100 TB the avoided per-round exchange is the edge frame itself. */
  def pinnedCut(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.adaptive.enabled"
    val prev = conf.get(key)
    conf.set(key, "false")
    try df.localCheckpoint()
    finally conf.set(key, prev)
  }

  /** Unpersist the checkpointed RDD backing `df`, if `df` is the direct
    * result of a `localCheckpoint()`/`checkpoint()` call (its analyzed
    * plan is the `LogicalRDD` the checkpoint wrapped). No-op otherwise —
    * deliberately conservative: derived frames share the parent's RDD,
    * and releasing through a derivation would free blocks the parent
    * still owns. Async (`blocking = false`): the freeing races nothing —
    * the caller has already materialized the successor. */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case l: LogicalRDD => l.rdd.unpersist(blocking = false)
    case _ => ()
  }

  /** RDD ids exempt from [[sweepAll]] — model artifacts a per-dataset
    * cache owns across queries (the SCC labeling: node-sized, one frame
    * per dataset, the in-session stand-in for the persisted table a
    * production deployment would reuse). Bounded by construction: only
    * deliberate model caches pin, and they pin one frame per dataset. */
  private val pinned = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Exempt a checkpointed frame's RDD from [[sweepAll]]. No-op for
    * non-checkpoint frames (same conservatism as [[release]]). An
    * explicit [[release]] still frees a pinned frame — pin only guards
    * against the harness's between-queries sweep, not the owner's own
    * lifecycle. */
  def pin(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case l: LogicalRDD => pinned.add(l.rdd.id)
    case _ => ()
  }

  /** Unpersist EVERY persisted RDD (except pinned model artifacts) and
    * clear the Dataset cache.
    * Blocking, so the caller observes a clean block manager — this is
    * harness-side (between bench executions), never inside an operator. */
  def sweepAll(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .filterNot(r => pinned.contains(r.id))
      .foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    // Unpersist reaches only RDD blocks. Broadcast frames (pageRank's
    // dangling mass, hits' norms) and finished-job shuffle files are
    // reclaimed by ContextCleaner, which acts on a weak-reference queue
    // drained by DRIVER GC — and a mostly-idle heap may not GC for the
    // whole session (round-8 bench: monotonically growing runs on
    // unchanged plans). One explicit GC here makes the sweep actually
    // mean "clean slate": the dead broadcasts/shuffles get enqueued now
    // and the (async) cleaner frees them before the next timed run.
    System.gc()
  }
}
