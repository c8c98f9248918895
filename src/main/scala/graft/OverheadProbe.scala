package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev tool: decompose ONE iterative round's wall-clock into driver-side
  * planning (QueryPlanningTracker phases), job count, stage count and
  * executor task time — answers "what is the ~1.4 s/round floor made of"
  * with numbers instead of hypotheses (guide §1: measure first). Not part
  * of the query surface; never invoked by the driver.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          sbt "runMain graft.OverheadProbe"
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchKit.session()
    Blocks.quietReleaseWarnings()
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var taskMs = 0L
    @volatile var jobMs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; starts.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        if (t0 != 0L) jobMs += (System.nanoTime() - t0) / 1000000L
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        val m = s.stageInfo.taskMetrics
        taskMs += m.executorRunTime
        println(f"[stage] id=${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%3d " +
          f"run=${m.executorRunTime}%6dms cpu=${m.executorCpuTime / 1000000}%6dms " +
          f"deser=${m.executorDeserializeTime}%5dms gc=${m.jvmGCTime}%5dms " +
          f"sRead=${m.shuffleReadMetrics.totalBytesRead}%9d sWrite=${m.shuffleWriteMetrics.bytesWritten}%9d " +
          s"name=${s.stageInfo.name.take(60)}")
      }
    })

    // the sccPivot prep, verbatim shape
    val raw = operators.Citations.edges(spark, sfDir)
      .where(col("src") =!= col("dst"))
    val parts = math.max(raw.rdd.getNumPartitions, 8)
    val e2 = Blocks.pinnedCut(raw
      .select(concat(lit("F:"), col("src")).as("k"),
        concat(lit("F:"), col("dst")).as("t"))
      .unionByName(raw
        .select(concat(lit("B:"), col("dst")).as("k"),
          concat(lit("B:"), col("src")).as("t")))
      .repartition(parts, col("k"))
      .dropDuplicates("k", "t"))
    val pivot = e2.where(col("k").startsWith("F:"))
      .groupBy(col("t")).agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("t").asc).limit(1)
      .select(substring(col("t"), 3, Int.MaxValue).as("id"))
    val seed = pivot
      .select(explode(array(concat(lit("F:"), col("id")),
        concat(lit("B:"), col("id")))).as("id")).localCheckpoint()

    var visited = seed
    var frontier = seed
    // warm-up: 2 rounds untimed (codegen, page cache)
    // then timed rounds with per-round decomposition
    for (i <- 1 to 8) {
      jobs = 0; stages = 0; taskMs = 0L; jobMs = 0L
      val t0 = System.nanoTime()
      val h1 = e2.join(frontier.hint("shuffle_hash"), e2("k") === frontier("id"))
        .select(col("t").as("id")).distinct()
      val h2 = e2.join(h1.hint("shuffle_hash"), e2("k") === h1("id"))
        .select(col("t").as("id"))
      val nxt = h1.unionByName(h2).distinct()
        .join(visited, Seq("id"), "left_anti")
      val tPlan0 = System.nanoTime()
      val cutN = nxt.localCheckpoint()
      val tCut = System.nanoTime()
      val n = cutN.count()
      val tCount = System.nanoTime()
      val phases = nxt.queryExecution.tracker.phases
        .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }
        .mkString(" ")
      val grown = visited.union(cutN).localCheckpoint()
      val tGrow = System.nanoTime()
      if (visited ne seed) Blocks.release(visited)
      if (frontier ne seed) Blocks.release(frontier)
      visited = grown
      frontier = cutN
      println(f"[probe] round $i n=$n%6d total=${(tGrow - t0) / 1e9}%5.2fs " +
        f"cut=${(tCut - tPlan0) / 1e9}%5.2fs count=${(tCount - tCut) / 1e9}%5.2fs " +
        f"grow=${(tGrow - tCount) / 1e9}%5.2fs jobs=$jobs stages=$stages " +
        f"taskMs=$taskMs jobMs=$jobMs phases: $phases")
      if (n == 0) {
        println("[probe] converged")
        spark.stop(); return
      }
    }
    spark.stop()
  }
}
