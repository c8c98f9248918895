package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev tool: per-stage decomposition of ONE pageRank execution under
  * bench conditions — prints every stage's task count, executor run
  * time and shuffle bytes, plus job boundaries, so a pin-on/pin-off A/B
  * (via SPARK_GRAFT_CONF) attributes the wall-clock difference to
  * specific stages. Not part of the query surface; never driver-run.
  *
  * Usage: SPARK_GRAFT_CONF="spark.graft.cut.pin=false" \
  *          sbt "runMain graft.PrProbe"
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchKit.session()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        println(s"[job] ${j.jobId} stages=${j.stageIds.mkString(",")}")
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        println(f"[stage] id=${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%3d " +
          f"run=${m.executorRunTime}%6dms cpu=${m.executorCpuTime / 1000000}%6dms " +
          f"sRead=${m.shuffleReadMetrics.totalBytesRead}%9d sWrite=${m.shuffleWriteMetrics.bytesWritten}%9d " +
          s"name=${s.stageInfo.name.take(50)}")
      }
    })
    val e = operators.Citations.edges(spark, sfDir)
    // warm-up
    BenchKit.checksum(operators.Citations.pageRank(e))
    Blocks.sweepAll(spark)
    Thread.sleep(1000)
    println("=== timed run ===")
    val t0 = System.nanoTime()
    BenchKit.checksum(operators.Citations.pageRank(e))
    println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
