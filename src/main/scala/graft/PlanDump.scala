package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executedPlan of named queries (all queries when no
  * args), plus FileScan / ReusedExchange counts — the raw material for
  * PLANS.md sections and for checking scan-dedup fixes. Not part of the
  * query surface; never invoked by the driver.
  *
  * Usage: sbt "runMain graft.PlanDump corpus_shuffle pretrain_manifest"
  * Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // run the query first, through THIS Dataset's own QueryExecution
      // (df.write would spawn a separate one): under AQE, exchange/stage
      // reuse only shows in the FINAL adaptive plan
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // AQE plan strings append an "== Initial Plan ==" section; count
      // operators only in the final (executed) section above it
      val finalPlan = plan.split("== Initial Plan ==")(0)
      val scans = finalPlan.linesIterator.count(_.contains("FileScan"))
      val reused = finalPlan.linesIterator.count(l =>
        l.contains("ReusedExchange") || l.contains("ReusedQueryStage"))
      println(s"===== $n  FileScans=$scans Reused=$reused")
      println(finalPlan)
    }
    spark.stop()
  }
}
