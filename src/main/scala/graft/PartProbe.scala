package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.LogicalRDD
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = BenchKit.session()
    Blocks.quietReleaseWarnings()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def check(tag: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      val e = mk
      e.queryExecution.analyzed match {
        case l: LogicalRDD => println(s"[part] $tag -> " + l.outputPartitioning)
        case other => println(s"[part] $tag not LogicalRDD: " + other.getClass)
      }
      val agg = e.groupBy(col("src")).agg(count(lit(1)))
      agg.collect()
      val nEx = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0).linesIterator.count(_.contains("Exchange h"))
      println(s"[part] $tag groupBy exchanges = " + nEx)
    }
    check("aqe-on", operators.Citations.edges(spark, sfDir)
      .repartition(8, col("src")).localCheckpoint())
    val k = "spark.sql.adaptive.enabled"
    spark.conf.set(k, "false")
    val cut = operators.Citations.edges(spark, sfDir)
      .repartition(8, col("src")).localCheckpoint()
    spark.conf.set(k, "true")
    check("aqe-off-at-cut", cut)
    spark.stop()
  }
}
