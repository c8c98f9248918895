package graft

/** Dev tool: per-round wall-clock + frontier-size trace for the
  * iterative graph operators, under the same session config as Bench
  * ([[BenchKit.session]]) — pinpoints whether an iterative query's cost
  * is round count, a fat round, or fixed per-round overhead. Not part of
  * the query surface; never invoked by the driver.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          sbt "runMain graft.RoundProbe scc"
  */
object RoundProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchKit.session()
    Blocks.quietReleaseWarnings()
    val op = args.headOption.getOrElse("scc")
    val e = operators.Citations.edges(spark, sfDir)
    val t0 = System.nanoTime()
    var last = t0
    // the count thunk reads the operator's OWN materialized cut (never
    // re-executes the round's join tree), so dt is the round's single
    // real computation — ADVICE r10
    def probe(i: Int, df: org.apache.spark.sql.DataFrame,
              cnt: () => Long): Unit = {
      val n = cnt()
      val t = System.nanoTime()
      println(f"[round] $op $i%2d frontier=$n%8d dt=${(t - last) / 1e9}%6.2f s elapsed=${(t - t0) / 1e9}%6.2f s")
      last = t
    }
    val out = op match {
      case "scc" => operators.Citations.sccPivot(e, roundProbe = probe)
      case "sccall" => operators.Citations.sccAll(e, roundProbe = probe)
      case "components" => operators.Citations.components(e, roundProbe = probe)
      case "bfs" => operators.Citations.bfsPaths(e, roundProbe = probe)
      case "lpa" => operators.Citations.lpa(e, roundProbe = probe)
      case other => sys.error(s"unknown op $other")
    }
    val n = out.count()
    println(f"[round] $op done rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
