package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{EventAnalytics, Relational}

/** Differential tests for sketch-based approximations against their exact
  * twins. Sketch internals differ across engines, so these are NOT
  * DuckDB-oracled — the contract is error-bounded agreement with the
  * exact operators (which ARE oracled).
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("HLL approx distinct users per event type tracks the exact counts") {
    val exact = EventAnalytics.distinctUsers(spark, sf)
      .select($"event_type", $"n_users").as[(String, Long)].collect().toMap
    val approx = Tables.load(spark, sf, "events")
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", rsd = 0.02).as("n_users"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.1,
        s"$k: approx $ap vs exact $ex drifted > 10%")
    }
  }

  test("HLL per-group distinct (parts per order) stays within one of exact") {
    val exact = Relational.distinctPartsPerOrder(spark, sf)
      .select($"l_orderkey", $"n_parts").as[(Long, Long)].collect().toMap
    val approx = Tables.load(spark, sf, "lineitem")
      .groupBy($"l_orderkey")
      .agg(approx_count_distinct($"l_partkey", rsd = 0.01).as("n_parts"))
      .as[(Long, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) <= 1L,
        s"order $k: approx ${approx(k)} vs exact $ex")
    }
  }

  test("count-min sketch overestimates token counts by at most eps * total") {
    import org.apache.spark.sql.Row
    import org.apache.spark.util.sketch.CountMinSketch
    // heavy-hitter counting under memory bounds: the CMS guarantee is
    // count <= estimate <= count + eps * N with probability 1 - delta.
    // Build the sketch distributed (one partial per partition, merged by
    // the aggregate — the map-side-combine shape), read it on the driver.
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(split($"text", " ")).as("tok"))
    val exact = toks.groupBy($"tok").count().as[(String, Long)].collect().toMap
    val total = exact.values.sum
    val eps = 0.005
    val sketchBytes = toks
      .select(count_min_sketch($"tok", lit(eps), lit(0.01), lit(42)).as("s"))
      .first().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))
    val top = exact.toSeq.sortBy(-_._2).take(50)
    top.foreach { case (tok, ex) =>
      val est = cms.estimateCount(tok)
      assert(est >= ex, s"CMS underestimated '$tok': $est < $ex")
      assert(est <= ex + (eps * total).toLong + 1,
        s"CMS overestimated '$tok' beyond the eps bound: $est vs $ex")
    }
    // the top-k ranking by CMS estimate agrees on the clear heavy hitters
    val exactTop10 = top.take(10).map(_._1).toSet
    val cmsTop10 = exact.keys.toSeq.map(t => t -> cms.estimateCount(t))
      .sortBy { case (t, c) => (-c, t) }.take(10).map(_._1).toSet
    assert((exactTop10 & cmsTop10).size >= 8,
      s"CMS top-10 diverged: $cmsTop10 vs $exactTop10")
  }

  test("approx percentile brackets the exact percentile (order totals)") {
    val exactMedian = Tables.load(spark, sf, "orders")
      .select(expr("percentile(o_totalprice, 0.5)")).first().getDouble(0)
    val approxMedian = Tables.load(spark, sf, "orders")
      .select(percentile_approx($"o_totalprice", lit(0.5), lit(10000)))
      .first().getDouble(0)
    assert(math.abs(approxMedian - exactMedian) / exactMedian <= 0.01,
      s"approx $approxMedian vs exact $exactMedian")
  }
}
