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
