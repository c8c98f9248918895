package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Citations, EventAnalytics}

class AsofSaltSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("join_asof hand oracle: at-or-before semantics, ties, no-match nulls") {
    // user 1: purchases at t10 (eid 100, v 1.0) and t30 (eid 101, v 2.0);
    //         clicks at t05 (before any), t10 (same-instant), t20, t40
    // user 2: click only -> null as-of
    val events = Seq(
      (100L, ts(10), 1L, "purchase", 1.0, "{}"),
      (101L, ts(30), 1L, "purchase", 2.0, "{}"),
      (1L, ts(5), 1L, "click", 0.1, "{}"),
      (2L, ts(10), 1L, "click", 0.2, "{}"),
      (3L, ts(20), 1L, "click", 0.3, "{}"),
      (4L, ts(40), 1L, "click", 0.4, "{}"),
      (5L, ts(7), 2L, "click", 0.5, "{}"),
      (6L, ts(8), 2L, "view", 0.6, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventAnalytics.joinAsofFrom(events)
      .select("event_id", "p_ts", "p_value")
      .collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, None, None),
      (2L, Some(ts(10)), Some(1.0)),
      (3L, Some(ts(10)), Some(1.0)),
      (4L, Some(ts(30)), Some(2.0)),
      (5L, None, None)))
  }

  test("join_asof: same-timestamp purchases collapse to max event_id deterministically") {
    val events = Seq(
      (200L, ts(10), 1L, "purchase", 5.0, "{}"),
      (201L, ts(10), 1L, "purchase", 9.0, "{}"), // max eid wins -> 9.0
      (7L, ts(15), 1L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventAnalytics.joinAsofFrom(events)
      .select("event_id", "p_value").as[(Long, Double)].collect()
    assert(got.toSeq === Seq((7L, 9.0)))
  }

  test("join_asof on the corpus: one row per click, p_ts <= ts always") {
    val df = EventAnalytics.joinAsof(spark, sf).cache()
    val clicks = Tables.load(spark, sf, "events")
      .where($"event_type" === "click").count()
    assert(df.count() === clicks)
    assert(df.where($"p_ts" > $"ts").count() === 0)
  }

  test("join_range: every session's in-range event count equals its n_events") {
    // gap sessions partition each user's timeline, so the interval join
    // must recover exactly the events that built each session
    val df = EventAnalytics.joinRange(spark, sf)
    assert(df.count() > 0)
    assert(df.where($"n_in_range" =!= $"n_events").count() === 0)
  }

  test("salted counts equal plain counts (skew-safe formulation is lossless)") {
    val edges = Citations.edges(spark, sf)
    val plain = Citations.counts(edges).as[(String, Long)].collect().toSet
    val salted = Citations.countsSalted(edges).as[(String, Long)].collect().toSet
    assert(salted === plain)
  }

  test("salted counts pre-aggregate on (key, salt) before the final re-sum") {
    val p = Citations.countsSalted(Citations.edges(spark, sf))
      .queryExecution.executedPlan.toString
    // two aggregation levels over different keys must both appear
    assert(p.contains("salt"), s"no salt key in plan:\n$p")
  }
}
