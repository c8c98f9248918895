package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Citations, EventAnalytics, Relational, Sketches}

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
    // the PRODUCTION query (SparkEntry: events_distinct_users_approx),
    // bounded against its exact oracled twin
    val exact = EventAnalytics.distinctUsers(spark, sf)
      .select($"event_type", $"n_users").as[(String, Long)].collect().toMap
    val approx = Sketches.distinctUsersApprox(spark, sf)
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

  test("token_heavy_hitters: CMS estimates bounded and top-k agrees with exact") {
    // the PRODUCTION query (SparkEntry: token_heavy_hitters) vs the exact
    // vocabulary counts: the CMS guarantee is exact <= est <= exact + 2N/w
    // (w.h.p.), and the clear heavy hitters must surface in the top-k
    val exact = Tables.load(spark, sf, "documents")
      .select(explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").count().as[(String, Long)].collect().toMap
    val total = exact.values.sum
    val est = Sketches.tokenHeavyHitters(spark, sf, k = 50)
      .as[(String, Long)].collect()
    assert(est.length === math.min(50, exact.size))
    est.foreach { case (tok, e) =>
      val ex = exact(tok)
      assert(e >= ex, s"CMS underestimated '$tok': $e < $ex")
      assert(e <= ex + 2L * total / Sketches.CmsWidth + 1,
        s"CMS overestimated '$tok' beyond the 2N/w bound: $e vs $ex")
    }
    val exactTop10 = exact.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(10).map(_._1).toSet
    val cmsTop10 = est.take(10).map(_._1).toSet
    assert((exactTop10 & cmsTop10).size >= 8,
      s"CMS top-10 diverged: $cmsTop10 vs $exactTop10")
  }

  test("token_heavy_hitters plan: sketch join broadcasts, no cartesian/SMJ on the sketch") {
    val plan = Sketches.tokenHeavyHitters(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"sketch join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("events_value_percentiles_approx: rank error within the GK guarantee") {
    // the PRODUCTION query vs the raw per-group value distributions. The
    // GK contract is RANK-space, not value-space (a sparse p99 tail can
    // put adjacent ranks far apart in value): the returned value must be
    // an actual group member whose empirical rank is within
    // n/accuracy (+1 for discretization) of the target rank.
    val groups = Tables.load(spark, sf, "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sorted }
    val approx = Sketches.valuePercentilesApprox(spark, sf)
      .as[(String, Double, Double, Double)].collect()
    assert(approx.map(_._1).toSet === groups.keySet)
    approx.foreach { case (t, a50, a90, a99) =>
      val vs = groups(t)
      val n = vs.length
      Seq((a50, 0.5, "p50"), (a90, 0.9, "p90"), (a99, 0.99, "p99")).foreach {
        case (a, q, lbl) =>
          assert(vs.contains(a), s"$t $lbl: $a is not a group member")
          // empirical rank range of the returned value (ties included)
          val lo = vs.indexWhere(_ >= a) + 1
          val hi = vs.lastIndexWhere(_ <= a) + 1
          val target = q * n
          val tol = n / 10000.0 + 1
          assert(lo - tol <= target && target <= hi + tol,
            s"$t $lbl: value $a spans ranks [$lo,$hi], target $target, n=$n")
      }
    }
  }

  test("events_distinct_users_merge: sketch union = exact within HLL error; naive sum inflates") {
    val exact = EventAnalytics.distinctUsers(spark, sf)
      .select($"event_type", $"n_users").as[(String, Long)].collect().toMap
    val merged = Sketches.distinctUsersMerge(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(merged.map(_._1).toSet === exact.keySet)
    merged.foreach { case (k, m, naive, nDays) =>
      val ex = exact(k)
      // lgK=12 => rsd ~ 1.04/sqrt(2^12) ~ 1.6%; allow 5% for union slop
      assert(math.abs(m - ex).toDouble / ex <= 0.05,
        s"$k: merged $m vs exact $ex drifted > 5%")
      // distinct counts don't sum: a user active on multiple days is
      // counted once by the union, nDays times by the naive rollup —
      // the naive sum must be >= the merged estimate (strictly >, in
      // this synthetic data where users recur across days)
      assert(naive >= m, s"$k: naive $naive < merged $m")
      assert(nDays > 1, s"$k spans only $nDays day(s) — merge untested")
    }
    // the inflation must actually manifest somewhere, or the test is
    // vacuous (i.e. the data would have no cross-day repeat users)
    assert(merged.exists { case (k, m, naive, _) => naive > m * 1.5 },
      "no event_type shows naive-sum inflation; cross-day repeats absent?")
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
  test("citation_hyperball: every estimate within HLL error of the exact 2-hop in-ball; deterministic") {
    val got = Citations.hyperBall(Citations.edges(spark, sf))
      .as[(String, Long)].collect()
    assert(got.length === 30)
    // exact 2-hop in-ball per node, brute force on the collected edges:
    // ball(v) = {v} ∪ in(v) ∪ in(in(v))
    val raw = Citations.edges(spark, sf).as[(String, String)].collect()
      .filter(p => p._1 != p._2).distinct
    val inNbr = raw.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      .withDefaultValue(Set.empty[String])
    def ball2(v: String): Int =
      (inNbr(v).flatMap(u => inNbr(u)) ++ inNbr(v) + v).size
    got.foreach { case (v, est) =>
      val ex = ball2(v)
      assert(math.abs(est - ex).toDouble / ex <= 0.05,
        s"$v: estimate $est vs exact $ex drifted > 5%")
    }
    // the ranking must be genuinely descending with the id tie-break
    got.sliding(2).foreach { case Array((idA, a), (idB, b)) =>
      assert(a > b || (a == b && idA < idB), s"order broke at $idA/$idB")
    }
    // determinism across physical layout: DataSketches HLL is a pure
    // function of the item SET, so a repartitioned rerun is identical
    val again = Citations.hyperBall(
      Citations.edges(spark, sf).repartition(7)).as[(String, Long)].collect()
    assert(got.toSeq === again.toSeq)
  }

  test("citation_neighborhood_fn: swept N(h) within HLL error of the exact pair closure, h <= 3") {
    val got = Citations.neighborhoodFunction(Citations.edges(spark, sf), maxHops = 3)
      .as[(Int, Long, Double, Int, Boolean)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === (0 to 3))
    // exact N(h) = |{(u,v): dist(u->v) <= h}| (self-pairs included) by
    // brute-force in-neighbor closure on the collected sf0.001 edges
    val raw = Citations.edges(spark, sf).as[(String, String)].collect()
      .filter(p => p._1 != p._2).distinct
    val inNbr = raw.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      .withDefaultValue(Set.empty[String])
    val nodes = raw.flatMap(p => Seq(p._1, p._2)).distinct
    var balls = nodes.map(v => v -> Set(v)).toMap
    val exact = scala.collection.mutable.ArrayBuffer[(Int, Long)]((0, nodes.length.toLong))
    (1 to 3).foreach { h =>
      balls = balls.map { case (v, b) => v -> (b ++ inNbr(v).flatMap(balls)) }
      exact += ((h, balls.values.map(_.size.toLong).sum))
    }
    // (ball_h(v) = ball_{h-1}(v) ∪ ⋃_{u∈in(v)} ball_{h-1}(u) — the
    // HyperBall recurrence — so after h rounds it IS dist(u→v) ≤ h)
    got.foreach { case (h, est, _, _, _) =>
      val ex = exact.find(_._1 == h).get._2
      assert(math.abs(est - ex).toDouble / ex <= 0.05,
        s"h=$h: estimate $est vs exact $ex drifted > 5%")
    }
    // N(h) is monotone nondecreasing; frac of the deepest swept hop ends
    // at exactly 1.0 and the effective diameter is the first h >= 0.9
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sorted)
    assert(got.last._3 === 1.0)
    val effD = got.head._4
    assert(got.forall(_._4 == effD))
    val firstHit = got.find(_._3 >= 0.9).map(_._1).getOrElse(3)
    assert(effD === firstHit, s"eff_diameter $effD vs first-0.9 hop $firstHit")
    // the horizon flag is exactly "the deepest hop still added mass"
    val grewAtLast = got(3)._2 != got(2)._2
    assert(got.forall(_._5 == grewAtLast),
      s"horizon_reached must equal last-hop growth ($grewAtLast)")
  }

  test("citation_neighborhood_fn: 90% point beyond the sweep raises horizon_reached (r13 directive #5)") {
    import spark.implicits._
    // 12-node directed path 1→2→…→12: N(0)=12, N(1)=23, N(2)=33 — still
    // growing at every swept hop, and the TRUE 90% point (N(∞)=78, 90% =
    // 70.2 ⇒ h=9) lies far beyond maxHops=2. The old code normalized frac
    // to the deepest swept ball, so the last row read 1.0 ≥ 0.9 and
    // eff_diameter silently clamped to maxHops with no signal.
    val path = (1 to 11).map(i => (i.toString, (i + 1).toString))
      .toDF("src", "dst")
    val swept = Citations.neighborhoodFunction(path, maxHops = 2)
      .as[(Int, Long, Double, Int, Boolean)].collect().sortBy(_._1)
    assert(swept.map(_._1).toSeq === (0 to 2))
    // tiny sets: HLL at lgK=12 is exact here
    assert(swept.map(_._2).toSeq === Seq(12L, 23L, 33L))
    assert(swept.forall(_._5), "truncated sweep must flag horizon_reached")
    assert(swept.forall(_._4 == 2), "eff_diameter clamps at maxHops (flagged)")
    // converged twin: the same path swept PAST its diameter (the last
    // hop must add nothing, so maxHops = 12 > diameter 11) reports a
    // trustworthy eff_diameter with the flag DOWN.
    // N(h) = 12 + h(h+1)/2 + (11-h)h for h ≤ 11: N(7)=68 < 70.2 ≤ N(8)=72
    val full = Citations.neighborhoodFunction(path, maxHops = 12)
      .as[(Int, Long, Double, Int, Boolean)].collect().sortBy(_._1)
    assert(!full.exists(_._5), "converged sweep must not flag horizon")
    assert(full.last._2 === 78L)
    assert(full.head._4 === 8, "true 90% point of the 12-path is h=8")
  }

}
