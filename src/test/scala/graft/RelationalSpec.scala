package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("basket_lift: brute-force association recompute; one reused basket exchange") {
    val op = Tables.load(spark, sf, "lineitem")
      .selectExpr("l_orderkey AS o", "l_partkey AS p").distinct()
      .as[(Long, Long)].collect()
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val partN = op.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nOrders = byOrder.size.toLong
    val pairCounts = byOrder.values
      .flatMap(ps => ps.combinations(2).map(c => (c(0), c(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 3)
    val got = Relational.basketLift(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet === pairCounts.keySet)
    got.foreach { case ((a, b), (_, _, nab, na, nb, lift, conf)) =>
      assert(nab === pairCounts((a, b)))
      assert(na === partN(a) && nb === partN(b))
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(lift === r6((nab * nOrders).toDouble / (na * nb).toDouble))
      assert(conf === r6(nab.toDouble / na.toDouble))
    }
    assert(got.nonEmpty, "no pair reached the support floor at sf0.001")
    // the self-join's two sides read ONE pinned basket exchange — reuse
    // only shows in the FINAL adaptive plan, so execute this frame first
    val df = Relational.basketLift(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"basket exchange not reused:\n$p")
  }

  test("basket_apriori_triples: brute-force recompute + downward closure; prune fixture") {
    import org.apache.spark.sql.functions.col
    // full in-memory recompute at sf0.001 with the same relative floor
    val op = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .selectExpr("l_orderkey AS o", "p_brand AS b").distinct()
      .as[(Long, String)].collect()
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val nOrders = byOrder.size.toLong
    val pairN = byOrder.values
      .flatMap(bs => bs.combinations(2).map(c => (c(0), c(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val l2 = pairN.filter(_._2 * 1000 >= nOrders).keySet
    val tripN = byOrder.values
      .flatMap(bs => bs.combinations(3).map(c => (c(0), c(1), c(2))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 * 1000 >= nOrders)
    val expTop = tripN.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(50)
      .map { case (k, n) => k -> ((n, n * 1000000L / nOrders)) }.toMap
    val got = Relational.basketAprioriTriples(spark, sf)
      .as[(String, String, String, Long, Long)].collect()
    assert(got.length === math.min(50, tripN.size))
    assert(got.nonEmpty, "no triple reached the floor at sf0.001")
    got.foreach { case (a, b, c, n, ppm) =>
      assert(expTop((a, b, c)) === ((n, ppm)), s"($a,$b,$c)")
      // downward closure: every sub-pair of a frequent triple is frequent
      assert(l2((a, b)) && l2((a, c)) && l2((b, c)),
        s"sub-pair of ($a,$b,$c) not frequent — Apriori invariant broken")
    }
    // (at sf0.001 every brand pair clears the 0.1% floor — the prune
    // path is exercised by the hand fixture below instead)
    assert(l2.nonEmpty && l2.subsetOf(pairN.keySet))
    // hand fixture driven through the operator itself: 2000 baskets.
    // {x,y} together in baskets 1-10 (0.5%), z with x in 11-20 and with
    // y in 21-30 (so (x,z) and (y,z) are frequent) but with BOTH only in
    // basket 1 -> every sub-pair clears the 0.1% floor yet the triple
    // (support 1/2000) misses it: output empty, killed by the support
    // filter with every prune satisfied.
    val rows = (1 to 10).flatMap(o => Seq((o.toLong, "x"), (o.toLong, "y"))) ++
      (11 to 20).flatMap(o => Seq((o.toLong, "x"), (o.toLong, "z"))) ++
      (21 to 30).flatMap(o => Seq((o.toLong, "y"), (o.toLong, "z"))) ++
      Seq((1L, "z")) ++ (31 to 2000).map(o => (o.toLong, "f"))
    val gotFix = Relational
      .basketAprioriTriplesFrom(rows.toDF("o", "b"))
      .as[(String, String, String, Long, Long)].collect()
    assert(gotFix.isEmpty,
      s"fixture: expected no frequent triple, got ${gotFix.toSeq}")
    // add z to baskets 2-10 -> triple support 10 (0.5%) -> exactly
    // (x,y,z) emerges, support_ppm = floor(10e6/2000)
    val rows2 = rows ++ (2 to 10).map(o => (o.toLong, "z"))
    val gotFix2 = Relational
      .basketAprioriTriplesFrom(rows2.toDF("o", "b"))
      .as[(String, String, String, Long, Long)].collect()
    assert(gotFix2.map(r => (r._1, r._2, r._3, r._4)).toSeq ===
      Seq(("x", "y", "z", 10L)))
    assert(gotFix2.head._5 === 10L * 1000000L / 2000L)
  }

  test("basket_rules: both directions per frequent pair; conf/lift from exact recompute") {
    import org.apache.spark.sql.functions.col
    val op = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .selectExpr("l_orderkey AS o", "p_brand AS b").distinct()
      .as[(Long, String)].collect()
    val nOrders = op.map(_._1).distinct.length.toLong
    val itemN = op.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = op.groupBy(_._1).values
      .flatMap(rs => rs.map(_._2).sorted.toSeq.combinations(2)
        .map(c => (c(0), c(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 * 1000 >= nOrders)
    val got = Relational.basketRules(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.length === pairN.size * 2, "one rule per direction per frequent pair")
    got.foreach { case (a, c, nBoth, nAnte, conf, lift) =>
      val key = if (a < c) (a, c) else (c, a)
      assert(pairN(key) === nBoth, s"$a->$c n_both")
      assert(nAnte === itemN(a), s"$a->$c n_ante")
      assert(conf === nBoth * 1000000L / nAnte, s"$a->$c conf")
      assert(lift === (BigInt(nBoth) * nOrders * 1000000L /
        (BigInt(itemN(a)) * itemN(c))).toLong, s"$a->$c lift")
    }
    // lift is direction-symmetric, confidence is not (the point of rules)
    val byPair = got.groupBy(r => if (r._1 < r._2) (r._1, r._2) else (r._2, r._1))
    byPair.values.foreach { rs =>
      assert(rs.length === 2)
      assert(rs(0)._6 === rs(1)._6, "lift must match across directions")
    }
    assert(got.exists(r => {
      val rev = got.find(x => x._1 == r._2 && x._2 == r._1).get
      r._5 != rev._5
    }), "no asymmetric confidence found — fixture rot")
    // hand fixture: x in 3 baskets, y in 2, both in 2 of 3 total ->
    // conf(x->y) = 2/3, conf(y->x) = 1, lift = 2*3/(3*2) = 1
    val rows = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"))
    val fix = Relational.basketRulesFrom(rows.toDF("o", "b"))
      .as[(String, String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(fix.toSeq === Seq(
      ("x", "y", 2L, 3L, 666666L, 1000000L),
      ("y", "x", 2L, 2L, 1000000L, 1000000L)))
  }

  test("orders_pareto: Lorenz/Gini equals an in-memory exact recompute; deciles partition customers") {
    val got = Relational.ordersPareto(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1)
    // in-memory oracle with the SAME arithmetic discipline: DECIMAL(18,2)
    // revenue sums, exact integer ranks, one identically-parenthesized
    // double chain at the end
    val rev = Tables.load(spark, sf, "orders")
      .selectExpr("o_custkey", "CAST(o_totalprice AS DECIMAL(18,2)) AS p")
      .as[(Long, java.math.BigDecimal)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        k -> rs.map(r => BigDecimal(r._2)).sum
      }.toSeq
    val sorted = rev.sortBy { case (k, v) => (v, k) }
    val n = sorted.length
    val tr = sorted.map(_._2).sum
    val srx = sorted.zipWithIndex
      .map { case ((_, x), i) => BigDecimal(i + 1) * x }.sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gini = r6((2.0 * srx.toDouble) / (n.toDouble * tr.toDouble) -
      (n.toDouble + 1.0) / n.toDouble)
    val expected = sorted.zipWithIndex
      .map { case ((_, x), i) => (((i.toLong * 10) / n).toInt, x) }
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (dec, xs) =>
        val cumAtEnd = sorted.take(
          sorted.zipWithIndex.count { case (_, i) => (i.toLong * 10) / n <= dec })
          .map(_._2).sum
        (dec, xs.length.toLong,
          xs.map(_._2).sum.setScale(2).toDouble,
          r6(cumAtEnd.toDouble / tr.toDouble), gini)
      }
    assert(got.toSeq === expected)
    // structural: deciles partition the customer base, Lorenz curve ends at 1
    assert(got.map(_._2).sum === n.toLong)
    assert(got.last._4 === 1.0)
    assert(got.map(_._4).toSeq === got.map(_._4).sorted.toSeq)
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("orders_rfm: scores monotone in their metrics, composite digits consistent") {
    val got = Relational.ordersRfm(spark, sf)
      .as[(Long, Int, Long, Double, Int, Int, Int, Int)].collect()
    assert(got.length === Tables.load(spark, sf, "orders")
      .select("o_custkey").distinct().count())
    got.foreach { case (_, rec, freq, mon, r, f, m, rfm) =>
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4)
      assert(rfm === r * 100 + f * 10 + m)
      assert(rec >= 0 && freq >= 1 && mon > 0)
    }
    // monotone: a better metric can never yield a worse score
    def monotone(pairs: Seq[(Double, Int)]): Boolean =
      pairs.sortBy(_._1).sliding(2).forall {
        case Seq(a, b) => a._2 <= b._2; case _ => true }
    assert(monotone(got.map(g => (g._3.toDouble, g._6)).toSeq), "f_score")
    assert(monotone(got.map(g => (g._4, g._7)).toSeq), "m_score")
    assert(monotone(got.map(g => (-g._2.toDouble, g._5)).toSeq), "r_score inverse")
    // the quartiling actually separates the population
    assert(got.map(_._6).distinct.length >= 2)
    assert(got.map(_._7).distinct.length >= 2)
  }

  test("q1: one group per (returnflag, linestatus); counts sum to filtered rows") {
    val df = Relational.q1PricingSummary(spark, sf).cache()
    assert(df.count() === 6)
    val totalRows = df.agg(org.apache.spark.sql.functions.sum("count_order"))
      .first().getLong(0)
    val expected = Tables.load(spark, sf, "lineitem")
      .where($"l_shipdate" <= "2000-12-01").count()
    assert(totalRows === expected)
  }

  test("q3/q5 plans broadcast the dimension sides") {
    assert(plan(Relational.q3ShippingPriority(spark, sf)).contains("BroadcastHashJoin"))
    val p5 = plan(Relational.q5RegionRevenue(spark, sf))
    assert(p5.contains("BroadcastHashJoin"))
  }

  test("topk plans as TakeOrderedAndProject (bounded heap, no global sort)") {
    assert(plan(Relational.topkOrders(spark, sf)).contains("TakeOrderedAndProject"))
  }

  test("outer join keeps customers with zero orders (count 0, not null)") {
    val df = Relational.joinOuterOrderCounts(spark, sf)
    val custs = Tables.load(spark, sf, "customer").count()
    assert(df.count() === custs) // every customer present
    val zero = Tables.load(spark, sf, "customer")
      .join(Tables.load(spark, sf, "orders"),
        $"c_custkey" === $"o_custkey", "left_anti").count()
    assert(df.where($"n_orders" === 0).count() === zero)
  }

  test("q13: distribution equals a driver-side recompute and totals the customer set") {
    val dist = Relational.q13OrderDistribution(spark, sf)
      .as[(Long, Long)].collect().toMap
    val custs = Tables.load(spark, sf, "customer")
      .select("c_custkey").as[Long].collect()
    assert(dist.values.sum === custs.length.toLong) // total partition
    // independent recompute: per-customer qualifying-order counts from
    // the raw tables, zero-inclusive (at this sf the zero bucket happens
    // to be empty — every customer has a non-urgent order — so the
    // equality below also proves no spurious zero rows appear; the
    // zero-bucket-present case is covered by the outer-join-keeps-zeros
    // test above, which shares the join shape)
    val perCust = Tables.load(spark, sf, "orders")
      .where($"o_orderpriority" =!= "1-URGENT")
      .groupBy("o_custkey").count()
      .as[(Long, Long)].collect().toMap
    val expect = custs.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(dist === expect)
  }

  test("semi ∩ anti partition the customer set under the same predicate") {
    val semiUrgent = Tables.load(spark, sf, "customer")
      .join(Tables.load(spark, sf, "orders").where($"o_orderpriority" === "1-URGENT"),
        $"c_custkey" === $"o_custkey", "left_semi").count()
    val anti = Relational.joinAnti(spark, sf).count()
    assert(semiUrgent + anti === Tables.load(spark, sf, "customer").count())
  }

  test("rollup = detail + per-status subtotals + grand total") {
    val df = Relational.aggRollup(spark, sf).cache()
    val detail = df.where($"o_orderstatus".isNotNull && $"o_orderpriority".isNotNull).count()
    val statusSub = df.where($"o_orderstatus".isNotNull && $"o_orderpriority".isNull).count()
    val grand = df.where($"o_orderstatus".isNull).count()
    assert(grand === 1)
    assert(statusSub === 3) // F, O, P
    assert(df.count() === detail + statusSub + grand)
  }

  test("cube has 4 grouping combinations; grand total row count = table size") {
    val df = Relational.aggCube(spark, sf).cache()
    val grand = df.where($"l_returnflag".isNull && $"l_linestatus".isNull)
    assert(grand.count() === 1)
    assert(grand.first().getAs[Long]("n") ===
      Tables.load(spark, sf, "lineitem").count())
  }

  test("window top2: at most 2 rows per segment, rn ∈ {1,2}") {
    val df = Relational.windowTop2PerSegment(spark, sf).cache()
    assert(df.groupBy("c_mktsegment").count().where($"count" > 2).count() === 0)
    assert(df.where(!$"rn".isin(1, 2)).count() === 0)
  }

  test("running revenue is monotone per customer (positive totalprice)") {
    val df = Relational.windowRunningRevenue(spark, sf)
    val bad = df
      .withColumn("prev", org.apache.spark.sql.functions.lag("running_total", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")))
      .where($"prev".isNotNull && $"running_total" < $"prev")
    assert(bad.count() === 0)
  }

  test("setops: intersect ⊆ both sides; except ∩ building = ∅; union distinct") {
    val inter = Relational.setopIntersect(spark, sf).as[Long].collect().toSet
    val except = Relational.setopExcept(spark, sf).as[Long].collect().toSet
    val building = Tables.load(spark, sf, "customer")
      .where($"c_mktsegment" === "BUILDING").select("c_custkey").as[Long].collect().toSet
    val rich = Tables.load(spark, sf, "customer")
      .where($"c_acctbal" > 5000).select("c_custkey").as[Long].collect().toSet
    assert(inter.subsetOf(building) && inter.subsetOf(rich))
    assert(except.intersect(building).isEmpty)
    assert((inter ++ except) === rich)
    val uni = Relational.setopUnion(spark, sf).as[Long].collect()
    assert(uni.length === uni.toSet.size)
  }

  test("subquery_above_brand_avg: every row exceeds its brand average") {
    val df = Relational.subqueryAboveBrandAvg(spark, sf)
    assert(df.where($"p_retailprice" <= $"brand_avg").count() === 0)
  }

  test("O(input)-row operators plan with NO global sort (verify-only ordering)") {
    // Window operators legitimately contain partition-local sorts
    // (SortExec global=false, printed "Sort [...], false, 0"); what must
    // not appear is a full range-shuffle sort tacked on for presentation.
    val names = Seq("citation_counts", "join_semi", "join_anti",
      "join_outer_order_counts", "distinct_parts_per_order",
      "window_running_revenue", "window_lag_delta", "scalar_string_funcs",
      "subquery_above_brand_avg", "setop_union", "setop_intersect",
      "setop_except", "events_sessionize")
    for (n <- names) {
      val p = SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString
      val globalSort = p.linesIterator.exists(l =>
        l.contains("Sort [") && l.contains("], true,"))
      assert(!globalSort, s"$n plans a global Sort:\n$p")
    }
  }

  test("q4_late_orders plans a LEFT SEMI join and matches the SQL EXISTS form") {
    val df = graft.operators.Relational.q4LateOrders(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"EXISTS did not decorrelate to a semi join:\n$p")
    Tables.load(spark, sf, "orders").createOrReplaceTempView("orders_v")
    Tables.load(spark, sf, "lineitem").createOrReplaceTempView("lineitem_v")
    val viaSql = spark.sql(
      """SELECT o.o_orderpriority, count(*) AS n_orders
        |FROM orders_v o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem_v l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAYS)
        |GROUP BY o.o_orderpriority""".stripMargin)
      .as[(String, Long)].collect().toMap
    val got = df.as[(String, Long)].collect().toMap
    assert(got === viaSql)
    assert(got.values.sum > 0)
  }

  test("q7: only the two nations appear, both directions, years in the window") {
    val rows = graft.operators.Relational.q7VolumeShipping(spark, sf)
      .as[(String, String, Int, Double)].collect()
    assert(rows.nonEmpty)
    val nations = Set("NATION_3", "NATION_7")
    rows.foreach { case (sn, cn, y, rev) =>
      assert(nations(sn) && nations(cn) && sn != cn, s"bad pair ($sn,$cn)")
      assert(y >= 1996 && y <= 1997, s"year $y outside ship window")
      assert(rev > 0)
    }
    // at most the two directions exist (both at sf0.01+; the sf0.001
    // fixture is small enough that one direction can be empty)
    assert(rows.map(r => (r._1, r._2)).distinct.length <= 2)
  }

  test("q10: ≤20 rows, unique customers, revenue matches a recomputed top-20") {
    val got = graft.operators.Relational.q10ReturnedItems(spark, sf)
      .as[(Long, String, Double, Double, String)].collect()
    assert(got.length === 20)
    assert(got.map(_._1).distinct.length === 20)
    // the revenue column is the exact per-customer aggregate: recompute
    // the top-20 set independently via SQL on temp views
    Tables.load(spark, sf, "orders").createOrReplaceTempView("orders_v")
    Tables.load(spark, sf, "lineitem").createOrReplaceTempView("lineitem_v")
    val expect = spark.sql(
      """SELECT o_custkey,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem_v JOIN orders_v ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_custkey ORDER BY revenue DESC, o_custkey LIMIT 20""".stripMargin)
      .as[(Long, Double)].collect().toMap
    assert(got.map(r => r._1 -> r._3).toMap === expect)
  }

  test("q19: one positive revenue row; the OR block keeps a hash join (no BNLJ)") {
    val df = graft.operators.Relational.q19DiscountedRevenue(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"disjunctive predicate degraded the join:\n$p")
    val rows = df.as[Double].collect()
    assert(rows.length === 1 && rows.head > 0.0)
  }

  test("q22: kept customers are above-average AND lapsed; segments partition them") {
    val got = graft.operators.Relational.q22LostCustomers(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(got.nonEmpty)
    val custs = Tables.load(spark, sf, "customer")
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
      .as[(Long, String, Double)].collect()
    val withOrders = Tables.load(spark, sf, "orders")
      .where($"o_orderdate" >= "2000-01-01")
      .select($"o_custkey").as[Long].collect().toSet
    val pos = custs.filter(_._3 > 0)
    val avg = BigDecimal(pos.map(c => BigDecimal(c._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble).toDouble / pos.length
    val kept = custs.filter(c => c._3 > avg && !withOrders(c._1))
    assert(got.map(_._2).sum === kept.length.toLong)
    val bySeg = kept.groupBy(_._2).map { case (s0, cs) => s0 -> cs.length.toLong }
    assert(got.map(r => r._1 -> r._2).toMap === bySeg)
  }

  test("q14: promo share in [0,100] per month; 100% iff every part is PROMO") {
    val rows = graft.operators.Relational.q14PromoRevenue(spark, sf)
      .as[(java.sql.Timestamp, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, share) =>
      assert(share >= 0.0 && share <= 100.0, s"share $share out of range")
    }
    // the mix is real: the fixture has promo and non-promo parts, so the
    // overall share is strictly interior
    assert(rows.exists(r => r._2 > 0.0 && r._2 < 100.0))
  }

  test("q15: winners carry exactly the max revenue of the quarterly view") {
    import org.apache.spark.sql.functions._
    val got = Relational.q15TopSupplier(spark, sf)
      .select($"s_suppkey", $"total_revenue").as[(Long, Double)].collect()
    assert(got.nonEmpty)
    val view = Tables.load(spark, sf, "lineitem")
      .where($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
      .groupBy($"l_suppkey")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("r"))
      .as[(Long, Double)].collect()
    val best = view.map(_._2).max
    assert(got.forall(_._2 == best))
    assert(got.map(_._1).toSet === view.filter(_._2 == best).map(_._1).toSet)
  }

  test("q12: high+low partition the late lines per returnflag") {
    import org.apache.spark.sql.functions._
    val got = Relational.q12PriorityShipping(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2 + r._3)).toMap
    val late = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"), $"l_orderkey" === $"o_orderkey")
      .where($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .groupBy($"l_returnflag").count()
      .as[(String, Long)].collect().toMap
    assert(got === late)
  }

  test("q2: every winning offer equals the groupwise min over ALL offers for its part") {
    val got = Relational.q2MinCostSupplier(spark, sf)
      .select($"p_partkey", $"offer_price").as[(Long, Double)].collect()
    assert(got.nonEmpty)
    // recompute the per-part min over the unrestricted offers frame
    import org.apache.spark.sql.functions._
    val size15 = Tables.load(spark, sf, "part").where($"p_size" === 15)
      .select($"p_partkey").as[Long].collect().toSet
    val euro = Tables.load(spark, sf, "supplier")
      .join(broadcast(Tables.load(spark, sf, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.load(spark, sf, "region").where($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey").as[Long].collect().toSet
    val mins = Tables.load(spark, sf, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice")
      .as[(Long, Long, Double)].collect()
      .filter(r => size15(r._1) && euro(r._2))
      .groupBy(_._1).map { case (pk, rs) => pk -> rs.map(_._3).min }
    got.foreach { case (pk, price) => assert(price == mins(pk)) }
  }

  test("q21: counted suppliers were the SOLE late supplier on multi-supplier F orders") {
    import org.apache.spark.sql.functions._
    val numwait = Relational.q21WaitingSuppliers(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(numwait.nonEmpty)
    // driver-side recompute at sf0.001 scale
    val lines = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders").where($"o_orderstatus" === "F"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS")).as("late"))
      .as[(Long, Long, Boolean)].collect()
    val byOrder = lines.groupBy(_._1)
    val supplierName = Tables.load(spark, sf, "supplier")
      .select($"s_suppkey", $"s_name").as[(Long, String)].collect().toMap
    val waits = byOrder.values.flatMap { ls =>
      val lateSupps = ls.filter(_._3).map(_._2).distinct
      val allSupps = ls.map(_._2).distinct
      if (lateSupps.length == 1 && allSupps.length > 1) Some(supplierName(lateSupps.head))
      else None
    }.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val expected = waits.toSeq.sortBy { case (n, c) => (-c, n) }.take(100).toMap
    assert(numwait === expected)
  }

  test("q20: qualifying suppliers exceed the 12% single-year concentration cut") {
    import org.apache.spark.sql.functions._
    val got = Relational.q20ExcessSuppliers(spark, sf)
      .select($"s_name").as[String].collect().toSet
    val small = Tables.load(spark, sf, "part")
      .where($"p_name".startsWith("small")).select($"p_partkey").as[Long].collect().toSet
    val perSupp = Tables.load(spark, sf, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_shipdate", $"l_quantity")
      .as[(Long, Long, java.sql.Timestamp, Double)].collect()
      .filter(r => small(r._1))
      .groupBy(_._2).map { case (sk, rs) =>
        val q97 = rs.filter(r => r._3.toString >= "1997-01-01" && r._3.toString < "1998-01-01")
          .map(_._4).sum
        sk -> (BigDecimal(q97).setScale(2, BigDecimal.RoundingMode.HALF_UP) >
          BigDecimal(rs.map(_._4).sum * 0.12).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      }
    val euroName = Tables.load(spark, sf, "supplier")
      .join(broadcast(Tables.load(spark, sf, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.load(spark, sf, "region").where($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name").as[(Long, String)].collect()
    val expected = euroName.filter(s => perSupp.getOrElse(s._1, false)).map(_._2).toSet
    assert(got === expected)
  }

  test("q8/q11/q16/q17: range and containment invariants") {
    import org.apache.spark.sql.functions._
    val shares = Relational.q8MarketShare(spark, sf).as[(Int, Double)].collect()
    assert(shares.nonEmpty)
    shares.foreach { case (_, sh) => assert(sh >= 0.0 && sh <= 1.0) }
    val q11 = Relational.q11ImportantParts(spark, sf).cache()
    val cutoff = q11.agg(min($"stock_value")).first().getDouble(0)
    assert(q11.count() > 0 && cutoff > 0.0)
    val q16 = Relational.q16SupplierPartCounts(spark, sf)
      .as[(String, String, Int, Long)].collect()
    assert(q16.nonEmpty)
    val nSupp = Tables.load(spark, sf, "supplier").count()
    q16.foreach { case (b, _, _, c) =>
      assert(b != "Brand#13"); assert(c >= 1 && c <= nSupp)
    }
    val q17 = Relational.q17SmallQtyRevenue(spark, sf).as[Double].collect()
    assert(q17.length == 1 && q17.head >= 0.0)
  }

  test("orders_cohort_ltv: birth cells anchor retention at 1; cells partition customers and revenue") {
    import org.apache.spark.sql.functions.{col, countDistinct, sum => fsum}
    val got = Relational.ordersCohortLtv(spark, sf)
      .as[(String, Int, Long, Double, Double, Double)].collect()
    // outputs are exact 2-dp decimals published as doubles — recover them
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val byCohort = got.groupBy(_._1)
    byCohort.foreach { case (c, cells) =>
      val sorted = cells.sortBy(_._2)
      assert(sorted.head._2 === 0, s"cohort $c missing its birth month")
      assert(sorted.head._6 === 1.0, s"cohort $c birth retention != 1")
      // the LTV curve: cum_revenue is the running sum of the cells
      var run = BigDecimal(0)
      sorted.foreach { cell =>
        run += d2(cell._4)
        assert(d2(cell._5) === run, s"cohort $c cum_revenue drifts at age ${cell._2}")
        assert(cell._6 > 0 && cell._6 <= 1.0)
      }
    }
    // birth populations partition the customer base; cells partition revenue
    val orders = Tables.load(spark, sf, "orders")
    assert(got.filter(_._2 == 0).map(_._3).sum ===
      orders.agg(countDistinct(col("o_custkey"))).as[Long].head())
    assert(got.map(v => d2(v._4)).sum ===
      orders.agg(fsum(col("o_totalprice").cast("decimal(18,2)")))
        .as[BigDecimal].head())
  }
}
