package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("ann_topk: 10 neighbors per probe, scores descending, self excluded") {
    val got = Similarity.annTopk(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    val byProbe = got.groupBy(_._1)
    assert(byProbe.size === 16)
    byProbe.foreach { case (probe, rows) =>
      assert(rows.length === 10)
      assert(!rows.exists(_._3 === probe), s"probe $probe returned itself")
      val ranked = rows.sortBy(_._2)
      ranked.sliding(2).foreach { case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 === b._4 && a._3 < b._3))
      }
    }
  }

  test("embedding_knn_classify: leave-one-out vote recompute; per-class rollup ties out") {
    val got = Similarity.embeddingKnnClassify(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val vecs = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect().sortBy(_._1)
    def cos6(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val probes = vecs.filter(_._1 % 25 == 0)
    assert(probes.nonEmpty)
    val agg = scala.collection.mutable
      .Map.empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    probes.foreach { case (pid, pe, plabel) =>
      val top = vecs.filter(_._1 != pid)
        .map { case (nid, ne, nl) => (nid, cos6(pe, ne), nl) }
        .sortBy(t => (-t._2, t._1)).take(5)
      val pred = top.groupBy(_._3).view.mapValues(_.length).toSeq
        .map { case (l, v) => s"${9 - v}$l" }.min.drop(1)
      val (n, c) = agg(plabel.toString)
      agg(plabel.toString) =
        (n + 1, c + (if (pred == plabel.toString) 1L else 0L))
    }
    assert(got.keySet === agg.keySet.toSet)
    agg.foreach { case (l, (n, c)) =>
      val (gn, gc, gppm, gacc) = got(l)
      assert(gn === n && gc === c, s"class $l counts")
      assert(gppm === c * 1000000L / n, s"class $l ppm")
      val expAcc = BigDecimal(c.toDouble / n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(gacc - expAcc) < 1e-9, s"class $l acc")
    }
    assert(agg.values.map(_._1).sum === probes.length.toLong)
  }

  test("embedding_jl_project: exact sign-fold recompute, zero exchanges, distances preserved") {
    val got = Similarity.embeddingJlProject(spark, sf)
      .as[(Long, Int, Double)].collect()
    val vecs = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    assert(got.length === vecs.size * 16)
    // exact in-memory recompute: same LCG signs, same ascending-i double
    // fold, same 0.25 scale, same 6-dp grid
    got.foreach { case (id, j, y) =>
      var acc = 0.0
      val x = vecs(id)
      for (i <- 0 until 64) {
        val sign = if ((i * 40503 + j * 7919) % 99991 % 2 == 0) 1.0 else -1.0
        acc += sign * x(i).toDouble
      }
      val exp = BigDecimal(0.25 * acc)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(y - exp) < 1e-9, s"vec $id dim $j: got $y expected $exp")
    }
    // the whole plan is map-side: no exchange anywhere (the property that
    // makes JL the only projection runnable over cold 100-TB data)
    val p = Similarity.embeddingJlProject(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"JL projection shuffled:\n$p")
    // JL contract: squared distances concentrate around their original
    // values (k = 16 → sd of the ratio ≈ √(2/k) ≈ 0.35); assert the
    // MEDIAN ratio over sampled pairs sits well inside [0.5, 1.6] —
    // loose enough to be deterministic-data-safe, tight enough that a
    // broken sign matrix (ratio → 0 or ≫1) fails
    val proj = got.groupBy(_._1).map { case (id, rs) =>
      id -> rs.sortBy(_._2).map(_._3).toArray }
    val ids = vecs.keys.toArray.sorted.take(30)
    val ratios = for {
      a <- ids; b <- ids if a < b
      dx = (0 until 64).map(i => (vecs(a)(i) - vecs(b)(i)).toDouble)
        .map(t => t * t).sum if dx > 1e-9
      dy = (0 until 16).map(i => proj(a)(i) - proj(b)(i))
        .map(t => t * t).sum
    } yield dy / dx
    val med = ratios.sorted.apply(ratios.length / 2)
    assert(med > 0.5 && med < 1.6, s"median distance ratio $med off the JL band")
  }

  test("ann_topk plans the per-probe top-k as WindowGroupLimit (pushed below the shuffle)") {
    val p = Similarity.annTopk(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("ann_ivf: sound (scores are true cosines, subset ranking consistent)") {
    val ivf = Similarity.annIvf(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    // every (probe, vec, cos) the IVF path emits must agree with the exact
    // score the brute-force path computes for the same pair
    val exactAll = Similarity.annTopk(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    ivf.foreach { case (p, _, v, c) =>
      exactAll.get((p, v)).foreach(e => assert(e === c,
        s"IVF score $c != exact $e for ($p,$v)"))
    }
    assert(ivf.groupBy(_._1).size === 16)
  }

  test("ann_ivf: recall@10 vs exact top-k is high while scanning a corpus fraction") {
    val exact = Similarity.annTopk(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).map { case (p, rs) => p -> rs.map(_._3).toSet }
    val ivf = Similarity.annIvf(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).map { case (p, rs) => p -> rs.map(_._3).toSet }
    val recalls = exact.map { case (p, truth) =>
      ivf.getOrElse(p, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF mean recall@10 = $mean%.3f (nprobe=8 of 32 clusters)")
    // trained centroids (3 spherical-k-means rounds) measure ~0.86 here;
    // the floor guards against a regression to untrained-seed quality
    assert(mean >= 0.8, f"recall collapsed: $mean%.3f")
  }

  test("ann_lsh: sound (scores are true cosines), recall above floor, no cartesian") {
    val lsh = Similarity.annLsh(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    val exactRows = Similarity.annTopk(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    // soundness: any (probe, vec) both paths scored must agree exactly
    val exactAll = exactRows.map(r => (r._1, r._3) -> r._4).toMap
    lsh.foreach { case (p, _, v, c) =>
      exactAll.get((p, v)).foreach(e => assert(e === c,
        s"LSH score $c != exact $e for ($p,$v)"))
    }
    assert(lsh.groupBy(_._1).size === 16)
    // recall@10 vs the exact path
    val truth = exactRows.groupBy(_._1).map { case (p, rs) => p -> rs.map(_._3).toSet }
    val got = lsh.groupBy(_._1).map { case (p, rs) => p -> rs.map(_._3).toSet }
    val recalls = truth.map { case (p, t) =>
      got.getOrElse(p, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    info(f"LSH mean recall@10 = $mean%.3f (48 planes, 12 bands x 4 bits)")
    assert(mean >= 0.8, f"recall collapsed: $mean%.3f")
    // candidate generation must be the (band, key) equi-join, never a cartesian
    val p = Similarity.annLsh(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"candidate join is a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"candidate join is a BNLJ:\n$p")
  }

  test("ann_pq: sound (exact re-ranked scores), recall above floor, no cartesian") {
    val exact = Similarity.annTopk(spark, sf)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.annPq(spark, sf)
    val got = pq.select("probe_id", "vec_id", "cos")
      .as[(Long, Long, Double)].collect()
    // soundness: emitted scores are TRUE cosines (the re-rank contract) —
    // every (probe, vec) present in the exact top-k must carry the same score
    val exactScores = Similarity.annTopk(spark, sf)
      .select("probe_id", "vec_id", "cos")
      .as[(Long, Long, Double)].collect()
      .map { case (p, v, c) => (p, v) -> c }.toMap
    got.foreach { case (p, v, c) =>
      exactScores.get((p, v)).foreach(e => assert(c === e, s"score drift ($p,$v)"))
    }
    val recall = got.map(r => (r._1, r._2)).toSet.intersect(exact).size.toDouble / exact.size
    info(f"PQ recall@10 vs exact: $recall%.3f")
    assert(recall >= 0.70, f"PQ recall $recall%.3f below floor")
    val plan = pq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("ann_ivf_pq: sound (exact re-ranked scores), composed recall above floor") {
    val exactRows = Similarity.annTopk(spark, sf)
      .select("probe_id", "vec_id", "cos")
      .as[(Long, Long, Double)].collect()
    val exact = exactRows.map(r => (r._1, r._2)).toSet
    val exactScores = exactRows.map { case (p, v, c) => (p, v) -> c }.toMap
    val got = Similarity.annIvfPq(spark, sf)
      .select("probe_id", "vec_id", "cos")
      .as[(Long, Long, Double)].collect()
    // soundness: emitted scores are TRUE cosines (the re-rank contract)
    got.foreach { case (p, v, c) =>
      exactScores.get((p, v)).foreach(e => assert(c === e, s"score drift ($p,$v)"))
    }
    // the composed index misses when EITHER stage misses, so its recall
    // sits at or below min(ivf, pq) — floor accordingly
    val recall = got.map(r => (r._1, r._2)).toSet.intersect(exact).size.toDouble / exact.size
    info(f"IVF-PQ composed recall@10 vs exact: $recall%.3f")
    assert(recall >= 0.60, f"IVF-PQ recall $recall%.3f below floor")
    val plan = Similarity.annIvfPq(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("dedup_embedding: every emitted pair verified >= 0.45; no cartesian in plan") {
    val pairs = Similarity.dedupEmbedding(spark, sf)
      .as[(Long, Long, Double)].collect()
    pairs.foreach { case (a, b, c) =>
      assert(a < b)
      assert(c >= 0.45)
    }
    val p = Similarity.dedupEmbedding(spark, sf).queryExecution.executedPlan.toString
    // the PAIR join must be an equi-join on cluster id; the only
    // broadcast-nested-loop allowed is the tiny centroid assignment
    val pairJoinCartesian = p.contains("CartesianProduct")
    assert(!pairJoinCartesian, s"pair join is a cartesian:\n$p")
  }

  test("embedding_kmeans: assignment is the rounded-grid argmin, Lloyd improves on the seeds") {
    val model = Similarity.kmeansFit(spark, sf)
    assert(model.length === 8)
    model.foreach(c => assert(c.length === 64))
    val got = Similarity.embeddingKmeans(spark, sf)
      .as[(Long, Int, Double)].collect()
    assert(got.length === 500)
    assert(got.forall(r => r._2 >= 0 && r._2 < 8))
    // recompute every row's argmin from the collected model with the
    // operator's exact arithmetic (index-order fold, 6-dp HALF_UP round):
    // the literal-fold assignment must agree EXACTLY, ties to lowest cid
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def dists(v: Array[Float], cs: Array[Array[Float]]): Array[Double] =
      cs.map { c =>
        var acc = 0.0; var i = 0
        while (i < 64) { val d = c(i).toDouble - v(i).toDouble; acc += d * d; i += 1 }
        r6(acc)
      }
    got.foreach { case (id, cl, dist) =>
      val ds = dists(vecs(id), model)
      val best = ds.zipWithIndex.minBy { case (dd, j) => (dd, j) }
      assert(cl === best._2 && dist === best._1, s"vec $id")
    }
    // Lloyd guarantee: total within-cluster SSE under the trained model
    // is no worse than under the raw seed centroids
    val seeds = (0L until 8L).map(vecs).toArray
    val seedInertia = vecs.values.map(v => dists(v, seeds).min).sum
    val fitInertia = got.map(_._3).sum
    assert(fitInertia <= seedInertia + 1e-6,
      s"fit inertia $fitInertia vs seed inertia $seedInertia")
    info(f"inertia: seeds $seedInertia%.2f -> fit $fitInertia%.2f over 3 rounds")
    // the output query folds the model as literals: Scan -> Project,
    // ZERO exchanges (the model collect happens during FIT, not here)
    val plan = Similarity.embeddingKmeans(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffles:\n$plan")
  }

  test("embedding_cluster_profile: sizes sum to n, purity realized from the assignment") {
    val prof = Similarity.embeddingClusterProfile(spark, sf)
      .as[(Int, Long, Int, Double, Double)].collect()
    assert(prof.map(_._2).sum === 500L)
    assert(prof.forall(p => p._4 > 0.0 && p._4 <= 1.0))
    assert(prof.forall(p => p._5 >= 0.0))
    // cross-check against the assignment query joined with labels: the
    // profile must be exactly the (cluster, label) histogram's reduction
    val assigned = Similarity.embeddingKmeans(spark, sf)
      .join(Tables.load(spark, sf, "embeddings").select("vec_id", "label"), "vec_id")
      .as[(Long, Int, Double, Int)].collect()
    val byCluster = assigned.groupBy(_._2)
    assert(prof.map(_._1).sorted.toSeq === byCluster.keys.toSeq.sorted)
    prof.foreach { case (cl, nVecs, topLabel, purity, _) =>
      val rows = byCluster(cl)
      assert(nVecs === rows.length.toLong)
      val hist = rows.groupBy(_._4).view.mapValues(_.length)
      val (lbl, n) = hist.toSeq.maxBy { case (l, c) => (c, -l) }
      assert(topLabel === lbl, s"cluster $cl majority label")
      val expected = BigDecimal(n.toDouble / rows.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(purity === expected, s"cluster $cl purity")
    }
    info(prof.sortBy(_._1).map(p =>
      f"c${p._1}: n=${p._2} top=${p._3} purity=${p._4}%.3f").mkString("  "))
  }

  test("embedding_silhouette: sizes sum to n, s in [0,1], realized from the assignment") {
    val sil = Similarity.embeddingSilhouette(spark, sf)
      .as[(Int, Long, Double)].collect()
    assert(sil.map(_._2).sum === 500L)
    // under argmin assignment, a <= b by construction, so simplified
    // silhouette is non-negative; 1 would mean a degenerate a = 0
    assert(sil.forall(s => s._3 >= 0.0 && s._3 < 1.0))
    // per-cluster sizes must equal the assignment's
    val assigned = Similarity.embeddingKmeans(spark, sf)
      .as[(Long, Int, Double)].collect().groupBy(_._2).view.mapValues(_.length)
    sil.foreach { case (cl, n, _) => assert(n === assigned(cl).toLong) }
    info(sil.sortBy(_._1).map(s => f"c${s._1}: n=${s._2} sil=${s._3}%.4f")
      .mkString("  "))
  }

  test("embedding_triplet_mine: hardest pos/neg match a brute-force recompute") {
    val got = Similarity.embeddingTripletMine(spark, sf)
      .as[(Long, Int, Long, Double, Long, Double, Double, Int)].collect()
    assert(got.length === 20) // every stride anchor has a pos and a neg
    val vecs = Tables.load(spark, sf, "embeddings")
      .as[(Long, Array[Float], Int)].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    got.foreach { case (aid, lbl, posId, posCos, negId, negCos, margin, viol) =>
      val (_, ae, al) = byId(aid)
      assert(lbl === al)
      val others = vecs.filter(_._1 != aid)
      val (expPos, expPosCos) = others.filter(_._3 == al)
        .map(v => (v._1, cos(ae, v._2))).minBy { case (id, c) => (c, id) }
      val (expNeg, expNegCos) = others.filter(_._3 != al)
        .map(v => (v._1, cos(ae, v._2))).minBy { case (id, c) => (-c, id) }
      assert((posId, posCos) === ((expPos, expPosCos)), s"anchor $aid pos")
      assert((negId, negCos) === ((expNeg, expNegCos)), s"anchor $aid neg")
      assert(margin === BigDecimal(posCos - negCos)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(viol === (if (margin < 0.05) 1 else 0))
    }
    val rate = got.count(_._8 == 1).toDouble / got.length
    info(f"triplet violation rate at sf0.001: $rate%.2f")
  }

  test("ann_knn_graph: 5 ranked neighbors per stride probe, no self, mutual flag symmetric") {
    val got = Similarity.annKnnGraph(spark, sf)
      .as[(Long, Int, Long, Double, Int)].collect()
    val probes = got.map(_._1).distinct
    assert(probes.length === 20) // 500 vectors / stride 25
    probes.foreach(p => assert(p % 25 === 0))
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to 5))
      assert(!rows.exists(_._3 === src), s"probe $src returned itself")
      rows.foreach(r => assert(r._4 >= -1.0 - 1e-9 && r._4 <= 1.0 + 1e-9))
    }
    // mutual flag = the reverse edge exists in the SAME ranked graph
    val edges = got.map(r => (r._1, r._3)).toSet
    got.foreach { case (s0, _, n0, _, m) =>
      val expected = if (edges.contains((n0, s0))) 1 else 0
      assert(m === expected, s"mutual flag on ($s0, $n0)")
    }
    // and mutuality is symmetric where both directions are present
    val mutualPairs = got.filter(_._5 == 1).map(r => (r._1, r._3))
    mutualPairs.foreach { case (a, b) =>
      assert(got.exists(r => r._1 == b && r._3 == a && r._5 == 1))
    }
    // the lineage cut hides the ranked subplan from the output frame, so
    // assert the top-k shape on the PRE-cut frame (IterativePlanSpec
    // convention): per-probe top-5 as WindowGroupLimit, no cartesian
    val p = Similarity.knnRanked(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("embedding_outliers: flags realize the mu+2sigma contract, bounded fraction") {
    val got = Similarity.embeddingOutliers(spark, sf)
      .as[(Long, Int, Double, Int)].collect()
    assert(got.length === 500)
    got.foreach(r => assert(r._3 >= 0.0))
    // recompute the threshold from the emitted distances: flags must
    // realize dist > round(mu + 2*sigma, 6) exactly
    val dists = got.map(_._3)
    val mu = dists.sum / dists.length
    val sd = math.sqrt(dists.map(x => (x - mu) * (x - mu)).sum / (dists.length - 1))
    val thr = BigDecimal(mu + 2 * sd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (id, _, d0, f) =>
      assert(f === (if (d0 > thr) 1 else 0), s"vec $id: dist $d0 thr $thr")
    }
    // mu+2sigma flags a small tail (Chebyshev bounds it at 25%;
    // empirically a few percent on this corpus)
    val frac = got.count(_._4 == 1).toDouble / got.length
    assert(frac < 0.10, s"outlier fraction $frac")
    info(f"outliers: ${got.count(_._4 == 1)} of ${got.length} ($frac%.3f)")
    // the flagging pass is Scan -> Project: zero exchanges (mean and
    // threshold are driver-bounded literals by construction)
    val plan = Similarity.embeddingOutliers(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"flagging pass shuffles:\n$plan")
  }

  test("embedding_whiten: unit variance per direction, zero cross-covariance, zero mean") {
    val w = Similarity.embeddingWhiten(spark, sf)
      .as[(Long, Int, Double, Double, Double, Double)].collect()
    assert(w.length === 500)
    val cols = Array(w.map(_._3), w.map(_._4), w.map(_._5), w.map(_._6))
    // the whitening contract: each direction has sample mean ~0 and
    // sample variance ~1 (the eigenvalue is divided out), and directions
    // are decorrelated — all at the 6-dp projection grid's tolerance
    cols.zipWithIndex.foreach { case (xs, c) =>
      val m = xs.sum / xs.length
      assert(math.abs(m) < 1e-3, s"w${c + 1} mean $m")
      val v = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      assert(math.abs(v - 1.0) < 1e-3, s"w${c + 1} variance $v != 1")
    }
    for (a <- 0 until 4; b <- a + 1 until 4) {
      val ma = cols(a).sum / cols(a).length
      val mb = cols(b).sum / cols(b).length
      val cov = cols(a).zip(cols(b))
        .map { case (x, y) => (x - ma) * (y - mb) }.sum / (cols(a).length - 1)
      assert(math.abs(cov) < 1e-3, s"cov(w${a + 1}, w${b + 1}) = $cov")
    }
  }

  test("pca: orthonormal components, descending eigenvalues, variance = eigenvalue") {
    val k = 4
    val (n, mean, eigvals, comps) = Similarity.pcaFit(spark, sf, k)
    assert(n === 500)
    assert(mean.length === 64 && comps.length === k)
    // eigenvalues descending and non-negative (covariance is PSD)
    eigvals.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    assert(eigvals.last >= -1e-9)
    // components orthonormal within LAPACK tolerance
    for (a <- 0 until k; b <- a until k) {
      val dot = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      val expected = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expected) < 1e-9, s"<c$a,c$b> = $dot")
    }
    // sign canon: the largest-|component| entry is positive
    comps.foreach { w => assert(w.maxBy(math.abs) > 0) }
    // the projection realizes the model: per-component sample mean ~ 0 and
    // sample variance ~ eigenvalue (projection rounds to 6dp, so compare
    // at 1e-4 — rounding noise is 1e-6-scale, eigenvalues are O(1e-2))
    val proj = Similarity.embeddingPcaProject(spark, sf)
      .as[(Long, Int, Double, Double, Double, Double)].collect()
    assert(proj.length === n)
    val cols = Array(proj.map(_._3), proj.map(_._4), proj.map(_._5), proj.map(_._6))
    cols.zipWithIndex.foreach { case (xs, c) =>
      val m = xs.sum / xs.length
      assert(math.abs(m) < 1e-4, s"pc${c + 1} mean $m")
      val v = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      assert(math.abs(v - eigvals(c)) < 1e-4 * math.max(1.0, eigvals(c)),
        s"pc${c + 1} variance $v vs eigenvalue ${eigvals(c)}")
    }
    // explained-variance ratio of the top-4 against the total (trace of
    // the covariance): a meaningful share, and never above 1
    val fullEig = Similarity.pcaFit(spark, sf, 64)._3
    val evr = eigvals.sum / fullEig.sum
    info(f"top-$k EVR = $evr%.4f over ${fullEig.length} dims")
    assert(evr > 0.0 && evr <= 1.0 + 1e-12)
    // the projection plan is a pure per-row map: ZERO exchanges
    val plan = Similarity.embeddingPcaProject(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection shuffles:\n$plan")
  }

  test("sample_kcenter: equals the greedy local twin; coverage radius never increases") {
    val got = Similarity.sampleKcenter(spark, sf)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    // local greedy twin on the SAME 6-dp grid: seed = min vec_id, then
    // farthest-point with (dmin desc, vec_id asc) selection each round
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val t = a(i).toDouble - b(i).toDouble; acc += t * t; i += 1
      }
      r6(acc)
    }
    var centers = Vector(vecs.head)
    var expect = Vector((1, vecs.head._1, 0.0))
    for (r <- 2 to got.length) {
      val (id, v, dm) = vecs.map { case (id, v) =>
        (id, v, centers.map(c => l2(c._2, v)).min)
      }.maxBy { case (id, _, dm) => (dm, -id) }
      centers = centers :+ ((id, v))
      expect = expect :+ ((r, id, dm))
    }
    assert(got.toSeq === expect)
    assert(got.length === 8 && got.map(_._2).distinct.length === 8)
    // the selection distances are the classic non-increasing radius run
    got.drop(1).sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3, s"radius grew: $a -> $b")
    }
  }

  test("sample_kcenter_assign: populations partition the corpus; radius bounds the next pick") {
    val assign = Similarity.sampleKcenterAssign(spark, sf)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    val n = graft.Tables.load(spark, sf, "embeddings").count()
    assert(assign.map(_._2).sum === n) // every vector lands in exactly one cell
    assert(assign.map(_._1).toSeq === (1 to 8))
    assign.foreach { case (r, cnt, radius, avg) =>
      assert(cnt > 0 && avg >= 0 && radius >= avg,
        s"cell $r: avg $avg exceeds radius $radius")
    }
    // k-center guarantee: after k picks, NO point is farther from its
    // center than the last selection distance (the greedy invariant)
    val lastPick = Similarity.sampleKcenter(spark, sf)
      .as[(Int, Long, Double)].collect().maxBy(_._1)._3
    assert(assign.map(_._3).max <= lastPick + 1e-9,
      s"coverage radius ${assign.map(_._3).max} exceeds final pick $lastPick")
  }

  test("corpus_bitext_mine: ratio margin demotes the hub raw cosine mines") {
    // Hub fixture: en doc 10 ("hub") is moderately close to BOTH de
    // probes; en docs 11/12 are each very aligned with exactly one
    // probe's true translation direction but slightly FURTHER by raw
    // cosine than the hub. Raw cosine therefore mines (1→10) and
    // (2→10); the ratio margin divides by the hub's high backward
    // neighborhood mean and recovers the true pairing (1→11, 2→12) —
    // the Artetxe & Schwenk hubness correction doing its one job.
    val docs = Seq(
      (1L, "de"), (2L, "de"), (10L, "en"), (11L, "en"), (12L, "en")
    ).toDF("doc_id", "lang")
    val embs = Seq(
      (1L, Seq(1.0f, 0.15f, 0.05f)),
      (2L, Seq(0.15f, 1.0f, 0.05f)),
      (10L, Seq(0.75f, 0.75f, 0.1f)),  // hub: cos ~0.804 to both probes
      (11L, Seq(0.85f, 0.0f, 0.7f)),   // true match for 1, cos ~0.794
      (12L, Seq(0.0f, 0.85f, 0.7f))    // true match for 2, cos ~0.794
    ).toDF("vec_id", "embedding")
    val scored = Similarity.bitextMineFrom(docs, embs)
      .as[(Long, String, Long, Double, Double, Int)].collect()
      .sortBy(_._1)
    assert(scored.map(r => (r._1, r._3)).toSeq === Seq((1L, 11L), (2L, 12L)))
    // and raw cosine really does prefer the hub (the fixture is honest)
    val rawBest = Seq((1L, Seq(1.0, 0.15, 0.05)), (2L, Seq(0.15, 1.0, 0.05)))
      .map { case (id, x) =>
        val ys = Seq((10L, Seq(0.75, 0.75, 0.1)), (11L, Seq(0.85, 0.0, 0.7)),
          (12L, Seq(0.0, 0.85, 0.7)))
        def c(a: Seq[Double], b: Seq[Double]) = {
          val dot = a.zip(b).map(p => p._1 * p._2).sum
          dot / (math.sqrt(a.map(v => v * v).sum) * math.sqrt(b.map(v => v * v).sum))
        }
        id -> ys.maxBy(y => c(x, y._2))._1
      }
    assert(rawBest === Seq(1L -> 10L, 2L -> 10L),
      "fixture no longer exercises hubness — raw cosine should pick the hub")
    // margins sit on the 6-dp grid and the accept flag matches the margin
    scored.foreach { r =>
      assert((r._5 * 1e6).round / 1e6 === r._5)
      assert(r._6 === (if (r._5 > 1.05) 1 else 0))
    }
  }

  test("corpus_bitext_mine: corpus shape — one best target per non-en doc, margin consistent") {
    val rows = Similarity.bitextMine(spark, sf)
      .as[(Long, String, Long, Double, Double, Int)].collect()
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "lang").as[(Long, String)].collect()
    val nonEn = docs.filter(d => d._2 != null && d._2 != "en")
    assert(rows.length === nonEn.length, "one row per non-pivot doc")
    assert(rows.map(_._1).toSet === nonEn.map(_._1).toSet)
    val enIds = docs.filter(_._2 == "en").map(_._1).toSet
    rows.foreach { r =>
      assert(enIds(r._3), s"target ${r._3} is not an en doc")
      assert(r._5 >= 0.0)
    }
    // margin re-ranks at least once somewhere in the corpus, or the
    // operator degenerates to cosine top-1 (compute raw argmax per probe)
    val embs = graft.Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .toMap
    def c(a: Seq[Float], b: Seq[Float]) = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map(p => p._1 * p._2).sum
      dot / (math.sqrt(ad.map(v => v * v).sum) * math.sqrt(bd.map(v => v * v).sum))
    }
    val rawArgmax = nonEn.map { case (id, _) =>
      id -> enIds.toSeq.sortBy(y => (-c(embs(id), embs(y)), y)).head
    }.toMap
    val reRanked = rows.count(r => rawArgmax(r._1) != r._3)
    assert(reRanked > 0, "margin never re-ranked — hubness correction inert")
  }

  test("corpus_bitext_mine_ann: IVF-blocked miner holds a recall floor vs the exact miner") {
    // the ann_topk -> ann_ivf convention applied to bitext: the blocked
    // path must find (nearly) every probe and agree with the exact
    // cross-product miner's chosen translation for most of them
    val exact = Similarity.bitextMine(spark, sf)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toMap
    val ann = Similarity.bitextMineAnn(spark, sf)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toMap
    assert(ann.keySet.subsetOf(exact.keySet),
      "ANN path invented a probe the exact miner does not have")
    val coverage = ann.size.toDouble / exact.size
    val recall = ann.count { case (s, t) => exact.get(s).contains(t) }
      .toDouble / exact.size
    info(f"bitext ANN coverage=$coverage%.3f top1-agreement=$recall%.3f " +
      f"(nprobe=8, C=sqrt-n cells)")
    // a probe legitimately drops only when its probed cells hold no pivot
    // doc — near-total coverage at this corpus shape
    assert(coverage >= 0.95, f"coverage collapsed: $coverage%.3f")
    assert(recall >= 0.60, f"recall collapsed: $recall%.3f")
  }
}
