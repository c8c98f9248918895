package graft

import org.apache.spark.sql.functions._

import graft.operators.{Citations, Dedup, EventAnalytics, Multimodal, Pipeline, Profiling, Relational, Similarity, TextAnalysis}

/** 10× scale soak for the SCALE-ADAPTIVE knobs — the regime the sf0.01 /
  * sf0.1 oracle gates never reach (round-7 verdict: "the knobs have never
  * been exercised on a corpus where the quadratic dedup twins are
  * infeasible — precisely the regime the design targets").
  *
  * Generates a deterministic 10× fixture FROM the sf0.1 tables (~50k
  * documents, ~20k embedding vectors — scripted into the JVM temp area,
  * never committed), runs the dedup/ANN/bloom family against it, and
  * asserts the knob engagements:
  *
  *  - IVF: C = ⌈√n⌉ actually grows (142 trained centroids at 20k vectors
  *    vs 45 at 2k) and recall@10 vs the exact brute-force baseline holds
  *    above the pinned floors at the fixed nprobe budget;
  *  - LSH / PQ / IVF-PQ: recall recorded at the static knob settings —
  *    the knob table below documents what to raise when they sag;
  *  - Bloom: at the DEFAULT m = 2^20 the 10× train split's fill fraction
  *    blows past any usable false-positive regime (the cliff the soak
  *    exists to catch) — and the documented knob m ≈ 10·k·n, here the
  *    next power of two 2^27, brings fill back under 0.1;
  *  - dedup_near / dedup_exact: the variant construction preserves
  *    within-variant Jaccard EXACTLY (words map bijectively per variant,
  *    so shingle sets map bijectively) and makes cross-variant overlap
  *    zero — so the planted pair structure scales by exactly 10 and the
  *    operators must find exactly 10× the sf0.1 groups/pairs. The
  *    QUADRATIC spec twins (brute-force all-pairs Jaccard) are
  *    deliberately NOT run here — 50k docs is 1.25e9 pairs; linear
  *    invariants replace them at this scale.
  *
  * Fixture construction (all deterministic, no RNG state): variant v ∈
  * [0, 10) of doc d is doc_id 10d+v; v = 0 keeps the original text,
  * v > 0 suffixes every word with "~v". Vector variant v of vec_id i is
  * 10i+v; v > 0 adds per-dimension noise in [-0.05, 0.05) derived from
  * xxhash64(vec_id, v, dim) — ~0.975 cosine to its original, so the
  * neighborhood structure is preserved but every vector is distinct.
  *
  * Usage: sbt "runMain graft.Soak" — writes SOAK_r{N}.json (round from
  * SPARK_GRAFT_ROUND, default 08) to the repo root and exits non-zero on
  * any violated floor.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SOAK_DIR",
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft_soak10x").getAbsolutePath)
    val spark = BenchKit.session()
    import spark.implicits._

    // ---- fixture ---------------------------------------------------------
    // Fixture files are REPARTITIONED to one per core before writing:
    // a single ~20 MB parquet file is one row group = ONE scan task, so
    // every CPU-bound scoring pass would serialize onto one core and the
    // soak would measure the layout, not the operator (first observed on
    // ann_knn_graph: 44 s single-task vs ~3 s parallel for 16M cosines).
    // At 100 TB the scan has thousands of row groups and this is free —
    // locally it is exactly the file-sizing discipline sources/Compactor
    // exists to enforce. (_OK2: layout-versioned marker — a pre-existing
    // single-file fixture from an older soak must be rebuilt.)
    if (!new java.io.File(s"$out/_OK2").exists()) {
      Tables.load(spark, base, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          explode(expr("sequence(0, 9)")).as("v"))
        .select((col("doc_id") * 10 + col("v")).as("doc_id"),
          when(col("v") === 0, col("text")).otherwise(expr(
            "array_join(transform(split(text, ' '), w -> concat(w, '~', v)), ' ')"))
            .as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      Tables.load(spark, base, "embeddings")
        .select(col("vec_id"), col("embedding"), col("label"),
          explode(expr("sequence(0, 9)")).as("v"))
        .select((col("vec_id") * 10 + col("v")).as("nid"), col("v"),
          col("vec_id"), col("embedding"), col("label"))
        .select(col("nid").as("vec_id_new"), col("label"), expr(
          """transform(embedding, (x, j) -> CAST(x + CASE WHEN v = 0 THEN CAST(0.0 AS DOUBLE)
            |  ELSE (CAST(pmod(xxhash64(vec_id, v, j), 10000L) AS DOUBLE) / 100000.0 - 0.05)
            |  END AS FLOAT))""".stripMargin).as("embedding"))
        .select(col("vec_id_new").as("vec_id"), col("embedding"), col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      new java.io.File(s"$out/_OK2").createNewFile()
    }
    // ---- r11 fixture additions: event/relational tables at 10× ----------
    // events: every event ×10 with distinct event_ids and the SAME ts
    // (daily counts scale exactly ×10); lineitem: rows duplicated ×10
    // (per-key counts ×10, key sets unchanged); dimension tables copied
    // — so the (spark, dir) operators (trend, integrity, herdan over the
    // doc fixture) run against the soak dir unmodified.
    if (!new java.io.File(s"$out/_OK3").exists()) {
      Tables.load(spark, base, "events")
        .select(col("*"), explode(expr("sequence(0, 9)")).as("v"))
        .select((col("event_id") * 10 + col("v")).as("event_id"), col("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      Tables.load(spark, base, "lineitem")
        .select(col("*"), explode(expr("sequence(0, 9)")).as("v")).drop("v")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      Seq("orders", "customer", "supplier", "part", "nation", "region")
        .foreach(t => Tables.load(spark, base, t)
          .write.mode("overwrite").parquet(s"$out/$t.parquet"))
      new java.io.File(s"$out/_OK3").createNewFile()
    }
    val nDocs = Tables.load(spark, out, "documents").count()
    val nVecs = Tables.load(spark, out, "embeddings").count()

    val results = scala.collection.mutable.LinkedHashMap[String, String]()
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    def check(name: String, ok: Boolean, detail: String): Unit = {
      results(name) = (if (ok) "pass — " else "FAIL — ") + detail
      if (!ok) failures += s"$name: $detail"
      println(s"[soak] ${results(name)}  ($name)")
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    check("fixture", nDocs == 50000 && nVecs == 20000,
      s"docs=$nDocs vecs=$nVecs")

    // ---- dedup family: linear invariants replace the quadratic twins -----
    val baseExact = Dedup.dedupExact(spark, base).count()
    val (soakExact, tExact) = timed(Dedup.dedupExact(spark, out).count())
    check("dedup_exact_10x", soakExact == 10 * baseExact,
      f"groups $soakExact (base $baseExact, ${tExact}%.1f s)")

    // exact-equality scope: sf0.1's planted near-dup pairs sit at J >= 0.83
    // (per-variant band-miss probability ~1e-9, so 10x-exact is the
    // expectation there); a corpus with background pairs hovering AT the
    // 0.6 threshold would make each re-hashed variant an independent
    // ~1e-3 trial and exact equality too strict — this check is about the
    // DRIVER FIXTURE, not arbitrary corpora.
    val (nearPairs, tNear) = timed(Dedup.dedupNear(spark, out)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet)
    val basePairs = Dedup.dedupNear(spark, base).count()
    val soakPairs = nearPairs.size.toLong
    check("dedup_near_10x", soakPairs == 10 * basePairs,
      f"pairs $soakPairs (base $basePairs, ${tNear}%.1f s)")

    // cluster labels replicate per variant too: min-reachable doc_id of
    // variant copy v of cluster {a,b,c} is 10*min+v, so the non-singleton
    // member count must scale by exactly 10 as well
    val baseCc = Dedup.dedupClusters(spark, base)
      .where(col("cluster_id") =!= col("doc_id")).count()
    val (soakCc, tCc) = timed(Dedup.dedupClusters(spark, out)
      .where(col("cluster_id") =!= col("doc_id")).count())
    check("dedup_clusters_10x", soakCc == 10 * baseCc,
      f"non-singleton members $soakCc (base $baseCc, ${tCc}%.1f s; " +
        "pointer-doubling converged — non-convergence throws)")

    // the flagship ingest path at 10×: index the ~87.5% corpus split
    // (~43k docs), probe the ~6k-doc batch split. Invariant: the index
    // probe finds EXACTLY the cross-split subset of dedup_near's pairs
    // (same hash construction ⇒ same candidates, exact verification) —
    // computable without any quadratic twin.
    def isCorpusSide(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex.charAt(0) < 'e'
    }
    val expectCross = nearPairs.filter { case (a, b) => isCorpusSide(a) != isCorpusSide(b) }
      .map { case (a, b) => if (isCorpusSide(a)) (a, b) else (b, a) }
    val (gotCross, tInc) = timed(Dedup.dedupIncremental(spark, out)
      .select(col("corpus_id"), col("new_id")).as[(Long, Long)].collect().toSet)
    check("dedup_incremental_10x", gotCross == expectCross,
      f"index probe found ${gotCross.size} cross pairs == dedup_near's " +
        f"cross-split subset (${tInc}%.1f s for index build + probe at 50k docs)")

    // ---- bloom fill: the m knob cliff ------------------------------------
    val train = Tables.load(spark, out, "documents")
      .where(substring(md5(col("doc_id").cast("string")), 1, 1) < "e")
    val nShingles = Dedup.wordShingleRowsFrom(train, 8)
      .select(xxhash64(col("sh")).as("h")).distinct().count()
    val fillDefault = Dedup.contaminationBits(train).count() / Dedup.BloomBits.toDouble
    val bigBits = 1L << 27 // next power of two >= the documented m ~ 10*k*n
    val fillBig = Dedup.contaminationBits(train, bigBits).count() / bigBits.toDouble
    check("bloom_fill_default_cliff", fillDefault > 0.5,
      f"fill $fillDefault%.3f at m=2^20 over $nShingles distinct 8-grams — " +
        "the default m is UNUSABLE at 10x; this cliff is what the soak catches")
    check("bloom_fill_knob", fillBig < 0.1,
      f"fill $fillBig%.4f at m=2^27 (the documented m~10*k*n rule: " +
        f"10*4*$nShingles = ${10L * 4 * nShingles})")

    // ---- ANN: C knob engagement + recall floors --------------------------
    val cExpected = Similarity.numCentroids(nVecs)
    val cTrained = Similarity.trainedCentroids(spark, out).count()
    check("ivf_c_knob", cExpected == 142 && cTrained == cExpected,
      s"C=$cTrained trained at n=$nVecs (vs ${Similarity.numCentroids(2000)} at sf0.1)")

    val (exactRows, tExactAnn) = timed(Similarity.annTopk(spark, out)
      .as[(Long, Int, Long, Double)].collect())
    val exact = exactRows.groupBy(_._1).map { case (p, rs) => p -> rs.map(_._3).toSet }
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("probe_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2).toSet }
      val rs = exact.map { case (p, truth) =>
        got.getOrElse(p, Set.empty).intersect(truth).size.toDouble / truth.size }
      rs.sum / rs.size
    }
    val (rIvf, tIvf) = timed(recallOf(Similarity.annIvf(spark, out)))
    val (rLsh, tLsh) = timed(recallOf(Similarity.annLsh(spark, out)))
    val (rPq, tPq) = timed(recallOf(Similarity.annPq(spark, out)))
    val (rIvfPq, tIvfPq) = timed(recallOf(Similarity.annIvfPq(spark, out)))
    // floors: measured values at 20k vectors, pinned with a small margin
    // (the knob table: IVF sags -> raise nprobe; LSH sags -> more/finer
    // bands; PQ sags -> longer codes or a larger re-rank pool)
    check("ann_ivf_recall_20k", rIvf >= 0.80,
      f"recall@10 $rIvf%.3f at nprobe=8 of C=142 (${tIvf}%.1f s; exact baseline ${tExactAnn}%.1f s)")
    check("ann_lsh_recall_20k", rLsh >= 0.60,
      f"recall@10 $rLsh%.3f at 12 bands x 4 bits (${tLsh}%.1f s)")
    check("ann_pq_recall_20k", rPq >= 0.45,
      f"recall@10 $rPq%.3f at M=8 K=16 (${tPq}%.1f s)")
    check("ann_ivf_pq_recall_20k", rIvfPq >= 0.40,
      f"recall@10 $rIvfPq%.3f composed (${tIvfPq}%.1f s)")

    // ---- round-8 additions at 10× (round-9 soak extension) ---------------
    // PCA: the full 64-eigenvalue spectrum at 20k vectors. The fixture's
    // ±0.05/dim variant noise perturbs the covariance slightly, so the
    // checks are structural (descending, non-negative, EVR in (0,1]) plus
    // a bounded drift of the top eigenvalue against the 2k-vector base.
    val (_, _, evB, _) = Similarity.pcaFit(spark, base, 64)
    val ((_, _, evS, _), tPca) = timed(Similarity.pcaFit(spark, out, 64))
    val descOk = evS.zip(evS.tail).forall { case (a, b) => a >= b - 1e-12 }
    val nonneg = evS.forall(_ >= -1e-9)
    val evr4S = evS.take(4).sum / evS.sum
    val evr4B = evB.take(4).sum / evB.sum
    check("pca_spectrum_10x", descOk && nonneg && evr4S > 0 && evr4S <= 1.0,
      f"64 eigenvalues descending/non-negative at 20k vectors; EVR(top4) " +
        f"$evr4S%.4f (base $evr4B%.4f; fit ${tPca}%.1f s — driver state O(d²))")
    val topRatio = evS(0) / evB(0)
    check("pca_top1_stability_10x", topRatio > 0.5 && topRatio < 2.0,
      f"top eigenvalue ratio 10x/base $topRatio%.3f under the fixture's " +
        "±0.05/dim noise (an unstable eigensolve would swing orders)")

    // Token-budget sampling at 50k docs: the per-lang floor contract —
    // every language either kept ALL its docs (ran out under budget) or
    // its kept set reaches the budget floor AND is minimal (dropping the
    // last doc goes under). The offsets table is ≤ langs×256 rows BY
    // CONSTRUCTION (bucket = one md5 byte); what 10× exercises is the
    // within-bucket window staying on the high-cardinality key.
    val budget = 2000L
    val (tbRows, tTb) = timed(Pipeline.sampleTokenBudget(spark, out)
      .select(col("lang"), col("n_tokens"), col("cum"))
      .as[(String, Long, Long)].collect())
    val langDocs = Tables.load(spark, out, "documents")
      .groupBy(col("lang")).agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val floorOk = tbRows.groupBy(_._1).forall { case (lang, rows) =>
      val kept = rows.length.toLong
      val maxCum = rows.map(_._3).max
      kept == langDocs(lang) || (maxCum >= budget &&
        rows.forall(r => r._3 - r._2 < budget))
    }
    check("token_budget_floor_10x", floorOk && tbRows.nonEmpty,
      f"${tbRows.length} docs kept across ${tbRows.map(_._1).distinct.length} " +
        f"langs at 50k docs; every language at its floor or exhausted (${tTb}%.1f s)")

    // Graph fixpoints at 10× edges (~6M): ten disjoint suffix-tagged
    // copies of the sf0.1 citation graph — each copy peels/converges
    // identically, so row counts must scale by exactly 10; wall time is
    // the soak's scaling record for the per-round join+aggregate shapes.
    val edges10 = Citations.edges(spark, base)
      .select(explode(expr("sequence(0, 9)")).as("v"), col("src"), col("dst"))
      .select(concat(col("src"), lit("~"), col("v")).as("src"),
        concat(col("dst"), lit("~"), col("v")).as("dst"))
    val kcBase = Citations.kCore(Citations.edges(spark, base)).count()
    val (kc10, tKc) = timed(Citations.kCore(edges10).count())
    check("kcore_10x", kc10 == 10 * kcBase,
      f"$kc10 core members == 10 × $kcBase (8 peel rounds at ~6M edges, ${tKc}%.1f s)")
    val hitsBase = Citations.hits(Citations.edges(spark, base)).count()
    val (hits10, tHits) = timed(Citations.hits(edges10).count())
    check("hits_10x", hits10 == 10 * hitsBase,
      f"$hits10 scored nodes == 10 × $hitsBase (6 iterations at ~6M edges, ${tHits}%.1f s)")

    // kTruss at 10×: disjoint copies can't create or destroy triangles
    // across copies, so the (support → n_edges) histogram scales by
    // exactly 10 — pinning both the peel fixpoint and the per-edge
    // support counts at ~6M input edges.
    val trussBase = Citations.kTruss(Citations.edges(spark, base))
      .groupBy(col("support")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val (truss10, tTruss) = timed(Citations.kTruss(edges10)
      .groupBy(col("support")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap)
    check("ktruss_10x",
      truss10 == trussBase.map { case (s, n) => s -> n * 10 },
      f"support histogram scales ×10 over ${truss10.values.sum} truss edges " +
        f"(${tTruss}%.1f s)")

    // sccLayers at 10×: ten disjoint copies mean TEN giant SCCs, so the
    // iterated-pivot path runs ten extractions deep — pivotRounds is
    // raised to 12 (the shipped default 2 matches the one-giant-SCC
    // driver corpora; this exercises the convergence contract where the
    // default would rightly throw). Levels are copy-invariant (label
    // strings differ, structure doesn't), so the (level → n_sccs)
    // histogram must scale by exactly 10.
    val layersBase = Citations.sccLayers(Citations.edges(spark, base))
      .groupBy(col("level")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val (layers10, tLy) = timed(
      Citations.sccLayers(edges10, pivotRounds = 12)
        .groupBy(col("level")).agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap)
    val lyOk = layers10 == layersBase.map { case (l, n) => l -> n * 10 }
    check("scc_layers_10x", lyOk,
      f"level histogram scales ×10 over ${layers10.values.sum} SCCs " +
        f"(10 pivot extractions at ~6M edges, ${tLy}%.1f s)")

    // Broadcast/shuffle lifecycle under iteration pressure: 20 back-to-
    // back executions of the two broadcast-heaviest operators (hits: 12
    // one-row norm broadcasts per run; pageRank: 6 dangling-mass ones)
    // with the harness sweep between runs — the round-8 failure signature
    // was run times growing MONOTONICALLY between swept runs because
    // ContextCleaner only reclaims broadcasts/shuffle files after a
    // driver GC that a mostly-idle heap never performed. With the fix
    // (periodicGC 60s + System.gc() in sweepAll) the sequence must be
    // flat: the last-5 median within 1.5× of the first-5 median.
    val sfSmall = base.replace("sf0.1", "sf0.01")
    def flatSeq(runs: Seq[Double]): (Double, Double, Double) = {
      val first = runs.take(5).sorted.apply(2)
      val last = runs.takeRight(5).sorted.apply(2)
      (first, last, last / first)
    }
    val hitsTimes = (1 to 20).map { _ =>
      val (_, t) = timed(Citations.hits(Citations.edges(spark, sfSmall)).count())
      Blocks.sweepAll(spark); t
    }
    val (hF, hL, hRatio) = flatSeq(hitsTimes)
    check("lifecycle_flat_hits_20x", hRatio <= 1.5,
      f"20 swept hits runs flat: first-5 median $hF%.2f s, last-5 $hL%.2f s " +
        f"(ratio $hRatio%.2f; r8 signature was monotonic 19->28->42s growth)")
    val prTimes = (1 to 20).map { _ =>
      val (_, t) = timed(Citations.pageRank(Citations.edges(spark, sfSmall)).count())
      Blocks.sweepAll(spark); t
    }
    val (pF, pL, pRatio) = flatSeq(prTimes)
    check("lifecycle_flat_pagerank_20x", pRatio <= 1.5,
      f"20 swept pageRank runs flat: first-5 median $pF%.2f s, last-5 $pL%.2f s (ratio $pRatio%.2f)")

    // ---- round-10 additions at 10×: clustering & outlier family ----------
    // k-means at 20k vectors: the per-round cost is one scan + a ≤ k×d-row
    // aggregate, so the fit must stay in seconds; the fixture's 10 noisy
    // variants of each base vector land in ONE euclidean neighborhood, so
    // cluster structure (sizes, inertia improvement) must persist at 10×.
    val (km10, tKm) = timed {
      val a = Similarity.embeddingKmeans(spark, out)
        .select(col("cluster"), col("dist")).as[(Int, Double)].collect()
      (a.length, a.map(_._1).distinct.length, a.map(_._2).sum)
    }
    val (n10, k10, inertia10) = km10
    check("kmeans_fit_20k", n10 == nVecs && k10 >= 2 && tKm < 60,
      f"$n10 vectors assigned to $k10 clusters in ${tKm}%.1f s " +
        f"(inertia ${inertia10}%.1f; 3 Lloyd rounds, model k×64 floats)")
    // outliers: the μ+2σ tail stays a TAIL at 20k (Chebyshev caps it at
    // 25%; a blown threshold or degenerate mean would flag half the corpus)
    val (outFrac, tOut) = timed {
      val f = Similarity.embeddingOutliers(spark, out)
        .agg(avg(col("is_outlier").cast("double"))).as[Double].collect()(0)
      f
    }
    check("outliers_tail_20k", outFrac < 0.25 && tOut < 30,
      f"outlier fraction $outFrac%.4f at ${nVecs} vectors (${tOut}%.1f s; " +
        "3 schema-bounded passes)")
    // kNN graph: probes scale with the corpus (stride 25 -> ~800 probes at
    // 20k), 5 edges each; the batched-retrieval pass must stay linear —
    // one corpus scan against a broadcast probe block.
    val (knnRows, tKnn) = timed(Similarity.annKnnGraph(spark, out).count())
    check("knn_graph_20k", knnRows == (nVecs / 25) * 5 && tKnn < 60,
      f"$knnRows edges = ${nVecs / 25} probes × 5 in ${tKnn}%.1f s " +
        "(one scan per probe block)")

    // ---- round-9 closing additions at 10×: graph stats & quantizer -------
    // components: ten disjoint suffix-tagged copies → node rows AND
    // distinct component labels must both scale by exactly 10.
    val ccBaseRows = Citations.components(Citations.edges(spark, base)).count()
    val ccBaseComps = Citations.components(Citations.edges(spark, base))
      .select(col("component")).distinct().count()
    val ((cc10Rows, cc10Comps), tCc10) = timed {
      val c = Citations.components(edges10).localCheckpoint()
      val r = (c.count(), c.select(col("component")).distinct().count())
      Blocks.release(c); r
    }
    check("components_10x", cc10Rows == 10 * ccBaseRows && cc10Comps == 10 * ccBaseComps,
      f"$cc10Rows labeled nodes == 10 × $ccBaseRows, $cc10Comps components " +
        f"== 10 × $ccBaseComps (~6M edges, ${tCc10}%.1f s)")

    // assortativity: copying the graph 10× scales every moment by 10, so
    // the correlation coefficient is INVARIANT (and m scales exactly).
    val (mB, rB) = Citations.citationAssortativity(Citations.edges(spark, base))
      .as[(Long, Double)].collect().head
    val ((m10, r10), tAs) = timed(
      Citations.citationAssortativity(edges10).as[(Long, Double)].collect().head)
    check("assortativity_10x", m10 == 10 * mB && math.abs(r10 - rB) <= 1e-6,
      f"r $r10%.6f == base $rB%.6f under 10× copying; m $m10 == 10 × $mB (${tAs}%.1f s)")

    // jaccard link prediction: per-copy scores are preserved, so the 10×
    // top-30's scores must all exist in the base score set, led by the
    // same maximum.
    val jacBase = Citations.linkPredictJaccard(Citations.edges(spark, base))
      .select(col("jaccard")).as[Double].collect()
    val (jac10, tJac) = timed(Citations.linkPredictJaccard(edges10)
      .select(col("jaccard")).as[Double].collect())
    check("jaccard_10x", jac10.length == 30 && jac10.head == jacBase.head &&
        jac10.forall(jacBase.toSet),
      f"top-30 at ~6M edges led by base max ${jacBase.head}%.6f, every score " +
        f"from the base score set (${tJac}%.1f s)")

    // int8 quantizer at 20k vectors: one summary row per vector, the
    // per-dim corpus max saturating somewhere, and the serve-path model
    // still 64 scales of driver state.
    val (qz, tQz) = timed {
      val rows = Similarity.embeddingQuantize(spark, out)
        .select(col("n_sat")).as[Long].collect()
      (rows.length.toLong, rows.sum)
    }
    check("quantize_20k", qz._1 == nVecs && qz._2 >= 1L &&
        Similarity.quantizeScales(spark, out).length == 64,
      f"${qz._1} vectors quantized, ${qz._2} saturated dims total, " +
        f"64-scale model (${tQz}%.1f s)")

    // ---- round-9 continuation at 10×: winnowing / LPA / BFS / phash / IVM
    // The v=0 fixture docs carry the BASE text verbatim under doc_id×10,
    // and every other variant rewrites all words — so the v0 SLICE of any
    // content-hash operator must equal the base result under the id map,
    // while cross-variant content never collides. Winnowing df counts are
    // per-fingerprint and variants share none, so the df cap filters the
    // v0 slice exactly as it filters the base corpus.
    val winBase = TextAnalysis.docWinnowing(spark, base)
      .as[(Long, Int, String)].collect().toSet
    val ((winV0, winTotal, winDocs), tWin) = timed {
      val w = TextAnalysis.docWinnowing(spark, out).localCheckpoint()
      val v0 = w.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") / 10).cast("long"), col("pos"), col("fp"))
        .as[(Long, Int, String)].collect().toSet
      val r = (v0, w.count(), w.select(col("doc_id")).distinct().count())
      Blocks.release(w); r
    }
    check("winnowing_50k", winV0 == winBase && winDocs == nDocs,
      f"v0 slice == base index (${winBase.size} fps), every one of $winDocs " +
        f"docs fingerprinted, $winTotal total fps (${tWin}%.1f s)")
    val pairsBase = TextAnalysis.docWinnowingPairs(spark, base)
      .as[(Long, Long, Long)].collect().toSet
    val (pairsV0, tPairs) = timed(
      TextAnalysis.docWinnowingPairs(spark, out)
        .where(col("doc_a") % 10 === 0 && col("doc_b") % 10 === 0)
        .select((col("doc_a") / 10).cast("long"),
          (col("doc_b") / 10).cast("long"), col("shared_fps"))
        .as[(Long, Long, Long)].collect().toSet)
    check("winnowing_pairs_50k", pairsV0 == pairsBase,
      f"v0 overlap pairs == base (${pairsBase.size} pairs with shared " +
        f"counts) at $nDocs docs (${tPairs}%.1f s)")

    // TextRank at 10×: the suffix rewrite makes each variant a DISJOINT
    // co-occurrence component inside its lang, so per-lang vocab is
    // exactly ×10 and the per-lang picounit mass invariant (≤10¹², lost
    // only to per-term floors) must survive a 10×-bigger graph. Checked
    // on the FULL rank frame (topK unbounded), not the top-10 slice.
    val vocabBase = TextAnalysis.tokenTextrank(spark, base, topK = Int.MaxValue)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val (trMass, tTrank) = timed(
      TextAnalysis.tokenTextrank(spark, out, topK = Int.MaxValue)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"),
          sum(col("score")).as("mass"))
        .as[(String, Long, Long)].collect())
    val trankOk = trMass.forall { case (l, n, mass) =>
      // .get, not .apply: a lang present at 10x but absent from the base
      // run must FAIL the check, not abort the harness (r12 advice)
      vocabBase.get(l).contains(n / 10) && n % 10 == 0 &&
        mass <= 1000000000000L && mass > 999000000000L
    }
    check("textrank_50k", trankOk,
      trMass.map { case (l, n, m) => f"$l:$n nodes/$m" }.mkString(" ") +
        f" (${tTrank}%.1f s)")

    // LPA on ten disjoint suffix-tagged copies: the tag flips some
    // lexicographic tie-breaks, so per-copy COMMUNITIES may legitimately
    // differ from the base run — the invariants are structural: every
    // node labeled, and no community ever bridges two disjoint copies.
    val lpaBaseRows = Citations.lpa(Citations.edges(spark, base)).count()
    val ((lpaRows, lpaBridges), tLpa) = timed {
      val l = Citations.lpa(edges10).localCheckpoint()
      val r = (l.count(), l.where(
        expr("split(paper_id, '~')[1] <> split(community, '~')[1]")).count())
      Blocks.release(l); r
    }
    check("lpa_10x", lpaRows == 10 * lpaBaseRows && lpaBridges == 0,
      f"$lpaRows labeled nodes == 10 × $lpaBaseRows, 0 cross-copy " +
        f"communities (4 rounds at ~6M edges, ${tLpa}%.1f s)")

    // louvain at ~6M edges: the lpa structural invariants (the tagged
    // labels reorder lexicographic tie-breaks, so per-copy communities
    // may differ from base — see lpa_10x) plus the modularity-score
    // sanity the stats frame makes checkable: Σtot_deg = 2m exactly.
    val louBaseRows = Citations.louvain(Citations.edges(spark, base)).count()
    val ((louRows, louBridges, louTotDeg), tLou) = timed {
      val l = Citations.louvain(edges10).localCheckpoint()
      val st = Citations.louvainStats(edges10)
      val r = (l.count(), l.where(
        expr("split(paper_id, '~')[1] <> split(community, '~')[1]")).count(),
        st.agg(sum("tot_deg")).first().getLong(0))
      Blocks.release(l); r
    }
    val undCount10 = {
      val e = edges10.where(col("src") =!= col("dst"))
      e.select(col("src").as("u"), col("dst").as("v"))
        .union(e.select(col("dst"), col("src"))).distinct().count()
    }
    check("louvain_10x", louRows == 10 * louBaseRows && louBridges == 0 &&
      louTotDeg == undCount10,
      f"$louRows labeled == 10 × $louBaseRows, 0 cross-copy communities, " +
        f"stats degree mass $louTotDeg == 2m (4 rounds at ~6M edges, ${tLou}%.1f s)")

    // MIS at ~6M edges: the LCG priority casts ids to BIGINT, so the
    // 10× graph is ten NUMERIC disjoint copies (id → id·10 + v — the ~
    // tags would null-poison the keys, which mis() now rejects loudly).
    // Per-copy priorities differ from base (the hash reads the id), so
    // the CHECKS are the operator's contract, not ×10 row mirroring:
    // every node decided exactly once, zero adjacent winners
    // (independence), every loser dominated (maximality).
    val edges10n = Citations.edges(spark, base)
      .where(col("src") =!= col("dst"))
      .select(explode(expr("sequence(0, 9)")).as("v"), col("src"), col("dst"))
      .select(expr("CAST(CAST(src AS BIGINT) * 10 + v AS STRING)").as("src"),
        expr("CAST(CAST(dst AS BIGINT) * 10 + v AS STRING)").as("dst"))
    val misBaseNodes = {
      val e = Citations.edges(spark, base).where(col("src") =!= col("dst"))
      e.select(col("src").as("id")).union(e.select(col("dst"))).distinct().count()
    }
    val ((misRows, misDup, misAdj, misUndom), tMis) = timed {
      val m = Citations.mis(edges10n).localCheckpoint()
      val winners = m.where(col("in_mis")).select(col("paper_id"))
      val losers = m.where(!col("in_mis")).select(col("paper_id"))
      val und10 = edges10n
        .select(col("src").as("a"), col("dst").as("b"))
      val adj = und10
        .join(winners.select(col("paper_id").as("a")), Seq("a"), "left_semi")
        .join(winners.select(col("paper_id").as("b")), Seq("b"), "left_semi")
        .count()
      val dominated = und10
        .join(winners.select(col("paper_id").as("a")), Seq("a"), "left_semi")
        .select(col("b").as("paper_id"))
        .union(und10
          .join(winners.select(col("paper_id").as("b")), Seq("b"), "left_semi")
          .select(col("a")))
      val undom = losers.join(dominated, Seq("paper_id"), "left_anti").count()
      val dup = m.groupBy(col("paper_id")).count().where(col("count") > 1).count()
      val r = (m.count(), dup, adj, undom)
      Blocks.release(m); r
    }
    check("mis_10x",
      misRows == 10 * misBaseNodes && misDup == 0 && misAdj == 0 && misUndom == 0,
      f"$misRows decided == 10 × $misBaseNodes, 0 double-decisions, " +
        f"0 adjacent winners, 0 undominated losers (~6M edges, ${tMis}%.1f s)")

    // degree-mixing curves under ten disjoint copies: per-copy degrees
    // equal base degrees, so both histograms scale EXACTLY ×10 per
    // threshold/class — rich_club's E_k and N_k multiply by 10 (φ itself
    // doesn't: its denominator is quadratic in N_k), and knn_degree's
    // ppm anchor is BIT-IDENTICAL (ΣS_v/(k·N_k) is a ratio of two
    // ×10-linear terms)
    val rcB = Citations.richClub(Citations.edges(spark, base))
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val (rc10, tRc) = timed(Citations.richClub(edges10)
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap)
    val rcOk = rc10.keySet == rcB.keySet && rcB.forall { case (k, (e, n)) =>
      rc10(k) == ((10 * e, 10 * n))
    }
    check("rich_club_10x", rcOk && rcB.nonEmpty,
      f"${rc10.size} thresholds: E_k and N_k scale exactly ×10 " +
        f"(~6M edges, ${tRc}%.1f s)")
    val kdB = Citations.knnDegree(Citations.edges(spark, base))
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (kd10, tKd) = timed(Citations.knnDegree(edges10)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap)
    val kdOk = kd10.keySet == kdB.keySet && kdB.forall { case (k, (n, s, ppm)) =>
      kd10(k) == ((10 * n, 10 * s, ppm))
    }
    check("knn_degree_10x", kdOk && kdB.nonEmpty,
      f"${kd10.size} degree classes: counts ×10, knn_ppm bit-identical " +
        f"(${tKd}%.1f s)")

    // BFS path counting at ~6M edges: the tagged graph's seed is one
    // copy's most-cited node, and BFS is confined to that copy — exactly
    // one dist-0 row with σ=1, depth within the cap, every reached node
    // carrying the seed's tag, σ ≥ 1 everywhere.
    val (bfsStats, tBfs) = timed {
      val b = Citations.bfsPaths(edges10).localCheckpoint()
      val seeds = b.where(col("dist") === 0)
        .as[(String, Int, Long)].collect()
      val tag = seeds.head._1.split('~')(1)
      val offCopy = b.where(!col("paper_id").endsWith(s"~$tag")).count()
      val bad = b.where(col("dist") < 0 || col("dist") > 4 ||
        col("sigma") < 1).count()
      val r = (b.count(), seeds.length, seeds.head._3, offCopy, bad)
      Blocks.release(b); r
    }
    check("bfs_paths_6m",
      bfsStats._2 == 1 && bfsStats._3 == 1L && bfsStats._4 == 0 && bfsStats._5 == 0,
      f"${bfsStats._1} reached nodes from one σ=1 seed, 0 off-copy, " +
        f"0 invalid rows (4 hops at ~6M edges, ${tBfs}%.1f s)")

    // perceptual-hash pairs at 50k media rows: exact-dup texts replicate
    // per variant (identical bytes ⇒ identical md5-fallback hash ⇒
    // hamming-0 pair in every copy), so the hamming-0 pair count scales
    // by exactly 10; random band collisions at hamming ≤ 6 are ~2^-40
    // events and contribute nothing.
    val phBase = Multimodal.mediaPhashPairs(spark, base)
      .where(col("hamming") === 0).count()
    val ((ph0, phAll), tPh) = timed {
      val p = Multimodal.mediaPhashPairs(spark, out).localCheckpoint()
      val r = (p.where(col("hamming") === 0).count(), p.count())
      Blocks.release(p); r
    }
    check("phash_pairs_50k", ph0 == 10 * phBase,
      f"$ph0 hamming-0 pairs == 10 × $phBase at $nDocs media rows " +
        f"($phAll band candidates total, ${tPh}%.1f s)")

    // Brandes dependency pass at ~6M edges: the backward recurrence over
    // the forward DAG — structural invariants (the tagged-copy seed
    // flip means values can't map to base): deepest level all-zero,
    // δ ≥ 0 everywhere, exactly one σ=1 seed, copy confinement.
    val (btwStats, tBtw) = timed {
      val b = Citations.betweenness(edges10).localCheckpoint()
      val seeds = b.where(col("dist") === 0)
        .as[(String, Int, Long, Double)].collect()
      val tag = seeds.head._1.split('~')(1)
      val bad = b.where(col("delta") < 0 ||
        (col("dist") === 4 && col("delta") =!= 0) ||
        !col("paper_id").endsWith(s"~$tag")).count()
      val r = (b.count(), seeds.length, seeds.head._3, bad)
      Blocks.release(b); r
    }
    check("betweenness_6m",
      btwStats._2 == 1 && btwStats._3 == 1L && btwStats._4 == 0,
      f"${btwStats._1} scored nodes from one σ=1 seed, 0 invalid " +
        f"(δ<0 / nonzero-leaf / off-copy) rows (4+4 rounds at ~6M edges, ${tBtw}%.1f s)")

    // IVM identity at ~6M edges: merge(agg(base), agg(delta)) must equal
    // the full aggregate EXACTLY — the same gate the oracle runs at
    // sf0.01, re-proven at soak scale where a wrong partial-agg shape
    // would actually diverge.
    val (ivmDiff, tIvm) = timed {
      val full = Citations.counts(edges10)
      val ivm = Citations.countsIvm(edges10)
      ivm.unionByName(full).groupBy(col("paper_id"), col("citations"))
        .count().where(col("count") =!= 2).count()
    }
    check("ivm_identity_6m", ivmDiff == 0,
      f"base⊎delta merge == full recompute on every key (~6M edges, ${tIvm}%.1f s)")

    // Landmark harmonic closeness at ~6M edges: one multi-source wave for
    // 8 seeds. Invariants: ≤8 rows (reach-nothing seeds drop), each row's
    // histogram sums to its n_reached, the published harmonic equals the
    // locally recomputed grid value (the float path stays deterministic
    // at scale), and no wave escapes its disjoint copy (reach < one
    // copy's node count).
    val (clsRows, tCls) = timed(
      Citations.closeness(edges10)
        .as[(String, Long, Long, Long, Long, Long, Double)].collect())
    def r6s(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val clsBad = clsRows.count { r =>
      r._6 != r._2 + r._3 + r._4 + r._5 ||
        r._7 != r6s(r._2.toDouble + r._3.toDouble / 2 + r._4.toDouble / 3 +
          r._5.toDouble / 4) ||
        r._6 >= hitsBase
    }
    check("closeness_6m", clsRows.length <= 8 && clsRows.nonEmpty && clsBad == 0,
      f"${clsRows.length} landmark waves, 0 invalid (histogram/harmonic/" +
        f"off-copy) rows (hop-4 multi-source at ~6M edges, ${tCls}%.1f s)")

    // Greedy k-center at 20k vectors: the trace invariants (distinct
    // picks, non-increasing selection radius) plus the serve path's
    // partition identity and the greedy coverage guarantee.
    val ((kcPicks, kcAssign), tKcen) = timed {
      val p = Similarity.sampleKcenter(spark, out)
        .as[(Int, Long, Double)].collect().sortBy(_._1)
      val a = Similarity.sampleKcenterAssign(spark, out)
        .as[(Int, Long, Double, Double)].collect()
      (p, a)
    }
    val kcMono = kcPicks.drop(1).sliding(2).forall {
      case Array(x, y) => x._3 >= y._3; case _ => true
    }
    check("kcenter_20k",
      kcPicks.length == 8 && kcPicks.map(_._2).distinct.length == 8 &&
        kcMono && kcAssign.map(_._2).sum == nVecs &&
        kcAssign.map(_._3).max <= kcPicks.last._3 + 1e-9,
      f"8 distinct picks, radius non-increasing, ${kcAssign.map(_._2).sum} " +
        f"assigned == $nVecs, coverage ${kcAssign.map(_._3).max}%.4f ≤ " +
        f"final pick ${kcPicks.last._3}%.4f (${tKcen}%.1f s)")

    // Cross-language overlap at 50k docs: the variant suffix maps each
    // lang's trigram set bijectively per copy, so sizes and intersections
    // scale by EXACTLY 10 — and Jaccard is therefore IDENTICAL to base on
    // every pair.
    val loBase = TextAnalysis.corpusLangOverlap(spark, base)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val (lo10, tLo) = timed(
      TextAnalysis.corpusLangOverlap(spark, out)
        .as[(String, String, Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r).toMap)
    val loBad = lo10.count { case (k, r) =>
      !loBase.get(k).exists(b =>
        r._3 == 10 * b._3 && r._4 == 10 * b._4 && r._5 == 10 * b._5 &&
          r._6 == b._6)
    }
    check("lang_overlap_50k",
      lo10.size == loBase.size && loBad == 0,
      f"${lo10.size} pairs == base ${loBase.size}; sizes/intersections " +
        f"scale ×10 exactly and Jaccard is bit-identical per pair (${tLo}%.1f s)")

    // reciprocity at ~6M edges: disjoint copies scale m and reciprocated
    // by exactly 10, so the ratio is INVARIANT (the assortativity rule).
    val rcpBase = Citations.reciprocity(Citations.edges(spark, base))
      .as[(Long, Long, Double)].collect().head
    val (rcp10, tRcp) = timed(Citations.reciprocity(edges10)
      .as[(Long, Long, Double)].collect().head)
    check("reciprocity_6m",
      rcp10._1 == 10 * rcpBase._1 && rcp10._2 == 10 * rcpBase._2 &&
        rcp10._3 == rcpBase._3,
      f"m ${rcp10._1} == 10 × ${rcpBase._1}, reciprocated ${rcp10._2} == " +
        f"10 × ${rcpBase._2}, ratio ${rcp10._3}%.6f invariant (${tRcp}%.1f s)")

    // ---- r11 additions: trend / integrity / herdan / scd2 at 10× ---------
    // events_trend: daily counts ×10 ⇒ slope and intercept scale ×10
    // (the x-moments and n_days are invariant); totals scale exactly
    val trB = EventAnalytics.eventsTrend(spark, base)
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    val (tr10, tTr) = timed(EventAnalytics.eventsTrend(spark, out)
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1))
    val trOk = trB.nonEmpty && trB.length == tr10.length &&
      trB.zip(tr10).forall {
        case ((t, nB, totB, sB, iB), (t10, n10, tot10, s10, i10)) =>
          t == t10 && n10 == nB && tot10 == 10 * totB &&
            sB.zip(s10).forall { case (a, b) => math.abs(b - 10 * a) <= 2e-8 } &&
            sB.isDefined == s10.isDefined &&
            iB.zip(i10).forall { case (a, b) => math.abs(b - 10 * a) <= 2e-5 } &&
            iB.isDefined == i10.isDefined
      }
    check("trend_10x", trOk,
      f"${tr10.length} types: n_days invariant, totals ×10, slope/intercept " +
        f"×10 on their grids (${tTr}%.1f s)")

    // events_pacf: daily counts ×10 ⇒ deviations ×10 ⇒ lag numerators
    // ×100 ⇒ every floored ACF ratio is ⌊100a/100b⌋ = ⌊a/b⌋ — the whole
    // Durbin–Levinson integer sequence is BIT-IDENTICAL to base
    val pacfB = EventAnalytics.eventsPacf(spark, base)
      .as[(String, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val (pacf10, tPacf) = timed(EventAnalytics.eventsPacf(spark, out)
      .as[(String, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq)
    check("pacf_10x", pacfB.nonEmpty && pacf10 == pacfB,
      f"${pacf10.length} (type, lag) rows bit-identical to base under " +
        f"×10 counts (${tPacf}%.1f s)")

    // token_glove_cooc at 50k docs: copy 0 reproduces the base pairs,
    // copies 1-9 carry word-tagged twins with identical counts — rows
    // and the exact integer weight mass both scale by exactly 10
    val glB = TextAnalysis.tokenGloveCooc(spark, base)
      .agg(count(lit(1)), sum(col("x_micro"))).as[(Long, Long)].collect().head
    val (gl10, tGl) = timed(TextAnalysis.tokenGloveCooc(spark, out)
      .agg(count(lit(1)), sum(col("x_micro"))).as[(Long, Long)].collect().head)
    check("glove_cooc_50k", gl10._1 == 10 * glB._1 && gl10._2 == 10 * glB._2,
      f"${gl10._1} pairs == 10 × ${glB._1}, weight mass ${gl10._2} == " +
        f"10 × ${glB._2} (${tGl}%.1f s)")

    // basket_apriori_triples: lineitem rows ×10 but (order, brand)
    // DISTINCT is multiset-insensitive — the mined triples, supports,
    // and order are BIT-IDENTICAL to base
    val apB = Relational.basketAprioriTriples(spark, base)
      .as[(String, String, String, Long, Long)].collect().toSeq
    val (ap10, tAp) = timed(Relational.basketAprioriTriples(spark, out)
      .as[(String, String, String, Long, Long)].collect().toSeq)
    check("apriori_10x", apB.nonEmpty && ap10 == apB,
      f"${ap10.length} triples bit-identical under ×10 duplicated " +
        f"lineitem (${tAp}%.1f s)")

    // profile_integrity: lineitem-child edges scale child/orphan ROWS ×10
    // with orphan KEY sets unchanged; orphan_share is bit-identical
    // ((10a)/(10b) is the same correctly-rounded IEEE quotient); all
    // non-lineitem edges are untouched copies
    val inB = Profiling.profileIntegrity(spark, base)
      .as[(String, Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    val (in10, tIn) = timed(Profiling.profileIntegrity(spark, out)
      .as[(String, Long, Long, Long, Option[Double])].collect().sortBy(_._1))
    val inOk = inB.length == 7 && in10.length == 7 &&
      inB.zip(in10).forall {
        case ((fk, crB, orB, okB, shB), (fk10, cr10, or10, ok10, sh10)) =>
          val m = if (fk.startsWith("lineitem")) 10L else 1L
          fk == fk10 && cr10 == m * crB && or10 == m * orB &&
            ok10 == okB && sh10 == shB
      }
    check("integrity_10x", inOk,
      f"7 FK edges: lineitem children ×10, orphan keys + shares invariant (${tIn}%.1f s)")

    // token_herdan: every variant doc contributes the SAME (ln tokens,
    // ln types) point as its base (word suffixing is a bijection), so
    // n_docs ×10 and β/ln_k/r² are invariant (both OLS moments scale
    // ×100; one 6-dp grid step of tolerance for the double ulp)
    val hB = TextAnalysis.tokenHerdan(spark, base)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    val (h10, tH) = timed(TextAnalysis.tokenHerdan(spark, out)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1))
    def near6(a: Option[Double], b: Option[Double]): Boolean =
      a.isDefined == b.isDefined &&
        a.zip(b).forall { case (x, y) => math.abs(x - y) <= 1.000001e-6 }
    val hOk = hB.nonEmpty && hB.length == h10.length &&
      hB.zip(h10).forall {
        case ((l, nB, bB, kB, rB), (l10, n10, b10, k10, r10)) =>
          l == l10 && n10 == 10 * nB && near6(bB, b10) && near6(kB, k10) &&
            near6(rB, r10)
      }
    check("herdan_10x", hOk,
      f"${h10.length} langs: n_docs ×10, β/ln_k/r² invariant (${tH}%.1f s)")

    // events_scd2: a ×10 user bijection (user 10u+v, event 10e+v keeps
    // the per-user (ts, event_id) order) must produce exactly 10
    // disjoint copies of every base history row — run-count bijection —
    // and the merge law must hold at 10×
    val evSc = Tables.load(spark, base, "events")
      .select(col("user_id"), col("event_type").as("state"), col("ts"),
        col("event_id"))
    val ev10 = evSc
      .select(col("*"), explode(expr("sequence(0, 9)")).as("v"))
      .select((col("user_id") * 10 + col("v")).as("user_id"), col("state"),
        col("ts"), (col("event_id") * 10 + col("v")).as("event_id"))
      .localCheckpoint()
    val dB = EventAnalytics.scd2Derive(evSc)
    val (d10, tS2) = timed {
      val d = EventAnalytics.scd2Derive(ev10).localCheckpoint()
      d.count(); d
    }
    val mapped = d10.select(expr("user_id div 10").as("user_id"),
      col("state"), col("valid_from"), col("valid_to"), col("version"),
      col("is_current"))
    val grouped = mapped.groupBy("user_id", "state", "valid_from",
      "valid_to", "version", "is_current").count().localCheckpoint()
    val notTen = grouped.where(col("count") =!= 10).count()
    val sExtra = grouped.drop("count").exceptAll(dB).count()
    val sMissing = dB.exceptAll(grouped.drop("count")).count()
    check("scd2_bijection_10x", notTen == 0 && sExtra == 0 && sMissing == 0,
      f"every base history row appears exactly 10× under the user " +
        f"bijection (notTen=$notTen extra=$sExtra missing=$sMissing, ${tS2}%.1f s)")
    val cutS = broadcast(ev10.agg(max(col("ts")).as("mx"))
      .select((col("mx") - expr("INTERVAL 7 DAYS")).as("c")))
    val preS = ev10.crossJoin(cutS).where(col("ts") <= col("c"))
      .select(col("user_id"), col("state"), col("ts"), col("event_id"))
    val postS = ev10.crossJoin(cutS).where(col("ts") > col("c"))
      .select(col("user_id"), col("state"), col("ts"), col("event_id"))
    val (mergeDiff, tML) = timed {
      val merged = EventAnalytics
        .scd2Merge(EventAnalytics.scd2Derive(preS), postS).localCheckpoint()
      merged.count()
      val dAll = d10
      merged.exceptAll(dAll).count() + dAll.exceptAll(merged).count()
    }
    check("scd2_merge_law_10x", mergeDiff == 0,
      f"merge(derive(prefix), suffix) == derive(whole) at 10× " +
        f"(symmetric diff $mergeDiff, ${tML}%.1f s)")
    graft.Blocks.release(ev10)
    graft.Blocks.release(d10)
    graft.Blocks.release(grouped)

    // profile_benford: orders ×10 (same totalprice per copy) ⇒ digit
    // counts ×10; share is bit-identical ((10n)/(10T) is the same
    // correctly-rounded IEEE quotient, the integrity_10x argument) and
    // benford_share depends only on the digit
    val oBase = Tables.load(spark, base, "orders")
    val o10 = oBase.select(col("o_totalprice"),
      explode(expr("sequence(0, 9)")).as("v")).drop("v")
    val bfB = Profiling.profileBenfordFrom(oBase)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    val (bf10, tBf) = timed(Profiling.profileBenfordFrom(o10)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1))
    val bfOk = bfB.nonEmpty && bfB.length == bf10.length &&
      bfB.zip(bf10).forall { case ((d, n, sh, e), (d2, n2, sh2, e2)) =>
        d == d2 && n2 == 10 * n && sh2 == sh && e2 == e }
    check("benford_10x", bfOk,
      f"${bfB.length} digits: counts ×10, shares bit-identical (${tBf}%.1f s)")

    // events_concurrency: the ×10 event fixture duplicates events at the
    // SAME (user, ts), so gap-sessions — and therefore the session-overlap
    // profile — are INVARIANT: exact set equality against the base run
    val ccB = EventAnalytics.eventsConcurrencyFrom(
      Tables.load(spark, base, "events"))
    val (cc10, tCv) = timed {
      val c = EventAnalytics.eventsConcurrencyFrom(
        Tables.load(spark, out, "events")).localCheckpoint()
      c.count(); c
    }
    val ccExtra = cc10.exceptAll(ccB).count()
    val ccMissing = ccB.exceptAll(cc10).count()
    check("concurrency_10x", ccExtra == 0 && ccMissing == 0,
      f"session overlap profile invariant under ×10 event duplication " +
        f"(extra=$ccExtra missing=$ccMissing, ${tCv}%.1f s)")
    graft.Blocks.release(cc10)

    // ---- r14 additions ----------------------------------------------------
    // citation_motifs under ten disjoint tagged copies: no triple can
    // span copies, so every connected triad class count scales by
    // EXACTLY 10 (the kcore convention applied to the census)
    val moB = Citations.motifCensus(Citations.edges(spark, base))
      .as[(String, Long)].collect().toMap
    val (mo10, tMo) = timed(Citations.motifCensus(edges10)
      .as[(String, Long)].collect().toMap)
    val moOk = mo10.keySet == moB.keySet &&
      moB.forall { case (k, n) => mo10(k) == 10 * n }
    check("motifs_10x", moOk && moB.values.sum > 0,
      f"13 classes scale exactly ×10 at ~6M edges " +
        f"(${moB.values.sum} -> ${mo10.values.sum} connected triads, ${tMo}%.1f s)")

    // basket_rules: duplicated lineitem is distinct-insensitive — the
    // rule set, counts, and ppm anchors are bit-identical (the apriori
    // convention)
    val brB = Relational.basketRules(spark, base)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val (br10, tBr) = timed(Relational.basketRules(spark, out)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq)
    check("rules_10x", brB.nonEmpty && br10 == brB,
      f"${br10.length} rules bit-identical under ×10 duplicated lineitem " +
        f"(${tBr}%.1f s)")

    // doc_containment at 50k docs: copy 0 is the base corpus and copies
    // 1-9 carry word-tagged twins (disjoint shingle vocabularies — no
    // cross-copy candidates, per-copy dfs equal base dfs so the blocking
    // decisions replay), so pairs and the exact ppm mass scale ×10
    val dcB = Dedup.docContainment(spark, base)
      .agg(count(lit(1)), sum(col("containment_ppm")))
      .as[(Long, Long)].collect().head
    val (dc10, tDc) = timed(Dedup.docContainment(spark, out)
      .agg(count(lit(1)), sum(col("containment_ppm")))
      .as[(Long, Long)].collect().head)
    check("containment_50k", dc10._1 == 10 * dcB._1 && dc10._2 == 10 * dcB._2,
      f"${dc10._1} pairs == 10 × ${dcB._1}, ppm mass ×10 exactly " +
        f"(${tDc}%.1f s)")

    // df-cap observability (r14 advice): the twin mirrors the cap, so
    // recall loss from df > 64 shingles is invisible to the oracle BY
    // CONSTRUCTION — this soak probe is where it becomes visible. At
    // 50k docs every shingle must still sit under the cap (the blocking
    // is provably lossless here); the measured max df is the committed
    // headroom number.
    val (nSh, nOver, maxDf) = Dedup.containmentDfStats(
      graft.Tables.load(spark, out, "documents"))
    check("containment_df_cap_50k", nOver == 0L,
      s"$nSh distinct shingles, 0 over the df=64 cap (max df $maxDf — " +
        "cap drops nothing at 10x; nonzero here = measurable recall loss)")

    // embedding_triplet_mine at 20k vectors (noisy copies — not exact
    // scaling): every stride anchor mines a full triplet, margins live
    // on [-2, 2], and the pass stays one broadcast scan
    val (tm20, tTm) = timed(Similarity.embeddingTripletMine(spark, out)
      .as[(Long, Int, Long, Double, Long, Double, Double, Int)].collect())
    val tmOk = tm20.length == (nVecs / 25) &&
      tm20.forall(r => r._7 >= -2.0 && r._7 <= 2.0 &&
        r._3 != r._1 && r._5 != r._1)
    check("triplet_mine_20k", tmOk && tTm < 60,
      f"${tm20.length} anchors == ${nVecs / 25}, margins in range, " +
        f"no self pos/neg (${tTm}%.1f s)")

    // embedding_silhouette at 20k: sizes partition the corpus, means in
    // [0, 1) under argmin assignment
    val (sl20, tSl) = timed(Similarity.embeddingSilhouette(spark, out)
      .as[(Int, Long, Double)].collect())
    check("silhouette_20k",
      sl20.map(_._2).sum == nVecs &&
        sl20.forall(s => s._3 >= 0.0 && s._3 < 1.0) && tSl < 60,
      f"${sl20.length} clusters partition $nVecs vectors, " +
        f"sil in [0,1) (${tSl}%.1f s)")

    // ---- artifact --------------------------------------------------------
    def q(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val round = sys.env.getOrElse("SPARK_GRAFT_ROUND", "08")
    val json = results.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString(s"""{"fixture": ${q(out)}, "n_docs": $nDocs, "n_vecs": $nVecs, "checks": {""", ", ", "}}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"SOAK_r$round.json"), json + "\n")
    println(s"[soak] wrote SOAK_r$round.json; ${results.size} checks, ${failures.size} failures")
    spark.stop()
    if (failures.nonEmpty) {
      failures.foreach(f => System.err.println(s"[soak] FAILED $f"))
      sys.exit(1)
    }
  }
}
