package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.{Dedup, Pipeline}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("sample_split: total partition, stable across runs, ~87.5% train") {
    val a = Pipeline.sampleSplit(spark, sf).as[(Long, String)].collect().toMap
    val b = Pipeline.sampleSplit(spark, sf).as[(Long, String)].collect().toMap
    assert(a === b)
    assert(a.size === Tables.load(spark, sf, "documents").count())
    val trainFrac = a.values.count(_ == "train").toDouble / a.size
    assert(trainFrac > 0.8 && trainFrac < 0.95, s"train fraction $trainFrac")
  }

  test("corpus_upsert: latest-wins per key — delta docs at v1 with new payload, rest untouched") {
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "n_chars",
        "substr(md5(CAST(doc_id AS STRING)), 1, 1) < '4' AS in_delta")
      .as[(Long, Long, Boolean)].collect()
    val got = Pipeline.corpusUpsert(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size === docs.length) // every key exactly once
    docs.foreach { case (id, nc, inDelta) =>
      val expected = if (inDelta) (1L, nc + 17) else (0L, nc)
      assert(got(id) === expected, s"doc $id")
    }
    val nDelta = docs.count(_._3)
    assert(nDelta > 0 && nDelta < docs.length) // both paths exercised
  }

  test("corpus_asof_read: snapshot semantics — deletes vanish, updates persist, no resurrection") {
    val h = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "n_chars",
        "substr(md5(CAST(doc_id AS STRING)), 1, 1) AS h")
      .as[(Long, Long, String)].collect()
    val got = Pipeline.corpusAsofRead(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> (r._3, r._4)).toMap).toMap
    val asOf1 = got(1L); val asOf2 = got(2L)
    def isDel(hx: String) = hx < "2" || hx >= "e"
    h.foreach { case (id, nc, hx) =>
      val updated = hx < "4"
      // as-of 1 never sees v2: every key live, updates applied
      assert(asOf1(id) === (if (updated) (1L, nc + 17) else (0L, nc)))
      if (isDel(hx)) assert(!asOf2.contains(id), s"doc $id must be gone as of 2")
      else assert(asOf2(id) === asOf1(id), s"doc $id unchanged by others' deletes")
    }
    // the delete range straddles the update range, so all three paths are
    // exercised: delete-after-update (h < '2' — its v1 row must NOT
    // resurrect), delete-of-untouched (h >= 'e'), and plain survivors
    assert(h.count(r => r._3 < "2") > 0, "need delete-after-update keys")
    assert(h.count(r => r._3 >= "e") > 0, "need delete-of-untouched keys")
    assert(asOf1.size === h.length)
    assert(asOf2.size === h.length - h.count(r => isDel(r._3)))
  }

  test("profile_drift: exact contingency recompute; cells partition each dimension") {
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("lang", "source",
        "substr(md5(CAST(doc_id AS STRING)), 1, 1) < 'e' AS tr")
      .as[(String, String, Boolean)].collect()
    val tt = docs.count(_._3).toLong; val hh = docs.size - tt
    val got = Pipeline.profileDrift(spark, sf)
      .as[(String, String, Long, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    Seq("lang" -> docs.map(d => (d._1, d._3)),
        "source" -> docs.map(d => (d._2, d._3))).foreach { case (dim, rows) =>
      val cells = got.filter(_._1 == dim)
      // cells partition the corpus on this dimension
      assert(cells.map(_._3).sum === tt && cells.map(_._4).sum === hh)
      val byValue = rows.groupBy(_._1)
      assert(cells.length === byValue.size)
      cells.foreach { case (_, v, t, h, st, sh, chi) =>
        val expT = byValue(v).count(_._2).toLong
        assert(t === expT && h === byValue(v).size - expT, s"$dim=$v counts")
        // exact-arithmetic recompute of the chi2 contribution
        val n = (t + h).toDouble; val bigN = (tt + hh).toDouble
        val et = (n * tt.toDouble) / bigN; val eh = (n * hh.toDouble) / bigN
        val expChi = BigDecimal(
          (((t.toDouble - et) * (t.toDouble - et)) / et) +
            (((h.toDouble - eh) * (h.toDouble - eh)) / eh))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(chi === expChi, s"$dim=$v chi2")
        assert(chi >= 0 && st >= 0 && sh >= 0)
      }
      // shares sum to ~1 within each split (rounding only)
      assert(math.abs(cells.map(_._5).sum - 1.0) < 1e-4)
      assert(math.abs(cells.map(_._6).sum - 1.0) < 1e-4)
    }
  }

  test("sample_stratified: deterministic, minority lang kept whole, strata balanced") {
    val a = Pipeline.sampleStratified(spark, sf)
      .as[(Long, String, String)].collect()
    val b = Pipeline.sampleStratified(spark, sf)
      .as[(Long, String, String)].collect()
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
    val orig = Tables.load(spark, sf, "documents")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val minN = orig.values.min
    val kept = a.groupBy(_._2).map { case (l, rs) => l -> rs.length.toLong }
    // the minority stratum's threshold is '10000' > every '0xxxx' key
    val minorityLang = orig.minBy { case (l, n) => (n, l) }._1
    assert(kept(minorityLang) === minN)
    // every stratum lands near min_n (hash-uniform: ±3sigma ~ ±3*sqrt(min_n))
    orig.keys.foreach { l =>
      val k = kept.getOrElse(l, 0L)
      assert(k <= orig(l))
      assert(math.abs(k - minN) <= math.max(5L, 3 * math.sqrt(minN.toDouble).toLong),
        s"stratum $l kept $k, expected ~$minN")
    }
  }

  test("sample_stratified plans broadcast joins only (no corpus shuffle)") {
    val p = Pipeline.sampleStratified(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("documents_deduped: victims gone, survivors intact, smallest id kept per pair") {
    val victims = Dedup.dedupNear(spark, sf)
      .select("doc_b").as[Long].collect().toSet
    val kept = Pipeline.documentsDeduped(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(victims.intersect(kept).isEmpty)
    assert(kept.size ===
      Tables.load(spark, sf, "documents").count() - victims.size)
    // the smaller side of every pair survives unless itself a victim
    Dedup.dedupNear(spark, sf).select("doc_a").as[Long].collect()
      .filterNot(victims.contains).foreach(a => assert(kept.contains(a)))
  }

  test("pipeline_e2e composes redact -> dedup -> quality -> split consistently") {
    val m = Pipeline.pipelineE2e(spark, sf)
      .as[(Long, String, Long, String)].collect()
    val docs = Tables.load(spark, sf, "documents")
    // manifest is a subset of the corpus with no duplicate ids
    assert(m.map(_._1).distinct.length === m.length)
    assert(m.length <= docs.count())
    // every surviving doc passes the quality gate
    m.foreach { case (_, _, n, split) =>
      assert(n >= 20 && n <= 1000)
      assert(split == "train" || split == "holdout")
    }
    // split agrees with the standalone sampleSplit operator
    val splits = Pipeline.sampleSplit(spark, sf)
      .as[(Long, String)].collect().toMap
    m.foreach { case (id, _, _, split) => assert(splits(id) === split) }
    // exact-dup victims (same text, larger id) never survive
    val dupVictims = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .groupBy(_._2).values.filter(_.length > 1)
      .flatMap(g => g.map(_._1).sorted.tail).toSet
    assert(m.map(_._1).toSet.intersect(dupVictims).isEmpty)
  }

  test("pack_batches: batches respect the token budget within each shard") {
    val rows = Pipeline.packBatches(spark, sf, budget = 2000)
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.length === Tables.load(spark, sf, "documents").count())
    // within (shard, batch) the PRECEDING docs' tokens stay under budget:
    // cum_before div budget is constant per batch by construction, so the
    // observable contract is: batch ids are consecutive from 0 per shard,
    // and re-deriving them from token sums matches
    rows.groupBy(_._2).foreach { case (_, shardRows) =>
      val sorted = shardRows.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (_, _, n, batch) =>
        assert(batch === cum / 2000, s"batch mismatch at cum=$cum")
        cum += n
      }
    }
  }

  test("pack_batches: shard count scales with corpus tokens / targetShardTokens") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf, "documents")
    val totalTokens = docs
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).first().getLong(0)
    // default knob at test scale: 8 shards (the floor)
    val defShards = Pipeline.packBatches(spark, sf)
      .select("shard").distinct().as[Int].collect().toSet
    assert(defShards.subsetOf((0 until 8).toSet) && defShards.size === 8)
    // non-default knob: the shard count derives from the corpus
    val target = 512L
    val expectShards = math.max(8L, math.ceil(totalTokens / target.toDouble).toLong)
    assert(expectShards > 8, s"corpus too small to exercise the knob: $totalTokens tokens")
    val rows = Pipeline.packBatches(spark, sf, budget = 2000,
      targetShardTokens = target).as[(Long, Int, Long, Long)].collect()
    assert(rows.length === docs.count())
    // shard assignment is doc_id mod the derived count — deterministic
    rows.foreach { case (id, shard, _, _) =>
      assert(shard === (id % expectShards).toInt, s"doc $id shard $shard")
    }
    // the budget invariant holds at the non-default count too
    rows.groupBy(_._2).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy(_._1).foreach { case (_, _, n, batch) =>
        assert(batch === cum / 2000)
        cum += n
      }
    }
  }

  test("pretrain_manifest: mix -> shuffle -> pack composed consistently") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val m = Pipeline.pretrainManifest(spark, sf)
      .as[(Long, Int, String, Long, Long, Long)].collect()
    // stage-1 parity: the (doc, epoch) instances are exactly mixEpochs'
    val mixed = Pipeline.mixEpochs(spark, sf)
      .select("doc_id", "epoch").as[(Long, Int)].collect().toSet
    assert(m.map(r => (r._1, r._2)).toSet === mixed)
    assert(m.length === mixed.size)
    // stage-2 parity: shuffle_pos is the 1..N permutation the direct
    // (unscalable) global-window twin produces over the same seeded key
    assert(m.map(_._4).sorted.toSeq === (1L to m.length))
    val twin = Pipeline.mixEpochs(spark, sf)
      .select(col("doc_id"), col("epoch"),
        md5(concat(lit("epoch0:"), col("doc_id").cast("string"), lit(":"),
          col("epoch").cast("string"))).as("k"))
      .withColumn("p",
        row_number().over(Window.orderBy(col("k"), col("doc_id"), col("epoch"))))
      .select(col("doc_id"), col("epoch"), col("p").cast("long"))
      .as[(Long, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    m.foreach(r => assert(r._4 === twin((r._1, r._2)), s"doc ${r._1} epoch ${r._2}"))
    // stage-3 parity: within a shard, batches pack along shuffle order
    m.groupBy(_._3).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy(_._4).foreach { case (_, _, _, _, n, batch) =>
        assert(batch === cum / 2000)
        cum += n
      }
    }
  }

  test("pretrain_manifest plan: pack rides the shuffle stage's sort (one Window op)") {
    val plan = Pipeline.pretrainManifest(spark, sf)
      .queryExecution.executedPlan.toString
    // the global-ordinal row_number and the packing running sum must be
    // evaluated by the SAME Window operator (same partition + order spec
    // => one exchange, one sort); a second corpus-sized sort would mean
    // the composition degraded to sequential stages
    val windowLines = plan.linesIterator.filter(_.contains("Window [")).toSeq
    val fused = windowLines.filter(l =>
      l.contains("row_number()") && l.contains("sum(n_tokens"))
    assert(fused.size === 1, s"expected one fused Window, got:\n${windowLines.mkString("\n")}")
    // no OTHER corpus-partitioned window: everything else ordering by
    // shard is the 256-row offset aggregate
    assert(windowLines.count(l => l.contains("row_number()")) === 1)
  }

  test("mix_epochs: copies per doc are floor(w) or floor(w)+1; source totals track w") {
    val docs = Tables.load(spark, sf, "documents")
    val srcN = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val rows = Pipeline.mixEpochs(spark, sf).as[(Long, String, Int)].collect()
    def weight(src: String): Double = 1.0 + (src.drop(3).toInt % 4) * 0.5
    // per-doc: epochs are exactly 1..n with n in {floor(w), floor(w)+1}
    rows.groupBy(r => (r._1, r._2)).foreach { case ((id, src), rs) =>
      val epochs = rs.map(_._3).sorted.toSeq
      assert(epochs === (1 to epochs.length), s"doc $id epochs $epochs")
      val base = math.floor(weight(src)).toInt
      assert(epochs.length === base || epochs.length === base + 1,
        s"doc $id from $src emitted ${epochs.length} copies for w=${weight(src)}")
    }
    // per-source totals within hash noise of w * n (±3 sigma of Binomial)
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val expect = weight(src) * srcN(src)
      val sigma = math.sqrt(srcN(src) * 0.25) // worst-case frac variance
      assert(math.abs(rs.length - expect) <= math.max(4.0, 3 * sigma),
        s"$src emitted ${rs.length}, expected ~$expect")
    }
    // per-row op: the plan must not shuffle the corpus
    val plan = Pipeline.mixEpochs(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mix_epochs shuffles:\n$plan")
  }

  test("mix_temperature: multiplicity follows n^alpha; head down, tail up; ~N per epoch") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf, "documents")
    val langN = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val n = langN.values.sum
    val z = langN.values.map(math.pow(_, 0.5)).sum
    def m(lang: String): Double =
      BigDecimal(n * math.pow(langN(lang), -0.5) / z)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Pipeline.mixTemperature(spark, sf)
      .as[(Long, String, Int)].collect()
    // per-doc: epochs are exactly 1..c with c in {floor(m), floor(m)+1};
    // docs with 0 copies legitimately absent (head-language downsampling)
    rows.groupBy(r => (r._1, r._2)).foreach { case ((id, lang), rs) =>
      val epochs = rs.map(_._3).sorted.toSeq
      assert(epochs === (1 to epochs.length), s"doc $id epochs $epochs")
      val base = math.floor(m(lang)).toInt
      assert(epochs.length === base || epochs.length === base + 1,
        s"doc $id ($lang) emitted ${epochs.length} for m=${m(lang)}")
    }
    // the recipe's direction: the majority language is downsampled below
    // 1 copy/doc, the minority upsampled above — and totals track m * n_l
    val byLang = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val head = langN.maxBy(_._2)._1
    val tail = langN.minBy(_._2)._1
    assert(byLang(head) < langN(head), s"head lang $head not downsampled")
    assert(byLang(tail) > langN(tail), s"tail lang $tail not upsampled")
    langN.keys.foreach { lang =>
      val expect = m(lang) * langN(lang)
      val sigma = math.sqrt(langN(lang) * 0.25)
      assert(math.abs(byLang.getOrElse(lang, 0) - expect) <= math.max(4.0, 3 * sigma),
        s"$lang emitted ${byLang.getOrElse(lang, 0)}, expected ~$expect")
    }
    // one epoch still draws ~N documents overall
    assert(math.abs(rows.length - n.toDouble) <= 3 * math.sqrt(n.toDouble))
    // plan: per-row + broadcast multiplicity table — the corpus never
    // shuffles (only the #langs-row stratum aggregate exchanges)
    val plan = Pipeline.mixTemperature(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"multiplicity table not broadcast:\n$plan")
  }

  test("corpus_shuffle: a 1..N permutation matching the global-window twin") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = Pipeline.corpusShuffle(spark, sf).as[(Long, Long)].collect()
    val n = Tables.load(spark, sf, "documents").count()
    assert(got.length === n)
    assert(got.map(_._2).sorted.toSeq === (1L to n)) // exact permutation
    // the bucketed two-phase ordinal must equal the direct (unscalable)
    // global-window formulation
    val twin = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        md5(concat(lit("epoch0:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("p", row_number().over(Window.orderBy(col("k"), col("doc_id"))))
      .select(col("doc_id"), col("p").cast("long"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (id, pos) => assert(pos === twin(id), s"doc $id") }
    // seed changes the order
    val reseeded = Pipeline.corpusShuffle(spark, sf, seed = "epoch1")
      .as[(Long, Long)].collect().toMap
    val same = got.count { case (id, pos) => reseeded(id) == pos }
    assert(same < n / 4, s"$same/$n positions unchanged across seeds")
    // the corpus-sized window is bucket-partitioned (parallel); no
    // single-partition global sort-window over the corpus
    val plan = Pipeline.corpusShuffle(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("[bucket"), s"within-bucket window missing:\n$plan")
  }

  test("sample_token_budget: bucketed prefix sum equals the naive window; budget is a floor") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val budget = 2000L
    val got = Pipeline.sampleTokenBudget(spark, sf, budget)
      .as[(String, Long, Long, Long)].collect()
    // the two-level cum must equal the direct (unscalable) per-lang
    // window over the same md5 order
    val twin = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("r"))
      .withColumn("cum", sum(col("n_tokens")).over(
        Window.partitionBy(col("lang")).orderBy(col("r"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .as[(Long, String, Long, String, Long)].collect()
    val twinCum = twin.map(t => t._1 -> t._5).toMap
    got.foreach { case (_, id, _, cum) =>
      assert(cum === twinCum(id), s"doc $id cum") }
    // keep rule: kept iff cum-before < budget — recompute the keep set
    val expectKeep = twin.filter(t => t._5 - t._3 < budget).map(_._1).toSet
    assert(got.map(_._2).toSet === expectKeep)
    // budget floor: each lang with >= budget tokens contributes >= budget,
    // and dropping its last kept doc would fall under budget (minimality)
    val perLang = got.groupBy(_._1)
    val langTotals = twin.groupBy(_._2).map { case (l, ts) => l -> ts.map(_._3).sum }
    perLang.foreach { case (lang, rows) =>
      val kept = rows.map(_._3).sum
      if (langTotals(lang) >= budget) {
        assert(kept >= budget, s"$lang under budget: $kept")
        val maxCum = rows.map(_._4).max
        val lastTokens = rows.maxBy(_._4)._3
        assert(maxCum - lastTokens < budget, s"$lang kept a doc past the floor")
      } else assert(kept === langTotals(lang), s"$lang must keep everything")
    }
    // the corpus-sized window is bucket-partitioned; the only per-lang
    // window runs over the bounded offset table
    val plan = Pipeline.sampleTokenBudget(spark, sf, budget)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bucket"), s"bucketed prefix sum missing:\n$plan")
  }

  test("sample_weighted: deterministic E-S draw, dense per-lang ranks, weighted bias") {
    val docs = Tables.load(spark, sf, "documents")
    val langN = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val a = Pipeline.sampleWeighted(spark, sf)
      .as[(String, Long, Long, Double, Int)].collect()
    val b = Pipeline.sampleWeighted(spark, sf)
      .as[(String, Long, Long, Double, Int)].collect()
    assert(a.sortBy(r => (r._1, r._5)).toSeq === b.sortBy(r => (r._1, r._5)).toSeq)
    // exactly min(k, n_lang) rows per language, ranks dense from 1,
    // priorities non-decreasing in rank (the E-S min-k order)
    a.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.length === math.min(20L, langN(lang)).toInt, s"lang=$lang")
      val sorted = rows.sortBy(_._5)
      assert(sorted.map(_._5).toSeq === (1 to rows.length))
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.toSeq)
    }
    // token-mass bias: the weighted sample's mean weight should exceed
    // the corpus mean (long docs are proportionally more likely) — a
    // structural property of -ln(u)/w priorities, not a statistical
    // accident at this draw size (k*langs ~ 2/5 of the corpus)
    val corpusMean = docs
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")).cast("double"))
      .as[Double].collect().sum / langN.values.sum
    val sampleMean = a.map(_._3.toDouble).sum / a.length
    assert(sampleMean > corpusMean,
      f"weighted sample mean $sampleMean%.1f <= corpus mean $corpusMean%.1f")
  }

  test("sample_weighted plan: per-lang top-k pushes down as WindowGroupLimit") {
    val plan = Pipeline.sampleWeighted(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter did not push down:\n$plan")
  }

  test("bucketHexChars is a free parallelism knob: ordinals invariant across widths") {
    // the bucket is a PREFIX of the md5 sort key, so the bucket count
    // (16^k) changes task granularity but NEVER the emitted global order
    // — the property that lets a 100-TB run raise k without re-oracling
    val k2 = Pipeline.corpusShuffle(spark, sf).as[(Long, Long)].collect().toMap
    Seq(1, 3).foreach { k =>
      val kk = Pipeline.corpusShuffle(spark, sf, bucketHexChars = k)
        .as[(Long, Long)].collect().toMap
      assert(kk === k2, s"ordinals drifted at bucketHexChars=$k")
    }
    // pretrain_manifest: shuffle_pos equally invariant; shard/batch
    // labels refine with k but packing stays budget-valid per shard
    val m2 = Pipeline.pretrainManifest(spark, sf)
      .select("doc_id", "epoch", "shuffle_pos")
      .as[(Long, Int, Long)].collect()
      .map { case (d, e, p) => ((d, e), p) }.toMap
    val m3rows = Pipeline.pretrainManifest(spark, sf, bucketHexChars = 3)
      .as[(Long, Int, String, Long, Long, Long)].collect()
    m3rows.foreach(r => assert(m2((r._1, r._2)) === r._4,
      s"shuffle_pos drifted for (${r._1},${r._2}) at k=3"))
    assert(m3rows.map(_._3).forall(_.length == 3))
    m3rows.groupBy(_._3).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy(_._4).foreach { case (_, _, _, _, n, batch) =>
        assert(batch === cum / 2000)
        cum += n
      }
    }
  }
}
