package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.{Citations, Profiling, Similarity, TextAnalysis}

/** Round-9 additions: degree assortativity, Jaccard link prediction,
  * entropy profiling, int8 embedding quantization — hand fixtures where
  * the closed form is checkable by hand, differential twins where it
  * isn't. */
class GraphStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("citation_assortativity: hand fixture matches the closed form") {
    // out-deg: a=2, b=1; in-deg: x=2, y=1 → edge moments m=3, Σx=5, Σy=5,
    // Σx²=9, Σy²=9, Σxy=8 → r = (3·8−25)/(√2·√2) = −0.5
    val e = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("src", "dst")
    val got = Citations.citationAssortativity(e)
      .as[(Long, Double)].collect().head
    assert(got._1 === 3L)
    assert(got._2 === -0.5)
  }

  test("citation_assortativity: self-loops dropped; r stays in [-1, 1] on sf0.001") {
    val loop = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("z", "z"))
      .toDF("src", "dst")
    val withLoop = Citations.citationAssortativity(loop)
      .as[(Long, Double)].collect().head
    assert(withLoop === ((3L, -0.5)), "self-loop leaked into the moments")
    val real = Citations.citationAssortativity(Citations.edges(spark, sf))
      .as[(Long, Double)].collect().head
    assert(real._1 > 0)
    assert(real._2 >= -1.0 && real._2 <= 1.0, s"r out of range: $real")
  }

  test("citation_jaccard: hand fixture — set semantics, linked pairs excluded") {
    // N(a)={s1,s2}, N(b)={s1,s2,s3,a}, N(c)={s3}; the a→b edge links
    // (a,b) so the anti-join drops it despite inter=2; the duplicated
    // s3→c line must NOT inflate c's neighbor-set size (set semantics)
    val e = Seq(("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "b"),
      ("s3", "b"), ("s3", "c"), ("s3", "c"), ("a", "b")).toDF("src", "dst")
    val got = Citations.linkPredictJaccard(e)
      .as[(String, String, Long, Double)].collect()
    assert(got.toSeq === Seq(("b", "c", 1L, 0.25)))
  }

  test("citation_jaccard: score within (0, 1]; pairs unlinked; cap honored on sf0.001") {
    val edges = Citations.edges(spark, sf)
    val got = Citations.linkPredictJaccard(edges)
      .as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty && got.length <= 30)
    assert(got.forall(r => r._4 > 0.0 && r._4 <= 1.0))
    // descending by score, tie-broken by the pair
    assert(got.sliding(2).forall { case Array(p, q) =>
      p._4 > q._4 || (p._4 == q._4 &&
        (p._1 < q._1 || (p._1 == q._1 && p._2 < q._2)))
    })
    // none of the predicted pairs is an existing edge in either direction
    val linked = edges.as[(String, String)].collect()
      .map { case (s, d) => if (s < d) (s, d) else (d, s) }.toSet
    assert(got.forall(r => !linked((r._1, r._2))))
  }

  test("citation_scc: hand fixture — pivot SCC found, tails and branches excluded") {
    // cycle a→b→c→a with an in-tail t→a and an out-branch c→d; pivot is
    // the max-in-degree node a (in-deg 2). SCC(a) = {a, b, c}: t reaches
    // a but is not reached back; d is reached but never returns.
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("t", "a"), ("c", "d"),
      ("a", "b") // duplicate edge: distinct() semantics
    ).toDF("src", "dst")
    val got = Citations.sccPivot(e).as[String].collect().sorted
    assert(got.toSeq === Seq("a", "b", "c"))
  }

  test("citation_scc: corpus SCC is mutually reachable and maximal on sf0.001") {
    val scc = Citations.sccPivot(Citations.edges(spark, sf))
      .as[String].collect().toSet
    assert(scc.size > 1, "pivot SCC degenerate - fixture not exercising FW-BW")
    // brute-force mutual-reachability check in memory: every member
    // reaches every other member within the SCC edge set, and no
    // outside node is mutually reachable with the pivot
    val edges = Citations.edges(spark, sf)
      .as[(String, String)].collect().filter(e => e._1 != e._2)
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val radj = edges.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    def reach(start: String, g: Map[String, Set[String]]): Set[String] = {
      var seen = Set(start); var frontier = Set(start)
      while (frontier.nonEmpty) {
        val nxt = frontier.flatMap(g.getOrElse(_, Set.empty)) -- seen
        seen ++= nxt; frontier = nxt
      }
      seen
    }
    val indeg = edges.groupBy(_._2).view.mapValues(_.length).toMap
    val pivot = indeg.toSeq.sortBy { case (id, d) => (-d, id) }.head._1
    val truth = reach(pivot, adj) intersect reach(pivot, radj)
    assert(scc === truth)
  }

  test("citation_scc_all: hand fixture — two disjoint SCCs need two pivot extractions") {
    // cycle a→b→c→a (with tail t→a and branch c→d) AND a disjoint
    // 2-cycle x→y→x: trim keeps both cycles in the core, the first
    // FW–BW extraction removes one, the second outer iteration must
    // find the other — exercising the iterated-pivot path. t and d
    // peel as singletons.
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("t", "a"), ("c", "d"),
      ("x", "y"), ("y", "x"), ("a", "b")).toDF("src", "dst")
    val got = Citations.sccAll(e).as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("a", "a", 3L), ("b", "a", 3L), ("c", "a", 3L),
      ("x", "x", 2L), ("y", "x", 2L),
      ("t", "t", 1L), ("d", "d", 1L)))
  }

  test("citation_scc_all: corpus labels partition the nodes; giant matches FW–BW truth on sf0.001") {
    val rows = Citations.sccAll(Citations.edges(spark, sf))
      .as[(String, String, Long)].collect()
    val edges = Citations.edges(spark, sf)
      .as[(String, String)].collect().filter(e => e._1 != e._2)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    // one row per node, sizes consistent with the label groups
    assert(rows.length === nodes.size)
    assert(rows.map(_._1).toSet === nodes)
    val byScc = rows.groupBy(_._2)
    byScc.foreach { case (scc, members) =>
      assert(members.forall(_._3 == members.length.toLong),
        s"scc_size inconsistent for $scc")
      assert(members.map(_._1).min === scc, s"label not the min member for $scc")
    }
    // the non-trivial component equals the in-memory mutual-reachability
    // truth from the max-in-degree pivot; everything else is a singleton
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val radj = edges.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    def reach(start: String, g: Map[String, Set[String]]): Set[String] = {
      var seen = Set(start); var frontier = Set(start)
      while (frontier.nonEmpty) {
        val nxt = frontier.flatMap(g.getOrElse(_, Set.empty)) -- seen
        seen ++= nxt; frontier = nxt
      }
      seen
    }
    val indeg = edges.groupBy(_._2).view.mapValues(_.length).toMap
    val pivot = indeg.toSeq.sortBy { case (id, d) => (-d, id) }.head._1
    val truth = reach(pivot, adj) intersect reach(pivot, radj)
    val nontrivial = byScc.filter(_._2.length > 1)
    assert(nontrivial.keySet === Set(truth.min))
    assert(nontrivial(truth.min).map(_._1).toSet === truth)
    assert(byScc.count(_._2.length == 1) === nodes.size - truth.size)
  }

  test("citation_scc_condensation: hand fixture — intra edges vanish, multiplicities kept") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("t", "a"), ("c", "d"),
      ("x", "y"), ("y", "x"), ("a", "b")).toDF("src", "dst")
    val got = Citations.sccCondensation(e)
      .as[(String, String, Long)].collect().toSet
    // the a-b-c cycle and the x-y cycle collapse; t→a enters scc "a",
    // c→d leaves it; the duplicate a→b is intra (and deduped anyway)
    assert(got === Set(("t", "a", 1L), ("a", "d", 1L)))
  }

  test("citation_scc_condensation: corpus quotient is a simple DAG consistent with scc_all") {
    val cond = Citations.sccCondensation(Citations.edges(spark, sf))
      .as[(String, String, Long)].collect()
    // no self-loops by construction
    assert(cond.forall(e => e._1 != e._2))
    // acyclic: DFS over the quotient finds no back edge
    val adj = cond.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val color = scala.collection.mutable.Map[String, Int]() // 1=open 2=done
    def cyclic(v: String): Boolean = color.getOrElse(v, 0) match {
      case 1 => true
      case 2 => false
      case _ =>
        color(v) = 1
        val bad = adj.getOrElse(v, Set.empty).exists(cyclic)
        color(v) = 2
        bad
    }
    assert(!(adj.keySet.exists(cyclic)), "condensation has a cycle")
    // multiplicities account for every distinct inter-SCC edge
    val labels = Citations.sccAll(Citations.edges(spark, sf))
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    val edges = Citations.edges(spark, sf).as[(String, String)].collect()
      .filter(e => e._1 != e._2).distinct
    val expect = edges.map(e => (labels(e._1), labels(e._2)))
      .filter(p => p._1 != p._2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(cond.map(e => (e._1, e._2) -> e._3).toMap === expect)
  }

  test("citation_scc_layers: hand fixture — longest-path levels over the quotient") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("t", "a"), ("c", "d"),
      ("x", "y"), ("y", "x"), ("a", "b")).toDF("src", "dst")
    val got = Citations.sccLayers(e).as[(String, Long, Long)].collect().toSet
    // condensation: t → {a,b,c} → d, plus the isolated {x,y}. Sources t
    // and x sit at level 0; the abc-SCC at 1; d at 2 (longest chain t→scc→d)
    assert(got === Set(
      ("a", 3L, 1L), ("t", 1L, 0L), ("d", 1L, 2L), ("x", 2L, 0L)))
  }

  test("citation_scc_layers: corpus levels equal the Kahn longest-path recompute") {
    val rows = Citations.sccLayers(Citations.edges(spark, sf))
      .as[(String, Long, Long)].collect()
    // recompute: labels from sccAll (itself differentially tested above),
    // condensation edges in memory, longest-path levels via Kahn peel
    val labels = Citations.sccAll(Citations.edges(spark, sf))
      .as[(String, String, Long)].collect()
    val lab = labels.map(r => r._1 -> r._2).toMap
    val sizes = labels.map(r => r._2 -> r._3).toMap
    val edges = Citations.edges(spark, sf).as[(String, String)].collect()
      .filter(e => e._1 != e._2).distinct
    val ce = edges.map(e => (lab(e._1), lab(e._2)))
      .filter(p => p._1 != p._2).distinct
    val cnodes = sizes.keySet
    val indeg = scala.collection.mutable.Map[String, Int]()
      .withDefaultValue(0)
    ce.foreach { case (_, b) => indeg(b) += 1 }
    val cadj = ce.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val level = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    val q = scala.collection.mutable.Queue[String]()
    cnodes.filter(indeg(_) == 0).foreach(q.enqueue)
    var peeled = 0
    while (q.nonEmpty) {
      val v = q.dequeue(); peeled += 1
      cadj.getOrElse(v, Array.empty[String]).foreach { w =>
        level(w) = math.max(level(w), level(v) + 1)
        indeg(w) -= 1
        if (indeg(w) == 0) q.enqueue(w)
      }
    }
    assert(peeled === cnodes.size, "quotient not acyclic — Kahn stalled")
    val expect = cnodes.map(n => (n, sizes(n), level(n)))
    assert(rows.toSet === expect)
    // fixture exercises real depth, not a flat DAG
    assert(rows.map(_._3).max >= 3L)
  }

  test("profile_entropy: bounds hold; uniform-limit and a recomputed column agree") {
    val rows = Profiling.profileEntropy(spark, sf)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.length === 8)
    rows.foreach { case (name, n, k, h) =>
      assert(n > 0 && k > 0, name)
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-9,
        s"$name entropy $h outside [0, ln($k)]")
    }
    // differential twin for one column, same rounding discipline
    val counts = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag")).count()
      .as[(String, Long)].collect().map(_._2)
    val total = counts.sum.toDouble
    val expect = BigDecimal(-counts.map { n =>
      val p = n / total
      BigDecimal(p * math.log(p))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(_._1 == "lineitem.l_returnflag").get
    assert(got._4 === expect)
  }

  test("embedding_quantize: exact per-vector twin recomputed from raw floats") {
    val got = Similarity.embeddingQuantize(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    assert(got.size === vecs.length)
    val dim = vecs.head._2.length
    val scales = Array.tabulate(dim) { i =>
      vecs.map(v => math.abs(v._2(i).toDouble)).max / 127.0
    }
    // the corpus max of each dim saturates at ±127 somewhere, so the
    // suite-wide saturation count is at least 1
    assert(got.values.map(_._2).sum >= 1L)
    vecs.take(50).foreach { case (id, e) =>
      var sq = 0L; var sat = 0L; var err2 = BigDecimal(0)
      (0 until dim).foreach { i =>
        val x = e(i).toDouble
        val q = if (scales(i) == 0) 0
                else math.floor(x / scales(i) + 0.5).toInt
        assert(q >= -127 && q <= 127, s"vec $id dim $i q=$q")
        sq += q; if (math.abs(q) == 127) sat += 1
        val d0 = x - q * scales(i)
        err2 += BigDecimal(d0 * d0).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      // mimic the operator's decimal→double hop BEFORE the 9-dp round
      val expectErr = BigDecimal(err2.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) === ((sq, sat, expectErr)), s"vec $id")
    }
  }

  test("token_fuzzy_pairs: blocking+verify equals the quadratic brute force") {
    import org.apache.spark.sql.functions.{explode, split, length}
    val got = TextAnalysis.tokenFuzzyPairs(spark, sf)
      .as[(String, String, Long, Long)].collect().toSet
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .union(Tables.load(spark, sf, "part")
        .select(explode(split(col("p_name"), " ")).as("tok")))
      .where(length(col("tok")).between(1, 32))
      .groupBy(col("tok")).count().as[(String, Long)].collect()
    def ed(a: String, b: String): Int = {
      var prev = (0 to b.length).toArray
      for (i <- 1 to a.length) {
        val cur = new Array[Int](b.length + 1); cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
      prev(b.length)
    }
    val expect = (for {
      (a, na) <- toks; (b, nb) <- toks
      if a < b && ed(a, b) == 1
    } yield (a, b, na, nb)).toSet
    assert(got === expect)
    // the fixture vocabulary has real pairs (part-name words: cold/old,
    // red/rod) — the assertion above is not vacuously empty-vs-empty
    assert(got.nonEmpty)
  }

  test("bpe_merges: hand fixture — argmax tie-break and greedy merge semantics") {
    // vocab {aaab×2, ab×3}: round 1 pair weights (a,a)=4, (a,b)=5 →
    // merge (a,b,5); aaab → [a,a,ab]. Round 2: (a,a)=2 ties (a,ab)=2 →
    // lexicographic tie-break picks (a,a); aaab → [aa,ab]. Round 3:
    // (aa,ab)=2. Round 4: no pairs left → stops early at 3 merges.
    val words = Seq(("aaab", 2L), ("ab", 3L)).toDF("w", "freq")
    val got = TextAnalysis.bpeMergesFrom(words, rounds = 10)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1, "a", "b", 5L), (2, "a", "a", 2L),
      (3, "aa", "ab", 2L)))
  }

  test("bpe trainer vocabulary drops delimiter-carrying words (r14 advice)") {
    // a '{'/'}'/quote anywhere in the vocabulary used to corrupt the
    // {sym} representation silently (the require() only saw the winning
    // pair); the word table now excludes such words up front
    val got = TextAnalysis.bpeWords(spark, sf)
    assert(got.where("w LIKE '%{%' OR w LIKE '%}%' OR w LIKE \"%'%\"")
      .count() === 0L)
    // and the trainer really trains on the remainder (not vacuous)
    assert(got.count() > 0L)
  }

  test("bpe_merges: equals a reference Sennrich implementation on sf0.001") {
    import org.apache.spark.sql.functions.{explode, split, length}
    val got = TextAnalysis.bpeMerges(spark, sf)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    var vocab = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")).between(1, 32))
      .groupBy(col("w")).count().as[(String, Long)].collect()
      .map { case (w, f) => (w.toSeq.map(_.toString): Seq[String]) -> f }.toMap
    val expect = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 0
    var go = true
    while (go && r < 10) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (pairs.isEmpty) go = false
      else {
        val wt = pairs.values.max
        val (a, b) = pairs.collect { case (k, v) if v == wt => k }.toSeq.min
        r += 1; expect += ((r, a, b, wt))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toSeq
        }(_._2)(_ + _)
      }
    }
    assert(got.toSeq === expect.toSeq)
    assert(got.length === 10, "sf0.001 corpus should sustain 10 merges")
  }

  test("wordpiece_merges: likelihood argmax equals a reference recompute; diverges from BPE") {
    val got = TextAnalysis.wordpieceMerges(spark, sf)
      .as[(Int, String, String, Long, Long)].collect().sortBy(_._1)
    assert(got.length === 10)
    // in-memory reference: same greedy loop, score = floor(1e9*n_ab/(n_a*n_b))
    var vocab = Tables.load(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("w"))
      .where(org.apache.spark.sql.functions.length(col("w")).between(1, 32))
      .groupBy(col("w")).count().as[(String, Long)].collect()
      .map { case (w, f) => (w.toSeq.map(_.toString): Seq[String]) -> f }.toMap
    val expect = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long, Long)]()
    var r = 0
    var go = true
    while (go && r < 10) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      val syms = scala.collection.mutable.Map[String, Long]()
      vocab.foreach { case (ss, f) =>
        ss.foreach(s => syms(s) = syms.getOrElse(s, 0L) + f)
        ss.sliding(2).filter(_.length == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (pairs.isEmpty) go = false
      else {
        val scored = pairs.map { case ((a, b), nab) =>
          (a, b, nab,
            (BigInt(nab) * 1000000000L / (BigInt(syms(a)) * syms(b))).toLong)
        }.toSeq
        val (a, b, nab, sc) = scored.minBy { case (x, y, _, s) => (-s, x, y) }
        r += 1; expect += ((r, a, b, nab, sc))
        vocab = vocab.groupMapReduce { case (ss, _) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == a && ss(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += ss(i); i += 1 }
          }
          out.toSeq
        }(_._2)(_ + _)
      }
    }
    assert(got.toSeq === expect.toSeq)
    // the likelihood objective must pick a different merge sequence than
    // raw frequency on this corpus (else the variant is vacuous here)
    val bpe = TextAnalysis.bpeMerges(spark, sf)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(got.map(g => (g._2, g._3)).toSeq !== bpe.map(g => (g._2, g._3)).toSeq,
      "wordpiece merge sequence identical to BPE — objective not exercised")
  }

  test("bpe_encode: folded-literal projection equals the oracled aggregate query") {
    import org.apache.spark.sql.functions.{explode, split, length}
    val corpus = TextAnalysis.bpeEncode(spark, sf)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(corpus.nonEmpty)
    // per-doc token counts shrink vs raw chars and exceed word counts
    corpus.foreach { case (id, nw, nt) =>
      assert(nt >= nw, s"doc $id: fewer BPE tokens than words")
    }
    val merges = TextAnalysis.bpeMergeList(
      Tables.load(spark, sf, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")).between(1, 32))
        .groupBy(col("w")).count().withColumnRenamed("count", "freq"),
      rounds = 10)
    val served = TextAnalysis.bpeEncodeLit(
        Tables.load(spark, sf, "documents"), merges)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(served.toSeq === corpus.toSeq)
  }

  test("quantizeLit serve path: exact parity with the oracled corpus query") {
    // the literal-folded per-row projection must equal the exploded
    // groupBy query value-for-value — decimal accumulation is
    // associative, so fold order vs shuffle order cannot diverge
    val corpus = Similarity.embeddingQuantize(spark, sf)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val scales = Similarity.quantizeScales(spark, sf)
    assert(scales.length === 64)
    val served = Similarity.quantizeLit(
        Tables.load(spark, sf, "embeddings"), scales)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(served.toSeq === corpus.toSeq)
    // and the serve-path plan is shuffle-free: scan → project only
    val plan = Similarity.quantizeLit(
        Tables.load(spark, sf, "embeddings"), scales)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"serve path shuffled:\n$plan")
  }
}
