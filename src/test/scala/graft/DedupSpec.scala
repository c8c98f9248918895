package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("no dedup operator ever plans a cartesian product (block-then-verify)") {
    for (n <- Seq("dedup_near", "dedup_ngram", "simhash_pairs")) {
      val p = plan(SparkEntry.queries(n)(spark, sf))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n plans an all-pairs join:\n$p")
    }
  }

  test("dedup_exact: one group per distinct text; keep_id is the min doc_id") {
    val docs = Tables.load(spark, sf, "documents")
    val got = Dedup.dedupExact(spark, sf).cache()
    assert(got.count() === docs.select("text").distinct().count())
    // total copies across groups == corpus size
    assert(got.agg(org.apache.spark.sql.functions.sum("n_copies"))
      .first().getLong(0) === docs.count())
  }

  test("dedup_near emits only verified pairs: every emitted J >= 0.6, symmetric-free, a<b") {
    val got = Dedup.dedupNear(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty, "sf0.001 has planted near-dup pairs; none found")
    got.foreach { case (a, b, i, u) =>
      assert(a < b, s"pair ($a,$b) not ordered")
      assert(i * 5 >= u * 3, s"pair ($a,$b) below threshold: $i/$u")
      assert(i <= u)
    }
  }

  test("dedup_near finds exactly the all-pairs exact-Jaccard result (LSH is lossless here)") {
    // brute-force oracle in Spark itself, tiny sf only
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", org.apache.spark.sql.functions.expr(
        """array_distinct(CASE WHEN size(split(text,' ')) >= 3
          |THEN transform(sequence(1, size(split(text,' '))-2),
          |     i -> concat_ws(' ', slice(split(text,' '), i, 3)))
          |ELSE array(text) END)""".stripMargin).as("s"))
    val a = docs.select($"doc_id".as("da"), $"s".as("sa"))
    val b = docs.select($"doc_id".as("db"), $"s".as("sb"))
    val brute = a.crossJoin(b).where($"da" < $"db")
      .select($"da", $"db",
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.array_intersect($"sa", $"sb")).cast("long").as("i"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.array_union($"sa", $"sb")).cast("long").as("u"))
      .where($"i" * 5 >= $"u" * 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    val lsh = Dedup.dedupNear(spark, sf).as[(Long, Long, Long, Long)].collect().toSet
    assert(lsh === brute)
  }

  test("dedup_ngram finds exactly the all-pairs exact-Jaccard result (LSH is lossless here)") {
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", org.apache.spark.sql.functions.expr(
        """CASE WHEN length(text) >= 9
          |THEN transform(sequence(1, length(text)-8), i -> substr(text, i, 9))
          |ELSE array(text) END""".stripMargin).as("s"))
    val a = docs.select($"doc_id".as("da"), $"s".as("sa"))
    val b = docs.select($"doc_id".as("db"), $"s".as("sb"))
    val brute = a.crossJoin(b).where($"da" < $"db")
      .select($"da", $"db",
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.array_intersect($"sa", $"sb")).cast("long").as("i"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.array_union($"sa", $"sb")).cast("long").as("u"))
      .where($"i" * 10 >= $"u" * 7)
      .as[(Long, Long, Long, Long)].collect().toSet
    val lsh = Dedup.dedupNgram(spark, sf).as[(Long, Long, Long, Long)].collect().toSet
    assert(lsh === brute)
    assert(lsh.nonEmpty)
  }

  test("dedup_clusters: connected components of the near-dup graph, min-label") {
    val pairs = Dedup.dedupNear(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val clusters = Dedup.dedupClusters(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(clusters.size === Tables.load(spark, sf, "documents").count())
    // both ends of every pair share a cluster, labeled by its minimum
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
      assert(clusters(a) <= math.min(a, b))
    }
    // cluster label is a member of its own cluster (canonical representative)
    clusters.values.toSet.foreach { (c: Long) => assert(clusters(c) === c) }
    // docs in no pair are singletons
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    clusters.foreach { case (id, c) =>
      if (!inPairs.contains(id)) assert(c === id)
    }
  }

  test("simhash fingerprints: deterministic, 60-bit, sensitive to content") {
    val fp1 = Dedup.simhashFingerprints(spark, sf).as[(Long, Long)].collect().toMap
    val fp2 = Dedup.simhashFingerprints(spark, sf).as[(Long, Long)].collect().toMap
    assert(fp1 === fp2)
    assert(fp1.values.forall(h => h >= 0 && h < (1L << 60)))
    assert(fp1.values.toSet.size > 1, "all fingerprints identical")
  }

  test("simhash_pairs: hamming <= 3 and consistent with fingerprint xor") {
    val fp = Dedup.simhashFingerprints(spark, sf).as[(Long, Long)].collect().toMap
    val pairs = Dedup.simhashPairs(spark, sf).as[(Long, Long, Int)].collect()
    pairs.foreach { case (a, b, h) =>
      assert(h <= 3)
      assert(java.lang.Long.bitCount(fp(a) ^ fp(b)) === h)
    }
  }

  test("simhash banding is pigeonhole-exact: pairs == brute-force hamming <= 3") {
    val fp = Dedup.simhashFingerprints(spark, sf).as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- fp; (b, hb) <- fp if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(spark, sf).as[(Long, Long, Int)].collect()
      .map(p => (p._1, p._2)).toSet
    assert(got === brute)
  }

  test("dedup_spans: hashed-shingle coverage equals the string-keyed twin") {
    import org.apache.spark.sql.functions._
    // string-keyed twin of the operator (what the DuckDB oracle does):
    // group occurrences by the shingle STRING, not its 64-bit hash
    val rows = Tables.load(spark, sf, "documents")
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", $"ws", size($"ws").cast("long").as("n_tok"),
        explode(expr("sequence(1, greatest(size(ws) - 9, 1))")).as("i"))
      .select($"doc_id", $"n_tok", $"i",
        expr("concat_ws(' ', slice(ws, i, 10))").as("sh"))
    val dup = rows.groupBy($"sh")
      .agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
      .where($"lo" =!= $"hi").select($"sh")
    val expected = rows.join(dup, Seq("sh"), "left_semi")
      .select($"doc_id",
        explode(expr("sequence(i, least(i + 9, CAST(n_tok AS INT)))")).as("p"))
      .distinct().groupBy($"doc_id").count()
      .as[(Long, Long)].collect().toMap
    val got = Dedup.dedupSpans(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.length === Tables.load(spark, sf, "documents").count())
    got.foreach { case (id, nTok, nDup) =>
      assert(nDup >= 0 && nDup <= nTok, s"doc $id coverage $nDup out of $nTok")
      assert(nDup === expected.getOrElse(id, 0L), s"doc $id")
    }
    assert(got.exists(_._3 > 0), "corpus has near-dups; no covered spans found")
  }

  test("contamination_check: hashed overlap equals the string-keyed twin; holdout rows only") {
    import org.apache.spark.sql.functions._
    val withSplit = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text",
        (substring(md5($"doc_id".cast("string")), 1, 1) < "e").as("is_train"))
    def sh(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", explode(expr("sequence(1, greatest(size(ws) - 7, 1))")).as("i"), $"ws")
      .select($"doc_id", expr("concat_ws(' ', slice(ws, i, 8))").as("s"))
      .distinct()
    val train = sh(withSplit.where($"is_train")).select($"s").distinct()
    val expected = sh(withSplit.where(!$"is_train"))
      .join(train, Seq("s"), "left_semi")
      .groupBy($"doc_id").count().as[(Long, Long)].collect().toMap
    val holdoutIds = withSplit.where(!$"is_train").select($"doc_id")
      .as[Long].collect().toSet
    val got = Dedup.contaminationCheck(spark, sf).as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSet === holdoutIds)
    got.foreach { case (id, n, hits) =>
      assert(hits >= 0 && hits <= n)
      assert(hits === expected.getOrElse(id, 0L), s"doc $id")
    }
  }

  test("contamination_bloom: no false negatives vs exact; false positives bounded") {
    val exact = Dedup.contaminationCheck(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val approx = Dedup.contaminationBloom(spark, sf)
      .as[(Long, Long, Long)].collect()
    // same serving shape: one row per holdout doc, same shingle totals
    assert(approx.map(_._1).toSet === exact.keySet)
    var extra = 0L; var shingles = 0L
    approx.foreach { case (id, n, hits) =>
      val (nEx, hitsEx) = exact(id)
      assert(n === nEx, s"doc $id shingle total drift")
      // the bloom guarantee: a set member NEVER tests negative
      assert(hits >= hitsEx, s"doc $id false negative: bloom $hits < exact $hitsEx")
      assert(hits <= n)
      extra += hits - hitsEx; shingles += n
    }
    // fill ~0.07 at m=2^20/k=4 over the test corpus => FP ~ 3e-5; allow
    // two orders of margin so the assertion pins collapse, not luck
    assert(extra <= math.max(2L, shingles / 300),
      s"false-positive rate collapsed: $extra extra hits over $shingles shingles")
    // the filter state the eval side probes is bounded BY CONSTRUCTION:
    // one broadcast 1-row bitmap (≤128 KiB), tested per shingle as a
    // codegen'd conjunction — no explode, no equi-join, no re-group
    val plan = Dedup.contaminationBloom(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"bitmap not a broadcast 1-row frame:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("text_normalize / dedup_normalized: case, punctuation, whitespace collapse to one group") {
    import org.apache.spark.sql.functions.{col, md5}
    val fix = Seq(
      (1L, "Hello, World!  This is FINE."),
      (2L, "hello world this is fine"),
      (3L, "hello   world,,, THIS is... fine"),
      (4L, "something else entirely")).toDF("doc_id", "text")
    val norm = fix.select(col("doc_id"),
      md5(Dedup.normText(col("text"))).as("m")).as[(Long, String)].collect().toMap
    assert(norm(1L) === norm(2L) && norm(2L) === norm(3L),
      "reformatted copies must fingerprint identically")
    assert(norm(4L) !== norm(1L))
    // corpus: group sizes partition the corpus exactly
    val nd = Dedup.dedupNormalized(spark, sf).as[(String, Long, Long)].collect()
    assert(nd.map(_._3).sum === Tables.load(spark, sf, "documents").count())
    // normalized grouping is at most as fine as raw-exact grouping
    val ne = Dedup.dedupExact(spark, sf).as[(String, Long, Long)].collect()
    assert(nd.length <= ne.length)
  }

  test("fingerprint index: incremental dedup equals the one-batch pipeline on cross pairs") {
    import org.apache.spark.sql.functions.col
    import graft.sources.FingerprintIndex
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("fpindex").toString
    FingerprintIndex.writeIndex(corpus, dir)
    // incremental: new batch vs the STORED index (corpus text untouched)
    val inc = FingerprintIndex.dedupAgainstIndex(spark, batch, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (c, nw, i, u) =>
        (math.min(c, nw), math.max(c, nw)) -> ((i, u)) }.toMap
    // one-batch twin: the full pipeline's verified pairs, restricted to
    // the (even, odd) cross pairs the incremental run can see
    val full = Dedup.dedupNearFrom(docs)
      .as[(Long, Long, Long, Long)].collect()
      .filter { case (a, b, _, _) => (a % 2 == 0) != (b % 2 == 0) }
      .map { case (a, b, i, u) => (a, b) -> ((i, u)) }.toMap
    assert(inc === full,
      s"incremental pairs drifted: inc=${inc.keySet} full=${full.keySet}")
    assert(inc.nonEmpty, "no cross-half near-dups at sf0.001 — twin is vacuous")
    // admit the batch: append its fingerprints, then the NEXT batch (the
    // even half again, as a stand-in) must also see the odd half's docs
    FingerprintIndex.appendToIndex(batch, dir)
    val round2 = FingerprintIndex.dedupAgainstIndex(spark, corpus, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (c, nw, i, u) =>
        (math.min(c, nw), math.max(c, nw)) -> ((i, u)) }.toMap
    // the grown index holds both halves, so round 2 surfaces even-even
    // pairs (probe docs vs their round-1 fingerprints) AND the cross
    // pairs; the cross slice must again equal the one-batch twin
    val round2Cross = round2.filter { case ((a, b), _) => (a % 2 == 0) != (b % 2 == 0) }
    assert(round2Cross === full, "post-append cross pairs drifted")
  }

  test("dedup_canonical: longest-doc-wins recompute; members partition the corpus") {
    val clusters = Dedup.dedupClusters(spark, sf)
      .as[(Long, Long)].collect()
    val chars = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    val expected = clusters.groupBy(_._2).map { case (cid, members) =>
      val ids = members.map(_._1)
      val best = ids.map(id => (chars(id), id))
        .reduce((x, y) => if (y._1 > x._1 || (y._1 == x._1 && y._2 < x._2)) y else x)
      cid -> ((best._2, best._1, ids.length.toLong))
    }
    val got = Dedup.dedupCanonical(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === expected)
    // members partition the corpus; at least one real (multi-member)
    // cluster exists or longest-wins was never exercised
    assert(got.values.map(_._3).sum === chars.size.toLong)
    assert(got.values.exists(_._3 > 1), "no multi-member cluster at sf0.001")
  }

  test("doc_containment catches a planted subset pair that Jaccard misses") {
    // doc 2 = the first quarter of doc 1: containment(2 -> 1) = 1.0, but
    // J = |A|/|B| ~ 0.25 -- below every Jaccard gate in the suite
    val words = (0 until 200).map(i => s"w$i")
    val docs = Seq(
      (1L, words.mkString(" ")),
      (2L, words.take(50).mkString(" ")),
      (3L, (200 until 400).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val cont = Dedup.docContainmentFrom(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
    val sub = cont.find(r => r._1 == 2L && r._2 == 1L)
    assert(sub.nonEmpty, "subset pair not found")
    assert(sub.get._5 === 1000000L, "full containment must be ppm 1e6")
    // the reverse direction (big doc in small) must be ~quarter, not 1.0
    val rev = cont.find(r => r._1 == 1L && r._2 == 2L)
    assert(rev.isEmpty, "1->2 containment ~0.24 is below the 0.5 gate")
    // Jaccard gate at 0.6 really misses it
    val near = Dedup.dedupNearFrom(docs).as[(Long, Long, Long, Long)].collect()
    assert(!near.exists(r => r._1 == 1L && r._2 == 2L))
    // unrelated doc 3 pairs with nothing
    assert(!cont.exists(r => r._1 == 3L || r._2 == 3L))
  }

  test("containment_incremental == one-batch containment restricted to cross pairs") {
    val inc = Dedup.containmentIncremental(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // the one-batch operator over the WHOLE corpus (df cap computed over
    // corpus + batch on both paths), filtered to pairs straddling the
    // md5 split — the exact contract the index probe must honor
    def corpusSide(id: Long): Boolean =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).map("%02x".format(_)).mkString
        .charAt(0) < 'e'
    val batch = Dedup.docContainment(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .filter(r => corpusSide(r._1) != corpusSide(r._2)).toSet
    assert(inc === batch)
    assert(inc.nonEmpty, "no cross-split containment pairs at sf0.001 — fixture rot")
    // both directions really occur (near-dup pairs straddling the split
    // emit a row each way; pure subset pairs emit only one)
    assert(inc.exists(r => inc.exists(x => x._1 == r._2 && x._2 == r._1)))
    // the index-path SEAM (r14 directive #7): an injected hermetic path
    // is where the index actually lands, and the probe result is
    // identical — Verify runs and long-lived sessions can own the slot
    val seam = java.nio.file.Files
      .createTempDirectory("graft_seam_test").toString + "/idx"
    val viaSeam = Dedup.containmentIncremental(spark, sf, Some(seam))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(viaSeam === inc)
    assert(new java.io.File(seam).exists, "index must land at the injected path")
  }

  test("doc_containment blocking is exhaustive-recall on the corpus (df cap drops nothing)") {
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", org.apache.spark.sql.functions.expr(
        """array_distinct(CASE WHEN size(split(text,' ')) >= 3
          |THEN transform(sequence(1, size(split(text,' '))-2),
          |     i -> concat_ws(' ', slice(split(text,' '), i, 3)))
          |ELSE array(text) END)""".stripMargin).as("s"))
    val a = docs.select($"doc_id".as("da"), $"s".as("sa"))
    val b = docs.select($"doc_id".as("db"), $"s".as("sb"))
    val brute = a.crossJoin(b).where($"da" =!= $"db")
      .select($"da", $"db",
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.array_intersect($"sa", $"sb"))
          .cast("long").as("i"),
        org.apache.spark.sql.functions.size($"sa").cast("long").as("na"))
      .where($"i" * 2 >= $"na")
      .as[(Long, Long, Long, Long)].collect().toSet
    val blocked = Dedup.docContainment(spark, sf)
      .select($"doc_a", $"doc_b", $"inter_size", $"n_a")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(blocked === brute)
    assert(brute.nonEmpty, "no containment pairs at sf0.001 -- fixture rot")
  }
}
