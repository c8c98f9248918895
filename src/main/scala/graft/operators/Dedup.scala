package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication over `documents(doc_id, text, lang, source, n_chars)` —
  * the LLM-data-pipeline dedup family: exact, MinHash-LSH near-dup (word
  * shingles), n-gram-Jaccard near-dup (char shingles), and SimHash.
  *
  * Scale design (the non-negotiable): candidate generation is ALWAYS
  * block-then-verify — docs meet only inside an equal LSH band bucket
  * (MinHash) or an equal 15-bit SimHash band (pigeonhole-exact for the
  * hamming radius), never via an all-pairs product. At 100 TB the band
  * explode is linear in corpus size, the bucket self-join shuffles on
  * (band, key) — high-cardinality, unskewed for natural text — and the
  * exact verify touches only candidate pairs. A plan test asserts no
  * CartesianProduct ever appears.
  *
  * Oracle design: outputs are integers (shingle intersection/union sizes,
  * hamming distances, md5 hex strings) and thresholds are applied by
  * integer cross-multiplication (J >= 3/5 as `5*i >= 3*u`), so the DuckDB
  * twins hash-match bit-for-bit — no float drift. The MinHash stage is a
  * pure pruner: the emitted pairs are exact-Jaccard-verified, and the
  * band parameters (documented per operator) put the miss probability for
  * the observed above-threshold pairs below 1e-7, so the LSH output
  * equals the oracle's all-pairs output on the test corpora — asserted
  * against a brute-force twin in DedupSpec. (The oracle may do all-pairs —
  * it runs at sf0.01; the engine side never does.)
  */
object Dedup {

  // ---------- shingling (identical fallback rule in the DuckDB twins) ----

  /** One (doc_id, sh) row per word-n-gram occurrence. Built WITHOUT
    * interpreted lambdas: explode an integer sequence of start positions,
    * then one codegen'd slice/concat per row — measured ~8x cheaper than a
    * `transform(...)` array build, which pays lambda-interpreter overhead
    * per shingle AND re-evaluates wherever projection collapse inlines it.
    * Shingles are a multiset (no pre-distinct: minhash is invariant under
    * duplicates and the verify stage's set ops distinct anyway). Docs
    * shorter than n units emit the whole text as one shingle —
    * `sequence(1, greatest(len-(n-1), 1))` is [1] and the window clamps,
    * exactly the DuckDB twins' CASE fallback. */
  private[operators] def wordShingleRowsFrom(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(expr(s"sequence(1, greatest(size(ws) - ${n - 1}, 1))")).as("i"))
      .select(col("doc_id"), expr(s"concat_ws(' ', slice(ws, i, $n))").as("sh"))

  private def wordShingleRows(s: SparkSession, d: String, n: Int): DataFrame =
    wordShingleRowsFrom(Tables.load(s, d, "documents"), n)

  /** One (doc_id, sh) row per character-n-gram occurrence (same design
    * and fallback as [[wordShingleRows]]). */
  private def charShingleRows(s: SparkSession, d: String, n: Int): DataFrame =
    Tables.load(s, d, "documents")
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(1, greatest(length(text) - ${n - 1}, 1))")).as("i"))
      .select(col("doc_id"), expr(s"substr(text, i, $n)").as("sh"))

  /** Per-doc shingle arrays for the exact-verify stage, rebuilt from the
    * exploded rows by a collect_set aggregation — the aggregation
    * exchange doubles as the materialization barrier, so the arrays are
    * built once per doc, never per candidate pair. collect_set (not
    * collect_list): the verify stage computes SET intersection/union, so
    * deduping at aggregation time shrinks the arrays every candidate
    * pair walks — identical inter/union sizes by construction. */
  private def shingleArrays(rows: DataFrame): DataFrame =
    rows.groupBy(col("doc_id")).agg(collect_set(col("sh")).as("shingles"))

  // ---------- MinHash-LSH ------------------------------------------------

  /** One row per (doc, band): key = hash of the band's minhash slice.
    *
    * The k per-shingle hash functions walk the shingle STRING only once:
    * `h1 = xxhash64(sh)` is the single variable-length hash, and
    * `h_j = xxhash64(h1, j)` derives the family by re-hashing the 8-byte
    * fingerprint — a fixed-width codegen'd long hash (a few multiplies)
    * instead of k full string traversals. String hashing dominates the
    * shingle explosion's cost (~1 row per corpus token/char), so this cuts
    * per-row hashing work ~k× (the double-hashing idea of Kirsch &
    * Mitzenmacher, with re-hash instead of an affine combine because ANSI
    * arithmetic traps the wrap-around multiply). The LSH stage is a pure
    * pruner (outputs are exact-verified), so the emitted pairs are
    * unchanged as long as recall holds — which DedupSpec asserts against
    * the brute-force twin.
    *
    * Each (doc, shingle) row feeds the codegen'd minhash columns with
    * map-side partial min-aggregation, so the shuffle carries one
    * signature row per doc per partition. The final
    * `repartition(band, key)` pins exactly the hash partitioning the
    * candidate self-join needs, so ONE reused exchange feeds both join
    * sides instead of computing the signatures twice. */
  private def bandKeys(shingleRows: DataFrame, rowsPerBand: Int,
                       numBands: Int): DataFrame = {
    val hashed = shingleRows.select(col("doc_id"), xxhash64(col("sh")).as("h1"))
    val mhCols = (0 until numBands * rowsPerBand).map(j =>
      min(xxhash64(col("h1"), lit(j))).as(s"mh$j"))
    val sigs = hashed.groupBy(col("doc_id")).agg(mhCols.head, mhCols.tail: _*)
    val bands = (0 until numBands).map { b =>
      val cs = (0 until rowsPerBand).map(i => col(s"mh${b * rowsPerBand + i}"))
      struct(lit(b).as("band"), xxhash64(cs: _*).as("key"))
    }
    sigs.select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      .repartition(col("band"), col("key"))
  }

  /** Row-local twin of [[wordShingleRows]]+[[bandKeys]]: one
    * (doc_id, shingles, band, key) row per (doc, band), with the ENTIRE
    * signature computed per row by array higher-order functions — no
    * aggregation, no shuffle — so it can run inside a streaming query
    * ahead of a stateful operator (graft.streaming.DocStreams uses it).
    * The hash construction is IDENTICAL to the batch path (xxhash64 of
    * the shingle, family derived by re-hashing the 8-byte fingerprint,
    * band key = xxhash64 of the band's minhash slice), so stream and
    * batch put every doc in the SAME buckets: candidate recall is the
    * same by construction, which is what the batch/stream parity test
    * asserts. Batch keeps the explode+partial-agg form because it is
    * measurably cheaper per shingle; per-row HOFs are the price of
    * shuffle-free streaming. */
  def bandedDocs(docs: DataFrame, n: Int, rowsPerBand: Int,
                 numBands: Int): DataFrame = {
    val shingled = docs
      .select(col("doc_id"), expr(
        s"""transform(sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 1)),
           |          i -> concat_ws(' ', slice(split(text, ' '), i, $n)))"""
          .stripMargin).as("shingles"))
      .withColumn("h1s", expr("transform(shingles, s -> xxhash64(s))"))
    val mhCols = (0 until numBands * rowsPerBand).map(j =>
      expr(s"array_min(transform(h1s, h -> xxhash64(h, $j)))").as(s"mh$j"))
    val sigs = shingled.select(col("doc_id") +: col("shingles") +: mhCols: _*)
    val bands = (0 until numBands).map { b =>
      val cs = (0 until rowsPerBand).map(i => col(s"mh${b * rowsPerBand + i}"))
      struct(lit(b).as("band"), xxhash64(cs: _*).as("key"))
    }
    sigs.select(col("doc_id"), col("shingles"),
        explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("shingles"),
        col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Docs sharing >= 1 band bucket. Equi-join on (band, key) — the shuffle
    * key is high-cardinality; never a cartesian. Both sides are the same
    * pre-partitioned plan; the SHUFFLE_HASH hint stops AQE from flipping
    * the join to broadcast at small scale, because a broadcast build
    * RECOMPUTES the whole signature pipeline for that side while the
    * shuffle join reuses the single repartition exchange for both sides
    * (measured: candidate stage 5.3s -> sub-second at sf0.1). At real
    * scale the side sizes rule out broadcast anyway — the hint just makes
    * the small-scale plan shape match the at-scale one. */
  private def candidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("key"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    a.hint("shuffle_hash").join(b, Seq("band", "key"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact-verify candidates: emit integer intersection/union sizes and
    * keep pairs with J >= num/den via integer cross-multiplication.
    * `arrays` comes from [[shingleArrays]], i.e. it is already
    * materialized behind its aggregation exchange — per-doc work stays
    * per-doc, never per candidate pair. */
  private def verifiedJaccard(cands: DataFrame, arrays: DataFrame,
                              num: Int, den: Int): DataFrame = {
    val mat = arrays
    cands
      .join(mat.select(col("doc_id").as("doc_a"), col("shingles").as("sa")), Seq("doc_a"))
      .join(mat.select(col("doc_id").as("doc_b"), col("shingles").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter_size"),
        size(array_union(col("sa"), col("sb"))).cast("long").as("union_size"))
      .where(col("inter_size") * den >= col("union_size") * num)
  }

  // ---------- public operators ------------------------------------------

  /** Exact dedup: hash-group on the CONTENT FINGERPRINT, keep the smallest
    * doc_id. Grouping on `md5(text)` (not `text`) means the shuffle
    * carries 16-byte keys instead of document bodies — at corpus scale
    * that is the difference between exchanging a fingerprint table and
    * exchanging the corpus. Identical result to grouping on the text
    * itself (md5 collisions are negligible at any practical corpus size,
    * and the oracle groups on the same fingerprint). */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash-LSH near-dup on word 3-gram shingles, J >= 0.6.
    * Band shape 16×2: at the 0.6 threshold a pair's per-band match
    * probability is 0.36, so 16 bands push the miss probability of a
    * just-above-threshold pair under 1e-3 and of the observed J>=0.85
    * pairs under 1e-9; the word-shingle background J (~0.05) keeps the
    * candidate volume tiny even with r=2. */
  /** The composable core over any (doc_id, text) frame — what the
    * property suite drives with planted near-duplicates. */
  def dedupNearFrom(docs: DataFrame): DataFrame = {
    val rows = wordShingleRowsFrom(docs, 3)
    verifiedJaccard(candidatePairs(bandKeys(rows, rowsPerBand = 2, numBands = 16)),
      shingleArrays(rows), num = 3, den = 5)
  }

  def dedupNear(s: SparkSession, d: String): DataFrame =
    dedupNearFrom(Tables.load(s, d, "documents"))

  /** Same LSH machinery on character 9-gram shingles, J >= 0.7 — catches
    * near-dups that word shingling misses (reflowed whitespace, small
    * in-word edits). 9-gram (not the classic 5) because blocking must be
    * SELECTIVE: on natural-ish text the background 5-gram Jaccard between
    * unrelated docs is ~0.17, which floods the band buckets (measured:
    * ~36% of ALL pairs became candidates — an accidental all-pairs); at
    * n=9 the background J is ~0.03 while true near-dups stay at J>=0.9,
    * so the band join prunes >99% of pairs and the verify stage only
    * touches real candidates. Band shape 16×3 (not 16×2): char-gram
    * background J is higher than word-gram, and r=2 still admitted ~150k
    * background candidates at sf0.1 (measured) whose set-intersection
    * verification dominated the runtime; r=3 cuts the background band
    * match probability to J³ (~3e-5) while 16 bands keep the miss
    * probability of the weakest observed true pair (J=0.83 at sf0.1)
    * near 1e-6. */
  def dedupNgram(s: SparkSession, d: String): DataFrame = {
    val rows = charShingleRows(s, d, 9)
    verifiedJaccard(candidatePairs(bandKeys(rows, rowsPerBand = 3, numBands = 16)),
      shingleArrays(rows), num = 7, den = 10)
  }

  /** 60-bit SimHash per document: each token occurrence votes ±1 per bit
    * position from its md5 bits; fingerprint bit j is set iff the vote sum
    * is positive. 60 bits (not 64) keeps the fingerprint inside a signed
    * BIGINT on both engines.
    *
    * Execution: one md5 per token occurrence, materialized by the explode
    * generator (so it is NOT inlined 60×); then 60 codegen'd
    * conditional-sum aggregates with map-side partial aggregation — the
    * shuffle carries only (doc_id, 60 longs) per doc per partition. */
  def simhashFingerprints(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.load(s, d, "documents")
      .select(col("doc_id"),
        explode(expr("transform(split(text, ' '), w -> md5(w))")).as("h"))
    val voteCols = (0 until 60).map { j =>
      val digit = s"CAST(conv(substr(h, ${j / 4 + 1}, 1), 16, 10) AS INT)"
      sum(expr(s"IF((shiftright($digit, ${3 - j % 4}) & 1) = 1, 1, -1)")).as(s"v$j")
    }
    val votes = tok.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
    val fp = (0 until 60).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    votes.select(col("doc_id"), fp.as("simhash"))
  }

  /** Near-dup pairs at hamming distance <= 3 over the SimHash fingerprints.
    * Blocking: 4 bands of 15 bits — a pair within radius 3 differs in at
    * most 3 bands, so it MUST agree exactly on >= 1 band (pigeonhole): the
    * band join is a lossless pruner, not a heuristic. */
  def simhashPairs(s: SparkSession, d: String): DataFrame = {
    // explode generator = materialization barrier (fingerprint computed
    // once per doc); repartition = the one exchange both join sides reuse.
    val banded = simhashFingerprints(s, d)
      .select(col("doc_id"), col("simhash"), explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, shiftright(simhash, 15 * b) & 32767 AS key))")).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
      .repartition(col("band"), col("key"))
    val a = banded.select(col("band"), col("key"), col("doc_id").as("doc_a"), col("simhash").as("ha"))
    val b = banded.select(col("band"), col("key"), col("doc_id").as("doc_b"), col("simhash").as("hb"))
    a.join(b, Seq("band", "key")).where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), expr("CAST(bit_count(ha ^ hb) AS INT)").as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
  }

  /** Transitive duplicate clusters: connected components over the
    * verified near-dup pairs, label = smallest doc_id reachable (the doc
    * a keep-one-per-cluster policy keeps). Iterative min-label
    * propagation with a POINTER-DOUBLING shortcut — each round every node
    * takes the min of (its label, its neighbors' labels, its label's
    * label), so convergence is O(log diameter) rounds, not O(diameter):
    * a chained-near-dup component of diameter 1000 converges in ~10
    * rounds instead of blowing the round cap. If the cap is still hit the
    * operator FAILS LOUDLY rather than silently returning partial labels
    * (the convergence check makes a wrong-but-plausible answer
    * impossible). Integer fixpoint ⇒ exactly reproducible in the DuckDB
    * twin's recursive CTE, so this iterative operator IS oracled, unlike
    * float fixpoints. Singleton docs keep their own id as cluster_id. */
  def dedupClusters(s: SparkSession, d: String, maxRounds: Int = 20): DataFrame = {
    val pairs = dedupNear(s, d).select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    val und = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // Propagate ONLY over nodes that appear in some pair: every other doc
    // is a singleton by definition and must not ride through the loop —
    // at corpus scale the pair graph is orders of magnitude smaller than
    // the corpus, so each round shuffles near-dup members, not 100 TB.
    var labels = und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val msgs = und.join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      val folded = labels.select(col("id"), col("label")).union(msgs)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
      // shortcut hop: labels are themselves node ids, so one self-join
      // compresses label -> label(label); halves the remaining distance
      // to the component minimum every round
      val byId = folded.select(col("id").as("lid"), col("label").as("l2"))
      val next = folded.join(byId, folded("label") === col("lid"), "left_outer")
        .select(folded("id"),
          least(folded("label"), coalesce(col("l2"), folded("label"))).as("label"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .where(col("label") =!= col("old")).count()
      labels = next
      converged = changed == 0
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"dedupClusters did not converge in $maxRounds rounds — component " +
          "diameter exceeds 2^rounds; raise maxRounds")
    // singletons join their identity label back in one outer pass
    Tables.load(s, d, "documents")
      .select(col("doc_id"))
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
  }

  // ---------- DuckDB twins ----------------------------------------------

  private val wordShinglesCte: String =
    """WITH sh AS (
      |  SELECT doc_id, CASE WHEN len(ws) >= 3
      |    THEN list_distinct([array_to_string(ws[i:i+2], ' ') FOR i IN range(1, len(ws)-1)])
      |    ELSE [text] END AS s
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents))""".stripMargin

  private val charShinglesCte: String =
    """WITH sh AS (
      |  SELECT doc_id, CASE WHEN len(text) >= 9
      |    THEN list_distinct([text[i:i+8] FOR i IN range(1, len(text)-7)])
      |    ELSE [text] END AS s
      |  FROM documents)""".stripMargin

  private def jaccardPairsSql(cte: String, num: Int, den: Int): String =
    s"""$cte
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       len(list_intersect(a.s, b.s)) AS inter_size,
       |       len(list_distinct(a.s || b.s)) AS union_size
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE len(list_intersect(a.s, b.s)) * $den >= len(list_distinct(a.s || b.s)) * $num
       |ORDER BY doc_a, doc_b""".stripMargin

  private val simhashCte: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |bits AS (
      |  SELECT doc_id, j,
      |    CASE WHEN ((strpos('0123456789abcdef', substr(md5(w), (j // 4) + 1, 1)) - 1)
      |               >> (3 - (j % 4))) & 1 = 1 THEN 1 ELSE -1 END AS c
      |  FROM tok, (SELECT unnest(range(0, 60)) AS j) r),
      |votes AS (SELECT doc_id, j, sum(c) AS v FROM bits GROUP BY 1, 2),
      |simhash AS (
      |  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
      |  FROM votes GROUP BY doc_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_near" -> (dedupNear _),
    "dedup_clusters" -> ((s, d) => dedupClusters(s, d)),
    "dedup_ngram" -> (dedupNgram _),
    "simhash_fingerprints" -> (simhashFingerprints _),
    "simhash_pairs" -> (simhashPairs _)
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY text_md5""".stripMargin,
    "dedup_near" -> jaccardPairsSql(wordShinglesCte, 3, 5),
    "dedup_clusters" ->
      s"""${wordShinglesCte.replaceFirst("WITH sh", "WITH RECURSIVE sh")},
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.s, b.s)) * 5 >= len(list_distinct(a.s || b.s)) * 3),
         |und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |        UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (
         |  SELECT a, b FROM und
         |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
         |SELECT d.doc_id,
         |       least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
         |FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
         |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    "dedup_ngram" -> jaccardPairsSql(charShinglesCte, 7, 10),
    "simhash_fingerprints" ->
      s"""$simhashCte
         |SELECT doc_id, simhash FROM simhash ORDER BY doc_id""".stripMargin,
    "simhash_pairs" ->
      s"""$simhashCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM simhash a JOIN simhash b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
  )

  val verifyOrder: Map[String, Seq[Column]] = Map(
    "dedup_exact" -> Seq(col("text_md5")),
    "dedup_near" -> Seq(col("doc_a"), col("doc_b")),
    "dedup_clusters" -> Seq(col("doc_id")),
    "dedup_ngram" -> Seq(col("doc_a"), col("doc_b")),
    "simhash_fingerprints" -> Seq(col("doc_id")),
    "simhash_pairs" -> Seq(col("doc_a"), col("doc_b"))
  )
}
