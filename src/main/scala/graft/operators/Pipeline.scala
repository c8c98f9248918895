package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** End-to-end training-data assembly operators — the steps that turn a
  * cleaned corpus into training input: deterministic splits, applying
  * dedup decisions, and packing documents into token-budget batches.
  * Everything is content/key-hash deterministic (no RNG state), so
  * pipelines are reproducible run-to-run and engine-to-engine — the same
  * reason the DuckDB twins can hash-match these operators exactly.
  */
object Pipeline {

  /** Deterministic train/holdout assignment from a key hash (md5 leading
    * hex digit < 'e' ⇒ train, 14/16 = 87.5%). Hash-based — not RNG-based —
    * so membership is stable under reruns, repartitioning, and engine
    * changes, and any record's split is computable in isolation. */
  def sampleSplit(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(col("doc_id"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1) < "e", "train")
          .otherwise("holdout").as("split"))

  val sampleSplitSql: String =
    """SELECT doc_id,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
      |       THEN 'train' ELSE 'holdout' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Stratified downsampling: rebalance the corpus so every language
    * contributes (approximately) the minority language's document count —
    * the domain-mixing step an LLM pipeline runs to control per-language /
    * per-source weights. Membership is hash-thresholded, not RNG-sampled:
    * per-stratum keep-fraction f = min_n/n_lang becomes a 5-hex-digit
    * threshold `%05x` of floor(f·65536), and a doc survives iff
    * '0'+md5(doc_id)[0..4) < threshold (equal-length strings, so the
    * lexicographic compare IS the numeric compare; f=1 yields '10000',
    * above every '0xxxx' key — the minority stratum keeps everything).
    * Deterministic per-record, stable under reruns and repartitioning.
    * Shape: one tiny per-lang count aggregate broadcast back onto the
    * scan (strata counts are bounded by #langs × #sources, never corpus-
    * sized), then a per-row filter — one scan, no corpus shuffle. */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val all = Tables.load(s, d, "documents")
    val counts = all.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val minc = counts.agg(min(col("n_lang")).as("min_n"))
    val thresholds = counts.crossJoin(broadcast(minc))
      .select(col("lang"),
        format_string("%05x", expr("(min_n * 65536) div n_lang")).as("thresh"))
    all.join(broadcast(thresholds), Seq("lang"))
      .where(concat(lit("0"),
        substring(md5(col("doc_id").cast("string")), 1, 4)) < col("thresh"))
      .select(col("doc_id"), col("lang"), col("source"))
  }

  val sampleStratifiedSql: String =
    """WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
      |m AS (SELECT min(n_lang) AS min_n FROM c),
      |t AS (SELECT lang, printf('%05x', (min_n * 65536) // n_lang) AS thresh
      |      FROM c, m)
      |SELECT d.doc_id, d.lang, d.source
      |FROM documents d JOIN t USING (lang)
      |WHERE '0' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < t.thresh
      |ORDER BY d.doc_id""".stripMargin

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * per-language top-k documents by priority −ln(u)/w, where w is the
    * document's token count and u ∈ (0,1) — the textbook weighted
    * reservoir, which a data-recipe pipeline uses to draw a
    * token-mass-proportional subset (long documents proportionally more
    * likely) for inspection sets, eval carve-outs, or seed corpora.
    * Deterministic, not RNG-sampled: u derives from md5(doc_id)'s leading
    * 15 hex digits ((v + 0.5) / 2^60, strictly inside (0,1)), so
    * membership is stable under reruns, repartitioning, and engines —
    * DuckDB reproduces the exact draw via CAST('0x…' AS UBIGINT). Both
    * engines parse the same decimal/hex into the same nearest-double,
    * divide by an exact power of two, and take libm ln; the priority is
    * rounded to 6 decimals (the [[graft.operators.Citations]] pageRank
    * float-oracle precedent) with doc_id tie-break, so the cross-engine
    * compare is on a shared grid.
    *
    * Scale shape: per-row projection, then ONE hash exchange on lang and
    * a per-partition top-k — Spark plans the rank-filter as
    * WindowGroupLimit, so each map task forwards only its local top-k
    * per language, never the corpus. */
  def sampleWeighted(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    val prio = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("weight"))
      .withColumn("u",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("double") + lit(0.5)) / lit(1152921504606846976.0)) // 2^60
      .withColumn("priority", round(-log(col("u")) / col("weight"), 6))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("priority").asc, col("doc_id").asc)
    prio.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("lang"), col("doc_id"), col("weight"), col("priority"),
        col("rank"))
  }

  val sampleWeightedSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
      |    (CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
      |          AS UBIGINT) AS DOUBLE) + 0.5)
      |      / 1152921504606846976.0 AS u
      |  FROM documents),
      |p AS (
      |  SELECT lang, doc_id, weight,
      |         round(-ln(u) / weight, 6) AS priority
      |  FROM t),
      |r AS (
      |  SELECT lang, doc_id, weight, priority,
      |    CAST(row_number() OVER (PARTITION BY lang
      |                            ORDER BY priority, doc_id) AS INT) AS rank
      |  FROM p)
      |SELECT lang, doc_id, weight, priority, rank FROM r
      |WHERE rank <= 20 ORDER BY lang, rank""".stripMargin

  /** Apply near-dup decisions: drop every doc that appears as the LARGER
    * id of a verified near-dup pair (keep-smallest-id policy), via an
    * anti-join against the Dedup.dedupNear output — the composition step
    * a real pipeline runs after candidate verification. */
  def documentsDeduped(s: SparkSession, d: String): DataFrame = {
    val victims = Dedup.dedupNear(s, d).select(col("doc_b").as("doc_id")).distinct()
    Tables.load(s, d, "documents")
      .join(victims, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  val documentsDedupedSql: String =
    """WITH sh AS (
      |  SELECT doc_id, CASE WHEN len(ws) >= 3
      |    THEN list_distinct([array_to_string(ws[i:i+2], ' ') FOR i IN range(1, len(ws)-1)])
      |    ELSE [text] END AS s
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)),
      |victims AS (
      |  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.s, b.s)) * 5 >= len(list_distinct(a.s || b.s)) * 3)
      |SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE doc_id NOT IN (SELECT doc_id FROM victims)
      |ORDER BY doc_id""".stripMargin

  /** The whole cleaning pipeline as ONE Catalyst plan: PII redaction →
    * exact dedup (keep-smallest-id per content hash) → quality gate
    * (textQuality's token-count and type-token-ratio bounds) → hash
    * train/holdout split, emitting the training manifest (doc_id, lang,
    * n_tokens, split). The point is composition: each stage is the same
    * logic as its standalone operator, chained as DataFrames so Catalyst
    * sees ONE tree — the scan is shared, the redaction projection fuses
    * into the dedup's hash, and no stage materializes an intermediate.
    * Scale shape: one shuffle for the dedup group (16-byte md5 keys, not
    * bodies), one semi-join shuffle to apply it; quality + split are
    * per-row. */
  /** The STATELESS pipeline stages — PII redaction, quality gate, hash
    * split — as one per-row transform over any (doc_id, lang, text)
    * frame, emitting the content hash of the REDACTED text alongside the
    * manifest columns. Pure projections and filters, so the identical
    * code runs in batch ([[pipelineE2e]]) and inside a streaming query
    * ([[graft.streaming.DocStreams.cleanStream]]) — batch/stream parity
    * is by construction, and asserted in DocStreamsSpec. */
  def cleanStages(input: DataFrame): DataFrame =
    TextAnalysis.piiRedactStaged(
        input.select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang"),
        col(s"t${TextAnalysis.PiiPatterns.size}").as("t"))
      .select(col("doc_id"), col("lang"), md5(col("t")).as("text_md5"),
        split(col("t"), " ").as("ws"))
      .select(col("doc_id"), col("lang"), col("text_md5"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct"))
      .where(col("n_tokens") >= 20 && col("n_tokens") <= 1000 &&
        col("n_distinct") * 4 >= col("n_tokens"))
      .select(col("doc_id"), col("lang"), col("text_md5"), col("n_tokens"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1) < "e", "train")
          .otherwise("holdout").as("split"))

  def pipelineE2e(s: SparkSession, d: String): DataFrame = {
    // quality is content-determined, so every member of a content group
    // passes or fails together — deduping after the gate keeps exactly
    // the same survivors as deduping before it. The min-id representative
    // is selected by ONE row_number window over the content hash (single
    // shuffle, single evaluation of the redaction subtree) rather than a
    // group-then-semi-join, which would evaluate the stages twice and
    // shuffle twice.
    val w = Window.partitionBy(col("text_md5")).orderBy(col("doc_id").asc)
    cleanStages(Tables.load(s, d, "documents"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("split"))
  }

  val pipelineE2eSql: String = {
    val Seq((email, eTag), (ip, ipTag), (phone, phTag)) = TextAnalysis.PiiPatterns
    s"""WITH red AS (
       |  SELECT doc_id, lang,
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '$email', '$eTag', 'g'), '$ip', '$ipTag', 'g'),
       |      '$phone', '$phTag', 'g') AS t
       |  FROM documents),
       |keep AS (SELECT min(doc_id) AS doc_id FROM red GROUP BY md5(t)),
       |q AS (
       |  SELECT doc_id, lang,
       |         CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens,
       |         CAST(len(list_distinct(string_split(t, ' '))) AS BIGINT) AS n_distinct
       |  FROM red WHERE doc_id IN (SELECT doc_id FROM keep))
       |SELECT doc_id, lang, n_tokens,
       |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
       |       THEN 'train' ELSE 'holdout' END AS split
       |FROM q
       |WHERE n_tokens BETWEEN 20 AND 1000 AND n_distinct * 4 >= n_tokens
       |ORDER BY doc_id""".stripMargin
  }

  /** Weighted domain mixing with UPSAMPLING — the data-recipe step that
    * sets per-source epoch multiplicity (a source with weight 2.5 is seen
    * 2.5× per training epoch). Each doc emits `floor(w)` copies plus one
    * more iff its hash-fraction falls under `frac(w)` — so a source's
    * emitted row count is within 1 doc-hash quantum of `w · n_source`,
    * and WHICH docs get the extra epoch is content-hash-deterministic
    * (stable under reruns, repartitioning, engines), not RNG-sampled.
    * The fractional test reuses [[sampleStratified]]'s equal-length-hex
    * compare: threshold = %04x of floor(frac(w)·65536), survive iff
    * md5(doc_id)[0..4) < threshold. Weights here derive from the source
    * number (1.0/1.5/2.0/2.5 cycling) so every branch — integer weight,
    * fractional weight, no-extra-copy — is exercised and oracled.
    * Shape: per-row projection + explode of a ≤3-element sequence; no
    * shuffle, no stratum table (the weight is computable per record). */
  def mixEpochs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"),
        (lit(1.0) + (substring(col("source"), 4, 10).cast("int") % 4)
          .cast("double") * 0.5).as("w"))
      .select(col("doc_id"), col("source"),
        floor(col("w")).cast("int").as("base"),
        format_string("%04x",
          floor((col("w") - floor(col("w"))) * 65536).cast("int")).as("thresh"))
      .select(col("doc_id"), col("source"),
        (col("base") +
          when(substring(md5(col("doc_id").cast("string")), 1, 4)
            < col("thresh"), 1).otherwise(0)).as("n_copies"))
      .select(col("doc_id"), col("source"),
        explode(expr("sequence(1, n_copies)")).as("epoch"))

  val mixEpochsSql: String =
    """WITH w AS (
      |  SELECT doc_id, source,
      |    CAST(1 AS DOUBLE)
      |      + (CAST(substr(source, 4) AS INT) % 4) * CAST(0.5 AS DOUBLE) AS w
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, source,
      |    CAST(floor(w) AS INT)
      |    + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
      |             < printf('%04x', CAST(floor((w - floor(w)) * 65536) AS INT))
      |           THEN 1 ELSE 0 END AS n_copies
      |  FROM w)
      |SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS INT) AS epoch
      |FROM n ORDER BY doc_id, epoch""".stripMargin

  /** Temperature-scaled language mixing — the other standard data-recipe
    * knob next to [[mixEpochs]]' fixed per-source weights: sampling
    * probability q_l ∝ n_l^α (α = 0.5 default), the exponentiated
    * smoothing used by multilingual pretraining recipes to lift
    * low-resource languages without letting the head language dominate.
    * Per-doc epoch multiplicity m_l = N·n_l^(α-1) / Σ_t n_t^α, so one
    * epoch still draws ~N documents: head languages get m < 1
    * (hash-thresholded downsampling — docs with 0 copies drop out),
    * tail languages m > 1 (upsampled copies). Multiplicity is realized
    * exactly like mixEpochs: floor(m) copies plus one more iff
    * md5(doc_id)[0..4) falls under frac(m)'s %04x threshold —
    * content-hash-deterministic, stable under reruns and engines.
    *
    * m is rounded to 6 decimals BEFORE thresholding on both engines:
    * the Σ n^α term is a float sum whose addition order differs between
    * Spark and DuckDB, and the rounding grid absorbs that ~1-ulp noise
    * the same way pageRank's round(rank, 8) does — the %04x threshold
    * then quantizes identically.
    *
    * Scale shape: one #langs-row aggregate → 1-row Σ reduction →
    * broadcast multiplicity table back onto the scan; the per-row work
    * is a hash compare and a ≤⌈m⌉-element explode. One scan, no corpus
    * shuffle — the same shape sampleStratified plans. */
  def mixTemperature(s: SparkSession, d: String, alpha: Double = 0.5): DataFrame = {
    val docs = Tables.load(s, d, "documents").select(col("doc_id"), col("lang"))
    // explicit isNotNull below the strata aggregate: the multiplicity
    // join infers it on one copy of the subtree only, which would stop
    // the two strata scans (per-lang counts; Σ reduction) canonicalizing
    // equal — with the pin, ReuseExchange computes the aggregate once
    // (the corpus_shuffle trick, see there)
    val strata = docs.where(col("lang").isNotNull)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val tot = strata.agg(
      sum(pow(col("n_lang"), lit(alpha))).as("z"),
      sum(col("n_lang")).as("n_total"))
    val mult = strata.crossJoin(broadcast(tot))
      .select(col("lang"),
        round(col("n_total") * pow(col("n_lang"), lit(alpha - 1)) / col("z"), 6)
          .as("m"))
    docs.join(broadcast(mult), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        // explicit floor() before the int cast ON BOTH ENGINES: Spark's
        // CAST(double AS int) truncates but DuckDB's rounds-to-nearest,
        // so a bare cast diverges by 1 on any fractional product (and a
        // frac near 1 would round to 65536, whose '%04x' is the 5-char
        // '10000' that breaks the equal-length hex compare). floor is
        // IEEE-identical everywhere.
        (floor(col("m")).cast("int") +
          when(substring(md5(col("doc_id").cast("string")), 1, 4)
            < format_string("%04x",
              floor((col("m") - floor(col("m"))) * 65536).cast("int")), 1)
            .otherwise(0)).as("n_copies"))
      // unlike DuckDB's generate_series, Spark's sequence(1, 0) yields a
      // DESCENDING [1, 0] — drop the 0-copy docs before exploding
      .where(col("n_copies") >= 1)
      .select(col("doc_id"), col("lang"),
        explode(expr("sequence(1, n_copies)")).as("epoch"))
  }

  val mixTemperatureSql: String =
    """WITH c AS (SELECT lang, count(*) AS n_lang FROM documents
      |           WHERE lang IS NOT NULL GROUP BY 1),
      |t AS (SELECT sum(pow(n_lang, 0.5)) AS z, sum(n_lang) AS n_total FROM c),
      |m AS (SELECT lang, round(n_total * pow(n_lang, -0.5) / z, 6) AS m
      |      FROM c, t),
      |n AS (
      |  SELECT d.doc_id, d.lang,
      |    CAST(floor(m.m) AS INT)
      |    + CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
      |             < printf('%04x', CAST(floor((m.m - floor(m.m)) * 65536) AS INT))
      |           THEN 1 ELSE 0 END AS n_copies
      |  FROM documents d JOIN m USING (lang))
      |SELECT doc_id, lang,
      |       CAST(unnest(generate_series(1, n_copies)) AS INT) AS epoch
      |FROM n ORDER BY doc_id, epoch""".stripMargin

  /** `mix_quota` (oracled): largest-remainder (Hamilton) apportionment of
    * a fixed token budget across languages — the integer allocation step
    * a data-mix recipe runs after [[mixTemperature]] picks the REAL
    * proportions: every language gets floor(B·n/T) tokens, and the
    * leftover B − Σfloor seats go to the largest fractional remainders
    * (ties → lang asc, the O11 rule). Hamilton is the unique rule that
    * never violates quota (each alloc is its ideal share floored or
    * ceiled) and Σalloc = B EXACTLY — the invariant the spec asserts.
    *
    * Determinism: PURE integer arithmetic end to end — B·n is exact
    * BIGINT (documented bound: B·T < 2^63), floor via integer division,
    * remainder via mod — so both engines agree bit-for-bit with no float
    * anywhere (unlike divisor methods, which need float priorities).
    *
    * Scale shape: the corpus collapses to ≤|langs| rows in ONE
    * partial-aggregable token-count exchange; every window after that
    * runs on the ≤|langs|-row frame (the doc_length_histogram bounded-
    * domain shape).
    *
    * The budget is a single shared constant interpolated into BOTH the
    * Spark plan and the DuckDB twin ([[mixQuotaSql]]) so the two can
    * never diverge (a per-call parameter would let a caller shift the
    * Spark side while the registered oracle silently kept the default). */
  val MixQuotaBudget: Long = 1000000L
  def mixQuota(s: SparkSession, d: String): DataFrame = {
    val budget = MixQuotaBudget
    val toks = Tables.load(s, d, "documents").where(col("lang").isNotNull)
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val all = Window.partitionBy()
    val q = toks.withColumn("t_total", sum(col("n_tokens")).over(all))
      .select(col("lang"), col("n_tokens"),
        expr(s"($budget * n_tokens) div t_total").as("fl"),
        expr(s"($budget * n_tokens) % t_total").as("rem"))
    q.withColumn("leftover", lit(budget) - sum(col("fl")).over(all))
      .withColumn("rk", row_number().over(
        Window.partitionBy().orderBy(col("rem").desc, col("lang").asc)))
      .select(col("lang"), col("n_tokens"),
        (col("fl") + when(col("rk") <= col("leftover"), lit(1L))
          .otherwise(lit(0L))).as("alloc"))
  }

  val mixQuotaSql: String =
    s"""WITH c AS (
      |  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
      |           AS n_tokens
      |  FROM documents WHERE lang IS NOT NULL GROUP BY 1),
      |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_total FROM c),
      |q AS (
      |  SELECT lang, n_tokens,
      |         CAST(($MixQuotaBudget * n_tokens) // t_total AS BIGINT) AS fl,
      |         CAST(($MixQuotaBudget * n_tokens) % t_total AS BIGINT) AS rem
      |  FROM c, t),
      |r AS (
      |  SELECT lang, n_tokens, fl,
      |         $MixQuotaBudget - sum(fl) OVER () AS leftover,
      |         row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk
      |  FROM q)
      |SELECT lang, n_tokens,
      |       CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
      |         AS alloc
      |FROM r ORDER BY lang""".stripMargin

  /** Deterministic global training order (the corpus shuffle every epoch
    * needs), WITHOUT the single-partition global window: the shuffle key
    * is md5(seed:doc_id), its first `bucketHexChars` hex digits are a
    * bucket, and the global ordinal is (bucket offset) + (within-bucket
    * rank) — exact, because the bucket is a PREFIX of the sort key, so
    * ordering by (bucket, rest) is ordering by the key. The within-bucket
    * row_number windows run in parallel across 16^bucketHexChars
    * hash-balanced buckets; the offset table is a 16^bucketHexChars-row
    * aggregate (its ordering window is bounded by construction)
    * broadcast back. Changing `seed` reshuffles; the same seed reproduces
    * the identical order on any engine.
    *
    * `bucketHexChars` is the parallelism knob, and the prefix property
    * makes it FREE: the emitted ordinals are IDENTICAL for every value
    * (PipelineSpec asserts k=3 == k=2 == the direct global window), so
    * at 100 TB you raise it (k=4 ⇒ 65536 buckets of ~corpus/65536 rows
    * each; offset table still broadcast-sized) without touching results
    * — no re-oracle, no semantic change, just smaller window tasks. */
  def corpusShuffle(s: SparkSession, d: String, seed: String = "epoch0",
                    bucketHexChars: Int = 2): DataFrame = {
    // the explicit repartition pins ONE exchange that BOTH consumers
    // below (the bucket-count aggregate and the within-bucket window)
    // read from — ReuseExchange dedupes the identical subtrees, so the
    // corpus is scanned and md5-keyed ONCE (r6 verdict: without the pin,
    // the offsets branch re-derived the scan — a 2× I/O tax at 100 TB).
    // Same pattern as coCitationTopk's pinned self-join exchange. Two
    // details make the canonical plans actually match (without them, the
    // optimizer specializes each branch's copy of the subtree and the
    // exchanges stop being equal): the explicit isNotNull sits below the
    // exchange on BOTH branches (the join would otherwise infer it on
    // the window branch only — the offsets branch's inferred copy is
    // blocked above the unpartitioned offset window), and the offsets
    // count is taken over coalesce(skey, cast(doc_id)) — exactly
    // count(*) on this frame (the filter below already dropped null
    // keys), but statically nullable, so the count-elimination rewrite
    // can't reduce it to count(1) and column pruning keeps the offsets
    // branch requiring the SAME columns the window branch does.
    val keyed = Tables.load(s, d, "documents")
      .select(col("doc_id"),
        md5(concat(lit(seed), lit(":"), col("doc_id").cast("string"))).as("skey"))
      .withColumn("bucket", substring(col("skey"), 1, bucketHexChars))
      .where(col("bucket").isNotNull)
      .repartition(col("bucket"))
    val wOff = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("bucket"))
      .agg(count(coalesce(col("skey"), col("doc_id").cast("string"))).as("n"))
      .withColumn("offset", coalesce(sum(col("n")).over(wOff), lit(0L)))
      .select(col("bucket"), col("offset"))
    val wRank = Window.partitionBy(col("bucket"))
      .orderBy(col("skey"), col("doc_id"))
    keyed.withColumn("r", row_number().over(wRank))
      .join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"),
        (col("offset") + col("r")).cast("long").as("shuffle_pos"))
  }

  val corpusShuffleSql: String =
    """SELECT doc_id,
      |  CAST(row_number() OVER (
      |    ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
      |    AS shuffle_pos
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Sequence packing: assign documents to token-budget batches
    * (cumulative token count within a shard, batch = cum_before div
    * budget). Packing is SHARDED on purpose: a single global running sum
    * would serialize the whole corpus through one partition, while
    * per-shard packing is embarrassingly parallel and is how real
    * pipelines pack (per input shard/file).
    *
    * The shard count is SCALE-ADAPTIVE, not a literal: n_shards =
    * max(8, ceil(total_tokens / targetShardTokens)), the same treatment
    * [[Similarity]]'s numCentroids knob got — a fixed shard count would
    * mean each window partition running-sums corpus/8 tokens at 100 TB
    * (serialized, spill-heavy), while the target-tokens knob keeps every
    * shard's running sum at ~targetShardTokens regardless of corpus size
    * (~6M shards at 25T tokens, each a small independent task). The count
    * derives from one column-pruned aggregate broadcast back onto the
    * scan, so shard assignment stays doc_id-deterministic given the
    * corpus: same docs ⇒ same n_shards ⇒ same shards, on any engine —
    * the DuckDB twin computes the identical scalar. */
  def packBatches(s: SparkSession, d: String, budget: Int = 2000,
                  targetShardTokens: Long = 4L * 1024 * 1024): DataFrame = {
    val toks = Tables.load(s, d, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val nShards = broadcast(toks.agg(
      greatest(lit(8L),
        ceil(sum(col("n_tokens")) / lit(targetShardTokens.toDouble)))
        .as("n_shards")))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.crossJoin(nShards)
      .select(col("doc_id"),
        (col("doc_id") % col("n_shards")).cast("int").as("shard"),
        col("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"cum_before div $budget").as("batch_id"))
  }

  val packBatchesSql: String =
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |p AS (SELECT greatest(8, CAST(ceil(sum(n_tokens) / 4194304.0) AS BIGINT))
      |        AS n_shards FROM t)
      |SELECT doc_id, shard, n_tokens,
      |       CAST(cum_before // 2000 AS BIGINT) AS batch_id FROM (
      |  SELECT doc_id, shard, n_tokens,
      |         coalesce(sum(n_tokens) OVER (
      |           PARTITION BY shard ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM (
      |    SELECT doc_id, CAST(doc_id % (SELECT n_shards FROM p) AS INT) AS shard,
      |           n_tokens
      |    FROM t))
      |ORDER BY doc_id""".stripMargin

  /** The full pretraining-manifest assembly — [[mixEpochs]] →
    * [[corpusShuffle]] → [[packBatches]] — composed as ONE Catalyst tree,
    * the way [[pipelineE2e]] composes the cleaning stages. A user wants
    * the chained manifest as one query: per-source epoch multiplicity,
    * then a seeded global training order over the (doc, epoch) instances,
    * then token-budget batch packing along that order.
    *
    * Composition is where the plan wins: the mix stage is a per-row
    * projection + a ≤3-element explode fused straight onto the scan (no
    * join back to `documents` — n_tokens rides the same row), and the
    * shuffle and pack stages share ONE exchange+sort: both windows
    * (`row_number` for the global ordinal, the running token sum for
    * packing) are defined over the identical (shard, skey-order) spec, so
    * Catalyst evaluates them in a single Window operator over a single
    * sort — packing rides the shuffle stage's partitioning for free.
    * The shard here IS the shuffle bucket (a prefix of the sort key, so
    * per-shard order is a contiguous slice of the seeded global order):
    * 16^bucketHexChars hash-balanced buckets whose offsets come from a
    * broadcast aggregate of that many rows, exactly [[corpusShuffle]]'s
    * shape — and like there, `bucketHexChars` is the 100-TB parallelism
    * knob: shuffle_pos is INVARIANT to it (prefix property), while the
    * shard/batch labels legitimately refine with it (packing granularity,
    * like [[packBatches]]' target). Everything is md5-deterministic —
    * same corpus + seed ⇒ the same manifest on any engine, which is what
    * lets DuckDB hash-match a "shuffled" corpus. */
  def pretrainManifest(s: SparkSession, d: String, seed: String = "epoch0",
                       budget: Int = 2000, bucketHexChars: Int = 2): DataFrame = {
    // stage 1: mix — mixEpochs' weight arithmetic verbatim, carrying
    // n_tokens so pack needs no second scan
    val mixed = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        (lit(1.0) + (substring(col("source"), 4, 10).cast("int") % 4)
          .cast("double") * 0.5).as("w"))
      .select(col("doc_id"), col("n_tokens"),
        (floor(col("w")).cast("int") +
          when(substring(md5(col("doc_id").cast("string")), 1, 4)
            < format_string("%04x",
              floor((col("w") - floor(col("w"))) * 65536).cast("int")), 1)
            .otherwise(0)).as("n_copies"))
      .select(col("doc_id"), col("n_tokens"),
        explode(expr("sequence(1, n_copies)")).as("epoch"))
    // stage 2: shuffle — the (doc, epoch) instance is the shuffled unit,
    // so the key covers both; bucket = first byte of the key
    // pin ONE exchange on the keyed frame (the corpusShuffle pattern,
    // incl. its isNotNull / count-over-struct canonicalization details —
    // see there): ReuseExchange feeds both the offsets aggregate and the
    // fused ordinal/packing window from the same shuffle files, so the
    // scan + mix/explode subtree is evaluated ONCE instead of twice.
    val keyed = mixed
      .withColumn("skey", md5(concat(lit(seed), lit(":"),
        col("doc_id").cast("string"), lit(":"), col("epoch").cast("string"))))
      .withColumn("shard", substring(col("skey"), 1, bucketHexChars))
      .where(col("shard").isNotNull)
      .repartition(col("shard"))
    val wOff = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("shard"))
      .agg(count(coalesce(col("skey"),
        concat(col("doc_id").cast("string"), col("n_tokens").cast("string"),
          col("epoch").cast("string")))).as("n"))
      .withColumn("offset", coalesce(sum(col("n")).over(wOff), lit(0L)))
      .select(col("shard"), col("offset"))
    // stages 2+3 share this spec: one exchange, one sort, one Window op
    val wRank = Window.partitionBy(col("shard"))
      .orderBy(col("skey"), col("doc_id"), col("epoch"))
    val wCum = wRank.rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .withColumn("r", row_number().over(wRank))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(wCum), lit(0L)))
      .join(broadcast(offsets), Seq("shard"))
      .select(col("doc_id"), col("epoch"), col("shard"),
        (col("offset") + col("r")).cast("long").as("shuffle_pos"),
        col("n_tokens"),
        expr(s"cum_before div $budget").as("batch_id"))
  }

  val pretrainManifestSql: String =
    """WITH w AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(1 AS DOUBLE)
      |      + (CAST(substr(source, 4) AS INT) % 4) * CAST(0.5 AS DOUBLE) AS w
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(floor(w) AS INT)
      |    + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
      |             < printf('%04x', CAST(floor((w - floor(w)) * 65536) AS INT))
      |           THEN 1 ELSE 0 END AS n_copies
      |  FROM w),
      |e AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(unnest(generate_series(1, n_copies)) AS INT) AS epoch
      |  FROM n),
      |k AS (
      |  SELECT doc_id, epoch, n_tokens,
      |    md5('epoch0:' || CAST(doc_id AS VARCHAR) || ':'
      |        || CAST(epoch AS VARCHAR)) AS skey
      |  FROM e),
      |r AS (
      |  SELECT doc_id, epoch, substr(skey, 1, 2) AS shard,
      |    CAST(row_number() OVER (ORDER BY skey, doc_id, epoch) AS BIGINT)
      |      AS shuffle_pos,
      |    n_tokens,
      |    coalesce(sum(n_tokens) OVER (
      |      PARTITION BY substr(skey, 1, 2) ORDER BY skey, doc_id, epoch
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM k)
      |SELECT doc_id, epoch, shard, shuffle_pos, n_tokens,
      |       CAST(cum_before // 2000 AS BIGINT) AS batch_id
      |FROM r ORDER BY doc_id, epoch""".stripMargin

  /** CDC-style latest-wins compaction — the "refresh the corpus with a
    * new crawl" primitive: a base snapshot (every document at version 0)
    * merged with a delta batch (the deterministic ~25% of docs whose
    * md5(doc_id) leading hex < '4', re-ingested at version 1 with changed
    * content — here n_chars+17 stands in for the new body). Keep the
    * highest version per key.
    *
    * Deliberately NOT the row_number-over-(key ORDER BY version DESC)
    * window formulation: a window must shuffle EVERY version of every key
    * and sort within partitions before discarding the losers. max/max_by
    * are ordinary declarative aggregates — partial map-side combine
    * collapses each partition to one candidate per key BEFORE the
    * exchange (and they hash-aggregate, where a struct-max would fall
    * back to SortAggregate), so at 100 TB the shuffle carries one row per
    * (partition, key) instead of the full version history. Version
    * numbers are unique per key by construction, so max_by is exactly
    * latest-wins (no tie ever consulted). */
  def corpusUpsert(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("n_chars"))
    val base = docs.select(col("doc_id"), lit(0L).as("version"), col("n_chars"))
    val delta = docs
      .where(substring(md5(col("doc_id").cast("string")), 1, 1) < "4")
      .select(col("doc_id"), lit(1L).as("version"),
        (col("n_chars") + lit(17)).as("n_chars"))
    base.unionByName(delta)
      .groupBy(col("doc_id"))
      .agg(max(col("version")).as("version"),
        max_by(col("n_chars"), col("version")).as("n_chars"))
  }

  val corpusUpsertSql: String =
    """WITH base AS (
      |  SELECT doc_id, CAST(0 AS BIGINT) AS version, n_chars FROM documents),
      |delta AS (
      |  SELECT doc_id, CAST(1 AS BIGINT) AS version, n_chars + 17 AS n_chars
      |  FROM documents
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'),
      |merged AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
      |SELECT doc_id, max(version) AS version,
      |       max_by(n_chars, version) AS n_chars
      |FROM merged GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Time-travel (AS OF) reads over a versioned change log — the lakehouse
    * primitive behind "reproduce the corpus exactly as the last training
    * run saw it". The log extends [[corpusUpsert]]'s to three versions:
    * v0 full snapshot, v1 updates (~25% of keys, md5 leading hex < '4'),
    * v2 DELETES (md5 leading hex < '2' or ≥ 'e' — deliberately straddling
    * the update range, so the log contains BOTH delete-after-update keys,
    * the no-resurrection case, and delete-of-untouched keys) —
    * and a snapshot AS OF version V is latest-wins over `version <= V`
    * with tombstones dropped AFTER the argmax (a key whose latest op ≤ V
    * is a delete is absent, but its earlier update must not resurrect).
    * Emitted here as both snapshots tagged by `as_of`, so the result
    * exhibits the semantics: deleted keys appear under as_of=1 and vanish
    * under as_of=2, while un-deleted updated keys carry version 1 in both.
    *
    * Shape: the same partial-aggregable max/max_by compaction as
    * [[corpusUpsert]] (one candidate per key per partition crosses each
    * exchange — never a version-history window), run once per requested
    * snapshot over the version-pruned log. The synthetic log itself is
    * built from ONE corpus scan (the three version branches read one
    * pinned doc_id exchange via ReuseExchange) and MATERIALIZED once —
    * the moral equivalent of the log being real storage; both snapshot
    * aggregates then read the materialized log, not the corpus. On a
    * real table the `version <= V` predicate is additionally a
    * file-level prune (manifest min/max on the version column — the
    * [[graft.sources.SkippingIndex]] mechanism), so an AS OF read scans
    * only the files the snapshot can see; at 100 TB that pruning, not
    * the aggregate, is what makes time travel cheap. */
  def corpusAsofRead(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("n_chars"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("h"))
      .repartition(col("doc_id"))
    val log = docs.select(col("doc_id"), lit(0L).as("version"),
        col("n_chars"), lit("u").as("op"))
      .unionByName(docs.where(col("h") < "4")
        .select(col("doc_id"), lit(1L).as("version"),
          (col("n_chars") + lit(17)).as("n_chars"), lit("u").as("op")))
      .unionByName(docs.where(col("h") < "2" || col("h") >= "e")
        .select(col("doc_id"), lit(2L).as("version"),
          lit(0L).as("n_chars"), lit("d").as("op")))
      .localCheckpoint()
    // the tombstone flag rides the argmax as an INT, not the op string:
    // a string aggregation buffer would demote the whole compaction to
    // SortAggregate (immutable buffer type); the int keeps it a codegen'd
    // HashAggregate with map-side partials — measured on the plan dump
    def asOf(v: Long): DataFrame =
      log.where(col("version") <= v)
        .groupBy(col("doc_id"))
        .agg(max(col("version")).as("version"),
          max_by(col("n_chars"), col("version")).as("n_chars"),
          max_by(when(col("op") === "d", 1).otherwise(0), col("version"))
            .as("deleted"))
        .where(col("deleted") === 0)
        .select(lit(v).as("as_of"), col("doc_id"), col("version"),
          col("n_chars"))
    asOf(1L).unionByName(asOf(2L))
  }

  val corpusAsofReadSql: String =
    """WITH d AS (
      |  SELECT doc_id, n_chars,
      |         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
      |  FROM documents),
      |log AS (
      |  SELECT doc_id, CAST(0 AS BIGINT) AS version, n_chars, 'u' AS op
      |  FROM d
      |  UNION ALL
      |  SELECT doc_id, CAST(1 AS BIGINT), n_chars + 17, 'u'
      |  FROM d WHERE h < '4'
      |  UNION ALL
      |  SELECT doc_id, CAST(2 AS BIGINT), CAST(0 AS BIGINT), 'd'
      |  FROM d WHERE h < '2' OR h >= 'e'),
      |snap AS (
      |  SELECT v.as_of, doc_id, max(version) AS version,
      |         max_by(n_chars, version) AS n_chars,
      |         max_by(CASE WHEN op = 'd' THEN 1 ELSE 0 END, version)
      |           AS deleted
      |  FROM log, (SELECT unnest([1, 2]) AS as_of) v
      |  WHERE version <= v.as_of
      |  GROUP BY 1, 2)
      |SELECT CAST(as_of AS BIGINT) AS as_of, doc_id, version, n_chars
      |FROM snap WHERE deleted = 0 ORDER BY as_of, doc_id""".stripMargin

  /** Token-BUDGET downsampling per language — "give me the first N tokens
    * of each language, in a deterministic shuffled order": the data-budget
    * allocation step a training recipe runs when the unit of account is
    * tokens, not documents (contrast [[sampleStratified]], which balances
    * document COUNTS). A doc is kept iff the cumulative token count of
    * docs before it (md5 order) is still under budget — so the budget is
    * a floor: the straddling document is kept, and every language
    * contributes ≥ budget tokens when it has them.
    *
    * The cumulative sum is a DISTRIBUTED PREFIX SUM, not a naive
    * per-lang window: `lang` has ~dozens of values, so
    * `Window.partitionBy(lang)` would drag EVERY document of a language
    * through ONE partition — the low-cardinality-window scale bomb this
    * suite polices everywhere else. Instead (the [[corpusShuffle]]
    * bucket-offset pattern): docs bucket by their md5's leading byte
    * (256 buckets/lang); per-bucket token sums form a ≤ langs×256-row
    * table BY CONSTRUCTION; running offsets over that tiny table
    * broadcast back; and the within-bucket window runs on the
    * high-cardinality (lang, bucket) key. Because the bucket is a PREFIX
    * of the md5 sort key, (bucket, r, doc_id) order ≡ (r, doc_id) order,
    * and integer addition is associative — so the two-level cum equals
    * the naive single-window value EXACTLY, which is why the DuckDB twin
    * can be the naive window and still hash-match. */
  def sampleTokenBudget(s: SparkSession, d: String,
                        budget: Long = 2000L): DataFrame = {
    // the explicit repartition pins ONE exchange both consumers read from
    // (the per-bucket token aggregate and the within-bucket cumulative
    // window) — ReuseExchange dedupes the identical subtrees, so the
    // corpus is scanned and md5-keyed ONCE (the corpusShuffle pattern;
    // without the pin the offsets branch re-derives the scan — a 2× I/O
    // tax at 100 TB). Same two canonical-plan details as corpusShuffle:
    // the isNotNull filter sits BELOW the exchange on both branches, and
    // the offsets sum runs over coalesce(n_tokens, length(r), doc_id) —
    // exactly sum(n_tokens) on this frame (n_tokens is never null), but
    // statically nullable-chained so column pruning keeps the offsets
    // branch requiring the SAME columns the window branch does and the
    // two exchange subtrees stay byte-identical.
    val keyed = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("r", md5(col("doc_id").cast("string")))
      .withColumn("bucket", conv(substring(col("r"), 1, 2), 16, 10).cast("int"))
      .where(col("lang").isNotNull && col("bucket").isNotNull)
      .repartition(col("lang"), col("bucket"))
    val offsets = keyed.groupBy(col("lang"), col("bucket"))
      .agg(sum(coalesce(col("n_tokens"), length(col("r")).cast("long"),
        col("doc_id"))).as("b_tokens"))
      .withColumn("offset",
        coalesce(sum(col("b_tokens")).over(
          Window.partitionBy(col("lang")).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("bucket"), col("offset"))
    val wIn = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("r"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.withColumn("cum0", sum(col("n_tokens")).over(wIn))
      .join(broadcast(offsets), Seq("lang", "bucket"))
      .withColumn("cum", col("offset") + col("cum0"))
      .where(col("cum") - col("n_tokens") < budget)
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("cum"))
  }

  val sampleTokenBudgetSql: String =
    """WITH docs AS (
      |  SELECT doc_id, lang,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         md5(CAST(doc_id AS VARCHAR)) AS r
      |  FROM documents),
      |c AS (
      |  SELECT *, sum(n_tokens) OVER (PARTITION BY lang ORDER BY r, doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM docs)
      |SELECT lang, doc_id, n_tokens, CAST(cum AS BIGINT) AS cum
      |FROM c WHERE cum - n_tokens < 2000
      |ORDER BY lang, doc_id""".stripMargin

  /** Split-balance drift screen: does the hash split leave train and
    * holdout distributionally equal on every categorical dimension? For
    * each (dim, value) cell: the observed train/holdout counts, their
    * within-split shares, and the cell's chi-square contribution against
    * the independence expectation e = n_cell · split_total / N — the
    * standard 2×k contingency screen an ML-ops pipeline runs before
    * trusting a split (a sharded-by-source split fails it loudly).
    * Everything derives from exact integer counts; the χ² chain is
    * explicitly parenthesized identically in both engines (the
    * [[graft.operators.EventAnalytics.abTestFrom]] discipline), round(6).
    * Shape: one corpus scan → a (dim, value)-keyed partial-aggregable
    * count (cardinality-bounded: values of lang ∪ source) → the 1-row
    * (T, H) totals frame folded onto every cell (the q6 scalar shape). */
  def profileDrift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents")
      .select(col("lang"), col("source"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1) < "e", 1L)
          .otherwise(0L).as("in_train"))
    val dims = docs.select(lit("lang").as("dim"), col("lang").as("value"),
        col("in_train"))
      .unionByName(docs.select(lit("source").as("dim"),
        col("source").as("value"), col("in_train")))
    val cells = dims.groupBy(col("dim"), col("value"))
      .agg(sum(col("in_train")).as("t"),
        sum(lit(1L) - col("in_train")).as("h"))
    val totals = docs.agg(sum(col("in_train")).as("tt"),
      sum(lit(1L) - col("in_train")).as("hh"))
    val n = (col("t") + col("h")).cast("double")
    val bigN = (col("tt") + col("hh")).cast("double")
    val et = (n * col("tt").cast("double")) / bigN
    val eh = (n * col("hh").cast("double")) / bigN
    val chi = (((col("t").cast("double") - et) * (col("t").cast("double") - et)) / et) +
      (((col("h").cast("double") - eh) * (col("h").cast("double") - eh)) / eh)
    cells.crossJoin(broadcast(totals))
      .select(col("dim"), col("value"), col("t"), col("h"),
        round(col("t").cast("double") / col("tt").cast("double"), 6)
          .as("share_train"),
        round(col("h").cast("double") / col("hh").cast("double"), 6)
          .as("share_holdout"),
        round(chi, 6).as("chi2_contrib"))
  }

  val profileDriftSql: String =
    """WITH d AS (
      |  SELECT lang, source,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
      |         THEN 1 ELSE 0 END AS in_train
      |  FROM documents),
      |dims AS (
      |  SELECT 'lang' AS dim, lang AS value, in_train FROM d
      |  UNION ALL
      |  SELECT 'source', source, in_train FROM d),
      |cells AS (
      |  SELECT dim, value, sum(in_train) AS t, sum(1 - in_train) AS h
      |  FROM dims GROUP BY 1, 2),
      |totals AS (SELECT sum(in_train) AS tt, sum(1 - in_train) AS hh FROM d)
      |SELECT dim, value, CAST(t AS BIGINT) AS t, CAST(h AS BIGINT) AS h,
      |  round(CAST(t AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS share_train,
      |  round(CAST(h AS DOUBLE) / CAST(hh AS DOUBLE), 6) AS share_holdout,
      |  round((((CAST(t AS DOUBLE) - (CAST(t + h AS DOUBLE) * CAST(tt AS DOUBLE)) / CAST(tt + hh AS DOUBLE))
      |          * (CAST(t AS DOUBLE) - (CAST(t + h AS DOUBLE) * CAST(tt AS DOUBLE)) / CAST(tt + hh AS DOUBLE)))
      |         / ((CAST(t + h AS DOUBLE) * CAST(tt AS DOUBLE)) / CAST(tt + hh AS DOUBLE)))
      |        + (((CAST(h AS DOUBLE) - (CAST(t + h AS DOUBLE) * CAST(hh AS DOUBLE)) / CAST(tt + hh AS DOUBLE))
      |            * (CAST(h AS DOUBLE) - (CAST(t + h AS DOUBLE) * CAST(hh AS DOUBLE)) / CAST(tt + hh AS DOUBLE)))
      |           / ((CAST(t + h AS DOUBLE) * CAST(hh AS DOUBLE)) / CAST(tt + hh AS DOUBLE))), 6)
      |    AS chi2_contrib
      |FROM cells, totals ORDER BY dim, value""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_upsert" -> (corpusUpsert _),
    "corpus_asof_read" -> (corpusAsofRead _),
    "sample_split" -> (sampleSplit _),
    "profile_drift" -> (profileDrift _),
    "sample_stratified" -> (sampleStratified _),
    "sample_weighted" -> ((s, d) => sampleWeighted(s, d)),
    "sample_token_budget" -> ((s, d) => sampleTokenBudget(s, d)),
    "pipeline_e2e" -> (pipelineE2e _),
    "documents_deduped" -> (documentsDeduped _),
    "pack_batches" -> ((s, d) => packBatches(s, d)),
    "mix_epochs" -> (mixEpochs _),
    "mix_temperature" -> ((s, d) => mixTemperature(s, d)),
    "mix_quota" -> ((s, d) => mixQuota(s, d)),
    "corpus_shuffle" -> ((s, d) => corpusShuffle(s, d)),
    "pretrain_manifest" -> ((s, d) => pretrainManifest(s, d))
  )

  val oracles: Map[String, String] = Map(
    "corpus_upsert" -> corpusUpsertSql,
    "corpus_asof_read" -> corpusAsofReadSql,
    "sample_split" -> sampleSplitSql,
    "profile_drift" -> profileDriftSql,
    "sample_stratified" -> sampleStratifiedSql,
    "sample_weighted" -> sampleWeightedSql,
    "sample_token_budget" -> sampleTokenBudgetSql,
    "pipeline_e2e" -> pipelineE2eSql,
    "documents_deduped" -> documentsDedupedSql,
    "pack_batches" -> packBatchesSql,
    "mix_epochs" -> mixEpochsSql,
    "mix_temperature" -> mixTemperatureSql,
    "mix_quota" -> mixQuotaSql,
    "corpus_shuffle" -> corpusShuffleSql,
    "pretrain_manifest" -> pretrainManifestSql
  )

  val verifyOrder: Map[String, Seq[Column]] = Map(
    "corpus_upsert" -> Seq(col("doc_id")),
    "corpus_asof_read" -> Seq(col("as_of"), col("doc_id")),
    "sample_split" -> Seq(col("doc_id")),
    "profile_drift" -> Seq(col("dim"), col("value")),
    "sample_stratified" -> Seq(col("doc_id")),
    "sample_weighted" -> Seq(col("lang"), col("rank")),
    "sample_token_budget" -> Seq(col("lang"), col("doc_id")),
    "pipeline_e2e" -> Seq(col("doc_id")),
    "documents_deduped" -> Seq(col("doc_id")),
    "pack_batches" -> Seq(col("doc_id")),
    "mix_epochs" -> Seq(col("doc_id"), col("epoch")),
    "mix_temperature" -> Seq(col("doc_id"), col("epoch")),
    "mix_quota" -> Seq(col("lang")),
    "corpus_shuffle" -> Seq(col("doc_id")),
    "pretrain_manifest" -> Seq(col("doc_id"), col("epoch"))
  )
}
