package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate sketches as PRODUCTION queries — the sub-linear-memory
  * aggregates a 100-TB pipeline runs constantly, where the exact twin
  * ([[EventAnalytics.distinctUsers]], [[TextAnalysis.tokenTopk]]) is the
  * correctness oracle but too expensive to be the daily job.
  *
  * Sketch internals are engine-specific, so these are NOT DuckDB-oracled
  * (rows-only in the driver gate, like the ANN family); the contract is
  * error-bounded agreement with the exact oracled operators, asserted in
  * SketchSpec.
  */
object Sketches {

  /** HLL approximate distinct users per event type — the sketch twin of
    * [[EventAnalytics.distinctUsers]]. `approx_count_distinct` is
    * Spark's HyperLogLog++ aggregate: fixed O(2^p) registers per group
    * regardless of cardinality, mergeable map-side partials, whole-stage
    * codegen. At 100 TB the exact distinct shuffles every (type, user)
    * pair; the sketch shuffles a few KB of registers per group. rsd=0.02
    * ⇒ p=14 registers, ~2% relative error (bound asserted vs the exact
    * twin in SketchSpec). */
  def distinctUsersApprox(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"))

  /** Count-min sketch knobs: depth d rows × width w counters. The CMS
    * guarantee: exact ≤ estimate, and estimate ≤ exact + 2N/w with
    * probability ≥ 1 − 2^−d per query (Cormode–Muthukrishnan). Width is
    * the accuracy/memory knob — the whole sketch is d×w longs (320 KB
    * here) INDEPENDENT of corpus size, which is the point at 100 TB. */
  val CmsDepth = 5
  val CmsWidth = 8192

  /** CMS heavy hitters: top-k tokens by count-min estimate — the
    * bounded-memory twin of [[TextAnalysis.tokenTopk]]'s exact
    * vocabulary aggregate.
    *
    * The sketch is built as a plain DataFrame aggregate, not a binary
    * blob: each token occurrence increments its d=(row, bucket) cells
    * with bucket = xxhash64(row, tok) mod w, so the sketch IS a
    * groupBy(row, bucket).count() whose key space is capped at d×w —
    * map-side partial aggregation shrinks every input partition to ≤40960
    * rows before the (tiny) shuffle, no matter how many tokens flow in.
    * Estimation is the same hash expansion on the DISTINCT vocabulary
    * joined against the broadcast sketch, min over the d cells. No UDFs,
    * no driver-side sketch object, everything codegen'd.
    *
    * Scale shape: one corpus scan; the sketch shuffle is ≤d×w rows; the
    * candidate side is vocabulary-sized (vocab ≪ corpus occurrences —
    * that reduction, occurrences → distinct, is what the whole query
    * exists for); the sketch join is broadcast by construction. Error
    * bound + top-k ranking agreement vs the exact twin: SketchSpec. */
  /** The d hash cells of each `tok` row: (row_i, bucket) per CMS row.
    * Shared by the batch query and the streaming ingest twin
    * ([[graft.streaming.DocStreams.tokenSketchStream]]) so both build
    * bit-identical sketches — xxhash64 is deterministic, so a sketch is
    * a pure function of the token multiset, mergeable and
    * engine-order-independent. */
  def cmsCells(toksOrVocab: DataFrame): DataFrame = toksOrVocab
    .select(col("tok"),
      explode(sequence(lit(0), lit(CmsDepth - 1))).as("row_i"))
    .withColumn("bucket", pmod(xxhash64(col("row_i"), col("tok")), lit(CmsWidth)))

  /** The sketch itself: a ≤ d×w-row count table. Works unchanged on a
    * streaming frame (it is just a groupBy — state bounded at d×w keys
    * BY CONSTRUCTION, unlike exact token counts whose state is
    * vocabulary-sized). */
  def cmsSketch(toks: DataFrame): DataFrame =
    cmsCells(toks).groupBy(col("row_i"), col("bucket")).agg(count(lit(1)).as("c"))

  /** Point estimates for `candidates` (a 1-column `tok` frame) against a
    * materialized sketch table: re-hash, probe the (broadcast) sketch,
    * min over the d cells. */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame): DataFrame =
    cmsCells(candidates)
      .join(broadcast(sketch), Seq("row_i", "bucket"))
      .groupBy(col("tok")).agg(min(col("c")).as("est_count"))

  def tokenHeavyHitters(s: SparkSession, d: String, k: Int = 50): DataFrame = {
    val toks = Tables.load(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    cmsEstimate(cmsSketch(toks), toks.distinct())
      .orderBy(col("est_count").desc, col("tok").asc)
      .limit(k)
  }

  /** Approximate event-value quantiles per event type — the sketch twin
    * of an exact `percentile` aggregate. `percentile_approx` is Spark's
    * Greenwald–Khanna-style quantile summary: bounded memory
    * (O(accuracy) per group) and mergeable partials, vs the exact
    * percentile which buffers every value of a group on one reducer.
    * accuracy=10000 ⇒ rank error ≤ n/10000 per group; the value-space
    * bound vs the exact twin is asserted in SketchSpec. Flat columns
    * (not an array) so the driver's rows-only gate can read it. */
  def valuePercentilesApprox(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events")
      .groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_approx"),
        percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90_approx"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99_approx"))

  /** Mergeable-sketch rollup — the pre-aggregation pattern that makes
    * sketches matter at 100 TB: build one Apache DataSketches HLL sketch
    * PER (day, event_type) partition (`hll_sketch_agg` — the sketch
    * column a daily batch job would persist next to its partition), then
    * answer the cross-day question by UNIONING the stored sketches
    * (`hll_union_agg`) instead of re-scanning the raw events. Distinct
    * counts don't sum — a user active on 5 days must count once — which
    * is exactly what the sketch union gets right and a per-day count
    * rollup gets wrong. Emits, per event_type: the union-of-days
    * estimate, the naive sum of per-day estimates (wrong on purpose —
    * the gap demonstrates WHY the union is needed), and n_days. The
    * union estimate must agree with the exact all-days distinct within
    * HLL error; SketchSpec asserts that bound and that naive_sum ≥
    * merged for every type.
    *
    * Scale shape: stage 1 groups on (day, type) — full parallelism, HLL
    * register blocks as map-side partials; stage 2 shuffles ONE sketch
    * blob per (day, type) — day-count-sized, not event-count-sized. */
  def distinctUsersMerge(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.load(s, d, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sketch"))
    daily
      .groupBy(col("event_type"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("n_users_merged"),
        sum(hll_sketch_estimate(col("sketch"))).as("n_users_naive_sum"),
        count(lit(1)).as("n_days"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_distinct_users_approx" -> (distinctUsersApprox _),
    "events_distinct_users_merge" -> (distinctUsersMerge _),
    "token_heavy_hitters" -> ((s, d) => tokenHeavyHitters(s, d)),
    "events_value_percentiles_approx" -> (valuePercentilesApprox _)
  )

  /** No DuckDB twins: sketch register/cell contents are engine-specific
    * (HLL++ register layout; xxhash64 is Spark-native). The driver gate
    * records rows-only; the numeric contracts live in SketchSpec. */
  val oracles: Map[String, String] = Map.empty

  val verifyOrder: Map[String, Seq[Column]] = Map(
    "events_distinct_users_approx" -> Seq(col("event_type")),
    "events_distinct_users_merge" -> Seq(col("event_type")),
    "events_value_percentiles_approx" -> Seq(col("event_type"))
  )
}
