package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time analytics over the `events` table (ts, user_id, event_type,
  * value, props-JSON).
  *
  * The window transforms are written against a plain DataFrame (`*From`
  * variants) so the SAME code runs in two modes: batch here (where the
  * DuckDB oracle can check it) and incrementally in
  * [[graft.streaming.EventStreams]], which feeds a watermarked
  * `readStream` source through these exact functions. Batch/stream result
  * parity is asserted in StreamingSpec.
  *
  * Scale: all groupings key on (time bucket, type) or (user, session) — both
  * shuffle once and partition evenly (time and user ids are high-cardinality
  * and unskewed; if a hot key appeared, AQE skew-join/salting applies).
  */
object EventAnalytics {

  /** Tumbling 1-hour windows per event type. `window()` is the native
    * event-time bucketing operator; start == date_trunc('hour') for
    * hour-aligned tumbling windows. */
  def tumblingHourFrom(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  def tumblingHour(s: SparkSession, d: String): DataFrame =
    tumblingHourFrom(Tables.load(s, d, "events"))

  val tumblingHourSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Sliding windows: 1 hour long, every 30 minutes — each event lands in
    * exactly 2 windows. */
  def slidingHourFrom(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
      .select(col("w.start").as("window_start"), col("n"), col("avg_value"))

  def slidingHour(s: SparkSession, d: String): DataFrame =
    slidingHourFrom(Tables.load(s, d, "events"))

  // DuckDB twin: every event belongs to the 30-min-aligned window that
  // starts at its own 30-min bucket and to the one 30 minutes earlier.
  val slidingHourSql: String =
    """WITH x AS (
      |  SELECT unnest([b, b - INTERVAL 30 MINUTE]) AS window_start, value
      |  FROM (SELECT time_bucket(INTERVAL '30 minutes', ts) AS b, value FROM events))
      |SELECT window_start, count(*) AS n, round(avg(value), 6) AS avg_value
      |FROM x GROUP BY 1 ORDER BY window_start""".stripMargin

  /** Gap-based sessionization with the native `session_window` operator:
    * a session extends while consecutive events of a user are < 30 min
    * apart; the window end is last_event + gap. */
  def sessionizeFrom(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total"))

  def sessionize(s: SparkSession, d: String): DataFrame =
    sessionizeFrom(Tables.load(s, d, "events"))

  // Same semantics spelled with window functions: a new session starts when
  // the gap to the previous event is >= 30 min; session end = last + 30 min.
  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts, value,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start,
      |       max(ts) + INTERVAL 30 MINUTE AS session_end,
      |       count(*) AS n_events, round(sum(value), 2) AS total
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Session-shape summary — the product-analytics rollup over
    * [[sessionize]]: how long sessions run and how much they contain.
    * Durations are exact integer seconds (timestamp difference — and the
    * percentile interpolates the shared (1-g)·lo + g·hi on integers, the
    * agg_percentiles precedent), the multi-event share is an integer
    * ratio + round(6). Shape: the sessionization shuffle is the only
    * corpus-sized exchange; the summary is one scalar aggregate (1-row
    * frame through the whitelisted SinglePartition) whose percentile
    * state is one entry per distinct duration/size — data-bounded here;
    * for corpora where that histogram itself is unbounded, swap
    * percentile_approx (mergeable GK state, same plan) and trade away
    * the exact oracle. */
  def sessionStats(s: SparkSession, d: String): DataFrame =
    sessionize(s, d)
      .select((unix_timestamp(col("session_end")) -
        unix_timestamp(col("session_start"))).as("dur_s"),
        col("n_events"))
      .agg(count(lit(1)).as("n_sessions"),
        round(expr("percentile(dur_s, 0.5)"), 6).as("p50_duration_s"),
        round(expr("percentile(dur_s, 0.9)"), 6).as("p90_duration_s"),
        round(expr("percentile(n_events, 0.5)"), 6).as("p50_events"),
        round(expr("percentile(n_events, 0.9)"), 6).as("p90_events"),
        round(sum((col("n_events") > 1).cast("long")) * lit(1.0) /
          count(lit(1)), 6).as("multi_event_share"))

  val sessionStatsSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged),
      |sessions AS (
      |  SELECT date_diff('second', min(ts), max(ts) + INTERVAL 30 MINUTE) AS dur_s,
      |         count(*) AS n_events
      |  FROM sess GROUP BY user_id, sid)
      |SELECT count(*) AS n_sessions,
      |       round(quantile_cont(dur_s, 0.5), 6) AS p50_duration_s,
      |       round(quantile_cont(dur_s, 0.9), 6) AS p90_duration_s,
      |       round(quantile_cont(n_events, 0.5), 6) AS p50_events,
      |       round(quantile_cont(n_events, 0.9), 6) AS p90_events,
      |       round(sum(CASE WHEN n_events > 1 THEN 1 ELSE 0 END) * 1.0
      |             / count(*), 6) AS multi_event_share
      |FROM sessions""".stripMargin

  /** JSON extraction from the props column (semi-structured path access). */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), round(avg(col("k")), 6).as("avg_k"),
        count(lit(1)).as("n"))

  val jsonExtractSql: String =
    """SELECT event_type,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
      |       count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Distinct users per event type (exact; the approx/HLL twin is
    * error-bound-tested against this in SketchSpec — sketch internals
    * aren't cross-engine oracle-able). */
  def distinctUsers(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))

  val distinctUsersSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Daily event share: aggregate + window-over-aggregate (pct of day). */
  def dailyShare(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.load(s, d, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("day"))
    daily
      .withColumn("pct", round(col("n") * 100.0 / sum(col("n")).over(w), 6))
  }

  val dailyShareSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT day, event_type, n,
      |       round(n * 100.0 / sum(n) OVER (PARTITION BY day), 6) AS pct
      |FROM daily ORDER BY day, event_type""".stripMargin

  /** Per-type daily-count anomaly score — the monitoring query an event
    * pipeline runs to flag outlier days (traffic spikes, dropped
    * ingestion): z = (n − mean)/stddev over the type's daily counts.
    *
    * Determinism discipline: no `avg`/`stddev_samp` over doubles (their
    * reduce order is partition-nondeterministic). Daily counts are
    * integers, so Σn and Σn² are EXACT long aggregates; the z-score is
    * derived from them in a fixed-shape double expression —
    * z = (n·days − Σn) / sqrt((days·Σn² − (Σn)²) · days/(days−1)) —
    * a pure function of exact integers, identical on any partitioning
    * and engine, so the query hash-oracles. Zero-variance types emit
    * z = 0 (exact integer test, not a float epsilon).
    *
    * Scale shape: the daily aggregate is the only corpus-sized shuffle;
    * stats are one row per event_type (broadcast back onto the daily
    * frame). */
  def eventsAnomaly(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.load(s, d, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("days"), sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
    // the products run in DECIMAL(38,0), not long: days·Σn² and (Σn)²
    // overflow 64 bits once a type's count sums pass ~3e9 (real at the
    // event scale this targets), where Spark would wrap silently while
    // DuckDB's native 128-bit HUGEINT errors or keeps going — decimal
    // keeps the Spark side exact (and equal to DuckDB's hugeint) to 38
    // digits, preserving the pure-function-of-exact-integers contract
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val b = dec(col("days")) * dec(col("s2")) - dec(col("s1")) * dec(col("s1"))
    val a = dec(col("n")) * dec(col("days")) - dec(col("s1"))
    daily.join(broadcast(stats), Seq("event_type"))
      .where(col("days") > 1)
      .select(col("day"), col("event_type"), col("n"),
        when(b === 0, lit(0.0))
          .otherwise(round(
            a.cast("double") /
              sqrt(b.cast("double")
                * col("days").cast("double") / (col("days").cast("double") - 1.0)),
            6)).as("z"))
  }

  /** `events_anomaly_mad` (oracled): the ROBUST twin of [[eventsAnomaly]]
    * — median/MAD in place of mean/σ, the estimator monitoring pipelines
    * switch to once real outliers exist (a single 100× spike day drags
    * the mean and inflates σ enough to mask itself in z-scores; the
    * median and MAD have a 50% breakdown point and don't move).
    * robust_z = (n − median) / (1.4826·MAD), the normal-consistency
    * scaling (Hampel 1974); MAD = 0 (constant-majority types) emits 0,
    * the [[eventsAnomaly]] degenerate-variance rule.
    *
    * Determinism: the medians ride the PROVEN percentile parity
    * (Spark `percentile` ↔ DuckDB `quantile_cont`, the agg_percentiles
    * precedent — identical (1−g)·lo + g·hi interpolation); deviations
    * and the final score compose those doubles through one shared
    * parenthesization, round(6) at the output grid.
    *
    * Shape: daily collapse (the one corpus shuffle) → ≤|types|-row
    * median frame broadcast back → ≤|types|-row MAD frame broadcast
    * back; everything after the collapse runs on days×types rows. */
  def eventsAnomalyMad(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.load(s, d, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy(col("event_type"))
      .agg(expr("percentile(n, 0.5)").as("m"), count(lit(1)).as("days"))
    val dev = daily.join(broadcast(med), Seq("event_type"))
      .where(col("days") > 1)
      .select(col("day"), col("event_type"), col("n"), col("m"),
        abs(col("n").cast("double") - col("m")).as("ad"))
    val madF = dev.groupBy(col("event_type"))
      .agg(expr("percentile(ad, 0.5)").as("mad"))
    dev.join(broadcast(madF), Seq("event_type"))
      .select(col("day"), col("event_type"), col("n"),
        round(col("m"), 6).as("median_n"),
        round(col("mad"), 6).as("mad"),
        when(col("mad") === 0.0, lit(0.0))
          .otherwise(round((col("n").cast("double") - col("m"))
            / (lit(1.4826) * col("mad")), 6)).as("robust_z"))
  }

  val eventsAnomalyMadSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, quantile_cont(n, 0.5) AS m, count(*) AS days
      |  FROM daily GROUP BY 1),
      |dev AS (
      |  SELECT day, daily.event_type, n, m,
      |         abs(CAST(n AS DOUBLE) - m) AS ad
      |  FROM daily JOIN med USING (event_type) WHERE days > 1),
      |madf AS (
      |  SELECT event_type, quantile_cont(ad, 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT day, dev.event_type, n,
      |       round(m, 6) AS median_n, round(mad, 6) AS mad,
      |       CASE WHEN mad = 0 THEN 0.0
      |            ELSE round((CAST(n AS DOUBLE) - m) / (1.4826 * mad), 6)
      |       END AS robust_z
      |FROM dev JOIN madf USING (event_type)
      |ORDER BY event_type, day""".stripMargin

  /** CUSUM drift detection per event type — the change-point companion of
    * [[eventsAnomaly]]'s pointwise z-scores: the running sum of
    * mean-deviations S_i = Σ_{j≤i}(n_j − μ) turns a sustained small shift
    * (invisible to per-day z) into a growing ramp, and the |S| peak marks
    * the most likely change point (Page 1954). Exactness: μ = s1/days
    * never materializes — every deviation is scaled by `days`, making
    * S'_i = Σ(n_j·days − s1) a pure function of exact integers in
    * DECIMAL(38,0) (the [[eventsAnomaly]] overflow discipline); the
    * output divides once by days and rounds(6); the peak flag compares
    * exact integers, no float epsilon. By construction S'_last = 0 —
    * the mean-centered ramp always returns to zero.
    *
    * Shape: daily aggregate (the one corpus shuffle) → 1-row-per-type
    * stats broadcast back → two type-partitioned windows over the
    * CALENDAR-bounded daily frame (rows = days×types, never events). */
  def eventsCusum(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.load(s, d, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("days"), sum(col("n")).as("s1"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val dev = dec(col("n")) * dec(col("days")) - dec(col("s1"))
    val wc = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col("event_type"))
    daily.join(broadcast(stats), Seq("event_type"))
      .select(col("day"), col("event_type"), col("n"), col("days"),
        sum(dev).over(wc).as("cs"))
      .select(col("day"), col("event_type"), col("n"),
        round(col("cs").cast("double") / col("days").cast("double"), 6)
          .as("cusum"),
        (abs(col("cs")) === max(abs(col("cs"))).over(wt)).as("is_peak"))
  }

  val eventsCusumSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, count(*) AS days, sum(n) AS s1
      |  FROM daily GROUP BY 1),
      |r AS (
      |  SELECT day, d.event_type, n, days,
      |    sum(CAST(n AS DECIMAL(38,0)) * CAST(days AS DECIMAL(38,0))
      |        - CAST(s1 AS DECIMAL(38,0)))
      |      OVER (PARTITION BY d.event_type ORDER BY day
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
      |  FROM daily d JOIN stats USING (event_type))
      |SELECT day, event_type, CAST(n AS BIGINT) AS n,
      |  round(CAST(cs AS DOUBLE) / CAST(days AS DOUBLE), 6) AS cusum,
      |  abs(cs) = max(abs(cs)) OVER (PARTITION BY event_type) AS is_peak
      |FROM r ORDER BY event_type, day""".stripMargin

  /** Engagement stickiness: DAU, trailing-7-day WAU, and the DAU/WAU
    * ratio per day — the product-health metric. WAU is a windowed
    * DISTINCT, which no rolling-sum window can express (users active on
    * several days must count once); the scalable form is the CALENDAR
    * FAN-OUT: each distinct (day, user) activity row announces itself to
    * the ≤7 future days whose trailing window contains it, and each
    * target day counts distinct users — a bounded ×7 row expansion and
    * two partial-aggregable distinct-counts, never a per-day scan of
    * history. Days with activity only in their trailing tail (no DAU)
    * still appear, DAU 0 — the days the metric exists FOR. Ratio is one
    * integer division + round(6). */
  def eventsStickiness(s: SparkSession, d: String): DataFrame = {
    val activity = Tables.load(s, d, "events")
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .distinct()
    val dau = activity.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = activity
      .select(explode(expr(
        "sequence(day, day + INTERVAL 6 DAYS, INTERVAL 1 DAY)")).as("day"),
        col("user_id"))
      .groupBy(col("day"))
      .agg(count_distinct(col("user_id")).as("wau"))
    wau.join(dau, Seq("day"), "left_outer")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("wau"),
        round(coalesce(col("dau"), lit(0L)) * lit(1.0) / col("wau"), 6)
          .as("stickiness"))
  }

  /** Hour-of-week activity heatmap per event type — the load-profile /
    * seasonality view every ops dashboard carries. Cells are a single
    * partial-aggregable count on a (dow, hour, type) key; the within-type
    * share window runs over the CALENDAR-bounded cell frame (≤ 7·24·types
    * rows — the dailyShare precedent), never the event stream. Engine
    * alignment: Spark's `dayofweek` is 1-based Sunday=1, DuckDB's is
    * 0-based Sunday=0 — the Spark side emits `dayofweek − 1` so both
    * speak the 0=Sunday convention. */
  def eventsHeatmap(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.load(s, d, "events")
      .groupBy((dayofweek(col("ts")) - lit(1)).as("dow"),
        hour(col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    cells.select(col("dow"), col("hour"), col("event_type"), col("n"),
      round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("event_type"))), 6)
        .as("share"))
  }

  val eventsHeatmapSql: String =
    """WITH cells AS (
      |  SELECT dayofweek(ts) AS dow, CAST(hour(ts) AS INT) AS hour,
      |         event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT CAST(dow AS INT) AS dow, hour, event_type,
      |  CAST(n AS BIGINT) AS n,
      |  round(CAST(n AS DOUBLE) /
      |        sum(n) OVER (PARTITION BY event_type), 6) AS share
      |FROM cells ORDER BY dow, hour, event_type""".stripMargin

  /** `events_survival` (oracled): Kaplan–Meier user-retention curve with
    * right-censoring — the product-limit estimator S(t) = Π_{tᵢ≤t}
    * (1 − dᵢ/nᵢ) over user lifetimes in days, where a user whose last
    * event falls in the final 3 observed days is CENSORED (still active
    * at cutoff) rather than counted as churned. This is the estimator a
    * growth team actually uses instead of naive retention: naive curves
    * treat every still-active user as churned at their last event and
    * systematically underestimate survival near the observation edge.
    *
    * Per day: n_risk (users whose death/censor time ≥ t — reverse
    * cumulative over the day frame), n_deaths, n_censored, and S(t).
    *
    * Scale shape: ONE per-user aggregate (the only corpus-sized shuffle)
    * collapses the stream to a user frame; everything after runs on the
    * CALENDAR-bounded day frame (≤ span+1 rows — the eventsHeatmap
    * bound), where the two unpartitioned windows are whitelisted as
    * bounded-by-construction. Float discipline: each KM factor's
    * ln(1 − d/n) is an IEEE chain on exact integers fixed to the 12-dp
    * grid (DECIMAL(14,12)), the log-survival accumulates as an EXACT
    * decimal sum (no summation-order exposure), and one exp + round(6)
    * publishes S(t). A day where every at-risk user dies (d = n) sends
    * S to exactly 0 from there on — flagged explicitly rather than
    * letting ln(0) diverge cross-engine. */
  def eventsSurvival(s: SparkSession, d: String): DataFrame = {
    // pinned exchange: the per-user aggregate needs a user_id shuffle
    // anyway — making it explicit lets the 1-row cutoff branch read the
    // same shuffle files instead of re-scanning the events table
    // (the sampleTokenBudget discipline)
    val ev = Tables.load(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .where(col("user_id").isNotNull && col("day").isNotNull)
      .repartition(col("user_id"))
    val cutoff = ev.agg(max(col("day")).as("end_day"))
    val users = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .crossJoin(broadcast(cutoff))
      .select(datediff(col("last_day"), col("first_day")).as("life"),
        (col("last_day") > date_sub(col("end_day"), 3)).cast("int")
          .as("censored"))
    val byDay = users.groupBy(col("life"))
      .agg(sum(lit(1) - col("censored")).as("d"),
        sum(col("censored")).as("c"))
    val wDesc = Window.orderBy(col("life").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("life").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay
      .withColumn("n_risk", sum(col("d") + col("c")).over(wDesc))
      .withColumn("term",
        when(col("d") > 0 && col("d") < col("n_risk"),
          round(log(lit(1.0) -
            col("d").cast("double") / col("n_risk").cast("double")), 12)
            .cast("decimal(14,12)"))
          .otherwise(lit(0).cast("decimal(14,12)")))
      .withColumn("wiped",
        max((col("d") >= col("n_risk")).cast("int")).over(wAsc))
      .withColumn("s_log", sum(col("term")).over(wAsc))
      .select(col("life").as("day"), col("n_risk"),
        col("d").as("n_deaths"), col("c").as("n_censored"),
        when(col("wiped") === 1, lit(0.0))
          .otherwise(round(exp(col("s_log").cast("double")), 6))
          .as("survival"))
  }

  val eventsSurvivalSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |cutoff AS (SELECT max(day) AS end_day FROM ev),
      |users AS (
      |  SELECT date_diff('day', min(day), max(day)) AS life,
      |         CAST(max(day) > (SELECT end_day - 3 FROM cutoff) AS INT)
      |           AS censored
      |  FROM ev GROUP BY user_id),
      |by_day AS (
      |  SELECT life, CAST(sum(1 - censored) AS BIGINT) AS d,
      |         CAST(sum(censored) AS BIGINT) AS c
      |  FROM users GROUP BY 1),
      |risk AS (
      |  SELECT *, sum(d + c) OVER (ORDER BY life DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
      |  FROM by_day),
      |terms AS (
      |  SELECT *,
      |    CASE WHEN d > 0 AND d < n_risk
      |         THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE)
      |                              / CAST(n_risk AS DOUBLE)), 12)
      |                   AS DECIMAL(14,12))
      |         ELSE CAST(0 AS DECIMAL(14,12)) END AS term,
      |    CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS dead
      |  FROM risk),
      |acc AS (
      |  SELECT *,
      |    sum(term) OVER (ORDER BY life ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_log,
      |    max(dead) OVER (ORDER BY life ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wiped
      |  FROM terms)
      |SELECT CAST(life AS INT) AS day, CAST(n_risk AS BIGINT) AS n_risk,
      |       d AS n_deaths, c AS n_censored,
      |       CASE WHEN wiped = 1 THEN 0.0
      |            ELSE round(exp(CAST(s_log AS DOUBLE)), 6) END AS survival
      |FROM acc ORDER BY day""".stripMargin

  val eventsStickinessSql: String =
    """WITH activity AS (
      |  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
      |dau AS (SELECT day, count(*) AS dau FROM activity GROUP BY 1),
      |wau AS (
      |  SELECT t.day, count(DISTINCT user_id) AS wau
      |  FROM (SELECT unnest(generate_series(day, day + INTERVAL 6 DAY,
      |                                      INTERVAL 1 DAY)) AS day,
      |               user_id
      |        FROM activity) t
      |  GROUP BY 1)
      |SELECT w.day, coalesce(d.dau, 0) AS dau, w.wau,
      |       round(coalesce(d.dau, 0) * 1.0 / w.wau, 6) AS stickiness
      |FROM wau w LEFT JOIN dau d USING (day)
      |ORDER BY day""".stripMargin

  val eventsAnomalySql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, count(*) AS days, sum(n) AS s1, sum(n*n) AS s2
      |  FROM daily GROUP BY 1)
      |SELECT day, event_type, n,
      |  CASE WHEN days*s2 - s1*s1 = 0 THEN 0.0
      |       ELSE round(CAST(n*days - s1 AS DOUBLE)
      |            / sqrt(CAST(days*s2 - s1*s1 AS DOUBLE) * CAST(days AS DOUBLE)
      |                   / (CAST(days AS DOUBLE) - 1.0)), 6) END AS z
      |FROM daily JOIN stats USING (event_type)
      |WHERE days > 1
      |ORDER BY day, event_type""".stripMargin

  /** Rolling 7-day per-user activity — the time-RANGE window frame
    * (`RANGE BETWEEN 6 PRECEDING AND CURRENT ROW` over epoch days), which
    * unlike a ROWS frame handles gaps in a user's active days correctly.
    * Two-level shape: the daily aggregate is the only corpus-sized
    * shuffle; the window then runs partition-local per user_id (a
    * high-cardinality, evenly-spread key — never a single-partition
    * funnel). Determinism discipline: per-row values fix to DECIMAL(18,6)
    * once (ties at the 7th decimal unreachable from binary doubles), the
    * daily and rolling sums accumulate exactly (order-free), and the one
    * double conversion rounds on the same 6-dp grid in both engines. */
  def rolling7d(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.load(s, d, "events")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("day_value"))
      .withColumn("day_num", datediff(col("day"), to_date(lit("1970-01-01"))))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
      .rangeBetween(-6, 0)
    daily.select(col("user_id"), col("day"), col("n_events"),
      sum(col("n_events")).over(w).as("roll_events"),
      round(sum(col("day_value")).over(w).cast("double"), 6).as("roll_value"))
  }

  val rolling7dSql: String =
    """WITH daily AS (
      |  SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n_events,
      |         sum(CAST(value AS DECIMAL(18,6))) AS day_value
      |  FROM events GROUP BY 1, 2),
      |d2 AS (SELECT *, CAST(datediff('day', DATE '1970-01-01', day) AS INT) AS day_num
      |       FROM daily)
      |SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events,
      |       CAST(sum(n_events) OVER w AS BIGINT) AS roll_events,
      |       round(CAST(sum(day_value) OVER w AS DOUBLE), 6) AS roll_value
      |FROM d2
      |WINDOW w AS (PARTITION BY user_id ORDER BY day_num
      |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, day""".stripMargin

  /** Exponentially-weighted moving average of `value` per user — the
    * trend/denoise statistic monitoring pipelines attach to every metric
    * stream. Truncated at 8 taps with α=1/2: ewma_i = Σ_{k<8} 0.5^k·v_{i−k}
    * normalized by the weights actually present, which is the exact
    * windowed form of the recursive EWMA (the ninth tap's weight, 1/256,
    * is below the round(9) grid the suite emits anyway) — and, unlike the
    * recursive form, it is expressible as ONE window pass of 8 `lag`s with
    * NO sequential dependency across rows, so it parallelizes per user
    * partition instead of demanding an ordered scan of the stream.
    * [[graft.streaming.EventStreams]] runs the same math incrementally
    * with a bounded 8-value ring buffer per user.
    *
    * Determinism discipline (the [[rolling7d]] fix-once pattern, taken all
    * the way): values fix to DECIMAL(18,6) once; the tap weights 0.5^k are
    * EXACT decimal literals (0.5 … 0.0078125, ≤7 dp), so every
    * term and the 8-term sum are exact decimal arithmetic with no
    * engine-order effects; the weight sum 2−0.5^(m−1) for the m available
    * taps is a table of exact binary doubles; one division + round(9) at
    * the end, the house rule. */
  def ewmaFrom(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val weights = Seq("1.0", "0.5", "0.25", "0.125", "0.0625",
      "0.03125", "0.015625", "0.0078125")
    val num = weights.zipWithIndex.map { case (wk, k) =>
      val v = if (k == 0) col("value") else lag(col("value"), k).over(w)
      coalesce(v.cast("decimal(18,6)") * lit(new java.math.BigDecimal(wk)),
        lit(new java.math.BigDecimal(0)))
    }.reduce(_ + _)
    val m = least(row_number().over(w), lit(8))
    val denom = (1 to 8).foldLeft(lit(1.0)) { (acc, i) =>
      when(m === i, lit(2.0 - math.pow(0.5, i - 1))).otherwise(acc)
    }
    events.select(col("user_id"), col("event_id"), col("ts"), col("value"),
      round(num.cast("double") / denom, 9).as("ewma"))
  }

  def ewma(s: SparkSession, d: String): DataFrame =
    ewmaFrom(Tables.load(s, d, "events"))

  val ewmaSql: String = {
    val weights = Seq("1.0", "0.5", "0.25", "0.125", "0.0625",
      "0.03125", "0.015625", "0.0078125")
    val terms = weights.zipWithIndex.map { case (wk, k) =>
      val v = if (k == 0) "value" else s"lag(value, $k) OVER w"
      s"coalesce(CAST($v AS DECIMAL(18,6)) * $wk, 0)"
    }.mkString(" + ")
    val denom = (1 to 8).map { i =>
      s"WHEN least(rn, 8) = $i THEN ${2.0 - math.pow(0.5, i - 1)}"
    }.mkString(" ")
    s"""WITH r AS (
       |  SELECT user_id, event_id, ts, value,
       |    row_number() OVER w AS rn,
       |    $terms AS num
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, event_id, ts, value,
       |  round(CAST(num AS DOUBLE) / (CASE $denom END), 9) AS ewma
       |FROM r ORDER BY user_id, event_id""".stripMargin
  }

  /** Two-proportion z-test per event type — the experiment-analysis
    * primitive: variant from the user id's parity (the deterministic
    * stand-in for an assignment column), a user "converts" on a type iff
    * any of their events of that type has value > 150 (a TAIL threshold:
    * an any-of-many conversion at the median converts every user with a
    * dozen events and degenerates the pooled p̂ to 1 — guarded below
    * anyway), z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)) with the pooled
    * p̂. Two stacked aggregations, both partial-aggregable: per
    * (type, user) conversion flags collapse map-side before the one
    * user-keyed exchange, then the per-type A/B counts are a ~10-row
    * conditional-sum aggregate — the z arithmetic runs on a driver-sized
    * frame. Determinism: counts are integers; the z chain is explicitly
    * parenthesized identically in both engines, every step (divide,
    * multiply, sqrt) a single correctly-rounded IEEE op on identical
    * inputs, so round(9) hash-matches. */
  def abTestFrom(events: DataFrame): DataFrame = {
    val perUser = events
      .select(col("event_type"), col("user_id"),
        (col("user_id") % 2 === 0).as("is_a"),
        when(col("value") > 150, 1L).otherwise(0L).as("hit"))
      .groupBy(col("event_type"), col("is_a"), col("user_id"))
      .agg(max(col("hit")).as("converted"))
    val ab = perUser
      .groupBy(col("event_type"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("is_a"), col("converted")).otherwise(0L)).as("c_a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("is_a"), col("converted")).otherwise(0L)).as("c_b"))
    val pa = col("c_a").cast("double") / col("n_a")
    val pb = col("c_b").cast("double") / col("n_b")
    val pp = (col("c_a") + col("c_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val se = sqrt((pp * (lit(1.0) - pp)) *
      ((lit(1.0) / col("n_a")) + (lit(1.0) / col("n_b"))))
    // a fully-converted (or fully-unconverted) pool has se = 0 and no
    // defined z, and an EMPTY pool (every user of a type on one parity)
    // divides by n = 0 — Spark yields NULL there but DuckDB IEEE division
    // yields ±inf/NaN, so both cases emit NULL explicitly in both engines
    val degenerate = (col("n_a") === 0) || (col("n_b") === 0) ||
      (col("c_a") + col("c_b") === 0) ||
      (col("c_a") + col("c_b") === col("n_a") + col("n_b"))
    ab.select(col("event_type"), col("n_a"), col("c_a"), col("n_b"),
      col("c_b"),
      when(col("n_a") === 0, lit(null).cast("double"))
        .otherwise(round(pa, 6)).as("rate_a"),
      when(col("n_b") === 0, lit(null).cast("double"))
        .otherwise(round(pb, 6)).as("rate_b"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round((pa - pb) / se, 9)).as("z_score"))
  }

  def abTest(s: SparkSession, d: String): DataFrame =
    abTestFrom(Tables.load(s, d, "events"))

  val abTestSql: String =
    """WITH pu AS (
      |  SELECT event_type, user_id % 2 = 0 AS is_a, user_id,
      |         max(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS converted
      |  FROM events GROUP BY 1, 2, 3),
      |ab AS (
      |  SELECT event_type,
      |    sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
      |    sum(CASE WHEN is_a THEN converted ELSE 0 END) AS c_a,
      |    sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS n_b,
      |    sum(CASE WHEN NOT is_a THEN converted ELSE 0 END) AS c_b
      |  FROM pu GROUP BY 1)
      |SELECT event_type,
      |  CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
      |  CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
      |  CASE WHEN n_a = 0 THEN NULL
      |       ELSE round(CAST(c_a AS DOUBLE) / n_a, 6) END AS rate_a,
      |  CASE WHEN n_b = 0 THEN NULL
      |       ELSE round(CAST(c_b AS DOUBLE) / n_b, 6) END AS rate_b,
      |  CASE WHEN n_a = 0 OR n_b = 0
      |         OR c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL
      |  ELSE round((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b) /
      |    sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) *
      |          (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))) *
      |         ((1.0 / n_a) + (1.0 / n_b))), 9) END AS z_score
      |FROM ab ORDER BY event_type""".stripMargin

  /** As-of join: for each click, the most recent at-or-before purchase of
    * the same user. Spark has no native ASOF JOIN, and the naive encoding
    * (range join, then per-row argmax) expands quadratically in events per
    * user. This is the scalable union+window form: tag both sides, sort
    * within user by (ts, side), carry the last-seen purchase struct — ONE
    * shuffle on user_id, a partition-local sort, zero row expansion.
    * Deterministic tie rule, mirrored in the DuckDB ASOF twin: a
    * same-timestamp purchase counts as "before", and purchases are
    * pre-aggregated per (user, ts) with max-event_id-wins. */
  def joinAsofFrom(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("p_value"))
    val pTagged = purchases.select(col("user_id"), col("ts"),
      lit(null).cast("bigint").as("event_id"),
      lit(null).cast("double").as("value"),
      struct(col("ts").as("p_ts"), col("p_value")).as("p"),
      lit(1).as("is_p"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        lit(null).cast("struct<p_ts:timestamp,p_value:double>").as("p"),
        lit(0).as("is_p"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_p").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pTagged.unionByName(clicks)
      .withColumn("asof", last(col("p"), ignoreNulls = true).over(w))
      .where(col("is_p") === 0)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("asof.p_ts").as("p_ts"), col("asof.p_value").as("p_value"))
  }

  def joinAsof(s: SparkSession, d: String): DataFrame =
    joinAsofFrom(Tables.load(s, d, "events"))

  val joinAsofSql: String =
    """WITH p AS (
      |  SELECT user_id, ts, arg_max(value, event_id) AS p_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
      |c AS (SELECT event_id, user_id, ts, value FROM events
      |      WHERE event_type = 'click')
      |SELECT c.event_id, c.user_id, c.ts, c.value, p.ts AS p_ts, p.p_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin

  /** Range (interval) join: events matched into their session's
    * [start, end) interval — equi-join on user_id with the range
    * predicates as join conditions, so rows only meet within a user's
    * partition (no time-bucket explosion needed at this key cardinality;
    * for intervals WITHOUT an equi key the scale path is bucketing both
    * sides by coarse time grain first). Self-validating output: the
    * in-range count per session must equal the session's own n_events,
    * since gap-based sessions partition each user's timeline. */
  def joinRangeFrom(events: DataFrame): DataFrame = {
    val sessions = sessionizeFrom(events)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
    sessions.join(events.select(col("user_id"), col("ts")),
        Seq("user_id"))
      .where(col("ts") >= col("session_start") && col("ts") < col("session_end"))
      .groupBy(col("user_id"), col("session_start"), col("n_events"))
      .agg(count(lit(1)).as("n_in_range"))
  }

  def joinRange(s: SparkSession, d: String): DataFrame =
    joinRangeFrom(Tables.load(s, d, "events"))

  val joinRangeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged),
      |sessions AS (
      |  SELECT user_id, min(ts) AS session_start,
      |         max(ts) + INTERVAL 30 MINUTE AS session_end,
      |         count(*) AS n_events
      |  FROM sess GROUP BY user_id, sid)
      |SELECT s.user_id, s.session_start, s.n_events, count(*) AS n_in_range
      |FROM sessions s JOIN events e
      |  ON e.user_id = s.user_id
      | AND e.ts >= s.session_start AND e.ts < s.session_end
      |GROUP BY s.user_id, s.session_start, s.n_events
      |ORDER BY s.user_id, s.session_start""".stripMargin

  /** `events_concurrency` (oracled): per-session concurrency — for each
    * session, how many sessions (any user, itself included) were active
    * at its start instant (t.start ≤ s.start < t.end). The load-profile
    * question every capacity plan asks, and the canonical interval
    * OVERLAP join with NO equi key — the case [[joinRangeFrom]]'s doc
    * defers to "bucketing both sides by coarse time grain": this is that
    * scale path made concrete.
    *
    * Scale shape: a naive inequality self-join is a BNLJ cartesian (the
    * plan-audit ban). Instead, candidates meet on an INTEGER hour bucket
    * — the probe side keys by bucket(s.start) (one row per session), the
    * build side explodes each session into the hour buckets it spans
    * (fan-out = ceil(duration/1h)+1, bounded by the 30-min session gap +
    * data horizon, never corpus-sized) — then the exact predicate
    * decides. Each overlapping pair meets EXACTLY once (t overlaps
    * s.start ⟹ t spans bucket(s.start), and the build side lists each
    * of t's buckets once), so no dedup pass is needed. Buckets are
    * integer `div` on epoch seconds — exact, no float-floor boundary
    * flips — and the build side's upper bucket is bucket(t_end)
    * INCLUSIVE: `unix_timestamp` truncates sub-second fractions, so the
    * tighter `(unix(t_end)-1) div 3600` bound would drop an overlap
    * whose t_end falls fractionally past an exact hour boundary
    * (t_end=01:00:00.5 truncates to 01:00:00; minus one second lands in
    * the PREVIOUS bucket, missing s_start=01:00:00.2). The inclusive
    * bound covers every overlap (truncation is monotone: s.start < t_end
    * ⟹ bucket(s.start) ≤ bucket(t_end)) at the cost of at most one
    * extra candidate bucket per session, which the exact predicate then
    * discards — and each pair still meets at most once, because the
    * probe keys on a single bucket. One hash join + one
    * partial-aggregable count; the only
    * corpus-sized exchanges are the sessionization and the bucket join.
    * The DuckDB twin states the same semantics as the direct inequality
    * join (its IEJoin), so the bucketing itself is oracle-audited. */
  def eventsConcurrencyFrom(events: DataFrame): DataFrame = {
    val sess = sessionizeFrom(events)
      .select(col("user_id"), col("session_start"), col("session_end"))
      .localCheckpoint() // probe + build sides: sessionize once, not twice
    val probe = sess.select(col("user_id"), col("session_start"),
      expr("unix_timestamp(session_start) div 3600").as("bkt"))
    val build = sess.select(
      col("session_start").as("t_start"), col("session_end").as("t_end"),
      explode(expr(
        """sequence(unix_timestamp(session_start) div 3600,
          |         unix_timestamp(session_end) div 3600)""".stripMargin))
        .as("bkt"))
    probe.join(build, Seq("bkt"))
      .where(col("t_start") <= col("session_start")
        && col("session_start") < col("t_end"))
      .groupBy(col("user_id"), col("session_start"))
      .agg(count(lit(1)).as("n_concurrent"))
  }

  def eventsConcurrency(s: SparkSession, d: String): DataFrame =
    eventsConcurrencyFrom(Tables.load(s, d, "events"))

  val eventsConcurrencySql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged),
      |sessions AS (
      |  SELECT user_id, min(ts) AS session_start,
      |         max(ts) + INTERVAL 30 MINUTE AS session_end
      |  FROM sess GROUP BY user_id, sid)
      |SELECT s.user_id, s.session_start, count(*) AS n_concurrent
      |FROM sessions s JOIN sessions t
      |  ON t.session_start <= s.session_start
      | AND s.session_start < t.session_end
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Day-N retention cohorts: users grouped by their first-seen day, then
    * for each later active day the distinct-user count at that day
    * offset (0..7). Two shuffles — the per-user cohort aggregate and the
    * final (cohort, offset) count — with the (user, day) activity frame
    * deduped BEFORE the join so the fact side shrinks from events to
    * user-days first. */
  def eventsRetention(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.load(s, d, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val cohort = ud.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ud.join(cohort, Seq("user_id"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"),
        col("user_id"))
      .where(col("day_offset") <= 7)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val eventsRetentionSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
      |            FROM events),
      |cohort AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1)
      |SELECT c.cohort_day,
      |       CAST(date_diff('day', c.cohort_day, ud.day) AS INT) AS day_offset,
      |       count(DISTINCT ud.user_id) AS n_users
      |FROM ud JOIN cohort c USING (user_id)
      |WHERE date_diff('day', c.cohort_day, ud.day) <= 7
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Ordered funnel: view → click → purchase, strictly time-ordered per
    * user (a click only counts after the user's FIRST view, a purchase
    * only after that first qualifying click). Three conditional-min
    * aggregations chained by joins on user_id — each stage shuffles once
    * on the same high-cardinality key, and stage N's frame is one row per
    * surviving user, so the joins shrink monotonically. Stage counts come
    * out as one 3-row union of scalar aggregates. */
  def eventsFunnel(s: SparkSession, d: String): DataFrame = {
    val e = Tables.load(s, d, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val c = e.where(col("event_type") === "click").join(v, Seq("user_id"))
      .where(col("ts") > col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
    val p = e.where(col("event_type") === "purchase").join(c, Seq("user_id"))
      .where(col("ts") > col("c_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    v.agg(count(lit(1)).as("n_users"))
      .select(lit("1_view").as("stage"), col("n_users"))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .select(lit("3_view_click_purchase").as("stage"), col("n_users")))
      .unionByName(c.agg(count(lit(1)).as("n_users"))
        .select(lit("2_view_click").as("stage"), col("n_users")))
  }

  val eventsFunnelSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(ts) AS c_ts FROM events e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND ts > v_ts GROUP BY 1),
      |p AS (SELECT e.user_id, min(ts) AS p_ts FROM events e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND ts > c_ts GROUP BY 1)
      |SELECT '1_view' AS stage, count(*) AS n_users FROM v
      |UNION ALL SELECT '2_view_click', count(*) FROM c
      |UNION ALL SELECT '3_view_click_purchase', count(*) FROM p
      |ORDER BY stage""".stripMargin

  /** The view→purchase attribution INTERVAL JOIN as joined pairs — every
    * (purchase, preceding view within 1 h by the same user). Factored out
    * so the streaming twin ([[graft.streaming.EventStreams
    * .attributionStream]]) runs the IDENTICAL join expression as a
    * watermarked stream-stream join; parity on the pair set is asserted
    * in StreamingSpec. Inner join: pairs only. */
  def attributionPairsFrom(events: DataFrame): DataFrame = {
    val views = events.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
    purchases.join(views,
      col("v_user") === col("user_id") &&
        col("view_ts") <= col("p_ts") &&
        col("view_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("event_id"), col("user_id"), col("view_ts"), col("p_ts"))
  }

  /** Per-purchase attribution counts: how many views by the same user in
    * the hour before each purchase (0 kept via left join). The equi-key
    * (user_id) carries the join — the time bound is a post-probe filter,
    * so this shuffles both sides once on user_id, never a cartesian; at
    * skew (one hot user) the interval bound caps the per-key pair
    * blow-up at views-per-hour × purchases of that user. */
  def eventsAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.load(s, d, "events")
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
    purchases.join(views,
        col("v_user") === col("user_id") &&
          col("view_ts") <= col("p_ts") &&
          col("view_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
        "left_outer")
      .groupBy(col("event_id"), col("user_id"), col("p_ts"))
      .agg(count(col("view_ts")).as("n_views_1h"))
  }

  val eventsAttributionSql: String =
    """WITH v AS (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'),
      |p AS (SELECT event_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.p_ts, count(v.view_ts) AS n_views_1h
      |FROM p LEFT JOIN v
      |  ON v.user_id = p.user_id
      | AND v.view_ts <= p.p_ts AND v.view_ts >= p.p_ts - INTERVAL 1 HOUR
      |GROUP BY p.event_id, p.user_id, p.p_ts
      |ORDER BY p.event_id""".stripMargin

  /** Within-session behavior transition matrix — the first-order Markov
    * view of user paths (what follows what): for every pair of
    * CONSECUTIVE events of a user closer than the 30-min session gap
    * (the [[sessionize]] break rule, spelled with the same lag window as
    * its SQL twin), count (from_type → to_type) and give each row its
    * share among transitions leaving from_type. Counts are exact
    * integers; the share is one division of two BIGINTs + round(6) —
    * engine-deterministic, so the whole matrix hash-oracles.
    *
    * Scale shape: ONE corpus-sized exchange (the per-user window — hash
    * partitioned on user_id, same as every sessionization here), then a
    * map-side-combined aggregate onto ≤ |event_types|² rows; the share
    * window runs on that bounded frame, partitioned by from_type (never
    * a single global partition). */
  def eventsTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.load(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .where(col("from_type").isNotNull &&
        col("ts") < col("prev_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    pairs.withColumn("share",
      round(col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(Window.partitionBy(col("from_type"))),
        6))
  }

  val eventsTransitionsSql: String =
    """WITH pairs AS (
      |  SELECT lag(event_type) OVER w AS from_type,
      |         event_type AS to_type,
      |         lag(ts) OVER w AS prev_ts, ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |t AS (
      |  SELECT from_type, to_type, count(*) AS n_transitions
      |  FROM pairs
      |  WHERE from_type IS NOT NULL
      |    AND ts < prev_ts + INTERVAL 30 MINUTE
      |  GROUP BY 1, 2)
      |SELECT from_type, to_type, n_transitions,
      |       round(CAST(n_transitions AS DOUBLE) /
      |             sum(n_transitions) OVER (PARTITION BY from_type), 6) AS share
      |FROM t ORDER BY from_type, to_type""".stripMargin

  /** Second-order path mining — the natural next step after
    * [[eventsTransitions]]'s first-order matrix: counts of event-type
    * TRIGRAMS along each user's timeline where BOTH hops fall inside the
    * family's 30-minute session gap, plus each trigram's share among its
    * (t1, t2) prefix — i.e. the second-order Markov answer to "given the
    * last two actions, what comes next". One row per observed trigram.
    *
    * Scale shape: the two lags ride ONE user-partitioned sort window (the
    * eventsTransitions shape — user timelines are the natural partition
    * and no user's history is unbounded within a day-scale corpus), the
    * trigram count is a partial-aggregable groupBy collapsing to
    * ≤ |types|³ rows, and the prefix-share window runs on that bounded
    * frame, not the corpus. Counts are exact integers; share is one
    * integer-ratio round(6) — hash-oracles. */
  def eventsPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tris = Tables.load(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lag(col("event_type"), 1).over(w))
      .withColumn("ts2", lag(col("ts"), 1).over(w))
      .withColumn("t1", lag(col("event_type"), 2).over(w))
      .withColumn("ts1", lag(col("ts"), 2).over(w))
      .where(col("t1").isNotNull &&
        col("ts2") < col("ts1") + expr("INTERVAL 30 MINUTES") &&
        col("ts") < col("ts2") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n_paths"))
    tris.withColumn("share",
      round(col("n_paths").cast("double") /
        sum(col("n_paths")).over(
          Window.partitionBy(col("t1"), col("t2"))), 6))
  }

  val eventsPathsSql: String =
    """WITH tris AS (
      |  SELECT lag(event_type, 2) OVER w AS t1,
      |         lag(ts, 2) OVER w AS ts1,
      |         lag(event_type) OVER w AS t2,
      |         lag(ts) OVER w AS ts2,
      |         event_type AS t3, ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |t AS (
      |  SELECT t1, t2, t3, count(*) AS n_paths
      |  FROM tris
      |  WHERE t1 IS NOT NULL
      |    AND ts2 < ts1 + INTERVAL 30 MINUTE
      |    AND ts < ts2 + INTERVAL 30 MINUTE
      |  GROUP BY 1, 2, 3)
      |SELECT t1, t2, t3, n_paths,
      |       round(CAST(n_paths AS DOUBLE) /
      |             sum(n_paths) OVER (PARTITION BY t1, t2), 6) AS share
      |FROM t ORDER BY t1, t2, t3""".stripMargin

  /** `events_markov_stationary` (oracled): the long-run visit share of
    * each event type under the observed session dynamics — the power
    * iteration π ← πP over [[eventsTransitions]]' first-order matrix
    * ("where does user attention settle?", the Markov answer the
    * transition shares only give one hop of). States are ALL observed
    * event types; a type with no outgoing within-session transition (a
    * terminal action) is a dangling row distributed uniformly, the
    * PageRank convention, so P is stochastic and the chain has a
    * stationary point.
    *
    * Scale shape: the distributed work is ONE windowed corpus pass for
    * the transition counts (the eventsTransitions plan) plus one
    * column-pruned distinct for the state set; both collapse to bounded
    * models (≤|types|² counts, ≤|types| states — the embedding_kmeans
    * model-collect class, NOT a corpus collect). The 40 power-iteration
    * rounds then run on the driver over that ≤|types|²-cell matrix —
    * 64-ish multiplications per round beats 40 distributed jobs of
    * 64-cell work by three orders of magnitude in scheduling overhead,
    * and the model size is invariant in corpus size.
    *
    * Float discipline: the iteration is EXACT-INTEGER — π lives in
    * 1e-12 "picounits" (BIGINT-scale), each term is one round-half-up
    * integer division share(v,den) = ⌊(2v+den)/(2den)⌋ over exact
    * products (BigInt here, HUGEINT in the twin — n·π can pass 2^63 at
    * corpus scale even though π itself never does), and the per-round
    * sum is an order-free integer sum. Both engines therefore compute
    * the IDENTICAL integer sequence; the only float op is the final
    * π/1e12 division + round(6), which runs in Spark (not Scala) so the
    * rounding path is the repo-standard Spark-vs-DuckDB round pair.
    * Σπ drifts from 1e12 by at most |types|²/2 picounits per round
    * (rounded divisions) — irrelevant at the 6-dp output grid. */
  def eventsMarkovStationary(s: SparkSession, d: String,
                             iterations: Int = 40): DataFrame =
    eventsMarkovStationaryFrom(s, Tables.load(s, d, "events"), iterations)

  def eventsMarkovStationaryFrom(s: SparkSession, ev: DataFrame,
                                 iterations: Int = 40): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = ev
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .where(col("from_type").isNotNull &&
        col("ts") < col("prev_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val states = ev.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted
    val m = states.length
    val rowsum: Map[String, Long] =
      counts.groupMapReduce(_._1._1)(_._2)(_ + _)
    val scale = BigInt(10).pow(12)
    def share(v: BigInt, den: BigInt): BigInt = (2 * v + den) / (2 * den)
    var pi: Map[String, BigInt] = states.map(_ -> share(scale, m)).toMap
    for (_ <- 1 to iterations) {
      val next = scala.collection.mutable.Map.empty[String, BigInt]
        .withDefaultValue(BigInt(0))
      for (f <- states) rowsum.get(f) match {
        case Some(rs) =>
          for (t <- states; n <- counts.get((f, t)))
            next(t) += share(pi(f) * n, BigInt(rs))
        case None =>
          val t0 = share(pi(f), m)
          for (t <- states) next(t) += t0
      }
      pi = states.map(st => st -> next(st)).toMap
    }
    val sp = s
    import sp.implicits._
    states.toSeq.map(st => (st, pi(st).toLong)).toDF("event_type", "pi_raw")
      .select(col("event_type"),
        round(col("pi_raw").cast("double") / lit(1.0e12), 6).as("pi"))
  }

  /** DuckDB twin: the same integer fixpoint, unrolled — one HUGEINT
    * matrix CTE (observed rows ∪ dangling uniform rows; zero-count cells
    * contribute share(0)=0 exactly as the Scala loop's skip does) and
    * `iterations` join+sum CTEs over it. HUGEINT sums are exact and
    * order-free, so the CTE chain reproduces the driver loop's integer
    * sequence bit-for-bit. Every CTE is MATERIALIZED — DuckDB inlines
    * CTEs by default, and a 40-deep chain each inlining `mat` (itself a
    * 3-way join) blows the planner up exponentially (measured: the
    * un-hinted twin doesn't finish; the MATERIALIZED one is
    * milliseconds). The graph family's unrolled twins use the same
    * discipline. */
  def eventsMarkovStationarySql(iterations: Int = 40): String = {
    val rounds = (1 to iterations).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT mat.t2 AS s,
         |         sum((CAST(2 AS HUGEINT) * p.pi * mat.n + mat.rs) //
         |             (CAST(2 AS HUGEINT) * mat.rs)) AS pi
         |  FROM mat JOIN p${i - 1} p ON p.s = mat.f GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS MATERIALIZED (
       |  SELECT from_type, to_type, count(*) AS n
       |  FROM (
       |    SELECT lag(event_type) OVER w AS from_type,
       |           event_type AS to_type,
       |           lag(ts) OVER w AS prev_ts, ts
       |    FROM events
       |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |  WHERE from_type IS NOT NULL
       |    AND ts < prev_ts + INTERVAL 30 MINUTE
       |  GROUP BY 1, 2),
       |states AS MATERIALIZED (SELECT DISTINCT event_type AS s FROM events),
       |mcount AS MATERIALIZED (
       |  SELECT CAST(count(*) AS HUGEINT) AS m FROM states),
       |rowsum AS MATERIALIZED (
       |  SELECT from_type, sum(n) AS rs FROM t GROUP BY 1),
       |mat AS MATERIALIZED (
       |  SELECT f.s AS f, g.s AS t2,
       |    CASE WHEN r.rs IS NULL THEN CAST(1 AS HUGEINT)
       |         ELSE CAST(COALESCE(t.n, 0) AS HUGEINT) END AS n,
       |    CASE WHEN r.rs IS NULL THEN (SELECT m FROM mcount)
       |         ELSE CAST(r.rs AS HUGEINT) END AS rs
       |  FROM states f CROSS JOIN states g
       |  LEFT JOIN rowsum r ON r.from_type = f.s
       |  LEFT JOIN t ON t.from_type = f.s AND t.to_type = g.s),
       |p0 AS MATERIALIZED (
       |  SELECT s, (CAST(2000000000000 AS HUGEINT) + m) //
       |            (CAST(2 AS HUGEINT) * m) AS pi
       |  FROM states CROSS JOIN mcount),
       |$rounds
       |SELECT s AS event_type,
       |       round(CAST(pi AS DOUBLE) / 1000000000000.0, 6) AS pi
       |FROM p$iterations ORDER BY event_type""".stripMargin
  }

  /** Per-type linear trend over daily event counts — the capacity-
    * planning / drift-direction primitive completing [[eventsAnomaly]]
    * (pointwise outliers) and [[eventsCusum]] (change points): an OLS
    * slope in events/day over the type's daily series. Slope is
    * shift-invariant, so the regressor is the raw epoch day — no per-type
    * min-day pass — and every moment (Σx, Σy, Σx², Σxy) is an exact
    * integer accumulated in DECIMAL(38,0) (the [[eventsAnomaly]]
    * overflow discipline: epoch-day⁴-scale products wrap 64 bits).
    * slope/intercept are then 4 identically-parenthesized IEEE ops on
    * exact numerators — hash-oracles. Single-day types emit NULL (the
    * n=0 A/B-pool rule). Shape: ONE corpus shuffle to the daily grid
    * (calendar-bounded: days×types rows), then a ≤|types|-row aggregate
    * — at 100 TB the daily grid is KBs regardless of event volume. */
  /** Holt linear (double-exponential) smoothing forecast per event type:
    * a 7-day horizon from adaptively-smoothed level + trend state — the
    * short-horizon ops-forecasting twin of [[eventsTrend]]'s GLOBAL OLS
    * line (OLS weighs January like yesterday; Holt's geometric decay
    * tracks the recent regime, which is what capacity planning wants).
    *
    * Definition (both engines mirror it exactly): daily counts on the
    * corpus-wide dense day grid (absent days are true zeros), state in
    * integer microunits, α = 1/4, β = 1/8 as exact rationals, init
    * L₁ = y₁·S and T₁ = (y₂−y₁)·S, then for t = 2..n
    *   Lₜ = ⌊(yₜ·S + 3(Lₜ₋₁+Tₜ₋₁))/4⌋,  Tₜ = ⌊((Lₜ−Lₜ₋₁) + 7Tₜ₋₁)/8⌋
    * with FLOOR division (the driver loop's BigInt fdiv; the twin
    * emulates it — see [[eventsHoltSql]], DuckDB's `//` truncates —
    * because trend goes negative on decaying series, exactly where
    * truncation and floor diverge). Forecast(h) = Lₙ + h·Tₙ,
    * h = 1..horizon. All integer, so the
    * hash anchor `forecast_micro` is bit-exact at any scale; the double
    * display column divides by 10⁶ and rounds to the house grid.
    *
    * Exactness law (spec-pinned): on an exact linear ramp y = a + b·t
    * the invariant L = yₜ·S, T = b·S holds from init (the update's
    * algebra cancels), so the forecast is exactly (yₙ + h·b)·S.
    *
    * Scale shape: ONE corpus shuffle to the (type, day) grid —
    * calendar-bounded (days×types rows, KBs at any event volume) — then
    * the sequential recursion runs on the collected model (the
    * [[eventsMarkovStationary]] bounded-model class; a 30-step linear
    * recurrence is driver work, not 30 distributed jobs). Twin: a
    * RECURSIVE CTE marching the same state day by day. */
  def eventsHolt(s: SparkSession, d: String, horizon: Int = 7): DataFrame =
    eventsHoltFrom(s, Tables.load(s, d, "events"), horizon)

  def eventsHoltFrom(s: SparkSession, ev: DataFrame,
                     horizon: Int = 7): DataFrame = {
    val daily = ev
      .groupBy(datediff(date_trunc("day", col("ts")),
        lit("1970-01-01").cast("date")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(1), r.getInt(0)) -> r.getLong(2))
      .toMap
    val sp0 = s
    import sp0.implicits._
    // empty corpus: zero rows, matching the twin (whose daily CTE is
    // empty so the recursion never starts) — r12 advice: min/max over an
    // empty key set must not throw where the oracle returns nothing
    if (daily.isEmpty)
      return Seq.empty[(String, Int, Long, Double)]
        .toDF("event_type", "h", "forecast_micro", "forecast")
    val types = daily.keys.map(_._1).toSeq.distinct.sorted
    val dmin = daily.keys.map(_._2).min
    val dmax = daily.keys.map(_._2).max
    val S = BigInt(1000000)
    def fdiv(a: BigInt, b: BigInt): BigInt = { // floor division, b > 0
      val (q, r) = a /% b
      if (r.signum < 0) q - 1 else q
    }
    val rows = types.flatMap { t =>
      val ys = (dmin to dmax).map(dd => BigInt(daily.getOrElse((t, dd), 0L)))
      var l = ys.head * S
      var tr = (if (ys.length > 1) ys(1) - ys.head else BigInt(0)) * S
      for (i <- 1 until ys.length) {
        val lNew = fdiv(ys(i) * S + 3 * (l + tr), 4)
        tr = fdiv((lNew - l) + 7 * tr, 8)
        l = lNew
      }
      (1 to horizon).map { h =>
        val v = l + h * tr
        // .toLong would silently wrap where the twin's CAST(.. AS BIGINT)
        // errors — fail loudly on both engines instead (r12 advice)
        require(v.isValidLong, s"eventsHolt: forecast_micro overflows Long ($v)")
        (t, h, v.toLong)
      }
    }
    rows.toDF("event_type", "h", "forecast_micro")
      .select(col("event_type"), col("h"), col("forecast_micro"),
        round(col("forecast_micro").cast("double") / lit(1000000.0), 3)
          .as("forecast"))
  }

  /** DuckDB twin of [[eventsHolt]]: the same day-marching recurrence as
    * a RECURSIVE CTE carrying (type, next-day, L, T) — linear recursion,
    * one working set per step, so no MATERIALIZED gymnastics needed
    * (unlike the unrolled fixpoint twins). TRAP: DuckDB's `//` TRUNCATES
    * toward zero (measured: -7 // 2 = -3), it is NOT floor division —
    * and the trend is negative whenever a series decays, so the twin
    * emulates the driver loop's floor via the modular identity
    * ⌊a/b⌋ = (a − ((a % b + b) % b)) / b (the subtraction makes the
    * numerator exactly divisible, so the final `//` never rounds). */
  def eventsHoltSql(horizon: Int = 7): String = {
    def fd(a: String, b: Int): String =
      s"(($a) - (((($a) % $b) + $b) % $b)) // $b"
    val lNew = fd("g.y * 1000000 + 3 * (r.l + r.tr)", 4)
    val trNew = fd("x.lNew - x.l + 7 * x.tr", 8)
    s"""WITH RECURSIVE daily AS MATERIALIZED (
       |  SELECT event_type,
       |         datediff('day', DATE '1970-01-01', date_trunc('day', ts)) AS day,
       |         count(*) AS y
       |  FROM events GROUP BY 1, 2),
       |bounds AS MATERIALIZED (
       |  SELECT min(day) AS dmin, max(day) AS dmax FROM daily),
       |grid AS MATERIALIZED (
       |  SELECT t.event_type, g.day, CAST(COALESCE(d.y, 0) AS HUGEINT) AS y
       |  FROM (SELECT DISTINCT event_type FROM daily) t
       |  CROSS JOIN (SELECT unnest(generate_series(dmin, dmax)) AS day
       |              FROM bounds) g
       |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = g.day),
       |rec(event_type, i, dmax, l, tr) AS (
       |  SELECT g1.event_type, g1.day + 1, b.dmax,
       |         g1.y * 1000000,
       |         COALESCE(g2.y - g1.y, 0) * 1000000
       |  FROM bounds b
       |  JOIN grid g1 ON g1.day = b.dmin
       |  LEFT JOIN grid g2 ON g2.event_type = g1.event_type
       |                   AND g2.day = b.dmin + 1
       |  UNION ALL
       |  SELECT x.event_type, x.i + 1, x.dmax, x.lNew,
       |         $trNew
       |  FROM (SELECT r.event_type, r.i, r.dmax, r.l, r.tr,
       |               $lNew AS lNew
       |        FROM rec r JOIN grid g ON g.event_type = r.event_type
       |                              AND g.day = r.i
       |        WHERE r.i <= r.dmax) x)
       |SELECT event_type, CAST(h.h AS INT) AS h,
       |       CAST(l + h.h * tr AS BIGINT) AS forecast_micro,
       |       round(CAST(l + h.h * tr AS DOUBLE) / 1000000.0, 3) AS forecast
       |FROM rec CROSS JOIN (SELECT unnest(generate_series(1, $horizon)) AS h) h
       |WHERE i = dmax + 1
       |ORDER BY event_type, h""".stripMargin
  }

  /** `events_holt_winters` (oracled): additive Holt–Winters — level +
    * trend + WEEKLY seasonality (P = 7) over the same corpus-wide dense
    * daily grid as [[eventsHolt]]. [[eventsHeatmap]] (hash-green) already
    * proves the events table has hour-of-week structure; Holt alone
    * aliases that weekly cycle into its trend state, while the seasonal
    * component absorbs it and forecasts each weekday on its own baseline —
    * the form ops capacity planning actually uses for weekly-periodic
    * load.
    *
    * Definition (both engines mirror it exactly): α = 1/4, β = 1/8,
    * γ = 1/4 as exact rationals, state in integer microunits, FLOOR
    * division throughout (the [[eventsHolt]] fdiv discipline — the twin
    * emulates floor via the modular identity because DuckDB's `//`
    * truncates). Init over the first two weeks (classic HW init):
    * L = ⌊mean(week₁)·S⌋, T = ⌊(Σweek₂ − Σweek₁)·S / P²⌋,
    * Sᵢ = yᵢ·S − L for the first P days; then for each day t > P
    *   Lₜ = ⌊(yₜ·S − Sₜ₋ₚ + 3(Lₜ₋₁+Tₜ₋₁)) / 4⌋
    *   Tₜ = ⌊((Lₜ−Lₜ₋₁) + 7Tₜ₋₁) / 8⌋
    *   Sₜ = ⌊(yₜ·S − Lₜ + 3Sₜ₋ₚ) / 4⌋
    * Forecast(h) = Lₙ + h·Tₙ + Sₙ₊ₕ₋ₚ for h = 1..P. All integer, so
    * `forecast_micro` is the bit-exact hash anchor; a span under 2P days
    * (seasonal init needs two full weeks) yields ZERO rows on both
    * engines, as does an empty corpus.
    *
    * Scale shape: identical to [[eventsHolt]] — ONE corpus shuffle to the
    * calendar-bounded (type, day) grid, then a driver-side linear
    * recurrence over the collected KB-scale model; the twin is the same
    * RECURSIVE-CTE day march carrying the rotating P-slot seasonal state
    * as columns. */
  def eventsHoltWinters(s: SparkSession, d: String,
                        horizon: Int = 7): DataFrame =
    eventsHoltWintersFrom(s, Tables.load(s, d, "events"), horizon)

  private val HwPeriod = 7

  def eventsHoltWintersFrom(s: SparkSession, ev: DataFrame,
                            horizon: Int = 7): DataFrame = {
    require(horizon >= 1 && horizon <= HwPeriod,
      s"eventsHoltWinters: horizon must be in 1..$HwPeriod (one seasonal cycle)")
    val daily = ev
      .groupBy(datediff(date_trunc("day", col("ts")),
        lit("1970-01-01").cast("date")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(1), r.getInt(0)) -> r.getLong(2))
      .toMap
    val sp0 = s
    import sp0.implicits._
    def empty = Seq.empty[(String, Int, Long, Double)]
      .toDF("event_type", "h", "forecast_micro", "forecast")
    if (daily.isEmpty) return empty
    val types = daily.keys.map(_._1).toSeq.distinct.sorted
    val dmin = daily.keys.map(_._2).min
    val dmax = daily.keys.map(_._2).max
    if (dmax - dmin + 1 < 2 * HwPeriod) return empty
    val S = BigInt(1000000)
    def fdiv(a: BigInt, b: BigInt): BigInt = { // floor division, b > 0
      val (q, r) = a /% b
      if (r.signum < 0) q - 1 else q
    }
    val rows = types.flatMap { t =>
      val ys = (dmin to dmax).map(dd => BigInt(daily.getOrElse((t, dd), 0L)))
      val w1 = ys.take(HwPeriod).sum
      val w2 = ys.slice(HwPeriod, 2 * HwPeriod).sum
      var l = fdiv(w1 * S, HwPeriod)
      var tr = fdiv((w2 - w1) * S, HwPeriod * HwPeriod)
      // rotating seasonal state: slot 0 is always S_{t-P} for the next day
      var seas = ys.take(HwPeriod).map(_ * S - l).toVector
      for (i <- HwPeriod until ys.length) {
        val sOld = seas.head
        val lNew = fdiv(ys(i) * S - sOld + 3 * (l + tr), 4)
        tr = fdiv((lNew - l) + 7 * tr, 8)
        val sNew = fdiv(ys(i) * S - lNew + 3 * sOld, 4)
        l = lNew
        seas = seas.tail :+ sNew
      }
      (1 to horizon).map { h =>
        val v = l + h * tr + seas(h - 1)
        require(v.isValidLong,
          s"eventsHoltWinters: forecast_micro overflows Long ($v)")
        (t, h, v.toLong)
      }
    }
    rows.toDF("event_type", "h", "forecast_micro")
      .select(col("event_type"), col("h"), col("forecast_micro"),
        round(col("forecast_micro").cast("double") / lit(1000000.0), 3)
          .as("forecast"))
  }

  /** DuckDB twin of [[eventsHoltWinters]]: the [[eventsHoltSql]] RECURSIVE
    * day march, with the rotating 7-slot seasonal state carried as columns
    * s1..s7 (s1 = Sₜ₋ₚ for the day about to be processed; each step shifts
    * left and appends the new seasonal). Floor division via the same
    * modular identity; the 2-week init gate lives in `bounds` (HAVING on
    * the span), so a short or empty corpus yields zero rows — matching the
    * Scala guard. */
  def eventsHoltWintersSql(horizon: Int = 7): String = {
    def fd(a: String, b: Int): String =
      s"((($a) - (((($a) % $b) + $b) % $b)) // $b)"
    val lNew = fd("g.y * 1000000 - r.s1 + 3 * (r.l + r.tr)", 4)
    val trNew = fd("x.lNew - x.l + 7 * x.tr", 8)
    val sNew = fd("x.y * 1000000 - x.lNew + 3 * x.s1", 4)
    val initL = fd("w1 * 1000000", 7)
    val initT = fd("(w2 - w1) * 1000000", 49)
    val yCols = (0 to 6).map(k =>
      s"max(CASE WHEN g.day = b.dmin + $k THEN g.y END) AS y$k").mkString(",\n       ")
    val sInit = (0 to 6).map(k => s"y$k * 1000000 - l").mkString(", ")
    val seasCase = "CASE h.h " +
      (1 to 7).map(k => s"WHEN $k THEN s$k").mkString(" ") + " END"
    s"""WITH RECURSIVE daily AS MATERIALIZED (
       |  SELECT event_type,
       |         datediff('day', DATE '1970-01-01', date_trunc('day', ts)) AS day,
       |         count(*) AS y
       |  FROM events GROUP BY 1, 2),
       |bounds AS MATERIALIZED (
       |  SELECT min(day) AS dmin, max(day) AS dmax FROM daily
       |  HAVING max(day) - min(day) + 1 >= 14),
       |grid AS MATERIALIZED (
       |  SELECT t.event_type, g.day, CAST(COALESCE(d.y, 0) AS HUGEINT) AS y
       |  FROM (SELECT DISTINCT event_type FROM daily) t
       |  CROSS JOIN (SELECT unnest(generate_series(dmin, dmax)) AS day
       |              FROM bounds) g
       |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = g.day),
       |init0 AS MATERIALIZED (
       |  SELECT g.event_type, b.dmin, b.dmax,
       |       sum(CASE WHEN g.day < b.dmin + 7 THEN g.y
       |                ELSE CAST(0 AS HUGEINT) END) AS w1,
       |       sum(CASE WHEN g.day >= b.dmin + 7 AND g.day < b.dmin + 14
       |                THEN g.y ELSE CAST(0 AS HUGEINT) END) AS w2,
       |       $yCols
       |  FROM grid g CROSS JOIN bounds b
       |  GROUP BY 1, 2, 3),
       |init1 AS MATERIALIZED (
       |  SELECT *, $initL AS l, $initT AS tr FROM init0),
       |rec(event_type, i, dmax, l, tr, s1, s2, s3, s4, s5, s6, s7) AS (
       |  SELECT event_type, dmin + 7, dmax, l, tr, $sInit
       |  FROM init1
       |  UNION ALL
       |  SELECT x.event_type, x.i + 1, x.dmax, x.lNew,
       |         $trNew,
       |         x.s2, x.s3, x.s4, x.s5, x.s6, x.s7,
       |         $sNew
       |  FROM (SELECT r.*, g.y, $lNew AS lNew
       |        FROM rec r JOIN grid g ON g.event_type = r.event_type
       |                              AND g.day = r.i
       |        WHERE r.i <= r.dmax) x)
       |SELECT event_type, CAST(h.h AS INT) AS h,
       |       CAST(l + h.h * tr + $seasCase AS BIGINT) AS forecast_micro,
       |       round(CAST(l + h.h * tr + $seasCase AS DOUBLE) / 1000000.0, 3)
       |         AS forecast
       |FROM rec CROSS JOIN (SELECT unnest(generate_series(1, $horizon)) AS h) h
       |WHERE i = dmax + 1
       |ORDER BY event_type, h""".stripMargin
  }

  def eventsTrend(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.load(s, d, "events")
      .groupBy(datediff(date_trunc("day", col("ts")),
        lit("1970-01-01").cast("date")).as("x"), col("event_type"))
      .agg(count(lit(1)).as("y"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("y")).as("sy"),
        sum(dec(col("x"))).as("sx"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
    val num = dec(col("n_days")) * col("sxy") - col("sx") * dec(col("sy"))
    val den = dec(col("n_days")) * col("sxx") - col("sx") * col("sx")
    val slope = num.cast("double") / den.cast("double")
    m.select(col("event_type"), col("n_days"),
      col("sy").cast("long").as("total"),
      when(col("n_days") < 2, lit(null).cast("double"))
        .otherwise(round(slope, 9)).as("slope"),
      when(col("n_days") < 2, lit(null).cast("double"))
        .otherwise(round(
          (col("sy").cast("double") - slope * col("sx").cast("double")) /
            col("n_days").cast("double"), 6)).as("intercept"))
  }

  /** Shared Cramer arithmetic for [[eventsRidge]]: the four 3×3
    * determinants as SQL over the pre-cast moment columns (n_, st, stt,
    * sw, swt, sy, sty, swy) — identical text in both dialects, so the
    * solve exists ONCE (the motif-lookup convention). A = XᵀX + λI for
    * X = [1, t, w]; A is symmetric positive definite for λ > 0, so
    * det(A) > 0 and the floor divisions below have a positive
    * denominator. */
  private def ridgeDetSql(lam: Long): (String, String, String, String) = {
    def det(c1: (String, String, String), c2: (String, String, String),
            c3: (String, String, String)): String = {
      val ((x1, y1, z1), (x2, y2, z2), (x3, y3, z3)) = (c1, c2, c3)
      s"($x1 * ($y2 * $z3 - $z2 * $y3) - $x2 * ($y1 * $z3 - $z1 * $y3)" +
        s" + $x3 * ($y1 * $z2 - $z1 * $y2))"
    }
    val a1 = (s"(n_ + $lam)", "st", "sw")
    val a2 = ("st", s"(stt + $lam)", "swt")
    val a3 = ("sw", "swt", s"(sw + $lam)")
    val b = ("sy", "sty", "swy")
    (det(a1, a2, a3), det(b, a2, a3), det(a1, b, a3), det(a1, a2, b))
  }

  /** `events_ridge` (oracled): per-type ridge regression of the daily
    * count on [intercept, day index, weekend flag] — the multivariate
    * step past [[eventsTrend]]'s simple OLS, and the canonical
    * demonstration that a GLM at 100 TB is ONE aggregate: the normal
    * equations (XᵀX + λI)θ = Xᵀy need only the 8 sufficient-statistic
    * sums (n, Σt, Σt², Σw, Σwt, Σy, Σty, Σwy — w² = w for a flag), so
    * the corpus collapses map-side to ≤|types| moment rows and the
    * solve is a per-row projection. d = 3 means Cramer's rule IS the
    * solver, in exact DECIMAL(38,0)/HUGEINT integer arithmetic — no
    * float linear algebra anywhere, θ̂ emitted as ⌊10⁶·det(A_j)/det(A)⌋
    * micro anchors.
    *
    * Determinism notes: t is days since the GLOBAL min day (a 1-row
    * broadcast anchor, the events_survival shape) — keeping t span-
    * bounded keeps every determinant under ~10²² on this corpus (the
    * DECIMAL(38,0) budget holds to ~30k-day spans); w derives from the
    * pure-integer `pmod(epoch_day + 4, 7) ∈ {0, 6}` dow (the
    * seasonal_decompose convention — no engine dayofweek involved);
    * det(A) > 0 (SPD), and the numerators can be negative, so the floor
    * is the `(a − pmod(a, b)) DIV b` emulation on both engines (DuckDB
    * `//` truncates toward zero — the events_holt trap). λ = 10 keeps A
    * invertible even for a type seen on one day. */
  def eventsRidge(s: SparkSession, d: String, lambda: Long = 10L): DataFrame = {
    // pin the daily frame (calendar × |types| bounded): the anchor min
    // and the moment aggregate both read it — unpinned, each re-scans
    // the raw events (measured: 2 FileScans → 1)
    val daily = Tables.load(s, d, "events")
      .groupBy(datediff(date_trunc("day", col("ts")),
        lit("1970-01-01").cast("date")).as("x"), col("event_type"))
      .agg(count(lit(1)).as("y"))
      .localCheckpoint()
    // DECIMAL(38,0) BUDGET GUARD (r14 advice): determinants grow ~span⁴·n
    // and Spark's non-ANSI decimal semantics NULL on overflow — past the
    // documented ~30k-day span the query would emit NULL anchors
    // silently. Fail loudly instead (one scalar probe on the pinned
    // frame; the convergence-or-throw discipline).
    val spanRow = daily.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect()(0)
    if (!spanRow.isNullAt(0)) {
      val span = spanRow.getInt(1).toLong - spanRow.getInt(0).toLong
      require(span <= 30000L,
        s"events_ridge: day span $span exceeds the 30k-day DECIMAL(38,0) " +
          "determinant budget — rescale t or raise the decimal width")
    }
    val anchor = daily.agg(min(col("x")).as("x0"))
    val f = daily.crossJoin(broadcast(anchor))
      .select(col("event_type"),
        (col("x") - col("x0")).cast("long").as("t"),
        when(pmod(col("x") + lit(4), lit(7)).isin(0, 6), 1L)
          .otherwise(0L).as("w"),
        col("y"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = f.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(dec(col("t"))).as("st"),
        sum(dec(col("t")) * dec(col("t"))).as("stt"),
        sum(dec(col("w"))).as("sw"),
        sum(dec(col("w")) * dec(col("t"))).as("swt"),
        sum(dec(col("y"))).as("sy"),
        sum(dec(col("t")) * dec(col("y"))).as("sty"),
        sum(dec(col("w")) * dec(col("y"))).as("swy"))
      .withColumn("n_", dec(col("n_days")))
    val (detA, det0, det1, det2) = ridgeDetSql(lambda)
    def theta(num: String, name: String) =
      expr(s"""CAST((($num * 1000000) - pmod(($num * 1000000), $detA))
              | DIV $detA AS BIGINT)""".stripMargin.replace("\n", ""))
        .as(name)
    m.select(col("event_type"), col("n_days"),
      theta(det0, "intercept_micro"),
      theta(det1, "slope_micro"),
      theta(det2, "weekend_micro"))
  }

  def eventsRidgeSql(lambda: Long = 10L): String = {
    val (detA, det0, det1, det2) = ridgeDetSql(lambda)
    def theta(num: String, name: String) =
      s"""CAST(((($num * 1000000) - ((($num * 1000000) % $detA + $detA)
         | % $detA)) // $detA) AS BIGINT) AS $name""".stripMargin
        .replace("\n", "")
    s"""WITH daily AS (
       |  SELECT date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS x,
       |         event_type, count(*) AS y
       |  FROM events GROUP BY 1, 2),
       |a AS (SELECT min(x) AS x0 FROM daily),
       |f AS (SELECT event_type, (x - x0)::HUGEINT AS t,
       |             CASE WHEN (((x + 4) % 7 + 7) % 7) IN (0, 6)
       |                  THEN 1 ELSE 0 END::HUGEINT AS w,
       |             y::HUGEINT AS y
       |      FROM daily CROSS JOIN a),
       |m AS (
       |  SELECT event_type, count(*)::HUGEINT AS n_,
       |         count(*)::BIGINT AS n_days,
       |         sum(t) AS st, sum(t * t) AS stt, sum(w) AS sw,
       |         sum(w * t) AS swt, sum(y) AS sy, sum(t * y) AS sty,
       |         sum(w * y) AS swy
       |  FROM f GROUP BY 1)
       |SELECT event_type, n_days,
       |       ${theta(det0, "intercept_micro")},
       |       ${theta(det1, "slope_micro")},
       |       ${theta(det2, "weekend_micro")}
       |FROM m ORDER BY event_type""".stripMargin
  }

  val eventsTrendSql: String =
    """WITH daily AS (
      |  SELECT date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS x,
      |         event_type, count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, count(*) AS n_days, sum(y) AS sy,
      |         sum(CAST(x AS DECIMAL(38,0))) AS sx,
      |         sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx,
      |         sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy
      |  FROM daily GROUP BY 1)
      |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
      |  CAST(sy AS BIGINT) AS total,
      |  CASE WHEN n_days < 2 THEN NULL ELSE round(
      |    CAST(CAST(n_days AS DECIMAL(38,0)) * sxy - sx * CAST(sy AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(CAST(n_days AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE), 9)
      |  END AS slope,
      |  CASE WHEN n_days < 2 THEN NULL ELSE round(
      |    (CAST(sy AS DOUBLE) -
      |     (CAST(CAST(n_days AS DECIMAL(38,0)) * sxy - sx * CAST(sy AS DECIMAL(38,0)) AS DOUBLE)
      |      / CAST(CAST(n_days AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE))
      |     * CAST(sx AS DOUBLE)) / CAST(n_days AS DOUBLE), 6)
      |  END AS intercept
      |FROM m ORDER BY event_type""".stripMargin

  /** `events_forecast_backtest` (oracled): holdout evaluation of the
    * [[eventsTrend]] linear model — fit OLS per event_type on all daily
    * counts up to (max day − 7), forecast the last 7 days, report MAPE.
    * The backtest is the step monitoring pipelines actually run before
    * trusting a trend extrapolation; a model is only as good as its
    * holdout error.
    *
    * Determinism: the train moments are EXACT integer sums in
    * DECIMAL(38,0) (the [[eventsTrend]] discipline — one double division
    * each for slope/intercept, rounded to their output grids 9/6 dp);
    * per-test-day absolute percentage errors compute from those ROUNDED
    * coefficients with a shared parenthesization, round to the 9-dp
    * DECIMAL grid, and sum exactly (order-free) before the final /n +
    * round(6). y ≥ 1 on every test day (days exist only when events
    * occurred), so APE never divides by zero.
    *
    * Scale shape: daily collapse is the one corpus-sized aggregate; the
    * per-type model frame is ≤|event_types| rows (broadcast onto the
    * ≤7·|types|-row test frame); the holdout cutoff is a 1-row max
    * aggregate folded in (the events_survival anchor shape). */
  def eventsForecastBacktest(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.load(s, d, "events")
      .groupBy(datediff(date_trunc("day", col("ts")),
        lit("1970-01-01").cast("date")).as("x"), col("event_type"))
      .agg(count(lit(1)).as("y"))
    val cut = daily.agg(max(col("x")).as("mx"))
      .select((col("mx") - lit(7)).as("c"))
    val split = daily.crossJoin(broadcast(cut))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = split.where(col("x") <= col("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_train_days"), sum(col("y")).as("sy"),
        sum(dec(col("x"))).as("sx"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
    val num = dec(col("n_train_days")) * col("sxy") - col("sx") * dec(col("sy"))
    val den = dec(col("n_train_days")) * col("sxx") - col("sx") * col("sx")
    val slopeRaw = num.cast("double") / den.cast("double")
    // n_train_days < 2 ⇒ the OLS denominator is 0: drop the type rather
    // than emit an engine-specific NaN/inf (the profile_integrity
    // degenerate-input twin-contract rule) — a 1-day history has no trend
    // to backtest
    val model = m.where(col("n_train_days") >= lit(2))
      .select(col("event_type"), col("n_train_days"),
        round(slopeRaw, 9).as("slope"),
        round((col("sy").cast("double") - slopeRaw * col("sx").cast("double")) /
          col("n_train_days").cast("double"), 6).as("intercept"))
    split.where(col("x") > col("c"))
      .join(model, Seq("event_type"))
      .select(col("event_type"), col("n_train_days"), col("slope"),
        col("intercept"),
        round(abs((col("intercept") + col("slope") * col("x").cast("double"))
          - col("y").cast("double")) / col("y").cast("double"), 9)
          .cast("decimal(18,9)").as("ape"))
      .groupBy(col("event_type"), col("n_train_days"), col("slope"),
        col("intercept"))
      .agg(count(lit(1)).as("n_test_days"),
        round(sum(col("ape")).cast("double") / count(lit(1)), 6).as("mape"))
  }

  val eventsForecastBacktestSql: String =
    """WITH daily AS (
      |  SELECT date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS x,
      |         event_type, count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |cut AS (SELECT max(x) - 7 AS c FROM daily),
      |m AS (
      |  SELECT event_type, count(*) AS n_train_days, sum(y) AS sy,
      |         sum(CAST(x AS DECIMAL(38,0))) AS sx,
      |         sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx,
      |         sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy
      |  FROM daily, cut WHERE x <= c GROUP BY 1),
      |model AS (
      |  SELECT event_type, CAST(n_train_days AS BIGINT) AS n_train_days,
      |    round(
      |      CAST(CAST(n_train_days AS DECIMAL(38,0)) * sxy - sx * CAST(sy AS DECIMAL(38,0)) AS DOUBLE)
      |      / CAST(CAST(n_train_days AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE), 9)
      |      AS slope,
      |    round((CAST(sy AS DOUBLE) -
      |      (CAST(CAST(n_train_days AS DECIMAL(38,0)) * sxy - sx * CAST(sy AS DECIMAL(38,0)) AS DOUBLE)
      |       / CAST(CAST(n_train_days AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE))
      |      * CAST(sx AS DOUBLE)) / CAST(n_train_days AS DOUBLE), 6) AS intercept
      |  FROM m WHERE n_train_days >= 2),
      |ape AS (
      |  SELECT d.event_type, model.n_train_days, model.slope, model.intercept,
      |         CAST(round(abs((model.intercept + model.slope * CAST(x AS DOUBLE))
      |                        - CAST(y AS DOUBLE)) / CAST(y AS DOUBLE), 9)
      |              AS DECIMAL(18,9)) AS ape
      |  FROM daily d
      |  CROSS JOIN cut
      |  JOIN model ON model.event_type = d.event_type
      |  WHERE d.x > cut.c)
      |SELECT event_type, n_train_days, slope, intercept,
      |       count(*) AS n_test_days,
      |       round(CAST(sum(ape) AS DOUBLE) / count(*), 6) AS mape
      |FROM ape
      |GROUP BY 1, 2, 3, 4
      |ORDER BY event_type""".stripMargin

  /** SCD type-2 dimension history from a change stream — the warehouse
    * pattern the relational family lacked: collapse each user's event
    * stream to its STATE CHANGES (runs of equal event_type), emit one
    * row per run with [valid_from, valid_to) validity, a 1-based
    * version, and an is_current flag (open interval = NULL valid_to:
    * a max-date sentinel would overflow pandas/Arrow ns timestamps in
    * the oracle bridge). Both engines order by (ts, event_id) — the
    * [[ewma]] tie rule — so run boundaries are deterministic.
    *
    * Shape: ONE user_id exchange feeds both windows (the lag that finds
    * change rows and, after the filter, the lead/row_number that closes
    * intervals — same partition key, same sort, Catalyst plans one
    * Window over the other with no second exchange). Row volume never
    * exceeds the change count; nothing is corpus-global. */
  def eventsScd2(s: SparkSession, d: String): DataFrame =
    scd2Derive(Tables.load(s, d, "events")
      .select(col("user_id"), col("event_type").as("state"), col("ts"),
        col("event_id")))

  /** [[eventsScd2]]'s derivation core over an arbitrary change-event
    * frame `(user_id, state, ts, event_id)` — shared with the merge
    * path so derive and merge-apply agree on run semantics by
    * construction. */
  def scd2Derive(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = events
      .withColumn("prev", lag(col("state"), 1).over(w))
      .where(col("prev").isNull || col("prev") =!= col("state"))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("int"))
      .select(col("user_id"), col("state"), col("ts").as("valid_from"),
        col("valid_to"), col("version"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }

  /** SCD2 MERGE-APPLY — the pair of [[eventsScd2]]'s *derivation*: apply
    * a batch of raw change events to an EXISTING SCD2 dimension snapshot
    * (close open intervals, insert new versions, leave history rows
    * untouched), the nightly-dimension-load / CDC-apply primitive.
    *
    * Semantics, per user:
    *  1. REPLAY GUARD: batch rows at-or-before the open interval's
    *     `valid_from` are dropped — a re-delivered batch can never
    *     double-apply (foreachBatch at-least-once replays, upstream
    *     retries);
    *  2. the survivors collapse to STATE RUNS ordered by (ts, event_id)
    *     — the [[scd2Derive]] rule, shared by construction;
    *  3. NO-OP SUPPRESSION: a leading run equal to the current open
    *     state extends it instead of versioning it (and makes a
    *     same-state-only batch a complete no-op — idempotence);
    *  4. the open interval closes at the first surviving run's ts;
    *     inserted versions continue the user's version sequence, the
    *     last one open. Users absent from the dimension start at
    *     version 1; users absent from the batch pass through untouched.
    *
    * The MERGE LAW (asserted by the oracle, see `events_scd2_merge`):
    * for any event-time split, merge(derive(prefix), suffix) equals
    * derive(whole) exactly — so iterated time-ordered merges fold a
    * change stream into precisely the history a from-scratch derivation
    * would build.
    *
    * Scale shape: everything is keyed by user_id — one exchange feeds
    * the batch's lag/row_number/lead windows (same key, same sort,
    * stacked Windows), the open-interval join, and the dimension's
    * close-join against the ≤|batch users| first-new frame. Nothing is
    * corpus-global; dim history rows stream through a single keyed
    * left join. At 100 TB the dimension rewrite is the usual
    * partition-overwrite sink concern, not this operator's plan. */
  def scd2Merge(dim: DataFrame, batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val open = dim.where(col("is_current") === 1)
      .select(col("user_id"), col("state").as("cur_state"),
        col("valid_from").as("cur_from"), col("version").as("cur_version"))
    val fresh = batch.join(open, Seq("user_id"), "left_outer")
      .where(col("cur_from").isNull || col("ts") > col("cur_from"))
    val runs = fresh.withColumn("prev", lag(col("state"), 1).over(w))
      .where(col("prev").isNull || col("prev") =!= col("state"))
    val surv = runs.withColumn("rn0", row_number().over(w))
      .where(!(col("rn0") === 1 && col("cur_state").isNotNull &&
        col("state") === col("cur_state")))
    val newRows = surv
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("version",
        (coalesce(col("cur_version"), lit(0)) + row_number().over(w))
          .cast("int"))
      .select(col("user_id"), col("state"), col("ts").as("valid_from"),
        col("valid_to"), col("version"),
        col("valid_to").isNull.cast("int").as("is_current"))
    val firstNew = newRows.groupBy(col("user_id"))
      .agg(min(col("valid_from")).as("close_ts"))
    val dimUpdated = dim.join(firstNew, Seq("user_id"), "left_outer")
      .select(col("user_id"), col("state"), col("valid_from"),
        when(col("is_current") === 1 && col("close_ts").isNotNull,
          col("close_ts")).otherwise(col("valid_to")).as("valid_to"),
        col("version"),
        when(col("is_current") === 1 && col("close_ts").isNotNull, lit(0))
          .otherwise(col("is_current")).as("is_current"))
    dimUpdated.unionByName(newRows)
  }

  /** `events_scd2_merge` (oracled): split the event stream at a 1-row
    * anchor (max ts − 7 days, the events_survival cutoff shape), derive
    * the dimension from the prefix, MERGE-APPLY the suffix as a raw
    * change batch. The oracle is the FULL derivation ([[eventsScd2Sql]])
    * — deliberately NOT a mirrored merge: the hash gate then checks the
    * merge law itself (merge(derive(prefix), suffix) = derive(whole)),
    * a differential test no operation-identical twin could provide. */
  def eventsScd2Merge(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.load(s, d, "events")
      .select(col("user_id"), col("event_type").as("state"), col("ts"),
        col("event_id"))
    val cut = broadcast(ev.agg(max(col("ts")).as("mx"))
      .select((col("mx") - expr("INTERVAL 7 DAYS")).as("c")))
    val pre = ev.crossJoin(cut).where(col("ts") <= col("c"))
      .select(col("user_id"), col("state"), col("ts"), col("event_id"))
    val post = ev.crossJoin(cut).where(col("ts") > col("c"))
      .select(col("user_id"), col("state"), col("ts"), col("event_id"))
    scd2Merge(scd2Derive(pre), post)
  }

  val eventsScd2Sql: String =
    """WITH o AS (
      |  SELECT user_id, event_type AS state, ts, event_id,
      |         lag(event_type) OVER w AS prev
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |c AS (
      |  SELECT user_id, state, ts, event_id FROM o
      |  WHERE prev IS NULL OR prev <> state)
      |SELECT user_id, state, ts AS valid_from,
      |  lead(ts) OVER w2 AS valid_to,
      |  CAST(row_number() OVER w2 AS INT) AS version,
      |  CASE WHEN lead(ts) OVER w2 IS NULL THEN 1 ELSE 0 END AS is_current
      |FROM c
      |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** `events_seasonal_decompose` (oracled): classical moving-average
    * decomposition of each type's daily count series into trend +
    * weekly-seasonal + residual — the DIAGNOSTIC complement to
    * [[eventsHoltWinters]] (HW forecasts assuming the weekly cycle;
    * this measures it: how much of Monday's load is "Mondays are like
    * that" vs drift vs noise). Definition, mirrored exactly by the twin:
    *
    *   trend(t)    = ⌊Σ_{t−3..t+3} y · S / 7⌋   (centered 7-day MA,
    *                 NULL on the 3 edge days of the span)
    *   s_raw(dow)  = ⌊Σ detrended(t) over trend days with weekday dow
    *                 / n_days(dow)⌋,  dow = (epochday + 4) mod 7
    *   seasonal    = s_raw − ⌊Σ_dow s_raw / 7⌋  (centered to ~zero-sum)
    *   residual(t) = y·S − trend(t) − seasonal(dow(t))
    *
    * Everything is integer microunits (S = 1e6) with FLOOR division —
    * negative detrended sums floor via `(a − pmod(a,b)) div b`, the
    * [[eventsHolt]] discipline (DuckDB `//` truncates; its twin uses the
    * modular identity) — so all three components are bit-exact hash
    * anchors. A span under 14 days yields zero rows on both engines (the
    * HW init gate: every weekday needs a trend observation).
    *
    * Scale shape: unlike the Holt pair this never touches the driver —
    * ONE corpus shuffle to the calendar-bounded (type, day) grid, a
    * partition-local 7-row window over the dense spine, and two
    * ≤|types|×7-row aggregates joined back broadcast-style. At 100 TB
    * the post-shuffle frames are KBs regardless of event volume. */
  def eventsSeasonalDecompose(s: SparkSession, d: String): DataFrame =
    eventsSeasonalDecomposeFrom(s, Tables.load(s, d, "events"))

  def eventsSeasonalDecomposeFrom(s: SparkSession, ev: DataFrame): DataFrame = {
    val daily = ev
      .groupBy(datediff(date_trunc("day", col("ts")),
        lit("1970-01-01").cast("date")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("yd"))
    val bounds = daily.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .where(col("dmax") - col("dmin") + 1 >= 14)
    val spine = bounds.select(explode(sequence(col("dmin"), col("dmax"))).as("day"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(spine))
      .join(daily, Seq("event_type", "day"), "left_outer")
      .select(col("event_type"), col("day"),
        coalesce(col("yd"), lit(0L)).as("y"))
    val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    // dense spine ⇒ 7 window rows ⇔ full ±3-day neighborhood exists
    val det = grid
      .withColumn("trend_micro", when(count(lit(1)).over(w7) === 7,
        expr("(sum(y) OVER (PARTITION BY event_type ORDER BY day " +
          "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 1000000) div 7")))
      .withColumn("det", col("y") * lit(1000000L) - col("trend_micro"))
      .withColumn("dow", pmod(col("day") + lit(4), lit(7)))
    val sraw = det.where(col("trend_micro").isNotNull)
      .groupBy(col("event_type"), col("dow"))
      .agg(sum(col("det")).as("dsum"), count(lit(1)).as("dn"))
      .select(col("event_type"), col("dow"),
        expr("(dsum - pmod(dsum, dn)) div dn").as("s_raw"))
    val seas = sraw
      .join(sraw.groupBy(col("event_type")).agg(sum(col("s_raw")).as("ssum"))
        .select(col("event_type"),
          expr("(ssum - pmod(ssum, 7)) div 7").as("adj")),
        Seq("event_type"))
      .select(col("event_type"), col("dow"),
        (col("s_raw") - col("adj")).as("seasonal_micro"))
    det.join(broadcast(seas), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("y"),
        col("trend_micro"), col("seasonal_micro"),
        (col("y") * lit(1000000L) - col("trend_micro")
          - col("seasonal_micro")).as("residual_micro"))
  }

  /** DuckDB twin of [[eventsSeasonalDecompose]] — same window + two
    * bounded rollups; floor division over the (possibly negative)
    * detrended sums via the modular identity, HUGEINT sums cast back to
    * BIGINT at the output boundary. */
  val eventsSeasonalDecomposeSql: String = {
    def fd(a: String, b: String): String =
      s"((($a) - (((($a) % ($b)) + ($b)) % ($b))) // ($b))"
    s"""WITH daily AS MATERIALIZED (
       |  SELECT event_type,
       |         datediff('day', DATE '1970-01-01', date_trunc('day', ts)) AS day,
       |         count(*) AS y
       |  FROM events GROUP BY 1, 2),
       |bounds AS MATERIALIZED (
       |  SELECT min(day) AS dmin, max(day) AS dmax FROM daily
       |  HAVING max(day) - min(day) + 1 >= 14),
       |grid AS MATERIALIZED (
       |  SELECT t.event_type, g.day, CAST(COALESCE(d.y, 0) AS BIGINT) AS y
       |  FROM (SELECT DISTINCT event_type FROM daily) t
       |  CROSS JOIN (SELECT unnest(generate_series(dmin, dmax)) AS day
       |              FROM bounds) g
       |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = g.day),
       |det AS MATERIALIZED (
       |  SELECT event_type, day, y,
       |         CASE WHEN count(*) OVER w = 7
       |              THEN CAST(sum(y) OVER w AS BIGINT) * 1000000 // 7 END
       |           AS trend_micro,
       |         y * 1000000 - (CASE WHEN count(*) OVER w = 7
       |              THEN CAST(sum(y) OVER w AS BIGINT) * 1000000 // 7 END)
       |           AS det,
       |         ((day + 4) % 7 + 7) % 7 AS dow
       |  FROM grid
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |sraw AS MATERIALIZED (
       |  SELECT event_type, dow,
       |         ${fd("CAST(sum(det) AS BIGINT)", "count(*)")} AS s_raw
       |  FROM det WHERE trend_micro IS NOT NULL GROUP BY 1, 2),
       |seas AS MATERIALIZED (
       |  SELECT s.event_type, s.dow, s.s_raw - a.adj AS seasonal_micro
       |  FROM sraw s JOIN (
       |    SELECT event_type, ${fd("CAST(sum(s_raw) AS BIGINT)", "7")} AS adj
       |    FROM sraw GROUP BY 1) a USING (event_type))
       |SELECT d.event_type, CAST(d.day AS INT) AS day, d.y,
       |       CAST(d.trend_micro AS BIGINT) AS trend_micro,
       |       CAST(se.seasonal_micro AS BIGINT) AS seasonal_micro,
       |       CAST(d.y * 1000000 - d.trend_micro - se.seasonal_micro AS BIGINT)
       |         AS residual_micro
       |FROM det d JOIN seas se ON se.event_type = d.event_type
       |                       AND se.dow = d.dow
       |ORDER BY d.event_type, d.day""".stripMargin
  }

  /** `events_autocorr` (oracled): the sample autocorrelation of each
    * type's daily count series at lags 0..14 — the diagnostic that says
    * WHICH period [[eventsSeasonalDecompose]] should extract (a weekly
    * cycle shows as the r₇ ≫ r₁ signature; a trend as slow decay). The
    * float trap dissolves by scaling through n²: with dₜ = n·yₜ − S
    * (S = Σy, n = span days — both exact), the lag-k numerator
    * Σ dₜ·dₜ₊ₖ is an exact integer and rₖ = numₖ/num₀ is ONE double
    * division + round(9), operation-identical in the twin. A constant
    * series has num₀ = 0 → rₖ NULL (no variance, no correlation), and
    * lags past the span sum over zero terms → NULL, both engines.
    *
    * Shape: one corpus shuffle to the calendar-bounded dense grid, ONE
    * window pass (the 15 leads share a single partition/order spec, so
    * they ride one sort), a ≤|types|-row aggregate, then a per-row
    * stack. Products ride DECIMAL(38,0)/HUGEINT — (n·y)² wraps 64 bits
    * at ~3e9 events/day·span. */
  def eventsAutocorr(s: SparkSession, d: String, maxLag: Int = 14): DataFrame =
    eventsAutocorrFrom(s, Tables.load(s, d, "events"), maxLag)

  /** The exact-integer lag-numerator aggregate shared by
    * [[eventsAutocorrFrom]] and [[eventsPacfFrom]]: one row per
    * event_type with (n0, n1..nmaxLag) — Σ dₜ·dₜ₊ₖ over the n²-scaled
    * deviations, DECIMAL(38,0) exact. */
  private[graft] def autocorrNums(ev: DataFrame, maxLag: Int): DataFrame = {
    val daily = ev
      .groupBy(datediff(date_trunc("day", col("ts")),
        lit("1970-01-01").cast("date")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("yd"))
    val bounds = daily.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
    val spine = bounds.select(explode(sequence(col("dmin"), col("dmax"))).as("day"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(spine))
      .join(daily, Seq("event_type", "day"), "left_outer")
      .select(col("event_type"), col("day"),
        coalesce(col("yd"), lit(0L)).as("y"))
    val byType = Window.partitionBy(col("event_type"))
    val ordered = byType.orderBy(col("day"))
    val dev = grid
      .withColumn("d", (count(lit(1)).over(byType).cast("decimal(38,0)")
        * col("y").cast("decimal(38,0)")
        - sum(col("y")).over(byType).cast("decimal(38,0)")).cast("decimal(38,0)"))
    val withLeads = (0 to maxLag).foldLeft(dev) { (df, k) =>
      df.withColumn(s"p$k", (col("d") * lead(col("d"), k).over(ordered))
        .cast("decimal(38,0)"))
    }
    withLeads.groupBy(col("event_type"))
      .agg(sum(col("p0")).as("n0"),
        (1 to maxLag).map(k => sum(col(s"p$k")).as(s"n$k")): _*)
  }

  def eventsAutocorrFrom(s: SparkSession, ev: DataFrame,
                         maxLag: Int = 14): DataFrame = {
    val nums = autocorrNums(ev, maxLag)
    val stacked = nums.select(col("event_type"), col("n0"),
      explode(array((0 to maxLag).map(k =>
        struct(lit(k).as("k"), col(s"n$k").as("num"))): _*)).as("x"))
    stacked.select(col("event_type"), col("x.k").as("k"),
      when(col("n0") > 0,
        round(col("x.num").cast("double") / col("n0").cast("double"), 9))
        .as("r"))
  }

  /** The shared WITH-prefix of the autocorr/pacf twins: daily counts →
    * calendar grid → n²-scaled deviations → lag-product numerators
    * (HUGEINT), ending at the `nums` CTE. */
  private def autocorrBaseSql(maxLag: Int): String = {
    val leadCols = (0 to maxLag)
      .map(k => s"d * lead(d, $k) OVER w AS p$k").mkString(",\n       ")
    val sumCols = (0 to maxLag)
      .map(k => s"sum(p$k) AS n$k").mkString(",\n       ")
    s"""WITH daily AS MATERIALIZED (
       |  SELECT event_type,
       |         datediff('day', DATE '1970-01-01', date_trunc('day', ts)) AS day,
       |         count(*) AS y
       |  FROM events GROUP BY 1, 2),
       |bounds AS MATERIALIZED (
       |  SELECT min(day) AS dmin, max(day) AS dmax FROM daily),
       |grid AS MATERIALIZED (
       |  SELECT t.event_type, g.day, CAST(COALESCE(d.y, 0) AS HUGEINT) AS y
       |  FROM (SELECT DISTINCT event_type FROM daily) t
       |  CROSS JOIN (SELECT unnest(generate_series(dmin, dmax)) AS day
       |              FROM bounds) g
       |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = g.day),
       |dev AS MATERIALIZED (
       |  SELECT event_type, day,
       |         count(*) OVER t * y - sum(y) OVER t AS d
       |  FROM grid
       |  WINDOW t AS (PARTITION BY event_type)),
       |leads AS MATERIALIZED (
       |  SELECT event_type,
       |       $leadCols
       |  FROM dev
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |nums AS MATERIALIZED (
       |  SELECT event_type,
       |       $sumCols
       |  FROM leads GROUP BY 1)""".stripMargin
  }

  /** DuckDB twin of [[eventsAutocorr]] — same n²-scaled integer
    * numerators (HUGEINT), same single window pass, same round(…, 9). */
  def eventsAutocorrSql(maxLag: Int = 14): String = {
    val unions = (0 to maxLag)
      .map(k => s"SELECT event_type, $k AS k, n$k AS num, n0 FROM nums")
      .mkString("\n  UNION ALL ")
    s"""${autocorrBaseSql(maxLag)}
       |SELECT event_type, CAST(k AS INT) AS k,
       |       CASE WHEN n0 > 0
       |            THEN round(CAST(num AS DOUBLE) / CAST(n0 AS DOUBLE), 9)
       |       END AS r
       |FROM ($unions)
       |ORDER BY event_type, k""".stripMargin
  }

  /** `events_pacf` (oracled): the partial autocorrelation of each type's
    * daily series at lags 1..14 via the Durbin–Levinson recursion — the
    * OTHER half of the Box–Jenkins identification pair ([[eventsAutocorr]]
    * tails off for AR processes; this cuts off at the AR order, which is
    * the diagnostic that says how many lag terms a forecast model
    * actually needs).
    *
    * Exactness: the ACF ratios are floored to 10⁻⁶ microunits
    * (`⌊10⁶·numₖ/num₀⌋`, FLOOR division — numerators go negative, where
    * DuckDB's `//` truncates, so the twin spells the modular identity;
    * the [[eventsHolt]] find) and the whole DL recursion then runs in
    * exact integer microunits: φₖₖ = ⌊(rₖ·10⁶ − Σφₖ₋₁ⱼ·rₖ₋ⱼ)·10⁶ /
    * (10¹² − Σφₖ₋₁ⱼ·rⱼ)⌋ with each vector update floored once — both
    * engines compute the IDENTICAL integer sequence, no float anywhere
    * in the output (phi_micro IS the result). A non-positive denominator
    * (possible only for a degenerate floored ACF) pins φₖₖ = 0 on both
    * engines; lags past the span sum zero products and enter as rₖ = 0.
    *
    * Scale shape: the distributed work is exactly [[autocorrNums]] (one
    * calendar-grid pass, one window, one ≤|types|-row aggregate); the
    * recursion runs on the driver over that ≤|types|×15 model — the
    * [[eventsMarkovStationary]] bounded-model class, invariant in corpus
    * size. The twin unrolls the same recursion one level per CTE group
    * with level-suffixed vector columns (no alias shadowing). */
  def eventsPacf(s: SparkSession, d: String, maxLag: Int = 14): DataFrame =
    eventsPacfFrom(s, Tables.load(s, d, "events"), maxLag)

  def eventsPacfFrom(s: SparkSession, ev: DataFrame,
                     maxLag: Int = 14): DataFrame = {
    val SCALE = BigInt(1000000)
    def fdiv(a: BigInt, b: BigInt): BigInt = (a - a.mod(b)) / b // b > 0
    val out = autocorrNums(ev, maxLag).collect().toSeq.flatMap { row =>
      val tpe = row.getString(0)
      def num(i: Int): Option[BigInt] =
        Option(row.getDecimal(i)).map(d => BigInt(d.toBigInteger))
      num(1).filter(_ > 0) match {
        case Some(n0) =>
          val r = (1 to maxLag)
            .map(k => fdiv(SCALE * num(1 + k).getOrElse(BigInt(0)), n0))
          val phi = Array.fill[BigInt](maxLag + 1, maxLag + 1)(BigInt(0))
          val diag = Array.fill[BigInt](maxLag + 1)(BigInt(0))
          phi(1)(1) = r(0); diag(1) = r(0)
          for (k <- 2 to maxLag) {
            val nm = SCALE * r(k - 1) -
              (1 until k).map(j => phi(k - 1)(j) * r(k - j - 1)).sum
            val dn = SCALE * SCALE -
              (1 until k).map(j => phi(k - 1)(j) * r(j - 1)).sum
            val p = if (dn > 0) fdiv(nm * SCALE, dn) else BigInt(0)
            diag(k) = p; phi(k)(k) = p
            for (j <- 1 until k)
              phi(k)(j) = phi(k - 1)(j) - fdiv(p * phi(k - 1)(k - j), SCALE)
          }
          (1 to maxLag).map { k =>
            require(diag(k).isValidLong,
              s"eventsPacf: phi_micro overflows Long (${diag(k)})")
            (tpe, k, diag(k).toLong)
          }
        case None => Seq.empty
      }
    }
    val sp = s
    import sp.implicits._
    out.toDF("event_type", "k", "phi_micro")
  }

  /** DuckDB twin of [[eventsPacf]]: the [[autocorrBaseSql]] prefix, the
    * floored micro-ACF pivot, then Durbin–Levinson unrolled one level
    * per CTE group — `da` (num/den sums), `db` (the guarded φₖₖ floor
    * division), `dl` (the level-suffixed vector update). All HUGEINT;
    * `fd(a, b)` is the modular floor identity, b > 0 at every call
    * site. */
  def eventsPacfSql(maxLag: Int = 14): String = {
    def fd(a: String, b: String) = s"($a - ((($a) % ($b) + ($b)) % ($b))) // ($b)"
    val rCols = (1 to maxLag).map { k =>
      val a = s"CAST(1000000 AS HUGEINT) * COALESCE(n$k, 0)"
      s"${fd(a, "n0")} AS r$k"
    }.mkString(",\n       ")
    val levels = (2 to maxLag).map { k =>
      val nmSum = (1 until k).map(j => s"p${k - 1}_$j * r${k - j}").mkString(" + ")
      val dnSum = (1 until k).map(j => s"p${k - 1}_$j * r$j").mkString(" + ")
      val upd = (1 until k).map { j =>
        s"p${k - 1}_$j - ${fd(s"d$k * p${k - 1}_${k - j}", "1000000")} AS p${k}_$j"
      }.mkString(",\n       ")
      val carry = (1 until k).map(j => s"d$j").mkString(", ")
      val rs = (1 to maxLag).map(j => s"r$j").mkString(", ")
      s"""da$k AS MATERIALIZED (
         |  SELECT *,
         |    CAST(1000000 AS HUGEINT) * r$k - ($nmSum) AS nm,
         |    CAST(1000000 AS HUGEINT) * 1000000 - ($dnSum) AS dn
         |  FROM dl${k - 1}),
         |db$k AS MATERIALIZED (
         |  SELECT *, CASE WHEN dn > 0 THEN ${fd("nm * 1000000", "dn")}
         |                 ELSE CAST(0 AS HUGEINT) END AS d$k
         |  FROM da$k),
         |dl$k AS MATERIALIZED (
         |  SELECT event_type, $rs, $carry, d$k,
         |       $upd,
         |       d$k AS p${k}_$k
         |  FROM db$k)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to maxLag)
      .map(j => s"SELECT event_type, $j AS k, CAST(d$j AS BIGINT) AS phi_micro FROM dl$maxLag")
      .mkString("\n  UNION ALL ")
    s"""${autocorrBaseSql(maxLag)},
       |r AS MATERIALIZED (
       |  SELECT event_type,
       |       $rCols
       |  FROM nums WHERE n0 > 0),
       |dl1 AS MATERIALIZED (
       |  SELECT *, r1 AS p1_1, r1 AS d1 FROM r),
       |$levels
       |SELECT event_type, CAST(k AS INT) AS k, phi_micro
       |FROM ($unions)
       |ORDER BY event_type, k""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_trend" -> (eventsTrend _),
    "events_ridge" -> ((s, d) => eventsRidge(s, d)),
    "events_seasonal_decompose" -> (eventsSeasonalDecompose _),
    "events_autocorr" -> ((s, d) => eventsAutocorr(s, d)),
    "events_pacf" -> ((s, d) => eventsPacf(s, d)),
    "events_holt" -> ((s, d) => eventsHolt(s, d)),
    "events_holt_winters" -> ((s, d) => eventsHoltWinters(s, d)),
    "events_scd2" -> (eventsScd2 _),
    "events_scd2_merge" -> (eventsScd2Merge _),
    "events_paths" -> (eventsPaths _),
    "events_transitions" -> (eventsTransitions _),
    "events_markov_stationary" -> ((s, d) => eventsMarkovStationary(s, d)),
    "events_attribution" -> (eventsAttribution _),
    "events_funnel" -> (eventsFunnel _),
    "events_retention" -> (eventsRetention _),
    "join_asof" -> (joinAsof _),
    "join_range" -> (joinRange _),
    "events_concurrency" -> (eventsConcurrency _),
    "events_forecast_backtest" -> (eventsForecastBacktest _),
    "events_anomaly_mad" -> (eventsAnomalyMad _),
    "events_tumbling_hour" -> (tumblingHour _),
    "events_sliding_hour" -> (slidingHour _),
    "events_sessionize" -> (sessionize _),
    "events_json_extract" -> (jsonExtract _),
    "events_distinct_users" -> (distinctUsers _),
    "events_daily_share" -> (dailyShare _),
    "events_anomaly" -> (eventsAnomaly _),
    "events_cusum" -> (eventsCusum _),
    "events_stickiness" -> (eventsStickiness _),
    "events_heatmap" -> (eventsHeatmap _),
    "events_survival" -> (eventsSurvival _),
    "events_rolling_7d" -> (rolling7d _),
    "events_ewma" -> (ewma _),
    "events_ab_test" -> (abTest _),
    "events_session_stats" -> (sessionStats _)
  )

  val oracles: Map[String, String] = Map(
    "events_trend" -> eventsTrendSql,
    "events_ridge" -> eventsRidgeSql(),
    "events_seasonal_decompose" -> eventsSeasonalDecomposeSql,
    "events_autocorr" -> eventsAutocorrSql(),
    "events_pacf" -> eventsPacfSql(),
    "events_holt" -> eventsHoltSql(),
    "events_holt_winters" -> eventsHoltWintersSql(),
    "events_scd2" -> eventsScd2Sql,
    // the merge law as an oracle: the merged dimension must equal the
    // full from-scratch derivation, hash-exactly
    "events_scd2_merge" -> eventsScd2Sql,
    "events_paths" -> eventsPathsSql,
    "events_transitions" -> eventsTransitionsSql,
    "events_markov_stationary" -> eventsMarkovStationarySql(),
    "events_attribution" -> eventsAttributionSql,
    "events_funnel" -> eventsFunnelSql,
    "events_retention" -> eventsRetentionSql,
    "join_asof" -> joinAsofSql,
    "join_range" -> joinRangeSql,
    "events_concurrency" -> eventsConcurrencySql,
    "events_forecast_backtest" -> eventsForecastBacktestSql,
    "events_anomaly_mad" -> eventsAnomalyMadSql,
    "events_tumbling_hour" -> tumblingHourSql,
    "events_sliding_hour" -> slidingHourSql,
    "events_sessionize" -> sessionizeSql,
    "events_json_extract" -> jsonExtractSql,
    "events_distinct_users" -> distinctUsersSql,
    "events_daily_share" -> dailyShareSql,
    "events_anomaly" -> eventsAnomalySql,
    "events_cusum" -> eventsCusumSql,
    "events_stickiness" -> eventsStickinessSql,
    "events_heatmap" -> eventsHeatmapSql,
    "events_survival" -> eventsSurvivalSql,
    "events_rolling_7d" -> rolling7dSql,
    "events_ewma" -> ewmaSql,
    "events_ab_test" -> abTestSql,
    "events_session_stats" -> sessionStatsSql
  )
}
