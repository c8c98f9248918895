package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.{approx_count_distinct, col, expr}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

import graft.operators.EventAnalytics

/** Per-user funnel progress carried across micro-batches (event-time
  * micros; None = stage not reached). */
case class FunnelProgress(vTs: Option[Long], cTs: Option[Long], pTs: Option[Long])

/** Emitted when a user first reaches a funnel stage. */
case class StageReached(user_id: Long, stage: String, ts: java.sql.Timestamp)

/** A user's most recent event carried across micro-batches: event-time
  * micros + event_id — exactly the batch lag window's (ts, event_id)
  * sort key, so the streamed pair sequence reproduces batch order. */
case class LastEvent(ts: Long, eventId: Long, tpe: String)

/** One consecutive-within-session pair ([[graft.operators.EventAnalytics
  * .eventsTransitions]] semantics), emitted at the later event's time. */
case class TransitionRow(user_id: Long, from_type: String, to_type: String,
                         ts: java.sql.Timestamp)

/** Per-user EWMA tap buffer carried across micro-batches: the (ts,
  * event_id) high-water mark plus the ≤ 8 most recent values,
  * newest first — state is 8 doubles + 2 longs per user BY SCHEMA. */
case class EwmaTaps(ts: Long, eventId: Long, values: Array[Double])

/** One smoothed observation ([[graft.operators.EventAnalytics.ewmaFrom]]
  * row), emitted at its event's time. */
case class EwmaRow(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                   value: Double, ewma: Double)

/** Incremental (Structured Streaming) execution of the event-time
  * analytics: the SAME window transforms as batch
  * ([[graft.operators.EventAnalytics]] `*From` functions), fed by a
  * watermarked `readStream` source instead of a table scan. Batch/stream
  * result parity is asserted in StreamingSpec.
  *
  * Scale notes: the aggregation state is keyed on (window, event_type) /
  * (user, session) — the same high-cardinality, evenly-partitioned keys
  * as the batch shuffles — and for the WINDOWED operators the watermark
  * bounds it: groups older than the delay are finalized, emitted (append
  * mode), and evicted, so state does not grow with stream length. Late
  * events inside the delay merge into their window/session exactly as in
  * batch; events later than the delay are dropped by contract.
  * [[distinctUsers]] is the exception — exact global distinct has an
  * unbounded horizon, so its dedup state grows with the distinct
  * (type, user) universe by design (like DocStreams.dedupExactStream);
  * [[distinctUsersWithinWatermark]] is the bounded-state twin.
  */
object EventStreams {

  /** Parquet file-stream schema for the events table. `ts` is on-disk
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) — TIMESTAMP_NTZ to Spark —
    * and gets the identical cast-to-session-zone canonicalization the
    * batch loader applies (graft.Tables.canonTimestamps; session zone is
    * pinned UTC, so the cast is value-identical). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of event parquet files. */
  def readEvents(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(eventsSchema)
    val withOpt = maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n)).getOrElse(reader)
    withOpt.parquet(dir)
      .withColumn("ts", col("ts").cast(TimestampType))
  }

  /** Default lateness tolerance: events more than this far behind the
    * max observed event time are dropped; state older than this is
    * finalized and evicted. */
  val DefaultDelay = "10 minutes"

  def tumblingHour(events: DataFrame, delay: String = DefaultDelay): DataFrame =
    EventAnalytics.tumblingHourFrom(events.withWatermark("ts", delay))

  def slidingHour(events: DataFrame, delay: String = DefaultDelay): DataFrame =
    EventAnalytics.slidingHourFrom(events.withWatermark("ts", delay))

  def sessionize(events: DataFrame, delay: String = DefaultDelay): DataFrame =
    EventAnalytics.sessionizeFrom(events.withWatermark("ts", delay))

  /** Streaming exact-distinct users per type: dedup on
    * (event_type, user_id), then a running count — the incremental twin
    * of EventAnalytics.distinctUsers' exact distinct aggregate.
    *
    * State contract: the dedup subset has NO event-time column, so the
    * watermark never evicts it — state grows with the distinct
    * (type, user) universe, UNBOUNDED by stream length by design (exact
    * global distinct has an unbounded horizon). Use
    * [[distinctUsersWithinWatermark]] when a bounded horizon is
    * acceptable. */
  def distinctUsers(events: DataFrame, delay: String = DefaultDelay): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicates("event_type", "user_id")
      .groupBy(col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_users"))

  /** Incremental funnel: per-user view → click → purchase progression as
    * explicit flatMapGroupsWithState state (the custom-state streaming
    * pattern — a per-key monotone state machine, not a windowed
    * aggregate). Emits one [[StageReached]] row the first time a user
    * reaches each stage, with the batch operator's strict ordering rule
    * (a click counts only with ts strictly after the first view, a
    * purchase only strictly after that first qualifying click).
    *
    * Exactness contract: identical to [[graft.operators.EventAnalytics
    * .eventsFunnel]] when events arrive in event-time order ACROSS
    * micro-batches (within a batch the handler sorts by ts); an earlier
    * view arriving after the state has advanced cannot rewind it —
    * streaming funnels are order-sensitive by nature. State is three
    * optional longs per user, monotone and small; unbounded horizon by
    * design, like exact dedup. Parity vs the batch stage counts is
    * asserted in StreamingSpec on a time-split stream. */
  def funnelStream(events: DataFrame): Dataset[StageReached] = {
    val sp = events.sparkSession
    import sp.implicits._
    events.select(col("user_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelProgress, StageReached](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[FunnelProgress]) =>
          var st = state.getOption.getOrElse(FunnelProgress(None, None, None))
          val out = List.newBuilder[StageReached]
          // full microsecond precision: getTime is millis-truncated, and
          // the strict ordering rule needs the sub-ms part
          def micros(ts: java.sql.Timestamp): Long =
            ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
          rows.toSeq.sortBy(r => micros(r._3)).foreach { case (_, tpe, ts) =>
            val t = micros(ts)
            tpe match {
              case "view" if st.vTs.isEmpty =>
                st = st.copy(vTs = Some(t))
                out += StageReached(user, "1_view", ts)
              case "click" if st.cTs.isEmpty && st.vTs.exists(_ < t) =>
                st = st.copy(cTs = Some(t))
                out += StageReached(user, "2_view_click", ts)
              case "purchase" if st.pTs.isEmpty && st.cTs.exists(_ < t) =>
                st = st.copy(pTs = Some(t))
                out += StageReached(user, "3_view_click_purchase", ts)
              case _ => ()
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Incremental within-session transitions: the streaming twin of
    * [[graft.operators.EventAnalytics.eventsTransitions]] as per-user
    * flatMapGroupsWithState — state is ONE [[LastEvent]] per user (a
    * dozen bytes, bounded by the user universe, not stream length), and
    * each arriving event emits a (from_type → to_type) pair iff it
    * follows the carried last event by less than the 30-minute session
    * gap. Within a batch the handler sorts by the batch operator's
    * (ts, event_id) key; the carried state makes pairs SPAN micro-batch
    * boundaries, which a per-batch lag window could never do.
    *
    * Exactness contract (the [[funnelStream]] convention): identical
    * pair multiset to batch when events arrive in event-time order
    * ACROSS micro-batches — an event older than the carried state
    * cannot splice itself between two already-paired events, so
    * transitions are order-sensitive by nature. Parity on a time-split
    * stream is asserted in StreamingSpec. */
  def transitionStream(events: DataFrame): Dataset[TransitionRow] = {
    val sp = events.sparkSession
    import sp.implicits._
    events.select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, TransitionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[LastEvent]) =>
          def micros(ts: java.sql.Timestamp): Long =
            ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
          var last = state.getOption
          val out = List.newBuilder[TransitionRow]
          def notAfter(le: LastEvent, t: Long, eid: Long): Boolean =
            le.ts < t || (le.ts == t && le.eventId <= eid)
          rows.toSeq.sortBy(r => (micros(r._4), r._2))
            .foreach { case (_, eid, tpe, ts) =>
              val t = micros(ts)
              last match {
                case Some(le) if notAfter(le, t, eid) &&
                    t - le.ts < 30L * 60 * 1000000L =>
                  out += TransitionRow(user, le.tpe, tpe, ts)
                case _ => ()
              }
              // advance only forward in (ts, event_id) order — a
              // stale-arriving event never rewinds the chain
              if (last.forall(le => notAfter(le, t, eid)))
                last = Some(LastEvent(t, eid, tpe))
            }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Incremental twin of [[EventAnalytics.ewmaFrom]]: the 8-tap α=1/2
    * EWMA maintained per user with a bounded ring buffer — the canonical
    * "smooth a metric stream online" operator. The batch form is one
    * window pass of 8 lags; HERE the same 8 taps are the carried state,
    * so each incoming event costs O(8) with no window and no shuffle
    * beyond the user_id grouping.
    *
    * Exactness contract ([[transitionStream]] convention): the emitted
    * (event, ewma) set is IDENTICAL to batch when events arrive in
    * event-time order across micro-batches (in-batch disorder is sorted
    * away). A stale arrival — older than the carried high-water mark —
    * is DROPPED, not spliced: its batch ewma depends on taps this state
    * no longer holds, and emitting a wrong number would poison the
    * parity contract; StreamingSpec asserts both the parity and the
    * drop. The per-tap arithmetic replicates the batch decimal
    * discipline exactly (valueOf-scale-6 fix, exact decimal tap sums,
    * one double division, round 9). */
  def ewmaStream(events: DataFrame): Dataset[EwmaRow] = {
    val sp = events.sparkSession
    import sp.implicits._
    events.select(col("user_id"), col("event_id"), col("value"), col("ts"))
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaTaps, EwmaRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[EwmaTaps]) =>
          def micros(ts: java.sql.Timestamp): Long =
            ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
          var cur = state.getOption
          val out = List.newBuilder[EwmaRow]
          rows.toSeq.sortBy(r => (micros(r._4), r._2))
            .foreach { case (_, eid, v, ts) =>
              val t = micros(ts)
              val fresh = cur.forall(s =>
                s.ts < t || (s.ts == t && s.eventId <= eid))
              if (fresh) {
                val taps = (v +: cur.map(_.values.toSeq).getOrElse(Seq()))
                  .take(8)
                out += EwmaRow(user, eid, ts, v, ewmaOf(taps))
                cur = Some(EwmaTaps(t, eid, taps.toArray))
              } // stale: drop (see contract above)
            }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** The batch operator's decimal discipline in JVM form: taps (newest
    * first) fixed to 6 dp, weighted by exact 2^-k decimals, summed
    * exactly, one double division by 2−0.5^(m−1), round(9). */
  private[streaming] def ewmaOf(taps: Seq[Double]): Double = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val weights = Seq("1.0", "0.5", "0.25", "0.125", "0.0625",
      "0.03125", "0.015625", "0.0078125").map(new JBD(_))
    var num = JBD.ZERO
    taps.zip(weights).foreach { case (v, w) =>
      num = num.add(JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP)
        .multiply(w))
    }
    val denom = 2.0 - math.pow(0.5, taps.length - 1)
    JBD.valueOf(num.doubleValue / denom)
      .setScale(9, RoundingMode.HALF_UP).doubleValue
  }

  /** Bounded-state variant: `dropDuplicatesWithinWatermark` EVICTS a
    * (type, user) dedup entry once the watermark passes its event time,
    * so state is bounded by the keys active inside one delay window. The
    * trade, by contract: a user whose next event arrives with an event
    * time more than `delay` past the watermark set by their previous one
    * is counted again — exact only within the horizon. */
  def distinctUsersWithinWatermark(events: DataFrame,
                                   delay: String = DefaultDelay): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_type", "user_id")
      .groupBy(col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_users"))

  /** HLL distinct AT INGEST — the streaming twin of
    * [[graft.operators.Sketches.distinctUsersApprox]] and the
    * bounded-state answer to [[distinctUsers]]' unbounded dedup rows:
    * `approx_count_distinct` keeps ONE fixed HLL++ register block per
    * event_type (a few KB, rsd=0.02 ⇒ 2^14 registers) regardless of how
    * many users stream past, with no horizon trade-off — unlike
    * [[distinctUsersWithinWatermark]], nothing is ever evicted, the
    * sketch just absorbs. Register updates are max-merges
    * (order-independent), so the streamed estimate is IDENTICAL to the
    * batch estimate over the same event set — asserted exactly, not
    * within-tolerance, in StreamingSpec. */
  def distinctUsersApproxStream(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"))

  /** Watermarked STREAM-STREAM interval join — the incremental twin of
    * [[graft.operators.EventAnalytics.attributionPairsFrom]]: purchases
    * joined to same-user views from the preceding hour, both sides fed
    * from the event stream. The join expression is the batch one
    * verbatim; what streaming adds is state management, and the interval
    * condition is what makes it bounded: a view can only ever match
    * purchases within [view_ts, view_ts + 1 h], so once the purchase
    * watermark passes view_ts + 1 h the view's state row is evicted —
    * state holds ~one hour of views + `delay` of purchases, independent
    * of stream length. The view side's watermark is delay + the 1 h join
    * window, so a view is never dropped while a purchase it could match
    * is still admissible. Inner join ⇒ pairs emit as soon as both rows
    * have arrived (no flush-wait); parity on the pair SET vs batch is
    * asserted in StreamingSpec. */
  def attributionStream(events: DataFrame,
                        delay: String = DefaultDelay): DataFrame = {
    val views = events.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "70 minutes") // = DefaultDelay + the 1 h window
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", delay)
    purchases.join(views,
        col("v_user") === col("user_id") &&
          col("view_ts") <= col("p_ts") &&
          col("view_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("event_id"), col("user_id"), col("view_ts"), col("p_ts"))
  }

  /** The SCD2 dimension's on-disk schema (what [[scd2MergeStream]]
    * persists per micro-batch). */
  val scd2Schema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("state", StringType),
    StructField("valid_from", TimestampType),
    StructField("valid_to", TimestampType),
    StructField("version", IntegerType),
    StructField("is_current", IntegerType)))

  /** SCD2 dimension maintenance AT INGEST — the streaming twin of
    * [[EventAnalytics.scd2Merge]], the [[DocStreams.indexIngestStream]]
    * externalized-state discipline: each micro-batch of raw events
    * merge-applies into the persisted dimension and writes the new
    * dimension version to `dimPath/dim_batch=<batchId>`; readers (and
    * the next batch) take the highest-numbered version.
    *
    * At-least-once safety: foreachBatch may re-execute a batch after a
    * crash. A re-executed batch reads the newest version STRICTLY BEFORE
    * its own batchId — the same input state it read the first time —
    * and overwrites its own output dir, so the result is byte-identical,
    * not double-applied; [[EventAnalytics.scd2Merge]]'s replay guard
    * additionally absorbs upstream re-delivery of already-applied
    * events inside later batches.
    *
    * Ordering contract: micro-batches must arrive in event-time order
    * ACROSS batches (the CDC/ingest shape) — interval closing is
    * inherently order-sensitive, unlike [[DocStreams.upsertStream]]'s
    * order-free max fold; an out-of-order batch's stale rows are
    * dropped by the replay guard rather than rewriting closed history.
    * Batch/stream parity over an ordered 3-batch arrival (the merge
    * law, folded) is asserted in StreamingSpec.
    *
    * Scale: per batch the work is O(batch) windows plus one keyed join
    * against the dimension; the dimension rewrite is the versioned-sink
    * cost every SCD2 store pays (partition-overwrite in production —
    * here one dir per batch, pruned by retention). */
  def scd2MergeStream(events: DataFrame, dimPath: String,
                      checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        val b = batch.select(col("user_id"),
            col("event_type").as("state"), col("ts"), col("event_id"))
          .localCheckpoint()
        val merged = EventAnalytics.scd2Merge(latestDim(s, dimPath, batchId), b)
        merged.write.mode("overwrite").parquet(s"$dimPath/dim_batch=$batchId")
        graft.Blocks.release(b)
        ()
      }
      .start()

  /** The newest committed dimension version strictly BEFORE `batchId`
    * (re-execution safety, see [[scd2MergeStream]]); empty dimension
    * when none exists. */
  private[graft] def latestDim(s: SparkSession, dimPath: String,
                               batchId: Long): DataFrame = {
    val dirs = Option(new java.io.File(dimPath).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("dim_batch="))
      .map(f => (f.getName.stripPrefix("dim_batch=").toLong, f))
      .filter(_._1 < batchId)
    if (dirs.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], scd2Schema)
    else s.read.schema(scd2Schema)
      .parquet(dirs.maxBy(_._1)._2.getAbsolutePath)
  }

  /** Persisted OLS moment schema for [[trendStream]]: the sufficient
    * statistics of [[EventAnalytics.eventsTrend]]'s per-type fit, all
    * exact integers (DECIMAL(38,0) for the products). */
  val trendMomentsSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("n_days", LongType),
    StructField("sy", LongType),
    StructField("sx", DecimalType(38, 0)),
    StructField("sxx", DecimalType(38, 0)),
    StructField("sxy", DecimalType(38, 0))))

  /** Incremental OLS trend — the streaming twin of
    * [[EventAnalytics.eventsTrend]], built on the one algebraic fact the
    * batch operator's decimal discipline already exploits: the fit is a
    * function of five ADDITIVE integer moments (n, Σy, Σx, Σx², Σxy)
    * over CLOSED days. Daily counts finalize through a watermarked
    * 1-day tumbling window in APPEND mode — a day emits exactly once,
    * when the watermark passes its end — so each micro-batch's
    * contribution folds into the persisted moments by plain addition:
    * no row is ever revised, no state beyond the open windows and the
    * ≤|types|-row moment table. Slope/intercept recompute from the
    * exact moments on read ([[trendFromMoments]]) with the identical
    * one-division-per-coefficient expression, so stream and batch agree
    * on the decimal grid whenever they have seen the same closed days.
    *
    * Re-execution safety: the [[scd2MergeStream]] versioned-sink
    * discipline — batch B reads the newest moments version < B and
    * OVERWRITES version B, so a replayed batch reproduces, not
    * double-adds. Scale: per batch the work is O(batch) + a ≤|types|-row
    * merge; the moment table never grows with stream length. */
  def trendStream(events: DataFrame, momentsPath: String,
                  checkpointDir: String,
                  delay: String = DefaultDelay): StreamingQuery =
    events.withWatermark("ts", delay)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), "1 day"),
        col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("y"))
      .select(col("event_type"),
        org.apache.spark.sql.functions.datediff(
          col("window.start").cast("date"),
          org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
          .cast("long").as("x"),
        col("y"))
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        val b = batch.localCheckpoint()
        val inc = b.selectExpr("event_type", "1L AS n_days", "y AS sy",
          "CAST(x AS DECIMAL(38,0)) AS sx",
          "CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) AS sxx",
          "CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS sxy")
        val merged = latestMoments(s, momentsPath, batchId)
          .unionByName(inc)
          .groupBy(col("event_type"))
          .agg(expr("CAST(sum(n_days) AS LONG) AS n_days"),
            expr("CAST(sum(sy) AS LONG) AS sy"),
            expr("CAST(sum(sx) AS DECIMAL(38,0)) AS sx"),
            expr("CAST(sum(sxx) AS DECIMAL(38,0)) AS sxx"),
            expr("CAST(sum(sxy) AS DECIMAL(38,0)) AS sxy"))
        merged.coalesce(1).write.mode("overwrite")
          .parquet(s"$momentsPath/m_batch=$batchId")
        graft.Blocks.release(b)
        ()
      }
      .start()

  /** The newest committed moments version strictly BEFORE `batchId`
    * ([[trendStream]] re-execution safety); empty when none exists. */
  private[graft] def latestMoments(s: SparkSession, momentsPath: String,
                                   batchId: Long): DataFrame = {
    val dirs = Option(new java.io.File(momentsPath).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("m_batch="))
      .map(f => (f.getName.stripPrefix("m_batch=").toLong, f))
      .filter(_._1 < batchId)
    if (dirs.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], trendMomentsSchema)
    else s.read.schema(trendMomentsSchema)
      .parquet(dirs.maxBy(_._1)._2.getAbsolutePath)
  }

  /** [[EventAnalytics.eventsTrend]]'s output computed from the newest
    * persisted [[trendStream]] moments — the serve path: identical
    * slope/intercept expressions over the exact integer moments. */
  def trendFromMoments(s: SparkSession, momentsPath: String): DataFrame = {
    val m = latestMoments(s, momentsPath, Long.MaxValue)
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val num = dec(col("n_days")) * col("sxy") - col("sx") * dec(col("sy"))
    val den = dec(col("n_days")) * col("sxx") - col("sx") * col("sx")
    val slope = num.cast("double") / den.cast("double")
    m.select(col("event_type"), col("n_days"),
      col("sy").cast("long").as("total"),
      org.apache.spark.sql.functions.when(col("n_days") < 2,
        org.apache.spark.sql.functions.lit(null).cast("double"))
        .otherwise(org.apache.spark.sql.functions.round(slope, 9)).as("slope"),
      org.apache.spark.sql.functions.when(col("n_days") < 2,
        org.apache.spark.sql.functions.lit(null).cast("double"))
        .otherwise(org.apache.spark.sql.functions.round(
          (col("sy").cast("double") - slope * col("sx").cast("double")) /
            col("n_days").cast("double"), 6)).as("intercept"))
  }
}
