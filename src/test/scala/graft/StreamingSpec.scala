package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.EventAnalytics
import graft.streaming.EventStreams

/** Batch/stream parity: the same window transforms produce identical
  * results whether run over the events table (batch) or incrementally
  * over a watermarked file stream.
  *
  * Mechanics: append-mode aggregations only emit groups the watermark has
  * passed, so the stream directory gets a far-future SENTINEL event in a
  * second micro-batch (maxFilesPerTrigger=1) — processing it pushes the
  * watermark past every real window/session, which flushes them all; the
  * sentinel's own groups stay unemitted in state and are filtered out of
  * the comparison by construction (future window_start / negative user). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private lazy val (streamDir, maxMicros): (String, Long) = {
    val dir = Files.createTempDirectory("graft-stream").toFile.getAbsolutePath
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$dir/000_events.parquet"))
    val mx = Tables.load(spark, sf, "events")
      .agg(expr("max(unix_micros(ts))")).first().getLong(0)
    val sentinelMicros = mx + 30L * 24 * 3600 * 1000000L
    // ts must be written TIMESTAMP_NTZ to match the on-disk encoding of
    // the copied events file (one stream schema across the directory)
    val sentinel = Seq((-1L, sentinelMicros, -1L, "__sentinel", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
    val tmp2 = Files.createTempDirectory("graft-sentinel").toFile.getAbsolutePath
    sentinel.coalesce(1).write.mode("overwrite").parquet(tmp2)
    val part = new File(tmp2).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(s"$dir/001_sentinel.parquet"))
    (dir, mx)
  }

  private def events(): DataFrame =
    EventStreams.readEvents(spark, streamDir, maxFilesPerTrigger = Some(1))

  private def runStream(df: DataFrame, name: String,
                        mode: String = "append"): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("tumbling windows: stream == batch") {
    val stream = runStream(EventStreams.tumblingHour(events()), "s_tumbling")
      .where(col("window_start") <= timestamp_micros(lit(maxMicros)))
    val batch = EventAnalytics.tumblingHour(spark, sf)
    assert(rows(stream) === rows(batch))
    assert(rows(stream).nonEmpty)
  }

  test("sliding windows: stream == batch") {
    val stream = runStream(EventStreams.slidingHour(events()), "s_sliding")
      .where(col("window_start") <= timestamp_micros(lit(maxMicros)))
    val batch = EventAnalytics.slidingHour(spark, sf)
    assert(rows(stream) === rows(batch))
  }

  test("session windows: stream == batch") {
    val stream = runStream(EventStreams.sessionize(events()), "s_session")
      .where(col("user_id") >= 0)
    val batch = EventAnalytics.sessionize(spark, sf)
    assert(rows(stream) === rows(batch))
  }

  test("streaming distinct users matches batch exact-distinct counts") {
    val stream = runStream(
      EventStreams.distinctUsers(events()), "s_distinct", mode = "complete")
      .where(col("event_type") =!= "__sentinel")
      .select("event_type", "n_users")
    val batch = EventAnalytics.distinctUsers(spark, sf)
      .select("event_type", "n_users")
    assert(rows(stream) === rows(batch))
  }

  test("bounded-state distinct users: exact within the horizon (single-window stream)") {
    // every real event arrives in micro-batch 1, before the watermark has
    // advanced past anything, so the bounded-state variant dedups the
    // whole corpus and matches batch exact-distinct — the case where the
    // horizon trade-off documented on distinctUsersWithinWatermark is free
    val stream = runStream(
      EventStreams.distinctUsersWithinWatermark(events()), "s_distinct_wm",
      mode = "complete")
      .where(col("event_type") =!= "__sentinel")
      .select("event_type", "n_users")
    val batch = EventAnalytics.distinctUsers(spark, sf)
      .select("event_type", "n_users")
    assert(rows(stream) === rows(batch))
  }

  test("streaming HLL distinct: estimate identical to batch (order-independent merges)") {
    val stream = runStream(
      EventStreams.distinctUsersApproxStream(events()), "s_distinct_hll",
      mode = "complete")
      .where(col("event_type") =!= "__sentinel")
      .select("event_type", "n_users_approx")
    val batch = graft.operators.Sketches.distinctUsersApprox(spark, sf)
    // NOT within-tolerance: HLL register merges are max-operations, so
    // the same user set yields the same registers in any arrival order
    assert(rows(stream) === rows(batch))
    assert(rows(stream).nonEmpty)
  }

  test("watermark drops too-late events (contract documented on EventStreams)") {
    // A third file with an event OLDER than watermark-after-sentinel must
    // not resurrect a closed window: re-run over a dir that also contains
    // a stale event and assert the emitted real windows are unchanged.
    val dir = Files.createTempDirectory("graft-late").toFile.getAbsolutePath
    Files.copy(Paths.get(s"$streamDir/000_events.parquet"),
      Paths.get(s"$dir/000_events.parquet"))
    Files.copy(Paths.get(s"$streamDir/001_sentinel.parquet"),
      Paths.get(s"$dir/001_sentinel.parquet"))
    val stale = Seq((-2L, 1000L * 1000L, -2L, "stale", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
    val tmp2 = Files.createTempDirectory("graft-stale").toFile.getAbsolutePath
    stale.coalesce(1).write.mode("overwrite").parquet(tmp2)
    val part = new File(tmp2).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(s"$dir/002_stale.parquet"))

    val stream = runStream(
      EventStreams.tumblingHour(
        EventStreams.readEvents(spark, dir, maxFilesPerTrigger = Some(1))),
      "s_late")
      .where(col("window_start") <= timestamp_micros(lit(maxMicros)))
    val batch = EventAnalytics.tumblingHour(spark, sf)
    assert(rows(stream) === rows(batch))
  }

  test("out-of-order arrival within the delay merges exactly as batch") {
    // Shuffled-arrival construction: partition event time into days and
    // hold each day's FINAL 5 minutes back one micro-batch — those events
    // arrive AFTER earlier-timestamped events of the next day (genuinely
    // out of order across batches), but the watermark when they arrive is
    // ~(previous day end - 15 min), i.e. they are always late-but-within
    // the 10-minute delay, so the contract says they must merge into
    // their (still open) windows and sessions exactly as in batch.
    val raw = spark.read.parquet(s"$sf/events.parquet") // ts: TIMESTAMP_NTZ micros
    val dayU = 24L * 3600 * 1000000L
    val holdU = 5L * 60 * 1000000L
    val tagged = raw
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("day", expr(s"us div $dayU"))
      .withColumn("late", expr(s"us % $dayU >= ${dayU - holdU}"))
    val nLate = tagged.where(col("late")).count()
    assert(nLate > 0, "no events in any day's final 5 minutes - nothing shuffled")
    val days = tagged.select("day").distinct().as[Long].collect().sorted.toSeq

    val dir = Files.createTempDirectory("graft-ooo").toFile.getAbsolutePath
    def writePart(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-ooo-tmp").toFile.getAbsolutePath
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$dir/$name"))
      new File(s"$dir/$name").setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    val cols = raw.columns.map(col)
    days.zipWithIndex.foreach { case (d, i) =>
      val chunk = tagged.where(
        (col("day") === d && !col("late")) || (col("day") === d - 1 && col("late")))
      writePart(chunk.select(cols: _*), f"$i%03d.parquet",
        now - (days.length - i + 2) * 60000L)
    }
    // the last day's held-back tail, then the flush sentinel
    writePart(tagged.where(col("day") === days.last && col("late"))
      .select(cols: _*), f"${days.length}%03d.parquet", now - 60000L)
    val sentinelName = f"${days.length + 1}%03d_sentinel.parquet"
    Files.copy(Paths.get(s"$streamDir/001_sentinel.parquet"),
      Paths.get(s"$dir/$sentinelName"))
    new File(s"$dir/$sentinelName").setLastModified(now)

    def ooo(): DataFrame =
      EventStreams.readEvents(spark, dir, maxFilesPerTrigger = Some(1))
    val tumbling = runStream(EventStreams.tumblingHour(ooo()), "s_ooo_tumbling")
      .where(col("window_start") <= timestamp_micros(lit(maxMicros)))
    assert(rows(tumbling) === rows(EventAnalytics.tumblingHour(spark, sf)))
    val sessions = runStream(EventStreams.sessionize(ooo()), "s_ooo_session")
      .where(col("user_id") >= 0)
    assert(rows(sessions) === rows(EventAnalytics.sessionize(spark, sf)))
  }

  test("streaming funnel: stage counts match batch across time-split micro-batches") {
    // two micro-batches split very early (2nd percentile of event time),
    // so nearly every user's funnel spans the split and exercises
    // cross-batch state carry
    val raw = spark.read.parquet(s"$sf/events.parquet") // ts: TIMESTAMP_NTZ micros
    val med = raw.selectExpr(
      "CAST(percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.02) AS LONG)")
      .first().getLong(0)
    val dir = Files.createTempDirectory("graft-funnel").toFile.getAbsolutePath
    def writePart(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-funnel-tmp").toFile.getAbsolutePath
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$dir/$name"))
      new File(s"$dir/$name").setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    val usCol = unix_micros(col("ts").cast("timestamp"))
    writePart(raw.where(usCol < med), "000.parquet", now - 60000)
    writePart(raw.where(usCol >= med), "001.parquet", now)

    val emitted = runStream(
      EventStreams.funnelStream(
        EventStreams.readEvents(spark, dir, maxFilesPerTrigger = Some(1))).toDF(),
      "s_funnel")
    // each user reaches each stage at most once
    assert(emitted.groupBy("user_id", "stage").count()
      .where(col("count") > 1).count() === 0)
    val streamCounts = emitted.groupBy("stage").count()
      .as[(String, Long)].collect().toMap
    val batchCounts = EventAnalytics.eventsFunnel(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(streamCounts === batchCounts.filter(_._2 > 0))
    // cross-batch progress actually exercised: someone reaches a later
    // stage after the split while their view landed before it
    val firstBatchViewers = raw.where(usCol < med)
      .where(col("event_type") === "view")
      .select("user_id").distinct().as[Long].collect().toSet
    val lateAdvancers = emitted
      .where(col("stage") =!= "1_view" &&
        col("ts") >= timestamp_micros(lit(med)))
      .select("user_id").as[Long].collect().toSet
    assert(lateAdvancers.exists(firstBatchViewers.contains),
      "no user advanced past the split - the split did not test state carry")
  }

  test("streaming transitions: pair matrix == batch lag window across a time split") {
    // same early-split harness as the funnel test: nearly every user's
    // event chain spans the split, so pairs must bridge carried state
    val raw = spark.read.parquet(s"$sf/events.parquet") // ts: TIMESTAMP_NTZ micros
    val med = raw.selectExpr(
      "CAST(percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.02) AS LONG)")
      .first().getLong(0)
    val dir = Files.createTempDirectory("graft-trans").toFile.getAbsolutePath
    def writePart(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-trans-tmp").toFile.getAbsolutePath
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$dir/$name"))
      new File(s"$dir/$name").setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    val usCol = unix_micros(col("ts").cast("timestamp"))
    writePart(raw.where(usCol < med), "000.parquet", now - 60000)
    writePart(raw.where(usCol >= med), "001.parquet", now)

    val emitted = runStream(
      EventStreams.transitionStream(
        EventStreams.readEvents(spark, dir, maxFilesPerTrigger = Some(1))).toDF(),
      "s_transitions")
    val streamMatrix = emitted.groupBy("from_type", "to_type").count()
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => ((a, b), n) }.toMap
    val batchMatrix = SparkEntry.queries("events_transitions")(spark, sf)
      .select(col("from_type"), col("to_type"), col("n_transitions"))
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => ((a, b), n) }.toMap
    assert(streamMatrix === batchMatrix)
    // the split actually exercised state carry: some pair's later event
    // lands at-or-after the split while its earlier one landed before
    val crossPairs = emitted
      .where(col("ts") >= timestamp_micros(lit(med))).count()
    assert(crossPairs > 0 && emitted.count() > crossPairs)
  }

  test("streaming ewma: smoothed values == batch 8-lag window across a time split") {
    // early split: nearly every user's tap buffer spans it, so the ring
    // buffer must carry across micro-batches for parity to hold
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val med = raw.selectExpr(
      "CAST(percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.02) AS LONG)")
      .first().getLong(0)
    val dir = Files.createTempDirectory("graft-ewma").toFile.getAbsolutePath
    def writePart(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-ewma-tmp").toFile.getAbsolutePath
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$dir/$name"))
      new File(s"$dir/$name").setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    val usCol = unix_micros(col("ts").cast("timestamp"))
    writePart(raw.where(usCol < med), "000.parquet", now - 60000)
    writePart(raw.where(usCol >= med), "001.parquet", now)

    val emitted = runStream(
      EventStreams.ewmaStream(
        EventStreams.readEvents(spark, dir, maxFilesPerTrigger = Some(1))).toDF(),
      "s_ewma")
    val streamed = emitted.select("user_id", "event_id", "ewma")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val batch = SparkEntry.queries("events_ewma")(spark, sf)
      .select(col("user_id"), col("event_id"), col("ewma"))
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(streamed === batch)
    // the split exercised tap carry: rows emitted after it whose user
    // already had taps before it
    val earlyUsers = raw.where(usCol < med)
      .select("user_id").distinct().as[Long].collect().toSet
    val lateRows = emitted.where(col("ts") >= timestamp_micros(lit(med)))
      .select("user_id").as[Long].collect()
    assert(lateRows.exists(earlyUsers.contains),
      "no user's taps spanned the split - state carry untested")
  }

  test("streaming scd2 merge: folded dimension == batch derivation across 3 ordered batches") {
    // three event-time-ORDERED micro-batches (tercile splits) — the
    // scd2MergeStream ingest contract; each batch merge-applies into
    // the persisted dimension, and the folded merge law says the final
    // version equals the from-scratch batch derivation
    val raw = spark.read.parquet(s"$sf/events.parquet") // ts: TIMESTAMP_NTZ micros
    val cuts = raw.selectExpr(
      "CAST(percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.33) AS LONG)",
      "CAST(percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.66) AS LONG)")
      .first()
    val (c1, c2) = (cuts.getLong(0), cuts.getLong(1))
    val dir = Files.createTempDirectory("graft-scd2-in").toFile.getAbsolutePath
    def writePart(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-scd2-tmp").toFile.getAbsolutePath
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$dir/$name"))
      new File(s"$dir/$name").setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    val usCol = unix_micros(col("ts").cast("timestamp"))
    writePart(raw.where(usCol < c1), "000.parquet", now - 120000)
    writePart(raw.where(usCol >= c1 && usCol < c2), "001.parquet", now - 60000)
    writePart(raw.where(usCol >= c2), "002.parquet", now)

    val dimPath = Files.createTempDirectory("graft-scd2-dim").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft-scd2-ckpt").toFile.getAbsolutePath
    val q = EventStreams.scd2MergeStream(
      EventStreams.readEvents(spark, dir, maxFilesPerTrigger = Some(1)),
      dimPath, ckpt)
    q.processAllAvailable()
    q.stop()

    // one dimension version per micro-batch, monotonically numbered
    val versions = new File(dimPath).listFiles()
      .filter(_.getName.startsWith("dim_batch=")).map(_.getName).sorted
    assert(versions.length === 3, s"expected 3 dim versions, got ${versions.toSeq}")

    def rows(df: DataFrame) = df
      .as[(Long, String, java.sql.Timestamp,
           Option[java.sql.Timestamp], Int, Int)].collect().toSet
    val streamed = rows(EventStreams.latestDim(spark, dimPath, Long.MaxValue))
    val batch = rows(EventAnalytics.scd2Derive(
      Tables.load(spark, sf, "events")
        .select(col("user_id"), col("event_type").as("state"), col("ts"),
          col("event_id"))))
    assert(streamed === batch)
    // re-execution safety: batch 2 re-run against its input state (the
    // batch-1 dimension) reproduces the SAME final dimension
    val replayed = rows(EventAnalytics.scd2Merge(
      EventStreams.latestDim(spark, dimPath, 2L),
      spark.read.schema(EventStreams.eventsSchema).parquet(s"$dir/002.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
        .select(col("user_id"), col("event_type").as("state"), col("ts"),
          col("event_id"))))
    assert(replayed === batch)
  }

  test("streaming trend: additive moment folds == batch OLS after the sentinel flush") {
    // the sentinel micro-batch pushes the watermark past every real day,
    // so every real (type, day) count appends exactly once and folds into
    // the persisted moments; the sentinel's own day stays open and its
    // type never reaches the moment table
    val momentsPath = Files.createTempDirectory("graft-trend-m").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft-trend-ckpt").toFile.getAbsolutePath
    val q = EventStreams.trendStream(events(), momentsPath, ckpt)
    q.processAllAvailable()
    q.stop()
    val streamed = EventStreams.trendFromMoments(spark, momentsPath)
      .where(col("event_type") =!= "__sentinel")
      .as[(String, Long, Long, Option[Double], Option[Double])].collect().toSet
    val batch = EventAnalytics.eventsTrend(spark, sf)
      .as[(String, Long, Long, Option[Double], Option[Double])].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // versioned moment store: one version per micro-batch (re-execution
    // safety discipline) — at least the data batch and the flush batch
    val versions = new File(momentsPath).listFiles()
      .filter(_.getName.startsWith("m_batch=")).map(_.getName).sorted
    assert(versions.length >= 2, s"expected >=2 moment versions, got ${versions.toSeq}")
  }

  test("stream-stream attribution join: pair set == batch interval join") {
    val stream = runStream(
      EventStreams.attributionStream(events()), "s_attrib")
      .where(col("event_id") >= 0) // drop any sentinel-side artifacts
    val batch = EventAnalytics.attributionPairsFrom(
      Tables.load(spark, sf, "events"))
    assert(rows(stream) === rows(batch))
    assert(rows(stream).nonEmpty, "no view->purchase pairs in the corpus")
    // the join state is interval-bounded: pairs span at most one hour
    val spans = spark.table("s_attrib")
      .select((unix_micros(col("p_ts")) - unix_micros(col("view_ts"))).as("d"))
      .as[Long].collect()
    assert(spans.forall(d => d >= 0 && d <= 3600L * 1000000L))
  }
}
