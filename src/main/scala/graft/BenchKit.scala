package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

/** Shared measurement plumbing for the driver-facing mains (Bench,
  * CadenceSweep, Verify, PlanDump). One definition of the session
  * config, the order-insensitive checksum, and the median keeps
  * "measured under bench conditions" structural: a config or checksum
  * change lands in every harness at once instead of silently
  * desynchronizing a copy. */
private[graft] object BenchKit {

  /** The bench session: one executor thread per core (overridable via
    * SPARK_GRAFT_CPUS), shuffle partitions matched to it, UTC, the
    * graft extensions, legacy nanos-as-long kept for older testdata
    * encodings (harmless when the files are TIMESTAMP_NTZ micros —
    * graft.Tables canonicalizes either), no UI. */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ContextCleaner reclaims broadcasts and finished-job shuffle files
      // only after the driver GCs (weak-reference queue); the default
      // periodic-GC interval is 30 min — longer than an entire bench run —
      // so on a mostly-idle 4 GB heap the debris of ~137 queries × 4
      // executions just accumulates (round-8: citation_hits runs grew
      // 19→28→42 s between swept runs; its alphabetical successors
      // inherited the pressure). 60 s keeps reclamation inside the run.
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Blocks.quietReleaseWarnings() // harness JVM: deliberate releases only
    spark
  }

  /** Materialize every projected column of every row through the full
    * plan via an order-insensitive checksum — unlike `.count()`, a
    * projection-only query cannot degenerate into a parquet row-count.
    * bit_xor, not sum: summing 2^63-scale hashes overflows under ANSI. */
  def checksum(df: DataFrame): Unit =
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      .agg(bit_xor(col("h"))).collect()

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }
}
