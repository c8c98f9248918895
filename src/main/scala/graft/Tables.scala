package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver's parquet tables (`TESTDATA.md`).
  *
  * All queries take an `sfDir` (e.g. `/root/testdata/sf0.01`) and read the
  * table they need lazily — Catalyst prunes columns and pushes filters into
  * the parquet scan, so loading "the whole table" here costs nothing beyond
  * what the query actually touches. At cluster scale the same code reads a
  * partitioned table root instead of a single file; nothing here assumes
  * single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
      // to TimestampType (PARQUET_TYPE_ILLEGAL). The session must set
      // spark.sql.legacy.parquet.nanosAsLong=true at construction (Verify,
      // Bench, and SparkTestBase all do); we then truncate the raw int64
      // nanos to micros with INTEGER division (a double division would
      // lose precision at ~1.7e18 ns) — same floor-to-µs conversion DuckDB
      // applies, so the oracle sees identical values.
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register every table as a temp view so `spark.sql` text matches the
    * DuckDB oracle text where convenient. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
