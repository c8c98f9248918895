package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Canonicalize on-disk timestamp encodings to session-zone
    * `TimestampType` — the type every operator and oracle was written
    * against. The driver has shipped the time columns two ways across
    * data regenerations, and this seam absorbs both:
    *
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4
    *    infers as TIMESTAMP_NTZ: cast to TimestampType. The session zone
    *    is pinned to UTC everywhere (Verify/Bench/tests), so the cast
    *    reinterprets the wall-clock as the same instant — value-identical
    *    to what DuckDB reads from the same file.
    *  - parquet TIMESTAMP(NANOS) surfaced as raw int64 via
    *    spark.sql.legacy.parquet.nanosAsLong=true (Spark 4 refuses to map
    *    nanos to TimestampType — PARQUET_TYPE_ILLEGAL): truncate to micros
    *    with INTEGER division (a double division would lose precision at
    *    ~1.7e18 ns) — the same floor-to-µs conversion DuckDB applies.
    *
    * Applied to every column so `o_orderdate`/`l_shipdate`/`ts` all land
    * on one canonical type regardless of which encoding is on disk; a
    * no-op (same plan, no extra projection) when the scan already yields
    * TimestampType.
    */
  private[graft] def canonTimestamps(df: DataFrame, nanosLongCols: Set[String]): DataFrame = {
    val fixes = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType =>
        f.name -> col(f.name).cast(TimestampType)
      case f if f.dataType == LongType && nanosLongCols(f.name) =>
        f.name -> expr(s"timestamp_micros(${f.name} div 1000)")
    }
    fixes.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is the one column that has shipped as TIMESTAMP(NANOS);
    // the relational date columns were never longs, so an int64 there is
    // a genuine integer and must not be reinterpreted.
    canonTimestamps(raw, if (name == "events") Set("ts") else Set.empty)
  }

  /** Register every table as a temp view so `spark.sql` text matches the
    * DuckDB oracle text where convenient. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
