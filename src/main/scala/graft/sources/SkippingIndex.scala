package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data-skipping index — the manifest side of scan pruning.
  *
  * Parquet footers already carry row-group min/max, but the scheduler
  * still has to OPEN every file to read them; at 100 TB / ~100k files
  * that is 100k round-trips before the first byte of data. A persisted
  * per-file (min, max) manifest inverts the cost: planning reads ONE
  * small table (rows = #files, not #records), prunes to the files whose
  * range intersects the predicate, and hands the scan an explicit file
  * list. Paired with [[ZOrderLayout]] — which is what makes the per-file
  * ranges TIGHT on two dimensions at once — this is the
  * layout + manifest pattern behind lakehouse table formats.
  *
  * The stats build is one distributed aggregate grouped on
  * `_metadata.file_path` (no extra scan of the data later; the manifest
  * is written once per layout run and appended per ingest). The driver
  * materializes only the pruned FILE LIST — manifest-scale, bounded by
  * file count BY CONSTRUCTION, never corpus-scale rows.
  */
object SkippingIndex {

  /** Per-file min/max stats over `cols` — one row per data file. */
  def buildStats(spark: SparkSession, dataPath: String,
                 cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(dataPath)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Build and persist the manifest next to (but outside) the data. */
  def writeStats(spark: SparkSession, dataPath: String, statsPath: String,
                 cols: Seq[String]): Unit =
    buildStats(spark, dataPath, cols)
      .coalesce(1) // manifest-scale: one row per data file
      .write.mode("overwrite").parquet(statsPath)

  /** Files whose [min, max] on `c` intersects [lo, hi] — the keep list
    * plus the total file count (for pruning-ratio reporting). */
  def pruneFiles(spark: SparkSession, statsPath: String, c: String,
                 lo: Long, hi: Long): (Seq[String], Long) = {
    val stats = spark.read.parquet(statsPath)
    val keep = stats
      .where(col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toSeq
    (keep, stats.count())
  }

  /** Range-predicate read through the manifest: only intersecting files
    * are listed to the scan (the predicate is still applied — skipping
    * is an optimization, never a semantic filter). Returns the frame and
    * the (files read, files total) pruning evidence. */
  def prunedRead(spark: SparkSession, dataPath: String, statsPath: String,
                 c: String, lo: Long, hi: Long): (DataFrame, Int, Long) = {
    val (keep, total) = pruneFiles(spark, statsPath, c, lo, hi)
    val pred = col(c).between(lo, hi)
    val df =
      if (keep.isEmpty)
        spark.read.parquet(dataPath).where(pred).limit(0)
      else
        spark.read.parquet(keep: _*).where(pred)
    (df, keep.length, total)
  }
}
