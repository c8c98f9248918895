package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the layout maintenance every ingest leaves
  * behind. Micro-batch sinks ([[graft.streaming.DocStreams.indexIngestStream]],
  * any `foreachBatch` writer) and over-parallel batch writes emit one
  * file per task per trigger; at 100 TB a table quietly accumulates
  * millions of tiny files, and from then on scan cost is dominated not
  * by bytes but by per-file overhead (driver listing + split planning,
  * one open()/footer-read per file, row groups too small for effective
  * column-chunk compression and min/max skipping).
  *
  * [[compact]] rewrites a parquet directory into ~`targetBytes` files,
  * sized from the MEASURED on-disk byte total (never a row-count guess —
  * row width varies wildly across tables): `ceil(total / target)` output
  * files via one round-robin repartition, or a range partition +
  * within-partition sort when `sortCols` is given, so a clustered layout
  * (e.g. [[ZOrderLayout]]'s) keeps its tight per-file min/max ranges
  * through compaction instead of being shuffled away.
  *
  * The swap is write-to-temp, then two renames (dir → .old, tmp → dir),
  * then delete — crash-safe for the DATA (every row exists in at least
  * one complete directory at every instant, and a half-written temp is
  * simply re-compactable) but NOT snapshot-isolated for concurrent
  * readers: a scan that lists mid-swap can see a missing directory. At
  * cluster scale that isolation is a transactional table format's job
  * (manifest-swap commits); this is the layout primitive such a commit
  * would wrap. CompactorSpec drives the full cycle: fragmented write →
  * compact → identical row set, expected file count, clustering
  * preserved under `sortCols`.
  */
object Compactor {

  /** What a compaction run would do (or did): measured current state and
    * the target file count derived from it. */
  case class CompactionPlan(currentFiles: Int, totalBytes: Long,
                            targetFiles: Int) {
    def worthwhile: Boolean = targetFiles < currentFiles
  }

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Measure `dir` and size the compaction: ceil(totalBytes /
    * targetBytes) output files, floored at 1. Pure planning — no I/O
    * beyond one directory listing (on an object store, one LIST). */
  def plan(spark: SparkSession, dir: String, targetBytes: Long): CompactionPlan = {
    val files = fs(spark, dir).listStatus(new HPath(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val total = files.map(_.getLen).sum
    val target = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    CompactionPlan(files.length, total, target)
  }

  /** Compact `dir` in place to ~`targetBytes` files. No-op (returns the
    * plan unchanged) when the rewrite would not reduce the file count.
    * `sortCols` switches the rewrite from round-robin to
    * range-partition + within-partition sort on those columns, so each
    * output file owns a compact, non-overlapping key range (min/max
    * skipping keeps working after compaction). */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              sortCols: Seq[String] = Nil): CompactionPlan = {
    val p = plan(spark, dir, targetBytes)
    if (!p.worthwhile) return p
    val df: DataFrame = spark.read.parquet(dir)
    val repacked =
      if (sortCols.isEmpty) df.repartition(p.targetFiles)
      else df.repartitionByRange(p.targetFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    val tmp = dir.stripSuffix("/") + ".__compact_tmp"
    val old = dir.stripSuffix("/") + ".__compact_old"
    repacked.write.mode("overwrite").parquet(tmp)
    val f = fs(spark, dir)
    f.delete(new HPath(old), true)
    if (!f.rename(new HPath(dir), new HPath(old)))
      throw new java.io.IOException(s"compaction swap failed renaming $dir aside")
    if (!f.rename(new HPath(tmp), new HPath(dir))) {
      // roll back so the table stays readable at its original path
      f.rename(new HPath(old), new HPath(dir))
      throw new java.io.IOException(s"compaction swap failed installing $tmp")
    }
    f.delete(new HPath(old), true)
    plan(spark, dir, targetBytes)
  }
}
