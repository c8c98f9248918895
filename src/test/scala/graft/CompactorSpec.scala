package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, max, min}

import graft.sources.Compactor

class CompactorSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compact: fragmented table repacks to the planned file count with identical rows") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/docs"
    val docs = Tables.load(spark, sf, "documents")
    docs.repartition(16).write.parquet(dir)
    assert(parquetFiles(dir).length === 16)

    val before = docs.as[(Long, String, String, String, Long)].collect().toSet
    val p0 = Compactor.plan(spark, dir, targetBytes = 1L << 40)
    assert(p0.currentFiles === 16 && p0.targetFiles === 1 && p0.worthwhile)

    // target a quarter of the measured bytes -> 4 files (+1 tolerance for
    // round-robin skew in the last file)
    val target = p0.totalBytes / 4
    val done = Compactor.compact(spark, dir, targetBytes = target)
    // file count = the PRE-compaction plan (the post state can legally
    // re-plan smaller: fewer footers + better column-chunk compression
    // shrink the byte total, which is part of the point)
    assert(done.currentFiles === (p0.totalBytes + target - 1) / target)
    assert(done.totalBytes <= p0.totalBytes,
      s"compaction grew the table: $done vs $p0")
    assert(parquetFiles(dir).length === done.currentFiles)
    val after = spark.read.parquet(dir)
      .as[(Long, String, String, String, Long)].collect().toSet
    assert(after === before, "compaction changed the row set")
    // temp/backup dirs cleaned up
    assert(!new java.io.File(dir + ".__compact_tmp").exists())
    assert(!new java.io.File(dir + ".__compact_old").exists())
  }

  test("compact with sortCols: per-file key ranges stay non-overlapping (skipping survives)") {
    val dir = Files.createTempDirectory("graft-compact-z").toString + "/docs"
    val docs = Tables.load(spark, sf, "documents")
    docs.repartition(12).write.parquet(dir)

    val total = Compactor.plan(spark, dir, 1).totalBytes
    Compactor.compact(spark, dir, targetBytes = total / 3,
      sortCols = Seq("doc_id"))

    // each output file owns a compact doc_id range; ranges must not
    // overlap or min/max skipping is gone
    val ranges = parquetFiles(dir).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("doc_id")), max(col("doc_id"))).first()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(ranges.length >= 3)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"overlapping file ranges: $hiA vs $loB")
      case _ =>
    }
    // content unchanged
    assert(spark.read.parquet(dir).count() === docs.count())
  }

  test("compact is a no-op when fragmentation is already at or below target") {
    val dir = Files.createTempDirectory("graft-compact-noop").toString + "/docs"
    Tables.load(spark, sf, "documents").coalesce(2).write.parquet(dir)
    val files = parquetFiles(dir).map(f => (f.getName, f.lastModified)).toSet
    val p = Compactor.compact(spark, dir, targetBytes = 1) // would EXPAND: no-op
    assert(!p.worthwhile)
    assert(parquetFiles(dir).map(f => (f.getName, f.lastModified)).toSet === files,
      "no-op compaction touched files")
  }
}
