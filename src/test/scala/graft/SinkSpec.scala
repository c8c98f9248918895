package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Pipeline
import graft.sources.BucketedSink

/** The sink half of the pipeline story: the training manifest written
  * hive-partitioned by (split, lang), and the read side proving a
  * trainer's slice scan is partition-PRUNED (no data outside the slice
  * is read). */
class SinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("partitioned manifest: layout on disk, round-trip, pruned slice scan") {
    val out = Files.createTempDirectory("graft-manifest").toString
    val manifest = Pipeline.pipelineE2e(spark, sf)
    BucketedSink.writePartitioned(manifest, out, Seq("split", "lang"))

    // hive layout exists
    val splitDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(splitDirs.contains("split=train") && splitDirs.contains("split=holdout"))

    // round-trip preserves the manifest exactly
    val back = spark.read.parquet(out)
      .select("doc_id", "lang", "n_tokens", "split")
    assert(back.collect().map(_.toString).sorted.toSeq ===
      manifest.select("doc_id", "lang", "n_tokens", "split")
        .collect().map(_.toString).sorted.toSeq)

    // a trainer reading one slice gets partition pruning: the slice
    // predicate lands in PartitionFilters, and the scanned row count is
    // the slice, not the corpus
    val slice = spark.read.parquet(out)
      .where(col("split") === "train" && col("lang") === "en")
    val plan = slice.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(split"),
      s"slice predicate not pushed to partitions:\n$plan")
    val expected = manifest
      .where(col("split") === "train" && col("lang") === "en").count()
    assert(slice.count() === expected)
    assert(expected > 0)
  }
}
