package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.streaming.EmbeddingStreams

/** Streaming model-fit parity: the Gramian maintained at ingest must
  * equal the batch Gramian over the same vectors, cell for cell, no
  * matter how arrival is batched — and its state must be bounded by the
  * SCHEMA (d(d+1)/2 cells), not by the stream length. */
class EmbeddingStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("streaming gram: complete-mode state equals batch Gramian across shuffled batches") {
    val vecs = Tables.load(spark, sf, "embeddings")

    // two arrival chunks, deliberately NOT in vec_id order
    val dir = Files.createTempDirectory("graft-embstream").toString
    vecs.where($"vec_id" % 3 === 1).coalesce(1).write.parquet(s"$dir/b1")
    vecs.where($"vec_id" % 3 =!= 1).coalesce(1).write.parquet(s"$dir/b2")
    val streamDir = Files.createTempDirectory("graft-embstream-in").toString
    def copyPart(sub: String, name: String): Unit = {
      val part = new java.io.File(s"$dir/$sub").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$streamDir/$name"))
    }
    copyPart("b1", "000.parquet")
    copyPart("b2", "001.parquet")
    val now = System.currentTimeMillis()
    new java.io.File(s"$streamDir/000.parquet").setLastModified(now - 60000)
    new java.io.File(s"$streamDir/001.parquet").setLastModified(now)

    val q = EmbeddingStreams.gramStream(
        EmbeddingStreams.readEmbeddings(spark, streamDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("emb_gram")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("emb_gram")
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val batch = Similarity.embeddingGram(spark, sf)
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap

    // cell-for-cell parity on the upper triangle — same transform code,
    // same 6-dp grid, so equality is exact, not approximate
    assert(streamed.size === 64 * 65 / 2)
    assert(streamed === batch)

    // the streaming state is schema-bounded: one row per (i <= j) cell,
    // NOT one per arrived vector
    val stateRows = q.lastProgress.stateOperators.asInstanceOf[Array[_]]
      .map(_.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
        .numRowsTotal).sum
    assert(stateRows === 64L * 65 / 2,
      s"gram state should be d(d+1)/2 cells, got $stateRows")
  }

  test("streaming assign: per-vector cluster labels equal the batch assignment, zero state") {
    val vecs = Tables.load(spark, sf, "embeddings")
    val model = Similarity.kmeansFit(spark, sf)

    val streamDir = Files.createTempDirectory("graft-assignstream").toString
    vecs.where($"vec_id" % 2 === 0).coalesce(1).write.mode("append").parquet(streamDir)
    vecs.where($"vec_id" % 2 =!= 0).coalesce(1).write.mode("append").parquet(streamDir)

    val q = EmbeddingStreams.assignStream(
        EmbeddingStreams.readEmbeddings(spark, streamDir, maxFilesPerTrigger = Some(1)),
        model)
      .writeStream.format("memory").queryName("emb_assign")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("emb_assign")
      .as[(Long, Int, Int, Double)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    val batch = Similarity.embeddingKmeans(spark, sf)
      .as[(Long, Int, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // shared literal-fold projection => parity is EXACT, per vector
    assert(streamed === batch)

    // stateless by construction: the assignment keeps no streaming state
    val stateRows = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    assert(stateRows === 0L, s"assignment should keep zero state, got $stateRows")
  }

  test("streaming quantize: per-vector summaries equal the batch query, zero state") {
    val vecs = Tables.load(spark, sf, "embeddings")
    val scales = Similarity.quantizeScales(spark, sf)

    val streamDir = Files.createTempDirectory("graft-quantstream").toString
    vecs.where($"vec_id" % 2 === 0).coalesce(1).write.mode("append").parquet(streamDir)
    vecs.where($"vec_id" % 2 =!= 0).coalesce(1).write.mode("append").parquet(streamDir)

    val q = EmbeddingStreams.quantizeStream(
        EmbeddingStreams.readEmbeddings(spark, streamDir, maxFilesPerTrigger = Some(1)),
        scales)
      .writeStream.format("memory").queryName("emb_quant")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("emb_quant")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val batch = Similarity.embeddingQuantize(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // shared literal-fold projection + exact decimal error sums => the
    // streamed summaries equal the oracled corpus query's, per vector
    assert(streamed === batch)

    val stateRows = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    assert(stateRows === 0L, s"quantization should keep zero state, got $stateRows")
  }
}
