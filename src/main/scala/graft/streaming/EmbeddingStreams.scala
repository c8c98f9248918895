package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.operators.Similarity

/** Streaming ingest of the embeddings corpus — the incremental half of
  * the model-fit family: the PCA Gramian maintained AT INGEST, so the
  * covariance model is always current instead of being refit from
  * scratch per batch.
  *
  * This is the streaming shape a 100-TB embedding store wants: the
  * running XᵀX is a streaming AGGREGATE whose state is d(d+1)/2 cells
  * BY SCHEMA (2,080 rows at d=64 — independent of how many vectors ever
  * arrive), each micro-batch folds its partial outer-product sums into
  * that state through the normal partial-aggregation path, and the
  * driver can assemble covariance + eigenvectors from the emitted frame
  * at any time ([[Similarity.pcaFit]] math). No watermark is needed:
  * the state never grows with the stream, only with the schema.
  */
object EmbeddingStreams {

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def readEmbeddings(spark: SparkSession, dir: String,
                     maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(embSchema)
    maxFilesPerTrigger.map(n => reader.option("maxFilesPerTrigger", n))
      .getOrElse(reader).parquet(dir)
  }

  /** Incremental Gramian: the IDENTICAL transform as the batch
    * `embedding_gram` query ([[Similarity.gramOf]] — shared code, so
    * grouping and rounding agree by construction). Run with Complete
    * output mode: the emitted table IS the running model. Parity with
    * the batch Gramian over the same rows — including shuffled,
    * multi-batch arrival — is asserted in EmbeddingStreamsSpec. */
  def gramStream(vecs: DataFrame): DataFrame = Similarity.gramOf(vecs)

  /** Nearest-centroid assignment at ingest: every arriving vector is
    * labeled with its cluster under a FIXED trained k-means model (the
    * serve-path half of `embedding_kmeans` — train batch, assign
    * streaming). The model folds into the plan as literal arrays exactly
    * like the batch assignment ([[Similarity.assignKmLit]] — shared code,
    * so batch/stream parity holds by construction), which makes this a
    * pure per-row projection: NO state, no watermark, Append mode, and
    * at 100 TB/day ingest the operator is embarrassingly parallel — each
    * micro-batch partition scans once and writes once. */
  def assignStream(vecs: DataFrame, model: Array[Array[Float]]): DataFrame =
    Similarity.assignKmLit(vecs, model)
      .select("vec_id", "label", "cluster", "dist")

  /** Int8 quantization at ingest under a FIXED per-dimension scale model
    * (train batch via [[Similarity.quantizeScales]], quantize streaming —
    * the `embedding_quantize` serve path). The scales fold into the plan
    * as 64 literals ([[Similarity.quantizeLit]] — shared code, so
    * batch/stream parity holds by construction): a pure per-row
    * projection, NO state, no watermark, Append mode — at 100-TB/day
    * ingest each micro-batch partition scans once and writes once. */
  def quantizeStream(vecs: DataFrame, scales: Array[Double]): DataFrame =
    Similarity.quantizeLit(vecs, scales)
}
