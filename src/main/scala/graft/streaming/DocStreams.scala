package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, md5}
import org.apache.spark.sql.types._

/** Streaming ingest of the documents corpus — the incremental half of the
  * dedup family: exact dedup AT INGEST, so duplicates never reach the
  * training store at all instead of being cleaned up afterwards.
  */
object DocStreams {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocs(spark: SparkSession, dir: String,
               maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.map(n => reader.option("maxFilesPerTrigger", n))
      .getOrElse(reader).parquet(dir)
  }

  /** Incremental exact dedup on the content hash: only the FIRST arrival
    * of each distinct text is emitted, across micro-batches. State is one
    * 32-byte key per distinct document — unbounded by design, because
    * exact global dedup has an unbounded horizon (cap it with a watermark
    * on an ingest-time column when the dedup window is finite). The
    * batch twin is [[graft.operators.Dedup.dedupExact]]; parity is
    * asserted in DocStreamsSpec. */
  def dedupExactStream(docs: DataFrame): DataFrame =
    docs.withColumn("text_md5", md5(col("text")))
      .dropDuplicates("text_md5")
}
