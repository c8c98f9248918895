package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-corpus ingest for the line-oriented interchange formats a
  * training pipeline actually receives — JSONL and CSV — with the same
  * contract as [[EdgeListReader]]: schema-enforced, PERMISSIVE (a corrupt
  * record never kills the job), and with the dropped rows captured as a
  * quarantine FRAME rather than a log line, so data loss is observable
  * and attributable downstream.
  *
  * Both readers parallelize by input splits (`spark.read.json/csv` over
  * line-delimited files splits like any text source), enforce the
  * documents schema EXPLICITLY (never `inferSchema` — at 100 TB a schema
  * inference pass is a full extra read, and a drifting input schema
  * should fail loudly, not adapt silently), and mark corrupt records via
  * `columnNameOfCorruptRecord` instead of failing or silently nulling.
  */
object DocCorpusReader {

  /** The documents schema (TESTDATA.md) plus the corrupt-record channel. */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt", StringType)))

  private val DocCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private def splitQuarantine(parsed: DataFrame): (DataFrame, DataFrame) = {
    // a row is quarantined if it failed to parse OR parsed without the
    // primary key — a keyless document is untraceable downstream
    val bad = parsed.where(col("_corrupt").isNotNull || col("doc_id").isNull)
      .select(col("_corrupt").as("raw_record"), col("doc_id"))
    val good = parsed.where(col("_corrupt").isNull && col("doc_id").isNotNull)
      .select(DocCols.map(col): _*)
    (good, bad)
  }

  /** JSONL: one JSON object per line. */
  def readJsonl(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    splitQuarantine(spark.read
      .schema(DocSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path))

  /** Headered CSV with quoting (documents text may contain commas). */
  def readCsv(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    splitQuarantine(spark.read
      .schema(DocSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path))

  /** Round-trip writers (sharded line files, the interchange shape the
    * readers expect). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.select(DocCols.map(col): _*).write.mode("overwrite").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.select(DocCols.map(col): _*).write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(path)
}
