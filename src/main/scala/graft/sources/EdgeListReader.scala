package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SNAP-style citation edge-list reader.
  *
  * Semantics match the reference's ingest (see SURVEY.md §2.1 O1–O4):
  *   - line-delimited text, fields separated by a single tab
  *     (reference: worker/mapper/mapper.py:75)
  *   - blank lines and lines starting with `#` are skipped
  *     (reference: master/master.py:97,105; check.py:18-19)
  *   - lines that do not split into exactly two fields are dropped, not
  *     fatal (reference: worker/mapper/mapper.py:79-80) — PERMISSIVE
  *   - node ids stay strings; ordering and hashing are lexicographic
  *     (reference: master/master.py:218, worker/mapper/mapper.py:39)
  *
  * Built on `spark.read.text` so input splits parallelize across executors;
  * the reference's driver-memory partitioning (master/master.py:91-127) is a
  * documented defect we deliberately do not reproduce.
  */
object EdgeListReader {

  /** Read a SNAP edge list into DataFrame(src: string, dst: string). */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  /** Parse a DataFrame with a single `value: string` column of raw lines.
    * Exposed separately so tests can drive it from literal data. */
  def parse(lines: DataFrame): DataFrame = {
    lines
      .select(col("value"))
      .where(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), "\t").as("f"))
      .where(size(col("f")) === 2)
      .select(col("f").getItem(0).as("src"), col("f").getItem(1).as("dst"))
  }

  /** PERMISSIVE parse with a quarantine channel: good rows as in [[parse]],
    * plus the dropped MALFORMED lines (wrong field count — the rows the
    * reference logs and skips, worker/mapper/mapper.py:79-80) captured as
    * data instead of a log line. Comments and blanks are not quarantined:
    * they are format, not corruption. One scan feeds both frames. */
  def parseWithQuarantine(lines: DataFrame): (DataFrame, DataFrame) = {
    val candidate = lines
      .select(col("value"))
      .where(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
      .select(col("value"), split(trim(col("value")), "\t").as("f"))
    val good = candidate.where(size(col("f")) === 2)
      .select(col("f").getItem(0).as("src"), col("f").getItem(1).as("dst"))
    val bad = candidate.where(size(col("f")) =!= 2)
      .select(col("value").as("raw_line"), size(col("f")).as("n_fields"))
    (good, bad)
  }

  def readWithQuarantine(spark: SparkSession,
                         path: String): (DataFrame, DataFrame) =
    parseWithQuarantine(spark.read.text(path))
}
