package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.sources.DocCorpusReader

class DocCorpusReaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def corpusRows =
    Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toString).sorted.toSeq

  test("JSONL round-trip preserves the corpus exactly") {
    val dir = "/tmp/graft_jsonl_rt"
    DocCorpusReader.writeJsonl(Tables.load(spark, sf, "documents"), dir)
    val (good, bad) = DocCorpusReader.readJsonl(spark, dir)
    assert(bad.count() === 0)
    assert(good.collect().map(_.toString).sorted.toSeq === corpusRows)
  }

  test("CSV round-trip preserves the corpus exactly (quoted text)") {
    val dir = "/tmp/graft_csv_rt"
    DocCorpusReader.writeCsv(Tables.load(spark, sf, "documents"), dir)
    val (good, bad) = DocCorpusReader.readCsv(spark, dir)
    assert(bad.count() === 0)
    assert(good.collect().map(_.toString).sorted.toSeq === corpusRows)
  }

  test("corrupt and keyless JSONL records land in quarantine, not the corpus") {
    val dir = "/tmp/graft_jsonl_bad"
    val lines = Seq(
      """{"doc_id": 1, "text": "ok one", "lang": "en", "source": "s", "n_chars": 6}""",
      """{"doc_id": 2, "text": "ok two", "lang": "en", "source": "s", "n_chars": 6}""",
      """{"text": "no key", "lang": "en", "source": "s", "n_chars": 6}""",
      """not json at all""",
      """{"doc_id": "also-not-a-long", "text": "bad key type"}""")
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val (good, bad) = DocCorpusReader.readJsonl(spark, dir)
    assert(good.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(bad.count() === 3)
  }

  test("good rows parse completely (no silent nulling of typed fields)") {
    val dir = "/tmp/graft_jsonl_bad"
    val (good, _) = DocCorpusReader.readJsonl(spark, dir)
    good.collect().foreach { r: Row =>
      assert(!r.anyNull, s"silent null in $r")
    }
  }
}
