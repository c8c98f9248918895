package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-contract robustness of the Verify main: a failing
  * query (here: every query, driven against a nonexistent data dir) must
  * never crash the run — per-query errors are reported and
  * `oracle_sql.json` is still written, so the driver's gate always has
  * the oracle set even when the engine side faults. */
class VerifySpec extends AnyFunSuite {
  // force the shared session first so Verify's getOrCreate reuses it
  lazy val spark = SparkTestBase.spark

  test("Verify survives a nonexistent sfDir and still writes oracle_sql.json") {
    spark // init
    val out = Files.createTempDirectory("graft-verify-bad").toString
    Verify.main(Array("/nonexistent/sfdir", out))
    val oraclePath = Paths.get(s"$out/oracle_sql.json")
    assert(Files.exists(oraclePath), "oracle_sql.json missing")
    val json = Files.readString(oraclePath)
    // valid JSON object with every oracle key present
    assert(json.startsWith("{") && json.endsWith("}"))
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(json.contains("\"" + k + "\""), s"oracle for $k missing")
    }
    // no query parquet can exist — every query failed on the bad dir
    assert(!Files.list(Paths.get(out)).iterator().asScala
      .exists(p => Files.isDirectory(p)),
      "a query somehow wrote output from a nonexistent dir")
  }

  private implicit class IterConv[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
