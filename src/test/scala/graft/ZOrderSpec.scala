package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.ZOrderLayout

/** The z-order layout property that makes scan pruning work: after
  * writeZOrdered, every output file covers a compact rectangle in BOTH
  * key dimensions, so min/max skipping serves predicates on either.
  * A single-column sort — the baseline layout — leaves the second
  * dimension's per-file extent at ~the full domain (no skipping). */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.01"

  test("zValue: known interleavings and monotone bit math") {
    val got = Seq((5L, 3L), (0L, 0L), (1L, 0L), (0L, 1L), (7L, 7L))
      .toDF("a", "b")
      .select(ZOrderLayout.zValue(col("a"), col("b"), bits = 3).as("z"))
      .as[Long].collect().toSeq
    // a=101,b=011 -> z bits (b2 a2 b1 a1 b0 a0) = 011011 = 27
    assert(got === Seq(27L, 0L, 1L, 2L, 63L))
  }

  test("z-ordered files are tight in BOTH dimensions; single-sort is not") {
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")).as("age"))
    val Seq(ckMin, ckMax, agMin, agMax) = orders
      .agg(min("o_custkey"), max("o_custkey"), min("age"), max("age"))
      .first().toSeq.map(_.toString.toLong)
    val ckDom = (ckMax - ckMin).toDouble
    val agDom = (agMax - agMin).toDouble

    def perFileExtents(path: String): (Double, Double) = {
      val rows = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max("o_custkey") - min("o_custkey")) / ckDom).as("dc"),
          ((max("age") - min("age")) / agDom).as("da"))
        .select("dc", "da").as[(Double, Double)].collect()
      (rows.map(_._1).sum / rows.length, rows.map(_._2).sum / rows.length)
    }

    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrderLayout.writeZOrdered(orders, zDir, "o_custkey", "age",
      numFiles = 16, bits = 16)
    val (zCk, zAg) = perFileExtents(zDir)
    info(f"z-order mean per-file extent: custkey ${zCk * 100}%.1f%%, age ${zAg * 100}%.1f%%")

    val sDir = java.nio.file.Files.createTempDirectory("singlesort").toString
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(sDir)
    val (sCk, sAg) = perFileExtents(sDir)
    info(f"single-sort mean per-file extent: custkey ${sCk * 100}%.1f%%, age ${sAg * 100}%.1f%%")

    // single-sort: first dim razor-thin, second dim spans ~everything
    assert(sCk < 0.15, f"single-sort custkey extent $sCk%.2f")
    assert(sAg > 0.7, f"single-sort age extent $sAg%.2f — data isn't adversarial enough")
    // z-order: BOTH dims bounded well below the loose dimension's span
    // (16 files = 4 split bits, alternating dims after normalization:
    // each dim quartered => ~25-40% measured mean extent; the bound is
    // deliberately slack — range-partition sample boundaries shift a few
    // points run-to-run — because the CONTRAST assertion below is the
    // property that matters)
    assert(zCk < 0.55, f"z-order custkey extent $zCk%.2f")
    assert(zAg < 0.55, f"z-order age extent $zAg%.2f")
    // the worst z dimension must beat the single-sort's worst by margin
    assert(math.max(zCk, zAg) < sAg * 0.7,
      f"z-order worst ${math.max(zCk, zAg)}%.2f not clearly better than single-sort worst $sAg%.2f")
  }

  test("skipping index over a z-ordered layout: prunes files on BOTH dims, exact results") {
    import graft.sources.SkippingIndex
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")).as("age"))
    val zDir = java.nio.file.Files.createTempDirectory("zskip").toString
    ZOrderLayout.writeZOrdered(orders, zDir, "o_custkey", "age",
      numFiles = 16, bits = 16)
    val statsDir = java.nio.file.Files.createTempDirectory("zskip-stats").toString
    SkippingIndex.writeStats(spark, zDir, statsDir, Seq("o_custkey", "age"))

    // manifest shape: one row per data file, mins <= maxs
    val stats = spark.read.parquet(statsDir)
    val nFiles = new java.io.File(zDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(stats.count() === nFiles.toLong)
    assert(stats.where(col("o_custkey_min") > col("o_custkey_max") ||
      col("age_min") > col("age_max")).count() === 0)

    // a narrow predicate on EITHER dimension reads a strict file subset
    // yet returns exactly the full-scan answer
    for ((c, lo, hi) <- Seq(("o_custkey", 100L, 200L), ("age", 1500L, 1700L))) {
      val (df, read, total) = SkippingIndex.prunedRead(
        spark, zDir, statsDir, c, lo, hi)
      val got = df.select(col("o_orderkey")).as[Long].collect().sorted.toSeq
      val expect = spark.read.parquet(zDir)
        .where(col(c).between(lo, hi))
        .select(col("o_orderkey")).as[Long].collect().sorted.toSeq
      assert(got === expect, s"pruned read on $c diverged")
      assert(got.nonEmpty, s"predicate on $c selected nothing — test is hollow")
      assert(read < total, s"$c: no pruning ($read of $total files)")
      info(s"$c in [$lo,$hi]: read $read of $total files")
    }

    // a range outside the domain prunes everything and yields zero rows
    val (empty, read0, _) = SkippingIndex.prunedRead(
      spark, zDir, statsDir, "o_custkey", -500L, -100L)
    assert(read0 === 0 && empty.count() === 0L)
  }
}
