package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) layout — multi-dimensional clustering for
  * scan pruning. Sorting a table by ONE column makes that column's
  * per-file min/max ranges tight (parquet row-group / file skipping
  * works) while every OTHER filter column's ranges span the whole
  * domain (skipping does nothing). Interleaving the bits of two key
  * columns into one sort key gives every file a compact rectangle in
  * BOTH dimensions, so predicates on EITHER column skip most files —
  * the layout decision that turns a 100-TB full scan into a targeted
  * read for two independent access paths at once.
  *
  * The z-value is pure integer bit math (shift/mask/add), identical in
  * any engine — the `layout_zorder` query is DuckDB-hash-oracled.
  * ZOrderSpec asserts the property that makes skipping work: after
  * [[writeZOrdered]], the mean per-file extent of BOTH dimensions is a
  * small fraction of the domain, where a single-column sort leaves the
  * second dimension's extent at ~100% of its domain.
  */
object ZOrderLayout {

  /** Interleave the low `bits` of two non-negative int columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * 2·bits ≤ 62 keeps everything in a long. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_ + _)

  /** The same arithmetic as ANSI SQL with `>>`/`<<` operators (DuckDB
    * dialect) — for oracle twins. */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((CAST($a AS BIGINT) >> $i) & 1) << ${2 * i}) + (((CAST($b AS BIGINT) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Write `df` to parquet clustered on the z-curve of (a, b): range
    * partition by z-value (each output file owns one compact z-range =
    * one compact rectangle in (a, b)), sort within partitions so row
    * groups inside a file are tight too.
    *
    * Both dimensions are min-max-normalized to the full `bits` width
    * before interleaving — raw interleaving of columns with unequal
    * domain widths spends the curve's most significant (= first-split)
    * bits entirely on the wider column, so the narrow one ends up with
    * 2× looser per-file extents (measured in ZOrderSpec's history: 54%
    * vs 25% on an 11-bit × 12-bit pair). Normalization costs one 1-row
    * stats aggregate — at 100 TB, noise next to the write. */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
                    numFiles: Int, bits: Int = 16): Unit = {
    val r = df.agg(min(col(a)).cast("long"), max(col(a)).cast("long"),
      min(col(b)).cast("long"), max(col(b)).cast("long")).first()
    val (aMin, aMax, bMin, bMax) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))
    val top = (1L << bits) - 1
    // divide FIRST, in double: the long spelling (c - lo) * top would
    // silently overflow once a domain width exceeds ~2^63/top (~1.4e14
    // at 16 bits) and z-cluster on garbage. The result only needs `bits`
    // of precision, far inside double's 53-bit mantissa, so the double
    // ratio is exact enough by construction; floor keeps the long cast
    // deterministic.
    def scaled(c: String, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else floor((col(c).cast("long") - lit(lo)).cast("double") /
        lit((hi - lo).toDouble) * lit(top.toDouble))
    df.withColumn("__z",
        zValue(scaled(a, aMin, aMax), scaled(b, bMin, bMax), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
