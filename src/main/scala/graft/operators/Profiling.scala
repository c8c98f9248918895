package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table profiling — the first thing a data pipeline runs against an
  * unknown input: per-column null counts and exact distinct cardinalities
  * in ONE pass over the data (a single aggregate with 2 columns per field
  * plus a row count; Catalyst plans the distinct aggregates via expand +
  * two-phase aggregation, so the table is still read once). The wide
  * one-row result is melted to long (column, n_nulls, n_distinct, n_rows)
  * through a generator. Column list comes from the schema at plan time —
  * the operator works on any table unchanged; at very large scale swap
  * the exact distincts for approx_count_distinct (sketch twin pattern,
  * see SketchSpec).
  */
object Profiling {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct"))) :+
      count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"${c}__nulls").as("n_nulls"),
      col(s"${c}__distinct").as("n_distinct")))
    wide.select(explode(array(entries: _*)).as("e"), col("__rows").as("n_rows"))
      .select(col("e.col_name").as("col_name"), col("e.n_nulls").as("n_nulls"),
        col("e.n_distinct").as("n_distinct"), col("n_rows"))
  }

  def profileOrders(s: SparkSession, d: String): DataFrame =
    profile(Tables.load(s, d, "orders"))

  // one UNION ALL branch per column — static mirror of the dynamic
  // schema-driven Spark side, for the orders table
  val profileOrdersSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct, count(*) AS n_rows FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Same operator, unchanged, on the string-heavy documents table —
    * the schema-driven claim demonstrated on a second shape. */
  def profileDocuments(s: SparkSession, d: String): DataFrame =
    profile(Tables.load(s, d, "documents"))

  val profileDocumentsSql: String = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct, count(*) AS n_rows FROM documents""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** The z-curve key [[graft.sources.ZOrderLayout]] clusters by, as an
    * oracled query: z = interleave(o_custkey bits, order-age-days bits).
    * Pure integer shift/mask/add — bit-identical in any engine — so the
    * layout tool's arithmetic is under the same hash gate as the
    * relational operators (the write-side clustering property itself is
    * asserted in ZOrderSpec). Per-row projection, no shuffle. */
  def layoutZorder(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "orders")
      .select(col("o_orderkey"),
        graft.sources.ZOrderLayout.zValue(
          col("o_custkey"),
          datediff(col("o_orderdate"), lit("1992-01-01")), bits = 16).as("z"))

  val layoutZorderSql: String = {
    val z = graft.sources.ZOrderLayout.zValueSql(
      "o_custkey", "datediff('day', DATE '1992-01-01', o_orderdate)", bits = 16)
    s"""SELECT o_orderkey, $z AS z
       |FROM orders ORDER BY o_orderkey""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_orders" -> (profileOrders _),
    "profile_documents" -> (profileDocuments _),
    "layout_zorder" -> (layoutZorder _)
  )

  val oracles: Map[String, String] = Map(
    "profile_orders" -> profileOrdersSql,
    "profile_documents" -> profileDocumentsSql,
    "layout_zorder" -> layoutZorderSql
  )

  val verifyOrder: Map[String, Seq[Column]] = Map(
    "profile_orders" -> Seq(col("col_name")),
    "profile_documents" -> Seq(col("col_name")),
    "layout_zorder" -> Seq(col("o_orderkey"))
  )
}
