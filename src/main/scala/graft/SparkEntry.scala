package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2 (reference
  * parity) or §7.4 (extension surface). Every SQL-expressible entry has a
  * DuckDB twin in `oracleSql` with IDENTICAL column names and types; the
  * driver hash-compares the two result sets at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Citations.top30(Citations.counts(
      Citations.edges(spark, "/root/testdata/sf0.001")))

  type Q = (SparkSession, String) => DataFrame

  // ---- reference parity: citation analysis (SURVEY.md §2) ----------------
  private val citationQueries: Map[String, Q] = Map(
    "citation_counts" -> ((s, d) =>
      Citations.counts(Citations.edges(s, d))
        .orderBy("paper_id")),
    "citation_counts_collect" -> ((s, d) =>
      Citations.countsViaCollect(Citations.edges(s, d))
        .orderBy("paper_id")),
    "citation_top30" -> ((s, d) =>
      Citations.top30(Citations.counts(Citations.edges(s, d))))
  )

  private val citationOracles: Map[String, String] = Map(
    "citation_counts" ->
      """SELECT CAST(l_partkey AS VARCHAR) AS paper_id, COUNT(*) AS citations
        |FROM lineitem GROUP BY 1 ORDER BY paper_id""".stripMargin,
    "citation_counts_collect" ->
      """SELECT CAST(l_partkey AS VARCHAR) AS paper_id, COUNT(*) AS citations
        |FROM lineitem GROUP BY 1 ORDER BY paper_id""".stripMargin,
    "citation_top30" ->
      """WITH c AS (
        |  SELECT CAST(l_partkey AS VARCHAR) AS paper_id, COUNT(*) AS citations
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(row_number() OVER (ORDER BY citations DESC, paper_id ASC) AS INT) AS rank,
        |       paper_id, citations
        |FROM c ORDER BY citations DESC, paper_id ASC LIMIT 30""".stripMargin
  )

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    citationQueries ++ Relational.queries ++ EventAnalytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    citationOracles ++ Relational.oracles ++ EventAnalytics.oracles

  /** Headline subset used by Bench (wall-clock representative, not the
    * full correctness matrix). */
  def benchQueries: Seq[String] = Seq(
    "citation_counts", "citation_top30",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "join_outer_order_counts", "window_running_revenue", "topk_orders")
}
