package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    * oracled query: z = interleave(normalized o_custkey bits, normalized
    * order-age-days bits). Both inputs are min-max-normalized to the full
    * 16-bit width first, exactly as `writeZOrdered` does — raw custkeys
    * exceed 2^16 from sf1 up, and truncated high bits would alias the
    * curve (identically in both engines, so the oracle would stay green
    * while the key stopped meaning anything). The stats ride a broadcast
    * 1-row frame; normalization is floor((c-lo)/(hi-lo)*65535) in DOUBLE
    * with the same operation order in both engines (IEEE ops on exact
    * long inputs, then floor — deterministic cross-engine), and the
    * interleave itself stays pure integer shift/mask/add. The write-side
    * clustering property is asserted in ZOrderSpec. */
  def layoutZorder(s: SparkSession, d: String): DataFrame = {
    val o = Tables.load(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey").cast("long").as("ck"),
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("age"))
    val stats = o.agg(min(col("ck")).as("ck_lo"), max(col("ck")).as("ck_hi"),
      min(col("age")).as("age_lo"), max(col("age")).as("age_hi"))
    def norm(c: String, lo: String, hi: String): Column =
      when(col(hi) === col(lo), lit(0L)).otherwise(
        floor((col(c) - col(lo)).cast("double") /
          (col(hi) - col(lo)).cast("double") * lit(65535.0)))
    o.crossJoin(broadcast(stats))
      .select(col("o_orderkey"),
        graft.sources.ZOrderLayout.zValue(
          norm("ck", "ck_lo", "ck_hi"),
          norm("age", "age_lo", "age_hi"), bits = 16).as("z"))
  }

  val layoutZorderSql: String = {
    val z = graft.sources.ZOrderLayout.zValueSql("na", "nb", bits = 16)
    """WITH o AS (
      |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS ck,
      |         CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS age
      |  FROM orders),
      |st AS (SELECT min(ck) AS ck_lo, max(ck) AS ck_hi,
      |              min(age) AS age_lo, max(age) AS age_hi FROM o),
      |n AS (
      |  SELECT o_orderkey,
      |    CASE WHEN ck_hi = ck_lo THEN 0
      |         ELSE CAST(floor(CAST(ck - ck_lo AS DOUBLE) / CAST(ck_hi - ck_lo AS DOUBLE) * 65535.0) AS BIGINT) END AS na,
      |    CASE WHEN age_hi = age_lo THEN 0
      |         ELSE CAST(floor(CAST(age - age_lo AS DOUBLE) / CAST(age_hi - age_lo AS DOUBLE) * 65535.0) AS BIGINT) END AS nb
      |  FROM o, st)""".stripMargin +
      s"""
         |SELECT o_orderkey, $z AS z
         |FROM n ORDER BY o_orderkey""".stripMargin
  }

  /** Pearson correlation matrix over lineitem's numeric columns, from
    * EXACT ingredient sums in ONE scan-aggregate pass. Neither engine's
    * built-in corr() is used: their streaming update formulas differ in
    * accumulation order, which drifts hashes — instead both sides compute
    * the same closed form (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² −
    * (Σy)²)) from the same raw sums, rounded once at 6 dp. The 1-row sums
    * frame is a whitelisted global scalar aggregate; `stack` unpivots it
    * to one row per column pair — output is pairs², bounded by the SCHEMA,
    * never the data. */
  def profileCorr(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val sums =
      cols.map(c => sum(col(c)).as(s"s_$c")) ++
      cols.map(c => sum(col(c) * col(c)).as(s"ss_$c")) ++
      cols.combinations(2).map { case Seq(a, b) =>
        sum(col(a) * col(b)).as(s"sp_${a}_$b")
      }.toSeq :+ count(lit(1)).cast("double").as("n")
    val agg = Tables.load(s, d, "lineitem").agg(sums.head, sums.tail: _*)
    val pairs = cols.combinations(2).toSeq
    def corrExpr(a: String, b: String): String =
      s"""round((n * sp_${a}_$b - s_$a * s_$b)
         |      / sqrt((n * ss_$a - s_$a * s_$a) * (n * ss_$b - s_$b * s_$b)), 6)""".stripMargin
    val stackArgs = pairs.map { case Seq(a, b) =>
      s"'$a', '$b', ${corrExpr(a, b)}"
    }.mkString(", ")
    agg.select(expr(
      s"stack(${pairs.length}, $stackArgs) as (col_a, col_b, corr)"))
  }

  val profileCorrSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = cols.combinations(2).toSeq
    val rows = pairs.map { case Seq(a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |  round((n * sp_${a}_$b - s_$a * s_$b)
         |        / sqrt((n * ss_$a - s_$a * s_$a) * (n * ss_$b - s_$b * s_$b)), 6) AS corr
         |FROM sums""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH sums AS (
       |  SELECT ${cols.map(c => s"sum($c) AS s_$c").mkString(", ")},
       |         ${cols.map(c => s"sum($c * $c) AS ss_$c").mkString(", ")},
       |         ${pairs.map { case Seq(a, b) => s"sum($a * $b) AS sp_${a}_$b" }.mkString(", ")},
       |         CAST(count(*) AS DOUBLE) AS n
       |  FROM lineitem)
       |$rows
       |ORDER BY col_a, col_b""".stripMargin
  }

  /** Shannon entropy (nats) of one categorical column: counts → p = n/N →
    * −Σ p·ln p. The float discipline is the logprob convention
    * ([[TextAnalysis.qualityUnigramLogprob]]): each p·ln p term is rounded
    * once at 9 dp and fixed as DECIMAL(18,9), the per-column sum runs in
    * exact decimal arithmetic (order-free), and only the final negated
    * total returns to double (round 6). Scale shape: the value counts are
    * the only corpus-sized aggregate (map-side combined on a
    * low-cardinality categorical key); the total re-aggregates from the
    * counts and rides a broadcast 1-row frame; the final global aggregate
    * sees one row per DISTINCT VALUE — bounded by the column's
    * cardinality, not the data. */
  private def entropyOf(df: DataFrame, name: String, c: String): DataFrame = {
    val counts = df.groupBy(col(c).cast("string").as("v"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).cast("double").as("n_total"))
    val p = col("n").cast("double") / col("n_total")
    counts.crossJoin(broadcast(total))
      .select(col("n"), col("n_total"),
        round(p * log(p), 9).cast("decimal(18,9)").as("term"))
      .agg(max(col("n_total")).cast("long").as("n_rows"),
        count(lit(1)).as("n_distinct"),
        round(-sum(col("term")).cast("double"), 6).as("entropy"))
      .select(lit(name).as("col_name"), col("n_rows"),
        col("n_distinct"), col("entropy"))
  }

  /** Entropy profile of every low-cardinality categorical column in the
    * testdata — the selection-signal screen a pipeline runs before
    * stratifying or rebalancing on a column (entropy ≈ 0 means the column
    * can't stratify anything; entropy near ln(k) means uniform). One
    * branch per (table, column); each branch's scan prunes to its single
    * column. */
  def profileEntropy(s: SparkSession, d: String): DataFrame =
    EntropyCols.map { case (t, c) =>
      entropyOf(Tables.load(s, d, t), s"$t.$c", c)
    }.reduce(_ union _)

  private val EntropyCols = Seq(
    "events" -> "event_type", "documents" -> "lang",
    "documents" -> "source", "orders" -> "o_orderpriority",
    "orders" -> "o_orderstatus", "customer" -> "c_mktsegment",
    "lineitem" -> "l_returnflag", "lineitem" -> "l_linestatus")

  val profileEntropySql: String =
    EntropyCols.map { case (t, c) =>
      s"""SELECT '$t.$c' AS col_name,
         |  CAST(max(n_total) AS BIGINT) AS n_rows,
         |  count(*) AS n_distinct,
         |  round(-(CAST(sum(CAST(round((CAST(n AS DOUBLE) / n_total)
         |                * ln(CAST(n AS DOUBLE) / n_total), 9)
         |          AS DECIMAL(18,9))) AS DOUBLE)), 6) AS entropy
         |FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS n
         |      FROM $t GROUP BY 1) cc,
         |     (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM $t) tt""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** Referential-integrity audit across the star schema — the
    * data-quality gate every warehouse ingest runs: for each declared
    * FK edge, the child row count, orphan rows/keys (child keys with no
    * parent), and the orphan share. Scale shape per edge: the child
    * collapses to per-key counts FIRST (partial-aggregable, one keyed
    * exchange of distinct keys, never fact rows), the anti-join then
    * runs key-frame vs key-frame, and the two 1-row aggregates fold
    * with a bounded cross join (the profile_drift totals pattern). At
    * 100 TB the anti-join input is the key cardinality, not the fact. */
  def profileIntegrity(s: SparkSession, d: String): DataFrame =
    FkEdges.map { case (ct, ck, pt, pk) =>
      val perKey = Tables.load(s, d, ct)
        .groupBy(col(ck).as("k")).agg(count(lit(1)).as("n"))
      val totals =
        perKey.agg(coalesce(sum(col("n")), lit(0L)).as("child_rows"))
      val orph = perKey
        .join(Tables.load(s, d, pt).select(col(pk).as("k")),
          Seq("k"), "left_anti")
        .agg(coalesce(sum(col("n")), lit(0L)).as("orphan_rows"),
          count(lit(1)).as("orphan_keys"))
      orph.crossJoin(totals).select(
        lit(s"$ct.$ck->$pt.$pk").as("fk"), col("child_rows"),
        col("orphan_rows"), col("orphan_keys"),
        when(col("child_rows") === 0, lit(null).cast("double"))
          .otherwise(
            round(col("orphan_rows").cast("double") / col("child_rows"), 9))
          .as("orphan_share"))
    }.reduce(_ unionByName _)

  private val FkEdges = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  val profileIntegritySql: String =
    FkEdges.map { case (ct, ck, pt, pk) =>
      s"""SELECT '$ct.$ck->$pt.$pk' AS fk,
         |  CAST((SELECT count(*) FROM $ct) AS BIGINT) AS child_rows,
         |  CAST(coalesce(sum(n), 0) AS BIGINT) AS orphan_rows,
         |  count(*) AS orphan_keys,
         |  CASE WHEN (SELECT count(*) FROM $ct) = 0 THEN NULL
         |       ELSE round(CAST(coalesce(sum(n), 0) AS DOUBLE)
         |                  / (SELECT count(*) FROM $ct), 9) END
         |    AS orphan_share
         |FROM (SELECT $ck AS k, count(*) AS n FROM $ct GROUP BY 1) c
         |WHERE NOT EXISTS (SELECT 1 FROM $pt p WHERE p.$pk = c.k)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY fk")

  /** `profile_benford` (oracled): first-significant-digit distribution of
    * `o_totalprice` against Benford's law — the classic fabricated-data /
    * unit-mixing audit a profiling pass runs on any monetary column
    * (naturally-grown multiplicative quantities follow P(d) = log10(1 +
    * 1/d); synthetic or truncated ones don't, and TPC-H's uniform price
    * model is exactly such a deviation this audit should SHOW).
    *
    * Determinism: the digit is the first character of the DECIMAL's
    * integer part via exact integer/string ops (floor → BIGINT → string),
    * never a float log10 whose epsilon could flip a power-of-ten
    * boundary; totalprice ≥ 1 in this schema so the first char is the
    * first significant digit. The expected share is ln((d+1)/d)/ln(10)
    * composed identically in both engines (the ln-parity house rule),
    * round(6) at the end.
    *
    * Scale shape: one partial-aggregable count whose key domain is ≤9 BY
    * CONSTRUCTION; the share window runs over that ≤9-row aggregate (the
    * [[graft.operators.TextAnalysis.docLengthHistogram]] shape), not the
    * fact table. */
  def profileBenfordFrom(orders: DataFrame): DataFrame = {
    val g = orders
      .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
    g.select(col("digit"), col("n_orders"),
      round(col("n_orders").cast("double") /
        sum(col("n_orders")).over(Window.partitionBy()), 6).as("share"),
      round(log((col("digit").cast("double") + lit(1.0))
        / col("digit").cast("double")) / log(lit(10.0)), 6)
        .as("benford_share"))
  }

  def profileBenford(s: SparkSession, d: String): DataFrame =
    profileBenfordFrom(Tables.load(s, d, "orders"))

  val profileBenfordSql: String =
    """WITH g AS (
      |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
      |                             AS VARCHAR), 1, 1) AS INT) AS digit,
      |         count(*) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT digit, n_orders,
      |       round(CAST(n_orders AS DOUBLE) / sum(n_orders) OVER (), 6)
      |         AS share,
      |       round(ln((CAST(digit AS DOUBLE) + 1.0) / CAST(digit AS DOUBLE))
      |             / ln(10.0), 6) AS benford_share
      |FROM g ORDER BY digit""".stripMargin

  /** `profile_ks` (oracled): the two-sample Kolmogorov–Smirnov distance
    * between each event type's value distribution and the rest of the
    * corpus — the NUMERIC drift test next to [[graft.operators.Pipeline
    * .profileDrift]]'s categorical chi-square (train/eval value drift is
    * the statistic every data pipeline gates ingest on). The float trap
    * dissolves by cross-multiplication: at every value-grid point v,
    * |F_t(v) − F_rest(v)| compares as the EXACT integer
    * |cum_t(v)·n_rest − cum_rest(v)·n_t| (DECIMAL(38,0)/HUGEINT — the
    * products pass 2^63 near 10¹⁰ rows), so the sup is exact; the
    * emitted anchor is `d_ppm` = ⌊10⁶·D⌋ (exact floor division, BIGINT
    * at any corpus size) and the single double division + round(6)
    * happens once per type at the end. Values are compared on the exact cent
    * grid ⌊100·v⌋ (one IEEE multiply + floor, identical on both
    * engines) — the KS sup over a step function is attained at a step,
    * and every step of either CDF is a grid point.
    *
    * Scale shape: one (type, bin) count exchange, a dense
    * |types|×|bins| grid (value-grid-bounded — the events_heatmap
    * argument: cents of bounded amounts, NOT corpus-sized), per-type
    * cumulative windows (|types|-way parallel), cum_rest derived by
    * SUMMING the per-type cumulatives per bin — never a global
    * partition-less window — and bounded broadcast folds (the 1-row
    * total is the q6 scalar shape). */
  def profileKs(s: SparkSession, d: String): DataFrame =
    profileKsFrom(Tables.load(s, d, "events"))

  def profileKsFrom(ev: DataFrame): DataFrame = {
    val cells = ev
      .select(col("event_type"),
        floor(col("value") * lit(100.0)).cast("long").as("b"))
      .groupBy(col("event_type"), col("b")).agg(count(lit(1)).as("cnt"))
    val types = cells.select(col("event_type")).distinct()
    val bins = cells.select(col("b")).distinct()
    val grid = types.crossJoin(broadcast(bins))
      .join(cells, Seq("event_type", "b"), "left_outer")
      .select(col("event_type"), col("b"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val cum = grid.withColumn("cum_t",
      sum(col("cnt")).over(
        Window.partitionBy(col("event_type")).orderBy(col("b"))))
    val byB = cum.groupBy(col("b")).agg(sum(col("cum_t")).as("cum_all"))
    val tot = cells.groupBy(col("event_type")).agg(sum(col("cnt")).as("n_t"))
    val nAll = cells.agg(sum(col("cnt")).as("n_all"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    cum.join(broadcast(byB), Seq("b"))
      .join(broadcast(tot), Seq("event_type"))
      .crossJoin(broadcast(nAll))
      .select(col("event_type"), col("n_t"),
        (col("n_all") - col("n_t")).as("n_rest"),
        abs(dec(col("cum_t")) * dec(col("n_all") - col("n_t"))
          - dec(col("cum_all") - col("cum_t")) * dec(col("n_t"))).as("term"))
      .groupBy(col("event_type"), col("n_t"), col("n_rest"))
      .agg(max(col("term")).cast("decimal(38,0)").as("dsc"))
      .select(col("event_type"), col("n_t"), col("n_rest"),
        // the exact-integer anchor: ⌊10⁶·D⌋ fits BIGINT at ANY corpus
        // size (D ≤ 1), where the raw scaled sup would pass 2^63 near
        // 10¹⁰ rows; positive operands, so DIV is floor on both engines
        when(col("n_rest") > 0,
          expr("CAST((dsc * 1000000) DIV (CAST(n_t AS DECIMAL(38,0)) " +
            "* n_rest) AS BIGINT)")).as("d_ppm"),
        when(col("n_rest") > 0,
          round(col("dsc").cast("double") /
            (col("n_t").cast("double") * col("n_rest").cast("double")), 6))
          .as("d"))
  }

  val profileKsSql: String =
    """WITH cells AS (
      |  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS b,
      |         count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT t.event_type, g.b, COALESCE(c.cnt, 0) AS cnt
      |  FROM (SELECT DISTINCT event_type FROM cells) t
      |  CROSS JOIN (SELECT DISTINCT b FROM cells) g
      |  LEFT JOIN cells c ON c.event_type = t.event_type AND c.b = g.b),
      |cum AS (
      |  SELECT event_type, b,
      |         sum(cnt) OVER (PARTITION BY event_type ORDER BY b) AS cum_t
      |  FROM grid),
      |byb AS (SELECT b, sum(cum_t) AS cum_all FROM cum GROUP BY 1),
      |tot AS (SELECT event_type, sum(cnt) AS n_t FROM cells GROUP BY 1),
      |n AS (SELECT sum(cnt) AS n_all FROM cells),
      |term AS (
      |  SELECT c.event_type, t.n_t, n.n_all - t.n_t AS n_rest,
      |         abs(CAST(c.cum_t AS HUGEINT) * (n.n_all - t.n_t)
      |             - CAST(b2.cum_all - c.cum_t AS HUGEINT) * t.n_t) AS term
      |  FROM cum c JOIN byb b2 USING (b) JOIN tot t USING (event_type)
      |  CROSS JOIN n)
      |SELECT event_type, CAST(n_t AS BIGINT) AS n_t,
      |       CAST(n_rest AS BIGINT) AS n_rest,
      |       CASE WHEN n_rest > 0 THEN
      |         CAST((max(term) * 1000000)
      |              // (CAST(n_t AS HUGEINT) * n_rest) AS BIGINT)
      |       END AS d_ppm,
      |       CASE WHEN n_rest > 0 THEN
      |         round(CAST(max(term) AS DOUBLE)
      |               / (CAST(n_t AS DOUBLE) * CAST(n_rest AS DOUBLE)), 6)
      |       END AS d
      |FROM term GROUP BY event_type, n_t, n_rest
      |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_ks" -> ((s, d) => profileKs(s, d)),
    "profile_benford" -> (profileBenford _),
    "profile_integrity" -> (profileIntegrity _),
    "profile_orders" -> (profileOrders _),
    "profile_documents" -> (profileDocuments _),
    "profile_corr" -> (profileCorr _),
    "profile_entropy" -> (profileEntropy _),
    "layout_zorder" -> (layoutZorder _)
  )

  val oracles: Map[String, String] = Map(
    "profile_ks" -> profileKsSql,
    "profile_benford" -> profileBenfordSql,
    "profile_integrity" -> profileIntegritySql,
    "profile_orders" -> profileOrdersSql,
    "profile_documents" -> profileDocumentsSql,
    "profile_corr" -> profileCorrSql,
    "profile_entropy" -> profileEntropySql,
    "layout_zorder" -> layoutZorderSql
  )

  val verifyOrder: Map[String, Seq[Column]] = Map(
    "profile_ks" -> Seq(col("event_type")),
    "profile_benford" -> Seq(col("digit")),
    "profile_integrity" -> Seq(col("fk")),
    "profile_orders" -> Seq(col("col_name")),
    "profile_documents" -> Seq(col("col_name")),
    "profile_corr" -> Seq(col("col_a"), col("col_b")),
    "profile_entropy" -> Seq(col("col_name")),
    "layout_zorder" -> Seq(col("o_orderkey"))
  )
}
