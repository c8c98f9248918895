package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming maintenance of graph aggregate VIEWS — the incremental face
  * of [[graft.operators.Citations.countsIvm]]. The batch operator proves
  * the merge identity agg(base) ⊎ agg(delta) = agg(all) (count is a
  * commutative monoid); HERE the same property is what lets Structured
  * Streaming fold every arriving edge micro-batch into the count view's
  * per-key state — the view is never recomputed, only merged into, which
  * is the entire point of IVM at 100 TB/day edge ingest.
  *
  * State size IS the view size BY CONSTRUCTION (one count per cited
  * paper — exactly what the materialized view stores anyway), and there
  * is deliberately no watermark: a view key never expires
  * ([[DocStreams.upsertStream]]'s contract). Out-of-order arrival is a
  * non-event — addition is order-free — so the streamed view equals the
  * batch aggregate over ANY arrival order, asserted in GraphStreamsSpec.
  */
object GraphStreams {

  val edgeSchema: StructType = StructType(Seq(
    StructField("src", StringType), StructField("dst", StringType)))

  /** Streaming source over a directory of (src, dst) edge parquet files. */
  def readEdges(spark: SparkSession, dir: String,
                maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    var r = spark.readStream.schema(edgeSchema)
    maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** The citation-count view maintained at ingest: the SAME aggregate as
    * the batch `citation_counts` / the merge inside `citation_counts_ivm`,
    * run as a streaming aggregation (complete or update mode). */
  def countViewStream(edges: DataFrame): DataFrame =
    edges.groupBy(col("dst").as("paper_id"))
      .agg(count(lit(1)).as("citations"))

  /** The reciprocity pair view maintained at ingest — the incremental
    * face of [[graft.operators.Citations.reciprocity]]: one row per
    * distinct UNDIRECTED pair carrying which directions have been seen
    * (`fwd` = low→high observed, `rev` = high→low observed). max() is the
    * order-free monoid here, so duplicate edges collapse exactly as the
    * batch `distinct()` does and ANY arrival order reproduces the batch
    * view (GraphStreamsSpec). State size IS the view size — one row per
    * undirected pair, the same never-expires contract as
    * [[countViewStream]]; the (m, reciprocated) fold the batch operator
    * publishes is [[graft.operators.Citations.reciprocityFromPairView]]
    * over this view. */
  def pairViewStream(edges: DataFrame): DataFrame =
    edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"),
        (col("src") < col("dst")).cast("int").as("f"),
        (col("src") > col("dst")).cast("int").as("r"))
      .groupBy(col("a"), col("b"))
      .agg(max(col("f")).as("fwd"), max(col("r")).as("rev"))
}
