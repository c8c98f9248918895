package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed parquet sink — the co-location tool for repeated large-scale
  * joins. Writing both sides of a hot join bucketed (and sorted) by the
  * join key means every future join between them is shuffle-FREE: each
  * task sort-merges bucket i of one table against bucket i of the other.
  * At 100 TB this converts the dominant cost of a fact-fact join (the
  * exchange of the larger table) into a one-time write-side layout
  * decision. Asserted in BucketedJoinSpec: the post-write join plans with
  * zero Exchange operators.
  */
object BucketedSink {

  /** Write `df` into the session catalog as `table`, hash-bucketed and
    * sorted by `key` into `buckets` files per partition. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Hive-partitioned parquet sink — the training-data handoff layout:
    * one `col=value/` directory tree per partition column (e.g.
    * `split=train/lang=en/`), so a downstream trainer reads exactly its
    * slice with PARTITION PRUNING (the scan's PartitionFilters, no data
    * read outside the slice — asserted in SinkSpec). Partition columns
    * should be low-cardinality (split, lang, date); high-cardinality
    * partitioning shatters the layout into tiny files. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
