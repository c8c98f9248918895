package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Persisted MinHash-LSH fingerprint index — the INCREMENTAL dedup
  * pattern. A 100-TB corpus is not deduped from scratch per ingest
  * batch: the corpus's fingerprints (LSH band keys for candidate
  * generation, xxhash64 shingle sets for exact verification) are
  * computed ONCE and persisted; each new batch then computes only its
  * OWN fingerprints and joins them against the stored index — O(batch)
  * work per increment, never O(corpus), and the corpus TEXT is never
  * re-read (the index carries everything verification needs).
  *
  * The hash construction is byte-identical to [[Dedup.dedupNear]]'s
  * in-memory pipeline (same shingling, same double-hashed minhash
  * family, same band keys), so a (corpus doc, new doc) pair lands in
  * the same buckets — and gets the same verdict — whether deduped
  * incrementally or in one batch. DedupSpec asserts exactly that
  * equivalence, plus a brute-force cross-Jaccard twin.
  *
  * Layout: two parquet tables under `path` —
  *   bands/    (doc_id, band, key)       — candidate generation
  *   shingles/ (doc_id, shingles)        — array<long> fingerprints
  * Both are written partitioned by their join-side key hash (parquet's
  * default row-group layout suffices: the band join shuffles on
  * (band, key), which no static layout can pre-provide for an unseen
  * batch; what matters is that the stored side is fingerprints, orders
  * of magnitude smaller than text).
  */
object FingerprintIndex {

  val DefaultShingleN = 3
  val DefaultRowsPerBand = 2
  val DefaultNumBands = 16

  /** Fingerprint `docs` (doc_id, text) and persist the index at `path`.
    * The shingle rows are localCheckpoint-materialized so the two index
    * tables (bands, shingle arrays) derive from ONE pass over the text —
    * two lazy write jobs would each rescan and reshingle the corpus. */
  def writeIndex(docs: DataFrame, path: String,
                 n: Int = DefaultShingleN,
                 rowsPerBand: Int = DefaultRowsPerBand,
                 numBands: Int = DefaultNumBands): Unit =
    writeTables(docs, path, "overwrite", n, rowsPerBand, numBands)

  private def writeTables(docs: DataFrame, path: String, mode: String,
                          n: Int, rowsPerBand: Int, numBands: Int): Unit = {
    val rows = Dedup.wordShingleRowsFrom(docs, n).localCheckpoint()
    Dedup.bandKeys(rows, rowsPerBand, numBands)
      .write.mode(mode).parquet(s"$path/bands")
    Dedup.shingleArrays(rows)
      .write.mode(mode).parquet(s"$path/shingles")
    // both index tables are on disk — the shingle scratch blocks are done
    graft.Blocks.release(rows)
  }

  /** Near-dup pairs between a NEW batch and the indexed corpus, at
    * Jaccard >= num/den (default 3/5, [[Dedup.dedupNear]]'s threshold).
    * Emits (corpus_id, new_id, inter_size, union_size) for every
    * verified cross pair. The new batch is fingerprinted with the same
    * construction; candidates come from the (band, key) equi-join
    * against the stored bands (shuffle keyed on high-cardinality band
    * keys, never a cartesian); verification joins the stored shingle
    * arrays — corpus text is never touched. */
  def dedupAgainstIndex(spark: SparkSession, newDocs: DataFrame, path: String,
                        n: Int = DefaultShingleN,
                        rowsPerBand: Int = DefaultRowsPerBand,
                        numBands: Int = DefaultNumBands,
                        num: Int = 3, den: Int = 5): DataFrame = {
    val newRows = Dedup.wordShingleRowsFrom(newDocs, n)
    val newBands = Dedup.bandKeys(newRows, rowsPerBand, numBands)
      .select(col("band"), col("key"), col("doc_id").as("new_id"))
    val idxBands = spark.read.parquet(s"$path/bands")
      .select(col("band"), col("key"), col("doc_id").as("corpus_id"))
    val cands = idxBands.join(newBands, Seq("band", "key"))
      .where(col("corpus_id") =!= col("new_id"))
      .select(col("corpus_id"), col("new_id")).distinct()
    val idxShingles = spark.read.parquet(s"$path/shingles")
      .select(col("doc_id").as("corpus_id"), col("shingles").as("sa"))
    val newShingles = Dedup.shingleArrays(newRows)
      .select(col("doc_id").as("new_id"), col("shingles").as("sb"))
    cands
      .join(idxShingles, Seq("corpus_id"))
      .join(newShingles, Seq("new_id"))
      .select(col("corpus_id"), col("new_id"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter_size"),
        size(array_union(col("sa"), col("sb"))).cast("long").as("union_size"))
      .where(col("inter_size") * den >= col("union_size") * num)
  }

  /** Containment pairs between a NEW batch and the indexed corpus — the
    * incremental face of [[Dedup.docContainment]], sharing the index
    * [[writeIndex]] already persists: the stored shingle ARRAYS carry
    * everything containment needs (candidates come from exploding them
    * into an on-the-fly posting list — a columnar scan of 8-byte
    * fingerprints, the same O(corpus-fingerprint) read contract as
    * [[dedupAgainstIndex]]'s full bands-table join; corpus TEXT is never
    * touched). The df cap is computed over corpus ∪ batch, so the
    * blocking decisions are IDENTICAL to running the one-batch operator
    * over the union — incremental and batch agree exactly on cross
    * pairs (DedupSpec asserts it). Emits BOTH directions of every cross
    * pair at containment >= num/den: a new doc contained in the corpus
    * is a skip signal; a corpus doc contained in a new doc flags the
    * new doc as an expansion of something already ingested. */
  def containmentAgainstIndex(spark: SparkSession, newDocs: DataFrame,
                              path: String, dfCap: Int = 64,
                              n: Int = DefaultShingleN,
                              num: Int = 1, den: Int = 2): DataFrame = {
    val newHashed = Dedup.wordShingleRowsFrom(newDocs, n)
      .select(col("doc_id").as("new_id"), xxhash64(col("sh")).as("h"))
      .distinct().repartition(col("h")).localCheckpoint()
    val idx = spark.read.parquet(s"$path/shingles")
    val posts = idx.select(col("doc_id").as("corpus_id"),
      explode(col("shingles")).as("h")).repartition(col("h"))
      .localCheckpoint()
    val rare = posts.select(col("h"))
      .unionAll(newHashed.select(col("h")))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") <= dfCap).select(col("h"))
    val cands = posts.join(rare.hint("shuffle_hash"), Seq("h"), "left_semi")
      .hint("shuffle_hash")
      .join(newHashed.join(rare.hint("shuffle_hash"), Seq("h"), "left_semi"),
        Seq("h"))
      .select(col("corpus_id"), col("new_id")).distinct()
    val corpusArr = idx.select(col("doc_id").as("corpus_id"),
      col("shingles").as("sa"))
    val newArr = newHashed.groupBy(col("new_id"))
      .agg(collect_set(col("h")).as("sb"))
    val joined = cands
      .join(corpusArr, Seq("corpus_id"))
      .join(newArr, Seq("new_id"))
      .select(col("corpus_id"), col("new_id"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
        size(col("sa")).cast("long").as("n_corpus"),
        size(col("sb")).cast("long").as("n_new"))
      .localCheckpoint()
    def dir(a: String, b: String, na: String) = joined
      .where(col("inter") * den >= col(na) * num)
      .select(col(a).as("doc_a"), col(b).as("doc_b"),
        col("inter").as("inter_size"), col(na).as("n_a"),
        expr(s"CAST((inter * 1000000) DIV $na AS BIGINT)")
          .as("containment_ppm"))
    dir("new_id", "corpus_id", "n_new")
      .unionAll(dir("corpus_id", "new_id", "n_corpus"))
  }

  /** Append a batch's fingerprints to the index (the post-ingest step:
    * once a batch is admitted, its fingerprints join the corpus index so
    * FUTURE batches dedup against it too). Parquet append — no read,
    * no rewrite of the existing index. */
  def appendToIndex(docs: DataFrame, path: String,
                    n: Int = DefaultShingleN,
                    rowsPerBand: Int = DefaultRowsPerBand,
                    numBands: Int = DefaultNumBands): Unit =
    writeTables(docs, path, "append", n, rowsPerBand, numBands)

  /** IDEMPOTENT append for at-least-once callers (streaming foreachBatch):
    * the batch's fingerprints land in `ingest_batch=<id>` partition
    * directories with OVERWRITE semantics, so a re-executed micro-batch
    * (crash after a partial write, before the sink checkpoint committed)
    * replaces its own previous attempt instead of duplicating rows —
    * including the half-written case where bands landed but shingles did
    * not. Parquet partition discovery folds the subdirectories back into
    * one table when the index root is read (the extra `ingest_batch`
    * column is inert — [[dedupAgainstIndex]] projects the columns it
    * needs). Do not mix this layout with the flat [[appendToIndex]] under
    * one root: partition discovery rejects conflicting structures. */
  def appendBatchToIndex(docs: DataFrame, path: String, batchId: Long,
                         n: Int = DefaultShingleN,
                         rowsPerBand: Int = DefaultRowsPerBand,
                         numBands: Int = DefaultNumBands): Unit = {
    val rows = Dedup.wordShingleRowsFrom(docs, n).localCheckpoint()
    Dedup.bandKeys(rows, rowsPerBand, numBands)
      .write.mode("overwrite").parquet(s"$path/bands/ingest_batch=$batchId")
    Dedup.shingleArrays(rows)
      .write.mode("overwrite").parquet(s"$path/shingles/ingest_batch=$batchId")
    graft.Blocks.release(rows)
  }
}
