package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.DocStreams

class DocStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("streaming exact dedup: duplicates arriving in later batches never emit") {
    val docs = Tables.load(spark, sf, "documents")
    val dir = Files.createTempDirectory("graft-docstream").toString

    // batch 1: docs 0..99. batch 2: 50 RE-TEXTS of docs 0..49 under new
    // ids (exact dups) + genuinely new docs 100..149.
    docs.where($"doc_id" < 100).coalesce(1)
      .write.parquet(s"$dir/b1")
    val dups = docs.where($"doc_id" < 50)
      .withColumn("doc_id", $"doc_id" + 10000)
    val fresh = docs.where($"doc_id" >= 100 && $"doc_id" < 150)
    dups.unionByName(fresh).coalesce(1).write.parquet(s"$dir/b2")

    // flatten into one stream dir with ordered modification times
    val streamDir = Files.createTempDirectory("graft-docstream-in").toString
    def copyPart(sub: String, name: String): Unit = {
      val part = new java.io.File(s"$dir/$sub").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$streamDir/$name"))
    }
    copyPart("b1", "000.parquet")
    copyPart("b2", "001.parquet")
    // file-source ordering is by modification time — pin it explicitly so
    // the duplicate batch demonstrably arrives SECOND
    val now = System.currentTimeMillis()
    new java.io.File(s"$streamDir/000.parquet").setLastModified(now - 60000)
    new java.io.File(s"$streamDir/001.parquet").setLastModified(now)

    val q = DocStreams.dedupExactStream(
        DocStreams.readDocs(spark, streamDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("doc_dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val emitted = spark.table("doc_dedup")
    // 100 from batch 1 + only the 50 genuinely-new from batch 2
    assert(emitted.count() === 150)
    assert(emitted.where($"doc_id" >= 10000).count() === 0,
      "a re-text duplicate slipped through")
    // distinct texts emitted exactly once each
    assert(emitted.select("text_md5").distinct().count() === 150)
    // batch twin agrees on the distinct-content count of the same input
    val batchDistinct = docs.where($"doc_id" < 150).select(md5($"text"))
      .distinct().count()
    assert(batchDistinct === 150)
  }

  test("streaming normalized dedup: reformatted copies never emit; batch keep-set parity") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, sf, "documents")
    val dir = Files.createTempDirectory("graft-normstream").toString

    // batch 1: docs 0..99 verbatim. batch 2: 50 REFORMATTED copies of
    // docs 0..49 (uppercased + trailing punctuation — same canonical
    // form) under new ids + genuinely new docs 100..149.
    docs.where($"doc_id" < 100).coalesce(1).write.parquet(s"$dir/b1")
    val reformatted = docs.where($"doc_id" < 50)
      .withColumn("doc_id", $"doc_id" + 10000)
      .withColumn("text", concat(upper($"text"), lit("!!!")))
    val fresh = docs.where($"doc_id" >= 100 && $"doc_id" < 150)
    reformatted.unionByName(fresh).coalesce(1).write.parquet(s"$dir/b2")

    val streamDir = Files.createTempDirectory("graft-normstream-in").toString
    def copyPart(sub: String, name: String): Unit = {
      val part = new java.io.File(s"$dir/$sub").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$streamDir/$name"))
    }
    copyPart("b1", "000.parquet")
    copyPart("b2", "001.parquet")
    val now = System.currentTimeMillis()
    new java.io.File(s"$streamDir/000.parquet").setLastModified(now - 60000)
    new java.io.File(s"$streamDir/001.parquet").setLastModified(now)

    val q = DocStreams.dedupNormalizedStream(
        DocStreams.readDocs(spark, streamDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("doc_norm_dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val emitted = spark.table("doc_norm_dedup")
    // the exact stream would pass all 200 (uppercased text is new bytes);
    // the canonical-form stream drops the 50 reformats
    assert(emitted.count() === 150)
    assert(emitted.where($"doc_id" >= 10000).count() === 0,
      "a reformatted copy slipped through the canonical-form dedup")
    // keep-set parity with the batch twin on the same 150-doc corpus:
    // same distinct canonical fingerprints survive
    val streamKeys = emitted.select("norm_md5").as[String].collect().toSet
    val batchKeys = docs.where($"doc_id" < 150)
      .select(md5(Dedup.normText($"text")).as("m")).as[String].collect().toSet
    assert(streamKeys === batchKeys)
  }

  test("streaming clean pipeline: content-level parity with batch pipeline_e2e") {
    val docs = Tables.load(spark, sf, "documents")
    val streamDir = Files.createTempDirectory("graft-clean-in").toString
    def writeBatch(df: org.apache.spark.sql.DataFrame, name: String,
                   mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-clean-tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = java.nio.file.Paths.get(s"$streamDir/$name")
      Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime)
    }
    // batch 2 includes RE-TEXTED copies of batch-1 docs under new ids:
    // the cross-batch dedup state must suppress them
    val now = System.currentTimeMillis()
    writeBatch(docs.where($"doc_id" < 250), "000.parquet", now - 60000)
    writeBatch(docs.where($"doc_id" >= 250).unionByName(
      docs.where($"doc_id" < 40).withColumn("doc_id", $"doc_id" + 20000)),
      "001.parquet", now)

    val q = DocStreams.cleanStream(
        DocStreams.readDocs(spark, streamDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("doc_clean")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val stream = spark.table("doc_clean")
    // the re-texted copies are exact content dups of already-ingested
    // docs: none may survive
    assert(stream.where($"doc_id" >= 20000).count() === 0,
      "cross-batch duplicate slipped through the streaming cleaner")
    // content-level parity with the batch pipeline: one representative
    // per distinct redacted text, identical content-determined columns
    val streamContent = stream.select("text_md5", "lang", "n_tokens")
      .as[(String, String, Long)].collect().toSet
    val batchContent = graft.operators.Pipeline.pipelineE2e(spark, sf)
      .join(graft.operators.Pipeline.cleanStages(docs), Seq("doc_id", "lang", "n_tokens", "split"))
      .select("text_md5", "lang", "n_tokens")
      .as[(String, String, Long)].collect().toSet
    assert(streamContent === batchContent)
  }

  test("streaming CMS sketch: bit-identical to batch, state bounded at d x w") {
    import graft.operators.Sketches
    val docs = Tables.load(spark, sf, "documents")
    val streamDir = Files.createTempDirectory("graft-cms-in").toString
    def writeBatch(df: org.apache.spark.sql.DataFrame, name: String,
                   mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-cms-tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = java.nio.file.Paths.get(s"$streamDir/$name")
      Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    writeBatch(docs.where($"doc_id" % 2 === 0), "000.parquet", now - 60000)
    writeBatch(docs.where($"doc_id" % 2 === 1), "001.parquet", now)

    val q = DocStreams.tokenSketchStream(
        DocStreams.readDocs(spark, streamDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("doc_cms")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("doc_cms")
      .as[(Int, Long, Long)].collect().toSet
    // bounded state: the sketch can never exceed depth x width keys
    assert(streamed.size <= Sketches.CmsDepth * Sketches.CmsWidth)
    // the sketch is a pure function of the token multiset, so streaming
    // it over two micro-batches lands on the batch sketch EXACTLY
    val batch = Sketches.cmsSketch(
        docs.select(explode(split($"text", " ")).as("tok")))
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed === batch)
    // and therefore query-time estimates agree exactly between modes
    val vocab = docs.select(explode(split($"text", " ")).as("tok")).distinct()
    val fromStream = Sketches.cmsEstimate(spark.table("doc_cms"), vocab)
      .as[(String, Long)].collect().toMap
    val fromBatch = Sketches.tokenHeavyHitters(spark, sf, k = 10)
      .as[(String, Long)].collect()
    fromBatch.foreach { case (tok, est) =>
      assert(fromStream(tok) === est, s"estimate drift for '$tok'")
    }
  }

  test("streaming glove cooc: bit-identical to batch across split arrival, vocab-bounded state") {
    import graft.operators.TextAnalysis
    val docs = Tables.load(spark, sf, "documents")
    val streamDir = Files.createTempDirectory("graft-glove-in").toString
    def writeBatch(df: org.apache.spark.sql.DataFrame, name: String,
                   mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-glove-tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = java.nio.file.Paths.get(s"$streamDir/$name")
      Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    writeBatch(docs.where($"doc_id" % 2 === 0), "000.parquet", now - 60000)
    writeBatch(docs.where($"doc_id" % 2 === 1), "001.parquet", now)

    val q = DocStreams.gloveCoocStream(
        DocStreams.readDocs(spark, streamDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("doc_glove")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("doc_glove")
      .as[(String, String, Long, Long)].collect().toSet
    // counts and harmonic weights are exact integers and a doc's pairs
    // never cross docs, so two-batch arrival lands on the batch matrix
    // EXACTLY
    val batch = TextAnalysis.tokenGloveCooc(spark, sf)
      .as[(String, String, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // state is one aggregate row per (w, c) PAIR seen (pre-floor), not
    // per token occurrence: bounded by vocab², invariant in corpus reads
    val vocab = docs.select(explode(split($"text", " "))).distinct().count()
    val stateRows = q.lastProgress.stateOperators.asInstanceOf[Array[_]]
      .map(_.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
        .numRowsTotal).sum
    assert(stateRows <= vocab * vocab, s"state $stateRows beyond vocab²")
    assert(stateRows >= streamed.size.toLong, "state lost surviving pairs")
  }

  test("streaming upsert: shuffled out-of-order arrival lands on the batch compaction") {
    import graft.operators.Pipeline
    // the batch operator's exact input: base = every doc at v0, delta =
    // the md5<'4' quarter at v1 with n_chars+17
    val docs = Tables.load(spark, sf, "documents")
    val base = docs.selectExpr("doc_id", "CAST(0 AS LONG) AS version", "n_chars")
    val delta = docs
      .where(substring(md5($"doc_id".cast("string")), 1, 1) < "4")
      .selectExpr("doc_id", "CAST(1 AS LONG) AS version",
        "n_chars + 17 AS n_chars")
    val updates = base.unionByName(delta)

    // three micro-batches cut by a hash UNALIGNED with version, so many
    // keys see v1 arrive BEFORE v0 — the out-of-order case the order-free
    // aggregate must absorb
    val streamDir = Files.createTempDirectory("graft-upsert-in").toString
    def writeBatch(df: org.apache.spark.sql.DataFrame, name: String,
                   mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-upsert-tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = java.nio.file.Paths.get(s"$streamDir/$name")
      Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime)
    }
    val bucket = pmod(xxhash64($"doc_id" + $"version" * 7919), lit(3))
    val now = System.currentTimeMillis()
    writeBatch(updates.where(bucket === 0), "000.parquet", now - 120000)
    writeBatch(updates.where(bucket === 1), "001.parquet", now - 60000)
    writeBatch(updates.where(bucket === 2), "002.parquet", now)
    // sanity: the cut really interleaves versions across batches
    assert(updates.where(bucket === 0 && $"version" === 1).count() > 0)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("version",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    val q = DocStreams.upsertStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(streamDir))
      .writeStream.format("memory").queryName("doc_upsert")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("doc_upsert")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Pipeline.corpusUpsert(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    // state bound: one row per live key, nothing more
    assert(streamed.size === docs.count())
  }

  test("streaming CMS estimate path e2e: top-k list equals batch token_heavy_hitters") {
    import graft.operators.Sketches
    // the full serving path over an INGEST-TIME sketch: stream the corpus
    // in three uneven micro-batches, then probe the materialized sketch
    // table with cmsEstimate and rank top-k exactly like the batch query.
    // The ordered heavy-hitter list must MATCH the batch
    // token_heavy_hitters output row for row — closing the gap between
    // "the sketches agree" and "a user serving heavy-hitters from the
    // streamed sketch gets the same answer".
    val docs = Tables.load(spark, sf, "documents")
    val streamDir = Files.createTempDirectory("graft-cms-serve-in").toString
    def writeBatch(df: org.apache.spark.sql.DataFrame, name: String,
                   mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-cms-serve-tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = java.nio.file.Paths.get(s"$streamDir/$name")
      Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    writeBatch(docs.where($"doc_id" % 3 === 0), "000.parquet", now - 120000)
    writeBatch(docs.where($"doc_id" % 3 === 1), "001.parquet", now - 60000)
    writeBatch(docs.where($"doc_id" % 3 === 2), "002.parquet", now)
    val q = DocStreams.tokenSketchStream(
        DocStreams.readDocs(spark, streamDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("doc_cms_serve")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val k = 50
    val vocab = docs.select(explode(split($"text", " ")).as("tok")).distinct()
    val servedFromStream = Sketches.cmsEstimate(spark.table("doc_cms_serve"), vocab)
      .orderBy($"est_count".desc, $"tok".asc)
      .limit(k)
      .as[(String, Long)].collect().toSeq
    val batchList = Sketches.tokenHeavyHitters(spark, sf, k = k)
      .as[(String, Long)].collect().toSeq
    assert(servedFromStream === batchList,
      "streamed-sketch heavy-hitter list diverged from batch token_heavy_hitters")
  }

  test("streaming contamination bits: bit set identical to batch, state bounded at m") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, sf, "documents")
    val streamDir = Files.createTempDirectory("graft-bloom-in").toString
    def writeBatch(df: org.apache.spark.sql.DataFrame, name: String,
                   mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-bloom-tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = java.nio.file.Paths.get(s"$streamDir/$name")
      Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    writeBatch(docs.where($"doc_id" % 2 === 0), "000.parquet", now - 60000)
    writeBatch(docs.where($"doc_id" % 2 === 1), "001.parquet", now)

    val q = DocStreams.contaminationBitsStream(
        DocStreams.readDocs(spark, streamDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("doc_bloom")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamedBits = spark.table("doc_bloom").select("bit")
      .as[Long].collect().toSet
    // bounded state: the filter can never exceed m bits
    assert(streamedBits.size <= Dedup.BloomBits)
    // a bit is set regardless of key multiplicity, so streaming the
    // corpus in micro-batches lands on the batch bit set EXACTLY
    val train = docs.where(substring(md5($"doc_id".cast("string")), 1, 1) < "e")
    val batchBits = Dedup.contaminationBits(train).select("bit")
      .as[Long].collect().toSet
    assert(streamedBits === batchBits)
  }

  test("streaming near-dedup: pair set matches batch MinHash-LSH across micro-batches") {
    val docs = Tables.load(spark, sf, "documents")
    // split the corpus by doc_id parity into two micro-batches, so every
    // planted near-dup pair with mixed-parity ids MUST be caught by state
    // carried across batches, not within one batch
    val streamDir = Files.createTempDirectory("graft-neardup-in").toString
    def writeBatch(df: org.apache.spark.sql.DataFrame, name: String,
                   mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-neardup-tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = java.nio.file.Paths.get(s"$streamDir/$name")
      Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    writeBatch(docs.where($"doc_id" % 2 === 0), "000.parquet", now - 60000)
    writeBatch(docs.where($"doc_id" % 2 === 1), "001.parquet", now)

    val q = graft.streaming.DocStreams.nearDupStream(
        DocStreams.readDocs(spark, streamDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("doc_neardup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val stream = spark.table("doc_neardup")
      .select("doc_a", "doc_b", "inter_size", "union_size")
      .distinct() // multi-band collisions emit per band by contract
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = graft.operators.Dedup.dedupNear(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(stream === batch)
    // prove the cross-batch path was actually exercised: at least one
    // pair joins an even (batch-1) doc with an odd (batch-2) doc
    assert(stream.exists { case (a, b, _, _) => a % 2 != b % 2 },
      "no cross-batch pair in the corpus — parity split did not test state carry-over")
  }

  test("streaming index ingest: pair set matches batch; persisted index matches one-shot build") {
    val docs = Tables.load(spark, sf, "documents")
    // three micro-batches by doc_id mod 3: every mixed-residue pair MUST
    // come from the persisted-index probe (batch k vs the fingerprints
    // batches <k appended), not from intra-batch dedup
    val streamDir = Files.createTempDirectory("graft-idxingest-in").toString
    def writeBatch(df: org.apache.spark.sql.DataFrame, name: String,
                   mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-idxingest-tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = java.nio.file.Paths.get(s"$streamDir/$name")
      Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    writeBatch(docs.where($"doc_id" % 3 === 0), "000.parquet", now - 120000)
    writeBatch(docs.where($"doc_id" % 3 === 1), "001.parquet", now - 60000)
    writeBatch(docs.where($"doc_id" % 3 === 2), "002.parquet", now)

    val idxDir = Files.createTempDirectory("graft-idxingest-idx").toString + "/idx"
    val pairsDir = Files.createTempDirectory("graft-idxingest-out").toString + "/pairs"
    val ckpt = Files.createTempDirectory("graft-idxingest-ckpt").toString
    val q = DocStreams.indexIngestStream(
      DocStreams.readDocs(spark, streamDir, maxFilesPerTrigger = Some(1)),
      idxDir, pairsDir, ckpt)
    q.processAllAvailable()
    q.stop()

    // pair-set parity: intra-batch pairs + index-cross pairs over the
    // 3-batch partition == the one-batch operator over the whole corpus
    val stream = spark.read.parquet(pairsDir)
      .select("doc_a", "doc_b", "inter_size", "union_size")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = graft.operators.Dedup.dedupNearFrom(
        docs.select($"doc_id", $"text"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(stream === batch,
      s"ingest pairs drifted: missing=${batch -- stream} extra=${stream -- batch}")
    assert(stream.exists { case (a, b, _, _) => a % 3 != b % 3 },
      "no cross-batch pair — the split did not exercise the index probe")
    // the grown index is byte-equivalent (as a row set) to a one-shot
    // build over the same corpus: future consumers (batch jobs, the next
    // ingest cycle) see the same index either way
    val refDir = Files.createTempDirectory("graft-idxingest-ref").toString + "/idx"
    graft.sources.FingerprintIndex.writeIndex(docs.select($"doc_id", $"text"), refDir)
    def bandSet(p: String) = spark.read.parquet(s"$p/bands")
      .select($"doc_id".cast("long"), $"band".cast("int"), $"key".cast("long"))
      .as[(Long, Int, Long)].collect().toSet
    assert(bandSet(idxDir) === bandSet(refDir),
      "appended index diverged from one-shot build")
  }

  test("streaming chunking: chunk set equals batch across multi-batch arrival, zero state") {
    val docs = Tables.load(spark, sf, "documents").where($"doc_id" < 150)
    val dir = Files.createTempDirectory("graft-chunkstream").toString
    docs.where($"doc_id" % 2 === 0).coalesce(1).write.parquet(s"$dir/b1")
    docs.where($"doc_id" % 2 === 1).coalesce(1).write.parquet(s"$dir/b2")
    val streamDir = Files.createTempDirectory("graft-chunkstream-in").toString
    def copyPart(sub: String, name: String): Unit = {
      val part = new java.io.File(s"$dir/$sub").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$streamDir/$name"))
    }
    copyPart("b1", "000.parquet")
    copyPart("b2", "001.parquet")

    val q = DocStreams.chunkStream(
        DocStreams.readDocs(spark, streamDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("doc_chunks_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // append mode + no aggregation => the query carries ZERO state rows
    assert(q.lastProgress.stateOperators.isEmpty
      || q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))

    val stream = spark.table("doc_chunks_stream")
      .as[(Long, Int, Int, String)].collect().toSet
    val batch = graft.operators.TextAnalysis.docChunksFrom(docs)
      .as[(Long, Int, Int, String)].collect().toSet
    assert(stream === batch, "streamed chunk set diverged from batch")
    assert(stream.nonEmpty)
  }

  test("streaming BPE encode: per-doc token counts equal the batch query, zero state") {
    import org.apache.spark.sql.functions.{col, explode, split, length}
    val merges = graft.operators.TextAnalysis.bpeMergeList(
      Tables.load(spark, sf, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")).between(1, 32))
        .groupBy(col("w")).count().withColumnRenamed("count", "freq"),
      rounds = 10)

    val docs = Tables.load(spark, sf, "documents")
    val streamDir = Files.createTempDirectory("graft-bpestream").toString
    docs.where($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(streamDir)
    docs.where($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(streamDir)

    val q = DocStreams.bpeEncodeStream(
        DocStreams.readDocs(spark, streamDir, maxFilesPerTrigger = Some(1)),
        merges)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.lastProgress.stateOperators.isEmpty
      || q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))

    val stream = spark.table("bpe_stream")
      .as[(Long, Long, Long)].collect().toSet
    val batch = graft.operators.TextAnalysis.bpeEncode(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(stream === batch, "streamed BPE token counts diverged from batch")
    assert(stream.nonEmpty)
  }
}
