package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaFeatures, MediaRow, Multimodal}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("media table: binary payload with typed metadata, one row per doc") {
    val m = Multimodal.media(spark, sf).cache()
    assert(m.count() === Tables.load(spark, sf, "documents").count())
    assert(m.schema("payload").dataType.typeName === "binary")
    val kinds = m.select("kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("media_features: byte length equals n_chars (ASCII corpus), md5 is 32 hex") {
    val f = Multimodal.mediaFeatures(spark, sf)
      .join(Tables.load(spark, sf, "documents"),
        $"media_id" === $"doc_id")
    assert(f.where($"n_bytes" =!= $"n_chars").count() === 0)
    assert(f.where(org.apache.spark.sql.functions.length($"payload_md5") =!= 32)
      .count() === 0)
  }

  test("decodeFeatures: deterministic fake with pinned values, count preserved") {
    val payload = "abc".getBytes("UTF-8") // bytes 97,98,99 -> sum 294
    val one = Seq(MediaRow(7L, "video", "mp4", payload)).toDS()
    val got = Multimodal.decodeFeatures(one).collect()
    assert(got.length === 1)
    val f = got.head
    assert(f.byte_sum === 294L)
    assert(f.width === 16 + (294 % 1024))
    assert(f.height === 16 + (3 % 768))
    assert(f.n_frames === 1 + 3 % 16)
    // non-video decodes a single frame
    val img = Multimodal.decodeFeatures(
      Seq(MediaRow(8L, "image", "png", payload)).toDS()).head()
    assert(img.n_frames === 1)
  }

  test("decodeFeatures: no shuffle — partitioning preserved, all rows decoded") {
    val m = Multimodal.mediaTyped(spark, sf).repartition(7)
    val decoded = Multimodal.decodeFeatures(m)
    assert(decoded.rdd.getNumPartitions === 7)
    assert(decoded.count() === m.count())
    val p = decoded.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") || p.contains("RoundRobinPartitioning"),
      s"decode introduced an unexpected shuffle:\n$p")
  }

  test("decodeFeatures batches the partition iterator (batch size bound respected)") {
    // 150 rows in 1 partition -> grouped(64) yields batches 64/64/22; the
    // stub maps 1:1 so the observable is: exactly one output row per input
    // row and order preserved within the partition.
    val rows = (0L until 150L).map(i =>
      MediaRow(i, "image", "png", Array.fill((i % 5).toInt + 1)(i.toByte)))
    val ds = rows.toDS().coalesce(1)
    val out = Multimodal.decodeFeatures(ds).collect()
    assert(out.length === 150)
    assert(out.map(_.media_id).toSeq === (0L until 150L))
  }

  test("decodeFeatures: a swapped-in codec changes ONLY the batch body") {
    // fake codec that could not be written as a per-row map: it encodes
    // the BATCH SIZE it was handed into every output row, so the values
    // prove the batching plumbing delivered grouped(64) slices unchanged
    val batchSizeCodec: Multimodal.Decoder = batch =>
      batch.iterator.map(m =>
        graft.operators.MediaFeatures(m.media_id, m.kind,
          width = batch.size, height = 0, n_frames = 0, byte_sum = 0L))
    val rows = (0L until 150L).map(i =>
      MediaRow(i, "image", "png", Array(i.toByte)))
    val out = Multimodal.decodeFeatures(rows.toDS().coalesce(1), batchSizeCodec)
      .collect()
    assert(out.length === 150)
    // 150 rows in one partition -> batches of 64, 64, 22
    assert(out.map(_.width).toSeq === Seq.fill(64)(64) ++ Seq.fill(64)(64)
      ++ Seq.fill(22)(22))
    // and the distributed shape is identical to the stub path: no shuffle
    val decoded = Multimodal.decodeFeatures(
      Multimodal.mediaTyped(spark, sf).repartition(5), batchSizeCodec)
    assert(decoded.rdd.getNumPartitions === 5)
  }

  test("resizeThumb: strided byte thumbnail, <= budget, exact on a literal payload") {
    val one = Seq((7L, "image", "png", "abcdefgh".getBytes("UTF-8")))
      .toDF("media_id", "kind", "format", "payload")
    val small = Multimodal.resizeThumb(one).collect().head
    // len 8 < budget 32 -> stride 1, identity thumbnail
    assert(small.getAs[Long]("n_bytes") === 8L)
    assert(small.getAs[Long]("stride") === 1L)
    assert(small.getAs[String]("thumb_hex") === "6162636465666768".toUpperCase)

    val corpus = Multimodal.resizeThumb(Multimodal.media(spark, sf))
    val bad = corpus.where(
      $"thumb_hex".isNull ||
        org.apache.spark.sql.functions.length($"thumb_hex") > 2 * Multimodal.ThumbBudget ||
        org.apache.spark.sql.functions.length($"thumb_hex") % 2 =!= 0).count()
    assert(bad === 0)
    assert(corpus.count() === Multimodal.media(spark, sf).count())
  }

  test("wavDecoder: real RIFF/WAVE PCM parse through the same decode seam") {
    import java.nio.{ByteBuffer, ByteOrder}
    def wavBytes(samples: Seq[Short], channels: Short = 1,
                 rate: Int = 8000): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels).putInt(rate)
        .putInt(rate * channels * 2).putShort((channels * 2).toShort)
        .putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val samples = Seq[Short](0, 1000, -1000, 32767, -32768)
    val wav = wavBytes(samples)
    val junk = "definitely not a riff container".getBytes("UTF-8")
    val ds = Seq(
      MediaRow(1L, "audio", "wav", wav),
      MediaRow(2L, "audio", "wav", junk)).toDS()
    val got = Multimodal.decodeFeatures(ds, Multimodal.wavDecoder)
      .collect().map(f => f.media_id -> f).toMap
    // parsed: width=channels, height=bits, frames=sample count,
    // byte_sum = unsigned sum of the PCM data bytes
    val expectSum = wav.drop(44).foldLeft(0L)((a, b) => a + (b & 0xff))
    assert(got(1L) === MediaFeatures(1L, "audio", 1, 16, samples.length, expectSum))
    // malformed payload: PERMISSIVE fallback to the stub's deterministic row
    assert(got(2L) === Multimodal.stubDecoder(
      Seq(MediaRow(2L, "audio", "wav", junk))).next())
  }

  test("bmpDecoder + registry: real BMP parse, per-format dispatch, stub fallback") {
    import java.nio.{ByteBuffer, ByteOrder}
    def bmpBytes(w: Int, h: Int): Array[Byte] = {
      val rowBytes = ((w * 3 + 3) / 4) * 4 // 24bpp rows padded to 4 bytes
      val dataLen = rowBytes * math.abs(h)
      val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
        .putShort(0).putShort(0).putInt(54) // reserved, pixel offset
        .putInt(40).putInt(w).putInt(h)     // info header, dims
        .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
        .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
      (0 until dataLen).foreach(i => bb.put((i % 7).toByte))
      bb.array()
    }
    val bmp = bmpBytes(2, 2) // 2x2, rowBytes 8, dataLen 16
    val expectSum = bmp.drop(54).foldLeft(0L)((a, b) => a + (b & 0xff))
    val rows = Seq(
      MediaRow(1L, "image", "bmp", bmp),
      MediaRow(2L, "audio", "wav", "junk".getBytes("UTF-8")),
      MediaRow(3L, "video", "mp4", "no mp4 codec here".getBytes("UTF-8")))
    val got = Multimodal.decodeFeatures(rows.toDS(),
        Multimodal.registryDecoder(Multimodal.defaultRegistry))
      .collect().map(f => f.media_id -> f).toMap
    assert(got(1L) === MediaFeatures(1L, "image", 2, 2, 1, expectSum))
    // wav junk: wavDecoder's PERMISSIVE fallback
    assert(got(2L) === Multimodal.stubDecoder(Seq(rows(1))).next())
    // mp4 has no registered codec: registry routes straight to the stub
    assert(got(3L) === Multimodal.stubDecoder(Seq(rows(2))).next())
  }

  test("imageIoDecoder: real PNG/JPEG decode via the JDK reader, pinned pixel stats") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // 3x2 RGB image with known channel values; PNG is lossless, so the
    // decoded raster samples are exactly what we wrote
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_3BYTE_BGR)
    val px = Seq( // (x, y, r, g, b)
      (0, 0, 10, 20, 30), (1, 0, 0, 0, 0), (2, 0, 255, 255, 255),
      (0, 1, 1, 2, 3), (1, 1, 100, 0, 50), (2, 1, 7, 7, 7))
    px.foreach { case (x, y, r, g, b) =>
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    def bytes(fmt: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
      bos.toByteArray
    }
    val png = bytes("png")
    val expectSum = px.map { case (_, _, r, g, b) => r + g + b }.sum.toLong
    val rows = Seq(
      MediaRow(1L, "image", "png", png),
      MediaRow(2L, "image", "jpg", bytes("jpg")),
      MediaRow(3L, "image", "png", "not an image".getBytes("UTF-8")))
    val got = Multimodal.decodeFeatures(rows.toDS(),
        Multimodal.registryDecoder(Multimodal.defaultRegistry))
      .collect().map(f => f.media_id -> f).toMap
    // PNG: lossless — dims AND the channel-sample sum pinned exactly
    assert(got(1L) === MediaFeatures(1L, "image", 3, 2, 1, expectSum))
    // JPEG: lossy — dims and single frame are contract; samples are
    // codec-version-dependent, only bounded (6 px × 3 bands × 255 max)
    assert(got(2L).width === 3 && got(2L).height === 2 && got(2L).n_frames === 1)
    assert(got(2L).byte_sum >= 0L && got(2L).byte_sum <= 6L * 3 * 255)
    // non-image bytes under a png route: PERMISSIVE fallback to the stub
    assert(got(3L) === Multimodal.stubDecoder(Seq(rows(2))).next())
  }

  test("dHash64: real pixel hashes — noise-invariant, inversion-sensitive, md5 fallback") {
    import java.nio.{ByteBuffer, ByteOrder}
    def bmpOf(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
      val rowBytes = ((w * 3 + 3) / 4) * 4
      val dataLen = rowBytes * h
      val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
        .putShort(0).putShort(0).putInt(54)
        .putInt(40).putInt(w).putInt(h)
        .putShort(1).putShort(24).putInt(0)
        .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
      // bottom-up rows, BGR, padded
      (0 until h).foreach { row =>
        val y = h - 1 - row
        (0 until w).foreach { x =>
          val v = pix(x, y); bb.put(v.toByte).put(v.toByte).put(v.toByte)
        }
        (w * 3 until rowBytes).foreach(_ => bb.put(0.toByte))
      }
      bb.array()
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // horizontal gradient: every dHash cell increases left-to-right
    val grad = Multimodal.dHash64(bmpOf(32, 32)((x, _) => x * 8))
    assert(grad._2, "BMP must take the real decode path")
    assert(grad._1 === -1L, "monotone gradient sets all 64 bits")
    // mild deterministic noise: perceptually the same image
    val noisy = Multimodal.dHash64(
      bmpOf(32, 32)((x, y) => math.min(255, x * 8 + (x * 31 + y * 17) % 3)))
    assert(noisy._2 && hamming(grad._1, noisy._1) <= 6,
      s"noise moved ${hamming(grad._1, noisy._1)} bits")
    // inverted gradient: every comparison flips
    val inv = Multimodal.dHash64(bmpOf(32, 32)((x, _) => 255 - x * 8))
    assert(inv._1 === 0L && hamming(grad._1, inv._1) === 64)
    // a tiny image exercises the degenerate pool boxes without throwing
    val tiny = Multimodal.dHash64(bmpOf(4, 3)((x, y) => (x * y * 29) % 256))
    assert(tiny._2)
    // non-image payload: md5-prefix fallback, decoded=false
    val junk = "definitely not pixels".getBytes("UTF-8")
    val fb = Multimodal.dHash64(junk)
    val d = java.security.MessageDigest.getInstance("MD5").digest(junk)
    val expect = (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
    assert(fb === (expect, false))
    // the same hash comes back through the ImageIO path (PNG round-trip
    // of the identical gray raster) — format-independent fingerprint
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until 32).foreach(y => (0 until 32).foreach { x =>
      val v = x * 8; img.setRGB(x, y, (v << 16) | (v << 8) | v)
    })
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = Multimodal.dHash64(bos.toByteArray)
    assert(png === grad)
  }

  test("media_phash_pairs: banding is exact blocking — hamming recomputes, candidates band-collide") {
    val pairs = Multimodal.mediaPhashPairs(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    val ph = Multimodal.mediaPhash(spark, sf)
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    def bands(h: String) = (0 until 4).map(i => i -> h.substring(i * 4, i * 4 + 4))
    def hamming(a: String, b: String) =
      java.lang.Long.bitCount(java.lang.Long.parseUnsignedLong(a, 16) ^
        java.lang.Long.parseUnsignedLong(b, 16))
    pairs.foreach { case (a, b, hd, near) =>
      assert(a < b)
      assert(hd === hamming(ph(a), ph(b)), s"pair ($a,$b) hamming")
      assert(near === (hd <= 6))
      assert(bands(ph(a)).intersect(bands(ph(b))).nonEmpty,
        s"pair ($a,$b) must share a band")
    }
    // completeness on the corpus: every band-sharing pair is reported
    val byBand = ph.toSeq.flatMap { case (id, h) => bands(h).map(_ -> id) }
      .groupBy(_._1).values
      .flatMap(g => g.map(_._2).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    assert(pairs.map(p => (p._1, p._2)).toSet === byBand)
  }

  test("sampleFrames: k frames of <=16 bytes per video row") {
    val frames = Multimodal.sampleFrames(Multimodal.media(spark, sf), 4)
    val vids = Multimodal.media(spark, sf).where($"kind" === "video").count()
    assert(frames.count() === vids)
    val sizes = frames
      .selectExpr("size(frames) AS k", "transform(frames, f -> length(f)) AS lens")
      .collect()
    sizes.foreach { r =>
      assert(r.getAs[Int]("k") === 4)
      r.getAs[Seq[Int]]("lens").foreach(l => assert(l <= 16))
    }
  }
}
