package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** One opaque media item: payload is raw bytes (image/audio/video), typed
  * metadata alongside. */
case class MediaRow(media_id: Long, kind: String, format: String,
                    payload: Array[Byte])

/** Features a (stubbed) decoder extracts per media item. */
case class MediaFeatures(media_id: Long, kind: String, width: Int,
                         height: Int, n_frames: Int, byte_sum: Long)

/** Multimodal-column plumbing — the LLM-pipeline pattern of carrying
  * image/audio/video as opaque `binary` columns with typed metadata, and
  * running decode / feature-extraction / frame-sampling as batched
  * per-partition operators.
  *
  * The media table is derived deterministically from `documents` (payload =
  * UTF-8 bytes of the text; kind/format keyed off doc_id) because the
  * testdata ships no real media — but every Spark-side shape is real:
  * BinaryType columns, typed `Dataset[MediaRow]` with an Array[Byte]
  * encoder, `mapPartitions` with explicit batch grouping (where a native
  * codec would be invoked per batch), binary slicing, array-of-binary
  * frame columns, and partition preservation (no shuffle through decode).
  *
  * Decode runs behind one injectable [[Multimodal.Decoder]] seam. REAL
  * codecs behind it: [[Multimodal.wavDecoder]] (dependency-free RIFF/WAVE
  * PCM header parser), [[Multimodal.bmpDecoder]] (uncompressed BMP), and
  * [[Multimodal.imageIoDecoder]] (PNG/JPEG/GIF via the JDK-built-in
  * `javax.imageio` — no new dependency). VIDEO remains a documented stub
  * ([[Multimodal.stubDecoder]]'s deterministic fake): this container
  * ships no `ffmpeg`, and the seam is exactly where such a codec would
  * plug in — swapping a decoder changes only the `decode` argument,
  * nothing about the distributed shape.
  */
object Multimodal {

  /** Items per decode batch — real decoders amortize native-call overhead
    * per batch, so the batching (not per-row calls) is part of the shape. */
  val DecodeBatchSize = 64

  private val kindExpr =
    "element_at(array('image', 'audio', 'video'), CAST(media_id % 3 AS INT) + 1)"
  private val formatExpr =
    "element_at(array('png', 'wav', 'mp4'), CAST(media_id % 3 AS INT) + 1)"

  /** The media table: one opaque binary payload + typed metadata per doc. */
  def media(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .select(col("media_id"),
        expr(kindExpr).as("kind"),
        expr(formatExpr).as("format"),
        encode(col("text"), "UTF-8").as("payload"))

  def mediaTyped(s: SparkSession, d: String): Dataset[MediaRow] = {
    val sp = s
    import sp.implicits._
    media(s, d).as[MediaRow]
  }

  /** Byte-level features straight off the binary column (no decode):
    * sizes, content hash, magic-bytes prefix — the cheap first-pass
    * filters a media pipeline runs before any decoding. */
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    media(s, d)
      .select(col("media_id"), col("kind"), col("format"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        hex(substring(col("payload"), 1, 8)).as("head_hex"))

  // DuckDB has no md5/substring over BLOB, so the oracle byte-addresses
  // through the hex string: the first 8 BYTES of the payload are the first
  // 16 chars of hex(encode(text)) regardless of encoding (no chars==bytes
  // assumption). md5(text) in DuckDB hashes the UTF-8 bytes, which IS the
  // payload by construction.
  val mediaFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
      |  ['png', 'wav', 'mp4'][CAST(doc_id % 3 AS INT) + 1] AS format,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  substr(hex(encode(text)), 1, 16) AS head_hex
      |FROM documents ORDER BY media_id""".stripMargin

  /** A codec: decodes ONE batch of media rows to their features. Real
    * implementations wrap a native library call (libjpeg/ffmpeg) that
    * amortizes per-call overhead across the batch. */
  type Decoder = Seq[MediaRow] => Iterator[MediaFeatures]

  /** STUB codec — this container has no image/audio libraries, so the
    * default decoder derives width/height/frame-count deterministically
    * from the bytes; tests pin its exact values. */
  val stubDecoder: Decoder = batch =>
    batch.iterator.map { m =>
      val sum = m.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
      val width = 16 + (sum % 1024).toInt
      val height = 16 + (m.payload.length % 768)
      val frames = if (m.kind == "video") 1 + m.payload.length % 16 else 1
      MediaFeatures(m.media_id, m.kind, width, height, frames, sum)
    }

  /** A REAL dependency-free codec for one format: RIFF/WAVE PCM, parsed
    * byte-level (chunk walk from offset 12; no codec library involved, so
    * it runs in this container). Audio semantics mapped onto the shared
    * feature schema: width = channels, height = bits/sample, n_frames =
    * PCM sample frames (data bytes / block align), byte_sum = unsigned
    * sum of the data chunk. Non-WAV or malformed payloads fall back to
    * [[stubDecoder]]'s row — a decoder NEVER throws on bad media
    * (PERMISSIVE, the same contract as every ingest path here). The
    * point: the [[Decoder]] seam carries a real codec unchanged —
    * MultimodalSpec feeds synthesized WAV bytes through the SAME
    * `decodeFeatures` plumbing and pins the parsed values. */
  val wavDecoder: Decoder = batch =>
    batch.iterator.map { m =>
      parseWav(m.payload) match {
        case Some(w) =>
          var sum = 0L
          var i = w.dataOff
          val end = math.min(w.dataOff + w.dataLen, m.payload.length)
          while (i < end) { sum += (m.payload(i) & 0xff); i += 1 }
          val blockAlign = w.channels * (w.bits / 8)
          val frames = if (blockAlign > 0) w.dataLen / blockAlign else 0
          MediaFeatures(m.media_id, m.kind, w.channels, w.bits, frames, sum)
        case None => stubDecoder(Seq(m)).next()
      }
    }

  /** Image twin of [[wavDecoder]]: uncompressed BMP (BITMAPINFOHEADER or
    * later, BI_RGB only), parsed byte-level. width/height from the info
    * header (a negative height means top-down rows; reported absolute),
    * n_frames = 1, byte_sum over the pixel array. Same PERMISSIVE
    * contract: anything else falls back to the stub row. */
  val bmpDecoder: Decoder = batch =>
    batch.iterator.map { m =>
      parseBmp(m.payload) match {
        case Some((w, h, pixOff)) =>
          var sum = 0L
          var i = pixOff
          while (i < m.payload.length) { sum += (m.payload(i) & 0xff); i += 1 }
          MediaFeatures(m.media_id, m.kind, w, h, 1, sum)
        case None => stubDecoder(Seq(m)).next()
      }
    }

  /** Compressed-image codec via `javax.imageio` — JDK-built-in (PNG,
    * JPEG, GIF, BMP, WBMP readers ship with the JRE; no dependency, so
    * the build constraint holds) and the first REAL decoder here that
    * handles a compressed format rather than a fixed-layout header walk.
    * Features mapped onto the shared schema: width/height in pixels,
    * n_frames from the reader (animated GIFs report their frame count;
    * single-image formats report 1), byte_sum = sum of all decoded
    * channel samples of frame 0 (raster samples, not file bytes — a
    * DETERMINISTIC pixel statistic: PNG/BMP/GIF decode losslessly to the
    * same samples everywhere, and JPEG decode is deterministic for a
    * given JRE). Same PERMISSIVE contract: `ImageIO` returning no reader
    * (payload is not an image this JRE decodes) falls back to the stub
    * row — a decoder never throws on bad media. */
  val imageIoDecoder: Decoder = batch =>
    batch.iterator.map { m =>
      decodeImage(m.payload) match {
        case Some((w, h, frames, sampleSum)) =>
          MediaFeatures(m.media_id, m.kind, w, h, frames, sampleSum)
        case None => stubDecoder(Seq(m)).next()
      }
    }

  private def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    import javax.imageio.ImageIO
    import javax.imageio.stream.MemoryCacheImageInputStream
    import java.io.ByteArrayInputStream
    try {
      val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true) // seekForwardOnly=false: frame count needs a full scan
          val frames = try math.max(reader.getNumImages(true), 1)
          catch { case _: Exception => 1 }
          val img = reader.read(0)
          val raster = img.getRaster
          val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
          var sum = 0L
          val row = new Array[Int](w * bands)
          var y = 0
          while (y < h) {
            raster.getPixels(0, y, w, 1, row)
            var i = 0
            while (i < row.length) { sum += row(i); i += 1 }
            y += 1
          }
          Some((w, h, frames, sum))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** Codec registry: route each row to its format's decoder, stub for
    * formats without one — the dispatch shape a production media pipeline
    * uses, still behind the single [[Decoder]] seam. */
  def registryDecoder(codecs: Map[String, Decoder]): Decoder = batch =>
    batch.iterator.flatMap(m =>
      codecs.getOrElse(m.format, stubDecoder)(Seq(m)))

  /** WAV and BMP through the hand parsers (dependency-free, exact layout
    * control); the compressed image formats through `javax.imageio`. */
  val defaultRegistry: Map[String, Decoder] =
    Map("wav" -> wavDecoder, "bmp" -> bmpDecoder,
      "png" -> imageIoDecoder, "jpg" -> imageIoDecoder,
      "jpeg" -> imageIoDecoder, "gif" -> imageIoDecoder)

  private def parseBmp(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    val pixOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    val w = le32(b, 18)
    val h = le32(b, 22)
    val comp = le32(b, 30)
    if (hdrSize < 40 || comp != 0 || w <= 0 || h == 0 ||
      pixOff < 54 || pixOff > b.length) None
    else Some((w, math.abs(h), pixOff))
  }

  private case class WavInfo(channels: Int, bits: Int, sampleRate: Int,
                             dataOff: Int, dataLen: Int)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b.slice(o, o + 4), "US-ASCII")

  private def parseWav(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, bits, rate
    var data: Option[(Int, Int)] = None     // offset, length
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(b, off)
      val sz = le32(b, off + 4)
      if (sz < 0 || off + 8 + sz > b.length) return None
      if (id == "fmt " && sz >= 16) {
        if (le16(b, off + 8) != 1) return None // PCM only
        fmt = Some((le16(b, off + 10), le16(b, off + 22), le32(b, off + 12)))
      } else if (id == "data") {
        data = Some((off + 8, sz))
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    for ((ch, bits, rate) <- fmt; (dOff, dLen) <- data
         if ch > 0 && (bits == 8 || bits == 16 || bits == 24 || bits == 32))
      yield WavInfo(ch, bits, rate, dOff, dLen)
  }

  /** Decode + feature extraction over explicit per-partition batches.
    * The codec is INJECTED: swapping the stub for a real decoder changes
    * only the `decode` argument, nothing about the distributed shape —
    * MultimodalSpec proves the claim by injecting a fake codec and
    * asserting the plumbing (batch grouping, partition preservation, row
    * accounting) is untouched. No shuffle: runs partition-local. */
  def decodeFeatures(mediaDs: Dataset[MediaRow],
                     decode: Decoder = stubDecoder): Dataset[MediaFeatures] = {
    val sp = mediaDs.sparkSession
    import sp.implicits._
    mediaDs.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap(decode)
    }
  }

  /** Bytes in a resized thumbnail. */
  val ThumbBudget = 32

  /** Byte-level nearest-neighbor "resize": stride-sample each payload down
    * to a <= [[ThumbBudget]]-byte thumbnail (byte i of the thumb is byte
    * 1 + i*stride of the source, stride = len div budget) — the pre-decode
    * twin of an image resize, the same way [[sampleFrames]] is the
    * pre-decode twin of frame extraction. Pure per-row slice arithmetic,
    * codegen-friendly, no shuffle; a PIXEL-space resize belongs behind the
    * [[Decoder]] seam (resample after decode, inside the batch loop), and
    * this operator is what runs before any codec: shrink the bytes you
    * ship, then decode. Emitted as hex so the result is a scalar,
    * driver-sortable column. */
  def resizeThumb(mediaDf: DataFrame): DataFrame =
    mediaDf
      .select(col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"),
        hex(col("payload")).as("h"))
      .withColumn("stride",
        greatest(lit(1L), expr(s"n_bytes div $ThumbBudget")))
      .select(col("media_id"), col("kind"), col("n_bytes"), col("stride"),
        expr(
          s"""concat_ws('', transform(
             |  sequence(0, CAST(least($ThumbBudget, n_bytes) AS INT) - 1),
             |  i -> substr(h, CAST(2 * i * stride + 1 AS INT), 2)))"""
            .stripMargin).as("thumb_hex"))

  // Byte-addressed through the hex string, like mediaFramesSql: thumb byte
  // i is hex chars [2*i*stride+1, 2*i*stride+2] — exact for any encoding.
  val mediaResizeSql: String =
    s"""SELECT media_id, kind, n_bytes, stride,
       |  array_to_string(list_transform(
       |    range(0, CAST(least($ThumbBudget, n_bytes) AS INT)),
       |    i -> substr(h, CAST(2 * i * stride + 1 AS INT), 2)), '') AS thumb_hex
       |FROM (
       |  SELECT doc_id AS media_id,
       |    ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |    greatest(1, octet_length(encode(text)) // $ThumbBudget) AS stride,
       |    hex(encode(text)) AS h
       |  FROM documents)
       |ORDER BY media_id""".stripMargin

  /** Frame-sampling stub: k evenly-spaced 16-byte windows from each video
    * payload as an array<binary> column — the decoded-frame column shape
    * without a decoder. Pure slice arithmetic, codegen-friendly. */
  def sampleFrames(mediaDf: DataFrame, k: Int): DataFrame =
    mediaDf.where(col("kind") === "video")
      .select(col("media_id"),
        expr(
          s"""transform(sequence(0, $k - 1),
             |  f -> substring(payload, 1 + f * greatest(1, CAST(length(payload) div $k AS INT)), 16))"""
            .stripMargin).as("frames"))

  /** 64-bit difference hash (dHash) of an image payload — the perceptual
    * fingerprint image pipelines dedup on: decode → grayscale → average-
    * pool to a 9×8 grid → bit (row r, col c) = 1 iff cell(c,r) <
    * cell(c+1,r). Visually-similar images (recompression, mild noise,
    * small crops) land within a few bits; unrelated images differ by ~32.
    *
    * Decode order: the dependency-free BMP parser (24-bit BI_RGB,
    * bottom-up or top-down), then `javax.imageio` for the compressed
    * formats, then the PERMISSIVE fallback — the first 8 bytes of
    * md5(payload) as the hash. The fallback keeps the operator total (no
    * decoder ever throws here) and is exactly what makes [[mediaPhash]]
    * SQL-oracle-able on this corpus: the synthetic payloads are text
    * bytes, every row takes the md5 path, and DuckDB can compute THAT —
    * while MultimodalSpec drives real BMP/PNG fixtures through the same
    * function and pins true pixel dHashes (similar images ⇒ hamming ≤ 6,
    * inverted image ⇒ hamming ≥ 32). All-JVM double math — bit-identical
    * on every executor. */
  def dHash64(payload: Array[Byte]): (Long, Boolean) =
    grayPixels(payload) match {
      case Some((w, h, gray)) =>
        val cells = Array.ofDim[Double](8, 9)
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 9) {
            val x0 = c * w / 9; val x1 = math.max((c + 1) * w / 9, x0 + 1)
            val y0 = r * h / 8; val y1 = math.max((r + 1) * h / 8, y0 + 1)
            var sum = 0.0; var n = 0
            var y = y0
            while (y < y1 && y < h) {
              var x = x0
              while (x < x1 && x < w) {
                sum += gray(math.min(y, h - 1) * w + math.min(x, w - 1))
                n += 1; x += 1
              }
              y += 1
            }
            // degenerate pool boxes (w<9 or h<8) fall back to the clamped
            // corner pixel so every cell is defined
            cells(r)(c) =
              if (n > 0) sum / n
              else gray(math.min(y0, h - 1) * w + math.min(x0, w - 1))
            c += 1
          }
          r += 1
        }
        var bits = 0L
        r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            bits <<= 1
            if (cells(r)(c) < cells(r)(c + 1)) bits |= 1L
            c += 1
          }
          r += 1
        }
        (bits, true)
      case None =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(payload)
        var bits = 0L
        var i = 0
        while (i < 8) { bits = (bits << 8) | (d(i) & 0xffL); i += 1 }
        (bits, false)
    }

  /** Grayscale raster (row-major, 0-255 doubles): hand BMP parser first
    * (24bpp BI_RGB, padded bottom-up rows; negative height = top-down),
    * then `javax.imageio`, else None. */
  private def grayPixels(b: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    parseBmp(b) match {
      case Some((w, h, pixOff)) if le16(b, 28) == 24 =>
        val topDown = le32(b, 22) < 0
        val rowBytes = (w * 3 + 3) & ~3
        if (pixOff + rowBytes.toLong * h > b.length) return grayViaImageIo(b)
        val g = new Array[Double](w * h)
        var y = 0
        while (y < h) {
          val srcRow = if (topDown) y else h - 1 - y
          var x = 0
          while (x < w) {
            val o = pixOff + srcRow * rowBytes + x * 3
            g(y * w + x) = ((b(o) & 0xff) + (b(o + 1) & 0xff) +
              (b(o + 2) & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        Some((w, h, g))
      case _ => grayViaImageIo(b)
    }
  }

  private def grayViaImageIo(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    import javax.imageio.ImageIO
    import java.io.ByteArrayInputStream
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) return None
      val raster = img.getRaster
      val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
      val g = new Array[Double](w * h)
      val row = new Array[Int](w * bands)
      var y = 0
      while (y < h) {
        raster.getPixels(0, y, w, 1, row)
        var x = 0
        while (x < w) {
          var sum = 0; var k = 0
          while (k < bands) { sum += row(x * bands + k); k += 1 }
          g(y * w + x) = sum.toDouble / bands
          x += 1
        }
        y += 1
      }
      Some((w, h, g))
    } catch { case _: Exception => None }
  }

  /** Per-item perceptual hash: (media_id, format, phash_hex, decoded).
    * Partition-local mapPartitions like [[decodeFeatures]] — no shuffle. */
  def mediaPhash(s: SparkSession, d: String): DataFrame = {
    val sp = s
    import sp.implicits._
    mediaTyped(s, d).mapPartitions { rows =>
      rows.map { m =>
        val (bits, decoded) = dHash64(m.payload)
        (m.media_id, m.format, f"$bits%016x", decoded)
      }
    }.toDF("media_id", "format", "phash_hex", "decoded")
  }

  // every synthetic payload takes the md5 fallback (text bytes are not a
  // decodable image), which DuckDB computes exactly
  val mediaPhashSql: String =
    """SELECT doc_id AS media_id,
      |  ['png', 'wav', 'mp4'][CAST(doc_id % 3 AS INT) + 1] AS format,
      |  substr(md5(text), 1, 16) AS phash_hex, false AS decoded
      |FROM documents ORDER BY media_id""".stripMargin

  /** Near-duplicate image candidates by pigeonhole banding on the dHash:
    * split the 64-bit hash into 4 × 16-bit bands — any pair within
    * hamming ≤ 3 shares at least one EXACT band (4 bands, ≤3 differing
    * bits), so an equi-join per band finds all close pairs without any
    * all-pairs comparison, exactly the [[graft.operators.Dedup]] LSH
    * block-then-verify shape but in pixel space. Each candidate is then
    * verified with the true hamming distance (4 × 16-bit xor popcounts);
    * `is_near_dup` applies the ≤ 6 accept threshold (pairs that band-
    * collide but differ widely stay visible as rejected candidates — the
    * blocking's false-positive surface, deliberately not hidden). The
    * hash frame is checkpointed once so the decode pass runs ONCE, not
    * once per self-join side; at 100 TB the bands exchange carries
    * 20-byte rows, never payloads. */
  def mediaPhashPairs(s: SparkSession, d: String): DataFrame = {
    val ph = mediaPhash(s, d).select(col("media_id"), col("phash_hex"))
      .localCheckpoint()
    val bands = ph.select(col("media_id"), col("phash_hex"),
      posexplode(expr(
        "transform(sequence(0, 3), i -> substring(phash_hex, i*4+1, 4))")))
      .toDF("media_id", "phash_hex", "band_idx", "band")
    val a = bands.toDF("media_id_a", "pa", "band_idx", "band")
    val bb = bands.toDF("media_id_b", "pb", "band_idx", "band")
    val hamming = (0 until 4).map { k =>
      expr(s"""bit_count(CAST(conv(substring(pa, ${k * 4 + 1}, 4), 16, 10) AS INT)
              | ^ CAST(conv(substring(pb, ${k * 4 + 1}, 4), 16, 10) AS INT))"""
        .stripMargin)
    }.reduce(_ + _)
    a.join(bb, Seq("band_idx", "band"))
      .where(col("media_id_a") < col("media_id_b"))
      .select(col("media_id_a"), col("media_id_b"), col("pa"), col("pb"))
      .distinct()
      .select(col("media_id_a"), col("media_id_b"),
        hamming.cast("long").as("hamming"))
      .withColumn("is_near_dup", col("hamming") <= 6)
  }

  val mediaPhashPairsSql: String = {
    val hamming = (0 until 4).map { k =>
      s"""bit_count(xor(CAST('0x' || substr(pa, ${k * 4 + 1}, 4) AS INT),
         |               CAST('0x' || substr(pb, ${k * 4 + 1}, 4) AS INT)))"""
        .stripMargin
    }.mkString(" + ")
    s"""WITH ph AS (
       |  SELECT doc_id AS media_id, substr(md5(text), 1, 16) AS ph
       |  FROM documents),
       |b AS (
       |  SELECT media_id, ph, i, substr(ph, i * 4 + 1, 4) AS band
       |  FROM ph, (SELECT unnest(range(0, 4)) AS i) r),
       |cand AS (
       |  SELECT DISTINCT x.media_id AS media_id_a, y.media_id AS media_id_b,
       |         x.ph AS pa, y.ph AS pb
       |  FROM b x JOIN b y ON x.i = y.i AND x.band = y.band
       |                   AND x.media_id < y.media_id)
       |SELECT media_id_a, media_id_b,
       |  CAST($hamming AS BIGINT) AS hamming,
       |  ($hamming) <= 6 AS is_near_dup
       |FROM cand ORDER BY media_id_a, media_id_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_features" -> (mediaFeatures _),
    "media_phash" -> (mediaPhash _),
    "media_phash_pairs" -> (mediaPhashPairs _),
    // decode path through the production codec registry (WAV/BMP real,
    // stub for codec-less formats; this corpus's payloads are text bytes,
    // so every row takes the documented stub fallback — values pinned in
    // MultimodalSpec). Rows-only in the driver gate: no SQL twin for a
    // decoder.
    "media_decode" -> ((s, d) => decodeFeatures(mediaTyped(s, d),
      registryDecoder(defaultRegistry)).toDF()),
    "media_resize" -> ((s, d) => resizeThumb(media(s, d))),
    // frames flattened to ONE scalar string per row: verification harnesses
    // hash/sort rows, and an array<string> column is not sortable there —
    // the per-frame hex joins to a single comma-separated column
    "media_frames" -> ((s, d) =>
      sampleFrames(media(s, d), 4)
        .select(col("media_id"),
          expr("concat_ws(',', transform(frames, f -> hex(f)))")
            .as("frame_hex")))
  )

  // The frames oracle byte-addresses via the hex string (2 hex chars per
  // byte) because DuckDB has no BLOB substring: byte window [f*st+1,
  // f*st+16] of the payload is char window [2*f*st+1, 32] of
  // hex(encode(text)) — exact for ANY encoding, no chars==bytes assumption.
  val mediaFramesSql: String =
    """SELECT doc_id AS media_id,
      |  concat_ws(',',
      |    substr(h, 2*0*st + 1, 32),
      |    substr(h, 2*1*st + 1, 32),
      |    substr(h, 2*2*st + 1, 32),
      |    substr(h, 2*3*st + 1, 32)) AS frame_hex
      |FROM (SELECT doc_id, hex(encode(text)) AS h,
      |             greatest(1, octet_length(encode(text)) // 4) AS st
      |      FROM documents WHERE doc_id % 3 = 2)
      |ORDER BY media_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "media_features" -> mediaFeaturesSql,
    "media_phash" -> mediaPhashSql,
    "media_phash_pairs" -> mediaPhashPairsSql,
    "media_resize" -> mediaResizeSql,
    "media_frames" -> mediaFramesSql
  )

  val verifyOrder: Map[String, Seq[Column]] = Map(
    "media_features" -> Seq(col("media_id")),
    "media_phash" -> Seq(col("media_id")),
    "media_phash_pairs" -> Seq(col("media_id_a"), col("media_id_b")),
    "media_decode" -> Seq(col("media_id")),
    "media_resize" -> Seq(col("media_id")),
    "media_frames" -> Seq(col("media_id"))
  )
}
