package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.12): media as opaque
  * `binary` columns with typed metadata, decoded / feature-extracted
  * in distributed batches.
  *
  * The Spark-side shape is real and tested — schemas, partition-local
  * batch iteration via `mapPartitions` on a typed Dataset (the Scala
  * analogue of `mapInPandas`: one iterator per partition, zero
  * driver involvement), and explicit output schemas. FOUR real codecs
  * live here — RIFF/WAV, 24bpp BMP, PNG (zlib + all five scanline
  * filters), and GIF (real LZW) — all written against public specs
  * with zero external libraries; only the remaining kinds (JPEG,
  * video containers) route through the labeled `decodeStub`, which
  * derives deterministic pseudo-metadata and features from the bytes
  * so every downstream operator (joins on metadata, ANN over
  * extracted features, frame sampling) is still exercised end-to-end
  * with stable results.
  */
object Multimodal {

  /** A binary media payload with its metadata. */
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded media features (what a real codec would emit). */
  case class DecodedRow(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  /** STUB decode — deterministic fake standing in for
    * `ImageIO.read` / ffmpeg / librosa. Width/height/frames are
    * derived from byte statistics; features are a fixed-length byte
    * histogram. Swap this single function for a real codec binding
    * and nothing else changes. */
  private[operators] def decodeStub(m: MediaRow): DecodedRow = {
    val n = m.content.length
    val sum = m.content.foldLeft(0L)((a, b) => a + (b & 0xff))
    val hist = new Array[Float](16)
    m.content.foreach(b => hist((b & 0xff) / 16) += 1f)
    val norm = if (n > 0) hist.map(_ / n) else hist
    DecodedRow(m.media_id, m.kind, n.toLong,
      width = 16 + (sum % 1024).toInt,
      height = 16 + ((sum / 7) % 1024).toInt,
      n_frames = if (m.kind == "video") 1 + (n % 240) else 1,
      features = norm)
  }

  /** Distributed decode: one task per partition, iterator in /
    * iterator out — constant memory per task regardless of partition
    * row count, the property that matters when `content` is MBs per
    * row. Repartition upstream so (rows × payload) fits an executor. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling for video-kind payloads: emit every `everyN`-th
    * fixed-size byte window as its own row (media_id, frame_no,
    * frame_bytes). A real implementation swaps the slicer for a
    * demuxer; the fan-out shape (explode to one row per frame,
    * repartition by frame for downstream decode) is the real one. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int,
                   frameBytes: Int = 256): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val frames = m.content.grouped(frameBytes).zipWithIndex
      frames.collect { case (f, i) if i % everyN == 0 => (m.media_id, i, f) }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Round-robin media kind for a numeric id — the single definition
    * shared by [[syntheticMedia]] and the q32 binary query (and its
    * oracle's `(['image','audio','video'])[(doc_id % 3) + 1]`). */
  def kindFor(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(id, lit(3)) + 1).cast("int"))

  /** Synthesize a deterministic binary corpus from the documents
    * table (the container ships no real media): utf-8 bytes of the
    * text, with a kind assigned round-robin. Used by tests and the
    * q32 binary-plumbing query. */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("media_id"),
        kindFor(col("doc_id")).as("kind"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow]
  }

  // ------------------------------------------------------------------
  // Real codec path: RIFF/WAVE PCM16 — the one mainstream media
  // container that needs no external library, so the decode step can
  // be REAL bytes-to-samples work (not a stub) while keeping the
  // distributed shape identical to decodeStub's. A corpus of WAV
  // blobs flows through the same mapPartitions batch iteration; only
  // the inner function differs.
  // ------------------------------------------------------------------

  /** Decoded PCM16 audio: header metadata + extracted features. */
  case class WavRow(
      media_id: Long,
      sample_rate: Long,
      n_samples: Long,
      peak: Long,
      n_zero_cross: Long,
      energy: Long)

  /** Encode mono PCM16 samples as a standards-conformant RIFF/WAVE
    * blob (44-byte canonical header + little-endian samples). */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                 // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16)                // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a RIFF/WAVE PCM16 mono blob by walking its chunk list (a
    * real parser: finds `fmt `/`data` wherever they sit, skips
    * unknown chunks, validates magic and format) and extract features
    * in the same pass: peak |amplitude|, strict zero crossings
    * (s·s' < 0), and total energy Σs² — all integer-exact, so the
    * result is engine- and layout-independent. */
  def decodeWavPcm16(mediaId: Long, bytes: Array[Byte]): WavRow = {
    val (sampleRate, samples) = parseWavPcm16(bytes)
    var peak = 0L; var zc = 0L; var energy = 0L
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toLong
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i > 0 && v * samples(i - 1).toLong < 0) zc += 1
      energy += v * v
      i += 1
    }
    WavRow(mediaId, sampleRate, samples.length.toLong, peak, zc, energy)
  }

  /** Chunk-walking RIFF/WAVE parser shared by the whole-clip and
    * per-frame decoders: returns (sampleRate, PCM16 samples). */
  private[operators] def parseWavPcm16(
      bytes: Array[Byte]): (Long, Array[Short]) = {
    import java.nio.{ByteBuffer, ByteOrder}
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(tag4() == "RIFF", "not a RIFF container")
    bb.getInt() // riff size
    require(tag4() == "WAVE", "not a WAVE form")
    var sampleRate = -1L
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val tag = tag4()
      val len = bb.getInt()
      tag match {
        case "fmt " =>
          val fmt = bb.getShort(); val ch = bb.getShort()
          sampleRate = bb.getInt().toLong
          bb.getInt(); bb.getShort()
          val bits = bb.getShort()
          require(fmt == 1 && ch == 1 && bits == 16,
            s"unsupported WAV: fmt=$fmt channels=$ch bits=$bits")
          bb.position(bb.position() + (len - 16))
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort(); i += 1 }
        case _ =>
          bb.position(bb.position() + len + (len & 1)) // chunks pad to even
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    (sampleRate, samples)
  }

  /** One row per fixed-length analysis frame: the feature-extraction
    * granularity speech/audio pipelines actually train on (VAD,
    * energy gating, diarization windows), where [[decodeWav]] is the
    * clip-level summary. The final frame may be short; zero crossings
    * count only sample pairs INSIDE the frame, so every frame's
    * features are a pure function of its own samples. Same
    * zero-shuffle mapPartitions batch shape as the codecs. */
  case class WavFrameRow(media_id: Long, frame_idx: Long, n: Long,
      peak: Long, n_zero_cross: Long, energy: Long)

  def wavFrameFeatures(media: Dataset[MediaRow],
                       frameLen: Int): Dataset[WavFrameRow] = {
    import media.sparkSession.implicits._
    require(frameLen >= 2, s"frameLen=$frameLen must be >= 2")
    media.mapPartitions(_.flatMap { m =>
      val (_, samples) = parseWavPcm16(m.content)
      samples.indices.grouped(frameLen).zipWithIndex.map { case (idx, f) =>
        var peak = 0L; var zc = 0L; var en = 0L
        idx.foreach { i =>
          val v = samples(i).toLong
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > idx.head && v * samples(i - 1).toLong < 0) zc += 1
          en += v * v
        }
        WavFrameRow(m.media_id, f.toLong, idx.size.toLong, peak, zc, en)
      }
    })
  }

  /** Distributed WAV decode: same batch shape as [[decode]], real
    * codec inside. */
  def decodeWav(media: Dataset[MediaRow]): Dataset[WavRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => decodeWavPcm16(m.media_id, m.content)))
  }

  /** Deterministic synthetic PCM corpus: one WAV blob per document,
    * n = 160 + (id mod 23)·8 samples of the closed-form waveform
    * s_i = ((id·31 + i·37) mod 2003) − 1001 at 8 kHz. The closed form
    * is the point: an oracle can recompute every decoded feature
    * analytically without parsing a byte, so the REAL decoder is
    * gate-checked end to end. */
  def syntheticWav(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("id")).as[Long].map { id =>
      val n = 160 + (id % 23).toInt * 8
      val samples = Array.tabulate(n)(i =>
        (((id * 31 + i.toLong * 37) % 2003) - 1001).toShort)
      MediaRow(id, "audio", encodeWavPcm16(samples, 8000))
    }
  }

  // ------------------------------------------------------------------
  // Real codec path #2: BMP (Windows bitmap, 24 bpp uncompressed) —
  // the mainstream IMAGE container that needs no external library.
  // Same discipline as the WAV pair: standards-conformant encoder
  // (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows padded
  // to 4 bytes), validating parser, integer-exact features, and a
  // closed-form synthetic corpus the oracle recomputes analytically.
  // ------------------------------------------------------------------

  /** Decoded 24bpp image: header metadata + integer-exact channel
    * features. `lum_max` is a per-PIXEL max (not derivable from the
    * channel sums), so it proves the decoder walked every pixel. */
  case class BmpRow(
      media_id: Long,
      width: Int,
      height: Int,
      r_sum: Long,
      g_sum: Long,
      b_sum: Long,
      lum_max: Long)

  /** Encode a 24bpp bottom-up BMP: 14-byte file header, 40-byte info
    * header, rows padded to 4-byte boundaries, pixels stored BGR. */
  def encodeBmp24(width: Int, height: Int,
                  px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataLen = (rowBytes + pad) * height
    val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataLen).putInt(0).putInt(54)       // size, rsvd, offset
    bb.putInt(40).putInt(width).putInt(height)         // BITMAPINFOHEADER
      .putShort(1).putShort(24)                        // planes, bpp
      .putInt(0).putInt(dataLen)                       // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0)   // 72 dpi, palette
    var y = height - 1
    while (y >= 0) {                                   // bottom-up rows
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        bb.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = 0
      while (p < pad) { bb.put(0.toByte); p += 1 }
      y -= 1
    }
    bb.array()
  }

  /** Parse a 24bpp uncompressed BMP (validates magic, header size,
    * planes, bpp, compression; honors the header's data offset and
    * the 4-byte row stride) and extract features in one pass: per-
    * channel sums and the max per-pixel integer luma
    * (2126·R + 7152·G + 722·B — Rec. 709 weights ×10⁴, kept
    * integer so the result is engine- and layout-independent). */
  def decodeBmp24(mediaId: Long, bytes: Array[Byte]): BmpRow = {
    import java.nio.{ByteBuffer, ByteOrder}
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP")
    bb.getInt(); bb.getInt()
    val dataOff = bb.getInt()
    require(bb.getInt() >= 40, "not a BITMAPINFOHEADER")
    val width = bb.getInt(); val height = bb.getInt()
    require(bb.getShort() == 1, "bad plane count")
    val bpp = bb.getShort()
    require(bpp == 24, s"unsupported bpp=$bpp")
    require(bb.getInt() == 0, "compressed BMP unsupported")
    val stride = (width * 3 + 3) / 4 * 4
    var rs = 0L; var gs = 0L; var bs = 0L; var lmax = 0L
    var row = 0
    while (row < height) {
      val base = dataOff + row * stride
      var x = 0
      while (x < width) {
        val b = bytes(base + 3 * x) & 0xff
        val g = bytes(base + 3 * x + 1) & 0xff
        val r = bytes(base + 3 * x + 2) & 0xff
        rs += r; gs += g; bs += b
        val lum = 2126L * r + 7152L * g + 722L * b
        if (lum > lmax) lmax = lum
        x += 1
      }
      row += 1
    }
    BmpRow(mediaId, width, height, rs, gs, bs, lmax)
  }

  /** Distributed BMP decode: same batch shape as [[decode]] /
    * [[decodeWav]], real codec inside. */
  def decodeBmp(media: Dataset[MediaRow]): Dataset[BmpRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => decodeBmp24(m.media_id, m.content)))
  }

  /** Parse a 24bpp BMP into (width, height, logical pixel accessor) —
    * same validation as [[decodeBmp24]]; the accessor uses the same
    * top-down (x, y) convention as [[encodeBmp24]]'s callback (file
    * rows are stored bottom-up; logical y = height − 1 − fileRow), so
    * encode(readBmp24(bytes)) round-trips orientation exactly. */
  private[operators] def readBmp24(bytes: Array[Byte])
      : (Int, Int, (Int, Int) => (Int, Int, Int)) = {
    import java.nio.{ByteBuffer, ByteOrder}
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP")
    bb.getInt(); bb.getInt()
    val dataOff = bb.getInt()
    require(bb.getInt() >= 40, "not a BITMAPINFOHEADER")
    val width = bb.getInt(); val height = bb.getInt()
    require(bb.getShort() == 1, "bad plane count")
    require(bb.getShort() == 24, "unsupported bpp")
    require(bb.getInt() == 0, "compressed BMP unsupported")
    val stride = (width * 3 + 3) / 4 * 4
    val px = (x: Int, y: Int) => {
      val base = dataOff + (height - 1 - y) * stride + 3 * x
      ((bytes(base + 2) & 0xff, bytes(base + 1) & 0xff,
        bytes(base) & 0xff))
    }
    (width, height, px)
  }

  /** Sparse per-image luma histogram: pixels binned by integer
    * Rec. 709 luma (2126·R + 7152·G + 722·B, ×10⁴ — the [[BmpRow]]
    * weighting) into `nBins` equal-width bins via pure integer
    * arithmetic (lum·nBins div 2 550 001 — the divisor is one past
    * the all-white maximum 2 550 000, so the brightest pixel lands
    * INSIDE the last bin instead of indexing one past it). Only
    * occupied bins emit, so the output is exposure-profile-sized,
    * not resolution-sized. Zero-shuffle mapPartitions, like every
    * codec batch here. */
  case class LumaBinRow(media_id: Long, bin: Long, n_px: Long)

  def bmpLumaHistogram(media: Dataset[MediaRow],
                       nBins: Int = 8): Dataset[LumaBinRow] = {
    import media.sparkSession.implicits._
    require(nBins >= 1, s"nBins=$nBins must be >= 1")
    media.mapPartitions(_.flatMap { m =>
      val (w, h, px) = readBmp24(m.content)
      val counts = new Array[Long](nBins)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = px(x, y)
          val lum = 2126L * r + 7152L * g + 722L * b
          counts(((lum * nBins) / 2550001L).toInt) += 1
          x += 1
        }
        y += 1
      }
      counts.indices.withFilter(counts(_) > 0)
        .map(b => LumaBinRow(m.media_id, b.toLong, counts(b)))
    })
  }

  /** Perceptual difference-hash (dHash) of a 24bpp BMP — the
    * codec-grounded image-dedup primitive: sample a (gw+1)×gh
    * nearest-neighbor grid of integer Rec. 709 lumas (the [[BmpRow]]
    * weighting — exact integers, so the fingerprint is byte- and
    * engine-reproducible), set bit y·gw+x when the right neighbor is
    * strictly brighter, pack the gw·gh bits as TWO unsigned-32 longs
    * (hash_hi = bits 32…63, hash_lo = bits 0…31 — a single signed
    * long can't carry bit 63 across engines). dHash is invariant to
    * uniform brightness shifts (differences are unchanged wherever
    * no channel wraps), which is exactly the near-duplicate class a
    * resize/re-export pipeline produces. */
  case class DhashRow(media_id: Long, hash_hi: Long, hash_lo: Long)

  /** Codec-independent dHash core over a decoded pixel accessor —
    * the shared luma/grid/bit-packing path under [[dhashBmp24]] and
    * the PNG branch of [[dhashImage]]: identical pixels produce an
    * identical fingerprint regardless of the container format, which
    * is exactly the cross-codec re-encode dedup property q524 gates.
    */
  private def dhashCore(mediaId: Long, w: Int, h: Int,
                        px: (Int, Int) => (Int, Int, Int),
                        gw: Int, gh: Int): DhashRow = {
    require(gw * gh == 64, s"grid $gw x $gh must pack to 64 bits")
    def luma(sx: Int, sy: Int): Long = {
      val (r, g, b) = px(sx, sy)
      2126L * r + 7152L * g + 722L * b
    }
    var hi = 0L; var lo = 0L
    var y = 0
    while (y < gh) {
      val sy = y * h / gh
      var x = 0
      while (x < gw) {
        // (gw+1) sample columns — bit x compares columns x and x+1
        val sxa = x * w / (gw + 1)
        val sxb = (x + 1) * w / (gw + 1)
        if (luma(sxb, sy) > luma(sxa, sy)) {
          val k = y * gw + x
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
        x += 1
      }
      y += 1
    }
    DhashRow(mediaId, hi, lo)
  }

  def dhashBmp24(mediaId: Long, bytes: Array[Byte],
                 gw: Int = 8, gh: Int = 8): DhashRow = {
    val (w, h, px) = readBmp24(bytes)
    dhashCore(mediaId, w, h, px, gw, gh)
  }

  /** True when the byte stream carries a GIF signature. */
  def looksLikeGif(bytes: Array[Byte]): Boolean =
    bytes.length > 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** Decoder-dispatching dHash: PNG or GIF by signature, 24bpp BMP
    * otherwise — all through [[dhashCore]], so a re-encode of the
    * same pixels through ANY of the three codecs lands on the SAME
    * fingerprint (and a brightness-shifted re-encode within the same
    * Hamming band). */
  def dhashImage(mediaId: Long, bytes: Array[Byte],
                 gw: Int = 8, gh: Int = 8): DhashRow =
    if (looksLikePng(bytes)) {
      val (w, h, px) = readPng(bytes)
      dhashCore(mediaId, w, h, px, gw, gh)
    } else if (looksLikeGif(bytes)) {
      val (w, h, px) = readGif(bytes)
      dhashCore(mediaId, w, h, px, gw, gh)
    } else dhashBmp24(mediaId, bytes, gw, gh)

  /** Distributed dHash: zero-shuffle mapPartitions batch, like every
    * codec here. Dispatches per row on the container signature, so a
    * mixed BMP/PNG corpus hashes in one pass. */
  def dhash(media: Dataset[MediaRow], gw: Int = 8,
            gh: Int = 8): Dataset[DhashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => dhashImage(m.media_id, m.content,
      gw, gh)))
  }

  /** BMP-only entry retained for callers that want the strict 24bpp
    * contract (a PNG byte stream here is a loud decode error). */
  def dhashBmp(media: Dataset[MediaRow], gw: Int = 8,
               gh: Int = 8): Dataset[DhashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => dhashBmp24(m.media_id, m.content,
      gw, gh)))
  }

  /** Image near-dup pairs by banded dHash: the 64 fingerprint bits
    * split into four 16-bit Hamming buckets (two per packed half);
    * images sharing ANY band are candidates (by pigeonhole, any pair
    * within Hamming ≤ 3·bands/4 shares a band — recall 1.0 for
    * maxHamming ≤ 3 here, high above), verified by exact popcount.
    * Candidate generation is a bucket equi-join — never all-pairs —
    * the [[graft.operators.Dedup.simhashPairs]] discipline on the
    * codec-grounded fingerprint. Returns (id_a, id_b, hamming). */
  def dhashPairs(media: Dataset[MediaRow], maxHamming: Int): DataFrame = {
    val sigs = dhash(media).toDF()
    val banded = sigs.select(col("media_id").as("id"), col("hash_hi"),
        col("hash_lo"),
        explode(lit((0 until 4).toArray)).as("band"))
      .withColumn("bucket", expr(
        "CASE WHEN band < 2 THEN shiftright(hash_lo, band * 16) " +
          "ELSE shiftright(hash_hi, (band - 2) * 16) END & 65535"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        expr("CAST(bit_count(x.hash_hi ^ y.hash_hi) AS BIGINT) + " +
          "CAST(bit_count(x.hash_lo ^ y.hash_lo) AS BIGINT)")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Brightness-shifted twin corpus for the dHash near-dup gate:
    * every `every`-th document contributes, alongside its base
    * gradient BMP, a copy (media_id = base + copyOffset, SAME
    * dimensions) with all channels shifted +`delta` mod 256 — the
    * "re-exported with different exposure" near-duplicate. Away from
    * mod-256 wrap positions the shift preserves every luma
    * difference, so copies land within a small Hamming distance of
    * their base — the property the fingerprint exists to catch. */
  def syntheticBmpWithCopies(docs: DataFrame, every: Int, delta: Int,
                             copyOffset: Long): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("id")).as[Long].flatMap { id =>
      val w = 8 + (id % 9).toInt
      val h = 8 + ((id / 9) % 7).toInt
      def chan(a: Long, bx: Long, by: Long)(x: Int, y: Int): Int =
        ((id * a + bx * x + by * y) % 256).toInt
      val base = MediaRow(id, "image", encodeBmp24(w, h, (x, y) => (
        chan(7, 3, 5)(x, y), chan(11, 13, 17)(x, y),
        chan(19, 23, 29)(x, y))))
      if (id % every == 0)
        Seq(base, MediaRow(id + copyOffset, "image",
          encodeBmp24(w, h, (x, y) => (
            (chan(7, 3, 5)(x, y) + delta) % 256,
            (chan(11, 13, 17)(x, y) + delta) % 256,
            (chan(19, 23, 29)(x, y) + delta) % 256))))
      else Seq(base)
    }
  }

  /** Mixed-format twin corpus for the cross-codec dedup gate: every
    * document contributes its gradient BMP (the [[syntheticBmpWithCopies]]
    * channel constants), and every `every`-th document ALSO a PNG
    * RE-ENCODE of the same gradient brightness-shifted +`delta` mod
    * 256 (media_id = base + copyOffset) — the "re-exported through a
    * different codec with different exposure" near-duplicate. The
    * dHash pipeline must dispatch per container and land each PNG
    * twin in the same Hamming band as its BMP base. */
  def syntheticMixedWithPngCopies(docs: DataFrame, every: Int, delta: Int,
                                  copyOffset: Long): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("id")).as[Long].flatMap { id =>
      val w = 8 + (id % 9).toInt
      val h = 8 + ((id / 9) % 7).toInt
      def chan(a: Long, bx: Long, by: Long)(x: Int, y: Int): Int =
        ((id * a + bx * x + by * y) % 256).toInt
      val base = MediaRow(id, "image", encodeBmp24(w, h, (x, y) => (
        chan(7, 3, 5)(x, y), chan(11, 13, 17)(x, y),
        chan(19, 23, 29)(x, y))))
      if (id % every == 0)
        Seq(base, MediaRow(id + copyOffset, "image",
          encodePng(w, h, (x, y) => (
            (chan(7, 3, 5)(x, y) + delta) % 256,
            (chan(11, 13, 17)(x, y) + delta) % 256,
            (chan(19, 23, 29)(x, y) + delta) % 256))))
      else Seq(base)
    }
  }

  /** Nearest-neighbor downsample by an integer factor: output pixel
    * (x, y) samples source (x·f, y·f); output dims are ⌈w/f⌉×⌈h/f⌉.
    * Decode → transform → re-encode per row inside one mapPartitions
    * batch — the image-transform leg of the multimodal pipeline
    * (thumbnailing before feature extraction), with the same
    * zero-shuffle batch shape as the codecs. */
  def resizeBmp(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(factor >= 1, "factor must be >= 1")
    media.mapPartitions(_.map { m =>
      val (w, h, px) = readBmp24(m.content)
      val nw = (w + factor - 1) / factor
      val nh = (h + factor - 1) / factor
      MediaRow(m.media_id, m.kind,
        encodeBmp24(nw, nh, (x, y) => px(x * factor, y * factor)))
    })
  }

  /** Deterministic synthetic image corpus: one w×h gradient BMP per
    * document (w = 8 + id mod 9 — exercising every row-padding
    * class — h = 8 + (id div 9) mod 7), channel values linear in
    * (x, y) mod 256. The oracle recomputes every feature from the
    * same closed form without parsing a byte. */
  def syntheticBmp(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("id")).as[Long].map { id =>
      val w = 8 + (id % 9).toInt
      val h = 8 + ((id / 9) % 7).toInt
      MediaRow(id, "image", encodeBmp24(w, h, (x, y) => (
        ((id * 7 + 3L * x + 5L * y) % 256).toInt,
        ((id * 11 + 13L * x + 17L * y) % 256).toInt,
        ((id * 19 + 23L * x + 29L * y) % 256).toInt)))
    }
  }

  // =====================================================================
  // PNG codec (round 11): the one media format addable with zero
  // external libraries — zlib lives in java.util.zip. The encoder
  // CYCLES the scanline filter type (y % 5 → None/Sub/Up/Average/
  // Paeth), so a decoder that mishandles ANY of the five filters, the
  // Paeth predictor's tie-breaking, byte-order, or chunk CRCs cannot
  // round-trip the closed-form gradient the q517 oracle recomputes.
  // =====================================================================

  /** Decoded 8-bit RGB PNG features — same shape as [[BmpRow]]. */
  case class PngRow(
      media_id: Long,
      width: Int,
      height: Int,
      r_sum: Long,
      g_sum: Long,
      b_sum: Long,
      lum_max: Long)

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32()
    parts.foreach(c.update)
    c.getValue.toInt
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val t = tpe.getBytes("US-ASCII")
    be32(data.length) ++ t ++ data ++ be32(crc32(t, data))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode an 8-bit RGB (color type 2) PNG. Scanline y uses filter
    * type y % 5 — deliberately exercising every filter. */
  def encodePng(width: Int, height: Int,
                px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        cur(x * 3) = r & 0xff; cur(x * 3 + 1) = g & 0xff
        cur(x * 3 + 2) = b & 0xff
        x += 1
      }
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val a = if (i >= bpp) cur(i - bpp) else 0
        val b = if (y > 0) prev(i) else 0
        val c = if (y > 0 && i >= bpp) prev(i - bpp) else 0
        val f = ft match {
          case 0 => cur(i)
          case 1 => cur(i) - a
          case 2 => cur(i) - b
          case 3 => cur(i) - (a + b) / 2
          case 4 => cur(i) - paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, RGB, deflate, adaptive, no interlace
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** True when the byte stream carries the PNG signature. */
  def looksLikePng(bytes: Array[Byte]): Boolean =
    bytes.length > 8 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'

  /** Parse an 8-bit RGB PNG (validates the signature, every chunk's
    * CRC, the IHDR contract — depth 8 / color type 2 / deflate /
    * no interlace — inflates the IDAT stream, and UNFILTERS all five
    * scanline filter types incl. the Paeth predictor) into a
    * (width, height, pixel-accessor) triple — the [[readBmp24]]
    * shape, so every per-pixel feature (decode stats, dHash, luma
    * histogram) composes over either codec through one interface. */
  def readPng(bytes: Array[Byte])
      : (Int, Int, (Int, Int) => (Int, Int, Int)) = {
    require(looksLikePng(bytes), "not a PNG")
    var pos = 8
    var width = 0; var height = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      def b32(o: Int): Int =
        ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
          ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      val len = b32(pos)
      val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = b32(pos + 8 + len)
      val c = new java.util.zip.CRC32()
      c.update(bytes, pos + 4, 4 + len)
      require(c.getValue.toInt == crc, s"bad CRC on $tpe chunk")
      tpe match {
        case "IHDR" =>
          width = b32(pos + 8); height = b32(pos + 12)
          require(bytes(pos + 16) == 8, "unsupported bit depth")
          require(bytes(pos + 17) == 2, "unsupported color type")
          require(bytes(pos + 18) == 0 && bytes(pos + 19) == 0 &&
            bytes(pos + 20) == 0, "unsupported compression/interlace")
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _ => // ancillary chunk: CRC-checked, content skipped
      }
      pos += 12 + len
    }
    require(done && width > 0 && height > 0, "truncated PNG")
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    var off = 0
    var made = 1
    // inflate() returning 0 before finished() means premature end of
    // stream or a preset-dictionary request — fail loudly via the
    // short-stream require below instead of spinning forever.
    while (!inf.finished() && off < raw.length && made > 0) {
      made = inf.inflate(raw, off, raw.length - off)
      off += made
    }
    inf.end()
    require(off == raw.length, "short IDAT stream")
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    val pix = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      var i = 0
      while (i < stride) {
        val f = raw(y * (stride + 1) + 1 + i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) else 0
        val b = if (y > 0) prev(i) else 0
        val c = if (y > 0 && i >= bpp) prev(i - bpp) else 0
        cur(i) = (ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + (a + b) / 2
          case 4 => f + paeth(a, b, c)
          case _ => throw new IllegalStateException(s"bad filter $ft")
        }) & 0xff
        pix(y * stride + i) = cur(i).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    (width, height, (x: Int, y: Int) => {
      val o = y * stride + x * 3
      ((pix(o) & 0xff, pix(o + 1) & 0xff, pix(o + 2) & 0xff))
    })
  }

  /** One-pass PNG feature extraction over the [[readPng]] accessor —
    * the same features as [[decodeBmp24]]. */
  def decodePng(mediaId: Long, bytes: Array[Byte]): PngRow = {
    val (width, height, px) = readPng(bytes)
    var rs = 0L; var gs = 0L; var bs = 0L; var lmax = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        rs += r; gs += g; bs += b
        val lum = 2126L * r + 7152L * g + 722L * b
        if (lum > lmax) lmax = lum
        x += 1
      }
      y += 1
    }
    PngRow(mediaId, width, height, rs, gs, bs, lmax)
  }

  // =====================================================================
  // GIF codec (round 12): the third real image container, written
  // against the public GIF89a specification with zero external
  // libraries — the compression here is LZW (variable-width codes
  // growing 9→12 bits, dictionary to 4096 entries, clear-code resets,
  // the KwKwK just-defined-code case), not zlib, so this codec
  // exercises a genuinely different decode path than PNG. The encoder
  // is a REAL LZW compressor (its dictionary fills, its code width
  // bumps, and it emits mid-stream clear resets on large images), so
  // a decoder that mishandles any of those cannot round-trip the
  // closed-form gradient the q525 oracle recomputes byte-free.
  // =====================================================================

  /** Decoded GIF features — the [[PngRow]] shape on the third codec. */
  case class GifRow(
      media_id: Long,
      width: Int,
      height: Int,
      r_sum: Long,
      g_sum: Long,
      b_sum: Long,
      lum_max: Long)

  /** GIF-variant LZW compress of a byte stream of `minCode`-bit
    * symbols: initial width minCode+1, clear = 2^minCode, EOI =
    * clear+1, width bumps when the next free code reaches 2^width
    * (cap 12), clear-and-reset when the table fills. LSB-first bit
    * packing per the spec. */
  private def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    var width = minCode + 1
    var next = eoi + 1
    val dict = new java.util.HashMap[Integer, Integer]()
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0
    var bitCnt = 0
    def emit(code: Int): Unit = {
      bitBuf |= code << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(bitBuf & 0xff); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    emit(clear)
    var cur = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val key = Integer.valueOf((cur << 8) | k)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        // width bump BEFORE the add (the compress.c order): the
        // decoder's table add lags ours by exactly one code, so its
        // bump fires one code later than an after-add check here
        // would — checking the PRE-add counter keeps both sides
        // reading/writing the boundary code at the same width.
        if (next == (1 << width) && width < 12) width += 1
        if (next < 4096) {
          dict.put(key, Integer.valueOf(next))
          next += 1
        } else {
          // table full: reset so the decoder's table mirrors ours
          emit(clear)
          dict.clear(); width = minCode + 1; next = eoi + 1
        }
        cur = k
      }
      i += 1
    }
    emit(cur)
    emit(eoi)
    if (bitCnt > 0) out.write(bitBuf & 0xff)
    out.toByteArray
  }

  /** GIF-variant LZW decompress: the exact inverse contract of
    * [[lzwEncode]] including the KwKwK case (a code equal to the
    * next free slot expands to prev-chain + its own first byte).
    * Validates stream shape loudly — a literal out of palette range,
    * a dangling code past the table, or a short stream all throw. */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        expected: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    var width = minCode + 1
    var next = eoi + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new java.io.ByteArrayOutputStream(expected)
    var bitPos = 0
    def read(): Int = {
      require(bitPos + width <= data.length * 8, "short LZW stream")
      var v = 0
      var got = 0
      while (got < width) {
        val byte = data(bitPos >> 3) & 0xff
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, width - got)
        v |= (((byte >> (bitPos & 7)) & ((1 << take) - 1)) << got)
        got += take
        bitPos += take
      }
      v
    }
    // expand a table chain into out, returning its first byte
    val stack = new Array[Byte](4096)
    def expand(code0: Int): Int = {
      var sp = 0
      var c = code0
      while (c >= clear + 2) {
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      require(c < clear, s"corrupt LZW chain root $c")
      stack(sp) = c.toByte; sp += 1
      var first = -1
      while (sp > 0) {
        sp -= 1
        if (first < 0) first = stack(sp) & 0xff
        out.write(stack(sp) & 0xff)
      }
      first
    }
    var prev = -1
    var done = false
    while (!done && out.size < expected) {
      val code = read()
      if (code == clear) {
        width = minCode + 1; next = eoi + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        require(code < clear, s"first code after clear must be a " +
          s"literal, got $code")
        out.write(code)
        prev = code
      } else {
        require(code <= next, s"code $code past table end $next")
        val first =
          if (code == next) {
            // KwKwK: prev-chain + its own first byte
            var c = prev
            while (c >= clear + 2) c = prefix(c)
            expand(prev) // writes prev-chain
            out.write(c)
            c
          } else expand(code)
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first.toByte
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(out.size == expected,
      s"GIF pixel count ${out.size} != expected $expected")
    out.toByteArray
  }

  /** Encode a GIF89a with a 256-entry global color table and one
    * full-frame image, LZW-compressed by the real compressor. */
  def encodeGif(width: Int, height: Int, pxIdx: (Int, Int) => Int,
                palette: Int => (Int, Int, Int)): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    w8(0xf7) // GCT present, 8-bit color resolution, 256-entry table
    w8(0); w8(0) // background index, aspect
    var i = 0
    while (i < 256) {
      val (r, g, b) = palette(i); w8(r); w8(g); w8(b); i += 1
    }
    w8(0x2c) // image descriptor
    w16(0); w16(0); w16(width); w16(height)
    w8(0) // no local color table, not interlaced
    val indices = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        indices(y * width + x) = (pxIdx(x, y) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    w8(8) // LZW minimum code size
    val data = lzwEncode(indices, 8)
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      w8(n); out.write(data, off, n); off += n
    }
    w8(0) // block terminator
    w8(0x3b) // trailer
    out.toByteArray
  }

  /** Parse a GIF (87a or 89a) via [[readGif]] and extract the
    * [[decodeBmp24]] feature set through the palette, cross-checking
    * the frame dimensions against the logical screen. */
  def decodeGif(mediaId: Long, bytes: Array[Byte]): GifRow = {
    val (w, h, px) = readGif(bytes)
    val sw = (bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8)
    val sh = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    require(w == sw && h == sh, "frame/screen dimension mismatch")
    var rs = 0L; var gs = 0L; var bs = 0L; var lmax = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        rs += r; gs += g; bs += b
        val lum = 2126L * r + 7152L * g + 722L * b
        if (lum > lmax) lmax = lum
        x += 1
      }
      y += 1
    }
    GifRow(mediaId, w, h, rs, gs, bs, lmax)
  }

  /** GIF as a (width, height, pixel-accessor) triple — the
    * [[readBmp24]]/[[readPng]] shape, so dHash and any per-pixel
    * feature compose over the third codec too. Decodes the LZW
    * stream once into an index buffer; the accessor maps indices
    * through the color table on read. */
  def readGif(bytes: Array[Byte])
      : (Int, Int, (Int, Int) => (Int, Int, Int)) = {
    require(bytes.length > 13 &&
      (bytes.startsWith("GIF89a".getBytes("US-ASCII")) ||
        bytes.startsWith("GIF87a".getBytes("US-ASCII"))), "not a GIF")
    var pos = 6
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = u8(); v | (u8() << 8) }
    u16(); u16() // screen dims validated by decodeGif
    val flags = u8()
    u8(); u8()
    val gct: Array[Byte] =
      if ((flags & 0x80) != 0) {
        val n = 2 << (flags & 7)
        val t = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
        pos += 3 * n
        t
      } else Array.emptyByteArray
    var out: (Int, Int, (Int, Int) => (Int, Int, Int)) = null
    var done = false
    while (!done) {
      require(pos < bytes.length, "truncated GIF")
      u8() match {
        case 0x3b => done = true
        case 0x21 =>
          u8()
          var n = u8()
          while (n != 0) { pos += n; n = u8() }
        case 0x2c =>
          require(out == null, "multi-frame GIF unsupported")
          u16(); u16()
          val iw = u16(); val ih = u16()
          val f = u8()
          require((f & 0x40) == 0, "interlaced GIF unsupported")
          val table =
            if ((f & 0x80) != 0) {
              val n = 2 << (f & 7)
              val t = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
              pos += 3 * n
              t
            } else gct
          require(table.nonEmpty, "no color table")
          val minCode = u8()
          val data = new java.io.ByteArrayOutputStream()
          var n = u8()
          while (n != 0) {
            require(pos + n <= bytes.length, "truncated GIF sub-block")
            data.write(bytes, pos, n); pos += n; n = u8()
          }
          val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
          out = (iw, ih, (x: Int, y: Int) => {
            val k = (idx(y * iw + x) & 0xff) * 3
            require(k + 2 < table.length, "palette index out of range")
            (table(k) & 0xff, table(k + 1) & 0xff, table(k + 2) & 0xff)
          })
        case other =>
          throw new IllegalArgumentException(
            s"unknown GIF block 0x${other.toHexString}")
      }
    }
    require(out != null, "GIF carries no image")
    out
  }

  /** Synthetic closed-form gradient GIF per document: palette entry
    * i = ((3i+5)%256, (7i+1)%256, (11i+2)%256), pixel index (x,y) =
    * (id·23 + 5x + 3y) % 256 — constants disjoint from the BMP/PNG
    * gates so the three codecs can never mask each other. */
  def syntheticGif(docs: org.apache.spark.sql.DataFrame)
      : Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = (8 + id % 9).toInt
      val h = (8 + (id / 9) % 7).toInt
      MediaRow(id, "image", encodeGif(w, h,
        (x, y) => ((id * 23 + 5L * x + 3L * y) % 256).toInt,
        i => ((3 * i + 5) % 256, (7 * i + 1) % 256, (11 * i + 2) % 256)))
    }
  }

  /** Distributed GIF decode: same batch shape as [[decodeBmp]]. */
  def decodeGifBatch(media: Dataset[MediaRow]): Dataset[GifRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => decodeGif(m.media_id, m.content)))
  }

  /** Synthetic closed-form gradient PNG per document (the q132 BMP
    * discipline on the PNG codec — different mixing constants so the
    * two image gates can never mask each other). */
  def syntheticPng(docs: org.apache.spark.sql.DataFrame)
      : Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = (8 + id % 9).toInt
      val h = (8 + (id / 9) % 7).toInt
      MediaRow(id, "image", encodePng(w, h, (x, y) => (
        ((id * 13 + 7L * x + 11L * y) % 256).toInt,
        ((id * 17 + 19L * x + 23L * y) % 256).toInt,
        ((id * 29 + 31L * x + 37L * y) % 256).toInt)))
    }
  }

  /** Distributed PNG decode: same batch shape as [[decodeBmp]]. */
  def decodePngBatch(media: Dataset[MediaRow]): Dataset[PngRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => decodePng(m.media_id, m.content)))
  }
}
