package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal plumbing: distributed decode (stubbed codec), frame
  * sampling fan-out, deterministic synthesis from documents. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import TestSpark.sf001

  test("synthetic media: one row per doc, kinds round-robin") {
    val docs = Tables.load(spark, sf001, "documents")
    val media = Multimodal.syntheticMedia(docs)
    assert(media.count() == docs.count())
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decode emits metadata + fixed-length features, deterministically") {
    val docs = Tables.load(spark, sf001, "documents").limit(50)
    val media = Multimodal.syntheticMedia(docs)
    val d1 = Multimodal.decode(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(d1.length == 50)
    assert(d1.forall(_.features.length == 16))
    assert(d1.forall(r => r.n_bytes > 0 && r.width >= 16 && r.height >= 16))
    // determinism: same inputs, same features, across runs
    assert(d1.zip(d2).forall { case (a, b) =>
      a.media_id == b.media_id && a.features.sameElements(b.features) })
    // features are a normalized histogram
    assert(d1.forall(r => math.abs(r.features.sum - 1.0f) < 1e-3))
  }

  test("frame sampling emits every Nth fixed-size window") {
    val docs = Tables.load(spark, sf001, "documents").limit(5)
    val media = Multimodal.syntheticMedia(docs)
    val frames = Multimodal.sampleFrames(media, everyN = 2, frameBytes = 64)
    val perDoc = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bytes = media.collect().map(m => m.media_id -> m.content.length).toMap
    perDoc.foreach { case (id, n) =>
      val total = (bytes(id) + 63) / 64
      assert(n == (total + 1) / 2, s"doc $id: $n frames for $total windows")
    }
    // frame payloads are the right size except the tail
    assert(frames.filter(col("frame_no") === 0)
      .selectExpr("length(frame_bytes)").collect()
      .forall(_.getInt(0) == 64))
  }

  test("WAV codec: encode→decode round-trips header and every sample") {
    val samples = Array.tabulate(333)(i =>
      ((i * 977) % 65536 - 32768).toShort)
    val bytes = Multimodal.encodeWavPcm16(samples, 44100)
    assert(bytes.length == 44 + 666)
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val row = Multimodal.decodeWavPcm16(7L, bytes)
    assert(row.sample_rate == 44100L && row.n_samples == 333L)
    // features recomputed independently from the source samples
    val peak = samples.map(s => math.abs(s.toLong)).max
    val zc = (1 until 333).count(i =>
      samples(i).toLong * samples(i - 1).toLong < 0).toLong
    val energy = samples.map(s => s.toLong * s.toLong).sum
    assert((row.peak, row.n_zero_cross, row.energy) == ((peak, zc, energy)))
  }

  test("WAV parser walks chunks: tolerates an unknown chunk before " +
       "data, rejects a corrupted container") {
    val samples = Array[Short](100, -200, 300, -400)
    val canonical = Multimodal.encodeWavPcm16(samples, 8000)
    // splice an unknown 6-byte 'LIST' chunk (padded to even) between
    // 'fmt ' and 'data': a compliant parser must skip it
    val bb = java.nio.ByteBuffer.allocate(canonical.length + 8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(canonical, 0, 36)                    // through end of fmt
    bb.put("LIST".getBytes("US-ASCII")).putInt(5)
    bb.put(Array[Byte](1, 2, 3, 4, 5, 0))       // 5 bytes + pad
    bb.put(canonical, 36, canonical.length - 36) // data chunk
    val spliced = bb.array()
    val row = Multimodal.decodeWavPcm16(1L, spliced)
    assert(row.n_samples == 4L && row.peak == 400L && row.n_zero_cross == 3L)
    val bad = canonical.clone(); bad(0) = 'X'
    assertThrows[IllegalArgumentException] {
      Multimodal.decodeWavPcm16(2L, bad)
    }
  }

  test("distributed WAV decode matches the closed-form waveform") {
    val docs = Tables.load(spark, sf001, "documents").limit(50)
    val rows = Multimodal.decodeWav(Multimodal.syntheticWav(docs)).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val n = 160 + (r.media_id % 23).toInt * 8
      val s = Array.tabulate(n)(i =>
        ((r.media_id * 31 + i.toLong * 37) % 2003) - 1001)
      assert(r.n_samples == n.toLong)
      assert(r.peak == s.map(math.abs).max)
      assert(r.energy == s.map(v => v * v).sum)
    }
  }

  test("BMP round-trip: a hand-built 2x2 image decodes to its exact " +
       "pixels") {
    // px(x,y): distinct channel values per corner
    val img = Map((0, 0) -> (10, 20, 30), (1, 0) -> (40, 50, 60),
      (0, 1) -> (70, 80, 90), (1, 1) -> (200, 100, 50))
    val bytes = Multimodal.encodeBmp24(2, 2, (x, y) => img((x, y)))
    val r = Multimodal.decodeBmp24(7L, bytes)
    assert((r.width, r.height) == ((2, 2)))
    assert(r.r_sum == 10 + 40 + 70 + 200)
    assert(r.g_sum == 20 + 50 + 80 + 100)
    assert(r.b_sum == 30 + 60 + 90 + 50)
    // per-pixel max luma: corner (1,1) = 2126*200 + 7152*100 + 722*50
    assert(r.lum_max == 2126L * 200 + 7152L * 100 + 722L * 50)
  }

  test("BMP rows pad to 4-byte strides: odd widths decode exactly") {
    // width 3 -> 9 row bytes -> stride 12 (3 pad bytes per row);
    // if the decoder ignored the stride the channel sums would shift
    val bytes = Multimodal.encodeBmp24(3, 2, (x, y) => (x + 1, y + 1, 9))
    assert(bytes.length == 54 + 12 * 2)
    val r = Multimodal.decodeBmp24(1L, bytes)
    assert(r.r_sum == (1 + 2 + 3) * 2)
    assert(r.g_sum == (1 + 2) * 3)
    assert(r.b_sum == 9 * 6)
    val bad = bytes.clone(); bad(0) = 'X'
    assertThrows[IllegalArgumentException] {
      Multimodal.decodeBmp24(2L, bad)
    }
  }

  test("distributed BMP decode matches the closed-form gradient") {
    val docs = Tables.load(spark, sf001, "documents").limit(40)
    val rows = Multimodal.decodeBmp(Multimodal.syntheticBmp(docs)).collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val id = r.media_id
      val (w, h) = (8 + (id % 9).toInt, 8 + ((id / 9) % 7).toInt)
      assert((r.width, r.height) == ((w, h)))
      val px = for (x <- 0 until w; y <- 0 until h) yield (
        (id * 7 + 3L * x + 5L * y) % 256,
        (id * 11 + 13L * x + 17L * y) % 256,
        (id * 19 + 23L * x + 29L * y) % 256)
      assert(r.r_sum == px.map(_._1).sum)
      assert(r.g_sum == px.map(_._2).sum)
      assert(r.b_sum == px.map(_._3).sum)
      assert(r.lum_max ==
        px.map(p => 2126 * p._1 + 7152 * p._2 + 722 * p._3).max)
    }
  }

  test("resizeBmp: factor 1 is a byte-exact round-trip (orientation " +
       "preserved); factor 2 samples exactly the even grid") {
    import spark.implicits._
    // asymmetric gradient so any orientation flip changes the sums
    val src = Multimodal.MediaRow(7L, "image",
      Multimodal.encodeBmp24(5, 4, (x, y) => (x, y * 10, x + y)))
    val same = Multimodal.resizeBmp(Seq(src).toDS(), 1).head()
    assert(same.content.sameElements(src.content))
    val half = Multimodal.decodeBmp(
      Multimodal.resizeBmp(Seq(src).toDS(), 2)).head()
    // sampled coords: x in {0,2,4}, y in {0,2}
    val pts = for (x <- Seq(0, 2, 4); y <- Seq(0, 2)) yield (x, y * 10, x + y)
    assert((half.width, half.height) == ((3, 2)))
    assert(half.r_sum == pts.map(_._1).sum)
    assert(half.g_sum == pts.map(_._2).sum)
    assert(half.b_sum == pts.map(_._3).sum)
  }

  test("wavFrameFeatures: frame boundaries, short final frame, and " +
       "within-frame-only zero crossings") {
    import spark.implicits._
    // 7 samples, frames of 3: [1,-1,2], [-2,3,-3], [4]
    val samples = Array[Short](1, -1, 2, -2, 3, -3, 4)
    val media = Seq(Multimodal.MediaRow(5L, "audio",
      Multimodal.encodeWavPcm16(samples, 8000))).toDS()
    val fr = Multimodal.wavFrameFeatures(media, 3).collect()
      .sortBy(_.frame_idx)
    assert(fr.map(f => (f.frame_idx, f.n, f.peak, f.n_zero_cross,
      f.energy)).toSeq == Seq(
      (0L, 3L, 2L, 2L, 6L),  // 1,-1,2: crossings at both pairs
      (1L, 3L, 3L, 2L, 22L), // -2,3,-3: the 2→-2 boundary pair NOT counted
      (2L, 1L, 4L, 0L, 16L)))
  }

  test("bmpLumaHistogram: bins partition the pixels, black and white " +
       "land in the outer bins") {
    import spark.implicits._
    // 2x2: black, white, mid gray, green-ish
    val colors = Map((0, 0) -> (0, 0, 0), (1, 0) -> (255, 255, 255),
      (0, 1) -> (128, 128, 128), (1, 1) -> (0, 255, 0))
    val media = Seq(Multimodal.MediaRow(9L, "image",
      Multimodal.encodeBmp24(2, 2, (x, y) => colors((x, y))))).toDS()
    val bins = Multimodal.bmpLumaHistogram(media, 8).collect()
      .map(r => r.bin -> r.n_px).toMap
    assert(bins(0L) == 1)                    // black
    assert(bins(7L) == 1)                    // white (max luma, last bin)
    assert(bins(4L) == 1)                    // gray 128 → bin 4
    assert(bins(5L) == 1)                    // pure green: 7152*255 → bin 5
    assert(bins.values.sum == 4)
  }

  test("dHash: invariant under a uniform brightness shift with no " +
       "channel wrap, and changed by a structural edit") {
    import graft.operators.Multimodal
    // channels bounded in [40, 168] — a +20 shift cannot wrap, so
    // every luma DIFFERENCE (hence every dhash bit) is preserved
    def px(x: Int, y: Int): (Int, Int, Int) =
      (40 + (x * 13 + y * 7) % 128, 40 + (x * 5 + y * 31) % 128,
        40 + (x * 23 + y * 3) % 128)
    val base = Multimodal.encodeBmp24(17, 11, px)
    val shifted = Multimodal.encodeBmp24(17, 11, (x, y) => {
      val (r, g, b) = px(x, y); (r + 20, g + 20, b + 20)
    })
    val edited = Multimodal.encodeBmp24(17, 11, (x, y) =>
      if (x < 8) px(x, y)
      else { val (r, g, b) = px(x, y); (255 - r, 255 - g, 255 - b) })
    val hb = Multimodal.dhashBmp24(1L, base)
    val hs = Multimodal.dhashBmp24(2L, shifted)
    val he = Multimodal.dhashBmp24(3L, edited)
    assert(hb.hash_hi == hs.hash_hi && hb.hash_lo == hs.hash_lo)
    val ham = java.lang.Long.bitCount(hb.hash_hi ^ he.hash_hi) +
      java.lang.Long.bitCount(hb.hash_lo ^ he.hash_lo)
    assert(ham > 4, s"structural edit must move the hash, hamming=$ham")
    // both packed halves stay in unsigned-32 range (cross-engine)
    Seq(hb, hs, he).foreach { r =>
      assert(r.hash_hi >= 0L && r.hash_hi < (1L << 32))
      assert(r.hash_lo >= 0L && r.hash_lo < (1L << 32))
    }
  }

  test("dhashPairs: banded bucket join finds every pair within " +
       "Hamming <= 3 (pigeonhole over 4 bands) on a constructed set") {
    import graft.operators.Multimodal
    import TestSpark.spark
    import spark.implicits._
    // img 2 = img 1 with one sample-grid cell nudged (small hamming);
    // img 3 unrelated
    def px1(x: Int, y: Int): (Int, Int, Int) =
      (40 + (x * 13 + y * 7) % 128, 40 + (x * 5 + y * 31) % 128, 60)
    val m = Seq(
      Multimodal.MediaRow(1L, "image", Multimodal.encodeBmp24(9, 8, px1)),
      Multimodal.MediaRow(2L, "image", Multimodal.encodeBmp24(9, 8,
        (x, y) => if (x == 4 && y == 4) (255, 255, 255) else px1(x, y))),
      Multimodal.MediaRow(3L, "image", Multimodal.encodeBmp24(9, 8,
        (x, y) => ((x * 97 + y * 89) % 256, (x * 83 + y * 79) % 256,
          (x * 73 + y * 71) % 256))))
      .toDS()
    val pairs = Multimodal.dhashPairs(m, maxHamming = 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 <= 3L),
      s"the nudged twin must surface: $pairs")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      s"the unrelated image must not pair: $pairs")
  }

  test("PNG codec: encode/decode round-trips the exact pixels through " +
       "zlib across ALL FIVE scanline filters (the encoder cycles " +
       "filter y % 5), and every chunk CRC validates") {
    import graft.operators.Multimodal
    // 11 rows => filters 0..4 each used at least twice
    val w = 7; val h = 11
    def px(x: Int, y: Int): (Int, Int, Int) =
      ((x * 41 + y * 59) % 256, (x * 13 + y * 7 + 128) % 256,
        (255 - x * 29 - y * 3 + 512) % 256)
    val bytes = Multimodal.encodePng(w, h, px)
    val row = Multimodal.decodePng(42L, bytes)
    assert(row.width == w && row.height == h)
    var rs = 0L; var gs = 0L; var bs = 0L; var lm = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      rs += r; gs += g; bs += b
      lm = math.max(lm, 2126L * r + 7152L * g + 722L * b)
    }
    assert(row.r_sum == rs && row.g_sum == gs && row.b_sum == bs)
    assert(row.lum_max == lm)
  }

  test("PNG codec: a flipped IDAT byte fails the CRC check loudly — " +
       "corrupt media must never decode silently") {
    import graft.operators.Multimodal
    val bytes = Multimodal.encodePng(5, 5, (x, y) => (x * 40, y * 40, 7))
    // find the IDAT chunk and flip one payload byte
    var pos = 8
    var idatOff = -1
    while (idatOff < 0) {
      val len = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
      if (tpe == "IDAT") idatOff = pos + 8 else pos += 12 + len
    }
    val bad = bytes.clone()
    bad(idatOff) = (bad(idatOff) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodePng(1L, bad)
    }
    assert(e.getMessage.contains("CRC"))
  }

  test("PNG codec: a truncated IDAT stream fails loudly (short IDAT), " +
       "never hangs the inflate loop") {
    import graft.operators.Multimodal
    val bytes = Multimodal.encodePng(6, 6, (x, y) => (x * 30, y * 30, 99))
    // re-chunk with the IDAT payload cut in half (CRC recomputed so
    // only the STREAM is short, not the container)
    var pos = 8
    var out = bytes.slice(0, 8)
    var done = false
    while (!done) {
      val len = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
      val data = bytes.slice(pos + 8, pos + 8 + len)
      val kept = if (tpe == "IDAT") data.take(data.length / 2) else data
      val t = tpe.getBytes("US-ASCII")
      val c = new java.util.zip.CRC32(); c.update(t); c.update(kept)
      def be(v: Int) = Array(((v >>> 24) & 0xff).toByte,
        ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
        (v & 0xff).toByte)
      out = out ++ be(kept.length) ++ t ++ kept ++ be(c.getValue.toInt)
      if (tpe == "IEND") done = true
      pos += 12 + len
    }
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodePng(1L, out)
    }
    assert(e.getMessage.contains("short IDAT"))
  }

  test("GIF codec: encode/decode round-trips closed-form features " +
       "through REAL LZW on a small gradient") {
    import graft.operators.Multimodal
    val w = 13; val h = 11
    def idx(x: Int, y: Int): Int = (x * 5 + y * 3) % 256
    def pal(i: Int): (Int, Int, Int) =
      ((3 * i + 5) % 256, (7 * i + 1) % 256, (11 * i + 2) % 256)
    val bytes = Multimodal.encodeGif(w, h, idx, pal)
    val row = Multimodal.decodeGif(9L, bytes)
    assert(row.width == w && row.height == h)
    var rs = 0L; var gs = 0L; var bs = 0L; var lm = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pal(idx(x, y))
      rs += r; gs += g; bs += b
      lm = math.max(lm, 2126L * r + 7152L * g + 722L * b)
    }
    assert(row.r_sum == rs && row.g_sum == gs && row.b_sum == bs)
    assert(row.lum_max == lm)
  }

  test("GIF codec: a large high-entropy image forces the LZW table " +
       "to FILL and mid-stream clear-reset, and still round-trips " +
       "(dictionary growth, width bumps 9 to 12, KwKwK all exercised)") {
    import graft.operators.Multimodal
    // 150x150 = 22500 px; the mixed-congruence pattern defeats long
    // matches so the dictionary fills (>4096 misses) and the encoder
    // emits at least one mid-stream clear
    val w = 150; val h = 150
    def idx(x: Int, y: Int): Int = (x * x * 7 + y * 13 + x * y) % 256
    def pal(i: Int): (Int, Int, Int) = (i, (i * 2) % 256, (255 - i))
    val bytes = Multimodal.encodeGif(w, h, idx, pal)
    val row = Multimodal.decodeGif(1L, bytes)
    assert(row.width == w && row.height == h)
    var rs = 0L
    for (y <- 0 until h; x <- 0 until w) rs += pal(idx(x, y))._1
    assert(row.r_sum == rs)
    // KwKwK explicitly: the classic ababab… stream makes the decoder
    // hit a code equal to its next free slot immediately
    val kw = Multimodal.encodeGif(6, 1,
      (x, _) => if (x % 2 == 0) 1 else 2, pal)
    val kr = Multimodal.decodeGif(2L, kw)
    assert(kr.r_sum == 3 * pal(1)._1 + 3 * pal(2)._1)
  }

  test("GIF codec: a pixel-count shortfall fails loudly, never " +
       "returns a short image") {
    import graft.operators.Multimodal
    val bytes = Multimodal.encodeGif(20, 20,
      (x, y) => (x + y) % 256, i => (i, i, i)).clone()
    // widen the declared dimensions to 21x20: the container stays
    // structurally valid but the LZW stream now under-delivers
    // pixels. Screen width is little-endian at offset 6; the image
    // descriptor (after the 768-byte GCT) carries width at +5.
    bytes(6) = 21
    val desc = 6 + 7 + 768
    assert(bytes(desc) == 0x2c)
    bytes(desc + 5) = 21
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeGif(1L, bytes)
    }
    assert(e.getMessage.contains("LZW") ||
      e.getMessage.contains("pixel count"), e.getMessage)
  }

  test("cross-codec dHash: a PNG re-encode of a BMP yields the " +
       "IDENTICAL fingerprint through dhashImage dispatch, and a " +
       "brightness-shifted PNG twin stays within the Hamming band") {
    import graft.operators.Multimodal
    val w = 13; val h = 10
    def px(x: Int, y: Int): (Int, Int, Int) =
      ((x * 17 + y * 5) % 200, (x * 3 + y * 11) % 200, (x * 7 + y * 2) % 200)
    val bmp = Multimodal.encodeBmp24(w, h, px)
    val png = Multimodal.encodePng(w, h, px)
    val a = Multimodal.dhashImage(1L, bmp)
    val b = Multimodal.dhashImage(2L, png)
    assert(a.hash_hi == b.hash_hi && a.hash_lo == b.hash_lo)
    // +2 shift with no channel past 253 => differences preserved =>
    // hamming must be 0 here (no wrap positions in this gradient)
    val shifted = Multimodal.encodePng(w, h, (x, y) => {
      val (r, g, b0) = px(x, y); (r + 2, g + 2, b0 + 2)
    })
    val c = Multimodal.dhashImage(3L, shifted)
    val ham = java.lang.Long.bitCount(a.hash_hi ^ c.hash_hi) +
      java.lang.Long.bitCount(a.hash_lo ^ c.hash_lo)
    assert(ham == 0, s"shift-invariance violated: hamming $ham")
    // third codec through the same dispatch: a GIF whose palette maps
    // index i to the SAME pixels as px (identity over the used range
    // is impossible with one palette, so use a single-channel image
    // where index == luma-determining value on all three channels)
    def grey(x: Int, y: Int): (Int, Int, Int) = {
      val v = (x * 17 + y * 5) % 200; (v, v, v)
    }
    val gBmp = Multimodal.encodeBmp24(w, h, grey)
    val gGif = Multimodal.encodeGif(w, h,
      (x, y) => (x * 17 + y * 5) % 200, i => (i, i, i))
    val d1 = Multimodal.dhashImage(4L, gBmp)
    val d2 = Multimodal.dhashImage(5L, gGif)
    assert(d1.hash_hi == d2.hash_hi && d1.hash_lo == d2.hash_lo,
      "GIF re-encode must fingerprint identically to its BMP twin")
  }
}
