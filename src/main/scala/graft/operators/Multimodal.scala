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
  * driver involvement), and explicit output schemas. The actual codec
  * call is STUBBED (`decodeStub`) because no image/audio library
  * ships in this container: it derives deterministic pseudo-metadata
  * and features from the bytes, so every downstream operator (joins
  * on metadata, ANN over extracted features, frame sampling) is
  * exercised end-to-end with stable results.
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
}
