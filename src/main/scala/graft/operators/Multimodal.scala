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
}
