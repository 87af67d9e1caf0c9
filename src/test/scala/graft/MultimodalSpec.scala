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
}
