package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Streaming twins vs their batch formulations on the same data. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark

  test("stream-stream interval join matches the batch interval join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // clicks (user, sec) joined to buys within 600 s
    val clicksData = Seq((1L, 100L), (1L, 900L), (2L, 100L), (3L, 50L))
    val buysData = Seq((1L, 400L), (1L, 1000L), (2L, 800L), (4L, 60L))
    val cs = MemoryStream[(Long, Long)]
    val bs = MemoryStream[(Long, Long)]
    def shape(df: org.apache.spark.sql.DataFrame,
              ts: String): org.apache.spark.sql.DataFrame =
      df.select(col("_1").as("user"), timestamp_seconds(col("_2")).as(ts))
    val joined = Streaming.intervalJoin(
      shape(cs.toDF, "click_ts"), shape(bs.toDF, "buy_ts"),
      "user", "click_ts", "buy_ts", 600L, "1 minute")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    cs.addData(clicksData: _*)
    bs.addData(buysData: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj")
      .select(col("user"), col("click_ts").cast("long"),
        col("buy_ts").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    // batch truth
    val expect = (for {
      (cu, ct) <- clicksData
      (bu, bt) <- buysData
      if cu == bu && bt >= ct && bt <= ct + 600
    } yield (cu, ct, bt)).toSet
    assert(got == expect)
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_stream").toString
    val e = graft.core.Tables.load(spark, TestSpark.sf001, "events")
    e.withColumn("ts_s", graft.analytics.Exact.secFromAny(e, "ts"))
      .select("event_id", "ts_s", "user_id", "value")
      .write.parquet(s"$d/events")
    s"$d/events"
  }

  test("stream-static broadcast enrichment == batch join (stateless, " +
       "every event enriched exactly once)") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_ssd_spec").toString
    val events = (1L to 500L).map(i => (i, i % 7, i * 1.5))
      .toDF("event_id", "k", "v")
    events.write.parquet(s"$d/events")
    val dim = (0L until 7L).map(k => (k, s"seg${k % 3}")).toDF("dk", "seg")
    val got = Streaming.staticEnrichReplayFromParquet(
      spark, s"$d/events", dim, "k", "dk")
    val expect = spark.read.parquet(s"$d/events")
      .join(dim, col("k") === col("dk"))
    assert(got.count() == 500L, "inner join on a total key keeps all rows")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "streamed enrichment must reproduce the batch join row-for-row")
  }

  test("streaming tumbling window == batch tumbling window") {
    val schema = spark.read.parquet(dir).schema
    val stream = Streaming.fileStream(spark, dir, schema)
    val got = Streaming.runToMemory(
      Streaming.tumblingStats(stream, "ts_s", "value", "1 hour", "0 seconds"),
      "tumbling_out", outputMode = "complete")

    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts_s"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_total"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("value_total"))

    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("streaming sliding windows == batch sliding windows (q80's " +
       "overlap semantics, live)") {
    val schema = spark.read.parquet(dir).schema
    val stream = Streaming.fileStream(spark, dir, schema)
    val got = Streaming.runToMemory(
      Streaming.slidingStats(stream, "ts_s", "value",
        "1 hour", "15 minutes", "0 seconds"),
      "sliding_out", outputMode = "complete")
    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts_s"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_total"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("value_total"))
    assert(got.count() > 0)
    // 4 overlapping windows per tumbling hour
    assert(got.count() > spark.read.parquet(dir)
      .select(date_trunc("hour", col("ts_s"))).distinct().count() * 3)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("streaming dedup within watermark drops re-ingested rows") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_dedup").toString + "/in"
    // the same snapshot batch ingested twice (at-least-once source)
    val batch = Seq(
      ("b1", java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 1.0),
      ("b2", java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 2.0))
      .toDF("bike_id", "ts", "v")
    batch.union(batch).write.parquet(d)
    val stream = Streaming.fileStream(spark, d,
      spark.read.parquet(d).schema)
    val got = Streaming.runToMemory(
      Streaming.dedupWithinWatermark(stream, "ts",
        Seq("bike_id", "ts"), "1 hour"),
      "dedup_out")
    assert(got.count() == 2)
    assert(got.select("bike_id").as[String].collect().toSet ==
      Set("b1", "b2"))
  }

  test("custom-state flatMapGroupsWithState sessionizer == built-in " +
       "session_window replay, session for session") {
    val cols = Seq("user_id", "session_start", "session_end", "n_events")
    val a = Streaming.statefulSessionReplayFromParquet(spark,
        s"${TestSpark.sf001}/events.parquet", gapSec = 1800L)
      .select(cols.map(col): _*)
    val b = Streaming.sessionReplayFromParquet(spark,
        s"${TestSpark.sf001}/events.parquet", "user_id", "30 minutes")
      .select(cols.map(col): _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "the two session formulations must produce identical rows")
    assert(a.count() > 0)
  }

  test("dedup replay (same file as two micro-batches) == batch " +
       "distinct: state suppresses every second copy") {
    import spark.implicits._
    val got = Streaming.dedupReplayFromParquet(spark,
      s"${TestSpark.sf001}/events.parquet", Seq("event_id"), "366 days")
    val src = spark.read.parquet(s"${TestSpark.sf001}/events.parquet")
    assert(got.count() == src.count(),
      "sink must hold exactly one copy of every event")
    assert(got.select("event_id").distinct().count() == src.count())
    assert(got.agg(sum(round(col("value") * 10000).cast("long")))
      .as[Long].head() ==
      src.agg(sum(round(col("value") * 10000).cast("long")))
        .as[Long].head(),
      "fixed-point value total must match the single-copy source")
  }

  test("foreachBatch merge stream converges to the batch " +
       "Incremental.run target (the daily upsert, live)") {
    val base = Files.createTempDirectory("graft_mergestream").toString
    val src = spark.read.parquet(dir)
    val mid = src.agg(percentile_approx(col("ts_s").cast("long"),
      lit(0.5), lit(100))).head.getLong(0)
    // two arrivals of the same feed: first half, then second half
    val in = s"$base/in"
    // one file per arrival so each maxFilesPerTrigger=1 micro-batch
    // is exactly one incremental window
    src.filter(col("ts_s").cast("long") <= mid)
      .coalesce(1).write.parquet(in)
    src.filter(col("ts_s").cast("long") > mid)
      .coalesce(1).write.mode("append").parquet(in)
    // per-slice state row: latest (ts, value) per user — keys unique
    // within every batch, the contract mergeStream documents
    def latestPerUser(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      df.groupBy(col("user_id"))
        .agg(max(col("ts_s").cast("long")).as("last_ts"),
          max_by(col("value"), struct(col("ts_s"), col("event_id")))
            .as("last_value"))

    // stream form: every parquet file is its own micro-batch
    val streamTarget = s"$base/stream_target"
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = Streaming.mergeStream(stream, streamTarget,
      s"$base/ckpt", Seq("user_id"), latestPerUser)
    q.awaitTermination()

    // batch truth: two scheduled Incremental.run windows
    val batchTarget = s"$base/batch_target"
    val eventsL = src.withColumn("ts_l", col("ts_s").cast("long"))
    Seq(mid, Long.MaxValue).foreach { hi =>
      graft.operators.Incremental.run(spark, eventsL, "ts_l", hi,
        latestPerUser, batchTarget, Seq("user_id"), s"$base/bookmark")
    }

    val got = spark.read.parquet(streamTarget)
    val want = spark.read.parquet(batchTarget)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming session windows == batch session windows") {
    val schema = spark.read.parquet(dir).schema
    val stream = Streaming.fileStream(spark, dir, schema)
    val got = Streaming.runToMemory(
      Streaming.sessionStats(stream, "ts_s", "user_id",
        "30 minutes", "0 seconds"),
      "session_out", outputMode = "complete")

    val batch = spark.read.parquet(dir)
      .groupBy(col("user_id"), session_window(col("ts_s"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)

    // and session_window agrees with the batch Sessionize operator on
    // session counts per user
    val viaOperator = graft.operators.Sessionize.byGap(
      spark.read.parquet(dir), Seq("user_id"), col("ts_s"),
      col("event_id"), 1800L)
      .groupBy("user_id").agg(max("session_id").as("n_sessions"))
    val viaWindow = got.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"))
    assert(viaOperator.join(viaWindow, "user_id")
      .filter(viaOperator("n_sessions") =!= viaWindow("n_sessions"))
      .count() == 0)
  }

  test("left-outer interval join emits watermark-evicted unmatched " +
       "rows, not just inner matches") {
    val src = s"${TestSpark.sf001}/events.parquet"
    val got = graft.streaming.Streaming
      .leftOuterIntervalJoinReplayFromParquet(spark, src,
        "error", "click", 600L)
    val e = spark.read.parquet(src)
    val eSec = e.withColumn("ts_s", graft.analytics.Exact.secFromAny(e, "ts"))
    val nErrors = eSec.filter(col("event_type") === "error").count()
    // every error must appear (matched or null-matched); the
    // unmatched majority only exists if state eviction emitted them
    assert(got.count() >= nErrors, s"got ${got.count()} of $nErrors errors")
    val unmatched = got.filter(col("click_id").isNull).count()
    assert(unmatched > 0, "no watermark-evicted unmatched rows emitted")
  }

  test("late-data replay: the window-end late filter with its " +
       "one-batch lag behind eviction — hand-computed drop set") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // on-time bulk = user 2 (max ts 12:23 → late-filter wm 10:23);
    // nudge = user 0; late = user 1:
    //   10:05 → window [10,11) end 11:00 > 10:23 → ABSORBED even
    //           though its ts is older than the watermark
    //   09:05 → window [09,10) end 10:00 ≤ 10:23 → DROPPED
    //   12:40 → open window → absorbed
    val rows = Seq(
      (1L, ts("2024-01-01 08:10:00"), 2L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 12:23:00"), 2L, "view", 1.0, "{}"),
      (3L, ts("2024-01-01 12:30:00"), 0L, "view", 1.0, "{}"),
      (4L, ts("2024-01-01 10:05:00"), 1L, "view", 1.0, "{}"),
      (5L, ts("2024-01-01 09:05:00"), 1L, "view", 1.0, "{}"),
      (6L, ts("2024-01-01 12:40:00"), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = Files.createTempDirectory("graft_late_spec").toString + "/ev"
    rows.write.parquet(d)
    val got = Streaming
      .lateDataReplayFromParquet(spark, d, "1 hour", "2 hours")
      .select(col("window_start").cast("string"), col("n_events"))
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "2024-01-01 08:00:00" -> 1L,
      "2024-01-01 10:00:00" -> 1L,
      "2024-01-01 12:00:00" -> 3L))
  }
}
