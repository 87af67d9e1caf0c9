package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.core.PlanStats.Pinned

/** Structured Streaming variants of the ingestion + trip semantics
  * (SURVEY.md §2.9). The reference's "streaming" is scheduled batch;
  * these are the true streaming formulations, with the batch pipeline
  * remaining the source of truth (§7 step 8).
  *
  * All aggregations use event-time watermarks so state is bounded:
  * session/tumbling state for keys older than the watermark is
  * evicted — the property that keeps a 100 TB/day stream's state at
  * O(active keys), not O(history).
  */
object Streaming {

  /** File-source stream with enforced schema (the streaming twin of
    * the batch ingest readers; Trigger.AvailableNow makes it the
    * incremental-batch runner the reference's daily Lambda is). */
  def fileStream(spark: SparkSession, path: String,
                 schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Tumbling-window counts/sums per window (streaming twin of q34). */
  def tumblingStats(events: DataFrame, tsCol: String, valueCol: String,
                    window: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("value_total"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("value_total"))

  /** Sliding-window counts/sums (streaming twin of q80): every event
    * lands in window/slide overlapping windows; `window()` expands
    * them in place (a streaming-safe Generate, no join) and the
    * watermark bounds how long a window's partial state lives. */
  def slidingStats(events: DataFrame, tsCol: String, valueCol: String,
                   window: String, slide: String,
                   watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions
        .window(col(tsCol), window, slide))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("value_total"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("value_total"))

  /** Session windows per key with an inactivity gap — the streaming
    * formulation of trip/session derivation.
    *
    * Boundary semantics: `session_window` is INCLUSIVE at the gap —
    * an event exactly `gap` after its predecessor stays in the same
    * session (verified against the one exactly-at-gap pair in the
    * sf0.1 events data, and consistent with the merge rule "sessions
    * overlap when next.start <= prev.end"). This matches the batch
    * Sessionize.byGap (inclusive <=, the reference's inclusive
    * BETWEEN at `trips_lambda.py:128`), so the streaming and batch
    * formulations agree on every input. */
  def sessionStats(events: DataFrame, tsCol: String, keyCol: String,
                   gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming exact dedup with bounded state: duplicates of `keys`
    * are dropped as long as they arrive within the watermark delay of
    * each other; key state older than the watermark is evicted. The
    * streaming twin of Dedup.exact for at-least-once sources (the
    * reference's re-ingested snapshots, PK `(bike_id, timestamp)` at
    * `bike_lambda.py:46`). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           keys: Seq[String], watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Bounded streaming-dedup replay: the source parquet is streamed
    * TWICE (two symlinks drained as separate micro-batches under
    * `maxFilesPerTrigger=1`), so every key's second copy arrives
    * against state populated by the first micro-batch and
    * [[dedupWithinWatermark]] must suppress it through the state
    * store — the at-least-once ingestion dedup an idempotent daily
    * re-run needs (the reference replays its whole window daily,
    * `lambda/trips_lambda.py:218-221`). `delay` must cover the
    * replayed span so no real row is late-dropped here; in an
    * unbounded production stream the same delay is exactly what
    * bounds state size (keys older than watermark−delay are
    * evicted). Returns the drained sink: the first-seen copy of every
    * key, with a `ts_s` second-truncated event-time column added. */
  def dedupReplayFromParquet(spark: SparkSession, srcParquet: String,
                             keys: Seq[String], delay: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val in = Files.createTempDirectory("graft_dedup_in")
    val out = Files.createTempDirectory("graft_dedup_out")
    val ckpt = Files.createTempDirectory("graft_dedup_ckpt")
    Files.createSymbolicLink(in.resolve("batch1.parquet"),
      Paths.get(srcParquet))
    Files.createSymbolicLink(in.resolve("batch2.parquet"),
      Paths.get(srcParquet))
    val schema = spark.read.parquet(srcParquet).schema
    val e = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    val eSec =
      e.withColumn("ts_s", graft.analytics.Exact.secFromAny(e, "ts"))
    withStatePartitions(spark) {
      graft.core.PlanStats.markStreamingStart()
      val q = dedupWithinWatermark(eSec, "ts_s", keys, delay)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out.toString)
  }

  /** Bounded two-phase streaming replay of the events table through a
    * watermarked `session_window`, returning the finalized sessions —
    * Structured Streaming running inside the batch correctness gate.
    *
    * Phase 1 streams the real file (Trigger.AvailableNow, parquet
    * sink + checkpoint). Append-mode session aggregation only emits a
    * session once the watermark passes its end, so the trailing
    * session of every key is still in state when a bounded run
    * drains. Phase 2 is the reference's own answer to late/trailing
    * data (the daily re-run at `trips_lambda.py:218-221`): a second
    * AvailableNow run over one new file — a far-future sentinel row —
    * resumes from the checkpoint, advances the global watermark past
    * every real session, and flushes them to the sink. The sentinel's
    * own session never finalizes and is filtered on read-back.
    *
    * Everything stays distributed: driver-side work is two temp dirs,
    * one symlink, and a one-row DataFrame write. */
  def sessionReplayFromParquet(spark: SparkSession, srcParquet: String,
                               userCol: String, gap: String): DataFrame =
    sentinelReplay(spark, srcParquet)(eSec =>
      sessionStats(eSec, "ts_s", userCol, gap, "0 seconds"))
      .filter(col(userCol) =!= -1L)

  /** Bounded two-phase replay through a watermarked TUMBLING window
    * (the streaming twin of q34, in the gate): same sentinel-flush
    * machinery as [[sessionReplayFromParquet]]. Values are summed as
    * e4 fixed-point longs so the windowed aggregate is exact and
    * order-independent. Returns (window_start, n_events,
    * value_e4_total) for every real window (the sentinel's own window
    * is filtered on read-back). */
  def tumblingReplayFromParquet(spark: SparkSession, srcParquet: String,
                                window: String): DataFrame =
    sentinelReplay(spark, srcParquet)(eSec =>
      tumblingStats(
        eSec.withColumn("value_e4",
          round(col("value") * 10000).cast("long")),
        "ts_s", "value_e4", window, "0 seconds"))
      .filter(col("window_start") <
        lit(new java.sql.Timestamp(4070908800L * 1000L))) // < 2099-01-01
      .withColumnRenamed("value_total", "value_e4_total")

  /** Bounded sliding-window replay — [[slidingStats]] through the
    * same sentinel-flush lifecycle as [[tumblingReplayFromParquet]]:
    * every event expands into window/slide overlapping windows in
    * place (a streaming-safe Generate, no join), the sentinel batch
    * advances the watermark so append mode flushes every real
    * window. */
  def slidingReplayFromParquet(spark: SparkSession, srcParquet: String,
                               window: String, slide: String): DataFrame =
    sentinelReplay(spark, srcParquet)(eSec =>
      slidingStats(
        eSec.withColumn("value_e4",
          round(col("value") * 10000).cast("long")),
        "ts_s", "value_e4", window, slide, "0 seconds"))
      .filter(col("window_start") <
        lit(new java.sql.Timestamp(4070908800L * 1000L))) // < 2099-01-01
      .withColumnRenamed("value_total", "value_e4_total")

  /** The sentinel-flush replay harness shared by the windowed
    * streaming gate queries: stream the real parquet as micro-batch 1,
    * a far-future sentinel row as micro-batch 2 (advancing the global
    * watermark past every real window so append mode flushes them),
    * drain with one AvailableNow lifecycle, and hand back the sink.
    *
    * The sentinel is a fixed 2100-01-01 row — no max-scan of the
    * source needed, which also matters at 100 TB. A second restarted
    * run (the reference's daily re-run) would behave identically via
    * the checkpoint — StreamingSpec covers that resume path; one
    * lifecycle halves the fixed streaming startup cost. */
  private[streaming] def sentinelReplay(
      spark: SparkSession, srcParquet: String)
      (aggStream: DataFrame => DataFrame): DataFrame = {
    import java.nio.file.{Files, Paths}
    val in = Files.createTempDirectory("graft_stream_in")
    val out = Files.createTempDirectory("graft_stream_out")
    val ckpt = Files.createTempDirectory("graft_stream_ckpt")
    Files.createSymbolicLink(in.resolve("batch1.parquet"),
      Paths.get(srcParquet))
    val batch = spark.read.parquet(srcParquet)

    // sentinel typed like the source (ts may be raw nanoseconds)
    val isNs = batch.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    val sentinelEpochS = 4102444800L // 2100-01-01T00:00:00Z
    val sentinelTs: Column =
      if (isNs) lit(sentinelEpochS * 1000000000L)
      else lit(new java.sql.Timestamp(sentinelEpochS * 1000L))
    val sentinel = spark.range(1).select(
      lit(-1L).as("event_id"), sentinelTs.as("ts"), lit(-1L).as("user_id"),
      lit("sentinel").as("event_type"), lit(0.0).as("value"),
      lit("{}").as("props"))
    val tmp = Files.createTempDirectory("graft_stream_sentinel")
    sentinel.coalesce(1).write.mode("overwrite")
      .parquet(tmp.resolve("w").toString)
    val part = Files.list(tmp.resolve("w")).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet")).head
    Files.move(Paths.get(part), in.resolve("batch2.parquet"))

    // ONE AvailableNow run, rate-limited to one file per micro-batch:
    // the file source drains oldest-modification-time first, so the
    // real data (the symlink inherits the old target mtime) forms
    // micro-batch 1, the watermark advances on commit, and the
    // sentinel's micro-batch 2 flushes every real window.
    val e = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    val eSec =
      e.withColumn("ts_s", graft.analytics.Exact.secFromAny(e, "ts"))
    withStatePartitions(spark) {
      graft.core.PlanStats.markStreamingStart()
      val q = aggStream(eSec)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out.toString)
  }

  /** Open-session accumulator for [[statefulSessions]] (epoch
    * seconds; pure integers so the fold is exact). */
  case class SessionState(start: Long, last: Long, n: Long)

  /** Finalized session emitted by [[statefulSessions]]. */
  case class SessionOut(user_id: Long,
                        session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp,
                        n_events: Long)

  /** Hand-rolled sessionizer over `flatMapGroupsWithState` with an
    * EVENT-TIME timeout — the custom-state formulation of
    * [[sessionStats]]'s built-in `session_window` (same inclusive
    * gap boundary: a gap of exactly `gapSec` continues the session).
    * A session closes either inline (a new event arrives past the
    * gap) or by timer (the watermark passes last+gap with no new
    * event — Spark invokes the function for the timed-out key, the
    * state is emitted and removed). State is O(1) per active key:
    * (start, last, n), never the event history.
    *
    * This is the template for session logic `session_window` cannot
    * express (per-key dynamic gaps, emit-on-update, enrichment
    * carried in state) — gate-checked against the same batch
    * gaps-and-islands oracle as the built-in. */
  def statefulSessions(eSec: DataFrame, gapSec: Long)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.{Dataset, Encoders}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val pairEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.TIMESTAMP)
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionOut]
    val typed: Dataset[(Long, java.sql.Timestamp)] = eSec
      .withWatermark("ts_s", "0 seconds")
      .select(col("user_id").cast("long"), col("ts_s"))
      .as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          def close(s: SessionState) = SessionOut(user,
            new java.sql.Timestamp(s.start * 1000),
            new java.sql.Timestamp((s.last + gapSec) * 1000), s.n)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close)
            state.remove()
            out.iterator
          } else {
            // one micro-batch may deliver a key's events unsorted
            val sorted = rows.map(_._2.getTime / 1000).toSeq.sorted
            var st = state.getOption
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { ts =>
              st match {
                case None => st = Some(SessionState(ts, ts, 1L))
                case Some(s) if ts - s.last > gapSec =>
                  out += close(s)
                  st = Some(SessionState(ts, ts, 1L))
                case Some(s) =>
                  st = Some(s.copy(last = math.max(s.last, ts), n = s.n + 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              // fires once the watermark passes the session's gap edge
              state.setTimeoutTimestamp((s.last + gapSec) * 1000 + 1)
            }
            out.result().iterator
          }
      }
  }

  /** Bounded replay of the events table through [[statefulSessions]]:
    * same sentinel-flush harness as the windowed gates — the
    * sentinel's 2100 timestamp advances the watermark past every real
    * session's timeout timer, so the no-data batch after it fires all
    * timers and flushes every trailing session. The sentinel's own
    * key (-1) never times out and is filtered on read-back. */
  def statefulSessionReplayFromParquet(spark: SparkSession,
                                       srcParquet: String,
                                       gapSec: Long): DataFrame =
    sentinelReplay(spark, srcParquet)(eSec =>
      statefulSessions(eSec, gapSec).toDF())
      .filter(col("user_id") =!= -1L)

  /** [[statefulSessions]] with a PER-KEY dynamic gap — the session
    * logic `session_window` cannot express (its gap is one expression
    * of the current row, not of the key): each user sessionizes under
    * their own inactivity threshold (per-tier policies, bot vs human
    * cadence). Identical fold and timer structure; only the gap is
    * `gapOf(key)`. State stays O(1) per active key. */
  def statefulSessionsDynamic(eSec: DataFrame, gapOf: Long => Long)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.{Dataset, Encoders}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val pairEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.TIMESTAMP)
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionOut]
    val typed: Dataset[(Long, java.sql.Timestamp)] = eSec
      .withWatermark("ts_s", "0 seconds")
      .select(col("user_id").cast("long"), col("ts_s"))
      .as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          val gapSec = gapOf(user)
          def close(s: SessionState) = SessionOut(user,
            new java.sql.Timestamp(s.start * 1000),
            new java.sql.Timestamp((s.last + gapSec) * 1000), s.n)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close)
            state.remove()
            out.iterator
          } else {
            val sorted = rows.map(_._2.getTime / 1000).toSeq.sorted
            var st = state.getOption
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { ts =>
              st match {
                case None => st = Some(SessionState(ts, ts, 1L))
                case Some(s) if ts - s.last > gapSec =>
                  out += close(s)
                  st = Some(SessionState(ts, ts, 1L))
                case Some(s) =>
                  st = Some(s.copy(last = math.max(s.last, ts), n = s.n + 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.last + gapSec) * 1000 + 1)
            }
            out.result().iterator
          }
      }
  }

  /** Bounded replay through [[statefulSessionsDynamic]] — the
    * [[statefulSessionReplayFromParquet]] harness with a per-key
    * gap. */
  def dynamicSessionReplayFromParquet(spark: SparkSession,
                                      srcParquet: String,
                                      gapOf: Long => Long): DataFrame =
    sentinelReplay(spark, srcParquet)(eSec =>
      statefulSessionsDynamic(eSec, gapOf).toDF())
      .filter(col("user_id") =!= -1L)

  /** Run `body` (which starts and drains a stateful streaming query)
    * with a reduced shuffle-partition count: each state partition is
    * a state store with per-micro-batch checkpoint files, so a
    * bounded replay with 32 partitions pays 32× the commit fsyncs for
    * state that fits in a handful. Stateful queries pin the partition
    * count from the conf AT START into the checkpoint; batch plans
    * built afterwards are unaffected (the previous value is
    * restored). Production unbounded streams keep the session
    * default. */
  private def withStatePartitions[T](spark: SparkSession, n: Int = 4)
      (body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Run `body` with the RocksDB state store provider active, then
    * restore the previous provider. The default HDFS-backed provider
    * keeps every key's state as JVM heap objects — at 100 TB/day of
    * stream state (billions of live sessions) that heap residency is
    * the first thing that falls over; RocksDB keeps state off-heap
    * with changelog checkpointing, which is the posture a production
    * deployment runs. The aggregation semantics must be IDENTICAL
    * under either provider — [[graft.analytics.Windowed]]'s q266
    * gates exactly that (same oracle as the default-provider q53). */
  def withRocksDbStateStore[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Watermarked stream-stream interval join: match each left event
    * with right events for the same key whose timestamp falls within
    * [leftTs, leftTs + windowSec]. Both sides carry watermarks and
    * the join condition bounds event-time on both sides, so Spark can
    * evict join state older than the watermark — state stays
    * O(in-flight window), not O(stream history), which is what makes
    * a stream-stream join survive an unbounded 100 TB/day feed.
    * Inner-join matches emit as soon as both sides arrive (no
    * watermark wait); the watermark only bounds state and late data. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, windowSec: Long,
                   watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
        l(key) === r(key) &&
          r(rightTs) >= l(leftTs) &&
          r(rightTs) <= l(leftTs) + expr(s"INTERVAL $windowSec SECONDS"))
      .drop(r(key))
  }

  /** Bounded replay of a parquet events table through the watermarked
    * stream-stream [[intervalJoin]]: both sides stream the SAME file
    * independently (two file sources), are filtered to their event
    * type, joined within the interval, and drained with one
    * AvailableNow run to a parquet sink. Inner-join matches emit as
    * soon as both sides arrive, so no sentinel flush is needed (unlike
    * the append-mode session aggregation in
    * [[sessionReplayFromParquet]]); the watermark exists to bound join
    * state, which is what the production unbounded form relies on.
    *
    * Returns (user_id, error_id, err_ts, click_id, click_ts). */
  def intervalJoinReplayFromParquet(spark: SparkSession, srcParquet: String,
                                    leftType: String, rightType: String,
                                    windowSec: Long): DataFrame = {
    import java.nio.file.{Files, Paths}
    val in = Files.createTempDirectory("graft_ssj_in")
    val out = Files.createTempDirectory("graft_ssj_out")
    val ckpt = Files.createTempDirectory("graft_ssj_ckpt")
    Files.createSymbolicLink(in.resolve("batch1.parquet"),
      Paths.get(srcParquet))
    val schema = spark.read.parquet(srcParquet).schema

    // ONE file source, both join sides derived from it (stream
    // self-join): halves the source tracking/scan machinery vs two
    // independent readStreams of the same file
    val e0 = spark.readStream.schema(schema).parquet(in.toString)
    val e = e0.withColumn("ts_s",
      graft.analytics.Exact.secFromAny(e0, "ts"))
    // right key renamed apart BEFORE the join: both sides share one
    // source lineage, and Dataset self-join disambiguation of
    // `l(key) === r(key)` degrades to a trivially-true self-reference
    // (the inner-join rewriter happens to repair it — with a logged
    // warning — but the left-outer variant proved the hazard real;
    // distinct names make the condition unambiguous by construction)
    val left = e.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("error_id"),
        col("ts_s").as("err_ts"))
      .withWatermark("err_ts", "0 seconds")
    val right = e.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("event_id").as("click_id"),
        col("ts_s").as("click_ts"))
      .withWatermark("click_ts", "0 seconds")
    val joined = left.join(right,
        col("user_id") === col("r_user") &&
          col("click_ts") >= col("err_ts") &&
          col("click_ts") <= col("err_ts") +
            expr(s"INTERVAL $windowSec SECONDS"))
      .drop("r_user")

    withStatePartitions(spark) {
      graft.core.PlanStats.markStreamingStart()
      val q = joined.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out.toString)
  }

  /** LEFT OUTER watermarked stream-stream interval join, bounded
    * replay: like [[intervalJoinReplayFromParquet]] but every left
    * event without a match in its window must ALSO emit (with null
    * right columns) — and in a stream that can only happen once the
    * watermark proves no match can still arrive. That eviction is the
    * semantics under test, and it needs the sentinel flush: a bounded
    * inner join emits matches eagerly, but outer-unmatched rows sit
    * in state until a later batch advances the watermark past
    * leftTs + window. The sentinel (event_type 'sentinel') is let
    * through BOTH side filters so both watermark operators advance;
    * its own rows are filtered on read-back by user_id.
    *
    * Returns (user_id, error_id, err_ts, click_id, click_ts) with
    * null click columns for unmatched errors. */
  def leftOuterIntervalJoinReplayFromParquet(spark: SparkSession,
                                             srcParquet: String,
                                             leftType: String,
                                             rightType: String,
                                             windowSec: Long): DataFrame =
    sentinelReplay(spark, srcParquet) { eSec =>
      // every column renamed apart BEFORE the join: both sides share
      // one source lineage, and Dataset self-join disambiguation of
      // `left(c) === right(c)` resolves the key equality to a
      // trivially-true self-reference — which an inner join survives
      // (the rewriter fixes it) but silently breaks outer-state
      // eviction. Distinct names make the condition unambiguous.
      val left = eSec.filter(col("event_type").isin(leftType, "sentinel"))
        .select(col("user_id"), col("event_id").as("error_id"),
          col("ts_s").as("err_ts"))
        .withWatermark("err_ts", "0 seconds")
      val right = eSec.filter(col("event_type").isin(rightType, "sentinel"))
        .select(col("user_id").as("r_user"),
          col("event_id").as("click_id"), col("ts_s").as("click_ts"))
        .withWatermark("click_ts", "0 seconds")
      left.join(right,
          col("user_id") === col("r_user") &&
            col("click_ts") >= col("err_ts") &&
            col("click_ts") <= col("err_ts") +
              expr(s"INTERVAL $windowSec SECONDS"),
          "left_outer")
        .drop("r_user")
    }.filter(col("user_id") =!= -1L)

  /** FULL OUTER watermarked stream-stream interval join, bounded
    * replay — the completion of the join-type matrix (inner: q63,
    * left outer: q134): unmatched rows on BOTH sides emit with null
    * opposite columns, each only after its own watermark proves no
    * match can still arrive. Both state stores must evict — the
    * sentinel advances both watermark operators (it passes both side
    * filters), and the read-back drops its rows by user_id.
    *
    * Returns (user_id, error_id, err_ts, click_id, click_ts) with
    * nulls on whichever side is unmatched. */
  def fullOuterIntervalJoinReplayFromParquet(spark: SparkSession,
                                             srcParquet: String,
                                             leftType: String,
                                             rightType: String,
                                             windowSec: Long): DataFrame =
    sentinelReplay(spark, srcParquet) { eSec =>
      // columns renamed apart BEFORE the join (see the left-outer
      // variant: shared lineage + outer state eviction)
      val left = eSec.filter(col("event_type").isin(leftType, "sentinel"))
        .select(col("user_id").as("l_user"),
          col("event_id").as("error_id"), col("ts_s").as("err_ts"))
        .withWatermark("err_ts", "0 seconds")
      val right = eSec.filter(col("event_type").isin(rightType, "sentinel"))
        .select(col("user_id").as("r_user"),
          col("event_id").as("click_id"), col("ts_s").as("click_ts"))
        .withWatermark("click_ts", "0 seconds")
      left.join(right,
          col("l_user") === col("r_user") &&
            col("click_ts") >= col("err_ts") &&
            col("click_ts") <= col("err_ts") +
              expr(s"INTERVAL $windowSec SECONDS"),
          "full_outer")
        .select(coalesce(col("l_user"), col("r_user")).as("user_id"),
          col("error_id"), col("err_ts"), col("click_id"), col("click_ts"))
    }.filter(col("user_id") =!= -1L)

  /** LEFT SEMI watermarked stream-stream interval join, bounded
    * replay — the existence-test shape of the join matrix (inner:
    * q63, left outer: q134, full outer: q155): each left event emits
    * AT MOST ONCE, the first time a match arrives, with no right
    * columns; unmatched left rows are silently evicted at the
    * watermark rather than emitted null-extended. The state contract
    * differs from the outer joins — a matched left row is tombstoned
    * so later matches cannot re-emit it — which is exactly the
    * machinery under test against the batch EXISTS truth. Sentinel
    * replay advances both watermarks so matched-state cleanup runs
    * within the bounded drain.
    *
    * Returns (user_id, error_id, err_ts) — left columns only. */
  def semiIntervalJoinReplayFromParquet(spark: SparkSession,
                                        srcParquet: String,
                                        leftType: String,
                                        rightType: String,
                                        windowSec: Long): DataFrame =
    sentinelReplay(spark, srcParquet) { eSec =>
      // columns renamed apart BEFORE the join (see the left-outer
      // variant: shared lineage breaks outer/semi state handling)
      val left = eSec.filter(col("event_type").isin(leftType, "sentinel"))
        .select(col("user_id"), col("event_id").as("error_id"),
          col("ts_s").as("err_ts"))
        .withWatermark("err_ts", "0 seconds")
      val right = eSec.filter(col("event_type").isin(rightType, "sentinel"))
        .select(col("user_id").as("r_user"),
          col("event_id").as("click_id"), col("ts_s").as("click_ts"))
        .withWatermark("click_ts", "0 seconds")
      left.join(right,
          col("user_id") === col("r_user") &&
            col("click_ts") >= col("err_ts") &&
            col("click_ts") <= col("err_ts") +
              expr(s"INTERVAL $windowSec SECONDS"),
          "left_semi")
    }.filter(col("user_id") =!= -1L)

  /** Bounded replay of a parquet table through a stream–static
    * broadcast-dimension join — the continuous form of fact-side
    * enrichment (the reference's weather/municipality enrichments,
    * `lambda/trips_lambda.py:68-72`, applied to a live feed). The
    * dimension is a plain batch DataFrame, explicitly broadcast, so
    * each micro-batch plans a stateless BroadcastHashJoin: no join
    * state, no watermark needed, nothing accumulates — the one
    * streaming join shape that is trivially safe at any volume.
    *
    * Returns the drained enriched rows (all stream columns + all dim
    * columns, inner-joined on streamKey == dimKey). */
  def staticEnrichReplayFromParquet(spark: SparkSession, srcParquet: String,
                                    dim: DataFrame, streamKey: String,
                                    dimKey: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val out = Files.createTempDirectory("graft_ssd_out")
    val ckpt = Files.createTempDirectory("graft_ssd_ckpt")
    // a parquet DIRECTORY streams as-is; a single file is linked into
    // a fresh source dir (the file-stream source lists directories)
    val srcDir =
      if (Files.isDirectory(Paths.get(srcParquet))) srcParquet
      else {
        val in = Files.createTempDirectory("graft_ssd_in")
        Files.createSymbolicLink(in.resolve("batch1.parquet"),
          Paths.get(srcParquet))
        in.toString
      }
    val schema = spark.read.parquet(srcParquet).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val joined = stream.join(broadcast(dim),
      stream(streamKey) === dim(dimKey), "inner")
    graft.core.PlanStats.markStreamingStart()
    val q = joined.writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out.toString)
  }

  /** Streaming upsert sink: drive [[graft.operators.MergeByKey
    * .mergeWrite]] from a stream via foreachBatch — the reference's
    * daily ON CONFLICT upsert (`lambda/trips_lambda.py:180-206`)
    * running continuously instead of on a schedule. Each micro-batch
    * is transformed (e.g. reduced to one state row per key — the
    * transform must make keys unique within the batch) and merged
    * into the parquet target by key.
    *
    * Exactly-once effect from at-least-once machinery: foreachBatch
    * may replay a batch after a crash, and the keyed merge is
    * idempotent, so the target converges to batch truth — the same
    * contract [[graft.operators.Incremental.run]] gives the scheduled
    * form. Single-writer, like the sink it wraps. */
  def mergeStream(updates: DataFrame, targetPath: String, ckptPath: String,
                  keys: Seq[String],
                  transform: DataFrame => DataFrame = identity)
      : StreamingQuery = {
    graft.core.PlanStats.markStreamingStart()
    updates.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = transform(batch)
        graft.operators.MergeByKey.mergeWrite(
          rows.sparkSession, targetPath, rows, keys, lit(true))
      }
      .option("checkpointLocation", ckptPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Bounded replay of the events table through the foreachBatch →
    * keyed-merge sink ([[mergeStream]]) — the reference's daily
    * upsert run LIVE (`lambda/trips_lambda.py:180-206`: recompute the
    * window's aggregate, ON CONFLICT replace). The same file drains
    * as TWO micro-batches; each recomputes the per-key aggregate and
    * upserts it, so the second batch must leave the target exactly
    * where the first did — the idempotent re-run property the
    * reference's scheduler depends on, now gate-checkable: the final
    * target equals the batch aggregate of ONE copy. */
  def upsertReplayFromParquet(spark: SparkSession, srcParquet: String,
                              keys: Seq[String],
                              perBatchAgg: DataFrame => DataFrame)
      : DataFrame = {
    import java.nio.file.{Files, Paths}
    val in = Files.createTempDirectory("graft_upsert_in")
    val ckpt = Files.createTempDirectory("graft_upsert_ckpt")
    val target = Files.createTempDirectory("graft_upsert_tgt")
      .resolve("target").toString
    Files.createSymbolicLink(in.resolve("batch1.parquet"),
      Paths.get(srcParquet))
    Files.createSymbolicLink(in.resolve("batch2.parquet"),
      Paths.get(srcParquet))
    val schema = spark.read.parquet(srcParquet).schema
    val e = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    val eSec =
      e.withColumn("ts_s", graft.analytics.Exact.secFromAny(e, "ts"))
    val q = mergeStream(eSec, target, ckpt.toString, keys, perBatchAgg)
    q.awaitTermination()
    spark.read.parquet(target)
  }

  /** Late-data accounting replay: the watermark DROP path exercised
    * deterministically, in the gate. Spark (3.4+) tracks TWO
    * watermarks per stateful operator: eviction (emit windows whose
    * end passed the wm computed through batch N−1) and LATE-EVENT
    * FILTERING, which lags one batch further — batch N's input is
    * filtered with the wm computed through batch N−2, and the
    * predicate is on the WINDOW END, not the row timestamp (probed
    * empirically: a row older than the watermark still lands in a
    * window whose end exceeds it, and is absorbed). Four pinned
    * micro-batches (mtime-ordered under `maxFilesPerTrigger=1`)
    * make a deterministic drop set:
    *   1. even user_ids except user 0 — the on-time bulk; its max
    *      event time defines the filtering watermark two batches on;
    *   2. user 0's rows — the nudge batch that ages batch 1's
    *      watermark into the late-filter position;
    *   3. odd user_ids — the late half: a row survives iff its
    *      tumbling window's end > max(batch-1 ts) − `delay`;
    *   4. the far-future sentinel — flushes every surviving window.
    *
    * The surviving set is pure SQL (hour_end > max(even, non-zero
    * user ts) − delay), so the drop semantics themselves are
    * oracle-checked — every other streaming gate picks delays that
    * drop nothing. In production this accounting is what bounds
    * state: `delay` is the lateness SLA.
    *
    * Returns (window_start, n_events, value_e4_total); the
    * sentinel's own window is filtered on read-back. */
  /** Depth-first removal of a replay scratch directory — the temp
    * trees here hold corpus copies, so leaking one per gate run
    * compounds across a full suite pass. */
  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.isDirectory(p)) {
      val listing = Files.list(p)
      try listing.toArray.foreach(c =>
        deleteRecursively(c.asInstanceOf[java.nio.file.Path]))
      finally listing.close()
    }
    Files.deleteIfExists(p)
  }

  def lateDataReplayFromParquet(spark: SparkSession, srcParquet: String,
                                window: String,
                                delay: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val in = Files.createTempDirectory("graft_late_in")
    val out = Files.createTempDirectory("graft_late_out")
    val ckpt = Files.createTempDirectory("graft_late_ckpt")
    val batch = spark.read.parquet(srcParquet)

    val isNs = batch.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    val sentinelEpochS = 4102444800L // 2100-01-01T00:00:00Z
    val sentinelTs: Column =
      if (isNs) lit(sentinelEpochS * 1000000000L)
      else lit(new java.sql.Timestamp(sentinelEpochS * 1000L))
    val sentinel = spark.range(1).select(
      lit(-1L).as("event_id"), sentinelTs.as("ts"), lit(-1L).as("user_id"),
      lit("sentinel").as("event_type"), lit(0.0).as("value"),
      lit("{}").as("props"))

    // one parquet file per micro-batch, mtimes pinned 10 s apart so
    // the file source's oldest-first ordering is unambiguous
    def writeBatch(df: DataFrame, name: String, mtimeS: Long): Unit = {
      val tmp = Files.createTempDirectory(s"graft_late_$name")
      df.coalesce(1).write.mode("overwrite")
        .parquet(tmp.resolve("w").toString)
      val listing = Files.list(tmp.resolve("w"))
      val part =
        try listing.toArray.map(_.toString)
          .filter(_.endsWith(".parquet")).head
        finally listing.close()
      val dst = in.resolve(s"$name.parquet")
      Files.move(Paths.get(part), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeS * 1000L))
      deleteRecursively(tmp)
    }
    val t0 = System.currentTimeMillis() / 1000L - 1000L
    writeBatch(batch.filter(col("user_id") % 2 === 0 &&
      col("user_id") =!= 0), "batch1", t0)
    writeBatch(batch.filter(col("user_id") === 0), "batch2", t0 + 10)
    writeBatch(batch.filter(col("user_id") % 2 =!= 0), "batch3", t0 + 20)
    writeBatch(sentinel, "batch4", t0 + 30)

    val e = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    val eSec = e
      .withColumn("ts_s", graft.analytics.Exact.secFromAny(e, "ts"))
      .withColumn("value_e4", round(col("value") * 10000).cast("long"))
    withStatePartitions(spark) {
      graft.core.PlanStats.markStreamingStart()
      val q = tumblingStats(eSec, "ts_s", "value_e4", window, delay)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // eager materialization (localCheckpoint) so the scratch trees —
    // each holding a corpus copy — can be removed before returning
    val result = spark.read.parquet(out.toString)
      .filter(col("window_start") <
        lit(new java.sql.Timestamp(4070908800L * 1000L))) // < 2099-01-01
      .withColumnRenamed("value_total", "value_e4_total")
      .pin()
    Seq(in, out, ckpt).foreach(deleteRecursively)
    result
  }

  /** Drain a (bounded) stream into an in-memory table and return its
    * content — the synchronous harness for tests and AvailableNow
    * incremental runs. */
  def runToMemory(stream: DataFrame, name: String,
                  outputMode: String = "append"): DataFrame = {
    val spark = stream.sparkSession
    graft.core.PlanStats.markStreamingStart()
    val q: StreamingQuery = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
