package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Sessionization on the `transformWithState` operator — the
  * arbitrary-state API that supersedes `flatMapGroupsWithState`
  * (composable typed state variables, first-class timers, state TTL,
  * and RocksDB-only state so the operator scales off-heap by
  * construction).
  *
  * Same semantics as [[Streaming.statefulSessions]] (inclusive gap:
  * a gap of exactly `gapSec` continues the session; session_end =
  * last + gap), so all three formulations — built-in
  * `session_window` (q53), `flatMapGroupsWithState` (q103), and this
  * one (q269) — are gated against the SAME batch gaps-and-islands
  * oracle. State is one O(1) ValueState per active key plus one
  * event-time timer at the session's gap edge.
  *
  * Timer discipline: a key re-registers its timer whenever new events
  * extend the session (the stale timer is deleted — timers are
  * per-key-per-timestamp, not a single slot), and an expired timer
  * only closes the session if it still matches the current gap edge,
  * so a timer racing a late extension can never truncate a live
  * session.
  */
class TwsSessionizer(gapSec: Long)
    extends StatefulProcessor[Long, (Long, java.sql.Timestamp),
      Streaming.SessionOut] {

  @transient private var state: ValueState[Streaming.SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Streaming.SessionState](
      "session", Encoders.product[Streaming.SessionState], TTLConfig.NONE)

  private def edgeMs(s: Streaming.SessionState): Long =
    (s.last + gapSec) * 1000 + 1

  private def close(user: Long,
                    s: Streaming.SessionState): Streaming.SessionOut =
    Streaming.SessionOut(user,
      new java.sql.Timestamp(s.start * 1000),
      new java.sql.Timestamp((s.last + gapSec) * 1000), s.n)

  override def handleInputRows(
      user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[Streaming.SessionOut] = {
    // one micro-batch may deliver a key's events unsorted
    val sorted = rows.map(_._2.getTime / 1000).toSeq.sorted
    var st = if (state.exists()) Some(state.get()) else None
    val prevEdge = st.map(edgeMs)
    val out = Seq.newBuilder[Streaming.SessionOut]
    sorted.foreach { ts =>
      st match {
        case None => st = Some(Streaming.SessionState(ts, ts, 1L))
        case Some(s) if ts - s.last > gapSec =>
          out += close(user, s)
          st = Some(Streaming.SessionState(ts, ts, 1L))
        case Some(s) =>
          st = Some(s.copy(last = math.max(s.last, ts), n = s.n + 1))
      }
    }
    st.foreach { s =>
      state.update(s)
      val e = edgeMs(s)
      if (!prevEdge.contains(e)) {
        prevEdge.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(e)
      }
    }
    out.result().iterator
  }

  override def handleExpiredTimer(
      user: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Streaming.SessionOut] =
    if (state.exists()) {
      val s = state.get()
      // a stale timer (session since extended) must not close anything
      if (expiredTimerInfo.getExpiryTimeInMs >= edgeMs(s)) {
        state.clear()
        Iterator.single(close(user, s))
      } else Iterator.empty
    } else Iterator.empty
}

/** Final top-k values per key, held in a [[ListState]] and emitted
  * only when the end-of-stream timer fires — the emit-on-close
  * pattern: state absorbs every micro-batch (bounded: the list is
  * truncated to k on every update, so state is O(k) per key no matter
  * how long the stream runs), and the single emission happens when
  * the watermark passes the registered flush timestamp (here the
  * sentinel's 2100 watermark passing the fixed 2090 flush point).
  * Output rows are (user, rank, value_e4) — fully deterministic
  * because the k-selection orders by (value desc) with exact e4
  * longs. */
class TwsTopK(k: Int, flushEpochMs: Long)
    extends StatefulProcessor[Long, (Long, Long), (Long, Int, Long)] {

  @transient private var state
      : org.apache.spark.sql.streaming.ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getListState[Long](
      "topk", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      user: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Int, Long)] = {
    val merged = (state.get().toSeq ++ rows.map(_._2))
      .sorted(Ordering[Long].reverse).take(k)
    state.put(merged.toArray)
    // idempotent: re-registering the same timestamp is a no-op slot
    getHandle.registerTimer(flushEpochMs)
    Iterator.empty
  }

  override def handleExpiredTimer(
      user: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Int, Long)] = {
    val out = state.get().toSeq.sorted(Ordering[Long].reverse)
      .zipWithIndex.map { case (v, i) => (user, i + 1, v) }
    state.clear()
    out.iterator
  }
}

/** Per-key per-category running counts in a [[MapState]], emitted at
  * the end-of-stream timer — the state shape of a long-running
  * per-entity profile (bounded by the category cardinality, not the
  * stream length). */
class TwsCategoryCounts(flushEpochMs: Long)
    extends StatefulProcessor[Long, (Long, String), (Long, String, Long)] {

  @transient private var state
      : org.apache.spark.sql.streaming.MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getMapState[String, Long](
      "cat_counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      user: Long, rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, String, Long)] = {
    // micro-batch counted locally first (q228 count-min batching
    // precedent, r13): one MapState read+write per touched category
    // per batch, not per event; counts are order-free so the state
    // is bit-identical
    val acc = scala.collection.mutable.HashMap.empty[String, Long]
    rows.foreach { case (_, cat) =>
      acc(cat) = acc.getOrElse(cat, 0L) + 1L
    }
    acc.foreach { case (cat, n) =>
      val cur = if (state.containsKey(cat)) state.getValue(cat) else 0L
      state.updateValue(cat, cur + n)
    }
    getHandle.registerTimer(flushEpochMs)
    Iterator.empty
  }

  override def handleExpiredTimer(
      user: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, String, Long)] = {
    val out = state.iterator().map { case (cat, n) => (user, cat, n) }.toSeq
    state.clear()
    out.sortBy(_._2).iterator
  }
}

object TwsSessions {

  /** [[Streaming.statefulSessions]] re-expressed on transformWithState.
    * The operator requires the RocksDB state store provider — callers
    * go through [[replayFromParquet]], which activates it. */
  def sessions(eSec: DataFrame, gapSec: Long)
      : org.apache.spark.sql.Dataset[Streaming.SessionOut] = {
    implicit val pairEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.TIMESTAMP)
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[Streaming.SessionOut]
    eSec
      .withWatermark("ts_s", "0 seconds")
      .select(col("user_id").cast("long"), col("ts_s"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new TwsSessionizer(gapSec),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Bounded replay through the sentinel-flush harness (the q53/q103
    * lifecycle): the sentinel advances the watermark past every gap
    * edge, the resulting no-data batch fires all timers, and every
    * trailing session flushes. The sentinel's own key (-1) never times
    * out inside the run and is filtered on read-back. */
  def replayFromParquet(spark: SparkSession, srcParquet: String,
                        gapSec: Long): DataFrame =
    Streaming.withRocksDbStateStore(spark) {
      Streaming.sentinelReplay(spark, srcParquet)(eSec =>
        sessions(eSec, gapSec).toDF())
        .filter(col("user_id") =!= -1L)
    }

  /** Flush point for the emit-on-close processors: 2090-01-01, safely
    * after every real event and before the 2100 sentinel, so the
    * sentinel's watermark advance fires every key's flush timer. */
  private val FlushEpochMs = 3786825600L * 1000L

  /** Replay through [[TwsTopK]]: per-user top-k event values held in
    * ListState, one emission per key at the flush timer. */
  def topKReplayFromParquet(spark: SparkSession, srcParquet: String,
                            k: Int): DataFrame =
    Streaming.withRocksDbStateStore(spark) {
      Streaming.sentinelReplay(spark, srcParquet) { eSec =>
        implicit val pairEnc = Encoders.tuple(Encoders.scalaLong,
          Encoders.scalaLong)
        implicit val keyEnc = Encoders.scalaLong
        implicit val outEnc = Encoders.tuple(Encoders.scalaLong,
          Encoders.scalaInt, Encoders.scalaLong)
        eSec
          .withWatermark("ts_s", "0 seconds")
          .select(col("user_id").cast("long"),
            round(col("value") * 10000).cast("long"))
          .as[(Long, Long)]
          .groupByKey(_._1)
          .transformWithState(new TwsTopK(k, FlushEpochMs),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "rank", "value_e4")
      }.filter(col("user_id") =!= -1L)
    }

  /** Replay through [[TwsCategoryCounts]]: per-user event-type counts
    * held in MapState, one emission per key at the flush timer. */
  def categoryCountsReplayFromParquet(spark: SparkSession,
                                      srcParquet: String): DataFrame =
    Streaming.withRocksDbStateStore(spark) {
      Streaming.sentinelReplay(spark, srcParquet) { eSec =>
        implicit val pairEnc = Encoders.tuple(Encoders.scalaLong,
          Encoders.STRING)
        implicit val keyEnc = Encoders.scalaLong
        implicit val outEnc = Encoders.tuple(Encoders.scalaLong,
          Encoders.STRING, Encoders.scalaLong)
        eSec
          .withWatermark("ts_s", "0 seconds")
          .select(col("user_id").cast("long"), col("event_type"))
          .as[(Long, String)]
          .groupByKey(_._1)
          .transformWithState(new TwsCategoryCounts(FlushEpochMs),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "event_type", "n")
      }.filter(col("user_id") =!= -1L)
    }
}
