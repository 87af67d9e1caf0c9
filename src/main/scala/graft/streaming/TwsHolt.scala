package graft.streaming

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** ONLINE Holt linear-trend smoothing on `transformWithState` — the
  * streaming twin of the batch walk (gate q442): the same level+trend
  * recurrence (α=1/2, β=1/4), computed as days CLOSE in event time
  * rather than in a single-partition batch walk.
  *
  * Mechanics mirror [[TwsDrift]]: purchase rows accumulate a per-day
  * cents sum in MapState, each newly-seen day arms a boundary timer,
  * and when the watermark passes a boundary every closed day drains
  * IN DAY ORDER through the walk state. The Holt init needs TWO days
  * (l₁=y₁, b₁=y₂−y₁), so the first closed day is STASHED in the walk
  * state and both rows emit when the second day closes — after which
  * each closing day steps the recurrence. Each level/trend update
  * rounds HALF_UP on the cents lattice from an exact-long pre-sum
  * (the same `Exact.roundHalfUp` arithmetic the batch walk uses), so
  * streaming and batch cannot diverge by a rounding mode — the gate
  * faces the SAME DuckDB recursive-CTE oracle as q442, and the spec
  * asserts streaming == batch row-for-row.
  *
  * Non-purchase rows (including the replay sentinel) flow through the
  * watermark untouched but never touch state — a filter operator
  * would sit below the EventTimeWatermark node and starve the final
  * boundary timer (the TwsDrift lesson).
  *
  * Scale shape: state is O(open days) + O(1) walk per series key; a
  * fleet of series shards naturally by the key.
  */
object TwsHolt {

  /** One emitted row per closed day (columns = gate q442). */
  case class HoltOut(d: Long, y: Long, level: Long, trend: Long,
                     err: Long)

  /** Walk state: the Holt (level, trend) pair once started, plus the
    * stashed first day while waiting for the second. */
  case class HoltWalk(l: Long, b: Long, started: Boolean,
                      hasFirst: Boolean, d1: Long, y1: Long)

  class TwsHoltProc
      extends StatefulProcessor[Long, (Long, Long, Long), HoltOut] {

    @transient private var days: MapState[Long, Long] = _
    @transient private var walk: ValueState[HoltWalk] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      days = getHandle.getMapState[Long, Long]("days",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      walk = getHandle.getValueState[HoltWalk]("walk",
        Encoders.product[HoltWalk], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long,
                                 rows: Iterator[(Long, Long, Long)],
                                 timerValues: TimerValues)
        : Iterator[HoltOut] = {
      // micro-batch accumulated locally first (q228 count-min
      // batching precedent, r13): one MapState read+write per
      // touched day per batch, not per event; sums are order-free so
      // the state is bit-identical
      val acc = scala.collection.mutable.HashMap.empty[Long, Long]
      rows.foreach { case (day, cents, isPurchase) =>
        if (isPurchase == 1L)
          acc(day) = acc.getOrElse(day, 0L) + cents
      }
      acc.foreach { case (day, cents) =>
        val cur =
          if (days.containsKey(day)) days.getValue(day)
          else {
            getHandle.registerTimer((day + 1L) * 86400000L)
            0L
          }
        days.updateValue(day, cur + cents)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long,
                                    timerValues: TimerValues,
                                    info: ExpiredTimerInfo)
        : Iterator[HoltOut] = {
      val closed = days.keys().toSeq
        .filter(d => (d + 1L) * 86400000L <= info.getExpiryTimeInMs)
        .sorted
      if (closed.isEmpty) return Iterator.empty
      var w =
        if (walk.exists()) walk.get()
        else HoltWalk(0L, 0L, started = false, hasFirst = false, 0L, 0L)
      val out = Seq.newBuilder[HoltOut]
      closed.foreach { d =>
        val y = days.getValue(d)
        days.removeKey(d)
        if (!w.started) {
          if (!w.hasFirst) {
            w = w.copy(hasFirst = true, d1 = d, y1 = y)
          } else {
            // second day closes the init: emit day 1, then walk day 2
            val l0 = w.y1
            val b0 = y - w.y1
            out += HoltOut(w.d1, w.y1, l0, b0, 0L)
            val err = y - (l0 + b0)
            val lNew = graft.analytics.Exact.roundHalfUp(
              (y + l0 + b0).toDouble * 0.5)
            val bNew = graft.analytics.Exact.roundHalfUp(
              (lNew - l0 + 3L * b0).toDouble * 0.25)
            w = HoltWalk(lNew, bNew, started = true, hasFirst = true,
              w.d1, w.y1)
            out += HoltOut(d, y, lNew, bNew, err)
          }
        } else {
          val err = y - (w.l + w.b)
          val lNew = graft.analytics.Exact.roundHalfUp(
            (y + w.l + w.b).toDouble * 0.5)
          val bNew = graft.analytics.Exact.roundHalfUp(
            (lNew - w.l + 3L * w.b).toDouble * 0.25)
          w = w.copy(l = lNew, b = bNew)
          out += HoltOut(d, y, lNew, bNew, err)
        }
      }
      walk.update(w)
      out.result().iterator
    }
  }

  /** The q442 smoother over an event stream, keyed to one demo
    * series. Non-purchase rows carry a zero flag instead of being
    * filtered (sentinel discipline — see the scaladoc). */
  def holt(eSec: DataFrame)
      : org.apache.spark.sql.Dataset[HoltOut] = {
    implicit val tripleEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[HoltOut]
    eSec
      .withWatermark("ts_s", "0 seconds")
      .select(unix_date(to_date(col("ts_s"))).cast("long"),
        round(col("value") * 100).cast("long"),
        (col("event_type") === "purchase").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_ => 0L)
      .transformWithState(new TwsHoltProc,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Bounded replay through the sentinel-flush harness (the q426
    * lifecycle): the sentinel advances the watermark past the last
    * real day, every day timer fires, and the full walk flushes. */
  def replayFromParquet(spark: SparkSession, srcParquet: String)
      : DataFrame =
    Streaming.withRocksDbStateStore(spark) {
      Streaming.sentinelReplay(spark, srcParquet)(eSec =>
        holt(eSec).toDF())
    }
}
