package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** ONLINE MacQueen k-means (K = 2, 1-D) on `transformWithState` —
  * the streaming twin of the batch walk (gate q485): each closing
  * day's revenue assigns to the nearer centroid and moves it to the
  * count-weighted running mean, clustering days into low/high
  * revenue regimes AS THEY CLOSE. This is MacQueen's 1967 online
  * variant — one point, one centroid update — where the gated q470
  * is Lloyd's batch variant; together they are the two classic
  * k-means execution disciplines.
  *
  * Mechanics mirror [[TwsHolt]]: per-day cents sums accumulate in
  * MapState, day-boundary timers drain closed days IN DAY ORDER
  * through the walk state. Init needs TWO days (c₁ = y₁, c₂ = y₂,
  * n = 1,1), so the first closed day is stashed and both emit when
  * the second closes. Assignment ties (|y−c₁| = |y−c₂|) go to
  * centroid 1; each centroid update rounds HALF_UP on the cents
  * lattice from exact-long sums (`Exact.roundHalfUp`), so streaming
  * and batch cannot diverge by a rounding mode — the gate faces the
  * SAME DuckDB recursive-CTE oracle as q485.
  *
  * Scale shape: state is O(open days) + O(K) per series key; a
  * fleet of series shards by the key.
  */
object TwsKmeans {

  /** One emitted row per closed day (columns = gate q485). */
  case class KmOut(d: Long, y: Long, k: Long, c1: Long, n1: Long,
                   c2: Long, n2: Long)

  /** Walk state: centroids + counts once started, plus the stashed
    * first day while waiting for the second. */
  case class KmWalk(c1: Long, n1: Long, c2: Long, n2: Long,
                    started: Boolean, hasFirst: Boolean,
                    d1: Long, y1: Long)

  /** One MacQueen step (shared verbatim with the batch walk). */
  private[graft] def step(w: KmWalk, y: Long): (Long, KmWalk) = {
    val k = if (math.abs(y - w.c1) <= math.abs(y - w.c2)) 1L else 2L
    if (k == 1L) {
      val c = graft.analytics.Exact.roundHalfUp(
        (w.c1 * w.n1 + y).toDouble / (w.n1 + 1L))
      (k, w.copy(c1 = c, n1 = w.n1 + 1L))
    } else {
      val c = graft.analytics.Exact.roundHalfUp(
        (w.c2 * w.n2 + y).toDouble / (w.n2 + 1L))
      (k, w.copy(c2 = c, n2 = w.n2 + 1L))
    }
  }

  class TwsKmeansProc
      extends StatefulProcessor[Long, (Long, Long, Long), KmOut] {

    @transient private var days: MapState[Long, Long] = _
    @transient private var walk: ValueState[KmWalk] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      days = getHandle.getMapState[Long, Long]("days",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      walk = getHandle.getValueState[KmWalk]("walk",
        Encoders.product[KmWalk], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long,
                                 rows: Iterator[(Long, Long, Long)],
                                 timerValues: TimerValues)
        : Iterator[KmOut] = {
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
        : Iterator[KmOut] = {
      val closed = days.keys().toSeq
        .filter(d => (d + 1L) * 86400000L <= info.getExpiryTimeInMs)
        .sorted
      if (closed.isEmpty) return Iterator.empty
      var w =
        if (walk.exists()) walk.get()
        else KmWalk(0L, 0L, 0L, 0L, started = false, hasFirst = false,
          0L, 0L)
      val out = Seq.newBuilder[KmOut]
      closed.foreach { d =>
        val y = days.getValue(d)
        days.removeKey(d)
        if (!w.started) {
          if (!w.hasFirst) {
            w = w.copy(hasFirst = true, d1 = d, y1 = y)
          } else {
            // second day closes the init: both centroids seed, the
            // first two rows emit with the shared post-init state
            w = KmWalk(w.y1, 1L, y, 1L, started = true,
              hasFirst = true, w.d1, w.y1)
            out += KmOut(w.d1, w.y1, 1L, w.c1, w.n1, w.c2, w.n2)
            out += KmOut(d, y, 2L, w.c1, w.n1, w.c2, w.n2)
          }
        } else {
          val (k, w2) = step(w, y)
          w = w2
          out += KmOut(d, y, k, w.c1, w.n1, w.c2, w.n2)
        }
      }
      walk.update(w)
      out.result().iterator
    }
  }

  /** The q485 online clusterer over an event stream, keyed to one
    * demo series; sentinel discipline as in [[TwsHolt]]. */
  def kmeans(eSec: DataFrame)
      : org.apache.spark.sql.Dataset[KmOut] = {
    implicit val tripleEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[KmOut]
    eSec
      .withWatermark("ts_s", "0 seconds")
      .select(unix_date(to_date(col("ts_s"))).cast("long"),
        round(col("value") * 100).cast("long"),
        (col("event_type") === "purchase").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_ => 0L)
      .transformWithState(new TwsKmeansProc,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Bounded replay through the sentinel-flush harness. */
  def replayFromParquet(spark: SparkSession, srcParquet: String)
      : DataFrame =
    Streaming.withRocksDbStateStore(spark) {
      Streaming.sentinelReplay(spark, srcParquet)(eSec =>
        kmeans(eSec).toDF())
    }
}
