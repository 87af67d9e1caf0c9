package graft.streaming

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** ONLINE Page–Hinkley drift detection on `transformWithState` — the
  * streaming twin of the batch detector (gate q411): the same
  * expanding-mean deviation walk, computed as days CLOSE in event
  * time rather than in a batch scan.
  *
  * Mechanics: input rows (epoch-day, value-cents) accumulate into a
  * per-day (count, sum) MapState; each newly-seen day registers an
  * event-time timer at its day boundary. When the watermark passes a
  * boundary the timer fires, every closed day drains IN DAY ORDER
  * through the walk state (cumN, cumS, PH, running min) and emits its
  * detector row — so arrival order inside a day never matters, and
  * the emitted walk is bit-identical to the batch query's (the spec
  * asserts equality row-for-row; the gate faces the same DuckDB
  * oracle as q411).
  *
  * The day means replicate Spark's `round(double)` exactly
  * (BigDecimal.valueOf → HALF_UP — the same arithmetic the batch
  * column does), so streaming and batch cannot diverge by a rounding
  * mode.
  *
  * Scale shape: state is O(open days) + O(1) walk per metric key; the
  * stream partitions by metric (here one demo metric — a fleet of
  * thousands of monitored metrics shards naturally by the key).
  */
object TwsDrift {

  /** One emitted detector row per closed day (columns = gate q411). */
  case class PhOut(day: java.sql.Date, nd: Long, x_e4: Long,
                   mu_e4: Long, ph_e4: Long, gap_e4: Long, alarm: Long)

  /** The walk state between days. */
  case class PhWalk(cumN: Long, cumS: Long, ph: Long, runmin: Long,
                    started: Boolean)

  /** Spark's Round(double, 0) semantics: shortest-decimal BigDecimal,
    * HALF_UP — used so the online walk matches the batch column. */
  private[streaming] def sparkRound(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  class TwsPageHinkley(deltaE4: Long, lambdaE4: Long)
      extends StatefulProcessor[Long, (Long, Long), PhOut] {

    @transient private var days: MapState[Long, (Long, Long)] = _
    @transient private var walk: ValueState[PhWalk] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      days = getHandle.getMapState[Long, (Long, Long)]("days",
        Encoders.scalaLong,
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
      walk = getHandle.getValueState[PhWalk]("walk",
        Encoders.product[PhWalk], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long,
                                 rows: Iterator[(Long, Long)],
                                 timerValues: TimerValues)
        : Iterator[PhOut] = {
      // accumulate the micro-batch into a local map first (the q228
      // count-min batching precedent, r13): state-store ops are the
      // per-event cost — one MapState read+write per TOUCHED DAY per
      // micro-batch instead of one per event. Addition is
      // order-free, so the final state is bit-identical.
      val acc = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
      rows.foreach { case (day, v) =>
        val c = acc.getOrElse(day, (0L, 0L))
        acc(day) = (c._1 + 1L, c._2 + v)
      }
      acc.foreach { case (day, (n, s)) =>
        val cur =
          if (days.containsKey(day)) days.getValue(day)
          else {
            // first sighting of this day: arm its boundary timer
            getHandle.registerTimer((day + 1L) * 86400000L)
            (0L, 0L)
          }
        days.updateValue(day, (cur._1 + n, cur._2 + s))
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long,
                                    timerValues: TimerValues,
                                    info: ExpiredTimerInfo)
        : Iterator[PhOut] = {
      // drain EVERY day whose boundary the watermark has passed, in
      // day order — robust to multiple timers expiring in one batch
      // and to their firing order
      val closed = days.keys().toSeq
        .filter(d => (d + 1L) * 86400000L <= info.getExpiryTimeInMs)
        .sorted
      if (closed.isEmpty) return Iterator.empty
      var w =
        if (walk.exists()) walk.get()
        else PhWalk(0L, 0L, 0L, 0L, started = false)
      val out = closed.map { d =>
        val (nd, sd) = days.getValue(d)
        days.removeKey(d)
        val x = sparkRound(10000.0 * sd.toDouble / nd.toDouble)
        val cumN = w.cumN + nd
        val cumS = w.cumS + sd
        val mu = sparkRound(10000.0 * cumS.toDouble / cumN.toDouble)
        val ph = w.ph + (x - mu - deltaE4)
        val runmin = if (w.started) math.min(w.runmin, ph) else ph
        w = PhWalk(cumN, cumS, ph, runmin, started = true)
        PhOut(java.sql.Date.valueOf(LocalDate.ofEpochDay(d)), nd, x, mu,
          ph, ph - runmin, if (ph - runmin > lambdaE4) 1L else 0L)
      }
      walk.update(w)
      out.iterator
    }
  }

  /** The q411 detector over an event stream, keyed to one demo
    * metric. The replay sentinel is NOT filtered out — a filter on
    * user_id would push below the EventTimeWatermark node and the
    * watermark would never reach the sentinel's timestamp, so the
    * final real day's boundary timer would never fire (the bug this
    * comment commemorates). Instead the sentinel flows in as a
    * far-future day whose own boundary timer sits beyond the final
    * watermark: it never closes, never emits, never joins the walk. */
  def pageHinkley(eSec: DataFrame, deltaE4: Long, lambdaE4: Long)
      : org.apache.spark.sql.Dataset[PhOut] = {
    implicit val pairEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.scalaLong)
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[PhOut]
    eSec
      .withWatermark("ts_s", "0 seconds")
      .select(unix_date(to_date(col("ts_s"))).cast("long"),
        round(col("value") * 100).cast("long"))
      .as[(Long, Long)]
      .groupByKey(_ => 0L)
      .transformWithState(new TwsPageHinkley(deltaE4, lambdaE4),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Bounded replay through the sentinel-flush harness: the sentinel
    * advances the watermark past the last real day, every day timer
    * fires, and the full detector walk flushes. */
  def replayFromParquet(spark: SparkSession, srcParquet: String,
                        deltaE4: Long = 250000L,
                        lambdaE4: Long = 5000000L): DataFrame =
    Streaming.withRocksDbStateStore(spark) {
      Streaming.sentinelReplay(spark, srcParquet)(eSec =>
        pageHinkley(eSec, deltaE4, lambdaE4).toDF())
    }
}
