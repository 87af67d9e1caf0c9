package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** STREAMING count-min sketch on `transformWithState` — the stateful
  * sketch shape a 100 TB ingest actually runs: per-partition partial
  * sketches are exactly mergeable (counter-wise sums), so the state
  * here is the 4×64 counter grid (O(1) per key, independent of
  * cardinality), while the exact per-user counts ride along ONLY as
  * the audit surface (the sketch-vs-truth gate discipline of
  * q41/q228/q506 applied to the streaming twin).
  *
  * Mechanics: every event increments 4 hashed cells
  * (portable-md5 rows j=0..3, width 64) plus the user's exact count;
  * ONE flush timer (armed on first input, set one day before the
  * replay sentinel's 2100-01-01 timestamp) fires when the sentinel
  * advances the watermark, and every user emits
  * (exact, CMS estimate = min over the 4 cells, relative
  * overestimate). The DuckDB oracle replays the identical grid in
  * SQL — same hash, same cells, same min — so a single dropped or
  * double-counted increment anywhere in the stream shifts the hash.
  */
object TwsCountMin {

  /** One audit row per user at flush. */
  case class CmOut(user_id: Long, n_exact: Long, n_est: Long,
                   over_e6: Long)

  private val depth = 4
  private val width = 64L
  /** One day before the sentinel: fires once the sentinel micro-batch
    * advances the watermark to 2100-01-01. */
  private val flushAtMs = (4102444800L - 86400L) * 1000L

  class TwsCms extends StatefulProcessor[Long, Long, CmOut] {

    @transient private var cells: MapState[Long, Long] = _
    @transient private var exact: MapState[Long, Long] = _
    @transient private var armed: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cells = getHandle.getMapState[Long, Long]("cells",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      exact = getHandle.getMapState[Long, Long]("exact",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      armed = getHandle.getValueState[Boolean]("armed",
        Encoders.scalaBoolean, TTLConfig.NONE)
    }

    private def cellOf(j: Int, user: Long): Long =
      j * width + graft.functions.PortableHash
        .hash60Jvm(s"cm:$j:$user") % width

    override def handleInputRows(key: Long, rows: Iterator[Long],
                                 timerValues: TimerValues)
        : Iterator[CmOut] = {
      if (!armed.exists()) {
        getHandle.registerTimer(flushAtMs)
        armed.update(true)
      }
      // batch the micro-batch LOCALLY first: one state-store write
      // per touched user/cell per micro-batch instead of five per
      // EVENT (RocksDB write amplification was the whole cost of the
      // naive per-row form — 12 s for 100k events at sf0.1), and the
      // four md5 cell hashes compute once per DISTINCT user, not per
      // event.
      val localExact = scala.collection.mutable.LongMap.empty[Long]
      rows.foreach { user =>
        if (user >= 0L) // the replay sentinel (-1) never counts
          localExact(user) = localExact.getOrElse(user, 0L) + 1L
      }
      val localCells = scala.collection.mutable.LongMap.empty[Long]
      localExact.foreach { case (user, inc) =>
        var j = 0
        while (j < depth) {
          val c = cellOf(j, user)
          localCells(c) = localCells.getOrElse(c, 0L) + inc
          j += 1
        }
        exact.updateValue(user,
          (if (exact.containsKey(user)) exact.getValue(user) else 0L)
            + inc)
      }
      localCells.foreach { case (c, inc) =>
        cells.updateValue(c,
          (if (cells.containsKey(c)) cells.getValue(c) else 0L) + inc)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    info: ExpiredTimerInfo)
        : Iterator[CmOut] = {
      exact.iterator().map { case (user, n) =>
        var est = Long.MaxValue
        var j = 0
        while (j < depth) {
          est = math.min(est, cells.getValue(cellOf(j, user)))
          j += 1
        }
        CmOut(user, n, est,
          math.round((est - n).toDouble / n.toDouble * 1000000.0))
      }
    }
  }

  /** The sketch over an event stream (one grid — a fleet shards by
    * metric key). */
  def countMin(eSec: DataFrame)
      : org.apache.spark.sql.Dataset[CmOut] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[CmOut]
    eSec
      .withWatermark("ts_s", "0 seconds")
      .select(col("user_id").cast("long"))
      .as[Long]
      .groupByKey(_ => 0L)
      .transformWithState(new TwsCms, TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Bounded replay through the sentinel-flush harness. */
  def replayFromParquet(spark: SparkSession, srcParquet: String)
      : DataFrame =
    Streaming.withRocksDbStateStore(spark) {
      Streaming.sentinelReplay(spark, srcParquet)(eSec =>
        countMin(eSec).toDF())
    }
}
