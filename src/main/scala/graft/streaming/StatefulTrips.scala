package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{BikeStatus, Trip, TripParams}
import org.apache.spark.sql.graftx.Haversine

/** Stateful streaming trip derivation — the
  * `flatMapGroupsWithState` formulation of the reference's analytical
  * core (SURVEY.md §2.9): per-bike state carries the open trip; a
  * gap beyond `maxGapSeconds` closes it and emits a [[Trip]].
  *
  * Differences from the batch `Trips.deriveTrips` are deliberate and
  * documented: this is the CORRECTED semantics (one row per actual
  * trip, endpoint coordinates at the endpoints), because streaming
  * cannot reproduce the reference's one-row-per-bike-per-window quirk
  * — there is no window to group over. Batch remains the oracle-
  * checked source of truth; StatefulTripsSpec cross-checks this
  * implementation against `Trips.deriveTripsSessioned`.
  *
  * State is O(1) per active bike (the open trip accumulator only —
  * never the snapshot history), the property that keeps a
  * fleet-scale stream's state store bounded.
  */
object StatefulTrips {

  /** Open-trip accumulator carried in the state store. */
  case class OpenTrip(
      lastTs: Long, lastLat: Double, lastLon: Double,
      provider: String,
      startTs: Long, startLat: Double, startLon: Double,
      durationMin: Double, distanceKm: Double, segments: Long)

  private def emitIfValid(bike: String, t: OpenTrip,
                          p: TripParams): Option[Trip] =
    if (t.segments >= p.minSegments && t.distanceKm > 0 &&
      t.durationMin >= p.minTripMinutes && t.durationMin <= p.maxTripMinutes)
      Some(Trip(bike, t.provider,
        new Timestamp(t.startTs * 1000), new Timestamp(t.lastTs * 1000),
        t.startLat, t.startLon, t.lastLat, t.lastLon,
        t.durationMin, t.distanceKm, t.segments))
    else None

  /** Fold one bike's new snapshots (sorted by the caller) into the
    * open-trip state; returns completed trips. */
  private[graft] def advance(bike: String, sorted: Seq[BikeStatus],
                                 state: Option[OpenTrip], p: TripParams)
      : (Seq[Trip], Option[OpenTrip]) = {
    var open = state
    val out = Seq.newBuilder[Trip]
    sorted.foreach { s =>
      val ts = s.timestamp.getTime / 1000
      open match {
        case None =>
          open = Some(OpenTrip(ts, s.lat, s.lon, s.provider_id,
            ts, s.lat, s.lon, 0.0, 0.0, 0L))
        case Some(t) =>
          val gap = ts - t.lastTs
          val moved = s.lat != t.lastLat || s.lon != t.lastLon
          if (gap > p.maxGapSeconds) {
            // silence closed the previous trip; start fresh
            out ++= emitIfValid(bike, t, p)
            open = Some(OpenTrip(ts, s.lat, s.lon, s.provider_id,
              ts, s.lat, s.lon, 0.0, 0.0, 0L))
          } else if (gap >= p.minGapSeconds && moved) {
            // first VALID segment anchors the trip start at its
            // predecessor snapshot — matching the batch sessioned
            // derivation's min(prev_time)/min_by(prev_pos) over valid
            // segments, not the session's first (possibly invalid)
            // snapshot
            val anchored =
              if (t.segments == 0L)
                t.copy(startTs = t.lastTs,
                  startLat = t.lastLat, startLon = t.lastLon)
              else t
            open = Some(anchored.copy(
              lastTs = ts, lastLat = s.lat, lastLon = s.lon,
              durationMin = anchored.durationMin + gap / 60.0,
              distanceKm = anchored.distanceKm +
                Haversine.compute(anchored.lastLat, anchored.lastLon,
                  s.lat, s.lon),
              segments = anchored.segments + 1))
          } else {
            // too-fast ping or stationary: advance position only
            open = Some(t.copy(lastTs = ts, lastLat = s.lat, lastLon = s.lon))
          }
      }
    }
    (out.result(), open)
  }

  /** Streaming entry point.
    *
    * `flushOnSilence = true` (production): a processing-time timeout
    * of maxGapSeconds flushes the open trip when a bike goes quiet.
    * Pass `false` for bounded replays (Trigger.AvailableNow): a
    * pending processing-time timeout keeps an AvailableNow query
    * scheduling empty micro-batches until the timeout fires — an
    * hour-long busy loop for the default gap. */
  def deriveTrips(snapshots: Dataset[BikeStatus],
                  p: TripParams = TripParams(),
                  flushOnSilence: Boolean = true): Dataset[Trip] = {
    implicit val tripEnc = Encoders.product[Trip]
    implicit val stateEnc = Encoders.product[OpenTrip]
    implicit val strEnc = Encoders.STRING

    val timeoutConf =
      if (flushOnSilence) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    snapshots
      .groupByKey(_.bike_id)
      .flatMapGroupsWithState[OpenTrip, Trip](
        OutputMode.Append(), timeoutConf) {
        (bike: String, rows: Iterator[BikeStatus],
         state: GroupState[OpenTrip]) =>
          if (state.hasTimedOut) {
            // silence flush: emit whatever trip is open
            val t = state.getOption
            state.remove()
            t.flatMap(emitIfValid(bike, _, p)).iterator
          } else {
            val sorted = rows.toSeq.sortBy(s => (s.timestamp.getTime,
              s.lat, s.lon))
            val (done, open) = advance(bike, sorted, state.getOption, p)
            open match {
              case Some(o) =>
                state.update(o)
                if (flushOnSilence)
                  state.setTimeoutDuration(p.maxGapSeconds * 1000)
              case None => state.remove()
            }
            done.iterator
          }
      }
  }

  // -------------------------------------------------------------------
  // Exact (oracle-gateable) variant: integer-second durations and
  // per-segment e4-rounded distances, the `Trips.deriveTripsExact`
  // discipline applied to the stateful fold. Every emitted number is
  // either a pass-through input double (endpoint coordinates) or an
  // integer accumulated in integers — bit-identical to a SQL engine
  // computing the same session decomposition, regardless of
  // partitioning, batch boundaries, or summation order.
  // -------------------------------------------------------------------

  /** Exact trip: integer-second duration, e4-km integer distance. */
  case class ExactTrip(
      bike_id: String, provider_id: String,
      trip_start: Timestamp, trip_end: Timestamp,
      start_lat: Double, start_lon: Double,
      end_lat: Double, end_lon: Double,
      duration_s: Long, distance_e4: Long, segment_count: Long)

  /** Open-trip accumulator for the exact variant (integers only). */
  case class OpenTripE4(
      lastTs: Long, lastLat: Double, lastLon: Double,
      provider: String,
      startTs: Long, startLat: Double, startLon: Double,
      durationS: Long, distE4: Long, segments: Long)

  private def emitIfValidE4(bike: String, t: OpenTripE4,
                            p: TripParams): Option[ExactTrip] = {
    val minS = (p.minTripMinutes * 60).toLong
    val maxS = (p.maxTripMinutes * 60).toLong
    if (t.segments >= p.minSegments && t.distE4 > 0 &&
      t.durationS >= minS && t.durationS <= maxS)
      Some(ExactTrip(bike, t.provider,
        new Timestamp(t.startTs * 1000), new Timestamp(t.lastTs * 1000),
        t.startLat, t.startLon, t.lastLat, t.lastLon,
        t.durationS, t.distE4, t.segments))
    else None
  }

  /** [[advance]] with exact accumulators. Semantics are identical —
    * same session boundaries, same segment-validity test, same
    * start-anchoring at the first valid segment's predecessor — only
    * the accumulated measures change: gap seconds sum as Longs and
    * each segment's haversine rounds to an e4-km Long BEFORE the sum
    * (`operators/Trips.scala` deriveTripsExact:173). */
  private[graft] def advanceE4(bike: String, sorted: Seq[BikeStatus],
                               state: Option[OpenTripE4], p: TripParams)
      : (Seq[ExactTrip], Option[OpenTripE4]) = {
    var open = state
    val out = Seq.newBuilder[ExactTrip]
    sorted.foreach { s =>
      val ts = s.timestamp.getTime / 1000
      open match {
        case None =>
          open = Some(OpenTripE4(ts, s.lat, s.lon, s.provider_id,
            ts, s.lat, s.lon, 0L, 0L, 0L))
        case Some(t) =>
          val gap = ts - t.lastTs
          val moved = s.lat != t.lastLat || s.lon != t.lastLon
          if (gap > p.maxGapSeconds) {
            out ++= emitIfValidE4(bike, t, p)
            open = Some(OpenTripE4(ts, s.lat, s.lon, s.provider_id,
              ts, s.lat, s.lon, 0L, 0L, 0L))
          } else if (gap >= p.minGapSeconds && moved) {
            val anchored =
              if (t.segments == 0L)
                t.copy(startTs = t.lastTs,
                  startLat = t.lastLat, startLon = t.lastLon)
              else t
            open = Some(anchored.copy(
              lastTs = ts, lastLat = s.lat, lastLon = s.lon,
              durationS = anchored.durationS + gap,
              distE4 = anchored.distE4 + math.round(
                Haversine.compute(anchored.lastLat, anchored.lastLon,
                  s.lat, s.lon) * 10000),
              segments = anchored.segments + 1))
          } else {
            open = Some(t.copy(lastTs = ts, lastLat = s.lat, lastLon = s.lon))
          }
      }
    }
    (out.result(), open)
  }

  /** Streaming entry point for the exact variant — identical
    * structure to [[deriveTrips]]. */
  def deriveTripsE4(snapshots: Dataset[BikeStatus],
                    p: TripParams = TripParams(),
                    flushOnSilence: Boolean = true): Dataset[ExactTrip] = {
    implicit val tripEnc = Encoders.product[ExactTrip]
    implicit val stateEnc = Encoders.product[OpenTripE4]
    implicit val strEnc = Encoders.STRING

    val timeoutConf =
      if (flushOnSilence) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    snapshots
      .groupByKey(_.bike_id)
      .flatMapGroupsWithState[OpenTripE4, ExactTrip](
        OutputMode.Append(), timeoutConf) {
        (bike: String, rows: Iterator[BikeStatus],
         state: GroupState[OpenTripE4]) =>
          if (state.hasTimedOut) {
            val t = state.getOption
            state.remove()
            t.flatMap(emitIfValidE4(bike, _, p)).iterator
          } else {
            val sorted = rows.toSeq.sortBy(s => (s.timestamp.getTime,
              s.lat, s.lon))
            val (done, open) = advanceE4(bike, sorted, state.getOption, p)
            open match {
              case Some(o) =>
                state.update(o)
                if (flushOnSilence)
                  state.setTimeoutDuration(p.maxGapSeconds * 1000)
              case None => state.remove()
            }
            done.iterator
          }
      }
  }

  /** Bounded replay of a snapshot DataFrame (`bike_id, provider_id,
    * lat, lon, ts` — `ts` a second-granularity timestamp) through the
    * streaming [[deriveTripsE4]], draining with one AvailableNow run.
    *
    * Flush strategy: one SENTINEL snapshot per bike at
    * `max(ts) + maxGapSeconds + 3600` — its gap exceeds the session
    * bound, so the fold closes and emits whatever trip is open (the
    * gap > maxGap branch), exactly the silence-flush the production
    * ProcessingTimeTimeout performs; the sentinel's own fresh
    * zero-segment trip is never emitted. This keeps the bounded
    * replay free of processing-time timers (a pending timer makes an
    * AvailableNow query busy-loop for the whole gap) while exercising
    * the very same fold the unbounded production stream runs.
    *
    * The whole input is written as ONE parquet file so the file
    * source delivers it in ONE micro-batch: the NoTimeout fold relies
    * on per-key event-time order across batches, which a multi-file
    * replay source does not guarantee. (Production uses watermarked
    * sources where ProcessingTimeTimeout covers stragglers.) */
  def replayE4FromSnapshots(spark: SparkSession,
                            snaps: org.apache.spark.sql.DataFrame,
                            p: TripParams): org.apache.spark.sql.DataFrame = {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger

    val in = Files.createTempDirectory("graft_trips_in")
    val out = Files.createTempDirectory("graft_trips_out")
    val ckpt = Files.createTempDirectory("graft_trips_ckpt")

    val maxTs = snaps.agg(max(col("ts"))).head.getTimestamp(0)
    val sentinelTs = new Timestamp(
      (maxTs.getTime / 1000 + p.maxGapSeconds + 3600) * 1000)
    val sentinels = snaps.select("bike_id", "provider_id").distinct()
      .withColumn("lat", lit(0.0)).withColumn("lon", lit(0.0))
      .withColumn("ts", lit(sentinelTs))
    val full = snaps.select("bike_id", "provider_id", "lat", "lon", "ts")
      .unionByName(sentinels
        .select("bike_id", "provider_id", "lat", "lon", "ts"))
      .select(col("bike_id"), col("provider_id"), col("lat"), col("lon"),
        lit(false).as("is_reserved"), lit(false).as("is_disabled"),
        col("ts").as("timestamp"))
    full.coalesce(1).write.parquet(in.toString + "/data")

    implicit val statusEnc = Encoders.product[BikeStatus]
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "4") // few state stores for a bounded replay
    try {
      val stream = spark.readStream
        .schema(full.schema).parquet(in.toString + "/data")
        .as[BikeStatus]
      graft.core.PlanStats.markStreamingStart()
      val q = deriveTripsE4(stream, p, flushOnSilence = false)
        .writeStream
        .format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(key, prev)
    spark.read.parquet(out.toString)
  }
}
