package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
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
}
