package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BikeStatus, TripParams, Trips}

/** Trip-derivation semantics (`lambda/trips_lambda.py:94-163`),
  * including the reference's bug-as-spec quirks (SURVEY.md §7).
  * Fixture embeds known trips per FIXTURES.md §A. */
class TripsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // All timestamps UTC; window covers the whole day in Zurich local
  // time (UTC+1 on 2024-01-15).
  private def ts(hhmmss: String): Timestamp =
    Timestamp.valueOf(s"2024-01-15 $hhmmss")

  private def snap(bike: String, t: String, lat: Double, lon: Double) =
    BikeStatus(bike, "prov1", lat, lon, is_reserved = false,
      is_disabled = false, ts(t))

  private val winStart = Timestamp.valueOf("2024-01-15 00:00:00")
  private val winEnd = Timestamp.valueOf("2024-01-16 00:00:00")

  private def derive(rows: Seq[BikeStatus]) =
    Trips.deriveTrips(rows.toDS(), winStart, winEnd).collect()

  test("a valid two-segment trip is derived with correct aggregates") {
    // 10-min gaps, moving: two valid segments, total 20 min.
    val rows = Seq(
      snap("b1", "10:00:00", 47.37, 8.54),
      snap("b1", "10:10:00", 47.38, 8.55),
      snap("b1", "10:20:00", 47.39, 8.56))
    val out = derive(rows)
    assert(out.length == 1)
    val t = out.head
    assert(t.segment_count == 2)
    assert(math.abs(t.total_duration - 20.0) < 1e-9)
    assert(t.total_distance > 0)
    // tz shift: local_time = UTC+1 in January
    assert(t.trip_start == Timestamp.valueOf("2024-01-15 11:00:00"))
    assert(t.trip_end == Timestamp.valueOf("2024-01-15 11:20:00"))
  }

  test("gap bounds are inclusive (exactly 60s and 3600s kept)") {
    val rows = Seq(
      snap("b1", "10:00:00", 47.0, 8.0),
      snap("b1", "10:01:00", 47.1, 8.1),   // gap exactly 60 s
      snap("b1", "11:01:00", 47.2, 8.2))   // gap exactly 3600 s
    // 60 + 3600 s = 61 min total, so relax the trip-duration cap to
    // isolate the segment-gap edge from the HAVING bound
    val out = Trips.deriveTrips(rows.toDS(), winStart, winEnd,
      TripParams(maxTripMinutes = 120)).collect()
    assert(out.length == 1 && out.head.segment_count == 2)
  }

  test("gaps outside [60s, 3600s] break segments") {
    val rows = Seq(
      snap("b1", "10:00:00", 47.0, 8.0),
      snap("b1", "10:00:30", 47.1, 8.1),   // 30 s: too fast, dropped
      snap("b1", "11:00:31", 47.2, 8.2))   // 3601 s: too slow, dropped
    assert(derive(rows).isEmpty)
  }

  test("stationary snapshots are not segments (exact float equality)") {
    val rows = Seq(
      snap("b1", "10:00:00", 47.0, 8.0),
      snap("b1", "10:10:00", 47.0, 8.0),   // did not move
      snap("b1", "10:20:00", 47.0, 8.0))
    assert(derive(rows).isEmpty)
  }

  test("single-segment trips are dropped (needs >= 2)") {
    val rows = Seq(
      snap("b1", "10:00:00", 47.0, 8.0),
      snap("b1", "10:10:00", 47.1, 8.1))
    assert(derive(rows).isEmpty)
  }

  test("trips longer than 60 minutes total are dropped") {
    // 4 segments x 20 min = 80 min > 60.
    val rows = (0 to 4).map(i =>
      snap("b1", f"1${i / 3}:${(i * 20) % 60}%02d:00", 47.0 + i * 0.01, 8.0))
    assert(derive(rows).isEmpty)
  }

  test("reference quirk: one row per bike even for two distinct trips") {
    // Two separate 2-segment trips with a 2 h silence between them:
    // the reference groups by bike over the whole window -> 1 row,
    // and total_duration 40 min (the silence is not counted).
    val rows = Seq(
      snap("b1", "08:00:00", 47.0, 8.0),
      snap("b1", "08:10:00", 47.1, 8.1),
      snap("b1", "08:20:00", 47.2, 8.2),
      snap("b1", "10:20:00", 48.0, 9.0),
      snap("b1", "10:30:00", 48.1, 9.1),
      snap("b1", "10:40:00", 48.2, 9.2))
    val out = derive(rows)
    assert(out.length == 1)
    assert(out.head.segment_count == 4)
    assert(math.abs(out.head.total_duration - 40.0) < 1e-9)
    // quirk: start_lat is MIN(start_lat), not position-at-start
    assert(out.head.start_lat == 47.0)
    assert(out.head.end_lat == 48.2)
  }

  test("sessioned variant yields one row per actual trip") {
    val rows = Seq(
      snap("b1", "08:00:00", 47.0, 8.0),
      snap("b1", "08:10:00", 47.1, 8.1),
      snap("b1", "08:20:00", 47.2, 8.2),
      snap("b1", "10:20:00", 48.0, 9.0),
      snap("b1", "10:30:00", 48.1, 9.1),
      snap("b1", "10:40:00", 48.2, 9.2))
    val out = Trips.deriveTripsSessioned(rows.toDS()).collect()
    assert(out.length == 2)
  }

  test("window bounds are half-open and filter in local time") {
    // 23:30 UTC on Jan 14 = 00:30 local Jan 15 -> inside window.
    val rows = Seq(
      BikeStatus("b1", "p", 47.0, 8.0, false, false,
        Timestamp.valueOf("2024-01-14 23:30:00")),
      BikeStatus("b1", "p", 47.1, 8.1, false, false,
        Timestamp.valueOf("2024-01-14 23:40:00")),
      BikeStatus("b1", "p", 47.2, 8.2, false, false,
        Timestamp.valueOf("2024-01-14 23:50:00")))
    val out = derive(rows)
    assert(out.length == 1)
    assert(out.head.trip_start == Timestamp.valueOf("2024-01-15 00:30:00"))
  }

  test("duplicate (bike, timestamp) rows do not fabricate segments") {
    val rows = Seq(
      snap("b1", "10:00:00", 47.0, 8.0),
      snap("b1", "10:00:00", 47.0, 8.0),   // exact duplicate
      snap("b1", "10:10:00", 47.1, 8.1),
      snap("b1", "10:20:00", 47.2, 8.2))
    val out = derive(rows)
    // duplicate has gap 0 (dropped by BETWEEN) — trip still derived
    assert(out.length == 1 && out.head.segment_count == 2)
  }
}
