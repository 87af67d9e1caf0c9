package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{BikeStatus, TripParams, Trips}
import graft.streaming.StatefulTrips

/** Stateful streaming trip derivation: the fold logic, and the
  * streaming run cross-checked against the batch sessioned variant. */
class StatefulTripsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(t: String) = Timestamp.valueOf(s"2024-01-15 $t")
  private def snap(bike: String, t: String, lat: Double, lon: Double) =
    BikeStatus(bike, "p", lat, lon, false, false, ts(t))

  private val twoTrips = Seq(
    snap("b1", "08:00:00", 47.0, 8.0),
    snap("b1", "08:10:00", 47.1, 8.1),
    snap("b1", "08:20:00", 47.2, 8.2),
    snap("b1", "10:20:00", 48.0, 9.0),   // 2 h silence -> trip closed
    snap("b1", "10:30:00", 48.1, 9.1),
    snap("b1", "10:40:00", 48.2, 9.2),
    snap("b1", "13:00:00", 40.0, 3.0))   // closes second trip

  test("advance() closes trips on silence and keeps O(1) state") {
    val (done, open) = StatefulTrips.advance(
      "b1", twoTrips, None, TripParams())
    assert(done.length == 2)
    assert(done.forall(_.segment_count == 2))
    assert(done.forall(t => math.abs(t.total_duration - 20.0) < 1e-9))
    assert(open.isDefined && open.get.segments == 0) // fresh open trip
  }

  test("incremental folding across micro-batches equals one batch") {
    val p = TripParams()
    val (d1, s1) = StatefulTrips.advance("b1", twoTrips.take(3), None, p)
    val (d2, s2) = StatefulTrips.advance("b1", twoTrips.drop(3), s1, p)
    val (all, sAll) = StatefulTrips.advance("b1", twoTrips, None, p)
    assert(d1 ++ d2 == all)
    assert(s2 == sAll)
  }

  test("streaming run emits the same closed trips as the batch " +
       "sessioned derivation") {
    val dir = Files.createTempDirectory("graft_sts").toString + "/in"
    twoTrips.toDS().write.parquet(dir)
    val stream = spark.readStream
      .schema(twoTrips.toDS().schema).parquet(dir).as[BikeStatus]
    val q = StatefulTrips.deriveTrips(stream, flushOnSilence = false)
      .writeStream.format("memory").queryName("stateful_trips")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("stateful_trips")
      .orderBy("trip_start").collect()

    val batch = Trips.deriveTripsSessioned(twoTrips.toDS())
      .orderBy("trip_start").collect()
    assert(streamed.length == 2)
    assert(streamed.map(_.getAs[Timestamp]("trip_start")).toSeq ==
      batch.map(_.getAs[Timestamp]("trip_start")).toSeq)
    assert(streamed.map(_.getAs[Long]("segment_count")).toSeq ==
      batch.map(_.getAs[Long]("segment_count")).toSeq)
  }

  // ------------------------------------------------------------------
  // Exact (e4) variant — the q171 gate's fold
  // ------------------------------------------------------------------

  test("advanceE4: start anchors at the first VALID segment's " +
       "predecessor; trip end is the session's last snapshot") {
    // 08:00 stationary ping at 08:00:30 (gap < 60 s -> invalid,
    // position advances), then two valid segments, then a trailing
    // stationary row (valid gap but no movement) before the silence.
    val rows = Seq(
      snap("b9", "08:00:00", 47.0, 8.0),
      snap("b9", "08:00:30", 47.05, 8.05), // too fast: invalid
      snap("b9", "08:10:00", 47.1, 8.1),   // valid seg 1 (from 08:00:30)
      snap("b9", "08:20:00", 47.2, 8.2),   // valid seg 2
      snap("b9", "08:30:00", 47.2, 8.2),   // stationary: invalid
      snap("b9", "13:00:00", 40.0, 3.0))   // silence closes the trip
    val (done, _) = StatefulTrips.advanceE4("b9", rows, None, TripParams())
    assert(done.length == 1)
    val t = done.head
    // anchored at the invalid ping (the valid segment's predecessor),
    // NOT the session's first snapshot
    assert(t.trip_start == ts("08:00:30") && t.start_lat == 47.05)
    // end = last snapshot before the silence, even though its own
    // segment was stationary-invalid
    assert(t.trip_end == ts("08:30:00") && t.end_lat == 47.2)
    // duration sums VALID gaps only: 570 + 600
    assert(t.duration_s == 1170L)
    assert(t.segment_count == 2L)
    assert(t.distance_e4 > 0L)
  }

  test("advanceE4 incremental folding across micro-batches equals " +
       "one batch, and matches advance() on trip boundaries") {
    val p = TripParams()
    val (d1, s1) = StatefulTrips.advanceE4("b1", twoTrips.take(4), None, p)
    val (d2, s2) = StatefulTrips.advanceE4("b1", twoTrips.drop(4), s1, p)
    val (all, sAll) = StatefulTrips.advanceE4("b1", twoTrips, None, p)
    assert(d1 ++ d2 == all)
    assert(s2 == sAll)
    val (plain, _) = StatefulTrips.advance("b1", twoTrips, None, p)
    assert(all.map(t => (t.trip_start, t.trip_end, t.segment_count)) ==
      plain.map(t => (t.trip_start, t.trip_end, t.segment_count)))
    // integer-second duration == 60 * the float-minutes duration here
    assert(all.map(_.duration_s) ==
      plain.map(t => math.round(t.total_duration * 60)))
  }

  test("replayE4FromSnapshots flushes trailing trips via sentinels " +
       "and matches the direct fold") {
    import org.apache.spark.sql.functions.col
    // no trailing silence row: the last trip is only closed by the
    // harness's sentinel
    val openEnded = twoTrips.take(6)
    val snaps = openEnded.toDS()
      .select(col("bike_id"), col("provider_id"), col("lat"), col("lon"),
        col("timestamp").as("ts"))
    val got = StatefulTrips.replayE4FromSnapshots(spark, snaps, TripParams())
      .orderBy("trip_start").collect()
    val (want, open) = StatefulTrips.advanceE4(
      "b1", openEnded, None, TripParams())
    // direct fold leaves the second trip open; sentinel must close it
    assert(want.length == 1 && open.exists(_.segments == 2))
    assert(got.length == 2)
    assert(got.map(_.getAs[Timestamp]("trip_start")).toSeq ==
      Seq(ts("08:00:00"), ts("10:20:00")))
    assert(got.map(_.getAs[Long]("segment_count")).toSeq == Seq(2L, 2L))
  }
}
