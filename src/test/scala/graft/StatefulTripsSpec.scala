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
}
