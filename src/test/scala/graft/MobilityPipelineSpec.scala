package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators._

/** End-to-end reference ETL: snapshots → trips → weather + spatial
  * enrichment → idempotent upsert → carbon rollup. */
class MobilityPipelineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(t: String) = Timestamp.valueOf(s"2024-01-15 $t")

  // Zurich-ish box and Bern-ish box
  private val munis = Seq(
    Municipality("Zurich", "ZH",
      Seq((47.30, 8.40), (47.30, 8.70), (47.45, 8.70), (47.45, 8.40))),
    Municipality("Bern", "BE",
      Seq((46.90, 7.35), (46.90, 7.55), (47.00, 7.55), (47.00, 7.35))))

  private val weather = Seq(
    ("Zurich", ts("09:00:00"), 9.5, 80.0, 2, 11.0),
    ("Zurich", ts("11:00:00"), 11.0, 75.0, 3, 12.0),
    ("Bern", ts("09:00:00"), 8.0, 82.0, 1, 9.0))
    .toDF("city", "obs_time", "temperature", "humidity", "aqi", "pm25")

  private val snaps = Seq(
    // trip inside Zurich box, starts 10:00 UTC = 11:00 local
    BikeStatus("b1", "p1", 47.37, 8.54, false, false, ts("10:00:00")),
    BikeStatus("b1", "p1", 47.38, 8.55, false, false, ts("10:10:00")),
    BikeStatus("b1", "p1", 47.39, 8.56, false, false, ts("10:20:00")),
    // trip outside any municipality
    BikeStatus("b2", "p1", 40.0, 3.0, false, false, ts("10:00:00")),
    BikeStatus("b2", "p1", 40.1, 3.1, false, false, ts("10:10:00")),
    BikeStatus("b2", "p1", 40.2, 3.2, false, false, ts("10:20:00"))).toDS()

  private val winStart = Timestamp.valueOf("2024-01-15 00:00:00")
  private val winEnd = Timestamp.valueOf("2024-01-16 00:00:00")

  test("trips are spatially and weather-enriched end to end") {
    val out = MobilityPipeline.enrichedTrips(
      snaps, weather, munis, winStart, winEnd).orderBy("bike_id").collect()
    assert(out.length == 2)
    val b1 = out(0)
    assert(b1.getAs[String]("municipality") == "Zurich")
    assert(b1.getAs[String]("canton") == "ZH")
    // trip_start 11:00 local -> latest obs at or before is the 11:00 one
    assert(b1.getAs[Double]("temperature") == 11.0)
    assert(b1.getAs[Int]("aqi") == 3)
    val b2 = out(1)
    assert(b2.isNullAt(b2.fieldIndex("municipality")))
    assert(b2.isNullAt(b2.fieldIndex("temperature")))
  }

  test("deriveTripsExact reproduces deriveTrips semantics with " +
       "integer durations and e4-integer distances") {
    // generic snapshots frame: local_ts pre-shifted (+1 h), snap_id
    // total-orders same-second duplicates
    val exactSnaps = snaps.toDF()
      .select(col("bike_id"), col("provider_id"), col("lat"), col("lon"),
        monotonically_increasing_id().as("snap_id"),
        (col("timestamp") + expr("INTERVAL 1 HOUR")).as("local_ts"))
    val exact = Trips.deriveTripsExact(exactSnaps, winStart, winEnd)
      .orderBy("bike_id").collect()
    val ref = Trips.deriveTrips(snaps, winStart, winEnd,
        TripParams(timeZone = "+01:00"))
      .toDF().orderBy("bike_id").collect()
    assert(exact.length == ref.length && exact.length == 2)
    exact.zip(ref).foreach { case (e, r) =>
      assert(e.getAs[String]("bike_id") == r.getAs[String]("bike_id"))
      assert(e.getAs[Timestamp]("trip_start") ==
        r.getAs[Timestamp]("trip_start"))
      assert(e.getAs[Double]("start_lat") == r.getAs[Double]("start_lat"))
      // integer seconds = 60 × the reference's fractional minutes
      assert(e.getAs[Long]("total_duration_s") ==
        math.round(r.getAs[Double]("total_duration") * 60))
      // e4 distance within per-segment rounding (±0.5e-4 per segment)
      // of the reference's float-summed km
      val segs = e.getAs[Long]("segment_count")
      assert(math.abs(e.getAs[Long]("total_distance_e4") -
        r.getAs[Double]("total_distance") * 10000) <= segs)
      assert(segs == r.getAs[Long]("segment_count"))
    }
  }

  test("upsert into all_trips is idempotent across reruns") {
    val dir = Files.createTempDirectory("graft_alltrips").toString + "/t"
    val trips = MobilityPipeline.enrichedTrips(
      snaps, weather, munis, winStart, winEnd)
    MobilityPipeline.upsert(spark, dir, trips, winStart, winEnd)
    val c1 = spark.read.parquet(dir).count()
    MobilityPipeline.upsert(spark, dir, trips, winStart, winEnd)
    val c2 = spark.read.parquet(dir).count()
    assert(c1 == 2 && c2 == 2)
  }

  test("carbon rollup aggregates by municipality") {
    val trips = MobilityPipeline.enrichedTrips(
      snaps, weather, munis, winStart, winEnd)
    val carbon = MobilityPipeline.carbonSavings(trips).collect()
    assert(carbon.length == 2) // null municipality + Zurich
    val zh = carbon.find(r => r.getAs[String]("municipality") == "Zurich").get
    assert(zh.getAs[Long]("n_trips") == 1)
    assert(zh.getAs[Double]("kg_co2_saved") > 0)
  }
}
