package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's full ETL assembled from graft operators — the
  * end-to-end capability a `jahua/data_warehouse` user runs today
  * (SURVEY.md §3.1): snapshots → trips → weather enrichment → spatial
  * enrichment → idempotent upsert into the fact table.
  *
  * Each stage is one of the engine's named operators; the whole flow
  * is a single lazy plan until [[upsert]] writes. Carbon savings
  * (`lambda_carbon_calc.py`, inferred A3) is the closing aggregate.
  */
object MobilityPipeline {

  /** Emission factor in kg CO2 per km displaced from car travel —
    * the "carbon footprint analysis" headline (`README.md:1,81`).
    * Per-vehicle-type factors plug in as a broadcast dim. */
  val CarKgCo2PerKm = 0.12

  /** snapshots → enriched trips (no write). */
  def enrichedTrips(snapshots: Dataset[BikeStatus],
                    weather: DataFrame,
                    municipalities: Seq[Municipality],
                    windowStart: Timestamp, windowEnd: Timestamp,
                    params: TripParams = TripParams()): DataFrame = {
    val trips = Trips.deriveTrips(snapshots, windowStart, windowEnd, params)
      .toDF()
    val withCity = Spatial.enrich(trips, "start_lat", "start_lon",
      municipalities)
    // weather as-of: latest observation for the trip's municipality's
    // city at or before trip start (J2; city keyed like the
    // reference's weather_data table)
    AsOfJoin.lastBefore(
      withCity.withColumn("city", col("municipality")),
      weather, Seq("city"),
      leftTs = "trip_start", rightTs = "obs_time",
      payload = Seq("temperature", "humidity", "aqi", "pm25"))
  }

  /** Idempotent upsert into the all_trips parquet dir on the natural
    * key (bike_id, trip_start) — `trips_lambda.py:74,186-196`. */
  def upsert(spark: SparkSession, allTripsPath: String,
             trips: DataFrame,
             windowStart: Timestamp, windowEnd: Timestamp): Unit =
    MergeByKey.mergeWrite(spark, allTripsPath, trips,
      Seq("bike_id", "trip_start"),
      col("trip_start") >= lit(windowStart) &&
        col("trip_start") < lit(windowEnd))

  /** Carbon-savings rollup by municipality (A3). */
  def carbonSavings(allTrips: DataFrame): DataFrame =
    allTrips
      .groupBy(col("municipality"))
      .agg(count(lit(1)).as("n_trips"),
        sum(col("total_distance")).as("total_km"),
        (sum(col("total_distance")) * CarKgCo2PerKm).as("kg_co2_saved"))
      .orderBy(col("municipality").asc_nulls_first)

  /** The composed pipeline in its verifiability-disciplined form —
    * the same stage chain as [[enrichedTrips]] (derive → spatial →
    * weather as-of), built for the correctness gate: trips come from
    * [[Trips.deriveTripsExact]] (integer durations, e4-integer
    * distances — order-independent, so the whole chain hash-compares
    * bit-exact against a single-threaded oracle), spatial enrichment
    * uses the grid-indexed [[Spatial.enrich]], and weather attaches
    * via the same [[AsOfJoin.lastBefore]]. `snapshots` carries
    * (bike_id, provider_id, lat, lon, snap_id, local_ts); `weather`
    * carries (city, obs_time, temperature). Unenriched trips keep
    * city='none' so the as-of join's no-match path stays live. */
  def enrichedTripsExact(snapshots: DataFrame, weather: DataFrame,
                         municipalities: Seq[Municipality],
                         windowStart: Timestamp, windowEnd: Timestamp,
                         params: TripParams = TripParams()): DataFrame = {
    val trips = Trips.deriveTripsExact(snapshots, windowStart, windowEnd,
      params)
    val withCity = Spatial.enrich(trips, "start_lat", "start_lon",
      municipalities)
      .withColumn("municipality", coalesce(col("municipality"), lit("none")))
      .withColumn("canton", coalesce(col("canton"), lit("none")))
      .withColumn("city", col("municipality"))
    AsOfJoin.lastBefore(withCity, weather, Seq("city"),
      leftTs = "trip_start", rightTs = "obs_time",
      payload = Seq("temperature"))
  }
}
