package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** A bike position snapshot (`lambda/bike_lambda.py:37-48`). */
case class BikeStatus(
    bike_id: String,
    provider_id: String,
    lat: Double,
    lon: Double,
    is_reserved: Boolean,
    is_disabled: Boolean,
    timestamp: Timestamp)

/** A derived trip (`lambda/trips_lambda.py:52-75`, the 11 columns the
  * trips insert actually fills at `:180-185`). */
case class Trip(
    bike_id: String,
    provider_id: String,
    trip_start: Timestamp,
    trip_end: Timestamp,
    start_lat: Double,
    start_lon: Double,
    end_lat: Double,
    end_lon: Double,
    total_duration: Double,
    total_distance: Double,
    segment_count: Long)

/** Trip-derivation parameters (`lambda/trips_lambda.py:128,160-162`). */
case class TripParams(
    minGapSeconds: Long = 60,
    maxGapSeconds: Long = 3600,
    minTripMinutes: Double = 1,
    maxTripMinutes: Double = 60,
    minSegments: Long = 2,
    timeZone: String = "Europe/Zurich")

/** The reference's analytical core: reconstruct trips from bike
  * position snapshots (`lambda/trips_lambda.py:94-163`), re-expressed
  * as one Catalyst plan:
  *
  *   scan → window(lag×3 by bike) → filter(valid segment) →
  *   project(duration, haversine) → hash-aggregate by bike →
  *   filter(valid trip)
  *
  * Two shuffles total: the window partitioning on `bike_id` and the
  * groupBy — and Catalyst/AQE may reuse the first exchange for the
  * second because the grouping keys subsume the window key.
  *
  * Reference quirks preserved verbatim (SURVEY.md §7 "oracle parity"):
  *  - `MIN(start_lat)` / `MAX(end_lat)` are numeric min/max, NOT the
  *    position at min/max time (`trips_lambda.py:137-140`);
  *  - grouping is per (bike, provider) over the whole window — at most
  *    one trip row per bike per run, even if a bike made several trips
  *    (`trips_lambda.py:131-145`);
  *  - exact float `!=` movement test (`trips_lambda.py:129`);
  *  - inclusive BETWEEN on the gap (`trips_lambda.py:128`).
  * `deriveTripsSessioned` is the corrected variant (one row per actual
  * trip, position-at-endpoint coordinates).
  */
object Trips {

  /** Faithful port of the reference pipeline. `window` bounds are the
    * half-open local-time interval (`trips_lambda.py:106`). */
  def deriveTrips(snapshots: Dataset[BikeStatus],
                  windowStart: Timestamp, windowEnd: Timestamp,
                  p: TripParams = TripParams()): Dataset[Trip] = {
    val spark = snapshots.sparkSession
    import spark.implicits._

    // CTE bike_movements (`trips_lambda.py:95-106`): tz shift + lag×3.
    val local = from_utc_timestamp(col("timestamp"), p.timeZone)
    val w = Window.partitionBy("bike_id").orderBy("local_time")
    val moves = snapshots.toDF()
      .withColumn("local_time", local)
      .filter(col("local_time") >= lit(windowStart) &&
        col("local_time") < lit(windowEnd))
      .select(col("bike_id"), col("provider_id"), col("lat"), col("lon"),
        col("local_time"),
        lag("local_time", 1).over(w).as("prev_time"),
        lag("lat", 1).over(w).as("prev_lat"),
        lag("lon", 1).over(w).as("prev_lon"))

    // CTE trip_segments (`trips_lambda.py:108-129`): valid-segment
    // filter + per-segment duration/distance.
    val gapMinutes =
      (col("local_time").cast("double") - col("prev_time").cast("double")) / 60.0
    val segments = moves
      .filter(col("prev_time").isNotNull &&
        gapMinutes.between(p.minGapSeconds / 60.0, p.maxGapSeconds / 60.0) &&
        (col("prev_lat") =!= col("lat") || col("prev_lon") =!= col("lon")))
      .select(col("bike_id"), col("provider_id"),
        col("prev_time").as("start_time"), col("local_time").as("end_time"),
        col("prev_lat").as("start_lat"), col("prev_lon").as("start_lon"),
        col("lat").as("end_lat"), col("lon").as("end_lon"),
        gapMinutes.as("duration_minutes"),
        Geo.haversineKm(col("prev_lat"), col("prev_lon"),
          col("lat"), col("lon")).as("distance_km"))

    // Final aggregate + HAVING (`trips_lambda.py:131-162`).
    segments
      .groupBy("bike_id", "provider_id")
      .agg(
        min("start_time").as("trip_start"),
        max("end_time").as("trip_end"),
        min("start_lat").as("start_lat"),
        min("start_lon").as("start_lon"),
        max("end_lat").as("end_lat"),
        max("end_lon").as("end_lon"),
        sum("duration_minutes").as("total_duration"),
        sum("distance_km").as("total_distance"),
        count(lit(1)).as("segment_count"))
      .filter(col("total_duration").between(p.minTripMinutes, p.maxTripMinutes) &&
        col("total_distance") > 0 &&
        col("segment_count") >= p.minSegments)
      .as[Trip]
  }

  /** Verifiability-disciplined variant of [[deriveTrips]] for the
    * composed-pipeline correctness gate, over a generic snapshots
    * DataFrame (columns: bike_id, provider_id, lat, lon, snap_id,
    * local_ts — caller applies the timezone shift so the gate can
    * mirror it engine-portably). Reference semantics are preserved
    * EXACTLY for integer-second timestamps, with three disciplines
    * that make the output bit-identical on any engine, partitioning,
    * or summation order:
    *  - the gap and trip-duration BETWEENs move from fractional
    *    minutes to integer seconds — equivalent at the reference's
    *    60 s-multiple boundaries (`trips_lambda.py:128,160`) because
    *    gap_s/60.0 ≥ 1.0 ⟺ gap_s ≥ 60 for integer gap_s;
    *  - per-segment distances round to e4-km BIGINTs BEFORE the trip
    *    sum (the q17 per-row rounding discipline, moved inside the
    *    aggregate so trip totals are order-independent integers — a
    *    float sum of haversines is not);
    *  - the lag window totally orders on (local_ts, snap_id) — the
    *    reference orders on timestamp alone, which is nondeterministic
    *    under same-second duplicates.
    * Output: bike_id, provider_id, trip_start, trip_end, start_lat,
    * start_lon, end_lat, end_lon, total_duration_s, total_distance_e4,
    * segment_count — the [[deriveTrips]] quirks (numeric min/max
    * endpoints, one row per bike per window, exact-`!=` movement test)
    * intact. */
  def deriveTripsExact(snapshots: DataFrame,
                       windowStart: Timestamp, windowEnd: Timestamp,
                       p: TripParams = TripParams()): DataFrame = {
    val w = Window.partitionBy("bike_id")
      .orderBy(col("local_ts"), col("snap_id"))
    val moves = snapshots
      .filter(col("local_ts") >= lit(windowStart) &&
        col("local_ts") < lit(windowEnd))
      .select(col("bike_id"), col("provider_id"), col("lat"), col("lon"),
        col("local_ts"),
        lag("local_ts", 1).over(w).as("prev_ts"),
        lag("lat", 1).over(w).as("prev_lat"),
        lag("lon", 1).over(w).as("prev_lon"))
    val gapS = col("local_ts").cast("long") - col("prev_ts").cast("long")
    val segments = moves
      .filter(col("prev_ts").isNotNull &&
        gapS.between(p.minGapSeconds, p.maxGapSeconds) &&
        (col("prev_lat") =!= col("lat") || col("prev_lon") =!= col("lon")))
      .select(col("bike_id"), col("provider_id"),
        col("prev_ts").as("start_ts"), col("local_ts").as("end_ts"),
        col("prev_lat").as("s_lat"), col("prev_lon").as("s_lon"),
        col("lat").as("e_lat"), col("lon").as("e_lon"),
        gapS.as("gap_s"),
        round(Geo.haversineKm(col("prev_lat"), col("prev_lon"),
          col("lat"), col("lon")) * 10000).cast("long").as("dist_e4"))
    segments
      .groupBy("bike_id", "provider_id")
      .agg(
        min("start_ts").as("trip_start"),
        max("end_ts").as("trip_end"),
        min("s_lat").as("start_lat"),
        min("s_lon").as("start_lon"),
        max("e_lat").as("end_lat"),
        max("e_lon").as("end_lon"),
        sum("gap_s").as("total_duration_s"),
        sum("dist_e4").as("total_distance_e4"),
        count(lit(1)).as("segment_count"))
      .filter(col("total_duration_s").between(
          (p.minTripMinutes * 60).toLong, (p.maxTripMinutes * 60).toLong) &&
        col("total_distance_e4") > 0 &&
        col("segment_count") >= p.minSegments)
  }

  /** Corrected variant: sessionize first (gap > maxGapSeconds starts a
    * new trip), so a bike yields one row per actual trip, with true
    * endpoint coordinates via min_by/max_by. */
  def deriveTripsSessioned(snapshots: Dataset[BikeStatus],
                           p: TripParams = TripParams()): DataFrame = {
    // tiebreak on (lat, lon) too: (bike_id, timestamp) duplicates are
    // a real at-least-once-ingest case and byGap requires a total
    // order for deterministic lag()
    val tiebreak = struct(col("timestamp"), col("lat"), col("lon"))
    val withSession = Sessionize.byGap(
      snapshots.toDF(), Seq("bike_id"), col("timestamp"), tiebreak,
      p.maxGapSeconds)
    val w = Window.partitionBy("bike_id", "session_id")
      .orderBy(col("timestamp"), col("lat"), col("lon"))
    val gapMinutes =
      (col("timestamp").cast("double") - col("prev_time").cast("double")) / 60.0
    withSession
      .select(col("bike_id"), col("provider_id"), col("lat"), col("lon"),
        col("timestamp"), col("session_id"),
        lag("timestamp", 1).over(w).as("prev_time"),
        lag("lat", 1).over(w).as("prev_lat"),
        lag("lon", 1).over(w).as("prev_lon"))
      .filter(col("prev_time").isNotNull &&
        gapMinutes >= p.minGapSeconds / 60.0 &&
        (col("prev_lat") =!= col("lat") || col("prev_lon") =!= col("lon")))
      .withColumn("duration_minutes", gapMinutes)
      .withColumn("distance_km", Geo.haversineKm(
        col("prev_lat"), col("prev_lon"), col("lat"), col("lon")))
      .groupBy("bike_id", "session_id")
      .agg(
        first("provider_id").as("provider_id"),
        min("prev_time").as("trip_start"),
        max("timestamp").as("trip_end"),
        min_by(col("prev_lat"), col("prev_time")).as("start_lat"),
        min_by(col("prev_lon"), col("prev_time")).as("start_lon"),
        max_by(col("lat"), col("timestamp")).as("end_lat"),
        max_by(col("lon"), col("timestamp")).as("end_lon"),
        sum("duration_minutes").as("total_duration"),
        sum("distance_km").as("total_distance"),
        count(lit(1)).as("segment_count"))
      .filter(col("total_duration").between(p.minTripMinutes, p.maxTripMinutes) &&
        col("total_distance") > 0 &&
        col("segment_count") >= p.minSegments)
      .drop("session_id")
  }
}
