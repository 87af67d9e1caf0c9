package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted aggregation — the sensor/position-stream op the
  * reference's snapshot tables imply (a bike's state holds until the
  * next snapshot — `bike_status` rows are step-function samples,
  * `lambda/bike_lambda.py:62-71`): a plain average over samples
  * over-weights whatever was sampled most often; the time-weighted
  * average integrates the step function.
  *
  * Integer-exact: value is e4 fixed-point, durations are whole
  * seconds, so each interval's area is an exact product and the sum
  * an exact BIGINT — only the final area/span division is a double
  * (one deterministic IEEE op, the [[graft.analytics.Exact]]
  * discipline).
  *
  * Scale shape: one shuffle on the key for the lead window; area and
  * span aggregate map-side after it. Per-key history length is
  * irrelevant — nothing is collected.
  */
object TimeSeries {

  /** Per-key TWAP over step-function samples.
    *
    * @param epochS  whole-second epoch column (BIGINT)
    * @param tieCol  unique per-row tiebreak so same-second samples
    *                order deterministically on any engine
    * @param valueE4 e4 fixed-point sample value (BIGINT)
    * @return (keys..., n_samples, span_s, area_e4s, twap_e4): rows
    *         with <2 samples have no interval and are dropped.
    */
  def twap(df: DataFrame, keys: Seq[String], epochS: Column,
           tieCol: Column, valueE4: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(epochS.asc, tieCol.asc)
    val stepped = df
      .withColumn("__s", epochS).withColumn("__v", valueE4)
      .withColumn("__dt", lead(col("__s"), 1).over(w) - col("__s"))
      .filter(col("__dt").isNotNull)
    stepped.groupBy(keys.map(col): _*)
      .agg((count(lit(1)) + 1).as("n_samples"),
        sum(col("__dt")).as("span_s"),
        sum(col("__v") * col("__dt")).as("area_e4s"))
      .withColumn("twap_e4",
        col("area_e4s").cast("double") / col("span_s").cast("double"))
  }

  /** Per-key linear interpolation onto a dense hourly grid — the
    * sensor-stream regularization next to the carry-forward resample
    * (q81): observed hours keep their value, missing hours get the
    * straight line between the surrounding observations
    * v + (v_next − v) · Δt/Δspan.
    *
    * Same single-scan shape as the resampler: ONE lead window per key
    * brings the next observation onto each row, and each row explodes
    * only its own [h, next_h) span — no dense-grid build followed by
    * a second join, and no shuffle of the generated rows at all. The
    * per-row interpolation is one fixed IEEE expression over the two
    * surrounding observations, so the filled values are deterministic
    * on any engine or partitioning (sums never enter).
    *
    * `obs` must be one row per (keys, hourCol) — pre-aggregate
    * observations to the grid step first (e.g. `max_by(value, id)`).
    * Output: (keys..., grid_hour, value_interp, is_observed). */
  def interpolateHourlyLinear(obs: DataFrame, keys: Seq[String],
                              hourCol: String, valueCol: String)
      : DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(hourCol))
    val ratio =
      (col("grid_hour").cast("long") - col("__h").cast("long"))
        .cast("double") /
        (col("__hn").cast("long") - col("__h").cast("long")).cast("double")
    obs
      .withColumn("__hn", lead(col(hourCol), 1).over(w))
      .withColumn("__vn", lead(col(valueCol), 1).over(w))
      .select(keys.map(col) ++ Seq(
        col(hourCol).as("__h"), col(valueCol).as("__v"),
        col("__hn"), col("__vn"),
        explode(sequence(col(hourCol),
          coalesce(col("__hn") - expr("INTERVAL 1 HOUR"), col(hourCol)),
          expr("INTERVAL 1 HOUR"))).as("grid_hour")): _*)
      .select(keys.map(col) ++ Seq(
        col("grid_hour"),
        when(col("grid_hour") === col("__h"), col("__v"))
          .otherwise(col("__v") + (col("__vn") - col("__v")) * ratio)
          .as("value_interp"),
        (col("grid_hour") === col("__h")).cast("long")
          .as("is_observed")): _*)
  }
}
