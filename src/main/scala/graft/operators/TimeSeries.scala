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
}
