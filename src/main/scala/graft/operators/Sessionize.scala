package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the generalized form of the reference's
  * trip-boundary logic (`lambda/trips_lambda.py:127-129`: a new trip
  * starts when the gap to the previous snapshot leaves the allowed
  * band).
  *
  * Implementation is one window pass: `lag` the ordered timestamp per
  * key, flag rows whose gap exceeds `gapSeconds` (or that have no
  * predecessor), and turn the boundary flags into contiguous session
  * ids with a running sum. Exactly one shuffle (hash by key); both
  * window functions share the same `WindowExec`, and everything stays
  * in whole-stage codegen.
  *
  * Scale: one shuffle on the session key, which is the minimum any
  * sessionization needs. Skewed keys (one entity with millions of
  * events) serialize into a single task — for those, cap per-key
  * history upstream or pre-split by coarse time bucket and stitch.
  */
object Sessionize {

  /** Adds `session_id` (1-based, per key) to `df`.
    *
    * @param keys      session key columns (e.g. bike_id / user_id)
    * @param ts        event-time column (should be second-truncated by
    *                  the caller if cross-engine determinism matters)
    * @param tiebreak  unique column ordering rows within equal
    *                  timestamps — required for deterministic results
    * @param gapSeconds max silence inside one session
    */
  def byGap(df: DataFrame, keys: Seq[String], ts: Column, tiebreak: Column,
            gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ts, tiebreak)
    val gap = ts.cast("long") - lag(ts, 1).over(w).cast("long")
    val boundary = when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }
}
