package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-earlier) join — the enrichment join the reference's
  * schema implies but never ships (J2 in SURVEY.md §2.3: `all_trips`
  * carries weather columns `lambda/trips_lambda.py:68-72` that some
  * absent `lambda_etl_main.py` must fill by "weather for this city at
  * this time").
  *
  * Instead of a range join (quadratic blow-up) or a per-row subquery
  * (driver loop), this is the union-and-carry-forward formulation:
  * tag right rows 0 and left rows 1, union them, and per key take
  * `last(right_payload, ignoreNulls)` over an ordered running window.
  * Right rows sort before left rows at equal timestamps, so the match
  * is inclusive (right.ts <= left.ts).
  *
  * Cost: one shuffle on the key for the union — the same price as a
  * plain equi-join, independent of how many right rows precede each
  * left row. This is the formulation that survives 100 TB; Spark's
  * range-join would re-scan the right side per time bucket.
  */
object AsOfJoin {

  /** For each left row, attach the payload of the latest right row
    * with the same key and `rightTs <= leftTs`.
    *
    * @param left     probe side
    * @param right    reference side (e.g. weather observations)
    * @param keys     equi-join key columns (must exist on both sides)
    * @param leftTs   left event-time column name
    * @param rightTs  right event-time column name
    * @param payload  right columns to carry (appear in the output;
    *                 must not clash with left column names)
    */
  def lastBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String,
                 payload: Seq[String]): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, payload,
      forward = false, tolerance = None)

  /** [[lastBefore]] with a match tolerance: the carried right row is
    * nulled out when it is older than `tolerance` (same units as the
    * ts columns) — pandas `merge_asof(tolerance=...)` semantics. */
  def lastBeforeWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       payload: Seq[String], tolerance: Column): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, payload,
      forward = false, tolerance = Some(tolerance))

  /** Forward as-of: for each left row, the EARLIEST right row with
    * the same key and `rightTs >= leftTs` (pandas
    * `merge_asof(direction='forward')`). Same union-and-carry
    * formulation traversed in reverse time order — same single
    * shuffle, no range explosion. */
  def firstAfter(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String,
                 payload: Seq[String]): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, payload,
      forward = true, tolerance = None)

  /** [[firstAfter]] bounded by a tolerance: matches farther than
    * `tolerance` ahead are nulled out. */
  def firstAfterWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       payload: Seq[String], tolerance: Column): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, payload,
      forward = true, tolerance = Some(tolerance))

  /** Nearest-match join: for each left row, the right row with the
    * same key minimizing |rightTs − leftTs|, either direction —
    * pandas `merge_asof(direction='nearest')`. Distance ties break
    * BACKWARD (the earlier right row wins); right rows sharing the
    * left timestamp count as backward matches at distance zero.
    * Within one timestamp the payload struct disambiguates
    * (lexicographic max backward, min forward), mirroring [[asOf]].
    *
    * Shape: ONE shuffle on the keys (the union sorts twice inside the
    * same exchange — ascending for the backward carry, descending for
    * the forward carry), never a range join or per-row scan. Both ts
    * columns must be numeric (epoch units) so the distance compare is
    * a long subtraction. Unmatched left rows carry nulls. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String,
              payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val ordTs = "__near_ts"
    val tag = "__near_tag"
    val pay = "__near_pay"
    val payCols = (rightTs +: payload).distinct

    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as(ordTs), lit(0).as(tag),
        struct(payCols.map(col): _*).as(pay)) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as(ordTs), lit(1).as(tag), lit(null).as(pay)) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    // asc: same-ts right rows (tag 0) precede the left row → they are
    // inside the backward frame. desc: tag desc puts them after the
    // left row → outside the forward frame. Exactly one side claims a
    // zero-distance match.
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ordTs).asc, col(tag).asc, col(pay).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ordTs).desc, col(tag).desc, col(pay).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val back = "__near_back"
    val fwd = "__near_fwd"
    val gapB = col(ordTs) - col(s"$back.$rightTs")
    val gapF = col(s"$fwd.$rightTs") - col(ordTs)
    val chosen = when(col(back).isNull, col(fwd))
      .when(col(fwd).isNull, col(back))
      .when(gapB <= gapF, col(back))
      .otherwise(col(fwd))
    r.unionByName(l)
      .withColumn(back, last(col(pay), ignoreNulls = true).over(wB))
      .withColumn(fwd, last(col(pay), ignoreNulls = true).over(wF))
      .filter(col(tag) === 1)
      .withColumn(pay, chosen)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"$pay.$c").as(c)): _*)
  }

  /** Shared union-and-carry core. Ties: right rows sharing the match
    * timestamp are disambiguated by the payload struct itself
    * (lexicographic max for backward, min for forward), so the result
    * is deterministic under any execution order. */
  private def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payload: Seq[String],
                   forward: Boolean,
                   tolerance: Option[Column]): DataFrame = {
    val leftCols = left.columns.toSeq
    val ordTs = "__asof_ts"
    val tag = "__asof_tag"
    val pay = "__asof_payload"

    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as(ordTs), lit(0).as(tag),
        struct((rightTs +: payload).distinct.map(col): _*).as(pay)) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as(ordTs), lit(1).as(tag), lit(null).as(pay)) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val ord =
      if (forward) Seq(col(ordTs).desc, col(tag).asc, col(pay).desc)
      else Seq(col(ordTs).asc, col(tag).asc, col(pay).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = r.unionByName(l)
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
    val bounded = tolerance match {
      case None => carried
      case Some(tol) =>
        val diff =
          if (forward) col(s"$pay.$rightTs") - col(ordTs)
          else col(ordTs) - col(s"$pay.$rightTs")
        carried.withColumn(pay, when(diff <= tol, col(pay)))
    }
    bounded.filter(col(tag) === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"$pay.$c").as(c)): _*)
  }
}
