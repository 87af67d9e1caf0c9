package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join semantics (J2): inclusive match, latest-wins, null when
  * nothing precedes, per-key isolation. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val right = Seq(
    ("zurich", 100L, 10.0), ("zurich", 200L, 20.0),
    ("bern", 150L, 15.0)).toDF("city", "obs_ts", "temp")

  private def join(left: org.apache.spark.sql.DataFrame) =
    AsOfJoin.lastBefore(left, right, Seq("city"),
      leftTs = "trip_ts", rightTs = "obs_ts", payload = Seq("temp"))

  test("picks the latest right row at or before the left timestamp") {
    val left = Seq(("zurich", 250L)).toDF("city", "trip_ts")
    assert(join(left).collect().head.getAs[Double]("temp") == 20.0)
  }

  test("inclusive: equal timestamps match") {
    val left = Seq(("zurich", 200L)).toDF("city", "trip_ts")
    assert(join(left).collect().head.getAs[Double]("temp") == 20.0)
  }

  test("null when no right row precedes") {
    val left = Seq(("zurich", 50L)).toDF("city", "trip_ts")
    assert(join(left).collect().head.isNullAt(
      join(left).columns.indexOf("temp")))
  }

  test("keys do not leak across partitions") {
    val left = Seq(("bern", 300L)).toDF("city", "trip_ts")
    assert(join(left).collect().head.getAs[Double]("temp") == 15.0)
  }

  test("left rows and columns are preserved") {
    val left = Seq(("zurich", 250L, "t1"), ("basel", 250L, "t2"))
      .toDF("city", "trip_ts", "trip_id")
    val out = join(left).orderBy("trip_id").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("trip_id")).toSeq == Seq("t1", "t2"))
    // basel has no weather at all -> null, row kept
    assert(out(1).isNullAt(out(1).fieldIndex("temp")))
  }

  test("firstAfter picks the EARLIEST right row at or after the left " +
       "timestamp; null when none follows") {
    def temp(ts: Long): Option[Double] = {
      val left = Seq(("zurich", ts)).toDF("city", "trip_ts")
      val row = AsOfJoin.firstAfter(left, right, Seq("city"),
        "trip_ts", "obs_ts", Seq("temp")).collect().head
      if (row.isNullAt(row.fieldIndex("temp"))) None
      else Some(row.getAs[Double]("temp"))
    }
    assert(temp(50L) == Some(10.0), "earliest follower, not latest")
    assert(temp(100L) == Some(10.0), "inclusive at equality")
    assert(temp(150L) == Some(20.0))
    assert(temp(250L) == None, "nothing follows")
  }

  test("tolerance nulls matches beyond the bound, both directions") {
    val left = Seq(("zurich", 240L)).toDF("city", "trip_ts")
    val back = AsOfJoin.lastBeforeWithin(left, right, Seq("city"),
      "trip_ts", "obs_ts", Seq("temp"),
      org.apache.spark.sql.functions.lit(50L)).collect().head
    assert(!back.isNullAt(back.fieldIndex("temp")), "200 is within 50 of 240")
    val backFar = AsOfJoin.lastBeforeWithin(
      Seq(("zurich", 400L)).toDF("city", "trip_ts"), right, Seq("city"),
      "trip_ts", "obs_ts", Seq("temp"),
      org.apache.spark.sql.functions.lit(50L)).collect().head
    assert(backFar.isNullAt(backFar.fieldIndex("temp")),
      "200 is farther than 50 behind 400")
    val fwd = AsOfJoin.firstAfterWithin(
      Seq(("zurich", 30L)).toDF("city", "trip_ts"), right, Seq("city"),
      "trip_ts", "obs_ts", Seq("temp"),
      org.apache.spark.sql.functions.lit(50L)).collect().head
    assert(fwd.isNullAt(fwd.fieldIndex("temp")),
      "100 is farther than 50 ahead of 30")
  }

  test("nearest: picks the closer side, ties break backward, " +
       "same-ts counts as backward, unmatched keys carry null") {
    val probes = Seq(
      ("zurich", 130L), // 100 at -30 vs 200 at +70 → back
      ("zurich", 150L), // equidistant (±50) → back (100)
      ("zurich", 180L), // 200 at +20 closer than 100 at -80 → fwd
      ("zurich", 100L), // exact hit → distance 0 backward
      ("basel", 500L)   // no obs for key → null
    ).toDF("city", "trip_ts")
    val r = AsOfJoin.nearest(probes, right, Seq("city"),
        "trip_ts", "obs_ts", Seq("obs_ts", "temp"))
      .collect().map(row => (row.getString(0), row.getLong(1)) ->
        (if (row.isNullAt(2)) -1L else row.getLong(2))).toMap
    assert(r(("zurich", 130L)) == 100L)
    assert(r(("zurich", 150L)) == 100L)
    assert(r(("zurich", 180L)) == 200L)
    assert(r(("zurich", 100L)) == 100L)
    assert(r(("basel", 500L)) == -1L)
  }
}
