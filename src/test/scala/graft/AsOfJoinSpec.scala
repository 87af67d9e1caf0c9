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
}
