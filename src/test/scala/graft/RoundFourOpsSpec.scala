package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Curate, TimeSeries, Validate}

/** Round-4 operator semantics: entropy profile, A-ES sampling,
  * linear interpolation, Spearman. */
class RoundFourOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("entropyProfile: constant column has zero entropy, a uniform " +
       "two-value column has ln(2)") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 1L), ("a", 2L))
      .toDF("c_const", "c_two")
    val r = Validate.entropyProfile(df, Seq("c_const", "c_two"))
      .select("column_name", "n_rows", "n_distinct", "entropy_e6")
      .as[(String, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("c_const") == (("c_const", 4L, 1L, 0L)))
    assert(r("c_two")._3 == 2L)
    assert(r("c_two")._4 == 693147L) // round(ln(2)·1e6)
  }

  test("weightedTopKSample: exactly k rows, deterministic across " +
       "invocations, all rows when k >= n") {
    val df = (1L to 200L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val a = Curate.weightedTopKSample(df, col("id"), col("w"), 20)
      .select("id").as[Long].collect().toSet
    val b = Curate.weightedTopKSample(df, col("id"), col("w"), 20)
      .select("id").as[Long].collect().toSet
    assert(a.size == 20 && a == b)
    assert(Curate.weightedTopKSample(df, col("id"), col("w"), 500)
      .count() == 200)
  }

  test("interpolateHourlyLinear: straight line between observations, " +
       "observed hours flagged, a trailing point emits only itself") {
    val obs = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 40.0))
      .toDF("k", "h", "v")
    val r = TimeSeries.interpolateHourlyLinear(obs, Seq("k"), "h", "v")
      .orderBy("grid_hour")
      .select(col("grid_hour").cast("string"), col("value_interp"),
        col("is_observed"))
      .as[(String, Double, Long)].collect()
    assert(r.length == 4)
    assert(r(0) == (("2024-01-01 00:00:00", 10.0, 1L)))
    assert(r(1) == (("2024-01-01 01:00:00", 20.0, 0L)))
    assert(r(2) == (("2024-01-01 02:00:00", 30.0, 0L)))
    assert(r(3) == (("2024-01-01 03:00:00", 40.0, 1L)))
  }

  test("spearmanExact: +1e6 on a monotonic series, -1e6 reversed, " +
       "single-row groups dropped") {
    val df = Seq(
      ("up", 1L, 10.0), ("up", 2L, 20.0), ("up", 3L, 30.0),
      ("down", 1L, 30.0), ("down", 2L, 20.0), ("down", 3L, 10.0),
      ("solo", 1L, 5.0))
      .toDF("g", "x", "y")
    val r = Validate.spearmanExact(df, Seq("g"),
        x = col("x"), y = col("y"), tie = col("x"))
      .select("g", "rho_e6").as[(String, Long)].collect().toMap
    assert(r == Map("up" -> 1000000L, "down" -> -1000000L))
  }

  test("q176's tie-averaged rank AUC equals brute-force pair counting") {
    // scores with heavy ties across both classes
    val rows = Seq(
      (1L, 5L), (1L, 5L), (1L, 3L), (1L, 9L), (1L, 7L),
      (0L, 5L), (0L, 2L), (0L, 3L), (0L, 1L), (0L, 7L), (0L, 7L))
    // brute force: pairs (pos, neg): 1 if s_p > s_n, 0.5 if equal
    val pos = rows.filter(_._1 == 1L).map(_._2)
    val neg = rows.filter(_._1 == 0L).map(_._2)
    val brute = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
    // the q176 integer formulation
    val byScore = rows.groupBy(_._2).map { case (s, g) =>
      (s, g.count(_._1 == 1L).toLong, g.size.toLong) }.toSeq.sortBy(_._1)
    var cBefore = 0L; var r2 = 0L
    byScore.foreach { case (_, cp, ct) =>
      r2 += cp * (2 * cBefore + ct + 1); cBefore += ct }
    val np = pos.size.toLong; val nn = neg.size.toLong
    val aucPpm = (r2 - np * (np + 1)) * 1000000L / (2 * np * nn)
    assert(aucPpm == math.floor(brute * 1000000).toLong)
  }
}
