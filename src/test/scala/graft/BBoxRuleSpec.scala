package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** The haversine→latitude-band optimizer rule: necessary-condition
  * conjunct appears, results unchanged, literal centers become
  * pushable range predicates. */
class BBoxRuleSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // synthesized points around Switzerland from customer keys
  private def points = spark.read
    .parquet(s"${TestSpark.sf001}/customer.parquet")
    .select(col("c_custkey"),
      (lit(46.0) + (col("c_custkey") % 200) / 100.0).as("lat"),
      (lit(7.0) + (col("c_custkey") % 300) / 100.0).as("lon"))

  test("radius filter gains a latitude band; results are unchanged") {
    val radius = points.filter(
      Geo.haversineNative(lit(47.37), lit(8.54), col("lat"), col("lon"))
        <= 5.0)
    val optimized = radius.queryExecution.optimizedPlan.toString
    // literal center -> plain range comparisons on the lat column
    assert(optimized.contains("lat#") &&
      (optimized.contains(">= 47.32") || optimized.contains("47.32")),
      optimized)

    // semantics: identical row set to the brute-force filter
    val brute = points.collect().filter { r =>
      org.apache.spark.sql.graftx.Haversine.compute(
        47.37, 8.54, r.getAs[Double]("lat"), r.getAs[Double]("lon")) <= 5.0
    }.map(_.getAs[Long]("c_custkey")).toSet
    assert(radius.select("c_custkey").as[Long].collect().toSet == brute)
  }

  test("the band is pushed to the parquet scan") {
    val radius = points.filter(
      Geo.haversineNative(lit(47.37), lit(8.54), col("lat"), col("lon"))
        <= 5.0)
    // lat is computed, not stored — push-down applies to source
    // columns; re-express on a stored double column to observe
    // PushedFilters
    val stored = spark.read
      .parquet(s"${TestSpark.sf001}/customer.parquet")
      .filter(Geo.haversineNative(lit(500.0), lit(8.54),
        col("c_acctbal"), col("c_acctbal")) <= 110.0)
    val physical = stored.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("GreaterThanOrEqual(c_acctbal"), physical)
  }

  test("non-literal center gets the abs-difference guard") {
    val df = points.filter(
      Geo.haversineNative(col("lat"), col("lon"),
        lit(47.37), lit(8.54)) <= 5.0)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs(") && optimized.contains("haversine"),
      optimized)
  }

  test("rule is idempotent (fixed-point batch converges)") {
    // would throw "Max iterations reached" if the rewrite re-fired;
    // also assert exactly one band conjunct
    val df = points.filter(
      Geo.haversineNative(lit(47.37), lit(8.54), col("lat"), col("lon"))
        <= 5.0)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(df.count() >= 0)
    assert("haversine".r.findAllIn(optimized).length == 1, optimized)
  }
}
