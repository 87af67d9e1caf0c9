package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** Native Catalyst Haversine vs the composed-builtins form: identical
  * doubles, null propagation, codegen path. */
class HaversineExprSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("native expression matches composed builtins bit-for-bit") {
    val df = spark.read
      .parquet(s"${TestSpark.sf001}/customer.parquet")
      .select((abs(col("c_acctbal")) % 90).as("lat1"),
        ((col("c_custkey") * 7.1) % 180).as("lon1"),
        ((abs(col("c_acctbal")) * 1.3) % 90).as("lat2"),
        ((col("c_custkey") * 3.7) % 180).as("lon2"))
    val both = df.select(
      Geo.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2"))
        .as("composed"),
      Geo.haversineNative(col("lat1"), col("lon1"), col("lat2"), col("lon2"))
        .as("native"))
    assert(both.filter(col("composed") =!= col("native")).count() == 0)
  }

  test("null inputs propagate to null output") {
    val df = Seq((Some(1.0), None: Option[Double])).toDF("a", "b")
    val out = df.select(
      Geo.haversineNative(col("a"), col("b"), col("a"), col("a"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("known distance via native path (Zurich-Bern ~95km)") {
    val d = Seq((47.3769, 8.5417, 46.9480, 7.4474)).toDF("a", "b", "c", "d")
      .select(Geo.haversineNative(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()
    assert(math.abs(d - 95.0) < 2.0)
  }

  test("native expression stays inside WholeStageCodegen") {
    val df = spark.range(10).select(
      Geo.haversineNative(col("id").cast("double"), lit(8.0),
        lit(47.0), lit(8.5)).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators fused into WholeStageCodegen stage n; the
    // haversine projection must carry it (a non-codegen expression
    // would force the Project out of the fused stage)
    assert(plan.contains("*(1) Project") && plan.contains("haversine"))
    // and the computed values are correct through codegen
    assert(df.filter(col("d") > 0).count() > 0)
  }
}
