package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar functions.
  *
  * Haversine reproduces the reference's great-circle formula
  * (`lambda/trips_lambda.py:119-125`) as a composition of built-in
  * codegen'd expressions — per the "functions, not UDFs" rule this
  * stays inside whole-stage codegen with zero serialization cost,
  * unlike a Scala UDF. (A native Catalyst `Expression` variant exists
  * in [[graft.functions.HaversineExpression]] as the custom-expression
  * showcase; both produce identical doubles.)
  */
object Geo {

  val EarthRadiusKm = 6371.0

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2),
    * all in degrees. Mirrors `lambda/trips_lambda.py:119-125`. */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(EarthRadiusKm) * lit(2.0) * asin(sqrt(a))
  }

  /** Fused native-Expression variant (whole-stage codegen'd single
    * call); see org.apache.spark.sql.graftx.Haversine. */
  def haversineNative(lat1: Column, lon1: Column,
                      lat2: Column, lon2: Column): Column =
    org.apache.spark.sql.graftx.Haversine.col(lat1, lon1, lat2, lon2)

  /** DuckDB SQL fragment computing the same value (for oracles). */
  def haversineKmSql(lat1: String, lon1: String,
                     lat2: String, lon2: String): String =
    s"6371.0 * 2.0 * asin(sqrt(pow(sin(radians($lat2 - $lat1) / 2), 2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * " +
      s"pow(sin(radians($lon2 - $lon1) / 2), 2)))"
}
