package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Municipality polygon (J3 in SURVEY.md §2.3 — inferred from the
  * `municipality, canton` columns at `lambda/trips_lambda.py:65-66`
  * and `lambda_spatial_analysis.py` / geopandas in `README.md:12,16`).
  * Ring is a closed or open list of (lat, lon) vertices. */
case class Municipality(name: String, canton: String,
                        ring: Seq[(Double, Double)]) {
  val minLat: Double = ring.map(_._1).min
  val maxLat: Double = ring.map(_._1).max
  val minLon: Double = ring.map(_._2).min
  val maxLon: Double = ring.map(_._2).max

  /** Ray-casting point-in-polygon (even-odd rule). */
  def contains(lat: Double, lon: Double): Boolean = {
    if (lat < minLat || lat > maxLat || lon < minLon || lon > maxLon)
      return false
    var inside = false
    var j = ring.length - 1
    var i = 0
    while (i < ring.length) {
      val (yi, xi) = ring(i)
      val (yj, xj) = ring(j)
      if ((yi > lat) != (yj > lat) &&
        lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) inside = !inside
      j = i
      i += 1
    }
    inside
  }
}

/** Spatial enrichment: assign each point row a municipality/canton by
  * point-in-polygon against a broadcast polygon set.
  *
  * Scale shape: polygons are dimension-sized (Switzerland: ~2 100
  * municipalities) → broadcast once; the fact side is never shuffled.
  * The bounding-box test prunes candidates before the exact ray-cast,
  * and the whole lookup is a deterministic per-row scalar, so the
  * operator composes with codegen'd pipelines the same way a UDF
  * does (one boundary crossing per row, unavoidable for arbitrary
  * geometry without a native geo Expression).
  */
object Spatial {

  /** Adds `municipality` and `canton` columns resolved from
    * (latCol, lonCol); unmatched points get nulls. First matching
    * polygon in input order wins (callers order by priority). */
  def enrich(points: DataFrame, latCol: String, lonCol: String,
             municipalities: Seq[Municipality]): DataFrame = {
    val spark = points.sparkSession
    val bc = spark.sparkContext.broadcast(municipalities)
    val lookup = udf((lat: Double, lon: Double) => {
      bc.value.find(_.contains(lat, lon))
        .map(m => (m.name, m.canton))
    })
    points
      .withColumn("__muni", lookup(col(latCol), col(lonCol)))
      .withColumn("municipality", col("__muni._1"))
      .withColumn("canton", col("__muni._2"))
      .drop("__muni")
  }
}
