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

  import org.apache.spark.sql.Column

  /** Fixed demo polygon set over the synthetic coordinate space
    * (lat ∈ [0,90], lon ∈ [0,180] — the q17 derived-coordinate
    * domain): two axis-aligned boxes, a triangle, a concave L, and a
    * diamond; "epsilon" overlaps "alpha" to exercise first-match-wins
    * priority. Literal data shared by the Spark plan and the
    * generated DuckDB oracle. */
  val DemoMunicipalities: Seq[Municipality] = Seq(
    Municipality("alpha", "A",
      Seq((10.0, 10.0), (40.0, 10.0), (40.0, 60.0), (10.0, 60.0))),
    Municipality("epsilon", "B",
      Seq((30.0, 50.0), (45.0, 50.0), (45.0, 75.0), (30.0, 75.0))),
    Municipality("beta", "B",
      Seq((50.0, 20.0), (80.0, 40.0), (55.0, 90.0))),
    Municipality("gamma", "A",
      Seq((5.0, 100.0), (35.0, 100.0), (35.0, 130.0), (20.0, 130.0),
        (20.0, 160.0), (5.0, 160.0))),
    Municipality("delta", "C",
      Seq((45.0, 120.0), (60.0, 100.0), (75.0, 120.0), (60.0, 140.0))))

  /** Ray-cast point-in-polygon as a composed Catalyst expression —
    * the polygon is a literal, so every edge test unrolls into
    * codegen'd comparisons (no UDF boundary, no array scan). Mirrors
    * [[Municipality.contains]] operation-for-operation so the UDF
    * path, this path, and the generated oracle SQL agree bitwise
    * (per-row IEEE arithmetic is engine-stable). */
  def insideExpr(m: Municipality, lat: Column, lon: Column): Column = {
    val n = m.ring.length
    val crossings = (0 until n).map { i =>
      val (yi, xi) = m.ring(i)
      val (yj, xj) = m.ring((i + n - 1) % n)
      when((lit(yi) > lat) =!= (lit(yj) > lat) &&
        lon < (lit(xj) - lit(xi)) * (lat - lit(yi)) / (lit(yj) - lit(yi))
          + lit(xi), 1).otherwise(0)
    }.reduce(_ + _)
    lat >= m.minLat && lat <= m.maxLat &&
      lon >= m.minLon && lon <= m.maxLon && crossings % 2 === 1
  }

  /** DuckDB twin of [[insideExpr]] over SQL fragments `lat`/`lon`.
    * Vertex doubles are rendered with Java's round-trip formatting,
    * so both engines parse identical values. */
  def insideSql(m: Municipality, lat: String, lon: String): String = {
    val n = m.ring.length
    val crossings = (0 until n).map { i =>
      val (yi, xi) = m.ring(i)
      val (yj, xj) = m.ring((i + n - 1) % n)
      s"(CASE WHEN (($yi > $lat) != ($yj > $lat)) AND " +
        s"$lon < ($xj - $xi) * ($lat - $yi) / ($yj - $yi) + $xi " +
        "THEN 1 ELSE 0 END)"
    }.mkString(" + ")
    s"($lat >= ${m.minLat} AND $lat <= ${m.maxLat} AND " +
      s"$lon >= ${m.minLon} AND $lon <= ${m.maxLon} AND " +
      s"($crossings) % 2 = 1)"
  }

  /** First-match-wins (municipality, canton) struct from a literal
    * polygon list, as a pure expression; ("none","none") when no
    * polygon contains the point. For dimension-sized polygon sets
    * (~10³) prefer [[enrich]]'s broadcast lookup — an unrolled
    * expression tree stops paying off past a few dozen polygons. */
  def classifyExpr(munis: Seq[Municipality], lat: Column,
                   lon: Column): Column =
    coalesce(munis.map(m =>
      when(insideExpr(m, lat, lon),
        struct(lit(m.name).as("municipality"), lit(m.canton).as("canton"))))
      :+ struct(lit("none").as("municipality"), lit("none").as("canton")): _*)

  /** Adds `municipality` and `canton` columns resolved from
    * (latCol, lonCol); unmatched points get nulls. First matching
    * polygon in input order wins (callers order by priority).
    *
    * Routes through [[enrichGrid]] with cell sizes derived from the
    * polygon set's overall bounding box (≈√n cells per axis), so the
    * obvious entry point gets the indexed per-row cost
    * O(candidates-in-cell) — NOT a linear scan of all ~2 100
    * municipalities per point. Identical results by construction:
    * the grid preserves input-order priority within each cell. */
  def enrich(points: DataFrame, latCol: String, lonCol: String,
             municipalities: Seq[Municipality]): DataFrame = {
    require(municipalities.nonEmpty, "enrich: empty polygon set")
    val g = math.max(1.0, math.ceil(math.sqrt(municipalities.length)))
    val latSpan =
      municipalities.map(_.maxLat).max - municipalities.map(_.minLat).min
    val lonSpan =
      municipalities.map(_.maxLon).max - municipalities.map(_.minLon).min
    enrichGrid(points, latCol, lonCol, municipalities,
      cellLat = math.max(latSpan / g, 1e-6),
      cellLon = math.max(lonSpan / g, 1e-6))
  }

  /** Deterministic synthetic municipality set tiling the derived
    * coordinate domain (lat [0,90] × lon [0,180]): one diamond per
    * grid cell, radii jittered by a pure index formula so several
    * polygons spill into neighboring cells — overlaps exercise the
    * first-match priority, and multi-cell bboxes exercise the grid
    * index. Pure arithmetic on small decimals: identical on every
    * JVM, and the vertex doubles round-trip through the generated
    * oracle SQL. */
  def syntheticMunicipalities(rows: Int = 10,
                              cols: Int = 10): Seq[Municipality] =
    (for { i <- 0 until rows; j <- 0 until cols } yield {
      val cy = (i + 0.5) * 90.0 / rows
      val cx = (j + 0.5) * 180.0 / cols
      val rLat = 2.5 + ((i * 7 + j * 13) % 10) * 0.35
      val rLon = 5.0 + ((i * 11 + j * 5) % 10) * 0.7
      Municipality(s"m_${i}_$j", ('A' + (i % 5)).toChar.toString,
        Seq((cy - rLat, cx), (cy, cx + rLon), (cy + rLat, cx),
          (cy, cx - rLon)))
    }).toSeq

  /** The q64 polygon dimension (100 polygons). */
  val SyntheticMunicipalities: Seq[Municipality] = syntheticMunicipalities()

  /** Coarse lat/lon-cell index over polygon bounding boxes: cell →
    * candidate polygon indices in priority (input) order. Driver-side
    * and dimension-sized — the spatial analogue of a broadcast hash
    * index. */
  def gridIndex(municipalities: Seq[Municipality], cellLat: Double,
                cellLon: Double): Map[(Int, Int), Array[Int]] = {
    val m = scala.collection.mutable.Map.empty[(Int, Int), List[Int]]
    municipalities.zipWithIndex.foreach { case (mu, idx) =>
      for {
        a <- (mu.minLat / cellLat).floor.toInt to
             (mu.maxLat / cellLat).floor.toInt
        b <- (mu.minLon / cellLon).floor.toInt to
             (mu.maxLon / cellLon).floor.toInt
      } m((a, b)) = idx :: m.getOrElse((a, b), Nil)
    }
    m.map { case (k, v) => k -> v.reverse.toArray }.toMap
  }

  /** Grid-bucketed [[enrich]] — the shape that holds at dimension
    * scale (~2 100 real municipalities): polygons are pre-bucketed
    * into coarse cells by bounding box, the cell→candidates index is
    * broadcast, and each row ray-casts ONLY its cell's candidates in
    * priority order. Per-row cost is O(candidates in cell), not
    * O(polygons); the fact side is never shuffled. */
  def enrichGrid(points: DataFrame, latCol: String, lonCol: String,
                 municipalities: Seq[Municipality],
                 cellLat: Double = 9.0, cellLon: Double = 18.0): DataFrame = {
    // graftx.PointInPolygons: whole-stage-codegen grid lookup — one
    // monomorphic JVM call per row returning a pre-built row
    // reference. This retired the engine's last per-row Scala UDF
    // (the ScalaUDF boundary cost boxing + Option + tuple conversion
    // per row); results are bitwise identical (same contains()
    // arithmetic, same grid, same priority order).
    points
      .withColumn("__muni", org.apache.spark.sql.graftx.PointInPolygons
        .col(col(latCol), col(lonCol), municipalities, cellLat, cellLon))
      .withColumn("municipality", col("__muni.municipality"))
      .withColumn("canton", col("__muni.canton"))
      .drop("__muni")
  }
}
