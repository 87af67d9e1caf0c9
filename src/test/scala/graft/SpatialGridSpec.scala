package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Spatial

/** Grid-bucketed spatial enrichment (q64): the broadcast cell index
  * must prune candidates by bounding box without changing a single
  * assignment relative to the linear lookup. */
class SpatialGridSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val munis = Spatial.SyntheticMunicipalities

  test("grid index only lists bbox-intersecting candidates, and " +
       "prunes hard (candidates per cell << total polygons)") {
    val cellLat = 9.0
    val cellLon = 18.0
    val idx = Spatial.gridIndex(munis, cellLat, cellLon)
    idx.foreach { case ((a, b), cand) =>
      val (lo, hi) = (a * cellLat, (a + 1) * cellLat)
      val (lo2, hi2) = (b * cellLon, (b + 1) * cellLon)
      cand.foreach { k =>
        val m = munis(k)
        assert(m.maxLat >= lo && m.minLat <= hi &&
          m.maxLon >= lo2 && m.minLon <= hi2,
          s"polygon ${m.name} indexed into non-intersecting cell ($a,$b)")
      }
    }
    val avg = idx.values.map(_.length).sum.toDouble / idx.size
    assert(avg < munis.size / 10.0,
      s"avg $avg candidates/cell — the index is not pruning")
  }

  test("enrichGrid assigns identically to the linear enrich over a " +
       "dense point lattice (including overlap-priority and misses)") {
    val pts = (for {
      i <- 0 until 90; j <- 0 until 90
    } yield (i.toLong * 90 + j, i * 1.01, j * 2.003))
      .toDF("pid", "lat", "lon")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "municipality", "canton")
        .collect().map(r => (r.getLong(0),
          Option(r.getString(1)), Option(r.getString(2)))).sortBy(_._1).toSeq
    val grid = norm(Spatial.enrichGrid(pts, "lat", "lon", munis))
    val lin = norm(Spatial.enrich(pts, "lat", "lon", munis))
    assert(grid == lin)
    // sanity: the lattice hits polygons AND gaps
    assert(grid.exists(_._2.isDefined) && grid.exists(_._2.isEmpty))
  }
}
