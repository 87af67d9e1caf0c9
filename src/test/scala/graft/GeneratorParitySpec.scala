package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{PointInPolygons, PostingPairs, PrefixFilteredPairs}

import graft.operators.{Dedup, Spatial}

/** Parity locks for the round-10 codegen replacements: each new
  * generator/expression must reproduce the composed
  * higher-order-function (or UDF) form it retired, element for
  * element, on real sf0.001 postings — the WordNgrams discipline
  * applied to the pair-expansion and point-in-polygon hot paths. */
class GeneratorParitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    graft.core.Tables.load(spark, TestSpark.sf001, "documents")

  test("PostingPairs generator == composed flatten/transform HOF " +
       "chain on the real sf0.001 posting lists") {
    val postings = Dedup.shingleTable(docs, "doc_id", "text", 3)
      .select(col("id"), col("sh"),
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("id"))
          .as("sz"))
      .groupBy("sh")
      .agg(sort_array(collect_list(struct(col("id"), col("sz"))))
        .as("ids"))
      .filter(size(col("ids")) > 1)
    val viaGen = postings
      .select(PostingPairs.col(col("ids")))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val viaHof = postings
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |    b -> struct(a.id AS id_a, b.id AS id_b,
          |                a.sz AS size_a, b.sz AS size_b))))""".stripMargin))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.size_a"),
        col("p.size_b"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(viaGen.nonEmpty, "postings must actually share shingles")
    assert(viaGen == viaHof)
  }

  test("PrefixFilteredPairs generator == composed filter/transform " +
       "chain (same ub/ceil arithmetic) on real prefix postings") {
    val threshold = 0.3
    val minIsect = threshold / (1.0 + threshold)
    val docSets = Dedup.shingleTable(docs, "doc_id", "text", 3)
      .groupBy("id")
      .agg(sort_array(collect_list(col("sh"))).as("shs"))
      .withColumn("sz", size(col("shs")).cast("long"))
    val prefixLen =
      (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")
    val prefixes = docSets.select(col("id"), col("sz"),
      posexplode(slice(col("shs"), lit(1), prefixLen))
        .as(Seq("pos", "sh")))
    val grouped = prefixes.groupBy("sh")
      .agg(sort_array(collect_list(
        struct(col("id"), col("sz"), col("pos")))).as("xs"))
      .filter(size(col("xs")) > 1)
    val viaGen = grouped
      .select(PrefixFilteredPairs.col(col("xs"), minIsect))
      .as[(Long, Long)].collect().sorted.toSeq
    val viaHof = grouped
      .select(explode(expr(
        s"""flatten(transform(xs, (a, i) ->
           |  filter(
           |    transform(slice(xs, i + 2, size(xs) - i - 1),
           |      b -> struct(a.id AS id_a, b.id AS id_b,
           |        least(a.sz - a.pos, b.sz - b.pos) AS ub,
           |        a.sz + b.sz AS szsum)),
           |    p -> p.ub >= ceil($minIsect * p.szsum))))""".stripMargin))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(viaGen.nonEmpty, "prefix postings must produce candidates")
    assert(viaGen == viaHof)
  }

  test("PointInPolygons codegen expression == brute-force priority " +
       "scan of Municipality.contains over a dense point grid") {
    val munis = Spatial.syntheticMunicipalities()
    val pts = (for { i <- 0 until 60; j <- 0 until 60 }
      yield (i * 1.5 + 0.25, j * 3.0 + 0.55)).toDF("lat", "lon")
    val got = Spatial.enrichGrid(pts, "lat", "lon", munis)
      .select(col("lat"), col("lon"),
        coalesce(col("municipality"), lit("none")).as("m"),
        coalesce(col("canton"), lit("none")).as("c"))
      .as[(Double, Double, String, String)].collect().sorted.toSeq
    val want = (for { i <- 0 until 60; j <- 0 until 60 } yield {
      val (lat, lon) = (i * 1.5 + 0.25, j * 3.0 + 0.55)
      val hit = munis.find(_.contains(lat, lon))
      (lat, lon, hit.map(_.name).getOrElse("none"),
        hit.map(_.canton).getOrElse("none"))
    }).sorted.toSeq
    assert(got == want)
    assert(got.count(_._3 != "none") > 100,
      "the grid must actually hit polygons")
  }

  test("PointInPolygons matches the unrolled classifyExpr on the " +
       "demo polygon set (overlap priority preserved)") {
    val munis = Spatial.DemoMunicipalities
    val pts = (for { i <- 0 until 45; j <- 0 until 60 }
      yield (i * 2.0 + 0.125, j * 3.0 + 0.75)).toDF("lat", "lon")
    val viaExpr = pts.select(col("lat"), col("lon"),
        Spatial.classifyExpr(munis, col("lat"), col("lon")).as("s"))
      .select(col("lat"), col("lon"), col("s.municipality"),
        col("s.canton"))
      .as[(Double, Double, String, String)].collect().sorted.toSeq
    val viaNative = Spatial
      .enrichGrid(pts, "lat", "lon", munis, cellLat = 9.0, cellLon = 18.0)
      .select(col("lat"), col("lon"),
        coalesce(col("municipality"), lit("none")),
        coalesce(col("canton"), lit("none")))
      .as[(Double, Double, String, String)].collect().sorted.toSeq
    assert(viaNative == viaExpr)
  }
}
