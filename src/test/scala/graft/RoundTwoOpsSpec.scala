package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorAggregates
import graft.operators.{Dedup, Municipality, Spatial}

/** Round-2 operators: PPJoin, expression-composed spatial join,
  * exact-centroid UDAF. */
class RoundTwoOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // --- PPJoin -----------------------------------------------------------

  test("ppjoinPairs equals jaccardPairs at the same threshold") {
    val docs = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    for (t <- Seq(0.25, 0.5)) {
      val pp = Dedup.ppjoinPairs(sh, t)
        .select("id_a", "id_b", "inter", "size_a", "size_b")
        .orderBy("id_a", "id_b").collect().toSeq
      val jp = Dedup.jaccardPairs(sh, t)
        .select("id_a", "id_b", "inter", "size_a", "size_b")
        .orderBy("id_a", "id_b").collect().toSeq
      assert(pp == jp, s"threshold $t")
    }
  }

  // --- spatial expression vs Scala reference ----------------------------

  test("insideExpr matches Municipality.contains on a dense grid") {
    val pts = for {
      lat <- BigDecimal(0) to 90 by 1.5
      lon <- BigDecimal(0) to 180 by 3.5
    } yield (lat.toDouble, lon.toDouble)
    val df = pts.toDF("lat", "lon")
    Spatial.DemoMunicipalities.foreach { m =>
      val got = df.select(col("lat"), col("lon"),
          Spatial.insideExpr(m, col("lat"), col("lon")).as("in"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getBoolean(2))
        .toMap
      pts.foreach { case (lat, lon) =>
        assert(got((lat, lon)) == m.contains(lat, lon),
          s"${m.name} at ($lat,$lon)")
      }
    }
  }

  test("classifyExpr honors first-match priority in the overlap zone") {
    // (32, 55) is inside both alpha and epsilon; alpha is listed first
    val r = Seq((32.0, 55.0), (1.0, 1.0)).toDF("lat", "lon")
      .select(Spatial.classifyExpr(Spatial.DemoMunicipalities,
        col("lat"), col("lon")).as("m"))
      .select("m.municipality").as[String].collect()
    assert(r.toSeq == Seq("alpha", "none"))
  }

  // --- SCD2 -------------------------------------------------------------

  test("scd2 re-applying the same snapshot is a no-op; history is kept") {
    import graft.operators.MergeByKey
    val current = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("k", "seg", "bal")
      .withColumn("valid_from", lit("2000-01-01").cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    val snapshot = Seq((1L, "A", 11.0), (2L, "B", 20.0), (4L, "D", 40.0))
      .toDF("k", "seg", "bal")
    val eff = lit("2001-01-01").cast("timestamp")
    val once = MergeByKey.scd2(current, snapshot, Seq("k"),
      Seq("seg", "bal"), eff)
    // k=1 changed (2 versions), k=2 unchanged, k=3 untouched, k=4 new
    assert(once.count() == 5)
    assert(once.filter(col("k") === 1 && !col("is_current")).count() == 1)
    assert(once.filter(col("is_current")).count() == 4)
    val twice = MergeByKey.scd2(once, snapshot, Seq("k"),
      Seq("seg", "bal"), lit("2002-01-01").cast("timestamp"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty,
      "re-applying an identical snapshot must not create versions")
  }

  // --- exact centroid UDAF ----------------------------------------------

  test("centroid is exact and invariant to partitioning") {
    val vecs = (1 to 101).map(i =>
      (i % 7, Seq(i * 0.625f, -i * 0.25f, (i % 13) * 1.5f)))
    def centroids(parts: Int) =
      vecs.toDF("label", "embedding").repartition(parts)
        .groupBy("label")
        .agg(VectorAggregates.centroidUdaf(4)(col("embedding")).as("c"))
        .orderBy("label")
        .as[(Int, Seq[Double])].collect().toSeq
    val one = centroids(1)
    assert(centroids(32) == one, "partitioning changed the centroid")
    // spot-check against exact rational arithmetic for label 0:
    // members are i = 7,14,...,98 → 14 vectors
    val members = (1 to 101).filter(_ % 7 == 0)
    val expect = Seq(
      members.map(i => math.round(i * 0.625 * 10000)).sum / 10000.0 / members.size,
      members.map(i => math.round(-i * 0.25 * 10000)).sum / 10000.0 / members.size)
    val got = one.find(_._1 == 0).get._2.take(2)
    assert(got == expect)
  }
}
