package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.BloomFilterX

import graft.core.Tables
import graft.functions.Vectors
import graft.operators.{Curate, MergeByKey}

/** Corpus-curation operators: weighted sampling, content-defined
  * shared spans, centroid assignment, SCD2 time travel, bloom-filter
  * join pruning. */
class CurationSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("weightedSample: deterministic, weight-monotone, never keeps " +
       "zero-weight rows, always keeps dominant rows") {
    val df = (1L to 1000L).map(i => (i, if (i == 1) 0L else i)).toDF("k", "w")
    val s1 = Curate.weightedSample(df, col("k"), col("w"), 50.0)
      .select("k").as[Long].collect().sorted
    val s2 = Curate.weightedSample(df, col("k"), col("w"), 50.0)
      .select("k").as[Long].collect().sorted
    assert(s1.sameElements(s2), "resampling must select identical rows")
    assert(!s1.contains(1L), "zero-weight row can never be sampled")
    // expected size is k; allow generous slack for a 1000-row universe
    assert(s1.length > 20 && s1.length < 100, s"got ${s1.length}")
    // a row carrying more than W/k of the weight is kept surely:
    // u < 1 <= k*w/W
    val heavy = ((1L to 10L).map(i => (i, 1L)) :+ (99L, 1000000L))
      .toDF("k", "w")
    val hs = Curate.weightedSample(heavy, col("k"), col("w"), 2.0)
      .select("k").as[Long].collect()
    assert(hs.contains(99L), "dominant-weight row must always be kept")
  }

  test("anchor windows match shared runs at DIFFERENT offsets " +
       "(content-defined, not grid-aligned)") {
    val run = (1 to 12).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $run gamma"),            // run at offset 2
      (2L, s"$run delta epsilon zeta eta theta"), // run at offset 0
      (3L, "nothing in common with the others at all here")
    ).toDF("doc_id", "text")
    val wins = Curate.anchorWindowTable(docs, "doc_id", "text", 8, 4)
    val pairs = Curate.sharedSpanPairs(wins)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      "12-token shared run must anchor at least one common 8-window")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // docs shorter than the window emit nothing
    val short = Seq((9L, "just seven tokens sit in this doc")).toDF("doc_id", "text")
    assert(Curate.anchorWindowTable(short, "doc_id", "text", 8, 4).count() == 0)
  }

  test("assignToCenters == brute-force argmax on real embeddings") {
    val e = Tables.load(spark, TestSpark.sf001, "embeddings")
    val centers = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("center_id"), col("embedding").as("cvec"))
    val fast = Curate.assignToCenters(e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", centers, "center_id", "cvec")
      .select(col("vec_id"), col("center_id"))
    val brute = e.select(col("vec_id"), col("embedding"))
      .crossJoin(centers)
      .withColumn("cos", Vectors.cosine(col("embedding"), col("cvec")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cos").desc, col("center_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("center_id"))
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
  }

  test("snapshotAt honors half-open [from, to) validity") {
    val v = Seq(
      // key 1: v1 closed at 2020, v2 open since 2020
      (1L, "a", ts("2010-01-01"), Some(ts("2020-01-01")), false),
      (1L, "b", ts("2020-01-01"), None, true),
      // key 2: single open version since 2015
      (2L, "c", ts("2015-01-01"), None, true)
    ).map { case (k, x, f, t, c) => (k, x, f, t.orNull, c) }
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    def snap(at: String) =
      MergeByKey.snapshotAt(v, lit(at).cast("timestamp"))
        .select("k", "attr").as[(Long, String)].collect().toSet
    assert(snap("2012-06-01") == Set((1L, "a")))
    // AT the transition instant the new version wins (half-open)
    assert(snap("2020-01-01") == Set((1L, "b"), (2L, "c")))
    assert(snap("2009-01-01") == Set.empty[(Long, String)])
  }

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("bloom probe admits every true key (no false negatives) and " +
       "prunes most others") {
    val keys = spark.range(0, 2000).filter(col("id") % 2 === 0)
    val bloom = keys.agg(
      BloomFilterX.agg(xxhash64(col("id")), 1000L, 8000L).as("bf"))
    val probed = spark.range(0, 2000)
      .filter(BloomFilterX.mightContain(bloom, xxhash64(col("id"))))
      .select("id").as[Long].collect().toSet
    assert((0L until 2000L by 2).forall(probed.contains),
      "a bloom filter must never reject a member")
    val falsePos = probed.count(_ % 2 == 1)
    assert(falsePos < 100, s"expected ~1% false positives, got $falsePos")
  }
}
