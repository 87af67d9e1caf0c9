package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Time-bucketed range join: boundary inclusivity and bucket-crossing
  * pairs (the cases a naive bucketing forgets). */
class RangeJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val left = Seq(("u1", 1000L), ("u1", 2000L), ("u2", 1000L))
    .toDF("user_id", "lts")
  private val right = Seq(
    ("u1", 1000L),  // equal: excluded (strict >)
    ("u1", 1600L),  // exactly +600: included (inclusive <=)
    ("u1", 1601L),  // +601: excluded
    ("u1", 2599L),  // bucket-crossing match for lts=2000 (different
                    // 600s bucket than 2000)
    ("u2", 1500L))  // other key
    .toDF("user_id", "rts")

  test("bounds are (strict, inclusive] and bucket crossings are found") {
    val out = RangeJoin.followingWithin(left, right, Seq("user_id"),
        "lts", "rts", 600L)
      .select("user_id", "lts", "rts")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("u1", 1000L, 1600L),   // inclusive upper bound
      ("u1", 2000L, 2599L),   // crosses into the next bucket
      ("u2", 1000L, 1500L)))
  }

  test("matches equal the naive inequality join on real data") {
    val e = graft.core.Tables.load(spark, TestSpark.sf001, "events")
    val ts = graft.analytics.Exact.secFromAny(e, "ts").cast("long")
    val ev = e.select(col("user_id"), col("event_id"),
      col("event_type"), ts.as("t"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("eid"), col("t").as("et"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("cid"), col("t").as("ct"))
    val bucketed = RangeJoin.followingWithin(errors, clicks,
        Seq("user_id"), "et", "ct", 3600L)
      .select("eid", "cid").as[(Long, Long)].collect().toSet
    val naive = errors.join(clicks, Seq("user_id"))
      .filter(col("ct") > col("et") && col("ct") <= col("et") + 3600L)
      .select("eid", "cid").as[(Long, Long)].collect().toSet
    assert(bucketed == naive && bucketed.nonEmpty)
  }

  test("intervalOverlap: exactly-once emission across bucket spans, " +
       "zero-length touches kept, equals the naive theta join") {
    val l = Seq(
      (1L, 100L, 250L),    // spans buckets 1..2 (w=100)
      (2L, 900L, 905L),
      (3L, 5000L, 5010L))  // no partner
      .toDF("l_id", "l_start", "l_end")
    val r = Seq(
      (10L, 120L, 380L),  // overlaps #1 across a bucket boundary
      (11L, 250L, 260L),  // touches #1 at a single point (0-length)
      (12L, 906L, 950L),  // gap of 1s to #2: NOT an overlap
      (13L, 0L, 9999L))   // spans everything: overlaps all three
      .toDF("r_id", "r_start", "r_end")
    val got = RangeJoin.intervalOverlap(l, r, bucketSec = 100L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toList
    assert(got.size == got.toSet.size, s"pair emitted twice: $got")
    val naive = l.crossJoin(r)
      .filter(col("l_start") <= col("r_end") &&
        col("r_start") <= col("l_end"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got.toSet == naive)
    assert(naive == Set((1L, 10L), (1L, 11L), (1L, 13L), (2L, 13L),
      (3L, 13L)))
  }
}
