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
}
