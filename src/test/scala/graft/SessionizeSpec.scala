package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Sessionize

class SessionizeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("session ids increment exactly when the gap exceeds the bound") {
    val df = Seq(
      ("u1", ts("10:00:00"), 1L),
      ("u1", ts("10:10:00"), 2L),   // gap 600 == bound -> same session
      ("u1", ts("10:20:01"), 3L),   // gap 601 > bound -> new session
      ("u2", ts("10:00:00"), 4L))   // other key -> own session 1
      .toDF("user", "t", "id")
    val out = Sessionize.byGap(df, Seq("user"), col("t"), col("id"), 600L)
      .orderBy("id").select("user", "session_id")
      .as[(String, Long)].collect()
    assert(out.toSeq == Seq(("u1", 1L), ("u1", 1L), ("u1", 2L), ("u2", 1L)))
  }

}
