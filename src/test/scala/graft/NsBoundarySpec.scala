package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Nanosecond→second conversion at the boundary: a ns value 100 ns
  * below a whole second (2024 epoch, above 2^53 where double division
  * rounds) must truncate DOWN like DuckDB's date_trunc — the crafted
  * parquet at /tmp/nsedge is written by the check tooling; skip when
  * absent. */
class NsBoundarySpec extends AnyFunSuite {
  import TestSpark.spark

  test("integer div truncation matches date_trunc at the ns boundary") {
    assume(new java.io.File("/tmp/nsedge/events.parquet").exists())
    val out = Tables.eventsSec(spark, "/tmp/nsedge")
      .orderBy("event_id")
      .select("event_id", "ts_s")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString))
    // DuckDB ground truth: id 1 -> ...09:49:59, ids 2,3 -> ...09:50:00
    assert(out(0)._2 == "2024-01-15 09:49:59.0", out.mkString(","))
    assert(out(1)._2 == "2024-01-15 09:50:00.0")
    assert(out(2)._2 == "2024-01-15 09:50:00.0")
  }
}
