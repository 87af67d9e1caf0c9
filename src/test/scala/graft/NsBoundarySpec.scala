package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Nanosecond→second conversion at the boundary: a ns value 100 ns
  * below a whole second (2024 epoch, above 2^53 where double division
  * rounds) must truncate DOWN like DuckDB's date_trunc. The crafted
  * fixture is written here as a raw INT64 `ts` — exactly what the
  * nanosAsLong reader surfaces for ns-precision parquet. */
class NsBoundarySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("integer div truncation matches date_trunc at the ns boundary") {
    // 2024-01-15T09:50:00Z; ×1e9 ns is ~1.7e18, far above 2^53
    val nsBase = 1705312200L * 1000000000L
    val dir = java.nio.file.Files.createTempDirectory("graft_nsedge")
      .toString
    Seq((1L, nsBase - 100L), (2L, nsBase), (3L, nsBase + 100L))
      .toDF("event_id", "ts")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = Tables.eventsSec(spark, dir)
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
