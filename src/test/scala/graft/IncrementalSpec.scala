package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Incremental

/** Bookmark-driven incremental runs: slices advance, reruns of a
  * crashed slice are idempotent, late keys get updated. */
class IncrementalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def setup() = {
    val base = Files.createTempDirectory("graft_inc").toString
    (s"$base/target", s"$base/bookmark")
  }

  private val source = Seq(
    (1L, 100L, "a"), (2L, 150L, "b"),   // first window
    (3L, 250L, "c"), (1L, 260L, "a2")   // second window; key 1 reappears
  ).toDF("id", "ts", "tag")

  private def agg(df: DataFrame): DataFrame =
    df.groupBy("id").agg(max("ts").as("ts"), max("tag").as("tag"))

  test("windows advance via the bookmark; late keys upsert") {
    val (target, bm) = setup()
    val n1 = Incremental.run(spark, source, "ts", nowS = 200L,
      agg, target, Seq("id"), bm)
    assert(n1 == 2)
    assert(Incremental.readBookmark(spark, bm) == 200L)

    val n2 = Incremental.run(spark, source, "ts", nowS = 300L,
      agg, target, Seq("id"), bm)
    assert(n2 == 2)
    val rows = spark.read.parquet(target).orderBy("id")
      .as[(Long, Long, String)].collect().toSeq
    // key 1 updated by the second window; 2 untouched; 3 inserted
    assert(rows == Seq((1L, 260L, "a2"), (2L, 150L, "b"), (3L, 250L, "c")))
  }

  test("a crashed run (bookmark not advanced) reprocesses idempotently") {
    val (target, bm) = setup()
    Incremental.run(spark, source, "ts", 200L, agg, target, Seq("id"), bm)
    // simulate crash-before-bookmark of the second run: process the
    // window but reset the bookmark back
    Incremental.run(spark, source, "ts", 300L, agg, target, Seq("id"), bm)
    Incremental.writeBookmark(spark, bm, 200L)
    // retry: same slice again
    Incremental.run(spark, source, "ts", 300L, agg, target, Seq("id"), bm)
    val rows = spark.read.parquet(target).orderBy("id")
      .as[(Long, Long, String)].collect().toSeq
    assert(rows == Seq((1L, 260L, "a2"), (2L, 150L, "b"), (3L, 250L, "c")))
    assert(Incremental.readBookmark(spark, bm) == 300L)
  }

  test("fact-table mode: keys that include event time allow a " +
       "window-scoped rewrite") {
    val (target, bm) = setup()
    // natural key (id, ts) — the reference's (bike_id, trip_start)
    // shape: a key can never move between windows
    val ident = (df: DataFrame) => df
    Incremental.run(spark, source, "ts", 200L, ident, target,
      Seq("id", "ts"), bm, timeScopedKeys = true)
    Incremental.run(spark, source, "ts", 300L, ident, target,
      Seq("id", "ts"), bm, timeScopedKeys = true)
    val rows = spark.read.parquet(target).orderBy("id", "ts")
      .as[(Long, Long, String)].collect().toSeq
    assert(rows == Seq((1L, 100L, "a"), (1L, 260L, "a2"),
      (2L, 150L, "b"), (3L, 250L, "c")))
  }

  test("an empty slice still advances the bookmark, touches nothing") {
    val (target, bm) = setup()
    Incremental.run(spark, source, "ts", 200L, agg, target, Seq("id"), bm)
    val before = spark.read.parquet(target).collect().toSet
    val n = Incremental.run(spark, source, "ts", 210L, agg, target,
      Seq("id"), bm)
    assert(n == 0)
    assert(Incremental.readBookmark(spark, bm) == 210L)
    assert(spark.read.parquet(target).collect().toSet == before)
  }
}
