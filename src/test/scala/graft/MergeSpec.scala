package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.MergeByKey

/** Keyed-upsert semantics (`trips_lambda.py:180-206`): updates win,
  * reruns are no-ops, rows outside the incremental scope untouched. */
class MergeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("updates win on key conflict; inserts appended") {
    val target = Seq((1L, "old", 10.0), (2L, "keep", 20.0))
      .toDF("id", "tag", "v")
    val updates = Seq((1L, "new", 11.0), (3L, "ins", 30.0))
      .toDF("id", "tag", "v")
    val out = MergeByKey.merge(target, updates, Seq("id"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
  }

  test("merge is idempotent: applying the same updates twice = once") {
    val target = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "tag", "v")
    val updates = Seq((2L, "b2", 2.5), (3L, "c", 3.0)).toDF("id", "tag", "v")
    val once = MergeByKey.merge(target, updates, Seq("id"))
    val twice = MergeByKey.merge(once, updates, Seq("id"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("mergeWrite: incremental scope rewrite is idempotent and " +
       "leaves out-of-scope rows untouched") {
    val dir = Files.createTempDirectory("graft_merge").toString + "/t"
    val initial = Seq((1L, 100L, "x"), (2L, 100L, "y"), (3L, 200L, "z"))
      .toDF("id", "day", "tag")
    initial.write.parquet(dir)

    // incremental batch scoped to day=100
    val updates = Seq((2L, 100L, "y2"), (4L, 100L, "w")).toDF("id", "day", "tag")
    val scope = col("day") === 100L
    MergeByKey.mergeWrite(spark, dir, updates, Seq("id"), scope)
    val after1 = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(after1 == Seq((1L, "x"), (2L, "y2"), (3L, "z"), (4L, "w")))

    // rerun: same result (ON CONFLICT-style idempotence)
    MergeByKey.mergeWrite(spark, dir, updates, Seq("id"), scope)
    val after2 = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(after2 == after1)
  }

  test("mergeWrite recovers a crash between retire and promote " +
       "without losing history") {
    val dir = Files.createTempDirectory("graft_merge_crash").toString + "/t"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    Seq((1L, 100L, "x"), (2L, 100L, "y")).toDF("id", "day", "tag")
      .write.parquet(dir)
    // simulate the crash window: dest retired to __merge_old, promote
    // never happened, a stale tmp is lying around
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__merge_old"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + "__merge_tmp"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))

    val updates = Seq((2L, 100L, "y2")).toDF("id", "day", "tag")
    MergeByKey.mergeWrite(spark, dir, updates, Seq("id"),
      col("day") === 100L)
    val rows = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    // history recovered AND update applied — the pre-fix swap would
    // have written only the update row
    assert(rows == Seq((1L, "x"), (2L, "y2")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__merge_old")))
  }

  test("mergeWrite creates the target when absent") {
    val dir = Files.createTempDirectory("graft_merge_new").toString + "/t"
    val updates = Seq((1L, 1L, "a")).toDF("id", "day", "tag")
    MergeByKey.mergeWrite(spark, dir, updates, Seq("id"), col("day") === 1L)
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("applyChangeLog: latest-wins sequencing — update-then-delete " +
       "deletes, delete-then-reinsert exists, stale update loses") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v")
    val changes = Seq(
      (1L, "a2", "U", 1L), (1L, "x", "D", 2L),   // U then D -> gone
      (2L, "zz", "D", 1L), (2L, "b9", "I", 2L),  // D then I -> b9
      (3L, "c9", "U", 2L), (3L, "c1", "U", 1L),  // stale seq-1 loses
      (5L, "e1", "I", 1L))                        // plain insert
      .toDF("id", "v", "op", "seq")
    val got = MergeByKey.applyChangeLog(target, changes, Seq("id"),
        "op", "seq")
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "b9"), (3L, "c9"), (4L, "d"), (5L, "e1")))
  }
}
