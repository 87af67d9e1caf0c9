package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.sources.v2.{AtomicTsv, AtomicTsvBatchWrite}

/** The V2 atomic sink's commit protocol, exercised on BOTH paths:
  * the real Spark write path for happy/append/job-failure, and the
  * protocol objects driven directly for task-retry semantics (local
  * mode runs with task maxFailures = 1, so an in-scheduler retry
  * cannot be provoked in-JVM — the staged-file/commit-message
  * contract is ours and is tested as such). */
class AtomicSinkSpec extends AnyFunSuite {
  import TestSpark.spark

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", DoubleType)))

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_sink_$tag").toString

  test("happy path: spark write publishes a manifest; read-back is " +
       "exact and orphaned directory files are invisible") {
    val dir = tmp("happy")
    spark.range(0, 1000, 1, 8)
      .select(col("id").as("a"), (col("id") * lit(0.5)).as("b"))
      .write.format("graft.sources.v2.AtomicTsvSinkProvider")
      .option("path", dir).mode("append").save()
    assert(AtomicTsv.manifestRows(dir) == 1000L)
    val back = AtomicTsv.read(spark, dir, schema)
    assert(back.count() == 1000L)
    val agg = back.agg(sum("a"), sum("b")).collect().head
    assert(agg.getLong(0) == 499500L)
    assert(agg.getDouble(1) == 249750.0)
    // readers list the MANIFEST, not the directory: an orphan file is
    // invisible by construction
    Files.write(Paths.get(s"$dir/part-orphan.tsv"),
      "9999\t0.0\n".getBytes)
    assert(AtomicTsv.read(spark, dir, schema).count() == 1000L)
    // staging area fully cleaned after commit
    assert(!Files.exists(Paths.get(s"$dir/_staging"))
      || new File(s"$dir/_staging").list().isEmpty)
  }

  test("append: the second job's manifest carries both jobs' files") {
    val dir = tmp("append")
    def job(lo: Int, hi: Int): Unit =
      spark.range(lo, hi, 1, 4)
        .select(col("id").as("a"), lit(1.0).as("b"))
        .write.format("graft.sources.v2.AtomicTsvSinkProvider")
        .option("path", dir).mode("append").save()
    job(0, 300); job(300, 1000)
    assert(AtomicTsv.manifestRows(dir) == 1000L)
    assert(AtomicTsv.read(spark, dir, schema)
      .agg(countDistinct("a")).collect().head.getLong(0) == 1000L)
  }

  test("task retry: the aborted attempt's staged file is deleted and " +
       "never committed; the retry attempt's file is — no duplicates") {
    val dir = tmp("retry")
    val bw = new AtomicTsvBatchWrite(dir, schema, None)
    val factory =
      bw.createBatchWriterFactory(null.asInstanceOf[PhysicalWriteInfo])
    def row(a: Long, b: Double) =
      new GenericInternalRow(Array[Any](a, b))
    // partition 0, attempt 0: writes two rows, then "fails" → abort
    val w0a = factory.createWriter(0, 7000L)
    w0a.write(row(1L, 0.5)); w0a.write(row(2L, 0.5))
    w0a.abort()
    // partition 0, retry attempt (new taskId → new staged file)
    val w0b = factory.createWriter(0, 7001L)
    w0b.write(row(1L, 0.5)); w0b.write(row(2L, 0.5))
    val m0 = w0b.commit()
    // partition 1, single attempt
    val w1 = factory.createWriter(1, 7002L)
    w1.write(row(3L, 0.25))
    val m1 = w1.commit()
    bw.commit(Array[WriterCommitMessage](m0, m1))
    assert(AtomicTsv.manifestRows(dir) == 3L)
    val vals = AtomicTsv.read(spark, dir, schema)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(vals == Seq(1L, 2L, 3L), s"got $vals")
  }

  test("job abort: nothing becomes visible; a previous job's " +
       "manifest stays intact") {
    val dir = tmp("abort")
    def row(a: Long) = new GenericInternalRow(Array[Any](a, 0.0))
    // job 1 commits two rows
    val bw1 = new AtomicTsvBatchWrite(dir, schema, None)
    val f1 =
      bw1.createBatchWriterFactory(null.asInstanceOf[PhysicalWriteInfo])
    val w = f1.createWriter(0, 1L)
    w.write(row(10L)); w.write(row(11L))
    bw1.commit(Array[WriterCommitMessage](w.commit()))
    assert(AtomicTsv.manifestRows(dir) == 2L)
    // job 2 stages rows then aborts
    val bw2 = new AtomicTsvBatchWrite(dir, schema, None)
    val f2 =
      bw2.createBatchWriterFactory(null.asInstanceOf[PhysicalWriteInfo])
    val w2 = f2.createWriter(0, 2L)
    w2.write(row(99L))
    val m2 = w2.commit()
    bw2.abort(Array[WriterCommitMessage](m2))
    assert(AtomicTsv.manifestRows(dir) == 2L)
    assert(AtomicTsv.read(spark, dir, schema)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 11L))
  }

  test("a failing task through the REAL spark write path aborts the " +
       "job: no manifest, nothing visible") {
    val dir = tmp("fail")
    val ex = intercept[Throwable] {
      spark.range(0, 100, 1, 4)
        .select(col("id").as("a"), lit(0.25).as("b"))
        .write.format("graft.sources.v2.AtomicTsvSinkProvider")
        .option("path", dir)
        .option("failPartitionFirstAttempt", "2")
        .mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("injected")) ||
      msgs(ex).exists(_.contains("aborted")), s"got ${msgs(ex)}")
    assert(AtomicTsv.manifestRows(dir) == 0L)
    assert(AtomicTsv.read(spark, dir, schema).count() == 0L)
  }
}
