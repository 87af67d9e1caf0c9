package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bookmark-driven incremental processing — the reference's "last
  * 24 h, daily" loop (`lambda/trips_lambda.py:218-221`, SURVEY.md
  * §2.9) as a reusable operator.
  *
  * Each run:
  *  1. reads the bookmark (high-water mark of event time processed),
  *  2. hands the caller the half-open slice (bookmark, now] to
  *     transform,
  *  3. upserts the result into the target by key via
  *     [[MergeByKey.mergeWrite]] scoped to the slice (late/duplicate
  *     rows re-derive idempotently, like the reference's ON
  *     CONFLICT),
  *  4. advances the bookmark only after the write commits.
  *
  * A crash between 3 and 4 reprocesses the slice on the next run —
  * safe because the merge is idempotent. That is the same at-least-
  * once + idempotent-sink contract Structured Streaming's file sink
  * gives, in plain batch form.
  */
object Incremental {

  /** Read the bookmark (epoch seconds), or `default` when absent. */
  def readBookmark(spark: SparkSession, path: String, default: Long = 0L): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) default
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  def writeBookmark(spark: SparkSession, path: String, value: Long): Unit = {
    val p = new Path(path)
    val tmp = new Path(path + ".tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // write-then-rename: an in-place create(overwrite) truncates
    // first, so a crash mid-write leaves an empty/partial bookmark —
    // either wedging every later run (NumberFormatException) or
    // silently regressing the high-water mark
    val out = fs.create(tmp, true)
    try out.write(value.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      sys.error(s"writeBookmark: failed to promote $tmp -> $p")
  }

  /** One incremental run.
    *
    * @param source       full input table
    * @param eventTimeS   epoch-seconds column of `source`
    * @param nowS         this run's high-water mark (inject the clock
    *                     — F4/F5: reproducible runs take time as a
    *                     parameter, never current_timestamp())
    * @param transform    slice → rows to upsert (must retain
    *                     `eventTimeS` under the same name)
    * @param targetPath   parquet dir to upsert into
    * @param keys         upsert natural key
    * @param bookmarkPath bookmark file
    * @param timeScopedKeys set true ONLY when `keys` functionally
    *                     determine the event time (the reference's
    *                     fact case: `(bike_id, trip_start)` — a key
    *                     never moves between windows). The merge then
    *                     rewrites just the window's slice of the
    *                     target. With false (default, state tables: a
    *                     key's latest row can live in ANY old window)
    *                     the merge must consider the whole target —
    *                     a time-scoped rewrite would leave the key's
    *                     stale row outside the scope and duplicate it.
    * @return number of rows upserted this run
    */
  def run(spark: SparkSession, source: DataFrame, eventTimeS: String,
          nowS: Long, transform: DataFrame => DataFrame,
          targetPath: String, keys: Seq[String],
          bookmarkPath: String, timeScopedKeys: Boolean = false): Long = {
    val from = readBookmark(spark, bookmarkPath)
    val slice = source.filter(col(eventTimeS) > from &&
      col(eventTimeS) <= nowS)
    // cache across the two actions (count + merge write): without it
    // the whole scan+transform runs twice per incremental run
    val out = transform(slice).cache()
    try {
      val n = out.count()
      if (n > 0) {
        val scope =
          if (timeScopedKeys)
            col(eventTimeS) > from && col(eventTimeS) <= nowS
          else lit(true)
        MergeByKey.mergeWrite(spark, targetPath, out, keys, scope)
      }
      writeBookmark(spark, bookmarkPath, nowS)
      n
    } finally out.unpersist()
  }
}
