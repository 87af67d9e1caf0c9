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

  /** CDC changelog application — the replication-consumer op
    * [[merge]] cannot express: a stream of (op ∈ I/U/D, seq, payload)
    * rows applied to a snapshot with LATEST-WINS sequencing (a key
    * updated at seq 3 and deleted at seq 7 is deleted; re-inserted at
    * seq 9 it exists). Two steps, both one-shuffle shapes:
    *
    *  1. collapse the changelog to each key's latest row via
    *     `max_by(struct(payload), seq)` — a map-side-combinable
    *     aggregate, NOT a window sort: at 100 TB a day's changelog is
    *     billions of rows but only |changed keys| survive;
    *  2. anti-join the target against all changed keys (removes
    *     updated + deleted rows), union back the non-delete latest
    *     payloads. Broadcastable when the day's key set is small.
    *
    * `changes` must carry the target's columns plus `opCol`/`seqCol`.
    * Output schema = target schema. */
  def applyChangeLog(target: DataFrame, changes: DataFrame,
                     keys: Seq[String], opCol: String, seqCol: String)
      : DataFrame = {
    val cols = target.columns.toSeq
    val payload = struct((cols :+ opCol).map(col): _*)
    val latest = changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(payload, col(seqCol)).as("__last"))
      .select(col("__last.*"))
    target.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(latest.filter(col(opCol) =!= "D")
        .select(cols.map(col): _*))
  }

  /** SCD Type-2 merge: apply a snapshot of dimension attributes to a
    * versioned dimension table, preserving history.
    *
    * `current` must carry `keys ++ tracked ++ (valid_from, valid_to,
    * is_current)`; `updates` carries `keys ++ tracked` (the new
    * snapshot). For each key in `updates` whose tracked attributes
    * differ (null-safely) from the open row, the open row is closed
    * at `effective` and a new open row starts there; unchanged keys
    * and closed history pass through untouched; unseen keys insert
    * as new open rows. Pure function of its inputs — the caller
    * persists via [[mergeWrite]]'s scope-pruned rewrite.
    *
    * Scale shape: every step is an equi-join or anti-join on the
    * dimension key (broadcast-able for dim-sized tables, shuffled
    * hash beyond), plus unions — no window over the full dimension,
    * so history depth does not affect the merge cost. */
  def scd2(current: DataFrame, updates: DataFrame, keys: Seq[String],
           tracked: Seq[String],
           effective: org.apache.spark.sql.Column): DataFrame = {
    val cols = current.columns.toSeq
    val open = current.filter(col("is_current"))
    val hist = current.filter(!col("is_current"))
    val uCols = keys.map(col) ++ tracked.map(c => col(c).as(s"__u_$c"))
    val u = updates.select(uCols: _*)
    val changed = open.join(u, keys)
      .filter(tracked.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _))
    val changedKeys = changed.select(keys.map(col): _*)
    val closed = open.join(changedKeys, keys, "left_semi")
      .withColumn("valid_to", effective.cast("timestamp"))
      .withColumn("is_current", lit(false))
    val keptOpen = open.join(changedKeys, keys, "left_anti")
    def fresh(df: DataFrame): DataFrame = {
      val renamed = keys.map(col) ++
        tracked.map(c => col(s"__u_$c").as(c))
      df.select(renamed: _*)
        .withColumn("valid_from", effective.cast("timestamp"))
        .withColumn("valid_to", lit(null).cast("timestamp"))
        .withColumn("is_current", lit(true))
        .select(cols.map(col): _*)
    }
    val freshChanged = fresh(changed)
    val freshNew = fresh(u.join(open, keys, "left_anti"))
    hist.select(cols.map(col): _*)
      .unionByName(closed.select(cols.map(col): _*))
      .unionByName(keptOpen.select(cols.map(col): _*))
      .unionByName(freshChanged)
      .unionByName(freshNew)
  }

  /** Time-travel over an [[scd2]]-shaped versioned dimension: the
    * rows valid at instant `at` — `valid_from <= at` and not yet
    * closed (`valid_to` null or after `at`). A version closed exactly
    * at `at` is superseded by the row opened at `at` (validity is
    * [from, to)). Pure partition-prunable filter: snapshotting any
    * point in history scans once, regardless of version depth. */
  def snapshotAt(versioned: DataFrame,
                 at: org.apache.spark.sql.Column): DataFrame =
    versioned.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))

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
    val old = new Path(targetPath + "__merge_old")
    val dest = new Path(targetPath)

    // crash recovery: a previous run that died mid-swap left the
    // whole table at __merge_old (dest renamed away, tmp not yet
    // promoted) — restore it before reading, or the merge below would
    // treat the target as empty and silently drop all history.
    if (!fs.exists(dest) && fs.exists(old)) {
      if (!fs.rename(old, dest))
        sys.error(s"mergeWrite: failed to recover $old -> $dest")
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)

    val merged =
      if (fs.exists(dest)) {
        val t = spark.read.parquet(targetPath)
        val inScope = t.filter(scope)
        val outScope = t.filter(!scope || scope.isNull)
        merge(inScope, updates, keys).unionByName(outScope)
      } else updates

    graft.core.PlanStats.markBatchSinkIo()
    merged.write.mode("overwrite").parquet(tmp.toString)
    // swap via rename-aside, never delete-before-promote: at every
    // instant the full table exists at dest, old, or tmp, and the
    // recovery branch above can always find it. Single-writer only
    // (like the reference's Lambda); multi-writer needs a table
    // format's commit log.
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(dest) && !fs.rename(dest, old))
      sys.error(s"mergeWrite: failed to retire $dest")
    if (!fs.rename(tmp, dest))
      sys.error(s"mergeWrite: failed to promote $tmp -> $dest")
    fs.delete(old, true)
  }

  /** Survivorship (golden-record consolidation): collapse every
    * observation of an entity into one row carrying, per attribute,
    * the value from the LATEST observation where that attribute is
    * non-null — each column keeps its own best provenance, which is
    * what distinguishes this from [[merge]]'s whole-row latest-wins.
    * The ordering key must be a totally-ordering BIGINT (callers pack
    * ties away, e.g. `ts * 10^7 + seq`).
    *
    * Scale shape: one hash aggregate — every `max_by ... FILTER` is
    * commutative-associative, so attributes partial-aggregate
    * map-side and the shuffle carries one row per (entity × task),
    * never the observation history. */
  def survivor(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
               ordCol: String, attrs: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // identifiers are backtick-quoted (with embedded backticks
    // doubled) so column names needing quoting — spaces, dots,
    // hyphens — parse as the intended single identifier instead of
    // failing or resolving to a nested field
    def q(id: String): String = "`" + id.replace("`", "``") + "`"
    val aggs =
      attrs.map(a => expr(
        s"max_by(${q(a)}, ${q(ordCol)}) FILTER (WHERE ${q(a)} IS NOT NULL)")
        .as(a)) ++
        Seq(count(lit(1)).as("n_obs"), max(col(ordCol)).as("last_ord"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
