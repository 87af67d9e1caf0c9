package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) keys and the
  * clustered writer built on them.
  *
  * At 100 TB a table is pruned or it is scanned: sorting files by ONE
  * column gives min/max row-group pruning on that column only, while
  * interleaving the bits of two bucketed dimensions gives useful
  * min/max bounds on BOTH — the standard layout for fact tables
  * queried by (entity, time) or (lat, lon) boxes. The key is pure
  * 64-bit integer arithmetic (codegen'd, engine-portable), so a
  * DuckDB oracle reproduces it bit-for-bit.
  */
object Layout {

  /** Interleaved-bit Z-order key of two bucket columns (each in
    * [0, 2^bits)): bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. Unrolled to a flat OR chain — one codegen'd long
    * expression, no loop, no UDF. */
  def zorder2(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L): Column) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** DuckDB fragment computing the identical key (same bit layout,
    * same BIGINT arithmetic). */
  def zorder2DuckSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i}) | " +
        s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** Write `df` Z-clustered: range-partition then sort by the key, so
    * every output file covers a tight z range and parquet min/max
    * row-group stats prune 2-D box queries. `numFiles` sizes the
    * range exchange (at scale: total bytes / target file size). */
  def zorderWrite(df: DataFrame, zKey: Column, numFiles: Int,
                  path: String): Unit = {
    graft.core.PlanStats.markBatchSinkIo()
    df.withColumn("__z", zKey)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` as a hash-bucketed, bucket-sorted catalog table at
    * `path`. Two tables bucketed the same way on their join key
    * equi-join with ZERO exchange and zero sort — the layout
    * investment that pays for itself on every subsequent join. At
    * 100 TB this is the difference between re-shuffling the fact
    * table per query and never shuffling it: the bucket id pins each
    * row's file, so Spark's scan reports hash distribution + sort
    * order and the sort-merge join consumes both as-is.
    *
    * The write itself shuffles once (`repartition` on the bucket
    * column, matching the bucket spec so each task writes whole
    * buckets instead of numBuckets files each).
    *
    * SAFETY COUPLING: the session sets
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`, which
    * is only sound when every bucket holds EXACTLY ONE data file (two
    * files per bucket would be concatenated, not merged, and the scan
    * would claim a sort order it doesn't have — silently corrupting
    * sort-merge joins). One-file-per-bucket holds here because
    * `repartition(n, col)` and the bucket spec use the SAME hash
    * (murmur3 pmod n), so each write task owns whole buckets. That
    * coincidence is an implementation detail of Spark, so the write
    * VERIFIES the invariant post-hoc and fails loudly rather than
    * letting a future Spark change (or a bypassing writer) corrupt
    * joins downstream. */
  def bucketedWrite(df: DataFrame, table: String, path: String,
                    bucketCol: String, numBuckets: Int): Unit = {
    graft.core.PlanStats.markBatchSinkIo()
    df.repartition(numBuckets, col(bucketCol))
      .write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
    // bucket files are named part-<task>_<...>.c000.snappy.parquet with
    // the bucket id embedded as _NNNNN before the extension; assert no
    // bucket id appears on two data files
    val dir = new java.io.File(
      if (path.startsWith("file:")) new java.net.URI(path).getPath
      else path)
    val bucketIds = Option(dir.listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .filter(n => n.startsWith("part-") && !n.endsWith(".crc"))
      .flatMap(n => "_(\\d{5})\\.".r.findFirstMatchIn(n).map(_.group(1)))
    val dupes = bucketIds.groupBy(identity).filter(_._2.length > 1).keys
    require(dupes.isEmpty,
      s"bucketedWrite($table): buckets ${dupes.mkString(",")} have >1 " +
        "data file — the one-file-per-bucket invariant that makes " +
        "legacy.bucketedTableScan.outputOrdering safe is broken")
  }

  /** Co-located equi-join of two same-bucketed catalog tables (each
    * bucketed by its own join key, same bucket count). The merge hint
    * commits to sort-merge — the strategy that can consume the
    * bucketed distribution directly — so neither side exchanges
    * regardless of size-based broadcast heuristics. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   leftTable: String, leftKey: String,
                   rightTable: String, rightKey: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))

  /** Partition-scoped overwrite (dynamic mode): only the partitions
    * present in `df` are replaced; all others are left byte-untouched.
    * The reference re-derives a 24 h window daily into a table holding
    * years (`lambda/trips_lambda.py:218-221`) — at scale that MUST
    * rewrite one day's partition, not the table. Spark's static
    * overwrite mode would truncate everything first; `dynamic` scopes
    * the delete to partitions the incoming frame actually carries. */
  def dynamicOverwrite(df: DataFrame, partitionCol: String,
                       path: String): Unit = {
    graft.core.PlanStats.markBatchSinkIo()
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
  }
}
