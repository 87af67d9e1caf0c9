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
                  path: String): Unit =
    df.withColumn("__z", zKey)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
