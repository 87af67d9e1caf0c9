package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact arithmetic helpers.
  *
  * The correctness gate hash-compares our results against a DuckDB
  * oracle. Floating-point SUMs are order-dependent, and Spark and
  * DuckDB accumulate in different orders, so a plain `sum(double)`
  * is not reproducible bit-for-bit. Every money/ratio aggregate in the
  * query suite therefore goes through these helpers:
  *
  *  - fixed-point columns (2/4/6 decimals) are scaled to integers
  *    per row (`round(x * 10^s)` — deterministic, per-row IEEE ops are
  *    identical across engines), summed as longs (associative, exact
  *    below 2^63), and descaled with one double division (again a
  *    single deterministic IEEE op);
  *  - timestamps are truncated to whole seconds before arithmetic, so
  *    epoch deltas are exact integers (the driver testdata carries
  *    nanosecond timestamps, which Spark truncates to micros while
  *    DuckDB keeps — raw sub-second values can never hash-match).
  *
  * The same pattern matters at 100 TB for a different reason: exact
  * long sums make partial (map-side) aggregation bit-stable across
  * retries and partition counts, so results do not depend on cluster
  * topology.
  */
object Exact {

  /** Spark's Round(double, 0) semantics in driver/executor Scala:
    * shortest-decimal BigDecimal, HALF_UP — so a Scala-side walk
    * (mapPartitions over a bounded grain) lands on exactly the value
    * `functions.round` / DuckDB `round` would produce. Same helper
    * shape as the streaming walk's (TwsDrift.sparkRound). */
  def roundHalfUp(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Exact sum of a fixed-point column with `scale` decimal digits. */
  def fixedSum(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f).cast("long")) / f
  }

  /** Exact average: exact scaled sum over exact count. */
  def fixedAvg(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    (sum(round(c * f).cast("long")) / f) / count(lit(1))
  }

  /** DuckDB SQL fragment equivalent to [[fixedSum]].
    * DuckDB's sum(BIGINT) is HUGEINT, hence the outer cast. */
  def fixedSumSql(expr: String, scale: Int = 2): String = {
    val f = "1" + ("0" * scale)
    s"CAST(sum(CAST(round(($expr) * $f) AS BIGINT)) AS BIGINT) / $f.0"
  }

  def fixedAvgSql(expr: String, scale: Int = 2): String =
    s"(${fixedSumSql(expr, scale)}) / count(*)"

  /** Timestamp truncated to whole seconds (cross-engine stable). */
  def sec(c: Column): Column = date_trunc("second", c)

  /** Second-truncated timestamp from a raw event-time column that may
    * be LongType nanoseconds: Spark cannot read parquet
    * TIMESTAMP(NANOS) natively, so sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and this converts. */
  def secFromAny(df: org.apache.spark.sql.DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, never double division: a 2024-epoch ns value
        // exceeds 2^53, so double rounding can shift the quotient
        // across a whole-second boundary and disagree with the
        // oracle's date_trunc by one second
        timestamp_seconds(expr(s"$name div 1000000000L"))
      case _ => date_trunc("second", col(name))
    }

  /** Epoch seconds as a long, after second-truncation. */
  def epochS(c: Column): Column = date_trunc("second", c).cast("long")

  /** DuckDB fragments for the same. */
  def secSql(expr: String): String = s"date_trunc('second', $expr)"
  def epochSSql(expr: String): String =
    s"CAST(epoch(date_trunc('second', $expr)) AS BIGINT)"
}
