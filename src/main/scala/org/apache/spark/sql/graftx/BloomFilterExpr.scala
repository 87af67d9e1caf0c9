package org.apache.spark.sql.graftx

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Manual bloom-filter semi-join pruning — the runtime-filter
  * technique Spark's own `InjectRuntimeFilter` rule applies to
  * shuffle joins, exposed as an explicit operator so a pipeline can
  * pin it on a specific join regardless of optimizer cost estimates
  * (at 100 TB, "the optimizer didn't fire" is an outage, not a
  * footnote).
  *
  * Spark registers `bloom_filter_agg` / `might_contain` internally
  * but does not expose them through the public function registry, so
  * this wrapper builds the Catalyst expressions directly (same
  * private[sql] access pattern as the other graftx extensions).
  * The contract mirrors InjectRuntimeFilter's: hash the key with
  * `xxhash64` on BOTH the build side (aggregate child) and the probe
  * side (might_contain value).
  *
  * Exactness: a bloom filter admits false positives but never false
  * negatives, so `probe.filter(mightContain(...))` followed by the
  * real equi-join returns exactly the join's rows — the filter only
  * moves work off the shuffle. (~1% FP at the default 8 bits/item.)
  */
object BloomFilterX {

  /** Aggregate column building a bloom filter binary over `hashedKey`
    * (pass `xxhash64(key)`). */
  def agg(hashedKey: Column, estimatedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      BloomFilterAggregate(ExpressionUtils.expression(hashedKey),
        Literal(estimatedItems), Literal(numBits), 0, 0)
        .toAggregateExpression())

  /** Membership probe against a bloom built by [[agg]] wrapped in a
    * one-row aggregate DataFrame. `BloomFilterMightContain` requires
    * its filter side to be foldable or a scalar subquery — an
    * attribute from a cross-joined one-row frame is rejected at
    * analysis — so the build side is attached as a scalar subquery
    * over the (already analyzed) build plan, exactly how the runtime-
    * filter rule wires it. */
  def mightContain(bloomDf: DataFrame, hashedKey: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        ScalarSubquery(bloomDf.queryExecution.analyzed),
        ExpressionUtils.expression(hashedKey)))
}
