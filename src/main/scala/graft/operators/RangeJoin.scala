package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded time-range join: pair each left row with right rows of the
  * same key whose timestamp falls in (leftTs, leftTs + maxDeltaS].
  *
  * The naive formulation — equi-join on key plus an inequality on
  * time — degenerates: Spark plans key-equi + range-residual fine,
  * but every right row of a hot key meets every left row of that key
  * before the residual filters (O(n·m) per key). This operator adds
  * the standard time-bucket equi-key: both sides are bucketed by
  * `maxDeltaS`, the left row joins its own and the next bucket (the
  * only two buckets that can satisfy the bound), so each row meets
  * only ~2 buckets' worth of candidates — O(n · bucket width) at any
  * scale, AQE-splittable on (key, bucket).
  */
object RangeJoin {

  /** @param left      probe side (epoch-seconds long column `leftTs`)
    * @param right     match side (epoch-seconds long column `rightTs`)
    * @param keys      equi-key columns present on both sides
    * @param maxDeltaS right must be within (leftTs, leftTs+maxDeltaS]
    */
  def followingWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      maxDeltaS: Long): DataFrame = {
    val lb = left
      .withColumn("__bucket",
        explode(array(
          floor(col(leftTs) / maxDeltaS),
          floor(col(leftTs) / maxDeltaS) + 1)))
    val rb = right.withColumn("__bucket", floor(col(rightTs) / maxDeltaS))
    lb.join(rb, keys :+ "__bucket")
      .filter(col(rightTs) > col(leftTs) &&
        col(rightTs) <= col(leftTs) + maxDeltaS)
      .drop("__bucket")
  }

  /** Interval-OVERLAP join with no equality key — the temporal join
    * (SCD2 validity intersection, concurrent-session detection,
    * error/click co-occurrence). The naive formulation is a pure
    * theta join: Spark can only plan it as a nested-loop cross
    * product, O(n·m) at any scale. This operator imposes the standard
    * grid: each interval explodes into the `bucketSec`-wide buckets
    * it covers, the join runs as a hash equi-join on bucket, and a
    * qualifying pair is emitted EXACTLY once — in the bucket holding
    * the later of the two starts (every overlapping pair shares that
    * bucket, and only that one is kept) — so no post-join distinct is
    * needed. Cost: O(candidates per bucket), AQE-splittable on the
    * bucket key; size `bucketSec` near the typical interval length so
    * explosion stays O(1) per row.
    *
    * Inputs carry epoch-second long columns `l_start`/`l_end` and
    * `r_start`/`r_end` (inclusive bounds; touching intervals overlap
    * with zero duration). Other column names must not clash. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"bucketSec=$bucketSec must be > 0")
    val lb = left.withColumn("__b", explode(sequence(
      expr(s"l_start div $bucketSec"), expr(s"l_end div $bucketSec"))))
    val rb = right.withColumn("__rb", explode(sequence(
      expr(s"r_start div $bucketSec"), expr(s"r_end div $bucketSec"))))
    lb.join(rb,
        col("__b") === col("__rb") &&
        col("l_start") <= col("r_end") && col("r_start") <= col("l_end") &&
        col("__b") === expr(s"greatest(l_start, r_start) div $bucketSec"))
      .drop("__b", "__rb")
  }
}
