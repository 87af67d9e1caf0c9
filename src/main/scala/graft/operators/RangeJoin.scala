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
}
