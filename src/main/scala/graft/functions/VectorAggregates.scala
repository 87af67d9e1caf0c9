package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.11). The reference needs no
  * UDAFs; the north-star similarity ops do — the canonical one is a
  * centroid of embedding vectors (IVF coarse quantizers, cluster
  * summaries, class prototypes).
  *
  * Design for exactness AND scale: the buffer accumulates per-element
  * *scaled longs* (HALF_UP at `scale` decimals, the same rounding
  * Spark SQL's `round` and DuckDB's `round` apply), so
  *
  *  - partial aggregation is exact and associative — results are
  *    bit-identical regardless of partitioning, merge order, task
  *    retries, or cluster size (a plain double-sum centroid is none
  *    of those), and
  *  - the DuckDB oracle can reproduce the centroid exactly, making a
  *    custom UDAF hash-checkable like any built-in.
  */
object VectorAggregates {

  case class CentroidBuf(var sums: Array[Long], var n: Long)

  /** Exact element-wise mean of float vectors. Dimension is learned
    * from the first vector (all inputs must agree; enforced). */
  class ExactCentroid(scale: Int)
      extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {

    private val factor = math.pow(10, scale)

    private def scaled(x: Double): Long =
      new JBigDecimal(x).setScale(0, RoundingMode.HALF_UP).longValue

    override def zero: CentroidBuf = CentroidBuf(Array.emptyLongArray, 0L)

    override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
      if (b.n == 0L && b.sums.isEmpty) b.sums = new Array[Long](v.length)
      require(v.length == b.sums.length,
        s"ragged embedding: ${v.length} vs ${b.sums.length}")
      var i = 0
      while (i < b.sums.length) {
        b.sums(i) += scaled(v(i).toDouble * factor)
        i += 1
      }
      b.n += 1L
      b
    }

    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.sums.length == b.sums.length, "ragged partials")
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        a.n += b.n
        a
      }
    }

    /** sum / 10^scale / n — fixed operation order, mirrored by the
      * oracle SQL so the doubles match bitwise. */
    override def finish(b: CentroidBuf): Seq[Double] =
      b.sums.toSeq.map(s => s.toDouble / factor / b.n)

    override def bufferEncoder: Encoder[CentroidBuf] =
      Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column-style handle: `udaf`-registered exact centroid usable from
    * DataFrame `agg`. */
  def centroidUdaf(scale: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new ExactCentroid(scale))
}
