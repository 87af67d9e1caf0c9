package graft

import org.scalatest.funsuite.AnyFunSuite

/** The streaming Holt smoother (q455) against its batch twin (q442):
  * same recurrence, two execution models — rows must be
  * bit-identical, and the recurrence invariants (first error is
  * zero; every later level is the HALF_UP midpoint of observation
  * and forecast) must hold on the stream's own output. */
class TwsHoltSpec extends AnyFunSuite {
  import TestSpark.spark

  private def rows(name: String): Seq[(Long, Long, Long, Long, Long)] =
    SparkEntry.queries(name)(spark, TestSpark.sf001)
      .collect().toSeq.map(r => (
        r.getAs[Long]("d"), r.getAs[Long]("y"),
        r.getAs[Long]("level"), r.getAs[Long]("trend"),
        r.getAs[Long]("err")))
      .sortBy(_._1)

  test("q455 streaming walk is row-for-row identical to the batch " +
       "q442 walk") {
    val stream = rows("q455_stream_holt")
    val batch = rows("q442_holt_walk")
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("q455 invariants: first error is zero; each later step's " +
       "level is the HALF_UP midpoint of y and the prior forecast, " +
       "and err is the one-step forecast error") {
    val stream = rows("q455_stream_holt")
    assert(stream.head._5 == 0L)
    stream.sliding(2).foreach { case Seq(prev, cur) =>
      val f = prev._3 + prev._4
      assert(cur._5 == cur._2 - f, s"err at ${cur._1}")
      assert(cur._3 == graft.analytics.Exact.roundHalfUp(
        (cur._2 + f).toDouble * 0.5), s"level at ${cur._1}")
    case _ => ()
    }
  }
}
