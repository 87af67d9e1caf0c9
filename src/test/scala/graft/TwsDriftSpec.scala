package graft

import org.scalatest.funsuite.AnyFunSuite

/** The streaming Page–Hinkley detector (q426) against its batch twin
  * (q411): same walk, two execution models — rows must be
  * bit-identical, and the protocol invariants (gap = walk minus its
  * running minimum; alarm iff gap beyond λ) must hold on the stream's
  * own output. */
class TwsDriftSpec extends AnyFunSuite {
  import TestSpark.spark

  private def rows(name: String): Seq[(String, Long, Long, Long, Long,
      Long, Long)] =
    SparkEntry.queries(name)(spark, TestSpark.sf001)
      .collect().toSeq.map(r => (
        r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("nd"), r.getAs[Long]("x_e4"),
        r.getAs[Long]("mu_e4"), r.getAs[Long]("ph_e4"),
        r.getAs[Long]("gap_e4"), r.getAs[Long]("alarm")))
      .sortBy(_._1)

  test("q426 streaming walk is row-for-row identical to the batch " +
       "q411 walk") {
    val stream = rows("q426_stream_page_hinkley")
    val batch = rows("q411_page_hinkley")
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("q426 invariants: gap is the walk minus its running minimum; " +
       "alarm fires exactly above lambda") {
    val stream = rows("q426_stream_page_hinkley")
    var runmin = Long.MaxValue
    stream.foreach { case (day, _, _, _, ph, gap, alarm) =>
      runmin = math.min(runmin, ph)
      assert(gap == ph - runmin, s"$day: gap")
      assert(alarm == (if (gap > 5000000L) 1L else 0L), s"$day: alarm")
    }
  }
}
