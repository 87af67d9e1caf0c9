package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pareto-front semantics: strict dominance, equal-pair survival,
  * per-cost collapse correctness across partition boundaries. */
class SkylineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def front(rows: Seq[(Long, Long, Long)]): Set[Long] =
    graft.operators.Skyline.paretoFront2D(
        rows.toDF("id", "cost", "gain"), "cost", "gain")
      .select("id").as[Long].collect().toSet

  test("minimize cost / maximize gain: dominated rows drop, " +
       "the cheapest row always survives") {
    // (1) c=10,g=5 survives (cheapest); (2) c=20,g=9 survives;
    // (3) c=30,g=9 dominated by 2 (same gain, cheaper);
    // (4) c=40,g=12 survives; (5) c=50,g=3 dominated by all
    val r = front(Seq((1L, 10L, 5L), (2L, 20L, 9L), (3L, 30L, 9L),
      (4L, 40L, 12L), (5L, 50L, 3L)))
    assert(r == Set(1L, 2L, 4L))
  }

  test("equal (cost, gain) duplicates do not dominate each other — " +
       "all survive; same-cost lower gain drops") {
    val r = front(Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 10L, 4L),
      (4L, 20L, 6L)))
    assert(r == Set(1L, 2L, 4L))
  }

  test("monotone-improving chain keeps every row; monotone-worsening " +
       "chain keeps only the first") {
    val improving = (1L to 40L).map(i => (i, i * 10L, i * 10L))
    assert(front(improving) == improving.map(_._1).toSet)
    val worsening = (1L to 40L).map(i => (i, i * 10L, 1000L - i * 10L))
    assert(front(worsening) == Set(1L))
  }
}
