package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Integer-exact PageRank semantics on hand-computable graphs. */
class GraphSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)],
                    iters: Int): Map[Long, Long] =
    Graph.pageRankIntExact(edges.toDF("src", "dst", "w"), iters)
      .as[(Long, Long)].collect().toMap

  test("symmetric 2-cycle stays uniform at every iteration") {
    for (i <- 1 to 3)
      assert(ranks(Seq((1L, 2L, 1L), (2L, 1L, 1L)), i) ==
        Map(1L -> 500000000L, 2L -> 500000000L))
  }

  test("single edge: source decays to the teleport floor, sink " +
       "accumulates — exact hand-computed fixed-point values") {
    // n=2, r0=500M each; a has the only out-edge
    // it1: a = 75M, b = 75M + (850*500M) div 1000 = 500M
    // it2+: b = 75M + (850*75M) div 1000 = 138_750_000
    assert(ranks(Seq((1L, 2L, 1L)), 1) ==
      Map(1L -> 75000000L, 2L -> 500000000L))
    assert(ranks(Seq((1L, 2L, 1L)), 3) ==
      Map(1L -> 75000000L, 2L -> 138750000L))
  }

  test("weights split a source's rank proportionally (integer div)") {
    // n=3 ⇒ r0 = 333_333_333 each, teleport floor = 50M; ow(a)=4
    // contrib(b) = (333333333·3) div 4 = 249_999_999
    //   → b = 50M + (850·249999999) div 1000 = 262_499_999
    // contrib(c) = (333333333·1) div 4 = 83_333_333
    //   → c = 50M + (850·83333333) div 1000 = 120_833_333
    val r = ranks(Seq((1L, 2L, 3L), (1L, 3L, 1L)), 1)
    assert(r(2L) == 262499999L)
    assert(r(3L) == 120833333L)
    assert(r(1L) == 50000000L)
  }
}
