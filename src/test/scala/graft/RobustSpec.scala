package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.JaroWinklerE6
import org.apache.spark.unsafe.types.UTF8String

/** The session-7 robust-statistics tier: Jaro–Winkler expression
  * semantics (textbook reference values + codegen/interpreted parity),
  * and hand-computed fixtures for the Theil–Sen / Mann–Whitney /
  * Kendall τ-b building blocks the q258–q265 gates compose.
  */
class RobustSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Long =
    JaroWinklerE6.score(UTF8String.fromString(a), UTF8String.fromString(b))

  test("JaroWinklerE6: classic reference pairs") {
    assert(jw("MARTHA", "MARHTA") == 961111L) // jaro 0.9444, l=3
    assert(jw("DWAYNE", "DUANE") == 840000L)  // jaro 0.8222, l=1
    assert(jw("DIXON", "DICKSONX") == 813333L)
    assert(jw("abc", "abc") == 1000000L)
  }

  test("JaroWinklerE6: boost only above 0.7, prefix capped at 4") {
    // jaro = 0.5833 < 0.7 — the 3-char common prefix must NOT boost
    assert(jw("abcxxxxx", "abcyyyyy") == 583333L)
    // jaro = 0.75, 5-char common prefix counts as 4 → 0.85
    assert(jw("aaaaaabc", "aaaaaxyz") == 850000L)
  }

  test("JaroWinklerE6: degenerate inputs") {
    assert(jw("", "") == 1000000L)
    assert(jw("", "abc") == 0L)
    assert(jw("a", "b") == 0L)
    assert(jw("a", "a") == 1000000L)
  }

  test("JaroWinklerE6: codegen and interpreted paths agree on real names") {
    val df = Seq(
      ("Customer#000000123", "Customer#00000O123"),
      ("Customer#000000123", "Custmer#000000123"),
      ("Customer#000000123", "Customer#XYZ"),
      ("small ring", "small rng")).toDF("a", "b")
    val viaExpr = df.select(JaroWinklerE6.col(col("a"), col("b")))
      .as[Long].collect()
    val direct = df.as[(String, String)].collect().map {
      case (a, b) => jw(a, b)
    }
    assert(viaExpr.toSeq == direct.toSeq)
    assert(viaExpr.forall(v => v >= 0L && v <= 1000000L))
  }

  test("Theil-Sen shape: median pairwise slope resists one outlier day") {
    // y = 10x exactly except one corrupted day; median slope stays 10
    val pts = Seq((0L, 0L), (1L, 10L), (2L, 20L), (3L, 999L), (4L, 40L))
    val slopes = for {
      (x1, y1) <- pts; (x2, y2) <- pts if x1 < x2
    } yield math.round((y2 - y1).toDouble / (x2 - x1).toDouble * 10000.0)
    val sorted = slopes.sorted
    val median = sorted((sorted.size + 1) / 2 - 1)
    assert(median == 100000L) // slope 10 at e4
  }

  test("Mann-Whitney via cumulative counts equals pair enumeration") {
    val a = Seq(5L, 7L, 7L, 9L)
    val b = Seq(4L, 7L, 8L)
    // brute force: 2*U = sum over (x in a, y in b) of 2*[x>y] + [x=y]
    val brute = (for { x <- a; y <- b } yield
      (if (x > y) 2L else 0L) + (if (x == y) 1L else 0L)).sum
    // engine formulation: per distinct value, ca * (2*cb_below + cb_at)
    val ca = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val formula = ca.map { case (v, n) =>
      n * (2L * cb.filter(_._1 < v).values.sum + cb.getOrElse(v, 0L))
    }.sum
    assert(formula == brute)
  }

  test("isotonic minimax closed form equals sequential PAVA") {
    // weighted PAVA (pool adjacent violators), the textbook algorithm
    def pava(ns: Seq[Long], ps: Seq[Long]): Seq[Double] = {
      case class Block(n: Long, p: Long) { def avg: Double = p.toDouble / n }
      val blocks = scala.collection.mutable.ArrayBuffer[Block]()
      val sizes = scala.collection.mutable.ArrayBuffer[Int]()
      ns.indices.foreach { i =>
        blocks += Block(ns(i), ps(i)); sizes += 1
        while (blocks.size > 1 &&
               blocks(blocks.size - 2).avg >= blocks.last.avg) {
          val b = blocks.remove(blocks.size - 1)
          val a = blocks.remove(blocks.size - 1)
          blocks += Block(a.n + b.n, a.p + b.p)
          val s2 = sizes.remove(sizes.size - 1)
          val s1 = sizes.remove(sizes.size - 1)
          sizes += s1 + s2
        }
      }
      blocks.toSeq.zip(sizes).flatMap { case (b, s) => Seq.fill(s)(b.avg) }
    }
    // minimax: fitted(t) = max_{i<=t} min_{j>=t} mean(i..j)
    def minimax(ns: Seq[Long], ps: Seq[Long]): Seq[Double] =
      ns.indices.map { t =>
        (0 to t).map { i =>
          (t until ns.size).map { j =>
            ps.slice(i, j + 1).sum.toDouble / ns.slice(i, j + 1).sum
          }.min
        }.max
      }
    val ns = Seq(10L, 5L, 8L, 12L, 6L, 9L)
    val ps = Seq(1L, 3L, 2L, 9L, 3L, 8L)
    val (a, b) = (pava(ns, ps), minimax(ns, ps))
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    // and the fit is monotone nondecreasing
    assert(b.sliding(2).forall(w => w.head <= w.last + 1e-12))
  }

  test("Kendall tau-b: perfect concordance is 1e6, reversal is -1e6") {
    def taub(xs: Seq[Long], ys: Seq[Long]): Long = {
      val idx = xs.indices
      val pairs = for { i <- idx; j <- idx if i < j } yield (i, j)
      val n0 = pairs.size.toLong
      var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
      pairs.foreach { case (i, j) =>
        val (x1, x2, y1, y2) = (xs(i), xs(j), ys(i), ys(j))
        if ((x1 < x2 && y1 < y2) || (x1 > x2 && y1 > y2)) c += 1
        if ((x1 < x2 && y1 > y2) || (x1 > x2 && y1 < y2)) d += 1
        if (x1 == x2) tx += 1
        if (y1 == y2) ty += 1
      }
      math.round((c - d).toDouble /
        math.sqrt(((n0 - tx) * (n0 - ty)).toDouble) * 1000000.0)
    }
    assert(taub(Seq(1, 2, 3, 4), Seq(10, 20, 30, 40)) == 1000000L)
    assert(taub(Seq(1, 2, 3, 4), Seq(40, 30, 20, 10)) == -1000000L)
    // one tie in y discounts the denominator, tau-b stays in (0, 1)
    val withTie = taub(Seq(1, 2, 3, 4), Seq(10, 20, 20, 40))
    assert(withTie > 0L && withTie < 1000000L)
  }
}
