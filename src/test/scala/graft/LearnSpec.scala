package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.Exact.roundHalfUp

/** Independent checks for the Learn tier: each test recomputes the
  * fitted model BRUTE-FORCE in plain Scala from the same parquet — a
  * third implementation sharing no query machinery with Spark or the
  * DuckDB oracle — and, where the query's argmin rides on a derived
  * double, re-derives the winner with EXACT BigInt rational
  * comparison to prove the double chain picked the true optimum on
  * this data, not a rounding artifact.
  */
class LearnSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf001)

  /** Plain-Scala twin of PortableHash.hash60 (md5 hex prefix). */
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private lazy val eventsF: Seq[(Long, Long, Long, Long, Long)] =
    graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(
        when(col("event_type") === "purchase", 1L).otherwise(-1L).as("y"),
        hour(col("ts_s")).cast("long").as("hr"),
        pmod(expr(
          "CAST(datediff(to_date(ts_s), DATE '1970-01-01') AS BIGINT)"),
          lit(7L)).as("dw"),
        round(col("value") * 100).cast("long").as("c"))
      .as[(Long, Long, Long, Long)].collect().toSeq
      .map { case (y, hr, dw, c) => (y, hr, dw, c, c / 10000L) }

  test("q469 batch perceptron: three epochs replayed as a plain-Scala " +
       "loop land on identical weights and misclassification counts") {
    val rows = eventsF.map { case (y, hr, dw, _, vb) =>
      (y, Array(1L, hr, dw, vb))
    }
    var w = Array(0L, 0L, 0L, 0L)
    val expected = (1 to 3).map { _ =>
      val mis = rows.filter { case (y, x) =>
        y * x.zip(w).map { case (a, b) => a * b }.sum <= 0L
      }
      val nMis = mis.size.toLong
      w = w.indices.map(j => w(j) + mis.map { case (y, x) => y * x(j) }.sum)
        .toArray
      (nMis, w.toSeq)
    }
    val got = q("q469_batch_perceptron").collect()
      .sortBy(_.getAs[Long]("epoch"))
    assert(got.length == 3)
    got.zip(expected).foreach { case (r, (nMis, wExp)) =>
      assert(r.getAs[Long]("n_mis") == nMis)
      assert(Seq(r.getAs[Long]("w0"), r.getAs[Long]("w1"),
        r.getAs[Long]("w2"), r.getAs[Long]("w3")) == wExp)
    }
  }

  test("q468 decision stump: the gini argmin re-derived with EXACT " +
       "BigInt rational comparison picks the same threshold") {
    val xs = eventsF.map { case (y, _, _, c, _) =>
      (c, if (y == 1L) 1L else 0L)
    }
    val axis = xs.groupBy(_._1).map { case (x, v) =>
      (x, v.size.toLong, v.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val nn = axis.map(_._2).sum
    val pp = axis.map(_._3).sum
    var nLe = 0L; var pLe = 0L
    // weighted gini as an exact fraction: for threshold t,
    //   wg(t) = A_le/n_le + A_gt/n_gt  (A = n² − p² − q²)
    // compare wg(t1) < wg(t2) by clearing denominators in BigInt.
    case class Cand(x: Long, num: BigInt, den: BigInt, err: Long,
                    nLe: Long, pLe: Long)
    val cands = axis.dropRight(1).map { case (x, nx, px) =>
      nLe += nx; pLe += px
      val qLe = nLe - pLe; val nGt = nn - nLe
      val pGt = pp - pLe; val qGt = nGt - pGt
      val aLe = BigInt(nLe) * nLe - BigInt(pLe) * pLe - BigInt(qLe) * qLe
      val aGt = BigInt(nGt) * nGt - BigInt(pGt) * pGt - BigInt(qGt) * qGt
      Cand(x, aLe * nGt + aGt * nLe, BigInt(nLe) * nGt,
        math.min(pLe, qLe) + math.min(pGt, qGt), nLe, pLe)
    }
    val best = cands.reduceLeft { (a, b) =>
      val cmp = (a.num * b.den).compare(b.num * a.den)
      if (cmp < 0 || (cmp == 0 && a.x < b.x)) a else b
    }
    val r = q("q468_decision_stump").collect().head
    assert(r.getAs[Long]("threshold_cents") == best.x)
    assert(r.getAs[Long]("n_le") == best.nLe)
    assert(r.getAs[Long]("pos_le") == best.pLe)
    assert(r.getAs[Long]("err") == best.err)
  }

  private lazy val embPts: Seq[(Long, Array[Long])] =
    graft.core.Tables.load(spark, TestSpark.sf001, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
      .map { case (id, v) =>
        (id, v.map(x => roundHalfUp(x.toDouble * 1e6)))
      }

  test("q470 k-means: two Lloyd iterations replayed in plain Scala " +
       "reproduce the cluster sizes and mean distances") {
    var cent: Map[Long, Array[Long]] =
      embPts.filter(_._1 < 4).map { case (id, v) => (id, v) }.toMap
    def assign(): Map[Long, (Long, Long)] = embPts.map { case (id, v) =>
      val scored = cent.toSeq.map { case (k, c) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, k)
      }
      val md = scored.map(_._1).min
      id -> ((scored.filter(_._1 == md).map(_._2).min, md))
    }.toMap
    val a1 = assign()
    cent = cent.map { case (k, old) =>
      val members = embPts.filter(p => a1(p._1)._1 == k)
      if (members.isEmpty) (k, old)
      else (k, old.indices.map { d =>
        roundHalfUp(members.map(_._2(d)).sum.toDouble / members.size)
      }.toArray)
    }
    val a2 = assign()
    val expected = a2.values.groupBy(_._1).map { case (k, v) =>
      (k, v.size.toLong,
        roundHalfUp(v.map(_._2).sum.toDouble / v.size))
    }.toSeq.sortBy(_._1)
    val got = q("q470_kmeans_lloyd").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_points"),
        r.getAs[Long]("mean_dist"))).toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("q473 grid-DBSCAN: core cells and components replayed with " +
       "plain-Scala union-find match the query's clusters") {
    val cells = embPts
      .map { case (_, v) =>
        ((v(0) + 1000000L) / 25000L, (v(1) + 1000000L) / 25000L)
      }
      .groupBy(identity).map { case (c, v) => (c, v.size.toLong) }
    val nTotal = cells.values.sum
    def nmass(c: (Long, Long)): Long =
      (for (dx <- -1L to 1L; dy <- -1L to 1L)
        yield cells.getOrElse((c._1 + dx, c._2 + dy), 0L)).sum
    val core = cells.filter { case (c, _) => nmass(c) * 100L >= nTotal }
    val ck = core.keys.map(c => c -> (c._1 * 4096L + c._2)).toMap
    // union-find over 8-adjacency
    val parent = scala.collection.mutable.Map(ck.values.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((c, _) <- core; dx <- -1L to 1L; dy <- -1L to 1L
         if (dx, dy) != ((0L, 0L))) {
      val n = (c._1 + dx, c._2 + dy)
      if (core.contains(n)) {
        val (ra, rb) = (find(ck(c)), find(ck(n)))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val expected = core.toSeq.map { case (c, cnt) => (find(ck(c)), cnt) }
      .groupBy(_._1).map { case (lbl, v) =>
        (lbl, v.size.toLong, v.map(_._2).sum)
      }.toSeq.sortBy(_._1)
    val got = q("q473_grid_dbscan").collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("n_cells"),
        r.getAs[Long]("n_points"))).toSeq.sortBy(_._1)
    assert(got == expected)
  }

  private lazy val docTok: Seq[(Long, Array[String])] =
    graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, t.split(" ").filter(_.nonEmpty)) }

  test("q475 repeated spans: brute-force 10-gram STRING matching (no " +
       "hashes at all) reproduces the top duplicated docs") {
    val grams = docTok.flatMap { case (id, ws) =>
      ws.sliding(10).zipWithIndex.collect {
        case (g, p) if g.length == 10 => (g.mkString(" "), id, p.toLong)
      }
    }
    val dupKeys = grams.groupBy(_._1).filter(_._2.size > 1).keySet
    val expected = grams.filter(g => dupKeys(g._1))
      .groupBy(_._2).map { case (id, occ) =>
        val ps = occ.map(_._3).sorted
        // merge [p, p+9] spans when the next start ≤ prev end + 1
        var spans = List.empty[(Long, Long)]
        ps.foreach { p =>
          spans match {
            case (s, e) :: rest if p <= e + 1 =>
              spans = (s, math.max(e, p + 9)) :: rest
            case _ => spans = (p, p + 9) :: spans
          }
        }
        val dup = spans.map { case (s, e) => e - s + 1 }.sum
        (id, spans.size.toLong, dup,
          docTok.find(_._1 == id).get._2.length.toLong)
      }.toSeq
      .sortBy { case (id, _, dup, _) => (-dup, id) }.take(20)
      .map { case (id, nSpans, dup, nTok) =>
        (id, nSpans, dup, nTok,
          roundHalfUp(dup.toDouble / nTok * 1e6))
      }
    val got = q("q475_repeated_spans").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("dup_tokens"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("share_e6"))).toSeq
    assert(got == expected)
  }

  test("q477 A-Res weighted sample: keys recomputed in plain Scala " +
       "(own md5) select the identical 50 documents") {
    val docs = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toSeq
    val expected = docs.map { case (id, w) =>
      val u = (hash60(s"wsamp:$id") % 1000000000L + 1L).toDouble / 1e9
      (id, w, roundHalfUp(math.log(u) / w * 1e9))
    }.sortBy { case (id, _, k) => (-k, id) }.take(50)
    val got = q("q477_weighted_sample").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("w"),
        r.getAs[Long]("key_e9"))).toSeq
    assert(got == expected)
    assert(got.map(_._1).distinct.size == 50) // without replacement
  }

  test("q476 boosting rounds: stump fits replayed in plain Scala with " +
       "EXACT rational gain comparison reproduce both rounds") {
    val data = eventsF.map { case (_, hr, dw, c, _) => (hr, dw, c) }
    def fit(rows: Seq[(Long, Long)]): (Long, Long, Long, BigInt, BigInt) = {
      val axis = rows.groupBy(_._1).map { case (f, v) =>
        (f, v.size.toLong, v.map(_._2).map(BigInt(_)).sum,
          v.map(_._2).map(x => BigInt(x) * x).sum)
      }.toSeq.sortBy(_._1)
      val nn = axis.map(_._2).sum
      val ss = axis.map(_._3).sum
      val qq = axis.map(_._4).sum
      var nLe = 0L; var sLe = BigInt(0); var qLe = BigInt(0)
      case class C(f: Long, gn: BigInt, gd: BigInt, nLe: Long,
                   sLe: BigInt, qLe: BigInt)
      val cands = axis.dropRight(1).map { case (f, nf, sf, qf) =>
        nLe += nf; sLe += sf; qLe += qf
        val nGt = nn - nLe; val sGt = ss - sLe
        // gain = s_le²/n_le + s_gt²/n_gt as an exact fraction
        C(f, sLe * sLe * nGt + sGt * sGt * nLe, BigInt(nLe) * nGt,
          nLe, sLe, qLe)
      }
      val best = cands.reduceLeft { (a, b) =>
        val cmp = (a.gn * b.gd).compare(b.gn * a.gd)
        if (cmp > 0 || (cmp == 0 && a.f < b.f)) a else b
      }
      val nGt = nn - best.nLe; val sGt = ss - best.sLe
      val qGt = qq - best.qLe
      val pl = roundHalfUp(best.sLe.toDouble / best.nLe)
      val pg = roundHalfUp(sGt.toDouble / nGt)
      val m0 = roundHalfUp(ss.toDouble / nn)
      val sseBefore = qq - 2 * BigInt(m0) * ss + BigInt(nn) * m0 * m0
      val sseAfter =
        (best.qLe - 2 * BigInt(pl) * best.sLe +
          BigInt(best.nLe) * pl * pl) +
        (qGt - 2 * BigInt(pg) * sGt + BigInt(nGt) * pg * pg)
      (best.f, pl, pg, sseBefore, sseAfter)
    }
    val (t1, pl1, pg1, sb1, sa1) = fit(data.map { case (hr, _, y) => (hr, y) })
    val r1 = data.map { case (hr, dw, y) =>
      (dw, y - (if (hr <= t1) pl1 else pg1))
    }
    val (t2, pl2, pg2, sb2, sa2) = fit(r1)
    val got = q("q476_gbdt_rounds").collect()
      .sortBy(_.getAs[Long]("round"))
    assert(got.length == 2)
    val g1 = got(0); val g2 = got(1)
    assert((g1.getAs[Long]("thr"), g1.getAs[Long]("pred_le"),
      g1.getAs[Long]("pred_gt")) == ((t1, pl1, pg1)))
    assert(BigInt(g1.getAs[Long]("sse_before")) == sb1)
    assert(BigInt(g1.getAs[Long]("sse_after")) == sa1)
    assert((g2.getAs[Long]("thr"), g2.getAs[Long]("pred_le"),
      g2.getAs[Long]("pred_gt")) == ((t2, pl2, pg2)))
    assert(BigInt(g2.getAs[Long]("sse_before")) == sb2)
    assert(BigInt(g2.getAs[Long]("sse_after")) == sa2)
    // boosting actually helps on this data: each stump reduces SSE
    assert(sa1 < sb1 && sa2 < sb2)
  }
}
