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
      .map { case (y, hr, dw, c) => (y, hr, dw, c, Math.floorDiv(c, 10000L)) }

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

  test("q479 ridge regression: Cramer's rule replayed in BigInt from " +
       "the same rows lands on identical weights") {
    val rows = eventsF.map { case (_, hr, dw, c, _) => (hr, dw, c) }
    val lam = BigInt(1000)
    val n = BigInt(rows.size)
    def S(f: ((Long, Long, Long)) => BigInt): BigInt = rows.map(f).sum
    val sh = S(r => BigInt(r._1)); val sd = S(r => BigInt(r._2))
    val shh = S(r => BigInt(r._1) * r._1)
    val shd = S(r => BigInt(r._1) * r._2)
    val sdd = S(r => BigInt(r._2) * r._2)
    val sy = S(r => BigInt(r._3)); val shy = S(r => BigInt(r._1) * r._3)
    val sdy = S(r => BigInt(r._2) * r._3)
    def det3(a: BigInt, b: BigInt, c: BigInt, d: BigInt, e: BigInt,
             f: BigInt, p: BigInt, q: BigInt, r: BigInt): BigInt =
      a * (e * r - f * q) - b * (d * r - f * p) + c * (d * q - e * p)
    val a11 = n + lam; val a22 = shh + lam; val a33 = sdd + lam
    val det = det3(a11, sh, sd, sh, a22, shd, sd, shd, a33)
    val d0 = det3(sy, sh, sd, shy, a22, shd, sdy, shd, a33)
    val d1 = det3(a11, sy, sd, sh, shy, shd, sd, sdy, a33)
    val d2 = det3(a11, sh, sy, sh, a22, shy, sd, shd, sdy)
    val r = q("q479_ridge_cramer").collect().head
    assert(r.getAs[Long]("n") == rows.size.toLong)
    assert(r.getAs[Long]("w0_e6") ==
      roundHalfUp(d0.toDouble / det.toDouble * 1e6))
    assert(r.getAs[Long]("w1_e6") ==
      roundHalfUp(d1.toDouble / det.toDouble * 1e6))
    assert(r.getAs[Long]("w2_e6") ==
      roundHalfUp(d2.toDouble / det.toDouble * 1e6))
  }

  test("q478 PCA power iteration: the integer-lattice walk replayed " +
       "in plain Scala reproduces the final vector and lambda") {
    val dims = embPts.head._2.length
    var v = Array.tabulate(dims)(d => if (d == 0) 1000000L else 0L)
    var n2Final = BigInt(0)
    (1 to 2).foreach { _ =>
      val w = Array.fill(dims)(BigInt(0))
      embPts.foreach { case (_, x) =>
        val sc = x.zip(v).map { case (a, b) => a * b }.sum
        x.indices.foreach(d => w(d) += BigInt(x(d)) * sc)
      }
      val w9 = w.map(b => roundHalfUp(b.toDouble / 1e9))
      val n2 = w9.map(a => BigInt(a) * a).sum
      n2Final = n2
      v = w9.map(a => roundHalfUp(
        a.toDouble / math.sqrt(math.max(n2.toDouble, 1.0)) * 1e6))
    }
    val lambda = roundHalfUp(
      math.sqrt(math.max(n2Final.toDouble, 1.0)) / 1000.0)
    val got = q("q478_pca_power").collect().sortBy(_.getAs[Long]("dim"))
    assert(got.length == dims)
    got.zipWithIndex.foreach { case (r, d) =>
      assert(r.getAs[Long]("v_e6") == v(d), s"dim $d")
      assert(r.getAs[Long]("lambda_e6") == lambda)
    }
    // a unit vector on the e6 lattice, within quantization slack
    val norm2 = v.map(a => a.toDouble * a).sum
    assert(math.abs(math.sqrt(norm2) - 1e6) < 100.0)
  }

  test("q480 learning curve: each train-fraction stump replayed with " +
       "exact rational argmax; training sets strictly grow") {
    val evb = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(hour(col("ts_s")).cast("long").as("hr"),
        round(col("value") * 100).cast("long").as("y"),
        col("event_id").cast("string").as("eid"))
      .as[(Long, Long, String)].collect().toSeq
      .map { case (hr, y, eid) => (hr, y, hash60(s"lc:$eid") % 10L) }
    def fitAndEval(k: Long): (Long, Long, Long, Long, BigInt, BigInt) = {
      val train = evb.filter(_._3 < k).map { case (hr, y, _) => (hr, y) }
      val axis = train.groupBy(_._1).map { case (f, v) =>
        (f, v.size.toLong, v.map(_._2).map(BigInt(_)).sum,
          v.map(_._2).map(x => BigInt(x) * x).sum)
      }.toSeq.sortBy(_._1)
      val nn = axis.map(_._2).sum
      val ss = axis.map(_._3).sum; val qq = axis.map(_._4).sum
      var nLe = 0L; var sLe = BigInt(0); var qLe = BigInt(0)
      case class C(f: Long, gn: BigInt, gd: BigInt, nLe: Long,
                   sLe: BigInt, qLe: BigInt)
      val cands = axis.dropRight(1).map { case (f, nf, sf, qf) =>
        nLe += nf; sLe += sf; qLe += qf
        val nGt = nn - nLe; val sGt = ss - sLe
        C(f, sLe * sLe * nGt + sGt * sGt * nLe, BigInt(nLe) * nGt,
          nLe, sLe, qLe)
      }
      val best = cands.reduceLeft { (a, b) =>
        val cmp = (a.gn * b.gd).compare(b.gn * a.gd)
        if (cmp > 0 || (cmp == 0 && a.f < b.f)) a else b
      }
      val nGt = nn - best.nLe; val sGt = ss - best.sLe
      val pl = roundHalfUp(best.sLe.toDouble / best.nLe)
      val pg = roundHalfUp(sGt.toDouble / nGt)
      val trainSse =
        (best.qLe - 2 * BigInt(pl) * best.sLe + BigInt(best.nLe) * pl * pl) +
        ((qq - best.qLe) - 2 * BigInt(pg) * sGt + BigInt(nGt) * pg * pg)
      val hold = evb.filter(_._3 == 9L)
      val valSse = hold.map { case (hr, y, _) =>
        val p = if (hr <= best.f) pl else pg
        BigInt(y - p) * (y - p)
      }.sum
      (nn, best.f, pl, pg, trainSse, valSse)
    }
    val got = q("q480_learning_curve").collect()
      .sortBy(_.getAs[Long]("k"))
    assert(got.length == 9)
    var prevN = -1L
    got.foreach { r =>
      val k = r.getAs[Long]("k")
      val (nn, thr, pl, pg, tr, vl) = fitAndEval(k)
      assert(r.getAs[Long]("n_train") == nn, s"k=$k")
      assert(r.getAs[Long]("thr") == thr, s"k=$k")
      assert(r.getAs[Long]("pred_le") == pl && r.getAs[Long]("pred_gt") == pg)
      assert(BigInt(r.getAs[Long]("train_sse")) == tr, s"k=$k")
      assert(BigInt(r.getAs[Long]("val_sse")) == vl, s"k=$k")
      assert(nn > prevN); prevN = nn
    }
  }

  test("q481 Rocchio classifier: the full train-and-score loop " +
       "replayed in plain Scala reproduces the confusion matrix") {
    val docs = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select("doc_id", "lang", "text").as[(Long, String, String)]
      .collect().toSeq
    val toks = docs.map { case (id, lang, t) =>
      (id, lang, t.split(" ").filter(_.nonEmpty))
    }
    val vocab = toks.flatMap(_._3).groupBy(identity)
      .map { case (w, v) => (w, v.size) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(50).map(_._1).toSet
    val nDocs = docs.size.toLong
    val df = toks.flatMap { case (id, _, ws) =>
      ws.filter(vocab).distinct.map(w => (w, id))
    }.distinct.groupBy(_._1).map { case (w, v) => (w, v.size.toLong) }
    val idf = df.map { case (w, d) =>
      (w, roundHalfUp(math.log(nDocs.toDouble / d) * 1e6))
    }
    val docw = toks.map { case (id, lang, ws) =>
      val tf = ws.filter(vocab).groupBy(identity)
        .map { case (w, v) => (w, v.size.toLong * idf(w)) }
      (id, lang, tf)
    }.filter(_._3.nonEmpty)
    val cent = docw.groupBy(_._2).map { case (lang, ds) =>
      (lang, ds.flatMap(_._3).groupBy(_._1)
        .map { case (w, v) => (w, v.map(x => BigInt(x._2)).sum) })
    }
    val nc2 = cent.map { case (l, c) => (l, c.values.map(x => x * x).sum) }
    val expected = docw.map { case (id, lang, tf) =>
      val nd2 = tf.values.map(x => BigInt(x) * x).sum
      val scores = cent.toSeq.map { case (cl, c) =>
        val dot = tf.map { case (w, x) =>
          BigInt(x) * c.getOrElse(w, BigInt(0))
        }.sum
        (cl, dot.toDouble / math.sqrt(nd2.toDouble * nc2(cl).toDouble))
      }
      val ms = scores.map(_._2).max
      (lang, scores.filter(_._2 == ms).map(_._1).min)
    }.groupBy(identity).map { case ((t, p), v) => (t, p, v.size.toLong) }
      .toSeq.sorted
    val got = q("q481_rocchio_tfidf").collect()
      .map(r => (r.getAs[String]("true_lang"),
        r.getAs[String]("pred_lang"), r.getAs[Long]("n"))).toSeq.sorted
    assert(got == expected)
  }

  test("q482 bagged stumps: every replicate replayed end-to-end in " +
       "plain Scala (own md5 + the Poisson CDF literals)") {
    val cdf = graft.operators.Curate.poissonCdf1
    val ev = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("event_id").cast("string").as("eid"),
        hour(col("ts_s")).cast("long").as("hr"),
        round(col("value") * 100).cast("long").as("y"))
      .as[(String, Long, Long)].collect().toSeq
    def pw(u: Double): Long = {
      val i = cdf.indexWhere(u < _)
      (if (i < 0) cdf.length else i).toLong
    }
    val expected = (0L to 7L).map { rep =>
      val wtd = ev.map { case (eid, hr, y) =>
        val u = hash60(s"bag:$eid:$rep").toDouble / 1.152921504606846976e18
        (hr, y, pw(u))
      }
      val axis = wtd.groupBy(_._1).map { case (f, v) =>
        (f, v.map(_._3).sum, v.map(r => BigInt(r._3) * r._2).sum)
      }.toSeq.sortBy(_._1)
      val nn = axis.map(_._2).sum; val ss = axis.map(_._3).sum
      var nLe = 0L; var sLe = BigInt(0)
      case class C(f: Long, gn: BigInt, gd: BigInt, nLe: Long, sLe: BigInt)
      val cands = axis.dropRight(1).flatMap { case (f, nf, sf) =>
        nLe += nf; sLe += sf
        if (nLe == 0L || nLe == nn) None
        else {
          val nGt = nn - nLe; val sGt = ss - sLe
          Some(C(f, sLe * sLe * nGt + sGt * sGt * nLe,
            BigInt(nLe) * nGt, nLe, sLe))
        }
      }
      val best = cands.reduceLeft { (a, b) =>
        val cmp = (a.gn * b.gd).compare(b.gn * a.gd)
        if (cmp > 0 || (cmp == 0 && a.f < b.f)) a else b
      }
      val nGt = nn - best.nLe; val sGt = ss - best.sLe
      (rep, best.f, roundHalfUp(best.sLe.toDouble / best.nLe),
        roundHalfUp(sGt.toDouble / nGt), nn)
    }
    val got = q("q482_bagged_stumps").collect()
      .map(r => (r.getAs[Long]("rep"), r.getAs[Long]("thr"),
        r.getAs[Long]("pred_le"), r.getAs[Long]("pred_gt"),
        r.getAs[Long]("n_eff"))).toSeq.sortBy(_._1)
    assert(got == expected)
  }

  private lazy val ratings: Seq[(Long, String, Long)] = {
    val li = graft.core.Tables.load(spark, TestSpark.sf001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
      .as[(Long, Long, Double)].collect().toSeq
    val ord = graft.core.Tables.load(spark, TestSpark.sf001, "orders")
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect().toMap
    val brand = graft.core.Tables.load(spark, TestSpark.sf001, "part")
      .select("p_partkey", "p_brand").as[(Long, String)].collect().toMap
    li.map { case (ok, pk, qn) => ((ord(ok), brand(pk)), qn.toLong) }
      .groupBy(_._1).map { case ((u, b), v) => (u, b, v.map(_._2).sum) }
      .toSeq
  }

  test("q483 ALS alternation: both Cramer solves replayed in plain " +
       "Scala over BigInt normal equations reproduce the brand factors") {
    val lamU = BigInt("1000000000000"); val lamI = BigInt(1000000)
    val f: Map[String, (Long, Long)] = ratings.map(_._2).distinct
      .map(b => b -> ((1000000L, hash60(s"als:$b") % 1000000L))).toMap
    val uw = ratings.groupBy(_._1).map { case (u, rows) =>
      var (a11, a12, a22, c0, c1) =
        (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))
      rows.foreach { case (_, b, r) =>
        val (f0, f1) = f(b)
        a11 += BigInt(f0) * f0; a12 += BigInt(f0) * f1
        a22 += BigInt(f1) * f1
        c0 += BigInt(f0) * r; c1 += BigInt(f1) * r
      }
      val det = (a11 + lamU) * (a22 + lamU) - a12 * a12
      val n0 = c0 * (a22 + lamU) - c1 * a12
      val n1 = (a11 + lamU) * c1 - a12 * c0
      u -> ((roundHalfUp(n0.toDouble / det.toDouble * 1e9),
        roundHalfUp(n1.toDouble / det.toDouble * 1e9)))
    }
    val expected = ratings.groupBy(_._2).map { case (b, rows) =>
      var (a11, a12, a22, c0, c1) =
        (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))
      rows.foreach { case (u, _, r) =>
        val (w0, w1) = uw(u)
        a11 += BigInt(w0) * w0; a12 += BigInt(w0) * w1
        a22 += BigInt(w1) * w1
        c0 += BigInt(w0) * r; c1 += BigInt(w1) * r
      }
      val det = (a11 + lamI) * (a22 + lamI) - a12 * a12
      (b, rows.size.toLong,
        roundHalfUp((c0 * (a22 + lamI) - c1 * a12).toDouble
          / det.toDouble * 1e9),
        roundHalfUp(((a11 + lamI) * c1 - a12 * c0).toDouble
          / det.toDouble * 1e9))
    }.toSeq.sortBy(_._1)
    val got = q("q483_als_alternation").collect()
      .map(r => (r.getAs[String]("brand"), r.getAs[Long]("n_users"),
        r.getAs[Long]("g0_e6"), r.getAs[Long]("g1_e6"))).toSeq
    assert(got == expected)
  }

  test("q484 damped-bias baseline: the two closed-form passes and the " +
       "RMSE replayed over BigInt residuals; biases really shrink SSE") {
    val re6 = ratings.map { case (u, b, r) => (u, b, r * 1000000L) }
    val n = re6.size.toLong
    val mu = roundHalfUp(re6.map(r => BigInt(r._3)).sum.toDouble / n)
    val bi = re6.groupBy(_._2).map { case (b, v) =>
      (b, v.size.toLong, roundHalfUp(
        v.map(r => BigInt(r._3 - mu)).sum.toDouble / (v.size + 25)))
    }
    val biM = bi.map { case (b, _, x) => (b, x) }.toMap
    val bu = re6.groupBy(_._1).map { case (u, v) =>
      (u, roundHalfUp(v.map(r => BigInt(r._3 - mu - biM(r._2))).sum.toDouble
        / (v.size + 10)))
    }
    val sse = re6.map { case (u, b, r) =>
      val d = BigInt(r - mu - biM(b) - bu(u)); d * d
    }.sum
    val rmse = roundHalfUp(math.sqrt(sse.toDouble / n))
    val sse0 = re6.map { case (_, _, r) => val d = BigInt(r - mu); d * d }.sum
    assert(sse < sse0) // the biases genuinely explain variance
    val expected = bi.map { case (b, ni, bie) => (b, ni, bie, mu, rmse) }
      .toSeq.sortBy(_._1)
    val got = q("q484_bias_baseline").collect()
      .map(r => (r.getAs[String]("brand"), r.getAs[Long]("n_i"),
        r.getAs[Long]("bi_e6"), r.getAs[Long]("mu_e6"),
        r.getAs[Long]("rmse_e6"))).toSeq
    assert(got == expected)
  }

  test("q485/q486 MacQueen: the streaming twin equals the batch walk " +
       "row-for-row, and a plain-Scala replay equals both") {
    def rows(name: String) = q(name).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("y"),
        r.getAs[Long]("k"), r.getAs[Long]("c1"), r.getAs[Long]("n1"),
        r.getAs[Long]("c2"), r.getAs[Long]("n2"))).toSeq
    val batch = rows("q485_macqueen_walk")
    val stream = rows("q486_stream_macqueen")
    assert(batch == stream)
    // third implementation: the day series replayed as a literal loop
    val day = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long")
        .as("d"), col("y"))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    var (c1, n1, c2, n2) = (day(0)._2, 1L, day(1)._2, 1L)
    val expected = Seq((day(0)._1, day(0)._2, 1L, c1, n1, c2, n2),
      (day(1)._1, day(1)._2, 2L, c1, n1, c2, n2)) ++
      day.drop(2).map { case (d, y) =>
        val k = if (math.abs(y - c1) <= math.abs(y - c2)) 1L else 2L
        if (k == 1L) { c1 = roundHalfUp((c1 * n1 + y).toDouble / (n1 + 1)); n1 += 1 }
        else { c2 = roundHalfUp((c2 * n2 + y).toDouble / (n2 + 1)); n2 += 1 }
        (d, y, k, c1, n1, c2, n2)
      }
    assert(batch == expected)
    // both clusters are actually in use on this data
    assert(batch.last._5 > 1L && batch.last._7 > 1L)
  }

  test("q487 greedy coverage: the k=5 loop replayed over plain-Scala " +
       "STRING shingle sets (no hashes); marginal gains non-increasing " +
       "(submodularity)") {
    val sets: Map[Long, Set[String]] = docTok.map { case (id, ws) =>
      (id, ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet)
    }.toMap
    var covered = Set.empty[String]
    var chosen = Set.empty[Long]
    val expected = (1 to 5).map { round =>
      val (doc, gain) = sets.view.filterKeys(!chosen(_))
        .map { case (id, s) => (id, (s -- covered).size.toLong) }
        .toSeq.minBy { case (id, g) => (-g, id) }
      covered ++= sets(doc); chosen += doc
      (round.toLong, doc, gain, covered.size.toLong)
    }
    val got = q("q487_greedy_coverage").collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("gain"), r.getAs[Long]("covered_total"))).toSeq
      .sortBy(_._1)
    assert(got == expected)
    got.sliding(2).foreach { case Seq(a, b) => assert(a._3 >= b._3)
      case _ => }
  }

  test("q488 label-noise screen: margins recomputed through the " +
       "Rocchio scala replay; every suspect mispredicted with a " +
       "positive margin, ranked descending") {
    val docs = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select("doc_id", "lang", "text").as[(Long, String, String)]
      .collect().toSeq
    val toks = docs.map { case (id, lang, t) =>
      (id, lang, t.split(" ").filter(_.nonEmpty))
    }
    val vocab = toks.flatMap(_._3).groupBy(identity)
      .map { case (w, v) => (w, v.size) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(50).map(_._1).toSet
    val nDocs = docs.size.toLong
    val df = toks.flatMap { case (id, _, ws) =>
      ws.filter(vocab).distinct.map(w => (w, id))
    }.distinct.groupBy(_._1).map { case (w, v) => (w, v.size.toLong) }
    val idf = df.map { case (w, d) =>
      (w, roundHalfUp(math.log(nDocs.toDouble / d) * 1e6))
    }
    val docw = toks.map { case (id, lang, ws) =>
      (id, lang, ws.filter(vocab).groupBy(identity)
        .map { case (w, v) => (w, v.size.toLong * idf(w)) })
    }.filter(_._3.nonEmpty)
    val cent = docw.groupBy(_._2).map { case (lang, ds) =>
      (lang, ds.flatMap(_._3).groupBy(_._1)
        .map { case (w, v) => (w, v.map(x => BigInt(x._2)).sum) })
    }
    val nc2 = cent.map { case (l, c) => (l, c.values.map(x => x * x).sum) }
    val expected = docw.flatMap { case (id, lang, tf) =>
      val nd2 = tf.values.map(x => BigInt(x) * x).sum
      val scores = cent.toSeq.map { case (cl, c) =>
        val dot = tf.map { case (w, x) =>
          BigInt(x) * c.getOrElse(w, BigInt(0))
        }.sum
        (cl, roundHalfUp(dot.toDouble
          / math.sqrt(nd2.toDouble * nc2(cl).toDouble) * 1e6))
      }
      val ms = scores.map(_._2).max
      val pred = scores.filter(_._2 == ms).map(_._1).min
      val own = scores.find(_._1 == lang).get._2
      if (pred != lang) Some((id, lang, pred, ms - own)) else None
    }.sortBy { case (id, _, _, m) => (-m, id) }.take(20)
    val got = q("q488_label_noise").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("true_lang"),
        r.getAs[String]("pred_lang"), r.getAs[Long]("margin_e6"))).toSeq
    assert(got == expected)
    got.foreach { case (_, t, p, m) => assert(t != p && m > 0L) }
  }

  test("q489 model averaging: shard, averaged, and full-batch models " +
       "replayed as plain-Scala loops; the average is NOT the full " +
       "model (the tradeoff the op exists to show)") {
    val rows = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("event_id").cast("string").as("eid"),
        when(col("event_type") === "purchase", 1L).otherwise(-1L).as("y"),
        hour(col("ts_s")).cast("long").as("hr"),
        pmod(expr(
          "CAST(datediff(to_date(ts_s), DATE '1970-01-01') AS BIGINT)"),
          lit(7L)).as("dw"),
        round(col("value") * 100).cast("long").as("c"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
      .map { case (eid, y, hr, dw, c) =>
        (hash60(s"fa:$eid") % 8L, y, Array(1L, hr, dw, Math.floorDiv(c, 10000L)))
      }
    def twoEpochs(data: Seq[(Long, Array[Long])]): Seq[Long] = {
      val w1 = (0 to 3).map(j => data.map { case (y, x) => y * x(j) }.sum)
      val mis = data.filter { case (y, x) =>
        y * x.zip(w1).map { case (a, b) => a * b }.sum <= 0L
      }
      (0 to 3).map(j => w1(j) + mis.map { case (y, x) => y * x(j) }.sum)
    }
    val shard = (0L to 7L).map { s =>
      s -> twoEpochs(rows.collect { case (sh, y, x) if sh == s => (y, x) })
    }.toMap
    val avg = (0 to 3).map(j =>
      roundHalfUp(shard.values.map(_(j)).sum.toDouble / 8.0))
    val full = twoEpochs(rows.map { case (_, y, x) => (y, x) })
    def nMis(w: Seq[Long]): Long = rows.count { case (_, y, x) =>
      y * x.zip(w).map { case (a, b) => a * b }.sum <= 0L
    }.toLong
    val expected = (shard.map { case (s, w) =>
      (s"shard$s", w(0), w(1), w(2), w(3), nMis(w))
    }.toSeq :+ (("avg", avg(0), avg(1), avg(2), avg(3), nMis(avg)))
      :+ (("full", full(0), full(1), full(2), full(3), nMis(full))))
      .sortBy(_._1)
    val got = q("q489_model_averaging").collect()
      .map(r => (r.getAs[String]("model"), r.getAs[Long]("w0"),
        r.getAs[Long]("w1"), r.getAs[Long]("w2"), r.getAs[Long]("w3"),
        r.getAs[Long]("n_mis"))).toSeq.sortBy(_._1)
    assert(got == expected)
    // the averaged model differs from the full-batch model: epoch 2
    // makes shard training nonlinear, which is the whole point
    val a = got.find(_._1 == "avg").get
    val fl = got.find(_._1 == "full").get
    assert((a._2, a._3, a._4, a._5) != ((fl._2, fl._3, fl._4, fl._5)))
  }
}
