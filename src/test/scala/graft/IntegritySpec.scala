package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Independent checks for the round-9 integrity tier: beyond the
  * DuckDB oracle (which shares the SQL formulation), these recompute
  * the statistics BRUTE-FORCE in plain Scala from the same parquet —
  * a third implementation that shares no query machinery with either
  * engine — and assert structural invariants the formulas promise.
  */
class IntegritySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf001)

  private lazy val docs: Seq[(Long, String, String, String, Long)] =
    graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq

  private def words(t: String): Array[String] =
    t.split(" ").filter(_.nonEmpty)

  test("q378 Fleiss' kappa equals the textbook formula computed " +
       "brute-force in Scala from the same documents") {
    val m = 3
    def cap5(x: Long): Long = math.min(x, 5L)
    val ratings: Seq[(Long, Long)] = docs.flatMap { case (id, t, _, _, nc) =>
      val r1 = cap5(nc / 150)
      val r2 = cap5(words(t).length / 30)
      val r3 = cap5(t.count(_ == '.').toLong / 2)
      Seq((id, r1), (id, r2), (id, r3))
    }
    val nij = ratings.groupBy(identity).map { case (_, v) => v.size.toLong }
    val nItems = ratings.map(_._1).distinct.size.toLong
    val a2 = nij.map(c => c * c).sum
    val cj = ratings.groupBy(_._2).map { case (_, v) => v.size.toLong }
    val sc2 = cj.map(c => c * c).sum
    // Recompute κ in the SAME cross-multiplied integer form the query
    // divides — κ = ((A−Nm)·Nm − (m−1)·Σc²) / ((m−1)·((Nm)²−Σc²)) —
    // exact integers up to the one IEEE division, so this checks the
    // formula, not double evaluation order (the textbook
    // (P̄−P̄e)/(1−P̄e) form can differ by an ulp and flip the e6
    // rounding on another dataset).
    val nm = BigInt(nItems) * m
    val num = (BigInt(a2) - nm) * nm - BigInt(m - 1) * sc2
    val den = BigInt(m - 1) * (nm * nm - sc2)
    val truth = math.rint(num.toDouble / den.toDouble * 1e6).toLong
    val row = q("q378_fleiss_kappa").collect().head
    assert(row.getAs[Long]("n_items") == nItems)
    assert(row.getAs[Long]("a_sum2") == a2)
    assert(row.getAs[Long]("s_marg2") == sc2)
    assert(row.getAs[Long]("kappa_e6") == truth)
  }

  test("q381 largest-remainder allocation: quotas sum EXACTLY to the " +
       "budget and each quota is floor or floor+1") {
    val rows = q("q381_token_budget")
      .select("source", "tokens", "weight_e3", "quota")
      .as[(String, Long, Long, Long)].collect().toSeq
    val totalTokens = rows.map(_._2).sum
    val b = totalTokens / 2
    assert(rows.map(_._4).sum == b,
      s"quotas must sum exactly to the budget $b")
    val bigW = rows.map(_._3).sum
    rows.foreach { case (src, _, w, quota) =>
      val f = (BigInt(b) * BigInt(w) / BigInt(bigW)).toLong
      assert(quota == f || quota == f + 1, s"$src: $quota vs floor $f")
    }
  }

  test("q380 winsorized and trimmed sums equal a brute-force sort-" +
       "based recompute of the events table") {
    val events = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("v"))
      .as[(String, Long)].collect().toSeq
    val got = q("q380_trimmed_means")
      .select("event_type", "n", "v_lo", "v_hi", "winsor_sum_e2",
        "trim_sum_e2")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    events.groupBy(_._1).foreach { case (et, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.size
      val k = n / 20
      // lower order stats: smallest v with 20*rank >= n (1-indexed)
      val vLo = vs(math.ceil(n / 20.0).toInt - 1)
      val vHi = vs(math.ceil(19.0 * n / 20.0).toInt - 1)
      val winsor = vs.map(v => math.min(math.max(v, vLo), vHi)).sum
      val trimmed = vs.slice(k, n - k).sum
      val (_, gn, gLo, gHi, gW, gT) = got(et)
      assert(gn == n && gLo == vLo && gHi == vHi, s"$et bounds")
      assert(gW == winsor, s"$et winsorized sum")
      assert(gT == trimmed, s"$et trimmed sum")
    }
  }

  test("q379 MRR equals the brute per-user recompute") {
    val events = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("user_id"), col("event_id"), col("value"),
        col("event_type"))
      .as[(Long, Long, Double, String)].collect().toSeq
    val perUser = events.groupBy(_._1).map { case (_, es) =>
      val top = es.sortBy(e => (-e._3, e._2)).take(10)
      top.zipWithIndex.collectFirst {
        case ((_, _, _, "purchase"), i) => i + 1
      }
    }
    val rrSum = perUser.flatMap(_.map(r => math.rint(1e6 / r).toLong))
      .sum
    val hits = perUser.count(_.isDefined).toLong
    val row = q("q379_feed_mrr").collect().head
    assert(row.getAs[Long]("n_users") == perUser.size.toLong)
    assert(row.getAs[Long]("n_hits") == hits)
    assert(row.getAs[Long]("rr_sum_e6") == rrSum)
  }

  test("q395 capture-recapture obeys the mark-recapture bounds: " +
       "m <= min(n1, n2) and n_est >= max(n1, n2)") {
    val row = q("q395_capture_recapture").collect().head
    val (n1, n2, m, est) = (row.getAs[Long]("n1"), row.getAs[Long]("n2"),
      row.getAs[Long]("m"), row.getAs[Long]("n_est"))
    assert(m > 0 && m <= math.min(n1, n2))
    assert(est >= math.max(n1, n2))
  }

  // --- round-10 additions: brute-force third implementations for the
  // drift/association trio (χ², JS, PSI) and the Fellegi–Sunter
  // linkage — the queries with the most hand-derived constants.

  test("q383 chi-square equals the brute contingency recompute " +
       "(full margin cross, cross-multiplied integer form)") {
    val cells = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("event_type").as("x"),
        hour(col("ts_s")).cast("long").as("h"))
      .as[(String, Long)].collect().toSeq
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val xs = cells.keys.map(_._1).toSeq.distinct
    val hs = cells.keys.map(_._2).toSeq.distinct
    val r = xs.map(x => x -> cells.collect {
      case ((`x`, _), c) => c }.sum).toMap
    val s2 = hs.map(h => h -> cells.collect {
      case ((_, `h`), c) => c }.sum).toMap
    val n = cells.values.sum
    val chi2 = (for { x <- xs; h <- hs } yield {
      val o = cells.getOrElse((x, h), 0L)
      val d = BigInt(n) * o - BigInt(r(x)) * s2(h)
      math.rint((d * d).toDouble /
        (BigInt(n) * r(x) * s2(h)).toDouble * 1e6).toLong
    }).sum
    val row = q("q383_chi2_independence").collect().head
    assert(row.getAs[Long]("n_events") == n)
    assert(row.getAs[Long]("n_cells") == xs.size.toLong * hs.size)
    assert(row.getAs[Long]("dof") == (xs.size - 1L) * (hs.size - 1L))
    assert(row.getAs[Long]("chi2_e6") == chi2)
  }

  test("q384 JS divergence equals the brute per-bucket recompute " +
       "(integer ratio inside ln, e9-rounded per bucket)") {
    val ev = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        least(expr("CAST(round(value * 100) AS BIGINT) div 5000"),
          lit(9L)).as("bkt"))
      .as[(String, Long)].collect().toSeq
    val byB = ev.groupBy(_._2).map { case (b, es) =>
      b -> (es.count(_._1 == "click").toLong,
        es.count(_._1 == "view").toLong)
    }
    val na = byB.values.map(_._1).sum
    val nb = byB.values.map(_._2).sum
    def term(c: Long, nSelf: Long, o: Long, nOth: Long): Long =
      if (c == 0L) 0L
      else {
        val num = BigInt(2) * c * nOth
        val den = BigInt(c) * nOth + BigInt(o) * nSelf
        math.rint(c.toDouble / nSelf.toDouble *
          math.log(num.toDouble / den.toDouble) * 1e9).toLong
      }
    val sp = byB.values.map { case (ca, cb) => term(ca, na, cb, nb) }.sum
    val sq = byB.values.map { case (ca, cb) => term(cb, nb, ca, na) }.sum
    val row = q("q384_js_divergence").collect().head
    assert(row.getAs[Long]("n_click") == na)
    assert(row.getAs[Long]("n_view") == nb)
    assert(row.getAs[Long]("n_buckets") == byB.size.toLong)
    assert(row.getAs[Long]("sum_p_e9") == sp)
    assert(row.getAs[Long]("sum_q_e9") == sq)
    assert(row.getAs[Long]("js_e9") ==
      math.rint((sp + sq).toDouble / 2.0).toLong)
  }

  test("q396 PSI equals the brute per-type recompute (Laplace +1 on " +
       "the full 10-bucket grid, e9-rounded per bucket)") {
    val split = java.sql.Timestamp.valueOf("2024-06-15 00:00:00")
    val ev = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("event_type"),
        least(expr("CAST(round(value * 100) AS BIGINT) div 5000"),
          lit(9L)).as("bkt"), col("ts_s"))
      .as[(String, Long, java.sql.Timestamp)].collect().toSeq
    val got = q("q396_psi_drift")
      .select("event_type", "n_first", "n_second", "psi_e9")
      .as[(String, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    ev.groupBy(_._1).foreach { case (et, es) =>
      val cs = (0L to 9L).map { b =>
        val in = es.filter(_._2 == b)
        (in.count(_._3.before(split)).toLong + 1L,
          in.count(!_._3.before(split)).toLong + 1L)
      }
      val na = cs.map(_._1).sum
      val nb = cs.map(_._2).sum
      val psi = cs.map { case (ca, cb) =>
        math.rint((ca.toDouble / na.toDouble - cb.toDouble / nb.toDouble) *
          math.log((BigInt(ca) * nb).toDouble /
            (BigInt(cb) * na).toDouble) * 1e9).toLong
      }.sum
      val (_, gNa, gNb, gPsi) = got(et)
      assert(gNa == na && gNb == nb && gPsi == psi, et)
    }
  }

  test("q393 Fellegi-Sunter equals a plain-Scala replay of the " +
       "chunked blocking, prefix Levenshtein, and weight table") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      var i = 1
      while (i <= a.length) {
        var prev = dp(0); dp(0) = i
        var j = 1
        while (j <= b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
          prev = cur
          j += 1
        }
        i += 1
      }
      dp(b.length)
    }
    val byBlock = docs.groupBy(d => (d._4, d._5 / 25))
    val scored = byBlock.toSeq.flatMap { case ((src, _), ds) =>
      // chunk tier replay: sort by (prefix40, id), chunks of 32
      val sorted = ds.map(d => (d._1, d._2.take(40), d._3, d._5))
        .sortBy(t => (t._2, t._1))
      sorted.zipWithIndex.groupBy(_._2 / 32).values.flatMap { chunk =>
        val c = chunk.map(_._1)
        for {
          i <- c.indices; j <- c.indices
          if c(i)._1 < c(j)._1
        } yield {
          val (ia, ja) = (c(i), c(j))
          val dist = lev(ia._2, ja._2)
          val score =
            (if (ia._3 == ja._3) 642000L else -2303000L) +
              (if (math.abs(ia._4 - ja._4) <= 10L) 1504000L
               else -2079000L) +
              (if (dist <= 5) 2773000L else -1558000L)
          (src, score)
        }
      }
    }
    val want = scored.groupBy(_._1).map { case (srcKey, ps) =>
      val sc = ps.map(_._2)
      srcKey -> (sc.size.toLong, sc.count(_ >= 2000000L).toLong,
        sc.min, sc.max, sc.sum)
    }
    val got = q("q393_fellegi_sunter")
      .select("source", "n_pairs", "n_match", "min_score_e6",
        "max_score_e6", "sum_score_e6")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (srcKey, w) => assert(got(srcKey) == w, srcKey) }
  }
}
