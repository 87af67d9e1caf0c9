package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Independent checks for the round-10 distribution-shift tier:
  * beyond the DuckDB oracle (which shares the SQL formulation), these
  * recompute the statistics BRUTE-FORCE in plain Scala from the same
  * parquet — a third implementation that shares no query machinery
  * with either engine (pairwise O(n²) loops where the queries use
  * cumulant identities) — and assert the structural laws the
  * procedures promise (BH step-up prefix property, fence containment).
  */
class ShiftSpec extends AnyFunSuite {
  import TestSpark.spark

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf001)

  /** (event_type, e2-quantized value) for click/view at sf0.001 —
    * small enough for O(n²) pairwise recomputation. */
  private lazy val cv: Seq[(String, Long)] =
    graft.core.Tables.load(spark, TestSpark.sf001, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("v"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))

  private lazy val clicks = cv.filter(_._1 == "click").map(_._2)
  private lazy val views = cv.filter(_._1 == "view").map(_._2)

  test("q405 Wasserstein-1 equals the brute-force CDF integral " +
       "computed in BigInt from the same events") {
    val na = clicks.size.toLong
    val nb = views.size.toLong
    val support = (clicks ++ views).distinct.sorted
    var cuma = 0L; var cumb = 0L
    var mass = BigInt(0)
    support.sliding(2).foreach { case Seq(v, vn) =>
      cuma += clicks.count(_ == v); cumb += views.count(_ == v)
      mass += (BigInt(cuma) * nb - BigInt(cumb) * na).abs * (vn - v)
    case _ => ()
    }
    val w1 = math.rint(mass.toDouble
      / (na.toDouble * nb.toDouble * 100.0) * 1000000.0).toLong
    val row = q("q405_wasserstein").collect().head
    assert(row.getAs[Long]("na") == na)
    assert(row.getAs[Long]("nb") == nb)
    assert(row.getAs[Long]("w1_e6") == w1)
  }

  test("q407 energy-distance masses equal O(n²) pairwise |x−y| sums " +
       "— the cumulant identity against the literal definition") {
    def cross(a: Seq[Long], b: Seq[Long]): Long =
      a.iterator.map(x => b.iterator.map(y => math.abs(x - y)).sum).sum
    def self(a: Seq[Long]): Long = {
      val s = a.toIndexedSeq
      (0 until s.size).iterator.map(i =>
        (i + 1 until s.size).iterator.map(j =>
          math.abs(s(i) - s(j))).sum).sum
    }
    val row = q("q407_energy_distance").collect().head
    assert(row.getAs[Long]("mass_ab") == cross(clicks, views))
    assert(row.getAs[Long]("mass_aa") == self(clicks))
    assert(row.getAs[Long]("mass_bb") == self(views))
  }

  test("q409 Kruskal–Wallis: doubled midranks off the value axis " +
       "equal literal average-rank assignment, and H matches the " +
       "replicated rounding chain") {
    val docs = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select("source", "n_chars").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
    // literal midranks: sort all values, average the 1-based ranks of
    // each tie block; doubled to stay integral
    val all = docs.map(_._2).sorted
    val drankOf: Map[Long, Long] = all.zipWithIndex
      .groupBy(_._1)
      .map { case (v, g) =>
        val ranks = g.map(_._2 + 1L) // 1-based
        v -> (2L * ranks.sum / ranks.size) // 2·avg is integral
      }
    val bySrc = docs.groupBy(_._1)
    val n = docs.size.toLong
    val t = bySrc.values.map { g =>
      val r2 = g.map(d => drankOf(d._2)).sum
      val ni = g.size.toLong
      math.rint(r2.toDouble * r2.toDouble / (4.0 * ni.toDouble)
        * 1000.0).toLong
    }.sum
    val hE6 = math.rint(12000.0 * t.toDouble
      / (n.toDouble * (n + 1L).toDouble)
      - 3000000.0 * (n + 1L).toDouble).toLong
    val row = q("q409_kruskal_wallis").collect().head
    assert(row.getAs[Long]("n_docs") == n)
    assert(row.getAs[Long]("sum_r2n_e3") == t)
    assert(row.getAs[Long]("h_e6") == hE6)
  }

  test("q410 BH step-up: the selected set is exactly the prefix of " +
       "the p-ascending order up to k* = max{i : p_i ≤ α·i/m}") {
    val rows = q("q410_bh_stepup").collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("score_e9"),
        r.getAs[Long]("thr_e9"), r.getAs[Long]("selected")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    val ks = rows.filter(r => r._2 <= r._3).map(_._1)
    val kstar = if (ks.isEmpty) 0L else ks.max
    rows.foreach { case (rnk, _, _, sel) =>
      assert(sel == (if (rnk <= kstar) 1L else 0L),
        s"rank $rnk: selected=$sel but kstar=$kstar")
    }
    // the step-up property proper: ranks ≤ k* are selected even when
    // their OWN p exceeds their own threshold
    assert(rows.filter(_._1 <= kstar).forall(_._4 == 1L))
  }

  test("q412 ERR@10: the scaled cascade equals an exact BigInt " +
       "rational recomputation per user") {
    val events = graft.core.Tables.load(spark, TestSpark.sf001, "events")
      .select("user_id", "event_id", "value", "event_type")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3)))
    def g(t: String): Int = t match {
      case "purchase" => 3; case "signup" => 2; case "click" => 1
      case _ => 0
    }
    val perUser = events.groupBy(_._1).map { case (_, es) =>
      val top = es.sortBy(e => (-e._3, e._2)).take(10)
      var gprev = 0L; var acc = BigInt(0)
      top.zipWithIndex.foreach { case (e, i) =>
        val r = i + 1
        val gi = g(e._4)
        acc += BigInt(2520 / r) * ((1L << gi) - 1) *
          (BigInt(1) << (30 - gi - gprev.toInt))
        gprev += gi
      }
      acc
    }.toSeq
    val sum = perUser.sum
    val nUsers = perUser.size.toLong
    val errE9 = math.rint(1000000000.0 * sum.toDouble
      / (nUsers.toDouble * 2705829396480.0)).toLong
    val row = q("q412_err_at_10").collect().head
    assert(row.getAs[Long]("n_users") == nUsers)
    assert(BigInt(row.getAs[Long]("sum_err_scaled")) == sum)
    assert(row.getAs[Long]("err_e9") == errE9)
  }

  test("q414 Tukey fences: quartiles are literal order statistics and" +
       " every value outside the fences (and none inside) is counted") {
    val docs = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select("source", "n_chars").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = q("q414_tukey_fences").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("q1"), r.getAs[Long]("q3"),
          r.getAs[Long]("n_out"))).toMap
    docs.groupBy(_._1).foreach { case (src, g) =>
      val xs = g.map(_._2).sorted
      val n = xs.size
      val q1 = xs(((n + 3) / 4) - 1)
      val q3 = xs(((3 * n + 3) / 4) - 1)
      val iqr = q3 - q1
      val out = xs.count(x =>
        2 * x < 2 * q1 - 3 * iqr || 2 * x > 2 * q3 + 3 * iqr)
      val (gq1, gq3, gout) = rows(src)
      assert(gq1 == q1 && gq3 == q3 && gout == out.toLong,
        s"source $src: got ($gq1,$gq3,$gout) want ($q1,$q3,$out)")
    }
  }

  test("q417 Anderson–Darling A²akN equals the literal Scholz–" +
       "Stephens tie-adjusted formula recomputed per distinct value") {
    val na = clicks.size.toLong
    val nb = views.size.toLong
    val nn = na + nb
    val support = (clicks ++ views).distinct.sorted
    var cax = 0L; var cx = 0L
    var sumR = 0L
    support.foreach { v =>
      val ca = clicks.count(_ == v).toLong
      val cb = views.count(_ == v).toLong
      val l = ca + cb
      val m2 = 2 * cax + ca
      val b2 = 2 * cx + l
      val dnum = nn * m2 - na * b2
      val den = b2 * (2 * nn - b2) - nn * l
      if (den > 0)
        sumR += math.rint(1000000000.0
          * (BigInt(l) * dnum * dnum).toDouble
          / (den.toDouble * nn.toDouble * nn.toDouble)).toLong
      cax += ca; cx += l
    }
    val a2 = math.rint((nn - 1L).toDouble * sumR.toDouble / 1000.0)
      .toLong
    val row = q("q417_anderson_darling").collect().head
    assert(row.getAs[Long]("sum_r_e9") == sumR)
    assert(row.getAs[Long]("a2_e6") == a2)
  }

  test("q419 Friedman/Kendall-W: within-block doubled midranks and " +
       "the tie-general chi-square match a literal Scala recompute") {
    val docs = graft.core.Tables.load(spark, TestSpark.sf001,
        "documents")
      .select("doc_id", "text", "n_chars").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def cap5(x: Long) = math.min(x, 5L)
    val scores: Seq[Array[Long]] = docs.map { case (_, t, nc) =>
      Array(cap5(nc / 150),
        cap5(t.split(" ").count(_.nonEmpty).toLong / 30),
        cap5(t.count(_ == '.').toLong / 2))
    }
    // literal doubled midranks within each block of k=3
    val dr: Seq[Array[Long]] = scores.map { sc =>
      sc.map(s => 2L * sc.count(_ < s) + sc.count(_ == s) + 1L)
    }
    val n = docs.size.toLong
    val r2 = (0 until 3).map(j => dr.map(_(j)).sum)
    val sumDr2 = dr.flatten.map(d => d * d).sum
    val numer = r2.map(x => x * x).sum - 48L * n * n
    val den = sumDr2 - 48L * n
    val chi2 = math.rint(1000000.0 * 2.0 * numer.toDouble
      / den.toDouble).toLong
    val row = q("q419_friedman_kendall_w").collect().head
    assert(row.getAs[Long]("r2_1") == r2(0))
    assert(row.getAs[Long]("r2_2") == r2(1))
    assert(row.getAs[Long]("r2_3") == r2(2))
    assert(row.getAs[Long]("sum_dr2") == sumDr2)
    assert(row.getAs[Long]("chi2_e6") == chi2)
  }

  test("q423 Jonckheere–Terpstra doubled J equals the literal " +
       "triple loop over ordered source pairs (ties count half)") {
    val docs = graft.core.Tables.load(spark, TestSpark.sf001,
        "documents")
      .select("source", "n_chars").collect().toSeq
      .map(r => (r.getString(0).drop(3).toLong, r.getLong(1)))
    val groups = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val gs = groups.keys.toSeq.sorted
    var j2 = 0L
    for {
      ia <- gs.indices; ib <- ia + 1 until gs.size
      xa <- groups(gs(ia)); xb <- groups(gs(ib))
    } {
      if (xa < xb) j2 += 2L
      else if (xa == xb) j2 += 1L
    }
    val row = q("q423_jonckheere_terpstra").collect().head
    assert(row.getAs[Long]("j_x2") == j2)
    val ns = gs.map(g => groups(g).size.toLong)
    val n = ns.sum
    assert(row.getAs[Long]("mean_j_x2")
      == (n * n - ns.map(x => x * x).sum) / 2)
  }

  test("q424 decile shift: each emitted decile is the literal sorted " +
       "order statistic at rank ceil(p·n/10) per arm") {
    val rows = q("q424_decile_shift").collect()
      .map(r => r.getAs[Long]("p10") ->
        (r.getAs[Long]("q_click"), r.getAs[Long]("q_view"))).toMap
    val ac = clicks.sorted.toIndexedSeq
    val av = views.sorted.toIndexedSeq
    (1 to 9).foreach { p =>
      val (gc, gv) = rows(p.toLong)
      assert(gc == ac(((p * ac.size + 9) / 10) - 1), s"click p=$p")
      assert(gv == av(((p * av.size + 9) / 10) - 1), s"view p=$p")
    }
  }

  /** (lifetime t, death flag, ever-purchased group) per user — the
    * survival bookkeeping for q427/q428, recomputed literally. */
  private lazy val survival: Seq[(Long, Long, Long)] = {
    val e = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("user_id"), to_date(col("ts_s")).cast("string")
        .as("d"), col("event_type"))
      .collect().toSeq
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))
        .toEpochDay, r.getString(2)))
    val maxDay = e.map(_._2).max
    e.groupBy(_._1).values.map { g =>
      val fd = g.map(_._2).min; val ld = g.map(_._2).max
      (ld - fd, if (ld < maxDay) 1L else 0L,
        if (g.exists(_._3 == "purchase")) 1L else 0L)
    }.toSeq
  }

  test("q427 log-rank: O, E and V equal the literal at-risk/death " +
       "table walked time by time") {
    val times = survival.map(_._1).distinct.sorted
    var o1 = 0L; var e1 = 0L; var v = 0L
    times.foreach { t =>
      val n1 = survival.count(u => u._1 >= t && u._3 == 1L).toLong
      val n0 = survival.count(u => u._1 >= t && u._3 == 0L).toLong
      val d1 = survival.count(u => u._1 == t && u._2 == 1L
        && u._3 == 1L).toLong
      val d0 = survival.count(u => u._1 == t && u._2 == 1L
        && u._3 == 0L).toLong
      val dt = d1 + d0; val nt = n1 + n0
      if (dt > 0) {
        o1 += d1
        e1 += math.rint(1000000000.0 * dt.toDouble * n1.toDouble
          / nt.toDouble).toLong
        if (nt > 1)
          v += math.rint(1000000000.0 * dt.toDouble * n1.toDouble
            / nt.toDouble * n0.toDouble / nt.toDouble
            * (nt - dt).toDouble / (nt - 1).toDouble).toLong
      }
    }
    val row = q("q427_logrank").collect().head
    assert(row.getAs[Long]("o1") == o1)
    assert(row.getAs[Long]("e1_e9") == e1)
    assert(row.getAs[Long]("v_e9") == v)
  }

  test("q428 Nelson–Aalen: the cumulative hazard is monotone " +
       "non-decreasing and each increment is d/n at that time") {
    val rows = q("q428_nelson_aalen").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_at_risk"),
        r.getAs[Long]("d_events"), r.getAs[Long]("h_e9")))
      .sortBy(_._1)
    var prevH = 0L
    rows.foreach { case (t, n, d, h) =>
      val inc = math.rint(1000000000.0 * d.toDouble / n.toDouble)
        .toLong
      assert(h == prevH + inc, s"t=$t")
      assert(h >= prevH, s"t=$t monotone")
      prevH = h
    }
    // at-risk counts telescope: n(t) = users with lifetime >= t
    rows.foreach { case (t, n, _, _) =>
      assert(n == survival.count(_._1 >= t).toLong, s"t=$t at-risk")
    }
  }

  test("q430 pinball: the q90 predictor under-covers at most 10% of " +
       "train days by construction, and every loss is non-negative") {
    val rows = q("q430_pinball_loss").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("tau10"),
        r.getAs[Long]("pred"), r.getAs[Long]("n_test"),
        r.getAs[Long]("sum_loss_x10")))
    assert(rows.nonEmpty)
    rows.foreach { case (et, tau, _, n, loss) =>
      assert(loss >= 0L, s"$et tau=$tau")
      assert(n > 0L)
    }
    // per type, the predictors are monotone in tau (order statistics
    // of one sorted train set)
    rows.groupBy(_._1).values.foreach { g =>
      val byTau = g.sortBy(_._2).map(_._3).toSeq
      assert(byTau == byTau.sorted, s"preds not monotone: ${g.toSeq}")
    }
  }

  test("q431 Markov stationary: a literal Scala power iteration on " +
       "the same rounded lattice reproduces pi exactly, and mass is " +
       "conserved up to per-term rounding") {
    val e = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("user_id"), col("event_id"), col("ts_s"),
        col("event_type"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime, r.getString(3)))
    val trans = e.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(x => (x._3, x._2)).map(_._4)
      sorted.zip(sorted.drop(1))
    }.toSeq.groupBy(identity).map { case ((c, n), v) =>
      (c, n, v.size.toLong) }.toSeq
    val rowTot = trans.groupBy(_._1).map { case (c, v) =>
      c -> v.map(_._3).sum }
    val states = rowTot.keys.toSeq.sorted
    var v: Map[String, Long] =
      states.map(_ -> 1000000000L / states.size).toMap
    (1 to 12).foreach { _ =>
      val nv = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      trans.foreach { case (c, n, cnt) =>
        nv(n) += math.rint(v(c).toDouble * cnt.toDouble
          / rowTot(c).toDouble).toLong
      }
      v = states.map(st => st -> nv(st)).toMap
    }
    val rows = q("q431_markov_stationary").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == v, s"got $rows want $v")
    // mass conservation: each of 12 iterations rounds ≤ |edges| terms
    // by ≤ 0.5 each
    assert(math.abs(rows.values.sum - 1000000000L)
      <= 12L * trans.size / 2 + states.size)
  }

  test("q432 EB shrinkage: every shrunk rate lies between the raw " +
       "rate and the prior mean (the defining property)") {
    val rows = q("q432_eb_shrinkage").collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("k"),
        r.getAs[Long]("raw_e6"), r.getAs[Long]("shrunk_e6"),
        r.getAs[Long]("alpha_e6"), r.getAs[Long]("beta_e6")))
    assert(rows.nonEmpty)
    rows.foreach { case (n, k, raw, shrunk, a, b) =>
      val prior = math.rint(1000000.0 * a.toDouble
        / (a + b).toDouble).toLong
      val lo = math.min(raw, prior) - 1
      val hi = math.max(raw, prior) + 1
      assert(shrunk >= lo && shrunk <= hi,
        s"n=$n k=$k raw=$raw prior=$prior shrunk=$shrunk")
    }
  }

  test("q433 bandit regret: regret is non-negative, zero exactly " +
       "when the policy picked the oracle arm, and the cumulative " +
       "column telescopes") {
    val rows = q("q433_bandit_regret").collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[String]("picked_arm"), r.getAs[String]("best_arm"),
        r.getAs[Long]("picked_mean_e4"), r.getAs[Long]("best_mean_e4"),
        r.getAs[Long]("regret_e4"), r.getAs[Long]("cum_regret_e4")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { case (day, p, b, pm, bm, reg, cr) =>
      assert(reg >= 0L, s"$day negative regret")
      assert(reg == bm - pm, s"$day regret identity")
      if (p == b) assert(reg == 0L, s"$day picked best but regret>0")
      cum += reg
      assert(cr == cum, s"$day cumulative")
    }
  }

  test("q416 Hodges–Lehmann equals the literal median of all " +
       "pairwise daily-mean differences") {
    val day = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), to_date(col("ts_s")).cast("string")
        .as("day"), round(col("value") * 100).cast("long").as("v"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def means(t: String): Seq[Long] =
      day.filter(_._1 == t).groupBy(_._2).values.map { g =>
        math.rint(10000.0 * g.map(_._3).sum.toDouble
          / g.size.toDouble).toLong
      }.toSeq
    val xa = means("click"); val xb = means("view")
    val diffs = (for (a <- xa; b <- xb) yield a - b).sorted
    val hl = diffs(((diffs.size + 1) / 2) - 1)
    val row = q("q416_hodges_lehmann").collect().head
    assert(row.getAs[Long]("n_pairs") == diffs.size.toLong)
    assert(row.getAs[Long]("hl_e4") == hl)
  }
}
