package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Independent checks for the mining/modeling tier (q434–q437):
  * beyond the DuckDB oracle (which shares the SQL formulation), these
  * recompute each statistic BRUTE-FORCE in plain Scala from the same
  * parquet — basket co-occurrence by literal set intersection, OLS
  * from the textbook mean-centered form, Theil–Sen by materializing
  * every pairwise slope, the cube by four independent groupBys — and
  * assert the structural laws the procedures promise (lift symmetry,
  * R² ∈ [0,1], Mann–Kendall bounds, cube additivity).
  */
class MiningSpec extends AnyFunSuite {
  import TestSpark.spark

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf001)

  // (orderkey, brand) distinct baskets at sf0.001.
  private lazy val baskets: Map[Long, Set[String]] = {
    val li = graft.core.Tables.load(spark, TestSpark.sf001, "lineitem")
    val part = graft.core.Tables.load(spark, TestSpark.sf001, "part")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  test("q434 Apriori triples match literal basket counting, satisfy " +
       "downward closure, and miss no qualifying triple") {
    val n = baskets.size.toLong
    val co = baskets.values.toSeq.flatMap { bs =>
      val s = bs.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val freqPair = co.filter { case (_, c) => c * 1000L >= n }.keySet
    val tri = baskets.values.toSeq.flatMap { bs =>
      val s = bs.toSeq.sorted
      for {
        i <- s.indices; j <- (i + 1) until s.size
        k <- (j + 1) until s.size
      } yield (s(i), s(j), s(k))
    }.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val want = tri.filter { case ((a, b, c), cnt) =>
      cnt * 1000L >= n && freqPair((a, b)) && freqPair((a, c)) &&
        freqPair((b, c))
    }
    val rows = q("q434_apriori_triples").collect()
    assert(rows.nonEmpty)
    assert(rows.length == want.size,
      s"${rows.length} triples vs brute ${want.size}")
    rows.foreach { r =>
      val t = (r.getAs[String]("ba"), r.getAs[String]("bb"),
        r.getAs[String]("bc"))
      assert(want.contains(t), s"unexpected triple $t")
      assert(r.getAs[Long]("n_abc") == want(t), s"support of $t")
      assert(r.getAs[Long]("n_orders") == n)
      // downward closure: every sub-pair of an emitted triple is
      // itself frequent (the Apriori property)
      assert(freqPair((t._1, t._2)) && freqPair((t._1, t._3)) &&
        freqPair((t._2, t._3)), s"closure violated for $t")
    }
  }

  test("q435 OLS matches the textbook mean-centered fit per group " +
       "and R² is in [0, 1e6]") {
    val xs = graft.core.Tables.load(spark, TestSpark.sf001, "orders")
      .select(col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = q("q435_ols_regression").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val g = xs.filter(_._1 == r.getAs[String]("rf"))
      val n = g.size.toDouble
      val mx = g.map(_._2).sum.toDouble / n
      val my = g.map(_._3).sum.toDouble / n
      val sxy = g.map(t => (t._2 - mx) * (t._3 - my)).sum
      val sxx = g.map(t => (t._2 - mx) * (t._2 - mx)).sum
      val syy = g.map(t => (t._3 - my) * (t._3 - my)).sum
      val slope = sxy / sxx
      val r2 = sxy * sxy / (sxx * syy)
      // mean-centered double arithmetic accumulates differently than
      // the integer sufficient-statistic form: compare within 1e-6
      // relative (the law, not the bit pattern — the gate checks bits)
      val se = r.getAs[Long]("slope_e6").toDouble / 1e6
      val r2e = r.getAs[Long]("r2_e6").toDouble / 1e6
      assert(math.abs(se - slope) <= math.abs(slope) * 1e-6 + 1e-4,
        s"slope ${r.getAs[String]("rf")}: $se vs $slope")
      assert(math.abs(r2e - r2) <= 1e-4, s"r2: $r2e vs $r2")
      assert(r.getAs[Long]("r2_e6") >= 0L &&
        r.getAs[Long]("r2_e6") <= 1000000L)
      val icpt = my - slope * mx
      val ie = r.getAs[Long]("intercept_e6").toDouble / 1e6
      assert(math.abs(ie - icpt) <= math.abs(icpt) * 1e-6 + 1e-2,
        s"intercept: $ie vs $icpt")
    }
  }

  test("q436 Theil–Sen slope is the exact lower median of every " +
       "pairwise slope and Mann–Kendall S matches the literal loop") {
    val days = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("rev"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long"),
        col("rev"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val slopes = for {
      i <- days.indices; j <- (i + 1) until days.size
    } yield math.rint((days(j)._2 - days(i)._2).toDouble * 1e6
      / (days(j)._1 - days(i)._1).toDouble).toLong
    val s = (for {
      i <- days.indices; j <- (i + 1) until days.size
    } yield java.lang.Long.signum(days(j)._2 - days(i)._2).toLong).sum
    val sorted = slopes.sorted
    val median = sorted((slopes.size + 1) / 2 - 1)
    val row = q("q436_theil_sen_mk").collect().head
    assert(row.getAs[Long]("n_days") == days.size.toLong)
    assert(row.getAs[Long]("n_pairs") == slopes.size.toLong)
    assert(row.getAs[Long]("ts_slope_e6") == median)
    assert(row.getAs[Long]("mk_s") == s)
    assert(math.abs(s) <= slopes.size.toLong)
  }

  test("q437 cube: all four levels present, margins add up to the " +
       "grand total, and detail cells match a plain groupBy") {
    val rows = q("q437_revenue_cube").collect()
    val byLvl = rows.groupBy(_.getAs[Long]("lvl"))
    assert(byLvl(0L).length > 1 && byLvl(1L).length >= 2 &&
      byLvl(2L).length >= 2 && byLvl(3L).length == 1)
    val total = byLvl(3L).head
    assert(total.getAs[String]("rf") == "ALL" &&
      total.getAs[String]("ls") == "ALL")
    // additivity at every level
    Seq(0L, 1L, 2L).foreach { l =>
      assert(byLvl(l).map(_.getAs[Long]("n")).sum ==
        total.getAs[Long]("n"), s"n at lvl $l")
      assert(byLvl(l).map(_.getAs[Long]("revenue_cents")).sum ==
        total.getAs[Long]("revenue_cents"), s"revenue at lvl $l")
    }
    // detail cells vs an independent plain groupBy
    val plain = graft.core.Tables.load(spark, TestSpark.sf001, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("c"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("n"), r.getAs[Long]("c")))).toMap
    byLvl(0L).foreach { r =>
      val k = (r.getAs[String]("rf"), r.getAs[String]("ls"))
      assert(plain(k) ==
        ((r.getAs[Long]("n"), r.getAs[Long]("revenue_cents"))))
    }
  }

  // per-user (type -> (first second, last second)) at sf0.001
  private lazy val userSpans
      : Map[Long, Map[String, (java.sql.Timestamp, java.sql.Timestamp)]] =
    graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("user_id"), col("event_type"), col("ts_s"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      .groupBy(_._1).map { case (u, xs) =>
        u -> xs.groupBy(_._2).map { case (t, ys) =>
          val ts = ys.map(_._3)
          t -> (ts.minBy(_.getTime), ts.maxBy(_.getTime))
        }
      }

  test("q438 ordered 2-sequence supports match the literal " +
       "first-before-last scan over every user") {
    val rows = q("q438_seq2_support").collect()
    assert(rows.length == 20) // 5 types x 4 ordered partners
    val nUsers = userSpans.size.toLong
    rows.foreach { r =>
      val ta = r.getAs[String]("ta"); val tb = r.getAs[String]("tb")
      val brute = userSpans.values.count { m =>
        (m.contains(ta) && m.contains(tb)) &&
          m(ta)._1.getTime < m(tb)._2.getTime
      }.toLong
      assert(r.getAs[Long]("n_ab") == brute, s"($ta,$tb)")
      assert(r.getAs[Long]("n_a") ==
        userSpans.values.count(_.contains(ta)).toLong)
      assert(r.getAs[Long]("n_users") == nUsers)
    }
  }

  // daily purchase revenue (epoch day, cents) at sf0.001
  private lazy val revDays: Seq[(Long, Long)] =
    graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("rev"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long"),
        col("rev"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)

  test("q439 RANSAC: the reported model maximizes inliers over the " +
       "exhaustive model grid (literal recount) and the refit " +
       "matches OLS on its consensus set") {
    def lowerMedian(xs: Seq[Long]): Long =
      xs.sorted.apply((xs.size + 1) / 2 - 1)
    val med = lowerMedian(revDays.map(_._2))
    val mad = lowerMedian(revDays.map(t => math.abs(t._2 - med)))
    def inliers(da: Long, ya: Long, db: Long, yb: Long): Long = {
      val dx = db - da; val dy = yb - ya
      revDays.count { case (d, y) =>
        math.abs((y - ya) * dx - dy * (d - da)) <= mad * dx
      }.toLong
    }
    val all = for {
      (da, ya) <- revDays; (db, yb) <- revDays if da < db
    } yield ((da, db), inliers(da, ya, db, yb))
    val bestN = all.map(_._2).max
    val best = all.filter(_._2 == bestN).map(_._1).min
    val row = q("q439_ransac_line").collect().head
    assert(row.getAs[Long]("mad") == mad)
    assert(row.getAs[Long]("n_inliers") == bestN)
    assert((row.getAs[Long]("best_da"), row.getAs[Long]("best_db"))
      == best)
    // refit on the brute consensus set, textbook mean-centered OLS
    val (da, ya) = revDays.find(_._1 == best._1).get
    val (db, yb) = revDays.find(_._1 == best._2).get
    val cons = revDays.filter { case (d, y) =>
      math.abs((y - ya) * (db - da) - (yb - ya) * (d - da)) <=
        mad * (db - da)
    }
    val n = cons.size.toDouble
    val mx = cons.map(_._1).sum.toDouble / n
    val my = cons.map(_._2).sum.toDouble / n
    val slope = cons.map(t => (t._1 - mx) * (t._2 - my)).sum /
      cons.map(t => (t._1 - mx) * (t._1 - mx)).sum
    val se = row.getAs[Long]("refit_slope_e6").toDouble / 1e6
    assert(math.abs(se - slope) <= math.abs(slope) * 1e-6 + 1e-3,
      s"refit slope $se vs $slope")
  }

  test("q440 lead-lag profile: r at each lag matches the literal " +
       "paired Pearson, is bounded by 1e6, and lag 0 pairs all days") {
    val clicks = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .filter(col("event_type") === "click")
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(count(lit(1)).as("x"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long"),
        col("x"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1))).toMap
    val rev = revDays.toMap
    val rows = q("q440_ccf_leadlag").collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag")
      val pairs = clicks.toSeq.flatMap { case (d, x) =>
        rev.get(d + lag).map(y => (x.toDouble, y.toDouble))
      }
      assert(r.getAs[Long]("n") == pairs.size.toLong)
      val n = pairs.size.toDouble
      val mx = pairs.map(_._1).sum / n
      val my = pairs.map(_._2).sum / n
      val num = pairs.map(t => (t._1 - mx) * (t._2 - my)).sum
      val dx = pairs.map(t => (t._1 - mx) * (t._1 - mx)).sum
      val dy = pairs.map(t => (t._2 - my) * (t._2 - my)).sum
      val rr = num / math.sqrt(dx * dy)
      val re = r.getAs[Long]("r_e6")
      assert(math.abs(re.toDouble / 1e6 - rr) <= 1e-4,
        s"lag $lag: $re vs $rr")
      assert(math.abs(re) <= 1000000L)
      if (lag == 0L) assert(r.getAs[Long]("n") == clicks.size.toLong)
    }
  }

  test("q441 Hurst: per-w mean R/S matches the literal block loops " +
       "and H is the OLS slope of the lattice points") {
    val ys = revDays.map(_._2)
    val byW = Seq(5, 10, 15, 30).map { w =>
      val blocks = ys.grouped(w).filter(_.size == w).toSeq
      val rss = blocks.map { b =>
        val s = b.sum
        val ss = b.map(y => BigInt(y) * y).sum
        val cums = b.scanLeft(0L)(_ + _).tail
        val dd = cums.zipWithIndex.map { case (c, i) =>
          w * c - (i + 1) * s
        }
        val q = (BigInt(w) * ss - BigInt(s) * s).toDouble
        if (q > 0)
          math.rint((dd.max - dd.min).toDouble / math.sqrt(q) * 1e6)
            .toLong
        else 0L
      }
      // engine rounds HALF_UP; rint is half-even — recompute with
      // BigDecimal to match exactly
      val rssExact = blocks.map { b =>
        val s = b.sum
        val ss = b.map(y => BigInt(y) * y).sum
        val cums = b.scanLeft(0L)(_ + _).tail
        val dd = cums.zipWithIndex.map { case (c, i) =>
          w * c - (i + 1) * s
        }
        val q = (BigInt(w) * ss - BigInt(s) * s).toDouble
        if (q > 0)
          graft.analytics.Exact.roundHalfUp(
            (dd.max - dd.min).toDouble / math.sqrt(q) * 1e6)
        else 0L
      }
      assert(rss.zip(rssExact).forall { case (a, b) =>
        math.abs(a - b) <= 1 }) // sanity: the two roundings agree ±1
      w.toLong -> (blocks.size.toLong,
        graft.analytics.Exact.roundHalfUp(
          rssExact.sum.toDouble / rssExact.size.toDouble))
    }.toMap
    val rows = q("q441_hurst_rs").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val w = r.getAs[Long]("w")
      assert(r.getAs[Long]("n_blocks") == byW(w)._1, s"w=$w blocks")
      assert(r.getAs[Long]("rs_mean_e6") == byW(w)._2, s"w=$w rs")
    }
    // H from the same lattice points, textbook OLS
    val pts = byW.toSeq.filter(_._2._2 > 0).map { case (w, (_, rs)) =>
      (graft.analytics.Exact.roundHalfUp(math.log(w.toDouble) * 1e9),
        graft.analytics.Exact.roundHalfUp(
          math.log(rs.toDouble / 1e6) * 1e9))
    }
    val n = pts.size.toDouble
    val mx = pts.map(_._1).sum.toDouble / n
    val my = pts.map(_._2).sum.toDouble / n
    val slope = pts.map(t => (t._1 - mx) * (t._2 - my)).sum /
      pts.map(t => (t._1 - mx) * (t._1 - mx)).sum
    val h = rows.head.getAs[Long]("hurst_e6").toDouble / 1e6
    assert(math.abs(h - slope) <= 1e-4, s"H $h vs $slope")
    assert(h > 0.0 && h < 1.5, s"H out of plausible range: $h")
  }

  test("q442 Holt walk: the literal HALF_UP recurrence reproduces " +
       "every level/trend row and the first error is zero") {
    val rows = q("q442_holt_walk").collect()
    assert(rows.length == revDays.size)
    var l = revDays(0)._2
    var b = revDays(1)._2 - revDays(0)._2
    rows.sortBy(_.getAs[Long]("d")).zip(revDays).zipWithIndex.foreach {
      case ((r, (d, y)), t) =>
        assert(r.getAs[Long]("d") == d && r.getAs[Long]("y") == y)
        if (t == 0) {
          assert(r.getAs[Long]("err") == 0L)
        } else {
          val err = y - (l + b)
          val lNew = graft.analytics.Exact.roundHalfUp(
            (y + l + b).toDouble * 0.5)
          val bNew = graft.analytics.Exact.roundHalfUp(
            (lNew - l + 3L * b).toDouble * 0.25)
          l = lNew; b = bNew
          assert(r.getAs[Long]("err") == err, s"err at $d")
        }
        assert(r.getAs[Long]("level") == l, s"level at $d")
        assert(r.getAs[Long]("trend") == b, s"trend at $d")
    }
  }

  test("q443 Gumbel: fit matches the textbook method-of-moments on " +
       "the literal block maxima; mu sits below the maxima mean") {
    val ms = revDays.map(_._2).grouped(5).filter(_.size == 5)
      .map(_.max).toSeq
    val nb = ms.size
    val sm = ms.sum
    val mean = sm.toDouble / nb
    val s2 = ms.map(m => (m - mean) * (m - mean)).sum / (nb - 1.0)
    val beta = math.sqrt(s2) * math.sqrt(6.0) / math.Pi
    val mu = mean - 0.5772156649015329 * beta
    val rl = mu - beta * math.log(-math.log(1.0 - 1.0 / 12.0))
    val r = q("q443_gumbel_return").collect().head
    assert(r.getAs[Long]("nb") == nb.toLong)
    assert(r.getAs[Long]("sm") == sm)
    assert(math.abs(r.getAs[Long]("mu_e2").toDouble / 100.0 - mu)
      <= math.abs(mu) * 1e-9 + 0.02, "mu")
    assert(math.abs(r.getAs[Long]("beta_e2").toDouble / 100.0 - beta)
      <= math.abs(beta) * 1e-9 + 0.02, "beta")
    assert(math.abs(r.getAs[Long]("rl12_e2").toDouble / 100.0 - rl)
      <= math.abs(rl) * 1e-9 + 0.02, "rl")
    assert(r.getAs[Long]("mu_e2") < sm * 100 / nb, "mu below mean")
    assert(r.getAs[Long]("rl12_e2") > r.getAs[Long]("mu_e2"),
      "return level above location")
  }

  test("q444 IPF raking: the literal 3-sweep replay reproduces every " +
       "cell and the raked row margins hit the targets within the " +
       "lattice tolerance") {
    val rows = q("q444_ipf_raking").collect()
    assert(rows.nonEmpty)
    case class Cell(src: String, lang: String, var w: Long,
                    rt: Long, ct: Long)
    val cells = rows.map(r => Cell(r.getAs[String]("source"),
      r.getAs[String]("lang"), r.getAs[Long]("w0_e9"),
      r.getAs[Long]("rt_e9"), r.getAs[Long]("ct_e9")))
    for (_ <- 1 to 3) {
      val rsum = cells.groupBy(_.src).map { case (k, v) =>
        k -> v.map(_.w).sum }
      cells.foreach { c =>
        if (rsum(c.src) > 0)
          c.w = graft.analytics.Exact.roundHalfUp(
            c.w.toDouble * c.rt.toDouble / rsum(c.src).toDouble)
      }
      val csum = cells.groupBy(_.lang).map { case (k, v) =>
        k -> v.map(_.w).sum }
      cells.foreach { c =>
        if (csum(c.lang) > 0)
          c.w = graft.analytics.Exact.roundHalfUp(
            c.w.toDouble * c.ct.toDouble / csum(c.lang).toDouble)
      }
    }
    val byKey = cells.map(c => (c.src, c.lang) -> c.w).toMap
    rows.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[String]("lang"))
      assert(r.getAs[Long]("w_e9") == byKey(k), s"cell $k")
    }
    // after the final COLUMN sweep the column margins are exact to
    // rounding; row margins are approximately on target (IPF
    // converges, it does not finish) — allow per-cell rounding slack
    val colM = cells.groupBy(_.lang).map { case (k, v) =>
      k -> (v.map(_.w).sum, v.head.ct) }
    colM.values.foreach { case (got, want) =>
      assert(math.abs(got - want) <= cells.length.toLong, s"col margin")
    }
  }

  test("q444 IPF raking THIRD implementation: margins, base shares " +
       "and all 3 sweeps derived from the raw documents table in " +
       "plain Scala — no operator column reused — match every output " +
       "column bit-exactly") {
    val docs = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select(col("source"), col("lang"), col("n_chars"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byCell = docs.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
      k -> (xs.size.toLong, xs.map(_._3).sum)
    }
    val nTot = byCell.values.map(_._1).sum
    val cTot = byCell.values.map(_._2).sum
    val cSrc = byCell.toSeq.groupBy(_._1._1).map { case (s, xs) =>
      s -> xs.map(_._2._2).sum }
    val cLang = byCell.toSeq.groupBy(_._1._2).map { case (l, xs) =>
      l -> xs.map(_._2._2).sum }
    def e9(num: Long, den: Long): Long =
      graft.analytics.Exact.roundHalfUp(
        num.toDouble / den.toDouble * 1000000000.0)
    case class C(src: String, lang: String, nDocs: Long, w0: Long,
                 rt: Long, ct: Long, var w: Long)
    val cells = byCell.toSeq.map { case ((s, l), (n, _)) =>
      C(s, l, n, e9(n, nTot), e9(cSrc(s), cTot), e9(cLang(l), cTot),
        e9(n, nTot))
    }
    for (_ <- 1 to 3) {
      val rsum = cells.groupBy(_.src).map { case (k, v) =>
        k -> v.map(_.w).sum }
      cells.foreach { c =>
        if (rsum(c.src) > 0) c.w = graft.analytics.Exact.roundHalfUp(
          c.w.toDouble * c.rt.toDouble / rsum(c.src).toDouble)
      }
      val csum = cells.groupBy(_.lang).map { case (k, v) =>
        k -> v.map(_.w).sum }
      cells.foreach { c =>
        if (csum(c.lang) > 0) c.w = graft.analytics.Exact.roundHalfUp(
          c.w.toDouble * c.ct.toDouble / csum(c.lang).toDouble)
      }
    }
    val want = cells.map(c => (c.src, c.lang) ->
      (c.nDocs, c.w0, c.rt, c.ct, c.w)).toMap
    val rows = q("q444_ipf_raking").collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[String]("lang"))
      val (n, w0, rt, ct, w) = want(k)
      assert(r.getAs[Long]("n_docs") == n, s"n_docs $k")
      assert(r.getAs[Long]("w0_e9") == w0, s"w0 $k")
      assert(r.getAs[Long]("rt_e9") == rt, s"rt $k")
      assert(r.getAs[Long]("ct_e9") == ct, s"ct $k")
      assert(r.getAs[Long]("w_e9") == w, s"w $k")
    }
  }

  test("q445 Shapley: literal 2^4 coalition enumeration reproduces " +
       "every phi and efficiency holds: sum phi24 = 24*(v(full)-v(0))") {
    val events = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("user_id"), col("event_type"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
    val chanBit = Map("click" -> 1, "error" -> 2, "signup" -> 4,
      "view" -> 8)
    val byUser = events.groupBy(_._1).toSeq.map { case (_, xs) =>
      val ts = xs.map(_._2).toSet
      (ts.toSeq.flatMap(chanBit.get).sum, ts.contains("purchase"))
    }
    val convMasks = byUser.filter(_._2).map(_._1)
    def v(s: Int): Long = convMasks.count(m => (m & ~s & 15) == 0).toLong
    def factI(n: Int): Long = (1 to n).product.toLong max 1L
    val rows = q("q445_shapley_attribution").collect()
    assert(rows.length == 4)
    var total = 0L
    rows.foreach { r =>
      val bit = r.getAs[Long]("bit").toInt
      val phi = (0 until 16).filter(s => (s & bit) == 0).map { s =>
        val pc = java.lang.Integer.bitCount(s)
        factI(pc) * factI(3 - pc) * (v(s | bit) - v(s))
      }.sum
      assert(r.getAs[Long]("phi24") == phi, s"phi for bit $bit")
      assert(r.getAs[Long]("v_full") == v(15))
      total += phi
    }
    assert(total == 24L * (v(15) - v(0)), "Shapley efficiency axiom")
  }

  test("q446 CMH: stratum cells match a literal star-join count and " +
       "the pooled statistic matches the textbook recompute") {
    val t = graft.core.Tables.load(spark, TestSpark.sf001, "orders")
      .join(graft.core.Tables.load(spark, TestSpark.sf001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.core.Tables.load(spark, TestSpark.sf001, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(graft.core.Tables.load(spark, TestSpark.sf001, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("o_orderpriority"),
        col("o_orderstatus"))
      .collect().toSeq
      .map(r => (r.getString(0),
        Set("1-URGENT", "2-HIGH").contains(r.getString(1)),
        r.getString(2) == "F"))
    val rows = q("q446_cmh_stratified").collect()
    assert(rows.length == 5)
    var sd = 0.0; var sv = 0.0; var sad = 0.0; var sbc = 0.0
    rows.foreach { r =>
      val g = t.filter(_._1 == r.getAs[String]("r_name"))
      val a = g.count(x => x._2 && x._3).toLong
      val b = g.count(x => x._2 && !x._3).toLong
      val c = g.count(x => !x._2 && x._3).toLong
      val d = g.count(x => !x._2 && !x._3).toLong
      assert((r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("c"), r.getAs[Long]("d")) == ((a, b, c, d)))
      val n = (a + b + c + d).toDouble
      sd += a - (a + b) * (a + c) / n
      sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
      sad += a * d / n
      sbc += b * c / n
    }
    val cmh = sd * sd / sv
    val orMh = sad / sbc
    val got = rows.head
    assert(math.abs(got.getAs[Long]("cmh_e6").toDouble / 1e6 - cmh)
      <= 1e-3, s"CMH: ${got.getAs[Long]("cmh_e6")} vs $cmh")
    assert(math.abs(got.getAs[Long]("or_mh_e6").toDouble / 1e6 - orMh)
      <= 1e-3, s"OR_MH")
  }

  // the q378 rater scores per doc at sf0.001, recomputed literally
  private lazy val raterScores: Seq[Seq[Long]] =
    graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .collect().toSeq.map { r =>
        val text = r.getString(1); val nc = r.getLong(2)
        Seq(
          math.min(nc / 150, 5L),
          math.min(text.split(" ").count(_.nonEmpty).toLong / 30, 5L),
          math.min(text.count(_ == '.').toLong / 2, 5L))
      }

  test("q447 ICC(1) matches the textbook one-way ANOVA on the " +
       "literal rater scores and lies in [-1, 1]") {
    val n = raterScores.size
    val k = 3.0
    val grand = raterScores.flatten.sum.toDouble / (n * k)
    val msb = raterScores.map { g =>
      val m = g.sum.toDouble / k
      k * (m - grand) * (m - grand)
    }.sum / (n - 1)
    val msw = raterScores.map { g =>
      val m = g.sum.toDouble / k
      g.map(x => (x - m) * (x - m)).sum
    }.sum / (n * (k - 1))
    val icc = (msb - msw) / (msb + (k - 1) * msw)
    val r = q("q447_icc_reliability").collect().head
    assert(r.getAs[Long]("n_items") == n.toLong)
    val got = r.getAs[Long]("icc_e6").toDouble / 1e6
    assert(math.abs(got - icc) <= 1e-4, s"ICC $got vs $icc")
    assert(got >= -1.0 && got <= 1.0)
  }

  test("q448 Krippendorff nominal alpha matches the coincidence " +
       "recompute on the literal rater categories") {
    val n = raterScores.size
    val counts = raterScores.map(g =>
      g.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong })
    val w = counts.map(_.values.map(c => c * (3 - c)).sum).sum
    val nTot = 3L * n
    val margins = counts.flatten.groupBy(_._1)
      .map { case (c, xs) => c -> xs.map(_._2).sum }
    val e = margins.values.map(nc => BigInt(nc) * (nTot - nc)).sum
    val alpha = 1.0 - w.toDouble * (nTot - 1).toDouble /
      (2.0 * e.toDouble)
    val r = q("q448_krippendorff_alpha").collect().head
    assert(r.getAs[Long]("n_items") == n.toLong)
    assert(r.getAs[Long]("w_dis") == w)
    val got = r.getAs[Long]("alpha_e6").toDouble / 1e6
    assert(math.abs(got - alpha) <= 1e-5, s"alpha $got vs $alpha")
  }

  test("q449 regression diagnostics: DW and BP match the literal " +
       "residual replay, and DW lies in [0, 4]") {
    val n = revDays.size
    val sx = revDays.map(_._1).sum
    val sy = revDays.map(_._2).sum
    val sxy = revDays.map(t => BigInt(t._1) * t._2).sum
    val sxx = revDays.map(t => BigInt(t._1) * t._1).sum
    val num = BigInt(n) * sxy - BigInt(sx) * sy
    val denx = BigInt(n) * sxx - BigInt(sx) * sx
    val es = revDays.map { case (d, y) =>
      val r = BigInt(y) * n * denx - BigInt(n) * num * d -
        BigInt(sy) * denx + num * sx
      graft.analytics.Exact.roundHalfUp(
        r.toDouble / (BigInt(n) * denx).toDouble * 10000.0)
    }
    val se2 = es.map(e => BigInt(e) * e).sum
    val sd2 = es.sliding(2).map { case Seq(a, b) =>
      BigInt(b - a) * (b - a) }.sum
    val dw = sd2.toDouble / se2.toDouble
    val row = q("q449_regression_diag").collect().head
    val gotDw = row.getAs[Long]("dw_e6").toDouble / 1e6
    assert(math.abs(gotDw - dw) <= 1e-6, s"DW $gotDw vs $dw")
    assert(gotDw >= 0.0 && gotDw <= 4.0)
    // BP on the e9 energy shares, textbook n*R²
    val us = es.map(e => graft.analytics.Exact.roundHalfUp(
      (BigInt(e) * e).toDouble / se2.toDouble * 1e9))
    val mx = revDays.map(_._1).sum.toDouble / n
    val mu = us.sum.toDouble / n
    val c = revDays.map(_._1).zip(us)
      .map { case (x, u) => (x - mx) * (u - mu) }.sum
    val vx = revDays.map(x => (x._1 - mx) * (x._1 - mx)).sum
    val vu = us.map(u => (u - mu) * (u - mu)).sum
    val bp = n * (c * c) / (vx * vu)
    val gotBp = row.getAs[Long]("bp_e6").toDouble / 1e6
    assert(math.abs(gotBp - bp) <= 1e-3, s"BP $gotBp vs $bp")
  }

  test("q450 Kendall tau-b matches the literal pair loop with tie " +
       "classes, and tau is within [-1, 1]") {
    val clicks = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .filter(col("event_type") === "click")
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(count(lit(1)).as("x"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long"),
        col("x"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1))).toMap
    val pts = revDays.flatMap { case (d, y) =>
      clicks.get(d).map(x => (d, x, y)) }
    var c = 0L; var dd = 0L; var tx = 0L; var ty = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.size) {
      val s = (pts(j)._2 - pts(i)._2) * (pts(j)._3 - pts(i)._3)
      if (pts(i)._2 == pts(j)._2) tx += 1
      if (pts(i)._3 == pts(j)._3) ty += 1
      if (s > 0) c += 1 else if (s < 0) dd += 1
    }
    val n0 = pts.size.toLong * (pts.size - 1) / 2
    val tau = (c - dd).toDouble /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    val r = q("q450_kendall_tau_b").collect().head
    assert(r.getAs[Long]("n_pairs") == n0)
    assert(r.getAs[Long]("c_pairs") == c)
    assert(r.getAs[Long]("d_pairs") == dd)
    assert(r.getAs[Long]("tx_pairs") == tx)
    assert(r.getAs[Long]("ty_pairs") == ty)
    val got = r.getAs[Long]("tau_b_e6").toDouble / 1e6
    assert(math.abs(got - tau) <= 1e-5, s"tau $got vs $tau")
    assert(got >= -1.0 && got <= 1.0)
  }

  test("q451 Cronbach's alpha matches the textbook variance form " +
       "on the literal rater scores") {
    val n = raterScores.size
    def sampleVar(xs: Seq[Long]): Double = {
      val m = xs.sum.toDouble / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1.0)
    }
    val svi = (0 until 3).map(i =>
      sampleVar(raterScores.map(_(i)))).sum
    val vt = sampleVar(raterScores.map(_.sum))
    val alpha = 1.5 * (1.0 - svi / vt)
    val r = q("q451_cronbach_alpha").collect().head
    assert(r.getAs[Long]("n_items") == n.toLong)
    val got = r.getAs[Long]("alpha_e6").toDouble / 1e6
    assert(math.abs(got - alpha) <= 1e-5, s"alpha $got vs $alpha")
  }

  test("q452 PR-AUC matches the literal block-boundary trapezoid " +
       "walk and lies in (0, 1]") {
    val ev = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(round(col("value") * 100).cast("long"),
        (col("event_type") === "purchase").cast("long"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val blocks = ev.groupBy(_._1).toSeq
      .map { case (v, xs) =>
        (v, xs.map(_._2).sum, xs.size.toLong) }
      .sortBy(-_._1)
    val p = blocks.map(_._2).sum.toDouble
    var cp = 0L; var ct = 0L
    var prevP = Option.empty[Double]
    var area = 0.0
    blocks.foreach { case (_, pv, tv) =>
      val dcp = pv
      cp += pv; ct += tv
      val prec = cp.toDouble / ct
      val pPrev = prevP.getOrElse(prec)
      area += (dcp / p) * ((pPrev + prec) / 2.0)
      prevP = Some(prec)
    }
    val r = q("q452_pr_auc").collect().head
    assert(r.getAs[Long]("n_pos") == p.toLong)
    val got = r.getAs[Long]("pr_auc_e6").toDouble / 1e6
    assert(math.abs(got - area) <= 1e-4, s"PR-AUC $got vs $area")
    assert(got > 0.0 && got <= 1.0)
  }

  test("q453 DiD: cell means match a literal user-period grid and " +
       "the estimate is the cell-mean contrast") {
    val ev = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("user_id"), col("event_type"),
        to_date(col("ts_s")).as("day"),
        round(col("value") * 100).cast("long"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toLocalDate, r.getLong(3)))
    val days = ev.map(_._3).distinct.sorted(
      Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val med = days((days.size + 1) / 2 - 1)
    val users = ev.map(_._1).distinct
    val sc = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.size.toLong }
    val tot = sc.values.sum
    val nu = sc.size.toLong
    val treated = sc.collect {
      case (u, c) if c * nu > tot => u }.toSet
    assert(treated.nonEmpty && treated.size < users.size,
      "treatment split must be non-degenerate")
    val purch = ev.filter(_._2 == "purchase")
      .groupBy(t => (t._1, t._3.isAfter(med)))
      .map { case (k, xs) => k -> xs.map(_._4).sum }
    val rows = q("q453_diff_in_diff").collect()
    assert(rows.length == 4)
    val means = rows.map(r => (r.getAs[Long]("tr"),
      r.getAs[Long]("post")) -> r.getAs[Long]("mean_e4")).toMap
    Seq((1L, 1L), (1L, 0L), (0L, 1L), (0L, 0L)).foreach {
      case (tr, po) =>
        val grp = users.filter(u => treated.contains(u) == (tr == 1L))
        val ys = grp.map(u => purch.getOrElse((u, po == 1L), 0L))
        val m = graft.analytics.Exact.roundHalfUp(
          ys.sum.toDouble / ys.size * 10000.0)
        assert(means((tr, po)) == m, s"cell ($tr,$po)")
        assert(rows.find(r => r.getAs[Long]("tr") == tr &&
          r.getAs[Long]("post") == po).get.getAs[Long]("n")
          == grp.size.toLong)
    }
    val did = means((1L, 1L)) - means((1L, 0L)) -
      (means((0L, 1L)) - means((0L, 0L)))
    assert(rows.head.getAs[Long]("did_e4") == did)
  }

  test("q454 Dunn z-values match the literal midrank recompute and " +
       "are antisymmetric under group swap") {
    val xs = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select(col("source"), col("n_chars"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val n = xs.size.toLong
    // midranks (as plain doubles — the law, not the bit pattern)
    val sorted = xs.map(_._2).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, ps) =>
        v -> ps.map(_._2 + 1).sum.toDouble / ps.size }
    val tieD = sorted.groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val byGroup = xs.groupBy(_._1).map { case (s, g) =>
      s -> (g.map(t => rankOf(t._2)).sum / g.size, g.size.toLong) }
    val sig2 = n * (n + 1) / 12.0 - tieD / (12.0 * (n - 1))
    val rows = q("q454_dunn_posthoc").collect()
    val groups = byGroup.keys.toSeq.sorted
    assert(rows.length == groups.size * (groups.size - 1) / 2)
    rows.foreach { r =>
      val (ma, na) = byGroup(r.getAs[String]("sa"))
      val (mb, nb) = byGroup(r.getAs[String]("sb"))
      val z = (ma - mb) / math.sqrt(sig2 * (1.0 / na + 1.0 / nb))
      val got = r.getAs[Long]("z_e6").toDouble / 1e6
      assert(math.abs(got - z) <= 1e-4,
        s"${r.getAs[String]("sa")} vs ${r.getAs[String]("sb")}: " +
          s"$got vs $z")
      assert(r.getAs[Long]("na") == na && r.getAs[Long]("nb") == nb)
    }
  }

  test("q456 skip-gram pairs match a literal sliding-window walk " +
       "over every document, and the negative-sampling weights are " +
       "the exact sqrt-composed unigram^0.75 shares") {
    val docs = graft.core.Tables.load(spark, TestSpark.sf001,
        "documents")
      .select(col("text")).collect().toSeq
      .map(_.getString(0).split(" ").filter(_.nonEmpty).toSeq)
    val pairCnt = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { ws =>
      for (i <- ws.indices; d <- Seq(-2, -1, 1, 2)) {
        val j = i + d
        if (j >= 0 && j < ws.size) {
          val k = (ws(i), ws(j))
          pairCnt(k) = pairCnt.getOrElse(k, 0L) + 1L
        }
      }
    }
    val uni = docs.flatten.groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val uE9 = uni.map { case (w, c) =>
      w -> graft.analytics.Exact.roundHalfUp(
        math.sqrt(c.toDouble) * math.sqrt(math.sqrt(c.toDouble)) * 1e9)
    }
    val ut = uE9.values.sum
    val top = pairCnt.toSeq
      .sortBy { case ((t, c), n) => (-n, t, c) }.take(50)
    val rows = q("q456_skipgram_pairs").collect()
    assert(rows.length == top.size)
    rows.zip(top).foreach { case (r, ((t, c), n)) =>
      assert(r.getAs[String]("target") == t &&
        r.getAs[String]("context") == c &&
        r.getAs[Long]("n_pair") == n,
        s"row mismatch: got (${r.getAs[String]("target")}, " +
          s"${r.getAs[String]("context")}, " +
          s"${r.getAs[Long]("n_pair")}) want ($t, $c, $n)")
      val want = graft.analytics.Exact.roundHalfUp(
        uE9(c).toDouble / ut.toDouble * 1e9)
      assert(r.getAs[Long]("ctx_neg_e9") == want, s"neg weight of $c")
    }
    // symmetry law of the window: count(a,b) == count(b,a)
    pairCnt.foreach { case ((a, b), n) =>
      assert(pairCnt((b, a)) == n, s"window symmetry ($a,$b)")
    }
  }

  test("q457 BPE merges match a literal symbol-list implementation " +
       "(greedy left-to-right, word-frequency weighted)") {
    val wf = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select(col("text")).collect().toSeq
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    var vocab: Map[Vector[String], Long] =
      wf.map { case (w, n) => w.map(_.toString).toVector -> n }.toMap
    def mergeWord(syms: Vector[String], a: String, b: String)
        : Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.size) {
        if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val learned = (1 to 5).map { _ =>
      val cnt = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Vector(a, b) =>
            cnt((a, b)) = cnt.getOrElse((a, b), 0L) + n
          case _ => ()
        }
      }
      val ((ba, bb), bc) = cnt.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      vocab = vocab.toSeq
        .map { case (s, n) => mergeWord(s, ba, bb) -> n }
        .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      (ba, bb, bc)
    }
    val rows = q("q457_bpe_merges").collect().sortBy(_.getAs[Long]("step"))
    assert(rows.length == 5)
    rows.zip(learned).foreach { case (r, (a, b, c)) =>
      assert(r.getAs[String]("left_sym") == a &&
        r.getAs[String]("right_sym") == b &&
        r.getAs[Long]("cnt") == c,
        s"step ${r.getAs[Long]("step")}: engine " +
          s"(${r.getAs[String]("left_sym")}, " +
          s"${r.getAs[String]("right_sym")}, ${r.getAs[Long]("cnt")}) " +
          s"vs literal ($a, $b, $c)")
    }
  }

  // paired click/view day means (e4) at sf0.001
  private lazy val pairedMeans: Seq[(Long, Long)] = {
    val day = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), to_date(col("ts_s")).as("day"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy("event_type", "day")
      .agg(round(lit(10000.0) * sum("v").cast("double")
        / count(lit(1)).cast("double")).cast("long").as("m"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val clicks = day.filter(_._1 == "click").map(t => t._2 -> t._3).toMap
    val views = day.filter(_._1 == "view").map(t => t._2 -> t._3).toMap
    clicks.keySet.intersect(views.keySet).toSeq.sorted
      .map(d => (clicks(d), views(d)))
  }

  test("q458 Wilcoxon signed-rank: W2+ + W2- telescopes to " +
       "2*(1+..+n) and W matches the literal midrank recompute") {
    val ds = pairedMeans.map { case (a, b) => a - b }.filter(_ != 0L)
    val ranks = ds.map(math.abs).sorted.zipWithIndex
      .groupBy(_._1).map { case (v, ps) =>
        v -> ps.map(_._2 + 1).sum.toDouble / ps.size }
    val wPlus = ds.filter(_ > 0).map(d => ranks(math.abs(d))).sum
    val r = q("q458_wilcoxon_signed_rank").collect().head
    val n = r.getAs[Long]("n")
    assert(n == ds.size.toLong)
    assert(r.getAs[Long]("w2_plus") + r.getAs[Long]("w2_minus")
      == n * (n + 1), "rank-sum telescope")
    assert(math.abs(r.getAs[Long]("w2_plus").toDouble / 2.0 - wPlus)
      < 1e-9, "W+ vs literal midranks")
  }

  test("q459 Siegel slope matches the literal repeated-medians " +
       "double loop") {
    def lowerMedian(xs: Seq[Long]): Long =
      xs.sorted.apply((xs.size + 1) / 2 - 1)
    val inner = revDays.map { case (da, ya) =>
      lowerMedian(revDays.filter(_._1 != da).map { case (db, yb) =>
        math.rint((yb - ya).toDouble * 1e6 / (db - da).toDouble).toLong
      })
    }
    val want = lowerMedian(inner)
    val r = q("q459_siegel_slopes").collect().head
    assert(r.getAs[Long]("n_days") == revDays.size.toLong)
    assert(r.getAs[Long]("siegel_slope_e6") == want,
      s"${r.getAs[Long]("siegel_slope_e6")} vs $want")
  }

  test("q460 partial correlation matches the textbook recompute " +
       "from the three literal daily series") {
    val rows = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("event_type"), to_date(col("ts_s")).as("day"),
        round(col("value") * 100).cast("long"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val byDay = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, xs) =>
      (xs.count(_._1 == "click").toDouble,
        xs.filter(_._1 == "purchase").map(_._3).sum.toDouble,
        xs.count(_._1 == "view").toDouble)
    }
    def pearson(f: ((Double, Double, Double)) => Double,
                g: ((Double, Double, Double)) => Double): Double = {
      val n = byDay.size.toDouble
      val mx = byDay.map(f).sum / n; val my = byDay.map(g).sum / n
      byDay.map(t => (f(t) - mx) * (g(t) - my)).sum /
        math.sqrt(byDay.map(t => (f(t) - mx) * (f(t) - mx)).sum *
          byDay.map(t => (g(t) - my) * (g(t) - my)).sum)
    }
    val rxy = pearson(_._1, _._2)
    val rxz = pearson(_._1, _._3)
    val ryz = pearson(_._2, _._3)
    val part = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    val r = q("q460_partial_correlation").collect().head
    assert(r.getAs[Long]("n_days") == byDay.size.toLong)
    assert(math.abs(r.getAs[Long]("rxy_e6").toDouble / 1e6 - rxy)
      <= 1e-4)
    assert(math.abs(r.getAs[Long]("partial_e6").toDouble / 1e6 - part)
      <= 1e-4, s"partial ${r.getAs[Long]("partial_e6")} vs $part")
  }

  test("q461 Jarque-Bera matches the textbook moments on the " +
       "literal standardized series") {
    val ys = revDays.map(_._2.toDouble)
    val n = ys.size
    val mean = ys.sum / n
    val sd = math.sqrt(ys.map(y => (y - mean) * (y - mean)).sum / n)
    val zs = ys.map(y => (y - mean) / sd)
    val m2 = zs.map(z => z * z).sum / n
    val skew = zs.map(z => z * z * z).sum / n / (m2 * math.sqrt(m2))
    val kurt = zs.map(z => z * z * z * z).sum / n / (m2 * m2) - 3.0
    val jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    val r = q("q461_jarque_bera").collect().head
    assert(r.getAs[Long]("n_days") == n.toLong)
    // the engine works on the e6 standardized lattice — agree to the
    // lattice tolerance, not bit-for-bit with raw doubles
    assert(math.abs(r.getAs[Long]("skew_e6").toDouble / 1e6 - skew)
      <= 1e-3, "skew")
    assert(math.abs(r.getAs[Long]("kurt_e6").toDouble / 1e6 - kurt)
      <= 1e-3, "kurt")
    assert(math.abs(r.getAs[Long]("jb_e6").toDouble / 1e6 - jb)
      <= 2e-2, s"JB ${r.getAs[Long]("jb_e6")} vs $jb")
  }

  test("q462 Granger F matches a literal two-regressor OLS on the " +
       "lagged daily series, and both F's are non-negative") {
    val rows = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), to_date(col("ts_s")).as("day"),
        round(col("value") * 100).cast("long"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val series = rows.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (_, xs) =>
        (xs.count(_._1 == "click").toDouble,
          xs.filter(_._1 == "purchase").map(_._3).sum.toDouble)
    }
    val lagged = series.sliding(2).collect {
      case Seq((xp, yp), (xc, yc)) => (yc, yp, xp, xc)
    }.toSeq
    def fStat(obs: Seq[(Double, Double, Double)]): Double = {
      // obs = (target, ownLag, otherLag); centered normal equations
      val m = obs.size.toDouble
      val my = obs.map(_._1).sum / m
      val m1 = obs.map(_._2).sum / m
      val m2 = obs.map(_._3).sum / m
      val a11 = obs.map(t => (t._2 - m1) * (t._2 - m1)).sum
      val a22 = obs.map(t => (t._3 - m2) * (t._3 - m2)).sum
      val a12 = obs.map(t => (t._2 - m1) * (t._3 - m2)).sum
      val b1 = obs.map(t => (t._2 - m1) * (t._1 - my)).sum
      val b2 = obs.map(t => (t._3 - m2) * (t._1 - my)).sum
      val syy = obs.map(t => (t._1 - my) * (t._1 - my)).sum
      val det = a11 * a22 - a12 * a12
      val bu = (a22 * b1 - a12 * b2) / det
      val cu = (a11 * b2 - a12 * b1) / det
      val sseU = syy - (bu * b1 + cu * b2)
      val sseR = syy - b1 * b1 / a11
      (sseR - sseU) * (m - 3.0) / sseU
    }
    val fxy = fStat(lagged.map(t => (t._1, t._2, t._3)))
    val fyx = fStat(lagged.map(t => (t._4, t._3, t._2)))
    val r = q("q462_granger_causality").collect().head
    assert(r.getAs[Long]("n_obs") == lagged.size.toLong)
    assert(math.abs(
      r.getAs[Long]("f_click_to_rev_e6").toDouble / 1e6 - fxy)
      <= math.abs(fxy) * 1e-6 + 1e-4, s"F x->y vs $fxy")
    assert(math.abs(
      r.getAs[Long]("f_rev_to_click_e6").toDouble / 1e6 - fyx)
      <= math.abs(fyx) * 1e-6 + 1e-4, s"F y->x vs $fyx")
    assert(r.getAs[Long]("f_click_to_rev_e6") >= 0L &&
      r.getAs[Long]("f_rev_to_click_e6") >= 0L)
  }

  test("q463 runs test matches the literal sign-sequence walk") {
    val diffs = revDays.sliding(2).collect {
      case Seq((_, ya), (_, yb)) if ya != yb =>
        if (yb > ya) 1 else -1
    }.toSeq
    val nUp = diffs.count(_ == 1).toLong
    val nDn = diffs.count(_ == -1).toLong
    val runs = if (diffs.isEmpty) 0L
      else 1L + diffs.sliding(2).count {
        case Seq(a, b) => a != b
        case _ => false
      }
    val n = (nUp + nDn).toDouble
    val m2 = 2.0 * nUp * nDn
    val z = (runs - (m2 / n + 1.0)) /
      math.sqrt(m2 * (m2 - n) / (n * n * (n - 1.0)))
    val r = q("q463_runs_test").collect().head
    assert(r.getAs[Long]("n_up") == nUp)
    assert(r.getAs[Long]("n_dn") == nDn)
    assert(r.getAs[Long]("n_runs") == runs)
    assert(math.abs(r.getAs[Long]("z_e6").toDouble / 1e6 - z) <= 1e-5)
  }

  test("q464 dispersion index matches literal per-user counts on " +
       "the full grid, with exact zeros for absent combinations") {
    val ev = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("user_id"), col("event_type"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
    val users = ev.map(_._1).distinct
    val types = ev.map(_._2).distinct
    val cnt = ev.groupBy(identity).map { case (k, xs) =>
      k -> xs.size.toLong }
    val rows = q("q464_dispersion_index").collect()
    assert(rows.length == types.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val cs = users.map(u => cnt.getOrElse((u, t), 0L))
      assert(r.getAs[Long]("n_users") == users.size.toLong)
      assert(r.getAs[Long]("n_events") == cs.sum)
      val n = cs.size.toDouble
      val mean = cs.sum / n
      val v = cs.map(c => (c - mean) * (c - mean)).sum / (n - 1.0)
      val d = v / mean
      assert(math.abs(r.getAs[Long]("d_e6").toDouble / 1e6 - d)
        <= 1e-4, s"$t: D")
    }
  }

  test("q465 empirical-Bernstein bound matches the textbook formula " +
       "and is tighter than Hoeffding when variance is small") {
    val rates = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .groupBy(col("user_id"))
      .agg(round(sum((col("event_type") === "purchase").cast("long"))
        .cast("double") / count(lit(1)).cast("double")
        * 1000000000.0).cast("long").as("r"))
      .collect().toSeq.map(_.getAs[Long]("r").toDouble / 1e9)
    val n = rates.size.toDouble
    val mean = rates.sum / n
    val v = rates.map(x => (x - mean) * (x - mean)).sum / (n - 1.0)
    val l40 = math.log(40.0)
    val eb = math.sqrt(2.0 * v * l40 / n) + 7.0 * l40 / (3.0 * (n - 1))
    val hw = math.sqrt(l40 / (2.0 * n))
    val r = q("q465_empirical_bernstein").collect().head
    assert(r.getAs[Long]("n_users") == rates.size.toLong)
    assert(math.abs(r.getAs[Long]("mean_e9").toDouble / 1e9 - mean)
      <= 1e-6)
    assert(math.abs(r.getAs[Long]("eb_half_e9").toDouble / 1e9 - eb)
      <= 1e-6, "EB width")
    assert(math.abs(
      r.getAs[Long]("hoeffding_half_e9").toDouble / 1e9 - hw) <= 1e-6)
    // on low-variance rate data the variance-adaptive bound wins
    if (v < 0.05) assert(r.getAs[Long]("eb_half_e9") <
      r.getAs[Long]("hoeffding_half_e9") * 3L)
  }
}
