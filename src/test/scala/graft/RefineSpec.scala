package graft

import org.scalatest.funsuite.AnyFunSuite

/** Law tests for the Refine tier (q490–q522) beyond the DuckDB gate:
  * independent plain-Scala replays of the order-statistic estimators,
  * structural invariants (marginals, bounds, monotonicity) that a
  * bit-exact oracle twin cannot distinguish from a shared mistake.
  */
class RefineSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf001)

  /** The day-grain purchase revenue series, replayed independently. */
  private lazy val daySeries: Seq[(Long, Long)] = {
    val e = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .filter(col("event_type") === "purchase")
      .select(datediff(to_date(col("ts_s")), lit("1970-01-01"))
        .cast("long").as("d"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    e.groupBy(_._1).map { case (d, rs) => (d, rs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
  }

  test("q496 Qn: the gate row IS the k-th smallest pairwise |Δ| of an " +
       "independent plain-Scala replay") {
    val ys = daySeries.map(_._2)
    val n = ys.length
    val diffs = (for {
      i <- ys.indices; j <- (i + 1) until n
    } yield math.abs(ys(i) - ys(j))).sorted
    val h = n / 2 + 1
    val k = h * (h - 1) / 2
    val row = q("q496_qn_scale").collect().head
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("k") == k)
    assert(row.getAs[Long]("qn") == diffs(k - 1))
  }

  test("q497 medcouple: replayed kernel median matches, and the " +
       "statistic is bounded in [-1, 1] by construction") {
    val ys = daySeries.map(_._2).sorted
    val med = ys((ys.length + 1) / 2 - 1)
    val lo = daySeries.filter(_._2 < med).sortBy(_._1)
    val hi = daySeries.filter(_._2 > med).sortBy(_._1)
    val hs = (for { (di, xi) <- lo; (dj, xj) <- hi } yield
      (di, dj, math.round(((xj - med) - (med - xi)).toDouble
        / (xj - xi).toDouble * 1e9))).sortBy(t => (t._3, t._1, t._2))
    val row = q("q497_medcouple").collect().head
    assert(row.getAs[Long]("n_pairs") == hs.length)
    val mc = row.getAs[Long]("mc_e9")
    assert(mc == hs((hs.length + 1) / 2 - 1)._3)
    assert(mc >= -1000000000L && mc <= 1000000000L)
  }

  test("q519 Sinkhorn: after the row step the LANG marginals are " +
       "exactly uniform (each row of p1 sums to 1/kl within e9 " +
       "rounding), and the column step moves the SOURCE marginals " +
       "toward 1/ks") {
    val rows = q("q519_sinkhorn_step").collect()
    val kl = rows.map(_.getAs[String]("lang")).distinct.length
    val ks = rows.map(_.getAs[String]("source")).distinct.length
    val target1 = math.round(1e9 / kl)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Long]("p1_e9")).sum
      assert(math.abs(s - target1) <= rs.length,
        s"row marginal $s vs $target1")
    }
    // column step: every source's p2 mass is exactly 1/(ks) within
    // per-cell rounding (that is what the normalization DOES)
    val target2 = math.round(1e9 / ks)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Long]("p2_e9")).sum
      assert(math.abs(s - target2) <= rs.length,
        s"col marginal $s vs $target2")
    }
  }

  test("q513 RBO: identical rankings give term contributions that sum " +
       "to the maximal truncated RBO; the gate's value is bounded " +
       "above by it") {
    val rows = q("q513_rbo_brands").collect()
    val rbo = rows.head.getAs[Long]("rbo_e9")
    // maximal: X_d = d at every depth -> sum of the literal weights
    val maxRbo = (1 to 20).map(d =>
      math.round(math.round(0.1 * math.pow(0.9, d - 1) * 1e12) / 1e3
        .toDouble)).sum
    assert(rbo >= 0L && rbo <= maxRbo + 20,
      s"rbo $rbo outside [0, $maxRbo]")
    // overlap counts are monotone in depth
    val xs = rows.sortBy(_.getAs[Long]("d")).map(_.getAs[Long]("xd"))
    assert(xs.zip(xs.tail).forall { case (a, b) => b >= a })
  }

  test("q503 greedy knapsack: picks are a density-ordered PREFIX and " +
       "the picked mass never exceeds the budget") {
    val rows = q("q503_budget_greedy").collect()
      .sortBy(r => (-r.getAs[Long]("density_e9"),
        r.getAs[String]("source")))
    val budget = rows.head.getAs[Long]("budget")
    val picked = rows.map(_.getAs[Long]("picked"))
    // prefix property: once a row is unpicked, everything after is
    assert(picked.zip(picked.tail).forall { case (a, b) => a >= b })
    val pickedCost = rows.filter(_.getAs[Long]("picked") == 1L)
      .map(_.getAs[Long]("cost")).sum
    assert(pickedCost <= budget)
  }

  test("q504 DoReMi step: weights normalize to 1 within per-group " +
       "rounding and order by the excess-loss proxy") {
    val rows = q("q504_doremi_step").collect()
    val ws = rows.map(_.getAs[Long]("w_e6"))
    assert(math.abs(ws.sum - 1000000L) <= rows.length)
    val byExcess = rows.sortBy(_.getAs[Long]("excess_e3"))
      .map(_.getAs[Long]("w_e6"))
    assert(byExcess.zip(byExcess.tail).forall { case (a, b) => b >= a })
  }

  test("q512 Brier decomposition: REL - RES + UNC reconstructs the " +
       "Brier score computed directly (within the per-bin rounding " +
       "grain)") {
    val row = q("q512_brier_decomp").collect().head
    val rel = row.getAs[Long]("rel_e9")
    val res = row.getAs[Long]("res_e9")
    val unc = row.getAs[Long]("unc_e9")
    // direct Brier: mean (b/100 - o)^2 over the same labeled users
    val u = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("ncl"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("nv"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"))
      .filter(col("ncl") + col("nv") > 0L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val nps = u.map(_._3).sorted
    val med = nps((nps.length + 1) / 2 - 1)
    val scored = u.map { case (ncl, nv, np) =>
      (math.round(ncl.toDouble / (ncl + nv).toDouble * 100.0),
        if (np > med) 1L else 0L)
    }
    val brier = scored.map { case (b, o) =>
      val p = b.toDouble / 100.0
      (p - o) * (p - o)
    }.sum / scored.length
    val recon = (rel - res + unc).toDouble / 1e9
    assert(math.abs(recon - brier) < 1e-4,
      s"identity violated: $recon vs $brier")
  }

  test("q508 3-truss: every surviving edge's round-1 support is >= 1 " +
       "and survivors are a subset of the round-0 positive-support " +
       "edges (peeling only removes)") {
    val rows = q("q508_ktruss_peel").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("sup1") >= 1L))
    assert(rows.forall(r =>
      r.getAs[Long]("sup1") <= r.getAs[Long]("sup0")))
  }

  test("q506 AMS: the 16-estimator median is within 3x of exact F2 " +
       "(sign-sketch concentration at this corpus size) and the " +
       "exact moment replays in plain Scala") {
    val row = q("q506_ams_f2").collect().head
    val f2 = row.getAs[Long]("f2_exact")
    val est = row.getAs[Long]("f2_est")
    val counts = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(f2 == counts.map(n => n * n).sum)
    assert(est > 0L && est < 3L * f2 && 3L * est > f2)
  }
}
