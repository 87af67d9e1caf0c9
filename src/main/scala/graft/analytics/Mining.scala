package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.PlanStats.Pinned
import graft.core.Tables

/** Pattern-mining / modeling tier (session 10, continuation): the
  * classical data-mining and fitting primitives a corpus platform
  * runs AFTER the statistical-testing tiers have said "these two
  * snapshots differ" — what co-occurs (association rules), what's the
  * trend (OLS, Theil–Sen, Mann–Kendall), and the multi-level rollup
  * that feeds dashboards (CUBE). No reference analogue (the
  * reference delegates all analytics to SQL;
  * /root/reference/README.md:1-3).
  *
  * Cross-engine discipline as everywhere in the gate: e2 cents
  * quantization at the scan, exact long/decimal(38,0) sufficient
  * statistics (HUGEINT in the oracle), readout chains of IEEE ops in
  * IDENTICAL operation order on both engines (the q261 precedent),
  * unique-tiebreak ORDER BY, no Decimal/Float in final schemas.
  *
  * Scale posture: q434's pair expansion is bounded per order by the
  * BRAND UNIVERSE (C(25,2)), never by line volume; q435 reduces to
  * six sufficient statistics per group in one map-side-combined
  * scan; q436's pairwise table is the 30-day OBSERVATION SPAN
  * squared (calendar-bounded, raise_error tripwire at 1000 days);
  * q437 is a plain grouped rollup (8 output rows). Nothing here
  * materializes a data-volume-driven cross product.
  */
object Mining {

  private val dec = "decimal(38,0)"

  /** Unpartitioned-window site for this module (allowlisted in
    * PlanQualitySpec's source lint): only ever applied to the
    * day-pair grain (≤ C(1000,2) rows, tripwired) — bounded by the
    * observation span, never by data volume. */
  private def axis(sort: Column*) = Window.orderBy(sort: _*)

  // ---------------------------------------------------------------------
  // q434 — Apriori LEVEL-3 mining: frequent brand TRIPLES with the
  // candidate-pruning step that defines the algorithm (the pair
  // level is the long-gated q200 — this is the next lattice level,
  // which q200 does not have). Baskets are orders, items the
  // DISTINCT part brands; the pair table computes supports, the
  // FREQUENT pairs (relative min-support n_ab·1000 ≥ N) broadcast,
  // and triple generation is PRUNED IN-PLAN by downward closure:
  // the (a,b) extension joins the frequent-pair broadcast BEFORE
  // the third item attaches, and the (a,c)/(b,c) sub-pairs filter
  // through the same broadcast — a candidate triple only ever
  // materializes when all three sub-pairs are frequent, the Apriori
  // property doing real work in the physical plan. Everything is
  // bounded by the brand universe per order; supports exact.
  // ---------------------------------------------------------------------
  private def q434(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val part = Tables.load(s, dir, "part")
    // pinned: one lineitem scan materializes the (order, brand)
    // basket grain; totals, per-brand counts and the pair self-join
    // all read the materialization
    val ob = li.join(broadcast(part),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
      .distinct().pin()
    val n = ob.agg(countDistinct(col("ok")).as("n_orders"))
    val pairs = ob.as("x").join(ob.as("y"),
        col("x.ok") === col("y.ok") && col("x.b") < col("y.b"))
      .groupBy(col("x.b").as("ba"), col("y.b").as("bb"))
      .agg(count(lit(1)).as("n_ab"))
    // frequent pairs: the broadcast pruning set (≤ C(|brands|, 2))
    val fp = pairs.crossJoin(broadcast(n))
      .filter(col("n_ab") * 1000L >= col("n_orders"))
      .select(col("ba"), col("bb")).pin()
    val xy = ob.as("x").join(ob.as("y"),
        col("x.ok") === col("y.ok") && col("x.b") < col("y.b"))
      .select(col("x.ok").as("ok"), col("x.b").as("ba"),
        col("y.b").as("bb"))
      .join(broadcast(fp), Seq("ba", "bb"), "left_semi")
    val xyz = xy.join(ob.as("z").select(col("ok"), col("b").as("bc")),
        Seq("ok"))
      .filter(col("bb") < col("bc"))
      .join(broadcast(fp.select(col("ba").as("bb"),
        col("bb").as("bc"))), Seq("bb", "bc"), "left_semi")
      .join(broadcast(fp.select(col("ba"), col("bb").as("bc"))),
        Seq("ba", "bc"), "left_semi")
    xyz.groupBy("ba", "bb", "bc")
      .agg(count(lit(1)).as("n_abc"))
      .crossJoin(broadcast(n))
      .filter(col("n_abc") * 1000L >= col("n_orders"))
      .select(col("ba"), col("bb"), col("bc"), col("n_abc"),
        col("n_orders"),
        round(col("n_abc").cast("double")
          / col("n_orders").cast("double") * 1000000.0).cast("long")
          .as("supp_e6"))
      .orderBy("ba", "bb", "bc")
  }

  private val q434Sql =
    """WITH ob AS (
      |  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |n AS (SELECT count(DISTINCT ok) AS n_orders FROM ob),
      |pairs AS (
      |  SELECT x.b AS ba, y.b AS bb, CAST(count(*) AS BIGINT) AS n_ab
      |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b
      |  GROUP BY 1, 2),
      |fp AS (SELECT ba, bb FROM pairs CROSS JOIN n
      |  WHERE n_ab * 1000 >= n_orders),
      |xy AS (
      |  SELECT x.ok, x.b AS ba, y.b AS bb
      |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b
      |  WHERE EXISTS (SELECT 1 FROM fp
      |    WHERE fp.ba = x.b AND fp.bb = y.b)),
      |xyz AS (
      |  SELECT xy.ba, xy.bb, z.b AS bc
      |  FROM xy JOIN ob z ON xy.ok = z.ok AND xy.bb < z.b
      |  WHERE EXISTS (SELECT 1 FROM fp
      |      WHERE fp.ba = xy.bb AND fp.bb = z.b)
      |    AND EXISTS (SELECT 1 FROM fp
      |      WHERE fp.ba = xy.ba AND fp.bb = z.b))
      |SELECT ba, bb, bc, CAST(count(*) AS BIGINT) AS n_abc,
      |  CAST(n_orders AS BIGINT) AS n_orders,
      |  CAST(round(CAST(count(*) AS DOUBLE)
      |    / CAST(n_orders AS DOUBLE) * 1000000.0) AS BIGINT)
      |    AS supp_e6
      |FROM xyz CROSS JOIN n
      |GROUP BY ba, bb, bc, n_orders
      |HAVING count(*) * 1000 >= n_orders
      |ORDER BY ba, bb, bc""".stripMargin

  // ---------------------------------------------------------------------
  // q435 — OLS linear regression of order value on ORDER DATE, per
  // priority class ("is order value trending over time, and does the
  // trend differ by priority" — the temporal fit; the price-on-
  // quantity fit per return flag is the long-gated q124, which this
  // deliberately does NOT duplicate): the closed-form
  // normal-equation fit from SIX exact sufficient statistics
  // (n, Σx, Σy, Σxy, Σx², Σy² — x the epoch day, y cents; the
  // decimal(38,0) sums carry ~10¹³-row headroom). slope = (nΣxy −
  // ΣxΣy)/(nΣx² − (Σx)²), intercept and R² from the same integers —
  // each readout ONE written-out IEEE chain, identical on both
  // engines; den ≤ 0 (degenerate x or y) guarded to 0 on both (the
  // q385 convention). Scale: one scan, map-side combine to 5 rows.
  // ---------------------------------------------------------------------
  private def q435(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "orders")
      .select(col("o_orderpriority").as("rf"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("x"),
        round(col("o_totalprice") * 100).cast("long").as("y"))
    val st = li.groupBy("rf").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x").cast(dec) * col("y")).as("sxy"),
      sum(col("x").cast(dec) * col("x")).as("sxx"),
      sum(col("y").cast(dec) * col("y")).as("syy"))
    val num = col("n").cast(dec) * col("sxy") -
      col("sx").cast(dec) * col("sy")
    val denx = col("n").cast(dec) * col("sxx") -
      col("sx").cast(dec) * col("sx")
    val deny = col("n").cast(dec) * col("syy") -
      col("sy").cast(dec) * col("sy")
    st.select(col("rf"), col("n"), col("sx"), col("sy"),
        num.cast("double").as("numd"),
        denx.cast("double").as("denxd"),
        deny.cast("double").as("denyd"))
      .select(col("rf"), col("n"), col("sx"), col("sy"),
        when(col("denxd") > 0.0,
          round(col("numd") / col("denxd") * 1000000.0).cast("long"))
          .otherwise(0L).as("slope_e6"),
        when(col("denxd") > 0.0,
          round((col("sy").cast("double") / col("n").cast("double")
            - col("numd") / col("denxd")
              * (col("sx").cast("double") / col("n").cast("double")))
            * 1000000.0).cast("long"))
          .otherwise(0L).as("intercept_e6"),
        when(col("denxd") > 0.0 && col("denyd") > 0.0,
          round(col("numd") * col("numd")
            / (col("denxd") * col("denyd")) * 1000000.0).cast("long"))
          .otherwise(0L).as("r2_e6"))
      .orderBy("rf")
  }

  private val q435Sql =
    """WITH li AS (
      |  SELECT o_orderpriority AS rf,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
      |      AS BIGINT) AS x,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
      |  FROM orders),
      |st AS (
      |  SELECT rf, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM li GROUP BY rf),
      |d AS (
      |  SELECT rf, n, sx, sy,
      |    CAST(CAST(n AS HUGEINT) * sxy
      |      - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS numd,
      |    CAST(CAST(n AS HUGEINT) * sxx
      |      - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS denxd,
      |    CAST(CAST(n AS HUGEINT) * syy
      |      - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS denyd
      |  FROM st)
      |SELECT rf, n, sx, sy,
      |  CASE WHEN denxd > 0.0 THEN
      |    CAST(round(numd / denxd * 1000000.0) AS BIGINT)
      |    ELSE 0 END AS slope_e6,
      |  CASE WHEN denxd > 0.0 THEN
      |    CAST(round((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      |      - numd / denxd
      |        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
      |      * 1000000.0) AS BIGINT)
      |    ELSE 0 END AS intercept_e6,
      |  CASE WHEN denxd > 0.0 AND denyd > 0.0 THEN
      |    CAST(round(numd * numd / (denxd * denyd) * 1000000.0)
      |      AS BIGINT)
      |    ELSE 0 END AS r2_e6
      |FROM d ORDER BY rf""".stripMargin

  // ---------------------------------------------------------------------
  // q436 — Theil–Sen slope + Mann–Kendall trend over the daily
  // purchase-revenue series: the robust regression twin of q435 (a
  // single outlier day cannot drag the median-of-pairwise-slopes)
  // and the classic distribution-free trend test, from ONE day-pair
  // table. The day grain is the 30-day observation span (tripwired
  // at 1000 days — the expansion is calendar-bounded, never
  // data-volume-bounded). Pairwise slope: cast-to-double, ×1e6, ÷Δd,
  // round — three IEEE ops in fixed order (exact-long Δrev keeps the
  // chain deterministic); the median is the exact lower order
  // statistic with (da, db) tiebreak. Mann–Kendall S = Σ sign(Δrev)
  // is exact integer off the same pairs.
  // ---------------------------------------------------------------------
  private def q436(s: SparkSession, dir: String): DataFrame = {
    val day = Tables.eventsSec(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("rev"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long")
        .as("d"), col("rev"))
    val cnt = day.agg(count(lit(1)).as("n_days"))
    val a = day.select(col("d").as("da"), col("rev").as("ra"))
    val b = day.select(col("d").as("db"), col("rev").as("rb"))
    val pairs = a.crossJoin(broadcast(b)).crossJoin(broadcast(cnt))
      .filter(col("da") < col("db"))
      .withColumn("slope_e6",
        when(col("n_days") <= 1000L,
          round((col("rb") - col("ra")).cast("double") * 1000000.0
            / (col("db") - col("da")).cast("double")).cast("long"))
          .otherwise(raise_error(concat(
            lit("theilSen: day grain exceeded 1000 ("),
            col("n_days").cast("string"),
            lit(") — aggregate to a coarser grain or raise the bound " +
              "explicitly.")))))
      .withColumn("sgn",
        signum((col("rb") - col("ra")).cast("double")).cast("long"))
      .withColumn("rn", row_number()
        .over(axis(col("slope_e6"), col("da"), col("db"))).cast("long"))
    pairs.groupBy("n_days")
      .agg(count(lit(1)).as("n_pairs"),
        min(when(col("rn") ===
          expr("(n_days * (n_days - 1) div 2 + 1) div 2"),
          col("slope_e6"))).as("ts_slope_e6"),
        sum("sgn").as("mk_s"))
      .select(col("n_days"), col("n_pairs"), col("ts_slope_e6"),
        col("mk_s"))
      .orderBy("n_days")
  }

  private val q436Sql =
    """WITH day AS (
      |  SELECT CAST(CAST(date_trunc('second', ts) AS DATE)
      |      - DATE '1970-01-01' AS BIGINT) AS d,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS rev
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY 1),
      |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM day),
      |pairs AS (
      |  SELECT a.d AS da, b.d AS db,
      |    CAST(round(CAST(b.rev - a.rev AS DOUBLE) * 1000000.0
      |      / CAST(b.d - a.d AS DOUBLE)) AS BIGINT) AS slope_e6,
      |    CAST(sign(CAST(b.rev - a.rev AS DOUBLE)) AS BIGINT) AS sgn
      |  FROM day a JOIN day b ON a.d < b.d),
      |ranked AS (
      |  SELECT slope_e6, sgn,
      |    CAST(row_number() OVER (ORDER BY slope_e6, da, db)
      |      AS BIGINT) AS rn,
      |    CAST(count(*) OVER () AS BIGINT) AS np
      |  FROM pairs)
      |SELECT n_days, CAST(count(*) AS BIGINT) AS n_pairs,
      |  min(CASE WHEN rn = (np + 1) // 2 THEN slope_e6 END)
      |    AS ts_slope_e6,
      |  CAST(sum(sgn) AS BIGINT) AS mk_s
      |FROM cnt CROSS JOIN ranked
      |GROUP BY n_days ORDER BY n_days""".stripMargin

  // ---------------------------------------------------------------------
  // q437 — revenue CUBE over (returnflag, linestatus): the
  // multi-level rollup surface — all four grouping levels (detail,
  // each single-axis margin, grand total) in one pass. Spark's
  // `cube` and DuckDB's GROUP BY CUBE both produce the lattice;
  // the level id is reconstructed per-engine as 2·grouping(rf) +
  // grouping(ls) and margins read 'ALL' (the data columns are
  // non-null, so coalesce is unambiguous). Revenue is exact cents;
  // the per-row average is ONE readout division. Scale: a grouped
  // aggregate with 12-row output — the map-side partials do all the
  // work, the cube expansion multiplies rows by 4 BEFORE the
  // combine, never after the shuffle.
  // ---------------------------------------------------------------------
  private def q437(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag").as("rfv"),
        col("l_linestatus").as("lsv"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_quantity") * 100).cast("long").as("qty_e2"))
    li.cube(col("rfv"), col("lsv"))
      .agg(count(lit(1)).as("n"), sum("cents").as("revenue_cents"),
        sum("qty_e2").as("qty_e2"),
        (grouping(col("rfv")) * 2 + grouping(col("lsv"))).cast("long")
          .as("lvl"))
      .select(col("lvl"),
        coalesce(col("rfv"), lit("ALL")).as("rf"),
        coalesce(col("lsv"), lit("ALL")).as("ls"),
        col("n"), col("revenue_cents"), col("qty_e2"),
        round(col("revenue_cents").cast("double")
          / col("n").cast("double")).cast("long").as("avg_cents"))
      .orderBy("lvl", "rf", "ls")
  }

  private val q437Sql =
    """SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
      |    AS BIGINT) AS lvl,
      |  coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |    AS BIGINT) AS revenue_cents,
      |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
      |    AS qty_e2,
      |  CAST(round(CAST(sum(CAST(round(l_extendedprice * 100)
      |      AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE))
      |    AS BIGINT) AS avg_cents
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY lvl, rf, ls""".stripMargin

  /** Daily purchase-revenue series (epoch-day index, exact cents) —
    * shared by the day-grain consumers (q439/q441/q442/q443/q449/
    * q450). Calendar-bounded (30 days in the testdata; the consumers
    * tripwire at 1000) and PINNED: the fact table is scanned exactly
    * once per query, the ≤1000-row day grain is materialized, and
    * every downstream reuse (totals, pair tables, walks) reads the
    * materialization instead of re-scanning events. */
  private def dayRev(s: SparkSession, dir: String): DataFrame =
    Tables.eventsSec(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long")
        .as("d"), col("y"))
      .pin()

  private val dayRevSql =
    """SELECT CAST(CAST(date_trunc('second', ts) AS DATE)
      |    - DATE '1970-01-01' AS BIGINT) AS d,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q438 — frequent ordered 2-sequences ("a somewhere before b"):
  // the sequential-pattern complement of q392's ADJACENT transition
  // counts — per user, type a precedes type b iff a's FIRST second
  // strictly precedes b's LAST second (second-granularity semantics,
  // matching the gate-wide ts truncation; same-second order is
  // deliberately not consulted). The per-user reduction is to the
  // (user × 5-type) grain; the pattern join is ≤ 5×4 combinations
  // per user — bounded by the TYPE UNIVERSE, never by event volume.
  // Support/confidence/lift exactly as q434 (exact counts, one IEEE
  // chain each).
  // ---------------------------------------------------------------------
  private def q438(s: SparkSession, dir: String): DataFrame = {
    // pinned: one events scan to the (user × type) span grain; the
    // totals, marginals and the pattern self-join reuse it
    val ua = Tables.eventsSec(s, dir)
      .groupBy(col("user_id").as("u"), col("event_type").as("t"))
      .agg(min("ts_s").as("mn"), max("ts_s").as("mx")).pin()
    val n = ua.agg(countDistinct(col("u")).as("n_users"))
    val per = ua.groupBy("t").agg(count(lit(1)).as("n_one"))
    val sup = ua.as("x").join(ua.as("y"),
        col("x.u") === col("y.u") && col("x.t") =!= col("y.t") &&
          col("x.mn") < col("y.mx"))
      .groupBy(col("x.t").as("ta"), col("y.t").as("tb"))
      .agg(count(lit(1)).as("n_ab"))
    sup
      .join(broadcast(per.select(col("t").as("ta"),
        col("n_one").as("n_a"))), "ta")
      .join(broadcast(per.select(col("t").as("tb"),
        col("n_one").as("n_b"))), "tb")
      .crossJoin(broadcast(n))
      .select(col("ta"), col("tb"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_users"),
        round(col("n_ab").cast("double") / col("n_a").cast("double")
          * 1000000.0).cast("long").as("conf_e6"),
        round(col("n_ab").cast("double") * col("n_users").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double"))
          * 1000000.0).cast("long").as("lift_e6"))
      .orderBy("ta", "tb")
  }

  private val q438Sql =
    """WITH ua AS (
      |  SELECT user_id AS u, event_type AS t,
      |    min(date_trunc('second', ts)) AS mn,
      |    max(date_trunc('second', ts)) AS mx
      |  FROM events GROUP BY 1, 2),
      |n AS (SELECT count(DISTINCT u) AS n_users FROM ua),
      |per AS (SELECT t, CAST(count(*) AS BIGINT) AS n_one
      |  FROM ua GROUP BY t),
      |sup AS (
      |  SELECT x.t AS ta, y.t AS tb, CAST(count(*) AS BIGINT) AS n_ab
      |  FROM ua x JOIN ua y ON x.u = y.u AND x.t <> y.t
      |    AND x.mn < y.mx
      |  GROUP BY 1, 2)
      |SELECT ta, tb, n_ab, pa.n_one AS n_a, pb.n_one AS n_b,
      |  CAST(n_users AS BIGINT) AS n_users,
      |  CAST(round(CAST(n_ab AS DOUBLE) / CAST(pa.n_one AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS conf_e6,
      |  CAST(round(CAST(n_ab AS DOUBLE) * CAST(n_users AS DOUBLE)
      |    / (CAST(pa.n_one AS DOUBLE) * CAST(pb.n_one AS DOUBLE))
      |    * 1000000.0) AS BIGINT) AS lift_e6
      |FROM sup
      |  JOIN per pa ON sup.ta = pa.t
      |  JOIN per pb ON sup.tb = pb.t
      |  CROSS JOIN n
      |ORDER BY ta, tb""".stripMargin

  // ---------------------------------------------------------------------
  // q439 — RANSAC line fit on the daily revenue series, INTEGER-EXACT
  // end to end: every ordered day pair is a candidate model (the
  // classic sample-size-2 case, run EXHAUSTIVELY — the model space is
  // the calendar-bounded day-pair grid, so no random sampling is
  // needed and the result is deterministic); a day is an inlier of
  // model (a,b) iff |(y−ya)·Δd − Δy·(d−da)| ≤ MAD·Δd — the point-to-
  // line residual cross-multiplied so NO division ever happens, with
  // the tolerance band the exact integer MAD of the series (scale-
  // free by construction). Best model = max inliers, (da,db)
  // tiebreak; the consensus set is then refit by the q435 OLS chain.
  // Everything before the two readout divisions is exact longs.
  // ---------------------------------------------------------------------
  private def q439(s: SparkSession, dir: String): DataFrame = {
    val day = dayRev(s, dir)
    val cnt = day.agg(count(lit(1)).as("n_days"))
    // the tripwire guards the day index itself, so it cannot be
    // pruned out of the plan (the q416 pattern)
    val guard = day.crossJoin(broadcast(cnt))
      .select(
        when(col("n_days") <= 1000L, col("d"))
          .otherwise(raise_error(concat(
            lit("ransacLine: day grain exceeded 1000 ("),
            col("n_days").cast("string"),
            lit(") — aggregate to a coarser grain or raise the bound " +
              "explicitly.")))).as("d"),
        col("y"), col("n_days"))
    // exact lower median of y, then exact lower median of |y - med|
    val med = guard
      .withColumn("rn", row_number().over(axis(col("y"), col("d"))))
      .groupBy("n_days")
      .agg(min(when(col("rn") === expr("(n_days + 1) div 2"),
        col("y"))).as("y_med"))
    val mad = guard.crossJoin(broadcast(med.select("y_med")))
      .withColumn("dev", abs(col("y") - col("y_med")))
      .withColumn("rn", row_number().over(axis(col("dev"), col("d"))))
      .groupBy("n_days")
      .agg(min(when(col("rn") === expr("(n_days + 1) div 2"),
        col("dev"))).as("mad"))
    val a = guard.select(col("d").as("da"), col("y").as("ya"))
    val b = guard.select(col("d").as("db"), col("y").as("yb"))
    val models = a.crossJoin(broadcast(b))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"), (col("yb") - col("ya")).as("dy"),
        (col("db") - col("da")).as("dx"), col("ya"))
    val scored = models
      .crossJoin(broadcast(guard.select(col("d"), col("y"))))
      .crossJoin(broadcast(mad))
      .filter(abs((col("y") - col("ya")) * col("dx")
        - col("dy") * (col("d") - col("da")))
        <= col("mad") * col("dx"))
      .groupBy("n_days", "mad", "da", "db", "dy", "dx", "ya")
      .agg(count(lit(1)).as("n_inliers"))
    val best = scored
      .withColumn("rk", row_number().over(
        axis(col("n_inliers").desc, col("da"), col("db"))))
      .filter(col("rk") === 1)
      .drop("rk")
    // OLS refit on the consensus set (the q435 sufficient-statistic
    // chain, x = epoch day, y = cents)
    val fit = guard.select(col("d"), col("y"))
      .crossJoin(broadcast(best))
      .filter(abs((col("y") - col("ya")) * col("dx")
        - col("dy") * (col("d") - col("da")))
        <= col("mad") * col("dx"))
      .groupBy("n_days", "mad", "da", "db", "n_inliers")
      .agg(count(lit(1)).as("nf"),
        sum("d").as("sx"), sum("y").as("sy"),
        sum(col("d").cast(dec) * col("y")).as("sxy"),
        sum(col("d").cast(dec) * col("d")).as("sxx"))
    val num = col("nf").cast(dec) * col("sxy") -
      col("sx").cast(dec) * col("sy")
    val denx = col("nf").cast(dec) * col("sxx") -
      col("sx").cast(dec) * col("sx")
    fit.select(col("n_days"), col("mad"), col("da").as("best_da"),
        col("db").as("best_db"), col("n_inliers"),
        num.cast("double").as("numd"), denx.cast("double").as("denxd"),
        col("sx"), col("sy"), col("nf"))
      .select(col("n_days"), col("mad"), col("best_da"),
        col("best_db"), col("n_inliers"),
        when(col("denxd") > 0.0,
          round(col("numd") / col("denxd") * 1000000.0).cast("long"))
          .otherwise(0L).as("refit_slope_e6"),
        when(col("denxd") > 0.0,
          round((col("sy").cast("double") / col("nf").cast("double")
            - col("numd") / col("denxd")
              * (col("sx").cast("double") / col("nf").cast("double")))
            * 1000000.0).cast("long"))
          .otherwise(0L).as("refit_intercept_e6"))
      .orderBy("n_days")
  }

  private val q439Sql =
    s"""WITH day AS (
       |  $dayRevSql),
       |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM day),
       |med AS (
       |  SELECT n_days, min(CASE WHEN rn = (n_days + 1) // 2
       |      THEN y END) AS y_med
       |  FROM cnt CROSS JOIN (
       |    SELECT y, CAST(row_number() OVER (ORDER BY y, d)
       |      AS BIGINT) AS rn FROM day) r
       |  GROUP BY n_days),
       |mad AS (
       |  SELECT n_days, min(CASE WHEN rn = (n_days + 1) // 2
       |      THEN dev END) AS mad
       |  FROM cnt CROSS JOIN (
       |    SELECT abs(y - y_med) AS dev,
       |      CAST(row_number() OVER (ORDER BY abs(y - y_med), d)
       |        AS BIGINT) AS rn
       |    FROM day CROSS JOIN med) r
       |  GROUP BY n_days),
       |models AS (
       |  SELECT a.d AS da, b.d AS db, b.y - a.y AS dy,
       |    b.d - a.d AS dx, a.y AS ya
       |  FROM day a JOIN day b ON a.d < b.d),
       |scored AS (
       |  SELECT n_days, mad, da, db, dy, dx, ya,
       |    CAST(count(*) AS BIGINT) AS n_inliers
       |  FROM models CROSS JOIN day p CROSS JOIN mad
       |  WHERE abs((p.y - ya) * dx - dy * (p.d - da)) <= mad * dx
       |  GROUP BY 1, 2, 3, 4, 5, 6, 7),
       |best AS (
       |  SELECT * FROM (
       |    SELECT scored.*, row_number() OVER
       |      (ORDER BY n_inliers DESC, da, db) AS rk FROM scored) s
       |  WHERE rk = 1),
       |fit AS (
       |  SELECT n_days, mad, da, db, n_inliers,
       |    CAST(count(*) AS BIGINT) AS nf,
       |    CAST(sum(p.d) AS BIGINT) AS sx,
       |    CAST(sum(p.y) AS BIGINT) AS sy,
       |    sum(CAST(p.d AS HUGEINT) * p.y) AS sxy,
       |    sum(CAST(p.d AS HUGEINT) * p.d) AS sxx
       |  FROM day p CROSS JOIN best
       |  WHERE abs((p.y - ya) * dx - dy * (p.d - da)) <= mad * dx
       |  GROUP BY 1, 2, 3, 4, 5),
       |d2 AS (
       |  SELECT n_days, mad, da AS best_da, db AS best_db, n_inliers,
       |    nf, sx, sy,
       |    CAST(CAST(nf AS HUGEINT) * sxy
       |      - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS numd,
       |    CAST(CAST(nf AS HUGEINT) * sxx
       |      - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS denxd
       |  FROM fit)
       |SELECT n_days, mad, best_da, best_db, n_inliers,
       |  CASE WHEN denxd > 0.0 THEN
       |    CAST(round(numd / denxd * 1000000.0) AS BIGINT)
       |    ELSE 0 END AS refit_slope_e6,
       |  CASE WHEN denxd > 0.0 THEN
       |    CAST(round((CAST(sy AS DOUBLE) / CAST(nf AS DOUBLE)
       |      - numd / denxd
       |        * (CAST(sx AS DOUBLE) / CAST(nf AS DOUBLE)))
       |      * 1000000.0) AS BIGINT)
       |    ELSE 0 END AS refit_intercept_e6
       |FROM d2 ORDER BY n_days""".stripMargin

  // ---------------------------------------------------------------------
  // q440 — lead–lag cross-correlation profile between daily click
  // COUNT and daily purchase REVENUE at lags −7..+7: the
  // which-series-leads diagnostic behind every "did marketing clicks
  // drive next-day purchases" question — the two-series complement of
  // the gated ACF (q374). Per lag L the pairs are (clicks(t),
  // revenue(t+L)) over overlapping days; Pearson r comes from the
  // q435 exact sufficient statistics per lag, with sqrt in the
  // readout (correctly-rounded IEEE, the q415 precedent). The lag
  // table is a 15-row literal enumeration; the day join is
  // calendar-bounded.
  // ---------------------------------------------------------------------
  private def q440(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir)
    val dayx = ev.filter(col("event_type") === "click")
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(count(lit(1)).as("x"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long")
        .as("d"), col("x"))
    val dayy = dayRev(s, dir)
    val lags = s.range(-7L, 8L).select(col("id").as("lag"))
    val pairs = dayx.crossJoin(broadcast(lags))
      .join(broadcast(dayy.select(col("d").as("dy_d"), col("y"))),
        col("dy_d") === col("d") + col("lag"))
    val st = pairs.groupBy("lag").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x").cast(dec) * col("y")).as("sxy"),
      sum(col("x").cast(dec) * col("x")).as("sxx"),
      sum(col("y").cast(dec) * col("y")).as("syy"))
    val num = col("n").cast(dec) * col("sxy") -
      col("sx").cast(dec) * col("sy")
    val denx = col("n").cast(dec) * col("sxx") -
      col("sx").cast(dec) * col("sx")
    val deny = col("n").cast(dec) * col("syy") -
      col("sy").cast(dec) * col("sy")
    st.select(col("lag"), col("n"),
        num.cast("double").as("numd"),
        denx.cast("double").as("denxd"),
        deny.cast("double").as("denyd"))
      .select(col("lag"), col("n"),
        when(col("denxd") > 0.0 && col("denyd") > 0.0,
          round(col("numd") / sqrt(col("denxd") * col("denyd"))
            * 1000000.0).cast("long"))
          .otherwise(0L).as("r_e6"))
      .orderBy("lag")
  }

  private val q440Sql =
    s"""WITH dayx AS (
       |  SELECT CAST(CAST(date_trunc('second', ts) AS DATE)
       |      - DATE '1970-01-01' AS BIGINT) AS d,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events WHERE event_type = 'click'
       |  GROUP BY 1),
       |dayy AS (
       |  $dayRevSql),
       |lags AS (SELECT CAST(g AS BIGINT) AS lag
       |  FROM generate_series(-7, 7) t(g)),
       |pairs AS (
       |  SELECT lag, x, y
       |  FROM dayx CROSS JOIN lags
       |    JOIN dayy ON dayy.d = dayx.d + lag),
       |st AS (
       |  SELECT lag, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(y AS HUGEINT) * y) AS syy
       |  FROM pairs GROUP BY lag),
       |d2 AS (
       |  SELECT lag, n,
       |    CAST(CAST(n AS HUGEINT) * sxy
       |      - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS numd,
       |    CAST(CAST(n AS HUGEINT) * sxx
       |      - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS denxd,
       |    CAST(CAST(n AS HUGEINT) * syy
       |      - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS denyd
       |  FROM st)
       |SELECT lag, n,
       |  CASE WHEN denxd > 0.0 AND denyd > 0.0 THEN
       |    CAST(round(numd / sqrt(denxd * denyd) * 1000000.0)
       |      AS BIGINT)
       |    ELSE 0 END AS r_e6
       |FROM d2 ORDER BY lag""".stripMargin

  // ---------------------------------------------------------------------
  // q441 — Hurst exponent by rescaled-range (R/S) analysis of the
  // daily revenue series: the long-memory diagnostic (H≈0.5 random
  // walk, H>0.5 persistent trend) behind burstiness claims about a
  // feed. Blocks of w ∈ {5,10,15,30} RANKED days (complete blocks
  // only); within a block the rescaled range collapses to integers:
  // with D_i = w·cum_i − i·S the identity R/S = (maxD − minD) /
  // √(w·ΣY² − S²) clears every division — ONE e6-rounded IEEE chain
  // per block. Per-w mean of block R/S, then H = OLS slope of
  // ln(R/S) on ln(w) over the ≤4 lattice points (per-point ln
  // e9-rounded, the q375 discipline). Everything is bounded by the
  // observation span; the within-block window is partitioned.
  // ---------------------------------------------------------------------
  private def q441(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ranked = dayRev(s, dir)
      .withColumn("r", row_number().over(axis(col("d"))).cast("long"))
    val ws = Seq(5L, 10L, 15L, 30L).toDF("w")
    val cells = ranked.crossJoin(broadcast(ws))
      .withColumn("blk", expr("(r - 1) div w"))
      .withColumn("i", expr("(r - 1) % w + 1"))
    val wcum = Window.partitionBy("w", "blk").orderBy("r")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = cells.withColumn("cum", sum("y").over(wcum))
    val bs = cells.groupBy("w", "blk")
      .agg(count(lit(1)).as("cntb"), sum("y").as("sblk"),
        sum(col("y").cast(dec) * col("y")).as("ssblk"))
    val drow = cum.join(bs, Seq("w", "blk"))
      .withColumn("dd", col("w") * col("cum") - col("i") * col("sblk"))
    val blk = drow.groupBy("w", "blk", "cntb", "sblk", "ssblk")
      .agg((max("dd") - min("dd")).as("rng"))
      .filter(col("cntb") === col("w"))
    val qv = (col("w").cast(dec) * col("ssblk")
      - col("sblk").cast(dec) * col("sblk")).cast("double")
    val rs = blk.select(col("w"),
      when(qv > 0.0, round(col("rng").cast("double") / sqrt(qv)
        * 1000000.0).cast("long")).otherwise(0L).as("rs_e6"))
    val perw = rs.groupBy("w")
      .agg(count(lit(1)).as("n_blocks"),
        round(sum("rs_e6").cast("double")
          / count(lit(1)).cast("double")).cast("long").as("rs_mean_e6"))
    val pts = perw.filter(col("rs_mean_e6") > 0L)
      .select(
        round(log(col("w").cast("double")) * 1000000000.0)
          .cast("long").as("lw"),
        round(log(col("rs_mean_e6").cast("double") / 1000000.0)
          * 1000000000.0).cast("long").as("lr"))
    val fit = pts.agg(count(lit(1)).as("n"),
      sum("lw").as("sx"), sum("lr").as("sy"),
      sum(col("lw").cast(dec) * col("lr")).as("sxy"),
      sum(col("lw").cast(dec) * col("lw")).as("sxx"))
    val num = (col("n").cast(dec) * col("sxy")
      - col("sx").cast(dec) * col("sy")).cast("double")
    val denx = (col("n").cast(dec) * col("sxx")
      - col("sx").cast(dec) * col("sx")).cast("double")
    val h = fit.select(
      when(denx > 0.0, round(num / denx * 1000000.0).cast("long"))
        .otherwise(0L).as("hurst_e6"))
    perw.crossJoin(broadcast(h))
      .select(col("w"), col("n_blocks"), col("rs_mean_e6"),
        col("hurst_e6"))
      .orderBy("w")
  }

  private val q441Sql =
    s"""WITH day AS (
       |  $dayRevSql),
       |ranked AS (SELECT d, y,
       |  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS r FROM day),
       |ws AS (SELECT CAST(w AS BIGINT) AS w
       |  FROM (VALUES (5), (10), (15), (30)) t(w)),
       |cells AS (SELECT w, (r - 1) // w AS blk, (r - 1) % w + 1 AS i,
       |  y, r FROM ranked CROSS JOIN ws),
       |cum AS (SELECT w, blk, i, y, r,
       |  CAST(sum(y) OVER (PARTITION BY w, blk ORDER BY r
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS cum
       |  FROM cells),
       |bs AS (SELECT w, blk, CAST(count(*) AS BIGINT) AS cntb,
       |  CAST(sum(y) AS BIGINT) AS sblk,
       |  sum(CAST(y AS HUGEINT) * y) AS ssblk
       |  FROM cells GROUP BY 1, 2),
       |drow AS (SELECT c.w, c.blk, b.cntb, b.sblk, b.ssblk,
       |  c.w * c.cum - c.i * b.sblk AS dd
       |  FROM cum c JOIN bs b ON c.w = b.w AND c.blk = b.blk),
       |blk AS (SELECT w, blk, cntb, sblk, ssblk,
       |  max(dd) - min(dd) AS rng
       |  FROM drow GROUP BY 1, 2, 3, 4, 5),
       |rs AS (SELECT w,
       |  CASE WHEN CAST(w * ssblk - CAST(sblk AS HUGEINT) * sblk
       |      AS DOUBLE) > 0.0 THEN
       |    CAST(round(CAST(rng AS DOUBLE)
       |      / sqrt(CAST(w * ssblk - CAST(sblk AS HUGEINT) * sblk
       |        AS DOUBLE)) * 1000000.0) AS BIGINT)
       |    ELSE 0 END AS rs_e6
       |  FROM blk WHERE cntb = w),
       |perw AS (SELECT w, CAST(count(*) AS BIGINT) AS n_blocks,
       |  CAST(round(CAST(sum(rs_e6) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS rs_mean_e6
       |  FROM rs GROUP BY w),
       |pts AS (SELECT
       |  CAST(round(ln(CAST(w AS DOUBLE)) * 1000000000.0) AS BIGINT)
       |    AS lw,
       |  CAST(round(ln(CAST(rs_mean_e6 AS DOUBLE) / 1000000.0)
       |    * 1000000000.0) AS BIGINT) AS lr
       |  FROM perw WHERE rs_mean_e6 > 0),
       |fit AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(lw) AS BIGINT) AS sx, CAST(sum(lr) AS BIGINT) AS sy,
       |  sum(CAST(lw AS HUGEINT) * lr) AS sxy,
       |  sum(CAST(lw AS HUGEINT) * lw) AS sxx FROM pts),
       |h AS (SELECT CASE WHEN CAST(CAST(n AS HUGEINT) * sxx
       |      - CAST(sx AS HUGEINT) * sx AS DOUBLE) > 0.0 THEN
       |    CAST(round(CAST(CAST(n AS HUGEINT) * sxy
       |        - CAST(sx AS HUGEINT) * sy AS DOUBLE)
       |      / CAST(CAST(n AS HUGEINT) * sxx
       |        - CAST(sx AS HUGEINT) * sx AS DOUBLE)
       |      * 1000000.0) AS BIGINT)
       |    ELSE 0 END AS hurst_e6 FROM fit)
       |SELECT w, n_blocks, rs_mean_e6, hurst_e6
       |FROM perw CROSS JOIN h ORDER BY w""".stripMargin

  // ---------------------------------------------------------------------
  // q442 — Holt linear-trend smoothing (double exponential) of daily
  // revenue, α=1/2, β=1/4: the level+trend recurrence l_t =
  // α·y_t + (1−α)(l₋₁+b₋₁), b_t = β(l_t−l₋₁) + (1−β)b₋₁ — a TRUE
  // sequential recurrence (not window-expressible, unlike the gated
  // EWMA whose truncated-horizon form is). Engine side: a
  // single-partition mapPartitions walk over the CALENDAR-BOUNDED
  // day grain (tripwired at 1000 days — the partition holds days,
  // never raw rows; the reduction to the grain is the distributed
  // part). Oracle side: a recursive CTE walking the same ranked
  // days. Both walks round each level/trend update on the integer
  // cents lattice via HALF_UP (Exact.roundHalfUp ≡ Spark round ≡
  // DuckDB round), with the pre-rounding sums formed as exact longs
  // cast ONCE to double — so the two engines take identical steps.
  // Init: l₁=y₁, b₁=y₂−y₁; n<2 emits nothing on both sides.
  // ---------------------------------------------------------------------
  private def q442(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val day = dayRev(s, dir)
    val cnt = day.agg(count(lit(1)).as("n_days"))
    val guarded = day.crossJoin(broadcast(cnt))
      .select(
        when(col("n_days") <= 1000L, col("d"))
          .otherwise(raise_error(concat(
            lit("holtWalk: day grain exceeded 1000 ("),
            col("n_days").cast("string"),
            lit(") — aggregate to a coarser grain or raise the bound " +
              "explicitly.")))).as("d"),
        col("y"))
    guarded.as[(Long, Long)].repartition(1)
      .sortWithinPartitions("d")
      .mapPartitions { it =>
        val a = it.toArray
        if (a.length < 2) Iterator.empty
        else {
          var l = a(0)._2
          var b = a(1)._2 - a(0)._2
          val out = Array.newBuilder[(Long, Long, Long, Long, Long)]
          out += ((a(0)._1, a(0)._2, l, b, 0L))
          var t = 1
          while (t < a.length) {
            val (d, y) = a(t)
            val err = y - (l + b)
            val lNew = Exact.roundHalfUp((y + l + b).toDouble * 0.5)
            val bNew =
              Exact.roundHalfUp((lNew - l + 3L * b).toDouble * 0.25)
            l = lNew; b = bNew
            out += ((d, y, l, b, err))
            t += 1
          }
          out.result().iterator
        }
      }
      .toDF("d", "y", "level", "trend", "err")
      .orderBy("d")
  }

  private val q442Sql =
    s"""WITH RECURSIVE day AS (
       |  $dayRevSql),
       |ranked AS (SELECT d, y,
       |  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS r FROM day),
       |walk(r, d, y, l, b, err) AS (
       |  SELECT r1.r, r1.d, r1.y, r1.y, r2.y - r1.y, CAST(0 AS BIGINT)
       |  FROM ranked r1 JOIN ranked r2 ON r1.r = 1 AND r2.r = 2
       |  UNION ALL
       |  SELECT n.r, n.d, n.y,
       |    CAST(round(CAST(n.y + w.l + w.b AS DOUBLE) * 0.5)
       |      AS BIGINT),
       |    CAST(round(CAST(CAST(round(CAST(n.y + w.l + w.b AS DOUBLE)
       |        * 0.5) AS BIGINT) - w.l + 3 * w.b AS DOUBLE) * 0.25)
       |      AS BIGINT),
       |    n.y - (w.l + w.b)
       |  FROM walk w JOIN ranked n ON n.r = w.r + 1)
       |SELECT d, y, l AS level, b AS trend, err FROM walk
       |ORDER BY d""".stripMargin

  // ---------------------------------------------------------------------
  // q443 — Gumbel (EVT type-I) fit on 5-day block maxima of daily
  // revenue + the 12-block return level: the extreme-value
  // complement of the gated Hill tail index — "how big is the
  // once-a-quarter day". Method-of-moments fit: β = s·√6/π,
  // μ = m̄ − γ·β (Euler–Mascheroni as an explicit shared literal),
  // return level x_T = μ − β·ln(−ln(1−1/T)) at T=12. Block maxima
  // are exact longs off ranked complete blocks; the fit is ONE
  // written-out IEEE chain from (nb, Σm, Σm²) with sample variance
  // cleared as q/(nb·(nb−1)); e2 readouts (cents precision).
  // ---------------------------------------------------------------------
  private def q443(s: SparkSession, dir: String): DataFrame = {
    val ranked = dayRev(s, dir)
      .withColumn("r", row_number().over(axis(col("d"))).cast("long"))
      .withColumn("blk", expr("(r - 1) div 5"))
    val maxima = ranked.groupBy("blk")
      .agg(count(lit(1)).as("cntb"), max("y").as("m"))
      .filter(col("cntb") === 5L)
    val st = maxima.agg(count(lit(1)).as("nb"),
      sum("m").as("sm"),
      sum(col("m").cast(dec) * col("m")).as("smm"))
    // staged exactly like the oracle's d2/d3/d4 CTEs so both engines
    // evaluate the identical chain
    val d2 = st.select(col("nb"), col("sm"),
      (col("nb").cast(dec) * col("smm")
        - col("sm").cast(dec) * col("sm")).cast("double").as("qd"))
    val d3 = d2.select(col("nb"), col("sm"), col("qd"),
      (sqrt(col("qd") / (col("nb").cast("double")
        * (col("nb").cast("double") - 1.0)))
        * sqrt(lit(6.0)) / 3.141592653589793).as("betad"))
    val d4 = d3.select(col("nb"), col("sm"), col("qd"), col("betad"),
      (col("sm").cast("double") / col("nb").cast("double")
        - lit(0.5772156649015329) * col("betad")).as("mud"))
    d4.select(col("nb"), col("sm"),
        when(col("nb") >= 2L && col("qd") > 0.0,
          round(col("mud") * 100.0).cast("long"))
          .otherwise(0L).as("mu_e2"),
        when(col("nb") >= 2L && col("qd") > 0.0,
          round(col("betad") * 100.0).cast("long"))
          .otherwise(0L).as("beta_e2"),
        when(col("nb") >= 2L && col("qd") > 0.0,
          round((col("mud") - col("betad")
            * log(-log(lit(1.0) - lit(1.0) / 12.0))) * 100.0)
            .cast("long"))
          .otherwise(0L).as("rl12_e2"))
      .orderBy("nb")
  }

  private val q443Sql =
    s"""WITH day AS (
       |  $dayRevSql),
       |ranked AS (SELECT d, y,
       |  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS r FROM day),
       |maxima AS (
       |  SELECT (r - 1) // 5 AS blk, CAST(count(*) AS BIGINT) AS cntb,
       |    CAST(max(y) AS BIGINT) AS m
       |  FROM ranked GROUP BY 1),
       |st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS nb,
       |    CAST(sum(m) AS BIGINT) AS sm,
       |    sum(CAST(m AS HUGEINT) * m) AS smm
       |  FROM maxima WHERE cntb = 5),
       |d2 AS (
       |  SELECT nb, sm,
       |    CAST(CAST(nb AS HUGEINT) * smm
       |      - CAST(sm AS HUGEINT) * sm AS DOUBLE) AS qd
       |  FROM st),
       |d3 AS (
       |  SELECT nb, sm, qd,
       |    sqrt(qd / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)))
       |      * sqrt(6.0) / 3.141592653589793 AS betad
       |  FROM d2),
       |d4 AS (
       |  SELECT nb, sm, qd, betad,
       |    CAST(sm AS DOUBLE) / CAST(nb AS DOUBLE)
       |      - 0.5772156649015329 * betad AS mud
       |  FROM d3)
       |SELECT nb, sm,
       |  CASE WHEN nb >= 2 AND qd > 0.0 THEN
       |    CAST(round(mud * 100.0) AS BIGINT) ELSE 0 END AS mu_e2,
       |  CASE WHEN nb >= 2 AND qd > 0.0 THEN
       |    CAST(round(betad * 100.0) AS BIGINT) ELSE 0 END AS beta_e2,
       |  CASE WHEN nb >= 2 AND qd > 0.0 THEN
       |    CAST(round((mud - betad * ln(-ln(1.0 - 1.0 / 12.0)))
       |      * 100.0) AS BIGINT) ELSE 0 END AS rl12_e2
       |FROM d4 ORDER BY nb""".stripMargin

  // ---------------------------------------------------------------------
  // q444 — iterative proportional fitting (raking) of the
  // (source × lang) document-count table onto CHARACTER-mass
  // margins: the classic survey-calibration / corpus-reweighting
  // step — "keep the cell structure, hit the target mix". Cells and
  // targets live on the e9 SHARE lattice (scale-free: shares, never
  // absolute counts, so no overflow at any corpus size); each of the
  // 3 row+column sweeps rescales a cell by target/current-margin in
  // ONE rounded IEEE step, both engines walking identical integers
  // (the q431 lattice discipline; oracle = generated unrolled CTEs).
  // The grid is bounded by the source × lang UNIVERSE. A zero margin
  // carries the cell unchanged (guarded identically on both sides).
  // ---------------------------------------------------------------------
  private val ipfIters = 3

  private def q444(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    // pinned: one documents scan to the (source × lang) grid; the
    // totals, margins and base-weight derivations reuse it
    val cellsRaw = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
      .pin()
    val tot = cellsRaw.agg(sum("n_docs").as("n_tot"),
      sum("chars").as("c_tot"))
    val rowm = cellsRaw.groupBy("source")
      .agg(sum("chars").as("c_src"))
    val colm = cellsRaw.groupBy("lang")
      .agg(sum("chars").as("c_lang"))
    val base = cellsRaw.crossJoin(broadcast(tot))
      .join(broadcast(rowm), "source")
      .join(broadcast(colm), "lang")
      .select(col("source"), col("lang"), col("n_docs"),
        round(col("n_docs").cast("double") / col("n_tot").cast("double")
          * 1000000000.0).cast("long").as("w0"),
        round(col("c_src").cast("double") / col("c_tot").cast("double")
          * 1000000000.0).cast("long").as("rt"),
        round(col("c_lang").cast("double") / col("c_tot").cast("double")
          * 1000000000.0).cast("long").as("ct"))
    // each sweep pins its (≤ source×lang universe)-row result: the
    // row/column margin of sweep k is otherwise recomputed from the
    // whole chained lineage at every later sweep (measured 4.3 s at
    // sf0.1 for a 100-cell grid — pure plan recompute, not data)
    var cur = base.withColumn("w", col("w0")).pin()
    for (_ <- 1 to ipfIters) {
      val rsum = cur.groupBy("source").agg(sum("w").as("rsum"))
      cur = cur.join(broadcast(rsum), "source")
        .withColumn("w",
          when(col("rsum") > 0L,
            round(col("w").cast("double") * col("rt").cast("double")
              / col("rsum").cast("double")).cast("long"))
            .otherwise(col("w")))
        .drop("rsum")
      val csum = cur.groupBy("lang").agg(sum("w").as("csum"))
      cur = cur.join(broadcast(csum), "lang")
        .withColumn("w",
          when(col("csum") > 0L,
            round(col("w").cast("double") * col("ct").cast("double")
              / col("csum").cast("double")).cast("long"))
            .otherwise(col("w")))
        .drop("csum")
        .pin()
    }
    cur.select(col("source"), col("lang"), col("n_docs"),
        col("w0").as("w0_e9"), col("rt").as("rt_e9"),
        col("ct").as("ct_e9"), col("w").as("w_e9"))
      .orderBy("source", "lang")
  }

  private val q444Sql = {
    val steps = (1 to ipfIters).map { k =>
      val p = if (k == 1) "w0" else s"wc${k - 1}"
      s"""rs$k AS (SELECT source, CAST(sum($p) AS BIGINT) AS rsum
         |  FROM iter${k - 1} GROUP BY source),
         |rowstep$k AS (
         |  SELECT i.*, CASE WHEN r.rsum > 0 THEN
         |      CAST(round(CAST(i.$p AS DOUBLE) * CAST(i.rt AS DOUBLE)
         |        / CAST(r.rsum AS DOUBLE)) AS BIGINT)
         |    ELSE i.$p END AS wr$k
         |  FROM iter${k - 1} i JOIN rs$k r ON i.source = r.source),
         |cs$k AS (SELECT lang, CAST(sum(wr$k) AS BIGINT) AS csum
         |  FROM rowstep$k GROUP BY lang),
         |iter$k AS (
         |  SELECT i.*, CASE WHEN c.csum > 0 THEN
         |      CAST(round(CAST(i.wr$k AS DOUBLE) * CAST(i.ct AS DOUBLE)
         |        / CAST(c.csum AS DOUBLE)) AS BIGINT)
         |    ELSE i.wr$k END AS wc$k
         |  FROM rowstep$k i JOIN cs$k c ON i.lang = c.lang)""".stripMargin
    }.mkString(",\n")
    s"""WITH cells AS (
       |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS chars
       |  FROM documents GROUP BY 1, 2),
       |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_tot,
       |  CAST(sum(chars) AS BIGINT) AS c_tot FROM cells),
       |rowm AS (SELECT source, CAST(sum(chars) AS BIGINT) AS c_src
       |  FROM cells GROUP BY source),
       |colm AS (SELECT lang, CAST(sum(chars) AS BIGINT) AS c_lang
       |  FROM cells GROUP BY lang),
       |iter0 AS (
       |  SELECT c.source, c.lang, c.n_docs,
       |    CAST(round(CAST(c.n_docs AS DOUBLE) / CAST(n_tot AS DOUBLE)
       |      * 1000000000.0) AS BIGINT) AS w0,
       |    CAST(round(CAST(r.c_src AS DOUBLE) / CAST(c_tot AS DOUBLE)
       |      * 1000000000.0) AS BIGINT) AS rt,
       |    CAST(round(CAST(l.c_lang AS DOUBLE) / CAST(c_tot AS DOUBLE)
       |      * 1000000000.0) AS BIGINT) AS ct
       |  FROM cells c CROSS JOIN tot
       |    JOIN rowm r ON c.source = r.source
       |    JOIN colm l ON c.lang = l.lang),
       |$steps
       |SELECT source, lang, n_docs, w0 AS w0_e9, rt AS rt_e9,
       |  ct AS ct_e9, wc$ipfIters AS w_e9
       |FROM iter$ipfIters ORDER BY source, lang""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q445 — EXACT Shapley-value channel attribution: the
  // coalition-game complement of the gated Markov removal-effect
  // (q284). Channels are the 4 non-purchase event types; a user's
  // coalition is the bitmask of channels they touched; the
  // characteristic function v(S) = converting users whose channel
  // set ⊆ S. With 4 channels the 2⁴ subset lattice is ENUMERATED
  // (both engines carry it as a 16-row literal with popcount and
  // weight precomputed at generation time), and 24·φ_i =
  // Σ_{S∌i} s!(3−s)!·(v(S∪i)−v(S)) is an EXACT INTEGER — the 4!
  // denominator cleared, no IEEE until the one share readout.
  // Scale: users reduce to ≤16 mask rows in one scan; everything
  // after is 16×16 literal joins.
  // ---------------------------------------------------------------------
  private val shapChannels: Seq[(String, Long)] =
    Seq("click" -> 1L, "error" -> 2L, "signup" -> 4L, "view" -> 8L)

  private def fact(n: Long): Long = (1L to n).product max 1L

  /** (smask, wgt = s!·(3−s)!) for every subset of the 4-channel
    * universe; the full set's weight is irrelevant (it contains
    * every channel) and set to 0. */
  private val shapSubsets: Seq[(Long, Long)] =
    (0 until 16).map { s =>
      val pc = java.lang.Integer.bitCount(s).toLong
      (s.toLong, if (pc >= 4) 0L else fact(pc) * fact(3L - pc))
    }

  private def q445(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ut = Tables.eventsSec(s, dir)
      .select(col("user_id").as("u"), col("event_type").as("t"))
      .distinct()
    val bitOf = shapChannels.foldLeft(lit(0L)) { case (acc, (n, b)) =>
      acc + when(col("t") === n, lit(b)).otherwise(0L)
    }
    val users = ut.groupBy("u").agg(
      sum(bitOf).as("mask"),
      max((col("t") === "purchase").cast("long")).as("conv"))
    // pinned: ONE events scan reduces all users to the ≤16 mask
    // rows; the three v(S) derivations read the materialization
    val msk = users.filter(col("conv") === 1L)
      .groupBy("mask").agg(count(lit(1)).as("cnt")).pin()
    val subsets = shapSubsets.toDF("smask", "wgt")
    val vS = subsets.join(broadcast(msk),
        col("mask").bitwiseAND(lit(15L) - col("smask")) === 0L, "left")
      .groupBy("smask", "wgt")
      .agg(coalesce(sum("cnt"), lit(0L)).as("v"))
    val vFull = vS.filter(col("smask") === 15L)
      .select(col("v").as("v_full"))
    val channels = shapChannels.toDF("channel", "bit")
    val contrib = channels
      .join(broadcast(vS.select(col("smask"), col("wgt"),
        col("v").as("v0"))),
        col("smask").bitwiseAND(col("bit")) === 0L)
      .join(broadcast(vS.select(col("smask").as("smask1"),
        col("v").as("v1"))),
        col("smask1") === col("smask") + col("bit"))
      .groupBy("channel", "bit")
      .agg(sum(col("wgt") * (col("v1") - col("v0"))).as("phi24"))
    contrib.crossJoin(broadcast(vFull))
      .select(col("channel"), col("bit"), col("phi24"), col("v_full"),
        when(col("v_full") > 0L,
          round(col("phi24").cast("double")
            / (lit(24.0) * col("v_full").cast("double")) * 1000000.0)
            .cast("long")).otherwise(0L).as("share_e6"))
      .orderBy("channel")
  }

  private val q445Sql = {
    val subsetVals = shapSubsets
      .map { case (m, w) => s"($m, $w)" }.mkString(", ")
    val chanVals = shapChannels
      .map { case (n, b) => s"('$n', $b)" }.mkString(", ")
    val maskExpr = shapChannels
      .map { case (n, b) => s"CASE WHEN t = '$n' THEN $b ELSE 0 END" }
      .mkString(" + ")
    s"""WITH ut AS (
       |  SELECT DISTINCT user_id AS u, event_type AS t FROM events),
       |users AS (
       |  SELECT u, CAST(sum($maskExpr) AS BIGINT) AS mask,
       |    max(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END) AS conv
       |  FROM ut GROUP BY u),
       |msk AS (SELECT mask, CAST(count(*) AS BIGINT) AS cnt
       |  FROM users WHERE conv = 1 GROUP BY mask),
       |subsets AS (SELECT CAST(smask AS BIGINT) AS smask,
       |  CAST(wgt AS BIGINT) AS wgt
       |  FROM (VALUES $subsetVals) t(smask, wgt)),
       |vs AS (
       |  SELECT smask, wgt,
       |    CAST(coalesce(sum(cnt), 0) AS BIGINT) AS v
       |  FROM subsets LEFT JOIN msk
       |    ON (mask & (15 - smask)) = 0
       |  GROUP BY smask, wgt),
       |vfull AS (SELECT v AS v_full FROM vs WHERE smask = 15),
       |channels AS (SELECT channel, CAST(bit AS BIGINT) AS bit
       |  FROM (VALUES $chanVals) t(channel, bit)),
       |contrib AS (
       |  SELECT channel, bit,
       |    CAST(sum(v0.wgt * (v1.v - v0.v)) AS BIGINT) AS phi24
       |  FROM channels
       |    JOIN vs v0 ON (v0.smask & bit) = 0
       |    JOIN vs v1 ON v1.smask = v0.smask + bit
       |  GROUP BY channel, bit)
       |SELECT channel, bit, phi24, v_full,
       |  CASE WHEN v_full > 0 THEN
       |    CAST(round(CAST(phi24 AS DOUBLE)
       |      / (24.0 * CAST(v_full AS DOUBLE)) * 1000000.0) AS BIGINT)
       |    ELSE 0 END AS share_e6
       |FROM contrib CROSS JOIN vfull
       |ORDER BY channel""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q446 — Cochran–Mantel–Haenszel stratified 2×2 test + the MH
  // pooled odds ratio: "is urgent priority associated with final
  // status, CONTROLLING for region" — the confounder-adjusted
  // complement of the gated χ² (q383). Per-stratum cells (a,b,c,d)
  // are exact longs off one star join; the expected count and
  // hypergeometric variance are e9-rounded AT THE STRATUM ROW (the
  // per-row-division discipline), so the pooled sums are exact
  // integer reductions; the CMH statistic and OR_MH are one readout
  // chain each. Strata are bounded by the REGION universe.
  // ---------------------------------------------------------------------
  private def q446(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val cu = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val na = Tables.load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
    val re = Tables.load(s, dir, "region")
      .select(col("r_regionkey"), col("r_name"))
    val cells = o
      .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
      .join(broadcast(na), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(re), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"),
        (col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .cast("long").as("e"),
        (col("o_orderstatus") === "F").cast("long").as("f"))
      .groupBy("r_name")
      .agg(sum(col("e") * col("f")).as("a"),
        sum(col("e") * (lit(1L) - col("f"))).as("b"),
        sum((lit(1L) - col("e")) * col("f")).as("c"),
        sum((lit(1L) - col("e")) * (lit(1L) - col("f"))).as("d"))
    val terms = cells
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .withColumn("e_e9",
        round((col("a") + col("b")).cast("double")
          * (col("a") + col("c")).cast("double")
          / col("n").cast("double") * 1000000000.0).cast("long"))
      .withColumn("v_e9",
        round((col("a") + col("b")).cast("double")
          * (col("c") + col("d")).cast("double")
          * (col("a") + col("c")).cast("double")
          * (col("b") + col("d")).cast("double")
          / (col("n").cast("double") * col("n").cast("double")
            * (col("n").cast("double") - 1.0))
          * 1000000000.0).cast("long"))
      .withColumn("ad_e9",
        round(col("a").cast("double") * col("d").cast("double")
          / col("n").cast("double") * 1000000000.0).cast("long"))
      .withColumn("bc_e9",
        round(col("b").cast("double") * col("c").cast("double")
          / col("n").cast("double") * 1000000000.0).cast("long"))
      .withColumn("dev_e9", col("a") * 1000000000L - col("e_e9"))
      // pinned: the star join runs ONCE for the ≤|regions| stratum
      // rows; the pooled readout reuses the materialization
      .pin()
    val pooled = terms.agg(
        sum(col("dev_e9").cast(dec)).as("sd"),
        sum(col("v_e9").cast(dec)).as("sv"),
        sum(col("ad_e9").cast(dec)).as("sad"),
        sum(col("bc_e9").cast(dec)).as("sbc"))
      .select(
        when(col("sv").cast("double") > 0.0,
          round(col("sd").cast("double") * col("sd").cast("double")
            / col("sv").cast("double") / 1000.0).cast("long"))
          .otherwise(0L).as("cmh_e6"),
        when(col("sbc").cast("double") > 0.0,
          round(col("sad").cast("double") / col("sbc").cast("double")
            * 1000000.0).cast("long"))
          .otherwise(0L).as("or_mh_e6"))
    terms.select(col("r_name"), col("a"), col("b"), col("c"),
        col("d"), col("e_e9"), col("v_e9"))
      .crossJoin(broadcast(pooled))
      .orderBy("r_name")
  }

  private val q446Sql =
    """WITH cells AS (
      |  SELECT r_name,
      |    CAST(sum(e * f) AS BIGINT) AS a,
      |    CAST(sum(e * (1 - f)) AS BIGINT) AS b,
      |    CAST(sum((1 - e) * f) AS BIGINT) AS c,
      |    CAST(sum((1 - e) * (1 - f)) AS BIGINT) AS d
      |  FROM (
      |    SELECT r_name,
      |      CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |        THEN 1 ELSE 0 END AS e,
      |      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS f
      |    FROM orders
      |      JOIN customer ON o_custkey = c_custkey
      |      JOIN nation ON c_nationkey = n_nationkey
      |      JOIN region ON n_regionkey = r_regionkey) t
      |  GROUP BY r_name),
      |terms AS (
      |  SELECT r_name, a, b, c, d, a + b + c + d AS n,
      |    CAST(round(CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
      |      / CAST(a + b + c + d AS DOUBLE) * 1000000000.0)
      |      AS BIGINT) AS e_e9,
      |    CAST(round(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
      |      * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)
      |      / (CAST(a + b + c + d AS DOUBLE)
      |        * CAST(a + b + c + d AS DOUBLE)
      |        * (CAST(a + b + c + d AS DOUBLE) - 1.0))
      |      * 1000000000.0) AS BIGINT) AS v_e9,
      |    CAST(round(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
      |      / CAST(a + b + c + d AS DOUBLE) * 1000000000.0)
      |      AS BIGINT) AS ad_e9,
      |    CAST(round(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
      |      / CAST(a + b + c + d AS DOUBLE) * 1000000000.0)
      |      AS BIGINT) AS bc_e9
      |  FROM cells),
      |pooled AS (
      |  SELECT
      |    CASE WHEN CAST(sum(CAST(v_e9 AS HUGEINT)) AS DOUBLE) > 0.0
      |      THEN CAST(round(
      |        CAST(sum(CAST(a * 1000000000 - e_e9 AS HUGEINT))
      |          AS DOUBLE)
      |        * CAST(sum(CAST(a * 1000000000 - e_e9 AS HUGEINT))
      |          AS DOUBLE)
      |        / CAST(sum(CAST(v_e9 AS HUGEINT)) AS DOUBLE)
      |        / 1000.0) AS BIGINT)
      |      ELSE 0 END AS cmh_e6,
      |    CASE WHEN CAST(sum(CAST(bc_e9 AS HUGEINT)) AS DOUBLE) > 0.0
      |      THEN CAST(round(
      |        CAST(sum(CAST(ad_e9 AS HUGEINT)) AS DOUBLE)
      |        / CAST(sum(CAST(bc_e9 AS HUGEINT)) AS DOUBLE)
      |        * 1000000.0) AS BIGINT)
      |      ELSE 0 END AS or_mh_e6
      |  FROM terms)
      |SELECT r_name, a, b, c, d, e_e9, v_e9, cmh_e6, or_mh_e6
      |FROM terms CROSS JOIN pooled
      |ORDER BY r_name""".stripMargin

  /** q378's three deterministic document raters at the (doc, score,
    * count) grain — shared input for the reliability pair q447/q448
    * (spec-parity with Integrity.q378's construction). */
  private def raterGrain(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        explode(array(
          least(expr("n_chars div 150"), lit(5L)),
          least((size(graft.functions.Text.words(col("text"))) / 30)
            .cast("long"), lit(5L)),
          least(expr(
            "(length(text) - length(replace(text, '.'))) div 2"),
            lit(5L)))).as("cat"))
      .groupBy(col("doc_id"), col("cat"))
      .agg(count(lit(1)).as("c"))
      // pinned: one corpus scan materializes the (doc, class) grain;
      // the per-statistic aggregations (item-side and class-side
      // marginals) read it instead of re-scanning documents — the
      // Graph-ops edge-materialization posture
      .pin()

  private val raterGrainSql =
    """SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS c
      |  FROM (
      |    SELECT doc_id, unnest([
      |      least(n_chars // 150, 5),
      |      least(len(list_filter(string_split(text, ' '),
      |        w -> length(w) > 0)) // 30, 5),
      |      least((length(text) - length(replace(text, '.', '')))
      |        // 2, 5)
      |    ]) AS cat
      |    FROM documents) r
      |  GROUP BY doc_id, cat""".stripMargin

  // ---------------------------------------------------------------------
  // q447 — ICC(1): one-way random-effects intraclass correlation of
  // the three deterministic rater SCORES per document — "how much of
  // rating variance is the document, not the rater", the continuous
  // reliability readout Fleiss' κ (q378, same raters) cannot give.
  // From four exact sufficient statistics (N docs, T = Σx,
  // A = Σx², B = Σ(per-doc sum)²): MSB = (N·B − T²)/(3N(N−1)),
  // MSW = (3A − B)/(6N), ICC = (MSB−MSW)/(MSB+2·MSW) — a staged
  // IEEE chain written identically on both engines. One scan to the
  // (doc, score) grain.
  // ---------------------------------------------------------------------
  private def q447(s: SparkSession, dir: String): DataFrame = {
    val nij = raterGrain(s, dir)
    val perDoc = nij.groupBy("doc_id")
      .agg(sum(col("cat") * col("c")).as("si"))
    val base = nij.agg(
      sum(col("cat") * col("c")).as("t"),
      sum(col("cat").cast(dec) * col("cat") * col("c")).as("a2"))
    val bsum = perDoc.agg(count(lit(1)).as("n_items"),
      sum(col("si").cast(dec) * col("si")).as("b2"))
    val d2 = base.crossJoin(broadcast(bsum))
      .select(col("n_items"), col("t"),
        (col("n_items").cast(dec) * col("b2")
          - col("t").cast(dec) * col("t")).cast("double").as("ssbn"),
        (lit(3L).cast(dec) * col("a2") - col("b2")).cast("double")
          .as("sswn"))
    val d3 = d2.select(col("n_items"), col("t"),
      (col("ssbn") / (lit(3.0) * col("n_items").cast("double")
        * (col("n_items").cast("double") - 1.0))).as("msb"),
      (col("sswn") / (lit(6.0) * col("n_items").cast("double"))).as("msw"))
    d3.select(col("n_items"), col("t"),
        round(col("msb") * 1000.0).cast("long").as("msb_e3"),
        round(col("msw") * 1000.0).cast("long").as("msw_e3"),
        when(col("n_items") >= 2L
          && col("msb") + lit(2.0) * col("msw") > 0.0,
          round((col("msb") - col("msw"))
            / (col("msb") + lit(2.0) * col("msw")) * 1000000.0)
            .cast("long")).otherwise(0L).as("icc_e6"))
      .orderBy("n_items")
  }

  private val q447Sql =
    s"""WITH nij AS (
       |  $raterGrainSql),
       |perdoc AS (SELECT doc_id, CAST(sum(cat * c) AS BIGINT) AS si
       |  FROM nij GROUP BY doc_id),
       |base AS (SELECT CAST(sum(cat * c) AS BIGINT) AS t,
       |  sum(CAST(cat AS HUGEINT) * cat * c) AS a2 FROM nij),
       |bsum AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
       |  sum(CAST(si AS HUGEINT) * si) AS b2 FROM perdoc),
       |d2 AS (
       |  SELECT n_items, t,
       |    CAST(CAST(n_items AS HUGEINT) * b2
       |      - CAST(t AS HUGEINT) * t AS DOUBLE) AS ssbn,
       |    CAST(3 * a2 - b2 AS DOUBLE) AS sswn
       |  FROM base CROSS JOIN bsum),
       |d3 AS (
       |  SELECT n_items, t,
       |    ssbn / (3.0 * CAST(n_items AS DOUBLE)
       |      * (CAST(n_items AS DOUBLE) - 1.0)) AS msb,
       |    sswn / (6.0 * CAST(n_items AS DOUBLE)) AS msw
       |  FROM d2)
       |SELECT n_items, t,
       |  CAST(round(msb * 1000.0) AS BIGINT) AS msb_e3,
       |  CAST(round(msw * 1000.0) AS BIGINT) AS msw_e3,
       |  CASE WHEN n_items >= 2 AND msb + 2.0 * msw > 0.0 THEN
       |    CAST(round((msb - msw) / (msb + 2.0 * msw) * 1000000.0)
       |      AS BIGINT)
       |    ELSE 0 END AS icc_e6
       |FROM d3 ORDER BY n_items""".stripMargin

  // ---------------------------------------------------------------------
  // q448 — Krippendorff's α (nominal) over the same three raters:
  // the agreement coefficient that, unlike κ, generalizes to any
  // number of raters/missing data and is THE reliability standard in
  // content-analysis/annotation pipelines. With constant m=3 the
  // whole statistic collapses to integers: observed disagreement
  // W = ΣΣ n_ic(3−n_ic) (exact long), expected disagreement mass
  // E = Σ_c n_c(n−n_c) (decimal), and α = 1 − W(n−1)/(2E) — the two
  // normalizations cleared into ONE readout chain. One scan to the
  // (doc, category) grain, marginals bounded by the 6-class universe.
  // ---------------------------------------------------------------------
  private def q448(s: SparkSession, dir: String): DataFrame = {
    val nij = raterGrain(s, dir)
    val base = nij.agg(
      countDistinct(col("doc_id")).as("n_items"),
      sum(col("c") * (lit(3L) - col("c"))).as("w_dis"))
    val marg = nij.groupBy("cat").agg(sum("c").as("nc"))
    val em = base.crossJoin(broadcast(
      marg.crossJoin(broadcast(base.select(
          (col("n_items") * 3L).as("n_tot"))))
        .agg(sum(col("nc").cast(dec) * (col("n_tot") - col("nc")))
          .as("e_mass"))))
    em.select(col("n_items"), (col("n_items") * 3L).as("n_ratings"),
        col("w_dis"),
        when(col("e_mass").cast("double") > 0.0,
          round((lit(1.0) - col("w_dis").cast("double")
            * (col("n_items").cast("double") * 3.0 - 1.0)
            / (lit(2.0) * col("e_mass").cast("double"))) * 1000000.0)
            .cast("long")).otherwise(0L).as("alpha_e6"))
      .orderBy("n_items")
  }

  private val q448Sql =
    s"""WITH nij AS (
       |  $raterGrainSql),
       |base AS (SELECT count(DISTINCT doc_id) AS n_items,
       |  CAST(sum(c * (3 - c)) AS BIGINT) AS w_dis FROM nij),
       |marg AS (SELECT cat, CAST(sum(c) AS BIGINT) AS nc
       |  FROM nij GROUP BY cat),
       |em AS (
       |  SELECT sum(CAST(nc AS HUGEINT)
       |    * ((SELECT n_items * 3 FROM base) - nc)) AS e_mass
       |  FROM marg)
       |SELECT CAST(n_items AS BIGINT) AS n_items,
       |  CAST(n_items * 3 AS BIGINT) AS n_ratings, w_dis,
       |  CASE WHEN CAST(e_mass AS DOUBLE) > 0.0 THEN
       |    CAST(round((1.0 - CAST(w_dis AS DOUBLE)
       |      * (CAST(n_items AS DOUBLE) * 3.0 - 1.0)
       |      / (2.0 * CAST(e_mass AS DOUBLE))) * 1000000.0) AS BIGINT)
       |    ELSE 0 END AS alpha_e6
       |FROM base CROSS JOIN em
       |ORDER BY n_items""".stripMargin

  // ---------------------------------------------------------------------
  // q449 — OLS regression diagnostics on the daily-revenue-vs-day
  // fit: Durbin–Watson serial correlation and the Koenker
  // (studentized Breusch–Pagan) heteroscedasticity screen — the two
  // checks that decide whether q435/q439's fits can be trusted.
  // The residual is computed as an EXACT decimal cross form
  // R_t = y_t·n·denx − n·num·x_t − sy·denx + num·sx (= e_t·n·denx),
  // e4-rounded to the lattice AT THE ROW (one IEEE division each);
  // DW then reads Σ(Δe)²/Σe² off exact decimal sums of the lattice
  // values, and the BP auxiliary regression of e² on x runs the
  // q435 sufficient-statistic chain with e² formed in decimal.
  // Day-grain, tripwire inherited from the 1000-day bound.
  // ---------------------------------------------------------------------
  private def q449(s: SparkSession, dir: String): DataFrame = {
    val day = dayRev(s, dir)
    val st = day.agg(count(lit(1)).as("n"),
      sum("d").as("sx"), sum("y").as("sy"),
      sum(col("d").cast(dec) * col("y")).as("sxy"),
      sum(col("d").cast(dec) * col("d")).as("sxx"))
    val fit = st.select(col("n"), col("sx"), col("sy"),
      (col("n").cast(dec) * col("sxy")
        - col("sx").cast(dec) * col("sy")).as("num"),
      (col("n").cast(dec) * col("sxx")
        - col("sx").cast(dec) * col("sx")).as("denx"))
    val resid = day.crossJoin(broadcast(fit))
      .select(col("d"), col("n"),
        round((col("y").cast(dec) * col("n") * col("denx")
          - col("n").cast(dec) * col("num") * col("d")
          - col("sy").cast(dec) * col("denx")
          + col("num").cast(dec) * col("sx")).cast("double")
          / (col("n").cast(dec) * col("denx")).cast("double")
          * 10000.0).cast("long").as("e_e4"))
    val lagd = resid
      .withColumn("pe", lag(col("e_e4"), 1).over(axis(col("d"))))
    val dw = lagd.groupBy("n").agg(
      sum(col("e_e4").cast(dec) * col("e_e4")).as("se2"),
      sum(when(col("pe").isNotNull,
        (col("e_e4") - col("pe")).cast(dec)
          * (col("e_e4") - col("pe"))).otherwise(lit(0L).cast(dec)))
        .as("sd2"))
    // BP auxiliary: regress u on the day index, where u is the
    // e9 SHARE of the residual energy e²/Σe² (R² is invariant to
    // affine rescaling of the response, and the share keeps every
    // cross product inside decimal(38,0) AT ANY DATA SCALE — raw e⁴
    // powers overflow at sf1)
    val aux = resid.crossJoin(broadcast(dw.select(col("se2"))))
      .select(col("d"),
        when(col("se2").cast("double") > 0.0,
          round(col("e_e4").cast(dec).multiply(col("e_e4"))
            .cast("double") / col("se2").cast("double")
            * 1000000000.0).cast("long")).otherwise(0L).as("u"))
    val ast = aux.agg(count(lit(1)).as("n"),
      sum("d").as("ax"), sum("u").as("au"),
      sum(col("d").cast(dec) * col("u")).as("axu"),
      sum(col("d").cast(dec) * col("d")).as("axx"),
      sum(col("u").cast(dec) * col("u")).as("auu"))
    val anum = (col("n").cast(dec) * col("axu")
      - col("ax").cast(dec) * col("au")).cast("double")
    val adenx = (col("n").cast(dec) * col("axx")
      - col("ax").cast(dec) * col("ax")).cast("double")
    val adeny = (col("n").cast(dec) * col("auu")
      - col("au").cast(dec) * col("au")).cast("double")
    val bp = ast.select(col("n").as("n2"),
      when(adenx > 0.0 && adeny > 0.0,
        round(col("n").cast("double") * (anum * anum)
          / (adenx * adeny) * 1000000.0).cast("long"))
        .otherwise(0L).as("bp_e6"))
    dw.crossJoin(broadcast(bp))
      .select(col("n").as("n_days"),
        when(col("se2").cast("double") > 0.0,
          round(col("sd2").cast("double") / col("se2").cast("double")
            * 1000000.0).cast("long")).otherwise(0L).as("dw_e6"),
        col("bp_e6"))
      .orderBy("n_days")
  }

  private val q449Sql =
    s"""WITH day AS (
       |  $dayRevSql),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(d) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |  sum(CAST(d AS HUGEINT) * y) AS sxy,
       |  sum(CAST(d AS HUGEINT) * d) AS sxx FROM day),
       |fit AS (SELECT n, sx, sy,
       |  CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
       |  CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS denx
       |  FROM st),
       |resid AS (
       |  SELECT d, n,
       |    CAST(round(CAST(CAST(y AS HUGEINT) * n * denx
       |        - CAST(n AS HUGEINT) * num * d
       |        - CAST(sy AS HUGEINT) * denx
       |        + CAST(num AS HUGEINT) * sx AS DOUBLE)
       |      / CAST(CAST(n AS HUGEINT) * denx AS DOUBLE)
       |      * 10000.0) AS BIGINT) AS e_e4
       |  FROM day CROSS JOIN fit),
       |lagd AS (
       |  SELECT n, e_e4,
       |    lag(e_e4) OVER (ORDER BY d) AS pe
       |  FROM resid),
       |dw AS (
       |  SELECT n,
       |    sum(CAST(e_e4 AS HUGEINT) * e_e4) AS se2,
       |    sum(CASE WHEN pe IS NOT NULL THEN
       |      CAST(e_e4 - pe AS HUGEINT) * (e_e4 - pe)
       |      ELSE 0 END) AS sd2
       |  FROM lagd GROUP BY n),
       |aux AS (
       |  SELECT r.d,
       |    CASE WHEN CAST(se2 AS DOUBLE) > 0.0 THEN
       |      CAST(round(CAST(CAST(r.e_e4 AS HUGEINT) * r.e_e4
       |          AS DOUBLE) / CAST(se2 AS DOUBLE)
       |        * 1000000000.0) AS BIGINT)
       |      ELSE 0 END AS u
       |  FROM resid r CROSS JOIN dw),
       |ast AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(d) AS BIGINT) AS ax, CAST(sum(u) AS BIGINT) AS au,
       |  sum(CAST(d AS HUGEINT) * u) AS axu,
       |  sum(CAST(d AS HUGEINT) * d) AS axx,
       |  sum(CAST(u AS HUGEINT) * u) AS auu FROM aux),
       |bp AS (
       |  SELECT n AS n2,
       |    CASE WHEN CAST(CAST(n AS HUGEINT) * axx
       |        - CAST(ax AS HUGEINT) * ax AS DOUBLE) > 0.0
       |      AND CAST(CAST(n AS HUGEINT) * auu - CAST(au AS HUGEINT) * au AS DOUBLE)
       |        > 0.0 THEN
       |      CAST(round(CAST(n AS DOUBLE)
       |        * (CAST(CAST(n AS HUGEINT) * axu
       |            - CAST(ax AS HUGEINT) * au AS DOUBLE)
       |          * CAST(CAST(n AS HUGEINT) * axu
       |            - CAST(ax AS HUGEINT) * au AS DOUBLE))
       |        / (CAST(CAST(n AS HUGEINT) * axx
       |            - CAST(ax AS HUGEINT) * ax AS DOUBLE)
       |          * CAST(CAST(n AS HUGEINT) * auu - CAST(au AS HUGEINT) * au AS DOUBLE))
       |        * 1000000.0) AS BIGINT)
       |      ELSE 0 END AS bp_e6
       |  FROM ast)
       |SELECT n AS n_days,
       |  CASE WHEN CAST(se2 AS DOUBLE) > 0.0 THEN
       |    CAST(round(CAST(sd2 AS DOUBLE) / CAST(se2 AS DOUBLE)
       |      * 1000000.0) AS BIGINT)
       |    ELSE 0 END AS dw_e6,
       |  bp_e6
       |FROM dw CROSS JOIN bp
       |ORDER BY n_days""".stripMargin

  // ---------------------------------------------------------------------
  // q450 — Kendall's τ-b between daily click count and daily
  // purchase revenue: the tie-corrected concordance coefficient —
  // the ordinal complement of q440's Pearson profile and q146's
  // Spearman. All four pair classes (concordant, discordant, x-tie,
  // y-tie) are EXACT integer counts off the calendar-bounded
  // day-pair table; τ-b = (C−D)/√((n₀−n₁)(n₀−n₂)) is one sqrt
  // readout. Day grain, 1000-day tripwire.
  // ---------------------------------------------------------------------
  private def q450(s: SparkSession, dir: String): DataFrame = {
    val dayx = Tables.eventsSec(s, dir)
      .filter(col("event_type") === "click")
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(count(lit(1)).as("x"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long")
        .as("d"), col("x"))
    val joined = dayx.join(broadcast(
      dayRev(s, dir).select(col("d"), col("y"))), "d")
    val cnt = joined.agg(count(lit(1)).as("n_days"))
    val a = joined.select(col("d").as("da"), col("x").as("xa"),
      col("y").as("ya"))
    val b = joined.select(col("d").as("db"), col("x").as("xb"),
      col("y").as("yb"))
    val pairs = a.crossJoin(broadcast(b)).crossJoin(broadcast(cnt))
      .filter(col("da") < col("db"))
      .select(col("n_days"),
        when(col("n_days") <= 1000L,
          signum(((col("xb") - col("xa"))
            * (col("yb") - col("ya"))).cast("double")).cast("long"))
          .otherwise(raise_error(concat(
            lit("kendallTau: day grain exceeded 1000 ("),
            col("n_days").cast("string"),
            lit(") — aggregate to a coarser grain or raise the bound " +
              "explicitly.")))).as("s"),
        (col("xa") === col("xb")).cast("long").as("tx"),
        (col("ya") === col("yb")).cast("long").as("ty"))
    pairs.groupBy("n_days").agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("s") === 1L, 1L).otherwise(0L)).as("c_pairs"),
        sum(when(col("s") === -1L, 1L).otherwise(0L)).as("d_pairs"),
        sum("tx").as("tx_pairs"), sum("ty").as("ty_pairs"))
      .select(col("n_days"), col("n_pairs"), col("c_pairs"),
        col("d_pairs"), col("tx_pairs"), col("ty_pairs"),
        when((col("n_pairs") - col("tx_pairs")) > 0L
          && (col("n_pairs") - col("ty_pairs")) > 0L,
          round((col("c_pairs") - col("d_pairs")).cast("double")
            / sqrt((col("n_pairs") - col("tx_pairs")).cast("double")
              * (col("n_pairs") - col("ty_pairs")).cast("double"))
            * 1000000.0).cast("long")).otherwise(0L).as("tau_b_e6"))
      .orderBy("n_days")
  }

  private val q450Sql =
    s"""WITH dayx AS (
       |  SELECT CAST(CAST(date_trunc('second', ts) AS DATE)
       |      - DATE '1970-01-01' AS BIGINT) AS d,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events WHERE event_type = 'click'
       |  GROUP BY 1),
       |dayy AS (
       |  $dayRevSql),
       |joined AS (SELECT dayx.d, x, y FROM dayx
       |  JOIN dayy ON dayx.d = dayy.d),
       |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM joined),
       |pairs AS (
       |  SELECT n_days,
       |    CAST(sign(CAST((b.x - a.x) * (b.y - a.y) AS DOUBLE))
       |      AS BIGINT) AS s,
       |    CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
       |    CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
       |  FROM joined a JOIN joined b ON a.d < b.d CROSS JOIN cnt)
       |SELECT n_days, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS c_pairs,
       |  CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS d_pairs,
       |  CAST(sum(tx) AS BIGINT) AS tx_pairs,
       |  CAST(sum(ty) AS BIGINT) AS ty_pairs,
       |  CASE WHEN count(*) - sum(tx) > 0 AND count(*) - sum(ty) > 0
       |    THEN CAST(round(
       |      CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)
       |        - sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS DOUBLE)
       |      / sqrt(CAST(count(*) - sum(tx) AS DOUBLE)
       |        * CAST(count(*) - sum(ty) AS DOUBLE))
       |      * 1000000.0) AS BIGINT)
       |    ELSE 0 END AS tau_b_e6
       |FROM pairs GROUP BY n_days ORDER BY n_days""".stripMargin

  // ---------------------------------------------------------------------
  // q451 — Cronbach's α over the three deterministic raters (WITH
  // rater identity, unlike q447's one-way ICC): the internal-
  // consistency readout every multi-judge eval pipeline quotes.
  // α = k/(k−1)·(1 − Σᵢσᵢ²/σ_T²) with per-rater and total-score
  // SAMPLE variances from exact sufficient statistics — per-rater
  // cross products in decimal, the variance ratio ONE staged IEEE
  // chain. One documents scan (the three scores explode from a
  // single projection); the rater axis is a 3-row universe.
  // ---------------------------------------------------------------------
  private def q451(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        least(expr("n_chars div 150"), lit(5L)).as("x1"),
        least((size(graft.functions.Text.words(col("text"))) / 30)
          .cast("long"), lit(5L)).as("x2"),
        least(expr(
          "(length(text) - length(replace(text, '.'))) div 2"),
          lit(5L)).as("x3"))
    val long = docs.select(col("doc_id"),
      explode(array(
        struct(lit(1L).as("rater"), col("x1").as("x")),
        struct(lit(2L).as("rater"), col("x2").as("x")),
        struct(lit(3L).as("rater"), col("x3").as("x")))).as("rx"))
      .select(col("doc_id"), col("rx.rater").as("rater"),
        col("rx.x").as("x"))
      // pinned: one documents scan; rater-side and item-side
      // variance aggregations read the materialized long form
      .pin()
    val perRater = long.groupBy("rater").agg(
      count(lit(1)).as("nr"), sum("x").as("srx"),
      sum(col("x").cast(dec) * col("x")).as("srxx"))
    val raterVar = perRater.agg(
      max("nr").as("n_items"),
      sum((col("nr").cast(dec) * col("srxx")
        - col("srx").cast(dec) * col("srx")).cast("double")
        / (col("nr").cast("double")
          * (col("nr").cast("double") - 1.0))).as("svi"))
    val totals = long.groupBy("doc_id")
      .agg(sum("x").as("tt"))
      .agg(count(lit(1)).as("nt"), sum("tt").as("st"),
        sum(col("tt").cast(dec) * col("tt")).as("stt"))
      .select(col("nt"),
        ((col("nt").cast(dec) * col("stt")
          - col("st").cast(dec) * col("st")).cast("double")
          / (col("nt").cast("double")
            * (col("nt").cast("double") - 1.0))).as("vt"))
    raterVar.crossJoin(broadcast(totals))
      .select(col("n_items"),
        round(col("svi") * 1000.0).cast("long").as("sum_vi_e3"),
        round(col("vt") * 1000.0).cast("long").as("var_tot_e3"),
        when(col("vt") > 0.0 && col("n_items") >= 2L,
          round(lit(1.5) * (lit(1.0) - col("svi") / col("vt"))
            * 1000000.0).cast("long")).otherwise(0L).as("alpha_e6"))
      .orderBy("n_items")
  }

  private val q451Sql =
    """WITH docs AS (
      |  SELECT doc_id,
      |    least(n_chars // 150, 5) AS x1,
      |    least(len(list_filter(string_split(text, ' '),
      |      w -> length(w) > 0)) // 30, 5) AS x2,
      |    least((length(text) - length(replace(text, '.', ''))) // 2,
      |      5) AS x3
      |  FROM documents),
      |lng AS (
      |  SELECT doc_id, 1 AS rater, x1 AS x FROM docs
      |  UNION ALL SELECT doc_id, 2, x2 FROM docs
      |  UNION ALL SELECT doc_id, 3, x3 FROM docs),
      |perrater AS (
      |  SELECT rater, CAST(count(*) AS BIGINT) AS nr,
      |    CAST(sum(x) AS BIGINT) AS srx,
      |    sum(CAST(x AS HUGEINT) * x) AS srxx
      |  FROM lng GROUP BY rater),
      |ratervar AS (
      |  SELECT CAST(max(nr) AS BIGINT) AS n_items,
      |    sum(CAST(CAST(nr AS HUGEINT) * srxx
      |        - CAST(srx AS HUGEINT) * srx AS DOUBLE)
      |      / (CAST(nr AS DOUBLE) * (CAST(nr AS DOUBLE) - 1.0)))
      |      AS svi
      |  FROM perrater),
      |totals AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nt,
      |    CAST(sum(tt) AS BIGINT) AS st,
      |    sum(CAST(tt AS HUGEINT) * tt) AS stt
      |  FROM (SELECT doc_id, CAST(sum(x) AS BIGINT) AS tt
      |    FROM lng GROUP BY doc_id) t),
      |tv AS (
      |  SELECT nt,
      |    CAST(CAST(nt AS HUGEINT) * stt
      |      - CAST(st AS HUGEINT) * st AS DOUBLE)
      |    / (CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) - 1.0)) AS vt
      |  FROM totals)
      |SELECT n_items,
      |  CAST(round(svi * 1000.0) AS BIGINT) AS sum_vi_e3,
      |  CAST(round(vt * 1000.0) AS BIGINT) AS var_tot_e3,
      |  CASE WHEN vt > 0.0 AND n_items >= 2 THEN
      |    CAST(round(1.5 * (1.0 - svi / vt) * 1000000.0) AS BIGINT)
      |    ELSE 0 END AS alpha_e6
      |FROM ratervar CROSS JOIN tv
      |ORDER BY n_items""".stripMargin

  // ---------------------------------------------------------------------
  // q452 — PR-AUC (precision–recall area, trapezoidal) of the
  // value-ranked purchase classifier: the eval-tier twin of the
  // gated exact ROC-AUC (q360) — on imbalanced labels PR is the
  // curve that moves. Tie-stable BY CONSTRUCTION: the curve is
  // integrated over the DISTINCT-VALUE axis (each score block is one
  // PR point; no per-row ranking, no within-tie order dependence),
  // descending cumulants exactly as the q405 family. Per-segment
  // trapezoid term e9-rounded AT THE ROW (the per-row-division
  // discipline), exact sum, one readout. Value-universe bounded.
  // ---------------------------------------------------------------------
  private def q452(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir)
      .select(round(col("value") * 100).cast("long").as("v"),
        (col("event_type") === "purchase").cast("long").as("pos"))
      .groupBy("v")
      .agg(sum("pos").as("pv"), count(lit(1)).as("tv"))
    val tot = ev.agg(sum("pv").as("p"), sum("tv").as("t"),
      count(lit(1)).as("n_support"))
    val wd = axis(col("v").desc).rowsBetween(Window.unboundedPreceding, 0)
    val wl = axis(col("v").desc)
    val cum = ev
      .withColumn("cp", sum("pv").over(wd))
      .withColumn("ct", sum("tv").over(wd))
      .withColumn("pp", lag(col("cp"), 1).over(wl))
      .withColumn("pt", lag(col("ct"), 1).over(wl))
    val terms = cum.crossJoin(broadcast(tot))
      .filter(col("p") > 0L)
      .select(col("p"), col("t"), col("n_support"),
        round(((col("cp") - coalesce(col("pp"), lit(0L)))
          .cast("double") / col("p").cast("double"))
          * ((coalesce(col("pp").cast("double")
              / col("pt").cast("double"),
              col("cp").cast("double") / col("ct").cast("double"))
            + col("cp").cast("double") / col("ct").cast("double"))
            / 2.0)
          * 1000000000.0).cast("long").as("term_e9"))
    terms.groupBy("p", "t", "n_support")
      .agg(sum("term_e9").as("auc_e9"))
      .select(col("p").as("n_pos"), col("t").as("n_events"),
        col("n_support"),
        round(col("auc_e9").cast("double") / 1000.0).cast("long")
          .as("pr_auc_e6"))
      .orderBy("n_pos")
  }

  private val q452Sql =
    """WITH ev AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      |      END) AS BIGINT) AS pv,
      |    CAST(count(*) AS BIGINT) AS tv
      |  FROM events GROUP BY 1),
      |tot AS (SELECT CAST(sum(pv) AS BIGINT) AS p,
      |  CAST(sum(tv) AS BIGINT) AS t, count(*) AS n_support FROM ev),
      |cum0 AS (
      |  SELECT v, pv, tv,
      |    CAST(sum(pv) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
      |    CAST(sum(tv) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ct
      |  FROM ev),
      |cum AS (
      |  SELECT v, pv, tv, cp, ct,
      |    lag(cp) OVER (ORDER BY v DESC) AS pp,
      |    lag(ct) OVER (ORDER BY v DESC) AS pt
      |  FROM cum0),
      |terms AS (
      |  SELECT p, t, n_support,
      |    CAST(round((CAST(cp - coalesce(pp, 0) AS DOUBLE)
      |        / CAST(p AS DOUBLE))
      |      * ((coalesce(CAST(pp AS DOUBLE) / CAST(pt AS DOUBLE),
      |          CAST(cp AS DOUBLE) / CAST(ct AS DOUBLE))
      |        + CAST(cp AS DOUBLE) / CAST(ct AS DOUBLE)) / 2.0)
      |      * 1000000000.0) AS BIGINT) AS term_e9
      |  FROM cum CROSS JOIN tot WHERE p > 0)
      |SELECT p AS n_pos, t AS n_events, n_support,
      |  CAST(round(CAST(CAST(sum(term_e9) AS BIGINT) AS DOUBLE)
      |    / 1000.0) AS BIGINT) AS pr_auc_e6
      |FROM terms GROUP BY p, t, n_support
      |ORDER BY n_pos""".stripMargin

  // ---------------------------------------------------------------------
  // q453 — difference-in-differences: the canonical before/after ×
  // treated/control causal estimate (complement of the gated CUPED
  // and uplift deciles). Treated = users who ever signed up; periods
  // split at the exact LOWER MEDIAN day of the span; the outcome is
  // per-(user, period) purchase cents on the FULL user×period grid
  // (non-purchasers contribute exact zeros — left join + coalesce,
  // never a dropped row). Four cell means e4-rounded at the cell,
  // DiD = (m11−m10)−(m01−m00) in one chain; the SE pools per-cell
  // sample variance/n (e9 at the cell row, exact sum, sqrt readout)
  // and t = DiD/SE. Scale: user-grain reductions, 8-row readout.
  // ---------------------------------------------------------------------
  private def q453(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.eventsSec(s, dir)
      .select(col("user_id").as("u"), col("event_type").as("t"),
        to_date(col("ts_s")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .pin()
    val days = ev.select(col("day")).distinct()
      .withColumn("rn", row_number().over(axis(col("day"))).cast("long"))
    val nd = days.agg(count(lit(1)).as("n_days"))
    val med = days.crossJoin(broadcast(nd))
      .filter(col("rn") === expr("(n_days + 1) div 2"))
      .select(col("day").as("med_day"))
    val users = ev.select(col("u")).distinct()
    // treated = the heavy-signup cohort: per-user signup count
    // STRICTLY ABOVE the global mean count ("ever signed up" is
    // degenerate at this event density — every user has every
    // type). The mean is one broadcast scalar (cross-multiplied
    // compare, no division), so the split needs no global ranking
    // and stays non-degenerate at any SF.
    val sc = ev.filter(col("t") === "signup")
      .groupBy("u").agg(count(lit(1)).as("n_signup")).pin()
    val scTot = sc.agg(sum("n_signup").as("tot"),
      count(lit(1)).as("nu"))
    val treat = sc.crossJoin(broadcast(scTot))
      .filter(col("n_signup") * col("nu") > col("tot"))
      .select(col("u")).withColumn("tr", lit(1L))
    val grid = users
      .join(broadcast(treat), Seq("u"), "left")
      .withColumn("tr", coalesce(col("tr"), lit(0L)))
      .crossJoin(broadcast(Seq(0L, 1L).toDF("post")))
    val purch = ev.filter(col("t") === "purchase")
      .crossJoin(broadcast(med))
      .groupBy(col("u"),
        (col("day") > col("med_day")).cast("long").as("post"))
      .agg(sum("cents").as("y"))
    val obs = grid.join(purch, Seq("u", "post"), "left")
      .withColumn("y", coalesce(col("y"), lit(0L)))
    val cells = obs.groupBy("tr", "post")
      .agg(count(lit(1)).as("n"), sum("y").as("sy"),
        sum(col("y").cast(dec) * col("y")).as("syy"))
      .withColumn("mean_e4", round(col("sy").cast("double")
        / col("n").cast("double") * 10000.0).cast("long"))
      .withColumn("varn_e9",
        when(col("n") >= 2L,
          round((col("n").cast(dec) * col("syy")
            - col("sy").cast(dec) * col("sy")).cast("double")
            / (col("n").cast("double") * (col("n").cast("double") - 1.0))
            / col("n").cast("double") * 1000000000.0).cast("long"))
          .otherwise(0L))
      .pin()
    val pick = (tr: Long, po: Long, c: String) =>
      sum(when(col("tr") === tr && col("post") === po,
        col(c)).otherwise(0L))
    val summary = cells.agg(
        pick(1L, 1L, "mean_e4").as("m11"), pick(1L, 0L, "mean_e4").as("m10"),
        pick(0L, 1L, "mean_e4").as("m01"), pick(0L, 0L, "mean_e4").as("m00"),
        sum("varn_e9").as("sv"))
      .select(
        (col("m11") - col("m10") - (col("m01") - col("m00")))
          .as("did_e4"),
        when(col("sv") > 0L,
          round(sqrt(col("sv").cast("double") / 1000000000.0) * 10000.0)
            .cast("long")).otherwise(0L).as("se_e4"))
      .select(col("did_e4"), col("se_e4"),
        when(col("se_e4") > 0L,
          round(col("did_e4").cast("double") / col("se_e4").cast("double")
            * 1000000.0).cast("long")).otherwise(0L).as("t_e6"))
    cells.select(col("tr"), col("post"), col("n"), col("mean_e4"))
      .crossJoin(broadcast(summary))
      .orderBy("tr", "post")
  }

  private val q453Sql =
    """WITH ev AS (
      |  SELECT user_id AS u, event_type AS t,
      |    CAST(date_trunc('second', ts) AS DATE) AS day,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |days AS (SELECT day, CAST(row_number() OVER (ORDER BY day)
      |    AS BIGINT) AS rn
      |  FROM (SELECT DISTINCT day FROM ev) d),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM days),
      |med AS (SELECT day AS med_day FROM days CROSS JOIN nd
      |  WHERE rn = (n_days + 1) // 2),
      |users AS (SELECT DISTINCT u FROM ev),
      |sc AS (SELECT u, CAST(count(*) AS BIGINT) AS n_signup
      |  FROM ev WHERE t = 'signup' GROUP BY u),
      |sctot AS (SELECT CAST(sum(n_signup) AS BIGINT) AS tot,
      |  CAST(count(*) AS BIGINT) AS nu FROM sc),
      |treat AS (SELECT u, CAST(1 AS BIGINT) AS tr
      |  FROM sc CROSS JOIN sctot WHERE n_signup * nu > tot),
      |grid AS (
      |  SELECT users.u, CAST(coalesce(tr, 0) AS BIGINT) AS tr,
      |    CAST(post AS BIGINT) AS post
      |  FROM users LEFT JOIN treat ON users.u = treat.u
      |  CROSS JOIN (VALUES (0), (1)) p(post)),
      |purch AS (
      |  SELECT u, CASE WHEN day > med_day THEN 1 ELSE 0 END AS post,
      |    CAST(sum(cents) AS BIGINT) AS y
      |  FROM ev CROSS JOIN med WHERE t = 'purchase'
      |  GROUP BY 1, 2),
      |obs AS (
      |  SELECT g.tr, g.post, coalesce(y, 0) AS y
      |  FROM grid g LEFT JOIN purch
      |    ON g.u = purch.u AND g.post = purch.post),
      |cells AS (
      |  SELECT tr, CAST(post AS BIGINT) AS post,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM obs GROUP BY tr, post),
      |c2 AS (
      |  SELECT tr, post, n,
      |    CAST(round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      |      * 10000.0) AS BIGINT) AS mean_e4,
      |    CASE WHEN n >= 2 THEN
      |      CAST(round(CAST(CAST(n AS HUGEINT) * syy
      |          - CAST(sy AS HUGEINT) * sy AS DOUBLE)
      |        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
      |        / CAST(n AS DOUBLE) * 1000000000.0) AS BIGINT)
      |      ELSE 0 END AS varn_e9
      |  FROM cells),
      |s1 AS (
      |  SELECT
      |    CAST(sum(CASE WHEN tr = 1 AND post = 1 THEN mean_e4
      |      ELSE 0 END) AS BIGINT) AS m11,
      |    CAST(sum(CASE WHEN tr = 1 AND post = 0 THEN mean_e4
      |      ELSE 0 END) AS BIGINT) AS m10,
      |    CAST(sum(CASE WHEN tr = 0 AND post = 1 THEN mean_e4
      |      ELSE 0 END) AS BIGINT) AS m01,
      |    CAST(sum(CASE WHEN tr = 0 AND post = 0 THEN mean_e4
      |      ELSE 0 END) AS BIGINT) AS m00,
      |    CAST(sum(varn_e9) AS BIGINT) AS sv
      |  FROM c2),
      |s2 AS (
      |  SELECT m11 - m10 - (m01 - m00) AS did_e4,
      |    CASE WHEN sv > 0 THEN
      |      CAST(round(sqrt(CAST(sv AS DOUBLE) / 1000000000.0)
      |        * 10000.0) AS BIGINT)
      |      ELSE 0 END AS se_e4
      |  FROM s1),
      |s3 AS (
      |  SELECT did_e4, se_e4,
      |    CASE WHEN se_e4 > 0 THEN
      |      CAST(round(CAST(did_e4 AS DOUBLE) / CAST(se_e4 AS DOUBLE)
      |        * 1000000.0) AS BIGINT)
      |      ELSE 0 END AS t_e6
      |  FROM s2)
      |SELECT tr, post, n, mean_e4, did_e4, se_e4, t_e6
      |FROM c2 CROSS JOIN s3
      |ORDER BY tr, post""".stripMargin

  // ---------------------------------------------------------------------
  // q454 — Dunn's post-hoc test after the gated Kruskal–Wallis
  // (q409, same grouping: n_chars by source): WHICH sources differ,
  // pairwise, with the tie-corrected rank variance. Mean ranks come
  // off the same doubled-midrank value-axis reduction (rank sums
  // exact longs, R̄ᵢ = r2ᵢ/(2nᵢ)); per-pair
  // z = (R̄ᵢ−R̄ⱼ)/√((N(N+1)/12 − T/(12(N−1)))·(1/nᵢ+1/nⱼ)) is one
  // IEEE chain on the C(|sources|,2) pair grid — bounded by the
  // SOURCE UNIVERSE. No p-values (no erf cross-engine): consumers
  // compare |z| to their corrected critical value, documented here.
  // ---------------------------------------------------------------------
  private def q454(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("source"), col("n_chars").as("x"))
    val pv = d.groupBy("x").agg(count(lit(1)).as("ct"))
    val wp = axis(col("x")).rowsBetween(Window.unboundedPreceding, -1)
    val dr = pv
      .withColumn("cex", coalesce(sum("ct").over(wp), lit(0L)))
      .select(col("x"),
        (lit(2L) * col("cex") + col("ct") + 1L).as("drank"), col("ct"))
      .pin()
    val grp = d.groupBy("source", "x").agg(count(lit(1)).as("cs"))
      .join(dr.select("x", "drank"), "x")
      .groupBy("source")
      .agg(sum(col("cs") * col("drank")).as("r2"), sum("cs").as("ni"))
      .pin()
    val ties = dr.agg(
      sum(col("ct") * col("ct") * col("ct") - col("ct")).as("tie_d"))
    val tot = grp.agg(sum("ni").as("n"))
      .crossJoin(broadcast(ties))
    val a = grp.select(col("source").as("sa"), col("r2").as("ra"),
      col("ni").as("na"))
    val b = grp.select(col("source").as("sb"), col("r2").as("rb"),
      col("ni").as("nb"))
    a.crossJoin(broadcast(b)).filter(col("sa") < col("sb"))
      .crossJoin(broadcast(tot))
      .select(col("sa"), col("sb"), col("na"), col("nb"),
        round((col("ra").cast("double")
          / (lit(2.0) * col("na").cast("double"))
          - col("rb").cast("double")
            / (lit(2.0) * col("nb").cast("double")))
          / sqrt((col("n").cast("double")
            * (col("n").cast("double") + 1.0) / 12.0
            - col("tie_d").cast("double")
              / (lit(12.0) * (col("n").cast("double") - 1.0)))
            * (lit(1.0) / col("na").cast("double")
              + lit(1.0) / col("nb").cast("double")))
          * 1000000.0).cast("long").as("z_e6"))
      .orderBy("sa", "sb")
  }

  private val q454Sql =
    """WITH d AS (SELECT source, n_chars AS x FROM documents),
      |pv AS (SELECT x, CAST(count(*) AS BIGINT) AS ct
      |  FROM d GROUP BY x),
      |dr AS (
      |  SELECT x,
      |    2 * coalesce(CAST(sum(ct) OVER (ORDER BY x ROWS BETWEEN
      |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |      + ct + 1 AS drank,
      |    ct
      |  FROM pv),
      |grp AS (
      |  SELECT source, CAST(sum(cs * drank) AS BIGINT) AS r2,
      |    CAST(sum(cs) AS BIGINT) AS ni
      |  FROM (SELECT source, x, CAST(count(*) AS BIGINT) AS cs
      |        FROM d GROUP BY source, x) g
      |    JOIN dr USING (x)
      |  GROUP BY source),
      |ties AS (SELECT CAST(sum(ct * ct * ct - ct) AS BIGINT) AS tie_d
      |  FROM dr),
      |tot AS (SELECT CAST(sum(ni) AS BIGINT) AS n FROM grp)
      |SELECT a.source AS sa, b.source AS sb, a.ni AS na, b.ni AS nb,
      |  CAST(round((CAST(a.r2 AS DOUBLE) / (2.0 * CAST(a.ni AS DOUBLE))
      |      - CAST(b.r2 AS DOUBLE) / (2.0 * CAST(b.ni AS DOUBLE)))
      |    / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 12.0
      |        - CAST(tie_d AS DOUBLE) / (12.0 * (CAST(n AS DOUBLE)
      |          - 1.0)))
      |      * (1.0 / CAST(a.ni AS DOUBLE) + 1.0 / CAST(b.ni AS DOUBLE)))
      |    * 1000000.0) AS BIGINT) AS z_e6
      |FROM grp a JOIN grp b ON a.source < b.source
      |  CROSS JOIN ties CROSS JOIN tot
      |ORDER BY sa, sb""".stripMargin

  // ---------------------------------------------------------------------
  // q455 — ONLINE Holt linear-trend smoothing (transformWithState):
  // the q442 walk run as a STREAM — per-day cents MapState, a
  // boundary timer per open day, closed days drained in day order
  // through the (level, trend) state with the two-day init stashed
  // until its second day closes. Faces the SAME DuckDB
  // recursive-CTE oracle as the batch q442: one recurrence, two
  // execution models, bit-identical rows (TwsHoltSpec additionally
  // asserts streaming == batch directly).
  // ---------------------------------------------------------------------
  private def q455(s: SparkSession, dir: String): DataFrame =
    graft.streaming.TwsHolt.replayFromParquet(s, s"$dir/events.parquet")
      .orderBy(col("d"))

  // ---------------------------------------------------------------------
  // q456 — skip-gram training-pair extraction (window = 2) + the
  // unigram^¾ negative-sampling table: the word2vec/embedding
  // data-prep primitive. Pair generation is the OFFSET-JOIN shape —
  // tokens equi-join themselves on (doc, pos+δ) for δ ∈ {−2,−1,1,2}
  // — which is LINEAR in corpus tokens (4×), never the per-doc
  // len² band join. The negative-sampling weight c^0.75 is computed
  // as sqrt(c)·sqrt(sqrt(c)) — two CORRECTLY-ROUNDED sqrts and one
  // multiply, identical on both engines, where pow(c, 0.75) would
  // be implementation-defined in the last ulp — e9-rounded per word
  // (exact integer normalization). Top-50 pairs by (count, target,
  // context) via TakeOrdered — no global window.
  // ---------------------------------------------------------------------
  private def q456(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(graft.functions.Text.words(col("text")))
          .as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("w"))
      .pin()
    val uni = tok.groupBy("w").agg(count(lit(1)).as("cu"))
      .select(col("w"), col("cu"),
        round(sqrt(col("cu").cast("double"))
          * sqrt(sqrt(col("cu").cast("double")))
          * 1000000000.0).cast("long").as("u_e9"))
      .pin()
    val utot = uni.agg(sum("u_e9").as("ut"))
    val deltas = Seq(-2L, -1L, 1L, 2L).toDF("delta")
    val pairs = tok.crossJoin(broadcast(deltas))
      .select(col("doc_id"), (col("pos") + col("delta")).as("cpos"),
        col("w").as("target"))
      .join(tok.select(col("doc_id"), col("pos").as("cpos"),
        col("w").as("context")), Seq("doc_id", "cpos"))
      .groupBy("target", "context")
      .agg(count(lit(1)).as("n_pair"))
    pairs
      .join(broadcast(uni.select(col("w").as("context"),
        col("u_e9"))), "context")
      .crossJoin(broadcast(utot))
      .select(col("target"), col("context"), col("n_pair"),
        round(col("u_e9").cast("double") / col("ut").cast("double")
          * 1000000000.0).cast("long").as("ctx_neg_e9"))
      .orderBy(col("n_pair").desc, col("target"), col("context"))
      .limit(50)
  }

  private val q456Sql =
    """WITH tok AS (
      |  SELECT doc_id, CAST(pos AS BIGINT) AS pos, w FROM (
      |    SELECT doc_id,
      |      unnest(range(len(list_filter(string_split(text, ' '),
      |        x -> length(x) > 0)))) AS pos,
      |      unnest(list_filter(string_split(text, ' '),
      |        x -> length(x) > 0)) AS w
      |    FROM documents) t),
      |uni AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS cu,
      |    CAST(round(sqrt(CAST(count(*) AS DOUBLE))
      |      * sqrt(sqrt(CAST(count(*) AS DOUBLE)))
      |      * 1000000000.0) AS BIGINT) AS u_e9
      |  FROM tok GROUP BY w),
      |utot AS (SELECT CAST(sum(u_e9) AS BIGINT) AS ut FROM uni),
      |pairs AS (
      |  SELECT a.w AS target, b.w AS context,
      |    CAST(count(*) AS BIGINT) AS n_pair
      |  FROM tok a
      |    CROSS JOIN (VALUES (-2), (-1), (1), (2)) d(delta)
      |    JOIN tok b ON a.doc_id = b.doc_id
      |      AND b.pos = a.pos + delta
      |  GROUP BY 1, 2)
      |SELECT target, context, n_pair,
      |  CAST(round(CAST(u_e9 AS DOUBLE) / CAST(ut AS DOUBLE)
      |    * 1000000000.0) AS BIGINT) AS ctx_neg_e9
      |FROM pairs JOIN uni ON pairs.context = uni.w
      |  CROSS JOIN utot
      |ORDER BY n_pair DESC, target, context
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------------
  // q457 — BPE merge learning (5 iterations): the tokenizer-training
  // primitive — learn the most frequent adjacent symbol pair over
  // the corpus, merge it everywhere, repeat. Classic BPE trains on
  // the WORD-FREQUENCY grain (distinct words × counts — bounded by
  // the vocabulary, not the corpus; one corpus scan builds it), so
  // each iteration is a vocab-sized pair count + a 1-row argmax +
  // one rewrite. The symbolization is a MARKER STRING ("␟a ␟b ␟c",
  // marker = chr(31)): every symbol starts with the marker, so the
  // merge pattern "␟x ␟y" can never match mid-symbol, and plain
  // replace() — left-to-right, non-overlapping on BOTH engines — IS
  // the greedy BPE merge semantics. Argmax tiebreak (count desc,
  // pair); oracle = generated unrolled CTEs (the q431/q444
  // discipline). HOF-free: pair extraction indexes split arrays.
  // ---------------------------------------------------------------------
  private val bpeIters = 5
  private val bpeMk = ""

  private def q457(s: SparkSession, dir: String): DataFrame = {
    val wf = Tables.load(s, dir, "documents")
      .select(explode(graft.functions.Text.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      // "abc" -> "MKa MKb MKc": insert " MK" before chars 2..len
      // only ((?!^)(?=.) excludes the end-of-string position), then
      // prefix the first marker
      // every symbol is MARKER-prefixed AND space-TERMINATED
      // ("abc" -> "MKa MKb MKc "): the marker blocks mid-symbol
      // match STARTS, the terminator blocks mid-symbol match ENDS
      // (a pair (x, y) where y prefixes the next symbol must not
      // match across the boundary - the law PropertySpec proves)
      .select(col("n"), concat(lit(bpeMk),
        regexp_replace(col("w"), "(?!^)(?=.)", " " + bpeMk),
        lit(" ")).as("s"))
      .pin()
    var cur = wf
    val bests = (1 to bpeIters).map { k =>
      val pairs = cur
        .select(col("n"), split(col("s"), " ").as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("n"), col("a"),
          explode(sequence(lit(1), size(col("a")) - 1)).as("i"))
        .select(col("n"), element_at(col("a"), col("i")).as("pa"),
          element_at(col("a"), col("i") + 1).as("pb"))
        .filter(length(col("pb")) > 0) // the terminator's empty tail
        .groupBy("pa", "pb").agg(sum("n").as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, col("pa"), col("pb")).limit(1)
        .pin()
      cur = cur.crossJoin(broadcast(best))
        .select(col("n"),
          expr("replace(s, pa || ' ' || pb || ' ', " +
            "pa || substring(pb, 2) || ' ')").as("s"))
      best.select(lit(k.toLong).as("step"),
        expr("substring(pa, 2)").as("left_sym"),
        expr("substring(pb, 2)").as("right_sym"), col("cnt"))
    }
    bests.reduce(_ unionByName _).orderBy("step")
  }

  private val q457Sql = {
    val itInit =
      """wf AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(list_filter(string_split(text, ' '),
        |    x -> length(x) > 0)) AS w FROM documents) t
        |  GROUP BY w),
        |it0 AS (
        |  SELECT n,
        |    array_to_string(list_transform(range(1, length(w) + 1),
        |      i -> chr(31) || substr(w, i::INT, 1)), ' ') || ' ' AS s
        |  FROM wf)""".stripMargin
    val steps = (1 to bpeIters).map { k =>
      s"""p$k AS (
         |  SELECT a[i] AS pa, a[i + 1] AS pb,
         |    CAST(sum(n) AS BIGINT) AS cnt
         |  FROM (SELECT n, string_split(s, ' ') AS a
         |        FROM it${k - 1} WHERE length(s) > 0) t,
         |    unnest(generate_series(1, len(a) - 1)) u(i)
         |  WHERE len(a) >= 2 AND length(a[i + 1]) > 0
         |  GROUP BY 1, 2),
         |b$k AS (SELECT pa, pb, cnt FROM p$k
         |  ORDER BY cnt DESC, pa, pb LIMIT 1),
         |it$k AS (
         |  SELECT n, replace(s, pa || ' ' || pb || ' ',
         |    pa || substr(pb, 2) || ' ') AS s
         |  FROM it${k - 1} CROSS JOIN b$k)""".stripMargin
    }.mkString(",\n")
    val out = (1 to bpeIters).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS step, substr(pa, 2) AS left_sym,
         |  substr(pb, 2) AS right_sym, cnt FROM b$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $itInit,
       |$steps
       |$out
       |ORDER BY step""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q458 — Wilcoxon signed-rank test on the paired click-vs-view
  // DAILY MEAN series: the PAIRED complement of the gated
  // Mann–Whitney U (q260 family) — same days, two metrics, does one
  // systematically exceed the other. Day means e4 (the q416
  // construction); zero differences drop (standard); |d| midranks
  // come DOUBLED off the |d| value axis (2·below + ct + 1, ties
  // exact), so W2± = Σ drank over positive/negative days are exact
  // longs with W2+ + W2− = n(n+1) (spec law). The normal
  // approximation z carries the tie-corrected variance in ONE chain.
  // Day grain throughout.
  // ---------------------------------------------------------------------
  private def q458(s: SparkSession, dir: String): DataFrame = {
    val day = Tables.eventsSec(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), to_date(col("ts_s")).as("day"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy("event_type", "day")
      .agg(round(lit(10000.0) * sum("v").cast("double")
        / count(lit(1)).cast("double")).cast("long").as("x_e4"))
    val paired = day.filter(col("event_type") === "click")
      .select(col("day"), col("x_e4").as("xa"))
      .join(day.filter(col("event_type") === "view")
        .select(col("day"), col("x_e4").as("xb")), "day")
      .select(col("day"), (col("xa") - col("xb")).as("d"))
      .filter(col("d") =!= 0L)
      .select(col("day"), col("d"), abs(col("d")).as("ad"))
      .pin()
    val av = paired.groupBy("ad").agg(count(lit(1)).as("ct"))
    val wp = axis(col("ad")).rowsBetween(Window.unboundedPreceding, -1)
    val dr = av
      .withColumn("cex", coalesce(sum("ct").over(wp), lit(0L)))
      .select(col("ad"),
        (lit(2L) * col("cex") + col("ct") + 1L).as("drank"), col("ct"))
    val st = paired.join(broadcast(dr.select("ad", "drank")), "ad")
      .agg(count(lit(1)).as("n"),
        sum(when(col("d") > 0L, col("drank")).otherwise(0L))
          .as("w2_plus"),
        sum(when(col("d") < 0L, col("drank")).otherwise(0L))
          .as("w2_minus"))
    val ties = dr.agg(
      sum(col("ct") * col("ct") * col("ct") - col("ct")).as("tie_d"))
    st.crossJoin(broadcast(ties))
      .select(col("n"), col("w2_plus"), col("w2_minus"), col("tie_d"),
        when(col("n") >= 2L,
          round((col("w2_plus").cast("double") / 2.0
            - col("n").cast("double") * (col("n").cast("double") + 1.0)
              / 4.0)
            / sqrt(col("n").cast("double")
              * (col("n").cast("double") + 1.0)
              * (lit(2.0) * col("n").cast("double") + 1.0) / 24.0
              - col("tie_d").cast("double") / 48.0)
            * 1000000.0).cast("long")).otherwise(0L).as("z_e6"))
      .orderBy("n")
  }

  private val q458Sql =
    """WITH day AS (
      |  SELECT event_type, CAST(date_trunc('second', ts) AS DATE)
      |      AS day,
      |    CAST(round(10000.0 * CAST(sum(CAST(round(value * 100)
      |      AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE))
      |      AS BIGINT) AS x_e4
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY 1, 2),
      |paired AS (
      |  SELECT a.day, a.x_e4 - b.x_e4 AS d,
      |    abs(a.x_e4 - b.x_e4) AS ad
      |  FROM day a JOIN day b ON a.day = b.day
      |  WHERE a.event_type = 'click' AND b.event_type = 'view'
      |    AND a.x_e4 <> b.x_e4),
      |av AS (SELECT ad, CAST(count(*) AS BIGINT) AS ct
      |  FROM paired GROUP BY ad),
      |dr AS (
      |  SELECT ad,
      |    2 * coalesce(CAST(sum(ct) OVER (ORDER BY ad ROWS BETWEEN
      |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |      + ct + 1 AS drank,
      |    ct
      |  FROM av),
      |st AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN d > 0 THEN drank ELSE 0 END) AS BIGINT)
      |      AS w2_plus,
      |    CAST(sum(CASE WHEN d < 0 THEN drank ELSE 0 END) AS BIGINT)
      |      AS w2_minus
      |  FROM paired JOIN dr USING (ad)),
      |ties AS (SELECT CAST(sum(ct * ct * ct - ct) AS BIGINT) AS tie_d
      |  FROM dr)
      |SELECT n, w2_plus, w2_minus, tie_d,
      |  CASE WHEN n >= 2 THEN
      |    CAST(round((CAST(w2_plus AS DOUBLE) / 2.0
      |      - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
      |      / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
      |        * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
      |        - CAST(tie_d AS DOUBLE) / 48.0)
      |      * 1000000.0) AS BIGINT)
      |    ELSE 0 END AS z_e6
      |FROM st CROSS JOIN ties
      |ORDER BY n""".stripMargin

  // ---------------------------------------------------------------------
  // q459 — Siegel repeated-medians slope on the daily revenue
  // series: the 50%-breakdown robust regression (Theil–Sen's q436
  // breaks down at ~29%) — per day i, the median slope to every
  // other day; then the median of those per-day medians. The inner
  // medians run over Windows PARTITIONED by the anchor day (n−1
  // rows each); only the ≤1000-row outer median touches the
  // allowlisted axis. Slopes use the exact q436 rounding chain;
  // both medians are exact lower order statistics.
  // ---------------------------------------------------------------------
  private def q459(s: SparkSession, dir: String): DataFrame = {
    val day = dayRev(s, dir)
    val cnt = day.agg(count(lit(1)).as("n_days"))
    val a = day.select(col("d").as("da"), col("y").as("ya"))
    val b = day.select(col("d").as("db"), col("y").as("yb"))
    val pairs = a.crossJoin(broadcast(b)).crossJoin(broadcast(cnt))
      .filter(col("da") =!= col("db"))
      .withColumn("slope_e6",
        when(col("n_days") <= 1000L,
          round((col("yb") - col("ya")).cast("double") * 1000000.0
            / (col("db") - col("da")).cast("double")).cast("long"))
          .otherwise(raise_error(concat(
            lit("siegelSlopes: day grain exceeded 1000 ("),
            col("n_days").cast("string"),
            lit(") — aggregate to a coarser grain or raise the bound " +
              "explicitly.")))))
    val wi = Window.partitionBy(col("da"))
      .orderBy(col("slope_e6"), col("db"))
    val inner = pairs
      .withColumn("rn", row_number().over(wi).cast("long"))
      .filter(col("rn") === expr("n_days div 2"))
      .select(col("da"), col("slope_e6").as("med_i"), col("n_days"))
    inner
      .withColumn("rn2", row_number()
        .over(axis(col("med_i"), col("da"))).cast("long"))
      .groupBy("n_days")
      .agg(min(when(col("rn2") === expr("(n_days + 1) div 2"),
        col("med_i"))).as("siegel_slope_e6"))
      .orderBy("n_days")
  }

  private val q459Sql =
    s"""WITH day AS (
       |  $dayRevSql),
       |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM day),
       |pairs AS (
       |  SELECT a.d AS da, b.d AS db,
       |    CAST(round(CAST(b.y - a.y AS DOUBLE) * 1000000.0
       |      / CAST(b.d - a.d AS DOUBLE)) AS BIGINT) AS slope_e6
       |  FROM day a JOIN day b ON a.d <> b.d),
       |inner_med AS (
       |  SELECT da, slope_e6 AS med_i, n_days FROM (
       |    SELECT da, slope_e6, n_days,
       |      CAST(row_number() OVER (PARTITION BY da
       |        ORDER BY slope_e6, db) AS BIGINT) AS rn
       |    FROM pairs CROSS JOIN cnt) t
       |  WHERE rn = n_days // 2)
       |SELECT n_days,
       |  min(CASE WHEN rn2 = (n_days + 1) // 2 THEN med_i END)
       |    AS siegel_slope_e6
       |FROM (
       |  SELECT n_days, med_i,
       |    CAST(row_number() OVER (ORDER BY med_i, da) AS BIGINT)
       |      AS rn2
       |  FROM inner_med) t
       |GROUP BY n_days ORDER BY n_days""".stripMargin

  // ---------------------------------------------------------------------
  // q460 — partial correlation r(click, purchase | view): does the
  // click–purchase association survive controlling for overall
  // browsing volume, or is it all common traffic — the
  // confounder-adjusted complement of q440's raw profile. Three
  // daily series from ONE events scan (conditional aggregation to
  // the pinned day grain); all three pairwise Pearson r's from the
  // q435 exact sufficient statistics; the textbook
  // (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) is one staged chain
  // written identically on both engines.
  // ---------------------------------------------------------------------
  private def q460(s: SparkSession, dir: String): DataFrame = {
    val day = Tables.eventsSec(s, dir)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(
        sum((col("event_type") === "click").cast("long")).as("x"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("y"),
        sum((col("event_type") === "view").cast("long")).as("z"))
      .pin()
    val st = day.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
      sum(col("x").cast(dec) * col("y")).as("sxy"),
      sum(col("x").cast(dec) * col("z")).as("sxz"),
      sum(col("y").cast(dec) * col("z")).as("syz"),
      sum(col("x").cast(dec) * col("x")).as("sxx"),
      sum(col("y").cast(dec) * col("y")).as("syy"),
      sum(col("z").cast(dec) * col("z")).as("szz"))
    def num(sab: String, sa: String, sb: String) =
      (col("n").cast(dec) * col(sab)
        - col(sa).cast(dec) * col(sb)).cast("double")
    def den(saa: String, sa: String) =
      (col("n").cast(dec) * col(saa)
        - col(sa).cast(dec) * col(sa)).cast("double")
    val d2 = st.select(col("n"),
      (num("sxy", "sx", "sy")
        / sqrt(den("sxx", "sx") * den("syy", "sy"))).as("rxy"),
      (num("sxz", "sx", "sz")
        / sqrt(den("sxx", "sx") * den("szz", "sz"))).as("rxz"),
      (num("syz", "sy", "sz")
        / sqrt(den("syy", "sy") * den("szz", "sz"))).as("ryz"))
    d2.select(col("n").as("n_days"),
        round(col("rxy") * 1000000.0).cast("long").as("rxy_e6"),
        round(col("rxz") * 1000000.0).cast("long").as("rxz_e6"),
        round(col("ryz") * 1000000.0).cast("long").as("ryz_e6"),
        when((lit(1.0) - col("rxz") * col("rxz")) > 0.0
          && (lit(1.0) - col("ryz") * col("ryz")) > 0.0,
          round((col("rxy") - col("rxz") * col("ryz"))
            / sqrt((lit(1.0) - col("rxz") * col("rxz"))
              * (lit(1.0) - col("ryz") * col("ryz")))
            * 1000000.0).cast("long")).otherwise(0L)
          .as("partial_e6"))
      .orderBy("n_days")
  }

  private val q460Sql =
    """WITH day AS (
      |  SELECT CAST(date_trunc('second', ts) AS DATE) AS day,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN
      |      CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS y,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS z
      |  FROM events
      |  WHERE event_type IN ('click', 'view', 'purchase')
      |  GROUP BY 1),
      |st AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(z) AS BIGINT) AS sz,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x AS HUGEINT) * z) AS sxz,
      |    sum(CAST(y AS HUGEINT) * z) AS syz,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy,
      |    sum(CAST(z AS HUGEINT) * z) AS szz
      |  FROM day),
      |d2 AS (
      |  SELECT n,
      |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
      |        AS DOUBLE)
      |      / sqrt(CAST(CAST(n AS HUGEINT) * sxx
      |          - CAST(sx AS HUGEINT) * sx AS DOUBLE)
      |        * CAST(CAST(n AS HUGEINT) * syy
      |          - CAST(sy AS HUGEINT) * sy AS DOUBLE)) AS rxy,
      |    CAST(CAST(n AS HUGEINT) * sxz - CAST(sx AS HUGEINT) * sz
      |        AS DOUBLE)
      |      / sqrt(CAST(CAST(n AS HUGEINT) * sxx
      |          - CAST(sx AS HUGEINT) * sx AS DOUBLE)
      |        * CAST(CAST(n AS HUGEINT) * szz
      |          - CAST(sz AS HUGEINT) * sz AS DOUBLE)) AS rxz,
      |    CAST(CAST(n AS HUGEINT) * syz - CAST(sy AS HUGEINT) * sz
      |        AS DOUBLE)
      |      / sqrt(CAST(CAST(n AS HUGEINT) * syy
      |          - CAST(sy AS HUGEINT) * sy AS DOUBLE)
      |        * CAST(CAST(n AS HUGEINT) * szz
      |          - CAST(sz AS HUGEINT) * sz AS DOUBLE)) AS ryz
      |  FROM st)
      |SELECT n AS n_days,
      |  CAST(round(rxy * 1000000.0) AS BIGINT) AS rxy_e6,
      |  CAST(round(rxz * 1000000.0) AS BIGINT) AS rxz_e6,
      |  CAST(round(ryz * 1000000.0) AS BIGINT) AS ryz_e6,
      |  CASE WHEN (1.0 - rxz * rxz) > 0.0 AND (1.0 - ryz * ryz) > 0.0
      |    THEN CAST(round((rxy - rxz * ryz)
      |      / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
      |      * 1000000.0) AS BIGINT)
      |    ELSE 0 END AS partial_e6
      |FROM d2 ORDER BY n_days""".stripMargin

  // ---------------------------------------------------------------------
  // q461 — Jarque–Bera normality test of the daily revenue series:
  // the moment-based screen (skewness² + excess-kurtosis²/4, scaled
  // by n/6) every parametric assumption upstream (q415 Cohen's d,
  // q449's diagnostics) quietly makes. Days standardize to an e6
  // LATTICE (one IEEE chain per row: (y·n − S)/(n·σ), population σ),
  // so the third/fourth moment sums are EXACT decimals of lattice
  // values (z⁴ ≤ ~10²⁷ per row — no overflow at any revenue scale
  // because z is standardized); skew/kurtosis read out with
  // x^1.5 = x·sqrt(x) (correctly-rounded composition, the q456
  // argument). Day grain, one pinned scan.
  // ---------------------------------------------------------------------
  private def q461(s: SparkSession, dir: String): DataFrame = {
    val day = dayRev(s, dir)
    val st = day.agg(count(lit(1)).as("n"), sum("y").as("sy"),
      sum(col("y").cast(dec) * col("y")).as("syy"))
    val qv = (col("n").cast(dec) * col("syy")
      - col("sy").cast(dec) * col("sy")).cast("double")
    val sd = sqrt(qv) / col("n").cast("double")
    val z = day.crossJoin(broadcast(
        st.select(col("n"), col("sy"), sd.as("nsd"))))
      .select(col("n"),
        round((col("y").cast("double") * col("n").cast("double")
          - col("sy").cast("double"))
          / (col("n").cast("double") * col("nsd")) * 1000000.0)
          .cast("long").as("z_e6"))
    val ms = z.groupBy("n").agg(
      sum(col("z_e6").cast(dec) * col("z_e6")).as("s2"),
      sum(col("z_e6").cast(dec) * col("z_e6") * col("z_e6")).as("s3"),
      sum(col("z_e6").cast(dec) * col("z_e6") * col("z_e6")
        * col("z_e6")).as("s4"))
    // staged like the oracle (the q443 lesson: never reuse one
    // compound Column object across output columns)
    val d2 = ms.select(col("n"), col("s2"),
      (col("s2").cast("double") / col("n").cast("double")).as("m2"),
      (col("s3").cast("double") / col("n").cast("double")).as("m3"),
      (col("s4").cast("double") / col("n").cast("double")).as("m4"))
    val d3 = d2.select(col("n"), col("s2"),
      (col("m3") / (col("m2") * sqrt(col("m2")))).as("skew"),
      (col("m4") / (col("m2") * col("m2")) - 3.0).as("kurt"))
    d3.select(col("n").as("n_days"),
        round(col("skew") * 1000000.0).cast("long").as("skew_e6"),
        round(col("kurt") * 1000000.0).cast("long").as("kurt_e6"),
        when(col("s2") > 0L,
          round(col("n").cast("double") / 6.0
            * (col("skew") * col("skew")
              + col("kurt") * col("kurt") / 4.0) * 1000000.0)
            .cast("long")).otherwise(0L).as("jb_e6"))
      .orderBy("n_days")
  }

  private val q461Sql =
    s"""WITH day AS (
       |  $dayRevSql),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(y) AS BIGINT) AS sy,
       |  sum(CAST(y AS HUGEINT) * y) AS syy FROM day),
       |sd AS (SELECT n, sy,
       |  sqrt(CAST(CAST(n AS HUGEINT) * syy
       |    - CAST(sy AS HUGEINT) * sy AS DOUBLE))
       |    / CAST(n AS DOUBLE) AS nsd
       |  FROM st),
       |z AS (
       |  SELECT n,
       |    CAST(round((CAST(y AS DOUBLE) * CAST(n AS DOUBLE)
       |      - CAST(sy AS DOUBLE))
       |      / (CAST(n AS DOUBLE) * nsd) * 1000000.0) AS BIGINT)
       |      AS z_e6
       |  FROM day CROSS JOIN sd),
       |ms AS (
       |  SELECT n,
       |    sum(CAST(z_e6 AS HUGEINT) * z_e6) AS s2,
       |    sum(CAST(z_e6 AS HUGEINT) * z_e6 * z_e6) AS s3,
       |    sum(CAST(z_e6 AS HUGEINT) * z_e6 * z_e6 * z_e6) AS s4
       |  FROM z GROUP BY n)
       |SELECT n AS n_days,
       |  CAST(round(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
       |    / (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |      * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)))
       |    * 1000000.0) AS BIGINT) AS skew_e6,
       |  CAST(round((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
       |    / (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |      * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))) - 3.0)
       |    * 1000000.0) AS BIGINT) AS kurt_e6,
       |  CASE WHEN s2 > 0 THEN
       |    CAST(round(CAST(n AS DOUBLE) / 6.0
       |      * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
       |          / (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |            * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)))
       |        * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
       |          / (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |            * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))))
       |        + (CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
       |            / (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |              * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)))
       |            - 3.0)
       |          * (CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
       |            / (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |              * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)))
       |            - 3.0) / 4.0)
       |      * 1000000.0) AS BIGINT)
       |    ELSE 0 END AS jb_e6
       |FROM ms ORDER BY n_days""".stripMargin

  // ---------------------------------------------------------------------
  // q462 — Granger causality, both directions, lag 1: does
  // yesterday's click count predict today's purchase revenue beyond
  // revenue's own history (and vice versa) — the time-series causal
  // screen next to q453's DiD. Each direction is the closed-form
  // two-regressor OLS F-test: centered cross forms A/B from exact
  // decimal sufficient statistics, the 2×2 normal-equation solve in
  // ONE staged double chain (the shared m² scaling cancels in F),
  // F = (SSE_r − SSE_u)·(m−3)/SSE_u. Lagged pairs come off the
  // pinned day grain through the allowlisted axis window.
  // ---------------------------------------------------------------------
  private def q462(s: SparkSession, dir: String): DataFrame = {
    val day = Tables.eventsSec(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(
        sum((col("event_type") === "click").cast("long")).as("x"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("y"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long")
        .as("d"), col("x"), col("y"))
      .pin()
    val wl = axis(col("d"))
    val lagged = day
      .withColumn("xl", lag(col("x"), 1).over(wl))
      .withColumn("yl", lag(col("y"), 1).over(wl))
      .filter(col("xl").isNotNull && col("yl").isNotNull)
      .pin()

    def direction(tgt: String, ownLag: String, otherLag: String,
                  label: String): DataFrame = {
      val st = lagged.agg(count(lit(1)).as("m"),
        sum(tgt).as("sy"), sum(ownLag).as("s1"), sum(otherLag).as("s2"),
        sum(col(ownLag).cast(dec) * col(ownLag)).as("s11"),
        sum(col(otherLag).cast(dec) * col(otherLag)).as("s22"),
        sum(col(ownLag).cast(dec) * col(otherLag)).as("s12"),
        sum(col(ownLag).cast(dec) * col(tgt)).as("s1y"),
        sum(col(otherLag).cast(dec) * col(tgt)).as("s2y"),
        sum(col(tgt).cast(dec) * col(tgt)).as("syy2"))
      val a11 = (col("m").cast(dec) * col("s11")
        - col("s1").cast(dec) * col("s1")).cast("double")
      val a22 = (col("m").cast(dec) * col("s22")
        - col("s2").cast(dec) * col("s2")).cast("double")
      val a12 = (col("m").cast(dec) * col("s12")
        - col("s1").cast(dec) * col("s2")).cast("double")
      val b1 = (col("m").cast(dec) * col("s1y")
        - col("s1").cast(dec) * col("sy")).cast("double")
      val b2 = (col("m").cast(dec) * col("s2y")
        - col("s2").cast(dec) * col("sy")).cast("double")
      val syy = (col("m").cast(dec) * col("syy2")
        - col("sy").cast(dec) * col("sy")).cast("double")
      val d2 = st.select(col("m"), a11.as("a11"), a22.as("a22"),
        a12.as("a12"), b1.as("b1"), b2.as("b2"), syy.as("syy"))
      // staged (the q443 lesson): det, then the two SSEs as named
      // columns, then the one readout — never a compound Column
      // object reused across expressions
      val d3 = d2.select(col("m"), col("a11"), col("a22"),
        col("a12"), col("b1"), col("b2"), col("syy"),
        (col("a11") * col("a22") - col("a12") * col("a12")).as("det"))
      val d4 = d3.select(col("m"), col("a11"), col("det"),
        (col("syy")
          - ((col("a22") * col("b1") - col("a12") * col("b2"))
            / col("det") * col("b1")
            + (col("a11") * col("b2") - col("a12") * col("b1"))
              / col("det") * col("b2"))).as("sse_u"),
        (col("syy") - col("b1") * col("b1") / col("a11")).as("sse_r"))
      d4.select(col("m"),
        when(col("det") > 0.0 && col("a11") > 0.0
          && col("sse_u") > 0.0,
          round((col("sse_r") - col("sse_u"))
            * (col("m").cast("double") - 3.0) / col("sse_u")
            * 1000000.0).cast("long")).otherwise(0L)
          .as(label))
    }
    val fxy = direction("y", "yl", "xl", "f_click_to_rev_e6")
    val fyx = direction("x", "xl", "yl", "f_rev_to_click_e6")
    fxy.crossJoin(broadcast(fyx.select(col("f_rev_to_click_e6"))))
      .select(col("m").as("n_obs"), col("f_click_to_rev_e6"),
        col("f_rev_to_click_e6"))
      .orderBy("n_obs")
  }

  private val q462Sql = {
    def dir(tgt: String, own: String, other: String, label: String) =
      s"""SELECT m,
         |    CASE WHEN (a11 * a22 - a12 * a12) > 0.0 AND a11 > 0.0
         |      AND (syy - ((a22 * b1 - a12 * b2)
         |          / (a11 * a22 - a12 * a12) * b1
         |        + (a11 * b2 - a12 * b1)
         |          / (a11 * a22 - a12 * a12) * b2)) > 0.0
         |      THEN CAST(round(
         |        ((syy - b1 * b1 / a11)
         |          - (syy - ((a22 * b1 - a12 * b2)
         |              / (a11 * a22 - a12 * a12) * b1
         |            + (a11 * b2 - a12 * b1)
         |              / (a11 * a22 - a12 * a12) * b2)))
         |        * (CAST(m AS DOUBLE) - 3.0)
         |        / (syy - ((a22 * b1 - a12 * b2)
         |            / (a11 * a22 - a12 * a12) * b1
         |          + (a11 * b2 - a12 * b1)
         |            / (a11 * a22 - a12 * a12) * b2))
         |        * 1000000.0) AS BIGINT)
         |      ELSE 0 END AS $label
         |  FROM (
         |    SELECT m,
         |      CAST(CAST(m AS HUGEINT) * s11
         |        - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) AS a11,
         |      CAST(CAST(m AS HUGEINT) * s22
         |        - CAST(s2 AS HUGEINT) * s2 AS DOUBLE) AS a22,
         |      CAST(CAST(m AS HUGEINT) * s12
         |        - CAST(s1 AS HUGEINT) * s2 AS DOUBLE) AS a12,
         |      CAST(CAST(m AS HUGEINT) * s1y
         |        - CAST(s1 AS HUGEINT) * sy AS DOUBLE) AS b1,
         |      CAST(CAST(m AS HUGEINT) * s2y
         |        - CAST(s2 AS HUGEINT) * sy AS DOUBLE) AS b2,
         |      CAST(CAST(m AS HUGEINT) * syy2
         |        - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS syy
         |    FROM (
         |      SELECT CAST(count(*) AS BIGINT) AS m,
         |        CAST(sum($tgt) AS BIGINT) AS sy,
         |        CAST(sum($own) AS BIGINT) AS s1,
         |        CAST(sum($other) AS BIGINT) AS s2,
         |        sum(CAST($own AS HUGEINT) * $own) AS s11,
         |        sum(CAST($other AS HUGEINT) * $other) AS s22,
         |        sum(CAST($own AS HUGEINT) * $other) AS s12,
         |        sum(CAST($own AS HUGEINT) * $tgt) AS s1y,
         |        sum(CAST($other AS HUGEINT) * $tgt) AS s2y,
         |        sum(CAST($tgt AS HUGEINT) * $tgt) AS syy2
         |      FROM lagged) s) d""".stripMargin
    s"""WITH day AS (
       |  SELECT CAST(CAST(date_trunc('second', ts) AS DATE)
       |      - DATE '1970-01-01' AS BIGINT) AS d,
       |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN event_type = 'purchase' THEN
       |      CAST(round(value * 100) AS BIGINT) ELSE 0 END)
       |      AS BIGINT) AS y
       |  FROM events WHERE event_type IN ('click', 'purchase')
       |  GROUP BY 1),
       |lagged AS (
       |  SELECT d, x, y, xl, yl FROM (
       |    SELECT d, x, y,
       |      lag(x) OVER (ORDER BY d) AS xl,
       |      lag(y) OVER (ORDER BY d) AS yl
       |    FROM day) t
       |  WHERE xl IS NOT NULL AND yl IS NOT NULL),
       |fxy AS (
       |  ${dir("y", "yl", "xl", "f_click_to_rev_e6")}),
       |fyx AS (
       |  ${dir("x", "xl", "yl", "f_rev_to_click_e6")})
       |SELECT fxy.m AS n_obs, f_click_to_rev_e6, f_rev_to_click_e6
       |FROM fxy CROSS JOIN fyx
       |ORDER BY n_obs""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q463 — Wald–Wolfowitz runs test on the daily revenue up/down
  // sequence: the randomness screen (too FEW runs = trending, too
  // MANY = oscillating) that complements the gated trend tests
  // (q436 MK, q423 JT) from the opposite null. Signs come off the
  // pinned day grain through the allowlisted axis lag (zero diffs
  // drop, standard); the run count R = sign changes + 1, n₊/n₋ and
  // R are exact longs, and z carries the exact-moments normal
  // approximation in ONE chain.
  // ---------------------------------------------------------------------
  private def q463(s: SparkSession, dir: String): DataFrame = {
    val day = dayRev(s, dir)
    val wl = axis(col("d"))
    val sgn = day
      .withColumn("py", lag(col("y"), 1).over(wl))
      .filter(col("py").isNotNull && col("y") =!= col("py"))
      .select(col("d"),
        when(col("y") > col("py"), 1L).otherwise(-1L).as("sg"))
    val runs = sgn
      .withColumn("ps", lag(col("sg"), 1).over(axis(col("d"))))
      .select(
        (col("sg") === 1L).cast("long").as("up"),
        (col("sg") === -1L).cast("long").as("dn"),
        when(col("ps").isNull || col("ps") =!= col("sg"), 1L)
          .otherwise(0L).as("newrun"))
      .agg(sum("up").as("n_up"), sum("dn").as("n_dn"),
        sum("newrun").as("n_runs"))
    val d2 = runs.select(col("n_up"), col("n_dn"), col("n_runs"),
      (col("n_up") + col("n_dn")).as("n"),
      (lit(2L) * col("n_up") * col("n_dn")).as("m2"))
    d2.select(col("n_up"), col("n_dn"), col("n_runs"),
        when(col("n") >= 2L && col("m2") > 0L
          && (col("m2") - col("n")) > 0L,
          round((col("n_runs").cast("double")
            - (col("m2").cast("double") / col("n").cast("double")
              + 1.0))
            / sqrt(col("m2").cast("double")
              * (col("m2").cast("double") - col("n").cast("double"))
              / (col("n").cast("double") * col("n").cast("double")
                * (col("n").cast("double") - 1.0)))
            * 1000000.0).cast("long")).otherwise(0L).as("z_e6"))
      .orderBy("n_up")
  }

  private val q463Sql =
    s"""WITH day AS (
       |  $dayRevSql),
       |sgn AS (
       |  SELECT d, CASE WHEN y > py THEN 1 ELSE -1 END AS sg
       |  FROM (SELECT d, y, lag(y) OVER (ORDER BY d) AS py FROM day) t
       |  WHERE py IS NOT NULL AND y <> py),
       |runs AS (
       |  SELECT
       |    CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_up,
       |    CAST(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dn,
       |    CAST(sum(CASE WHEN ps IS NULL OR ps <> sg THEN 1 ELSE 0
       |      END) AS BIGINT) AS n_runs
       |  FROM (SELECT d, sg, lag(sg) OVER (ORDER BY d) AS ps
       |        FROM sgn) t),
       |d2 AS (
       |  SELECT n_up, n_dn, n_runs, n_up + n_dn AS n,
       |    2 * n_up * n_dn AS m2
       |  FROM runs)
       |SELECT n_up, n_dn, n_runs,
       |  CASE WHEN n >= 2 AND m2 > 0 AND (m2 - n) > 0 THEN
       |    CAST(round((CAST(n_runs AS DOUBLE)
       |      - (CAST(m2 AS DOUBLE) / CAST(n AS DOUBLE) + 1.0))
       |      / sqrt(CAST(m2 AS DOUBLE)
       |        * (CAST(m2 AS DOUBLE) - CAST(n AS DOUBLE))
       |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       |          * (CAST(n AS DOUBLE) - 1.0)))
       |      * 1000000.0) AS BIGINT)
       |    ELSE 0 END AS z_e6
       |FROM d2 ORDER BY n_up""".stripMargin

  // ---------------------------------------------------------------------
  // q464 — index-of-dispersion (overdispersion) audit per event
  // type: is per-user event volume Poisson (D≈1), clumped (D>1), or
  // regular (D<1) — the distributional sanity check behind every
  // Poisson assumption (and the parameter feed for negative-binomial
  // models). Counts sit on the FULL user×type grid (absent
  // combinations are exact zeros — the q453 grid discipline), the
  // sufficient statistics are exact, and D = s²/x̄ with its χ² =
  // D·(n−1) are one readout chain per type row. Type-universe
  // bounded output.
  // ---------------------------------------------------------------------
  private def q464(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.eventsSec(s, dir)
      .select(col("user_id").as("u"), col("event_type").as("t"))
      .pin()
    val users = ev.select("u").distinct()
    val types = ev.select("t").distinct()
    val cnt = ev.groupBy("u", "t").agg(count(lit(1)).as("c"))
    val grid = users.crossJoin(broadcast(types))
      .join(cnt, Seq("u", "t"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val st = grid.groupBy("t").agg(
      count(lit(1)).as("n"), sum("c").as("sc"),
      sum(col("c").cast(dec) * col("c")).as("scc"))
    val d2 = st.select(col("t"), col("n"), col("sc"),
      (col("n").cast(dec) * col("scc")
        - col("sc").cast(dec) * col("sc")).cast("double").as("qv"))
    d2.select(col("t").as("event_type"), col("n").as("n_users"),
        col("sc").as("n_events"),
        round(col("sc").cast("double") / col("n").cast("double")
          * 1000000.0).cast("long").as("mean_e6"),
        when(col("sc") > 0L && col("n") >= 2L,
          round(col("qv")
            / (col("n").cast("double") * (col("n").cast("double") - 1.0))
            / (col("sc").cast("double") / col("n").cast("double"))
            * 1000000.0).cast("long")).otherwise(0L).as("d_e6"))
      .orderBy("event_type")
  }

  private val q464Sql =
    """WITH ev AS (SELECT user_id AS u, event_type AS t FROM events),
      |users AS (SELECT DISTINCT u FROM ev),
      |types AS (SELECT DISTINCT t FROM ev),
      |cnt AS (SELECT u, t, CAST(count(*) AS BIGINT) AS c
      |  FROM ev GROUP BY u, t),
      |grid AS (
      |  SELECT users.u, types.t, coalesce(c, 0) AS c
      |  FROM users CROSS JOIN types
      |  LEFT JOIN cnt ON users.u = cnt.u AND types.t = cnt.t),
      |st AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS BIGINT) AS sc,
      |    sum(CAST(c AS HUGEINT) * c) AS scc
      |  FROM grid GROUP BY t),
      |d2 AS (
      |  SELECT t, n, sc,
      |    CAST(CAST(n AS HUGEINT) * scc
      |      - CAST(sc AS HUGEINT) * sc AS DOUBLE) AS qv
      |  FROM st)
      |SELECT t AS event_type, n AS n_users, sc AS n_events,
      |  CAST(round(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS mean_e6,
      |  CASE WHEN sc > 0 AND n >= 2 THEN
      |    CAST(round(qv
      |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
      |      / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
      |      * 1000000.0) AS BIGINT)
      |    ELSE 0 END AS d_e6
      |FROM d2 ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q465 — empirical-Bernstein confidence bound on the mean per-user
  // purchase RATE: the variance-adaptive finite-sample bound
  // (mean ± √(2V̂ln(2/δ)/n) + 7b·ln(2/δ)/(3(n−1)), b = 1, δ = 0.05)
  // that off-policy evaluation and bandit systems quote — beats
  // Hoeffding whenever the empirical variance is small, and the
  // Hoeffding half-width √(ln(2/δ)/(2n)) is emitted alongside to
  // show it. Rates are per-user e9 lattice (one division per user,
  // AT the user row); sufficient statistics exact; ln(2/δ) = ln(40)
  // evaluated identically on both engines.
  // ---------------------------------------------------------------------
  private def q465(s: SparkSession, dir: String): DataFrame = {
    val rate = Tables.eventsSec(s, dir)
      .groupBy(col("user_id"))
      .agg(round(sum((col("event_type") === "purchase").cast("long"))
        .cast("double") / count(lit(1)).cast("double")
        * 1000000000.0).cast("long").as("r_e9"))
    val st = rate.agg(count(lit(1)).as("n"), sum("r_e9").as("sr"),
      sum(col("r_e9").cast(dec) * col("r_e9")).as("srr"))
    val d2 = st.select(col("n"), col("sr"),
      (col("n").cast(dec) * col("srr")
        - col("sr").cast(dec) * col("sr")).cast("double").as("qv"))
    val d3 = d2.select(col("n"), col("sr"),
      (col("qv") / (col("n").cast("double")
        * (col("n").cast("double") - 1.0)) / 1.0e18).as("vhat"),
      (col("sr").cast("double") / col("n").cast("double") / 1.0e9)
        .as("mean"))
    val d4 = d3.select(col("n"), col("mean"), col("vhat"),
      (sqrt(lit(2.0) * col("vhat") * log(lit(40.0))
        / col("n").cast("double"))
        + lit(7.0) * log(lit(40.0))
          / (lit(3.0) * (col("n").cast("double") - 1.0))).as("ebw"),
      sqrt(log(lit(40.0)) / (lit(2.0) * col("n").cast("double")))
        .as("hw"))
    d4.select(col("n").as("n_users"),
        round(col("mean") * 1000000000.0).cast("long").as("mean_e9"),
        when(col("n") >= 2L,
          round(col("ebw") * 1000000000.0).cast("long"))
          .otherwise(0L).as("eb_half_e9"),
        round(col("hw") * 1000000000.0).cast("long")
          .as("hoeffding_half_e9"))
      .orderBy("n_users")
  }

  private val q465Sql =
    """WITH rate AS (
      |  SELECT user_id,
      |    CAST(round(CAST(sum(CASE WHEN event_type = 'purchase'
      |        THEN 1 ELSE 0 END) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) * 1000000000.0) AS BIGINT)
      |      AS r_e9
      |  FROM events GROUP BY user_id),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(r_e9) AS BIGINT) AS sr,
      |  sum(CAST(r_e9 AS HUGEINT) * r_e9) AS srr FROM rate),
      |d2 AS (
      |  SELECT n, sr,
      |    CAST(CAST(n AS HUGEINT) * srr
      |      - CAST(sr AS HUGEINT) * sr AS DOUBLE) AS qv
      |  FROM st),
      |d3 AS (
      |  SELECT n, sr,
      |    qv / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
      |      / 1.0e18 AS vhat,
      |    CAST(sr AS DOUBLE) / CAST(n AS DOUBLE) / 1.0e9 AS mean
      |  FROM d2),
      |d4 AS (
      |  SELECT n, mean, vhat,
      |    sqrt(2.0 * vhat * ln(40.0) / CAST(n AS DOUBLE))
      |      + 7.0 * ln(40.0) / (3.0 * (CAST(n AS DOUBLE) - 1.0))
      |      AS ebw,
      |    sqrt(ln(40.0) / (2.0 * CAST(n AS DOUBLE))) AS hw
      |  FROM d3)
      |SELECT n AS n_users,
      |  CAST(round(mean * 1000000000.0) AS BIGINT) AS mean_e9,
      |  CASE WHEN n >= 2 THEN
      |    CAST(round(ebw * 1000000000.0) AS BIGINT)
      |    ELSE 0 END AS eb_half_e9,
      |  CAST(round(hw * 1000000000.0) AS BIGINT)
      |    AS hoeffding_half_e9
      |FROM d4 ORDER BY n_users""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q434_apriori_triples" -> (q434 _),
    "q435_ols_regression" -> (q435 _),
    "q436_theil_sen_mk" -> (q436 _),
    "q437_revenue_cube" -> (q437 _),
    "q438_seq2_support" -> (q438 _),
    "q439_ransac_line" -> (q439 _),
    "q440_ccf_leadlag" -> (q440 _),
    "q441_hurst_rs" -> (q441 _),
    "q442_holt_walk" -> (q442 _),
    "q443_gumbel_return" -> (q443 _),
    "q444_ipf_raking" -> (q444 _),
    "q445_shapley_attribution" -> (q445 _),
    "q446_cmh_stratified" -> (q446 _),
    "q447_icc_reliability" -> (q447 _),
    "q448_krippendorff_alpha" -> (q448 _),
    "q449_regression_diag" -> (q449 _),
    "q450_kendall_tau_b" -> (q450 _),
    "q451_cronbach_alpha" -> (q451 _),
    "q452_pr_auc" -> (q452 _),
    "q453_diff_in_diff" -> (q453 _),
    "q454_dunn_posthoc" -> (q454 _),
    "q455_stream_holt" -> (q455 _),
    "q456_skipgram_pairs" -> (q456 _),
    "q457_bpe_merges" -> (q457 _),
    "q458_wilcoxon_signed_rank" -> (q458 _),
    "q459_siegel_slopes" -> (q459 _),
    "q460_partial_correlation" -> (q460 _),
    "q461_jarque_bera" -> (q461 _),
    "q462_granger_causality" -> (q462 _),
    "q463_runs_test" -> (q463 _),
    "q464_dispersion_index" -> (q464 _),
    "q465_empirical_bernstein" -> (q465 _))

  val oracle: Map[String, String] = Map(
    "q434_apriori_triples" -> q434Sql,
    "q435_ols_regression" -> q435Sql,
    "q436_theil_sen_mk" -> q436Sql,
    "q437_revenue_cube" -> q437Sql,
    "q438_seq2_support" -> q438Sql,
    "q439_ransac_line" -> q439Sql,
    "q440_ccf_leadlag" -> q440Sql,
    "q441_hurst_rs" -> q441Sql,
    "q442_holt_walk" -> q442Sql,
    "q443_gumbel_return" -> q443Sql,
    "q444_ipf_raking" -> q444Sql,
    "q445_shapley_attribution" -> q445Sql,
    "q446_cmh_stratified" -> q446Sql,
    "q447_icc_reliability" -> q447Sql,
    "q448_krippendorff_alpha" -> q448Sql,
    "q449_regression_diag" -> q449Sql,
    "q450_kendall_tau_b" -> q450Sql,
    "q451_cronbach_alpha" -> q451Sql,
    "q452_pr_auc" -> q452Sql,
    "q453_diff_in_diff" -> q453Sql,
    "q454_dunn_posthoc" -> q454Sql,
    "q455_stream_holt" -> q442Sql,
    "q456_skipgram_pairs" -> q456Sql,
    "q457_bpe_merges" -> q457Sql,
    "q458_wilcoxon_signed_rank" -> q458Sql,
    "q459_siegel_slopes" -> q459Sql,
    "q460_partial_correlation" -> q460Sql,
    "q461_jarque_bera" -> q461Sql,
    "q462_granger_causality" -> q462Sql,
    "q463_runs_test" -> q463Sql,
    "q464_dispersion_index" -> q464Sql,
    "q465_empirical_bernstein" -> q465Sql)
}
