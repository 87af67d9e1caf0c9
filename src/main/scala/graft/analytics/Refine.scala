package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.PlanStats.Pinned

/** Round-11 tier: the refinement ring a training-data platform runs
  * AFTER the corpus exists — forecast/spectral structure of the feed
  * (is next week's volume predictable? is there a weekly cycle?),
  * robust location/scale (medians the heavy tail can't bend),
  * fairness audits of the cheap quality filters (does the proxy
  * pass-rate fork across languages?), selection under a token budget
  * (which sources to keep), sketch-vs-exact estimation audits, and
  * causal readouts (discontinuity, propensity-stratified ATT).
  * No reference analogue (the reference delegates all analytics to
  * SQL; /root/reference/README.md:1-3).
  *
  * Cross-engine discipline as everywhere in the gate: per-row e2/e4
  * quantization at the scan, exact long/decimal(38,0) sufficient
  * statistics (HUGEINT in the oracle), per-row IEEE chains in
  * IDENTICAL operation order on both engines rounded AT THE ROW
  * before any cross-row sum (the q375 precedent), literal spectral
  * coefficients embedded identically on both engines (never libm
  * cos/sin at query time — q491), unique-tiebreak ORDER BY, no
  * Decimal/Float in final schemas.
  *
  * Scale posture: every statistic reduces to a universe- or
  * span-bounded grain before any window or pairwise construction —
  * the DAY grain (≤ observation span, tripwired at 1000 via the
  * [[dayGuard]] pattern), the e2-cents DISTINCT-VALUE grain
  * (≤ ~10⁵ rows), or a group enumeration (langs × buckets). The one
  * corpus-sized pass is always a map-side-combined aggregate.
  */
object Refine {

  private val dec = "decimal(38,0)"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Unpartitioned-window site for this module (allowlisted in
    * PlanQualitySpec's source lint): only ever applied to the
    * day grain (≤ observation span, tripwired at 1000 days), the
    * day-pair grain (≤ C(1000,2)), or an e2-quantized distinct-value
    * universe (≤ ~10⁵ rows) — bounded by a span/universe, never by
    * data volume. */
  private def axis(sort: Column*) = Window.orderBy(sort: _*)

  /** Day-grain purchase revenue in exact cents: the shared bounded
    * series for the forecast/spectral block. One map-side-combined
    * scan; the result is observation-span-sized. */
  private def daySeries(s: SparkSession, dir: String): DataFrame =
    Tables.eventsSec(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long").as("d"),
        col("y"))

  private val daySeriesSql =
    """SELECT CAST(CAST(date_trunc('second', ts) AS DATE)
      |    - DATE '1970-01-01' AS BIGINT) AS d,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY 1""".stripMargin

  /** Span tripwire: any day-grain pairwise/window construction in
    * this module guards on ≤1000 days (the Mining q436 discipline) —
    * a loud raise_error, never a silent quadratic blowup. */
  private def dayGuard(nDays: Column, what: String, inner: Column): Column =
    when(nDays <= 1000L, inner)
      .otherwise(raise_error(concat(
        lit(s"$what: day grain exceeded 1000 ("), nDays.cast("string"),
        lit(") — aggregate to a coarser grain or raise the bound " +
          "explicitly."))))

  // ---------------------------------------------------------------------
  // q490 — classical seasonal decomposition + exact trend: the
  // additive day-of-week index (per-dow mean minus grand mean, one
  // IEEE chain per GROUP) and the OLS trend of the deseasonalized
  // series (six exact cumulants, q435's discipline — one division at
  // readout). This is Holt–Winters' seasonal step made batch-exact:
  // the seasonal state is a 7-row table, the trend two scalars, and
  // the corpus pass is the one grouped scan in [[daySeries]].
  // ---------------------------------------------------------------------
  private def q490(s: SparkSession, dir: String): DataFrame = {
    val day = daySeries(s, dir).withColumn("dow", pmod(col("d"), lit(7L)))
      .pin()
    val tot = day.agg(sum(col("y")).cast(dec).as("sy"),
      count(lit(1)).as("n"))
    val sea = day.groupBy("dow")
      .agg(sum(col("y")).cast(dec).as("syw"), count(lit(1)).as("nw"))
      .crossJoin(broadcast(tot))
      .select(col("dow"), col("nw"),
        round((col("syw").cast("double") / col("nw").cast("double")
          - col("sy").cast("double") / col("n").cast("double")) * 100.0)
          .cast("long").as("s_e2"))
    val mn = day.agg(min(col("d")).as("d0"))
    val adj = day.join(broadcast(sea.select(col("dow"), col("s_e2"))), "dow")
      .crossJoin(broadcast(mn))
      .select((col("d") - col("d0")).as("x"),
        (col("y") * 100L - col("s_e2")).as("v"))
    val cum = adj.agg(count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"),
      sum(col("v").cast(dec)).as("sv"),
      sum((col("x").cast(dec)) * (col("v").cast(dec))).as("sxv"))
    val trend = cum.select(
      round((col("n").cast("double") * col("sxv").cast("double")
        - col("sx").cast("double") * col("sv").cast("double"))
        / (col("n").cast("double") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
        * 10000.0).cast("long").as("slope_e6"),
      round((col("sv").cast("double") / col("n").cast("double")
        - (col("n").cast("double") * col("sxv").cast("double")
          - col("sx").cast("double") * col("sv").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
          * (col("sx").cast("double") / col("n").cast("double")))
        / 100.0 * 100.0).cast("long").as("icept_e2"))
    sea.crossJoin(broadcast(trend))
      .select(col("dow"), col("nw"), col("s_e2"), col("slope_e6"),
        col("icept_e2"))
      .orderBy("dow")
  }

  private val q490Sql =
    s"""WITH day AS (
      |  SELECT d, y, d % 7 AS dow FROM ($daySeriesSql)),
      |tot AS (
      |  SELECT CAST(sum(y) AS DECIMAL(38,0)) AS sy, count(*) AS n
      |  FROM day),
      |sea AS (
      |  SELECT dow, count(*) AS nw,
      |    CAST(round((CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |      - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * 100.0)
      |      AS BIGINT) AS s_e2
      |  FROM day CROSS JOIN tot GROUP BY dow, sy, n),
      |mn AS (SELECT min(d) AS d0 FROM day),
      |adj AS (
      |  SELECT day.d - d0 AS x, day.y * 100 - s_e2 AS v
      |  FROM day JOIN sea ON day.dow = sea.dow CROSS JOIN mn),
      |cum AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(v) AS DECIMAL(38,0)) AS sv,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS sxv
      |  FROM adj),
      |trend AS (
      |  SELECT
      |    CAST(round((CAST(n AS DOUBLE) * CAST(sxv AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sv AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * 10000.0) AS BIGINT) AS slope_e6,
      |    CAST(round((CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(n AS DOUBLE) * CAST(sxv AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sv AS DOUBLE))
      |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
      |      / 100.0 * 100.0) AS BIGINT) AS icept_e2
      |  FROM cum)
      |SELECT dow, nw, s_e2, slope_e6, icept_e2
      |FROM sea CROSS JOIN trend
      |ORDER BY dow""".stripMargin

  // ---------------------------------------------------------------------
  // q491 — weekly-harmonic DFT power (Goertzel-by-aggregation): the
  // spectral energy of the revenue series at periods 7, 7/2, 7/3,
  // computed as FOUR exact integer sums per harmonic — Σ y·c[(t·k)%7]
  // and Σ y·s[(t·k)%7] with the cos/sin tables embedded as e6 LONG
  // LITERALS on BOTH engines (never libm at query time: cos() is not
  // IEEE-identical across engines; seven literals are). One scan,
  // map-side combine; sqrt only at the 3-row readout.
  // ---------------------------------------------------------------------
  private val cos7e6 = Seq(1000000L, 623490L, -222521L, -900969L,
    -900969L, -222521L, 623490L)
  private val sin7e6 = Seq(0L, 781831L, 974928L, 433884L,
    -433884L, -974928L, -781831L)

  private def q491(s: SparkSession, dir: String): DataFrame = {
    val day = daySeries(s, dir).pin()
    val mn = day.agg(min(col("d")).as("d0"))
    val ks = s.range(1, 4).select(col("id").as("k"))
    val withT = day.crossJoin(broadcast(mn))
      .select((col("d") - col("d0")).as("t"), col("y"))
      .crossJoin(broadcast(ks))
      .withColumn("j", pmod(col("t") * col("k"), lit(7L)))
      .withColumn("c", element_at(
        array(cos7e6.map(lit): _*), (col("j") + 1L).cast("int")))
      .withColumn("sn", element_at(
        array(sin7e6.map(lit): _*), (col("j") + 1L).cast("int")))
    withT.groupBy("k")
      .agg(sum((col("y") * col("c")).cast(dec)).as("a"),
        sum((col("y") * col("sn")).cast(dec)).as("b"))
      .select(col("k"), col("a").cast("long").as("a_e6"),
        col("b").cast("long").as("b_e6"),
        round(sqrt(col("a").cast("double") * col("a").cast("double")
          + col("b").cast("double") * col("b").cast("double")) / 1000.0)
          .cast("long").as("amp_e3"))
      .orderBy("k")
  }

  private val q491Sql = {
    val cl = cos7e6.mkString("[", ", ", "]")
    val sl = sin7e6.mkString("[", ", ", "]")
    s"""WITH day AS ($daySeriesSql),
      |mn AS (SELECT min(d) AS d0 FROM day),
      |ks AS (SELECT CAST(unnest(range(1, 4)) AS BIGINT) AS k),
      |wt AS (
      |  SELECT (d - d0) AS t, y, k,
      |    ((d - d0) * k) % 7 AS j
      |  FROM day CROSS JOIN mn CROSS JOIN ks),
      |cs AS (
      |  SELECT k, y,
      |    ($cl)[CAST(j AS INT) + 1] AS c,
      |    ($sl)[CAST(j AS INT) + 1] AS sn
      |  FROM wt),
      |agg AS (
      |  SELECT k, CAST(sum(y * c) AS DECIMAL(38,0)) AS a,
      |    CAST(sum(y * sn) AS DECIMAL(38,0)) AS b
      |  FROM cs GROUP BY k)
      |SELECT k, CAST(a AS BIGINT) AS a_e6, CAST(b AS BIGINT) AS b_e6,
      |  CAST(round(sqrt(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
      |    + CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) / 1000.0)
      |    AS BIGINT) AS amp_e3
      |FROM agg ORDER BY k""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q492 — Yule–Walker AR(2) fit of the revenue series: exact
  // n-scaled autocovariances (z_d = n·y_d − Σy keeps the demeaning
  // integer; γ_k = Σ z_d·z_{d+k} in decimal(38,0) over CALENDAR-lag
  // self-joins on the day grain) and the closed-form φ₁, φ₂ — the
  // lag-2 partial autocorrelation — at the 1-row readout. The
  // whole recursion of Durbin–Levinson at order 2, with zero
  // floating point before the final ratios.
  // ---------------------------------------------------------------------
  private def q492(s: SparkSession, dir: String): DataFrame = {
    val day = daySeries(s, dir).pin()
    val tot = day.agg(sum(col("y")).as("sy"), count(lit(1)).as("n"))
    val z = day.crossJoin(broadcast(tot))
      .select(col("d"), (col("n") * col("y") - col("sy")).as("z"),
        col("n"))
      .pin()
    def gamma(k: Int): DataFrame = {
      val a = z.select(col("d"), col("z").as("za"))
      val b = z.select((col("d") - lit(k.toLong)).as("d"),
        col("z").as("zb"))
      a.join(b, "d")
        .agg(sum(col("za").cast(dec) * col("zb").cast(dec)).as(s"g$k"))
    }
    val n1 = z.select(col("n")).limit(1)
    n1.crossJoin(broadcast(gamma(0))).crossJoin(broadcast(gamma(1)))
      .crossJoin(broadcast(gamma(2)))
      .select(col("n").as("n_days"),
        round(col("g1").cast("double") / col("g0").cast("double")
          * 1000000000.0).cast("long").as("r1_e9"),
        round(col("g2").cast("double") / col("g0").cast("double")
          * 1000000000.0).cast("long").as("r2_e9"),
        round((col("g1").cast("double") / col("g0").cast("double"))
          * (lit(1.0) - col("g2").cast("double") / col("g0").cast("double"))
          / (lit(1.0) - (col("g1").cast("double") / col("g0").cast("double"))
            * (col("g1").cast("double") / col("g0").cast("double")))
          * 1000000000.0).cast("long").as("phi1_e9"),
        round((col("g2").cast("double") / col("g0").cast("double")
          - (col("g1").cast("double") / col("g0").cast("double"))
            * (col("g1").cast("double") / col("g0").cast("double")))
          / (lit(1.0) - (col("g1").cast("double") / col("g0").cast("double"))
            * (col("g1").cast("double") / col("g0").cast("double")))
          * 1000000000.0).cast("long").as("phi2_e9"))
  }

  private val q492Sql =
    s"""WITH day AS ($daySeriesSql),
      |tot AS (
      |  SELECT CAST(sum(y) AS BIGINT) AS sy, count(*) AS n FROM day),
      |z AS (
      |  SELECT d, n * y - sy AS z, n FROM day CROSS JOIN tot),
      |g0 AS (
      |  SELECT CAST(sum(CAST(z AS DECIMAL(38,0)) * CAST(z AS
      |    DECIMAL(38,0))) AS DECIMAL(38,0)) AS g0 FROM z),
      |g1 AS (
      |  SELECT CAST(sum(CAST(a.z AS DECIMAL(38,0)) * CAST(b.z AS
      |    DECIMAL(38,0))) AS DECIMAL(38,0)) AS g1
      |  FROM z a JOIN z b ON a.d = b.d - 1),
      |g2 AS (
      |  SELECT CAST(sum(CAST(a.z AS DECIMAL(38,0)) * CAST(b.z AS
      |    DECIMAL(38,0))) AS DECIMAL(38,0)) AS g2
      |  FROM z a JOIN z b ON a.d = b.d - 2),
      |n1 AS (SELECT n FROM z LIMIT 1)
      |SELECT n AS n_days,
      |  CAST(round(CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE)
      |    * 1000000000.0) AS BIGINT) AS r1_e9,
      |  CAST(round(CAST(g2 AS DOUBLE) / CAST(g0 AS DOUBLE)
      |    * 1000000000.0) AS BIGINT) AS r2_e9,
      |  CAST(round((CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE))
      |    * (1.0 - CAST(g2 AS DOUBLE) / CAST(g0 AS DOUBLE))
      |    / (1.0 - (CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE))
      |      * (CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE)))
      |    * 1000000000.0) AS BIGINT) AS phi1_e9,
      |  CAST(round((CAST(g2 AS DOUBLE) / CAST(g0 AS DOUBLE)
      |    - (CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE))
      |      * (CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE)))
      |    / (1.0 - (CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE))
      |      * (CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE)))
      |    * 1000000000.0) AS BIGINT) AS phi2_e9
      |FROM n1 CROSS JOIN g0 CROSS JOIN g1 CROSS JOIN g2""".stripMargin

  // ---------------------------------------------------------------------
  // q493 — forecast-error suite for the seasonal-naive baseline
  // (ŷ_d = y_{d−7}): MAPE and sMAPE as per-row e9-rounded ratio
  // terms summed exactly, WAPE and MASE as pure integer-sum ratios
  // with ONE division each at the 1-row readout. q429 gates MASE
  // alone; this is the full suite a forecast scorecard carries, on
  // calendar-lag self-joins of the bounded day grain.
  // ---------------------------------------------------------------------
  private def q493(s: SparkSession, dir: String): DataFrame = {
    val day = daySeries(s, dir).pin()
    val f = day.select(col("d"), col("y"))
      .join(day.select((col("d") + 7L).as("d"), col("y").as("yf")), "d")
      .select(col("d"), col("y"), col("yf"),
        abs(col("y") - col("yf")).as("ae"),
        round(abs(col("y") - col("yf")).cast("double")
          / col("y").cast("double") * 1000000000.0).cast("long")
          .as("mape_t"),
        round(lit(2.0) * abs(col("y") - col("yf")).cast("double")
          / (col("y") + col("yf")).cast("double") * 1000000000.0)
          .cast("long").as("smape_t"))
    val d1 = day.select(col("d"), col("y"))
      .join(day.select((col("d") + 1L).as("d"), col("y").as("yp")), "d")
      .agg(sum(abs(col("y") - col("yp")).cast(dec)).as("sd1"),
        count(lit(1)).as("n1"))
    f.agg(count(lit(1)).as("n_f"),
        sum(col("ae").cast(dec)).as("sae"),
        sum(col("y").cast(dec)).as("syy"),
        sum(col("mape_t").cast(dec)).as("smt"),
        sum(col("smape_t").cast(dec)).as("sst"))
      .crossJoin(broadcast(d1))
      .select(col("n_f"),
        round(col("smt").cast("double") / col("n_f").cast("double"))
          .cast("long").as("mape_e9"),
        round(col("sst").cast("double") / col("n_f").cast("double"))
          .cast("long").as("smape_e9"),
        round(col("sae").cast("double") / col("syy").cast("double")
          * 1000000.0).cast("long").as("wape_e6"),
        round((col("sae").cast("double") / col("n_f").cast("double"))
          / (col("sd1").cast("double") / col("n1").cast("double"))
          * 1000000.0).cast("long").as("mase_e6"))
  }

  private val q493Sql =
    s"""WITH day AS ($daySeriesSql),
      |f AS (
      |  SELECT a.d, a.y, b.y AS yf, abs(a.y - b.y) AS ae,
      |    CAST(round(CAST(abs(a.y - b.y) AS DOUBLE)
      |      / CAST(a.y AS DOUBLE) * 1000000000.0) AS BIGINT) AS mape_t,
      |    CAST(round(2.0 * CAST(abs(a.y - b.y) AS DOUBLE)
      |      / CAST(a.y + b.y AS DOUBLE) * 1000000000.0) AS BIGINT)
      |      AS smape_t
      |  FROM day a JOIN day b ON a.d = b.d + 7),
      |d1 AS (
      |  SELECT CAST(sum(abs(a.y - b.y)) AS DECIMAL(38,0)) AS sd1,
      |    count(*) AS n1
      |  FROM day a JOIN day b ON a.d = b.d + 1),
      |agg AS (
      |  SELECT count(*) AS n_f,
      |    CAST(sum(ae) AS DECIMAL(38,0)) AS sae,
      |    CAST(sum(y) AS DECIMAL(38,0)) AS syy,
      |    CAST(sum(mape_t) AS DECIMAL(38,0)) AS smt,
      |    CAST(sum(smape_t) AS DECIMAL(38,0)) AS sst
      |  FROM f)
      |SELECT n_f,
      |  CAST(round(CAST(smt AS DOUBLE) / CAST(n_f AS DOUBLE))
      |    AS BIGINT) AS mape_e9,
      |  CAST(round(CAST(sst AS DOUBLE) / CAST(n_f AS DOUBLE))
      |    AS BIGINT) AS smape_e9,
      |  CAST(round(CAST(sae AS DOUBLE) / CAST(syy AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS wape_e6,
      |  CAST(round((CAST(sae AS DOUBLE) / CAST(n_f AS DOUBLE))
      |    / (CAST(sd1 AS DOUBLE) / CAST(n1 AS DOUBLE))
      |    * 1000000.0) AS BIGINT) AS mase_e6
      |FROM agg CROSS JOIN d1""".stripMargin

  // ---------------------------------------------------------------------
  // q494 — STL-lite residual outliers: trend = centered 7-day moving
  // average (explicit Σ/count over a ±3 CALENDAR range frame — never
  // engine-native avg, whose internal order could differ), seasonal =
  // per-dow mean of the detrended series, residual = y − trend −
  // seasonal, and the outlier fence is 2×1.4826×MAD of the residuals (2σ-equivalent —
  // a monitoring fence, not a discovery one)
  // with the MAD an EXACT lower median via row_number on the bounded
  // day axis. Everything e2-quantized at each stage boundary.
  // ---------------------------------------------------------------------
  private def q494(s: SparkSession, dir: String): DataFrame = {
    val day = daySeries(s, dir).pin()
    val wMa = axis(col("d")).rangeBetween(-3, 3)
    val tr = day
      .withColumn("sf", sum(col("y")).over(wMa))
      .withColumn("cf", count(lit(1)).over(wMa))
      .select(col("d"), col("y"),
        round(col("sf").cast("double") / col("cf").cast("double")
          * 100.0).cast("long").as("tr_e2"))
      .withColumn("detr", col("y") * 100L - col("tr_e2"))
      .withColumn("dow", pmod(col("d"), lit(7L)))
      .pin()
    val sea = tr.groupBy("dow")
      .agg(round(sum(col("detr")).cast("double")
        / count(lit(1)).cast("double")).cast("long").as("s_e2"))
    val res = tr.join(broadcast(sea), "dow")
      .select(col("d"), col("y"),
        (col("detr") - col("s_e2")).as("resid_e2"))
      .pin()
    val nc = res.agg(count(lit(1)).as("n"))
    val mad = res.crossJoin(broadcast(nc))
      .withColumn("ar", abs(col("resid_e2")))
      .withColumn("rn",
        row_number().over(axis(col("ar"), col("d"))).cast("long"))
      .filter(col("rn") === ((col("n") + 1L) / 2L).cast("long"))
      .select(dayGuard(col("n"), "stlOutliers", col("ar")).as("mad_e2"))
    res.crossJoin(broadcast(mad))
      .filter(abs(col("resid_e2")) * 10000L > lit(2L) * 14826L
        * col("mad_e2"))
      .select(col("d"), col("y"), col("resid_e2"), col("mad_e2"))
      .orderBy("d")
  }

  private val q494Sql =
    s"""WITH day AS ($daySeriesSql),
      |tr AS (
      |  SELECT d, y,
      |    CAST(round(CAST(sum(y) OVER w AS DOUBLE)
      |      / CAST(count(*) OVER w AS DOUBLE) * 100.0) AS BIGINT)
      |      AS tr_e2
      |  FROM day
      |  WINDOW w AS (ORDER BY d RANGE BETWEEN 3 PRECEDING
      |    AND 3 FOLLOWING)),
      |det AS (
      |  SELECT d, y, y * 100 - tr_e2 AS detr, d % 7 AS dow FROM tr),
      |sea AS (
      |  SELECT dow, CAST(round(CAST(sum(detr) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS s_e2
      |  FROM det GROUP BY dow),
      |res AS (
      |  SELECT d, y, detr - s_e2 AS resid_e2
      |  FROM det JOIN sea ON det.dow = sea.dow),
      |nc AS (SELECT count(*) AS n FROM res),
      |mad AS (
      |  SELECT ar AS mad_e2 FROM (
      |    SELECT abs(resid_e2) AS ar,
      |      row_number() OVER (ORDER BY abs(resid_e2), d) AS rn, n
      |    FROM res CROSS JOIN nc)
      |  WHERE rn = (n + 1) // 2)
      |SELECT d, y, resid_e2, mad_e2
      |FROM res CROSS JOIN mad
      |WHERE abs(resid_e2) * 10000 > 2 * 14826 * mad_e2
      |ORDER BY d""".stripMargin

  // ---------------------------------------------------------------------
  // q495 — Huber M-estimator of location (one IRLS step from the
  // median): the robust mean of click value. Median and MAD are
  // EXACT lower medians computed on the e2-cents DISTINCT-VALUE
  // grain (cumulative counts over the value universe — the q160
  // binned-ECDF shape, bounded by the universe, never data volume);
  // the reweighted pass computes per-row e9-rounded Huber weights
  // w = min(1, 1.345·MAD/|x−m|) and exactly sums w·x in decimal.
  // ---------------------------------------------------------------------
  /** Exact lower median of a (v, cnt) value-universe table. */
  private def universeMedian(counts: DataFrame): DataFrame = {
    val n = counts.agg(sum(col("cnt")).as("n"))
    counts.crossJoin(broadcast(n))
      .withColumn("cum", sum(col("cnt")).over(axis(col("v"))))
      .filter(col("cum") >= ((col("n") + 1L) / 2L).cast("long"))
      .agg(min(col("v")).as("med"))
  }

  private def q495(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.eventsSec(s, dir)
      .filter(col("event_type") === "click")
      .select(round(col("value") * 100).cast("long").as("x"))
      .pin()
    val counts = x.groupBy(col("x").as("v"))
      .agg(count(lit(1)).as("cnt")).pin()
    val m0 = universeMedian(counts)
    val madC = counts.crossJoin(broadcast(m0))
      .groupBy(abs(col("v") - col("med")).as("v"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = universeMedian(madC).select(col("med").as("mad"))
    val w = x.crossJoin(broadcast(m0)).crossJoin(broadcast(mad))
      .withColumn("w_e9",
        when(abs(col("x") - col("med")).cast("double") * 1000.0
          <= lit(1345.0) * col("mad").cast("double"), lit(1000000000L))
          .otherwise(round(lit(1345.0) * col("mad").cast("double")
            / (abs(col("x") - col("med")).cast("double") * 1000.0)
            * 1000000000.0).cast("long")))
    w.agg(count(lit(1)).as("n"),
        min(col("med")).as("m0"),
        min(col("mad")).as("mad"),
        sum(col("w_e9").cast(dec)).as("sw"),
        sum(col("w_e9").cast(dec) * col("x").cast(dec)).as("swx"))
      .select(col("n"), col("m0"), col("mad"),
        col("sw").cast("long").as("sum_w_e9"),
        round(col("swx").cast("double") / col("sw").cast("double")
          * 1000000.0).cast("long").as("m1_e6"))
  }

  private val q495Sql =
    """WITH x AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS x
      |  FROM events WHERE event_type = 'click'),
      |counts AS (SELECT x AS v, count(*) AS cnt FROM x GROUP BY x),
      |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts),
      |m0 AS (
      |  SELECT min(v) AS med FROM (
      |    SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, n
      |    FROM counts CROSS JOIN n)
      |  WHERE cum >= (n + 1) // 2),
      |madc AS (
      |  SELECT abs(v - med) AS v, CAST(sum(cnt) AS BIGINT) AS cnt
      |  FROM counts CROSS JOIN m0 GROUP BY abs(v - med)),
      |nm AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM madc),
      |mad AS (
      |  SELECT min(v) AS mad FROM (
      |    SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, n
      |    FROM madc CROSS JOIN nm)
      |  WHERE cum >= (n + 1) // 2),
      |w AS (
      |  SELECT x, med, mad,
      |    CASE WHEN CAST(abs(x - med) AS DOUBLE) * 1000.0
      |        <= 1345.0 * CAST(mad AS DOUBLE) THEN 1000000000
      |      ELSE CAST(round(1345.0 * CAST(mad AS DOUBLE)
      |        / (CAST(abs(x - med) AS DOUBLE) * 1000.0)
      |        * 1000000000.0) AS BIGINT) END AS w_e9
      |  FROM x CROSS JOIN m0 CROSS JOIN mad)
      |SELECT count(*) AS n, min(med) AS m0, min(mad) AS mad,
      |  CAST(CAST(sum(w_e9) AS DECIMAL(38,0)) AS BIGINT) AS sum_w_e9,
      |  CAST(round(CAST(sum(CAST(w_e9 AS DECIMAL(38,0))
      |    * CAST(x AS DECIMAL(38,0))) AS DOUBLE)
      |    / CAST(sum(CAST(w_e9 AS DECIMAL(38,0))) AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS m1_e6
      |FROM w""".stripMargin

  // ---------------------------------------------------------------------
  // q496 — Qn scale estimator (Rousseeuw–Croux) on the day grain:
  // the k-th order statistic of the C(n,2) pairwise absolute
  // differences with k = C(h,2), h = ⌊n/2⌋+1 — the 50%-breakdown
  // scale that needs no location estimate. Day-pair construction is
  // span-bounded and tripwired; the order statistic is an exact
  // row_number pick. Pure integers end to end.
  // ---------------------------------------------------------------------
  private def q496(s: SparkSession, dir: String): DataFrame = {
    val day = daySeries(s, dir).pin()
    val nc = day.agg(count(lit(1)).as("n"))
    val a = day.select(col("d").as("da"), col("y").as("ya"))
    val b = day.select(col("d").as("db"), col("y").as("yb"))
    val pairs = a.crossJoin(broadcast(b)).crossJoin(broadcast(nc))
      .filter(col("da") < col("db"))
      .select(col("n"),
        dayGuard(col("n"), "qnScale", abs(col("ya") - col("yb")))
          .as("diff"),
        col("da"), col("db"))
      .withColumn("h", (col("n") / 2L).cast("long") + 1L)
      .withColumn("kk", (col("h") * (col("h") - 1L) / 2L).cast("long"))
      .withColumn("rn", row_number()
        .over(axis(col("diff"), col("da"), col("db"))).cast("long"))
    pairs.filter(col("rn") === col("kk"))
      .select(col("n").as("n_days"), col("h"), col("kk").as("k"),
        col("diff").as("qn"))
  }

  private val q496Sql =
    s"""WITH day AS ($daySeriesSql),
      |nc AS (SELECT count(*) AS n FROM day),
      |pairs AS (
      |  SELECT n, abs(a.y - b.y) AS diff, a.d AS da, b.d AS db,
      |    n // 2 + 1 AS h, (n // 2 + 1) * (n // 2) // 2 AS kk,
      |    row_number() OVER (ORDER BY abs(a.y - b.y), a.d, b.d) AS rn
      |  FROM day a JOIN day b ON a.d < b.d CROSS JOIN nc)
      |SELECT n AS n_days, h, kk AS k, diff AS qn
      |FROM pairs WHERE rn = kk""".stripMargin

  // ---------------------------------------------------------------------
  // q497 — medcouple (robust skewness) on the day grain: the lower
  // median of the kernel h(x_i, x_j) = ((x_j−med) − (med−x_i)) /
  // (x_j − x_i) over strict pairs x_i < med < x_j. The kernel is one
  // per-PAIR e9-rounded IEEE chain on the span-bounded day-pair
  // grain; median/pick logic is exact row_number. (Ties AT the
  // median are excluded by the strict inequalities — documented
  // simplification of the zero-kernel tie rule.)
  // ---------------------------------------------------------------------
  private def q497(s: SparkSession, dir: String): DataFrame = {
    val day = daySeries(s, dir).pin()
    val nc = day.agg(count(lit(1)).as("n"))
    val med = day.crossJoin(broadcast(nc))
      .withColumn("rn", row_number().over(axis(col("y"), col("d")))
        .cast("long"))
      .filter(col("rn") === ((col("n") + 1L) / 2L).cast("long"))
      .select(dayGuard(col("n"), "medcouple", col("y")).as("med"))
    val lo = day.crossJoin(broadcast(med)).filter(col("y") < col("med"))
      .select(col("d").as("di"), col("y").as("xi"), col("med"))
    val hi = day.crossJoin(broadcast(med)).filter(col("y") > col("med"))
      .select(col("d").as("dj"), col("y").as("xj"))
    val h = lo.crossJoin(broadcast(hi))
      .select(col("di"), col("dj"),
        round(((col("xj") - col("med")) - (col("med") - col("xi")))
          .cast("double") / (col("xj") - col("xi")).cast("double")
          * 1000000000.0).cast("long").as("h_e9"))
    val nh = h.agg(count(lit(1)).as("nh"))
    h.crossJoin(broadcast(nh))
      .withColumn("rn", row_number()
        .over(axis(col("h_e9"), col("di"), col("dj"))).cast("long"))
      .filter(col("rn") === ((col("nh") + 1L) / 2L).cast("long"))
      .select(col("nh").as("n_pairs"), col("h_e9").as("mc_e9"))
  }

  private val q497Sql =
    s"""WITH day AS ($daySeriesSql),
      |nc AS (SELECT count(*) AS n FROM day),
      |med AS (
      |  SELECT y AS med FROM (
      |    SELECT y, row_number() OVER (ORDER BY y, d) AS rn, n
      |    FROM day CROSS JOIN nc)
      |  WHERE rn = (n + 1) // 2),
      |h AS (
      |  SELECT a.d AS di, b.d AS dj,
      |    CAST(round(CAST((b.y - med) - (med - a.y) AS DOUBLE)
      |      / CAST(b.y - a.y AS DOUBLE) * 1000000000.0) AS BIGINT)
      |      AS h_e9
      |  FROM day a CROSS JOIN med CROSS JOIN day b
      |  WHERE a.y < med AND b.y > med),
      |nh AS (SELECT count(*) AS nh FROM h)
      |SELECT nh AS n_pairs, h_e9 AS mc_e9 FROM (
      |  SELECT h_e9, row_number() OVER (ORDER BY h_e9, di, dj) AS rn,
      |    nh
      |  FROM h CROSS JOIN nh)
      |WHERE rn = (nh + 1) // 2""".stripMargin

  // ---------------------------------------------------------------------
  // q498 — biweight midvariance of click value: the robust variance
  // whose weights (1−u²)² taper smoothly to zero at u = (x−m)/(9·MAD)
  // = ±1. Median/MAD ride the same value-universe grain as q495; the
  // corpus pass computes per-row numerator/denominator terms as ONE
  // IEEE chain each, e0/e9-rounded AT THE ROW, summed exactly; the
  // n·ΣA/(ΣB)² readout is one division.
  // ---------------------------------------------------------------------
  private def q498(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.eventsSec(s, dir)
      .filter(col("event_type") === "click")
      .select(round(col("value") * 100).cast("long").as("x"))
      .pin()
    val counts = x.groupBy(col("x").as("v"))
      .agg(count(lit(1)).as("cnt")).pin()
    val m0 = universeMedian(counts)
    val madC = counts.crossJoin(broadcast(m0))
      .groupBy(abs(col("v") - col("med")).as("v"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = universeMedian(madC).select(col("med").as("mad"))
    val terms = x.crossJoin(broadcast(m0)).crossJoin(broadcast(mad))
      .withColumn("u", (col("x") - col("med")).cast("double")
        / (lit(9.0) * col("mad").cast("double")))
      .filter(abs(col("u")) < 1.0)
      .select(col("med"), col("mad"),
        round((col("x") - col("med")).cast("double")
          * (col("x") - col("med")).cast("double")
          * (lit(1.0) - col("u") * col("u"))
          * (lit(1.0) - col("u") * col("u"))
          * (lit(1.0) - col("u") * col("u"))
          * (lit(1.0) - col("u") * col("u"))).cast("long").as("a_t"),
        round((lit(1.0) - col("u") * col("u"))
          * (lit(1.0) - lit(5.0) * col("u") * col("u"))
          * 1000000000.0).cast("long").as("b_t"))
    terms.agg(count(lit(1)).as("n_used"),
        min(col("med")).as("m0"), min(col("mad")).as("mad"),
        sum(col("a_t").cast(dec)).as("sa"),
        sum(col("b_t").cast(dec)).as("sb"))
      .select(col("n_used"), col("m0"), col("mad"),
        round(col("n_used").cast("double") * col("sa").cast("double")
          / ((col("sb").cast("double") / 1000000000.0)
            * (col("sb").cast("double") / 1000000000.0)) * 1000.0)
          .cast("long").as("bwmv_e3"))
  }

  private val q498Sql =
    """WITH x AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS x
      |  FROM events WHERE event_type = 'click'),
      |counts AS (SELECT x AS v, count(*) AS cnt FROM x GROUP BY x),
      |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts),
      |m0 AS (
      |  SELECT min(v) AS med FROM (
      |    SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, n
      |    FROM counts CROSS JOIN n)
      |  WHERE cum >= (n + 1) // 2),
      |madc AS (
      |  SELECT abs(v - med) AS v, CAST(sum(cnt) AS BIGINT) AS cnt
      |  FROM counts CROSS JOIN m0 GROUP BY abs(v - med)),
      |nm AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM madc),
      |mad AS (
      |  SELECT min(v) AS mad FROM (
      |    SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, n
      |    FROM madc CROSS JOIN nm)
      |  WHERE cum >= (n + 1) // 2),
      |terms AS (
      |  SELECT med, mad,
      |    CAST(round(CAST(x - med AS DOUBLE) * CAST(x - med AS DOUBLE)
      |      * (1.0 - u * u) * (1.0 - u * u) * (1.0 - u * u)
      |      * (1.0 - u * u)) AS BIGINT) AS a_t,
      |    CAST(round((1.0 - u * u) * (1.0 - 5.0 * u * u)
      |      * 1000000000.0) AS BIGINT) AS b_t
      |  FROM (
      |    SELECT x, med, mad, CAST(x - med AS DOUBLE)
      |      / (9.0 * CAST(mad AS DOUBLE)) AS u
      |    FROM x CROSS JOIN m0 CROSS JOIN mad)
      |  WHERE abs(u) < 1.0)
      |SELECT count(*) AS n_used, min(med) AS m0, min(mad) AS mad,
      |  CAST(round(CAST(count(*) AS DOUBLE)
      |    * CAST(CAST(sum(a_t) AS DECIMAL(38,0)) AS DOUBLE)
      |    / ((CAST(CAST(sum(b_t) AS DECIMAL(38,0)) AS DOUBLE)
      |      / 1000000000.0)
      |      * (CAST(CAST(sum(b_t) AS DECIMAL(38,0)) AS DOUBLE)
      |        / 1000000000.0)) * 1000.0) AS BIGINT) AS bwmv_e3
      |FROM terms""".stripMargin

  // =====================================================================
  // Fairness-audit block (q499-q502): the cheap quality filter every
  // corpus pipeline runs (token count >= 60) audited across LANGUAGE
  // as the protected attribute, and across SOURCE for the 80% rule.
  // All rates are exact integer counts with one per-GROUP IEEE chain
  // at the readout (group grain: 5 langs / 20 sources — enumeration-
  // bounded, never data-sized).
  // =====================================================================

  /** Per-document audit grain: lang, source, token count, n_chars,
    * and the quality-filter verdict. ONE corpus scan feeds the whole
    * fairness block. */
  private def audited(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        size(graft.functions.Text.words(col("text"))).cast("long")
          .as("tk"))
      .withColumn("pass", (col("tk") >= 60L).cast("long"))

  private val auditedSql =
    """SELECT doc_id, lang, source, n_chars,
      |  CAST(len(list_filter(string_split(text, ' '),
      |    x -> length(x) > 0)) AS BIGINT) AS tk,
      |  CASE WHEN len(list_filter(string_split(text, ' '),
      |    x -> length(x) > 0)) >= 60 THEN 1 ELSE 0 END AS pass
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------------
  // q499 — demographic-parity audit of the quality filter: per-lang
  // pass rate, its gap against the corpus rate, and the Wilson 95%
  // lower bound (z = 1.96 as a literal, the q391 formula applied per
  // group) — the fairness scorecard row a filter ships with.
  // ---------------------------------------------------------------------
  private def q499(s: SparkSession, dir: String): DataFrame = {
    val a = audited(s, dir).pin()
    val tot = a.agg(sum(col("pass")).as("tp"), count(lit(1)).as("tn"))
    a.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("pass")).as("n_pass"))
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("n"), col("n_pass"),
        round(col("n_pass").cast("double") / col("n").cast("double")
          * 1000000.0).cast("long").as("rate_e6"),
        round((col("n_pass").cast("double") / col("n").cast("double")
          - col("tp").cast("double") / col("tn").cast("double"))
          * 1000000.0).cast("long").as("gap_e6"),
        round(((col("n_pass").cast("double") / col("n").cast("double")
          + lit(3.8416) / (lit(2.0) * col("n").cast("double")))
          - lit(1.96) * sqrt(
            (col("n_pass").cast("double") / col("n").cast("double"))
            * (lit(1.0) - col("n_pass").cast("double")
              / col("n").cast("double")) / col("n").cast("double")
            + lit(3.8416) / (lit(4.0) * col("n").cast("double")
              * col("n").cast("double"))))
          / (lit(1.0) + lit(3.8416) / col("n").cast("double"))
          * 1000000.0).cast("long").as("wilson_lo_e6"))
      .orderBy("lang")
  }

  private val q499Sql =
    s"""WITH a AS ($auditedSql),
      |tot AS (SELECT CAST(sum(pass) AS BIGINT) AS tp, count(*) AS tn
      |  FROM a),
      |g AS (SELECT lang, count(*) AS n, CAST(sum(pass) AS BIGINT)
      |  AS n_pass FROM a GROUP BY lang)
      |SELECT lang, n, n_pass,
      |  CAST(round(CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS rate_e6,
      |  CAST(round((CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE)
      |    - CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)) * 1000000.0)
      |    AS BIGINT) AS gap_e6,
      |  CAST(round(((CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE)
      |    + 3.8416 / (2.0 * CAST(n AS DOUBLE)))
      |    - 1.96 * sqrt(
      |      (CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE))
      |      * (1.0 - CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE))
      |      / CAST(n AS DOUBLE)
      |      + 3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
      |    / (1.0 + 3.8416 / CAST(n AS DOUBLE)) * 1000000.0)
      |    AS BIGINT) AS wilson_lo_e6
      |FROM g CROSS JOIN tot
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q500 — equalized-odds audit: ground truth = "long document"
  // (n_chars above the EXACT corpus lower median, computed on the
  // n_chars value universe), prediction = the token filter. Per-lang
  // TPR/FPR with gaps against the pooled rates — does the cheap
  // token proxy find long documents equally well in every language?
  // ---------------------------------------------------------------------
  private def q500(s: SparkSession, dir: String): DataFrame = {
    val a = audited(s, dir).pin()
    val med = universeMedian(
      a.groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("cnt")))
    val lab = a.crossJoin(broadcast(med))
      .withColumn("truth", (col("n_chars") > col("med")).cast("long"))
      .pin()
    val pool = lab.agg(
      sum(col("pass") * col("truth")).as("ptp"),
      sum(col("truth")).as("pt"),
      sum(col("pass") * (lit(1L) - col("truth"))).as("pfp"),
      sum(lit(1L) - col("truth")).as("pf"))
    lab.groupBy("lang")
      .agg(sum(col("pass") * col("truth")).as("tp"),
        sum((lit(1L) - col("pass")) * col("truth")).as("fn"),
        sum(col("pass") * (lit(1L) - col("truth"))).as("fp"),
        sum((lit(1L) - col("pass")) * (lit(1L) - col("truth"))).as("tn"))
      .crossJoin(broadcast(pool))
      .select(col("lang"), col("tp"), col("fn"), col("fp"), col("tn"),
        round(col("tp").cast("double")
          / (col("tp") + col("fn")).cast("double") * 1000000.0)
          .cast("long").as("tpr_e6"),
        round(col("fp").cast("double")
          / (col("fp") + col("tn")).cast("double") * 1000000.0)
          .cast("long").as("fpr_e6"),
        round((col("tp").cast("double")
          / (col("tp") + col("fn")).cast("double")
          - col("ptp").cast("double") / col("pt").cast("double"))
          * 1000000.0).cast("long").as("tpr_gap_e6"),
        round((col("fp").cast("double")
          / (col("fp") + col("tn")).cast("double")
          - col("pfp").cast("double") / col("pf").cast("double"))
          * 1000000.0).cast("long").as("fpr_gap_e6"))
      .orderBy("lang")
  }

  private val q500Sql =
    s"""WITH a AS ($auditedSql),
      |counts AS (SELECT n_chars AS v, count(*) AS cnt FROM a
      |  GROUP BY n_chars),
      |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts),
      |med AS (
      |  SELECT min(v) AS med FROM (
      |    SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, n
      |    FROM counts CROSS JOIN n)
      |  WHERE cum >= (n + 1) // 2),
      |lab AS (
      |  SELECT a.*, CASE WHEN n_chars > med THEN 1 ELSE 0 END AS truth
      |  FROM a CROSS JOIN med),
      |pool AS (
      |  SELECT CAST(sum(pass * truth) AS BIGINT) AS ptp,
      |    CAST(sum(truth) AS BIGINT) AS pt,
      |    CAST(sum(pass * (1 - truth)) AS BIGINT) AS pfp,
      |    CAST(sum(1 - truth) AS BIGINT) AS pf
      |  FROM lab),
      |g AS (
      |  SELECT lang,
      |    CAST(sum(pass * truth) AS BIGINT) AS tp,
      |    CAST(sum((1 - pass) * truth) AS BIGINT) AS fn,
      |    CAST(sum(pass * (1 - truth)) AS BIGINT) AS fp,
      |    CAST(sum((1 - pass) * (1 - truth)) AS BIGINT) AS tn
      |  FROM lab GROUP BY lang)
      |SELECT lang, tp, fn, fp, tn,
      |  CAST(round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS tpr_e6,
      |  CAST(round(CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS fpr_e6,
      |  CAST(round((CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
      |    - CAST(ptp AS DOUBLE) / CAST(pt AS DOUBLE)) * 1000000.0)
      |    AS BIGINT) AS tpr_gap_e6,
      |  CAST(round((CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE)
      |    - CAST(pfp AS DOUBLE) / CAST(pf AS DOUBLE)) * 1000000.0)
      |    AS BIGINT) AS fpr_gap_e6
      |FROM g CROSS JOIN pool
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q501 — per-group calibration (ECE) of a length-based score: the
  // score "P(long doc) = bucket midpoint" from n_chars deciles
  // (bucket = min(n_chars/60, 9) — a fixed grid, not a data-driven
  // one) audited per language: ECE = Sigma n_b/n * |obs_b - pred_b|
  // with the per-bucket gap e6-rounded BEFORE the weighted sum (the
  // round-at-the-row discipline applied at the bucket grain).
  // ---------------------------------------------------------------------
  private def q501(s: SparkSession, dir: String): DataFrame = {
    val a = audited(s, dir).pin()
    val med = universeMedian(
      a.groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("cnt")))
    val lab = a.crossJoin(broadcast(med))
      .withColumn("truth", (col("n_chars") > col("med")).cast("long"))
      .withColumn("b", least((col("n_chars") / 60L).cast("long"), lit(9L)))
    val buckets = lab.groupBy("lang", "b")
      .agg(count(lit(1)).as("nb"), sum(col("truth")).as("ob"))
      .withColumn("term_e6",
        round(abs(col("ob").cast("double") / col("nb").cast("double")
          - (col("b").cast("double") * 2.0 + 1.0) / 20.0) * 1000000.0)
          .cast("long"))
    buckets.groupBy("lang")
      .agg(sum(col("nb")).as("n"),
        sum(col("nb") * col("term_e6")).as("wsum"))
      .select(col("lang"), col("n"),
        round(col("wsum").cast("double") / col("n").cast("double"))
          .cast("long").as("ece_e6"))
      .orderBy("lang")
  }

  private val q501Sql =
    s"""WITH a AS ($auditedSql),
      |counts AS (SELECT n_chars AS v, count(*) AS cnt FROM a
      |  GROUP BY n_chars),
      |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts),
      |med AS (
      |  SELECT min(v) AS med FROM (
      |    SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, n
      |    FROM counts CROSS JOIN n)
      |  WHERE cum >= (n + 1) // 2),
      |lab AS (
      |  SELECT a.*, CASE WHEN n_chars > med THEN 1 ELSE 0 END AS truth,
      |    least(n_chars // 60, 9) AS b
      |  FROM a CROSS JOIN med),
      |buckets AS (
      |  SELECT lang, b, count(*) AS nb,
      |    CAST(sum(truth) AS BIGINT) AS ob,
      |    CAST(round(abs(CAST(sum(truth) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE)
      |      - (CAST(b AS DOUBLE) * 2.0 + 1.0) / 20.0) * 1000000.0)
      |      AS BIGINT) AS term_e6
      |  FROM lab GROUP BY lang, b)
      |SELECT lang, CAST(sum(nb) AS BIGINT) AS n,
      |  CAST(round(CAST(sum(nb * term_e6) AS DOUBLE)
      |    / CAST(sum(nb) AS DOUBLE)) AS BIGINT) AS ece_e6
      |FROM buckets GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q502 — disparate impact (the four-fifths rule) across SOURCES:
  // each source's filter pass rate against the best source's rate;
  // ratios under 0.8 flag. The reference group is data-driven (max
  // rate, source-name tiebreak) but resolved with exact integer
  // cross-multiplication — no float enters the argmax.
  // ---------------------------------------------------------------------
  private def q502(s: SparkSession, dir: String): DataFrame = {
    val g = audited(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("pass")).as("n_pass"))
      .pin()
    // argmax by exact cross-multiplication: best np/n, tiebreak source
    val ref = g.as("x").join(g.as("y"),
        col("y.n_pass") * col("x.n") > col("x.n_pass") * col("y.n")
          || (col("y.n_pass") * col("x.n") === col("x.n_pass") * col("y.n")
            && col("y.source") < col("x.source")), "left_anti")
      .select(col("source").as("ref_source"), col("n").as("rn"),
        col("n_pass").as("rnp"))
    g.crossJoin(broadcast(ref))
      .select(col("source"), col("n"), col("n_pass"), col("ref_source"),
        round(col("n_pass").cast("double") / col("n").cast("double")
          * 1000000.0).cast("long").as("rate_e6"),
        round((col("n_pass").cast("double") / col("n").cast("double"))
          / (col("rnp").cast("double") / col("rn").cast("double"))
          * 1000000.0).cast("long").as("di_e6"),
        (col("n_pass") * col("rn") * 5L
          < col("rnp") * col("n") * 4L).cast("long").as("flag80"))
      .orderBy("source")
  }

  private val q502Sql =
    s"""WITH a AS ($auditedSql),
      |g AS (SELECT source, count(*) AS n, CAST(sum(pass) AS BIGINT)
      |  AS n_pass FROM a GROUP BY source),
      |ref AS (
      |  SELECT x.source AS ref_source, x.n AS rn, x.n_pass AS rnp
      |  FROM g x
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM g y
      |    WHERE y.n_pass * x.n > x.n_pass * y.n
      |      OR (y.n_pass * x.n = x.n_pass * y.n
      |        AND y.source < x.source)))
      |SELECT source, n, n_pass, ref_source,
      |  CAST(round(CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS rate_e6,
      |  CAST(round((CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (CAST(rnp AS DOUBLE) / CAST(rn AS DOUBLE)) * 1000000.0)
      |    AS BIGINT) AS di_e6,
      |  CAST(CASE WHEN n_pass * rn * 5 < rnp * n * 4 THEN 1 ELSE 0
      |    END AS BIGINT) AS flag80
      |FROM g CROSS JOIN ref
      |ORDER BY source""".stripMargin

  // =====================================================================
  // Budget/selection block (q503-q505): which sources to keep under a
  // token budget, how to reweight domains, and how to order the
  // curriculum — all on enumeration-bounded group grains.
  // =====================================================================

  // ---------------------------------------------------------------------
  // q503 — greedy knapsack under a token budget: sources ranked by
  // exact-integer value density (quality docs per token, argsorted by
  // cross-multiplication-safe e9 density), taken greedily while the
  // cumulative token cost fits 40% of the corpus. The classic
  // fractional-knapsack upper bound rides along: greedy is optimal up
  // to the one split item, and the readout shows exactly where the
  // budget line cuts.
  // ---------------------------------------------------------------------
  private def q503(s: SparkSession, dir: String): DataFrame = {
    val g = audited(s, dir)
      .groupBy("source")
      .agg(sum(col("tk")).as("cost"), sum(col("pass")).as("value"))
      .pin()
    val tot = g.agg(sum(col("cost")).as("tc"))
    g.crossJoin(broadcast(tot))
      .withColumn("budget", ((col("tc") * 2L) / 5L).cast("long"))
      .withColumn("density_e9",
        round(col("value").cast("double") / col("cost").cast("double")
          * 1000000000.0).cast("long"))
      .withColumn("cum_cost", sum(col("cost"))
        .over(axis(col("density_e9").desc, col("source"))))
      .withColumn("picked", (col("cum_cost") <= col("budget"))
        .cast("long"))
      .select(col("source"), col("cost"), col("value"),
        col("density_e9"), col("cum_cost"), col("budget"), col("picked"))
      .orderBy(col("density_e9").desc, col("source"))
  }

  private val q503Sql =
    s"""WITH a AS ($auditedSql),
      |g AS (SELECT source, CAST(sum(tk) AS BIGINT) AS cost,
      |  CAST(sum(pass) AS BIGINT) AS value FROM a GROUP BY source),
      |tot AS (SELECT CAST(sum(cost) AS BIGINT) AS tc FROM g),
      |d AS (
      |  SELECT source, cost, value, (tc * 2) // 5 AS budget,
      |    CAST(round(CAST(value AS DOUBLE) / CAST(cost AS DOUBLE)
      |      * 1000000000.0) AS BIGINT) AS density_e9
      |  FROM g CROSS JOIN tot)
      |SELECT source, cost, value, density_e9,
      |  CAST(sum(cost) OVER (ORDER BY density_e9 DESC, source)
      |    AS BIGINT) AS cum_cost,
      |  budget,
      |  CAST(CASE WHEN CAST(sum(cost) OVER (ORDER BY density_e9 DESC,
      |    source) AS BIGINT) <= budget THEN 1 ELSE 0 END AS BIGINT)
      |    AS picked
      |FROM d
      |ORDER BY density_e9 DESC, source""".stripMargin

  // ---------------------------------------------------------------------
  // q504 — one DoReMi-style domain-reweighting step: languages whose
  // documents run longer than the corpus mean (the excess-loss proxy)
  // get exponentially upweighted (eta = 1 per 100 tokens of excess),
  // then the weights normalize. Exp evaluates once per GROUP
  // (5 rows), e9-rounded before the exact normalizing sum — the
  // multiplicative-weights update with zero data-sized float.
  // ---------------------------------------------------------------------
  private def q504(s: SparkSession, dir: String): DataFrame = {
    val a = audited(s, dir).pin()
    val tot = a.agg(sum(col("tk")).as("st"), count(lit(1)).as("nt"))
    val g = a.groupBy("lang")
      .agg(sum(col("tk")).as("sl"), count(lit(1)).as("nl"))
      .crossJoin(broadcast(tot))
      .withColumn("excess_e3",
        round((col("sl").cast("double") / col("nl").cast("double")
          - col("st").cast("double") / col("nt").cast("double"))
          * 1000.0).cast("long"))
      .withColumn("e_e9",
        round(exp(col("excess_e3").cast("double") / 100000.0)
          * 1000000000.0).cast("long"))
      .pin()
    val z = g.agg(sum(col("e_e9")).as("zz"))
    g.crossJoin(broadcast(z))
      .select(col("lang"), col("nl").as("n_docs"), col("excess_e3"),
        round(col("e_e9").cast("double") / col("zz").cast("double")
          * 1000000.0).cast("long").as("w_e6"))
      .orderBy("lang")
  }

  private val q504Sql =
    s"""WITH a AS ($auditedSql),
      |tot AS (SELECT CAST(sum(tk) AS BIGINT) AS st, count(*) AS nt
      |  FROM a),
      |g AS (
      |  SELECT lang, CAST(sum(tk) AS BIGINT) AS sl, count(*) AS nl
      |  FROM a GROUP BY lang),
      |e AS (
      |  SELECT lang, nl,
      |    CAST(round((CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
      |      - CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)) * 1000.0)
      |      AS BIGINT) AS excess_e3
      |  FROM g CROSS JOIN tot),
      |w AS (
      |  SELECT lang, nl, excess_e3,
      |    CAST(round(exp(CAST(excess_e3 AS DOUBLE) / 100000.0)
      |      * 1000000000.0) AS BIGINT) AS e_e9
      |  FROM e),
      |z AS (SELECT CAST(sum(e_e9) AS BIGINT) AS zz FROM w)
      |SELECT lang, nl AS n_docs, excess_e3,
      |  CAST(round(CAST(e_e9 AS DOUBLE) / CAST(zz AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS w_e6
      |FROM w CROSS JOIN z
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q505 — curriculum binning: documents split into difficulty
  // quartiles by EXACT n_chars quantile thresholds (cum*4 >= k*n on
  // the value universe — the lower-quantile convention, no
  // interpolation), then the (quartile x lang) census with mean
  // tokens per cell. The ordering a curriculum loader would replay.
  // ---------------------------------------------------------------------
  private def q505(s: SparkSession, dir: String): DataFrame = {
    val a = audited(s, dir).pin()
    val counts = a.groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val n = counts.agg(sum(col("cnt")).as("n"))
    val cum = counts.crossJoin(broadcast(n))
      .withColumn("cum", sum(col("cnt")).over(axis(col("v"))))
    val thr = (1 to 3).map { k =>
      cum.filter(col("cum") * 4L >= lit(k.toLong) * col("n"))
        .agg(min(col("v")).as(s"t$k"))
    }.reduce(_.crossJoin(_))
    a.crossJoin(broadcast(thr))
      .withColumn("q",
        (col("n_chars") > col("t1")).cast("long")
          + (col("n_chars") > col("t2")).cast("long")
          + (col("n_chars") > col("t3")).cast("long"))
      .groupBy("q", "lang")
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("tk")).cast("double")
          / count(lit(1)).cast("double") * 1000.0).cast("long")
          .as("mean_tk_e3"))
      .orderBy("q", "lang")
  }

  private val q505Sql =
    s"""WITH a AS ($auditedSql),
      |counts AS (SELECT n_chars AS v, count(*) AS cnt FROM a
      |  GROUP BY n_chars),
      |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts),
      |cum AS (
      |  SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, n
      |  FROM counts CROSS JOIN n),
      |thr AS (
      |  SELECT
      |    (SELECT min(v) FROM cum WHERE cum * 4 >= 1 * n) AS t1,
      |    (SELECT min(v) FROM cum WHERE cum * 4 >= 2 * n) AS t2,
      |    (SELECT min(v) FROM cum WHERE cum * 4 >= 3 * n) AS t3)
      |SELECT CAST(CASE WHEN n_chars > t1 THEN 1 ELSE 0 END
      |    + CASE WHEN n_chars > t2 THEN 1 ELSE 0 END
      |    + CASE WHEN n_chars > t3 THEN 1 ELSE 0 END AS BIGINT) AS q,
      |  lang, count(*) AS n_docs,
      |  CAST(round(CAST(sum(tk) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |    * 1000.0) AS BIGINT) AS mean_tk_e3
      |FROM a CROSS JOIN thr
      |GROUP BY 1, lang
      |ORDER BY q, lang""".stripMargin

  // =====================================================================
  // Estimation/causal/eval block (q506-q512).
  // =====================================================================

  // ---------------------------------------------------------------------
  // q506 — AMS F2 sketch audit: the second frequency moment of user
  // activity estimated by 16 sign-hash counters X_j = Sigma s_j(u)n_u
  // (each an exact integer sum; s_j from the portable hash's low
  // bit), read out as the lower median of X_j^2 against the EXACT F2
  // — the sketch-vs-truth gate discipline (q41/q228) applied to the
  // moment sketch. One corpus pass computes all 16 estimators AND
  // the exact moment; the median runs on a 16-row grain.
  // ---------------------------------------------------------------------
  private def q506(s: SparkSession, dir: String): DataFrame = {
    val nu = Tables.eventsSec(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n_u")).pin()
    val f2 = nu.agg(sum((col("n_u") * col("n_u")).cast(dec))
      .cast("long").as("f2_exact"))
    val js = s.range(16).select(col("id").as("j"))
    val ests = nu.crossJoin(broadcast(js))
      .withColumn("sgn", lit(1L) - lit(2L)
        * pmod(graft.functions.PortableHash.hash60(
          concat(lit("ams:"), col("j").cast("string"), lit(":"),
            col("user_id").cast("string"))), lit(2L)))
      .groupBy("j")
      .agg(sum(col("sgn") * col("n_u")).as("x"))
      // square in decimal(38,0) (the f2_exact discipline): raw long
      // x*x would silently wrap on Spark while DuckDB raises — cast
      // back to long only at this bounded 16-row grain.
      .select(col("j"),
        (col("x").cast(dec) * col("x").cast(dec)).cast("long").as("est"))
    val med = ests
      .withColumn("rn", row_number().over(axis(col("est"), col("j")))
        .cast("long"))
      .filter(col("rn") === 8L)
      .select(col("est").as("f2_est"))
    f2.crossJoin(broadcast(med))
      .select(col("f2_exact"), col("f2_est"),
        round((col("f2_est") - col("f2_exact")).cast("double")
          / col("f2_exact").cast("double") * 1000000.0).cast("long")
          .as("rel_err_e6"))
  }

  private val q506Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "concat('ams:', CAST(j AS VARCHAR), ':', CAST(user_id AS VARCHAR))")
    s"""WITH nu AS (
      |  SELECT user_id, count(*) AS n_u FROM events GROUP BY user_id),
      |f2 AS (
      |  SELECT CAST(sum(CAST(n_u AS DECIMAL(38,0))
      |    * CAST(n_u AS DECIMAL(38,0))) AS BIGINT) AS f2_exact
      |  FROM nu),
      |js AS (SELECT CAST(unnest(range(16)) AS BIGINT) AS j),
      |ests AS (
      |  SELECT j, CAST(CAST(x AS DECIMAL(38,0))
      |    * CAST(x AS DECIMAL(38,0)) AS BIGINT) AS est FROM (
      |    SELECT j, CAST(sum((1 - 2 * ($h % 2)) * n_u) AS BIGINT) AS x
      |    FROM nu CROSS JOIN js GROUP BY j)),
      |med AS (
      |  SELECT est AS f2_est FROM (
      |    SELECT est, row_number() OVER (ORDER BY est, j) AS rn
      |    FROM ests)
      |  WHERE rn = 8)
      |SELECT f2_exact, f2_est,
      |  CAST(round(CAST(f2_est - f2_exact AS DOUBLE)
      |    / CAST(f2_exact AS DOUBLE) * 1000000.0) AS BIGINT)
      |    AS rel_err_e6
      |FROM f2 CROSS JOIN med""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q507 — design effect of language-stratified sampling for the
  // mean-n_chars estimator (proportional allocation): deff =
  // Sigma W_h s_h^2 / s^2 from exact per-stratum cumulants — the
  // survey-sampling readout that says how much the strata buy. The
  // per-stratum variance is the one IEEE chain per GROUP; the deff
  // division happens once.
  // ---------------------------------------------------------------------
  private def q507(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("lang"), col("n_chars").as("x")).pin()
    val tot = d.agg(count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"))
    val g = d.groupBy("lang")
      .agg(count(lit(1)).as("nh"),
        sum(col("x").cast(dec)).as("sh"),
        sum((col("x") * col("x")).cast(dec)).as("shh"))
      .crossJoin(broadcast(tot))
      .withColumn("var_h_e3",
        round((col("nh").cast("double") * col("shh").cast("double")
          - col("sh").cast("double") * col("sh").cast("double"))
          / (col("nh").cast("double") * (col("nh").cast("double")
            - 1.0)) * 1000.0).cast("long"))
      .pin()
    val deff = g.agg(
        sum(col("nh") * col("var_h_e3")).as("wv"),
        min(col("n")).as("n"), min(col("sx").cast("double")).as("sxd"),
        min(col("sxx").cast("double")).as("sxxd"))
      .select(round(col("wv").cast("double") / col("n").cast("double")
        / ((col("n").cast("double") * col("sxxd")
          - col("sxd") * col("sxd"))
          / (col("n").cast("double") * (col("n").cast("double") - 1.0))
          * 1000.0) * 1000000.0).cast("long").as("deff_e6"))
    g.crossJoin(broadcast(deff))
      .select(col("lang"), col("nh"), col("var_h_e3"), col("deff_e6"))
      .orderBy("lang")
  }

  private val q507Sql =
    """WITH d AS (SELECT lang, n_chars AS x FROM documents),
      |tot AS (
      |  SELECT count(*) AS n, CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx
      |  FROM d),
      |g AS (
      |  SELECT lang, count(*) AS nh,
      |    CAST(round((CAST(count(*) AS DOUBLE)
      |      * CAST(sum(x * x) AS DOUBLE)
      |      - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
      |      / (CAST(count(*) AS DOUBLE)
      |        * (CAST(count(*) AS DOUBLE) - 1.0)) * 1000.0) AS BIGINT)
      |      AS var_h_e3
      |  FROM d GROUP BY lang),
      |deff AS (
      |  SELECT CAST(round(CAST(sum(nh * var_h_e3) AS DOUBLE)
      |    / CAST(n AS DOUBLE)
      |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
      |      * 1000.0) * 1000000.0) AS BIGINT) AS deff_e6
      |  FROM g CROSS JOIN tot GROUP BY n, sx, sxx)
      |SELECT lang, nh, var_h_e3, deff_e6
      |FROM g CROSS JOIN deff
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q510 — regression discontinuity at a price cutoff: orders within
  // a +/-5M-cent ($50k) bandwidth of the 25M-cent cutoff, local-linear
  // fit on EACH side (six exact cumulants per side, x centered at
  // the cutoff so the intercept IS the boundary value), jump =
  // alpha_right - alpha_left. The causal-inference readout with zero
  // float before the two per-side divisions.
  // ---------------------------------------------------------------------
  private def q510(s: SparkSession, dir: String): DataFrame = {
    val cutoff = 25000000L
    val bw = 5000000L
    val li = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("y"))
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"),
        (round(col("o_totalprice") * 100).cast("long") - cutoff)
          .as("x"))
      .filter(abs(col("x")) < bw && col("x") =!= 0L)
      .join(li, "o_orderkey")
      .withColumn("side", (col("x") > 0L).cast("long"))
      .pin()
    val fit = o.groupBy("side")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum((col("x").cast(dec)) * (col("x").cast(dec))).as("sxx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x").cast(dec)) * (col("y").cast(dec))).as("sxy"))
      .withColumn("beta_e9",
        round((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
          * 1000000000.0).cast("long"))
      .withColumn("alpha_e6",
        round((col("sy").cast("double") / col("n").cast("double")
          - (col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
            * (col("sx").cast("double") / col("n").cast("double")))
          * 1000000.0).cast("long"))
      .pin()
    val l = fit.filter(col("side") === 0L)
      .select(col("n").as("n_l"), col("alpha_e6").as("alpha_l_e6"),
        col("beta_e9").as("beta_l_e9"))
    val r = fit.filter(col("side") === 1L)
      .select(col("n").as("n_r"), col("alpha_e6").as("alpha_r_e6"),
        col("beta_e9").as("beta_r_e9"))
    l.crossJoin(broadcast(r))
      .select(col("n_l"), col("n_r"), col("alpha_l_e6"),
        col("alpha_r_e6"), col("beta_l_e9"), col("beta_r_e9"),
        (col("alpha_r_e6") - col("alpha_l_e6")).as("jump_e6"))
  }

  private val q510Sql =
    """WITH li AS (
      |  SELECT l_orderkey AS o_orderkey, count(*) AS y
      |  FROM lineitem GROUP BY 1),
      |o AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) - 25000000
      |      AS x, y,
      |    CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
      |      - 25000000 > 0 THEN 1 ELSE 0 END AS side
      |  FROM orders JOIN li USING (o_orderkey)
      |  WHERE abs(CAST(round(o_totalprice * 100) AS BIGINT)
      |    - 25000000) < 5000000
      |    AND CAST(round(o_totalprice * 100) AS BIGINT)
      |      - 25000000 != 0),
      |fit AS (
      |  SELECT side, count(*) AS n,
      |    CAST(round((CAST(count(*) AS DOUBLE)
      |      * CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS
      |        DECIMAL(38,0))) AS DOUBLE)
      |      - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
      |      / (CAST(count(*) AS DOUBLE)
      |        * CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS
      |          DECIMAL(38,0))) AS DOUBLE)
      |        - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
      |      * 1000000000.0) AS BIGINT) AS beta_e9,
      |    CAST(round((CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |      - (CAST(count(*) AS DOUBLE)
      |        * CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS
      |          DECIMAL(38,0))) AS DOUBLE)
      |        - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
      |        / (CAST(count(*) AS DOUBLE)
      |          * CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS
      |            DECIMAL(38,0))) AS DOUBLE)
      |          - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
      |        * (CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE)))
      |      * 1000000.0) AS BIGINT) AS alpha_e6
      |  FROM o GROUP BY side)
      |SELECT l.n AS n_l, r.n AS n_r,
      |  l.alpha_e6 AS alpha_l_e6, r.alpha_e6 AS alpha_r_e6,
      |  l.beta_e9 AS beta_l_e9, r.beta_e9 AS beta_r_e9,
      |  r.alpha_e6 - l.alpha_e6 AS jump_e6
      |FROM (SELECT * FROM fit WHERE side = 0) l
      |CROSS JOIN (SELECT * FROM fit WHERE side = 1) r""".stripMargin

  // ---------------------------------------------------------------------
  // q511 — stratified-propensity ATT: treated = heavy purchaser
  // (purchase count above the exact corpus median), outcome = total
  // click value, strata = activity bands. Within each stratum with
  // both arms present, the treated-vs-control outcome gap weights by
  // the stratum's treated mass — the coarsened-propensity estimator
  // (q472's CEM discipline with a propensity-style weighting
  // readout). Per-stratum IEEE chains only at the stratum grain.
  // ---------------------------------------------------------------------
  private def q511(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.eventsSec(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("ne"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"),
        sum(when(col("event_type") === "click",
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("y"))
      .pin()
    val med = universeMedian(
      u.groupBy(col("np").as("v")).agg(count(lit(1)).as("cnt")))
    val lab = u.crossJoin(broadcast(med))
      .withColumn("tr", (col("np") > col("med")).cast("long"))
      .withColumn("st", least(greatest((col("ne") - 40L) / 10L,
        lit(0L)).cast("long"), lit(4L)))
    val g = lab.groupBy("st")
      .agg(sum(col("tr")).as("nt"),
        sum(lit(1L) - col("tr")).as("nc"),
        sum(col("tr") * col("y")).as("syt"),
        sum((lit(1L) - col("tr")) * col("y")).as("syc"))
      .filter(col("nt") > 0L && col("nc") > 0L)
      .withColumn("gap_e3",
        round((col("syt").cast("double") / col("nt").cast("double")
          - col("syc").cast("double") / col("nc").cast("double"))
          * 1000.0).cast("long"))
      .pin()
    val att = g.agg(sum(col("nt")).as("t_tot"),
        sum(col("nt") * col("gap_e3")).as("wg"))
      .select(round(col("wg").cast("double")
        / col("t_tot").cast("double")).cast("long").as("att_e3"))
    g.crossJoin(broadcast(att))
      .select(col("st"), col("nt"), col("nc"), col("gap_e3"),
        col("att_e3"))
      .orderBy("st")
  }

  private val q511Sql =
    """WITH u AS (
      |  SELECT user_id, count(*) AS ne,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      |      END) AS BIGINT) AS np,
      |    CAST(sum(CASE WHEN event_type = 'click'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events GROUP BY user_id),
      |counts AS (SELECT np AS v, count(*) AS cnt FROM u GROUP BY np),
      |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts),
      |med AS (
      |  SELECT min(v) AS med FROM (
      |    SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, n
      |    FROM counts CROSS JOIN n)
      |  WHERE cum >= (n + 1) // 2),
      |lab AS (
      |  SELECT u.*, CASE WHEN np > med THEN 1 ELSE 0 END AS tr,
      |    least(greatest((ne - 40) // 10, 0), 4) AS st
      |  FROM u CROSS JOIN med),
      |g AS (
      |  SELECT st, CAST(sum(tr) AS BIGINT) AS nt,
      |    CAST(sum(1 - tr) AS BIGINT) AS nc,
      |    CAST(round((CAST(sum(tr * y) AS DOUBLE)
      |      / CAST(sum(tr) AS DOUBLE)
      |      - CAST(sum((1 - tr) * y) AS DOUBLE)
      |      / CAST(sum(1 - tr) AS DOUBLE)) * 1000.0) AS BIGINT)
      |      AS gap_e3
      |  FROM lab GROUP BY st
      |  HAVING sum(tr) > 0 AND sum(1 - tr) > 0),
      |att AS (
      |  SELECT CAST(round(CAST(sum(nt * gap_e3) AS DOUBLE)
      |    / CAST(sum(nt) AS DOUBLE)) AS BIGINT) AS att_e3
      |  FROM g)
      |SELECT st, nt, nc, gap_e3, att_e3
      |FROM g CROSS JOIN att
      |ORDER BY st""".stripMargin

  // ---------------------------------------------------------------------
  // q512 — Murphy decomposition of the Brier score (REL/RES/UNC):
  // score = each user's e2-rounded click share, outcome = heavy
  // purchaser. Bins are the score's own e2 universe (<=101 rows);
  // the per-bin reliability and resolution terms e9-round BEFORE the
  // n_k-weighted exact sums, and REL - RES + UNC reconstructs the
  // Brier score — the calibration identity as an auditable equation.
  // ---------------------------------------------------------------------
  private def q512(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.eventsSec(s, dir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("ncl"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("nv"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"))
      .filter(col("ncl") + col("nv") > 0L)
      .pin()
    val med = universeMedian(
      u.groupBy(col("np").as("v")).agg(count(lit(1)).as("cnt")))
    val lab = u.crossJoin(broadcast(med))
      .select(round(col("ncl").cast("double")
        / (col("ncl") + col("nv")).cast("double") * 100.0)
        .cast("long").as("b"),
        (col("np") > col("med")).cast("long").as("o"))
      .pin()
    val tot = lab.agg(count(lit(1)).as("n"), sum(col("o")).as("so"))
    val bins = lab.groupBy("b")
      .agg(count(lit(1)).as("nk"), sum(col("o")).as("ok"))
      .crossJoin(broadcast(tot))
      .select(col("b"), col("nk"), col("n"), col("so"),
        round((col("b").cast("double") / 100.0
          - col("ok").cast("double") / col("nk").cast("double"))
          * (col("b").cast("double") / 100.0
            - col("ok").cast("double") / col("nk").cast("double"))
          * 1000000000.0).cast("long").as("rel_t_e9"),
        round((col("ok").cast("double") / col("nk").cast("double")
          - col("so").cast("double") / col("n").cast("double"))
          * (col("ok").cast("double") / col("nk").cast("double")
            - col("so").cast("double") / col("n").cast("double"))
          * 1000000000.0).cast("long").as("res_t_e9"))
    bins.groupBy("n", "so")
      .agg(sum(col("nk") * col("rel_t_e9")).as("srel"),
        sum(col("nk") * col("res_t_e9")).as("sres"))
      .select(col("n"),
        round(col("srel").cast("double") / col("n").cast("double"))
          .cast("long").as("rel_e9"),
        round(col("sres").cast("double") / col("n").cast("double"))
          .cast("long").as("res_e9"),
        round((col("so").cast("double") / col("n").cast("double"))
          * (lit(1.0) - col("so").cast("double")
            / col("n").cast("double")) * 1000000000.0).cast("long")
          .as("unc_e9"))
  }

  private val q512Sql =
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ncl,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS nv,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      |      END) AS BIGINT) AS np
      |  FROM events GROUP BY user_id
      |  HAVING sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |    + sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) > 0),
      |counts AS (SELECT np AS v, count(*) AS cnt FROM u GROUP BY np),
      |n0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts),
      |med AS (
      |  SELECT min(v) AS med FROM (
      |    SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, n
      |    FROM counts CROSS JOIN n0)
      |  WHERE cum >= (n + 1) // 2),
      |lab AS (
      |  SELECT CAST(round(CAST(ncl AS DOUBLE)
      |      / CAST(ncl + nv AS DOUBLE) * 100.0) AS BIGINT) AS b,
      |    CASE WHEN np > med THEN 1 ELSE 0 END AS o
      |  FROM u CROSS JOIN med),
      |tot AS (SELECT count(*) AS n, CAST(sum(o) AS BIGINT) AS so
      |  FROM lab),
      |bins AS (
      |  SELECT b, count(*) AS nk, n, so,
      |    CAST(round((CAST(b AS DOUBLE) / 100.0
      |      - CAST(sum(o) AS DOUBLE) / CAST(count(*) AS DOUBLE))
      |      * (CAST(b AS DOUBLE) / 100.0
      |        - CAST(sum(o) AS DOUBLE) / CAST(count(*) AS DOUBLE))
      |      * 1000000000.0) AS BIGINT) AS rel_t_e9,
      |    CAST(round((CAST(sum(o) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |      - CAST(so AS DOUBLE) / CAST(n AS DOUBLE))
      |      * (CAST(sum(o) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |        - CAST(so AS DOUBLE) / CAST(n AS DOUBLE))
      |      * 1000000000.0) AS BIGINT) AS res_t_e9
      |  FROM lab CROSS JOIN tot GROUP BY b, n, so)
      |SELECT n,
      |  CAST(round(CAST(sum(nk * rel_t_e9) AS DOUBLE)
      |    / CAST(n AS DOUBLE)) AS BIGINT) AS rel_e9,
      |  CAST(round(CAST(sum(nk * res_t_e9) AS DOUBLE)
      |    / CAST(n AS DOUBLE)) AS BIGINT) AS res_e9,
      |  CAST(round((CAST(so AS DOUBLE) / CAST(n AS DOUBLE))
      |    * (1.0 - CAST(so AS DOUBLE) / CAST(n AS DOUBLE))
      |    * 1000000000.0) AS BIGINT) AS unc_e9
      |FROM bins GROUP BY n, so""".stripMargin

  // =====================================================================
  // Graph-cohesion block (q508-q509) over the q144/q191 synthetic
  // co-purchase projection (lineitem partkey<->suppkey mod 4000,
  // sparse 1/12 slice): degree-oriented triangle machinery — the
  // skew-proof O(m^1.5) shape — reused for edge support and
  // community quality.
  // =====================================================================

  /** Distinct undirected edges (x > y) of the sparse co-purchase
    * projection. */
  private def trussEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 12 === 1)
      .select(greatest(col("l_partkey") % 4000, col("l_suppkey") % 4000)
        .as("x"),
        least(col("l_partkey") % 4000, col("l_suppkey") % 4000).as("y"))
      .filter(col("x") =!= col("y"))
      .distinct()

  private val trussEdgesSql =
    """SELECT DISTINCT
      |  greatest(l_partkey % 4000, l_suppkey % 4000) AS x,
      |  least(l_partkey % 4000, l_suppkey % 4000) AS y
      |FROM lineitem
      |WHERE l_orderkey % 12 = 1
      |  AND l_partkey % 4000 != l_suppkey % 4000""".stripMargin

  /** Per-edge triangle support via degree-oriented wedges (each
    * triangle found once from its lowest-(degree,id) corner, then
    * credited to all three edges) — the q144 skew discipline. */
  private def edgeSupport(e: DataFrame): DataFrame = {
    val deg = e.select(col("x").as("n")).union(e.select(col("y")))
      .groupBy("n")
      .agg((count(lit(1)) * 1000000000L + col("n")).as("k"))
    val oRaw = e
      .join(deg.select(col("n").as("x"), col("k").as("kx")), "x")
      .join(deg.select(col("n").as("y"), col("k").as("ky")), "y")
      .select(
        when(col("kx") < col("ky"), col("x")).otherwise(col("y"))
          .as("src"),
        when(col("kx") < col("ky"), col("y")).otherwise(col("x"))
          .as("dst"),
        greatest(col("kx"), col("ky")).as("kdst"))
    // adaptive wedge width (the r11 Dedup adaptive-expansion pattern,
    // applied per the r11 verdict): wedge mass Σ C(outdeg,2) probed
    // as one 1-row aggregate on the narrow degree joins over the
    // caller-pinned edge set; both wedge-grain shuffles (the wedge
    // self-join and the closing-edge semi-join) widen to
    // ceil(mass/4M) when the session default would overload them —
    // same plan at gate scale, flat per-wedge cost at the ×30 point.
    // probe gated on the pinned edge count (r13): small peels prove
    // via the mass upper bound that the session width suffices and
    // skip the probe's aggregate job
    val width = graft.operators.Graph.wedgeWidth(oRaw, Some(e.count()))
    val session = e.sparkSession.sessionState.conf.numShufflePartitions
    val o = if (width > session) oRaw.repartition(width, col("src")).pin()
            else oRaw
    val w = o.as("o1").join(o.as("o2"),
        col("o1.src") === col("o2.src")
          && col("o1.kdst") < col("o2.kdst"))
      .select(col("o1.src").as("u"), col("o1.dst").as("v"),
        col("o2.dst").as("w"))
    val wLaid =
      if (width > session) w.repartition(width, col("v"), col("w"))
      else w
    val tris = wLaid.join(o.select(col("src").as("v"), col("dst").as("w")),
      Seq("v", "w"), "left_semi")
    val triEdges = tris.select(greatest(col("u"), col("v")).as("x"),
        least(col("u"), col("v")).as("y"))
      .union(tris.select(greatest(col("u"), col("w")),
        least(col("u"), col("w"))))
      .union(tris.select(greatest(col("v"), col("w")),
        least(col("v"), col("w"))))
      .groupBy("x", "y").agg(count(lit(1)).as("support"))
    e.join(triEdges, Seq("x", "y"), "left")
      .select(col("x"), col("y"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /** One support-block of the truss oracle, parameterized by the
    * input edge relation name (emitted twice — one per peel round). */
  private def supportSqlBlock(in: String, pre: String): String =
    s"""${pre}deg AS (
      |  SELECT n, CAST(count(*) AS BIGINT) * 1000000000 + n AS k
      |  FROM (SELECT x AS n FROM $in UNION ALL SELECT y FROM $in)
      |  GROUP BY n),
      |${pre}o AS (
      |  SELECT CASE WHEN dx.k < dy.k THEN e.x ELSE e.y END AS src,
      |    CASE WHEN dx.k < dy.k THEN e.y ELSE e.x END AS dst,
      |    greatest(dx.k, dy.k) AS kdst
      |  FROM $in e JOIN ${pre}deg dx ON dx.n = e.x
      |  JOIN ${pre}deg dy ON dy.n = e.y),
      |${pre}tris AS (
      |  SELECT wd.u, wd.v, wd.w FROM (
      |    SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
      |    FROM ${pre}o o1 JOIN ${pre}o o2 ON o1.src = o2.src
      |    WHERE o1.kdst < o2.kdst) wd
      |  WHERE EXISTS (SELECT 1 FROM ${pre}o o
      |    WHERE o.src = wd.v AND o.dst = wd.w)),
      |${pre}sup AS (
      |  SELECT e.x, e.y, CAST(COALESCE(t.c, 0) AS BIGINT) AS support
      |  FROM $in e LEFT JOIN (
      |    SELECT x, y, count(*) AS c FROM (
      |      SELECT greatest(u, v) AS x, least(u, v) AS y
      |        FROM ${pre}tris
      |      UNION ALL SELECT greatest(u, w), least(u, w)
      |        FROM ${pre}tris
      |      UNION ALL SELECT greatest(v, w), least(v, w)
      |        FROM ${pre}tris) GROUP BY x, y) t
      |    ON t.x = e.x AND t.y = e.y)""".stripMargin

  // ---------------------------------------------------------------------
  // q508 — 3-truss peel (two rounds): every edge's triangle support,
  // peel edges with support 0, recompute support on the survivors —
  // each round is one degree-oriented triangle pass (O(m^1.5), no
  // skew cliff), and the round count is a CONSTANT of the query, not
  // data-driven (the bounded-rounds discipline of the graph tier).
  // Readout: surviving edges with their before/after support.
  // ---------------------------------------------------------------------
  private def q508(s: SparkSession, dir: String): DataFrame = {
    val e0 = trussEdges(s, dir).pin()
    val s0 = edgeSupport(e0).pin()
    val e1 = s0.filter(col("support") > 0L).select("x", "y").pin()
    val s1 = edgeSupport(e1)
    s1.filter(col("support") > 0L)
      .join(s0.select(col("x"), col("y"), col("support").as("sup0")),
        Seq("x", "y"))
      .select(col("x"), col("y"), col("sup0"),
        col("support").as("sup1"))
      .orderBy("x", "y")
  }

  private val q508Sql =
    s"""WITH e0 AS ($trussEdgesSql),
      |${supportSqlBlock("e0", "r0")},
      |e1 AS (SELECT x, y FROM r0sup WHERE support > 0),
      |${supportSqlBlock("e1", "r1")}
      |SELECT s1.x, s1.y, s0.support AS sup0, s1.support AS sup1
      |FROM r1sup s1 JOIN r0sup s0 ON s0.x = s1.x AND s0.y = s1.y
      |WHERE s1.support > 0
      |ORDER BY s1.x, s1.y""".stripMargin

  // ---------------------------------------------------------------------
  // q509 — modularity of a fixed partition (community = node % 10)
  // on the co-purchase projection: Q = Sigma_c (m_c/m - (d_c/2m)^2)
  // from exact intra-edge and degree-mass counts — the community-
  // quality readout, one number per community plus the total, with
  // the only floats in the 10-row readout.
  // ---------------------------------------------------------------------
  private def q509(s: SparkSession, dir: String): DataFrame = {
    val e = trussEdges(s, dir).pin()
    val m = e.agg(count(lit(1)).as("m"))
    val degC = e.select(col("x").as("n")).union(e.select(col("y")))
      .select(pmod(col("n"), lit(10L)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("dc"))
    val intra = e.filter(pmod(col("x"), lit(10L))
        === pmod(col("y"), lit(10L)))
      .groupBy(pmod(col("x"), lit(10L)).as("c"))
      .agg(count(lit(1)).as("mc"))
    val terms = degC.join(intra, Seq("c"), "left")
      .crossJoin(broadcast(m))
      .select(col("c"), coalesce(col("mc"), lit(0L)).as("mc"),
        col("dc"), col("m"))
      .withColumn("q_e9",
        round((col("mc").cast("double") / col("m").cast("double")
          - (col("dc").cast("double")
            / (lit(2.0) * col("m").cast("double")))
            * (col("dc").cast("double")
              / (lit(2.0) * col("m").cast("double"))))
          * 1000000000.0).cast("long"))
      .pin()
    val tot = terms.agg(sum(col("q_e9")).as("q_total_e9"))
    terms.crossJoin(broadcast(tot))
      .select(col("c"), col("mc"), col("dc"), col("q_e9"),
        col("q_total_e9"))
      .orderBy("c")
  }

  private val q509Sql =
    s"""WITH e AS ($trussEdgesSql),
      |m AS (SELECT count(*) AS m FROM e),
      |degc AS (
      |  SELECT n % 10 AS c, CAST(count(*) AS BIGINT) AS dc
      |  FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e)
      |  GROUP BY n % 10),
      |intra AS (
      |  SELECT x % 10 AS c, CAST(count(*) AS BIGINT) AS mc
      |  FROM e WHERE x % 10 = y % 10 GROUP BY x % 10),
      |terms AS (
      |  SELECT degc.c, CAST(COALESCE(mc, 0) AS BIGINT) AS mc, dc,
      |    CAST(round((CAST(COALESCE(mc, 0) AS DOUBLE)
      |      / CAST(m AS DOUBLE)
      |      - (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
      |        * (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))))
      |      * 1000000000.0) AS BIGINT) AS q_e9
      |  FROM degc LEFT JOIN intra ON degc.c = intra.c CROSS JOIN m),
      |tot AS (SELECT CAST(sum(q_e9) AS BIGINT) AS q_total_e9
      |  FROM terms)
      |SELECT c, mc, dc, q_e9, q_total_e9
      |FROM terms CROSS JOIN tot
      |ORDER BY c""".stripMargin

  // =====================================================================
  // Ranking/linkage/panel block (q513-q516).
  // =====================================================================

  /** RBO weights (1-p)p^(d-1) at p=0.9, e12-rounded — computed ONCE
    * in plan-building Scala and injected as identical literals into
    * BOTH engines (the q491 literal-table discipline: no pow() at
    * query time). */
  private val rboWe12: Seq[Long] = (1 to 20).map(d =>
    math.round(0.1 * math.pow(0.9, d - 1) * 1e12))

  // ---------------------------------------------------------------------
  // q513 — rank-biased overlap between the revenue-ranked and the
  // quantity-ranked brand lists (depth 20, p = 0.9): per-depth
  // overlap counts are exact integers over the 25-brand universe;
  // each depth's contribution rounds e9 from its literal weight; the
  // truncated RBO is their exact sum. The rank-stability readout two
  // retrieval stacks get compared with.
  // ---------------------------------------------------------------------
  private def q513(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val part = t(s, dir, "part")
    val g = li.join(part.select(col("p_partkey").as("l_partkey"),
        col("p_brand")), "l_partkey")
      .groupBy("p_brand")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("rev"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .pin()
    val ra = g.select(col("p_brand"),
      row_number().over(axis(col("rev").desc, col("p_brand")))
        .cast("long").as("rka"))
    val rb = g.select(col("p_brand"),
      row_number().over(axis(col("qty").desc, col("p_brand")))
        .cast("long").as("rkb"))
    val both = ra.join(rb, "p_brand")
    val ds = s.range(1, 21).select(col("id").as("d"))
    val xd = both.crossJoin(broadcast(ds))
      .groupBy("d")
      .agg(sum((col("rka") <= col("d") && col("rkb") <= col("d"))
        .cast("long")).as("xd"))
      .withColumn("w_e12", element_at(array(rboWe12.map(lit): _*),
        col("d").cast("int")))
      .withColumn("term_e9",
        round(col("xd").cast("double") / col("d").cast("double")
          * col("w_e12").cast("double") / 1000.0).cast("long"))
      .pin()
    val tot = xd.agg(sum(col("term_e9")).as("rbo_e9"))
    xd.crossJoin(broadcast(tot))
      .select(col("d"), col("xd"), col("term_e9"), col("rbo_e9"))
      .orderBy("d")
  }

  private val q513Sql = {
    val wl = rboWe12.mkString("[", ", ", "]")
    s"""WITH g AS (
      |  SELECT p_brand,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS rev,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  GROUP BY p_brand),
      |ra AS (SELECT p_brand,
      |  row_number() OVER (ORDER BY rev DESC, p_brand) AS rka FROM g),
      |rb AS (SELECT p_brand,
      |  row_number() OVER (ORDER BY qty DESC, p_brand) AS rkb FROM g),
      |bo AS (SELECT ra.p_brand, rka, rkb FROM ra JOIN rb USING
      |  (p_brand)),
      |ds AS (SELECT CAST(unnest(range(1, 21)) AS BIGINT) AS d),
      |xd AS (
      |  SELECT d, CAST(sum(CASE WHEN rka <= d AND rkb <= d THEN 1
      |      ELSE 0 END) AS BIGINT) AS xd,
      |    ($wl)[CAST(d AS INT)] AS w_e12
      |  FROM bo CROSS JOIN ds GROUP BY d),
      |terms AS (
      |  SELECT d, xd,
      |    CAST(round(CAST(xd AS DOUBLE) / CAST(d AS DOUBLE)
      |      * CAST(w_e12 AS DOUBLE) / 1000.0) AS BIGINT) AS term_e9
      |  FROM xd),
      |tot AS (SELECT CAST(sum(term_e9) AS BIGINT) AS rbo_e9
      |  FROM terms)
      |SELECT d, xd, term_e9, rbo_e9
      |FROM terms CROSS JOIN tot
      |ORDER BY d""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q514 — lift@k of the click-count ranking for finding heavy
  // purchasers: top-k selection is orderBy+limit (the q07
  // TakeOrderedAndProject shape — never a corpus-wide rank), the
  // within-top-k rank is a window on the 100-row bounded result, and
  // precision/lift read out against the exact corpus base rate.
  // ---------------------------------------------------------------------
  private def q514(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.eventsSec(s, dir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("ncl"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"))
      .pin()
    val med = universeMedian(
      u.groupBy(col("np").as("v")).agg(count(lit(1)).as("cnt")))
    val lab = u.crossJoin(broadcast(med))
      .withColumn("pos", (col("np") > col("med")).cast("long"))
      .pin()
    val base = lab.agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
    val top = lab.orderBy(col("ncl").desc, col("user_id"))
      .limit(100)
      .withColumn("rn", row_number()
        .over(axis(col("ncl").desc, col("user_id"))).cast("long"))
    val ks = s.range(3).select(
      element_at(array(lit(25L), lit(50L), lit(100L)),
        (col("id") + 1L).cast("int")).as("k"))
    top.crossJoin(broadcast(ks))
      .filter(col("rn") <= col("k"))
      .groupBy("k")
      .agg(sum(col("pos")).as("tp"))
      .crossJoin(broadcast(base))
      .select(col("k"), col("tp"),
        round(col("tp").cast("double") / col("k").cast("double")
          * 1000000.0).cast("long").as("prec_e6"),
        round((col("tp").cast("double") / col("k").cast("double"))
          / (col("p").cast("double") / col("n").cast("double"))
          * 1000000.0).cast("long").as("lift_e6"))
      .orderBy("k")
  }

  private val q514Sql =
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ncl,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      |      END) AS BIGINT) AS np
      |  FROM events GROUP BY user_id),
      |counts AS (SELECT np AS v, count(*) AS cnt FROM u GROUP BY np),
      |n0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts),
      |med AS (
      |  SELECT min(v) AS med FROM (
      |    SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, n
      |    FROM counts CROSS JOIN n0)
      |  WHERE cum >= (n + 1) // 2),
      |lab AS (
      |  SELECT u.*, CASE WHEN np > med THEN 1 ELSE 0 END AS pos
      |  FROM u CROSS JOIN med),
      |base AS (SELECT count(*) AS n, CAST(sum(pos) AS BIGINT) AS p
      |  FROM lab),
      |top AS (
      |  SELECT *, row_number() OVER (ORDER BY ncl DESC, user_id)
      |    AS rn
      |  FROM lab ORDER BY ncl DESC, user_id LIMIT 100),
      |ks AS (SELECT CAST(unnest([25, 50, 100]) AS BIGINT) AS k)
      |SELECT k, CAST(sum(pos) AS BIGINT) AS tp,
      |  CAST(round(CAST(sum(pos) AS DOUBLE) / CAST(k AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS prec_e6,
      |  CAST(round((CAST(sum(pos) AS DOUBLE) / CAST(k AS DOUBLE))
      |    / (CAST(p AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0)
      |    AS BIGINT) AS lift_e6
      |FROM top CROSS JOIN ks CROSS JOIN base
      |WHERE rn <= k
      |GROUP BY k, p, n
      |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------------
  // q515 — edit-distance record linkage on behavioral signatures:
  // each user's first-12-event type-initial string (deterministic
  // (ts, event_id) order), BLOCKED by (total event count, 3-char
  // signature prefix) so pairs form only inside same-activity,
  // same-opening cells — prefix blocking is the standard
  // recall-for-scale trade (a pair whose first three initials differ
  // is never compared), and the block-size bound is then
  // n / (|ne range| x 125 prefixes) — with the q108 discipline's
  // loud >200-per-block tripwire — then native levenshtein() on both
  // engines. Emits pairs at distance <= 6.
  // ---------------------------------------------------------------------
  private def q515(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("ts_s"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ini"),
        col("event_type"))
    val sig = ev.groupBy("user_id")
      .agg(count(lit(1)).as("ne"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("nc"),
        concat_ws("", slice(transform(sort_array(collect_list(
          struct(col("ts_s"), col("event_id"), col("ini")))),
          x => x.getField("ini")), 1, 12)).as("sig"))
      .withColumn("p3", substring(col("sig"), 1, 3))
      .pin()
    val blk = sig.groupBy("ne", "p3")
      .agg(count(lit(1)).as("bn"))
    val guarded = sig.join(blk, Seq("ne", "p3"))
      .withColumn("sig", when(col("bn") <= 200L, col("sig"))
        .otherwise(raise_error(concat(
          lit("editLinkage: block of "), col("bn").cast("string"),
          lit(" users exceeds 200 — refine the blocking key or raise " +
            "the bound explicitly.")))))
    guarded.as("a").join(guarded.as("b"),
        col("a.ne") === col("b.ne") && col("a.p3") === col("b.p3")
          && col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("ua"), col("b.user_id").as("ub"),
        levenshtein(col("a.sig"), col("b.sig")).cast("long").as("dist"))
      .filter(col("dist") <= 6L)
      .orderBy("ua", "ub")
  }

  private val q515Sql =
    """WITH ev AS (
      |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id,
      |    substr(event_type, 1, 1) AS ini, event_type
      |  FROM events),
      |sig AS (
      |  SELECT user_id, count(*) AS ne,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      |      END) AS BIGINT) AS np,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS nc,
      |    substr(string_agg(ini, '' ORDER BY ts_s, event_id), 1, 12)
      |      AS sig
      |  FROM ev GROUP BY user_id)
      |SELECT a.user_id AS ua, b.user_id AS ub,
      |  CAST(levenshtein(a.sig, b.sig) AS BIGINT) AS dist
      |FROM sig a JOIN sig b
      |  ON a.ne = b.ne
      |  AND substr(a.sig, 1, 3) = substr(b.sig, 1, 3)
      |  AND a.user_id < b.user_id
      |WHERE levenshtein(a.sig, b.sig) <= 6
      |ORDER BY ua, ub""".stripMargin

  // ---------------------------------------------------------------------
  // q516 — two-way fixed-effects slope (user FE + day FE): the panel
  // regression of purchase cents on hour-of-day after double
  // demeaning. Group means are one IEEE ratio per USER/DAY (group
  // grains), the demeaned values e6-round AT THE ROW, and the slope
  // is one division over exact decimal sums of the rounded values —
  // the within-estimator with no data-sized float accumulation.
  // ---------------------------------------------------------------------
  private def q516(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        to_date(col("ts_s")).as("day"),
        hour(col("ts_s")).cast("long").as("x"),
        round(col("value") * 100).cast("long").as("y"))
      .pin()
    val gu = ev.groupBy("user_id")
      .agg(sum(col("x")).as("sxu"), sum(col("y")).as("syu"),
        count(lit(1)).as("nu"))
    val gd = ev.groupBy("day")
      .agg(sum(col("x")).as("sxd"), sum(col("y")).as("syd"),
        count(lit(1)).as("nd"))
    val gg = ev.agg(sum(col("x")).as("sxg"), sum(col("y")).as("syg"),
      count(lit(1)).as("ng"))
    val w = ev.join(gu, "user_id").join(gd, "day")
      .crossJoin(broadcast(gg))
      .select(
        round((col("x").cast("double")
          - col("sxu").cast("double") / col("nu").cast("double")
          - col("sxd").cast("double") / col("nd").cast("double")
          + col("sxg").cast("double") / col("ng").cast("double"))
          * 1000000.0).cast("long").as("xt_e6"),
        round((col("y").cast("double")
          - col("syu").cast("double") / col("nu").cast("double")
          - col("syd").cast("double") / col("nd").cast("double")
          + col("syg").cast("double") / col("ng").cast("double"))
          * 1000000.0).cast("long").as("yt_e6"))
    w.agg(count(lit(1)).as("n"),
        sum(col("xt_e6").cast(dec) * col("yt_e6").cast(dec)).as("sxy"),
        sum(col("xt_e6").cast(dec) * col("xt_e6").cast(dec)).as("sxx"))
      .select(col("n"),
        round(col("sxy").cast("double") / col("sxx").cast("double")
          * 1000000000.0).cast("long").as("slope_e9"))
  }

  private val q516Sql =
    """WITH ev AS (
      |  SELECT user_id, CAST(date_trunc('second', ts) AS DATE) AS day,
      |    CAST(hour(date_trunc('second', ts)) AS BIGINT) AS x,
      |    CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase'),
      |gu AS (
      |  SELECT user_id, CAST(sum(x) AS BIGINT) AS sxu,
      |    CAST(sum(y) AS BIGINT) AS syu, count(*) AS nu
      |  FROM ev GROUP BY user_id),
      |gd AS (
      |  SELECT day, CAST(sum(x) AS BIGINT) AS sxd,
      |    CAST(sum(y) AS BIGINT) AS syd, count(*) AS nd
      |  FROM ev GROUP BY day),
      |gg AS (
      |  SELECT CAST(sum(x) AS BIGINT) AS sxg,
      |    CAST(sum(y) AS BIGINT) AS syg, count(*) AS ng FROM ev),
      |w AS (
      |  SELECT
      |    CAST(round((CAST(x AS DOUBLE)
      |      - CAST(sxu AS DOUBLE) / CAST(nu AS DOUBLE)
      |      - CAST(sxd AS DOUBLE) / CAST(nd AS DOUBLE)
      |      + CAST(sxg AS DOUBLE) / CAST(ng AS DOUBLE)) * 1000000.0)
      |      AS BIGINT) AS xt_e6,
      |    CAST(round((CAST(y AS DOUBLE)
      |      - CAST(syu AS DOUBLE) / CAST(nu AS DOUBLE)
      |      - CAST(syd AS DOUBLE) / CAST(nd AS DOUBLE)
      |      + CAST(syg AS DOUBLE) / CAST(ng AS DOUBLE)) * 1000000.0)
      |      AS BIGINT) AS yt_e6
      |  FROM ev JOIN gu USING (user_id) JOIN gd USING (day)
      |  CROSS JOIN gg)
      |SELECT count(*) AS n,
      |  CAST(round(CAST(sum(CAST(xt_e6 AS DECIMAL(38,0))
      |    * CAST(yt_e6 AS DECIMAL(38,0))) AS DOUBLE)
      |    / CAST(sum(CAST(xt_e6 AS DECIMAL(38,0))
      |      * CAST(xt_e6 AS DECIMAL(38,0))) AS DOUBLE)
      |    * 1000000000.0) AS BIGINT) AS slope_e9
      |FROM w""".stripMargin

  // ---------------------------------------------------------------------
  // q517 — REAL PNG decode in the gate: a closed-form gradient image
  // per document is encoded as a genuine PNG (zlib IDAT via
  // java.util.zip.Deflater, scanline filter CYCLING through all five
  // types, chunk CRCs) and parsed back by the validating decoder
  // (signature, per-chunk CRC, IHDR contract, Inflater, unfilter
  // incl. Paeth) in a mapPartitions batch. The oracle recomputes the
  // channel sums and per-pixel max luma from the gradient's closed
  // form without touching a byte — q132's discipline on the second
  // real image codec.
  // ---------------------------------------------------------------------
  private def q517(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    graft.operators.Multimodal.decodePngBatch(
        graft.operators.Multimodal.syntheticPng(t(s, dir, "documents")))
      .toDF()
      .orderBy(c("media_id"))
  }

  private val q517Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(8 + doc_id % 9 AS BIGINT) AS w,
      |    CAST(8 + (doc_id // 9) % 7 AS BIGINT) AS h
      |  FROM documents),
      |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
      |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
      |v AS (
      |  SELECT doc_id, w, h,
      |    (doc_id * 13 + 7 * x + 11 * y) % 256 AS r,
      |    (doc_id * 17 + 19 * x + 23 * y) % 256 AS g,
      |    (doc_id * 29 + 31 * x + 37 * y) % 256 AS b
      |  FROM px)
      |SELECT doc_id AS media_id,
      |  CAST(max(w) AS INTEGER) AS width,
      |  CAST(max(h) AS INTEGER) AS height,
      |  CAST(sum(r) AS BIGINT) AS r_sum,
      |  CAST(sum(g) AS BIGINT) AS g_sum,
      |  CAST(sum(b) AS BIGINT) AS b_sum,
      |  CAST(max(2126 * r + 7152 * g + 722 * b) AS BIGINT) AS lum_max
      |FROM v
      |GROUP BY doc_id
      |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------------
  // q518 — STREAMING count-min sketch (transformWithState): the 4x64
  // portable-hash counter grid absorbs the event stream (state O(1)
  // regardless of user cardinality — the property that makes the
  // sketch the 100 TB tool), exact per-user counts ride along as the
  // audit surface, and the sentinel flush emits every user's
  // (exact, estimate, relative overestimate). The oracle replays the
  // identical grid in plain SQL — same md5 hash, same cells, same
  // min-over-rows.
  // ---------------------------------------------------------------------
  private def q518(s: SparkSession, dir: String): DataFrame =
    graft.streaming.TwsCountMin
      .replayFromParquet(s, s"$dir/events.parquet")
      .orderBy(col("user_id"))

  private val q518Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "concat('cm:', CAST(j AS VARCHAR), ':', CAST(user_id AS VARCHAR))")
    s"""WITH ev AS (SELECT user_id FROM events),
      |js AS (SELECT CAST(unnest(range(4)) AS BIGINT) AS j),
      |cells AS (
      |  SELECT j, $h % 64 AS hh, CAST(count(*) AS BIGINT) AS c
      |  FROM ev CROSS JOIN js GROUP BY 1, 2),
      |exact AS (
      |  SELECT user_id, count(*) AS n_exact FROM ev GROUP BY user_id),
      |uj AS (
      |  SELECT user_id, n_exact, j, $h % 64 AS hh
      |  FROM exact CROSS JOIN js),
      |est AS (
      |  SELECT user_id, min(n_exact) AS n_exact,
      |    CAST(min(c) AS BIGINT) AS n_est
      |  FROM uj JOIN cells USING (j, hh) GROUP BY user_id)
      |SELECT user_id, n_exact, n_est,
      |  CAST(round(CAST(n_est - n_exact AS DOUBLE)
      |    / CAST(n_exact AS DOUBLE) * 1000000.0) AS BIGINT) AS over_e6
      |FROM est ORDER BY user_id""".stripMargin
  }

  // =====================================================================
  // Distribution-alignment / audit closers (q519-q522).
  // =====================================================================

  // ---------------------------------------------------------------------
  // q519 — one Sinkhorn iteration toward a balanced (lang x source)
  // transport plan: the doc-count matrix row-normalizes to the
  // uniform lang marginal, then column-normalizes to the uniform
  // source marginal — the optimal-transport primitive behind
  // distribution-matched data mixing, on the 5x20 enumeration grid
  // (two IEEE chains per CELL, e9-rounded at each normalization).
  // ---------------------------------------------------------------------
  private def q519(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("c")).pin()
    val nl = m.select(countDistinct(col("lang")).as("kl"),
      countDistinct(col("source")).as("ks"))
    val row = m.groupBy("lang").agg(sum(col("c")).as("rs"))
    val p1 = m.join(broadcast(row), "lang").crossJoin(broadcast(nl))
      .select(col("lang"), col("source"), col("c"), col("kl"), col("ks"),
        round(col("c").cast("double") / col("rs").cast("double")
          / col("kl").cast("double") * 1000000000.0).cast("long")
          .as("p1_e9"))
      .pin()
    val colSum = p1.groupBy("source").agg(sum(col("p1_e9")).as("cs"))
    p1.join(broadcast(colSum), "source")
      .select(col("lang"), col("source"), col("c"), col("p1_e9"),
        round(col("p1_e9").cast("double") / col("cs").cast("double")
          / col("ks").cast("double") * 1000000000.0).cast("long")
          .as("p2_e9"))
      .orderBy("lang", "source")
  }

  private val q519Sql =
    """WITH m AS (
      |  SELECT lang, source, count(*) AS c FROM documents
      |  GROUP BY lang, source),
      |nl AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS kl,
      |  CAST(count(DISTINCT source) AS BIGINT) AS ks FROM m),
      |row_s AS (SELECT lang, CAST(sum(c) AS BIGINT) AS rs FROM m
      |  GROUP BY lang),
      |p1 AS (
      |  SELECT lang, source, c, kl, ks,
      |    CAST(round(CAST(c AS DOUBLE) / CAST(rs AS DOUBLE)
      |      / CAST(kl AS DOUBLE) * 1000000000.0) AS BIGINT) AS p1_e9
      |  FROM m JOIN row_s USING (lang) CROSS JOIN nl),
      |cs AS (SELECT source, CAST(sum(p1_e9) AS BIGINT) AS cs FROM p1
      |  GROUP BY source)
      |SELECT lang, source, c, p1_e9,
      |  CAST(round(CAST(p1_e9 AS DOUBLE) / CAST(cs AS DOUBLE)
      |    / CAST(ks AS DOUBLE) * 1000000000.0) AS BIGINT) AS p2_e9
      |FROM p1 JOIN cs USING (source)
      |ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------------
  // q520 — MMD^2 between the first and second half of the revenue
  // series (RBF kernel on the span-bounded day-pair grain): the
  // kernel two-sample statistic behind distribution-shift detection
  // on learned representations. exp() evaluates once per DAY PAIR
  // (<= C(1000,2), tripwired), e9-rounded at the pair; the unbiased
  // within/cross sums are exact integers after that.
  // ---------------------------------------------------------------------
  private def q520(s: SparkSession, dir: String): DataFrame = {
    val day = daySeries(s, dir).pin()
    val nc = day.agg(count(lit(1)).as("n"), min(col("d")).as("d0"))
    val lab = day.crossJoin(broadcast(nc))
      .select(col("d"), col("y"), col("n"),
        ((col("d") - col("d0")) * 2L < col("n")).cast("long").as("g"))
      .pin()
    // bandwidth: the EXACT median pairwise |y_i - y_j| (day grain)
    val a0 = lab.select(col("d").as("da"), col("y").as("ya"),
      col("g").as("ga"), col("n"))
    val b0 = lab.select(col("d").as("db"), col("y").as("yb"),
      col("g").as("gb"))
    val pairs = a0.crossJoin(broadcast(b0))
      .filter(col("da") < col("db"))
      .select(col("n"),
        dayGuard(col("n"), "mmdHalves", abs(col("ya") - col("yb")))
          .as("ad"),
        col("da"), col("db"), col("ga"), col("gb"))
      .pin()
    val np = pairs.agg(count(lit(1)).as("npair"))
    val bw = pairs.crossJoin(broadcast(np))
      .withColumn("rn", row_number()
        .over(axis(col("ad"), col("da"), col("db"))).cast("long"))
      .filter(col("rn") === ((col("npair") + 1L) / 2L).cast("long"))
      .select(col("ad").as("h"))
    val k = pairs.crossJoin(broadcast(bw))
      .select(col("ga"), col("gb"),
        round(exp((col("ad").cast("double") * col("ad").cast("double"))
          / (col("h").cast("double") * col("h").cast("double"))
          * -1.0) * 1000000000.0).cast("long").as("k_e9"))
    val sums = k.agg(
      sum(when(col("ga") === 1L && col("gb") === 1L, col("k_e9"))
        .otherwise(0L)).as("sxx"),
      sum(when(col("ga") === 0L && col("gb") === 0L, col("k_e9"))
        .otherwise(0L)).as("syy"),
      sum(when(col("ga") =!= col("gb"), col("k_e9")).otherwise(0L))
        .as("sxy"))
    val cnts = lab.agg(sum(col("g")).as("nx"),
      sum(lit(1L) - col("g")).as("ny"))
    sums.crossJoin(broadcast(cnts)).crossJoin(broadcast(bw))
      .select(col("nx"), col("ny"), col("h").as("bandwidth"),
        (round(col("sxx").cast("double") * 2.0
          / (col("nx").cast("double") * (col("nx").cast("double") - 1.0)))
          + round(col("syy").cast("double") * 2.0
            / (col("ny").cast("double")
              * (col("ny").cast("double") - 1.0)))
          - round(col("sxy").cast("double") * 2.0
            / (col("nx").cast("double") * col("ny").cast("double"))))
          .cast("long").as("mmd2_e9"))
  }

  private val q520Sql =
    s"""WITH day AS ($daySeriesSql),
      |nc AS (SELECT count(*) AS n, min(d) AS d0 FROM day),
      |lab AS (
      |  SELECT d, y, n,
      |    CASE WHEN (d - d0) * 2 < n THEN 1 ELSE 0 END AS g
      |  FROM day CROSS JOIN nc),
      |pairs AS (
      |  SELECT a.n, abs(a.y - b.y) AS ad, a.d AS da, b.d AS db,
      |    a.g AS ga, b.g AS gb
      |  FROM lab a JOIN lab b ON a.d < b.d),
      |np AS (SELECT count(*) AS npair FROM pairs),
      |bw AS (
      |  SELECT ad AS h FROM (
      |    SELECT ad, row_number() OVER (ORDER BY ad, da, db) AS rn,
      |      npair
      |    FROM pairs CROSS JOIN np)
      |  WHERE rn = (npair + 1) // 2),
      |k AS (
      |  SELECT ga, gb,
      |    CAST(round(exp(-(CAST(ad AS DOUBLE) * CAST(ad AS DOUBLE))
      |      / (CAST(h AS DOUBLE) * CAST(h AS DOUBLE)))
      |      * 1000000000.0) AS BIGINT) AS k_e9
      |  FROM pairs CROSS JOIN bw),
      |sums AS (
      |  SELECT
      |    CAST(sum(CASE WHEN ga = 1 AND gb = 1 THEN k_e9 ELSE 0 END)
      |      AS BIGINT) AS sxx,
      |    CAST(sum(CASE WHEN ga = 0 AND gb = 0 THEN k_e9 ELSE 0 END)
      |      AS BIGINT) AS syy,
      |    CAST(sum(CASE WHEN ga != gb THEN k_e9 ELSE 0 END)
      |      AS BIGINT) AS sxy
      |  FROM k),
      |cnts AS (SELECT CAST(sum(g) AS BIGINT) AS nx,
      |  CAST(sum(1 - g) AS BIGINT) AS ny FROM lab)
      |SELECT nx, ny, h AS bandwidth,
      |  CAST(round(CAST(sxx AS DOUBLE) * 2.0
      |      / (CAST(nx AS DOUBLE) * (CAST(nx AS DOUBLE) - 1.0)))
      |    + round(CAST(syy AS DOUBLE) * 2.0
      |      / (CAST(ny AS DOUBLE) * (CAST(ny AS DOUBLE) - 1.0)))
      |    - round(CAST(sxy AS DOUBLE) * 2.0
      |      / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))) AS BIGINT)
      |    AS mmd2_e9
      |FROM sums CROSS JOIN cnts CROSS JOIN bw""".stripMargin

  // ---------------------------------------------------------------------
  // q521 — Simpson's-paradox audit: the pooled association between
  // the token filter and the "long document" label vs the SAME
  // association inside every language stratum, as exact
  // cross-product differences (ad - bc, integer — sign flips need no
  // float at all). Flags any stratum whose association sign
  // contradicts the pooled sign — the aggregation trap every
  // corpus-level dashboard must check before reporting a trend.
  // ---------------------------------------------------------------------
  private def q521(s: SparkSession, dir: String): DataFrame = {
    val a = audited(s, dir).pin()
    val med = universeMedian(
      a.groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("cnt")))
    val lab = a.crossJoin(broadcast(med))
      .withColumn("truth", (col("n_chars") > col("med")).cast("long"))
      .pin()
    def cells(g: org.apache.spark.sql.RelationalGroupedDataset)
        : DataFrame = g
      .agg(sum(col("pass") * col("truth")).as("aa"),
        sum(col("pass") * (lit(1L) - col("truth"))).as("bb"),
        sum((lit(1L) - col("pass")) * col("truth")).as("cc"),
        sum((lit(1L) - col("pass")) * (lit(1L) - col("truth")))
          .as("dd"))
    val pool = cells(lab.groupBy())
      .select((col("aa") * col("dd") - col("bb") * col("cc"))
        .as("pooled_assoc"))
    cells(lab.groupBy("lang"))
      .withColumn("assoc", col("aa") * col("dd") - col("bb") * col("cc"))
      .crossJoin(broadcast(pool))
      .select(col("lang"), col("aa"), col("bb"), col("cc"), col("dd"),
        col("assoc"), col("pooled_assoc"),
        (signum(col("assoc").cast("double")).cast("long")
          =!= signum(col("pooled_assoc").cast("double")).cast("long"))
          .cast("long").as("flips"))
      .orderBy("lang")
  }

  private val q521Sql =
    s"""WITH a AS ($auditedSql),
      |counts AS (SELECT n_chars AS v, count(*) AS cnt FROM a
      |  GROUP BY n_chars),
      |n0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts),
      |med AS (
      |  SELECT min(v) AS med FROM (
      |    SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, n
      |    FROM counts CROSS JOIN n0)
      |  WHERE cum >= (n + 1) // 2),
      |lab AS (
      |  SELECT a.*, CASE WHEN n_chars > med THEN 1 ELSE 0 END AS truth
      |  FROM a CROSS JOIN med),
      |pool AS (
      |  SELECT CAST(sum(pass * truth) AS BIGINT)
      |      * CAST(sum((1 - pass) * (1 - truth)) AS BIGINT)
      |    - CAST(sum(pass * (1 - truth)) AS BIGINT)
      |      * CAST(sum((1 - pass) * truth) AS BIGINT) AS pooled_assoc
      |  FROM lab),
      |g AS (
      |  SELECT lang,
      |    CAST(sum(pass * truth) AS BIGINT) AS aa,
      |    CAST(sum(pass * (1 - truth)) AS BIGINT) AS bb,
      |    CAST(sum((1 - pass) * truth) AS BIGINT) AS cc,
      |    CAST(sum((1 - pass) * (1 - truth)) AS BIGINT) AS dd
      |  FROM lab GROUP BY lang)
      |SELECT lang, aa, bb, cc, dd,
      |  aa * dd - bb * cc AS assoc, pooled_assoc,
      |  CAST(CASE WHEN sign(CAST(aa * dd - bb * cc AS DOUBLE))
      |    != sign(CAST(pooled_assoc AS DOUBLE)) THEN 1 ELSE 0 END
      |    AS BIGINT) AS flips
      |FROM g CROSS JOIN pool
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q522 — A/B test power analysis from observed variance: the
  // per-event-type sample size needed to detect a 2% lift of the
  // mean value at alpha=.05 / power=.80 — n = 2 (z_a + z_b)^2 s^2 /
  // delta^2 with the z-sum squared embedded as the literal 7.849
  // ((1.96 + 0.8416)^2) on both engines, s^2 from exact cumulants.
  // The experimentation-platform sizing readout.
  // ---------------------------------------------------------------------
  private def q522(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("x"))
    e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"))
      .select(col("event_type"), col("n"),
        round(col("sx").cast("double") / col("n").cast("double"))
          .cast("long").as("mean_c"),
        round((col("n").cast("double") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
          / (col("n").cast("double") * (col("n").cast("double") - 1.0)))
          .cast("long").as("var_c2"),
        round(lit(2.0) * lit(7.849)
          * ((col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            / (col("n").cast("double")
              * (col("n").cast("double") - 1.0)))
          / ((col("sx").cast("double") / col("n").cast("double")
            * 0.02) * (col("sx").cast("double")
            / col("n").cast("double") * 0.02))).cast("long")
          .as("n_needed"))
      .orderBy("event_type")
  }

  private val q522Sql =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
      |  FROM events),
      |g AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx
      |  FROM e GROUP BY event_type)
      |SELECT event_type, n,
      |  CAST(round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
      |    AS mean_c,
      |  CAST(round((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
      |    AS BIGINT) AS var_c2,
      |  CAST(round(2.0 * 7.849
      |    * ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
      |    / ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 0.02)
      |      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 0.02)))
      |    AS BIGINT) AS n_needed
      |FROM g ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q523 — Markov ORDER test: does the event stream carry memory
  // beyond one step? Second-order conditional entropy
  // H(next | prev2, prev1) against first-order H(next | prev1)
  // computed on the IDENTICAL trigram support (both roll up from the
  // one 5^3-bounded trigram grain, so the comparison is apples to
  // apples), per-cell e9-rounded ln terms (the q375/q392
  // discipline). order_gain ~ 0 means one step of memory suffices —
  // the audit that justifies (or indicts) a first-order model.
  // ---------------------------------------------------------------------
  private def q523(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val tri = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("ts_s"), col("event_id"),
        col("event_type"))
      .withColumn("p1", lag(col("event_type"), 1).over(w))
      .withColumn("p2", lag(col("event_type"), 2).over(w))
      .filter(col("p2").isNotNull)
      .groupBy(col("p2"), col("p1"), col("event_type").as("cur"))
      .agg(count(lit(1)).as("c"))
      .pin()
    val n = tri.agg(sum(col("c")).as("n"))
    val ctx2 = tri.groupBy("p2", "p1").agg(sum(col("c")).as("r2"))
    val h2 = tri.join(broadcast(ctx2), Seq("p2", "p1"))
      .crossJoin(broadcast(n))
      .select(col("n"),
        round(col("c").cast("double") / col("n").cast("double")
          * log(col("r2").cast("double") / col("c").cast("double"))
          * 1000000000.0).cast("long").as("t"))
      .groupBy("n").agg(sum(col("t")).as("h2_e9"))
    val big = tri.groupBy(col("p1"), col("cur"))
      .agg(sum(col("c")).as("c1"))
    val ctx1 = big.groupBy("p1").agg(sum(col("c1")).as("r1"))
    val h1 = big.join(broadcast(ctx1), Seq("p1"))
      .crossJoin(broadcast(n))
      .select(col("n"),
        round(col("c1").cast("double") / col("n").cast("double")
          * log(col("r1").cast("double") / col("c1").cast("double"))
          * 1000000000.0).cast("long").as("t"))
      .groupBy("n").agg(sum(col("t")).as("h1_e9"))
    h1.join(h2, "n")
      .select(col("n").as("n_trigrams"), col("h1_e9"), col("h2_e9"),
        (col("h1_e9") - col("h2_e9")).as("order_gain_e9"))
  }

  private val q523Sql =
    """WITH ev AS (
      |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id,
      |    event_type
      |  FROM events),
      |lagd AS (
      |  SELECT event_type AS cur,
      |    lag(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts_s, event_id) AS p1,
      |    lag(event_type, 2) OVER (PARTITION BY user_id
      |      ORDER BY ts_s, event_id) AS p2
      |  FROM ev),
      |tri AS (
      |  SELECT p2, p1, cur, count(*) AS c FROM lagd
      |  WHERE p2 IS NOT NULL GROUP BY p2, p1, cur),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tri),
      |ctx2 AS (SELECT p2, p1, CAST(sum(c) AS BIGINT) AS r2 FROM tri
      |  GROUP BY p2, p1),
      |h2 AS (
      |  SELECT n, CAST(sum(t) AS BIGINT) AS h2_e9 FROM (
      |    SELECT n,
      |      CAST(round(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
      |        * ln(CAST(r2 AS DOUBLE) / CAST(c AS DOUBLE))
      |        * 1000000000.0) AS BIGINT) AS t
      |    FROM tri JOIN ctx2 USING (p2, p1) CROSS JOIN n)
      |  GROUP BY n),
      |big AS (SELECT p1, cur, CAST(sum(c) AS BIGINT) AS c1 FROM tri
      |  GROUP BY p1, cur),
      |ctx1 AS (SELECT p1, CAST(sum(c1) AS BIGINT) AS r1 FROM big
      |  GROUP BY p1),
      |h1 AS (
      |  SELECT n, CAST(sum(t) AS BIGINT) AS h1_e9 FROM (
      |    SELECT n,
      |      CAST(round(CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)
      |        * ln(CAST(r1 AS DOUBLE) / CAST(c1 AS DOUBLE))
      |        * 1000000000.0) AS BIGINT) AS t
      |    FROM big JOIN ctx1 USING (p1) CROSS JOIN n)
      |  GROUP BY n)
      |SELECT n AS n_trigrams, h1_e9, h2_e9,
      |  h1_e9 - h2_e9 AS order_gain_e9
      |FROM h1 JOIN h2 USING (n)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q490_seasonal_trend" -> (q490 _),
    "q491_dft_weekly" -> (q491 _),
    "q492_yule_walker" -> (q492 _),
    "q493_smape_suite" -> (q493 _),
    "q494_stl_outliers" -> (q494 _),
    "q495_huber_location" -> (q495 _),
    "q496_qn_scale" -> (q496 _),
    "q497_medcouple" -> (q497 _),
    "q498_biweight_midvar" -> (q498 _),
    "q499_parity_gap" -> (q499 _),
    "q500_equalized_odds" -> (q500 _),
    "q501_group_calibration" -> (q501 _),
    "q502_disparate_impact" -> (q502 _),
    "q503_budget_greedy" -> (q503 _),
    "q504_doremi_step" -> (q504 _),
    "q505_curriculum_bins" -> (q505 _),
    "q506_ams_f2" -> (q506 _),
    "q507_design_effect" -> (q507 _),
    "q510_rdd_cutoff" -> (q510 _),
    "q511_strat_att" -> (q511 _),
    "q512_brier_decomp" -> (q512 _),
    "q508_ktruss_peel" -> (q508 _),
    "q509_modularity" -> (q509 _),
    "q513_rbo_brands" -> (q513 _),
    "q514_lift_at_k" -> (q514 _),
    "q515_edit_linkage" -> (q515 _),
    "q516_twoway_fe" -> (q516 _),
    "q517_png_decode" -> (q517 _),
    "q518_stream_countmin" -> (q518 _),
    "q519_sinkhorn_step" -> (q519 _),
    "q520_mmd_halves" -> (q520 _),
    "q521_simpson_audit" -> (q521 _),
    "q522_power_analysis" -> (q522 _),
    "q523_markov_order" -> (q523 _))

  val oracle: Map[String, String] = Map(
    "q490_seasonal_trend" -> q490Sql,
    "q491_dft_weekly" -> q491Sql,
    "q492_yule_walker" -> q492Sql,
    "q493_smape_suite" -> q493Sql,
    "q494_stl_outliers" -> q494Sql,
    "q495_huber_location" -> q495Sql,
    "q496_qn_scale" -> q496Sql,
    "q497_medcouple" -> q497Sql,
    "q498_biweight_midvar" -> q498Sql,
    "q499_parity_gap" -> q499Sql,
    "q500_equalized_odds" -> q500Sql,
    "q501_group_calibration" -> q501Sql,
    "q502_disparate_impact" -> q502Sql,
    "q503_budget_greedy" -> q503Sql,
    "q504_doremi_step" -> q504Sql,
    "q505_curriculum_bins" -> q505Sql,
    "q506_ams_f2" -> q506Sql,
    "q507_design_effect" -> q507Sql,
    "q510_rdd_cutoff" -> q510Sql,
    "q511_strat_att" -> q511Sql,
    "q512_brier_decomp" -> q512Sql,
    "q508_ktruss_peel" -> q508Sql,
    "q509_modularity" -> q509Sql,
    "q513_rbo_brands" -> q513Sql,
    "q514_lift_at_k" -> q514Sql,
    "q515_edit_linkage" -> q515Sql,
    "q516_twoway_fe" -> q516Sql,
    "q517_png_decode" -> q517Sql,
    "q518_stream_countmin" -> q518Sql,
    "q519_sinkhorn_step" -> q519Sql,
    "q520_mmd_halves" -> q520Sql,
    "q521_simpson_audit" -> q521Sql,
    "q522_power_analysis" -> q522Sql,
    "q523_markov_order" -> q523Sql)
}
