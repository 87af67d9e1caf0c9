package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Curate
import graft.core.PlanStats.Pinned

/** Metrics tier (session 8): ranking quality, concentration,
  * forensic-digit and forecast-loss metrics, a KMV distinct sketch,
  * and deterministic sampling harnesses — the measurement layer a
  * data platform runs on top of the operators in the other modules.
  *
  * Cross-engine discipline is the same as everywhere else in the
  * gate: transcendental constants (log2 / log10 tables) are computed
  * ONCE in Scala at plan-build time and embedded as integer literals
  * in BOTH the Spark plan and the DuckDB oracle text, so no runtime
  * libm call has to agree between engines; everything downstream is
  * 64-bit integer arithmetic plus at most one final rounded division.
  *
  * Accepted exceptions to the no-runtime-libm rule: q285 (one `ln`
  * per WOE bucket — the argument is a data-dependent ratio of four
  * aggregate longs, so it cannot be a plan-time literal) and q286
  * (one `exp` whose argument is n_members · a Scala-literal ln —
  * n_members is a data-dependent scalar; embedding it would need a
  * driver collect). Both run JVM Math vs DuckDB libm on IDENTICAL
  * double inputs; IEEE-correctly-rounded exp/ln has matched across
  * engines in every smoke so far (q274 precedent), and each value is
  * e6-rounded at the point it is computed. A mismatch here fails the
  * gate loudly rather than corrupting downstream integer math.
  */
object Metrics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------
  // q275 — NDCG@10 of the value-ranked event feed: per user, events
  // ranked by `value` desc are the "system ranking"; graded relevance
  // is purchase=3, signup=2, click=1, else 0. DCG@10 uses the classic
  // 1/log2(rank+1) discount — materialized as a 10-entry e6 integer
  // weight table computed once in Scala (log2 of 2..11; embedding the
  // table sidesteps engine libm differences), carried as an array
  // literal indexed by rank (codegen'd element_at, no join). IDCG
  // re-ranks the same user's events by relevance itself (ties in
  // relevance are sum-invariant). One events scan feeds both rankings
  // via two windows over the same user partition — a single shuffle
  // by user_id; the weight table is a plan literal on every executor.
  // ---------------------------------------------------------------------
  private val ndcgW: IndexedSeq[Long] = (1 to 10).map(r =>
    math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  private def q275(s: SparkSession, dir: String): DataFrame = {
    val rel = when(col("event_type") === "purchase", 3L)
      .when(col("event_type") === "signup", 2L)
      .when(col("event_type") === "click", 1L).otherwise(0L)
    val e = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("event_id"), rel.as("rel"),
        round(col("value") * 100).cast("long").as("v_e2"))
    val wSys = Window.partitionBy("user_id")
      .orderBy(col("v_e2").desc, col("event_id"))
    val wIdeal = Window.partitionBy("user_id")
      .orderBy(col("rel").desc, col("event_id"))
    val wArr = array(ndcgW.map(lit): _*)
    val ranked = e
      .withColumn("r_sys", row_number().over(wSys))
      .withColumn("r_ideal", row_number().over(wIdeal))
    val gains = ranked.groupBy("user_id").agg(
      sum(when(col("r_sys") <= 10,
        col("rel") * element_at(wArr, col("r_sys").cast("int")))
        .otherwise(lit(0L))).as("dcg_e6"),
      sum(when(col("r_ideal") <= 10,
        col("rel") * element_at(wArr, col("r_ideal").cast("int")))
        .otherwise(lit(0L))).as("idcg_e6"))
    gains.select(col("user_id"), col("dcg_e6"), col("idcg_e6"),
        when(col("idcg_e6") === 0, lit(null))
          .otherwise(round(col("dcg_e6").cast("double") /
            col("idcg_e6").cast("double") * 1000000.0).cast("long"))
          .as("ndcg_e6"))
      .orderBy("user_id")
  }

  private val q275Sql = {
    val wCase = (1 to 10).map(r =>
      s"WHEN $r THEN ${ndcgW(r - 1)}").mkString(" ")
    s"""WITH e AS (
       |  SELECT user_id, event_id,
       |    CAST(CASE event_type WHEN 'purchase' THEN 3 WHEN 'signup'
       |      THEN 2 WHEN 'click' THEN 1 ELSE 0 END AS BIGINT) AS rel,
       |    CAST(round(value * 100) AS BIGINT) AS v_e2
       |  FROM events),
       |ranked AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY v_e2 DESC, event_id) AS r_sys,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY rel DESC, event_id) AS r_ideal
       |  FROM e)
       |SELECT user_id,
       |  CAST(sum(CASE WHEN r_sys <= 10 THEN rel *
       |    (CASE r_sys $wCase END) ELSE 0 END) AS BIGINT) AS dcg_e6,
       |  CAST(sum(CASE WHEN r_ideal <= 10 THEN rel *
       |    (CASE r_ideal $wCase END) ELSE 0 END) AS BIGINT) AS idcg_e6,
       |  CASE WHEN sum(CASE WHEN r_ideal <= 10 THEN rel *
       |      (CASE r_ideal $wCase END) ELSE 0 END) = 0 THEN NULL
       |    ELSE CAST(round(
       |      CAST(sum(CASE WHEN r_sys <= 10 THEN rel *
       |        (CASE r_sys $wCase END) ELSE 0 END) AS DOUBLE)
       |      / CAST(sum(CASE WHEN r_ideal <= 10 THEN rel *
       |        (CASE r_ideal $wCase END) ELSE 0 END) AS DOUBLE)
       |      * 1000000.0) AS BIGINT) END AS ndcg_e6
       |FROM ranked GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q276 — cohort LTV triangle: customers grouped by acquisition
  // month (their FIRST order), tracked by cumulative revenue per
  // cohort member at each month-of-age — the lifetime-value table
  // every growth team reads (diagonal = calendar month, row = cohort
  // maturation). Distinct from q94's retention triangle, which counts
  // activity; this one accumulates money. Revenue is exact cents; the
  // acquisition month is a per-customer min-aggregate (no window over
  // the fact table); the cumulative sum runs over the cohort×age
  // aggregate (≤ ~80×80 rows), never over orders. Per-member LTV is
  // the one final rounded division.
  // ---------------------------------------------------------------------
  private def q276(s: SparkSession, dir: String): DataFrame = {
    val om = t(s, dir, "orders")
      .select(col("o_custkey").as("ck"),
        months_between(trunc(col("o_orderdate"), "month"),
          lit("1995-01-01")).cast("long").as("m"),
        round(col("o_totalprice") * 100).cast("long").as("p_e2"))
    val firstM = om.groupBy("ck").agg(min("m").as("m0"))
    val byAge = om.join(firstM, "ck")
      .groupBy(col("m0"), (col("m") - col("m0")).as("age"))
      .agg(sum("p_e2").as("rev_e2"))
    val cohortSize = firstM.groupBy("m0")
      .agg(count(lit(1)).as("n_cust"))
    val wC = Window.partitionBy("m0").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, 0)
    byAge.join(cohortSize, "m0")
      .withColumn("cum_rev_e2", sum("rev_e2").over(wC))
      .select(col("m0").as("cohort_m"), col("age"), col("n_cust"),
        col("cum_rev_e2"),
        round(col("cum_rev_e2").cast("double") /
          col("n_cust").cast("double")).cast("long").as("ltv_e2"))
      .orderBy("cohort_m", "age")
  }

  private val q276Sql =
    """WITH om AS (
      |  SELECT o_custkey AS ck,
      |    CAST(datediff('month', DATE '1995-01-01',
      |      date_trunc('month', o_orderdate)) AS BIGINT) AS m,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS p_e2
      |  FROM orders),
      |firstm AS (SELECT ck, min(m) AS m0 FROM om GROUP BY 1),
      |byage AS (
      |  SELECT m0, m - m0 AS age, CAST(sum(p_e2) AS BIGINT) AS rev_e2
      |  FROM om JOIN firstm USING (ck) GROUP BY 1, 2),
      |csize AS (SELECT m0, CAST(count(*) AS BIGINT) AS n_cust
      |          FROM firstm GROUP BY 1),
      |cum AS (
      |  SELECT m0, age, n_cust,
      |    CAST(sum(rev_e2) OVER (PARTITION BY m0 ORDER BY age
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_e2
      |  FROM byage JOIN csize USING (m0))
      |SELECT m0 AS cohort_m, age, n_cust, cum_rev_e2,
      |  CAST(round(CAST(cum_rev_e2 AS DOUBLE) / CAST(n_cust AS DOUBLE))
      |    AS BIGINT) AS ltv_e2
      |FROM cum ORDER BY cohort_m, age""".stripMargin

  // ---------------------------------------------------------------------
  // q277 — Herfindahl–Hirschman concentration index per (region,
  // year): HHI = Σ_i (s_i/S)² over supplier revenue shares — the
  // antitrust/marketplace-health number (10000·HHI > 2500 is "highly
  // concentrated"). Each supplier's revenue is an exact e2 long; the
  // squared sum Σs² runs in decimal(38,0) (s ≤ 2^40 squares past
  // long range); both Σs² and (Σs)² convert once to double for the
  // single final division. Fact rows aggregate to supplier grain
  // map-side first; the dim joins (supplier→nation→region) broadcast;
  // output is the 35-row region×year matrix.
  // ---------------------------------------------------------------------
  private def q277(s: SparkSession, dir: String): DataFrame = {
    val supRev = t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"), year(col("l_shipdate")).as("yr"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")).as("s_e2"))
    val supRegion = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), expr("s_nationkey = n_nationkey"))
      .join(broadcast(t(s, dir, "region")), expr("n_regionkey = r_regionkey"))
      .select(col("s_suppkey"), col("r_name"))
    supRev.join(broadcast(supRegion), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("r_name").as("region"), col("yr").cast("long").as("yr"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum("s_e2").as("tot_e2"),
        sum(col("s_e2").cast("decimal(38,0)") *
          col("s_e2").cast("decimal(38,0)")).as("sq"))
      .select(col("region"), col("yr"), col("n_suppliers"), col("tot_e2"),
        round(col("sq").cast("double") /
          (col("tot_e2").cast("double") * col("tot_e2").cast("double"))
          * 100000000.0).cast("long").as("hhi_e8"))
      .orderBy("region", "yr")
  }

  private val q277Sql =
    """WITH suprev AS (
      |  SELECT l_suppkey, year(l_shipdate) AS yr,
      |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |      AS BIGINT)) AS BIGINT) AS s_e2
      |  FROM lineitem GROUP BY 1, 2),
      |supreg AS (
      |  SELECT s_suppkey, r_name
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey)
      |SELECT r_name AS region, CAST(yr AS BIGINT) AS yr,
      |  CAST(count(*) AS BIGINT) AS n_suppliers,
      |  CAST(sum(s_e2) AS BIGINT) AS tot_e2,
      |  -- widen BEFORE the square: INT64·INT64 overflows at 10× scale
      |  CAST(round(CAST(sum(CAST(s_e2 AS HUGEINT) * s_e2) AS DOUBLE)
      |    / (CAST(sum(s_e2) AS DOUBLE) * CAST(sum(s_e2) AS DOUBLE))
      |    * 100000000.0) AS BIGINT) AS hhi_e8
      |FROM suprev JOIN supreg ON l_suppkey = s_suppkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q278 — pinball (quantile) loss of the week-over-week naive
  // forecaster at τ = 0.5 and τ = 0.9: L_τ(d) = max(τ·d, (τ−1)·d)
  // with d = actual − forecast — how a quantile forecast is scored
  // (τ=0.5 is half the MAE; τ=0.9 penalizes under-forecasting 9×).
  // τ is carried in tenths so 10·L is exact integer arithmetic on e2
  // cents: max(t10·d, (t10−10)·d). The weekly series is the q273
  // grain (calendar self-join lag, no row-offset lag across gaps);
  // the two τ rows per priority come from one tiny cross join with a
  // 2-row literal table.
  // ---------------------------------------------------------------------
  private def q278(s: SparkSession, dir: String): DataFrame = {
    // floor (not truncate-toward-zero) week index: Spark's integer
    // `div` truncates while DuckDB's `//` floors — they diverge on
    // dates before the anchor, and the anchor equals the dataset's
    // min date, so floor on BOTH sides leaves zero margin for a data
    // variant that shifts dates earlier
    val weekly = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("prio"),
        expr("floor(datediff(o_orderdate, '1995-01-01') / 7.0)").as("x"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y_e2"))
      .pin()
    val lag1 = weekly.select(col("prio"), (col("x") + 1).as("x"),
      col("y_e2").as("f_e2"))
    val taus = s.range(0, 2)
      .select((col("id") * 4 + 5).cast("long").as("t10"))
    weekly.join(lag1, Seq("prio", "x"))
      .withColumn("d_e2", col("y_e2") - col("f_e2"))
      .crossJoin(broadcast(taus))
      .groupBy("prio", "t10")
      .agg(count(lit(1)).as("n_weeks"),
        sum(greatest(col("t10") * col("d_e2"),
          (col("t10") - 10) * col("d_e2"))).as("loss10_e2"))
      .withColumn("mean_loss_e2",
        round(col("loss10_e2").cast("double") /
          (col("n_weeks") * 10).cast("double")).cast("long"))
      .orderBy("prio", "t10")
  }

  private val q278Sql =
    """WITH weekly AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(floor(datediff('day', TIMESTAMP '1995-01-01', o_orderdate)
      |      / 7.0) AS BIGINT) AS x,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS y_e2
      |  FROM orders GROUP BY 1, 2),
      |joined AS (
      |  SELECT a.prio, a.x, a.y_e2 - b.y_e2 AS d_e2
      |  FROM weekly a JOIN weekly b ON a.prio = b.prio AND b.x = a.x - 1),
      |taus AS (SELECT CAST(5 AS BIGINT) AS t10
      |         UNION ALL SELECT CAST(9 AS BIGINT))
      |SELECT prio, t10, CAST(count(*) AS BIGINT) AS n_weeks,
      |  CAST(sum(greatest(t10 * d_e2, (t10 - 10) * d_e2)) AS BIGINT)
      |    AS loss10_e2,
      |  CAST(round(CAST(sum(greatest(t10 * d_e2, (t10 - 10) * d_e2))
      |      AS DOUBLE) / CAST(count(*) * 10 AS DOUBLE)) AS BIGINT)
      |    AS mean_loss_e2
      |FROM joined CROSS JOIN taus
      |GROUP BY prio, t10 ORDER BY prio, t10""".stripMargin

  // ---------------------------------------------------------------------
  // q279 — KMV (k-minimum-values) distinct sketch, gated against
  // exact truth: per event type, the 64 smallest portable-60-bit
  // hashes of distinct (user, day) visits give the classic estimator
  // n̂ = (k−1)·2^60 / h_(k) — the bottom-k sketch that underlies
  // distinct-count and set-intersection telemetry (Bar-Yossef et al.;
  // DataSketches theta). The hash is md5-portable so BOTH engines
  // compute the identical h_(k); cardinalities below k fall back to
  // the exact count (the sketch is exact there by definition). Scale
  // shape: one events scan → distinct at (type, user, day) grain →
  // per-type window for rank ≤ 64 — the window input is already
  // distinct-visit grain, shuffled once by type; nothing bigger than
  // k rows per type survives to the estimate.
  // ---------------------------------------------------------------------
  private def q279(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val visits = Tables.eventsSec(s, dir)
      .select(col("event_type"), col("user_id"),
        datediff(col("ts_s").cast("date"), lit("2024-01-01")).as("d"))
      .distinct()
      .select(col("event_type"),
        h.hash60(concat(lit("kmv:"), col("user_id"), lit(":"),
          col("d"))).as("hv"))
    val wH = Window.partitionBy("event_type").orderBy("hv")
    // ONE pass: the rank window and the per-type aggregate share the
    // event_type partitioning, so count and h_(k) come off a single
    // events scan with a single exchange (no second scan per branch)
    val agg = visits.withColumn("rn", row_number().over(wH))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_exact"),
        max(when(col("rn") === 64, col("hv"))).as("h_k"))
    agg
      .select(col("event_type"), col("n_exact"),
        when(col("h_k").isNull, col("n_exact"))
          .otherwise(round(lit(63.0) * lit((1L << 60).toDouble) /
            col("h_k").cast("double")).cast("long")).as("n_est"))
      .withColumn("err_e4",
        round((col("n_est") - col("n_exact")).cast("double") /
          col("n_exact").cast("double") * 10000.0).cast("long"))
      .orderBy("event_type")
  }

  private val q279Sql = {
    val hv = graft.functions.PortableHash.hash60DuckSql(
      "'kmv:' || user_id || ':' || d")
    s"""WITH visits AS (
       |  SELECT DISTINCT event_type, user_id,
       |    datediff('day', DATE '2024-01-01',
       |      CAST(date_trunc('second', ts) AS DATE)) AS d
       |  FROM events),
       |hashed AS (
       |  SELECT event_type, $hv AS hv FROM visits),
       |agg AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
       |  FROM hashed GROUP BY 1),
       |kth AS (
       |  SELECT event_type, hv AS h_k
       |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
       |          ORDER BY hv) AS rn FROM hashed)
       |  WHERE rn = 64),
       |est AS (
       |  SELECT agg.event_type, n_exact,
       |    CASE WHEN h_k IS NULL THEN n_exact
       |      ELSE CAST(round(63.0 * ${(1L << 60).toDouble}
       |        / CAST(h_k AS DOUBLE)) AS BIGINT) END AS n_est
       |  FROM agg LEFT JOIN kth ON agg.event_type = kth.event_type)
       |SELECT event_type, n_exact, n_est,
       |  CAST(round(CAST(n_est - n_exact AS DOUBLE)
       |    / CAST(n_exact AS DOUBLE) * 10000.0) AS BIGINT) AS err_e4
       |FROM est ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q280 — integer-exact truncated EWMA of daily revenue per region
  // (half-life = 1 day, 20-day horizon): ewma(t) = Σ_{j=0..19}
  // y(t−j)·2^(19−j) / 2^19 — the decay weights are exact powers of
  // two so the whole smoother is LONG arithmetic with one integer
  // division (`div`/`//`) at the end; missing calendar days
  // contribute exactly 0 (a calendar RANGE self-join on the day
  // index, never a row-offset window that would silently skip gaps).
  // The join is day-grain × day-grain (≤ ~2.4k rows per region after
  // the aggregate) — the fact scan collapses before any windowing.
  // Anchored to the last 60 days of the history to bound output.
  // ---------------------------------------------------------------------
  private def q280(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .join(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), expr("n_regionkey = r_regionkey"))
        .select(col("n_nationkey"), col("r_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("r_name"),
        datediff(col("o_orderdate"), lit("1995-01-01")).as("x"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y_e2"))
      .pin() // both sides of the range self-join read this
    val hist = daily.select(col("r_name").as("rn_h"), col("x").as("xs"),
      col("y_e2").as("ys_e2"))
    daily.filter(col("x") >= 2340 && col("x") < 2400)
      .join(hist, col("r_name") === col("rn_h") &&
        col("xs") > col("x") - 20 && col("xs") <= col("x"))
      .groupBy(col("r_name").as("region"), col("x"))
      .agg(sum(expr( // 2^(19-(x-xs)) exact long weight
        "ys_e2 * shiftleft(CAST(1 AS BIGINT), CAST(19 - (x - xs) AS INT))"))
        .as("wsum_e2"))
      .select(col("region"), col("x").cast("long").as("x"),
        expr("wsum_e2 div 524288").as("ewma_e2"))
      .orderBy("region", "x")
  }

  private val q280Sql =
    """WITH daily AS (
      |  SELECT r_name, datediff('day', TIMESTAMP '1995-01-01',
      |    o_orderdate) AS x,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS y_e2
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2)
      |SELECT a.r_name AS region, a.x AS x,
      |  CAST(sum(b.y_e2 * (1 << (19 - (a.x - b.x)))) // 524288 AS BIGINT)
      |    AS ewma_e2
      |FROM daily a JOIN daily b
      |  ON a.r_name = b.r_name AND b.x > a.x - 20 AND b.x <= a.x
      |WHERE a.x >= 2340 AND a.x < 2400
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q281 — deterministic negative sampling for contrastive training:
  // every 20th document is an anchor; each anchor draws 4 negatives
  // by hashing (anchor, slot) into the dense doc-id space — the
  // reproducible random-negative pass a contrastive data pipeline
  // runs at corpus scale (no RNG state: re-runs and retries produce
  // identical batches). Self-draws are dropped, not re-drawn (the
  // standard fixed-proposal scheme keeps it one pass). The candidate
  // id is an equi-join back to documents — hash-partitioned both
  // sides, no broadcast of the corpus; the corpus-size scalar rides
  // as a 1-row broadcast.
  // ---------------------------------------------------------------------
  private def q281(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val docs = t(s, dir, "documents")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val anchors = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("anchor_id"))
      .crossJoin(broadcast(nDocs))
      .select(col("anchor_id"), explode(sequence(lit(0), lit(3)))
        .as("slot"), col("n_docs"))
      .select(col("anchor_id"), col("slot").cast("long").as("slot"),
        pmod(h.hash60(concat(lit("neg:"), col("anchor_id"), lit(":"),
          col("slot"))), col("n_docs")).as("neg_id"))
      .filter(col("neg_id") =!= col("anchor_id"))
    anchors.join(docs.select(col("doc_id"), col("source"), col("lang")),
        col("neg_id") === col("doc_id"))
      .select(col("anchor_id"), col("slot"), col("neg_id"),
        col("source").as("neg_source"), col("lang").as("neg_lang"))
      .orderBy("anchor_id", "slot")
  }

  private val q281Sql = {
    val hv = graft.functions.PortableHash.hash60DuckSql(
      "'neg:' || anchor_id || ':' || slot")
    s"""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
       |           FROM documents),
       |slots AS (SELECT CAST(0 AS BIGINT) AS slot UNION ALL SELECT 1
       |          UNION ALL SELECT 2 UNION ALL SELECT 3),
       |anchors AS (
       |  SELECT doc_id AS anchor_id, slot, n_docs
       |  FROM documents CROSS JOIN slots CROSS JOIN n
       |  WHERE doc_id % 20 = 0),
       |cand AS (
       |  SELECT anchor_id, slot, $hv % n_docs AS neg_id
       |  FROM anchors)
       |SELECT anchor_id, slot, neg_id, source AS neg_source,
       |  lang AS neg_lang
       |FROM cand JOIN documents ON neg_id = doc_id
       |WHERE neg_id <> anchor_id
       |ORDER BY anchor_id, slot""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q282 — hash k-fold assignment audit: orders are split into 5
  // folds by portable hash (the split every training job must be able
  // to reproduce without a stored assignment table), then audited for
  // balance WITHIN each priority stratum — fold share per stratum in
  // e6 and each fold's deviation from the stratum's ideal 1/5. One
  // fact scan, group at (priority, fold), stratum totals via a
  // partition-window over the 25-row aggregate; everything after the
  // first groupBy is constant-size.
  // ---------------------------------------------------------------------
  private def q282(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val byFold = t(s, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        pmod(h.hash60(concat(lit("fold:"), col("o_orderkey"))), lit(5L))
          .as("fold"),
        round(col("o_totalprice") * 100).cast("long").as("p_e2"))
      .groupBy("prio", "fold")
      .agg(count(lit(1)).as("n"), sum("p_e2").as("rev_e2"))
    val wP = Window.partitionBy("prio")
    byFold
      .withColumn("n_strat", sum("n").over(wP))
      .select(col("prio"), col("fold"), col("n"), col("rev_e2"),
        round(col("n").cast("double") / col("n_strat").cast("double")
          * 1000000.0).cast("long").as("share_e6"))
      .withColumn("dev_e6", col("share_e6") - 200000L)
      .orderBy("prio", "fold")
  }

  private val q282Sql = {
    val hv = graft.functions.PortableHash.hash60DuckSql(
      "'fold:' || o_orderkey")
    s"""WITH byfold AS (
       |  SELECT o_orderpriority AS prio, $hv % 5 AS fold,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS rev_e2
       |  FROM orders GROUP BY 1, 2),
       |strat AS (
       |  SELECT *, CAST(sum(n) OVER (PARTITION BY prio) AS BIGINT)
       |    AS n_strat
       |  FROM byfold)
       |SELECT prio, fold, n, rev_e2,
       |  CAST(round(CAST(n AS DOUBLE) / CAST(n_strat AS DOUBLE)
       |    * 1000000.0) AS BIGINT) AS share_e6,
       |  CAST(round(CAST(n AS DOUBLE) / CAST(n_strat AS DOUBLE)
       |    * 1000000.0) AS BIGINT) - 200000 AS dev_e6
       |FROM strat ORDER BY prio, fold""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q283 — MMR (maximal marginal relevance) diversified re-ranking:
  // per query vector, the plain cosine top-12 is greedily re-ranked
  // into a top-4 that balances relevance against redundancy —
  // score = λ·rel − (1−λ)·max-sim-to-already-picked, λ = 0.7. The
  // diversity pass every RAG retriever and diverse-sampling data
  // pipeline runs after ANN. All scores are e4-scaled LONGS
  // (λ in tenths: score×10 = 7·rel_e4 − 3·maxsim_e4), so the greedy
  // argmax chain is pure integer comparison — no float ordering to
  // disagree on. Scale shape: candidate generation is the guarded
  // brute/bounded-heap ANN plan (corpus scanned once, queries
  // broadcast, TopKPerKey keeps shuffle at k·|queries|); everything
  // after runs on the 12-per-query candidate table (pinned via
  // localCheckpoint), where the 4 unrolled greedy steps are
  // candidate-grain joins — never back to the corpus.
  // ---------------------------------------------------------------------
  private def q283(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vectors
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("cv"),
        round(Vectors.cosineNative(col("qv"), col("cv")) * 10000)
          .cast("long").as("rel_e4"))
    val cand = org.apache.spark.sql.graftx.TopKPerKeyPlan
      .topK(scored, Seq("qid"), Seq("rel_e4" -> true, "cid" -> false), 12)
      .pin() // every greedy step reads this 12/query table
    val candSlim = cand.select(col("qid"), col("cid"), col("rel_e4"))
    val sim = cand.select(col("qid"), col("cid").as("c1"),
        col("cv").as("v1"))
      .join(cand.select(col("qid").as("q2"), col("cid").as("c2"),
        col("cv").as("v2")),
        col("qid") === col("q2") && col("c1") =!= col("c2"))
      .select(col("qid"), col("c1"), col("c2"),
        round(Vectors.cosineNative(col("v1"), col("v2")) * 10000)
          .cast("long").as("sim_e4"))
      .pin()
    var selected = candSlim
      .withColumn("rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("rel_e4").desc, col("cid"))))
      .filter(col("rn") === 1)
      .select(col("qid"), col("cid"), lit(1L).as("step"), col("rel_e4"),
        (col("rel_e4") * 7).as("score_x10_e4"))
    for (step <- 2 to 4) {
      val selSet = selected.select(col("qid").as("sq"), col("cid").as("sc"))
      val msim = sim.join(selSet,
          col("qid") === col("sq") && col("c2") === col("sc"))
        .groupBy(col("qid"), col("c1")).agg(max("sim_e4").as("maxsim_e4"))
      val remaining = candSlim.join(selSet,
          candSlim("qid") === selSet("sq") && candSlim("cid") === selSet("sc"),
          "left_anti")
      val pick = remaining
        .join(msim.select(col("qid").as("mq"), col("c1"), col("maxsim_e4")),
          col("qid") === col("mq") && col("cid") === col("c1"))
        .select(col("qid"), col("cid"), col("rel_e4"),
          (col("rel_e4") * 7 - col("maxsim_e4") * 3).as("score_x10_e4"))
        .withColumn("rn", row_number().over(Window.partitionBy("qid")
          .orderBy(col("score_x10_e4").desc, col("cid"))))
        .filter(col("rn") === 1)
        .select(col("qid"), col("cid"), lit(step.toLong).as("step"),
          col("rel_e4"), col("score_x10_e4"))
      selected = selected.unionByName(pick)
    }
    selected.orderBy("qid", "step")
  }

  private val q283Sql = {
    import graft.functions.Vectors
    val cosQ = Vectors.cosineSql("q.qv", "e.embedding")
    val cosAB = Vectors.cosineSql("ea.embedding", "eb.embedding")
    val steps = (2 to 4).map { n =>
      val prevSel = (1 until n).map(i => s"SELECT qid, cid FROM s$i")
        .mkString(" UNION ALL ")
      s"""sel$n AS ($prevSel),
         |ms$n AS (
         |  SELECT sim.qid, c1 AS cid, max(sim_e4) AS maxsim_e4
         |  FROM sim JOIN sel$n ON sim.qid = sel$n.qid
         |    AND sim.c2 = sel$n.cid
         |  GROUP BY 1, 2),
         |r$n AS (
         |  SELECT cand.qid, cand.cid, rel_e4,
         |    CAST(7 * rel_e4 - 3 * maxsim_e4 AS BIGINT) AS score_x10_e4
         |  FROM cand JOIN ms$n ON cand.qid = ms$n.qid
         |    AND cand.cid = ms$n.cid
         |  WHERE NOT EXISTS (SELECT 1 FROM sel$n
         |    WHERE sel$n.qid = cand.qid AND sel$n.cid = cand.cid)),
         |s$n AS (
         |  SELECT qid, cid, CAST($n AS BIGINT) AS step, rel_e4,
         |    score_x10_e4
         |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |          ORDER BY score_x10_e4 DESC, cid) AS rn FROM r$n)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
       |           FROM embeddings WHERE vec_id % 100 = 0),
       |scored AS (
       |  SELECT qid, e.vec_id AS cid,
       |    CAST(round(($cosQ) * 10000) AS BIGINT) AS rel_e4
       |  FROM q, embeddings e WHERE e.vec_id <> qid),
       |cand AS (
       |  SELECT qid, cid, rel_e4
       |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |          ORDER BY rel_e4 DESC, cid) AS rnk FROM scored)
       |  WHERE rnk <= 12),
       |sim AS (
       |  SELECT a.qid, a.cid AS c1, b.cid AS c2,
       |    CAST(round(($cosAB) * 10000) AS BIGINT) AS sim_e4
       |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid
       |  JOIN embeddings ea ON a.cid = ea.vec_id
       |  JOIN embeddings eb ON b.cid = eb.vec_id),
       |s1 AS (
       |  SELECT qid, cid, CAST(1 AS BIGINT) AS step, rel_e4,
       |    CAST(7 * rel_e4 AS BIGINT) AS score_x10_e4
       |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |          ORDER BY rel_e4 DESC, cid) AS rn FROM cand)
       |  WHERE rn = 1),
       |$steps
       |SELECT qid, step, cid, rel_e4, score_x10_e4
       |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
       |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
       |ORDER BY qid, step""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q284 — Markov removal-effect attribution (the data-driven
  // alternative to q242's first/last-touch heuristics): user-day
  // journeys over the event channels build a first-order Markov
  // chain with purchase absorbing (paths truncate at the first
  // purchase; day-end is the implicit null absorber), and each
  // channel's credit is its REMOVAL EFFECT — how much total
  // conversion probability disappears when the channel's state is
  // deleted from the chain. Absorption probabilities come from 16
  // unrolled value-iteration steps x ← r + Qx on the 4×4 transient
  // matrix; the iteration EXPRESSIONS are generated once in Scala
  // and fed verbatim to BOTH engines (Spark selectExpr and the
  // DuckDB CTE chain), so every IEEE multiply-add runs in the
  // identical order. Scale shape: one events scan → per-(user, day)
  // window → 25 transition counts; everything after — the 5-scenario
  // expansion (baseline + 4 removals), the 16 iterations, the final
  // shares — is arithmetic on a 5-row frame. Removal drops are
  // e9-rounded before the exact integer share division.
  // ---------------------------------------------------------------------
  private val mkStates = Seq("c" -> "click", "v" -> "view",
    "s" -> "signup", "e" -> "error")

  /** One value-iteration step x_i ← r_i + Σ_j q_ij·x_j as SQL text —
    * the SAME strings drive Spark's selectExpr and the DuckDB CTE
    * chain (fixed left-assoc add order = identical IEEE on both). */
  private def mkIterExprs: Seq[String] = mkStates.map { case (i, _) =>
    s"r_$i + " + mkStates.map { case (j, _) => s"q_$i$j * x_$j" }
      .mkString(" + ") + s" AS x_$i"
  }

  private def mkCarry: Seq[String] =
    Seq("scenario") ++
      mkStates.flatMap { case (i, _) => mkStates.map { case (j, _) =>
        s"q_$i$j" } } ++
      mkStates.map { case (i, _) => s"r_$i" } ++
      mkStates.map { case (j, _) => s"pi_$j" } ++ Seq("pi_p")

  private def q284(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("ts_s").cast("date").as("d"),
        col("ts_s"), col("event_id"), col("event_type"))
    val w = Window.partitionBy("user_id", "d")
      .orderBy(col("ts_s"), col("event_id"))
    val seqd = ev
      .withColumn("rn", row_number().over(w))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .withColumn("purch_before", count(when(col("event_type") ===
        "purchase", 1)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
    // entry distribution π (first event of each user-day)
    def share(num: Column, den: Column): Column =
      num.cast("double") / den.cast("double")
    val firsts = seqd.filter(col("rn") === 1)
    def cntF(t: String) = sum((col("event_type") === t).cast("long"))
    val piCols = Seq(cntF("click"), cntF("view"), cntF("signup"),
      cntF("error"), cntF("purchase"), count(lit(1)))
    val pi = firsts.agg(piCols.head, piCols.tail: _*)
      .toDF("f_c", "f_v", "f_s", "f_e", "f_p", "n_sess")
    // transition counts from pre-absorption, non-purchase rows
    val from = seqd.filter(col("purch_before") === 0 &&
      col("event_type") =!= "purchase")
    def cntT(a: String, b: String) = sum((col("event_type") === a &&
      col("nxt") === b).cast("long"))
    val outCols = mkStates.flatMap { case (_, an) =>
      mkStates.map { case (_, bn) => cntT(an, bn) } :+
        cntT(an, "purchase") :+
        sum((col("event_type") === an).cast("long"))
    }
    val tcnt = from.agg(outCols.head, outCols.tail: _*)
      .toDF(mkStates.flatMap { case (i, _) =>
        mkStates.map { case (j, _) => s"n_$i$j" } :+ s"n_${i}p" :+
          s"n_${i}_tot" }: _*)
    // probabilities, one row; q_ij = n_ij / n_i_tot (0 when no exits)
    val probs = tcnt.crossJoin(pi).select(
      (mkStates.flatMap { case (i, _) =>
        mkStates.map { case (j, _) =>
          when(col(s"n_${i}_tot") === 0, lit(0.0))
            .otherwise(share(col(s"n_$i$j"), col(s"n_${i}_tot")))
            .as(s"q_$i$j") } :+
          when(col(s"n_${i}_tot") === 0, lit(0.0))
            .otherwise(share(col(s"n_${i}p"), col(s"n_${i}_tot")))
            .as(s"r_$i")
      } ++
        mkStates.map { case (j, _) =>
          share(col(s"f_$j"), col("n_sess")).as(s"pi_$j") } :+
        share(col("f_p"), col("n_sess")).as("pi_p")): _*)
    // scenario expansion: baseline + remove each channel
    val scen = s.createDataFrame(
      Seq(Tuple1("none")) ++ mkStates.map { case (_, n) => Tuple1(n) })
      .toDF("scenario")
    val zeroed = probs.crossJoin(broadcast(scen)).select(
      (col("scenario") +:
        (mkStates.flatMap { case (i, in) =>
          mkStates.map { case (j, jn) =>
            when(col("scenario") === in || col("scenario") === jn,
              lit(0.0)).otherwise(col(s"q_$i$j")).as(s"q_$i$j") } :+
            when(col("scenario") === in, lit(0.0))
              .otherwise(col(s"r_$i")).as(s"r_$i")
        } ++
          mkStates.map { case (j, jn) =>
            when(col("scenario") === jn, lit(0.0))
              .otherwise(col(s"pi_$j")).as(s"pi_$j") } :+ col("pi_p"))): _*)
    // 16 value-iteration steps, expressions shared with the oracle
    var it = zeroed.selectExpr(mkCarry ++
      mkStates.map { case (i, _) => s"CAST(0.0 AS DOUBLE) AS x_$i" }: _*)
    for (_ <- 1 to 16)
      it = it.selectExpr(mkCarry ++ mkIterExprs: _*)
    val convExpr = "pi_c * x_c + pi_v * x_v + pi_s * x_s + pi_e * x_e" +
      " + pi_p"
    val conv = it.selectExpr("scenario", s"$convExpr AS conv")
      .pin() // two branches below (baseline row + channels)
    val base = conv.filter(col("scenario") === "none")
      .select(col("conv").as("conv0"))
    val drops = conv.filter(col("scenario") =!= "none")
      .crossJoin(broadcast(base))
      .select(col("scenario").as("channel"),
        round(col("conv") * 1000000.0).cast("long").as("conv_e6"),
        round(col("conv0") * 1000000.0).cast("long").as("conv0_e6"),
        round((col("conv0") - col("conv")) * 1000000000.0).cast("long")
          .as("drop_e9"))
    val totDrop = drops.agg(sum("drop_e9").as("tot_drop_e9"))
    drops.crossJoin(broadcast(totDrop))
      .select(col("channel"), col("conv_e6"), col("conv0_e6"),
        col("drop_e9"),
        round(col("drop_e9").cast("double") /
          col("tot_drop_e9").cast("double") * 1000000.0).cast("long")
          .as("share_e6"))
      .orderBy("channel")
  }

  private val q284Sql = {
    val sec = Exact.secSql("ts")
    // transition-count select list (n_ij, n_ip, n_i_tot per i)
    val cnts = mkStates.flatMap { case (i, an) =>
      mkStates.map { case (j, bn) =>
        s"CAST(sum(CASE WHEN event_type = '$an' AND nxt = '$bn' " +
          s"THEN 1 ELSE 0 END) AS BIGINT) AS n_$i$j" } ++ Seq(
        s"CAST(sum(CASE WHEN event_type = '$an' AND nxt = 'purchase' " +
          s"THEN 1 ELSE 0 END) AS BIGINT) AS n_${i}p",
        s"CAST(sum(CASE WHEN event_type = '$an' THEN 1 ELSE 0 END) " +
          s"AS BIGINT) AS n_${i}_tot")
    }.mkString(",\n    ")
    val firstCnts = (mkStates.map { case (i, an) =>
      s"CAST(sum(CASE WHEN event_type = '$an' THEN 1 ELSE 0 END) " +
        s"AS BIGINT) AS f_$i" } ++ Seq(
      "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS f_p",
      "CAST(count(*) AS BIGINT) AS n_sess")).mkString(",\n    ")
    val probCols = (mkStates.flatMap { case (i, _) =>
      mkStates.map { case (j, _) =>
        s"CASE WHEN n_${i}_tot = 0 THEN 0.0 ELSE " +
          s"CAST(n_$i$j AS DOUBLE) / CAST(n_${i}_tot AS DOUBLE) END " +
          s"AS q_$i$j" } :+ (
        s"CASE WHEN n_${i}_tot = 0 THEN 0.0 ELSE " +
          s"CAST(n_${i}p AS DOUBLE) / CAST(n_${i}_tot AS DOUBLE) END " +
          s"AS r_$i")
    } ++ mkStates.map { case (j, _) =>
      s"CAST(f_$j AS DOUBLE) / CAST(n_sess AS DOUBLE) AS pi_$j" } :+
      "CAST(f_p AS DOUBLE) / CAST(n_sess AS DOUBLE) AS pi_p")
      .mkString(",\n    ")
    val zeroCols = (Seq("scenario") ++ mkStates.flatMap { case (i, in) =>
      mkStates.map { case (j, jn) =>
        s"CASE WHEN scenario IN ('$in', '$jn') THEN 0.0 ELSE q_$i$j " +
          s"END AS q_$i$j" } :+
        s"CASE WHEN scenario = '$in' THEN 0.0 ELSE r_$i END AS r_$i"
    } ++ mkStates.map { case (j, jn) =>
      s"CASE WHEN scenario = '$jn' THEN 0.0 ELSE pi_$j END AS pi_$j" } :+
      "pi_p").mkString(",\n    ")
    val carry = mkCarry.mkString(", ")
    val iters = (1 to 16).map { k =>
      s"it$k AS (SELECT $carry, ${mkIterExprs.mkString(", ")} " +
        s"FROM it${k - 1})"
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, CAST($sec AS DATE) AS d, $sec AS ts_s,
       |    event_id, event_type
       |  FROM events),
       |seqd AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY user_id, d
       |      ORDER BY ts_s, event_id) AS rn,
       |    lead(event_type, 1) OVER (PARTITION BY user_id, d
       |      ORDER BY ts_s, event_id) AS nxt,
       |    count(CASE WHEN event_type = 'purchase' THEN 1 END)
       |      OVER (PARTITION BY user_id, d ORDER BY ts_s, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS purch_before
       |  FROM ev),
       |pi AS (
       |  SELECT
       |    $firstCnts
       |  FROM seqd WHERE rn = 1),
       |tcnt AS (
       |  SELECT
       |    $cnts
       |  FROM seqd
       |  WHERE COALESCE(purch_before, 0) = 0
       |    AND event_type <> 'purchase'),
       |probs AS (
       |  SELECT
       |    $probCols
       |  FROM tcnt CROSS JOIN pi),
       |scen AS (SELECT 'none' AS scenario UNION ALL SELECT 'click'
       |  UNION ALL SELECT 'view' UNION ALL SELECT 'signup'
       |  UNION ALL SELECT 'error'),
       |zeroed AS (
       |  SELECT
       |    $zeroCols
       |  FROM probs CROSS JOIN scen),
       |it0 AS (SELECT $carry,
       |  ${mkStates.map { case (i, _) =>
      s"CAST(0.0 AS DOUBLE) AS x_$i" }.mkString(", ")}
       |  FROM zeroed),
       |$iters,
       |conv AS (
       |  SELECT scenario,
       |    pi_c * x_c + pi_v * x_v + pi_s * x_s + pi_e * x_e + pi_p
       |      AS conv
       |  FROM it16),
       |base AS (SELECT conv AS conv0 FROM conv WHERE scenario = 'none'),
       |drops AS (
       |  SELECT scenario AS channel,
       |    CAST(round(conv * 1000000.0) AS BIGINT) AS conv_e6,
       |    CAST(round(conv0 * 1000000.0) AS BIGINT) AS conv0_e6,
       |    CAST(round((conv0 - conv) * 1000000000.0) AS BIGINT)
       |      AS drop_e9
       |  FROM conv CROSS JOIN base WHERE scenario <> 'none'),
       |tot AS (SELECT CAST(sum(drop_e9) AS BIGINT) AS tot_drop_e9
       |        FROM drops)
       |SELECT channel, conv_e6, conv0_e6, drop_e9,
       |  CAST(round(CAST(drop_e9 AS DOUBLE) / CAST(tot_drop_e9 AS DOUBLE)
       |    * 1000000.0) AS BIGINT) AS share_e6
       |FROM drops CROSS JOIN tot
       |ORDER BY channel""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q285 — weight-of-evidence / information-value feature audit (the
  // credit-scoring feature screen): bucket the event `value` into
  // 50-unit bins, outcome = purchase (good) vs error (bad);
  // WOE_i = ln(p_good_i / p_bad_i), IV = Σ (p_good_i − p_bad_i)·WOE_i.
  // One ln per BUCKET (≤ 10 of them, the q274 discipline: e6-round
  // each transcendental at the point it's computed, exact integer
  // arithmetic after); the IV contribution is e9-rounded per bucket
  // and summed exactly via an unpartitioned window over the 10-row
  // bucket table. Degenerate buckets (zero goods or zero bads) are
  // excluded symmetrically on both engines.
  // ---------------------------------------------------------------------
  private def q285(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .select(floor(col("value") / 50).cast("long").as("bucket"),
        (col("event_type") === "purchase").cast("long").as("good"))
    val buckets = e.groupBy("bucket")
      .agg(sum("good").as("n_good"),
        sum(lit(1L) - col("good")).as("n_bad"))
      .filter(col("n_good") > 0 && col("n_bad") > 0)
      .pin() // ≤10 rows; totals + per-bucket share one scan
    val tot = buckets.agg(sum("n_good").as("tg"), sum("n_bad").as("tb"))
    val scored = buckets.crossJoin(broadcast(tot))
      .withColumn("woe_e6",
        round(log(col("n_good").cast("double") / col("tg").cast("double") /
          (col("n_bad").cast("double") / col("tb").cast("double")))
          * 1000000.0).cast("long"))
      .withColumn("iv_part_e9",
        round((col("n_good").cast("double") / col("tg").cast("double") -
          col("n_bad").cast("double") / col("tb").cast("double")) *
          (col("woe_e6").cast("double") / 1000000.0) * 1000000000.0)
          .cast("long"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    scored.select(col("bucket"), col("n_good"), col("n_bad"),
        col("woe_e6"), col("iv_part_e9"),
        sum("iv_part_e9").over(wAll).as("iv_total_e9"))
      .orderBy("bucket")
  }

  private val q285Sql =
    """WITH e AS (
      |  SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
      |    CAST(event_type = 'purchase' AS BIGINT) AS good
      |  FROM events WHERE event_type IN ('purchase', 'error')),
      |buckets AS (
      |  SELECT bucket, CAST(sum(good) AS BIGINT) AS n_good,
      |    CAST(sum(1 - good) AS BIGINT) AS n_bad
      |  FROM e GROUP BY 1
      |  HAVING sum(good) > 0 AND sum(1 - good) > 0),
      |tot AS (SELECT CAST(sum(n_good) AS BIGINT) AS tg,
      |               CAST(sum(n_bad) AS BIGINT) AS tb FROM buckets),
      |scored AS (
      |  SELECT bucket, n_good, n_bad,
      |    CAST(round(ln(CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE)
      |      / (CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE)))
      |      * 1000000.0) AS BIGINT) AS woe_e6
      |  FROM buckets CROSS JOIN tot),
      |parts AS (
      |  SELECT scored.*,
      |    CAST(round((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE)
      |      - CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))
      |      * (CAST(woe_e6 AS DOUBLE) / 1000000.0) * 1000000000.0)
      |      AS BIGINT) AS iv_part_e9
      |  FROM scored CROSS JOIN tot)
      |SELECT bucket, n_good, n_bad, woe_e6, iv_part_e9,
      |  CAST(sum(iv_part_e9) OVER () AS BIGINT) AS iv_total_e9
      |FROM parts ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------------
  // q286 — Bloom-filter false-positive audit: build an m = 2^16-bit,
  // k = 4-hash Bloom filter over the customer keys (each key sets the
  // 4 portable-hash bit positions; the filter is the DISTINCT set of
  // positions — exactly how a distributed build materializes one
  // before OR-folding to a bitmap), probe it with 2000 keys from a
  // disjoint id range, and compare the observed false-positive rate
  // with the textbook (1 − e^{−kn/m})^k — with ln(1−1/m) a
  // Scala-computed literal, the inner exp the only runtime
  // transcendental (the q274 precedent), and the ^k as explicit
  // t·t·t·t. Membership is a positions equi-join (probe grain ≤
  // 2000·4 rows); nothing is ever collected to the driver.
  // ---------------------------------------------------------------------
  private def q286(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val m = 65536L
    val lnBase = math.log(1.0 - 1.0 / m) // ln(1 - 2^-16), exact literal
    val hashes = s.range(0, 4).select(col("id").as("hi"))
    val bits = t(s, dir, "customer").select(col("c_custkey"))
      .crossJoin(broadcast(hashes))
      .select(pmod(h.hash60(concat(lit("bf:"), col("hi"), lit(":"),
        col("c_custkey"))), lit(m)).as("pos"))
      .distinct()
    val nMem = t(s, dir, "customer").agg(count(lit(1)).as("n_members"))
    val probes = s.range(0, 2000)
      .select((col("id") + 1000000L).as("pk"))
      .crossJoin(broadcast(hashes))
      .select(col("pk"), pmod(h.hash60(concat(lit("bf:"), col("hi"),
        lit(":"), col("pk"))), lit(m)).as("pos"))
    val hits = probes.join(bits, "pos")
      .groupBy("pk").agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === 4)
      .agg(count(lit(1)).as("n_fp"))
    val nBits = bits.agg(count(lit(1)).as("n_bits_set"))
    nMem.crossJoin(nBits).crossJoin(hits)
      .withColumn("t", lit(1.0) -
        exp(col("n_members").cast("double") * lit(4.0) * lit(lnBase)))
      .select(col("n_members"), col("n_bits_set"),
        round(col("n_bits_set").cast("double") / lit(m.toDouble)
          * 1000000.0).cast("long").as("load_e6"),
        lit(2000L).as("n_probes"), col("n_fp"),
        round(col("n_fp").cast("double") / 2000.0 * 1000000.0)
          .cast("long").as("fpr_e6"),
        round(col("t") * col("t") * col("t") * col("t") * 1000000.0)
          .cast("long").as("theory_e6"))
  }

  private val q286Sql = {
    val h = graft.functions.PortableHash
    val m = 65536L
    val lnBase = math.log(1.0 - 1.0 / m)
    val bitPos = h.hash60DuckSql("'bf:' || hi || ':' || c_custkey")
    val probePos = h.hash60DuckSql("'bf:' || hi || ':' || pk")
    s"""WITH hashes AS (SELECT CAST(range AS BIGINT) AS hi FROM range(4)),
       |bits AS (
       |  SELECT DISTINCT $bitPos % $m AS pos
       |  FROM customer CROSS JOIN hashes),
       |nmem AS (SELECT CAST(count(*) AS BIGINT) AS n_members
       |         FROM customer),
       |probes AS (
       |  SELECT pk, $probePos % $m AS pos
       |  FROM (SELECT CAST(range + 1000000 AS BIGINT) AS pk
       |        FROM range(2000)) CROSS JOIN hashes),
       |fp AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_fp FROM (
       |    SELECT pk FROM probes JOIN bits USING (pos)
       |    GROUP BY pk HAVING count(*) = 4)),
       |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM bits),
       |base AS (
       |  SELECT n_members, n_bits_set, n_fp,
       |    1.0 - exp(CAST(n_members AS DOUBLE) * 4.0 * ($lnBase)) AS t
       |  FROM nmem CROSS JOIN nb CROSS JOIN fp)
       |SELECT n_members, n_bits_set,
       |  CAST(round(CAST(n_bits_set AS DOUBLE) / ${m.toDouble}
       |    * 1000000.0) AS BIGINT) AS load_e6,
       |  CAST(2000 AS BIGINT) AS n_probes, n_fp,
       |  CAST(round(CAST(n_fp AS DOUBLE) / 2000.0 * 1000000.0) AS BIGINT)
       |    AS fpr_e6,
       |  CAST(round(t * t * t * t * 1000000.0) AS BIGINT) AS theory_e6
       |FROM base""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q287 — KMV theta-sketch SET OPERATIONS, gated against exact truth:
  // the click and purchase visit sets are sketched with the SAME
  // portable hash family (the property that makes bottom-k sketches
  // composable), the union is sketched from the merged distinct
  // hashes, and the intersection is estimated by inclusion–exclusion
  // est_A + est_B − est_U — the DataSketches-theta workflow for
  // audience-overlap questions that never co-shuffles the raw sets.
  // All three rank windows run over one tagged union of the two
  // distinct-visit branches (one events scan, pinned); estimates fall
  // back to exact below k. Output is one audit row with exact vs
  // estimated cardinalities side by side.
  // ---------------------------------------------------------------------
  private def q287(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val visits = Tables.eventsSec(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("user_id"),
        datediff(col("ts_s").cast("date"), lit("2024-01-01")).as("d"))
      .distinct()
      .select(col("event_type"),
        h.hash60(concat(lit("kmv:"), col("user_id"), lit(":"),
          col("d"))).as("hv"))
      .pin() // one events scan feeds all three sketches
    val tagged = visits
      .select(when(col("event_type") === "click", "a").otherwise("b")
        .as("tag"), col("hv"))
      .unionByName(visits.select(col("hv")).distinct()
        .select(lit("u").as("tag"), col("hv")))
    val wH = Window.partitionBy("tag").orderBy("hv")
    val sk = tagged.withColumn("rn", row_number().over(wH))
      .groupBy("tag")
      .agg(count(lit(1)).as("n_exact"),
        max(when(col("rn") === 64, col("hv"))).as("h_k"))
      .withColumn("n_est", when(col("h_k").isNull, col("n_exact"))
        .otherwise(round(lit(63.0) * lit((1L << 60).toDouble) /
          col("h_k").cast("double")).cast("long")))
    // pivot the 3-row sketch table to one audit row
    def g(tag: String, c: String) =
      max(when(col("tag") === tag, col(c)))
    sk.agg(
        g("a", "n_exact").as("n_a"), g("b", "n_exact").as("n_b"),
        g("u", "n_exact").as("n_union"),
        (g("a", "n_exact") + g("b", "n_exact") - g("u", "n_exact"))
          .as("n_inter"),
        g("a", "n_est").as("est_a"), g("b", "n_est").as("est_b"),
        g("u", "n_est").as("est_union"),
        (g("a", "n_est") + g("b", "n_est") - g("u", "n_est"))
          .as("est_inter"))
      .withColumn("err_union_e4",
        round((col("est_union") - col("n_union")).cast("double") /
          col("n_union").cast("double") * 10000.0).cast("long"))
  }

  private val q287Sql = {
    val hv = graft.functions.PortableHash.hash60DuckSql(
      "'kmv:' || user_id || ':' || d")
    s"""WITH visits AS (
       |  SELECT DISTINCT event_type, user_id,
       |    datediff('day', DATE '2024-01-01',
       |      CAST(date_trunc('second', ts) AS DATE)) AS d
       |  FROM events WHERE event_type IN ('click', 'purchase')),
       |hashed AS (SELECT event_type, $hv AS hv FROM visits),
       |tagged AS (
       |  SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END
       |    AS tag, hv FROM hashed
       |  UNION ALL
       |  SELECT 'u' AS tag, hv FROM (SELECT DISTINCT hv FROM hashed)),
       |sk AS (
       |  SELECT tag, CAST(count(*) AS BIGINT) AS n_exact,
       |    max(CASE WHEN rn = 64 THEN hv END) AS h_k
       |  FROM (SELECT *, row_number() OVER (PARTITION BY tag
       |          ORDER BY hv) AS rn FROM tagged)
       |  GROUP BY tag),
       |est AS (
       |  SELECT tag, n_exact,
       |    CASE WHEN h_k IS NULL THEN n_exact
       |      ELSE CAST(round(63.0 * ${(1L << 60).toDouble}
       |        / CAST(h_k AS DOUBLE)) AS BIGINT) END AS n_est
       |  FROM sk),
       |piv AS (
       |  SELECT
       |    max(CASE WHEN tag = 'a' THEN n_exact END) AS n_a,
       |    max(CASE WHEN tag = 'b' THEN n_exact END) AS n_b,
       |    max(CASE WHEN tag = 'u' THEN n_exact END) AS n_union,
       |    max(CASE WHEN tag = 'a' THEN n_exact END)
       |      + max(CASE WHEN tag = 'b' THEN n_exact END)
       |      - max(CASE WHEN tag = 'u' THEN n_exact END) AS n_inter,
       |    max(CASE WHEN tag = 'a' THEN n_est END) AS est_a,
       |    max(CASE WHEN tag = 'b' THEN n_est END) AS est_b,
       |    max(CASE WHEN tag = 'u' THEN n_est END) AS est_union,
       |    max(CASE WHEN tag = 'a' THEN n_est END)
       |      + max(CASE WHEN tag = 'b' THEN n_est END)
       |      - max(CASE WHEN tag = 'u' THEN n_est END) AS est_inter
       |  FROM est)
       |SELECT *, CAST(round(CAST(est_union - n_union AS DOUBLE)
       |  / CAST(n_union AS DOUBLE) * 10000.0) AS BIGINT)
       |  AS err_union_e4
       |FROM piv""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q288 — ABC/XYZ inventory classification: parts are classed by
  // cumulative revenue contribution (A ≤ 80%, B ≤ 95%, C rest — the
  // Pareto cut) × demand variability (coefficient of variation of
  // monthly quantity: X cv<0.5, Y cv<1, Z else) — the planning matrix
  // behind every stocking policy. Both classifications are PURE
  // INTEGER decisions: the Pareto cut compares 10·cum_rev ≤ 8·total
  // (no share division), and cv thresholds square into
  // 4·(n·Σq²−(Σq)²) < (Σq)² and (n·Σq²−(Σq)²) < (Σq)² — exact long
  // arithmetic, no sqrt anywhere. The fact table aggregates to part
  // grain map-side; the Pareto cum-sum routes through
  // Curate.globalCumSum (part grain scales with the fact tables);
  // output is the ≤9-cell class grid.
  // ---------------------------------------------------------------------
  private def q288(s: SparkSession, dir: String): DataFrame = {
    val byPartMonth = t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"),
        trunc(col("l_shipdate"), "month").as("mon"))
      .agg(sum(col("l_quantity").cast("long")).as("q"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("rev_e2"))
    val byPart = byPartMonth.groupBy("pk")
      .agg(sum("rev_e2").as("rev_e2"), count(lit(1)).as("n_m"),
        sum("q").as("sq"), sum(col("q") * col("q")).as("sq2"))
      .pin() // part grain; cum-sum + total read this once
    val tot = byPart.agg(sum("rev_e2").as("tot_e2"))
    // Pareto cumulative revenue via the scale-safe global running
    // sum (Curate.globalCumSum: range repartition + broadcast
    // per-partition offsets) — part grain scales with the fact
    // tables, so no unpartitioned window here
    val classed = Curate
      .globalCumSum(byPart, Seq(col("rev_e2").desc, col("pk")),
        col("rev_e2"), "cum_e2")
      .drop("rnk")
      .crossJoin(broadcast(tot))
      .withColumn("abc",
        when(col("cum_e2") * 10 <= col("tot_e2") * 8, "A")
          .when(col("cum_e2") * 20 <= col("tot_e2") * 19, "B")
          .otherwise("C"))
      // cv² = (n·Σq² − S²)/S² against 0.25 and 1, cross-multiplied
      .withColumn("varn", col("n_m") * col("sq2") - col("sq") * col("sq"))
      .withColumn("xyz",
        when(col("varn") * 4 < col("sq") * col("sq"), "X")
          .when(col("varn") < col("sq") * col("sq"), "Y")
          .otherwise("Z"))
    classed.groupBy("abc", "xyz")
      .agg(count(lit(1)).as("n_parts"), sum("rev_e2").as("class_rev_e2"))
      .crossJoin(broadcast(tot))
      .select(col("abc"), col("xyz"), col("n_parts"), col("class_rev_e2"),
        round(col("class_rev_e2").cast("double") /
          col("tot_e2").cast("double") * 1000000.0).cast("long")
          .as("rev_share_e6"))
      .orderBy("abc", "xyz")
  }

  private val q288Sql =
    """WITH bpm AS (
      |  SELECT l_partkey AS pk, date_trunc('month', l_shipdate) AS mon,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
      |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |      AS BIGINT)) AS BIGINT) AS rev_e2
      |  FROM lineitem GROUP BY 1, 2),
      |bp AS (
      |  SELECT pk, CAST(sum(rev_e2) AS BIGINT) AS rev_e2,
      |    CAST(count(*) AS BIGINT) AS n_m,
      |    CAST(sum(q) AS BIGINT) AS sq, CAST(sum(q * q) AS BIGINT) AS sq2
      |  FROM bpm GROUP BY 1),
      |tot AS (SELECT CAST(sum(rev_e2) AS BIGINT) AS tot_e2 FROM bp),
      |classed AS (
      |  SELECT pk, rev_e2, n_m, sq, sq2, tot_e2,
      |    CAST(sum(rev_e2) OVER (ORDER BY rev_e2 DESC, pk
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_e2,
      |    n_m * sq2 - sq * sq AS varn
      |  FROM bp CROSS JOIN tot),
      |labeled AS (
      |  SELECT *,
      |    CASE WHEN cum_e2 * 10 <= tot_e2 * 8 THEN 'A'
      |      WHEN cum_e2 * 20 <= tot_e2 * 19 THEN 'B' ELSE 'C' END AS abc,
      |    CASE WHEN varn * 4 < sq * sq THEN 'X'
      |      WHEN varn < sq * sq THEN 'Y' ELSE 'Z' END AS xyz
      |  FROM classed)
      |SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(rev_e2) AS BIGINT) AS class_rev_e2,
      |  CAST(round(CAST(sum(rev_e2) AS DOUBLE)
      |    / CAST(max(tot_e2) AS DOUBLE) * 1000000.0) AS BIGINT)
      |    AS rev_share_e6
      |FROM labeled GROUP BY abc, xyz ORDER BY abc, xyz""".stripMargin

  // ---------------------------------------------------------------------
  // q289 — deterministic permutation test (exact randomization
  // inference at scale): are above-mean spenders more active (event
  // count) than below-mean spenders? The observed |mean-activity
  // difference| is compared against 200 HASH-SEEDED relabelings of
  // the user set — the nonparametric test that needs no variance
  // model, made reproducible by replacing the RNG with the portable
  // hash (every rerun and both engines see the identical
  // permutations). The above-mean split is an exact integer compare
  // (spend·n > total) so both groups are non-empty at every SF. The
  // fact table collapses to user grain FIRST (one scan); the 200-way
  // expansion is users×200 (bounded), each permutation an exact-long
  // conditional sum; |t| values are e6-rounded before comparison so
  // the p-value is an integer count. p = (1 + #{t_perm ≥ t_obs})/201,
  // the add-one convention.
  // ---------------------------------------------------------------------
  private def q289(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val base = Tables.eventsSec(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"),
        sum(round(col("value") * 100).cast("long")).as("spend_e2"))
      .pin() // user grain; totals + perms read this
    val tot = base.agg(count(lit(1)).as("n_u"),
      sum("spend_e2").as("tot_e2"))
    val users = base.crossJoin(broadcast(tot))
      .select(col("user_id"), col("n_ev"),
        (col("spend_e2") * col("n_u") > col("tot_e2")).cast("long")
          .as("grp"))
      .pin()
    def tE6(sum1: Column, n1: Column, sum0: Column, n0: Column): Column =
      round(abs(sum1.cast("double") / n1.cast("double") -
        sum0.cast("double") / n0.cast("double")) * 1000000.0).cast("long")
    val obs = users.agg(
        sum(when(col("grp") === 1, col("n_ev"))).as("s1"),
        sum(when(col("grp") === 1, 1L)).as("n1"),
        sum(when(col("grp") === 0, col("n_ev"))).as("s0"),
        sum(when(col("grp") === 0, 1L)).as("n0"))
      .select(col("n1"), col("n0"),
        tE6(col("s1"), col("n1"), col("s0"), col("n0")).as("t_obs_e6"))
    val perms = users.crossJoin(broadcast(
        s.range(0, 200).select(col("id").as("p"))))
      .withColumn("pg", pmod(h.hash60(concat(lit("perm:"), col("p"),
        lit(":"), col("user_id"))), lit(2L)))
      .groupBy("p")
      .agg(sum(when(col("pg") === 1, col("n_ev"))).as("s1"),
        sum(when(col("pg") === 1, 1L)).as("n1"),
        sum(when(col("pg") === 0, col("n_ev"))).as("s0"),
        sum(when(col("pg") === 0, 1L)).as("n0"))
      .select(col("p"),
        tE6(col("s1"), col("n1"), col("s0"), col("n0")).as("t_e6"))
    perms.crossJoin(broadcast(obs))
      .agg(max("n1").as("n_grp1"), max("n0").as("n_grp0"),
        max("t_obs_e6").as("t_obs_e6"),
        sum((col("t_e6") >= col("t_obs_e6")).cast("long")).as("n_ge"))
      .withColumn("p_value_e6",
        round((col("n_ge") + 1).cast("double") / 201.0 * 1000000.0)
          .cast("long"))
  }

  private val q289Sql = {
    val pg = graft.functions.PortableHash.hash60DuckSql(
      "'perm:' || p || ':' || user_id")
    s"""WITH base AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
       |      AS spend_e2
       |  FROM events GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_u,
       |               CAST(sum(spend_e2) AS BIGINT) AS tot_e2 FROM base),
       |users AS (
       |  SELECT user_id, n_ev,
       |    CAST(spend_e2 * n_u > tot_e2 AS BIGINT) AS grp
       |  FROM base CROSS JOIN tot),
       |obs AS (
       |  SELECT CAST(sum(CASE WHEN grp = 1 THEN 1 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN grp = 0 THEN 1 END) AS BIGINT) AS n0,
       |    CAST(round(abs(
       |      CAST(sum(CASE WHEN grp = 1 THEN n_ev END) AS DOUBLE)
       |        / CAST(sum(CASE WHEN grp = 1 THEN 1 END) AS DOUBLE)
       |      - CAST(sum(CASE WHEN grp = 0 THEN n_ev END) AS DOUBLE)
       |        / CAST(sum(CASE WHEN grp = 0 THEN 1 END) AS DOUBLE))
       |      * 1000000.0) AS BIGINT) AS t_obs_e6
       |  FROM users),
       |perms AS (
       |  SELECT p,
       |    CAST(round(abs(
       |      CAST(sum(CASE WHEN pg = 1 THEN n_ev END) AS DOUBLE)
       |        / CAST(sum(CASE WHEN pg = 1 THEN 1 END) AS DOUBLE)
       |      - CAST(sum(CASE WHEN pg = 0 THEN n_ev END) AS DOUBLE)
       |        / CAST(sum(CASE WHEN pg = 0 THEN 1 END) AS DOUBLE))
       |      * 1000000.0) AS BIGINT) AS t_e6
       |  FROM (
       |    SELECT u.*, p, $pg % 2 AS pg
       |    FROM users u CROSS JOIN
       |      (SELECT CAST(range AS BIGINT) AS p FROM range(200)))
       |  GROUP BY 1)
       |SELECT max(n1) AS n_grp1, max(n0) AS n_grp0,
       |  max(t_obs_e6) AS t_obs_e6,
       |  CAST(sum(CASE WHEN t_e6 >= t_obs_e6 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_ge,
       |  CAST(round(CAST(sum(CASE WHEN t_e6 >= t_obs_e6 THEN 1 ELSE 0
       |    END) + 1 AS DOUBLE) / 201.0 * 1000000.0) AS BIGINT)
       |    AS p_value_e6
       |FROM perms CROSS JOIN obs""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q290 — sequential-pattern support census (the PrefixSpan-style
  // question "how many sessions contain a → b → c as a SUBSEQUENCE,
  // adjacent or not?" — q102's transition matrix only sees adjacent
  // pairs): for every ordered triple of distinct channels, the count
  // of user-day sessions with events a, then b, then c in strict
  // time order. The witness test never enumerates event triples:
  // a session supports (a,b,c) iff the FIRST b after the session's
  // earliest a still precedes the session's latest c — so the whole
  // census runs on a per-session min/max pivot plus one conditional
  // min per (b-event, a-channel). Shapes: one events scan → session
  // pivot (groupBy) + per-(session, b) conditional firsts → the
  // 5×4×3 = 60-combo expansion is two generated unpivots over
  // session-grain rows (both engines' unpivot/case lists generated
  // from the same Scala channel list). Supports are exact counts.
  // ---------------------------------------------------------------------
  private val spTypes = Seq("click", "view", "signup", "error", "purchase")

  private def q290(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("ts_s").cast("date").as("d"),
        Exact.epochS(col("ts_s")).as("ts"), col("event_type"))
    val pivotAggs = spTypes.flatMap { ty => Seq(
      min(when(col("event_type") === ty, col("ts"))).as(s"mn_$ty"),
      max(when(col("event_type") === ty, col("ts"))).as(s"mx_$ty")) }
    val piv = ev.groupBy("user_id", "d")
      .agg(pivotAggs.head, pivotAggs.tail: _*)
      .pin() // session grain; firsts + the c-join read this
    val nSess = piv.agg(count(lit(1)).as("n_sessions"))
    // first b-event strictly after the session's earliest a, per a
    val firstAggs = spTypes.map { a =>
      min(when(col("ts") > col(s"mn_$a"), col("ts"))).as(s"f_$a") }
    val firsts = ev.join(piv.select(
        (Seq(col("user_id").as("pu"), col("d").as("pd")) ++
          spTypes.map(a => col(s"mn_$a"))): _*),
        col("user_id") === col("pu") && col("d") === col("pd"))
      .groupBy(col("user_id"), col("d"), col("event_type").as("b"))
      .agg(firstAggs.head, firstAggs.tail: _*)
    val aStack = spTypes.map(a => s"'$a', f_$a").mkString(", ")
    val unpivA = firsts.selectExpr("user_id", "d", "b",
        s"stack(${spTypes.size}, $aStack) AS (a, t_star)")
      .filter(col("a") =!= col("b") && col("t_star").isNotNull)
    val cStack = spTypes.map(c => s"'$c', mx_$c").mkString(", ")
    val withC = unpivA.join(piv.select(
        (Seq(col("user_id").as("pu"), col("d").as("pd")) ++
          spTypes.map(c => col(s"mx_$c"))): _*),
        col("user_id") === col("pu") && col("d") === col("pd"))
      .selectExpr("user_id", "d", "a", "b", "t_star",
        s"stack(${spTypes.size}, $cStack) AS (c, mx_c)")
      .filter(col("c") =!= col("a") && col("c") =!= col("b") &&
        col("t_star") < col("mx_c"))
    withC.groupBy("a", "b", "c")
      .agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(nSess))
      .select(col("a"), col("b"), col("c"), col("support"),
        round(col("support").cast("double") /
          col("n_sessions").cast("double") * 1000000.0).cast("long")
          .as("share_e6"))
      .orderBy("a", "b", "c")
  }

  private val q290Sql = {
    val sec = Exact.epochSSql("ts")
    val pivotCols = spTypes.flatMap { ty => Seq(
      s"min(CASE WHEN event_type = '$ty' THEN ts_l END) AS mn_$ty",
      s"max(CASE WHEN event_type = '$ty' THEN ts_l END) AS mx_$ty") }
      .mkString(",\n    ")
    val firstCols = spTypes.map { a =>
      s"min(CASE WHEN ev.ts_l > mn_$a THEN ev.ts_l END) AS f_$a" }
      .mkString(",\n    ")
    val unpivA = spTypes.map { a =>
      s"SELECT user_id, d, b, '$a' AS a, f_$a AS t_star FROM firsts" }
      .mkString("\n  UNION ALL ")
    val unpivC = spTypes.map { c =>
      s"SELECT ua.*, '$c' AS c, mx_$c AS mx_c FROM ua " +
        s"JOIN piv ON ua.user_id = piv.user_id AND ua.d = piv.d" }
      .mkString("\n  UNION ALL ")
    s"""WITH ev AS (
       |  SELECT user_id, CAST($sec AS BIGINT) AS ts_l,
       |    CAST(date_trunc('second', ts) AS DATE) AS d, event_type
       |  FROM events),
       |piv AS (
       |  SELECT user_id, d,
       |    $pivotCols
       |  FROM ev GROUP BY 1, 2),
       |nsess AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM piv),
       |firsts AS (
       |  SELECT ev.user_id, ev.d, ev.event_type AS b,
       |    $firstCols
       |  FROM ev JOIN piv ON ev.user_id = piv.user_id AND ev.d = piv.d
       |  GROUP BY 1, 2, 3),
       |ua AS (
       |  SELECT * FROM (
       |  $unpivA)
       |  WHERE a <> b AND t_star IS NOT NULL),
       |uc AS (
       |  $unpivC),
       |hits AS (
       |  SELECT a, b, c, CAST(count(*) AS BIGINT) AS support
       |  FROM uc WHERE c <> a AND c <> b AND t_star < mx_c
       |  GROUP BY 1, 2, 3)
       |SELECT a, b, c, support,
       |  CAST(round(CAST(support AS DOUBLE) / CAST(n_sessions AS DOUBLE)
       |    * 1000000.0) AS BIGINT) AS share_e6
       |FROM hits CROSS JOIN nsess
       |ORDER BY a, b, c""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q291 — uplift-by-decile table (the heterogeneous-treatment-effect
  // readout of every holdout experiment): users are deciled by
  // activity (the pre-treatment covariate), "exposure" is having hit
  // an error, conversion is any purchase; each decile reports
  // exposed/control conversion rates and their difference — where
  // the effect concentrates. Deciles come from an integer fold of
  // the scale-safe global rank ((rn−1)·10 div n — no ntile tie
  // ambiguity, user_id tiebreak, Curate.globalRank so the user-grain
  // ranking never funnels through one task); rates are single e6-rounded divisions of exact longs;
  // control-empty deciles surface as NULL on both engines rather
  // than a fake zero. One events scan → user grain → 10-row output.
  // ---------------------------------------------------------------------
  private def q291(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.eventsSec(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"),
        max((col("event_type") === "error").cast("long")).as("treated"),
        max((col("event_type") === "purchase").cast("long")).as("conv"))
      .pin() // user grain; count scalar + deciles share it
    val nU = users.agg(count(lit(1)).as("n_u"))
    def rate(num: Column, den: Column): Column =
      when(den === 0, lit(null)).otherwise(
        round(num.cast("double") / den.cast("double") * 1000000.0)
          .cast("long"))
    // deciles via the scale-safe global rank (range repartition +
    // per-partition offsets, Curate.globalRank) — user grain is
    // 10^8–10^9 rows at 100 TB, far past any single-task
    // Window.orderBy funnel
    Curate.globalRank(users, Seq(col("n_ev"), col("user_id")), "rn")
      .crossJoin(broadcast(nU))
      .withColumn("decile", expr("(rn - 1) * 10 div n_u"))
      .groupBy("decile")
      .agg(sum("treated").as("n_treat"),
        sum(lit(1L) - col("treated")).as("n_ctl"),
        sum(col("treated") * col("conv")).as("conv_treat"),
        sum((lit(1L) - col("treated")) * col("conv")).as("conv_ctl"))
      .select(col("decile"), col("n_treat"), col("n_ctl"),
        rate(col("conv_treat"), col("n_treat")).as("rate_treat_e6"),
        rate(col("conv_ctl"), col("n_ctl")).as("rate_ctl_e6"))
      .withColumn("uplift_e6",
        col("rate_treat_e6") - col("rate_ctl_e6"))
      .orderBy("decile")
  }

  private val q291Sql =
    """WITH users AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
      |    CAST(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS treated,
      |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS conv
      |  FROM events GROUP BY 1),
      |nu AS (SELECT CAST(count(*) AS BIGINT) AS n_u FROM users),
      |ranked AS (
      |  SELECT *, (CAST(row_number() OVER (ORDER BY n_ev, user_id)
      |    AS BIGINT) - 1) * 10 // n_u AS decile
      |  FROM users CROSS JOIN nu),
      |agg AS (
      |  SELECT decile, CAST(sum(treated) AS BIGINT) AS n_treat,
      |    CAST(sum(1 - treated) AS BIGINT) AS n_ctl,
      |    CAST(sum(treated * conv) AS BIGINT) AS conv_treat,
      |    CAST(sum((1 - treated) * conv) AS BIGINT) AS conv_ctl
      |  FROM ranked GROUP BY 1),
      |rates AS (
      |  SELECT decile, n_treat, n_ctl,
      |    CASE WHEN n_treat = 0 THEN NULL ELSE
      |      CAST(round(CAST(conv_treat AS DOUBLE)
      |        / CAST(n_treat AS DOUBLE) * 1000000.0) AS BIGINT) END
      |      AS rate_treat_e6,
      |    CASE WHEN n_ctl = 0 THEN NULL ELSE
      |      CAST(round(CAST(conv_ctl AS DOUBLE)
      |        / CAST(n_ctl AS DOUBLE) * 1000000.0) AS BIGINT) END
      |      AS rate_ctl_e6
      |  FROM agg)
      |SELECT *, rate_treat_e6 - rate_ctl_e6 AS uplift_e6
      |FROM rates ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------------
  // q292 — deterministic random-walk corpus (the node2vec/DeepWalk
  // input layer): 6-step walks over the undirected customer–supplier
  // purchase graph, one walker per sampled customer, with every
  // next-hop chosen by PORTABLE HASH over (walker, step) modulo the
  // current node's degree — a reproducible replacement for the RNG
  // that makes the walk corpus identical across reruns, engines, and
  // cluster layouts (the property an embedding-training pipeline
  // needs for cacheable corpora). Node ids are namespaced into one
  // key space (customer·2 / supplier·2+1). Scale shape: the ranked
  // adjacency (row_number per source) and degree table are built
  // once and pinned; each of the 6 unrolled steps is ONE equi-join
  // on (node, picked-rank) — walk state stays walker-grain, the
  // adjacency is never exploded. The adjacency is degree-capped at
  // 512 (walks pick among each node's 512 smallest-id neighbors;
  // modulus uses the capped degree) so no hub can serialize the
  // ranking into one task.
  // ---------------------------------------------------------------------
  private def q292(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val cs = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("cn"),
        (col("l_suppkey") * 2 + 1).as("sn"))
      .distinct()
    val edges = cs.select(col("cn").as("src"), col("sn").as("dst"))
      .unionByName(cs.select(col("sn").as("src"), col("cn").as("dst")))
    // degree-capped ranked adjacency (Graph.rankedAdjacency: the
    // TopKPerKey bounded-heap plan, no per-src sort group — a
    // 10^7-degree hub cannot serialize one task). deg below counts
    // the KEPT rows, so the pick modulus uses the capped degree and
    // every hash-picked hop still resolves; cap=512 is live at
    // sf0.1 (max degree 679), so the capping path is oracle-tested
    // in the gate, not just in specs.
    val nbr = graft.operators.Graph
      .rankedAdjacency(edges, maxDeg = 512)
      .pin() // ranked adjacency, read by all 6 steps
    val deg = nbr.groupBy(col("src").as("dn"))
      .agg(count(lit(1)).as("deg"))
      .pin() // capped degree, read by all 6 steps
    var walk = nbr.select(col("src").as("walker")).distinct()
      .filter(col("walker") % 2 === 0 && col("walker") % 20 === 0)
      .select(col("walker"), lit(0L).as("step"),
        col("walker").as("node"))
      .pin()
    // r13: checkpointed frames have no size stats, so the planner
    // never auto-broadcasts the walker-grain frontier — each step's
    // two joins fell to AQE runtime conversion, paying the map-side
    // shuffle write of the frontier AND of the adjacency/degree
    // stream first. One cheap count on the pinned grain (walkers are
    // one row each, every step) gates an explicit broadcast hint
    // below Graph.BroadcastMaxNodes; above it the shuffle join
    // stands — same rows either way.
    val walkerSmall =
      walk.count() <= graft.operators.Graph.BroadcastMaxNodes
    var frontier = walk
    for (st <- 1 to 6) {
      val f = if (walkerSmall) broadcast(frontier) else frontier
      val pick = f
        .join(deg, col("node") === col("dn"))
        .select(col("walker"),
          pmod(h.hash60(concat(lit("walk:"), col("walker"), lit(":"),
            lit(st))), col("deg")).as("pick"), col("node"))
      // fresh per-step column names: the adjacency re-joins its own
      // lineage every step, so unqualified src/dst/idx would be
      // ambiguous under Spark's self-join analysis
      val nb = nbr.select(col("src").as(s"src_$st"),
        col("dst").as(s"dst_$st"), col("idx").as(s"idx_$st"))
      val next = (if (walkerSmall) broadcast(pick) else pick)
        .join(nb, col("node") === col(s"src_$st") &&
          col("pick") === col(s"idx_$st"))
        .select(col("walker"), lit(st.toLong).as("step"),
          col(s"dst_$st").as("node"))
        // pin each walker-grain frontier (≤ |walkers| rows): it feeds
        // both the next hop and the output union — without the pin the
        // final plan re-derives step k's join chain 7−k times
        .pin()
      frontier = next
      walk = walk.unionByName(next)
    }
    walk
      .select(col("walker"), col("step"), col("node"),
        (col("node") % 2 === 1).cast("long").as("is_supplier"),
        expr("node div 2").as("entity_id"))
      .orderBy("walker", "step")
  }

  private val q292Sql = {
    val h = graft.functions.PortableHash
    val steps = (1 to 6).map { st =>
      val pick = h.hash60DuckSql(s"'walk:' || walker || ':' || $st")
      s"""w$st AS MATERIALIZED (
         |  SELECT p.walker, CAST($st AS BIGINT) AS step, nbr.dst AS node
         |  FROM (
         |    SELECT walker, node, $pick % deg AS pick
         |    FROM w${st - 1} JOIN deg ON w${st - 1}.node = deg.dn) p
         |  JOIN nbr ON p.node = nbr.src AND p.pick = nbr.idx)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT DISTINCT o_custkey * 2 AS cn, l_suppkey * 2 + 1 AS sn
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS (
       |  SELECT cn AS src, sn AS dst FROM cs
       |  UNION ALL SELECT sn AS src, cn AS dst FROM cs),
       |nbr AS MATERIALIZED (
       |  SELECT src, dst, idx FROM (
       |    SELECT src, dst, CAST(row_number() OVER (PARTITION BY src
       |      ORDER BY dst) AS BIGINT) - 1 AS idx
       |    FROM edges)
       |  WHERE idx < 512),
       |deg AS MATERIALIZED (SELECT src AS dn, CAST(count(*) AS BIGINT) AS deg
       |        FROM nbr GROUP BY 1),
       |w0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS walker, CAST(0 AS BIGINT) AS step,
       |    src AS node
       |  FROM nbr WHERE src % 2 = 0 AND src % 20 = 0),
       |$steps,
       |walks AS (
       |  SELECT * FROM w0 UNION ALL SELECT * FROM w1
       |  UNION ALL SELECT * FROM w2 UNION ALL SELECT * FROM w3
       |  UNION ALL SELECT * FROM w4 UNION ALL SELECT * FROM w5
       |  UNION ALL SELECT * FROM w6)
       |SELECT walker, step, node,
       |  CAST(node % 2 = 1 AS BIGINT) AS is_supplier,
       |  node // 2 AS entity_id
       |FROM walks ORDER BY walker, step""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q293 — covariate-balance audit (standardized mean difference):
  // before trusting any holdout comparison, check the hash split
  // itself — for each user covariate (activity, spend, active days),
  // SMD = (m_A − m_B) / √((v_A + v_B)/2) between the two fold-halves
  // of the q282-style hash split. |SMD| < 0.1 is the conventional
  // "balanced" bar. All moments are exact long sums (Σx, Σx², n per
  // arm); variances use the n·Σx²−S² integer form; the one √ and one
  // division run over exact integers at the 3-covariate grain. One
  // events scan → user grain → a 3-row report.
  // ---------------------------------------------------------------------
  private def q293(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val users = Tables.eventsSec(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("v_activity"),
        sum(round(col("value") * 100).cast("long")).as("v_spend_e2"),
        countDistinct(col("ts_s").cast("date")).as("v_days"))
      .withColumn("arm",
        pmod(h.hash60(concat(lit("fold:"), col("user_id"))), lit(2L)))
    val melted = users.selectExpr("arm",
      "stack(3, 'activity', v_activity, 'spend_e2', v_spend_e2, " +
        "'days', v_days) AS (covariate, x)")
    // squares accumulate in decimal(38,0) (the q277 discipline):
    // LONG·LONG headroom shrinks ~100× per 10× scale-up, and on
    // overflow Spark's non-ANSI sum wraps silently while DuckDB's
    // HUGEINT accumulator errors — divergent failure modes. The wide
    // sum only ever feeds a double, so parity is unaffected.
    def sq(c: Column): Column = c.cast("decimal(38,0)") * c
    val m = melted.groupBy("covariate")
      .agg(sum(when(col("arm") === 0, 1L)).as("n0"),
        sum(when(col("arm") === 0, col("x"))).as("s0"),
        sum(when(col("arm") === 0, sq(col("x")))).as("ss0"),
        sum(when(col("arm") === 1, 1L)).as("n1"),
        sum(when(col("arm") === 1, col("x"))).as("s1"),
        sum(when(col("arm") === 1, sq(col("x")))).as("ss1"))
    def mean(sc: Column, n: Column) = sc.cast("double") / n.cast("double")
    def varp(ss: Column, sc: Column, n: Column) =
      (n.cast("double") * ss.cast("double") -
        sc.cast("double") * sc.cast("double")) /
        (n.cast("double") * n.cast("double"))
    m.select(col("covariate"), col("n0"), col("n1"),
        round((mean(col("s0"), col("n0")) - mean(col("s1"), col("n1"))) /
          sqrt((varp(col("ss0"), col("s0"), col("n0")) +
            varp(col("ss1"), col("s1"), col("n1"))) / lit(2.0)) * 10000.0)
          .cast("long").as("smd_e4"))
      .withColumn("balanced", (abs(col("smd_e4")) < 1000).cast("long"))
      .orderBy("covariate")
  }

  private val q293Sql = {
    val arm = graft.functions.PortableHash.hash60DuckSql(
      "'fold:' || user_id")
    s"""WITH users AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS v_activity,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
       |      AS v_spend_e2,
       |    CAST(count(DISTINCT CAST(date_trunc('second', ts) AS DATE))
       |      AS BIGINT) AS v_days
       |  FROM events GROUP BY 1),
       |armed AS (SELECT *, $arm % 2 AS arm FROM users),
       |melted AS (
       |  SELECT arm, 'activity' AS covariate, v_activity AS x FROM armed
       |  UNION ALL SELECT arm, 'spend_e2', v_spend_e2 FROM armed
       |  UNION ALL SELECT arm, 'days', v_days FROM armed),
       |m AS (
       |  SELECT covariate,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS s0,
       |    sum(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * x END) AS ss0,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS s1,
       |    sum(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * x END) AS ss1
       |  FROM melted GROUP BY 1)
       |SELECT covariate, n0, n1,
       |  CAST(round((CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
       |      - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
       |    / sqrt(((CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
       |        - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
       |        / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE))
       |      + (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
       |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
       |        / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))) / 2.0)
       |    * 10000.0) AS BIGINT) AS smd_e4,
       |  CAST(abs(CAST(round((CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
       |      - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
       |    / sqrt(((CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
       |        - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
       |        / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE))
       |      + (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
       |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
       |        / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))) / 2.0)
       |    * 10000.0) AS BIGINT)) < 1000 AS BIGINT) AS balanced
       |FROM m ORDER BY covariate""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q294 — judge-agreement audit (Cohen's κ): two independent
  // rule-based quality judges label every document (long-enough
  // text; rich-enough vocabulary), and κ = (p_o − p_e)/(1 − p_e)
  // measures agreement beyond chance — the calibration check an
  // LLM-judge ensemble needs before its labels are trusted for
  // filtering. The 2×2 confusion matrix is one aggregate of exact
  // counts over a single documents scan; p_o and p_e are e-rounded
  // single expressions over those counts. Output: the confusion
  // cells, observed/expected agreement, and κ in e6.
  // ---------------------------------------------------------------------
  private def q294(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select((col("n_chars") >= 300).cast("long").as("j1"),
        (size(split(col("text"), " ")) >= 60).cast("long").as("j2"))
    def dd(c: Column) = c.cast("double")
    d.agg(count(lit(1)).as("n"),
        sum(col("j1") * col("j2")).as("n11"),
        sum(col("j1") * (lit(1L) - col("j2"))).as("n10"),
        sum((lit(1L) - col("j1")) * col("j2")).as("n01"),
        sum((lit(1L) - col("j1")) * (lit(1L) - col("j2"))).as("n00"))
      .withColumn("po_e6",
        round(dd(col("n11") + col("n00")) / dd(col("n")) * 1000000.0)
          .cast("long"))
      .withColumn("pe_e6",
        round((dd((col("n11") + col("n10")) * (col("n11") + col("n01"))) +
          dd((col("n00") + col("n01")) * (col("n00") + col("n10")))) /
          (dd(col("n")) * dd(col("n"))) * 1000000.0).cast("long"))
      .withColumn("kappa_e6",
        round((col("po_e6") - col("pe_e6")).cast("double") /
          (lit(1000000.0) - col("pe_e6").cast("double")) * 1000000.0)
          .cast("long"))
  }

  private val q294Sql =
    """WITH j AS (
      |  SELECT CAST(n_chars >= 300 AS BIGINT) AS j1,
      |    CAST(len(string_split(text, ' ')) >= 60 AS BIGINT) AS j2
      |  FROM documents),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(j1 * j2) AS BIGINT) AS n11,
      |    CAST(sum(j1 * (1 - j2)) AS BIGINT) AS n10,
      |    CAST(sum((1 - j1) * j2) AS BIGINT) AS n01,
      |    CAST(sum((1 - j1) * (1 - j2)) AS BIGINT) AS n00
      |  FROM j),
      |po AS (
      |  SELECT *,
      |    CAST(round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
      |      * 1000000.0) AS BIGINT) AS po_e6,
      |    CAST(round((CAST((n11 + n10) * (n11 + n01) AS DOUBLE)
      |      + CAST((n00 + n01) * (n00 + n10) AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1000000.0)
      |      AS BIGINT) AS pe_e6
      |  FROM m)
      |SELECT n, n11, n10, n01, n00, po_e6, pe_e6,
      |  CAST(round(CAST(po_e6 - pe_e6 AS DOUBLE)
      |    / (1000000.0 - CAST(pe_e6 AS DOUBLE)) * 1000000.0) AS BIGINT)
      |    AS kappa_e6
      |FROM po""".stripMargin

  // ---------------------------------------------------------------------
  // q295 — hierarchical forecast reconciliation (coherence): naive
  // next-month forecasts made independently per nation don't sum to
  // the independently-made regional forecasts — the classic
  // incoherence every planning hierarchy hits. Top-down proportional
  // reconciliation scales each nation's forecast by its region's
  // top-level forecast over the bottom-up sum, reported with the
  // pre-reconciliation incoherence in e6. Forecasts are last-month
  // revenue (exact cents); the scale factor is one rounded division
  // per nation; the region grain is ≤25 rows after one fact scan.
  // ---------------------------------------------------------------------
  private def q295(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-07-01"))
      .join(t(s, dir, "customer").select(col("c_custkey"),
        col("c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")),
          expr("n_regionkey = r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .pin() // nation + region forecasts share this slice
    val fNation = base.groupBy(col("r_name"), col("n_name"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("f_e2"))
    // the "independent" regional forecast: same month, but biased the
    // way a separate team's model would be — trimmed of each
    // region's largest single order (so coherence genuinely fails)
    val wR = Window.partitionBy("r_name")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val fRegion = base
      .withColumn("rn", row_number().over(wR))
      .filter(col("rn") > 1)
      .groupBy(col("r_name").as("r_top")) // renamed: all three frames
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .as("f_top_e2"))
    val bu = fNation.groupBy(col("r_name").as("r_bu"))
      .agg(sum("f_e2").as("bu_e2"))
    fNation
      .join(broadcast(bu), col("r_name") === col("r_bu"))
      .join(broadcast(fRegion), col("r_name") === col("r_top"))
      .select(col("r_name"), col("n_name"), col("f_e2"),
        col("bu_e2"), col("f_top_e2"),
        round(col("f_e2").cast("double") * col("f_top_e2").cast("double")
          / col("bu_e2").cast("double")).cast("long").as("f_rec_e2"),
        // a region with exactly one order in the slice has
        // f_top_e2 = 0: Spark silently casts the resulting Infinity
        // to Long.MaxValue while DuckDB errors on the round/cast —
        // surface the degenerate case as NULL on both engines
        when(col("f_top_e2") === 0, lit(null)).otherwise(
          round((col("bu_e2") - col("f_top_e2")).cast("double") /
            col("f_top_e2").cast("double") * 1000000.0).cast("long"))
          .as("incoherence_e6"))
      .orderBy("r_name", "n_name")
  }

  private val q295Sql =
    """WITH base AS (
      |  SELECT o_orderkey, o_totalprice, n_name, r_name
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE o_orderdate >= TIMESTAMP '2001-07-01'),
      |fnation AS (
      |  SELECT r_name, n_name,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS f_e2
      |  FROM base GROUP BY 1, 2),
      |fregion AS (
      |  SELECT r_name,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS f_top_e2
      |  FROM (SELECT *, row_number() OVER (PARTITION BY r_name
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM base)
      |  WHERE rn > 1 GROUP BY 1),
      |bu AS (SELECT r_name, CAST(sum(f_e2) AS BIGINT) AS bu_e2
      |       FROM fnation GROUP BY 1)
      |SELECT bu.r_name, n_name, f_e2, bu_e2, f_top_e2,
      |  CAST(round(CAST(f_e2 AS DOUBLE) * CAST(f_top_e2 AS DOUBLE)
      |    / CAST(bu_e2 AS DOUBLE)) AS BIGINT) AS f_rec_e2,
      |  CASE WHEN f_top_e2 = 0 THEN NULL ELSE
      |    CAST(round(CAST(bu_e2 - f_top_e2 AS DOUBLE)
      |      / CAST(f_top_e2 AS DOUBLE) * 1000000.0) AS BIGINT) END
      |    AS incoherence_e6
      |FROM bu JOIN fregion ON bu.r_name = fregion.r_name
      |JOIN fnation ON bu.r_name = fnation.r_name
      |ORDER BY bu.r_name, n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q296 — multi-window burn-rate SLO alerting (the SRE-workbook
  // policy): with a 99% non-error SLO, page when BOTH the fast (1h)
  // and slow (6h) windows burn error budget faster than threshold —
  // the two-window AND is what suppresses blips while still catching
  // slow leaks. Burn thresholds compare as PURE INTEGERS
  // (burn > 14.4 ⇔ 1000·err > 144·n with a 1% budget), so the page
  // decision has no float in it; the e2 burn rates in the output are
  // display-only single divisions. One events scan → hour grain; the
  // 6h window is a range frame over the ~700-row hourly aggregate.
  // ---------------------------------------------------------------------
  private def q296(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.eventsSec(s, dir)
      .groupBy((Exact.epochS(col("ts_s")).cast("long") / 3600)
        .cast("long").as("h"))
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "error").cast("long")).as("err"))
    val w6 = Window.orderBy("h").rangeBetween(-5, 0)
    hourly
      .withColumn("n6", sum("n").over(w6))
      .withColumn("err6", sum("err").over(w6))
      // 1h burn > 14.4 ⇔ 1000·err > 144·n ; 6h burn > 6 ⇔ 100·err6 > 6·n6
      .withColumn("fast_hot",
        (col("err") * 1000 > col("n") * 144).cast("long"))
      .withColumn("slow_hot",
        (col("err6") * 100 > col("n6") * 6).cast("long"))
      .select(col("h"), col("n"), col("err"), col("n6"), col("err6"),
        round(col("err").cast("double") / col("n").cast("double")
          / 0.01 * 100.0).cast("long").as("burn1_e2"),
        round(col("err6").cast("double") / col("n6").cast("double")
          / 0.01 * 100.0).cast("long").as("burn6_e2"),
        (col("fast_hot") * col("slow_hot")).as("page"))
      .orderBy("h")
  }

  private val q296Sql =
    s"""WITH hourly AS (
       |  SELECT CAST(${Exact.epochSSql("ts")} AS BIGINT) // 3600 AS h,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS err
       |  FROM events GROUP BY 1),
       |win AS (
       |  SELECT *,
       |    CAST(sum(n) OVER (ORDER BY h RANGE BETWEEN 5 PRECEDING
       |      AND CURRENT ROW) AS BIGINT) AS n6,
       |    CAST(sum(err) OVER (ORDER BY h RANGE BETWEEN 5 PRECEDING
       |      AND CURRENT ROW) AS BIGINT) AS err6
       |  FROM hourly)
       |SELECT h, n, err, n6, err6,
       |  CAST(round(CAST(err AS DOUBLE) / CAST(n AS DOUBLE) / 0.01
       |    * 100.0) AS BIGINT) AS burn1_e2,
       |  CAST(round(CAST(err6 AS DOUBLE) / CAST(n6 AS DOUBLE) / 0.01
       |    * 100.0) AS BIGINT) AS burn6_e2,
       |  CAST((CASE WHEN err * 1000 > n * 144 THEN 1 ELSE 0 END)
       |    * (CASE WHEN err6 * 100 > n6 * 6 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS page
       |FROM win ORDER BY h""".stripMargin

  // ---------------------------------------------------------------------
  // q297 — delta-encoding advisor (lakehouse layout telemetry): if
  // the events table were stored sorted by (user, time), how many
  // bits would each timestamp delta need? The gap histogram at
  // bit-length grain — bits = length(bin(gap)), an exact integer via
  // the binary-string length both engines compute identically — plus
  // the projected bytes under a byte-aligned delta encoding vs raw
  // int64, is exactly what a format/layout advisor reports before
  // choosing encodings. One scan, one user-partitioned lag window,
  // ≤ ~40 output rows.
  // ---------------------------------------------------------------------
  private def q297(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_s"), col("event_id"))
    val gaps = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("event_id"),
        Exact.epochS(col("ts_s")).as("ts_l"), col("ts_s"))
      .withColumn("gap", col("ts_l") - lag("ts_l", 1).over(w))
      .filter(col("gap").isNotNull)
      .select(length(bin(col("gap"))).cast("long").as("bits"))
    val hist = gaps.groupBy("bits").agg(count(lit(1)).as("n"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    hist // total from the ≤40-row histogram, not a second fact scan
      .withColumn("n_gaps", sum("n").over(wAll))
      .select(col("bits"), col("n"),
        round(col("n").cast("double") / col("n_gaps").cast("double")
          * 1000000.0).cast("long").as("share_e6"),
        // byte-aligned delta storage for this bucket vs 8-byte raw
        (col("n") * expr("(bits + 7) div 8")).as("delta_bytes"),
        (col("n") * 8).as("raw_bytes"))
      .orderBy("bits")
  }

  private val q297Sql =
    s"""WITH base AS (
       |  SELECT user_id, event_id,
       |    CAST(${Exact.epochSSql("ts")} AS BIGINT) AS ts_l
       |  FROM events),
       |gaps AS (
       |  SELECT CAST(length(bin(ts_l - lag(ts_l, 1) OVER (
       |      PARTITION BY user_id ORDER BY ts_l, event_id)))
       |    AS BIGINT) AS bits
       |  FROM base
       |  QUALIFY lag(ts_l, 1) OVER (PARTITION BY user_id
       |    ORDER BY ts_l, event_id) IS NOT NULL),
       |hist AS (
       |  SELECT bits, CAST(count(*) AS BIGINT) AS n
       |  FROM gaps GROUP BY 1)
       |SELECT bits, n,
       |  CAST(round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE)
       |    * 1000000.0) AS BIGINT) AS share_e6,
       |  CAST(n * ((bits + 7) // 8) AS BIGINT) AS delta_bytes,
       |  CAST(n * 8 AS BIGINT) AS raw_bytes
       |FROM hist ORDER BY bits""".stripMargin

  // ---------------------------------------------------------------------
  // q353 — CUPED variance reduction (controlled-experiment using
  // pre-period data, Deng et al. 2013): Ŷ_i = Y_i − θ(X_i − X̄) with
  // θ = cov(X,Y)/var(X), where X is each user's PRE-period purchase
  // spend and Y the experiment-period spend — the covariate soaks up
  // between-user variance so the same experiment reads with tighter
  // error bars. All moments are exact integer sums (cross-products in
  // decimal(38,0) — x·y ≈ 1e18 at sf1 already brushes INT64); θ is
  // ONE e6-rounded division, each user's adjustment ONE e-rounded
  // multiply (θ_e6·dev ≈ 5e12, inside double-exact range), and the
  // per-arm variance ratio divides once at the end. Zero-variance X
  // degenerates to θ = 0 (no adjustment) on both engines.
  // ---------------------------------------------------------------------
  private def q353(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    def sq(c: Column): Column = c.cast("decimal(38,0)") * c
    val users = Tables.eventsSec(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_s"),
        round(col("value") * 10000).cast("long").as("v_e4"))
      .groupBy("user_id")
      .agg(coalesce(sum(when(col("ts_s") < lit("2024-01-16"),
        col("v_e4"))), lit(0L)).as("x"),
        coalesce(sum(when(col("ts_s") >= lit("2024-01-16"),
          col("v_e4"))), lit(0L)).as("y"))
      .withColumn("arm",
        pmod(h.hash60(concat(lit("cuped:"), col("user_id"))), lit(2L)))
      .pin() // pooled θ + per-arm rollup share the user grain
    val pooled = users.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y").as("sy"), sum(sq(col("x"))).as("sxx"),
      sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
    val theta = pooled.select(col("n"), col("sx"),
      when(col("n").cast("decimal(38,0)") * col("sxx") -
        sq(col("sx")) === 0, lit(0L))
        .otherwise(round(
          (col("n").cast("decimal(38,0)") * col("sxy") -
            col("sx").cast("decimal(38,0)") * col("sy")).cast("double") /
          (col("n").cast("decimal(38,0)") * col("sxx") -
            sq(col("sx"))).cast("double") * 1000000.0).cast("long"))
        .as("theta_e6"),
      round(col("sx").cast("double") / col("n").cast("double"))
        .cast("long").as("xbar_e4"))
    val adj = users.crossJoin(broadcast(theta))
      .withColumn("yadj", col("y") -
        round(col("theta_e6").cast("double") *
          (col("x") - col("xbar_e4")).cast("double") / 1000000.0)
          .cast("long"))
    def varp(ss: Column, sc: Column, n: Column) =
      (n.cast("decimal(38,0)").cast("double") * ss.cast("double") -
        sc.cast("double") * sc.cast("double")) /
        (n.cast("double") * n.cast("double"))
    adj.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum("y").as("sy"),
        sum(sq(col("y"))).as("syy"), sum("yadj").as("sa"),
        sum(sq(col("yadj"))).as("saa"))
      .select(col("arm"), col("n_users"),
        round(col("sy").cast("double") / col("n_users").cast("double"))
          .cast("long").as("mean_y_e4"),
        round(col("sa").cast("double") / col("n_users").cast("double"))
          .cast("long").as("mean_yadj_e4"),
        when(col("n_users").cast("decimal(38,0)") * col("syy") -
          sq(col("sy")) === 0, lit(null).cast("long"))
          .otherwise(round((lit(1.0) -
            varp(col("saa"), col("sa"), col("n_users")) /
            varp(col("syy"), col("sy"), col("n_users"))) * 1000000.0)
            .cast("long")).as("varred_e6"))
      .orderBy(col("arm"))
  }

  private val q353Sql = {
    val arm = graft.functions.PortableHash.hash60DuckSql(
      "'cuped:' || CAST(user_id AS VARCHAR)")
    s"""WITH users AS (
       |  SELECT user_id,
       |    CAST(coalesce(sum(CASE WHEN date_trunc('second', ts)
       |      < TIMESTAMP '2024-01-16' THEN
       |      CAST(round(value * 10000) AS BIGINT) END), 0) AS BIGINT)
       |      AS x,
       |    CAST(coalesce(sum(CASE WHEN date_trunc('second', ts)
       |      >= TIMESTAMP '2024-01-16' THEN
       |      CAST(round(value * 10000) AS BIGINT) END), 0) AS BIGINT)
       |      AS y,
       |    $arm % 2 AS arm
       |  FROM events WHERE event_type = 'purchase'
       |  GROUP BY user_id),
       |pooled AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM users),
       |theta AS (
       |  SELECT
       |    CASE WHEN CAST(n AS HUGEINT) * sxx
       |        - CAST(sx AS HUGEINT) * sx = 0 THEN 0
       |      ELSE CAST(round(
       |        CAST(CAST(n AS HUGEINT) * sxy
       |          - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
       |        CAST(CAST(n AS HUGEINT) * sxx
       |          - CAST(sx AS HUGEINT) * sx AS DOUBLE)
       |        * 1000000.0) AS BIGINT) END AS theta_e6,
       |    CAST(round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
       |      AS xbar_e4
       |  FROM pooled),
       |adj AS (
       |  SELECT arm, y,
       |    y - CAST(round(CAST(theta_e6 AS DOUBLE)
       |      * CAST(x - xbar_e4 AS DOUBLE) / 1000000.0) AS BIGINT)
       |      AS yadj
       |  FROM users, theta)
       |SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE))
       |    AS BIGINT) AS mean_y_e4,
       |  CAST(round(CAST(sum(yadj) AS DOUBLE) / CAST(count(*) AS DOUBLE))
       |    AS BIGINT) AS mean_yadj_e4,
       |  CASE WHEN CAST(count(*) AS HUGEINT)
       |      * sum(CAST(y AS HUGEINT) * y)
       |      - CAST(sum(y) AS HUGEINT) * CAST(sum(y) AS HUGEINT) = 0
       |    THEN NULL
       |    ELSE CAST(round((1.0 -
       |      ((CAST(CAST(count(*) AS HUGEINT) AS DOUBLE)
       |        * CAST(sum(CAST(yadj AS HUGEINT) * yadj) AS DOUBLE)
       |        - CAST(sum(yadj) AS DOUBLE) * CAST(sum(yadj) AS DOUBLE))
       |       / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE)))
       |      / ((CAST(CAST(count(*) AS HUGEINT) AS DOUBLE)
       |        * CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE)
       |        - CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
       |       / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE))))
       |      * 1000000.0) AS BIGINT) END AS varred_e6
       |FROM adj GROUP BY arm ORDER BY arm""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q354 — SPRT sequential-test replay (Wald): each event type is an
  // "experiment" whose trials arrive in time order; conversion
  // (value > 50) adds ln(p1/p0), non-conversion adds
  // ln((1−p1)/(1−p0)) (p0=0.3, p1=0.4 — the increments are OFFLINE
  // e9 literal constants in both engines, no runtime libm), and the
  // test stops at the first crossing of ±ln(19) (α=β=0.05). The
  // running LLR is [[Curate.keyedCumSum]] — the per-key cumulative
  // sum whose rows range-partition on (key, time) so ONE experiment's
  // history never funnels through one task (the q291 lesson,
  // keyed) — and the decision row is a min-rank join-back, not a
  // sequential scan.
  // ---------------------------------------------------------------------
  private def q354(s: SparkSession, dir: String): DataFrame = {
    val lnPosE9 = 287682072L   // round(ln(0.4/0.3)·1e9)
    val lnNegE9 = -154150680L  // round(ln(0.6/0.7)·1e9)
    val boundE9 = 2944438979L  // round(ln(19)·1e9) = ln((1−β)/α)
    val trials = Tables.eventsSec(s, dir)
      .select(col("event_type").as("exp"), col("ts_s"), col("event_id"),
        when(round(col("value") * 10000).cast("long") > 500000L,
          lit(lnPosE9)).otherwise(lit(lnNegE9)).as("llr_e9"))
    val cum = Curate.keyedCumSum(trials, Seq("exp"),
      Seq(col("ts_s"), col("event_id")), col("llr_e9"), "cum_e9", "n")
      .select(col("exp"), col("n"), col("cum_e9"))
    val firstCross = cum.filter(abs(col("cum_e9")) >= boundE9)
      .groupBy(col("exp")).agg(min("n").as("n_cross"))
    val lastN = cum.groupBy(col("exp")).agg(max("n").as("n_max"))
    val target = lastN.join(firstCross, Seq("exp"), "left")
      .select(col("exp"), col("n_cross"),
        coalesce(col("n_cross"), col("n_max")).as("n_dec"))
    target.join(cum.withColumnRenamed("exp", "e2"),
        col("exp") === col("e2") && col("n_dec") === col("n"))
      .select(col("exp"),
        when(col("n_cross").isNull, lit("continue"))
          .when(col("cum_e9") > 0, lit("accept_h1"))
          .otherwise(lit("accept_h0")).as("decision"),
        col("n_dec"), col("cum_e9").as("llr_e9"))
      .orderBy(col("exp"))
  }

  private val q354Sql =
    """WITH trials AS (
      |  SELECT event_type AS exp, date_trunc('second', ts) AS ts_s,
      |    event_id,
      |    CASE WHEN CAST(round(value * 10000) AS BIGINT) > 500000
      |      THEN 287682072 ELSE -154150680 END AS llr_e9
      |  FROM events),
      |cum AS (
      |  SELECT exp,
      |    CAST(row_number() OVER w AS BIGINT) AS n,
      |    CAST(sum(llr_e9) OVER w AS BIGINT) AS cum_e9
      |  FROM trials
      |  WINDOW w AS (PARTITION BY exp ORDER BY ts_s, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |firstcross AS (
      |  SELECT exp, CAST(min(n) AS BIGINT) AS n_cross
      |  FROM cum WHERE abs(cum_e9) >= 2944438979 GROUP BY exp),
      |lastn AS (SELECT exp, CAST(max(n) AS BIGINT) AS n_max
      |          FROM cum GROUP BY exp),
      |target AS (
      |  SELECT l.exp, f.n_cross,
      |    coalesce(f.n_cross, l.n_max) AS n_dec
      |  FROM lastn l LEFT JOIN firstcross f ON l.exp = f.exp)
      |SELECT t.exp,
      |  CASE WHEN t.n_cross IS NULL THEN 'continue'
      |    WHEN c.cum_e9 > 0 THEN 'accept_h1'
      |    ELSE 'accept_h0' END AS decision,
      |  t.n_dec, c.cum_e9 AS llr_e9
      |FROM target t JOIN cum c ON t.exp = c.exp AND t.n_dec = c.n
      |ORDER BY t.exp""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q353_cuped" -> (q353 _),
    "q354_sprt_replay" -> (q354 _),
    "q275_ndcg" -> (q275 _),
    "q276_cohort_ltv" -> (q276 _),
    "q277_hhi" -> (q277 _),
    "q278_pinball" -> (q278 _),
    "q279_kmv_sketch" -> (q279 _),
    "q280_ewma" -> (q280 _),
    "q281_negative_sampling" -> (q281 _),
    "q282_fold_balance" -> (q282 _),
    "q283_mmr_rerank" -> (q283 _),
    "q284_markov_attribution" -> (q284 _),
    "q285_woe_iv" -> (q285 _),
    "q286_bloom_fpr" -> (q286 _),
    "q287_theta_setops" -> (q287 _),
    "q288_abc_xyz" -> (q288 _),
    "q289_permutation_test" -> (q289 _),
    "q290_seq_patterns" -> (q290 _),
    "q291_uplift_deciles" -> (q291 _),
    "q292_random_walks" -> (q292 _),
    "q293_covariate_balance" -> (q293 _),
    "q294_judge_kappa" -> (q294 _),
    "q295_forecast_reconcile" -> (q295 _),
    "q296_slo_burn" -> (q296 _),
    "q297_encoding_advisor" -> (q297 _))

  val oracle: Map[String, String] = Map(
    "q353_cuped" -> q353Sql,
    "q354_sprt_replay" -> q354Sql,
    "q275_ndcg" -> q275Sql,
    "q276_cohort_ltv" -> q276Sql,
    "q277_hhi" -> q277Sql,
    "q278_pinball" -> q278Sql,
    "q279_kmv_sketch" -> q279Sql,
    "q280_ewma" -> q280Sql,
    "q281_negative_sampling" -> q281Sql,
    "q282_fold_balance" -> q282Sql,
    "q283_mmr_rerank" -> q283Sql,
    "q284_markov_attribution" -> q284Sql,
    "q285_woe_iv" -> q285Sql,
    "q286_bloom_fpr" -> q286Sql,
    "q287_theta_setops" -> q287Sql,
    "q288_abc_xyz" -> q288Sql,
    "q289_permutation_test" -> q289Sql,
    "q290_seq_patterns" -> q290Sql,
    "q291_uplift_deciles" -> q291Sql,
    "q292_random_walks" -> q292Sql,
    "q293_covariate_balance" -> q293Sql,
    "q294_judge_kappa" -> q294Sql,
    "q295_forecast_reconcile" -> q295Sql,
    "q296_slo_burn" -> q296Sql,
    "q297_encoding_advisor" -> q297Sql)
}
