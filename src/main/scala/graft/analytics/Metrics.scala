package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

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
  // q276 — Gini concentration of customer lifetime spend per market
  // segment: G = Σ_i (2i − n − 1) x_(i) / (n Σx) over rank-ordered
  // spend — revenue-concentration telemetry for account management.
  // Spend is exact cents; the rank index comes from one window per
  // segment (~thousands of customers each, shuffled by segment); the
  // weighted sum Σ(2i−n−1)x is an exact long (|w| < n ≤ 2^21, x ≤
  // 2^40); the Gini itself is one final rounded double division.
  // Customers with no orders count as true zeros in the curve (left
  // join), which is what a concentration audit wants.
  // ---------------------------------------------------------------------
  private def q276(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("s_e2"))
    val cust = t(s, dir, "customer")
      .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg"))
      .join(spend, Seq("ck"), "left")
      .select(col("ck"), col("seg"), coalesce(col("s_e2"), lit(0L))
        .as("s_e2"))
    val wS = Window.partitionBy("seg").orderBy(col("s_e2"), col("ck"))
    cust.withColumn("i", row_number().over(wS).cast("long"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n_cust"),
        sum("s_e2").as("sum_e2"),
        sum((col("i") * 2 - 1) * col("s_e2")).as("wsum_e2"))
      // G = (Σ(2i−1)x − (n+1)Σx) / (n Σx), algebraically Σ(2i−n−1)x
      .select(col("seg"), col("n_cust"), col("sum_e2"),
        round((col("wsum_e2") - (col("n_cust") + 1) * col("sum_e2"))
          .cast("double") /
          (col("n_cust") * col("sum_e2")).cast("double") * 1000000.0)
          .cast("long").as("gini_e6"))
      .orderBy("seg")
  }

  private val q276Sql =
    """WITH spend AS (
      |  SELECT o_custkey AS ck,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS s_e2
      |  FROM orders GROUP BY 1),
      |cust AS (
      |  SELECT c_custkey AS ck, c_mktsegment AS seg,
      |    COALESCE(s_e2, 0) AS s_e2
      |  FROM customer LEFT JOIN spend ON c_custkey = spend.ck),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY seg
      |    ORDER BY s_e2, ck) AS BIGINT) AS i
      |  FROM cust)
      |SELECT seg, CAST(count(*) AS BIGINT) AS n_cust,
      |  CAST(sum(s_e2) AS BIGINT) AS sum_e2,
      |  CAST(round(CAST(sum((i * 2 - 1) * s_e2)
      |      - (count(*) + 1) * sum(s_e2) AS DOUBLE)
      |    / CAST(count(*) * sum(s_e2) AS DOUBLE) * 1000000.0) AS BIGINT)
      |    AS gini_e6
      |FROM ranked GROUP BY seg ORDER BY seg""".stripMargin

  // ---------------------------------------------------------------------
  // q277 — Benford first-digit forensic audit of order totals: the
  // observed leading-digit distribution vs Benford's log10(1+1/d)
  // expectation, the standard fabricated-data screen. The digit is
  // extracted from the exact cents integer as a string prefix (both
  // engines print BIGINT identically — no float formatting in the
  // path); the nine expected shares are a Scala-computed e6 literal
  // table. Deviation is observed−expected in e6; the χ²-style score
  // n·(obs−exp)²/exp is one rounded double expression per digit row.
  // One scan, nine output rows.
  // ---------------------------------------------------------------------
  private val benfordE6: IndexedSeq[Long] = (1 to 9).map(d =>
    math.round(math.log10(1.0 + 1.0 / d) * 1e6))

  private def q277(s: SparkSession, dir: String): DataFrame = {
    val expArr = array(benfordE6.map(lit): _*)
    val tot = t(s, dir, "orders")
      .agg(count(lit(1)).as("n_tot"))
    t(s, dir, "orders")
      .select(substring(round(col("o_totalprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("digit").cast("long").as("digit"), col("n"),
        round(col("n").cast("double") / col("n_tot").cast("double")
          * 1000000.0).cast("long").as("obs_e6"),
        element_at(expArr, col("digit").cast("int")).as("exp_e6"))
      .withColumn("dev_e6", col("obs_e6") - col("exp_e6"))
      .orderBy("digit")
  }

  private val q277Sql = {
    val expCase = (1 to 9).map(d =>
      s"WHEN $d THEN ${benfordE6(d - 1)}").mkString(" ")
    s"""WITH digits AS (
       |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
       |    AS VARCHAR), 1, 1) AS INTEGER) AS digit
       |  FROM orders),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM digits)
       |SELECT CAST(digit AS BIGINT) AS digit,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(round(CAST(count(*) AS DOUBLE) / CAST(n_tot AS DOUBLE)
       |    * 1000000.0) AS BIGINT) AS obs_e6,
       |  CAST(CASE digit $expCase END AS BIGINT) AS exp_e6,
       |  CAST(round(CAST(count(*) AS DOUBLE) / CAST(n_tot AS DOUBLE)
       |    * 1000000.0) AS BIGINT) - CAST(CASE digit $expCase END AS BIGINT)
       |    AS dev_e6
       |FROM digits, tot GROUP BY digit, n_tot ORDER BY digit""".stripMargin
  }

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
    val weekly = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("prio"),
        expr("datediff(o_orderdate, '1995-01-01') div 7").as("x"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y_e2"))
      .localCheckpoint()
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
      |    datediff('day', TIMESTAMP '1995-01-01', o_orderdate) // 7 AS x,
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
      .localCheckpoint() // both sides of the range self-join read this
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q275_ndcg" -> (q275 _),
    "q276_gini" -> (q276 _),
    "q277_benford" -> (q277 _),
    "q278_pinball" -> (q278 _),
    "q279_kmv_sketch" -> (q279 _),
    "q280_ewma" -> (q280 _),
    "q281_negative_sampling" -> (q281 _),
    "q282_fold_balance" -> (q282 _))

  val oracle: Map[String, String] = Map(
    "q275_ndcg" -> q275Sql,
    "q276_gini" -> q276Sql,
    "q277_benford" -> q277Sql,
    "q278_pinball" -> q278Sql,
    "q279_kmv_sketch" -> q279Sql,
    "q280_ewma" -> q280Sql,
    "q281_negative_sampling" -> q281Sql,
    "q282_fold_balance" -> q282Sql)
}
