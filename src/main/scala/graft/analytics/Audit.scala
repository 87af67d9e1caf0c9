package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.JaroWinklerE6

import graft.core.PlanStats.Pinned
import graft.core.Tables
import graft.functions.{PortableHash, Text}
import graft.operators.Curate

/** Model-quality / distribution-audit tier (session 8): the
  * evaluation and drift operators an ML data platform runs over its
  * warehouse — exact ROC AUC, calibration bins, Gini concentration,
  * two-sample Kolmogorov–Smirnov drift, inter-rater agreement
  * (Cohen's κ), CUSUM changepoint, Benford first-digit audit, BPE
  * merge-candidate counting, split-conformal coverage, sorted-
  * neighborhood linkage (the linear-pairs alternative to blocked
  * linkage), and type–token lexical stats. No reference analogue
  * (the reference delegates all analytics to SQL); cross-engine
  * discipline as everywhere in the gate: integer/e2-long grains,
  * cross-products in decimal(38,0), ONE e6-rounded IEEE division at
  * the point of readout, transcendental constants as offline e9
  * literals, unique-tiebreak ORDER BY. Every rank/cumsum runs
  * through [[graft.operators.Curate]]'s range-partitioned machinery
  * — no unpartitioned windows, no driver-side loops.
  */
object Audit {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val dec = "decimal(38,0)"

  import org.apache.spark.sql.Column

  /** Exact ROC AUC via the rank-sum identity, on the SCORE-GROUP
    * grain (see q360). `scoreCol` must be integral (collapse floats
    * to a scaled-long grain first), `labelCol` 0/1. Returns one row
    * (n_pos, n_neg, auc_e6). */
  def rocAuc(scored: DataFrame, scoreCol: Column,
             labelCol: Column): DataFrame = {
    val g = scored.select(scoreCol.as("v"), labelCol.cast("long").as("y"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
    Curate.globalCumSum(g, Seq(col("v")), col("n"), "hi", "__r")
      .agg(
        sum(col("np")).cast(dec).as("pos"),
        sum(col("n") - col("np")).cast(dec).as("neg"),
        // cast BOTH operands to decimal(38,0) BEFORE multiplying —
        // np·(2·hi−n+1) in LongType silently wraps past ~9.2e18
        // (hi is a global cumulative count), and the tier's contract
        // is cross-products in decimal. DuckDB side is HUGEINT.
        sum(col("np").cast(dec) *
          (lit(2L) * col("hi") - col("n") + lit(1L)).cast(dec))
          .as("s2"))
      .select(col("pos").cast("long").as("n_pos"),
        col("neg").cast("long").as("n_neg"),
        round((col("s2") - col("pos") * (col("pos") + lit(1)))
            .cast("double") /
          (col("pos") * col("neg") * lit(2)).cast("double")
          * 1000000.0).cast("long").as("auc_e6"))
  }

  /** Exact two-sample KS statistic over an integral value grain (see
    * q363): `aCol`/`bCol` are 0/1 membership indicators. Returns one
    * row (n_a, n_b, d_num, v_at, ks_e6) where d_num = max |n_b·C_a −
    * n_a·C_b| and v_at is the smallest value attaining it. */
  def ksStatistic(df: DataFrame, valueCol: Column, aCol: Column,
                  bCol: Column): DataFrame = {
    val g = df.select(valueCol.as("v"), aCol.cast("long").as("a"),
        bCol.cast("long").as("b"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
    val cum = Curate.globalCumSum(
      Curate.globalCumSum(g, Seq(col("v")), col("ca"), "cuma", "__r1"),
      Seq(col("v")), col("cb"), "cumb", "__r2")
    val tot = g.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        abs(col("nb").cast(dec) * col("cuma").cast(dec) -
          col("na").cast(dec) * col("cumb").cast(dec)).as("dn"),
        col("v"))
      .groupBy(col("na"), col("nb"))
      .agg(max(struct(col("dn"), (-col("v")).as("nv"))).as("best"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        col("best.dn").cast("long").as("d_num"),
        (-col("best.nv")).as("v_at"),
        round(col("best.dn").cast("double") /
          (col("na").cast("double") * col("nb").cast("double"))
          * 1000000.0).cast("long").as("ks_e6"))
  }

  /** Exact Gini coefficient of an integral value column (see q362):
    * ranks by (value, tiebreak) through Curate.globalRank. Returns
    * one row (n_rows, total, gini_e6). */
  def gini(df: DataFrame, valueCol: Column, tieCol: Column): DataFrame =
    Curate.globalRank(df.select(valueCol.as("x"), tieCol.as("tb")),
        Seq(col("x"), col("tb")), "i")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).cast(dec).as("sx"),
        // i·x with operands cast to decimal first: the global rank i
        // reaches n, so the long product wraps past ~9.2e18 rows·value.
        sum(col("i").cast(dec) * col("x").cast(dec)).as("six"))
      .select(col("n").cast("long").as("n_rows"),
        col("sx").cast("long").as("total"),
        round((lit(2) * col("six") - (col("n") + lit(1)) * col("sx"))
            .cast("double") /
          (col("n") * col("sx")).cast("double") * 1000000.0)
          .cast("long").as("gini_e6"))

  /** Sorted-neighborhood candidate pairs (Hernández–Stolfo merge/
    * purge; see q369): rows rank globally by `keyCol` (id tiebreak)
    * and each pairs with its `w` successors via a rank equi-join —
    * n·w pairs BY CONSTRUCTION at any data size, the linear-pairs
    * alternative to key blocking. Returns (j, id_a, id_b, key_a,
    * key_b) with j = rank offset 1..w. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: Column,
                              keyCol: Column, w: Int): DataFrame = {
    val ranked = Curate.globalRank(
      df.select(idCol.as("__id"), keyCol.as("__key")),
      Seq(col("__key"), col("__id")), "__r")
    val a = ranked.select(col("__id").as("id_a"), col("__key").as("key_a"),
        col("__r"), explode(sequence(lit(1L), lit(w.toLong))).as("j"))
      .withColumn("__rb", col("__r") + col("j"))
    val b = ranked.select(col("__r").as("__rb"), col("__id").as("id_b"),
      col("__key").as("key_b"))
    a.join(b, "__rb").select(col("j"), col("id_a"), col("id_b"),
      col("key_a"), col("key_b"))
  }

  // ---------------------------------------------------------------------
  // q360 — EXACT ROC AUC via the rank-sum (Mann–Whitney) identity,
  // computed on the SCORE-GROUP grain: scores collapse to e2 longs
  // (≤10⁵ distinct regardless of row count — the grain a 100 TB run
  // can afford), tied ranks use the ×2-scaled lo+hi trick so
  // everything stays integral (avg tied rank = (lo+hi)/2 — doubling
  // defers the halving into the final division), and the one global
  // cumsum runs through Curate.globalCumSum's range-partitioned
  // two-pass (never a single-task window). AUC = (S2 − P(P+1)) /
  // (2PN) with S2 = Σ_pos (lo+hi): one e6-rounded division at the
  // end; sums accumulate in decimal(38,0).
  // ---------------------------------------------------------------------
  private def q360(s: SparkSession, dir: String): DataFrame =
    rocAuc(Tables.eventsSec(s, dir)
        .select(round(col("value") * 100).cast("long").as("v"),
          when(col("event_type").isin("purchase", "signup"), 1L)
            .otherwise(0L).as("y")),
        col("v"), col("y"))
      .orderBy(col("n_pos"))

  private val q360Sql =
    """WITH e AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
      |    CASE WHEN event_type IN ('purchase','signup')
      |         THEN 1 ELSE 0 END AS y
      |  FROM events),
      |g AS (SELECT v, count(*) AS n, sum(y) AS np FROM e GROUP BY v),
      |c AS (SELECT v, n, np, sum(n) OVER (ORDER BY v) AS hi FROM g),
      |s AS (SELECT sum(np) AS pos, sum(n - np) AS neg,
      |             sum(np * (2*hi - n + 1)) AS s2 FROM c)
      |SELECT CAST(pos AS BIGINT) AS n_pos, CAST(neg AS BIGINT) AS n_neg,
      |  CAST(round(CAST(s2 - pos*(pos+1) AS DOUBLE)
      |    / CAST(pos*neg*2 AS DOUBLE) * 1000000.0) AS BIGINT) AS auc_e6
      |FROM s
      |ORDER BY n_pos""".stripMargin

  // ---------------------------------------------------------------------
  // q361 — calibration bins (the ECE ingredients, kept EXACT): a
  // deterministic e6 "predicted probability" per event (portable
  // hash — both engines regenerate it bit-identically), outcome =
  // purchase, 10 equal-width bins. Per bin the calibration gap
  // numerator |Σp_e6 − 10⁶·Σy| is a pure integer — no division at
  // all, so the audit is bit-stable at any scale and the consumer
  // can weight bins however it wants. One hash + one groupBy on a
  // 10-row grain: the cheapest possible full-corpus audit.
  // ---------------------------------------------------------------------
  private def q361(s: SparkSession, dir: String): DataFrame =
    Tables.eventsSec(s, dir)
      .select(
        pmod(PortableHash.hash60(
          concat(lit("cal:"), col("event_id").cast("string"))),
          lit(1000000L)).as("p_e6"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .select(expr("p_e6 div 100000").as("bin"), col("p_e6"), col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("p_e6")).as("sum_p_e6"),
        sum(col("y")).as("n_pos"))
      .withColumn("gap_e6",
        abs(col("sum_p_e6") - lit(1000000L) * col("n_pos")))
      .orderBy(col("bin"))

  private val q361Sql = {
    val h = PortableHash.hash60DuckSql("'cal:' || CAST(event_id AS VARCHAR)")
    s"""WITH e AS (
       |  SELECT $h % 1000000 AS p_e6,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
       |  FROM events)
       |SELECT p_e6 // 100000 AS bin, count(*) AS n,
       |  CAST(sum(p_e6) AS BIGINT) AS sum_p_e6,
       |  CAST(sum(y) AS BIGINT) AS n_pos,
       |  CAST(abs(sum(p_e6) - 1000000 * sum(y)) AS BIGINT) AS gap_e6
       |FROM e
       |GROUP BY bin
       |ORDER BY bin""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q362 — Gini concentration of customer spend (the inequality /
  // revenue-concentration audit): G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) /
  // (n·Σx) over ascending spend with the customer key as tiebreak.
  // The global rank runs through Curate.globalRank (range-
  // repartitioned two-pass — the only scale-safe global sort);
  // rank·spend cross-products accumulate in decimal(38,0); one
  // e6-rounded division. Grain = customers with orders, so the sort
  // is dimension-sized, not fact-sized.
  // ---------------------------------------------------------------------
  private def q362(s: SparkSession, dir: String): DataFrame =
    gini(t(s, dir, "orders")
        .groupBy(col("o_custkey").as("k"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x")),
        col("x"), col("k"))
      .select(col("n_rows").as("n_cust"), col("total").as("total_e2"),
        col("gini_e6"))
      .orderBy(col("n_cust"))

  private val q362Sql =
    """WITH spend AS (
      |  SELECT o_custkey AS k,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS x
      |  FROM orders GROUP BY o_custkey),
      |r AS (SELECT x, row_number() OVER (ORDER BY x, k) AS i FROM spend),
      |s AS (SELECT count(*) AS n, sum(x) AS sx, sum(i * x) AS six FROM r)
      |SELECT CAST(n AS BIGINT) AS n_cust, CAST(sx AS BIGINT) AS total_e2,
      |  CAST(round(CAST(2*six - (n+1)*sx AS DOUBLE)
      |    / CAST(n*sx AS DOUBLE) * 1000000.0) AS BIGINT) AS gini_e6
      |FROM s
      |ORDER BY n_cust""".stripMargin

  // ---------------------------------------------------------------------
  // q363 — two-sample Kolmogorov–Smirnov drift statistic between the
  // click and purchase value distributions, EXACT: D = max_t |F₁(t)
  // − F₂(t)| cross-multiplies to max |n₂·C₁(t) − n₁·C₂(t)| over the
  // merged e2-value support — pure integers until one e6 division.
  // Both cumulative counts ride ONE value-grain relation through two
  // Curate.globalCumSum passes (the grain is ≤10⁵ rows whatever the
  // corpus size, so the two range shuffles are audit-priced); the
  // argmax takes the smallest value on ties via the negated struct
  // field — deterministic on any engine or partitioning.
  // ---------------------------------------------------------------------
  private def q363(s: SparkSession, dir: String): DataFrame =
    ksStatistic(Tables.eventsSec(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(round(col("value") * 100).cast("long").as("v"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("a"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("b")),
        col("v"), col("a"), col("b"))
      .orderBy(col("n_a"))

  private val q363Sql =
    """WITH e AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
      |  FROM events WHERE event_type IN ('click','purchase')),
      |g AS (SELECT v, sum(a) AS ca, sum(b) AS cb FROM e GROUP BY v),
      |c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cuma,
      |             sum(cb) OVER (ORDER BY v) AS cumb FROM g),
      |tt AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM g),
      |d AS (SELECT v, abs(tt.nb * c.cuma - tt.na * c.cumb) AS dn
      |      FROM c, tt),
      |best AS (SELECT dn, v FROM d ORDER BY dn DESC, v ASC LIMIT 1)
      |SELECT CAST(tt.na AS BIGINT) AS n_a, CAST(tt.nb AS BIGINT) AS n_b,
      |  CAST(best.dn AS BIGINT) AS d_num, best.v AS v_at,
      |  CAST(round(CAST(best.dn AS DOUBLE)
      |    / (CAST(tt.na AS DOUBLE) * CAST(tt.nb AS DOUBLE))
      |    * 1000000.0) AS BIGINT) AS ks_e6
      |FROM best, tt
      |ORDER BY n_a""".stripMargin

  // ---------------------------------------------------------------------
  // q364 — Cohen's κ inter-rater agreement between two deterministic
  // document "raters" (a chars-based and a tokens-based quality
  // bucketer, 6 classes each — the label-noise audit shape: how much
  // do two independent labeling heuristics agree beyond chance?).
  // κ = (n·Σdiag − Σₖ rowₖ·colₖ) / (n² − Σₖ rowₖ·colₖ): the
  // marginal-product chance term is a join of two 6-row aggregates,
  // n·n and row·col in decimal(38,0), one e6 division. The corpus is
  // scanned once for the confusion diagonal and once per marginal —
  // all map-side-combinable counts.
  // ---------------------------------------------------------------------
  private def q364(s: SparkSession, dir: String): DataFrame = {
    val rated = t(s, dir, "documents")
      .select(
        least(expr("n_chars div 150"), lit(5L)).as("ra"),
        least((size(Text.words(col("text"))) / 30).cast("long"), lit(5L))
          .as("rb"))
    val base = rated.agg(count(lit(1)).as("n"),
      sum(when(col("ra") === col("rb"), 1L).otherwise(0L)).as("diag"))
    val rows = rated.groupBy(col("ra").as("cat"))
      .agg(count(lit(1)).as("nr"))
    val cols = rated.groupBy(col("rb").as("cat"))
      .agg(count(lit(1)).as("nc"))
    val chance = rows.join(cols, "cat")
      .agg(coalesce(sum(col("nr").cast(dec) * col("nc").cast(dec)),
        lit(0L).cast(dec)).as("sch"))
    base.crossJoin(broadcast(chance))
      .select(col("n").as("n_docs"), col("diag").as("n_agree"),
        col("sch").cast("long").as("s_chance"),
        round((col("n").cast(dec) * col("diag").cast(dec) - col("sch"))
            .cast("double") /
          (col("n").cast(dec) * col("n").cast(dec) - col("sch"))
            .cast("double") * 1000000.0).cast("long").as("kappa_e6"))
      .orderBy(col("n_docs"))
  }

  private val q364Sql =
    """WITH rated AS (
      |  SELECT least(n_chars // 150, 5) AS ra,
      |    least(len(list_filter(string_split(text, ' '),
      |      w -> length(w) > 0)) // 30, 5) AS rb
      |  FROM documents),
      |base AS (SELECT count(*) AS n,
      |  sum(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS diag FROM rated),
      |r AS (SELECT ra AS cat, count(*) AS nr FROM rated GROUP BY ra),
      |c AS (SELECT rb AS cat, count(*) AS nc FROM rated GROUP BY rb),
      |ch AS (SELECT coalesce(sum(nr * nc), 0) AS sch
      |       FROM r JOIN c USING (cat))
      |SELECT CAST(n AS BIGINT) AS n_docs, CAST(diag AS BIGINT) AS n_agree,
      |  CAST(sch AS BIGINT) AS s_chance,
      |  CAST(round(CAST(n*diag - sch AS DOUBLE)
      |    / CAST(n*n - sch AS DOUBLE) * 1000000.0) AS BIGINT) AS kappa_e6
      |FROM base, ch
      |ORDER BY n_docs""".stripMargin

  // ---------------------------------------------------------------------
  // q365 — CUSUM changepoint over the event value series in event-
  // time order: the split index maximizing |n·S_i − i·S_n| (the
  // cross-multiplied form of |S_i − (i/n)·S_n| — zero divisions
  // until the readout). The running sum is Curate.globalCumSum's
  // range-partitioned two-pass; products live in decimal(38,0)
  // (n·S_i reaches ~10¹⁹ at sf1 — past BIGINT), and the statistic is
  // returned EXACTLY as a (div 10⁹, mod 10⁹) long pair instead of a
  // lossy double — both engines split the same integer. Ties take
  // the smallest index.
  // ---------------------------------------------------------------------
  private def q365(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("ts_s"), col("event_id"),
        round(col("value") * 100).cast("long").as("ve2"))
    val cum = Curate.globalCumSum(e, Seq(col("ts_s"), col("event_id")),
      col("ve2"), "cum", "i")
    val tot = e.agg(count(lit(1)).as("n"), sum(col("ve2")).as("sv"))
    cum.crossJoin(broadcast(tot))
      .select(col("n"), col("sv"),
        abs(col("n").cast(dec) * col("cum").cast(dec) -
          col("i").cast(dec) * col("sv").cast(dec)).as("d"),
        col("i"))
      .groupBy(col("n"), col("sv"))
      .agg(max(struct(col("d"), (-col("i")).as("ni"))).as("best"))
      .select(col("n").as("n_events"), col("sv").as("s_total_e2"),
        (-col("best.ni")).as("cp_idx"),
        expr("best.d div 1000000000").as("d_hi"),
        expr("CAST(best.d % 1000000000 AS BIGINT)").as("d_lo"))
      .orderBy(col("n_events"))
  }

  private val q365Sql =
    """WITH e AS (
      |  SELECT date_trunc('second', ts) AS ts_s, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS ve2
      |  FROM events),
      |c AS (SELECT ve2,
      |    row_number() OVER (ORDER BY ts_s, event_id) AS i,
      |    sum(ve2) OVER (ORDER BY ts_s, event_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM e),
      |tt AS (SELECT count(*) AS n, sum(ve2) AS sv FROM e),
      |d AS (SELECT i, abs(tt.n * c.cum - i * tt.sv) AS d FROM c, tt),
      |best AS (SELECT d, i FROM d ORDER BY d DESC, i ASC LIMIT 1)
      |SELECT CAST(tt.n AS BIGINT) AS n_events,
      |  CAST(tt.sv AS BIGINT) AS s_total_e2,
      |  CAST(best.i AS BIGINT) AS cp_idx,
      |  CAST(best.d // 1000000000 AS BIGINT) AS d_hi,
      |  CAST(best.d % 1000000000 AS BIGINT) AS d_lo
      |FROM best, tt
      |ORDER BY n_events""".stripMargin

  // ---------------------------------------------------------------------
  // q366 — Benford first-digit audit of order totals (the fraud /
  // synthetic-data tripwire): observed leading-digit counts vs the
  // Benford expectation. log₁₀(1 + 1/d) enters as OFFLINE e9
  // literals (the gate's discipline for transcendental constants —
  // both engines consume the same 9 integers); each digit's χ²
  // term (O−E)²/E is ONE fixed IEEE expression rounded to an e6
  // long at the row, so any cross-engine reduction over the 9 rows
  // stays integral. A LEFT join from the digit dimension keeps
  // zero-observation digits visible.
  // ---------------------------------------------------------------------
  private val benfordE9: Seq[(Long, Long)] = Seq(
    1L -> 301029996L, 2L -> 176091259L, 3L -> 124938737L,
    4L -> 96910013L, 5L -> 79181246L, 6L -> 66946790L,
    7L -> 57991947L, 8L -> 51152522L, 9L -> 45757491L)

  private def q366(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probs = benfordE9.toDF("digit", "p_e9")
    val obs = t(s, dir, "orders")
      .select(substring(round(col("o_totalprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("observed"))
    val n = obs.agg(sum(col("observed")).as("n"))
    // n·p_e9 in decimal(38,0) — the long×long product wraps past
    // n ≈ 3e10 rows (p_e9 ≈ 3e8) while DuckDB would error; and since
    // the e9-scaled expectation itself outgrows BIGINT there, it
    // crosses engines as the (div 1e9, mod 1e9) long pair (the q365
    // discipline). expected_hi is just round-down(n·p) — digit-count
    // sized at any scale.
    val expD = col("expected").cast("double") / lit(1000000000.0)
    val obsD = col("observed").cast("double")
    probs.join(obs, Seq("digit"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("expected", col("n").cast(dec) * col("p_e9").cast(dec))
      .select(col("digit"), col("observed"),
        expr("expected div 1000000000").as("expected_hi"),
        expr("CAST(expected % 1000000000 AS BIGINT)").as("expected_lo"),
        round((obsD - expD) * (obsD - expD) / expD * lit(1000000.0))
          .cast("long").as("chi2_term_e6"))
      .orderBy(col("digit"))
  }

  private val q366Sql =
    """WITH probs(digit, p_e9) AS (VALUES
      |  (1, 301029996), (2, 176091259), (3, 124938737), (4, 96910013),
      |  (5, 79181246), (6, 66946790), (7, 57991947), (8, 51152522),
      |  (9, 45757491)),
      |obs AS (
      |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
      |    AS VARCHAR), 1, 1) AS BIGINT) AS digit,
      |    count(*) AS observed
      |  FROM orders GROUP BY 1),
      |n AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs),
      |j AS (
      |  SELECT probs.digit AS digit,
      |    coalesce(obs.observed, 0) AS observed,
      |    CAST(n.n AS HUGEINT) * probs.p_e9 AS e
      |  FROM probs LEFT JOIN obs ON probs.digit = obs.digit, n)
      |SELECT CAST(digit AS BIGINT) AS digit,
      |  CAST(observed AS BIGINT) AS observed,
      |  CAST(e // 1000000000 AS BIGINT) AS expected_hi,
      |  CAST(e % 1000000000 AS BIGINT) AS expected_lo,
      |  CAST(round(
      |    (CAST(observed AS DOUBLE) - CAST(e AS DOUBLE) / 1000000000.0)
      |    * (CAST(observed AS DOUBLE) - CAST(e AS DOUBLE) / 1000000000.0)
      |    / (CAST(e AS DOUBLE) / 1000000000.0)
      |    * 1000000.0) AS BIGINT) AS chi2_term_e6
      |FROM j
      |ORDER BY digit""".stripMargin

  // ---------------------------------------------------------------------
  // q367 — BPE merge-candidate counting: adjacent-token-pair
  // frequencies over the corpus, top 20 with full (count, pair)
  // tiebreak — the inner loop of byte-pair-encoding tokenizer
  // training, run as a single Generate + hash aggregate (pairs
  // explode in place from each token array; no join, no window).
  // The top-k is a bounded TakeOrderedAndProject, never a global
  // sort of the pair grain.
  // ---------------------------------------------------------------------
  private def q367(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(Text.words(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(w) - 1),
          |  i -> struct(element_at(w, i) AS a,
          |              element_at(w, i + 1) AS b))""".stripMargin))
        .as("p"))
      .groupBy(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok_a"), col("tok_b"))
      .limit(20)

  private val q367Sql =
    """WITH d AS (
      |  SELECT list_filter(string_split(text, ' '),
      |    w -> length(w) > 0) AS w
      |  FROM documents),
      |p AS (
      |  SELECT w[CAST(i AS INT)] AS tok_a, w[CAST(i AS INT) + 1] AS tok_b
      |  FROM d, UNNEST(range(1, len(w))) AS t(i)
      |  WHERE len(w) >= 2)
      |SELECT tok_a, tok_b, count(*) AS cnt
      |FROM p GROUP BY tok_a, tok_b
      |ORDER BY cnt DESC, tok_a, tok_b
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q368 — split-conformal calibration + coverage audit: calibration
  // half (even event ids) yields the k-th smallest nonconformity
  // score with k = ⌈0.9·(n+1)⌉ (exact integer ceiling, no floats);
  // the held-out half reports empirical coverage against that
  // threshold. The order statistic rides Curate.globalRank (range-
  // partitioned — the k-th element of 10¹⁰ rows costs one balanced
  // shuffle, not one task); k and the threshold broadcast as 1-row
  // scalars. One e6 division for the coverage readout.
  // ---------------------------------------------------------------------
  private def q368(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_id"), round(col("value") * 100).cast("long")
        .as("v"))
    val cal = e.filter(col("event_id") % 2 === 0)
    val kdf = cal.agg(count(lit(1)).as("n_cal"))
      .withColumn("k", expr("(9 * (n_cal + 1) + 9) div 10"))
    val thr = Curate.globalRank(cal.select(col("v"), col("event_id")),
        Seq(col("v"), col("event_id")), "r")
      .crossJoin(broadcast(kdf))
      .filter(col("r") === col("k"))
      .select(col("n_cal"), col("k"), col("v").as("thr"))
    e.filter(col("event_id") % 2 === 1)
      .crossJoin(broadcast(thr))
      .groupBy(col("n_cal"), col("k"), col("thr"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("v") <= col("thr"), 1L).otherwise(0L)).as("n_cov"))
      .withColumn("cov_e6",
        round(col("n_cov").cast("double") / col("n_test").cast("double")
          * 1000000.0).cast("long"))
      .orderBy(col("k"))
  }

  private val q368Sql =
    """WITH e AS (
      |  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events),
      |cal AS (SELECT v, event_id FROM e WHERE event_id % 2 = 0),
      |p AS (SELECT count(*) AS n_cal,
      |             (9 * (count(*) + 1) + 9) // 10 AS k FROM cal),
      |r AS (SELECT v, row_number() OVER (ORDER BY v, event_id) AS rn
      |      FROM cal),
      |thr AS (SELECT p.n_cal, p.k, r.v AS thr FROM r, p WHERE r.rn = p.k),
      |tst AS (SELECT v FROM e WHERE event_id % 2 = 1)
      |SELECT CAST(thr.n_cal AS BIGINT) AS n_cal, CAST(thr.k AS BIGINT) AS k,
      |  thr.thr,
      |  count(*) AS n_test,
      |  CAST(sum(CASE WHEN tst.v <= thr.thr THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_cov,
      |  CAST(round(CAST(sum(CASE WHEN tst.v <= thr.thr THEN 1 ELSE 0 END)
      |      AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1000000.0) AS BIGINT)
      |    AS cov_e6
      |FROM tst, thr
      |GROUP BY 1, 2, 3
      |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------------
  // q369 — sorted-neighborhood linkage (Hernández–Stolfo merge/
  // purge): the LINEAR-pairs alternative to blocked linkage — rows
  // rank globally by sort key (Curate.globalRank's range-partitioned
  // two-pass), and each record pairs with exactly its w=3 successors
  // via a rank equi-join (explode of a 3-element sequence; n·w pairs
  // BY CONSTRUCTION at any scale — the operator q108's chunk tier is
  // the blocked cousin of). Jaro–Winkler scores through the codegen'd
  // expression; per-offset aggregate readout, integer sums only.
  // ---------------------------------------------------------------------
  private def q369(s: SparkSession, dir: String): DataFrame =
    sortedNeighborhoodPairs(t(s, dir, "customer"),
        col("c_custkey"), col("c_name"), 3)
      .withColumn("jw_e6", JaroWinklerE6.col(col("key_a"), col("key_b")))
      .groupBy(col("j"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("jw_e6")).as("sum_jw_e6"),
        max(col("jw_e6")).as("max_jw_e6"),
        sum(when(col("jw_e6") >= 900000L, 1L).otherwise(0L))
          .as("n_match90"))
      .orderBy(col("j"))

  private val q369Sql =
    """WITH c AS (SELECT c_custkey AS k, c_name AS nm FROM customer),
      |r AS (SELECT k, nm, row_number() OVER (ORDER BY nm, k) AS r
      |      FROM c),
      |a AS (SELECT r.k AS k_a, r.nm AS nm_a, r.r, t.j, r.r + t.j AS rb
      |      FROM r, UNNEST(range(1, 4)) AS t(j)),
      |p AS (SELECT a.j, CAST(round(1000000 *
      |    jaro_winkler_similarity(a.nm_a, b.nm)) AS BIGINT) AS jw_e6
      |  FROM a JOIN r b ON a.rb = b.r)
      |SELECT CAST(j AS BIGINT) AS j, count(*) AS n_pairs,
      |  CAST(sum(jw_e6) AS BIGINT) AS sum_jw_e6,
      |  CAST(max(jw_e6) AS BIGINT) AS max_jw_e6,
      |  CAST(sum(CASE WHEN jw_e6 >= 900000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_match90
      |FROM p GROUP BY j
      |ORDER BY j""".stripMargin

  // ---------------------------------------------------------------------
  // q370 — type–token lexical stats per language: token count,
  // vocabulary size, hapax-legomenon count, and the e6 type–token
  // ratio — the corpus-diversity audit a tokenizer/mixture pipeline
  // reads before committing a data mix. One explode to the (lang,
  // token) grain, one hash aggregate to term frequencies, one 5-row
  // rollup; pure integers until the final e6 ratio.
  // ---------------------------------------------------------------------
  private def q370(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), explode(Text.words(col("text"))).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("lang"))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr_e6",
        round(col("n_types").cast("double") / col("n_tokens").cast("double")
          * 1000000.0).cast("long"))
      .orderBy(col("lang"))

  private val q370Sql =
    """WITH toks AS (
      |  SELECT lang, unnest(list_filter(string_split(text, ' '),
      |    w -> length(w) > 0)) AS tok
      |  FROM documents),
      |tf AS (SELECT lang, tok, count(*) AS tf FROM toks
      |       GROUP BY lang, tok)
      |SELECT lang, CAST(sum(tf) AS BIGINT) AS n_tokens,
      |  count(*) AS n_types,
      |  CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_hapax,
      |  CAST(round(CAST(count(*) AS DOUBLE)
      |    / CAST(sum(tf) AS DOUBLE) * 1000000.0) AS BIGINT) AS ttr_e6
      |FROM tf GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q371 — EXACT weighted median of line price per return flag,
  // weighted by quantity: the smallest price whose inclusive
  // cumulative weight reaches half the flag's total (2·cum ≥ tot —
  // cross-multiplied, no halving). The per-flag running weight is
  // [[Curate.keyedCumSum]]'s regime exactly — 3 keys, millions of
  // rows per key, range-partitioned so no flag funnels through one
  // task. The min-qualifying-price readout is order-invariant under
  // price ties (any intra-tie order crosses the threshold inside the
  // same price group), so the result is deterministic at any
  // partitioning.
  // ---------------------------------------------------------------------
  private def q371(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast("long").as("p_e2"),
        round(col("l_quantity")).cast("long").as("w"),
        col("l_orderkey"), col("l_linenumber"))
    val cum = Curate.keyedCumSum(li, Seq("flag"),
      Seq(col("p_e2"), col("l_orderkey"), col("l_linenumber")),
      col("w"), "cumw", "__r")
    val tot = li.groupBy(col("flag"))
      .agg(sum(col("w")).as("totw"), count(lit(1)).as("n_rows"))
    cum.join(broadcast(tot), "flag")
      .filter(lit(2L) * col("cumw") >= col("totw"))
      .groupBy(col("flag"), col("totw"), col("n_rows"))
      .agg(min(col("p_e2")).as("wmedian_e2"))
      .select(col("flag"), col("n_rows"), col("totw"),
        col("wmedian_e2"))
      .orderBy(col("flag"))
  }

  private val q371Sql =
    """WITH li AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p_e2,
      |    CAST(round(l_quantity) AS BIGINT) AS w,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |c AS (SELECT flag, p_e2,
      |    sum(w) OVER (PARTITION BY flag
      |      ORDER BY p_e2, l_orderkey, l_linenumber
      |      ROWS UNBOUNDED PRECEDING) AS cumw
      |  FROM li),
      |tt AS (SELECT flag, sum(w) AS totw, count(*) AS n_rows
      |       FROM li GROUP BY flag)
      |SELECT c.flag, CAST(tt.n_rows AS BIGINT) AS n_rows,
      |  CAST(tt.totw AS BIGINT) AS totw,
      |  CAST(min(c.p_e2) AS BIGINT) AS wmedian_e2
      |FROM c JOIN tt ON c.flag = tt.flag
      |WHERE 2 * c.cumw >= tt.totw
      |GROUP BY c.flag, tt.n_rows, tt.totw
      |ORDER BY c.flag""".stripMargin

  // ---------------------------------------------------------------------
  // q372 — MAD (median-absolute-deviation) outlier audit per event
  // type: the ROBUST twin of q126's z-score (one wild day cannot
  // move a median the way it moves a mean/variance). Both medians
  // are exact lower-median order statistics computed on the VALUE-
  // GROUP grain (≤10⁵ rows per type however big the corpus): per-
  // (type, value) counts, per-type cumulative counts through
  // [[Curate.keyedCumSum]], min value with 2·cum ≥ n.
  //
  // ONE corpus pass total (the r8→r9 fusion): the raw events reduce
  // to the (type, value, count) grain once, pinned; the deviation
  // grain is DERIVED from it (|v − med| maps value-groups to
  // dev-groups, summing counts — no re-scan of the events), the MAD
  // median runs on that derived grain, and even the final
  // (n, n_outliers) readout is count-weighted over the grain. The
  // med → dev data dependence makes two median passes semantically
  // unavoidable (the dev grain cannot exist before the median is
  // known), but both — and everything after the first aggregate —
  // touch only grain-sized rows. And because the grain is BOUNDED BY
  // THE VALUE UNIVERSE, not the corpus (e2-rounded values in
  // [0, ~561) ⇒ ≤ ~5.7·10⁴ rows per type at ANY data size — measured
  // identical, 17 792 distinct values, at sf0.1 and the ×10 replica),
  // the cumulative count uses a plain Window.partitionBy(type): the
  // per-key funnel that window creates is capped at the universe
  // size, which is exactly when the partitioned window IS the right
  // tool and [[Curate.keyedCumSum]]'s range-partitioned carry (for
  // grains that GROW with the data) would be pure fixed overhead —
  // this swap cut q372 from 3.9 s to ~1 s at sf0.1. The outlier flag
  // |v − med| > 3·MAD is a pure integer comparison; no division
  // anywhere in the query.
  // ---------------------------------------------------------------------
  private def q372(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type").as("et"),
        round(col("value") * 100).cast("long").as("v"))
    // the one corpus-grain aggregate; both medians, the dev grain and
    // the readout all derive from these universe-bounded rows
    val g1 = e.groupBy(col("et"), col("v"))
      .agg(count(lit(1)).as("__c")).pin()
    def lowerMedianOfCounts(g: DataFrame, valCol: String,
                            outName: String): DataFrame = {
      val w = Window.partitionBy(col("et")).orderBy(col(valCol))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(col("et"))
      g.withColumn("__cum", sum(col("__c")).over(w))
        .withColumn("__n", sum(col("__c")).over(wAll))
        .filter(lit(2L) * col("__cum") >= col("__n"))
        .groupBy(col("et"))
        .agg(min(col(valCol)).as(outName))
    }
    val med = lowerMedianOfCounts(g1, "v", "med_e2")
    val g2 = g1.join(broadcast(med), "et")
      .select(col("et"), abs(col("v") - col("med_e2")).as("d"), col("__c"))
      .groupBy(col("et"), col("d"))
      .agg(sum(col("__c")).as("__c"))
    val mad = lowerMedianOfCounts(g2, "d", "mad_e2")
    g2.join(broadcast(med), "et").join(broadcast(mad), "et")
      .groupBy(col("et"), col("med_e2"), col("mad_e2"))
      .agg(sum(col("__c")).as("n"),
        sum(when(col("d") > lit(3L) * col("mad_e2"), col("__c"))
          .otherwise(0L)).as("n_outliers"))
      .select(col("et").as("event_type"), col("n"), col("med_e2"),
        col("mad_e2"), col("n_outliers"))
      .orderBy(col("event_type"))
  }

  private val q372Sql =
    """WITH e AS (
      |  SELECT event_type AS et,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events),
      |g1 AS (SELECT et, v, count(*) AS c FROM e GROUP BY et, v),
      |c1 AS (SELECT et, v,
      |    sum(c) OVER (PARTITION BY et ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS cum FROM g1),
      |t1 AS (SELECT et, sum(c) AS n FROM g1 GROUP BY et),
      |med AS (SELECT c1.et, min(c1.v) AS med_e2
      |  FROM c1 JOIN t1 ON c1.et = t1.et
      |  WHERE 2 * c1.cum >= t1.n GROUP BY c1.et),
      |dev AS (SELECT e.et, e.v, abs(e.v - med.med_e2) AS d
      |        FROM e JOIN med ON e.et = med.et),
      |g2 AS (SELECT et, d, count(*) AS c FROM dev GROUP BY et, d),
      |c2 AS (SELECT et, d,
      |    sum(c) OVER (PARTITION BY et ORDER BY d
      |      ROWS UNBOUNDED PRECEDING) AS cum FROM g2),
      |t2 AS (SELECT et, sum(c) AS n FROM g2 GROUP BY et),
      |mad AS (SELECT c2.et, min(c2.d) AS mad_e2
      |  FROM c2 JOIN t2 ON c2.et = t2.et
      |  WHERE 2 * c2.cum >= t2.n GROUP BY c2.et)
      |SELECT dev.et AS event_type, count(*) AS n,
      |  CAST(med.med_e2 AS BIGINT) AS med_e2,
      |  CAST(mad.mad_e2 AS BIGINT) AS mad_e2,
      |  CAST(sum(CASE WHEN dev.d > 3 * mad.mad_e2 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers
      |FROM dev JOIN med ON dev.et = med.et
      |         JOIN mad ON dev.et = mad.et
      |GROUP BY dev.et, med.med_e2, mad.mad_e2
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q373 — 2-D Pareto skyline (earliest-and-most-expensive order
  // frontier): an order is on the frontier iff no strictly earlier
  // date carries an equal-or-higher price and it is its own date's
  // champion. Computed in ONE linear pass instead of the naive
  // NOT-EXISTS self-join: per-date champions (max price, smallest
  // key tiebreak via lexicographic struct max — a map-side hash
  // aggregate), then [[Curate.globalCumMax]] with inclusive=false
  // gives each date the running max over STRICTLY earlier dates
  // (range-partitioned two-pass — no unpartitioned window), and the
  // frontier keeps champions beating that watermark. The frontier
  // grain is dates, not orders — dimension-sized at any corpus.
  // ---------------------------------------------------------------------
  private def q373(s: SparkSession, dir: String): DataFrame = {
    val champ = t(s, dir, "orders")
      .select(col("o_orderdate").cast("date").as("d"),
        round(col("o_totalprice") * 100).cast("long").as("p_e2"),
        col("o_orderkey"))
      .groupBy(col("d"))
      .agg(max(struct(col("p_e2"), (-col("o_orderkey")).as("nk")))
        .as("best"))
      .select(col("d"), col("best.p_e2").as("p_e2"),
        (-col("best.nk")).as("o_orderkey"))
    Curate.globalCumMax(champ, Seq(col("d")), col("p_e2"), "prevmax",
        inclusive = false)
      .filter(col("prevmax").isNull || col("p_e2") > col("prevmax"))
      .select(col("d"), col("p_e2"), col("o_orderkey"))
      .orderBy(col("d"))
  }

  private val q373Sql =
    """WITH o AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS p_e2,
      |    o_orderkey
      |  FROM orders),
      |champ AS (
      |  SELECT d, p_e2, o_orderkey FROM (
      |    SELECT d, p_e2, o_orderkey,
      |      row_number() OVER (PARTITION BY d
      |        ORDER BY p_e2 DESC, o_orderkey ASC) AS rn
      |    FROM o) WHERE rn = 1),
      |sky AS (
      |  SELECT d, p_e2, o_orderkey,
      |    max(p_e2) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
      |  FROM champ)
      |SELECT d, p_e2, o_orderkey
      |FROM sky
      |WHERE prevmax IS NULL OR p_e2 > prevmax
      |ORDER BY d""".stripMargin

  // ---------------------------------------------------------------------
  // q374 — autocorrelation (ACF lags 1..7) of the daily revenue
  // series, EXACT until the readout: with the mean cross-multiplied
  // away, ACF_k = Σᵢ(n·yᵢ−S)(n·yᵢ₊ₖ−S) / Σᵢ(n·yᵢ−S)² — integer
  // products in decimal(38,0) ((n·y−S)² reaches ~10²⁵), one e6
  // division per lag. The series grain is CALENDAR-bounded (~2 400
  // days at any corpus size), indexed by Curate.globalRank, and the
  // lag pairing is a rank equi-join against an exploded 7-lag
  // sequence — no window, no self-cross.
  // ---------------------------------------------------------------------
  private def q374(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val idx = Curate.globalRank(daily, Seq(col("d")), "r")
      .select(col("r"), col("y"))
    val tot = idx.agg(count(lit(1)).as("n"), sum(col("y")).as("sv"))
    val centered = idx.crossJoin(broadcast(tot))
      .select(col("r"), col("n"),
        (col("n").cast(dec) * col("y").cast(dec) -
          col("sv").cast(dec)).as("c"))
    val den = centered.agg(sum(col("c") * col("c")).as("den"))
    val a = centered.select(col("r"), col("n"), col("c").as("ca"),
        explode(sequence(lit(1L), lit(7L))).as("k"))
      .withColumn("r2", col("r") + col("k"))
    val b = centered.select(col("r").as("r2"), col("c").as("cb"))
    a.join(b, "r2")
      .groupBy(col("k"), col("n"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("ca") * col("cb"))
        .as("num"))
      .crossJoin(broadcast(den))
      .select(col("k").as("lag"), col("n_pairs"),
        round(col("num").cast("double") / col("den").cast("double")
          * 1000000.0).cast("long").as("acf_e6"))
      .orderBy(col("lag"))
  }

  private val q374Sql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS y
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT row_number() OVER (ORDER BY d) AS r, y FROM daily),
      |tt AS (SELECT count(*) AS n, sum(y) AS sv FROM idx),
      |ctr AS (SELECT r, tt.n, tt.n * y - tt.sv AS c FROM idx, tt),
      |den AS (SELECT sum(c * c) AS den FROM ctr),
      |lags AS (SELECT unnest(range(1, 8)) AS k),
      |p AS (SELECT lags.k, a.n, a.c AS ca, b.c AS cb
      |      FROM ctr a, lags
      |      JOIN ctr b ON b.r = a.r + lags.k)
      |SELECT CAST(p.k AS BIGINT) AS lag, count(*) AS n_pairs,
      |  CAST(round(CAST(sum(p.ca * p.cb) AS DOUBLE)
      |    / CAST(den.den AS DOUBLE) * 1000000.0) AS BIGINT) AS acf_e6
      |FROM p, den
      |GROUP BY p.k, den.den
      |ORDER BY lag""".stripMargin

  // ---------------------------------------------------------------------
  // q375 — mutual information between event type and value bucket
  // (the feature-relevance audit: how many nats does knowing the
  // type tell you about the value?): MI = Σ_cells (c/n)·ln(c·n/
  // (r·s)). Counts and marginals are exact longs; each cell's term
  // is ONE fixed IEEE expression from exact integers rounded to an
  // e9 long AT THE CELL (the weightedTopKSample discipline — the
  // rounding absorbs last-ulp libm ln divergence), and the total is
  // an INTEGER sum over the ≤50-cell grain, so reduction order can
  // never move the result. Corpus cost: one groupBy on a 50-cell
  // grain plus two marginal aggregates.
  // ---------------------------------------------------------------------
  private def q375(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type").as("x"),
        least(expr("CAST(round(value * 100) AS BIGINT) div 5000"),
          lit(9L)).as("b"))
    val cells = e.groupBy(col("x"), col("b")).agg(count(lit(1)).as("c"))
    val rx = cells.groupBy(col("x")).agg(sum(col("c")).as("rx"))
    val sy = cells.groupBy(col("b")).agg(sum(col("c")).as("sy"))
    val n = cells.agg(sum(col("c")).as("n"))
    cells.join(broadcast(rx), "x").join(broadcast(sy), "b")
      .crossJoin(broadcast(n))
      .select(col("n"),
        round(col("c").cast("double") / col("n").cast("double") *
          log((col("c").cast("double") * col("n").cast("double")) /
            (col("rx").cast("double") * col("sy").cast("double")))
          * 1000000000.0).cast("long").as("term_e9"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("n_cells"), sum(col("term_e9")).as("mi_e9"))
      .select(col("n").as("n_events"), col("n_cells"), col("mi_e9"))
      .orderBy(col("n_events"))
  }

  private val q375Sql =
    """WITH e AS (
      |  SELECT event_type AS x,
      |    least(CAST(round(value * 100) AS BIGINT) // 5000, 9) AS b
      |  FROM events),
      |cells AS (SELECT x, b, count(*) AS c FROM e GROUP BY x, b),
      |rx AS (SELECT x, sum(c) AS rx FROM cells GROUP BY x),
      |sy AS (SELECT b, sum(c) AS sy FROM cells GROUP BY b),
      |n AS (SELECT sum(c) AS n FROM cells),
      |terms AS (
      |  SELECT n.n,
      |    CAST(round(CAST(cells.c AS DOUBLE) / CAST(n.n AS DOUBLE) *
      |      ln((CAST(cells.c AS DOUBLE) * CAST(n.n AS DOUBLE)) /
      |         (CAST(rx.rx AS DOUBLE) * CAST(sy.sy AS DOUBLE)))
      |      * 1000000000.0) AS BIGINT) AS term_e9
      |  FROM cells JOIN rx USING (x) JOIN sy USING (b), n)
      |SELECT CAST(n AS BIGINT) AS n_events, count(*) AS n_cells,
      |  CAST(sum(term_e9) AS BIGINT) AS mi_e9
      |FROM terms
      |GROUP BY n
      |ORDER BY n_events""".stripMargin

  // ---------------------------------------------------------------------
  // registration
  // ---------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q360_roc_auc" -> (q360 _),
    "q361_calibration_bins" -> (q361 _),
    "q362_gini_spend" -> (q362 _),
    "q363_ks_drift" -> (q363 _),
    "q364_cohens_kappa" -> (q364 _),
    "q365_cusum_changepoint" -> (q365 _),
    "q366_benford_audit" -> (q366 _),
    "q367_bpe_pairs" -> (q367 _),
    "q368_conformal_coverage" -> (q368 _),
    "q369_sorted_neighborhood" -> (q369 _),
    "q370_type_token" -> (q370 _),
    "q371_weighted_median" -> (q371 _),
    "q372_mad_outliers" -> (q372 _),
    "q373_pareto_skyline" -> (q373 _),
    "q374_revenue_acf" -> (q374 _),
    "q375_mutual_info" -> (q375 _))

  val oracle: Map[String, String] = Map(
    "q360_roc_auc" -> q360Sql,
    "q361_calibration_bins" -> q361Sql,
    "q362_gini_spend" -> q362Sql,
    "q363_ks_drift" -> q363Sql,
    "q364_cohens_kappa" -> q364Sql,
    "q365_cusum_changepoint" -> q365Sql,
    "q366_benford_audit" -> q366Sql,
    "q367_bpe_pairs" -> q367Sql,
    "q368_conformal_coverage" -> q368Sql,
    "q369_sorted_neighborhood" -> q369Sql,
    "q370_type_token" -> q370Sql,
    "q371_weighted_median" -> q371Sql,
    "q372_mad_outliers" -> q372Sql,
    "q373_pareto_skyline" -> q373Sql,
    "q374_revenue_acf" -> q374Sql,
    "q375_mutual_info" -> q375Sql)
}
