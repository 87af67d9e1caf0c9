package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Text

/** Data-integrity / statistical-testing tier (session 9): the release
  * audits a training-data platform runs beyond round 8's model-quality
  * tier — privacy (l-diversity, complementing q238's k-anonymity),
  * multi-rater label quality (Fleiss' κ, complementing q364's
  * two-rater Cohen's κ), retrieval feed quality (MRR / hit@k), robust
  * location (exact winsorized + trimmed means, complementing q372's
  * MAD), corpus-mix planning (largest-remainder token-budget
  * allocation — quotas sum EXACTLY to the budget), heavy-tail shape
  * (Hill tail-index), and three classic drift/association tests (χ²
  * independence, Jensen–Shannon divergence, McNemar's paired test).
  * No reference analogue (the reference delegates analytics to SQL;
  * README.md:1-3). Cross-engine discipline as everywhere in the gate:
  * integer/e2-long grains, cross-products in decimal(38,0) (HUGEINT in
  * the oracle), per-row ln only e9-rounded at the cell before any
  * cross-row sum (the q375 precedent), ONE IEEE division per readout,
  * unique-tiebreak ORDER BY, no Decimal/Float in final schemas.
  */
object Integrity {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val dec = "decimal(38,0)"

  // ---------------------------------------------------------------------
  // q377 — l-diversity audit (Machanavajjhala et al.'s complement to
  // k-anonymity, gated as q238): a class of ≥k records still leaks
  // if everyone in it shares the SENSITIVE value. Documents group by
  // the quasi-identifier (source, n_chars÷200) and the sensitive
  // attribute is lang; for each candidate l the audit reports how
  // many equivalence classes (and records) have fewer than l distinct
  // sensitive values. One shuffle to the QI×lang grain, then the
  // class rollup and the 3-row threshold cross — class cardinality is
  // bounded by the QI domain, not the corpus (the q238 scale shape).
  // ---------------------------------------------------------------------
  private def q377(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("source"), expr("n_chars div 200").as("b"), col("lang"))
    val classes = d.groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("n"), countDistinct(col("lang")).as("dv"))
    val ls = s.range(3).select(element_at(
      array(lit(2L), lit(3L), lit(4L)), col("id").cast("int") + 1).as("l"))
    classes.crossJoin(broadcast(ls))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("dv") < col("l"), 1L).otherwise(0L))
          .as("n_classes_below"),
        sum(when(col("dv") < col("l"), col("n")).otherwise(0L))
          .as("n_records_below"),
        min(col("dv")).as("min_diversity"))
      .orderBy(col("l"))
  }

  private val q377Sql =
    """WITH d AS (
      |  SELECT source, n_chars // 200 AS b, lang FROM documents),
      |classes AS (
      |  SELECT source, b, count(*) AS n, count(DISTINCT lang) AS dv
      |  FROM d GROUP BY 1, 2),
      |ls AS (SELECT unnest([2, 3, 4]) AS l)
      |SELECT CAST(l AS BIGINT) AS l,
      |  count(*) AS n_classes,
      |  CAST(sum(CASE WHEN dv < l THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_classes_below,
      |  CAST(sum(CASE WHEN dv < l THEN n ELSE 0 END) AS BIGINT)
      |    AS n_records_below,
      |  CAST(min(dv) AS BIGINT) AS min_diversity
      |FROM classes CROSS JOIN ls
      |GROUP BY l
      |ORDER BY l""".stripMargin

  // ---------------------------------------------------------------------
  // q378 — Fleiss' κ multi-rater agreement: three deterministic
  // document "raters" (chars-based, tokens-based, punctuation-based
  // quality bucketers, 6 classes — the m>2 generalization q364's
  // Cohen κ cannot express). With N items, m raters, n_ij ratings of
  // item i in class j:  P̄ = (ΣΣn_ij² − Nm)/(Nm(m−1)),
  // P̄e = Σ_j c_j²/(Nm)², κ = (P̄−P̄e)/(1−P̄e). The whole statistic
  // reduces to three integer sums (A = ΣΣn², c_j marginals, N);
  // cross-products run in decimal(38,0) (HUGEINT in the oracle) and
  // κ is ONE e6-rounded division of the cross-multiplied form
  // κ = (m·(A−Nm)·Nm − m'·Σc²) / (m'·((Nm)² − Σc²)) with m' = m−1
  // scaled by Nm — algebraically (P̄−P̄e)/(1−P̄e) with both sides
  // multiplied by (m−1)(Nm)². Corpus cost: one scan to the
  // (doc, class) grain.
  // ---------------------------------------------------------------------
  private def q378(s: SparkSession, dir: String): DataFrame = {
    val m = 3L
    val rated = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(array(
          least(expr("n_chars div 150"), lit(5L)),
          least((size(Text.words(col("text"))) / 30).cast("long"), lit(5L)),
          least(expr(
            "(length(text) - length(replace(text, '.'))) div 2"),
            lit(5L)))).as("cat"))
    val nij = rated.groupBy(col("doc_id"), col("cat"))
      .agg(count(lit(1)).as("c"))
    val base = nij.agg(
      countDistinct(col("doc_id")).as("n_items"),
      sum(col("c").cast(dec) * col("c").cast(dec)).as("a2"))
    val marg = nij.groupBy(col("cat")).agg(sum(col("c")).as("cj"))
      .agg(coalesce(sum(col("cj").cast(dec) * col("cj").cast(dec)),
        lit(0L).cast(dec)).as("sc2"))
    base.crossJoin(broadcast(marg))
      .select(col("n_items"), col("a2").cast("long").as("a_sum2"),
        col("sc2").cast("long").as("s_marg2"),
        round({
          val nm = col("n_items").cast(dec) * lit(m)
          val num = (col("a2") - nm) * nm - lit(m - 1).cast(dec) * col("sc2")
          val den = lit(m - 1).cast(dec) * (nm * nm - col("sc2"))
          num.cast("double") / den.cast("double") * 1000000.0
        }).cast("long").as("kappa_e6"))
      .orderBy(col("n_items"))
  }

  private val q378Sql =
    """WITH rated AS (
      |  SELECT doc_id, unnest([
      |    least(n_chars // 150, 5),
      |    least(len(list_filter(string_split(text, ' '),
      |      w -> length(w) > 0)) // 30, 5),
      |    least((length(text) - length(replace(text, '.', ''))) // 2, 5)
      |  ]) AS cat
      |  FROM documents),
      |nij AS (SELECT doc_id, cat, count(*) AS c
      |        FROM rated GROUP BY doc_id, cat),
      |base AS (SELECT count(DISTINCT doc_id) AS n,
      |    sum(CAST(c AS HUGEINT) * c) AS a2 FROM nij),
      |marg AS (SELECT coalesce(sum(CAST(cj AS HUGEINT) * cj), 0) AS sc2
      |  FROM (SELECT cat, sum(c) AS cj FROM nij GROUP BY cat))
      |SELECT CAST(base.n AS BIGINT) AS n_items,
      |  CAST(base.a2 AS BIGINT) AS a_sum2,
      |  CAST(marg.sc2 AS BIGINT) AS s_marg2,
      |  CAST(round(
      |    CAST((base.a2 - base.n * 3) * (base.n * 3)
      |         - 2 * marg.sc2 AS DOUBLE)
      |    / CAST(2 * (CAST(base.n AS HUGEINT) * 3 * base.n * 3
      |                - marg.sc2) AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS kappa_e6
      |FROM base, marg
      |ORDER BY n_items""".stripMargin

  // ---------------------------------------------------------------------
  // q379 — MRR@10 / hit@10 of the value-ranked event feed (the
  // retrieval-quality twin of q275's NDCG): per user, events rank by
  // (value desc, event_id asc); the first 'purchase' at rank r ≤ 10
  // contributes reciprocal rank 1/r. Per-user reciprocal ranks are
  // e6-rounded integers (round(10⁶/r) for r ∈ 1..10 — exact integer
  // arithmetic on both engines), so the corpus-wide sum is an integer
  // reduction and the mean is ONE final division. The window
  // partitions by user — per-user history, the grain that scales out.
  // ---------------------------------------------------------------------
  private def q379(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val ranked = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        col("event_type"))
      .withColumn("r", row_number().over(w).cast("long"))
      .filter(col("r") <= 10L)
    val perUser = ranked.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase", col("r")))
        .as("first_rel"))
    perUser.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("first_rel").isNotNull, 1L).otherwise(0L))
          .as("n_hits"),
        sum(coalesce(round(lit(1000000.0) / col("first_rel")
          .cast("double")).cast("long"), lit(0L))).as("rr_sum_e6"))
      .select(col("n_users"), col("n_hits"), col("rr_sum_e6"),
        round(col("rr_sum_e6").cast("double") /
          col("n_users").cast("double")).cast("long").as("mrr_e6"))
      .orderBy(col("n_users"))
  }

  private val q379Sql =
    """WITH ranked AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY value DESC, event_id ASC) AS r
      |  FROM events),
      |top AS (SELECT * FROM ranked WHERE r <= 10),
      |per_user AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'purchase' THEN r END) AS first_rel
      |  FROM top GROUP BY user_id)
      |SELECT count(*) AS n_users,
      |  CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_hits,
      |  CAST(sum(coalesce(
      |    CAST(round(1000000.0 / first_rel) AS BIGINT), 0))
      |    AS BIGINT) AS rr_sum_e6,
      |  CAST(round(CAST(sum(coalesce(
      |      CAST(round(1000000.0 / first_rel) AS BIGINT), 0)) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mrr_e6
      |FROM per_user
      |ORDER BY n_users""".stripMargin

  // ---------------------------------------------------------------------
  // q380 — EXACT winsorized and trimmed means per event type (the
  // robust-location family next to q372's MAD): on the value-group
  // grain (bounded by the e2 value UNIVERSE, the q372 argument), the
  // 5%/95% winsorizing bounds are lower order statistics
  // (smallest v with 20·cum ≥ n, smallest v with 20·cum ≥ 19·n) and
  // the 5% trim drops EXACTLY k = n÷20 rows from each end by rank
  // overlap: a value group spanning cumulative ranks (cum−c, cum]
  // loses clamp(k−(cum−c), 0, c) rows to the bottom trim and
  // clamp(k−(n−cum), 0, c) to the top — partial groups handled
  // exactly, no row-grain sort anywhere. Sums stay e2 longs; each
  // mean is ONE e6 division.
  // ---------------------------------------------------------------------
  private def q380(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type").as("et"),
        round(col("value") * 100).cast("long").as("v"))
    val g = e.groupBy(col("et"), col("v")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("et")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("et"))
    val cum = g.withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(wAll))
    val bounds = cum.groupBy(col("et"), col("n"))
      .agg(min(when(lit(20L) * col("cum") >= col("n"), col("v")))
          .as("v_lo"),
        min(when(lit(20L) * col("cum") >= lit(19L) * col("n"), col("v")))
          .as("v_hi"))
    val k = expr("n div 20")
    cum.join(broadcast(bounds), Seq("et", "n"))
      .withColumn("kept",
        col("c")
          - greatest(least(k - (col("cum") - col("c")), col("c")), lit(0L))
          - greatest(least(k - (col("n") - col("cum")), col("c")), lit(0L)))
      .groupBy(col("et"), col("n"), col("v_lo"), col("v_hi"))
      .agg(
        sum(col("c") * least(greatest(col("v"), col("v_lo")), col("v_hi")))
          .as("winsor_sum_e2"),
        sum(col("kept") * col("v")).as("trim_sum_e2"))
      .select(col("et").as("event_type"), col("n"),
        col("v_lo"), col("v_hi"), col("winsor_sum_e2"),
        col("trim_sum_e2"), (col("n") - lit(2L) * expr("n div 20"))
          .as("trim_n"),
        round(col("winsor_sum_e2").cast("double") /
          col("n").cast("double") * 10000.0).cast("long")
          .as("winsor_mean_e6"),
        round(col("trim_sum_e2").cast("double") /
          (col("n") - lit(2L) * expr("n div 20")).cast("double")
          * 10000.0).cast("long").as("trim_mean_e6"))
      .orderBy(col("event_type"))
  }

  private val q380Sql =
    """WITH e AS (
      |  SELECT event_type AS et, CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events),
      |g AS (SELECT et, v, count(*) AS c FROM e GROUP BY et, v),
      |cum AS (SELECT et, v, c,
      |    sum(c) OVER (PARTITION BY et ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(c) OVER (PARTITION BY et) AS n
      |  FROM g),
      |bounds AS (SELECT et, n,
      |    min(CASE WHEN 20 * cum >= n THEN v END) AS v_lo,
      |    min(CASE WHEN 20 * cum >= 19 * n THEN v END) AS v_hi
      |  FROM cum GROUP BY et, n),
      |kept AS (SELECT cum.et, cum.n, bounds.v_lo, bounds.v_hi, cum.v,
      |    cum.c,
      |    cum.c
      |      - greatest(least(cum.n // 20 - (cum.cum - cum.c), cum.c), 0)
      |      - greatest(least(cum.n // 20 - (cum.n - cum.cum), cum.c), 0)
      |      AS kc
      |  FROM cum JOIN bounds ON cum.et = bounds.et)
      |SELECT et AS event_type, CAST(n AS BIGINT) AS n,
      |  CAST(v_lo AS BIGINT) AS v_lo, CAST(v_hi AS BIGINT) AS v_hi,
      |  CAST(sum(c * least(greatest(v, v_lo), v_hi)) AS BIGINT)
      |    AS winsor_sum_e2,
      |  CAST(sum(kc * v) AS BIGINT) AS trim_sum_e2,
      |  CAST(n - 2 * (n // 20) AS BIGINT) AS trim_n,
      |  CAST(round(CAST(sum(c * least(greatest(v, v_lo), v_hi))
      |      AS DOUBLE) / CAST(n AS DOUBLE) * 10000.0) AS BIGINT)
      |    AS winsor_mean_e6,
      |  CAST(round(CAST(sum(kc * v) AS DOUBLE)
      |      / CAST(n - 2 * (n // 20) AS DOUBLE) * 10000.0) AS BIGINT)
      |    AS trim_mean_e6
      |FROM kept
      |GROUP BY et, n, v_lo, v_hi
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q381 — corpus-mix token-budget allocation by largest remainder
  // (Hamilton's method — the exact-integer way to turn mixture
  // weights into per-source token quotas that sum EXACTLY to the
  // budget, where naive per-source rounding drifts by ±sources/2):
  // per-source token counts, weights ∝ √tokens (the sub-linear
  // upsampling a corpus mixer applies to small high-quality sources;
  // IEEE sqrt is correctly rounded, so round(√t·10³) is bit-identical
  // cross-engine), floor quotas B·w÷W in decimal(38,0), and the
  // leftover R = B − Σfloor goes to the R largest remainders
  // (source-name tiebreak) via a tiny self-join rank on the
  // source-grain table — no window at all. Gate-checkable invariant:
  // Σ quota = B exactly.
  // ---------------------------------------------------------------------
  private def q381(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("source"),
        size(Text.words(col("text"))).cast("long").as("tk"))
      .groupBy(col("source")).agg(sum(col("tk")).as("tokens"))
      .withColumn("w",
        round(sqrt(col("tokens").cast("double")) * 1000.0).cast("long"))
    val tot = toks.agg((sum(col("tokens")).cast(dec) / lit(2))
        .cast("long").as("b"), sum(col("w")).as("bigw"))
    val based = toks.crossJoin(broadcast(tot))
      .withColumn("f",
        expr(s"CAST(CAST(b AS $dec) * CAST(w AS $dec) div bigw AS BIGINT)"))
      .withColumn("rem",
        (col("b").cast(dec) * col("w").cast(dec)
          - col("f").cast(dec) * col("bigw").cast(dec)).cast("long"))
    val spare = based.agg((max(col("b")) - sum(col("f"))).as("r"))
    val rk = based.as("x").join(
        based.select(col("rem").as("rem2"), col("source").as("source2"))
          .as("y"),
        col("y.rem2") > col("x.rem") ||
          (col("y.rem2") === col("x.rem") &&
            col("y.source2") < col("x.source")), "left")
      .groupBy(col("x.source").as("source"), col("x.tokens").as("tokens"),
        col("x.w").as("w"), col("x.f").as("f"))
      .agg((count(col("y.source2")) + lit(1L)).as("rnk"))
    rk.crossJoin(broadcast(spare))
      .select(col("source"), col("tokens"), col("w").as("weight_e3"),
        (col("f") + when(col("rnk") <= col("r"), 1L).otherwise(0L))
          .as("quota"))
      .orderBy(col("source"))
  }

  private val q381Sql =
    """WITH toks AS (
      |  SELECT source, CAST(sum(len(list_filter(string_split(text, ' '),
      |      w -> length(w) > 0))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source),
      |ws AS (SELECT source, tokens,
      |    CAST(round(sqrt(CAST(tokens AS DOUBLE)) * 1000.0) AS BIGINT)
      |      AS w
      |  FROM toks),
      |tot AS (SELECT CAST(sum(tokens) // 2 AS BIGINT) AS b,
      |    CAST(sum(w) AS BIGINT) AS bigw FROM ws),
      |based AS (
      |  SELECT source, tokens, w,
      |    CAST(CAST(b AS HUGEINT) * w // bigw AS BIGINT) AS f,
      |    CAST(CAST(b AS HUGEINT) * w % bigw AS BIGINT) AS rem,
      |    b, bigw
      |  FROM ws, tot),
      |spare AS (SELECT max(b) - sum(f) AS r FROM based),
      |rk AS (
      |  SELECT x.source, x.tokens, x.w, x.f,
      |    1 + count(y.source) AS rnk
      |  FROM based x LEFT JOIN based y
      |    ON y.rem > x.rem OR (y.rem = x.rem AND y.source < x.source)
      |  GROUP BY x.source, x.tokens, x.w, x.f)
      |SELECT rk.source, rk.tokens, rk.w AS weight_e3,
      |  CAST(rk.f + CASE WHEN rk.rnk <= spare.r THEN 1 ELSE 0 END
      |    AS BIGINT) AS quota
      |FROM rk, spare
      |ORDER BY rk.source""".stripMargin

  // ---------------------------------------------------------------------
  // q382 — Hill tail-index of the part-degree distribution (how
  // heavy-tailed is the purchase graph — the number a skew-aware
  // planner reads before choosing salting factors): α̂ = k / Σ_{i≤k}
  // ln(d_(i)/d_(k+1)) over the k=100 largest degrees. The degree
  // grain aggregates once (map-side combinable); the top k+1 is a
  // bounded TakeOrderedAndProject, never a global sort; the reference
  // element d_(k+1) is the order-min of the selected set (full
  // (deg, key) tiebreak). Each ln is e9-rounded AT THE ROW (the q375
  // discipline) and summed as integers; α̂ is one final division.
  // ---------------------------------------------------------------------
  private def q382(s: SparkSession, dir: String): DataFrame = {
    val k = 100
    val degs = t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("deg"))
    val top = degs.orderBy(col("deg").desc, col("pk").asc).limit(k + 1)
    val ref = top.agg(min(struct(col("deg"), (-col("pk")).as("npk")))
      .as("rf"))
      .select(col("rf.deg").as("rd"), (-col("rf.npk")).as("rpk"))
    val terms = top.crossJoin(broadcast(ref))
      .filter(!(col("deg") === col("rd") && col("pk") === col("rpk")))
      .select(col("rd"),
        round(log(col("deg").cast("double") / col("rd").cast("double"))
          * 1000000000.0).cast("long").as("t_e9"))
    terms.groupBy(col("rd"))
      .agg(count(lit(1)).as("k"), sum(col("t_e9")).as("sum_ln_e9"))
      .select(col("k"), col("rd").as("d_ref"), col("sum_ln_e9"),
        round(col("k").cast("double") * 1.0e15 /
          col("sum_ln_e9").cast("double")).cast("long").as("alpha_e6"))
      .orderBy(col("k"))
  }

  private val q382Sql =
    """WITH degs AS (
      |  SELECT l_partkey AS pk, count(*) AS deg
      |  FROM lineitem GROUP BY l_partkey),
      |top AS (SELECT pk, deg FROM degs
      |        ORDER BY deg DESC, pk ASC LIMIT 101),
      |ref AS (SELECT deg AS rd, pk AS rpk FROM top
      |        ORDER BY deg ASC, pk DESC LIMIT 1),
      |terms AS (
      |  SELECT ref.rd,
      |    CAST(round(ln(CAST(top.deg AS DOUBLE) / CAST(ref.rd AS DOUBLE))
      |      * 1000000000.0) AS BIGINT) AS t_e9
      |  FROM top, ref
      |  WHERE NOT (top.deg = ref.rd AND top.pk = ref.rpk))
      |SELECT count(*) AS k, CAST(rd AS BIGINT) AS d_ref,
      |  CAST(sum(t_e9) AS BIGINT) AS sum_ln_e9,
      |  CAST(round(CAST(count(*) AS DOUBLE) * 1.0e15
      |    / CAST(sum(t_e9) AS DOUBLE)) AS BIGINT) AS alpha_e6
      |FROM terms
      |GROUP BY rd
      |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------------
  // q383 — χ² test of independence, event type × hour-of-day (does
  // traffic composition shift across the day? — the contingency twin
  // of q375's MI on a different margin): χ² = Σ (n·O − r·s)²/(n·r·s)
  // — the cross-multiplied form with ZERO divisions until each cell's
  // single e6-rounded term. (n·O − r·s) squares in decimal(38,0)
  // (HUGEINT in the oracle) before the ONE double conversion per
  // cell, and the total is an integer sum over the ≤ types×24 cell
  // grain. Absent cells (O=0) still contribute r·s/n — the LEFT join
  // from the full margin cross keeps them.
  // ---------------------------------------------------------------------
  private def q383(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type").as("x"), hour(col("ts_s")).cast("long")
        .as("h"))
    val cells = e.groupBy(col("x"), col("h")).agg(count(lit(1)).as("o"))
    val rx = cells.groupBy(col("x")).agg(sum(col("o")).as("r"))
    val sy = cells.groupBy(col("h")).agg(sum(col("o")).as("s"))
    val n = cells.agg(sum(col("o")).as("n"))
    val full = rx.crossJoin(broadcast(sy))
      .join(cells, Seq("x", "h"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    full.crossJoin(broadcast(n))
      .select(col("n"),
        round({
          val d = (col("n").cast(dec) * col("o").cast(dec)
            - col("r").cast(dec) * col("s").cast(dec))
          (d * d).cast("double") /
            (col("n").cast(dec) * col("r").cast(dec) * col("s").cast(dec))
              .cast("double") * 1000000.0
        }).cast("long").as("term_e6"),
        col("x"), col("h"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("n_cells"),
        ((countDistinct(col("x")) - 1) * (countDistinct(col("h")) - 1))
          .as("dof"),
        sum(col("term_e6")).as("chi2_e6"))
      .select(col("n").as("n_events"), col("n_cells"), col("dof"),
        col("chi2_e6"))
      .orderBy(col("n_events"))
  }

  private val q383Sql =
    """WITH e AS (
      |  SELECT event_type AS x,
      |    CAST(extract(hour FROM ts) AS BIGINT) AS h
      |  FROM events),
      |cells AS (SELECT x, h, count(*) AS o FROM e GROUP BY x, h),
      |rx AS (SELECT x, sum(o) AS r FROM cells GROUP BY x),
      |sy AS (SELECT h, sum(o) AS s FROM cells GROUP BY h),
      |n AS (SELECT sum(o) AS n FROM cells),
      |full_g AS (
      |  SELECT rx.x, sy.h, rx.r, sy.s, coalesce(cells.o, 0) AS o
      |  FROM rx CROSS JOIN sy
      |  LEFT JOIN cells ON cells.x = rx.x AND cells.h = sy.h),
      |terms AS (
      |  SELECT n.n,
      |    CAST(round(
      |      CAST((CAST(n.n AS HUGEINT) * o - CAST(r AS HUGEINT) * s)
      |        * (CAST(n.n AS HUGEINT) * o - CAST(r AS HUGEINT) * s)
      |        AS DOUBLE)
      |      / CAST(CAST(n.n AS HUGEINT) * r * s AS DOUBLE)
      |      * 1000000.0) AS BIGINT) AS term_e6,
      |    full_g.x, full_g.h
      |  FROM full_g, n)
      |SELECT CAST(n AS BIGINT) AS n_events, count(*) AS n_cells,
      |  CAST((count(DISTINCT x) - 1) * (count(DISTINCT h) - 1) AS BIGINT)
      |    AS dof,
      |  CAST(sum(term_e6) AS BIGINT) AS chi2_e6
      |FROM terms
      |GROUP BY n
      |ORDER BY n_events""".stripMargin

  // ---------------------------------------------------------------------
  // q384 — Jensen–Shannon divergence between the click and view value
  // distributions (the symmetric, bounded drift metric a data
  // platform alerts on — KL blows up on any bucket one side lacks;
  // JS never does): JS = ½Σp·ln(p/m) + ½Σq·ln(q/m) with m = (p+q)/2.
  // Each bucket's two terms use the all-integer ratio forms
  // p/m = 2·a·nB/(a·nB + b·nA) (products in decimal(38,0)/HUGEINT),
  // e9-rounded AT THE BUCKET (q375 discipline), integer-summed over
  // the 10-bucket grain; the ÷2 is the one final rounding. Empty-
  // side buckets contribute 0 via the p>0 guard (lim p·ln p = 0).
  // ---------------------------------------------------------------------
  private def q384(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .select(
        least(expr("CAST(round(value * 100) AS BIGINT) div 5000"),
          lit(9L)).as("bkt"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("a"),
        when(col("event_type") === "view", 1L).otherwise(0L).as("b"))
    val g = e.groupBy(col("bkt"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
    val tot = g.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    def term(cnt: Column, nSelf: Column, oth: Column,
             nOth: Column): Column = {
      val num = lit(2L).cast(dec) * cnt.cast(dec) * nOth.cast(dec)
      val den = cnt.cast(dec) * nOth.cast(dec) +
        oth.cast(dec) * nSelf.cast(dec)
      when(cnt > 0L,
        round(cnt.cast("double") / nSelf.cast("double") *
          log(num.cast("double") / den.cast("double")) * 1000000000.0)
          .cast("long")).otherwise(0L)
    }
    g.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        term(col("ca"), col("na"), col("cb"), col("nb")).as("tp"),
        term(col("cb"), col("nb"), col("ca"), col("na")).as("tq"))
      .groupBy(col("na"), col("nb"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("tp")).as("sum_p_e9"), sum(col("tq")).as("sum_q_e9"))
      .select(col("na").as("n_click"), col("nb").as("n_view"),
        col("n_buckets"), col("sum_p_e9"), col("sum_q_e9"),
        round((col("sum_p_e9") + col("sum_q_e9")).cast("double") / 2.0)
          .cast("long").as("js_e9"))
      .orderBy(col("n_click"))
  }

  private val q384Sql =
    """WITH e AS (
      |  SELECT least(CAST(round(value * 100) AS BIGINT) // 5000, 9)
      |      AS bkt,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b
      |  FROM events WHERE event_type IN ('click', 'view')),
      |g AS (SELECT bkt, sum(a) AS ca, sum(b) AS cb FROM e GROUP BY bkt),
      |tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM g),
      |terms AS (
      |  SELECT tot.na, tot.nb,
      |    CASE WHEN ca > 0 THEN CAST(round(
      |      CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) *
      |      ln(CAST(2 * CAST(ca AS HUGEINT) * nb AS DOUBLE) /
      |         CAST(CAST(ca AS HUGEINT) * nb
      |              + CAST(cb AS HUGEINT) * na AS DOUBLE))
      |      * 1000000000.0) AS BIGINT) ELSE 0 END AS tp,
      |    CASE WHEN cb > 0 THEN CAST(round(
      |      CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) *
      |      ln(CAST(2 * CAST(cb AS HUGEINT) * na AS DOUBLE) /
      |         CAST(CAST(cb AS HUGEINT) * na
      |              + CAST(ca AS HUGEINT) * nb AS DOUBLE))
      |      * 1000000000.0) AS BIGINT) ELSE 0 END AS tq
      |  FROM g, tot)
      |SELECT CAST(na AS BIGINT) AS n_click, CAST(nb AS BIGINT) AS n_view,
      |  count(*) AS n_buckets,
      |  CAST(sum(tp) AS BIGINT) AS sum_p_e9,
      |  CAST(sum(tq) AS BIGINT) AS sum_q_e9,
      |  CAST(round(CAST(sum(tp) + sum(tq) AS DOUBLE) / 2.0) AS BIGINT)
      |    AS js_e9
      |FROM terms
      |GROUP BY na, nb
      |ORDER BY n_click""".stripMargin

  // ---------------------------------------------------------------------
  // q385 — McNemar's paired test between two deterministic
  // "classifiers" of the purchase event (a value-threshold model and
  // a cents-parity model — the paired-model comparison an eval
  // pipeline runs before swapping models; accuracy deltas without the
  // pairing are confounded by example difficulty): only the
  // DISCORDANT pairs matter — b = A right & B wrong, c = the
  // reverse; χ² = (b−c)²/(b+c), continuity-corrected
  // (|b−c|−1)²/(b+c). Four exact counts from one corpus scan, two
  // e6-rounded readout divisions.
  // ---------------------------------------------------------------------
  private def q385(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select((col("event_type") === "purchase").as("y"),
        (col("value") >= 50.0).as("pa"),
        (pmod(round(col("value") * 100).cast("long"), lit(100L)) >= 50L)
          .as("pb"))
      .select((col("pa") === col("y")).as("okA"),
        (col("pb") === col("y")).as("okB"))
    // b+c = 0 (the two classifiers never disagree) is a legal
    // degenerate input — the statistic is conventionally 0 (no
    // evidence of a difference), and an unguarded 0/0 would diverge
    // across engines (NaN cast vs ANSI error). Squares run in
    // decimal(38,0) — b−c is corpus-sized, so the long multiply
    // would overflow past ~3·10⁹ discordant rows.
    e.agg(count(lit(1)).as("n_events"),
        sum(when(col("okA") && !col("okB"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("okA") && col("okB"), 1L).otherwise(0L)).as("c"))
      .select(col("n_events"), col("b"), col("c"),
        when(col("b") + col("c") > 0,
          round(((col("b") - col("c")).cast(dec)
            * (col("b") - col("c")).cast(dec))
            .cast("double") / (col("b") + col("c")).cast("double")
            * 1000000.0).cast("long")).otherwise(lit(0L)).as("chi2_e6"),
        when(col("b") + col("c") > 0,
          round({
            val d = greatest(abs(col("b") - col("c")) - lit(1L), lit(0L))
              .cast(dec)
            (d * d).cast("double") / (col("b") + col("c")).cast("double") *
              1000000.0
          }).cast("long")).otherwise(lit(0L)).as("chi2_cc_e6"))
      .orderBy(col("n_events"))
  }

  private val q385Sql =
    """WITH e AS (
      |  SELECT (event_type = 'purchase') AS y,
      |    (value >= 50.0) AS pa,
      |    (CAST(round(value * 100) AS BIGINT) % 100 >= 50) AS pb
      |  FROM events),
      |ok AS (SELECT (pa = y) AS oka, (pb = y) AS okb FROM e),
      |agg AS (SELECT count(*) AS n_events,
      |    CAST(sum(CASE WHEN oka AND NOT okb THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN NOT oka AND okb THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c
      |  FROM ok)
      |SELECT n_events, b, c,
      |  CASE WHEN b + c > 0 THEN CAST(round(
      |      CAST(CAST(b - c AS HUGEINT) * (b - c) AS DOUBLE)
      |      / CAST(b + c AS DOUBLE) * 1000000.0) AS BIGINT)
      |    ELSE 0 END AS chi2_e6,
      |  CASE WHEN b + c > 0 THEN CAST(round(
      |      CAST(CAST(greatest(abs(b - c) - 1, 0) AS HUGEINT)
      |           * greatest(abs(b - c) - 1, 0) AS DOUBLE)
      |      / CAST(b + c AS DOUBLE) * 1000000.0) AS BIGINT)
      |    ELSE 0 END AS chi2_cc_e6
      |FROM agg
      |ORDER BY n_events""".stripMargin

  // ---------------------------------------------------------------------
  // q386 — view→click→purchase funnel conversion per user (the
  // product-analytics staple): each user's events rank once by
  // (ts, event_id) — the per-user window grain that scales out — and
  // a step counts only if its FIRST occurrence comes strictly after
  // the previous step's first occurrence. Integer ranks make the
  // strict-order comparison exact on any engine; conversion rates
  // are e6-rounded single divisions.
  // ---------------------------------------------------------------------
  private def q386(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val ranked = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_s"),
        col("event_type"))
      .withColumn("r", row_number().over(w).cast("long"))
    val firsts = ranked.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("r"))).as("rv"),
        min(when(col("event_type") === "click", col("r"))).as("rc"),
        min(when(col("event_type") === "purchase", col("r"))).as("rp"))
    firsts.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("rv").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("rv").isNotNull && col("rc") > col("rv"), 1L)
          .otherwise(0L)).as("n_click"),
        sum(when(col("rv").isNotNull && col("rc") > col("rv") &&
          col("rp") > col("rc"), 1L).otherwise(0L)).as("n_purchase"))
      .select(col("n_users"), col("n_view"), col("n_click"),
        col("n_purchase"),
        round(col("n_click").cast("double") / col("n_view").cast("double")
          * 1000000.0).cast("long").as("view_to_click_e6"),
        round(col("n_purchase").cast("double") /
          col("n_click").cast("double") * 1000000.0).cast("long")
          .as("click_to_purchase_e6"))
      .orderBy(col("n_users"))
  }

  private val q386Sql =
    """WITH ranked AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY date_trunc('second', ts), event_id) AS r
      |  FROM events),
      |firsts AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN r END) AS rv,
      |    min(CASE WHEN event_type = 'click' THEN r END) AS rc,
      |    min(CASE WHEN event_type = 'purchase' THEN r END) AS rp
      |  FROM ranked GROUP BY user_id),
      |agg AS (
      |  SELECT count(*) AS n_users,
      |    sum(CASE WHEN rv IS NOT NULL THEN 1 ELSE 0 END) AS n_view,
      |    sum(CASE WHEN rv IS NOT NULL AND rc > rv THEN 1 ELSE 0 END)
      |      AS n_click,
      |    sum(CASE WHEN rv IS NOT NULL AND rc > rv AND rp > rc
      |      THEN 1 ELSE 0 END) AS n_purchase
      |  FROM firsts)
      |SELECT CAST(n_users AS BIGINT) AS n_users,
      |  CAST(n_view AS BIGINT) AS n_view,
      |  CAST(n_click AS BIGINT) AS n_click,
      |  CAST(n_purchase AS BIGINT) AS n_purchase,
      |  CAST(round(CAST(n_click AS DOUBLE) / CAST(n_view AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS view_to_click_e6,
      |  CAST(round(CAST(n_purchase AS DOUBLE) / CAST(n_click AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS click_to_purchase_e6
      |FROM agg
      |ORDER BY n_users""".stripMargin

  // ---------------------------------------------------------------------
  // q387 — hash-partition load-imbalance audit (the number a planner
  // reads before picking partition counts and salting factors):
  // lineitem keys bucket by the portable 60-bit hash mod 256 and the
  // audit reports the max/min/empty-bucket profile plus the
  // max-to-mean skew ratio (cross-multiplied: max·P/n, ONE e6
  // division). The bucket grain is 256 rows at any corpus size; a
  // LEFT join from the full bucket dimension keeps empty buckets
  // visible (an empty bucket is exactly what the audit must see).
  // ---------------------------------------------------------------------
  private def q387(s: SparkSession, dir: String): DataFrame = {
    val p = 256L
    val h = graft.functions.PortableHash
    val loads = t(s, dir, "lineitem")
      .select(pmod(h.hash60(concat(lit("pt:"),
        col("l_partkey").cast("string"))), lit(p)).as("bkt"))
      .groupBy(col("bkt")).agg(count(lit(1)).as("c"))
    val dim = s.range(p).select(col("id").as("bkt"))
    dim.join(loads, Seq("bkt"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .agg(sum(col("c")).as("n_rows"),
        max(col("c")).as("max_load"), min(col("c")).as("min_load"),
        sum(when(col("c") === 0L, 1L).otherwise(0L)).as("empty_buckets"))
      .select(lit(p).as("p"), col("n_rows"), col("max_load"),
        col("min_load"), col("empty_buckets"),
        round(col("max_load").cast("double") * p.toDouble /
          col("n_rows").cast("double") * 1000000.0).cast("long")
          .as("skew_e6"))
      .orderBy(col("p"))
  }

  private val q387Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "'pt:' || CAST(l_partkey AS VARCHAR)")
    s"""WITH loads AS (
       |  SELECT $h % 256 AS bkt, count(*) AS c
       |  FROM lineitem GROUP BY 1),
       |dim AS (SELECT unnest(range(256)) AS bkt),
       |full_b AS (
       |  SELECT dim.bkt, coalesce(loads.c, 0) AS c
       |  FROM dim LEFT JOIN loads ON dim.bkt = loads.bkt)
       |SELECT CAST(256 AS BIGINT) AS p,
       |  CAST(sum(c) AS BIGINT) AS n_rows,
       |  CAST(max(c) AS BIGINT) AS max_load,
       |  CAST(min(c) AS BIGINT) AS min_load,
       |  CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS empty_buckets,
       |  CAST(round(CAST(max(c) AS DOUBLE) * 256.0
       |    / CAST(sum(c) AS DOUBLE) * 1000000.0) AS BIGINT) AS skew_e6
       |FROM full_b
       |ORDER BY p""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q388 — Good–Turing unseen-mass estimate over document 3-gram
  // shingles (the tokenizer/vocab-planning number: what probability
  // mass do shingles we have NEVER seen carry? ≈ f₁/N, the Turing
  // estimator): frequency-of-frequencies over the shingle grain —
  // f₁ singletons, f₂ doubletons, vocabulary size, total occurrences
  // — all exact integer counts; the estimate is ONE e6 division.
  // ---------------------------------------------------------------------
  private def q388(s: SparkSession, dir: String): DataFrame = {
    val sh = graft.operators.Dedup.shingleTable(
      t(s, dir, "documents"), "doc_id", "text", 3)
    val freq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("f"))
    freq.agg(count(lit(1)).as("vocab"), sum(col("f")).as("n_occ"),
        sum(when(col("f") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("f") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("vocab"), col("n_occ"), col("f1"), col("f2"),
        round(col("f1").cast("double") / col("n_occ").cast("double")
          * 1000000.0).cast("long").as("unseen_mass_e6"))
      .orderBy(col("vocab"))
  }

  private val q388Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS w
      |  FROM documents),
      |shing AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(len(w) - 2),
      |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
      |  FROM toks WHERE len(w) >= 3),
      |freq AS (SELECT shingle, count(*) AS f FROM shing GROUP BY shingle)
      |SELECT count(*) AS vocab,
      |  CAST(sum(f) AS BIGINT) AS n_occ,
      |  CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |  CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
      |  CAST(round(CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(f) AS DOUBLE) * 1000000.0) AS BIGINT)
      |    AS unseen_mass_e6
      |FROM freq
      |ORDER BY vocab""".stripMargin

  // ---------------------------------------------------------------------
  // q389 — Zipf slope of the word-frequency distribution by OLS on
  // (ln rank, ln freq) over the top-1000 words (the corpus-shape
  // audit: natural text sits near −1; templated/synthetic corpora
  // don't): the word grain aggregates once; the top-k is a bounded
  // TakeOrderedAndProject; ranks come from [[graft.operators.Curate]]
  // globalRank on the 1000-row survivor set (no unpartitioned
  // window); each ln is e9-rounded AT THE ROW (q375 discipline);
  // Σx, Σy, Σxy, Σx² accumulate in decimal(38,0) and the slope is
  // ONE final division.
  // ---------------------------------------------------------------------
  private def q389(s: SparkSession, dir: String): DataFrame = {
    val k = 1000
    val words = t(s, dir, "documents")
      .select(explode(Text.words(col("text"))).as("wd"))
      .groupBy(col("wd")).agg(count(lit(1)).as("f"))
    val top = words.orderBy(col("f").desc, col("wd").asc).limit(k)
    val ranked = graft.operators.Curate.globalRank(top,
      Seq(-col("f"), col("wd")), "rnk")
    val terms = ranked.select(
      round(log(col("rnk").cast("double")) * 1000000000.0).cast("long")
        .as("x_e9"),
      round(log(col("f").cast("double")) * 1000000000.0).cast("long")
        .as("y_e9"))
    terms.agg(count(lit(1)).as("n"),
        sum(col("x_e9").cast(dec)).as("sx"),
        sum(col("y_e9").cast(dec)).as("sy"),
        sum(col("x_e9").cast(dec) * col("y_e9").cast(dec)).as("sxy"),
        sum(col("x_e9").cast(dec) * col("x_e9").cast(dec)).as("sxx"))
      .select(col("n").as("n_words"),
        round((col("n").cast(dec) * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
          (col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))
            .cast("double") * 1000000.0).cast("long").as("slope_e6"))
      .orderBy(col("n_words"))
  }

  private val q389Sql =
    """WITH words AS (
      |  SELECT unnest(list_filter(string_split(text, ' '),
      |    w -> length(w) > 0)) AS wd
      |  FROM documents),
      |freq AS (SELECT wd, count(*) AS f FROM words GROUP BY wd),
      |top AS (SELECT wd, f FROM freq ORDER BY f DESC, wd ASC LIMIT 1000),
      |ranked AS (SELECT f,
      |    row_number() OVER (ORDER BY f DESC, wd ASC) AS rnk
      |  FROM top),
      |terms AS (
      |  SELECT CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000000000.0)
      |      AS BIGINT) AS x_e9,
      |    CAST(round(ln(CAST(f AS DOUBLE)) * 1000000000.0) AS BIGINT)
      |      AS y_e9
      |  FROM ranked),
      |sums AS (
      |  SELECT count(*) AS n,
      |    sum(CAST(x_e9 AS HUGEINT)) AS sx,
      |    sum(CAST(y_e9 AS HUGEINT)) AS sy,
      |    sum(CAST(x_e9 AS HUGEINT) * y_e9) AS sxy,
      |    sum(CAST(x_e9 AS HUGEINT) * x_e9) AS sxx
      |  FROM terms)
      |SELECT CAST(n AS BIGINT) AS n_words,
      |  CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0) AS BIGINT)
      |    AS slope_e6
      |FROM sums
      |ORDER BY n_words""".stripMargin

  // ---------------------------------------------------------------------
  // q390 — Fano factor (variance-to-mean ratio of per-hour event
  // counts) per event type — the burstiness audit that separates
  // organic traffic (≈1, Poisson) from bots and batch replays (≫1):
  // hour-bucket counts are the grain; the ratio uses the
  // cross-multiplied integer form (n·Σx² − (Σx)²)/(n·Σx) with
  // products in decimal(38,0)/HUGEINT — zero divisions until the ONE
  // e6-rounded readout.
  // ---------------------------------------------------------------------
  private def q390(s: SparkSession, dir: String): DataFrame = {
    val hb = Tables.eventsSec(s, dir)
      .select(col("event_type"), date_trunc("hour", col("ts_s")).as("hb"))
      .groupBy(col("event_type"), col("hb")).agg(count(lit(1)).as("x"))
    hb.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("x")).as("n_events"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"))
      .select(col("event_type"), col("n_hours"), col("n_events"),
        round((col("n_hours").cast(dec) * col("sxx")
          - col("n_events").cast(dec) * col("n_events").cast(dec))
            .cast("double") /
          (col("n_hours").cast(dec) * col("n_events").cast(dec))
            .cast("double") * 1000000.0).cast("long").as("fano_e6"))
      .orderBy(col("event_type"))
  }

  private val q390Sql =
    """WITH hb AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hb, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |agg AS (
      |  SELECT event_type, count(*) AS n_hours,
      |    CAST(sum(x) AS HUGEINT) AS n_events,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx
      |  FROM hb GROUP BY event_type)
      |SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
      |  CAST(n_events AS BIGINT) AS n_events,
      |  CAST(round(CAST(n_hours * sxx - n_events * n_events AS DOUBLE)
      |    / CAST(n_hours * n_events AS DOUBLE) * 1000000.0) AS BIGINT)
      |    AS fano_e6
      |FROM agg
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q391 — Wilson score interval for per-type conversion rates (the
  // experimentation-tier confidence bound that stays sane at small n
  // and extreme p, unlike the normal approximation): success =
  // value ≥ 90. The bound is ONE fixed IEEE expression from the two
  // exact integers (k, n) with z = 1.96 as an offline literal — IEEE
  // sqrt is correctly rounded and every other op is identical on
  // both engines, so the e6-rounded endpoints are bit-identical
  // without any intermediate rounding.
  // ---------------------------------------------------------------------
  private def q391(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type"),
        when(col("value") >= 90.0, 1L).otherwise(0L).as("succ"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("succ")).as("k"))
    val nD = col("n").cast("double")
    val pD = col("k").cast("double") / nD
    val z = lit(1.96)
    val z2 = z * z
    val center = pD + z2 / (lit(2.0) * nD)
    val half = z * sqrt(pD * (lit(1.0) - pD) / nD +
      z2 / (lit(4.0) * nD * nD))
    val denom = lit(1.0) + z2 / nD
    e.select(col("event_type"), col("n"), col("k"),
        round((center - half) / denom * 1000000.0).cast("long")
          .as("wilson_lo_e6"),
        round((center + half) / denom * 1000000.0).cast("long")
          .as("wilson_hi_e6"))
      .orderBy(col("event_type"))
  }

  private val q391Sql =
    """WITH agg AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CASE WHEN value >= 90.0 THEN 1 ELSE 0 END) AS k
      |  FROM events GROUP BY event_type),
      |x AS (
      |  SELECT event_type, n, k,
      |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
      |    CAST(n AS DOUBLE) AS nd
      |  FROM agg)
      |SELECT event_type, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
      |  CAST(round((p + 1.96 * 1.96 / (2.0 * nd)
      |      - 1.96 * sqrt(p * (1.0 - p) / nd
      |        + 1.96 * 1.96 / (4.0 * nd * nd)))
      |    / (1.0 + 1.96 * 1.96 / nd) * 1000000.0) AS BIGINT)
      |    AS wilson_lo_e6,
      |  CAST(round((p + 1.96 * 1.96 / (2.0 * nd)
      |      + 1.96 * sqrt(p * (1.0 - p) / nd
      |        + 1.96 * 1.96 / (4.0 * nd * nd)))
      |    / (1.0 + 1.96 * 1.96 / nd) * 1000000.0) AS BIGINT)
      |    AS wilson_hi_e6
      |FROM x
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q392 — event-type transition entropy per user stream (how
  // predictable is the next event given the current one? — the
  // sequence-model audit that catches replayed/scripted traffic):
  // transitions come from one LAG over the per-user window; the
  // 5×5 transition grain carries exact counts; conditional entropy
  // H(next|cur) = Σ c/N·ln(r_cur/c) and unigram entropy
  // H(next) = Σ s/N·ln(N/s) use e9-rounded per-cell terms (q375
  // discipline) — their gap is the information LAG carries.
  // ---------------------------------------------------------------------
  private def q392(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val trans = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("ts_s"), col("event_id"),
        col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("cur"))
      .agg(count(lit(1)).as("c"))
    val rPrev = trans.groupBy(col("prev")).agg(sum(col("c")).as("r"))
    val sCur = trans.groupBy(col("cur")).agg(sum(col("c")).as("s"))
    val n = trans.agg(sum(col("c")).as("n"))
    val cond = trans.join(broadcast(rPrev), "prev")
      .crossJoin(broadcast(n))
      .select(col("n"),
        round(col("c").cast("double") / col("n").cast("double") *
          log(col("r").cast("double") / col("c").cast("double"))
          * 1000000000.0).cast("long").as("t_e9"))
      .groupBy(col("n")).agg(sum(col("t_e9")).as("h_cond_e9"))
    val uni = sCur.crossJoin(broadcast(n))
      .select(col("n"),
        round(col("s").cast("double") / col("n").cast("double") *
          log(col("n").cast("double") / col("s").cast("double"))
          * 1000000000.0).cast("long").as("t_e9"))
      .groupBy(col("n")).agg(sum(col("t_e9")).as("h_uni_e9"))
    cond.join(uni, "n")
      .select(col("n").as("n_transitions"), col("h_cond_e9"),
        col("h_uni_e9"), (col("h_uni_e9") - col("h_cond_e9"))
          .as("info_gain_e9"))
      .orderBy(col("n_transitions"))
  }

  private val q392Sql =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY date_trunc('second', ts), event_id) AS prev
      |  FROM events),
      |trans AS (
      |  SELECT prev, event_type AS cur, count(*) AS c
      |  FROM seq WHERE prev IS NOT NULL GROUP BY prev, cur),
      |rp AS (SELECT prev, sum(c) AS r FROM trans GROUP BY prev),
      |sc AS (SELECT cur, sum(c) AS s FROM trans GROUP BY cur),
      |n AS (SELECT sum(c) AS n FROM trans),
      |cond AS (
      |  SELECT n.n, CAST(sum(CAST(round(
      |      CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE) *
      |      ln(CAST(r AS DOUBLE) / CAST(c AS DOUBLE))
      |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS h_cond_e9
      |  FROM trans JOIN rp USING (prev), n GROUP BY n.n),
      |uni AS (
      |  SELECT n.n, CAST(sum(CAST(round(
      |      CAST(s AS DOUBLE) / CAST(n.n AS DOUBLE) *
      |      ln(CAST(n.n AS DOUBLE) / CAST(s AS DOUBLE))
      |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS h_uni_e9
      |  FROM sc, n GROUP BY n.n)
      |SELECT CAST(cond.n AS BIGINT) AS n_transitions,
      |  cond.h_cond_e9, uni.h_uni_e9,
      |  CAST(uni.h_uni_e9 - cond.h_cond_e9 AS BIGINT) AS info_gain_e9
      |FROM cond JOIN uni ON cond.n = uni.n
      |ORDER BY n_transitions""".stripMargin

  // ---------------------------------------------------------------------
  // q393 — Fellegi–Sunter record-linkage scoring over blocked
  // candidate pairs (the probabilistic layer on top of q108's
  // blocking: per-field agreement weights ln(m/u), summed into a
  // match score, thresholded): pairs generate ONLY within the
  // (source, length-band) block with the chunk tier on (the r9-safe
  // blockedEditDistance DEFAULTS — this query deliberately calls the
  // no-argument form the library hands every caller); the field
  // comparisons (lang equality, length proximity, prefix edit
  // distance) are exact, and the weights are OFFLINE e6 literals
  // (ln(0.9/0.1)≈2.197, etc.) so the score is pure integer addition —
  // no transcendental evaluation anywhere at query time.
  // ---------------------------------------------------------------------
  private def q393(s: SparkSession, dir: String): DataFrame = {
    // agreement/disagreement weights, ln(m/u) and ln((1-m)/(1-u)) as
    // offline e6 literals: lang (m=.95,u=.5): +642e3/-2303e3;
    // length±10 (m=.9,u=.2): +1504e3/-2079e3; dist≤5 (m=.8,u=.05):
    // +2773e3/-1558e3
    val pairs = graft.operators.Dedup.blockedEditDistance(
      t(s, dir, "documents"), "doc_id", "text",
      Seq(col("source"), expr("n_chars div 25")),
      prefixLen = 40, maxDist = 1000000)
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val scored = pairs
      .join(docs.select(col("doc_id").as("id_a"), col("lang").as("la"),
        col("n_chars").as("ca")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("lang").as("lb"),
        col("n_chars").as("cb")), "id_b")
      .select(col("__bk0").as("source"),
        (when(col("la") === col("lb"), 642000L).otherwise(-2303000L) +
          when(abs(col("ca") - col("cb")) <= 10L, 1504000L)
            .otherwise(-2079000L) +
          when(col("dist") <= 5, 2773000L).otherwise(-1558000L))
          .as("score_e6"))
    scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("score_e6") >= 2000000L, 1L).otherwise(0L))
          .as("n_match"),
        min(col("score_e6")).as("min_score_e6"),
        max(col("score_e6")).as("max_score_e6"),
        sum(col("score_e6")).as("sum_score_e6"))
      .orderBy(col("source"))
  }

  private val q393Sql =
    """WITH d AS (
      |  SELECT doc_id, source, lang, n_chars, n_chars // 25 AS lb,
      |    substring(text, 1, 40) AS t
      |  FROM documents),
      |ch AS (
      |  SELECT *, (row_number() OVER (PARTITION BY source, lb
      |    ORDER BY t, doc_id) - 1) // 32 AS chunk
      |  FROM d),
      |pairs AS (
      |  SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
      |    levenshtein(a.t, b.t) AS dist,
      |    a.lang AS la, b.lang AS lb2, a.n_chars AS ca, b.n_chars AS cb
      |  FROM ch a JOIN ch b
      |    ON a.source = b.source AND a.lb = b.lb AND a.chunk = b.chunk
      |    AND a.doc_id < b.doc_id),
      |scored AS (
      |  SELECT source,
      |    (CASE WHEN la = lb2 THEN 642000 ELSE -2303000 END +
      |     CASE WHEN abs(ca - cb) <= 10 THEN 1504000 ELSE -2079000 END +
      |     CASE WHEN dist <= 5 THEN 2773000 ELSE -1558000 END)
      |      AS score_e6
      |  FROM pairs)
      |SELECT source, count(*) AS n_pairs,
      |  CAST(sum(CASE WHEN score_e6 >= 2000000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_match,
      |  CAST(min(score_e6) AS BIGINT) AS min_score_e6,
      |  CAST(max(score_e6) AS BIGINT) AS max_score_e6,
      |  CAST(sum(score_e6) AS BIGINT) AS sum_score_e6
      |FROM scored
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q394 — Horvitz–Thompson estimation under stratified deterministic
  // sampling (the survey-sampling identity a data platform uses to
  // estimate corpus totals from a cheap sample — and the gate proves
  // the estimator's arithmetic, not its luck, by comparing against
  // the exact total): per-type inclusion rates are e4 literals;
  // inclusion is a pure function of the event id through the portable
  // hash (reproducible sample, q71's discipline); the HT total
  // Σ_strata (Σ_sampled v)·10⁴/rate has ONE division per stratum,
  // e2-rounded. Relative error is the e6 readout.
  // ---------------------------------------------------------------------
  private def q394(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val rates = Map("click" -> 500L, "view" -> 200L, "error" -> 2500L,
      "purchase" -> 10000L, "signup" -> 5000L)
    val rateCol = rates.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col("event_type") === k, v).otherwise(acc) }
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("ve2"))
      .withColumn("rate_e4", rateCol)
      .withColumn("in_sample",
        pmod(h.hash60(concat(lit("ht:"), col("event_id").cast("string"))),
          lit(10000L)) < col("rate_e4"))
    e.groupBy(col("event_type"), col("rate_e4"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled"),
        sum(col("ve2")).as("true_sum_e2"),
        sum(when(col("in_sample"), col("ve2")).otherwise(0L))
          .as("samp_sum_e2"))
      .select(col("event_type"), col("rate_e4"), col("n"),
        col("n_sampled"), col("true_sum_e2"),
        round(col("samp_sum_e2").cast("double") * 10000.0 /
          col("rate_e4").cast("double")).cast("long").as("ht_est_e2"),
        round((round(col("samp_sum_e2").cast("double") * 10000.0 /
          col("rate_e4").cast("double")) - col("true_sum_e2")
            .cast("double")) / col("true_sum_e2").cast("double")
          * 1000000.0).cast("long").as("rel_err_e6"))
      .orderBy(col("event_type"))
  }

  private val q394Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "'ht:' || CAST(event_id AS VARCHAR)")
    s"""WITH e AS (
       |  SELECT event_type, event_id,
       |    CAST(round(value * 100) AS BIGINT) AS ve2,
       |    CASE event_type WHEN 'click' THEN 500 WHEN 'view' THEN 200
       |      WHEN 'error' THEN 2500 WHEN 'purchase' THEN 10000
       |      WHEN 'signup' THEN 5000 ELSE 0 END AS rate_e4,
       |    ($h % 10000) AS hv
       |  FROM events),
       |agg AS (
       |  SELECT event_type, rate_e4, count(*) AS n,
       |    sum(CASE WHEN hv < rate_e4 THEN 1 ELSE 0 END) AS n_sampled,
       |    sum(ve2) AS true_sum_e2,
       |    sum(CASE WHEN hv < rate_e4 THEN ve2 ELSE 0 END) AS samp_sum_e2
       |  FROM e GROUP BY event_type, rate_e4)
       |SELECT event_type, CAST(rate_e4 AS BIGINT) AS rate_e4,
       |  CAST(n AS BIGINT) AS n, CAST(n_sampled AS BIGINT) AS n_sampled,
       |  CAST(true_sum_e2 AS BIGINT) AS true_sum_e2,
       |  CAST(round(CAST(samp_sum_e2 AS DOUBLE) * 10000.0
       |    / CAST(rate_e4 AS DOUBLE)) AS BIGINT) AS ht_est_e2,
       |  CAST(round((round(CAST(samp_sum_e2 AS DOUBLE) * 10000.0
       |      / CAST(rate_e4 AS DOUBLE)) - CAST(true_sum_e2 AS DOUBLE))
       |    / CAST(true_sum_e2 AS DOUBLE) * 1000000.0) AS BIGINT)
       |    AS rel_err_e6
       |FROM agg
       |ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q395 — Lincoln–Petersen capture–recapture estimate of the
  // near-duplicate pair population (how complete is the dedup pass? —
  // estimated from two INDEPENDENT LSH band families: catch n₁ pairs
  // with bands 0–3, n₂ with bands 4–7, m in both ⇒ N̂ = n₁·n₂/m, the
  // mark-recapture identity): candidate pairs per family come from
  // the shared portable-minhash signature table banded two ways; the
  // estimate and the per-family recall readouts are single e-rounded
  // divisions from exact counts. The full pair truth never enters —
  // that is the point of the estimator.
  // ---------------------------------------------------------------------
  private def q395(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash
    val d = t(s, dir, "documents")
    val sh = graft.operators.Dedup.shingleTablePortable(
      d, "doc_id", "text", 3).select("id", "sh")
    val sig = graft.operators.Dedup.minhashSignaturesPortable(sh, 16)
    def bandPairs(b0: Int, b1: Int): DataFrame = {
      val bandStructs = (b0 until b1).map { b =>
        val ms = (b * 2 until (b + 1) * 2).map(h => col(s"m$h"))
        struct(lit(b).as("band"), PortableHash.bandBucket(b, ms)
          .as("bucket"))
      }
      val buckets = sig.select(col("id"),
          explode(array(bandStructs: _*)).as("bb"))
        .select(col("id"), col("bb.band").as("band"),
          col("bb.bucket").as("bucket"))
      graft.operators.Dedup.lshCandidates(buckets)
    }
    val s1 = bandPairs(0, 4).withColumn("in1", lit(1L))
    val s2 = bandPairs(4, 8).withColumn("in2", lit(1L))
    val joined = s1.join(s2, Seq("id_a", "id_b"), "full_outer")
      .select(coalesce(col("in1"), lit(0L)).as("in1"),
        coalesce(col("in2"), lit(0L)).as("in2"))
    joined.agg(sum(col("in1")).as("n1"), sum(col("in2")).as("n2"),
        sum(col("in1") * col("in2")).as("m"))
      .select(col("n1"), col("n2"), col("m"),
        round(col("n1").cast("double") * col("n2").cast("double") /
          col("m").cast("double")).cast("long").as("n_est"))
      .orderBy(col("n1"))
  }

  private val q395Sql = {
    import graft.functions.PortableHash
    val shingleHash = PortableHash.hash60DuckSql("shingle")
    def minExprs(b0: Int, b1: Int): String =
      (b0 * 2 until b1 * 2).map(h =>
        s"min(${PortableHash.permDuckSql(h, "sh")}) AS m$h")
        .mkString(", ")
    def bucketSql(b: Int): String =
      PortableHash.bandBucketDuckSql(b, Seq(s"m${b * 2}", s"m${b * 2 + 1}"))
    def familySql(b0: Int, b1: Int, nm: String): String = {
      val buckets = (b0 until b1).map(b =>
        s"SELECT id, $b AS band, ${bucketSql(b)} AS bucket FROM sig")
        .mkString(" UNION ALL ")
      s"""$nm AS (
         |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
         |  FROM ($buckets) x JOIN ($buckets) y
         |    ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id)"""
        .stripMargin
    }
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS w
       |  FROM documents),
       |shing AS (
       |  SELECT DISTINCT doc_id AS id,
       |    unnest(list_transform(range(len(w) - 2),
       |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
       |  FROM toks WHERE len(w) >= 3),
       |hashed AS (SELECT id, $shingleHash AS sh FROM shing),
       |sig AS (SELECT id, ${minExprs(0, 8)} FROM hashed GROUP BY id),
       |${familySql(0, 4, "f1")},
       |${familySql(4, 8, "f2")},
       |u AS (
       |  SELECT coalesce(f1.id_a, f2.id_a) AS id_a,
       |    CASE WHEN f1.id_a IS NOT NULL THEN 1 ELSE 0 END AS in1,
       |    CASE WHEN f2.id_a IS NOT NULL THEN 1 ELSE 0 END AS in2
       |  FROM f1 FULL OUTER JOIN f2
       |    ON f1.id_a = f2.id_a AND f1.id_b = f2.id_b)
       |SELECT CAST(sum(in1) AS BIGINT) AS n1,
       |  CAST(sum(in2) AS BIGINT) AS n2,
       |  CAST(sum(in1 * in2) AS BIGINT) AS m,
       |  CAST(round(CAST(sum(in1) AS DOUBLE) * CAST(sum(in2) AS DOUBLE)
       |    / CAST(sum(in1 * in2) AS DOUBLE)) AS BIGINT) AS n_est
       |FROM u
       |ORDER BY n1""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q396 — PSI (population stability index) between the first and
  // second time-half of each event type's value distribution — the
  // scorecard-monitoring drift metric ops teams page on (PSI > 0.2 ⇒
  // investigate): Σ (p−q)·ln(p/q) over 10 value buckets with +1
  // Laplace smoothing on the counts (PSI is undefined on empty
  // buckets; the smoothing is identical on both engines so the gate
  // stays exact). Split point = the media-ish fixed timestamp literal
  // (both halves are corpus-scale). Each bucket's term is e9-rounded
  // (q375 discipline) with the all-integer ratio a'·nB'/(b'·nA')
  // inside the ln; the per-type PSI is an integer sum.
  // ---------------------------------------------------------------------
  private def q396(s: SparkSession, dir: String): DataFrame = {
    val split = lit(java.sql.Timestamp.valueOf("2024-06-15 00:00:00"))
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type"),
        least(expr("CAST(round(value * 100) AS BIGINT) div 5000"),
          lit(9L)).as("bkt"),
        when(col("ts_s") < split, 1L).otherwise(0L).as("a"),
        when(col("ts_s") >= split, 1L).otherwise(0L).as("b"))
    val dim = s.range(10).select(col("id").as("bkt"))
    val g = e.groupBy(col("event_type"), col("bkt"))
      .agg(sum(col("a")).as("ca0"), sum(col("b")).as("cb0"))
    val types = g.select(col("event_type")).distinct()
    val full = types.crossJoin(broadcast(dim))
      .join(g, Seq("event_type", "bkt"), "left")
      .select(col("event_type"),
        (coalesce(col("ca0"), lit(0L)) + 1L).as("ca"),
        (coalesce(col("cb0"), lit(0L)) + 1L).as("cb"))
    val tot = full.groupBy(col("event_type"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    full.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("na"), col("nb"),
        round((col("ca").cast("double") / col("na").cast("double")
          - col("cb").cast("double") / col("nb").cast("double")) *
          log((col("ca").cast(dec) * col("nb").cast(dec)).cast("double") /
            (col("cb").cast(dec) * col("na").cast(dec)).cast("double"))
          * 1000000000.0).cast("long").as("t_e9"))
      .groupBy(col("event_type"), col("na"), col("nb"))
      .agg(sum(col("t_e9")).as("psi_e9"))
      .select(col("event_type"), col("na").as("n_first"),
        col("nb").as("n_second"), col("psi_e9"))
      .orderBy(col("event_type"))
  }

  private val q396Sql =
    """WITH e AS (
      |  SELECT event_type,
      |    least(CAST(round(value * 100) AS BIGINT) // 5000, 9) AS bkt,
      |    CASE WHEN date_trunc('second', ts)
      |      < TIMESTAMP '2024-06-15 00:00:00' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN date_trunc('second', ts)
      |      >= TIMESTAMP '2024-06-15 00:00:00' THEN 1 ELSE 0 END AS b
      |  FROM events),
      |g AS (SELECT event_type, bkt, sum(a) AS ca0, sum(b) AS cb0
      |      FROM e GROUP BY event_type, bkt),
      |types AS (SELECT DISTINCT event_type FROM g),
      |dim AS (SELECT unnest(range(10)) AS bkt),
      |full_g AS (
      |  SELECT types.event_type,
      |    coalesce(g.ca0, 0) + 1 AS ca, coalesce(g.cb0, 0) + 1 AS cb
      |  FROM types CROSS JOIN dim
      |  LEFT JOIN g ON g.event_type = types.event_type
      |    AND g.bkt = dim.bkt),
      |tot AS (SELECT event_type, sum(ca) AS na, sum(cb) AS nb
      |        FROM full_g GROUP BY event_type),
      |terms AS (
      |  SELECT full_g.event_type, tot.na, tot.nb,
      |    CAST(round((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
      |        - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) *
      |      ln(CAST(CAST(ca AS HUGEINT) * nb AS DOUBLE) /
      |         CAST(CAST(cb AS HUGEINT) * na AS DOUBLE))
      |      * 1000000000.0) AS BIGINT) AS t_e9
      |  FROM full_g JOIN tot ON full_g.event_type = tot.event_type)
      |SELECT event_type, CAST(na AS BIGINT) AS n_first,
      |  CAST(nb AS BIGINT) AS n_second,
      |  CAST(sum(t_e9) AS BIGINT) AS psi_e9
      |FROM terms
      |GROUP BY event_type, na, nb
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q397 — RFM customer segmentation (recency / frequency / monetary
  // quintiles — the warehouse segmentation every CRM export starts
  // from): per-customer metrics aggregate once; each metric ranks
  // through [[graft.operators.Curate.globalRank]] (customer tiebreak —
  // no unpartitioned window) and the quintile is the pure-integer
  // (5·(rank−1)) div n + 1, so bucket edges are exact on any engine;
  // the readout is segment-grain (≤125 rows at any corpus size).
  // ---------------------------------------------------------------------
  private def q397(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey").as("ck"),
        col("o_orderdate").cast("date").as("d"),
        round(col("o_totalprice") * 100).cast("long").as("p_e2"))
    val perCust = o.groupBy(col("ck"))
      .agg(max(col("d")).as("lastd"), count(lit(1)).as("freq"),
        sum(col("p_e2")).as("mon_e2"))
    val maxd = perCust.agg(max(col("lastd")).as("maxd"))
    val base = perCust.crossJoin(broadcast(maxd))
      .withColumn("rec_days", datediff(col("maxd"), col("lastd")))
    def quintile(metric: Column, name: String)(df: DataFrame): DataFrame = {
      val ranked = graft.operators.Curate.globalRank(
        df, Seq(metric, col("ck")), s"__r_$name")
      val n = ranked.agg(count(lit(1)).as("__n"))
      ranked.crossJoin(broadcast(n))
        .withColumn(name,
          expr(s"(5 * (__r_$name - 1)) div __n + 1"))
        .drop(s"__r_$name", "__n")
    }
    // recency quintile 1 = most recent (smallest rec_days)
    val scored = quintile(col("rec_days"), "rq")(
      quintile(-col("freq"), "fq")(
        quintile(-col("mon_e2"), "mq")(base)))
    scored.groupBy(col("rq"), col("fq"), col("mq"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("mon_e2")).as("mon_total_e2"))
      .select((col("rq") * 100 + col("fq") * 10 + col("mq"))
        .as("segment"), col("n_customers"), col("mon_total_e2"))
      .orderBy(col("segment"))
  }

  private val q397Sql =
    """WITH o AS (
      |  SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS p_e2
      |  FROM orders),
      |pc AS (SELECT ck, max(d) AS lastd, count(*) AS freq,
      |       sum(p_e2) AS mon_e2 FROM o GROUP BY ck),
      |mx AS (SELECT max(lastd) AS maxd FROM pc),
      |base AS (SELECT pc.*, date_diff('day', lastd, maxd) AS rec_days
      |         FROM pc, mx),
      |n AS (SELECT count(*) AS n FROM base),
      |ranked AS (
      |  SELECT ck, mon_e2,
      |    row_number() OVER (ORDER BY rec_days, ck) AS r_rq,
      |    row_number() OVER (ORDER BY -freq, ck) AS r_fq,
      |    row_number() OVER (ORDER BY -mon_e2, ck) AS r_mq
      |  FROM base),
      |scored AS (
      |  SELECT ck, mon_e2,
      |    (5 * (r_rq - 1)) // n.n + 1 AS rq,
      |    (5 * (r_fq - 1)) // n.n + 1 AS fq,
      |    (5 * (r_mq - 1)) // n.n + 1 AS mq
      |  FROM ranked, n)
      |SELECT CAST(rq * 100 + fq * 10 + mq AS BIGINT) AS segment,
      |  count(*) AS n_customers,
      |  CAST(sum(mon_e2) AS BIGINT) AS mon_total_e2
      |FROM scored
      |GROUP BY 1
      |ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------------
  // q398 — weekly cohort retention matrix (the growth-analytics
  // staple): users cohort by their first active calendar week; cell
  // (cohort, offset) counts users active offset weeks later, with an
  // e6 retention share against the cohort size. Weeks are integer
  // epoch-day div 7 — no date-truncation semantics to diverge on.
  // Two shuffles (per-user first week; per-(user, week) activity);
  // the matrix grain is weeks² — calendar-bounded at any corpus size.
  // ---------------------------------------------------------------------
  private def q398(s: SparkSession, dir: String): DataFrame = {
    val act = Tables.eventsSec(s, dir)
      .select(col("user_id"),
        expr("CAST(datediff(to_date(ts_s), DATE '1970-01-01') AS BIGINT)" +
          " div 7").as("wk"))
      .distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
    val sizes = first.groupBy(col("cw")).agg(count(lit(1)).as("cohort_n"))
    act.join(first, "user_id")
      .groupBy(col("cw"), (col("wk") - col("cw")).as("wk_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cw")
      .select(col("cw").as("cohort_week"), col("wk_offset"),
        col("cohort_n"), col("n_active"),
        round(col("n_active").cast("double") /
          col("cohort_n").cast("double") * 1000000.0).cast("long")
          .as("retention_e6"))
      .orderBy(col("cohort_week"), col("wk_offset"))
  }

  private val q398Sql =
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    date_diff('day', DATE '1970-01-01',
      |      CAST(date_trunc('second', ts) AS DATE)) // 7 AS wk
      |  FROM events),
      |first_w AS (SELECT user_id, min(wk) AS cw FROM act GROUP BY user_id),
      |sizes AS (SELECT cw, count(*) AS cohort_n FROM first_w GROUP BY cw),
      |cells AS (
      |  SELECT f.cw, act.wk - f.cw AS wk_offset, count(*) AS n_active
      |  FROM act JOIN first_w f ON act.user_id = f.user_id
      |  GROUP BY f.cw, act.wk - f.cw)
      |SELECT CAST(cells.cw AS BIGINT) AS cohort_week,
      |  CAST(wk_offset AS BIGINT) AS wk_offset,
      |  CAST(cohort_n AS BIGINT) AS cohort_n,
      |  CAST(n_active AS BIGINT) AS n_active,
      |  CAST(round(CAST(n_active AS DOUBLE) / CAST(cohort_n AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS retention_e6
      |FROM cells JOIN sizes ON cells.cw = sizes.cw
      |ORDER BY cohort_week, wk_offset""".stripMargin

  // ---------------------------------------------------------------------
  // q399 — label-centroid cosine similarity matrix over the
  // embeddings table (the class-separability audit a curriculum /
  // hard-negative miner reads first): float32 elements widen to
  // double EXACTLY, e6-round to integers AT THE ELEMENT, and
  // centroids are integer per-(label, dim) sums — so the 45-pair
  // cosine matrix is exact integer dot/norm arithmetic (decimal(38,0)
  // cross-products) with IEEE sqrt at the single e6 readout. The
  // corpus pass is one explode + hash aggregate; everything after is
  // label²-grain.
  // ---------------------------------------------------------------------
  private def q399(s: SparkSession, dir: String): DataFrame = {
    val cent = t(s, dir, "embeddings")
      .select(col("label").cast("long").as("lb"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("lb"), col("dim"),
        round(col("x").cast("double") * 1000000.0).cast("long").as("xe6"))
      .groupBy(col("lb"), col("dim"))
      .agg(sum(col("xe6")).as("sx"), count(lit(1)).as("n"))
    val a = cent.select(col("lb").as("la"), col("dim"),
      col("sx").as("sa"))
    val b = cent.select(col("lb").as("lbb"), col("dim"),
      col("sx").as("sb"))
    val pairs = a.join(b, Seq("dim")).filter(col("la") < col("lbb"))
      .groupBy(col("la"), col("lbb"))
      .agg(sum(col("sa").cast(dec) * col("sb").cast(dec)).as("dot"),
        sum(col("sa").cast(dec) * col("sa").cast(dec)).as("ssa"),
        sum(col("sb").cast(dec) * col("sb").cast(dec)).as("ssb"))
    pairs.select(col("la").as("label_a"), col("lbb").as("label_b"),
        round(col("dot").cast("double") /
          sqrt(col("ssa").cast("double") * col("ssb").cast("double"))
          * 1000000.0).cast("long").as("cos_e6"))
      .orderBy(col("label_a"), col("label_b"))
  }

  private val q399Sql =
    """WITH exploded AS (
      |  SELECT CAST(label AS BIGINT) AS lb,
      |    unnest(list_transform(range(len(embedding)),
      |      i -> {'dim': i,
      |            'xe6': CAST(round(CAST(embedding[i+1] AS DOUBLE)
      |                   * 1000000.0) AS BIGINT)})) AS p
      |  FROM embeddings),
      |ex AS (SELECT lb, p.dim AS dim, p.xe6 AS xe6 FROM exploded),
      |cent AS (SELECT lb, dim, sum(xe6) AS sx FROM ex GROUP BY lb, dim),
      |pairs AS (
      |  SELECT a.lb AS la, b.lb AS lbb,
      |    sum(CAST(a.sx AS HUGEINT) * b.sx) AS dot,
      |    sum(CAST(a.sx AS HUGEINT) * a.sx) AS ssa,
      |    sum(CAST(b.sx AS HUGEINT) * b.sx) AS ssb
      |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.lb < b.lb
      |  GROUP BY a.lb, b.lb)
      |SELECT la AS label_a, lbb AS label_b,
      |  CAST(round(CAST(dot AS DOUBLE)
      |    / sqrt(CAST(ssa AS DOUBLE) * CAST(ssb AS DOUBLE))
      |    * 1000000.0) AS BIGINT) AS cos_e6
      |FROM pairs
      |ORDER BY label_a, label_b""".stripMargin

  // ---------------------------------------------------------------------
  // q400 — the corpus datasheet (one-row "dataset card" a release
  // review reads before shipping training data): document count,
  // token mass, language/source cardinalities, mean length, exact-
  // duplicate share (via the text-hash grain) and hapax-token share —
  // every number an exact integer or a single e6 division, composed
  // from the same primitives the rest of the tier gates one by one.
  // ---------------------------------------------------------------------
  private def q400(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), size(Text.words(col("text"))).cast("long")
          .as("tk"))
    val base = d.agg(count(lit(1)).as("n_docs"),
      sum(col("tk")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(col("n_chars")).as("sum_chars"))
    // duplicate grain groups by xxhash64(text) — the repo-wide
    // shuffle-narrowing convention (8-byte keys, not document
    // strings; collisions ~n²/2⁶⁴, and a collision would only show
    // as a gate mismatch vs the oracle's group-by-text — it never
    // silently passes)
    val dups = d.groupBy(xxhash64(col("text")).as("h"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1L).as("n_exact_dups"))
    val hapax = d.select(explode(Text.words(col("text"))).as("wd"))
      .groupBy(col("wd")).agg(count(lit(1)).as("f"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("f") === 1L, 1L).otherwise(0L)).as("n_hapax"))
    base.crossJoin(broadcast(dups)).crossJoin(broadcast(hapax))
      .select(col("n_docs"), col("n_tokens"), col("n_langs"),
        col("n_sources"),
        round(col("sum_chars").cast("double") /
          col("n_docs").cast("double") * 100.0).cast("long")
          .as("mean_chars_e2"),
        col("n_exact_dups"),
        round(col("n_exact_dups").cast("double") /
          col("n_docs").cast("double") * 1000000.0).cast("long")
          .as("dup_share_e6"),
        col("vocab"), col("n_hapax"),
        round(col("n_hapax").cast("double") / col("vocab").cast("double")
          * 1000000.0).cast("long").as("hapax_share_e6"))
      .orderBy(col("n_docs"))
  }

  private val q400Sql =
    """WITH d AS (
      |  SELECT doc_id, text, lang, source, n_chars,
      |    len(list_filter(string_split(text, ' '),
      |      w -> length(w) > 0)) AS tk
      |  FROM documents),
      |base AS (
      |  SELECT count(*) AS n_docs, sum(tk) AS n_tokens,
      |    count(DISTINCT lang) AS n_langs,
      |    count(DISTINCT source) AS n_sources,
      |    sum(n_chars) AS sum_chars
      |  FROM d),
      |dups AS (
      |  SELECT sum(c - 1) AS n_exact_dups
      |  FROM (SELECT text, count(*) AS c FROM d GROUP BY text)),
      |hapax AS (
      |  SELECT count(*) AS vocab,
      |    sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS n_hapax
      |  FROM (SELECT wd, count(*) AS f FROM (
      |    SELECT unnest(list_filter(string_split(text, ' '),
      |      w -> length(w) > 0)) AS wd FROM d) GROUP BY wd))
      |SELECT CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n_langs AS BIGINT) AS n_langs,
      |  CAST(n_sources AS BIGINT) AS n_sources,
      |  CAST(round(CAST(sum_chars AS DOUBLE) / CAST(n_docs AS DOUBLE)
      |    * 100.0) AS BIGINT) AS mean_chars_e2,
      |  CAST(n_exact_dups AS BIGINT) AS n_exact_dups,
      |  CAST(round(CAST(n_exact_dups AS DOUBLE) / CAST(n_docs AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS dup_share_e6,
      |  CAST(vocab AS BIGINT) AS vocab,
      |  CAST(n_hapax AS BIGINT) AS n_hapax,
      |  CAST(round(CAST(n_hapax AS DOUBLE) / CAST(vocab AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS hapax_share_e6
      |FROM base, dups, hapax
      |ORDER BY n_docs""".stripMargin

  // ---------------------------------------------------------------------
  // registration
  // ---------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q377_l_diversity" -> (q377 _),
    "q378_fleiss_kappa" -> (q378 _),
    "q379_feed_mrr" -> (q379 _),
    "q380_trimmed_means" -> (q380 _),
    "q381_token_budget" -> (q381 _),
    "q382_hill_tail" -> (q382 _),
    "q383_chi2_independence" -> (q383 _),
    "q384_js_divergence" -> (q384 _),
    "q385_mcnemar" -> (q385 _),
    "q386_funnel" -> (q386 _),
    "q387_partition_skew" -> (q387 _),
    "q388_good_turing" -> (q388 _),
    "q389_zipf_slope" -> (q389 _),
    "q390_fano_burstiness" -> (q390 _),
    "q391_wilson_interval" -> (q391 _),
    "q392_transition_entropy" -> (q392 _),
    "q393_fellegi_sunter" -> (q393 _),
    "q394_horvitz_thompson" -> (q394 _),
    "q395_capture_recapture" -> (q395 _),
    "q396_psi_drift" -> (q396 _),
    "q397_rfm_segments" -> (q397 _),
    "q398_cohort_retention" -> (q398 _),
    "q399_centroid_cosine" -> (q399 _),
    "q400_dataset_card" -> (q400 _))

  val oracle: Map[String, String] = Map(
    "q377_l_diversity" -> q377Sql,
    "q378_fleiss_kappa" -> q378Sql,
    "q379_feed_mrr" -> q379Sql,
    "q380_trimmed_means" -> q380Sql,
    "q381_token_budget" -> q381Sql,
    "q382_hill_tail" -> q382Sql,
    "q383_chi2_independence" -> q383Sql,
    "q384_js_divergence" -> q384Sql,
    "q385_mcnemar" -> q385Sql,
    "q386_funnel" -> q386Sql,
    "q387_partition_skew" -> q387Sql,
    "q388_good_turing" -> q388Sql,
    "q389_zipf_slope" -> q389Sql,
    "q390_fano_burstiness" -> q390Sql,
    "q391_wilson_interval" -> q391Sql,
    "q392_transition_entropy" -> q392Sql,
    "q393_fellegi_sunter" -> q393Sql,
    "q394_horvitz_thompson" -> q394Sql,
    "q395_capture_recapture" -> q395Sql,
    "q396_psi_drift" -> q396Sql,
    "q397_rfm_segments" -> q397Sql,
    "q398_cohort_retention" -> q398Sql,
    "q399_centroid_cosine" -> q399Sql,
    "q400_dataset_card" -> q400Sql)
}
