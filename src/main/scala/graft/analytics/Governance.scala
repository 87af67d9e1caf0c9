package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.PlanStats.Pinned

/** Governance / corpus-planning surface (session 5): privacy audits,
  * collocation mining, and token-budget allocation — the operational
  * queries a training-data platform runs AROUND its curation tier
  * (what q222/q228/q232 are to the sketch tier, these are to the
  * compliance/planning tier). Integer-exact outputs throughout.
  */
object Governance {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ---------------------------------------------------------------------
  // q238 — k-anonymity audit: group events by a quasi-identifier
  // tuple (event_type, day, floored value) and report, for each
  // candidate k, how many equivalence classes and records fall below
  // it — the suppression cost a privacy review reads before release.
  //
  // Scale shape: ONE shuffle to QI grain (map-side partial count);
  // the per-k rollup runs on the class-grain table crossed with a
  // 4-row threshold dim — class cardinality is bounded by the QI
  // domain, not the corpus, so the second stage is corpus-free at any
  // scale.
  // ---------------------------------------------------------------------
  private def q238(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type"), date_trunc("day", col("ts_s")).as("day"),
        floor(col("value")).cast("long").as("v"))
    val classes = e.groupBy(col("event_type"), col("day"), col("v"))
      .agg(count(lit(1)).as("n"))
    val ks = s.range(4).select(element_at(
      array(lit(2L), lit(5L), lit(10L), lit(20L)),
      col("id").cast("int") + 1).as("k"))
    classes.crossJoin(broadcast(ks))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < col("k"), 1L).otherwise(0L))
          .as("n_classes_below"),
        sum(when(col("n") < col("k"), col("n")).otherwise(0L))
          .as("n_records_below"),
        min(col("n")).as("min_class"),
        sum(col("n")).as("n_records"))
      .orderBy(col("k"))
  }

  private val q238Sql =
    """WITH e AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(floor(value) AS BIGINT) AS v
      |  FROM events),
      |classes AS (
      |  SELECT event_type, day, v, count(*) AS n
      |  FROM e GROUP BY 1, 2, 3),
      |ks AS (SELECT unnest([2, 5, 10, 20]) AS k)
      |SELECT CAST(k AS BIGINT) AS k,
      |  count(*) AS n_classes,
      |  CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_classes_below,
      |  CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
      |    AS n_records_below,
      |  CAST(min(n) AS BIGINT) AS min_class,
      |  CAST(sum(n) AS BIGINT) AS n_records
      |FROM classes CROSS JOIN ks
      |GROUP BY k
      |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------------
  // q239 — word-pair PMI collocations: distinct word pairs
  // co-occurring in a document, df-pruned to mid-frequency words
  // (the q136 posting discipline — ubiquitous and near-hapax words
  // never enter pair generation, which is what bounds the per-doc
  // pair blow-up), scored by pointwise mutual information
  // ln(n12·N / (n1·n2)) at e4, top-25 by (pmi, pair). The df window
  // is CORPUS-RELATIVE — [max(5, N/50), 4N/5] — so the same query is
  // meaningful at any scale (by Heaps' law the ≥2%-of-docs band is a
  // small, broadcastable slice of the vocabulary).
  //
  // Scale shape: the corpus tokenizes once; df is a word-grain
  // aggregate; pair generation is the in-bucket sorted-list
  // transform (per-doc eligible-word lists, bounded by the df
  // window); the pair table aggregates on (w1, w2) with map-side
  // partials, joins the word-grain counts, and ranks via
  // TakeOrdered — no global window, no cartesian.
  // ---------------------------------------------------------------------
  private val PmiMinPairs = 5L
  private val PmiTopK = 25

  private def q239(s: SparkSession, dir: String): DataFrame = {
    // pinned (r12): the tokenize + distinct corpus pass fed BOTH the
    // df aggregate and the pair-generation semi-join — two full
    // explode/shuffle derivations of the same (doc_id, w) table; one
    // narrow materialization now feeds both (the q488 words posture)
    val wd = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().pin()
    val df = wd.groupBy(col("w")).agg(count(lit(1)).as("nd"))
    val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val eligible = df.crossJoin(broadcast(nDocs))
      .filter(col("nd") >= greatest(lit(5L), expr("n_docs div 50")) &&
        col("nd") <= expr("n_docs * 4 div 5"))
      .select(col("w"), col("nd"))
      .pin()
    val pairs = wd.join(broadcast(eligible.select("w")), Seq("w"),
        "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("w"))).as("ws"))
      .filter(size(col("ws")) > 1)
      .select(explode(expr(
        """flatten(transform(ws, (a, i) ->
          |  transform(slice(ws, i + 2, size(ws) - i - 1),
          |    b -> struct(a AS w1, b AS w2))))""".stripMargin)).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= PmiMinPairs)
    pairs
      .join(broadcast(eligible.select(col("w").as("w1"),
        col("nd").as("n1"))), Seq("w1"))
      .join(broadcast(eligible.select(col("w").as("w2"),
        col("nd").as("n2"))), Seq("w2"))
      .crossJoin(broadcast(nDocs))
      .select(col("w1"), col("w2"), col("n12"),
        expr("CAST(round(ln(CAST(n12 * n_docs AS DOUBLE) / " +
          "CAST(n1 * n2 AS DOUBLE)) * 10000) AS BIGINT)").as("pmi_e4"))
      .orderBy(col("pmi_e4").desc, col("w1"), col("w2"))
      .limit(PmiTopK)
  }

  private val q239Sql =
    s"""WITH wd AS (
       |  SELECT DISTINCT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents)
       |  WHERE len(w) > 0),
       |df AS (SELECT w, count(*) AS nd FROM wd GROUP BY w),
       |nd0 AS (SELECT count(*) AS n_docs FROM documents),
       |el AS (SELECT w, nd FROM df, nd0
       |       WHERE nd >= greatest(5, n_docs // 50)
       |         AND nd <= n_docs * 4 // 5),
       |we AS (SELECT doc_id, wd.w FROM wd JOIN el ON wd.w = el.w),
       |p AS (
       |  SELECT a.w AS w1, b.w AS w2, count(*) AS n12
       |  FROM we a JOIN we b
       |    ON a.doc_id = b.doc_id AND a.w < b.w
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $PmiMinPairs),
       |nd AS (SELECT count(*) AS n_docs FROM documents)
       |SELECT w1, w2, CAST(n12 AS BIGINT) AS n12,
       |  CAST(round(ln(CAST(n12 * n_docs AS DOUBLE) /
       |    CAST(e1.nd * e2.nd AS DOUBLE)) * 10000) AS BIGINT) AS pmi_e4
       |FROM p
       |JOIN el e1 ON p.w1 = e1.w
       |JOIN el e2 ON p.w2 = e2.w
       |CROSS JOIN nd
       |ORDER BY pmi_e4 DESC, w1, w2
       |LIMIT $PmiTopK""".stripMargin

  // ---------------------------------------------------------------------
  // q240 — token-budget waterfilling: allocate a global training
  // budget (40% of total corpus chars) across sources, each capped
  // at its own size — the max-min fair allocation (water level L
  // with Σ min(cap, L) ≤ B) every corpus-mix plan starts from before
  // temperature reweighting (q86). All-integer: the level is an
  // integer div at the boundary rank, so the result is engine-exact.
  //
  // Scale shape: the corpus aggregates ONCE to source grain; the
  // waterfill itself (sort + prefix sums + boundary pick) runs
  // entirely on the source-sized dimension — the unpartitioned
  // window is |sources| rows, never the corpus.
  // ---------------------------------------------------------------------
  private def q240(s: SparkSession, dir: String): DataFrame = {
    // checkpoint the source-grain table: it feeds tot, the ranked
    // window, the boundary pick AND the final projection — without
    // this the corpus would be re-aggregated once per consumer
    val caps = docs(s, dir).groupBy(col("source"))
      .agg(sum(col("n_chars")).as("cap")).pin()
    val tot = caps.agg(sum(col("cap")).as("tot"),
      count(lit(1)).as("ns"))
    val w = Window.orderBy(col("cap"), col("source"))
    val ranked = caps.crossJoin(broadcast(tot))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("pre", coalesce(sum(col("cap")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("b", expr("tot * 2 div 5"))
      .withColumn("nrem", col("ns") - col("rn") + 1)
    // the boundary rank: first (by rn) source whose cap exceeds the
    // water level — min_by over the ≤|sources| candidate rows; empty
    // (B ≥ total) → null struct → every source fully allocated
    val boundary = ranked
      .filter(col("pre") + col("nrem") * col("cap") >= col("b"))
      .agg(min_by(struct(col("pre").as("bpre"), col("nrem").as("bnrem")),
        col("rn")).as("s"))
      .select(col("s.bpre").as("bpre"), col("s.bnrem").as("bnrem"))
    ranked.crossJoin(broadcast(boundary))
      .withColumn("lvl", expr("(b - bpre) div bnrem"))
      .select(col("source"), col("cap"),
        when(col("lvl").isNull, col("cap"))
          .otherwise(least(col("cap"), col("lvl"))).as("alloc"),
        when(col("lvl").isNull || col("cap") <= col("lvl"), 1L)
          .otherwise(0L).as("capped"))
      .orderBy(col("source"))
  }

  private val q240Sql =
    """WITH caps AS (
      |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS cap
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(cap) AS BIGINT) AS tot,
      |        count(*) AS ns FROM caps),
      |r AS (
      |  SELECT source, cap,
      |    row_number() OVER (ORDER BY cap, source) AS rn,
      |    COALESCE(CAST(SUM(cap) OVER (ORDER BY cap, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS BIGINT), 0) AS pre
      |  FROM caps),
      |p AS (
      |  SELECT r.*, t.tot * 2 // 5 AS b, t.ns - r.rn + 1 AS nrem
      |  FROM r, t),
      |bd AS (SELECT min(rn) AS brn FROM p
      |       WHERE pre + nrem * cap >= b),
      |lvl AS (
      |  SELECT (SELECT (b - pre) // nrem FROM p, bd WHERE rn = bd.brn)
      |    AS lvl)
      |SELECT source, cap,
      |  CASE WHEN lvl IS NULL THEN cap
      |       ELSE LEAST(cap, lvl) END AS alloc,
      |  CAST(CASE WHEN lvl IS NULL OR cap <= lvl THEN 1 ELSE 0 END
      |    AS BIGINT) AS capped
      |FROM p, lvl
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q241 — strongly connected components of the part→supplier
  // digraph (who can route influence back to whom through the supply
  // relation), via [[graft.operators.Graph.stronglyConnectedComponents]]
  // — trim (acyclic periphery peels as singletons) + FW-BW min-label
  // coloring (cyclic cores). Deterministic min-label ids, so the
  // whole iterative computation is engine-exact against a DuckDB
  // recursive-CTE transitive closure — the oracle pays the O(n·reach)
  // closure price at gate scale precisely so the distributed
  // algorithm never has to at any scale.
  // ---------------------------------------------------------------------
  private def q241(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 10 === 3)
      .select((col("l_partkey") % 1000).as("src"),
        (col("l_suppkey") % 1000).as("dst"))
      .filter(col("src") =!= col("dst"))
    graft.operators.Graph.stronglyConnectedComponents(e)
      .orderBy(col("node"))
  }

  private val q241Sql =
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT l_partkey % 1000 AS src,
      |    l_suppkey % 1000 AS dst
      |  FROM lineitem
      |  WHERE l_orderkey % 10 = 3 AND l_partkey % 1000 <> l_suppkey % 1000),
      |reach(a, b) AS (
      |  SELECT src, dst FROM e
      |  UNION
      |  SELECT r.a, e2.dst FROM reach r JOIN e e2 ON r.b = e2.src),
      |nodes AS (
      |  SELECT src AS node FROM e UNION SELECT dst FROM e),
      |mutual AS (
      |  SELECT r1.a, r1.b FROM reach r1
      |  JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a)
      |SELECT node,
      |  CAST(LEAST(node, COALESCE(min(m.b), node)) AS BIGINT) AS scc_id
      |FROM nodes n LEFT JOIN mutual m ON m.a = n.node
      |GROUP BY node
      |ORDER BY node""".stripMargin

  // ---------------------------------------------------------------------
  // q242 — first/last-touch attribution: every purchase is credited
  // to the earliest and the latest view/click by the same user in the
  // preceding 7 days (the marketing-attribution join every revenue
  // warehouse runs), rolled up per touch channel. min_by/max_by over
  // a (ts, event_id) struct — the unique tiebreak keeps the pick
  // engine-exact when touches share a timestamp.
  //
  // Scale shape: purchases and touches co-shuffle ONCE on user_id;
  // the pair blow-up is per-user purchases × touches inside the 7-day
  // window (session-bounded, not corpus-bounded), immediately
  // aggregated back to purchase grain map-side.
  // ---------------------------------------------------------------------
  private def q242(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_s").as("pts"),
        round(col("value") * 10000).cast("long").as("value_e4"))
    val touches = e
      .filter(col("event_type") === "view" || col("event_type") === "click")
      .select(col("user_id"), col("ts_s").as("tts"),
        col("event_type").as("channel"), col("event_id").as("tid"))
    // one BIGINT touch key (epoch·1e8 + event_id) — a composite both
    // engines' arg_min/arg_max accept, unique by construction
    val attributed = purchases.join(touches, Seq("user_id"))
      .filter(col("tts") <= col("pts") &&
        col("tts") >= col("pts") - expr("INTERVAL 7 DAYS"))
      .withColumn("tkey",
        col("tts").cast("long") * lit(100000000L) + col("tid"))
      .groupBy(col("event_id"))
      .agg(min_by(col("channel"), col("tkey")).as("first_channel"),
        max_by(col("channel"), col("tkey")).as("last_channel"),
        first(col("value_e4")).as("value_e4"))
    val byFirst = attributed.groupBy(col("first_channel").as("channel"))
      .agg(count(lit(1)).as("n_first"),
        sum(col("value_e4")).as("value_e4_first"))
    val byLast = attributed.groupBy(col("last_channel").as("channel"))
      .agg(count(lit(1)).as("n_last"),
        sum(col("value_e4")).as("value_e4_last"))
    byFirst.join(byLast, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("value_e4_first"), lit(0L)).as("value_e4_first"),
        coalesce(col("n_last"), lit(0L)).as("n_last"),
        coalesce(col("value_e4_last"), lit(0L)).as("value_e4_last"))
      .orderBy(col("channel"))
  }

  private val q242Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |    date_trunc('second', ts) AS ts_s,
      |    CAST(round(value * 10000) AS BIGINT) AS value_e4
      |  FROM events),
      |p AS (SELECT event_id, user_id, ts_s AS pts, value_e4
      |      FROM e WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, ts_s AS tts, event_type AS channel,
      |        event_id AS tid
      |      FROM e WHERE event_type IN ('view', 'click')),
      |a AS (
      |  SELECT p.event_id,
      |    arg_min(channel, CAST(epoch(tts) AS BIGINT) * 100000000
      |      + tid) AS first_channel,
      |    arg_max(channel, CAST(epoch(tts) AS BIGINT) * 100000000
      |      + tid) AS last_channel,
      |    any_value(p.value_e4) AS value_e4
      |  FROM p JOIN t ON p.user_id = t.user_id
      |    AND t.tts <= p.pts AND t.tts >= p.pts - INTERVAL 7 DAY
      |  GROUP BY p.event_id),
      |f AS (SELECT first_channel AS channel, count(*) AS n_first,
      |        CAST(sum(value_e4) AS BIGINT) AS value_e4_first
      |      FROM a GROUP BY 1),
      |l AS (SELECT last_channel AS channel, count(*) AS n_last,
      |        CAST(sum(value_e4) AS BIGINT) AS value_e4_last
      |      FROM a GROUP BY 1)
      |SELECT COALESCE(f.channel, l.channel) AS channel,
      |  COALESCE(n_first, 0) AS n_first,
      |  COALESCE(value_e4_first, 0) AS value_e4_first,
      |  COALESCE(n_last, 0) AS n_last,
      |  COALESCE(value_e4_last, 0) AS value_e4_last
      |FROM f FULL OUTER JOIN l ON f.channel = l.channel
      |ORDER BY channel""".stripMargin

  // ---------------------------------------------------------------------
  // q243 — cumulative distinct users by day: exact running uniques
  // WITHOUT any running-distinct state — a user contributes to the
  // cumulative count from their first-activity day on, so the answer
  // is first_day per user (one user-grain aggregate), new-user counts
  // per day, and a cumulative sum over the DAY dimension (the window
  // runs over ~30 rows, never the corpus). The exact twin of a
  // running-HLL union, and the standard growth-dashboard query.
  // ---------------------------------------------------------------------
  private def q243(s: SparkSession, dir: String): DataFrame = {
    val firstDay = Tables.eventsSec(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(date_trunc("day", min(col("ts_s"))).as("day"))
    val perDay = firstDay.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("new_users"))
    perDay
      .withColumn("cum_users", sum(col("new_users")).over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("event_type"), col("day"))
  }

  private val q243Sql =
    """WITH f AS (
      |  SELECT user_id, event_type,
      |    date_trunc('day', min(date_trunc('second', ts))) AS day
      |  FROM events GROUP BY user_id, event_type),
      |d AS (SELECT event_type, day, count(*) AS new_users
      |      FROM f GROUP BY 1, 2)
      |SELECT event_type, day, new_users,
      |  CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS cum_users
      |FROM d
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------------
  // q244 — time-weighted average value (TWAP) per (event_type, day):
  // each observation holds until the next one (LEAD over a unique
  // (ts, event_id) order; the last holds to midnight), so the mean
  // weights each value by its holding duration — the correct
  // continuous-signal aggregate where a plain AVG over-weights bursts.
  // Integer-exact: value_e4 × seconds summed in DECIMAL(38,0), one
  // integer div at the end.
  //
  // Scale shape: ONE hash shuffle to (event_type, day) — the window
  // and the aggregate share it; nothing else touches the corpus.
  // ---------------------------------------------------------------------
  private def q244(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type"), col("ts_s"), col("event_id"),
        round(col("value") * 10000).cast("long").as("value_e4"))
      .withColumn("day", date_trunc("day", col("ts_s")))
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts_s"), col("event_id"))
    e.withColumn("next_ts",
        coalesce(lead(col("ts_s"), 1).over(w),
          col("day") + expr("INTERVAL 1 DAY")))
      .withColumn("dur_s",
        col("next_ts").cast("long") - col("ts_s").cast("long"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("dur_s")).as("covered_s"),
        expr("CAST(sum(CAST(value_e4 AS DECIMAL(38,0)) * dur_s) " +
          "div sum(dur_s) AS BIGINT)").as("twap_e4"))
      .orderBy(col("event_type"), col("day"))
  }

  private val q244Sql =
    """WITH e AS (
      |  SELECT event_type, date_trunc('second', ts) AS ts_s, event_id,
      |    CAST(round(value * 10000) AS BIGINT) AS value_e4,
      |    date_trunc('day', ts) AS day
      |  FROM events),
      |d AS (
      |  SELECT event_type, day, value_e4,
      |    CAST(epoch(COALESCE(
      |      LEAD(ts_s) OVER (PARTITION BY event_type, day
      |        ORDER BY ts_s, event_id),
      |      day + INTERVAL 1 DAY)) AS BIGINT)
      |    - CAST(epoch(ts_s) AS BIGINT) AS dur_s
      |  FROM e)
      |SELECT event_type, day, count(*) AS n_obs,
      |  CAST(sum(dur_s) AS BIGINT) AS covered_s,
      |  CAST(sum(CAST(value_e4 AS HUGEINT) * dur_s)
      |    // CAST(sum(dur_s) AS HUGEINT) AS BIGINT) AS twap_e4
      |FROM d
      |GROUP BY event_type, day
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------------
  // q245 — embedding drift between cohorts: per-element EXACT sums of
  // e6-scaled embeddings per cohort (the float vectors become longs
  // BEFORE any aggregation — float sums reorder under parallelism,
  // scaled-long sums don't), then consecutive cohorts compare by
  // mean-absolute-difference of their mean vectors, cross-multiplied
  // to avoid any division until the final e6 emit:
  // mad_e6 = Σ_pos |s_a·n_b − s_b·n_a| div (n_a·n_b·dims). The
  // monitoring query a production embedding pipeline runs per
  // ingest batch — a jump means the encoder or the corpus moved.
  //
  // Scale shape: posexplode → one shuffle to (cohort, pos) grain
  // (64·cohorts rows out); the cohort-pair compare is dimension-sized.
  // ---------------------------------------------------------------------
  private def q245(s: SparkSession, dir: String): DataFrame = {
    val dims = 64
    val sums = t(s, dir, "embeddings")
      .select((col("vec_id") % 7).as("cohort"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("cohort"), col("pos"),
        round(col("v") * 1000000).cast("long").as("v_e6"))
      .groupBy(col("cohort"), col("pos"))
      .agg(sum(col("v_e6")).as("s"), count(lit(1)).as("n"))
      .pin()
    sums.select(col("cohort").as("cohort_a"), col("pos"),
        col("s").as("sa"), col("n").as("na"))
      .join(sums.select((col("cohort") - 1).as("cohort_a"), col("pos"),
        col("s").as("sb"), col("n").as("nb")), Seq("cohort_a", "pos"))
      .groupBy(col("cohort_a"))
      .agg(first(col("na")).as("n_a"), first(col("nb")).as("n_b"),
        expr("CAST(sum(abs(CAST(sa AS DECIMAL(38,0)) * nb - " +
          s"CAST(sb AS DECIMAL(38,0)) * na)) div " +
          s"(first(na) * first(nb) * $dims) AS BIGINT)").as("mad_e6"))
      .select(col("cohort_a"), (col("cohort_a") + 1).as("cohort_b"),
        col("n_a"), col("n_b"), col("mad_e6"))
      .orderBy(col("cohort_a"))
  }

  private val q245Sql =
    """WITH x AS (
      |  SELECT vec_id % 7 AS cohort, pos - 1 AS pos,
      |    CAST(round(v * 1000000) AS BIGINT) AS v_e6
      |  FROM (SELECT vec_id, unnest(embedding) AS v,
      |          generate_subscripts(embedding, 1) AS pos
      |        FROM embeddings)),
      |s AS (
      |  SELECT cohort, pos, CAST(sum(v_e6) AS BIGINT) AS s,
      |    count(*) AS n
      |  FROM x GROUP BY 1, 2)
      |SELECT a.cohort AS cohort_a, a.cohort + 1 AS cohort_b,
      |  CAST(any_value(a.n) AS BIGINT) AS n_a,
      |  CAST(any_value(b.n) AS BIGINT) AS n_b,
      |  CAST(sum(abs(CAST(a.s AS HUGEINT) * b.n
      |    - CAST(b.s AS HUGEINT) * a.n))
      |    // (any_value(a.n) * any_value(b.n) * 64) AS BIGINT) AS mad_e6
      |FROM s a JOIN s b ON b.cohort = a.cohort + 1 AND b.pos = a.pos
      |GROUP BY a.cohort
      |ORDER BY cohort_a""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q244_twap" -> (q244 _),
    "q245_embedding_drift" -> (q245 _),
    "q238_k_anonymity" -> (q238 _),
    "q239_pmi_collocations" -> (q239 _),
    "q240_waterfill" -> (q240 _),
    "q241_scc" -> (q241 _),
    "q242_attribution" -> (q242 _),
    "q243_cumulative_uniques" -> (q243 _))

  val oracle: Map[String, String] = Map(
    "q244_twap" -> q244Sql,
    "q245_embedding_drift" -> q245Sql,
    "q238_k_anonymity" -> q238Sql,
    "q239_pmi_collocations" -> q239Sql,
    "q240_waterfill" -> q240Sql,
    "q241_scc" -> q241Sql,
    "q242_attribution" -> q242Sql,
    "q243_cumulative_uniques" -> q243Sql)
}
