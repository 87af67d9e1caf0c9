package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.PlanStats.Pinned

/** Evaluation tier (session 7, continued): the offline-evaluation
  * harnesses a production ML/data platform runs on logged data —
  * off-policy bandit replay, split-conformal prediction intervals,
  * and Kaplan–Meier survival/retention curves. Integer-exact or
  * identical-IEEE-expression outputs, like the rest of the gate.
  */
object Evaluation {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------
  // q272 — off-policy bandit replay: learn a greedy policy (best arm =
  // event_type per weekday context by mean logged reward) on the first
  // 20 days, then evaluate it on the holdout days with the REPLAY
  // estimator — only logged rounds whose arm matches the policy's
  // choice count, the classic unbiased evaluation for uniformly logged
  // bandits (Li et al.'s replay method). The policy table is 7×5 rows
  // and broadcasts; both periods come off one events scan each; means
  // are single e-rounded divisions of exact long sums.
  // ---------------------------------------------------------------------
  private def q272(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(dayofweek(col("ts_s")).cast("long").as("ctx"),
        col("event_type").as("arm"),
        round(col("value") * 10000).cast("long").as("r_e4"),
        col("ts_s"))
    val train = e.filter(col("ts_s") < lit("2024-01-21"))
      .groupBy("ctx", "arm")
      .agg(count(lit(1)).as("n"), sum("r_e4").as("sum_e4"))
      .withColumn("rate_e6",
        round(col("sum_e4").cast("double") / col("n").cast("double")
          * 100.0).cast("long"))
    val best = Window.partitionBy("ctx")
      .orderBy(col("rate_e6").desc, col("arm"))
    val policy = train
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("ctx"), col("arm").as("policy_arm"),
        col("rate_e6").as("train_rate_e6"))
    e.filter(col("ts_s") >= lit("2024-01-21"))
      .join(policy, "ctx")
      .groupBy(col("ctx"), col("policy_arm"), col("train_rate_e6"))
      .agg(count(lit(1)).as("n_eval"),
        sum((col("arm") === col("policy_arm")).cast("long"))
          .as("n_matched"),
        sum(when(col("arm") === col("policy_arm"), col("r_e4"))
          .otherwise(lit(0L))).as("matched_r_e4"))
      .withColumn("replay_rate_e6",
        round(col("matched_r_e4").cast("double") /
          nullif(col("n_matched"), lit(0L)).cast("double") * 100.0)
          .cast("long"))
      .orderBy("ctx")
  }

  private val q272Sql =
    s"""WITH e AS (
       |  SELECT CAST(dayofweek(${Exact.secSql("ts")}) + 1 AS BIGINT) AS ctx,
       |    event_type AS arm,
       |    CAST(round(value * 10000) AS BIGINT) AS r_e4,
       |    ${Exact.secSql("ts")} AS ts_s
       |  FROM events),
       |train AS (
       |  SELECT ctx, arm, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(r_e4) AS BIGINT) AS sum_e4
       |  FROM e WHERE ts_s < TIMESTAMP '2024-01-21' GROUP BY 1, 2),
       |rated AS (
       |  SELECT ctx, arm,
       |    CAST(round(CAST(sum_e4 AS DOUBLE) / CAST(n AS DOUBLE) * 100.0)
       |      AS BIGINT) AS rate_e6
       |  FROM train),
       |policy AS (
       |  SELECT ctx, arm AS policy_arm, rate_e6 AS train_rate_e6
       |  FROM (SELECT *, row_number() OVER (PARTITION BY ctx
       |          ORDER BY rate_e6 DESC, arm) AS rn FROM rated)
       |  WHERE rn = 1),
       |ev AS (
       |  SELECT e.ctx, policy_arm, train_rate_e6,
       |    CAST(count(*) AS BIGINT) AS n_eval,
       |    CAST(sum(CASE WHEN arm = policy_arm THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_matched,
       |    CAST(sum(CASE WHEN arm = policy_arm THEN r_e4 ELSE 0 END)
       |      AS BIGINT) AS matched_r_e4
       |  FROM e JOIN policy ON e.ctx = policy.ctx
       |  WHERE ts_s >= TIMESTAMP '2024-01-21'
       |  GROUP BY 1, 2, 3)
       |SELECT ctx, policy_arm, train_rate_e6, n_eval, n_matched,
       |  matched_r_e4,
       |  CAST(round(CAST(matched_r_e4 AS DOUBLE)
       |    / CAST(NULLIF(n_matched, 0) AS DOUBLE) * 100.0) AS BIGINT)
       |    AS replay_rate_e6
       |FROM ev ORDER BY ctx""".stripMargin

  // ---------------------------------------------------------------------
  // q273 — split-conformal prediction intervals for the seasonal-naive
  // forecaster (the q268 predictor): calibration residuals on the
  // first ~4 months of 2001 yield q-hat = the ⌈(n+1)(1−α)⌉-th smallest
  // |residual| (α = 0.2, an exact order statistic — no interpolation),
  // and the guarantee is audited on the held-out days: coverage must
  // be ≥ 1−α in expectation. Everything is integer-exact: residuals
  // are e2 longs, q-hat is picked by row_number, coverage is a count.
  // ---------------------------------------------------------------------
  private def q273(s: SparkSession, dir: String): DataFrame = {
    // WEEK grain over the full 1995–2001 history: the day-grain series
    // is too sparse at tiny SFs for consecutive-period pairs to exist
    // (the conformal split needs a dense calibration set at every SF)
    val weekly = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("prio"),
        expr("datediff(o_orderdate, '1995-01-01') div 7").as("x"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y_e2"))
      .pin()
    val lag1 = weekly.select(col("prio"), (col("x") + 1).as("x"),
      col("y_e2").as("f_e2"))
    val resid = weekly.join(lag1, Seq("prio", "x"))
      .select(col("prio"), col("x"),
        abs(col("y_e2") - col("f_e2")).as("r_e2"))
      .pin()
    val cal = resid.filter(col("x") < 280)
    val nCal = cal.groupBy("prio").agg(count(lit(1)).as("n_cal"))
    val wR = Window.partitionBy("prio").orderBy("r_e2", "x")
    val qhat = cal
      .withColumn("rn", row_number().over(wR))
      .join(nCal, "prio")
      // k = ceil((n+1) * 0.8) as exact integer arithmetic (`div`, not
      // `/` — Column `/` is double division and would never equal rn)
      .filter(col("rn") === expr("((n_cal + 1) * 8 + 9) div 10"))
      .select(col("prio"), col("n_cal"), col("r_e2").as("qhat_e2"))
    resid.filter(col("x") >= 280)
      .join(qhat, "prio")
      .groupBy(col("prio"), col("n_cal"), col("qhat_e2"))
      .agg(count(lit(1)).as("n_test"),
        sum((col("r_e2") <= col("qhat_e2")).cast("long")).as("n_covered"))
      .orderBy("prio")
  }

  private val q273Sql =
    """WITH weekly AS (
      |  SELECT o_orderpriority AS prio,
      |    datediff('day', TIMESTAMP '1995-01-01', o_orderdate) // 7 AS x,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS y_e2
      |  FROM orders
      |  GROUP BY 1, 2),
      |resid AS (
      |  SELECT a.prio, a.x, abs(a.y_e2 - b.y_e2) AS r_e2
      |  FROM weekly a JOIN weekly b ON a.prio = b.prio AND b.x = a.x - 1),
      |cal AS (SELECT * FROM resid WHERE x < 280),
      |ncal AS (SELECT prio, CAST(count(*) AS BIGINT) AS n_cal
      |         FROM cal GROUP BY 1),
      |qh AS (
      |  SELECT c.prio, n.n_cal, c.r_e2 AS qhat_e2
      |  FROM (SELECT *, row_number() OVER (PARTITION BY prio
      |          ORDER BY r_e2, x) AS rn FROM cal) c
      |  JOIN ncal n ON c.prio = n.prio
      |  WHERE c.rn = ((n.n_cal + 1) * 8 + 9) // 10)
      |SELECT r.prio, qh.n_cal, qh.qhat_e2,
      |  CAST(count(*) AS BIGINT) AS n_test,
      |  CAST(sum(CASE WHEN r.r_e2 <= qh.qhat_e2 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_covered
      |FROM resid r JOIN qh ON r.prio = qh.prio
      |WHERE r.x >= 280
      |GROUP BY 1, 2, 3
      |ORDER BY r.prio""".stripMargin

  // ---------------------------------------------------------------------
  // q274 — Kaplan–Meier survival (retention) curve: user "lifetime" =
  // days between first and last event; users still active in the final
  // 3 days of the window are right-CENSORED (they leave the risk set
  // without counting as churn) — the estimator every retention
  // dashboard underneath is. At each distinct lifetime t:
  // S(t) = Π_{u≤t} (1 − d_u/n_u) over churn times, computed as
  // exp(Σ ln(1 − d/n)) with each step's ln e6-rounded (one IEEE
  // ln per DISTINCT lifetime — ≤ 30 of them — then an exact long sum,
  // then one exp; identical op order both engines). The curve stops
  // at extinction (d = n would be ln 0, where the engines' conventions
  // diverge) via a cumulative flag. One events scan → user grain →
  // lifetime grain; everything after the first aggregate is ≤ users
  // rows and the curve itself is ≤ 31 rows.
  // ---------------------------------------------------------------------
  private def q274(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.eventsSec(s, dir)
      .groupBy("user_id")
      .agg(min(col("ts_s").cast("long")).as("first_s"),
        max(col("ts_s").cast("long")).as("last_s"))
      .select(
        // integer `div`, never `/`+cast: Column `/` is double division
        // and DuckDB's `//` on DOUBLE doesn't floor either — both
        // sides do exact integer division on whole epoch seconds
        expr("(last_s - first_s) div 86400").as("lt"),
        // censor cutoff as an epoch literal (2024-01-28T00:00:00Z) —
        // a java.sql.Timestamp literal would parse in the JVM default
        // zone, not the session's UTC
        (col("last_s") < lit(1706400000L)).cast("long").as("churned"))
    val byT = users.groupBy("lt")
      .agg(count(lit(1)).as("ended"), sum("churned").as("d"))
    val wT = Window.orderBy("lt")
    val curve = byT
      .withColumn("n_risk",
        sum("ended").over(wT.rowsBetween(0, Window.unboundedFollowing)))
      .withColumn("l_e6",
        when(col("d") < col("n_risk"),
          round(log(lit(1.0) - col("d").cast("double") /
            col("n_risk").cast("double")) * 1000000.0).cast("long"))
          .otherwise(lit(null)))
      .withColumn("ext_before",
        coalesce(max((col("d") === col("n_risk")).cast("long"))
          .over(wT.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("ext_before") === 0)
    curve
      .withColumn("cum_l_e6",
        sum("l_e6").over(wT.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("lt"), col("n_risk"), col("d").as("n_churned"),
        when(col("d") === col("n_risk"), lit(0L))
          .otherwise(round(
            exp(col("cum_l_e6").cast("double") / 1000000.0) * 1000000.0)
            .cast("long")).as("surv_e6"))
      .orderBy("lt")
  }

  private val q274Sql =
    s"""WITH users AS (
       |  SELECT (CAST(max(epoch(${Exact.secSql("ts")})) AS BIGINT)
       |      - CAST(min(epoch(${Exact.secSql("ts")})) AS BIGINT))
       |      // 86400 AS lt,
       |    CAST(max(${Exact.secSql("ts")})
       |      < TIMESTAMP '2024-01-28 00:00:00' AS BIGINT) AS churned
       |  FROM events GROUP BY user_id),
       |byt AS (
       |  SELECT lt, CAST(count(*) AS BIGINT) AS ended,
       |    CAST(sum(churned) AS BIGINT) AS d
       |  FROM users GROUP BY lt),
       |risk AS (
       |  SELECT *, CAST(sum(ended) OVER (ORDER BY lt
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
       |    AS n_risk
       |  FROM byt),
       |logs AS (
       |  SELECT *,
       |    CASE WHEN d < n_risk THEN CAST(round(
       |      ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
       |      * 1000000.0) AS BIGINT) ELSE NULL END AS l_e6,
       |    COALESCE(CAST(max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
       |      OVER (ORDER BY lt
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS BIGINT), 0) AS ext_before
       |  FROM risk),
       |curve AS (
       |  SELECT *, CAST(sum(l_e6) OVER (ORDER BY lt
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_l_e6
       |  FROM logs WHERE ext_before = 0)
       |SELECT lt, n_risk, d AS n_churned,
       |  CASE WHEN d = n_risk THEN 0
       |    ELSE CAST(round(exp(CAST(cum_l_e6 AS DOUBLE) / 1000000.0)
       |      * 1000000.0) AS BIGINT) END AS surv_e6
       |FROM curve ORDER BY lt""".stripMargin

  // ---------------------------------------------------------------------
  // q348 — clipped n-gram precision (the BLEU modified-precision
  // core, corpus-graded): for each candidate/reference doc pair,
  // Σ_g min(cnt_cand(g), cnt_ref(g)) / Σ_g cnt_cand(g) over bigrams —
  // the clip is what stops "the the the" from scoring. Pairs come
  // from a BLOCKED pairing (docs sharing their first-3-word key,
  // each candidate matched to the next doc_id in its block via one
  // window lead — never all-pairs); gram matching is an equi-join on
  // (ref_id, gram). Rolled up per language: mean precision e6.
  // ---------------------------------------------------------------------
  private def q348(s: SparkSession, dir: String): DataFrame = {
    val w = graft.functions.Text.words(col("text"))
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("blk", concat_ws(" ", slice(w, 1, 3)))
    val pairs = docs
      .withColumn("ref_id", lead(col("doc_id"), 1).over(
        Window.partitionBy("blk").orderBy("doc_id")))
      .filter(col("ref_id").isNotNull)
      .select(col("doc_id").as("cand_id"), col("ref_id"), col("lang"))
    val grams = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.Text.shinglesFromTokens(
          graft.functions.Text.words(col("text")), 2)).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .pin() // both sides of the pair join read this grain
    val cg = grams.select(col("doc_id").as("cand_id"), col("gram"),
      col("cnt").as("c_cnt"))
    val rg = grams.select(col("doc_id").as("r_id"), col("gram").as("r_gram"),
      col("cnt").as("r_cnt"))
    pairs.join(cg, Seq("cand_id"))
      .join(rg, col("ref_id") === col("r_id") &&
        col("gram") === col("r_gram"), "left")
      .groupBy(col("cand_id"), col("lang"))
      .agg(sum(least(col("c_cnt"), coalesce(col("r_cnt"), lit(0L))))
        .as("clipped"), sum("c_cnt").as("total"))
      .select(col("lang"),
        round(col("clipped").cast("double") / col("total").cast("double")
          * 1000000.0).cast("long").as("prec_e6"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_pairs"), sum("prec_e6").as("sum_prec_e6"))
      .select(col("lang"), col("n_pairs"),
        round(col("sum_prec_e6").cast("double") /
          col("n_pairs").cast("double")).cast("long").as("mean_prec_e6"))
      .orderBy(col("lang"))
  }

  private val q348Sql =
    """WITH wl AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
      |  FROM documents),
      |blocked AS (
      |  SELECT doc_id, lang, array_to_string(ws[1:3], ' ') AS blk
      |  FROM wl),
      |pairs AS (
      |  SELECT doc_id AS cand_id,
      |    lead(doc_id, 1) OVER (PARTITION BY blk ORDER BY doc_id)
      |      AS ref_id,
      |    lang
      |  FROM blocked),
      |grams AS (
      |  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(len(ws) - 1),
      |        i -> ws[i + 1] || ' ' || ws[i + 2])) AS gram
      |    FROM wl WHERE len(ws) >= 2)
      |  GROUP BY 1, 2),
      |per_pair AS (
      |  SELECT p.cand_id, p.lang,
      |    CAST(sum(least(c.cnt, coalesce(r.cnt, 0))) AS BIGINT)
      |      AS clipped,
      |    CAST(sum(c.cnt) AS BIGINT) AS total
      |  FROM pairs p
      |  JOIN grams c ON c.doc_id = p.cand_id
      |  LEFT JOIN grams r ON r.doc_id = p.ref_id AND r.gram = c.gram
      |  WHERE p.ref_id IS NOT NULL
      |  GROUP BY 1, 2),
      |prec AS (
      |  SELECT lang,
      |    CAST(round(CAST(clipped AS DOUBLE) / CAST(total AS DOUBLE)
      |      * 1000000.0) AS BIGINT) AS prec_e6
      |  FROM per_pair)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(round(CAST(sum(prec_e6) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_prec_e6
      |FROM prec GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q349 — pass@k estimation (the HumanEval-style functional-
  // correctness metric): given n samples per task of which c are
  // correct, the unbiased estimator pass@k = 1 − C(n−c,k)/C(n,k)
  // = 1 − Π_{i<k}(n−c−i)/(n−i). Tasks are 20-sample groups over the
  // embeddings table; per-sample correctness is a deterministic hash
  // bit whose rate varies per task (difficulty 20–79%). The k-term
  // products are EXPLICIT integer factorials-in-miniature (n ≤ 20 →
  // products ≤ 20^10 ≈ 1e13, 6 digits inside INT64), one double
  // division at the end; the n−c < k degenerate case clamps to 1.
  // ---------------------------------------------------------------------
  private def q349(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val tasks = t(s, dir, "embeddings")
      .select((col("vec_id") / 20).cast("long").as("task"), col("vec_id"))
      .withColumn("diff", pmod(h.hash60(concat(lit("d:"), col("task"))),
        lit(60L)) + 20L)
      .withColumn("ok", (pmod(h.hash60(concat(lit("c:"), col("vec_id"))),
        lit(100L)) < col("diff")).cast("long"))
      .groupBy("task")
      .agg(count(lit(1)).as("n"), sum("ok").as("c"))
    def prodMiss(k: Int): org.apache.spark.sql.Column =
      (0 until k).map(i => (col("n") - col("c") - i))
        .reduce(_ * _).cast("double") /
        (0 until k).map(i => (col("n") - i)).reduce(_ * _).cast("double")
    def passK(k: Int): org.apache.spark.sql.Column =
      when(col("n") - col("c") < k, lit(1000000L))
        .otherwise(round((lit(1.0) - prodMiss(k)) * 1000000.0)
          .cast("long"))
    tasks.select(col("task"), col("n"), col("c"),
      passK(1).as("pass1_e6"), passK(5).as("pass5_e6"),
      passK(10).as("pass10_e6"))
      .orderBy(col("task"))
  }

  private val q349Sql = {
    val hd = graft.functions.PortableHash.hash60DuckSql(
      "'d:' || CAST(task AS VARCHAR)")
    val hc = graft.functions.PortableHash.hash60DuckSql(
      "'c:' || CAST(vec_id AS VARCHAR)")
    def num(k: Int) = (0 until k).map(i => s"(n - c - $i)").mkString(" * ")
    def den(k: Int) = (0 until k).map(i => s"(n - $i)").mkString(" * ")
    def passK(k: Int, alias: String) =
      s"""CASE WHEN n - c < $k THEN 1000000
         |    ELSE CAST(round((1.0 - CAST(${num(k)} AS DOUBLE)
         |      / CAST(${den(k)} AS DOUBLE)) * 1000000.0) AS BIGINT)
         |  END AS $alias""".stripMargin
    s"""WITH base AS (
       |  SELECT vec_id // 20 AS task, vec_id FROM embeddings),
       |bits AS (
       |  SELECT task, vec_id,
       |    CASE WHEN $hc % 100 < ($hd % 60) + 20 THEN 1 ELSE 0 END AS ok
       |  FROM base),
       |tasks AS (
       |  SELECT task, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(ok) AS BIGINT) AS c
       |  FROM bits GROUP BY 1)
       |SELECT task, n, c,
       |  ${passK(1, "pass1_e6")},
       |  ${passK(5, "pass5_e6")},
       |  ${passK(10, "pass10_e6")}
       |FROM tasks ORDER BY task""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q350 — Bradley–Terry strength fitting, two MM iterations (the
  // Chatbot-Arena-style pairwise-battle ranking): battles are
  // consecutive event pairs per user (lag over the time order —
  // "model" = event type, winner = larger value, ties to the earlier
  // event); the MM update p_i ← W_i / Σ_j n_ij/(p_i+p_j) (Hunter
  // 2004) runs twice from uniform init over the 5×5 battle matrix.
  // Every division is e-rounded to an integer AT the point it's
  // computed and every cross-term sum is an INTEGER sum (the q285
  // discipline) — no float accumulation order can diverge between
  // engines. The matrix grain is ≤ 25 rows; battles aggregate in one
  // map-side-combinable pass over the event pairs.
  // ---------------------------------------------------------------------
  private def q350(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("ts_s"), col("event_id"),
        col("event_type"), round(col("value") * 10000).cast("long")
          .as("v_e4"))
    val wSpec = Window.partitionBy("user_id")
      .orderBy(col("ts_s"), col("event_id"))
    val battles = e
      .withColumn("prev_type", lag(col("event_type"), 1).over(wSpec))
      .withColumn("prev_v", lag(col("v_e4"), 1).over(wSpec))
      .filter(col("prev_type").isNotNull &&
        col("prev_type") =!= col("event_type"))
      .select(col("prev_type").as("a"), col("event_type").as("b"),
        (col("v_e4") > col("prev_v")).cast("long").as("b_wins"))
    // symmetric battle matrix at the (i, j) grain, i ≠ j
    val m = battles.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"), sum("b_wins").as("b_w"))
    val matrix = m.select(col("a").as("i"), col("b").as("j"),
        col("n_ab"), (col("n_ab") - col("b_w")).as("w_ij"))
      .unionByName(m.select(col("b").as("i"), col("a").as("j"),
        col("n_ab"), col("b_w").as("w_ij")))
      .groupBy("i", "j")
      .agg(sum("n_ab").as("n_ij"), sum("w_ij").as("w_ij"))
      .pin() // both MM iterations read it
    val wins = matrix.groupBy(col("i"))
      .agg(sum("w_ij").as("w_i"), sum("n_ij").as("n_i"))
    // iteration 1 from p = 1: p_i = W_i / (N_i / 2), e9-rounded
    val p1 = wins.select(col("i").as("k1"),
      round(col("w_i").cast("double") * 2.0 / col("n_i").cast("double")
        * 1000000000.0).cast("long").as("p_e9"))
    // iteration 2: denominator terms n_ij/(p_i+p_j), each e6-rounded
    // THEN integer-summed — order-independent across engines
    val p2den = matrix
      .join(broadcast(p1), col("i") === col("k1"))
      .withColumnRenamed("p_e9", "pi_e9").drop("k1")
      .join(broadcast(p1.withColumnRenamed("k1", "k2")
        .withColumnRenamed("p_e9", "pj_e9")), col("j") === col("k2"))
      .groupBy(col("i"))
      .agg(sum(round(col("n_ij").cast("double") * 1.0e9 /
        (col("pi_e9") + col("pj_e9")).cast("double") * 1000000.0)
        .cast("long")).as("den_e6"))
    val p2 = wins.join(p2den, Seq("i"))
      .select(col("i"), col("w_i"), col("n_i"),
        round(col("w_i").cast("double") / col("den_e6").cast("double")
          * 1.0e6 * 1000000000.0).cast("long").as("p2_e9"))
    val tot = p2.agg(sum("p2_e9").as("tot_e9"))
    p2.crossJoin(broadcast(tot))
      .select(col("i").as("model"), col("w_i").as("wins"),
        col("n_i").as("n_battles"),
        round(col("p2_e9").cast("double") / col("tot_e9").cast("double")
          * 1000000.0).cast("long").as("strength_e6"))
      .orderBy(col("model"))
  }

  private val q350Sql =
    """WITH e AS (
      |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id,
      |    event_type, CAST(round(value * 10000) AS BIGINT) AS v_e4
      |  FROM events),
      |lagged AS (
      |  SELECT event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts_s, event_id) AS prev_type,
      |    v_e4,
      |    lag(v_e4) OVER (PARTITION BY user_id
      |      ORDER BY ts_s, event_id) AS prev_v
      |  FROM e),
      |battles AS (
      |  SELECT prev_type AS a, event_type AS b,
      |    CASE WHEN v_e4 > prev_v THEN 1 ELSE 0 END AS b_wins
      |  FROM lagged
      |  WHERE prev_type IS NOT NULL AND prev_type <> event_type),
      |m AS (
      |  SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab,
      |    CAST(sum(b_wins) AS BIGINT) AS b_w
      |  FROM battles GROUP BY 1, 2),
      |matrix AS (
      |  SELECT i, j, CAST(sum(n_ab) AS BIGINT) AS n_ij,
      |    CAST(sum(w_ij) AS BIGINT) AS w_ij
      |  FROM (
      |    SELECT a AS i, b AS j, n_ab, n_ab - b_w AS w_ij FROM m
      |    UNION ALL
      |    SELECT b AS i, a AS j, n_ab, b_w AS w_ij FROM m)
      |  GROUP BY 1, 2),
      |wins AS (
      |  SELECT i, CAST(sum(w_ij) AS BIGINT) AS w_i,
      |    CAST(sum(n_ij) AS BIGINT) AS n_i
      |  FROM matrix GROUP BY 1),
      |p1 AS (
      |  SELECT i AS k1,
      |    CAST(round(CAST(w_i AS DOUBLE) * 2.0 / CAST(n_i AS DOUBLE)
      |      * 1000000000.0) AS BIGINT) AS p_e9
      |  FROM wins),
      |p2den AS (
      |  SELECT matrix.i,
      |    CAST(sum(CAST(round(CAST(n_ij AS DOUBLE) * 1e9
      |      / CAST(pi.p_e9 + pj.p_e9 AS DOUBLE) * 1000000.0)
      |      AS BIGINT)) AS BIGINT) AS den_e6
      |  FROM matrix
      |  JOIN p1 pi ON matrix.i = pi.k1
      |  JOIN p1 pj ON matrix.j = pj.k1
      |  GROUP BY 1),
      |p2 AS (
      |  SELECT wins.i, w_i, n_i,
      |    CAST(round(CAST(w_i AS DOUBLE) / CAST(den_e6 AS DOUBLE)
      |      * 1e6 * 1000000000.0) AS BIGINT) AS p2_e9
      |  FROM wins JOIN p2den ON wins.i = p2den.i),
      |tot AS (SELECT CAST(sum(p2_e9) AS BIGINT) AS tot_e9 FROM p2)
      |SELECT i AS model, w_i AS wins, n_i AS n_battles,
      |  CAST(round(CAST(p2_e9 AS DOUBLE) / CAST(tot_e9 AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS strength_e6
      |FROM p2, tot ORDER BY model""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q272_bandit_replay" -> (q272 _),
    "q273_conformal" -> (q273 _),
    "q274_kaplan_meier" -> (q274 _),
    "q348_ngram_precision" -> (q348 _),
    "q349_pass_at_k" -> (q349 _),
    "q350_bradley_terry" -> (q350 _))

  val oracle: Map[String, String] = Map(
    "q272_bandit_replay" -> q272Sql,
    "q273_conformal" -> q273Sql,
    "q274_kaplan_meier" -> q274Sql,
    "q348_ngram_precision" -> q348Sql,
    "q349_pass_at_k" -> q349Sql,
    "q350_bradley_terry" -> q350Sql)
}
