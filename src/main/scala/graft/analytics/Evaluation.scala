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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q272_bandit_replay" -> (q272 _),
    "q273_conformal" -> (q273 _),
    "q274_kaplan_meier" -> (q274 _))

  val oracle: Map[String, String] = Map(
    "q272_bandit_replay" -> q272Sql,
    "q273_conformal" -> q273Sql,
    "q274_kaplan_meier" -> q274Sql)
}
