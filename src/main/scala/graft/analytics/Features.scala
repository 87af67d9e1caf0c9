package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.PlanStats.Pinned
import graft.functions.PortableHash
import graft.operators.Curate

/** Feature-engineering tier (session 10): the derived-signal
  * operators an ML platform computes from the warehouse — item-item
  * co-occurrence lift (the association-rule / recsys-candidate
  * primitive) and leakage-free out-of-fold target encoding (the
  * categorical-feature primitive whose naive form silently leaks the
  * label). No reference analogue; cross-engine discipline as
  * everywhere: exact integer counts, one rounded division at the
  * end, portable-hash fold assignment identical in both engines.
  */
object Features {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------
  // q332 — co-purchase lift: for part pairs bought together in ≥2
  // orders, lift = P(a,b) / (P(a)·P(b)) against order-count
  // marginals; top 50 by lift. The pair generator self-joins the
  // DISTINCT (order, part) grain on the order key — co-partitioned,
  // and per-basket output is d² with d bounded by the order's line
  // count (≤17 across every scale here; baskets are small by
  // construction of the domain, so 100 TB grows the number of
  // baskets, not the per-basket quadratic). Marginal joins are plain
  // equi-joins on the part key (AQE broadcasts them at dimension
  // scale); the final readout is a bounded TakeOrdered, never a
  // global sort. The (order, part) grain feeds three branches
  // (pairs ×2, marginals) and is pinned once.
  // ---------------------------------------------------------------------
  private def q332(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .pin() // feeds both self-join sides and the marginal counts
    val nOrders = items.agg(countDistinct(col("ok")).as("n_orders"))
    val marg = items.groupBy(col("pk")).agg(count(lit(1)).as("c"))
    val pairs = items.select(col("ok"), col("pk").as("pk_a"))
      .join(items.select(col("ok"), col("pk").as("pk_b")), Seq("ok"))
      .filter(col("pk_a") < col("pk_b"))
      .groupBy(col("pk_a"), col("pk_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 2)
    pairs
      .join(marg.select(col("pk").as("pk_a"), col("c").as("c_a")), Seq("pk_a"))
      .join(marg.select(col("pk").as("pk_b"), col("c").as("c_b")), Seq("pk_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("pk_a"), col("pk_b"), col("c_a"), col("c_b"), col("c_ab"),
        round(col("c_ab").cast("double") * col("n_orders") * 1000000.0 /
          (col("c_a") * col("c_b"))).cast("long").as("lift_e6"))
      .orderBy(col("lift_e6").desc, col("pk_a"), col("pk_b"))
      .limit(50)
  }

  private val q332Sql =
    """WITH items AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |n AS (SELECT count(DISTINCT ok) AS n_orders FROM items),
      |marg AS (SELECT pk, count(*) AS c FROM items GROUP BY pk),
      |pc AS (
      |  SELECT a.pk AS pk_a, b.pk AS pk_b, count(*) AS c_ab
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT pk_a, pk_b, ia.c AS c_a, ib.c AS c_b, c_ab,
      |  CAST(round(c_ab * n_orders * 1000000.0 / (ia.c * ib.c)) AS BIGINT)
      |    AS lift_e6
      |FROM pc
      |JOIN marg ia ON pc.pk_a = ia.pk
      |JOIN marg ib ON pc.pk_b = ib.pk
      |CROSS JOIN n
      |ORDER BY lift_e6 DESC, pk_a, pk_b
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------------
  // q335 — out-of-fold target encoding: the leakage-free categorical
  // encoding — each (category, fold) cell's encoded value is the
  // target mean over every OTHER fold, (POS_cat − pos_cell) /
  // (N_cat − n_cell), so a row never contributes to its own feature.
  // Fold assignment is the portable hash (identical in both
  // engines); the target is a fixed-literal price threshold. One
  // combine-enabled aggregate to the 25-cell (category × fold)
  // grain, re-aggregated to category and joined back broadcast-size
  // — at 100 TB the fact scan is the only full pass. The cell grain
  // feeds two branches and is pinned (25 rows).
  // ---------------------------------------------------------------------
  private def q335(s: SparkSession, dir: String): DataFrame = {
    val fold = pmod(PortableHash.hash60(
      concat(lit("fold:"), col("o_orderkey"))), lit(5L))
    val cells = t(s, dir, "orders")
      .select(col("o_orderpriority").as("cat"), fold.as("fold"),
        when(col("o_totalprice") > 250000.0, 1L).otherwise(0L).as("y"))
      .groupBy(col("cat"), col("fold"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .pin() // feeds the per-category re-aggregate AND the final join
    val cat = cells.groupBy(col("cat"))
      .agg(sum(col("n")).as("n_cat"), sum(col("pos")).as("pos_cat"))
    cells.join(broadcast(cat), Seq("cat"))
      .select(col("cat"), col("fold"), col("n"),
        col("pos").cast("long").as("pos"),
        round((col("pos_cat") - col("pos")).cast("double") * 1000000.0 /
          (col("n_cat") - col("n")).cast("double")).cast("long")
          .as("oof_mean_e6"))
      .orderBy(col("cat"), col("fold"))
  }

  private val q335Sql = {
    val h = PortableHash.hash60DuckSql("'fold:' || CAST(o_orderkey AS VARCHAR)")
    s"""WITH cells AS (
       |  SELECT o_orderpriority AS cat, $h % 5 AS fold,
       |    count(*) AS n,
       |    CAST(sum(CASE WHEN o_totalprice > 250000.0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS pos
       |  FROM orders GROUP BY 1, 2),
       |cat AS (
       |  SELECT cat, CAST(sum(n) AS BIGINT) AS n_cat,
       |    CAST(sum(pos) AS BIGINT) AS pos_cat
       |  FROM cells GROUP BY cat)
       |SELECT cells.cat AS cat, fold, n, pos,
       |  CAST(round((pos_cat - pos) * 1000000.0 / (n_cat - n)) AS BIGINT)
       |    AS oof_mean_e6
       |FROM cells JOIN cat USING (cat)
       |ORDER BY cat, fold""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q336 — session-transition census: the first-order Markov
  // transition table over user event streams — for consecutive
  // same-user events within a 4 h gap, count (from_type → to_type)
  // and the conditional probability per source type. The only
  // window is user-partitioned (never a funnel: per-user event
  // streams are bounded by human behavior); the census aggregate is
  // combine-enabled to the ≤|types|² grain and its marginal re-join
  // is broadcast-size. The grain feeds two branches and is pinned
  // (25 rows). Second-truncated timestamps per the cross-engine ns
  // contract.
  // ---------------------------------------------------------------------
  private def q336(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_l", "event_id")
    val trans = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Exact.epochS(col("ts_s")).cast("long").as("ts_l"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .withColumn("gap", lead("ts_l", 1).over(w) - col("ts_l"))
      .filter(col("to_type").isNotNull && col("gap") <= 14400L)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .pin() // feeds the from-marginals AND the final join (≤25 rows)
    val marg = trans.groupBy(col("from_type"))
      .agg(sum(col("n")).cast("long").as("n_from"))
    trans.join(broadcast(marg), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") * 1000000.0 /
          col("n_from").cast("double")).cast("long").as("p_e6"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val q336Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_l
      |  FROM events),
      |t AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER w AS to_type,
      |    lead(ts_l) OVER w - ts_l AS gap
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_l, event_id)),
      |c AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM t WHERE to_type IS NOT NULL AND gap <= 14400
      |  GROUP BY 1, 2),
      |f AS (
      |  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
      |  FROM c GROUP BY 1)
      |SELECT from_type, to_type, n,
      |  CAST(round(n * 1000000.0 / n_from) AS BIGINT) AS p_e6
      |FROM c JOIN f USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  // ---------------------------------------------------------------------
  // q337 — last-touch attribution: each purchase is attributed to
  // the SAME user's most recent preceding click within a 7-day
  // lookback — the as-of-join-on-self shape, expressed as one
  // user-partitioned carry-forward window (running max of click
  // timestamps over preceding rows) instead of a range self-join:
  // one shuffle on user, zero joins, and the lookback bound is a
  // post-filter on the carried value. Day-grain rollup reports
  // attribution coverage and the exact total click→purchase delay.
  // ---------------------------------------------------------------------
  private def q337(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_l", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.eventsSec(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_s"), Exact.epochS(col("ts_s")).cast("long").as("ts_l"))
      .withColumn("last_click",
        max(when(col("event_type") === "click", col("ts_l"))).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("delay", col("ts_l") - col("last_click"))
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("delay") <= 604800L, 1L).otherwise(0L))
          .cast("long").as("n_attributed_7d"),
        sum(when(col("delay") <= 86400L, 1L).otherwise(0L))
          .cast("long").as("n_attributed_1d"),
        sum(when(col("delay") <= 604800L, col("delay")).otherwise(0L))
          .cast("long").as("total_delay_s"))
      .withColumn("attr_share_e6",
        round(col("n_attributed_7d").cast("double") * 1000000.0 /
          col("n_purchases").cast("double")).cast("long"))
      .orderBy(col("day"))
  }

  private val q337Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    date_trunc('second', ts) AS ts_s,
      |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_l
      |  FROM events),
      |attr AS (
      |  SELECT ts_s, ts_l,
      |    ts_l - max(CASE WHEN event_type = 'click' THEN ts_l END)
      |      OVER (PARTITION BY user_id ORDER BY ts_l, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS delay,
      |    event_type
      |  FROM e),
      |per AS (
      |  SELECT CAST(ts_s AS DATE) AS day, count(*) AS n_purchases,
      |    CAST(sum(CASE WHEN delay <= 604800 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_attributed_7d,
      |    CAST(sum(CASE WHEN delay <= 86400 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_attributed_1d,
      |    CAST(sum(CASE WHEN delay <= 604800 THEN delay ELSE 0 END)
      |      AS BIGINT) AS total_delay_s
      |  FROM attr WHERE event_type = 'purchase'
      |  GROUP BY 1)
      |SELECT day, n_purchases, n_attributed_7d, n_attributed_1d,
      |  total_delay_s,
      |  CAST(round(n_attributed_7d * 1000000.0 / n_purchases) AS BIGINT)
      |    AS attr_share_e6
      |FROM per
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // q338 — numeric-feature drift monitor: order value binned into
  // GLOBAL deciles (over the combined population, so both cohorts
  // share one bin edge set), then a chi-square contrast of the
  // early/late cohorts per bin — the standard ML-observability
  // check that a feature's distribution moved between a reference
  // window and the current one. Deciling routes through
  // Curate.globalRank (range repartition + offsets; never an
  // unpartitioned window) with the exact NTILE rule on the rank;
  // everything after is a 10-row grain. The chi-square arithmetic
  // is the identical IEEE expression tree in both engines, one
  // rounded e6 at the end.
  // ---------------------------------------------------------------------
  private def q338(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        when(col("o_orderdate") < lit("1998-07-01"), 1L).otherwise(0L)
          .as("is_a"))
    val ranked = Curate.globalRank(scored,
      Seq(col("o_totalprice"), col("o_orderkey")))
    val tot = ranked.agg(count(lit(1)).as("n_total"),
      sum(col("is_a")).cast("long").as("n_a_tot"))
    val binned = ranked.crossJoin(broadcast(tot))
      .withColumn("decile",
        when(col("rnk") <= expr("(n_total % 10) * (n_total DIV 10 + 1)"),
          expr("(rnk - 1) DIV (n_total DIV 10 + 1) + 1"))
        .otherwise(expr("""n_total % 10
          + (rnk - (n_total % 10) * (n_total DIV 10 + 1) - 1)
            DIV (n_total DIV 10) + 1""")))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("nd"),
        sum(col("is_a")).cast("long").as("n_a"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        max(col("n_total")).as("n_total"),
        max(col("n_a_tot")).as("n_a_tot"))
    val ea = col("nd").cast("double") * col("n_a_tot") / col("n_total")
    val eb = col("nd").cast("double") * (col("n_total") - col("n_a_tot")) /
      col("n_total")
    val da = col("n_a").cast("double") - ea
    val db = (col("nd") - col("n_a")).cast("double") - eb
    binned.select(col("decile"), col("nd"), col("n_a"),
        (col("nd") - col("n_a")).as("n_b"), col("lo"), col("hi"),
        round((da * da / ea + db * db / eb) * 1000000.0).cast("long")
          .as("chi2_e6"))
      .orderBy(col("decile"))
  }

  private val q338Sql =
    """WITH scored AS (
      |  SELECT o_orderkey, o_totalprice,
      |    CASE WHEN o_orderdate < TIMESTAMP '1998-07-01'
      |      THEN 1 ELSE 0 END AS is_a
      |  FROM orders),
      |tot AS (
      |  SELECT count(*) AS n_total, CAST(sum(is_a) AS BIGINT) AS n_a_tot
      |  FROM scored),
      |binned AS (
      |  SELECT o_totalprice, is_a,
      |    CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
      |      AS BIGINT) AS decile
      |  FROM scored),
      |agg AS (
      |  SELECT decile, count(*) AS nd, CAST(sum(is_a) AS BIGINT) AS n_a,
      |    min(o_totalprice) AS lo, max(o_totalprice) AS hi
      |  FROM binned GROUP BY decile)
      |SELECT decile, nd, n_a, nd - n_a AS n_b, lo, hi,
      |  CAST(round((
      |      (CAST(n_a AS DOUBLE) - CAST(nd AS DOUBLE) * n_a_tot / n_total)
      |    * (CAST(n_a AS DOUBLE) - CAST(nd AS DOUBLE) * n_a_tot / n_total)
      |    / (CAST(nd AS DOUBLE) * n_a_tot / n_total)
      |    + (CAST(nd - n_a AS DOUBLE)
      |       - CAST(nd AS DOUBLE) * (n_total - n_a_tot) / n_total)
      |    * (CAST(nd - n_a AS DOUBLE)
      |       - CAST(nd AS DOUBLE) * (n_total - n_a_tot) / n_total)
      |    / (CAST(nd AS DOUBLE) * (n_total - n_a_tot) / n_total)
      |  ) * 1000000.0) AS BIGINT) AS chi2_e6
      |FROM agg CROSS JOIN tot
      |ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------------
  // q341 — point-in-time churn label generation: the leakage-prone
  // ML-data op done right — features are computed STRICTLY before
  // the cutoff (14-day activity window), the label strictly after
  // (inactive on the next day), in one conditional aggregate per
  // user so no future information can reach a feature column. The
  // readout banks users by feature-window activity and reports the
  // churn base rate per band (the sanity table a label pipeline
  // ships with). One scan, user-grain combine aggregate, ≤6-row
  // output. Second-truncated timestamps per the ns contract.
  // ---------------------------------------------------------------------
  private def q341(s: SparkSession, dir: String): DataFrame = {
    val cutoff = "2024-01-22 00:00:00"
    val featLo = "2024-01-08 00:00:00"
    val labelHi = "2024-01-23 00:00:00"
    Tables.eventsSec(s, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts_s") >= lit(featLo) && col("ts_s") < lit(cutoff),
          1L).otherwise(0L)).as("n_feat"),
        sum(when(col("ts_s") >= lit(cutoff) && col("ts_s") < lit(labelHi),
          1L).otherwise(0L)).as("n_future"))
      .select(least(col("n_feat") / 10, lit(5L)).cast("long").as("band"),
        when(col("n_future") === 0L, 1L).otherwise(0L).as("churned"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("churned")).cast("long").as("n_churned"))
      .withColumn("churn_rate_e6",
        round(col("n_churned").cast("double") * 1000000.0 /
          col("n_users").cast("double")).cast("long"))
      .orderBy(col("band"))
  }

  private val q341Sql =
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN date_trunc('second', ts)
      |          >= TIMESTAMP '2024-01-08 00:00:00'
      |        AND date_trunc('second', ts)
      |          < TIMESTAMP '2024-01-22 00:00:00'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_feat,
      |    CAST(sum(CASE WHEN date_trunc('second', ts)
      |          >= TIMESTAMP '2024-01-22 00:00:00'
      |        AND date_trunc('second', ts)
      |          < TIMESTAMP '2024-01-23 00:00:00'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_future
      |  FROM events GROUP BY user_id),
      |labeled AS (
      |  SELECT least(n_feat // 10, 5) AS band,
      |    CASE WHEN n_future = 0 THEN 1 ELSE 0 END AS churned
      |  FROM u)
      |SELECT band, count(*) AS n_users,
      |  CAST(sum(churned) AS BIGINT) AS n_churned,
      |  CAST(round(sum(churned) * 1000000.0 / count(*)) AS BIGINT)
      |    AS churn_rate_e6
      |FROM labeled
      |GROUP BY band
      |ORDER BY band""".stripMargin

  // ---------------------------------------------------------------------
  // q342 — discount-response curve: quantity response per integer
  // discount band (0–10 %), with arc elasticity between adjacent
  // bands — (Δq̄/q̄_prev)/(Δd/d_prev), null at the zero-discount
  // band where the denominator is undefined. Quantities are
  // integral doubles, summed as exact BIGINTs; the band grain is 11
  // rows, so the adjacent-band self-join is broadcast and the
  // elasticity arithmetic is one identical IEEE expression tree in
  // both engines with a single rounded e6 at the end.
  // ---------------------------------------------------------------------
  private def q342(s: SparkSession, dir: String): DataFrame = {
    val bands = t(s, dir, "lineitem")
      .select(round(col("l_discount") * 100).cast("long").as("band"),
        col("l_quantity").cast("long").as("q"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), sum(col("q")).cast("long").as("sum_q"))
      .pin() // feeds both sides of the adjacent-band join (11 rows)
    val avg = col("sum_q").cast("double") / col("n")
    val cur = bands.select(col("band"), col("n"), col("sum_q"),
      avg.as("avg_q"))
    val prev = bands.select((col("band") + 1).as("band"),
      col("n").as("n_prev"), avg.as("avg_prev"))
    cur.join(broadcast(prev), Seq("band"), "left")
      .select(col("band"), col("n"),
        round(col("avg_q") * 1000000.0).cast("long").as("avg_qty_e6"),
        when(col("avg_prev").isNotNull && col("band") > 1,
          round((col("avg_q") - col("avg_prev")) / col("avg_prev") /
            ((col("band").cast("double") -
              (col("band") - 1).cast("double")) /
              (col("band") - 1).cast("double")) * 1000000.0)
            .cast("long"))
          .otherwise(lit(null).cast("long")).as("elasticity_e6"))
      .orderBy(col("band"))
  }

  private val q342Sql =
    """WITH bands AS MATERIALIZED (
      |  SELECT CAST(round(l_discount * 100) AS BIGINT) AS band,
      |    count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q
      |  FROM lineitem GROUP BY 1)
      |SELECT c.band AS band, c.n AS n,
      |  CAST(round(CAST(c.sum_q AS DOUBLE) / c.n * 1000000.0) AS BIGINT)
      |    AS avg_qty_e6,
      |  CASE WHEN p.band IS NOT NULL AND c.band > 1 THEN
      |    CAST(round(
      |      (CAST(c.sum_q AS DOUBLE) / c.n
      |        - CAST(p.sum_q AS DOUBLE) / p.n)
      |      / (CAST(p.sum_q AS DOUBLE) / p.n)
      |      / ((CAST(c.band AS DOUBLE) - CAST(c.band - 1 AS DOUBLE))
      |         / CAST(c.band - 1 AS DOUBLE))
      |      * 1000000.0) AS BIGINT)
      |  ELSE NULL END AS elasticity_e6
      |FROM bands c
      |LEFT JOIN bands p ON p.band = c.band - 1
      |ORDER BY band""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q341_churn_labels" -> (q341 _),
    "q342_discount_curve" -> (q342 _),
    "q332_copurchase_lift" -> (q332 _),
    "q335_oof_target_encoding" -> (q335 _),
    "q336_transition_census" -> (q336 _),
    "q337_lasttouch_attribution" -> (q337 _),
    "q338_decile_drift" -> (q338 _))

  val oracle: Map[String, String] = Map(
    "q341_churn_labels" -> q341Sql,
    "q342_discount_curve" -> q342Sql,
    "q332_copurchase_lift" -> q332Sql,
    "q335_oof_target_encoding" -> q335Sql,
    "q336_transition_census" -> q336Sql,
    "q337_lasttouch_attribution" -> q337Sql,
    "q338_decile_drift" -> q338Sql)
}
