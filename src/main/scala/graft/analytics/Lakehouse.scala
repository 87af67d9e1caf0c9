package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{AsOfJoin, Layout, MergeByKey, Validate}
import Exact._
import graft.core.PlanStats.Pinned

/** Lakehouse-maintenance and feature-hygiene gate queries (round 3
  * closing tier): bucketed co-located joins, sketch-state maintenance,
  * snapshot reconciliation, attribution, survivorship, dynamic
  * partition overwrite, decayed time-series features, exact-sums
  * regression, and null-safe joins.
  *
  * Reference anchors: the layout/maintenance ops generalize the
  * reference's index strategy (`lambda/trips_lambda.py:81-84` — at
  * Spark scale an "index" is a layout) and its daily partition
  * re-derivation (`lambda/trips_lambda.py:218-221`); the rest extends
  * the warehouse surface per SURVEY.md §2.12.
  */
object Lakehouse {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Per-invocation-stable suffix so concurrent sessions on different
    * sf dirs never collide on table names or temp paths. 64 bits of
    * md5, not `String.hashCode`: a 31-bit hash makes a cross-session
    * collision (two sf dirs, same suffix, catalog tables overwriting
    * each other) plausible; 64 bits does not. */
  private def tag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString

  private def tmp(name: String, dir: String): String =
    sys.props("java.io.tmpdir").stripSuffix("/") +
      s"/graft_${name}_${tag(dir)}"

  // ---------------------------------------------------------------------
  // q117 — bucketed co-located join: both tables are written
  // hash-bucketed by their join key (8 buckets, bucket-sorted), then
  // joined through the catalog. The scans report hash distribution +
  // sort order, so the sort-merge join consumes them with ZERO
  // exchange and zero sort on either side (plan-locked in
  // PlanQualitySpec). This is the 100 TB play: pay one layout shuffle
  // at write time, never shuffle the fact table at query time again.
  // The write is part of the measured op — this is an ingest-boundary
  // gate like q55, and the layout cost is the honest price of the op.
  // ---------------------------------------------------------------------
  private def q117(s: SparkSession, dir: String): DataFrame = {
    val tg = tag(dir)
    val (tOrders, tLine) = (s"graft_bo_$tg", s"graft_bl_$tg")
    s.sql(s"DROP TABLE IF EXISTS $tOrders")
    s.sql(s"DROP TABLE IF EXISTS $tLine")
    val base = tmp("bucketed", dir)
    Layout.bucketedWrite(
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
      tOrders, s"$base/orders", "o_orderkey", numBuckets = 8)
    Layout.bucketedWrite(
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice")),
      tLine, s"$base/lineitem", "l_orderkey", numBuckets = 8)
    Layout.bucketedJoin(s, tOrders, "o_orderkey", tLine, "l_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        fixedSum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  private val q117Sql =
    s"""SELECT o_orderpriority,
       |  count(*) AS n_items,
       |  ${fixedSumSql("l_extendedprice")} AS revenue
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q118 — HLL sketch-state maintenance (the q41 discipline for
  // PARTIAL sketches): per-(priority, month) HLL sketches are built
  // independently — the incremental-load shape, one sketch per batch
  // — then merged with hll_union_agg per priority. The merged
  // estimate must land within the sketch's error envelope of the
  // exact distributed count. At 100 TB nobody recounts distincts from
  // raw on every load; maintained sketch state is the standard
  // answer, and this gate proves merge-then-estimate works.
  // ---------------------------------------------------------------------
  private def q118(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val partials = o
      .groupBy(col("o_orderpriority"), month(col("o_orderdate")).as("m"))
      .agg(expr("hll_sketch_agg(o_custkey, 12)").as("sk"))
    val merged = partials
      .groupBy(col("o_orderpriority"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
    val exact = o.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_custs"))
    exact.join(merged, "o_orderpriority")
      .select(col("o_orderpriority"), col("exact_custs"),
        when(abs(col("est") - col("exact_custs")) <=
          col("exact_custs") * 0.1, 1L).otherwise(0L).as("merged_est_ok"))
      .orderBy(col("o_orderpriority"))
  }

  private val q118Sql =
    """SELECT o_orderpriority,
      |  count(DISTINCT o_custkey) AS exact_custs,
      |  CAST(1 AS BIGINT) AS merged_est_ok
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q119 — snapshot reconciliation: v2 is v1 with a deterministic
  // perturbation (keys ≡0 mod 97 dropped, ≡0 mod 101 repriced, ≡0
  // mod 103 cloned under new keys), and the diff must classify every
  // key. One full-outer join on the key comparing a 60-bit row
  // digest — the repair-plan companion to q101's table checksum
  // (which only says WHETHER the copies diverged).
  // ---------------------------------------------------------------------
  private def q119(s: SparkSession, dir: String): DataFrame = {
    val v1 = t(s, dir, "orders").select(
      col("o_orderkey").as("key"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_orderstatus").as("status"))
    val v2 = v1.filter(col("key") % 97 =!= 0)
      .withColumn("cents",
        when(col("key") % 101 === 0, col("cents") + 100)
          .otherwise(col("cents")))
      .unionByName(v1.filter(col("key") % 103 === 0)
        .withColumn("key", col("key") + 1000000000L))
    Validate.tableDiff(v1, v2, col("key"),
        concat_ws("|", col("cents"), col("status")))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("key") % 1000003).as("key_checksum"))
      .orderBy(col("change_type"))
  }

  private val q119Sql =
    """WITH v1 AS (
      |  SELECT o_orderkey AS key,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    o_orderstatus AS status
      |  FROM orders),
      |v2 AS (
      |  SELECT key,
      |    cents + CASE WHEN key % 101 = 0 THEN 100 ELSE 0 END AS cents,
      |    status
      |  FROM v1 WHERE key % 97 <> 0
      |  UNION ALL
      |  SELECT key + 1000000000, cents, status FROM v1 WHERE key % 103 = 0),
      |d AS (
      |  SELECT coalesce(a.key, b.key) AS key,
      |    CASE WHEN a.key IS NULL THEN 'added'
      |         WHEN b.key IS NULL THEN 'removed'
      |         WHEN a.cents = b.cents AND a.status = b.status
      |           THEN 'unchanged'
      |         ELSE 'changed' END AS change_type
      |  FROM v1 a FULL OUTER JOIN v2 b ON a.key = b.key)
      |SELECT change_type, count(*) AS n,
      |  CAST(sum(key % 1000003) AS BIGINT) AS key_checksum
      |FROM d
      |GROUP BY change_type
      |ORDER BY change_type""".stripMargin

  // ---------------------------------------------------------------------
  // q120 — last-touch attribution: each purchase is attributed to the
  // same user's most recent click/view no older than 3600 s. The
  // backward as-of join with tolerance (AsOfJoin's single-shuffle
  // union-and-carry core — never a range join) applied to a
  // self-derived event split: the marketing-analytics twin of the
  // reference's weather-by-time enrichment (inferred J2,
  // `lambda/trips_lambda.py:68-72`).
  // ---------------------------------------------------------------------
  private def q120(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir)
      .withColumn("s", epochS(col("ts_s")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("s").as("p_s"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id").as("t_id"),
        col("s").as("t_s"), col("event_type").as("t_type"))
    AsOfJoin.lastBeforeWithin(purchases, touches, Seq("user_id"),
        "p_s", "t_s", Seq("t_s", "t_id", "t_type"), lit(3600L))
      .select(col("user_id"), col("p_id"), col("p_s"),
        coalesce(col("t_id"), lit(-1L)).as("t_id"),
        coalesce(col("t_type"), lit("none")).as("t_type"),
        coalesce(col("p_s") - col("t_s"), lit(-1L)).as("lag_s"))
      .orderBy(col("p_id"))
  }

  private val q120Sql =
    s"""WITH ev AS (
       |  SELECT event_id, user_id, event_type,
       |    ${epochSSql("ts")} AS s
       |  FROM events),
       |p AS (
       |  SELECT user_id, event_id AS p_id, s AS p_s
       |  FROM ev WHERE event_type = 'purchase'),
       |tch AS (
       |  SELECT user_id, event_id AS t_id, s AS t_s, event_type AS t_type
       |  FROM ev WHERE event_type IN ('click', 'view')),
       |j AS (
       |  SELECT p.user_id, p.p_id, p.p_s, tch.t_id, tch.t_type, tch.t_s,
       |    row_number() OVER (PARTITION BY p.p_id
       |      ORDER BY tch.t_s DESC, tch.t_id DESC) AS rn
       |  FROM p LEFT JOIN tch
       |    ON p.user_id = tch.user_id AND tch.t_s <= p.p_s
       |    AND p.p_s - tch.t_s <= 3600)
       |SELECT user_id, p_id, p_s,
       |  coalesce(t_id, -1) AS t_id,
       |  coalesce(t_type, 'none') AS t_type,
       |  coalesce(p_s - t_s, -1) AS lag_s
       |FROM j WHERE rn = 1
       |ORDER BY p_id""".stripMargin

  // ---------------------------------------------------------------------
  // q121 — survivorship (golden record): every user's observations
  // collapse to one row where EACH attribute keeps the value from its
  // own latest non-null observation — per-column provenance, the MDM
  // consolidation step after record linkage (q108). One hash
  // aggregate of FILTER'd max_by's: commutative-associative, so the
  // observation history partial-aggregates map-side and never
  // shuffles. The ordering key packs (epoch, event_id) into one
  // BIGINT (event_id < 10^7 in this corpus — the caller-owned
  // contract MergeByKey.survivor documents).
  // ---------------------------------------------------------------------
  private def q121(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir)
    val obs = ev.select(col("user_id"),
      (epochS(col("ts_s")) * 10000000L + col("event_id")).as("ord"),
      when(col("event_type") =!= "error",
        round(col("value") * 10000).cast("long")).as("value_e4"),
      when(col("event_type") === "click",
        get_json_object(col("props"), "$.k").cast("long")).as("k_click"),
      when(col("event_type").isin("signup", "purchase"),
        col("event_type")).as("sig_type"))
    MergeByKey.survivor(obs, Seq("user_id"), "ord",
        Seq("value_e4", "k_click", "sig_type"))
      .select(col("user_id"),
        coalesce(col("value_e4"), lit(-1L)).as("value_e4"),
        coalesce(col("k_click"), lit(-1L)).as("k_click"),
        coalesce(col("sig_type"), lit("none")).as("sig_type"),
        col("n_obs"), col("last_ord"))
      .orderBy(col("user_id"))
  }

  private val q121Sql =
    s"""WITH ev AS (
       |  SELECT user_id,
       |    ${epochSSql("ts")} * 10000000 + event_id AS ord,
       |    CASE WHEN event_type <> 'error'
       |      THEN CAST(round(value * 10000) AS BIGINT) END AS value_e4,
       |    CASE WHEN event_type = 'click'
       |      THEN CAST(json_extract_string(props, '$$.k') AS BIGINT)
       |      END AS k_click,
       |    CASE WHEN event_type IN ('signup', 'purchase')
       |      THEN event_type END AS sig_type
       |  FROM events)
       |SELECT user_id,
       |  coalesce(arg_max(value_e4, ord)
       |    FILTER (WHERE value_e4 IS NOT NULL), -1) AS value_e4,
       |  coalesce(arg_max(k_click, ord)
       |    FILTER (WHERE k_click IS NOT NULL), -1) AS k_click,
       |  coalesce(arg_max(sig_type, ord)
       |    FILTER (WHERE sig_type IS NOT NULL), 'none') AS sig_type,
       |  count(*) AS n_obs,
       |  max(ord) AS last_ord
       |FROM ev
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q122 — dynamic partition overwrite: a full base load partitioned
  // by event_type, then a re-derived 'click' batch (cents doubled)
  // overwritten in DYNAMIC mode — only the click partition is
  // replaced, every other partition's files stay byte-untouched
  // (asserted file-by-file in LakehouseSpec). This is the reference's
  // daily 24 h re-derivation (`lambda/trips_lambda.py:218-221`) done
  // the way a 100 TB table requires: rewrite one partition, not the
  // table. Like q55/q117, the writes are the op being gated.
  // ---------------------------------------------------------------------
  private def q122(s: SparkSession, dir: String): DataFrame = {
    val base = tmp("dynpart", dir)
    val ev = Tables.eventsSec(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    graft.core.PlanStats.markBatchSinkIo()
    ev.write.mode("overwrite").partitionBy("event_type").parquet(base)
    Layout.dynamicOverwrite(
      ev.filter(col("event_type") === "click")
        .withColumn("cents", col("cents") * 2),
      "event_type", base)
    s.read.parquet(base)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_total"))
      .orderBy(col("event_type"))
  }

  private val q122Sql =
    """WITH v AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 2 * c ELSE c END)
      |    AS BIGINT) AS cents_total
      |FROM v
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q123 — exponentially decayed engagement (EWMA with α = 1/2, zero
  // prior): per user, fold s ← s/2 + x/2 over value_e4 in
  // (epoch, event_id) order. Both engines run the IDENTICAL
  // left-fold over identically sorted lists, so every IEEE operation
  // matches bit-for-bit — order-sensitive floating-point made
  // deterministic by pinning the order, the one case where exact
  // integer sums can't help. Scale: per-key history is bounded by
  // the feature's retention window; the corpus shuffles once on the
  // key.
  // ---------------------------------------------------------------------
  private def q123(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir).select(col("user_id"),
      epochS(col("ts_s")).as("s"), col("event_id"),
      round(col("value") * 10000).as("v"))
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        aggregate(
          transform(
            sort_array(collect_list(struct(col("s"), col("event_id"),
              col("v")))),
            r => r.getField("v")),
          lit(0.0),
          (acc, x) => acc * lit(0.5) + x * lit(0.5)).as("ewma_e4"))
      .orderBy(col("user_id"))
  }

  private val q123Sql =
    s"""WITH ev AS (
       |  SELECT user_id, ${epochSSql("ts")} AS s, event_id,
       |    round(value * 10000) AS v
       |  FROM events)
       |SELECT user_id, count(*) AS n_events,
       |  list_reduce(
       |    list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(list_sort(list((s, event_id, v))),
       |        r -> r[3]::DOUBLE)),
       |    (acc, x) -> acc * 0.5::DOUBLE + x * 0.5::DOUBLE) AS ewma_e4
       |FROM ev
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q180 — Holt double-exponential smoothing (level + trend,
  // α = β = 1/2) with a one-step-ahead forecast per user: q123's
  // pinned-order fold discipline carried to a STRUCTURED accumulator
  // — the fold state is a 3-element double array [level, trend, n],
  // updated with the identical IEEE expressions on both engines over
  // identically sorted lists, so the whole recursion is bit-exact.
  // First observation initializes (level = x, trend = 0); outputs
  // round e4 at the very end only. The forecasting primitive every
  // capacity/demand pipeline wants, with zero float drift.
  // ---------------------------------------------------------------------
  private def q180(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir).select(col("user_id"),
      epochS(col("ts_s")).as("s"), col("event_id"),
      round(col("value") * 10000).as("v"))
    def l(acc: Column) = element_at(acc, 1)
    def tr(acc: Column) = element_at(acc, 2)
    def n(acc: Column) = element_at(acc, 3)
    def newL(acc: Column, x: Column) =
      when(n(acc) === 0.0, x)
        .otherwise(x * lit(0.5) + (l(acc) + tr(acc)) * lit(0.5))
    def newT(acc: Column, x: Column) =
      when(n(acc) === 0.0, lit(0.0))
        .otherwise((newL(acc, x) - l(acc)) * lit(0.5) + tr(acc) * lit(0.5))
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_obs"),
        aggregate(
          transform(
            sort_array(collect_list(struct(col("s"), col("event_id"),
              col("v")))),
            r => r.getField("v")),
          array(lit(0.0), lit(0.0), lit(0.0)),
          (acc, x) => array(newL(acc, x), newT(acc, x),
            n(acc) + lit(1.0))).as("st"))
      .select(col("user_id"), col("n_obs"),
        round(element_at(col("st"), 1) * 10000).cast("long")
          .as("level_e8"),
        round(element_at(col("st"), 2) * 10000).cast("long")
          .as("trend_e8"),
        round((element_at(col("st"), 1) + element_at(col("st"), 2))
          * 10000).cast("long").as("forecast_e8"))
      .orderBy(col("user_id"))
  }

  private val q180Sql = {
    // accumulator and element share one type in list_reduce, so both
    // are 3-lists; x = xs[1], inlined everywhere (newL recomputed
    // inside newT — same IEEE ops, same value)
    val newL = "CASE WHEN acc[3] = 0 THEN xs[1] " +
      "ELSE xs[1] * 0.5::DOUBLE + (acc[1] + acc[2]) * 0.5::DOUBLE END"
    val newT = "CASE WHEN acc[3] = 0 THEN 0.0::DOUBLE " +
      s"ELSE (($newL) - acc[1]) * 0.5::DOUBLE + acc[2] * 0.5::DOUBLE END"
    s"""WITH ev AS (
       |  SELECT user_id, ${epochSSql("ts")} AS s, event_id,
       |    round(value * 10000) AS v
       |  FROM events),
       |folded AS (
       |  SELECT user_id, count(*) AS n_obs,
       |    list_reduce(
       |      list_prepend([0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE],
       |        list_transform(list_sort(list((s, event_id, v))),
       |          r -> [r[3]::DOUBLE, r[3]::DOUBLE, r[3]::DOUBLE])),
       |      (acc, xs) -> [$newL, $newT, acc[3] + 1.0::DOUBLE]) AS st
       |  FROM ev GROUP BY user_id)
       |SELECT user_id, n_obs,
       |  CAST(round(st[1] * 10000) AS BIGINT) AS level_e8,
       |  CAST(round(st[2] * 10000) AS BIGINT) AS trend_e8,
       |  CAST(round((st[1] + st[2]) * 10000) AS BIGINT) AS forecast_e8
       |FROM folded
       |ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q124 — regression profile from exact sums: per return flag, OLS
  // slope/intercept/r² of extendedprice on quantity. The five power
  // sums accumulate as exact 128-bit integers (map-side-combinable,
  // order-independent — Validate.regressionExact); only the final
  // slope arithmetic runs in doubles, the same IEEE expression over
  // the same integers on both engines. The correlation audit that
  // never drifts, at any scale or partitioning.
  // ---------------------------------------------------------------------
  private def q124(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "lineitem").select(col("l_returnflag"),
      round(col("l_quantity") * 100).cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
    Validate.regressionExact(v, col("x"), col("y"),
        Seq(col("l_returnflag")))
      .orderBy(col("l_returnflag"))
  }

  private val q124Sql =
    """WITH v AS (
      |  SELECT l_returnflag AS rf,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |s AS (
      |  SELECT rf, count(*) AS n_raw,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE)
      |      AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE)
      |      AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE)
      |      AS syy
      |  FROM v GROUP BY rf),
      |c AS (
      |  SELECT rf, n_raw, n, sx, sy,
      |    n * sxy - sx * sy AS covn,
      |    n * sxx - sx * sx AS varxn,
      |    n * syy - sy * sy AS varyn
      |  FROM s)
      |SELECT rf AS l_returnflag, n_raw AS n,
      |  CAST(round((covn / varxn) * 1000000) AS BIGINT) AS slope_e6,
      |  CAST(round(((sy - (covn / varxn) * sx) / n / CAST(100 AS DOUBLE))
      |    * 1000000) AS BIGINT) AS intercept_e6,
      |  CAST(round(((covn * covn) / (varxn * varyn)) * 1000000) AS BIGINT)
      |    AS r2_e6
      |FROM c
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q125 — null-safe equi-join: customer and supplier nation buckets
  // with bucket 0 nullified — NULL is a legitimate join class
  // (unknown-matches-unknown), the semantics `=` silently drops.
  // Spark's EqualNullSafe remains a hash-join key (plan-locked: no
  // nested-loop fallback), so the null class costs the same as any
  // other key instead of degenerating to a cross product.
  // ---------------------------------------------------------------------
  private def q125(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(
      expr("nullif(c_nationkey % 8, 0)").as("cb"), col("c_acctbal"))
    val sup = t(s, dir, "supplier").select(
      expr("nullif(s_nationkey % 8, 0)").as("sb"), col("s_acctbal"))
    c.join(sup, col("cb") <=> col("sb"))
      .groupBy(coalesce(col("cb"), lit(-1)).as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        fixedSum(col("c_acctbal") + col("s_acctbal")).as("bal_total"))
      .orderBy(col("bucket"))
  }

  private val q125Sql =
    s"""WITH c AS (
       |  SELECT nullif(c_nationkey % 8, 0) AS cb, c_acctbal FROM customer),
       |sup AS (
       |  SELECT nullif(s_nationkey % 8, 0) AS sb, s_acctbal FROM supplier)
       |SELECT coalesce(cb, -1) AS bucket,
       |  count(*) AS n_pairs,
       |  ${fixedSumSql("c_acctbal + s_acctbal")} AS bal_total
       |FROM c JOIN sup ON cb IS NOT DISTINCT FROM sb
       |GROUP BY bucket
       |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------------
  // q359 — q125's SCALE PATH, gated: the same null-safe-join readout
  // computed WITHOUT expanding a single pair. Per bucket class v,
  // n_pairs = n_c(v)·n_s(v) and Σ(c_bal + s_bal) over pairs =
  // n_s·Σc_bal + n_c·Σs_bal — so both sides pre-aggregate to ≤8 rows
  // each and an 8-row join replaces the |C|·|S|-per-bucket row-grain
  // expansion (the r7 sf1 bench measured q125 at ×34 on ×10 data —
  // BY SEMANTICS, pair count is quadratic; this is the form a 100 TB
  // run uses). Cross-products accumulate in decimal(38,0); the final
  // e2 total casts back to BIGINT before the one double division, so
  // the result is BIT-IDENTICAL to the row grain's sum-of-longs.
  // The ORACLE is deliberately the row-grain SQL (q125's own): the
  // gate proves the aggregate identity itself, converting README's
  // prose scale path into checked code.
  // PRECONDITION (input contract the oracle sharing rests on): the
  // acctbal columns must be EXACTLY cents-valued (value·100 integral,
  // as TPC-H decimals are). This side rounds each operand separately
  // (round(c·100) + round(s·100)) while q125's fixedSum oracle rounds
  // the pair sum round((c+s)·100); the two coincide iff each round()
  // is the identity on an integer — i.e. no sub-cent residue. On a
  // non-cents dataset the pair-sum rounding could differ by ±1 e2 per
  // pair and the shared oracle would be invalid; use the row-grain
  // q125 form there.
  // ---------------------------------------------------------------------
  private def q359(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val c = t(s, dir, "customer")
      .select(expr("nullif(c_nationkey % 8, 0)").as("cb"),
        round(col("c_acctbal") * 100).cast("long").as("c_e2"))
      .groupBy(col("cb"))
      .agg(count(lit(1)).cast(dec).as("n_c"),
        sum(col("c_e2")).cast(dec).as("sum_c_e2"))
    val sup = t(s, dir, "supplier")
      .select(expr("nullif(s_nationkey % 8, 0)").as("sb"),
        round(col("s_acctbal") * 100).cast("long").as("s_e2"))
      .groupBy(col("sb"))
      .agg(count(lit(1)).cast(dec).as("n_s"),
        sum(col("s_e2")).cast(dec).as("sum_s_e2"))
    c.join(sup, col("cb") <=> col("sb"))
      .select(coalesce(col("cb"), lit(-1)).as("bucket"),
        (col("n_c") * col("n_s")).cast("long").as("n_pairs"),
        ((col("n_s") * col("sum_c_e2") + col("n_c") * col("sum_s_e2"))
          .cast("long") / 100.0).as("bal_total"))
      .orderBy(col("bucket"))
  }

  // ---------------------------------------------------------------------
  // q126 — EXACT z-score outlier detection: flag events where
  // (v − μ)² > 9σ² per event type, evaluated as the cross-multiplied
  // integer inequality (n·v − s)² > 9·(n·q − s²) — no division, no
  // sqrt, no doubles anywhere, so the flag is bit-stable on any
  // engine or partitioning (a float z-score wobbles rows sitting ON
  // the 3σ boundary). Stats are one tiny broadcast row per type; the
  // corpus pass is a per-row comparison. The anomaly-detection twin
  // of q113's percentile clipping.
  // ---------------------------------------------------------------------
  private def q126(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val e = Tables.eventsSec(s, dir).select(col("event_type"),
      round(col("value") * 10000).cast("long").as("v"))
    val stats = e.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec).as("sn"),
        sum(col("v")).cast(dec).as("ss"),
        sum(col("v").cast(dec) * col("v").cast(dec)).as("sq"))
    val lhs = (col("sn") * col("v").cast(dec) - col("ss")) *
      (col("sn") * col("v").cast(dec) - col("ss"))
    val rhs = lit(9).cast(dec) *
      (col("sn") * col("sq") - col("ss") * col("ss"))
    e.join(broadcast(stats), "event_type")
      .withColumn("is_out", lhs > rhs)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
        coalesce(sum(when(col("is_out"), col("v"))), lit(0L))
          .as("outlier_v_sum"),
        coalesce(max(when(col("is_out"), col("v"))), lit(-1L))
          .as("outlier_v_max"))
      .orderBy(col("event_type"))
  }

  private val q126Sql =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v
      |  FROM events),
      |st AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS sn,
      |    CAST(sum(v) AS HUGEINT) AS ss,
      |    sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS sq
      |  FROM e GROUP BY event_type),
      |f AS (
      |  SELECT e.event_type, e.v,
      |    (st.sn * e.v - st.ss) * (st.sn * e.v - st.ss)
      |      > 9 * (st.sn * st.sq - st.ss * st.ss) AS is_out
      |  FROM e JOIN st USING (event_type))
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers,
      |  CAST(coalesce(sum(CASE WHEN is_out THEN v END), 0) AS BIGINT)
      |    AS outlier_v_sum,
      |  coalesce(max(CASE WHEN is_out THEN v END), -1) AS outlier_v_max
      |FROM f
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q127 — per-group equi-depth binning: each event type's values are
  // cut at that type's OWN exact quartiles (broadcast back, rounded
  // e4 — the q37/q113 boundary discipline), then binned per row. The
  // grouped generalization of q59's global deciles: per-class feature
  // normalization where every class gets comparable bin populations
  // regardless of its scale. The corpus never sorts and never
  // window-shuffles — and the quartiles come from
  // Validate.groupedPercentilesExact (approx bracket + exact boundary
  // pass), so no group ever buffers its full column: a sketch
  // aggregate, a ~8n/accuracy boundary aggregate, one broadcast join,
  // one binned aggregate.
  // ---------------------------------------------------------------------
  private def q127(s: SparkSession, dir: String): DataFrame = {
    // pinned (r12): three percentile-operator passes + the binned
    // aggregate's scan — the q172 rationale
    val e = Tables.eventsSec(s, dir).select(col("event_type"),
      round(col("value") * 10000).cast("long").as("v")).pin()
    // exact quartiles WITHOUT per-group full-column buffers: the q113
    // approx-bracket + exact-boundary-pass machinery, grouped
    val bounds = graft.operators.Validate.groupedPercentilesExact(
        e, col("event_type"), "event_type", col("v"),
        Seq(0.25, 0.5, 0.75), Seq("r1", "r2", "r3"), accuracy = 1000)
      .select(col("event_type"), round(col("r1"), 4).as("b1"),
        round(col("r2"), 4).as("b2"), round(col("r3"), 4).as("b3"))
    e.join(broadcast(bounds), "event_type")
      .withColumn("bin",
        when(col("v") <= col("b1"), 0)
          .when(col("v") <= col("b2"), 1)
          .when(col("v") <= col("b3"), 2)
          .otherwise(3))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("v_sum"))
      .orderBy(col("event_type"), col("bin"))
  }

  private val q127Sql =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v
      |  FROM events),
      |st AS (
      |  SELECT event_type,
      |    round(quantile_cont(v, 0.25), 4) AS b1,
      |    round(quantile_cont(v, 0.5), 4) AS b2,
      |    round(quantile_cont(v, 0.75), 4) AS b3
      |  FROM e GROUP BY event_type),
      |f AS (
      |  SELECT e.event_type, e.v,
      |    CASE WHEN e.v <= st.b1 THEN 0
      |         WHEN e.v <= st.b2 THEN 1
      |         WHEN e.v <= st.b3 THEN 2
      |         ELSE 3 END AS bin
      |  FROM e JOIN st USING (event_type))
      |SELECT event_type, bin, count(*) AS n,
      |  CAST(sum(v) AS BIGINT) AS v_sum
      |FROM f
      |GROUP BY event_type, bin
      |ORDER BY event_type, bin""".stripMargin

  // ---------------------------------------------------------------------
  // q128 — bucket-pruned point lookup: the read-side payoff of q117's
  // layout. A key-set filter over the bucketed table scans ONLY the
  // buckets those keys hash into (SelectedBucketsCount < total,
  // plan-locked in LakehouseSpec) — the "index lookup" of a
  // bucket-laid-out lake table, where an unbucketed scan reads every
  // file. Same catalog-table machinery as q117, own table so the
  // query stands alone.
  // ---------------------------------------------------------------------
  private def q128(s: SparkSession, dir: String): DataFrame = {
    val tg = tag(dir)
    val tbl = s"graft_bp_$tg"
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    Layout.bucketedWrite(
      t(s, dir, "orders").select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderstatus")),
      tbl, s"${tmp("bucketlookup", dir)}/orders", "o_orderkey",
      numBuckets = 8)
    s.table(tbl)
      .filter(col("o_orderkey").isin(1L, 5L, 9L))
      .select(col("o_orderkey"), col("cents"),
        col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  private val q128Sql =
    """SELECT o_orderkey,
      |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |  o_orderstatus
      |FROM orders
      |WHERE o_orderkey IN (1, 5, 9)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // q129 — time-weighted average (TWAP / time-in-state): a user's
  // event value is a step function sampled at irregular times; the
  // per-sample mean over-weights busy periods, the TWAP integrates
  // the steps. Exact integer areas (e4 value × whole-second
  // duration), one lead-window shuffle, map-side-combined sums — and
  // one final double division (TimeSeries.twap). This is the
  // reference's snapshot semantics (`bike_status` holds until the
  // next poll) made into an aggregate.
  // ---------------------------------------------------------------------
  private def q129(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir).select(col("user_id"),
      epochS(col("ts_s")).as("es"), col("event_id"),
      round(col("value") * 10000).cast("long").as("v"))
    graft.operators.TimeSeries.twap(ev, Seq("user_id"),
        col("es"), col("event_id"), col("v"))
      .filter(col("span_s") > 0)
      .orderBy(col("user_id"))
  }

  private val q129Sql =
    s"""WITH ev AS (
       |  SELECT user_id, ${epochSSql("ts")} AS es, event_id,
       |    CAST(round(value * 10000) AS BIGINT) AS v
       |  FROM events),
       |stepped AS (
       |  SELECT user_id, v,
       |    lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
       |      - es AS dt
       |  FROM ev),
       |agg AS (
       |  SELECT user_id, count(*) + 1 AS n_samples,
       |    CAST(sum(dt) AS BIGINT) AS span_s,
       |    CAST(sum(v * dt) AS BIGINT) AS area_e4s
       |  FROM stepped WHERE dt IS NOT NULL
       |  GROUP BY user_id)
       |SELECT user_id, n_samples, span_s, area_e4s,
       |  CAST(area_e4s AS DOUBLE) / CAST(span_s AS DOUBLE) AS twap_e4
       |FROM agg
       |WHERE span_s > 0
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q130 — activity bitmaps: each (user, day) compresses to one
  // 24-bit mask of active hours (bit_or of 1<<hour — the
  // bitmap-index trick for engagement features: 24 booleans in one
  // BIGINT, mergeable with pure OR, popcounted for free). Per-day
  // masks partial-aggregate map-side; the per-user rollup counts
  // days and popcounts hours without ever touching raw events again.
  // ---------------------------------------------------------------------
  private def q130(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir).select(col("user_id"),
      to_date(col("ts_s")).as("day"),
      expr("shiftleft(CAST(1 AS BIGINT), hour(ts_s))").as("hbit"))
    ev.groupBy(col("user_id"), col("day"))
      .agg(expr("bit_or(hbit)").as("mask"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(expr("CAST(bit_count(mask) AS BIGINT)")).as("active_hours"),
        max(expr("CAST(bit_count(mask) AS BIGINT)")).as("max_hours_day"),
        expr("bit_or(mask)").as("ever_mask"))
      .orderBy(col("user_id"))
  }

  private val q130Sql =
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(date_trunc('day', ts) AS DATE) AS day,
      |    (CAST(1 AS BIGINT) << EXTRACT(hour FROM
      |      date_trunc('second', ts))) AS hbit
      |  FROM events),
      |daily AS (
      |  SELECT user_id, day, bit_or(hbit) AS mask
      |  FROM ev GROUP BY user_id, day)
      |SELECT user_id, count(*) AS n_days,
      |  CAST(sum(bit_count(mask)) AS BIGINT) AS active_hours,
      |  CAST(max(bit_count(mask)) AS BIGINT) AS max_hours_day,
      |  bit_or(mask) AS ever_mask
      |FROM daily
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q131 — deterministic Poisson bootstrap: 8 replicates, each row
  // weighted by inverse-CDF Poisson(1) of a portable per-(row,
  // replicate) uniform. THE variance-estimation technique at 100 TB
  // — no resampling pass, no global state, weights recomputed
  // identically on any engine or retry (Curate.poissonWeight), and
  // the replicate spread of the weighted sums estimates the sampling
  // error of the true sum. One explode (×8) and one aggregate.
  // ---------------------------------------------------------------------
  private def q131(s: SparkSession, dir: String): DataFrame = {
    val u = graft.functions.PortableHash.hash60(
        concat(lit("pb:"), col("event_id"), lit(":"), col("rep")))
      .cast("double") / lit(1.152921504606846976e18)
    val ev = Tables.eventsSec(s, dir).select(col("event_id"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .withColumn("rep", explode(sequence(lit(0), lit(7))))
      .withColumn("w", graft.operators.Curate.poissonWeight(u).cast("long"))
    ev.groupBy(col("event_type"), col("rep"))
      .agg(count(lit(1)).as("n"), sum(col("w")).as("n_eff"),
        sum(col("w") * col("cents")).as("wsum_cents"))
      .orderBy(col("event_type"), col("rep"))
  }

  private val q131Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "'pb:' || CAST(event_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)")
    val w = graft.operators.Curate.poissonWeightDuckSql(
      s"CAST($h AS DOUBLE) / 1.152921504606846976e18")
    s"""WITH ev AS (
       |  SELECT event_id, event_type,
       |    CAST(round(value * 100) AS BIGINT) AS cents,
       |    unnest(range(8)) AS rep
       |  FROM events),
       |wtd AS (
       |  SELECT event_type, rep, cents, CAST($w AS BIGINT) AS w
       |  FROM ev)
       |SELECT event_type, CAST(rep AS INTEGER) AS rep, count(*) AS n,
       |  CAST(sum(w) AS BIGINT) AS n_eff,
       |  CAST(sum(w * cents) AS BIGINT) AS wsum_cents
       |FROM wtd
       |GROUP BY event_type, rep
       |ORDER BY event_type, rep""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q133 — dynamic partition pruning: the fact table is laid out
  // partitioned by event_type; the dimension side arrives with a
  // selective filter; Catalyst injects a runtime pruning subquery
  // into the fact scan (dynamicpruningexpression in PartitionFilters,
  // plan-locked in LakehouseSpec) so only the partitions the dim
  // actually selects are ever read. THE partition-layout payoff at
  // 100 TB — static pruning can't see through a join, DPP can. Like
  // q117/q122, the partitioned write is part of the gated op.
  // ---------------------------------------------------------------------
  private def q133(s: SparkSession, dir: String): DataFrame = {
    val base = tmp("dpp", dir)
    val ev = Tables.eventsSec(s, dir).select(col("event_id"),
      round(col("value") * 100).cast("long").as("cents"), col("event_type"))
    graft.core.PlanStats.markBatchSinkIo()
    ev.write.mode("overwrite").partitionBy("event_type").parquet(base)
    val fact = s.read.parquet(base)
    val dim = Tables.eventsSec(s, dir).select(col("event_type")).distinct()
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("weight",
        when(col("event_type") === "click", 2L).otherwise(5L))
    fact.join(broadcast(dim), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents") * col("weight")).as("wsum_cents"))
      .orderBy(col("event_type"))
  }

  private val q133Sql =
    """WITH ev AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(c * CASE event_type WHEN 'click' THEN 2 ELSE 5 END)
      |    AS BIGINT) AS wsum_cents
      |FROM ev
      |WHERE event_type IN ('click', 'purchase')
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q135 — hard-negative mining for contrastive training: per query
  // vector, the 3 most-cosine-similar vectors with a DIFFERENT label
  // (similar-but-wrong is what the loss needs to push apart; random
  // negatives teach nothing). Corpus scanned in place, queries
  // broadcast, label inequality inside the join, ranking on the
  // bounded-heap TopK plan — the q25 scan shape with a supervision
  // twist.
  // ---------------------------------------------------------------------
  private def q135(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    graft.operators.Similarity.hardNegatives(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", "label", 3)
      .orderBy(col("query_id"), col("rank"))
  }

  private val q135Sql = {
    val cos = graft.functions.Vectors.cosineSql("q.qv", "e.embedding")
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qv, label AS ql
       |  FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT query_id, e.vec_id, e.label AS neg_label,
       |    round($cos, 4) AS cos
       |  FROM q, embeddings e
       |  WHERE e.vec_id != q.query_id AND e.label IS DISTINCT FROM q.ql),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, vec_id, neg_label, cos, rank FROM ranked
       |WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q136 — containment (subset-duplicate) detection: pairs with
  // inter / min(|A|, |B|) ≥ 0.4 — the partial-copy/quotation case
  // Jaccard structurally misses (a short doc fully inside a long one
  // scores Jaccard ≈ |A|/|B| but containment 1.0). Same df-pruned
  // posting-list pair generation as q23; only the normalization
  // differs (Dedup.containmentPairs).
  // ---------------------------------------------------------------------
  private def q136(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val sh = graft.operators.Dedup.dfPruneFrac(
      graft.operators.Dedup.shingleTable(d, "doc_id", "text", 3)
        .select("id", "sh").pin(),
      0.1, d)
    graft.operators.Dedup.containmentPairs(sh, 0.4)
      .orderBy(col("id_a"), col("id_b"))
  }

  private val q136Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS w
      |  FROM documents),
      |shing AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(len(w) - 2),
      |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
      |  FROM toks WHERE len(w) >= 3),
      |freq AS (SELECT shingle, count(*) AS df FROM shing GROUP BY shingle),
      |tot AS (SELECT count(*) AS nd FROM documents),
      |pruned AS (
      |  SELECT s.doc_id, s.shingle
      |  FROM shing s JOIN freq f ON f.shingle = s.shingle, tot
      |  WHERE f.df <= greatest(2.0, nd * 0.1)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM pruned GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM pruned a JOIN pruned b
      |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, inter, sa.sz AS size_a, sb.sz AS size_b,
      |  inter / least(sa.sz, sb.sz) AS containment
      |FROM pairs
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE inter / least(sa.sz, sb.sz) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // q137 — incremental dedup: a 10% "new batch" (doc_id ≡ 7 mod 10)
  // is near-dup-checked against the WHOLE corpus without re-pairing
  // old-old documents — only the batch's postings join the posting
  // table, so the daily cost scales with the batch, not the corpus
  // (q60's incremental-merge discipline applied to dedup). The
  // oracle recomputes all pairs and restricts to new-involving ones:
  // equality proves the delta path loses nothing.
  // ---------------------------------------------------------------------
  private def q137(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val sh = graft.operators.Dedup.dfPruneFrac(
      graft.operators.Dedup.shingleTable(d, "doc_id", "text", 3)
        .select("id", "sh").pin(),
      0.1, d)
    graft.operators.Dedup.incrementalJaccardPairs(
        sh, id => id % 10 === 7, 0.2)
      .orderBy(col("id_a"), col("id_b"))
  }

  private val q137Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS w
      |  FROM documents),
      |shing AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(len(w) - 2),
      |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
      |  FROM toks WHERE len(w) >= 3),
      |freq AS (SELECT shingle, count(*) AS df FROM shing GROUP BY shingle),
      |tot AS (SELECT count(*) AS nd FROM documents),
      |pruned AS (
      |  SELECT s.doc_id, s.shingle
      |  FROM shing s JOIN freq f ON f.shingle = s.shingle, tot
      |  WHERE f.df <= greatest(2.0, nd * 0.1)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM pruned GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM pruned a JOIN pruned b
      |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  WHERE a.doc_id % 10 = 7 OR b.doc_id % 10 = 7
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, inter, sa.sz AS size_a, sb.sz AS size_b,
      |  inter / (sa.sz + sb.sz - inter) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE inter / (sa.sz + sb.sz - inter) >= 0.2
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // q138 — join-key skew profile: the top-10 heaviest keys with their
  // exact parts-per-million share of the table — the diagnosis that
  // decides whether a join needs q79's salting or AQE can handle it.
  // One partial-aggregated key count, a TakeOrdered top-k, a 1-row
  // broadcast total; share as exact integer division (no float
  // drift on the boundary). At 100 TB you run this BEFORE the join
  // that would have died.
  // ---------------------------------------------------------------------
  private def q138(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_suppkey"))
    val total = li.agg(count(lit(1)).as("total"))
    li.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l_suppkey"))
      .limit(10)
      .crossJoin(broadcast(total))
      .select(col("l_suppkey"), col("n"),
        expr("n * 1000000 div total").as("share_ppm"))
      .orderBy(col("n").desc, col("l_suppkey"))
  }

  private val q138Sql =
    """WITH tot AS (SELECT count(*) AS total FROM lineitem),
      |top AS (
      |  SELECT l_suppkey, count(*) AS n
      |  FROM lineitem
      |  GROUP BY l_suppkey
      |  ORDER BY n DESC, l_suppkey
      |  LIMIT 10)
      |SELECT l_suppkey, n,
      |  CAST(n * 1000000 // total AS BIGINT) AS share_ppm
      |FROM top, tot
      |ORDER BY n DESC, l_suppkey""".stripMargin

  // ---------------------------------------------------------------------
  // q139 — rolling 7-day active users (the WAU curve): each (user,
  // active-day) pair is deduplicated ONCE, then fans out to the 7
  // window-end days it supports; a second distinct collapses
  // multi-day activity inside a window. Work scales with
  // |distinct (user, day)| × 7 — never with raw events — which is
  // the only affordable exact rolling-distinct at 100 TB (sliding
  // DISTINCT windows don't partial-aggregate; this expansion does).
  // ---------------------------------------------------------------------
  private def q139(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.eventsSec(s, dir)
      .select(col("user_id"),
        (epochS(col("ts_s")) / 86400L).cast("long").as("day"))
      .distinct()
    val bounds = ud.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    ud.select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("wday"))
      .distinct()
      .crossJoin(broadcast(bounds))
      .filter(col("wday") >= col("d0") && col("wday") <= col("d1"))
      .groupBy(col("wday"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("wday"))
  }

  private val q139Sql =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id,
       |    ${epochSSql("ts")} // 86400 AS day
       |  FROM events),
       |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
       |expanded AS (
       |  SELECT DISTINCT user_id, day + x AS wday
       |  FROM ud, (SELECT unnest(range(7)) AS x))
       |SELECT CAST(wday AS BIGINT) AS wday, count(*) AS n_active
       |FROM expanded, bounds
       |WHERE wday >= d0 AND wday <= d1
       |GROUP BY wday
       |ORDER BY wday""".stripMargin

  // ---------------------------------------------------------------------
  // q140 — share-of-total (ratio-to-report): each supplier nation's
  // exact parts-per-million share of its region's revenue — the BI
  // staple that turns absolutes into comparable mixes. Cents sums are
  // exact longs; the share is 128-bit integer arithmetic
  // (DECIMAL(38) / HUGEINT) so cents × 10⁶ cannot overflow at any
  // scale factor, and the window total rides the same partitioning
  // as the (region, nation) aggregate.
  // ---------------------------------------------------------------------
  private def q140(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("cents")).as("cents"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("r_name"))
    rev.withColumn("region_cents", sum(col("cents")).over(w))
      .select(col("r_name"), col("n_name"), col("cents"),
        expr("CAST(cents AS DECIMAL(38,0)) * 1000000 div region_cents")
          .cast("long").as("share_ppm"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q140Sql =
    """WITH rev AS (
      |  SELECT r_name, n_name,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY r_name, n_name),
      |tot AS (
      |  SELECT *, sum(cents) OVER (PARTITION BY r_name) AS region_cents
      |  FROM rev)
      |SELECT r_name, n_name, cents,
      |  CAST(CAST(cents AS HUGEINT) * 1000000 // region_cents AS BIGINT)
      |    AS share_ppm
      |FROM tot
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q141 — header-vs-lines reconciliation: each order's stated total
  // against the exact cents sum of its line items, rolled up per
  // status — the balance audit every warehouse load runs after the
  // FK check (q114 asks "do the children exist", this asks "do they
  // add up"). All integer arithmetic (Validate.balanceAudit); one
  // child pre-aggregate, one key join.
  // ---------------------------------------------------------------------
  private def q141(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val audited = Validate.balanceAudit(
      o.select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("pe")),
      col("o_orderkey"), col("pe"),
      t(s, dir, "lineitem"), col("l_orderkey"),
      round(col("l_extendedprice") * 100).cast("long"))
    audited.join(o.select(col("o_orderkey").as("key"),
        col("o_orderstatus")), Seq("key"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("n_children") === 0, 1L).otherwise(0L))
          .as("n_childless"),
        sum(when(abs(col("imbalance_e")) <= 100, 1L).otherwise(0L))
          .as("n_balanced"),
        sum(abs(col("imbalance_e"))).as("abs_imbalance_total"))
      .orderBy(col("o_orderstatus"))
  }

  private val q141Sql =
    """WITH kids AS (
      |  SELECT l_orderkey AS key,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS child_e,
      |    count(*) AS n_children
      |  FROM lineitem GROUP BY l_orderkey),
      |audited AS (
      |  SELECT o_orderkey AS key, o_orderstatus,
      |    CAST(round(o_totalprice * 100) AS BIGINT)
      |      - coalesce(child_e, 0) AS imbalance_e,
      |    coalesce(n_children, 0) AS n_children
      |  FROM orders LEFT JOIN kids ON o_orderkey = kids.key)
      |SELECT o_orderstatus, count(*) AS n_orders,
      |  CAST(sum(CASE WHEN n_children = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_childless,
      |  CAST(sum(CASE WHEN abs(imbalance_e) <= 100 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_balanced,
      |  CAST(sum(abs(imbalance_e)) AS BIGINT) AS abs_imbalance_total
      |FROM audited
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // q202 — partition-stats pruning audit: for each candidate scan
  // predicate, how many month-partitions a min/max zone map would
  // skip, how many rows the surviving partitions force the scan to
  // read, and how many rows actually match — the skipped/scanned/
  // matched triple that tells a table owner whether the current
  // partition layout earns its keep. Stats come from one grouped
  // pass; predicates are a broadcast 3-row table; everything integer.
  // ---------------------------------------------------------------------
  private def q202(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dtab = t(s, dir, "lineitem")
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("long").as("ym"),
        (year(col("l_shipdate")) * 10000 + month(col("l_shipdate")) * 100
          + dayofmonth(col("l_shipdate"))).cast("long").as("dk"))
      .agg(count(lit(1)).as("n")).pin()
    val stats = dtab.groupBy(col("ym"))
      .agg(min(col("dk")).as("min_dk"), max(col("dk")).as("max_dk"),
        sum(col("n")).as("n_rows"))
    val preds = Seq((1L, 19960205L, 19960318L), (2L, 19951120L, 19960110L),
      (3L, 20030101L, 20031231L)).toDF("pid", "lo", "hi")
    val pruned = col("max_dk") < col("lo") || col("min_dk") > col("hi")
    val audit = stats.crossJoin(broadcast(preds))
      .groupBy(col("pid"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_parts"),
        sum(pruned.cast("long")).as("n_pruned"),
        sum(when(pruned, 0L).otherwise(col("n_rows"))).as("rows_scanned"))
    val matched = dtab.crossJoin(broadcast(preds))
      .filter(col("dk") >= col("lo") && col("dk") <= col("hi"))
      .groupBy(col("pid")).agg(sum(col("n")).as("rows_matched"))
    audit.join(matched, Seq("pid"), "left")
      .select(col("pid"), col("lo"), col("hi"), col("n_parts"),
        col("n_pruned"), col("rows_scanned"),
        coalesce(col("rows_matched"), lit(0L)).as("rows_matched"))
      .orderBy(col("pid"))
  }

  private val q202Sql =
    """WITH dtab AS (
      |  SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
      |    year(l_shipdate) * 10000 + month(l_shipdate) * 100
      |      + day(l_shipdate) AS dk,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |stats AS (
      |  SELECT ym, min(dk) AS min_dk, max(dk) AS max_dk,
      |    CAST(sum(n) AS BIGINT) AS n_rows
      |  FROM dtab GROUP BY ym),
      |preds AS (
      |  SELECT * FROM (VALUES
      |    (CAST(1 AS BIGINT), CAST(19960205 AS BIGINT),
      |     CAST(19960318 AS BIGINT)),
      |    (2, 19951120, 19960110),
      |    (3, 20030101, 20031231)) p(pid, lo, hi)),
      |audit AS (
      |  SELECT pid, lo, hi, count(*) AS n_parts,
      |    CAST(sum(CASE WHEN max_dk < lo OR min_dk > hi
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
      |    CAST(sum(CASE WHEN max_dk < lo OR min_dk > hi
      |      THEN 0 ELSE n_rows END) AS BIGINT) AS rows_scanned
      |  FROM stats, preds GROUP BY 1, 2, 3),
      |matched AS (
      |  SELECT pid, CAST(sum(n) AS BIGINT) AS rows_matched
      |  FROM dtab, preds WHERE dk BETWEEN lo AND hi GROUP BY pid)
      |SELECT a.pid, a.lo, a.hi, a.n_parts, a.n_pruned, a.rows_scanned,
      |  COALESCE(m.rows_matched, 0) AS rows_matched
      |FROM audit a LEFT JOIN matched m USING (pid)
      |ORDER BY pid""".stripMargin

  // ---------------------------------------------------------------------
  // q205 — RFM segmentation (recency / frequency / monetary): each
  // customer scores 1–5 on all three axes via per-NATION quintiles —
  // partition-parallel windows with a unique (metric, custkey)
  // tiebreak, never a global sort — then segments aggregate to
  // (r, f, m) cells with exact e2 revenue. One shuffle on custkey for
  // the order rollup, one on nationkey for the three rank windows
  // (three sorts inside one exchange).
  // ---------------------------------------------------------------------
  private def q205(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(unix_date(col("o_orderdate").cast("date"))).as("r_day"),
        count(lit(1)).as("f_cnt"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("m_e2"))
    val withNat = per.join(
      t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
        col("c_nationkey").as("nk")), Seq("o_custkey"))
    def score(metric: org.apache.spark.sql.Column) =
      ntile(5).over(Window.partitionBy(col("nk"))
        .orderBy(metric.asc, col("o_custkey").asc)).cast("long")
    withNat
      .select(col("o_custkey"), col("m_e2"),
        score(col("r_day")).as("r_score"),
        score(col("f_cnt")).as("f_score"),
        score(col("m_e2")).as("m_score"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_cust"), sum(col("m_e2")).as("m_total_e2"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  private val q205Sql =
    """WITH per AS (
      |  SELECT o_custkey,
      |    max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS r_day,
      |    count(*) AS f_cnt,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS m_e2
      |  FROM orders GROUP BY o_custkey),
      |wn AS (
      |  SELECT p.*, c.c_nationkey AS nk
      |  FROM per p JOIN customer c ON c.c_custkey = p.o_custkey),
      |scored AS (
      |  SELECT o_custkey, m_e2,
      |    CAST(ntile(5) OVER (PARTITION BY nk
      |      ORDER BY r_day, o_custkey) AS BIGINT) AS r_score,
      |    CAST(ntile(5) OVER (PARTITION BY nk
      |      ORDER BY f_cnt, o_custkey) AS BIGINT) AS f_score,
      |    CAST(ntile(5) OVER (PARTITION BY nk
      |      ORDER BY m_e2, o_custkey) AS BIGINT) AS m_score
      |  FROM wn)
      |SELECT r_score, f_score, m_score, count(*) AS n_cust,
      |  CAST(sum(m_e2) AS BIGINT) AS m_total_e2
      |FROM scored
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------------
  // q201 — compaction planner: the table-maintenance step that groups
  // a partition's small files into target-sized rewrite bins. Files
  // (here: one per ship-day, sized by exact e0 revenue) sort largest-
  // first within their partition, then a greedy left-to-right fold
  // closes a bin whenever adding the next file would exceed the cap
  // (2× the partition's largest file — scale-free, so the plan is
  // meaningful at every SF). The fold state is a BIGINT array
  // [fill, bin, assignment...] — engine-exact, and per-partition
  // (never a global sort): exactly how a 100 TB table compacts, one
  // partition's manifest at a time.
  // ---------------------------------------------------------------------
  private def q201(s: SparkSession, dir: String): DataFrame = {
    val files = t(s, dir, "lineitem")
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("long").as("yyyymm"),
        dayofmonth(col("l_shipdate")).cast("long").as("file_id"))
      .agg(sum(expr("CAST(round(l_extendedprice) AS BIGINT)")).as("bytes"))
    val parts = files
      .groupBy(col("yyyymm"))
      .agg(sort_array(collect_list(expr("bytes * 100 + (99 - file_id)")),
          asc = false).as("fl"),
        (max(col("bytes")) * 2).as("cap"))
    parts
      .withColumn("acc", expr(
        """aggregate(fl, CAST(array(0, 0) AS array<bigint>),
          |  (acc, p) -> CASE
          |    WHEN element_at(acc, 1) > 0
          |         AND element_at(acc, 1) + p div 100 > cap
          |      THEN concat(array(p div 100, element_at(acc, 2) + 1),
          |             slice(acc, 3, size(acc) - 2),
          |             array(element_at(acc, 2) + 1))
          |    ELSE concat(
          |           array(element_at(acc, 1) + p div 100,
          |             element_at(acc, 2)),
          |           slice(acc, 3, size(acc) - 2),
          |           array(element_at(acc, 2))) END)""".stripMargin))
      .select(col("yyyymm"), explode(expr(
        "transform(sequence(1, size(fl)), i -> named_struct(" +
          "'p', element_at(fl, i), 'bin', element_at(acc, i + 2)))"))
        .as("e"))
      .select(col("yyyymm"),
        expr("99 - e.p % 100").as("file_id"),
        expr("e.p div 100").as("bytes"),
        col("e.bin").as("bin"))
      .orderBy(col("yyyymm"), col("bin"), col("file_id"))
  }

  private val q201Sql =
    """WITH files AS (
      |  SELECT year(l_shipdate) * 100 + month(l_shipdate) AS yyyymm,
      |    CAST(day(l_shipdate) AS BIGINT) AS file_id,
      |    CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT)
      |      AS bytes
      |  FROM lineitem GROUP BY 1, 2),
      |parts AS (
      |  SELECT yyyymm,
      |    list_sort(list(bytes * 100 + (99 - file_id)), 'DESC') AS fl,
      |    CAST(max(bytes) * 2 AS BIGINT) AS cap
      |  FROM files GROUP BY yyyymm),
      |folded AS (
      |  SELECT yyyymm, fl, list_reduce(
      |    list_prepend([0, 0]::BIGINT[], list_transform(fl, p -> [p])),
      |    (acc, x) -> CASE
      |      WHEN acc[1] > 0 AND acc[1] + x[1] // 100 > cap
      |        THEN list_concat(
      |               list_concat([x[1] // 100, acc[2] + 1],
      |                 list_slice(acc, 3, len(acc))),
      |               [acc[2] + 1])
      |      ELSE list_concat(
      |             list_concat([acc[1] + x[1] // 100, acc[2]],
      |               list_slice(acc, 3, len(acc))),
      |             [acc[2]]) END) AS acc
      |  FROM parts),
      |exploded AS (
      |  SELECT yyyymm, unnest(list_transform(range(1, len(fl) + 1),
      |    i -> {'p': fl[i], 'bin': acc[i + 2]})) AS e
      |  FROM folded)
      |SELECT yyyymm, 99 - e['p'] % 100 AS file_id,
      |  e['p'] // 100 AS bytes, e['bin'] AS bin
      |FROM exploded
      |ORDER BY yyyymm, bin, file_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q201_compaction_plan" -> (q201 _),
    "q202_stats_pruning" -> (q202 _),
    "q205_rfm_segments" -> (q205 _),
    "q117_bucketed_join" -> (q117 _),
    "q118_hll_partials" -> (q118 _),
    "q119_table_diff" -> (q119 _),
    "q120_attribution" -> (q120 _),
    "q121_survivorship" -> (q121 _),
    "q122_dynamic_overwrite" -> (q122 _),
    "q123_ewma_decay" -> (q123 _),
    "q124_regression_exact" -> (q124 _),
    "q125_null_safe_join" -> (q125 _),
    "q359_pair_identity" -> (q359 _),
    "q126_outlier_exact" -> (q126 _),
    "q127_group_bins" -> (q127 _),
    "q180_holt_forecast" -> (q180 _),
    "q128_bucket_lookup" -> (q128 _),
    "q129_twap" -> (q129 _),
    "q130_activity_bitmap" -> (q130 _),
    "q131_poisson_bootstrap" -> (q131 _),
    "q133_dynamic_pruning" -> (q133 _),
    "q135_hard_negatives" -> (q135 _),
    "q136_containment" -> (q136 _),
    "q137_incremental_dedup" -> (q137 _),
    "q138_skew_profile" -> (q138 _),
    "q139_rolling_active" -> (q139 _),
    "q140_share_of_total" -> (q140 _),
    "q141_balance_audit" -> (q141 _))

  val oracle: Map[String, String] = Map(
    "q201_compaction_plan" -> q201Sql,
    "q202_stats_pruning" -> q202Sql,
    "q205_rfm_segments" -> q205Sql,
    "q117_bucketed_join" -> q117Sql,
    "q118_hll_partials" -> q118Sql,
    "q119_table_diff" -> q119Sql,
    "q120_attribution" -> q120Sql,
    "q121_survivorship" -> q121Sql,
    "q122_dynamic_overwrite" -> q122Sql,
    "q123_ewma_decay" -> q123Sql,
    "q124_regression_exact" -> q124Sql,
    "q125_null_safe_join" -> q125Sql,
    // the identity form is checked against the ROW-GRAIN oracle on
    // purpose — the gate proves the per-bucket aggregate identity
    "q359_pair_identity" -> q125Sql,
    "q126_outlier_exact" -> q126Sql,
    "q127_group_bins" -> q127Sql,
    "q180_holt_forecast" -> q180Sql,
    "q128_bucket_lookup" -> q128Sql,
    "q129_twap" -> q129Sql,
    "q130_activity_bitmap" -> q130Sql,
    "q131_poisson_bootstrap" -> q131Sql,
    "q133_dynamic_pruning" -> q133Sql,
    "q135_hard_negatives" -> q135Sql,
    "q136_containment" -> q136Sql,
    "q137_incremental_dedup" -> q137Sql,
    "q138_skew_profile" -> q138Sql,
    "q139_rolling_active" -> q139Sql,
    "q140_share_of_total" -> q140Sql,
    "q141_balance_audit" -> q141Sql)
}
