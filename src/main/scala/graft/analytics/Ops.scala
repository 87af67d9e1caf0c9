package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.PlanStats.Pinned
import graft.operators.Curate

/** Ops tier (session 9): the data-PLATFORM queries a warehouse runs
  * about itself — join-key skew linting, layout/pruning audits,
  * compaction planning, data-quality expectations, DP-noised
  * publishing, and the scale-safe exact statistics (weighted median,
  * CUSUM changepoint) that route through [[Curate.globalRank]] /
  * [[Curate.globalCumSum]] rather than any single-task window.
  * No reference analogue (the reference delegates everything to
  * PostgreSQL, cf. `lambda/trips_lambda.py`); this tier is the
  * operational layer the 100 TB deployment needs around the engine.
  *
  * Cross-engine discipline: integer-exact sums (e2 cents), squares
  * accumulated in decimal(38,0)/HUGEINT, one rounded division at the
  * end. Accepted runtime-libm exception (the q285/q286 precedent):
  * q305's Laplace inverse-CDF takes one `ln` per PUBLISHED CELL
  * (≤ 5·31 rows) on an identical hash-derived double in both
  * engines, rounded to an integer at the point of computation.
  */
object Ops {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------
  // q298 — join-key skew lint (the build-time check that would have
  // caught q214 and q292 by construction): for every join key the
  // gate actually shuffles on, report rows, distinct keys, the
  // heaviest key's row count, its share, and the skew multiple
  // max/mean — and an integer salting verdict (heaviest key carries
  // ≥ 16× the mean ⇔ max·n_keys ≥ 16·n_rows; 16 is where one task
  // holds 16 tasks' work and the straggler cliff starts). Each key
  // is ONE map-side-combinable aggregate to key grain, then a
  // 1-row max reduction; the union is 4 rows.
  // ---------------------------------------------------------------------
  private def q298(s: SparkSession, dir: String): DataFrame = {
    def audit(df: DataFrame, key: String, label: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        .agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
          max("c").as("max_rows"))
        .select(lit(label).as("join_key"), col("n_rows"), col("n_keys"),
          col("max_rows"),
          round(col("max_rows").cast("double") /
            col("n_rows").cast("double") * 1000000.0).cast("long")
            .as("top_share_e6"),
          round(col("max_rows").cast("double") * col("n_keys")
            .cast("double") / col("n_rows").cast("double") * 1000.0)
            .cast("long").as("skew_x_e3"),
          (col("max_rows") * col("n_keys") >= col("n_rows") * 16)
            .cast("long").as("needs_salt"))
    audit(t(s, dir, "lineitem"), "l_suppkey", "lineitem.l_suppkey")
      .unionByName(
        audit(t(s, dir, "lineitem"), "l_partkey", "lineitem.l_partkey"))
      .unionByName(
        audit(t(s, dir, "orders"), "o_custkey", "orders.o_custkey"))
      .unionByName(
        audit(Tables.eventsSec(s, dir), "user_id", "events.user_id"))
      .orderBy("join_key")
  }

  private val q298Sql = {
    def one(tbl: String, key: String, label: String) =
      s"""SELECT '$label' AS join_key,
         |  CAST(sum(c) AS BIGINT) AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(max(c) AS BIGINT) AS max_rows,
         |  CAST(round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
         |    * 1000000.0) AS BIGINT) AS top_share_e6,
         |  CAST(round(CAST(max(c) AS DOUBLE) * CAST(count(*) AS DOUBLE)
         |    / CAST(sum(c) AS DOUBLE) * 1000.0) AS BIGINT) AS skew_x_e3,
         |  CAST(max(c) * count(*) >= sum(c) * 16 AS BIGINT) AS needs_salt
         |FROM (SELECT $key, CAST(count(*) AS BIGINT) AS c
         |      FROM $tbl GROUP BY 1)""".stripMargin
    Seq(one("lineitem", "l_suppkey", "lineitem.l_suppkey"),
      one("lineitem", "l_partkey", "lineitem.l_partkey"),
      one("orders", "o_custkey", "orders.o_custkey"),
      one("events", "user_id", "events.user_id"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY join_key")
  }

  // ---------------------------------------------------------------------
  // q299 — ROLLUP revenue cube (the §2.4 grouping-sets surface):
  // region → nation → grand total in ONE aggregate pass — Spark
  // plans a single shuffle with an Expand (one row per grouping
  // set), not three scans. lvl is the standard grouping bitmask
  // (0 = leaf, 1 = region subtotal, 3 = grand total); rolled-up
  // names surface as 'ALL' so the output is join- and sort-stable.
  // ---------------------------------------------------------------------
  private def q299(s: SparkSession, dir: String): DataFrame = {
    val dims = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")),
        expr("n_regionkey = r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    t(s, dir, "orders")
      .join(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(grouping_id().cast("long").as("lvl"),
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("rev_e2"))
      .select(col("lvl"), coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_orders"), col("rev_e2"))
      .orderBy("lvl", "region", "nation")
  }

  private val q299Sql =
    """SELECT CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT)
      |    AS lvl,
      |  coalesce(r_name, 'ALL') AS region,
      |  coalesce(n_name, 'ALL') AS nation,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS rev_e2
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY lvl, region, nation""".stripMargin

  // ---------------------------------------------------------------------
  // q300 — exact weighted median per segment WITHOUT a per-segment
  // window funnel: per-customer spend (e2) weighted by order count,
  // globally cum-summed in (segment, spend, custkey) order through
  // Curate.globalCumSum; each segment's internal cumulative weight
  // is the global one minus the alphabetically-earlier segments'
  // totals (a 5-row broadcast). The median is the first spend whose
  // doubled in-segment cumulative weight reaches the segment total
  // (lower weighted median) — picked by min_by over the crossing
  // rows, no window anywhere on the customer grain.
  // ---------------------------------------------------------------------
  private def q300(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .as("spend_e2"), count(lit(1)).as("n_ord"))
      .join(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("segment"), col("o_custkey").as("ck"),
        col("spend_e2"), col("n_ord"))
      .pin() // customer grain; cum-sum + segment totals share it
    val ranked = Curate.globalCumSum(spend,
      Seq(col("segment"), col("spend_e2"), col("ck")),
      col("n_ord"), "cum_w")
    val segTot = spend.groupBy("segment").agg(sum("n_ord").as("w_seg"))
    val segOff = segTot.as("a")
      .join(broadcast(segTot.as("b")),
        col("b.segment") < col("a.segment"), "left")
      .groupBy(col("a.segment"), col("a.w_seg"))
      .agg(coalesce(sum(col("b.w_seg")), lit(0L)).as("w_off"))
      .select(col("segment"), col("w_seg"), col("w_off"))
    ranked.join(broadcast(segOff), Seq("segment"))
      .filter((col("cum_w") - col("w_off")) * 2 >= col("w_seg"))
      .groupBy(col("segment"))
      .agg(max(col("w_seg")).as("w_total"),
        min_by(col("spend_e2"), col("cum_w")).as("median_spend_e2"))
      .orderBy("segment")
  }

  private val q300Sql =
    """WITH spend AS (
      |  SELECT c_mktsegment AS segment, o_custkey AS ck,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS spend_e2,
      |    CAST(count(*) AS BIGINT) AS n_ord
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, CAST(sum(n_ord) OVER (PARTITION BY segment
      |      ORDER BY spend_e2, ck ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS BIGINT) AS cum_in_seg,
      |    CAST(sum(n_ord) OVER (PARTITION BY segment) AS BIGINT)
      |      AS w_seg
      |  FROM spend)
      |SELECT segment, max(w_seg) AS w_total,
      |  min_by(spend_e2, cum_in_seg) AS median_spend_e2
      |FROM ranked WHERE cum_in_seg * 2 >= w_seg
      |GROUP BY segment ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------------
  // q301 — compaction planner (the small-file maintenance pass every
  // lakehouse schedules): day-grain "files" (row count + synthetic
  // byte size from the revenue sum) are packed into merge groups of
  // ~64 MB by cumulative size: group = floor(preceding-cum / target)
  // — deterministic, order-preserving (compaction must not reorder
  // the time axis), and computed via Curate.globalCumSum, so the
  // file INVENTORY (which grows with data volume) never funnels
  // through one task. Output: per group, files, bytes, day span —
  // plus whether the group reaches the target (the trailing group
  // legitimately may not).
  // ---------------------------------------------------------------------
  private def q301(s: SparkSession, dir: String): DataFrame = {
    val target = 64L * 1024 * 1024
    val files = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(round(col("o_totalprice")).cast("long")) * 4).as("bytes"))
    val ranked = Curate.globalCumSum(files, Seq(col("day")),
      col("bytes"), "cum_b")
    ranked
      .withColumn("grp", expr(s"(cum_b - bytes) div ${target}L"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_files"), sum("n_rows").as("n_rows"),
        sum("bytes").as("bytes"),
        min("day").as("first_day"), max("day").as("last_day"))
      .withColumn("reaches_target",
        (col("bytes") >= lit(target)).cast("long"))
      .orderBy("grp")
  }

  private val q301Sql = {
    val target = 64L * 1024 * 1024
    s"""WITH files AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CAST(round(o_totalprice) AS BIGINT)) * 4 AS BIGINT)
       |      AS bytes
       |  FROM orders GROUP BY 1),
       |ranked AS (
       |  SELECT *, CAST(sum(bytes) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) - bytes AS pre_b
       |  FROM files)
       |SELECT pre_b // $target AS grp,
       |  CAST(count(*) AS BIGINT) AS n_files,
       |  CAST(sum(n_rows) AS BIGINT) AS n_rows,
       |  CAST(sum(bytes) AS BIGINT) AS bytes,
       |  min(day) AS first_day, max(day) AS last_day,
       |  CAST(sum(bytes) >= $target AS BIGINT) AS reaches_target
       |FROM ranked GROUP BY 1 ORDER BY grp""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q302 — min/max pruning audit (why sort order is a query-speed
  // decision): chunk the fact table into ~5000-row "files" two ways
  // — natural write order (orderkey ranges) vs shipdate-sorted
  // (global rank via Curate.globalRank, the layout a z-order/sort
  // compaction would produce) — and report, for a one-year shipdate
  // predicate, how many chunks a min/max (zone-map) reader skips.
  // Dates compare as epoch-day integers on both engines. The sorted
  // layout's rank is the only shuffle; chunk stats are map-side
  // combinable aggregates.
  // ---------------------------------------------------------------------
  private def q302(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        datediff(col("l_shipdate"), lit("1995-01-01")).cast("long")
          .as("sd"))
    val lo = datediff(lit("1997-01-01").cast("date"),
      lit("1995-01-01").cast("date"))
    val hi = datediff(lit("1998-01-01").cast("date"),
      lit("1995-01-01").cast("date"))
    def audit(chunked: DataFrame, label: String): DataFrame =
      chunked.groupBy(col("chunk"))
        .agg(min("sd").as("mn"), max("sd").as("mx"))
        .agg(count(lit(1)).as("n_chunks"),
          sum((col("mx") < lit(lo) || col("mn") >= lit(hi)).cast("long"))
            .as("n_pruned"))
        .select(lit(label).as("layout"), col("n_chunks"), col("n_pruned"),
          round(col("n_pruned").cast("double") /
            col("n_chunks").cast("double") * 1000000.0).cast("long")
            .as("prune_share_e6"))
    val natural = li.withColumn("chunk", expr("l_orderkey div 1250"))
    val sorted = Curate.globalRank(li,
        Seq(col("sd"), col("l_orderkey"), col("l_linenumber")))
      .withColumn("chunk", expr("(rnk - 1) div 5000"))
    audit(natural, "natural")
      .unionByName(audit(sorted, "shipdate_sorted"))
      .orderBy("layout")
  }

  private val q302Sql = {
    val sd = "datediff('day', DATE '1995-01-01', l_shipdate)"
    val lo = "datediff('day', DATE '1995-01-01', DATE '1997-01-01')"
    val hi = "datediff('day', DATE '1995-01-01', DATE '1998-01-01')"
    def audit(chunkExpr: String, pre: String, label: String) =
      s"""SELECT '$label' AS layout,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CAST(mx < $lo OR mn >= $hi AS BIGINT)) AS BIGINT)
         |    AS n_pruned,
         |  CAST(round(CAST(sum(CAST(mx < $lo OR mn >= $hi AS BIGINT))
         |      AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1000000.0)
         |    AS BIGINT) AS prune_share_e6
         |FROM (SELECT $chunkExpr AS chunk, min(sd) AS mn, max(sd) AS mx
         |      FROM $pre GROUP BY 1)""".stripMargin
    val base = s"(SELECT l_orderkey, l_linenumber, CAST($sd AS BIGINT)" +
      " AS sd FROM lineitem)"
    val ranked = "(SELECT sd, CAST(row_number() OVER (ORDER BY sd," +
      " l_orderkey, l_linenumber) AS BIGINT) AS rnk FROM " + base + ")"
    audit("l_orderkey // 1250", base, "natural") +
      "\nUNION ALL\n" +
      audit("(rnk - 1) // 5000", ranked, "shipdate_sorted") +
      "\nORDER BY layout"
  }

  // ---------------------------------------------------------------------
  // q303 — bot-regularity screen (the curation pre-filter that keeps
  // scripted traffic out of a training corpus): per user, the
  // variance of inter-event gaps in the n·Σg²−S² integer form
  // (squares in decimal(38,0) — the q293 lesson), scored as
  // var/mean² in e6 (coefficient-of-variation², scale-free). Low
  // score = metronome-regular = bot. Per-user windows partition by
  // user (parallel); the final ordering is a TakeOrdered top-20,
  // never a global sort.
  // ---------------------------------------------------------------------
  private def q303(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_l", "event_id")
    val gaps = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("event_id"),
        Exact.epochS(col("ts_s")).cast("long").as("ts_l"))
      .withColumn("gap", col("ts_l") - lag("ts_l", 1).over(w))
      .filter(col("gap").isNotNull)
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), sum("gap").as("s"),
        sum(col("gap").cast("decimal(38,0)") * col("gap")).as("ss"))
      .filter(col("n_gaps") >= 30 && col("s") > 0)
      .select(col("user_id"), col("n_gaps"),
        round((col("n_gaps").cast("double") * col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double")) /
          (col("s").cast("double") * col("s").cast("double")) *
          1000000.0).cast("long").as("cv2_e6"))
      .orderBy(col("cv2_e6").asc, col("user_id").asc)
      .limit(20)
  }

  private val q303Sql =
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    epoch(date_trunc('second', ts)) AS ts_l
      |  FROM events),
      |gaps AS (
      |  SELECT user_id,
      |    ts_l - lag(ts_l) OVER (PARTITION BY user_id
      |      ORDER BY ts_l, event_id) AS gap
      |  FROM e),
      |m AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
      |    CAST(sum(gap) AS BIGINT) AS s,
      |    sum(CAST(gap AS HUGEINT) * gap) AS ss
      |  FROM gaps WHERE gap IS NOT NULL GROUP BY 1)
      |SELECT user_id, n_gaps,
      |  CAST(round((CAST(n_gaps AS DOUBLE) * CAST(ss AS DOUBLE)
      |    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
      |    / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) * 1000000.0)
      |    AS BIGINT) AS cv2_e6
      |FROM m WHERE n_gaps >= 30 AND s > 0
      |ORDER BY cv2_e6 ASC, user_id ASC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q304 — data-quality expectations audit (the dbt-test/Great-
  // Expectations shape): one row per declared expectation with its
  // violation count and pass flag — range checks are map-side
  // aggregates over one scan each; referential checks are LEFT ANTI
  // joins (broadcast where the parent is dimension-sized). The
  // output contract (suite, check, n_rows, n_violations, pass) is
  // what a warehouse CI gate consumes.
  // ---------------------------------------------------------------------
  private def q304(s: SparkSession, dir: String): DataFrame = {
    def check(label: String, df: DataFrame, bad: Column): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        sum(bad.cast("long")).as("n_violations"))
        .select(lit(label).as("check"), col("n_rows"),
          col("n_violations"),
          (col("n_violations") === 0).cast("long").as("pass"))
    val orders = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    val orphanCust = orders.join(t(s, dir, "customer")
        .select(col("c_custkey")),
      col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(broadcast(orders.agg(count(lit(1)).as("n_rows"))))
      .select(lit("orders.o_custkey_fk").as("check"), col("n_rows"),
        col("n_violations"),
        (col("n_violations") === 0).cast("long").as("pass"))
    val orphanOrd = li.join(orders.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(broadcast(li.agg(count(lit(1)).as("n_rows"))))
      .select(lit("lineitem.l_orderkey_fk").as("check"), col("n_rows"),
        col("n_violations"),
        (col("n_violations") === 0).cast("long").as("pass"))
    check("orders.o_totalprice_range", orders,
        col("o_totalprice") <= 0 || col("o_totalprice") > 1000000)
      .unionByName(check("lineitem.l_discount_range", li,
        col("l_discount") < 0 || col("l_discount") > 0.1))
      .unionByName(check("events.value_nonneg",
        Tables.eventsSec(s, dir), col("value") < 0))
      .unionByName(check("documents.n_chars_consistent",
        t(s, dir, "documents"), col("n_chars") =!= length(col("text"))))
      .unionByName(orphanCust)
      .unionByName(orphanOrd)
      .orderBy("check")
  }

  private val q304Sql = {
    def check(label: String, tbl: String, bad: String) =
      s"""SELECT '$label' AS "check",
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CAST($bad AS BIGINT)) AS BIGINT) AS n_violations,
         |  CAST(sum(CAST($bad AS BIGINT)) = 0 AS BIGINT) AS pass
         |FROM $tbl""".stripMargin
    def orphan(label: String, child: String, ck: String,
               parent: String, pk: String) =
      s"""SELECT '$label' AS "check",
         |  (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_rows,
         |  CAST((SELECT count(*) FROM $child
         |    WHERE $ck NOT IN (SELECT $pk FROM $parent)) AS BIGINT)
         |    AS n_violations,
         |  CAST((SELECT count(*) FROM $child
         |    WHERE $ck NOT IN (SELECT $pk FROM $parent)) = 0 AS BIGINT)
         |    AS pass""".stripMargin
    Seq(
      check("orders.o_totalprice_range", "orders",
        "o_totalprice <= 0 OR o_totalprice > 1000000"),
      check("lineitem.l_discount_range", "lineitem",
        "l_discount < 0 OR l_discount > 0.1"),
      check("events.value_nonneg", "events", "value < 0"),
      check("documents.n_chars_consistent", "documents",
        "n_chars <> length(text)"),
      orphan("orders.o_custkey_fk", "orders", "o_custkey",
        "customer", "c_custkey"),
      orphan("lineitem.l_orderkey_fk", "lineitem", "l_orderkey",
        "orders", "o_orderkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY \"check\"")
  }

  // ---------------------------------------------------------------------
  // q305 — DP-noised publication audit: daily per-type event counts
  // with Laplace(b=50) noise from the PORTABLE hash (inverse-CDF:
  // −b·sign(u−½)·ln(1−2|u−½|) on a hash-derived u — deterministic,
  // identical in both engines, rounded to an INTEGER at the point of
  // computation), plus the true count and absolute error so the
  // utility loss of the privacy budget is the query's own output.
  // One events scan to (type, day) grain; noise is a per-cell scalar
  // expression on ≤ 5·31 rows.
  // ---------------------------------------------------------------------
  private def q305(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val pow60 = 1152921504606846976L.toDouble
    val cells = Tables.eventsSec(s, dir)
      .groupBy(col("event_type"),
        col("ts_s").cast("date").as("day"))
      .agg(count(lit(1)).as("n_true"))
    val u = h.hash60(concat(lit("dp:"), col("event_type"), lit(":"),
      col("day").cast("string"))).cast("double") / lit(pow60)
    val uc = u - lit(0.5)
    val noise = round(lit(-50.0) * signum(uc) *
      log(greatest(lit(1e-18), lit(1.0) - lit(2.0) * abs(uc))))
      .cast("long")
    cells
      .withColumn("n_noised", col("n_true") + noise)
      .withColumn("abs_err", abs(col("n_noised") - col("n_true")))
      .orderBy("event_type", "day")
  }

  private val q305Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "'dp:' || event_type || ':' || CAST(day AS VARCHAR)")
    s"""WITH cells AS (
       |  SELECT event_type,
       |    CAST(date_trunc('second', ts) AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS n_true
       |  FROM events GROUP BY 1, 2),
       |noised AS (
       |  SELECT *, n_true + CAST(round(-50.0
       |      * sign(($h / 1152921504606846976.0) - 0.5)
       |      * ln(greatest(1e-18, 1.0 - 2.0
       |        * abs(($h / 1152921504606846976.0) - 0.5))))
       |    AS BIGINT) AS n_noised
       |  FROM cells)
       |SELECT event_type, day, n_true, n_noised,
       |  abs(n_noised - n_true) AS abs_err
       |FROM noised ORDER BY event_type, day""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q306 — day-of-week seasonality index per priority (the
  // first factor every demand forecast removes): index =
  // dow-mean / overall-mean in e6, computed from exact long sums
  // with ONE final double division per cell (35 cells). The dow is
  // the PORTABLE anchor formula days-since-Monday-anchor mod 7 —
  // both engines' native dayofweek disagree on numbering, the
  // datediff form cannot. One fact scan; the overall mean rides as
  // a broadcast scalar.
  // ---------------------------------------------------------------------
  private def q306(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        pmod(datediff(col("o_orderdate"), lit("1995-01-02")), lit(7))
          .cast("long").as("dow"),
        round(col("o_totalprice") * 100).cast("long").as("rev_e2"))
      .pin() // one scan for both grains
    val overall = o.groupBy("prio")
      .agg(sum("rev_e2").as("s_all"), count(lit(1)).as("n_all"))
    o.groupBy("prio", "dow")
      .agg(sum("rev_e2").as("s_dow"), count(lit(1)).as("n_dow"))
      .join(broadcast(overall), Seq("prio"))
      .select(col("prio"), col("dow"), col("n_dow"),
        round((col("s_dow").cast("double") / col("n_dow").cast("double"))
          / (col("s_all").cast("double") / col("n_all").cast("double"))
          * 1000000.0).cast("long").as("index_e6"))
      .orderBy("prio", "dow")
  }

  private val q306Sql =
    """WITH o AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST((datediff('day', DATE '1995-01-02', o_orderdate) % 7 + 7)
      |      % 7 AS BIGINT) AS dow,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS rev_e2
      |  FROM orders),
      |ov AS (
      |  SELECT prio AS p2, CAST(sum(rev_e2) AS BIGINT) AS s_all,
      |    CAST(count(*) AS BIGINT) AS n_all
      |  FROM o GROUP BY 1)
      |SELECT prio, dow, CAST(count(*) AS BIGINT) AS n_dow,
      |  CAST(round((CAST(sum(rev_e2) AS DOUBLE) / CAST(count(*) AS DOUBLE))
      |    / (CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE))
      |    * 1000000.0) AS BIGINT) AS index_e6
      |FROM o JOIN ov ON prio = p2
      |GROUP BY prio, dow, s_all, n_all
      |ORDER BY prio, dow""".stripMargin

  // ---------------------------------------------------------------------
  // q307 — CUSUM changepoint scan over daily revenue: the classic
  // max|S_t| statistic with S_t integer-scaled by n (S'_t = n·cum_t
  // − t·total — multiply through by n so no division ever happens
  // before the final report). cum_t and the day rank t come from
  // ONE Curate.globalCumSum pass over the day grain (which grows
  // with retention, so no unpartitioned window); the argmax is a
  // max_by over the scored days. Output: the change day, its
  // scaled statistic, and the mean daily revenue on each side —
  // exact integer sums, two final rounded divisions.
  // ---------------------------------------------------------------------
  private def q307(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("d_e2"))
    val ranked = Curate.globalCumSum(daily, Seq(col("day")),
        col("d_e2"), "cum_e2", "t")
      .pin() // day grain; totals + argmax + side-means share it
    val tot = ranked.agg(max("t").as("n_days"), max("cum_e2").as("tot_e2"))
    val scored = ranked.crossJoin(broadcast(tot))
      .withColumn("s_scaled",
        col("n_days") * col("cum_e2") - col("t") * col("tot_e2"))
    val cp = scored
      .agg(max_by(struct(col("day"), col("t"), col("cum_e2"),
        col("s_scaled"), col("n_days"), col("tot_e2")),
        struct(abs(col("s_scaled")), col("t")))
        .as("m"))
      .select(col("m.day").as("cp_day"), col("m.t").as("t"),
        col("m.cum_e2").as("cum_e2"), col("m.s_scaled").as("s_max"),
        col("m.n_days").as("n_days"), col("m.tot_e2").as("tot_e2"))
    cp.select(col("cp_day"), col("n_days"), abs(col("s_max")).as("s_max"),
      round(col("cum_e2").cast("double") / col("t").cast("double"))
        .cast("long").as("mean_before_e2"),
      round((col("tot_e2") - col("cum_e2")).cast("double") /
        (col("n_days") - col("t")).cast("double")).cast("long")
        .as("mean_after_e2"))
  }

  private val q307Sql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS d_e2
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT day,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
      |    CAST(sum(d_e2) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_e2
      |  FROM daily),
      |tot AS (SELECT max(t) AS n_days, max(cum_e2) AS tot_e2
      |        FROM ranked),
      |scored AS (
      |  SELECT *, n_days * cum_e2 - t * tot_e2 AS s_scaled
      |  FROM ranked CROSS JOIN tot),
      |cp AS (
      |  SELECT * FROM scored
      |  ORDER BY abs(s_scaled) DESC, t DESC LIMIT 1)
      |SELECT cp_day, n_days, s_max,
      |  CAST(round(CAST(cum_e2 AS DOUBLE) / CAST(t AS DOUBLE))
      |    AS BIGINT) AS mean_before_e2,
      |  CAST(round(CAST(tot_e2 - cum_e2 AS DOUBLE)
      |    / CAST(n_days - t AS DOUBLE)) AS BIGINT) AS mean_after_e2
      |FROM (SELECT day AS cp_day, n_days, abs(s_scaled) AS s_max,
      |        cum_e2, t, tot_e2 FROM cp)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q298_skew_lint" -> (q298 _),
    "q299_rollup_revenue" -> (q299 _),
    "q300_weighted_median" -> (q300 _),
    "q301_compaction_plan" -> (q301 _),
    "q302_minmax_pruning" -> (q302 _),
    "q303_bot_regularity" -> (q303 _),
    "q304_dq_expectations" -> (q304 _),
    "q305_dp_counts" -> (q305 _),
    "q306_seasonality" -> (q306 _),
    "q307_cusum_changepoint" -> (q307 _))

  val oracle: Map[String, String] = Map(
    "q298_skew_lint" -> q298Sql,
    "q299_rollup_revenue" -> q299Sql,
    "q300_weighted_median" -> q300Sql,
    "q301_compaction_plan" -> q301Sql,
    "q302_minmax_pruning" -> q302Sql,
    "q303_bot_regularity" -> q303Sql,
    "q304_dq_expectations" -> q304Sql,
    "q305_dp_counts" -> q305Sql,
    "q306_seasonality" -> q306Sql,
    "q307_cusum_changepoint" -> q307Sql)
}
