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
  * end. Final decimals must NOT survive into a result schema: the
  * correctness driver hashes Spark `Decimal` and DuckDB
  * HUGEINT→float64 differently even when numerically identical
  * (the round-6 q307 red row), so every decimal intermediate is
  * cast back to BIGINT/DOUBLE — with a loud bound guard — before
  * the final select. Accepted runtime-libm exception (the q285/q286 precedent):
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
      // widen before the multiply: n_days*cum_e2 leaves INT64 around
      // the 10^4-sf mark, and Spark wraps while DuckDB errors
      .withColumn("s_scaled",
        col("cum_e2").cast("decimal(38,0)") * col("n_days") -
          col("tot_e2").cast("decimal(38,0)") * col("t"))
    val cp = scored
      .agg(max_by(struct(col("day"), col("t"), col("cum_e2"),
        col("s_scaled"), col("n_days"), col("tot_e2")),
        struct(abs(col("s_scaled")), col("t")))
        .as("m"))
      .select(col("m.day").as("cp_day"), col("m.t").as("t"),
        col("m.cum_e2").as("cum_e2"), col("m.s_scaled").as("s_max"),
        col("m.n_days").as("n_days"), col("m.tot_e2").as("tot_e2"))
    // The decimal widening is for the INTERMEDIATE product only: a
    // final DecimalType column hashes differently across engines
    // (Spark Decimal vs DuckDB HUGEINT→float64) even when the value
    // is identical, so the result schema must leave the decimal
    // domain. |s_max| ≤ n_days·tot_e2 has ~250× INT64 headroom
    // through ~sf25; past the envelope the guard fails loudly on
    // both engines (Spark raise_error, DuckDB HUGEINT→BIGINT cast).
    val i64Max = lit(Long.MaxValue).cast("decimal(38,0)")
    cp.select(col("cp_day"), col("n_days"),
      when(abs(col("s_max")) <= i64Max, abs(col("s_max")).cast("long"))
        .otherwise(raise_error(lit("q307: |s_max| exceeds INT64")))
        .as("s_max"),
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
      |  SELECT *, CAST(cum_e2 AS HUGEINT) * n_days
      |      - CAST(tot_e2 AS HUGEINT) * t AS s_scaled
      |  FROM ranked CROSS JOIN tot),
      |cp AS (
      |  SELECT * FROM scored
      |  ORDER BY abs(s_scaled) DESC, t DESC LIMIT 1)
      |SELECT cp_day, n_days, s_max,
      |  CAST(round(CAST(cum_e2 AS DOUBLE) / CAST(t AS DOUBLE))
      |    AS BIGINT) AS mean_before_e2,
      |  CAST(round(CAST(tot_e2 - cum_e2 AS DOUBLE)
      |    / CAST(n_days - t AS DOUBLE)) AS BIGINT) AS mean_after_e2
      |FROM (SELECT day AS cp_day, n_days,
      |        CAST(abs(s_scaled) AS BIGINT) AS s_max,
      |        cum_e2, t, tot_e2 FROM cp)""".stripMargin

  // ---------------------------------------------------------------------
  // q308 — lagged cross-correlation (does the error series LEAD the
  // purchase series?): hourly error and purchase counts, Pearson r
  // at lags 0..6 h via the n·Σxy−ΣxΣy integer form (squares/products
  // in decimal(38,0)), one sqrt+division per lag row. The hour grain
  // is retention-bounded; each lag is ONE equi-join of the pinned
  // hourly table against itself shifted — never a cross join.
  // ---------------------------------------------------------------------
  private def q308(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.eventsSec(s, dir)
      .groupBy((Exact.epochS(col("ts_s")).cast("long") / 3600)
        .cast("long").as("h"))
      .agg(sum((col("event_type") === "error").cast("long")).as("x"),
        sum((col("event_type") === "purchase").cast("long")).as("y"))
      .pin() // both sides of every lag join read this
    val lags = s.range(0, 7).select(col("id").as("lag"))
    def d(c: Column): Column = c.cast("double")
    val joined = hourly.select(col("h"), col("x"))
      .crossJoin(broadcast(lags))
      .join(hourly.select((col("h")).as("hy"), col("y")),
        col("hy") === col("h") + col("lag"))
    joined.groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      // a zero-variance window (constant x or y over a lag) zeroes
      // the sqrt denominator: Spark would cast the Infinity/NaN to
      // Long.MaxValue while DuckDB errors on CAST(round(inf)) — emit
      // NULL on both engines instead (the q295 divergent-failure fix)
      .withColumn("vx", d(col("n")) * d(col("sxx")) -
        d(col("sx")) * d(col("sx")))
      .withColumn("vy", d(col("n")) * d(col("syy")) -
        d(col("sy")) * d(col("sy")))
      .select(col("lag"), col("n"),
        when(col("vx") === 0.0 || col("vy") === 0.0,
          lit(null).cast("long"))
          .otherwise(round((d(col("n")) * d(col("sxy")) -
            d(col("sx")) * d(col("sy")))
            / sqrt(col("vx") * col("vy")) * 1000000.0).cast("long"))
          .as("r_e6"))
      .orderBy("lag")
  }

  private val q308Sql =
    """WITH hourly AS (
      |  SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600
      |      AS h,
      |    CAST(sum(CAST(event_type = 'error' AS BIGINT)) AS BIGINT) AS x,
      |    CAST(sum(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT)
      |      AS y
      |  FROM events GROUP BY 1),
      |lags AS (SELECT CAST(unnest(range(7)) AS BIGINT) AS lag),
      |joined AS (
      |  SELECT lag, a.x, b.y
      |  FROM hourly a CROSS JOIN lags
      |  JOIN hourly b ON b.h = a.h + lag),
      |m AS (
      |  SELECT lag, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM joined GROUP BY 1),
      |v AS (
      |  SELECT *, CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
      |  FROM m)
      |SELECT lag, n,
      |  CASE WHEN vx = 0 OR vy = 0 THEN NULL
      |    ELSE CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / sqrt(vx * vy) * 1000000.0) AS BIGINT) END AS r_e6
      |FROM v ORDER BY lag""".stripMargin

  // ---------------------------------------------------------------------
  // q309 — graph-diameter probe by double BFS (the standard lower
  // bound): BFS from customer-node 0, hop to the farthest reached
  // node (max dist, min node id tiebreak — a 1-row scalar probe, the
  // documented driver-probe exception), BFS again from there; the
  // second eccentricity lower-bounds the diameter. Frontier
  // expansion keeps every round frontier-sized (operators/Graph);
  // the oracle is the q156 depth-bounded recursive-CTE pattern run
  // twice, its second seed a scalar subquery over the first pass.
  // ---------------------------------------------------------------------
  private def q309(s: SparkSession, dir: String): DataFrame = {
    val cs = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("cn"),
        (col("l_suppkey") * 2 + 1).as("sn"))
      .distinct()
    val edges = cs.select(col("cn").as("src"), col("sn").as("dst"))
      .unionByName(cs.select(col("sn").as("src"), col("cn").as("dst")))
      .pin() // both BFS passes scan this
    val d1 = graft.operators.Graph.bfsDistances(edges, source = 0L,
      maxDepth = 20)
    val far = d1.orderBy(col("dist").desc, col("node").asc).limit(1)
      .collect()(0) // 1-row scalar probe between the two passes
    val src2 = far.getLong(0)
    val ecc1 = far.getLong(1)
    val d2 = graft.operators.Graph.bfsDistances(edges, source = src2,
      maxDepth = 20)
    d2.agg(count(lit(1)).as("n_reach2"),
        max(col("dist")).as("diameter_lb"))
      .crossJoin(broadcast(d1.agg(count(lit(1)).as("n_reach1"))))
      .select(lit(0L).as("src1"), lit(ecc1).as("ecc1"),
        lit(src2).as("src2"), col("diameter_lb"),
        col("n_reach1"), col("n_reach2"))
  }

  private val q309Sql =
    """WITH RECURSIVE cs AS (
      |  SELECT DISTINCT o_custkey * 2 AS cn, l_suppkey * 2 + 1 AS sn
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS MATERIALIZED (
      |  SELECT cn AS src, sn AS dst FROM cs
      |  UNION ALL SELECT sn, cn FROM cs),
      |r1(node, d) AS (
      |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |  UNION
      |  SELECT CAST(e.dst AS BIGINT), r.d + 1
      |  FROM r1 r JOIN edges e ON r.node = e.src
      |  WHERE r.d < 20),
      |d1 AS MATERIALIZED (
      |  SELECT node, CAST(min(d) AS BIGINT) AS dist
      |  FROM r1 GROUP BY 1),
      |far AS (SELECT node, dist FROM d1
      |        ORDER BY dist DESC, node ASC LIMIT 1),
      |r2(node, d) AS (
      |  SELECT (SELECT node FROM far), CAST(0 AS BIGINT)
      |  UNION
      |  SELECT CAST(e.dst AS BIGINT), r.d + 1
      |  FROM r2 r JOIN edges e ON r.node = e.src
      |  WHERE r.d < 20),
      |d2 AS MATERIALIZED (
      |  SELECT node, CAST(min(d) AS BIGINT) AS dist
      |  FROM r2 GROUP BY 1)
      |SELECT CAST(0 AS BIGINT) AS src1,
      |  (SELECT dist FROM far) AS ecc1,
      |  (SELECT node FROM far) AS src2,
      |  (SELECT CAST(max(dist) AS BIGINT) FROM d2) AS diameter_lb,
      |  (SELECT CAST(count(*) AS BIGINT) FROM d1) AS n_reach1,
      |  (SELECT CAST(count(*) AS BIGINT) FROM d2) AS n_reach2""".stripMargin

  // ---------------------------------------------------------------------
  // q310 — partition/file sizing advisor: per table, the EXACT
  // serialized row-width estimate (fixed widths + actual string
  // lengths, the arithmetic a planner's statistics collector runs),
  // total size, and the 128 MB-target file count and rows-per-file
  // recommendation. One map-side-combinable aggregate per table —
  // the width estimate is a per-row projection, never a sample.
  // ---------------------------------------------------------------------
  private def q310(s: SparkSession, dir: String): DataFrame = {
    val target = 128L * 1024 * 1024
    def audit(df: DataFrame, label: String, width: Column): DataFrame =
      df.agg(count(lit(1)).as("n_rows"), sum(width).as("est_bytes"))
        .select(lit(label).as("table_name"), col("n_rows"),
          col("est_bytes"),
          round(col("est_bytes").cast("double") /
            col("n_rows").cast("double")).cast("long").as("row_bytes"),
          greatest(lit(1L), expr(s"(est_bytes + ${target - 1}L)" +
            s" div ${target}L")).as("n_files_128mb"))
    val strW = (c: String) => length(col(c)).cast("long") + 4L
    audit(t(s, dir, "orders"), "orders",
        lit(8L + 8 + 8 + 8) + strW("o_orderstatus") +
          strW("o_orderpriority"))
      .unionByName(audit(t(s, dir, "lineitem"), "lineitem",
        lit(8L * 3 + 4 + 8 * 4 + 8) + strW("l_returnflag") +
          strW("l_linestatus")))
      .unionByName(audit(t(s, dir, "events"), "events",
        lit(8L + 8 + 8 + 8) + strW("event_type") + strW("props")))
      .unionByName(audit(t(s, dir, "documents"), "documents",
        lit(8L + 8) + strW("text") + strW("lang") + strW("source")))
      .orderBy("table_name")
  }

  private val q310Sql = {
    val target = 128L * 1024 * 1024
    def one(tbl: String, width: String) =
      s"""SELECT '$tbl' AS table_name,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum($width) AS BIGINT) AS est_bytes,
         |  CAST(round(CAST(sum($width) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS row_bytes,
         |  greatest(1, (CAST(sum($width) AS BIGINT) + ${target - 1})
         |    // $target) AS n_files_128mb
         |FROM $tbl""".stripMargin
    Seq(
      one("orders", "32 + length(o_orderstatus) + 4" +
        " + length(o_orderpriority) + 4"),
      one("lineitem", "68 + length(l_returnflag) + 4" +
        " + length(l_linestatus) + 4"),
      one("events", "32 + length(event_type) + 4 + length(props) + 4"),
      one("documents", "16 + length(text) + 4 + length(lang) + 4" +
        " + length(source) + 4"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  // ---------------------------------------------------------------------
  // q311 — retention/TTL audit: orders bucketed by age in whole
  // years against a FIXED policy date (2002-01-01, just past the
  // dataset's max order date — a plan literal, never wall-clock:
  // wall-clock in a gate query breaks reproducibility), with bytes
  // from the q310 width arithmetic and the reclaimable total under a
  // 3-year TTL. One scan, age is a per-row integer expression.
  // ---------------------------------------------------------------------
  private def q311(s: SparkSession, dir: String): DataFrame = {
    val width = lit(8L + 8 + 8 + 8) +
      length(col("o_orderstatus")).cast("long") + 4L +
      length(col("o_orderpriority")).cast("long") + 4L
    t(s, dir, "orders")
      .select(expr("datediff('2002-01-01', o_orderdate) div 365")
        .cast("long").as("age_years"), width.as("w"))
      .groupBy("age_years")
      .agg(count(lit(1)).as("n_rows"), sum("w").as("bytes"))
      .withColumn("reclaimable", (col("age_years") >= 3).cast("long"))
      .orderBy("age_years")
  }

  private val q311Sql =
    """SELECT datediff('day', o_orderdate, TIMESTAMP '2002-01-01') // 365
      |    AS age_years,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(32 + length(o_orderstatus) + 4
      |    + length(o_orderpriority) + 4) AS BIGINT) AS bytes,
      |  CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') // 365
      |    >= 3 AS BIGINT) AS reclaimable
      |FROM orders
      |GROUP BY 1
      |ORDER BY age_years""".stripMargin

  // ---------------------------------------------------------------------
  // q312 — watermark-delay advisor: treating event_id as ARRIVAL
  // order, each event's lateness is (highest event time seen before
  // it arrived) − (its own event time). The running max routes
  // through Curate.globalCumMax (exclusive frame — the watermark
  // shape), so the arrival log never funnels through one task; the
  // report scores candidate delays 0/30/60/300/900 s by how many
  // late events each would still drop (what `withWatermark` tuning
  // actually needs). Coverage is an e6 share of ALL events.
  // ---------------------------------------------------------------------
  private def q312(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_id"), Exact.epochS(col("ts_s")).cast("long")
        .as("ts_l"))
    val late = Curate.globalCumMax(e, Seq(col("event_id")),
        col("ts_l"), "wm_prev", inclusive = false)
      .select(greatest(coalesce(col("wm_prev") - col("ts_l"), lit(0L)),
        lit(0L)).as("late_s"))
      .pin() // 5 candidate delays share the lateness table
    val cands = s.range(0, 5).select(element_at(
      array(lit(0L), lit(30L), lit(60L), lit(300L), lit(900L)),
      col("id").cast("int") + 1).as("delay_s"))
    late.crossJoin(broadcast(cands))
      .groupBy("delay_s")
      .agg(count(lit(1)).as("n_events"),
        sum((col("late_s") > col("delay_s")).cast("long"))
          .as("n_dropped"))
      .withColumn("coverage_e6",
        round((col("n_events") - col("n_dropped")).cast("double") /
          col("n_events").cast("double") * 1000000.0).cast("long"))
      .orderBy("delay_s")
  }

  private val q312Sql =
    """WITH e AS (
      |  SELECT event_id,
      |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_l
      |  FROM events),
      |lateness AS (
      |  SELECT greatest(coalesce(max(ts_l) OVER (ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ts_l,
      |    0), 0) AS late_s
      |  FROM e),
      |cands AS (SELECT CAST(unnest([0, 30, 60, 300, 900]) AS BIGINT)
      |          AS delay_s)
      |SELECT delay_s, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(late_s > delay_s AS BIGINT)) AS BIGINT)
      |    AS n_dropped,
      |  CAST(round(CAST(count(*) - sum(CAST(late_s > delay_s AS BIGINT))
      |      AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1000000.0)
      |    AS BIGINT) AS coverage_e6
      |FROM lateness CROSS JOIN cands
      |GROUP BY 1 ORDER BY delay_s""".stripMargin

  // ---------------------------------------------------------------------
  // q313 — audio silence screen (the trim/discard pre-filter an
  // audio-curation pipeline runs first): every synthetic WAV decodes
  // through the real RIFF parser into 40-sample frames (the q206
  // machinery); a frame is silent when its Σs² energy is below 10M.
  // Per clip: frame counts, silent share, and the leading-silence
  // run length (min non-silent frame index) — the integer features a
  // trim decision needs. Oracle recomputes from the waveform's
  // closed form without parsing a byte.
  // ---------------------------------------------------------------------
  private def q313(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val th = 10000000L
    Multimodal.wavFrameFeatures(
        Multimodal.syntheticWav(t(s, dir, "documents")), 40)
      .toDF()
      .withColumn("silent", (col("energy") < th).cast("long"))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"), sum("silent").as("n_silent"),
        min(when(col("silent") === 0, col("frame_idx")))
          .as("first_voiced"))
      .select(col("media_id"), col("n_frames"), col("n_silent"),
        round(col("n_silent").cast("double") /
          col("n_frames").cast("double") * 1000000.0).cast("long")
          .as("silent_share_e6"),
        coalesce(col("first_voiced"), col("n_frames"))
          .as("leading_silent"))
      .orderBy("media_id")
  }

  private val q313Sql =
    """WITH d AS (
      |  SELECT doc_id, 160 + (doc_id % 23) * 8 AS n FROM documents),
      |s AS (
      |  SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
      |v AS (
      |  SELECT doc_id, i // 40 AS frame_idx,
      |    ((doc_id * 31 + i * 37) % 2003) - 1001 AS v
      |  FROM s),
      |frames AS (
      |  SELECT doc_id AS media_id, frame_idx,
      |    CAST(sum(v * v) < 10000000 AS BIGINT) AS silent
      |  FROM v GROUP BY 1, 2)
      |SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
      |  CAST(sum(silent) AS BIGINT) AS n_silent,
      |  CAST(round(CAST(sum(silent) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) * 1000000.0) AS BIGINT)
      |    AS silent_share_e6,
      |  CAST(coalesce(min(CASE WHEN silent = 0 THEN frame_idx END),
      |    count(*)) AS BIGINT) AS leading_silent
      |FROM frames GROUP BY media_id
      |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------------
  // q314 — t-closeness audit (completing the q238 k-anonymity /
  // q253 l-diversity privacy triad): for each quasi-identifier class
  // (event_type × day), the Earth-Mover's Distance between the
  // class's distribution over the ORDERED sensitive attribute
  // (value in 100-unit bins) and the global one — for ordered bins,
  // EMD = Σ|cumulative difference| / (B−1), kept integer by
  // cross-multiplying the two cumulative counts (cum_c·N − cum_g·n_c)
  // until one final e6 division. Bins are dense per class (a ≤10-row
  // broadcast), cumulated by a window over the bin axis partitioned
  // by class. Output: the 20 worst classes.
  // ---------------------------------------------------------------------
  private def q314(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type"), col("ts_s").cast("date").as("day"),
        floor(col("value") / 100).cast("long").as("bin"))
      .pin() // class counts + global counts share one scan
    val classBin = e.groupBy("event_type", "day", "bin")
      .agg(count(lit(1)).as("nc"))
    val classes = e.groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_class"))
    val globBin = e.groupBy("bin").agg(count(lit(1)).as("ng"))
    val tot = e.agg(count(lit(1)).as("n_tot"),
      countDistinct(col("bin")).as("n_bins"))
    val dense = classes.crossJoin(broadcast(globBin))
      .join(classBin, Seq("event_type", "day", "bin"), "left")
      .na.fill(0L, Seq("nc"))
    val wB = Window.partitionBy("event_type", "day").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    dense
      .withColumn("cum_c", sum("nc").over(wB))
      .withColumn("cum_g", sum("ng").over(wB))
      .crossJoin(broadcast(tot))
      .groupBy(col("event_type"), col("day"), col("n_class"))
      // cross-multiplied cumulatives widen to decimal(38,0) BEFORE
      // the product (the q277/q293 discipline): LONG*LONG wraps
      // silently in Spark but errors loudly in DuckDB's HUGEINT
      .agg(sum(abs(col("cum_c").cast("decimal(38,0)") * col("n_tot") -
        col("cum_g").cast("decimal(38,0)") * col("n_class")))
        .as("emd_num"),
        max(col("n_tot")).as("nt"), max(col("n_bins")).as("nb"))
      .select(col("event_type"), col("day"), col("n_class"),
        // a degenerate single-bin distribution zeroes (nb−1): Spark
        // would cast the Infinity to Long.MaxValue while DuckDB
        // errors on the cast — emit NULL on both engines instead
        when(col("nb") <= 1, lit(null).cast("long"))
          .otherwise(round(col("emd_num").cast("double") /
            (col("nt").cast("double") * col("n_class").cast("double") *
              (col("nb") - 1).cast("double")) * 1000000.0).cast("long"))
          .as("emd_e6"))
      .orderBy(col("emd_e6").desc, col("event_type"), col("day"))
      .limit(20)
  }

  private val q314Sql =
    """WITH e AS (
      |  SELECT event_type, CAST(date_trunc('second', ts) AS DATE)
      |      AS day,
      |    CAST(floor(value / 100) AS BIGINT) AS bin
      |  FROM events),
      |classbin AS (
      |  SELECT event_type, day, bin, CAST(count(*) AS BIGINT) AS nc
      |  FROM e GROUP BY 1, 2, 3),
      |classes AS (
      |  SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_class
      |  FROM e GROUP BY 1, 2),
      |globbin AS (
      |  SELECT bin, CAST(count(*) AS BIGINT) AS ng FROM e GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot,
      |    CAST(count(DISTINCT bin) AS BIGINT) AS n_bins FROM e),
      |dense AS (
      |  SELECT c.event_type, c.day, c.n_class, g.bin, g.ng,
      |    coalesce(cb.nc, 0) AS nc
      |  FROM classes c CROSS JOIN globbin g
      |  LEFT JOIN classbin cb ON cb.event_type = c.event_type
      |    AND cb.day = c.day AND cb.bin = g.bin),
      |cum AS (
      |  SELECT *, CAST(sum(nc) OVER (PARTITION BY event_type, day
      |      ORDER BY bin) AS BIGINT) AS cum_c,
      |    CAST(sum(ng) OVER (PARTITION BY event_type, day
      |      ORDER BY bin) AS BIGINT) AS cum_g
      |  FROM dense)
      |SELECT event_type, day, n_class,
      |  CASE WHEN n_bins <= 1 THEN NULL
      |    ELSE CAST(round(CAST(sum(abs(CAST(cum_c AS HUGEINT) * n_tot
      |        - CAST(cum_g AS HUGEINT) * n_class))
      |      AS DOUBLE)
      |    / (CAST(n_tot AS DOUBLE) * CAST(n_class AS DOUBLE)
      |      * CAST(n_bins - 1 AS DOUBLE)) * 1000000.0) AS BIGINT)
      |    END AS emd_e6
      |FROM cum CROSS JOIN tot
      |GROUP BY event_type, day, n_class, n_tot, n_bins
      |ORDER BY emd_e6 DESC, event_type, day LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q315 — join-cardinality estimation audit (the planner's
  // statistics question, asked OF the data): estimate the
  // l_partkey self-join size from a 100-heavy-hitter histogram
  // (exact Σc² over the top 100 keys + uniform-tail assumption for
  // the rest) and compare with the true Σc² — the error a
  // histogram-based optimizer would eat on this key. Key counts are
  // one aggregate; the top-100 cut is a bounded TakeOrdered; all
  // squares in decimal(38,0).
  // ---------------------------------------------------------------------
  private def q315(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .pin() // truth + histogram + tail stats share it
    val truth = counts.agg(
      sum(col("c").cast("decimal(38,0)") * col("c")).as("true_pairs"),
      sum("c").as("n_rows"), count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("c").desc, col("l_partkey")).limit(100)
    val topAgg = top.agg(
      sum(col("c").cast("decimal(38,0)") * col("c")).as("hh_pairs"),
      sum("c").as("hh_rows"), count(lit(1)).as("hh_keys"))
    truth.crossJoin(broadcast(topAgg))
      .select(col("n_rows"), col("n_keys"),
        col("true_pairs").cast("long").as("true_pairs"),
        (col("hh_pairs").cast("long") +
          when(col("n_keys") > col("hh_keys"),
            round((col("n_rows") - col("hh_rows")).cast("double") *
              ((col("n_rows") - col("hh_rows")).cast("double") /
                (col("n_keys") - col("hh_keys")).cast("double")))
              .cast("long")).otherwise(lit(0L))).as("est_pairs"))
      .withColumn("err_e6",
        round((col("est_pairs") - col("true_pairs")).cast("double") /
          col("true_pairs").cast("double") * 1000000.0).cast("long"))
  }

  private val q315Sql =
    """WITH counts AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |truth AS (
      |  SELECT sum(CAST(c AS HUGEINT) * c) AS true_pairs,
      |    CAST(sum(c) AS BIGINT) AS n_rows,
      |    CAST(count(*) AS BIGINT) AS n_keys
      |  FROM counts),
      |top AS (SELECT * FROM counts ORDER BY c DESC, l_partkey LIMIT 100),
      |topagg AS (
      |  SELECT sum(CAST(c AS HUGEINT) * c) AS hh_pairs,
      |    CAST(sum(c) AS BIGINT) AS hh_rows,
      |    CAST(count(*) AS BIGINT) AS hh_keys
      |  FROM top)
      |SELECT n_rows, n_keys, CAST(true_pairs AS BIGINT) AS true_pairs,
      |  CAST(hh_pairs AS BIGINT) + CASE WHEN n_keys > hh_keys
      |    THEN CAST(round(CAST(n_rows - hh_rows AS DOUBLE)
      |      * (CAST(n_rows - hh_rows AS DOUBLE)
      |        / CAST(n_keys - hh_keys AS DOUBLE))) AS BIGINT)
      |    ELSE 0 END AS est_pairs,
      |  CAST(round((CAST(CAST(hh_pairs AS BIGINT) + CASE WHEN n_keys >
      |      hh_keys THEN CAST(round(CAST(n_rows - hh_rows AS DOUBLE)
      |      * (CAST(n_rows - hh_rows AS DOUBLE)
      |        / CAST(n_keys - hh_keys AS DOUBLE))) AS BIGINT)
      |      ELSE 0 END - CAST(true_pairs AS BIGINT) AS DOUBLE))
      |    / CAST(true_pairs AS DOUBLE) * 1000000.0) AS BIGINT)
      |    AS err_e6
      |FROM truth CROSS JOIN topagg""".stripMargin

  // ---------------------------------------------------------------------
  // q324 — the DataSource V2 connector in the gate: read the
  // deterministic synthetic-events source (sources.v2.SynthEvents —
  // custom TableProvider with REAL filter pushdown and column
  // pruning), with an id-range predicate the source absorbs at
  // planning time (60k rows generated, not 100k), aggregated by
  // type. The oracle REGENERATES identical rows in DuckDB from
  // range() through the same portable hash — the connector's whole
  // row-generation contract is bit-checked, not just row counts.
  // ---------------------------------------------------------------------
  private def q324(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.v2.SynthEventsProvider")
      .option("rows", "100000").load()
      .filter(col("event_id") >= 20000L && col("event_id") < 80000L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value_e2").as("sum_value_e2"),
        sum("user_id").as("user_checksum"), sum("ts_l").as("ts_checksum"))
      .orderBy("event_type")

  private val q324Sql = {
    val gen = graft.sources.v2.SynthEvents.duckSql(20000, 80000, 1500)
    s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(value_e2) AS BIGINT) AS sum_value_e2,
       |  CAST(sum(user_id) AS BIGINT) AS user_checksum,
       |  CAST(sum(ts_l) AS BIGINT) AS ts_checksum
       |FROM ($gen)
       |GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q325 — the connector's STREAMING face in the gate: the same
  // synthetic source read through readStream (MicroBatchStream:
  // id-offsets, per-batch range splits), drained with AvailableNow
  // into a complete-mode aggregate in a memory sink. The oracle is
  // the same DuckDB row regeneration — batch and stream reads of a
  // connector must agree bit-for-bit, which is exactly what a
  // lambda/kappa dual-path deployment needs to prove.
  // ---------------------------------------------------------------------
  private def q325(s: SparkSession, dir: String): DataFrame = {
    val name = "q325_synth_stream_" + java.util.UUID.randomUUID
      .toString.replace("-", "")
    graft.core.PlanStats.markStreamingStart()
    val q = s.readStream
      .format("graft.sources.v2.SynthEventsProvider")
      .option("rows", "50000").load()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value_e2").as("sum_value_e2"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name).orderBy("event_type")
  }

  private val q325Sql = {
    val gen = graft.sources.v2.SynthEvents.duckSql(0, 50000, 1500)
    s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(value_e2) AS BIGINT) AS sum_value_e2
       |FROM ($gen)
       |GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q343 — the connector's AGGREGATE pushdown in the gate
  // (SupportsPushDownAggregates — the connector analogue of
  // answering MIN/MAX/COUNT from parquet footer stats): a global
  // COUNT(*)/MIN/MAX over the synthetic source with an id-range
  // filter collapses AT THE SOURCE into one closed-form row — the
  // scan generates zero rows (plan-asserted in PlanQualitySpec: the
  // BatchScan reports PushedAggregates and no row-generating
  // partition survives). Filters push before aggregates, so the
  // pushed range is the filtered one. The oracle computes the same
  // aggregate over DuckDB's range() — honest arithmetic, not a
  // copied literal.
  // ---------------------------------------------------------------------
  private def q343(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.v2.SynthEventsProvider")
      .option("rows", "100000").load()
      .filter(col("event_id") >= 12345L && col("event_id") < 87654L)
      .agg(count(lit(1)).as("n_rows"), min("event_id").as("min_id"),
        max("event_id").as("max_id"))

  private val q343Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(min(i) AS BIGINT) AS min_id,
      |  CAST(max(i) AS BIGINT) AS max_id
      |FROM (SELECT unnest(range(12345, 87654)) AS i)""".stripMargin

  // ---------------------------------------------------------------------
  // q358 — the connector's PARTIAL (grouped) aggregate pushdown:
  // GROUP BY user_id COUNT/MIN/MAX over the synthetic source takes
  // the supportCompletePushDown=false path — the scan emits one
  // partial row per (partition, user) from a bounded per-user
  // accumulator (constant state width regardless of range length,
  // the q347 discipline) and Spark finalizes across partitions
  // (COUNT partials re-aggregated by SUM, MIN/MAX by themselves).
  // Shuffle volume is parts×users partial rows instead of 60k
  // generated rows — the smart-storage-node shape. PlanQualitySpec
  // asserts PushedGroupBy reaches the BatchScan; the oracle
  // regenerates the rows in DuckDB and aggregates them whole — so
  // the partial/finalize split itself is what the gate proves
  // correct.
  // ---------------------------------------------------------------------
  private def q358(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.v2.SynthEventsProvider")
      .option("rows", "100000").load()
      .filter(col("event_id") >= 30000L && col("event_id") < 90000L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), min("event_id").as("min_id"),
        max("event_id").as("max_id"))
      .orderBy("user_id")

  private val q358Sql = {
    val gen = graft.sources.v2.SynthEvents.duckSql(30000, 90000, 1500)
    s"""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(min(event_id) AS BIGINT) AS min_id,
       |  CAST(max(event_id) AS BIGINT) AS max_id
       |FROM ($gen)
       |GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q376 — the connector's MULTI-KEY + SUM partial pushdown (the
  // remaining advertised surface after q358's single-key
  // COUNT/MIN/MAX): GROUP BY (user_id, event_type) with
  // COUNT/SUM(event_id)/MIN/MAX all fold inside the scan to one
  // partial row per (partition, user, type) — the accumulator stays
  // bounded at users×5 entries of fixed width however long the id
  // range is — and Spark finalizes across partitions (COUNT and SUM
  // partials re-aggregate as SUM, MIN/MAX as themselves). Shuffle
  // volume is parts × groups partial rows instead of 60k generated
  // rows. PlanQualitySpec asserts `PushedGroupBy [user_id,
  // event_type]` reaches the BatchScan with the finalize aggregate
  // still on top; the oracle regenerates the rows in DuckDB and
  // aggregates them whole, so the partial/finalize split is what the
  // gate proves.
  // ---------------------------------------------------------------------
  private def q376(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.v2.SynthEventsProvider")
      .option("rows", "100000").load()
      .filter(col("event_id") >= 20000L && col("event_id") < 80000L)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum("event_id").as("sum_id"),
        min("event_id").as("min_id"),
        max("event_id").as("max_id"))
      .orderBy("user_id", "event_type")

  private val q376Sql = {
    val gen = graft.sources.v2.SynthEvents.duckSql(20000, 80000, 1500)
    s"""SELECT user_id, event_type,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(event_id) AS BIGINT) AS sum_id,
       |  CAST(min(event_id) AS BIGINT) AS min_id,
       |  CAST(max(event_id) AS BIGINT) AS max_id
       |FROM ($gen)
       |GROUP BY user_id, event_type
       |ORDER BY user_id, event_type""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q401 — the connector's TopN pushdown (SupportsPushDownTopN,
  // COMPLETE: isPartiallyPushed = false): ORDER BY event_id DESC
  // LIMIT 20 over a filter-narrowed range collapses into ONE
  // partition emitting the range's last 20 ids in descending order —
  // Spark's Sort and Limit disappear from the plan entirely
  // (PlanQualitySpec: BatchScan reports PushedTopN; no
  // TakeOrderedAndProject, no Sort operator). At 100 TB this is the
  // "latest-k events" probe answered in O(k) instead of a full scan
  // + cluster-wide top-k. The oracle re-sorts DuckDB's regenerated
  // rows — the pushed path must agree with the un-pushed semantics
  // bit-for-bit.
  // ---------------------------------------------------------------------
  private def q401(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.v2.SynthEventsProvider")
      .option("rows", "100000").load()
      .filter(col("event_id") >= 20000L && col("event_id") < 80000L)
      .orderBy(col("event_id").desc)
      .limit(20)

  private val q401Sql = {
    val gen = graft.sources.v2.SynthEvents.duckSql(20000, 80000, 1500)
    s"""SELECT event_id, ts_l, user_id, event_type, value_e2
       |FROM ($gen)
       |ORDER BY event_id DESC LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q466 — the connector's OFFSET pushdown (SupportsPushDownOffset,
  // composed with the pushed TopN): ORDER BY event_id OFFSET 1000
  // LIMIT 25 collapses into ONE partition enumerating exactly ids
  // [lo+1000, lo+1025) — pagination answered in O(page) instead of
  // O(offset + page) rows ever materializing (the scan SHIFTS its
  // ordered window; at 100 TB, "page 40 of the event feed" costs the
  // same as page 1). Offset over an UNORDERED scan is declined — it
  // has no stable meaning — so Spark keeps its own operator there.
  // Plan-asserted: BatchScan reports PushedOffset; no Sort/Offset
  // operators remain. The oracle re-sorts DuckDB's regenerated rows
  // through plain LIMIT/OFFSET.
  // ---------------------------------------------------------------------
  private def q466(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.v2.SynthEventsProvider")
      .option("rows", "100000").load()
      .filter(col("event_id") >= 20000L && col("event_id") < 80000L)
      .orderBy(col("event_id"))
      .offset(1000)
      .limit(25)

  private val q466Sql = {
    val gen = graft.sources.v2.SynthEvents.duckSql(20000, 80000, 1500)
    s"""SELECT event_id, ts_l, user_id, event_type, value_e2
       |FROM ($gen)
       |ORDER BY event_id LIMIT 25 OFFSET 1000""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q402 — the connector's REPORTED PARTITIONING
  // (SupportsReportPartitioning): layout=mod clusters events by
  // user_id = event_id % users, userparts=true plans one
  // KEY-DISJOINT partition per user (HasPartitionKey; each partition
  // enumerates ONLY its own ids by stepping `users` — work
  // proportional to its rows), and the scan reports
  // KeyGroupedPartitioning(identity(user_id)). A groupBy(user_id)
  // over NON-pushable aggregates (sums of value_e2/ts_l) then
  // satisfies its clustered distribution straight off the read:
  // partial and final HashAggregate fuse in one codegen span over
  // the BatchScan with ZERO hash exchange (plan-asserted) — the
  // connector analogue of aggregating over a bucketed table (the
  // q117 discipline at the DSv2 boundary). The only exchange in the
  // plan is the final ORDER BY's range partitioning.
  // ---------------------------------------------------------------------
  private def q402(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.v2.SynthEventsProvider")
      .option("rows", "200000").option("users", "64")
      .option("layout", "mod").option("userparts", "true").load()
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum("value_e2").as("sum_value_e2"),
        sum("ts_l").as("ts_checksum"))
      .orderBy("user_id")

  private val q402Sql = {
    val gen = graft.sources.v2.SynthEvents.duckSql(0, 200000, 64, "mod")
    s"""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(value_e2) AS BIGINT) AS sum_value_e2,
       |  CAST(sum(ts_l) AS BIGINT) AS ts_checksum
       |FROM ($gen)
       |GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q403 — reported partitioning COMPOSED with the partial grouped
  // aggregate pushdown: same key-disjoint per-user layout, but the
  // aggregates (COUNT/SUM/MIN/MAX of event_id) also push into the
  // scan, so each partition folds ONLY its own user's ids and emits
  // exactly ONE pre-aggregated row. Spark's aggregate-pushdown
  // rewrite aliases the group column (`user_id AS group_col_0`),
  // which breaks KeyGroupedPartitioning propagation through the
  // Project — so the finalize still plans a hash exchange, but one
  // carrying `users` ONE-ROW partials (64 rows here; parts×groups
  // without the layout), not generated data. The TRUE zero-exchange
  // grouped read is q402 (non-pushed aggregates keep the attribute
  // identity); this query pins the composed behavior: PushedGroupBy
  // + mode=partial+keygrouped, per-user fold, bounded exchange.
  // ---------------------------------------------------------------------
  private def q403(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.v2.SynthEventsProvider")
      .option("rows", "200000").option("users", "64")
      .option("layout", "mod").option("userparts", "true").load()
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum("event_id").as("sum_id"),
        min("event_id").as("min_id"),
        max("event_id").as("max_id"))
      .orderBy("user_id")

  private val q403Sql = {
    val gen = graft.sources.v2.SynthEvents.duckSql(0, 200000, 64, "mod")
    s"""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(event_id) AS BIGINT) AS sum_id,
       |  CAST(min(event_id) AS BIGINT) AS min_id,
       |  CAST(max(event_id) AS BIGINT) AS max_id
       |FROM ($gen)
       |GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q425 — V2 ATOMIC SINK round-trip (the transactional write half of
  // the connector surface): a numeric projection of lineitem streams
  // through graft.sources.v2.AtomicTsvSinkProvider — task writers
  // stage under _staging/<job>/, the driver commit renames and then
  // atomically publishes a _MANIFEST — and is read back VIA THE
  // MANIFEST, never by directory listing. The oracle aggregates the
  // parquet directly, so the gate proves the commit protocol makes
  // exactly the written rows visible and the TSV serialization is
  // bit-lossless (q55's round-trip contract at the DSv2 boundary;
  // crash-path atomicity is AtomicSinkSpec's job).
  // ---------------------------------------------------------------------
  private def q425(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_v2_sink").toString
    val src = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        round(col("l_quantity") * 100).cast("long").as("qty_e2"),
        round(col("l_extendedprice") * 100).cast("long").as("price_e2"))
    graft.core.PlanStats.markBatchSinkIo()
    src.write.format("graft.sources.v2.AtomicTsvSinkProvider")
      .option("path", tmp).mode("append").save()
    val back = graft.sources.v2.AtomicTsv.read(s, tmp, StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("qty_e2", LongType),
      StructField("price_e2", LongType))))
    back.groupBy((col("l_orderkey") % 7L).as("k"))
      .agg(count(lit(1)).as("n"), sum("qty_e2").as("sum_qty_e2"),
        sum("price_e2").as("sum_price_e2"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"))
      .orderBy("k")
  }

  private val q425Sql =
    """SELECT l_orderkey % 7 AS k, count(*) AS n,
      |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_qty_e2,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |    AS BIGINT) AS sum_price_e2,
      |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk
      |FROM lineitem GROUP BY 1 ORDER BY k""".stripMargin

  // ---------------------------------------------------------------------
  // q347 — guaranteed heavy hitters, two-pass (candidate buckets →
  // exact verify): keys carrying ≥ 0.5% of all rows, found WITHOUT
  // ever shuffling the full key grain. Pass 1 aggregates row counts
  // into 4096 fixed hash buckets — map-side-combinable state of
  // constant width no matter how many distinct keys exist (the whole
  // point at 100 TB, where the key space can be billions and a full
  // groupBy(key) shuffle is the cost you're avoiding). Any key with
  // count ≥ T lives in a bucket with count ≥ T, so pruning buckets
  // below T gives NO false negatives; collisions only admit false
  // candidates, which pass 2 removes by exact count over the
  // candidate-bucket rows alone. Pruning bites whenever
  // buckets > 1/φ (4096 > 200 here) — independent of key count.
  // The threshold compare cross-multiplies to exact integers
  // (c·200 ≥ n_rows). Keys are floor(value) of events — the
  // exponential value distribution makes the heavy set (~70 keys)
  // scale-invariant.
  // ---------------------------------------------------------------------
  private def q347(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val keyed = t(s, dir, "events")
      .select(floor(col("value")).cast("long").as("k"))
      .withColumn("bkt", pmod(h.hash60(concat(lit("hh:"), col("k"))),
        lit(4096L)))
      .pin() // pass-1 bucket counts + pass-2 candidate rows share it
    val buckets = keyed.groupBy("bkt").agg(count(lit(1)).as("bc"))
    val nRows = buckets.agg(sum("bc").as("n_rows"))
    val candidates = buckets.crossJoin(broadcast(nRows))
      .filter(col("bc") * 200L >= col("n_rows"))
      .select(col("bkt").as("cand_bkt"), col("n_rows"))
    keyed.join(broadcast(candidates), col("bkt") === col("cand_bkt"))
      .groupBy(col("k"), col("n_rows"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 200L >= col("n_rows"))
      .select(col("k"), col("cnt"),
        round(col("cnt").cast("double") / col("n_rows").cast("double")
          * 1000000.0).cast("long").as("share_e6"))
      .orderBy(col("cnt").desc, col("k"))
  }

  private val q347Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "'hh:' || CAST(k AS VARCHAR)")
    s"""WITH keyed AS (
       |  SELECT CAST(floor(value) AS BIGINT) AS k,
       |    $h % 4096 AS bkt
       |  FROM events),
       |buckets AS (SELECT bkt, CAST(count(*) AS BIGINT) AS bc
       |            FROM keyed GROUP BY 1),
       |n AS (SELECT CAST(sum(bc) AS BIGINT) AS n_rows FROM buckets),
       |cand AS (SELECT bkt, n_rows FROM buckets, n
       |         WHERE bc * 200 >= n_rows)
       |SELECT k, CAST(count(*) AS BIGINT) AS cnt,
       |  CAST(round(CAST(count(*) AS DOUBLE) / CAST(max(n_rows) AS DOUBLE)
       |    * 1000000.0) AS BIGINT) AS share_e6
       |FROM keyed JOIN cand USING (bkt)
       |GROUP BY k
       |HAVING count(*) * 200 >= max(n_rows)
       |ORDER BY cnt DESC, k""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q351 — speculative-decoding acceptance replay (serving
  // economics, the q339 prefix-cache twin): a draft model proposes
  // blocks of K=4 tokens; the verifier accepts the prefix up to the
  // first per-token disagreement and emits one bonus token — so each
  // verify step yields accepted+1 tokens, and the speedup over
  // plain autoregression is Σ(accepted+1)/n_blocks. Agreement bits
  // are deterministic per (doc, pos, token) via the portable hash at
  // 70%; everything after tokenization is integer window/group
  // arithmetic on the token grain — one explode, one block-grain
  // aggregate, one source-grain rollup, no per-pair work.
  // ---------------------------------------------------------------------
  private def q351(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        posexplode(graft.functions.Text.words(col("text"))))
      .select(col("doc_id"), col("source"),
        col("pos").cast("long").as("pos"), col("col").as("word"))
      .withColumn("blk", floor(col("pos") / 4).cast("long"))
      .withColumn("pib", pmod(col("pos"), lit(4L)))
      .withColumn("agree",
        (pmod(h.hash60(concat(lit("spec:"), col("doc_id"), lit(":"),
          col("pos"), lit(":"), col("word"))), lit(100L)) < 70L)
          .cast("long"))
    val blocks = toks.groupBy(col("doc_id"), col("source"), col("blk"))
      .agg(count(lit(1)).as("bsz"),
        min(when(col("agree") === 0, col("pib"))).as("first_rej"))
      .select(col("source"),
        (coalesce(col("first_rej"), col("bsz")) + 1L).as("emitted"))
    blocks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_blocks"), sum("emitted").as("toks_emitted"))
      .select(col("source"), col("n_blocks"), col("toks_emitted"),
        round(col("toks_emitted").cast("double") /
          col("n_blocks").cast("double") * 1000000.0).cast("long")
          .as("speedup_e6"))
      .orderBy(col("source"))
  }

  private val q351Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "'spec:' || CAST(doc_id AS VARCHAR) || ':' || " +
        "CAST(pos AS VARCHAR) || ':' || word")
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    unnest(range(len(list_filter(string_split(text, ' '),
       |      w -> length(w) > 0)))) AS pos,
       |    unnest(list_filter(string_split(text, ' '),
       |      w -> length(w) > 0)) AS word
       |  FROM documents),
       |t2 AS (
       |  SELECT doc_id, source, pos // 4 AS blk, pos % 4 AS pib,
       |    CASE WHEN $h % 100 < 70 THEN 1 ELSE 0 END AS agree
       |  FROM toks),
       |blocks AS (
       |  SELECT doc_id, source, blk, CAST(count(*) AS BIGINT) AS bsz,
       |    min(CASE WHEN agree = 0 THEN pib END) AS first_rej
       |  FROM t2 GROUP BY 1, 2, 3),
       |b2 AS (SELECT source, coalesce(first_rej, bsz) + 1 AS emitted
       |       FROM blocks)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_blocks,
       |  CAST(sum(emitted) AS BIGINT) AS toks_emitted,
       |  CAST(round(CAST(sum(emitted) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) * 1000000.0) AS BIGINT)
       |    AS speedup_e6
       |FROM b2 GROUP BY source ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q352 — model-cascade routing frontier (serving economics): route
  // a request to the SMALL model when router confidence ≥ t, else to
  // the large one; sweep t over an 11-row literal grain to get the
  // cost-vs-accuracy frontier a deployment picks its operating point
  // from. Confidence and per-model correctness are deterministic
  // hash bits (small-model accuracy rises with confidence —
  // mod-200 < 80+conf keeps that coupling in pure integers; the
  // large model is a flat 95%); cost is char-proportional with the
  // large model 10×. One scan computes the per-doc bits; the sweep
  // is a broadcast cross join against 11 literal rows, never a
  // re-scan per threshold.
  // ---------------------------------------------------------------------
  private def q352(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .withColumn("conf", pmod(h.hash60(concat(lit("conf:"),
        col("doc_id"))), lit(101L)))
      .withColumn("ok_small", (pmod(h.hash60(concat(lit("sm:"),
        col("doc_id"))), lit(200L)) < col("conf") + 80L).cast("long"))
      .withColumn("ok_large", (pmod(h.hash60(concat(lit("lg:"),
        col("doc_id"))), lit(100L)) < 95L).cast("long"))
    val grid = s.range(0L, 101L, 10L).select(col("id").as("t"))
    docs.crossJoin(broadcast(grid))
      .select(col("t"),
        when(col("conf") >= col("t"), 1L).otherwise(0L).as("sm"),
        when(col("conf") >= col("t"), col("ok_small"))
          .otherwise(col("ok_large")).as("ok"),
        when(col("conf") >= col("t"), col("n_chars"))
          .otherwise(col("n_chars") * 10L).as("cost"),
        (col("n_chars") * 10L).as("full_cost"))
      .groupBy(col("t"))
      .agg(sum("sm").as("n_small"), count(lit(1)).as("n_docs"),
        sum("ok").as("n_ok"), sum("cost").as("cost"),
        sum("full_cost").as("full_cost"))
      .select(col("t"), col("n_small"),
        round(col("n_ok").cast("double") / col("n_docs").cast("double")
          * 1000000.0).cast("long").as("acc_e6"),
        round(col("cost").cast("double") / col("full_cost").cast("double")
          * 1000000.0).cast("long").as("cost_rel_e6"))
      .orderBy(col("t"))
  }

  private val q352Sql = {
    val hc = graft.functions.PortableHash.hash60DuckSql(
      "'conf:' || CAST(doc_id AS VARCHAR)")
    val hs = graft.functions.PortableHash.hash60DuckSql(
      "'sm:' || CAST(doc_id AS VARCHAR)")
    val hl = graft.functions.PortableHash.hash60DuckSql(
      "'lg:' || CAST(doc_id AS VARCHAR)")
    s"""WITH docs AS (
       |  SELECT doc_id, n_chars,
       |    $hc % 101 AS conf,
       |    CASE WHEN $hs % 200 < ($hc % 101) + 80 THEN 1 ELSE 0 END
       |      AS ok_small,
       |    CASE WHEN $hl % 100 < 95 THEN 1 ELSE 0 END AS ok_large
       |  FROM documents),
       |grid AS (SELECT unnest(range(0, 101, 10)) AS t),
       |routed AS (
       |  SELECT t,
       |    CASE WHEN conf >= t THEN 1 ELSE 0 END AS sm,
       |    CASE WHEN conf >= t THEN ok_small ELSE ok_large END AS ok,
       |    CASE WHEN conf >= t THEN n_chars ELSE n_chars * 10 END AS cost,
       |    n_chars * 10 AS full_cost
       |  FROM docs, grid)
       |SELECT t, CAST(sum(sm) AS BIGINT) AS n_small,
       |  CAST(round(CAST(sum(ok) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    * 1000000.0) AS BIGINT) AS acc_e6,
       |  CAST(round(CAST(sum(cost) AS DOUBLE)
       |    / CAST(sum(full_cost) AS DOUBLE) * 1000000.0) AS BIGINT)
       |    AS cost_rel_e6
       |FROM routed GROUP BY t ORDER BY t""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q356 — the connector's RUNTIME filtering in the gate (the DSv2
  // analogue of dynamic partition pruning): joining the synthetic
  // source to a FILTERED broadcast dim hands the scan an
  // IN(event_id, …) predicate at execution time via
  // SupportsRuntimeV2Filtering — the scan narrows its generated
  // range to the set's hull and plans exact-id partitions, so
  // non-matching rows are never generated at all (the plan shows the
  // scan's RuntimeFilters; asserted in PlanQualitySpec). The oracle
  // is the same join over DuckDB's regeneration of the id range —
  // honest arithmetic on both sides.
  // ---------------------------------------------------------------------
  private def q356(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "part")
      .filter(col("p_size") === 1)
      .select(col("p_partkey"))
    s.read.format("graft.sources.v2.SynthEventsProvider")
      .option("rows", "100000").load()
      .join(broadcast(dim), col("event_id") === col("p_partkey"))
      .agg(count(lit(1)).as("n_rows"), sum("value_e2").as("sum_value_e2"),
        min("event_id").as("min_id"), max("event_id").as("max_id"))
  }

  private val q356Sql = {
    val gen = graft.sources.v2.SynthEvents.duckSql(0, 100000, 1500)
    s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(value_e2) AS BIGINT) AS sum_value_e2,
       |  CAST(min(event_id) AS BIGINT) AS min_id,
       |  CAST(max(event_id) AS BIGINT) AS max_id
       |FROM ($gen) ev
       |JOIN part ON ev.event_id = p_partkey
       |WHERE p_size = 1""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q357 — feature-hashing (hashing-trick) collision audit: before
  // training on hashed features, measure what the 2^12-bucket hash
  // space actually does to the live feature vocabulary — distinct
  // features, buckets used, the heaviest bucket, and the share of
  // features that collide (share a bucket with another feature).
  // Features are (lang, word-bigram) pairs from the documents table;
  // the audit is two aggregates over the distinct-feature grain
  // (feature → bucket, bucket → load) and one 1-row rollup — the
  // vocabulary never round-trips through the driver, and at 100 TB
  // the distinct-feature grain is the only thing shuffled, not the
  // corpus.
  // ---------------------------------------------------------------------
  private def q357(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val feats = t(s, dir, "documents")
      .select(col("lang"),
        explode(graft.functions.Text.shinglesFromTokens(
          graft.functions.Text.words(col("text")), 2)).as("gram"))
      .select(concat(col("lang"), lit("|"), col("gram")).as("feat"))
      .distinct()
      .withColumn("bkt", pmod(h.hash60(concat(lit("fh:"), col("feat"))),
        lit(4096L)))
    val buckets = feats.groupBy("bkt").agg(count(lit(1)).as("load"))
    buckets.agg(sum("load").as("n_features"),
        count(lit(1)).as("buckets_used"), max("load").as("max_load"),
        sum(when(col("load") >= 2, col("load")).otherwise(0L))
          .as("collided"))
      .select(col("n_features"), col("buckets_used"), col("max_load"),
        col("collided"),
        round(col("collided").cast("double") /
          col("n_features").cast("double") * 1000000.0).cast("long")
          .as("collision_rate_e6"))
  }

  private val q357Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql("'fh:' || feat")
    s"""WITH wl AS (
       |  SELECT lang,
       |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
       |  FROM documents),
       |feats AS (
       |  SELECT DISTINCT lang || '|' || gram AS feat
       |  FROM (
       |    SELECT lang,
       |      unnest(list_transform(range(len(ws) - 1),
       |        i -> ws[i + 1] || ' ' || ws[i + 2])) AS gram
       |    FROM wl WHERE len(ws) >= 2)),
       |buckets AS (
       |  SELECT $h % 4096 AS bkt, CAST(count(*) AS BIGINT) AS bload
       |  FROM feats GROUP BY 1)
       |SELECT CAST(sum(bload) AS BIGINT) AS n_features,
       |  CAST(count(*) AS BIGINT) AS buckets_used,
       |  CAST(max(bload) AS BIGINT) AS max_load,
       |  CAST(sum(CASE WHEN bload >= 2 THEN bload ELSE 0 END) AS BIGINT)
       |    AS collided,
       |  CAST(round(CAST(sum(CASE WHEN bload >= 2 THEN bload ELSE 0 END)
       |      AS DOUBLE) / CAST(sum(bload) AS DOUBLE) * 1000000.0)
       |    AS BIGINT) AS collision_rate_e6
       |FROM buckets""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q326 — sequence-packing efficiency audit (the pad-vs-concat
  // question every pretraining pipeline answers before burning
  // compute): for L=512-token sequences, compare (a) one padded
  // sequence per document with truncation, (b) per-document
  // multi-sequence padding, (c) stream concatenation (no padding
  // waste, but documents bleed across attention boundaries — the
  // tradeoff the numbers quantify). Token counts are the exact
  // whitespace tokenization; every strategy reduces to ONE global
  // aggregate of per-row integer expressions — packing math, not
  // packing simulation.
  // ---------------------------------------------------------------------
  private def q326(s: SparkSession, dir: String): DataFrame = {
    val L = 512L
    val base = t(s, dir, "documents")
      .select(graft.functions.Text.tokenCount(col("text")).as("n"))
      .agg(count(lit(1)).as("n_docs"), sum("n").as("tok"),
        sum(least(col("n"), lit(L))).as("kept1"),
        sum(greatest(col("n") - L, lit(0L))).as("trunc1"),
        sum(expr(s"(n + ${L - 1}) div $L")).as("seqs_multi"))
      .pin() // three strategy rows read one scalar row
    def strat(name: String, seqs: Column, waste: Column,
              trunc: Column): DataFrame =
      base.select(lit(name).as("strategy"), seqs.as("n_seqs"),
        col("tok").as("n_tokens"), waste.as("waste_tokens"),
        trunc.as("trunc_tokens"))
        .withColumn("waste_share_e6",
          round(col("waste_tokens").cast("double") /
            (col("n_seqs") * L).cast("double") * 1000000.0)
            .cast("long"))
    strat("concat_stream", expr(s"(tok + ${L - 1}) div $L"),
        expr(s"(tok + ${L - 1}) div $L") * L - col("tok"), lit(0L))
      .unionByName(strat("pad_multi", col("seqs_multi"),
        col("seqs_multi") * L - col("tok"), lit(0L)))
      .unionByName(strat("pad_per_doc", col("n_docs"),
        col("n_docs") * L - col("kept1"), col("trunc1")))
      .orderBy("strategy")
  }

  private val q326Sql = {
    val L = 512L
    val n = "CAST(len(list_filter(string_split(text, ' '), " +
      "t -> len(t) > 0)) AS BIGINT)"
    s"""WITH base AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n) AS BIGINT) AS tok,
       |    CAST(sum(least(n, $L)) AS BIGINT) AS kept1,
       |    CAST(sum(greatest(n - $L, 0)) AS BIGINT) AS trunc1,
       |    CAST(sum((n + ${L - 1}) // $L) AS BIGINT) AS seqs_multi
       |  FROM (SELECT $n AS n FROM documents)),
       |rows_out AS (
       |  SELECT 'concat_stream' AS strategy,
       |    (tok + ${L - 1}) // $L AS n_seqs, tok AS n_tokens,
       |    (tok + ${L - 1}) // $L * $L - tok AS waste_tokens,
       |    CAST(0 AS BIGINT) AS trunc_tokens
       |  FROM base
       |  UNION ALL
       |  SELECT 'pad_multi', seqs_multi, tok,
       |    seqs_multi * $L - tok, CAST(0 AS BIGINT) FROM base
       |  UNION ALL
       |  SELECT 'pad_per_doc', n_docs, tok,
       |    n_docs * $L - kept1, trunc1 FROM base)
       |SELECT strategy, n_seqs, n_tokens, waste_tokens, trunc_tokens,
       |  CAST(round(CAST(waste_tokens AS DOUBLE)
       |    / CAST(n_seqs * $L AS DOUBLE) * 1000000.0) AS BIGINT)
       |    AS waste_share_e6
       |FROM rows_out ORDER BY strategy""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q327 — best-of-n candidate selection (the rejection-sampling
  // shape: n generations per prompt, keep the best by a scored
  // judge): documents hash into ~500 prompt groups; per group the
  // winner is the highest e6-rounded quality score (lowest doc id on
  // ties — argmax via aggregate join-back, the q322 pattern, never a
  // per-group sort window). Reports the selection lift (best vs
  // group mean) a best-of-n pipeline buys.
  // ---------------------------------------------------------------------
  private def q327(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash
    val scored = t(s, dir, "documents")
      .select(pmod(h.hash60(concat(lit("bon:"), col("doc_id"))),
        lit(500L)).as("prompt_id"), col("doc_id"),
        round(graft.functions.Text.qualityScore(col("text")) * 1000000.0)
          .cast("long").as("q_e6"))
      .pin() // group stats + winner join-back share it
    val grp = scored.groupBy("prompt_id")
      .agg(count(lit(1)).as("n_cands"), max("q_e6").as("best_q_e6"),
        sum("q_e6").as("sum_q_e6"))
    scored.join(grp.withColumnRenamed("prompt_id", "pid"),
        col("prompt_id") === col("pid") &&
          col("q_e6") === col("best_q_e6"))
      .groupBy(col("prompt_id"))
      .agg(max("n_cands").as("n_cands"), min("doc_id").as("best_doc"),
        max("best_q_e6").as("best_q_e6"),
        max("sum_q_e6").as("sum_q_e6"))
      .select(col("prompt_id"), col("n_cands"), col("best_doc"),
        col("best_q_e6"),
        round(col("sum_q_e6").cast("double") /
          col("n_cands").cast("double")).cast("long").as("mean_q_e6"))
      .orderBy("prompt_id")
  }

  private val q327Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "'bon:' || doc_id")
    val w = "list_filter(string_split(text, ' '), t -> length(t) > 0)"
    val nTok = s"CAST(len($w) AS BIGINT)"
    val stops = graft.functions.Text.EnglishStopwords
      .map(x => s"'$x'").mkString(", ")
    val nStop = s"CAST(len(list_filter($w, t -> t IN ($stops))) AS BIGINT)"
    val sumLen =
      s"CAST(list_sum(list_transform($w, t -> length(t))) AS BIGINT)"
    val q = s"0.4 * least(1.0, $nTok / 100.0)" +
      s" + 0.3 * (1.0 - coalesce($nStop / nullif($nTok, 0), 1.0))" +
      s" + 0.3 * least(1.0, coalesce($sumLen / nullif($nTok, 0), 0.0)" +
      " / 8.0)"
    s"""WITH scored AS (
       |  SELECT $h % 500 AS prompt_id, doc_id,
       |    CAST(round(($q) * 1000000.0) AS BIGINT) AS q_e6
       |  FROM documents),
       |grp AS (
       |  SELECT prompt_id, CAST(count(*) AS BIGINT) AS n_cands,
       |    CAST(max(q_e6) AS BIGINT) AS best_q_e6,
       |    CAST(sum(q_e6) AS BIGINT) AS sum_q_e6
       |  FROM scored GROUP BY 1)
       |SELECT prompt_id, max(n_cands) AS n_cands,
       |  CAST(min(doc_id) AS BIGINT) AS best_doc,
       |  max(grp.best_q_e6) AS best_q_e6,
       |  CAST(round(CAST(max(sum_q_e6) AS DOUBLE)
       |    / CAST(max(n_cands) AS DOUBLE)) AS BIGINT) AS mean_q_e6
       |FROM scored JOIN grp USING (prompt_id)
       |WHERE q_e6 = grp.best_q_e6
       |GROUP BY prompt_id ORDER BY prompt_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q333 — backfill planner: which published day-partitions did late
  // data invalidate? The snapshot boundary is deterministic —
  // everything with event_id ≤ K (K = floor(0.9·max id)) was
  // "processed"; later-ingested rows whose event time falls on an
  // already-published day invalidate that partition and size its
  // backfill. One scan: the K scalar is a broadcast 1-row aggregate,
  // then a single combine-enabled conditional aggregate to day
  // grain. This is the planning half of the incremental tier — the
  // M1 merge executes what this query schedules.
  // ---------------------------------------------------------------------
  private def q333(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val k = ev.agg(floor(max(col("event_id")) * 0.9).cast("long").as("k"))
    ev.crossJoin(broadcast(k))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_id") <= col("k"), 1L).otherwise(0L))
          .cast("long").as("n_published"),
        sum(when(col("event_id") > col("k"), 1L).otherwise(0L))
          .cast("long").as("n_late"))
      .select(col("day"), col("n_published"), col("n_late"),
        when(col("n_published") > 0 && col("n_late") > 0, 1L)
          .otherwise(0L).as("invalidated"),
        round(col("n_late").cast("double") * 1000000.0 /
          (col("n_published") + col("n_late")).cast("double"))
          .cast("long").as("late_share_e6"))
      .orderBy(col("day"))
  }

  private val q333Sql =
    """WITH k AS (
      |  SELECT CAST(floor(0.9 * max(event_id)) AS BIGINT) AS k
      |  FROM events),
      |per AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CASE WHEN event_id <= k THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_published,
      |    CAST(sum(CASE WHEN event_id > k THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_late
      |  FROM events CROSS JOIN k
      |  GROUP BY 1)
      |SELECT day, n_published, n_late,
      |  CAST(CASE WHEN n_published > 0 AND n_late > 0 THEN 1 ELSE 0 END
      |    AS BIGINT) AS invalidated,
      |  CAST(round(n_late * 1000000.0 / (n_published + n_late)) AS BIGINT)
      |    AS late_share_e6
      |FROM per
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // q339 — prefix-cache savings estimator (the KV-cache prefix-
  // sharing audit an LLM serving layer runs over its corpus): for
  // prefix lengths L ∈ {4, 8, 16} tokens, how many documents share
  // an exact L-token prefix, and how many cached tokens that
  // sharing saves — per prefix group of c docs the cache serves
  // c−1 of them for free, so saved = (n_docs − n_groups)·L. One
  // combine-enabled aggregate per L on the prefix string (the
  // near-dup corpus makes this non-trivial: copies share their full
  // prefix). 3-row readout.
  // ---------------------------------------------------------------------
  private def q339(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Text
    def one(l: Int): DataFrame =
      t(s, dir, "documents")
        .select(Text.words(col("text")).as("w"))
        .filter(size(col("w")) >= l)
        .select(concat_ws(" ", slice(col("w"), 1, l)).as("prefix"))
        .groupBy(col("prefix")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).cast("long").as("n_docs"),
          count(lit(1)).as("n_groups"))
        .select(lit(l.toLong).as("prefix_len"), col("n_docs"),
          col("n_groups"),
          ((col("n_docs") - col("n_groups")) * l).as("saved_tokens"),
          round((col("n_docs") - col("n_groups")).cast("double") *
            1000000.0 / col("n_docs").cast("double")).cast("long")
            .as("share_e6"))
    one(4).unionByName(one(8)).unionByName(one(16))
      .orderBy(col("prefix_len"))
  }

  private val q339Sql = {
    def one(l: Int) =
      s"""SELECT CAST($l AS BIGINT) AS prefix_len,
         |  CAST(sum(c) AS BIGINT) AS n_docs,
         |  count(*) AS n_groups,
         |  CAST((sum(c) - count(*)) * $l AS BIGINT) AS saved_tokens,
         |  CAST(round((sum(c) - count(*)) * 1000000.0 / sum(c)) AS BIGINT)
         |    AS share_e6
         |FROM (
         |  SELECT array_to_string(w[1:$l], ' ') AS prefix, count(*) AS c
         |  FROM (
         |    SELECT list_filter(string_split(text, ' '),
         |      x -> length(x) > 0) AS w
         |    FROM documents) d
         |  WHERE len(w) >= $l
         |  GROUP BY 1) g""".stripMargin
    s"""${one(4)}
       |UNION ALL
       |${one(8)}
       |UNION ALL
       |${one(16)}
       |ORDER BY prefix_len""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q340 — ANN bucket-balance audit: the probe-cost skew check for
  // the sign-LSH index the q26/q49 candidate generators rely on —
  // bucket the corpus exactly as the index does, then histogram the
  // bucket SIZES by power-of-two band (floor(log2 c) computed via
  // binary-representation length, never runtime log2). A balanced
  // index concentrates mass in a narrow band; a heavy band at the
  // top means probe cost is dominated by a few fat buckets and the
  // index needs more planes. Two combine-enabled aggregates; the
  // readout is ≤ log2(corpus) rows.
  // ---------------------------------------------------------------------
  private def q340(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vectors
    val buckets = t(s, dir, "embeddings")
      .select(Vectors.signBucket(col("embedding")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .pin() // feeds the histogram AND the 1-row total
    val tot = buckets.agg(sum(col("c")).cast("long").as("n_total"))
    buckets
      .select((length(bin(col("c"))) - 1).cast("long").as("size_band"),
        col("c"))
      .groupBy(col("size_band"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("c")).cast("long")
        .as("n_vecs"))
      .crossJoin(broadcast(tot))
      .select(col("size_band"), col("n_buckets"), col("n_vecs"),
        round(col("n_vecs").cast("double") * 1000000.0 /
          col("n_total").cast("double")).cast("long").as("vec_share_e6"))
      .orderBy(col("size_band"))
  }

  private val q340Sql = {
    val bucket = graft.functions.Vectors.signBucketSql("embedding")
    s"""WITH b AS (
       |  SELECT $bucket AS bucket FROM embeddings),
       |sized AS (
       |  SELECT bucket, count(*) AS c FROM b GROUP BY bucket),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM sized),
       |banded AS (
       |  SELECT CAST(length(printf('%b', c)) - 1 AS BIGINT) AS size_band,
       |    c
       |  FROM sized)
       |SELECT size_band, count(*) AS n_buckets,
       |  CAST(sum(c) AS BIGINT) AS n_vecs,
       |  CAST(round(sum(c) * 1000000.0 / n_total) AS BIGINT)
       |    AS vec_share_e6
       |FROM banded CROSS JOIN tot
       |GROUP BY size_band, n_total
       |ORDER BY size_band""".stripMargin
  }

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
    "q307_cusum_changepoint" -> (q307 _),
    "q308_xcorr_lag" -> (q308 _),
    "q309_diameter_probe" -> (q309 _),
    "q310_partition_advisor" -> (q310 _),
    "q311_retention_audit" -> (q311 _),
    "q312_watermark_advisor" -> (q312 _),
    "q313_wav_silence" -> (q313 _),
    "q314_t_closeness" -> (q314 _),
    "q315_join_card_estimate" -> (q315 _),
    "q333_backfill_planner" -> (q333 _),
    "q339_prefix_cache" -> (q339 _),
    "q340_bucket_balance" -> (q340 _),
    "q324_dsv2_source" -> (q324 _),
    "q325_dsv2_stream" -> (q325 _),
    "q326_packing_efficiency" -> (q326 _),
    "q327_best_of_n" -> (q327 _),
    "q343_dsv2_agg_pushdown" -> (q343 _),
    "q347_heavy_hitters" -> (q347 _),
    "q351_spec_decode_accept" -> (q351 _),
    "q352_cascade_frontier" -> (q352 _),
    "q356_dsv2_runtime_filter" -> (q356 _),
    "q357_feature_hashing" -> (q357 _),
    "q358_dsv2_partial_agg" -> (q358 _),
    "q376_dsv2_multikey_sum" -> (q376 _),
    "q401_dsv2_topn" -> (q401 _),
    "q466_dsv2_offset" -> (q466 _),
    "q402_dsv2_keygrouped" -> (q402 _),
    "q403_dsv2_keygrouped_pushed" -> (q403 _),
    "q425_v2_sink_roundtrip" -> (q425 _))

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
    "q307_cusum_changepoint" -> q307Sql,
    "q308_xcorr_lag" -> q308Sql,
    "q309_diameter_probe" -> q309Sql,
    "q310_partition_advisor" -> q310Sql,
    "q311_retention_audit" -> q311Sql,
    "q312_watermark_advisor" -> q312Sql,
    "q313_wav_silence" -> q313Sql,
    "q314_t_closeness" -> q314Sql,
    "q315_join_card_estimate" -> q315Sql,
    "q333_backfill_planner" -> q333Sql,
    "q339_prefix_cache" -> q339Sql,
    "q340_bucket_balance" -> q340Sql,
    "q324_dsv2_source" -> q324Sql,
    "q325_dsv2_stream" -> q325Sql,
    "q326_packing_efficiency" -> q326Sql,
    "q327_best_of_n" -> q327Sql,
    "q343_dsv2_agg_pushdown" -> q343Sql,
    "q347_heavy_hitters" -> q347Sql,
    "q351_spec_decode_accept" -> q351Sql,
    "q352_cascade_frontier" -> q352Sql,
    "q356_dsv2_runtime_filter" -> q356Sql,
    "q357_feature_hashing" -> q357Sql,
    "q358_dsv2_partial_agg" -> q358Sql,
    "q376_dsv2_multikey_sum" -> q376Sql,
    "q401_dsv2_topn" -> q401Sql,
    "q466_dsv2_offset" -> q466Sql,
    "q402_dsv2_keygrouped" -> q402Sql,
    "q403_dsv2_keygrouped_pushed" -> q403Sql,
    "q425_v2_sink_roundtrip" -> q425Sql)
}
