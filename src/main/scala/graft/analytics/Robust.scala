package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.JaroWinklerE6

import graft.core.Tables
import graft.core.PlanStats.Pinned

/** Robust-statistics + record-linkage tier (session 7): the
  * distribution-free estimators an analytics platform runs when the
  * data is dirty — fuzzy entity resolution (Jaro–Winkler over blocked
  * candidates), Theil–Sen median-slope trends (one outlier day cannot
  * move the estimate), Mann–Whitney rank tests (A/B comparison with no
  * normality assumption), and χ² independence audits. All outputs are
  * integer-exact or single-IEEE-expression e6 longs, like the rest of
  * the gate.
  */
object Robust {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------
  // q258 — Jaro–Winkler blocked record linkage: a deterministic "dirty"
  // variant of every customer name (digit→letter OCR confusion, one
  // dropped char, or one substituted char, by key mod 3) is linked back
  // against the clean register. Candidate pairs are BLOCKED on
  // c_custkey % B — and B is ADAPTIVE, not fixed: a fixed modulus is a
  // fixed-cardinality blocking key whose blocks grow linearly with the
  // register and whose pair count grows quadratically (the r7 sf1
  // bench measured ×50 on ×10 data). B = greatest(500, ceil(n/40)) —
  // computed from a 1-row count that broadcasts onto both sides, never
  // a collect — keeps blocks at ~40 records at ANY register size, so
  // candidates per dirty record are data-invariant and total pair work
  // is LINEAR in n; the true match (dk = k) always shares dk % B, so
  // no genuine link is ever blocked away. A bipartite pair-budget
  // guard (Σ n_clean·n_dirty per block, one block-grain aggregate)
  // raise_errors past 64 candidate pairs PER RECORD — the scale-
  // invariant bound (healthy adaptive blocking yields ~40/record at
  // any n, so a breach means the modulus logic broke; an absolute
  // bound would spuriously trip on legitimate linear growth — the
  // round-8 sf1 lesson) — instead of melting down. At gate
  // scales (n ≤ 20 000) B stays 500 — bit-identical to the fixed-
  // modulus formulation — and the oracle replays B from the same
  // count, so the gate is exact at any scale. Each dirty record keeps
  // its argmax-scored clean candidate (ties to the smallest key);
  // scoring runs through the codegen'd
  // [[org.apache.spark.sql.graftx.JaroWinklerE6]] expression (Spark
  // has no jaro_winkler; a Scala UDF here would box two strings per
  // candidate pair). DuckDB's jaro_winkler_similarity matches the
  // expression bit-for-bit at e6 on this pair set (verified
  // exhaustively — the blocked join is replayed in the oracle).
  // ---------------------------------------------------------------------
  private def q258(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_name").as("nm"))
    // adaptive modulus as a 1-row broadcast scalar: blocks stay ~40
    // records however big the register grows
    val mod = c.agg(greatest(lit(500L),
      ((count(lit(1)) + 39L) / 40L).cast("long")).as("__b"))
    val dirty = c.select(col("k").as("dk"),
      when(col("k") % 3 === 0, regexp_replace(col("nm"), "0", "O"))
        .when(col("k") % 3 === 1,
          concat(substring(col("nm"), 1, 5), expr("substring(nm, 7)")))
        .otherwise(concat(substring(col("nm"), 1, 9), lit("X"),
          expr("substring(nm, 11)"))).as("dn"))
    val cb = c.crossJoin(broadcast(mod))
      .withColumn("blk", col("k") % col("__b")).drop("__b")
    val db = dirty.crossJoin(broadcast(mod))
      .withColumn("blk", col("dk") % col("__b")).drop("__b")
    // bipartite budget: Σ over blocks of n_clean·n_dirty — both sides
    // have one row per key here, so clean and dirty block sizes match
    val guard = graft.operators.Dedup.pairBudgetGuard(
      cb.groupBy("blk").agg(count(lit(1)).as("__n")),
      (col("__n").cast("decimal(38,0)") * col("__n"))
        .cast("decimal(38,0)"),
      col("__n"), 64L, "q258 JW linkage")
    val scored = cb
      .join(db, "blk")
      .crossJoin(broadcast(guard)).drop("__pb_ok")
      .withColumn("jw_e6", JaroWinklerE6.col(col("nm"), col("dn")))
    // argmax as a HASH AGGREGATE (max of a lexicographic struct, ties
    // to the smallest key via the negated field), not a row_number
    // window: the window formulation must shuffle + SORT every scored
    // pair; the aggregate combines map-side, so shuffle volume is one
    // row per dirty record regardless of block size — the shape that
    // survives when blocks carry thousands of candidates.
    scored
      .groupBy(col("dk"))
      .agg(max(struct(col("jw_e6"), (-col("k")).as("nk"))).as("best"))
      .select(col("dk"), (-col("best.nk")).as("best_k"),
        col("best.jw_e6").as("best_jw_e6"),
        (col("best.nk") === -col("dk")).as("linked_true"))
      .orderBy(col("dk"))
  }

  private val q258Sql =
    """WITH c AS (SELECT c_custkey AS k, c_name AS nm FROM customer),
      |p AS (SELECT greatest(500, (count(*) + 39) // 40) AS b FROM c),
      |d AS (SELECT k AS dk,
      |  CASE k % 3 WHEN 0 THEN replace(nm, '0', 'O')
      |             WHEN 1 THEN substr(nm, 1, 5) || substr(nm, 7)
      |             ELSE substr(nm, 1, 9) || 'X' || substr(nm, 11) END AS dn
      |  FROM c),
      |scored AS (
      |  SELECT d.dk, c.k, d.dn, c.nm,
      |    CAST(round(1000000 * jaro_winkler_similarity(c.nm, d.dn))
      |      AS BIGINT) AS jw_e6
      |  FROM c JOIN d ON c.k % (SELECT b FROM p) = d.dk % (SELECT b FROM p)),
      |best AS (
      |  SELECT dk, k, jw_e6,
      |    row_number() OVER (PARTITION BY dk
      |                       ORDER BY jw_e6 DESC, k) AS rn
      |  FROM scored)
      |SELECT dk, k AS best_k, jw_e6 AS best_jw_e6,
      |  k = dk AS linked_true
      |FROM best WHERE rn = 1
      |ORDER BY dk""".stripMargin

  // ---------------------------------------------------------------------
  // q259 — Theil–Sen median-slope trend per order priority: over the
  // final ~7 months of daily revenue series, the slope estimate is the
  // MEDIAN of all pairwise slopes (y_j - y_i)/(x_j - x_i) — a 29%
  // outlier breakdown point vs 0% for least squares. Pair volume is
  // bounded by the CALENDAR, not the data: days² per group (~210² / 2
  // here) regardless of SF, so the self-join is scale-free; the daily
  // pre-aggregate is the only fact-table scan. Daily revenue is an
  // exact e2 long; each pairwise slope is ONE IEEE division rounded to
  // e6 (identical across engines); the median is the exact
  // order-statistic at ceil(n/2) with a deterministic (slope, i, j)
  // tiebreak — no interpolation, no float sums.
  // ---------------------------------------------------------------------
  private def q259(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01"))
      .groupBy(col("o_orderpriority").as("prio"),
        datediff(col("o_orderdate"), lit("2001-01-01")).as("x"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y_e2"))
    val a = daily.select(col("prio"), col("x").as("x1"), col("y_e2").as("y1"))
    val b = daily.select(col("prio"), col("x").as("x2"), col("y_e2").as("y2"))
    val pairs = a.join(b, Seq("prio")).filter(col("x1") < col("x2"))
      .select(col("prio"), col("x1"), col("x2"),
        round((col("y2") - col("y1")).cast("double") /
          (col("x2") - col("x1")).cast("double") * 10000.0)
          .cast("long").as("slope_e4"))
    val w = Window.partitionBy("prio")
      .orderBy(col("slope_e4"), col("x1"), col("x2"))
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("prio")))
      .filter(col("rn") === ((col("n") + 1) / 2).cast("int"))
      .select(col("prio"), col("n").as("n_pairs"),
        col("slope_e4").as("median_slope_e4"))
      .orderBy(col("prio"))
  }

  private val q259Sql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS prio,
      |    datediff('day', TIMESTAMP '2001-01-01', o_orderdate) AS x,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS y_e2
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.prio, a.x AS x1, b.x AS x2,
      |    CAST(round(CAST(b.y_e2 - a.y_e2 AS DOUBLE)
      |      / CAST(b.x - a.x AS DOUBLE) * 10000.0) AS BIGINT) AS slope_e4
      |  FROM daily a JOIN daily b ON a.prio = b.prio AND a.x < b.x),
      |ranked AS (
      |  SELECT prio, slope_e4,
      |    row_number() OVER (PARTITION BY prio
      |                       ORDER BY slope_e4, x1, x2) AS rn,
      |    count(*) OVER (PARTITION BY prio) AS n
      |  FROM pairs)
      |SELECT prio, n AS n_pairs, slope_e4 AS median_slope_e4
      |FROM ranked WHERE rn = CAST((n + 1) // 2 AS INTEGER)
      |ORDER BY prio""".stripMargin

  // ---------------------------------------------------------------------
  // q260 — Mann–Whitney U (A/B rank test) of event value, click vs
  // view, per weekday: U_A counts, over all cross pairs, how often a
  // click value beats a view value (ties count half). Computed WITHOUT
  // materializing pairs: group to per-value counts, then one cumulative
  // window over the merged value axis — 2·U_A = Σ_v cntA(v) ·
  // (2·cntB_below(v) + cntB_at(v)), kept doubled so ties stay integer.
  // Map-side partial aggregation does the heavy lifting; the window
  // runs over distinct values only. Values are e4-quantized per row
  // (exact, identical both engines) before comparison.
  // ---------------------------------------------------------------------
  private def q260(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .select(dayofweek(col("ts_s")).cast("long").as("dow"), col("event_type"),
        round(col("value") * 10000).cast("long").as("v_e4"))
    val cnt = e.groupBy("dow", "v_e4")
      .agg(sum((col("event_type") === "click").cast("long")).as("ca"),
        sum((col("event_type") === "view").cast("long")).as("cb"))
    val w = Window.partitionBy("dow").orderBy("v_e4")
      .rowsBetween(Window.unboundedPreceding, -1)
    cnt
      .withColumn("cb_below", coalesce(sum("cb").over(w), lit(0L)))
      .groupBy("dow")
      .agg(sum("ca").as("n_click"), sum("cb").as("n_view"),
        sum(col("ca") * (lit(2) * col("cb_below") + col("cb")))
          .as("u_click_x2"))
      .orderBy("dow")
  }

  private val q260Sql =
    s"""WITH e AS (
       |  SELECT CAST(dayofweek(${Exact.secSql("ts")}) + 1 AS BIGINT) AS dow,
       |    event_type,
       |    CAST(round(value * 10000) AS BIGINT) AS v_e4
       |  FROM events WHERE event_type IN ('click', 'view')),
       |cnt AS (
       |  SELECT dow, v_e4,
       |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cb
       |  FROM e GROUP BY 1, 2),
       |cum AS (
       |  SELECT dow, ca, cb,
       |    COALESCE(CAST(sum(cb) OVER (PARTITION BY dow ORDER BY v_e4
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS BIGINT), 0) AS cb_below
       |  FROM cnt)
       |SELECT dow, CAST(sum(ca) AS BIGINT) AS n_click,
       |  CAST(sum(cb) AS BIGINT) AS n_view,
       |  CAST(sum(ca * (2 * cb_below + cb)) AS BIGINT) AS u_click_x2
       |FROM cum GROUP BY dow ORDER BY dow""".stripMargin

  // ---------------------------------------------------------------------
  // q261 — χ² independence audit of event_type × weekday: the
  // contingency-table drift check a pipeline runs to detect when a
  // dimension stops being independent of time (bot traffic, broken
  // instrumentation). O·N and R·C are exact longs; each cell's
  // (O·N − R·C)² / (R·C·N) is evaluated in DOUBLE with an identical
  // operation order on both engines (the squared term can exceed 2^63,
  // and double conversion of an exact long is deterministic IEEE), then
  // e6-rounded per cell and summed exactly. One fact scan builds the
  // cells; margins ride as two tiny broadcast joins.
  // ---------------------------------------------------------------------
  private def q261(s: SparkSession, dir: String): DataFrame = {
    // ~35 rows; localCheckpoint pins ONE materialization so the three
    // margin branches (row, column, total) don't each rescan events
    val cells = Tables.eventsSec(s, dir)
      .groupBy(col("event_type").as("et"),
        dayofweek(col("ts_s")).cast("long").as("dow"))
      .agg(count(lit(1)).as("o"))
      .pin()
    val rowm = cells.groupBy("et").agg(sum("o").as("r"))
    val colm = cells.groupBy("dow").agg(sum("o").as("c"))
    val n = cells.agg(sum("o").as("n"))
    val contrib = cells.join(rowm, "et").join(colm, "dow").crossJoin(n)
      .withColumn("d", (col("o") * col("n") - col("r") * col("c"))
        .cast("double"))
      .withColumn("chi_e6",
        round(col("d") * col("d") /
          (col("r").cast("double") * col("c").cast("double") *
            col("n").cast("double")) * 1000000.0).cast("long"))
    contrib.agg(count(lit(1)).as("n_cells"),
        sum("chi_e6").as("chi2_e6"),
        ((countDistinct("et") - 1) * (countDistinct("dow") - 1))
          .as("dof"))
      .select(col("n_cells"), col("chi2_e6"), col("dof"))
  }

  private val q261Sql =
    s"""WITH cells AS (
       |  SELECT event_type AS et,
       |    CAST(dayofweek(${Exact.secSql("ts")}) + 1 AS BIGINT) AS dow,
       |    CAST(count(*) AS BIGINT) AS o
       |  FROM events GROUP BY 1, 2),
       |rowm AS (SELECT et, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
       |colm AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
       |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
       |contrib AS (
       |  SELECT cells.et, cells.dow,
       |    CAST(round(CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE)
       |      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) * CAST(n AS DOUBLE))
       |      * 1000000.0) AS BIGINT) AS chi_e6
       |  FROM cells JOIN rowm ON cells.et = rowm.et
       |  JOIN colm ON cells.dow = colm.dow CROSS JOIN tot)
       |SELECT CAST(count(*) AS BIGINT) AS n_cells,
       |  CAST(sum(chi_e6) AS BIGINT) AS chi2_e6,
       |  CAST((count(DISTINCT et) - 1) * (count(DISTINCT dow) - 1) AS BIGINT)
       |    AS dof
       |FROM contrib""".stripMargin

  // ---------------------------------------------------------------------
  // Shared by q262/q263 — the mobility movement log: events become
  // station visits (a 25-cell station grid keyed off event_id), and a
  // MOVEMENT is a consecutive same-user pair of visits at different
  // stations (one lag window per user, the Trips.deriveTrips shape).
  // The fact table is scanned once per query; everything downstream is
  // station-grain (≤25² flows, ≤25×days station-days) — broadcast-sized
  // regardless of SF.
  // ---------------------------------------------------------------------
  private def movements(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    Tables.eventsSec(s, dir)
      .select(col("user_id"), col("ts_s"), col("event_id"),
        (col("event_id") % 25).as("st"))
      .withColumn("prev_st", lag("st", 1).over(w))
      .filter(col("prev_st").isNotNull && col("prev_st") =!= col("st"))
  }

  private val movementsSql =
    s"""moves AS (
       |  SELECT * FROM (
       |    SELECT user_id, ${Exact.secSql("ts")} AS ts_s, event_id,
       |      event_id % 25 AS st,
       |      lag(event_id % 25) OVER (PARTITION BY user_id
       |        ORDER BY ${Exact.secSql("ts")}, event_id) AS prev_st
       |    FROM events)
       |  WHERE prev_st IS NOT NULL AND prev_st <> st)""".stripMargin

  // ---------------------------------------------------------------------
  // q262 — origin–destination matrix: movement counts per station pair
  // with exact e6 flow shares, top 30 corridors. The OD rollup a bike-
  // share operator reads daily (the reference's trips feed exactly this
  // dashboard). One fact scan → per-user lag → station-pair aggregate;
  // the global total rides as a one-row broadcast.
  // ---------------------------------------------------------------------
  private def q262(s: SparkSession, dir: String): DataFrame = {
    val flows = movements(s, dir)
      .groupBy(col("prev_st").as("o"), col("st").as("d"))
      .agg(count(lit(1)).as("n_moves"))
    val total = flows.agg(sum("n_moves").as("tot"))
    flows.crossJoin(total)
      .select(col("o"), col("d"), col("n_moves"),
        round(col("n_moves").cast("double") / col("tot").cast("double")
          * 1000000.0).cast("long").as("share_e6"))
      .orderBy(col("n_moves").desc, col("o"), col("d"))
      .limit(30)
  }

  private val q262Sql =
    s"""WITH $movementsSql,
       |flows AS (
       |  SELECT prev_st AS o, st AS d, CAST(count(*) AS BIGINT) AS n_moves
       |  FROM moves GROUP BY 1, 2),
       |tot AS (SELECT CAST(sum(n_moves) AS BIGINT) AS tot FROM flows)
       |SELECT o, d, n_moves,
       |  CAST(round(CAST(n_moves AS DOUBLE) / CAST(tot AS DOUBLE)
       |    * 1000000.0) AS BIGINT) AS share_e6
       |FROM flows CROSS JOIN tot
       |ORDER BY n_moves DESC, o, d
       |LIMIT 30""".stripMargin

  // ---------------------------------------------------------------------
  // q263 — station rebalancing imbalance: per station per day, arrivals
  // minus departures — the net bikes the operator must truck overnight.
  // Departures and arrivals are two station-day aggregates of the same
  // movement log, stitched with a full outer join (a station can have a
  // day with only arrivals); all counts exact longs.
  // ---------------------------------------------------------------------
  private def q263(s: SparkSession, dir: String): DataFrame = {
    val m = movements(s, dir)
      .withColumn("day", date_trunc("day", col("ts_s")))
    val dep = m.groupBy(col("day"), col("prev_st").as("st"))
      .agg(count(lit(1)).as("n_dep"))
    val arr = m.groupBy(col("day"), col("st"))
      .agg(count(lit(1)).as("n_arr"))
    dep.join(arr, Seq("day", "st"), "full_outer")
      .select(col("day"), col("st"),
        coalesce(col("n_dep"), lit(0L)).as("n_dep"),
        coalesce(col("n_arr"), lit(0L)).as("n_arr"),
        (coalesce(col("n_arr"), lit(0L)) - coalesce(col("n_dep"), lit(0L)))
          .as("net_flow"))
      .orderBy("day", "st")
  }

  private val q263Sql =
    s"""WITH $movementsSql,
       |m AS (SELECT date_trunc('day', ts_s) AS day, prev_st, st FROM moves),
       |dep AS (SELECT day, prev_st AS st, CAST(count(*) AS BIGINT) AS n_dep
       |        FROM m GROUP BY 1, 2),
       |arr AS (SELECT day, st, CAST(count(*) AS BIGINT) AS n_arr
       |        FROM m GROUP BY 1, 2)
       |SELECT COALESCE(dep.day, arr.day) AS day,
       |  COALESCE(dep.st, arr.st) AS st,
       |  COALESCE(n_dep, 0) AS n_dep, COALESCE(n_arr, 0) AS n_arr,
       |  COALESCE(n_arr, 0) - COALESCE(n_dep, 0) AS net_flow
       |FROM dep FULL OUTER JOIN arr
       |  ON dep.day = arr.day AND dep.st = arr.st
       |ORDER BY day, st""".stripMargin

  // ---------------------------------------------------------------------
  // q264 — Kendall τ-b of quantity vs price per supplier cohort: the
  // rank-correlation that handles ties (τ-b's denominator discounts
  // them), computed EXACTLY by pair enumeration over a BOUNDED sample —
  // row_number caps each cohort at 150 rows by a deterministic key, so
  // pair volume is 150²/2 per cohort at ANY scale factor (the 100 TB
  // contract: you never enumerate pairs over an unbounded group; for
  // full-table τ at scale you'd switch to the O(n log n) merge-sort
  // inversion count). Concordant/discordant/tie counts are exact longs;
  // the one sqrt runs over exact integer products on both engines.
  // ---------------------------------------------------------------------
  private def q264(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the testdata, so the
    // sample order carries x and y as trailing tiebreaks: any rows
    // still tied are identical in every projected column, making the
    // 150-row (x, y) multiset deterministic on both engines.
    val wRn = Window.partitionBy("g")
      .orderBy("l_orderkey", "l_linenumber", "x", "y")
    val base = t(s, dir, "lineitem")
      .select((col("l_suppkey") % 20).as("g"),
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity") * 100).cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      .withColumn("rn", row_number().over(wRn))
      .filter(col("rn") <= 150)
      .select("g", "rn", "x", "y")
    val a = base.select(col("g"), col("rn").as("rn1"),
      col("x").as("x1"), col("y").as("y1"))
    val b = base.select(col("g"), col("rn").as("rn2"),
      col("x").as("x2"), col("y").as("y2"))
    val pairs = a.join(b, Seq("g")).filter(col("rn1") < col("rn2"))
    val agg = pairs.groupBy("g").agg(
      count(lit(1)).as("n0"),
      sum(((col("x1") < col("x2") && col("y1") < col("y2")) ||
        (col("x1") > col("x2") && col("y1") > col("y2"))).cast("long"))
        .as("c"),
      sum(((col("x1") < col("x2") && col("y1") > col("y2")) ||
        (col("x1") > col("x2") && col("y1") < col("y2"))).cast("long"))
        .as("d"),
      sum((col("x1") === col("x2")).cast("long")).as("tx"),
      sum((col("y1") === col("y2")).cast("long")).as("ty"))
    agg.select(col("g"), col("n0").as("n_pairs"), col("c"), col("d"),
        round((col("c") - col("d")).cast("double") /
          sqrt(nullif((col("n0") - col("tx")) * (col("n0") - col("ty")),
            lit(0L)).cast("double")) * 1000000.0)
          .cast("long").as("taub_e6"))
      .orderBy("g")
  }

  private val q264Sql =
    """WITH base AS (
      |  SELECT * FROM (
      |    SELECT l_suppkey % 20 AS g,
      |      CAST(round(l_quantity * 100) AS BIGINT) AS x,
      |      CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
      |      row_number() OVER (PARTITION BY l_suppkey % 20
      |        ORDER BY l_orderkey, l_linenumber,
      |          CAST(round(l_quantity * 100) AS BIGINT),
      |          CAST(round(l_extendedprice * 100) AS BIGINT)) AS rn
      |    FROM lineitem)
      |  WHERE rn <= 150),
      |pairs AS (
      |  SELECT a.g, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
      |  FROM base a JOIN base b ON a.g = b.g AND a.rn < b.rn),
      |agg AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN (x1 < x2 AND y1 < y2)
      |      OR (x1 > x2 AND y1 > y2) THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN (x1 < x2 AND y1 > y2)
      |      OR (x1 > x2 AND y1 < y2) THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
      |    CAST(sum(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS BIGINT) AS ty
      |  FROM pairs GROUP BY g)
      |SELECT g, n0 AS n_pairs, c, d,
      |  CAST(round(CAST(c - d AS DOUBLE)
      |    / sqrt(CAST(NULLIF((n0 - tx) * (n0 - ty), 0) AS DOUBLE))
      |    * 1000000.0) AS BIGINT) AS taub_e6
      |FROM agg ORDER BY g""".stripMargin

  // ---------------------------------------------------------------------
  // q265 — stay-point detection: maximal runs of consecutive same-user
  // pings within 150 m (haversine between consecutive positions on the
  // station grid) lasting ≥ 30 minutes with ≥ 2 pings — the dwell
  // extractor that turns a raw mobility ping stream into visits
  // (the inverse of Trips.deriveTrips, which extracts the movement
  // between stays). Gaps-and-islands: one lag window flags run starts,
  // a cumulative sum numbers the runs, one aggregate per run. Centroids
  // are exact e6 integer sums divided integrally — no float
  // accumulation.
  // ---------------------------------------------------------------------
  private def q265(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Geo
    val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val pings = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("ts_s"), col("event_id"),
        (col("event_id") % 25).as("st"))
      .withColumn("lat", lit(47.0) + (col("st") % 5).cast("double") * 0.01)
      .withColumn("lon", lit(8.0) + expr("st div 5").cast("double") * 0.01)
    val flagged = pings
      .withColumn("prev_lat", lag("lat", 1).over(w))
      .withColumn("prev_lon", lag("lon", 1).over(w))
      .withColumn("brk",
        (col("prev_lat").isNull ||
          Geo.haversineKm(col("prev_lat"), col("prev_lon"),
            col("lat"), col("lon")) > 0.15).cast("long"))
      .withColumn("run",
        sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("run"))
      .agg(min("ts_s").as("stay_start"), max("ts_s").as("stay_end"),
        count(lit(1)).as("n_pings"),
        sum(round(col("lat") * 1000000).cast("long")).as("slat_e6"),
        sum(round(col("lon") * 1000000).cast("long")).as("slon_e6"))
      .withColumn("dur_s",
        col("stay_end").cast("long") - col("stay_start").cast("long"))
      .filter(col("n_pings") >= 2 && col("dur_s") >= 1800)
      .select(col("user_id"), col("stay_start"), col("stay_end"),
        col("n_pings"), col("dur_s"),
        expr("slat_e6 div n_pings").as("clat_e6"),
        expr("slon_e6 div n_pings").as("clon_e6"))
      .orderBy("user_id", "stay_start")
  }

  private val q265Sql = {
    val hav = graft.functions.Geo.haversineKmSql(
      "prev_lat", "prev_lon", "lat", "lon")
    s"""WITH pings AS (
       |  SELECT user_id, ${Exact.secSql("ts")} AS ts_s, event_id,
       |    47.0 + CAST((event_id % 25) % 5 AS DOUBLE) * 0.01 AS lat,
       |    8.0 + CAST((event_id % 25) // 5 AS DOUBLE) * 0.01 AS lon
       |  FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_lat IS NULL OR $hav > 0.15
       |    THEN 1 ELSE 0 END AS brk
       |  FROM (
       |    SELECT *,
       |      lag(lat) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)
       |        AS prev_lat,
       |      lag(lon) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)
       |        AS prev_lon
       |    FROM pings)),
       |runs AS (
       |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
       |    ORDER BY ts_s, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS run
       |  FROM flagged),
       |stays AS (
       |  SELECT user_id, run, min(ts_s) AS stay_start, max(ts_s) AS stay_end,
       |    CAST(count(*) AS BIGINT) AS n_pings,
       |    CAST(sum(CAST(round(lat * 1000000) AS BIGINT)) AS BIGINT)
       |      AS slat_e6,
       |    CAST(sum(CAST(round(lon * 1000000) AS BIGINT)) AS BIGINT)
       |      AS slon_e6
       |  FROM runs GROUP BY 1, 2)
       |SELECT user_id, stay_start, stay_end, n_pings,
       |  CAST(epoch(stay_end) - epoch(stay_start) AS BIGINT) AS dur_s,
       |  slat_e6 // n_pings AS clat_e6,
       |  slon_e6 // n_pings AS clon_e6
       |FROM stays
       |WHERE n_pings >= 2 AND epoch(stay_end) - epoch(stay_start) >= 1800
       |ORDER BY user_id, stay_start""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q267 — isotonic calibration curve: the monotone fit a quality-
  // classifier's scores get before their probabilities are trusted
  // (Zadrozny & Elkan's method; the standard alternative to Platt
  // scaling). A synthetic score (40 bins over orders) predicts a
  // deterministic pseudo-label whose rate trends up with the score but
  // carries hash noise; the isotonic fit is computed via the CLOSED
  // FORM fitted(t) = max_{i≤t} min_{j≥t} mean(i..j) — equivalent to
  // PAVA but expressible as two grouped extremes over the interval
  // table, no sequential pooling loop. Everything downstream of the
  // one fact scan is bin-grain: 40 bins → 820 intervals → 40 fitted
  // values; interval means are single e6-rounded divisions of exact
  // long sums, so both engines agree bit-for-bit.
  // ---------------------------------------------------------------------
  private def q267(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash
    val bins = t(s, dir, "orders")
      .select((col("o_orderkey") % 40).as("bin"),
        (PortableHash.hash60(col("o_orderkey").cast("string")) % 100 <
          col("o_orderkey") % 40 + 20).cast("long").as("lbl"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("lbl").as("pos"))
      .pin() // 40 rows; pin so the interval join never rescans
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = bins
      .withColumn("cn", sum("n").over(w))
      .withColumn("cp", sum("pos").over(w))
    val lo = cum.select(col("bin").as("i"),
      (col("cn") - col("n")).as("cn_lo"), (col("cp") - col("pos")).as("cp_lo"))
    val hi = cum.select(col("bin").as("j"), col("cn").as("cn_hi"),
      col("cp").as("cp_hi"))
    val intervals = lo.crossJoin(hi).filter(col("i") <= col("j"))
      .select(col("i"), col("j"),
        round((col("cp_hi") - col("cp_lo")).cast("double") /
          (col("cn_hi") - col("cn_lo")).cast("double") * 1000000.0)
          .cast("long").as("avg_e6"))
    val fitted = bins.select(col("bin").as("t"))
      .join(intervals, col("i") <= col("t") && col("j") >= col("t"))
      .groupBy(col("t"), col("i")).agg(min("avg_e6").as("m"))
      .groupBy(col("t")).agg(max("m").as("fitted_e6"))
    bins.join(fitted, col("bin") === col("t"))
      .select(col("bin"), col("n"), col("pos"),
        round(col("pos").cast("double") / col("n").cast("double")
          * 1000000.0).cast("long").as("raw_rate_e6"),
        col("fitted_e6"))
      .orderBy("bin")
  }

  private val q267Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "CAST(o_orderkey AS VARCHAR)")
    s"""WITH bins AS (
       |  SELECT o_orderkey % 40 AS bin,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN $h % 100 < o_orderkey % 40 + 20
       |      THEN 1 ELSE 0 END) AS BIGINT) AS pos
       |  FROM orders GROUP BY 1),
       |cum AS (
       |  SELECT bin, n, pos,
       |    CAST(sum(n) OVER (ORDER BY bin
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
       |    CAST(sum(pos) OVER (ORDER BY bin
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp
       |  FROM bins),
       |iv AS (
       |  SELECT lo.bin AS i, hi.bin AS j,
       |    CAST(round(CAST(hi.cp - (lo.cp - lo.pos) AS DOUBLE)
       |      / CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE) * 1000000.0)
       |      AS BIGINT) AS avg_e6
       |  FROM cum lo JOIN cum hi ON lo.bin <= hi.bin),
       |inner_min AS (
       |  SELECT b.bin AS t, iv.i, min(iv.avg_e6) AS m
       |  FROM bins b JOIN iv ON iv.i <= b.bin AND iv.j >= b.bin
       |  GROUP BY 1, 2),
       |fit AS (SELECT t, CAST(max(m) AS BIGINT) AS fitted_e6
       |        FROM inner_min GROUP BY t)
       |SELECT bin, n, pos,
       |  CAST(round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
       |    AS BIGINT) AS raw_rate_e6,
       |  fitted_e6
       |FROM bins JOIN fit ON fit.t = bins.bin
       |ORDER BY bin""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q268 — rolling-origin backtest of a seasonal-naive forecaster:
  // forecast(day) = revenue(day - 7), evaluated per (priority, month)
  // over 2001 — the walk-forward evaluation harness every production
  // forecast runs before deployment (each month is a later origin; no
  // future data leaks into any forecast because the predictor is a
  // pure calendar lag). The lag is a CALENDAR self-join on day - 7
  // (a row-offset lag() would silently skip across missing days), both
  // branches reading the pinned day-grain aggregate. MAE and bias are
  // exact e2 longs; the final mean is one rounded division.
  // ---------------------------------------------------------------------
  private def q268(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01"))
      .groupBy(col("o_orderpriority").as("prio"),
        datediff(col("o_orderdate"), lit("2001-01-01")).as("x"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y_e2"))
      .pin() // ~1k rows; both join branches read this once
    val lag7 = daily.select(col("prio"), (col("x") + 7).as("x"),
      col("y_e2").as("f_e2"))
    daily.join(lag7, Seq("prio", "x"))
      .groupBy(col("prio"), (col("x") / 30).cast("long").as("fold"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("y_e2") - col("f_e2"))).as("abs_err_e2"),
        sum(col("y_e2") - col("f_e2")).as("bias_e2"))
      .withColumn("mae_e2",
        round(col("abs_err_e2").cast("double") /
          col("n_days").cast("double")).cast("long"))
      .orderBy("prio", "fold")
  }

  private val q268Sql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS prio,
      |    datediff('day', TIMESTAMP '2001-01-01', o_orderdate) AS x,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS y_e2
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
      |  GROUP BY 1, 2),
      |joined AS (
      |  SELECT a.prio, a.x, a.y_e2, b.y_e2 AS f_e2
      |  FROM daily a JOIN daily b ON a.prio = b.prio AND b.x = a.x - 7),
      |folds AS (
      |  SELECT prio, CAST(x // 30 AS BIGINT) AS fold,
      |    CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(abs(y_e2 - f_e2)) AS BIGINT) AS abs_err_e2,
      |    CAST(sum(y_e2 - f_e2) AS BIGINT) AS bias_e2
      |  FROM joined GROUP BY 1, 2)
      |SELECT prio, fold, n_days, abs_err_e2, bias_e2,
      |  CAST(round(CAST(abs_err_e2 AS DOUBLE) / CAST(n_days AS DOUBLE))
      |    AS BIGINT) AS mae_e2
      |FROM folds ORDER BY prio, fold""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q267_isotonic" -> (q267 _),
    "q268_backtest" -> (q268 _),
    "q258_jw_linkage" -> (q258 _),
    "q259_theil_sen" -> (q259 _),
    "q260_mann_whitney" -> (q260 _),
    "q261_chi_square" -> (q261 _),
    "q262_od_matrix" -> (q262 _),
    "q263_station_imbalance" -> (q263 _),
    "q264_kendall_tau" -> (q264 _),
    "q265_staypoints" -> (q265 _))

  val oracle: Map[String, String] = Map(
    "q267_isotonic" -> q267Sql,
    "q268_backtest" -> q268Sql,
    "q258_jw_linkage" -> q258Sql,
    "q259_theil_sen" -> q259Sql,
    "q260_mann_whitney" -> q260Sql,
    "q261_chi_square" -> q261Sql,
    "q262_od_matrix" -> q262Sql,
    "q263_station_imbalance" -> q263Sql,
    "q264_kendall_tau" -> q264Sql,
    "q265_staypoints" -> q265Sql)
}
