package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{AsOfJoin, Sessionize}
import Exact._

/** Window-function / sessionization / as-of query suite.
  *
  * This is the reference's analytical core re-expressed on the driver
  * tables: the LAG self-pairing (W1, `lambda/trips_lambda.py:102-104`),
  * the gap-bounded segment filter and grouped trip aggregate
  * (`:127-162`), plus the ranking/running-total surface the analytics
  * layer needs (SURVEY.md §2.5 "not in reference").
  *
  * events.ts is ns-precision parquet; every query truncates to whole
  * seconds (see [[Exact]]) and orders by (ts, event_id) so Spark and
  * DuckDB agree bit-for-bit.
  */
object Windowed {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.eventsSec(s, dir)

  // ---------------------------------------------------------------------
  // q11 — ranking windows: top-3 customers by balance per nation.
  // ---------------------------------------------------------------------
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("n_name"), col("rn"))
  }

  private val q11Sql =
    """SELECT * FROM (
      |  SELECT n_name, c_custkey, c_acctbal,
      |    row_number() OVER w AS rn,
      |    rank()       OVER w AS rnk,
      |    dense_rank() OVER w AS drnk
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  WINDOW w AS (PARTITION BY n_name
      |               ORDER BY c_acctbal DESC, c_custkey ASC)
      |) WHERE rn <= 3
      |ORDER BY n_name, rn""".stripMargin

  // ---------------------------------------------------------------------
  // q12 — running total per customer (frame-spec window; exact via
  // scaled-long accumulation inside the frame).
  // ---------------------------------------------------------------------
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"),
        (sum(round(col("o_totalprice") * 100).cast("long")).over(w) / 100.0)
          .as("running_total"),
        row_number().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey")))
          .cast("long").as("order_seq"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  private val q12Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
      |       AS BIGINT) / 100.0 AS running_total,
      |  row_number() OVER (PARTITION BY o_custkey
      |                     ORDER BY o_orderdate, o_orderkey) AS order_seq
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, order_seq""".stripMargin

  // ---------------------------------------------------------------------
  // q13 — LAG self-pairing (W1/J1, `trips_lambda.py:102-104` verbatim
  // shape): each event with its predecessor per user and the gap.
  // ---------------------------------------------------------------------
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    ev(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_s"), col("value"),
        lag("ts_s", 1).over(w).as("prev_ts_s"),
        lag("value", 1).over(w).as("prev_value"),
        (col("ts_s").cast("long") - lag("ts_s", 1).over(w).cast("long"))
          .as("gap_s"))
      .orderBy(col("user_id"), col("ts_s"), col("event_id"))
  }

  private val q13Sql =
    s"""SELECT user_id, event_id, ${secSql("ts")} AS ts_s, value,
       |  lag(${secSql("ts")}) OVER w AS prev_ts_s,
       |  lag(value) OVER w AS prev_value,
       |  ${epochSSql("ts")} - lag(${epochSSql("ts")}) OVER w AS gap_s
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY ${secSql("ts")}, event_id)
       |ORDER BY user_id, ts_s, event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q14 — gap-based sessionization (§2.9 "session-ish windowing",
  // corrected semantics: one row per session). 30-minute gap.
  // ---------------------------------------------------------------------
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val sessions = Sessionize.byGap(
      ev(s, dir), Seq("user_id"), col("ts_s"), col("event_id"), 1800L)
    sessions
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts_s")).as("session_start"),
        max(col("ts_s")).as("session_end"),
        count(lit(1)).as("n_events"),
        ((max(col("ts_s")).cast("long") - min(col("ts_s")).cast("long")) / 60.0)
          .as("duration_min"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private val q14Sql =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ${secSql("ts")} AS ts_s,
       |    CASE WHEN ${epochSSql("ts")} - lag(${epochSSql("ts")})
       |      OVER (PARTITION BY user_id ORDER BY ${secSql("ts")}, event_id)
       |      <= 1800 THEN 0 ELSE 1 END AS boundary
       |  FROM events),
       |sessioned AS (
       |  SELECT user_id, ts_s,
       |    CAST(sum(boundary) OVER (PARTITION BY user_id
       |      ORDER BY ts_s, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS session_id
       |  FROM flagged)
       |SELECT user_id, session_id,
       |  min(ts_s) AS session_start, max(ts_s) AS session_end,
       |  count(*) AS n_events,
       |  (CAST(epoch(max(ts_s)) AS BIGINT)
       |   - CAST(epoch(min(ts_s)) AS BIGINT)) / 60.0 AS duration_min
       |FROM sessioned
       |GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------------
  // q15 — the reference trip-derivation pipeline shape
  // (`trips_lambda.py:94-163`) on events: user≈bike, value≈position.
  // lag×2 → gap/movement filters (inclusive BETWEEN, exact !=) →
  // grouped aggregate with min/max endpoints → HAVING. Gap band widened
  // to [60 s, 24 h] because driver events are sparser than bike pings.
  // ---------------------------------------------------------------------
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val moves = ev(s, dir).select(
      col("user_id"), col("event_id"), col("ts_s"), col("value"),
      lag("ts_s", 1).over(w).as("prev_ts_s"),
      lag("value", 1).over(w).as("prev_value"))
    val gapS = col("ts_s").cast("long") - col("prev_ts_s").cast("long")
    val segments = moves
      .filter(col("prev_ts_s").isNotNull &&
        gapS.between(60L, 86400L) &&
        col("value") =!= col("prev_value"))
      .select(col("user_id"),
        col("prev_ts_s").as("start_ts"), col("ts_s").as("end_ts"),
        gapS.as("gap_s"),
        abs(col("value") - col("prev_value")).as("move"))
    segments
      .groupBy(col("user_id"))
      .agg(
        min(col("start_ts")).as("trip_start"),
        max(col("end_ts")).as("trip_end"),
        (sum(col("gap_s")) / 60.0).as("total_duration_min"),
        fixedSum(col("move")).as("total_move"),
        count(lit(1)).as("segment_count"))
      .filter(col("total_duration_min").between(1.0, 43200.0) &&
        col("total_move") > 0 && col("segment_count") >= 2)
      .orderBy(col("user_id"))
  }

  private val q15Sql =
    s"""WITH moves AS (
       |  SELECT user_id, event_id, ${secSql("ts")} AS ts_s, value,
       |    lag(${secSql("ts")}) OVER w AS prev_ts_s,
       |    lag(value) OVER w AS prev_value
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ${secSql("ts")}, event_id)),
       |segments AS (
       |  SELECT user_id, prev_ts_s AS start_ts, ts_s AS end_ts,
       |    CAST(epoch(ts_s) AS BIGINT) - CAST(epoch(prev_ts_s) AS BIGINT)
       |      AS gap_s,
       |    abs(value - prev_value) AS move
       |  FROM moves
       |  WHERE prev_ts_s IS NOT NULL
       |    AND CAST(epoch(ts_s) AS BIGINT) - CAST(epoch(prev_ts_s) AS BIGINT)
       |        BETWEEN 60 AND 86400
       |    AND value != prev_value)
       |SELECT user_id,
       |  min(start_ts) AS trip_start,
       |  max(end_ts) AS trip_end,
       |  CAST(sum(gap_s) AS BIGINT) / 60.0 AS total_duration_min,
       |  ${fixedSumSql("move")} AS total_move,
       |  count(*) AS segment_count
       |FROM segments
       |GROUP BY user_id
       |HAVING CAST(sum(gap_s) AS BIGINT) / 60.0 BETWEEN 1.0 AND 43200.0
       |  AND ${fixedSumSql("move")} > 0 AND count(*) >= 2
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q16 — as-of join (J2): each click event enriched with the latest
  // error event at-or-before it for the same user, via the
  // union-and-carry-forward operator (one shuffle, no range join).
  // ---------------------------------------------------------------------
  private def q16(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_s"))
    val errors = e.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts_s").as("err_ts_s"))
      .agg(max(col("value")).as("err_value"))
    AsOfJoin.lastBefore(clicks, errors, Seq("user_id"),
        leftTs = "ts_s", rightTs = "err_ts_s",
        payload = Seq("err_ts_s", "err_value"))
      .orderBy(col("user_id"), col("ts_s"), col("event_id"))
  }

  private val q16Sql =
    s"""WITH clicks AS (
       |  SELECT user_id, event_id, ${secSql("ts")} AS ts_s
       |  FROM events WHERE event_type = 'click'),
       |errors AS (
       |  SELECT user_id, ${secSql("ts")} AS err_ts_s,
       |         max(value) AS err_value
       |  FROM events WHERE event_type = 'error'
       |  GROUP BY user_id, ${secSql("ts")})
       |SELECT c.user_id, c.event_id, c.ts_s,
       |  (SELECT max(e.err_ts_s) FROM errors e
       |   WHERE e.user_id = c.user_id AND e.err_ts_s <= c.ts_s) AS err_ts_s,
       |  (SELECT e.err_value FROM errors e
       |   WHERE e.user_id = c.user_id AND e.err_ts_s <= c.ts_s
       |   ORDER BY e.err_ts_s DESC LIMIT 1) AS err_value
       |FROM clicks c
       |ORDER BY c.user_id, c.ts_s, c.event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q53 — Structured Streaming in the correctness gate: watermarked
  // session_window over a bounded file-stream replay of `events`
  // (two AvailableNow runs; the second — the reference's daily
  // incremental re-run — flushes trailing sessions past the
  // watermark). Oracle: batch gaps-and-islands with session_window's
  // INCLUSIVE boundary — a gap of exactly 30 min stays in the same
  // session (verified empirically: sf0.1 has one exactly-1800 s gap,
  // and session_window merges it), matching q14's byGap.
  // ---------------------------------------------------------------------
  private def q53(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.sessionReplayFromParquet(
        s, s"$dir/events.parquet", "user_id", "30 minutes")
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  // Window ORDER BYs carry the event_id tiebreak: session semantics
  // are tie-invariant (duplicate ts ⇒ gap 0), but DuckDB's PARALLEL
  // window execution can split an ORDER-BY tie group across threads,
  // making lag()/running sums nondeterministic — observed at the ×10
  // scale smoke where every ts is duplicated. A unique total order
  // removes the hazard; with unique ts it changes nothing.
  private val q53Sql =
    """WITH e AS (
      |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, ts_s,
      |    CASE WHEN lag(ts_s) OVER w IS NULL
      |      OR CAST(epoch(ts_s) AS BIGINT)
      |         - CAST(epoch(lag(ts_s) OVER w) AS BIGINT) > 1800
      |    THEN 1 ELSE 0 END AS new_s, event_id
      |  FROM e WINDOW w AS (PARTITION BY user_id
      |                      ORDER BY ts_s, event_id)),
      |s AS (
      |  SELECT user_id, ts_s,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts_s) AS session_start,
      |  max(ts_s) + INTERVAL 1800 SECOND AS session_end,
      |  count(*) AS n_events
      |FROM s
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------------
  // q266 — the q53 sessionization re-run under the ROCKSDB state store
  // provider (off-heap state + changelog checkpoints — the provider a
  // production deployment runs, because HDFS-backed state lives on the
  // JVM heap and billions of live sessions OOM it). Same sentinel
  // replay, same watermarked session_window, same gaps-and-islands
  // oracle as q53: the gate proves the state backend is semantically
  // invisible — swap providers, bit-identical sessions.
  // ---------------------------------------------------------------------
  private def q266(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.withRocksDbStateStore(s) {
      graft.streaming.Streaming.sessionReplayFromParquet(
          s, s"$dir/events.parquet", "user_id", "30 minutes")
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }

  // ---------------------------------------------------------------------
  // q269 — the SAME sessions a third way: `transformWithState`, the
  // arbitrary-state API that supersedes flatMapGroupsWithState (typed
  // state variables, first-class re-registrable timers, RocksDB-only
  // state). q53 (built-in session_window), q103
  // (flatMapGroupsWithState), and this all face one batch
  // gaps-and-islands oracle — three state machines, one answer.
  // ---------------------------------------------------------------------
  private def q269(s: SparkSession, dir: String): DataFrame =
    graft.streaming.TwsSessions.replayFromParquet(
        s, s"$dir/events.parquet", 1800L)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  // ---------------------------------------------------------------------
  // q426 — ONLINE Page–Hinkley drift detection (transformWithState):
  // the q411 detector run as a STREAM — per-day (count, sum) MapState,
  // a boundary timer per open day, closed days drained in day order
  // through the walk state. Faces the SAME DuckDB oracle as the batch
  // q411: one statistic, two execution models, bit-identical rows
  // (TwsDriftSpec additionally asserts streaming == batch directly).
  // ---------------------------------------------------------------------
  private def q426(s: SparkSession, dir: String): DataFrame =
    graft.streaming.TwsDrift.replayFromParquet(s, s"$dir/events.parquet")
      .orderBy(col("day"))

  // ---------------------------------------------------------------------
  // q270/q271 — the other two transformWithState state shapes, both on
  // the EMIT-ON-CLOSE pattern (state absorbs every micro-batch; one
  // flush timer per key fires when the sentinel advances the
  // watermark): q270 keeps per-user top-3 event values in a ListState
  // truncated to k on every update (state O(k) per key for an
  // unbounded stream), q271 keeps per-user event-type counts in a
  // MapState (state O(categories) per key). Oracles are the plain
  // batch formulations — if the stream state dropped or double-counted
  // anything, the hash shifts.
  // ---------------------------------------------------------------------
  private def q270(s: SparkSession, dir: String): DataFrame =
    graft.streaming.TwsSessions.topKReplayFromParquet(
        s, s"$dir/events.parquet", 3)
      .orderBy(col("user_id"), col("rank"))

  private val q270Sql =
    """SELECT user_id, CAST(rn AS INTEGER) AS rank, value_e4
      |FROM (
      |  SELECT user_id, CAST(round(value * 10000) AS BIGINT) AS value_e4,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY CAST(round(value * 10000) AS BIGINT) DESC) AS rn
      |  FROM events)
      |WHERE rn <= 3
      |ORDER BY user_id, rn""".stripMargin

  private def q271(s: SparkSession, dir: String): DataFrame =
    graft.streaming.TwsSessions.categoryCountsReplayFromParquet(
        s, s"$dir/events.parquet")
      .orderBy(col("user_id"), col("event_type"))

  private val q271Sql =
    """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY 1, 2
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q99 — streaming dedup in the gate: events streamed TWICE through
  // dropDuplicatesWithinWatermark (two micro-batches of the same
  // file), so every event's second copy must be suppressed by the
  // state store — the at-least-once ingestion dedup, previously
  // spec-only. The oracle aggregates the events table once: if the
  // streaming state failed to drop even one duplicate, every count
  // and fixed-point sum would shift.
  // ---------------------------------------------------------------------
  private def q99(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.dedupReplayFromParquet(
        s, s"$dir/events.parquet", Seq("event_id"), "366 days")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(round(col("value") * 10000).cast("long")).as("value_e4_total"))
      .orderBy(col("event_type"))

  private val q99Sql =
    """SELECT event_type, count(*) AS n,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
      |    AS value_e4_total
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q103 — CUSTOM STATE in the gate: the hand-rolled
  // flatMapGroupsWithState sessionizer with an event-time timeout
  // (Streaming.statefulSessions) replayed over events, checked
  // against the SAME batch gaps-and-islands oracle as q53's built-in
  // session_window — the two formulations must agree session for
  // session, including every trailing session flushed by timer.
  // ---------------------------------------------------------------------
  private def q103(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.statefulSessionReplayFromParquet(
        s, s"$dir/events.parquet", gapSec = 1800L)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  // ---------------------------------------------------------------------
  // q174 — PER-KEY DYNAMIC-GAP sessions in the gate: each user
  // sessionizes under their own inactivity threshold
  // (1800 + (user % 3)·900 s — the per-tier policy shape). This is
  // exactly the session logic `session_window` CANNOT express (q103's
  // scaladoc claim, now gate-checked): the gap is a function of the
  // KEY, so only the custom flatMapGroupsWithState fold can run it.
  // Oracle: the q53 gaps-and-islands SQL with the same per-user gap
  // expression (and the q53 unique-tiebreak discipline).
  // ---------------------------------------------------------------------
  private def q174(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.dynamicSessionReplayFromParquet(
        s, s"$dir/events.parquet", u => 1800L + (u % 3) * 900L)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  private val q174Sql =
    """WITH e AS (
      |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id,
      |    1800 + (user_id % 3) * 900 AS gap
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, ts_s, gap,
      |    CASE WHEN lag(ts_s) OVER w IS NULL
      |      OR CAST(epoch(ts_s) AS BIGINT)
      |         - CAST(epoch(lag(ts_s) OVER w) AS BIGINT) > gap
      |    THEN 1 ELSE 0 END AS new_s, event_id
      |  FROM e WINDOW w AS (PARTITION BY user_id
      |                      ORDER BY ts_s, event_id)),
      |s AS (
      |  SELECT user_id, ts_s, gap,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts_s) AS session_start,
      |  max(ts_s) + to_seconds(CAST(min(gap) AS BIGINT)) AS session_end,
      |  count(*) AS n_events
      |FROM s
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------------
  // q183 — session-scoped STRICT funnel: view → click → purchase must
  // happen in order WITHIN one session (q93's global funnel ignores
  // session boundaries; conversion analysis usually must not). The
  // ordered-stage chain is three narrow per-(user, session)
  // aggregates — t₁ = first view, t₂ = first click after t₁,
  // t₃ = first purchase after t₂ — each a groupBy over the session
  // table sharing the same key partitioning; all timestamps integer
  // seconds, counts exact.
  // ---------------------------------------------------------------------
  private def q183(s: SparkSession, dir: String): DataFrame = {
    val sess = Sessionize.byGap(
      ev(s, dir), Seq("user_id"), col("ts_s"), col("event_id"), 1800L)
      .select(col("user_id"), col("session_id"), col("event_type"),
        col("ts_s").cast("long").as("ts_l"))
    val keys = Seq("user_id", "session_id")
    val t1 = sess.filter(col("event_type") === "view")
      .groupBy(keys.map(col): _*).agg(min(col("ts_l")).as("t1"))
    val t2 = sess.filter(col("event_type") === "click")
      .join(t1, keys).filter(col("ts_l") > col("t1"))
      .groupBy(keys.map(col): _*).agg(min(col("ts_l")).as("t2"))
    val t3 = sess.filter(col("event_type") === "purchase")
      .join(t2, keys).filter(col("ts_l") > col("t2"))
      .groupBy(keys.map(col): _*).agg(min(col("ts_l")).as("t3"))
    sess.groupBy(col("user_id"))
      .agg(countDistinct(col("session_id")).as("n_sessions"))
      .join(t1.groupBy(col("user_id")).agg(count(lit(1)).as("n_v")),
        Seq("user_id"), "left")
      .join(t2.groupBy(col("user_id")).agg(count(lit(1)).as("n_vc")),
        Seq("user_id"), "left")
      .join(t3.groupBy(col("user_id")).agg(count(lit(1)).as("n_vcp")),
        Seq("user_id"), "left")
      .select(col("user_id"), col("n_sessions"),
        coalesce(col("n_v"), lit(0L)).as("n_v"),
        coalesce(col("n_vc"), lit(0L)).as("n_vc"),
        coalesce(col("n_vcp"), lit(0L)).as("n_vcp"))
      .orderBy(col("user_id"))
  }

  private val q183Sql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type,
       |    ${epochSSql("ts")} AS ts_l, ${secSql("ts")} AS ts_s
       |  FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN lag(ts_l) OVER w IS NULL
       |      OR ts_l - lag(ts_l) OVER w > 1800 THEN 1 ELSE 0 END AS b
       |  FROM e WINDOW w AS (PARTITION BY user_id
       |                      ORDER BY ts_s, event_id)),
       |sess AS (
       |  SELECT user_id, event_type, ts_l,
       |    sum(b) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
       |      ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM flagged),
       |t1 AS (
       |  SELECT user_id, session_id, min(ts_l) AS t1 FROM sess
       |  WHERE event_type = 'view' GROUP BY 1, 2),
       |t2 AS (
       |  SELECT s.user_id, s.session_id, min(s.ts_l) AS t2
       |  FROM sess s JOIN t1 USING (user_id, session_id)
       |  WHERE s.event_type = 'click' AND s.ts_l > t1.t1
       |  GROUP BY 1, 2),
       |t3 AS (
       |  SELECT s.user_id, s.session_id, min(s.ts_l) AS t3
       |  FROM sess s JOIN t2 USING (user_id, session_id)
       |  WHERE s.event_type = 'purchase' AND s.ts_l > t2.t2
       |  GROUP BY 1, 2)
       |SELECT n.user_id, n.n_sessions,
       |  coalesce(v.n_v, 0) AS n_v,
       |  coalesce(c.n_vc, 0) AS n_vc,
       |  coalesce(p.n_vcp, 0) AS n_vcp
       |FROM (SELECT user_id, count(DISTINCT session_id) AS n_sessions
       |      FROM sess GROUP BY 1) n
       |LEFT JOIN (SELECT user_id, count(*) AS n_v FROM t1 GROUP BY 1) v
       |  USING (user_id)
       |LEFT JOIN (SELECT user_id, count(*) AS n_vc FROM t2 GROUP BY 1) c
       |  USING (user_id)
       |LEFT JOIN (SELECT user_id, count(*) AS n_vcp FROM t3 GROUP BY 1) p
       |  USING (user_id)
       |ORDER BY n.user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q112 — the higher-order-function surface over nested arrays:
  // per-user event values collected into a sorted e4 array, then
  // reduced entirely with array lambdas — aggregate (fold), filter,
  // transform — matching DuckDB's list lambdas element for element.
  // Nested-data pipelines live on this API; the gate pins Spark's
  // lambda semantics (ordering, empty arrays, fold identity) to an
  // independent engine's.
  // ---------------------------------------------------------------------
  private def q112(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .select(col("user_id"),
        round(col("value") * 10000).cast("long").as("v"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(col("v"))).as("arr"))
      .select(col("user_id"),
        size(col("arr")).cast("long").as("n"),
        aggregate(col("arr"), lit(0L), (acc, x) => acc + x).as("total"),
        size(filter(col("arr"), _ > lit(2000000L))).cast("long")
          .as("n_large"),
        aggregate(transform(col("arr"), x => x % 97L), lit(0L),
          (acc, x) => acc + x).as("mod_total"),
        element_at(col("arr"), 1).as("v_min"),
        element_at(col("arr"), -1).as("v_max"))
      .orderBy(col("user_id"))

  private val q112Sql =
    """WITH u AS (
      |  SELECT user_id,
      |    list_sort(list(CAST(round(value * 10000) AS BIGINT))) AS arr
      |  FROM events
      |  GROUP BY user_id)
      |SELECT user_id,
      |  CAST(len(arr) AS BIGINT) AS n,
      |  CAST(list_aggregate(arr, 'sum') AS BIGINT) AS total,
      |  CAST(len(list_filter(arr, x -> x > 2000000)) AS BIGINT)
      |    AS n_large,
      |  CAST(list_aggregate(list_transform(arr, x -> x % 97), 'sum')
      |    AS BIGINT) AS mod_total,
      |  arr[1] AS v_min,
      |  arr[-1] AS v_max
      |FROM u
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q110 — the foreachBatch → keyed-merge sink in the gate: events
  // replayed as TWO identical micro-batches, each recomputing the
  // per-user aggregate and upserting it into the parquet target (the
  // reference's daily ON-CONFLICT run, live). The second batch must
  // leave the target exactly where the first did — idempotent re-run
  // — so the final target equals the batch truth over ONE copy,
  // which is precisely what the oracle computes.
  // ---------------------------------------------------------------------
  private def q110(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.upsertReplayFromParquet(
        s, s"$dir/events.parquet", Seq("user_id"),
        batch => batch.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(round(col("value") * 10000).cast("long"))
              .as("value_e4_total"),
            max(col("ts_s")).as("last_ts")))
      .orderBy(col("user_id"))

  private val q110Sql =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
      |    AS value_e4_total,
      |  max(date_trunc('second', ts)) AS last_ts
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q106 — interval-overlap temporal join with NO equality key:
  // error intervals [ts, ts+round(value) s] overlapped against click
  // intervals across ALL users, via the bucket-grid operator — a
  // hash equi-join on 600 s buckets with each pair emitted exactly
  // once, where the naive theta join could only plan nested-loop.
  // The oracle IS that naive theta join (DuckDB IEJoins it), so the
  // gate proves the grid loses no pair, duplicates no pair, and
  // keeps zero-length touches. Reduced to per-day overlap counts and
  // exact total overlap seconds.
  // ---------------------------------------------------------------------
  private def q106(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("event_id"), col("event_type"),
      Exact.epochS(col("ts_s")).as("s"),
      (Exact.epochS(col("ts_s")) +
        round(col("value")).cast("long")).as("e2"))
    def side(t: String, p: String) = e.filter(col("event_type") === t)
      .select(col("event_id").as(s"${p}_id"), col("s").as(s"${p}_start"),
        col("e2").as(s"${p}_end"))
    graft.operators.RangeJoin.intervalOverlap(
        side("error", "l"), side("click", "r"), bucketSec = 600L)
      .groupBy(expr("l_start div 86400").as("day_idx"))
      .agg(count(lit(1)).as("n"),
        sum(least(col("l_end"), col("r_end")) -
          greatest(col("l_start"), col("r_start"))).as("overlap_s_total"))
      .orderBy(col("day_idx"))
  }

  private val q106Sql =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s,
      |    CAST(epoch(date_trunc('second', ts)) AS BIGINT)
      |      + CAST(round(value) AS BIGINT) AS e2
      |  FROM events),
      |l AS (SELECT event_id AS l_id, s AS l_start, e2 AS l_end
      |      FROM e WHERE event_type = 'error'),
      |r AS (SELECT event_id AS r_id, s AS r_start, e2 AS r_end
      |      FROM e WHERE event_type = 'click')
      |SELECT l_start // 86400 AS day_idx, count(*) AS n,
      |  CAST(sum(least(l_end, r_end) - greatest(l_start, r_start))
      |    AS BIGINT) AS overlap_s_total
      |FROM l JOIN r ON l_start <= r_end AND r_start <= l_end
      |GROUP BY 1
      |ORDER BY day_idx""".stripMargin

  // ---------------------------------------------------------------------
  // q102 — event-transition matrix (Markov bigram counts): per user,
  // each event paired with its predecessor via ONE window pass (two
  // lags share the same WindowExec), then a tiny (types × types)
  // aggregate — the product-analytics path-analysis primitive. The
  // window shuffle on user_id is the only corpus-sized exchange; the
  // groupBy shuffles at most |types|² partial rows per task.
  // ---------------------------------------------------------------------
  private def q102(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    ev(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_s"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_s",
        Exact.epochS(col("ts_s")) -
          Exact.epochS(lag(col("ts_s"), 1).over(w)))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("gap_s")).as("gap_s_total"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  private val q102Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    date_trunc('second', ts) AS ts_s
      |  FROM events),
      |p AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER w AS prev_type,
      |    CAST(epoch(ts_s) AS BIGINT)
      |      - CAST(epoch(lag(ts_s) OVER w) AS BIGINT) AS gap_s
      |  FROM e WINDOW w AS (PARTITION BY user_id
      |                      ORDER BY ts_s, event_id))
      |SELECT prev_type, event_type, count(*) AS n,
      |  CAST(sum(gap_s) AS BIGINT) AS gap_s_total
      |FROM p
      |WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, event_type
      |ORDER BY prev_type, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q61 — RANGE frame (value-based window, vs q12's ROWS frame): per
  // order, the trailing-30-day order count and exact revenue within
  // its priority class. RANGE frames are order-independent within
  // ties, and the windowed sum runs over scaled longs, so the frame
  // aggregate is deterministic and bit-exact on any engine.
  // ---------------------------------------------------------------------
  private def q61(s: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("o_orderdate")),
      to_date(lit("1995-01-01")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority")).orderBy(col("day"))
      .rangeBetween(-30, 0)
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        day.as("day"), col("o_totalprice"))
      .withColumn("n_trailing_30d", count(lit(1)).over(w))
      .withColumn("rev_trailing_30d",
        sum(round(col("o_totalprice") * 100).cast("long")).over(w) / 100.0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("day").cast("long").as("day"),
        col("n_trailing_30d"), col("rev_trailing_30d"))
      .orderBy(col("o_orderkey"))
  }

  private val q61Sql =
    """WITH d AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
      |      AS day,
      |    o_totalprice
      |  FROM orders)
      |SELECT o_orderkey, o_orderpriority, CAST(day AS BIGINT) AS day,
      |  count(*) OVER w AS n_trailing_30d,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
      |    AS BIGINT) / 100.0 AS rev_trailing_30d
      |FROM d
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
      |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // q63 — stream-stream watermarked interval join in the correctness
  // gate: both join sides are independent file streams over `events`
  // (errors → clicks within 600 s by the same user, the q46 contract
  // with the interval join's inclusive-at-zero boundary), drained in
  // one AvailableNow run. Oracle: the equivalent batch range join —
  // proving the streaming join's state machine reproduces batch truth
  // on every pair. The watermark bounds join state, which is what the
  // unbounded production form relies on at 100 TB/day.
  // ---------------------------------------------------------------------
  private def q63(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.intervalJoinReplayFromParquet(
        s, s"$dir/events.parquet", "error", "click", 600L)
      .select(col("user_id"), col("error_id"), col("click_id"),
        (unix_timestamp(col("click_ts")) - unix_timestamp(col("err_ts")))
          .as("delta_s"))
      .orderBy(col("user_id"), col("error_id"), col("click_id"))

  private val q63Sql =
    s"""WITH e AS (SELECT user_id, event_id, ${epochSSql("ts")} AS ts_l,
       |                  event_type FROM events)
       |SELECT err.user_id, err.event_id AS error_id,
       |  c.event_id AS click_id, c.ts_l - err.ts_l AS delta_s
       |FROM e err JOIN e c
       |  ON err.user_id = c.user_id
       |  AND err.event_type = 'error' AND c.event_type = 'click'
       |  AND c.ts_l >= err.ts_l AND c.ts_l <= err.ts_l + 600
       |ORDER BY err.user_id, error_id, click_id""".stripMargin

  // ---------------------------------------------------------------------
  // q134 — LEFT OUTER stream-stream interval join in the gate: q63's
  // contract plus the rows a stream can only emit via watermark
  // eviction — an error with NO click in its 600 s window surfaces
  // (null-matched) once the watermark proves no match can still
  // arrive. Inner matches don't exercise that path at all; this gate
  // checks the state-expiry machinery itself against the batch LEFT
  // JOIN truth.
  // ---------------------------------------------------------------------
  private def q134(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.leftOuterIntervalJoinReplayFromParquet(
        s, s"$dir/events.parquet", "error", "click", 600L)
      .select(col("user_id"), col("error_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(unix_timestamp(col("click_ts")) -
          unix_timestamp(col("err_ts")), lit(-1L)).as("delta_s"))
      .orderBy(col("user_id"), col("error_id"), col("click_id"))

  private val q134Sql =
    s"""WITH e AS (SELECT user_id, event_id, ${epochSSql("ts")} AS ts_l,
       |                  event_type FROM events),
       |err AS (SELECT user_id, event_id, ts_l FROM e
       |        WHERE event_type = 'error'),
       |c AS (SELECT user_id, event_id, ts_l FROM e
       |      WHERE event_type = 'click')
       |SELECT err.user_id, err.event_id AS error_id,
       |  coalesce(c.event_id, -1) AS click_id,
       |  coalesce(c.ts_l - err.ts_l, -1) AS delta_s
       |FROM err LEFT JOIN c
       |  ON err.user_id = c.user_id
       |  AND c.ts_l >= err.ts_l AND c.ts_l <= err.ts_l + 600
       |ORDER BY err.user_id, error_id, click_id""".stripMargin

  // ---------------------------------------------------------------------
  // q155 — FULL OUTER stream-stream interval join: the join-type
  // matrix completed (inner q63, left outer q134). Unmatched rows on
  // BOTH sides exist only via each side's watermark eviction — the
  // right-side state expiry is machinery q134 never exercises. The
  // oracle is the batch FULL JOIN of the same interval condition.
  // ---------------------------------------------------------------------
  private def q155(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.fullOuterIntervalJoinReplayFromParquet(
        s, s"$dir/events.parquet", "error", "click", 600L)
      .select(col("user_id"),
        coalesce(col("error_id"), lit(-1L)).as("error_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(unix_timestamp(col("click_ts")) -
          unix_timestamp(col("err_ts")), lit(-1L)).as("delta_s"))
      .orderBy(col("user_id"), col("error_id"), col("click_id"))

  private val q155Sql =
    s"""WITH e AS (SELECT user_id, event_id, ${epochSSql("ts")} AS ts_l,
       |                  event_type FROM events),
       |err AS (SELECT user_id, event_id, ts_l FROM e
       |        WHERE event_type = 'error'),
       |c AS (SELECT user_id, event_id, ts_l FROM e
       |      WHERE event_type = 'click')
       |SELECT coalesce(err.user_id, c.user_id) AS user_id,
       |  coalesce(err.event_id, -1) AS error_id,
       |  coalesce(c.event_id, -1) AS click_id,
       |  coalesce(c.ts_l - err.ts_l, -1) AS delta_s
       |FROM err FULL JOIN c
       |  ON err.user_id = c.user_id
       |  AND c.ts_l >= err.ts_l AND c.ts_l <= err.ts_l + 600
       |ORDER BY user_id, error_id, click_id""".stripMargin

  // ---------------------------------------------------------------------
  // q355 — LEFT SEMI stream-stream interval join: the existence-test
  // completion of the join-type matrix (inner q63, left outer q134,
  // full outer q155). Each error emits AT MOST ONCE on its first
  // in-window click — the matched-state tombstone (no re-emission on
  // a second match) is machinery none of the other three exercise.
  // Oracle is the batch EXISTS over the same interval condition.
  // ---------------------------------------------------------------------
  private def q355(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.semiIntervalJoinReplayFromParquet(
        s, s"$dir/events.parquet", "error", "click", 600L)
      .select(col("user_id"), col("error_id"),
        unix_timestamp(col("err_ts")).as("err_s"))
      .orderBy(col("user_id"), col("error_id"))

  private val q355Sql =
    s"""WITH e AS (SELECT user_id, event_id, ${epochSSql("ts")} AS ts_l,
       |                  event_type FROM events)
       |SELECT err.user_id, err.event_id AS error_id, err.ts_l AS err_s
       |FROM e err
       |WHERE err.event_type = 'error'
       |  AND EXISTS (
       |    SELECT 1 FROM e c
       |    WHERE c.event_type = 'click' AND c.user_id = err.user_id
       |      AND c.ts_l >= err.ts_l AND c.ts_l <= err.ts_l + 600)
       |ORDER BY err.user_id, error_id""".stripMargin

  // ---------------------------------------------------------------------
  // q91 — FORWARD as-of join with tolerance (pandas merge_asof
  // direction='forward'): each click attaches the EARLIEST error of
  // the same user within the next 300 s, or null. Same single-shuffle
  // union-and-carry formulation as q16, traversed in reverse time
  // order; the tolerance nulls matches beyond the bound (see
  // AsOfJoin.firstAfterWithin).
  // ---------------------------------------------------------------------
  private def q91(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"),
        Exact.epochS(col("ts_s")).as("ts_l"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), Exact.epochS(col("ts_s")).as("err_ts_l"))
      .distinct()
    AsOfJoin.firstAfterWithin(clicks, errors, Seq("user_id"),
        leftTs = "ts_l", rightTs = "err_ts_l",
        payload = Seq("err_ts_l"), tolerance = lit(300L))
      .withColumn("wait_s", col("err_ts_l") - col("ts_l"))
      .orderBy(col("user_id"), col("ts_l"), col("event_id"))
  }

  private val q91Sql =
    s"""WITH clicks AS (
       |  SELECT user_id, event_id, ${epochSSql("ts")} AS ts_l
       |  FROM events WHERE event_type = 'click'),
       |errors AS (
       |  SELECT DISTINCT user_id, ${epochSSql("ts")} AS err_ts_l
       |  FROM events WHERE event_type = 'error')
       |SELECT user_id, event_id, ts_l, err_ts_l,
       |  err_ts_l - ts_l AS wait_s
       |FROM (
       |  SELECT c.user_id, c.event_id, c.ts_l,
       |    (SELECT min(e.err_ts_l) FROM errors e
       |     WHERE e.user_id = c.user_id AND e.err_ts_l >= c.ts_l
       |       AND e.err_ts_l <= c.ts_l + 300) AS err_ts_l
       |  FROM clicks c)
       |ORDER BY user_id, ts_l, event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q85 — stream–static broadcast enrichment in the gate: events
  // replayed as a file stream, inner-joined per micro-batch to the
  // static customer dimension (explicitly broadcast — a stateless
  // BroadcastHashJoin, no watermark, no join state), then the drained
  // output is reduced to per-segment totals. Oracle: the equivalent
  // batch join — streaming enrichment must reproduce batch truth.
  // Values are summed as e4 fixed-point BIGINTs so the aggregate is
  // order-independent and exact.
  // ---------------------------------------------------------------------
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    graft.streaming.Streaming.staticEnrichReplayFromParquet(
        s, s"$dir/events.parquet", dim, "user_id", "c_custkey")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 10000).cast("long")).as("value_e4_total"))
      .select(col("segment"), col("n_events"), col("value_e4_total"))
      .orderBy(col("segment"))
  }

  private val q85Sql =
    """SELECT c_mktsegment AS segment,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
      |    AS value_e4_total
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------------
  // q93 — ordered funnel (view → click-after-view → purchase-after-
  // click, per user): the classic product-analytics sequence query.
  // Three aggregates all keyed on user_id — Spark reuses the hash
  // partitioning across the join+agg chain, so the fact crosses the
  // wire once (the q15 discipline). Output is one row per stage with
  // the surviving-user count.
  // ---------------------------------------------------------------------
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"), col("event_type"),
      Exact.epochS(col("ts_s")).as("ts_l"))
    val tv = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts_l"))).as("tv"))
    val tc = e.join(tv, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "click" &&
        col("ts_l") >= col("tv"), col("ts_l"))).as("tc"),
        min(col("tv")).as("tv"))
    val tp = e.join(tc, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase" &&
        col("ts_l") >= col("tc"), col("ts_l"))).as("tp"),
        min(col("tv")).as("tv"), min(col("tc")).as("tc"))
    tp.agg(
        sum(when(col("tv").isNotNull, 1L).otherwise(0L)).as("n1"),
        sum(when(col("tc").isNotNull, 1L).otherwise(0L)).as("n2"),
        sum(when(col("tp").isNotNull, 1L).otherwise(0L)).as("n3"))
      .select(expr(
        "stack(3, '1_view', n1, '2_click_after_view', n2, " +
          "'3_purchase_after_click', n3) AS (stage, n_users)"))
      .orderBy(col("stage"))
  }

  private val q93Sql =
    s"""WITH e AS (
       |  SELECT user_id, event_type, ${epochSSql("ts")} AS ts_l
       |  FROM events),
       |tv AS (
       |  SELECT user_id,
       |    min(CASE WHEN event_type = 'view' THEN ts_l END) AS tv
       |  FROM e GROUP BY user_id),
       |tc AS (
       |  SELECT e.user_id,
       |    min(CASE WHEN event_type = 'click' AND ts_l >= tv
       |        THEN ts_l END) AS tc,
       |    min(tv) AS tv
       |  FROM e JOIN tv USING (user_id) GROUP BY e.user_id),
       |tp AS (
       |  SELECT e.user_id,
       |    min(CASE WHEN event_type = 'purchase' AND ts_l >= tc
       |        THEN ts_l END) AS tp,
       |    min(tv) AS tv, min(tc) AS tc
       |  FROM e JOIN tc USING (user_id) GROUP BY e.user_id),
       |wide AS (
       |  SELECT
       |    CAST(sum(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n1,
       |    CAST(sum(CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n2,
       |    CAST(sum(CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n3
       |  FROM tp)
       |SELECT '1_view' AS stage, n1 AS n_users FROM wide
       |UNION ALL SELECT '2_click_after_view', n2 FROM wide
       |UNION ALL SELECT '3_purchase_after_click', n3 FROM wide
       |ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------------
  // q94 — retention cohorts: users grouped by first-activity day, the
  // count still active at each day offset 0–7. Two aggregates keyed
  // on user_id (cohort assignment) then a (cohort, offset) rollup —
  // the fact shuffles once on user, the rollup input is
  // user-day-sized. Integer counts throughout.
  // ---------------------------------------------------------------------
  private def q94(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"),
      to_date(col("ts_s")).as("day"))
    val cohort = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    e.distinct()
      .join(cohort, Seq("user_id"))
      .withColumn("offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("offset") <= 7)
      .groupBy(col("cohort_day"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("offset"))
  }

  private val q94Sql =
    s"""WITH e AS (
       |  SELECT DISTINCT user_id,
       |    CAST(${secSql("ts")} AS DATE) AS day
       |  FROM events),
       |cohort AS (
       |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
       |SELECT cohort_day,
       |  CAST(datediff('day', cohort_day, day) AS BIGINT) AS "offset",
       |  count(*) AS n_users
       |FROM e JOIN cohort USING (user_id)
       |WHERE datediff('day', cohort_day, day) <= 7
       |GROUP BY cohort_day, "offset"
       |ORDER BY cohort_day, "offset"""".stripMargin

  // ---------------------------------------------------------------------
  // q223 — session entry-path analysis (the UX funnel's "how do
  // sessions start" census): 30-minute-gap sessions per user, the
  // first three event types joined into a path string, counted across
  // the corpus. Sessionization is two per-user windows (gap flag +
  // running session id — one exchange), the path head is a bounded
  // slice of the per-session sorted event list.
  // ---------------------------------------------------------------------
  private def q223(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"), col("event_id"),
      col("ts_s").cast("long").as("ts"), col("event_type").as("et"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    e
      .withColumn("new_sess",
        when(col("ts") - lag(col("ts"), 1).over(w) <= 1800, 0L)
          .otherwise(1L))
      .withColumn("sid", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("et")))).as("evs"))
      .select(expr(
        "array_join(transform(slice(evs, 1, 3), x -> x.et), '>')")
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
  }

  private val q223Sql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, ${epochSSql("ts")} AS ts,
       |    event_type AS et
       |  FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN ts - lag(ts) OVER w <= 1800 THEN 0
       |    ELSE 1 END AS new_sess
       |  FROM e WINDOW w AS (PARTITION BY user_id
       |    ORDER BY ts, event_id)),
       |sessions AS (
       |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM flagged),
       |paths AS (
       |  SELECT array_to_string(
       |    list_slice(list(et ORDER BY ts, event_id), 1, 3), '>')
       |    AS path
       |  FROM sessions GROUP BY user_id, sid)
       |SELECT path, count(*) AS n_sessions
       |FROM paths GROUP BY path
       |ORDER BY n_sessions DESC, path""".stripMargin

  // ---------------------------------------------------------------------
  // q192 — nearest-match join (merge_asof direction='nearest'): each
  // click attaches the purchase by the SAME user closest in time,
  // either direction, distance ties breaking backward. One shuffle on
  // user_id, two sorts inside it (AsOfJoin.nearest) — never a range
  // join. The oracle mirrors the packed (ts·1e9+id) min/max carries.
  // ---------------------------------------------------------------------
  private def q192(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).withColumn("ts", col("ts_s").cast("long"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_event_id"))
    AsOfJoin.nearest(clicks, buys, Seq("user_id"), "ts", "p_ts",
        Seq("p_ts", "p_event_id"))
      .select(col("event_id"), col("user_id"),
        coalesce(col("p_event_id"), lit(-1L)).as("nearest_purchase"),
        coalesce(abs(col("ts") - col("p_ts")), lit(-1L)).as("gap_s"))
      .orderBy(col("event_id"))
  }

  private val q192Sql =
    s"""WITH e AS (
       |  SELECT event_id, user_id, event_type,
       |    ${epochSSql("ts")} AS ts_s,
       |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag
       |  FROM events WHERE event_type IN ('click', 'purchase')),
       |win AS (
       |  SELECT e.*,
       |    max(CASE WHEN tag = 0
       |             THEN ts_s * 1000000000 + event_id END)
       |      OVER (PARTITION BY user_id
       |            ORDER BY ts_s, tag, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS bp,
       |    min(CASE WHEN tag = 0
       |             THEN ts_s * 1000000000 + event_id END)
       |      OVER (PARTITION BY user_id
       |            ORDER BY ts_s DESC, tag DESC, event_id DESC
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS fp
       |  FROM e),
       |pick AS (
       |  SELECT event_id, user_id, ts_s,
       |    CASE WHEN bp IS NULL THEN fp
       |         WHEN fp IS NULL THEN bp
       |         WHEN ts_s - bp // 1000000000
       |              <= fp // 1000000000 - ts_s THEN bp
       |         ELSE fp END AS sel
       |  FROM win WHERE event_type = 'click')
       |SELECT event_id, user_id,
       |  COALESCE(sel % 1000000000, -1) AS nearest_purchase,
       |  CASE WHEN sel IS NULL THEN -1
       |       ELSE abs(ts_s - sel // 1000000000) END AS gap_s
       |FROM pick
       |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q11_window_rank" -> (q11 _),
    "q12_window_running" -> (q12 _),
    "q13_lag_gap" -> (q13 _),
    "q14_sessionize" -> (q14 _),
    "q15_trips_derive" -> (q15 _),
    "q16_asof_join" -> (q16 _),
    "q53_stream_session" -> (q53 _),
    "q266_rocksdb_sessions" -> (q266 _),
    "q269_tws_sessions" -> (q269 _),
    "q270_tws_topk" -> (q270 _),
    "q271_tws_mapstate" -> (q271 _),
    "q426_stream_page_hinkley" -> (q426 _),
    "q61_range_frame" -> (q61 _),
    "q63_stream_interval_join" -> (q63 _),
    "q134_stream_outer_join" -> (q134 _),
    "q155_stream_full_outer" -> (q155 _),
    "q355_stream_semi_join" -> (q355 _),
    "q85_stream_static_join" -> (q85 _),
    "q99_stream_dedup" -> (q99 _),
    "q102_transitions" -> (q102 _),
    "q103_stateful_sessions" -> (q103 _),
    "q174_dynamic_sessions" -> (q174 _),
    "q183_session_funnel" -> (q183 _),
    "q106_interval_overlap" -> (q106 _),
    "q110_upsert_stream" -> (q110 _),
    "q112_array_hof" -> (q112 _),
    "q91_asof_forward" -> (q91 _),
    "q93_funnel" -> (q93 _),
    "q94_retention" -> (q94 _),
    "q192_nearest_join" -> (q192 _),
    "q223_session_paths" -> (q223 _))

  val oracle: Map[String, String] = Map(
    "q11_window_rank" -> q11Sql,
    "q266_rocksdb_sessions" -> q53Sql,
    "q269_tws_sessions" -> q53Sql,
    "q270_tws_topk" -> q270Sql,
    "q271_tws_mapstate" -> q271Sql,
    "q426_stream_page_hinkley" -> Shift.q411Sql,
    "q12_window_running" -> q12Sql,
    "q13_lag_gap" -> q13Sql,
    "q14_sessionize" -> q14Sql,
    "q15_trips_derive" -> q15Sql,
    "q16_asof_join" -> q16Sql,
    "q53_stream_session" -> q53Sql,
    "q61_range_frame" -> q61Sql,
    "q63_stream_interval_join" -> q63Sql,
    "q134_stream_outer_join" -> q134Sql,
    "q155_stream_full_outer" -> q155Sql,
    "q355_stream_semi_join" -> q355Sql,
    "q85_stream_static_join" -> q85Sql,
    "q99_stream_dedup" -> q99Sql,
    "q102_transitions" -> q102Sql,
    "q103_stateful_sessions" -> q53Sql, // must equal the built-in's oracle
    "q174_dynamic_sessions" -> q174Sql,
    "q183_session_funnel" -> q183Sql,
    "q106_interval_overlap" -> q106Sql,
    "q110_upsert_stream" -> q110Sql,
    "q112_array_hof" -> q112Sql,
    "q91_asof_forward" -> q91Sql,
    "q93_funnel" -> q93Sql,
    "q94_retention" -> q94Sql,
    "q192_nearest_join" -> q192Sql,
    "q223_session_paths" -> q223Sql)
}
