package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Geo
import Exact._

/** Scalar-function surface (SURVEY.md §2.8): haversine (F3), JSON
  * extraction (F8 / P2 generalized), string manipulation, date/time
  * formatting (F1/F7), cube, and tumbling-window aggregation.
  *
  * All per-row arithmetic is deterministic IEEE and hashes bit-exact;
  * transcendental outputs (haversine) are rounded to 4 decimals on
  * both sides because java.lang.Math and libm may differ in the last
  * ulp.
  */
object Scalars {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.eventsSec(s, dir)

  // ---------------------------------------------------------------------
  // q17 — haversine great-circle distance (F3,
  // `lambda/trips_lambda.py:119-125`), coordinates synthesized from
  // numeric columns. Composed from built-ins → stays in whole-stage
  // codegen, no UDF serialization.
  // ---------------------------------------------------------------------
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val lat1 = abs(col("c_acctbal")) % 90
    val lon1 = (col("c_custkey").cast("double") * 7.1) % 180
    val lat2 = (abs(col("c_acctbal")) * 1.3) % 90
    val lon2 = (col("c_custkey").cast("double") * 3.7) % 180
    c.select(col("c_custkey"),
        round(lat1, 4).as("lat1"), round(lon1, 4).as("lon1"),
        // native fused Catalyst expression (graftx.Haversine) — the
        // oracle cross-checks it against DuckDB's composed formula
        round(Geo.haversineNative(lat1, lon1, lat2, lon2), 4).as("dist_km"))
      .orderBy(col("c_custkey"))
  }

  private val q17Sql = {
    val lat1 = "fmod(abs(c_acctbal), 90)"
    val lon1 = "fmod(CAST(c_custkey AS DOUBLE) * 7.1, 180)"
    val lat2 = "fmod(abs(c_acctbal) * 1.3, 90)"
    val lon2 = "fmod(CAST(c_custkey AS DOUBLE) * 3.7, 180)"
    s"""SELECT c_custkey,
       |  round($lat1, 4) AS lat1, round($lon1, 4) AS lon1,
       |  round(${Geo.haversineKmSql(lat1, lon1, lat2, lon2)}, 4) AS dist_km
       |FROM customer
       |ORDER BY c_custkey""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q18 — JSON field extraction (P2 `air_lambda.py:55-61` generalized:
  // null-tolerant nested access over events.props).
  // ---------------------------------------------------------------------
  private def q18(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"), floor(col("k") / 10).as("k_decile"))
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"),
        fixedSum(col("value")).as("value_total"))
      .orderBy(col("event_type"), col("k_decile"))

  private val q18Sql =
    s"""SELECT event_type,
       |  CAST(floor(CAST(json_extract_string(props, '$$.k') AS BIGINT) / 10)
       |       AS BIGINT) AS k_decile,
       |  count(*) AS n,
       |  min(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS k_min,
       |  max(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS k_max,
       |  ${fixedSumSql("value")} AS value_total
       |FROM events
       |GROUP BY event_type, k_decile
       |ORDER BY event_type, k_decile""".stripMargin

  // ---------------------------------------------------------------------
  // q19 — string functions (F6/F7 surface: the analytics layer's
  // string toolkit; exercised on part names/brands/types).
  // ---------------------------------------------------------------------
  private def q19(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        reverse(col("p_brand")).as("brand_rev"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        levenshtein(col("p_brand"), lit("Brand#13")).cast("long")
          .as("brand_edit_dist"),
        when(col("p_type").startsWith("STANDARD"), lit("std"))
          .when(col("p_type").contains("BRUSHED"), lit("brushed"))
          .otherwise(lit("other")).as("type_class"))
      .orderBy(col("p_partkey"))

  private val q19Sql =
    """SELECT p_partkey,
      |  lower(p_name) AS name_lower,
      |  upper(p_brand) AS brand_upper,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  substr(p_type, 1, 5) AS type_prefix,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  reverse(p_brand) AS brand_rev,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
      |  CAST(levenshtein(p_brand, 'Brand#13') AS BIGINT) AS brand_edit_dist,
      |  CASE WHEN starts_with(p_type, 'STANDARD') THEN 'std'
      |       WHEN contains(p_type, 'BRUSHED') THEN 'brushed'
      |       ELSE 'other' END AS type_class
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------------
  // q20 — date/time functions (F1/F7: `strftime` formatting, month
  // truncation, day deltas) + monthly aggregate.
  // ---------------------------------------------------------------------
  private def q20(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month_key"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        datediff(to_date(lit("2000-01-01")), to_date(col("o_orderdate")))
          .cast("long").as("days_to_y2k"))
      .groupBy(col("month_start"), col("month_key"), col("yr"), col("mo"))
      .agg(count(lit(1)).as("n_orders"),
        fixedSum(col("o_totalprice")).as("month_total"),
        min(col("days_to_y2k")).as("min_days_to_y2k"))
      .orderBy(col("month_start"))

  private val q20Sql =
    s"""SELECT date_trunc('month', o_orderdate) AS month_start,
       |  strftime(o_orderdate, '%Y-%m') AS month_key,
       |  CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
       |  CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
       |  count(*) AS n_orders,
       |  ${fixedSumSql("o_totalprice")} AS month_total,
       |  min(CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
       |      AS BIGINT)) AS min_days_to_y2k
       |FROM orders
       |GROUP BY ALL
       |ORDER BY month_start""".stripMargin

  // ---------------------------------------------------------------------
  // q33 — cube (SURVEY §2.4 north-star: grouping sets).
  // ---------------------------------------------------------------------
  private def q33(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), fixedSum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  private val q33Sql =
    s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       |  ${fixedSumSql("o_totalprice")} AS total
       |FROM orders
       |GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST,
       |         o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // q34 — tumbling event-time window (§2.9: the streaming-shaped
  // aggregation, batch form). window() start aligns with
  // date_trunc('hour') for 1-hour tumbling windows.
  // ---------------------------------------------------------------------
  private def q34(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(window(col("ts_s"), "1 hour").getField("start")
        .as("hour_start"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        fixedSum(col("value")).as("value_total"))
      .orderBy(col("hour_start"))

  private val q34Sql =
    s"""SELECT date_trunc('hour', ts) AS hour_start,
       |  count(*) AS n_events,
       |  count(DISTINCT user_id) AS n_users,
       |  ${fixedSumSql("value")} AS value_total
       |FROM events
       |GROUP BY 1
       |ORDER BY hour_start""".stripMargin

  // ---------------------------------------------------------------------
  // q150 — streaming SLIDING (hopping) windows in the gate: 1-hour
  // windows every 30 minutes — each event lands in exactly two
  // overlapping windows, expanded in place by window() (a
  // streaming-safe Generate, no join), flushed by the sentinel batch.
  // Oracle: the batch expansion — each event contributes to the two
  // 30-min-aligned starts covering it. Streaming overlapping-window
  // state must reproduce batch truth.
  // ---------------------------------------------------------------------
  private def q150(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.slidingReplayFromParquet(
        s, s"$dir/events.parquet", "1 hour", "30 minutes")
      .select(col("window_start"), col("n_events"), col("value_e4_total"))
      .orderBy(col("window_start"))

  private val q150Sql =
    """WITH e AS (
      |  SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s,
      |    CAST(round(value * 10000) AS BIGINT) AS v
      |  FROM events),
      |w AS (
      |  SELECT unnest([(s // 1800) * 1800, (s // 1800) * 1800 - 1800])
      |      AS ws,
      |    v
      |  FROM e)
      |SELECT make_timestamp(ws * 1000000) AS window_start,
      |  count(*) AS n_events,
      |  CAST(sum(v) AS BIGINT) AS value_e4_total
      |FROM w
      |GROUP BY ws
      |ORDER BY window_start""".stripMargin

  // ---------------------------------------------------------------------
  // q95 — streaming tumbling windows in the gate: events replayed
  // through the watermarked window() aggregate (sentinel-flushed
  // AvailableNow lifecycle, the q53 machinery), values summed as e4
  // fixed-point longs. Oracle: the equivalent batch hourly aggregate
  // — streaming windowed state must reproduce batch truth.
  // ---------------------------------------------------------------------
  private def q95(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.tumblingReplayFromParquet(
        s, s"$dir/events.parquet", "1 hour")
      .select(col("window_start").as("hour_start"), col("n_events"),
        col("value_e4_total"))
      .orderBy(col("hour_start"))

  private val q95Sql =
    """SELECT date_trunc('hour', ts) AS hour_start,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
      |    AS value_e4_total
      |FROM events
      |GROUP BY 1
      |ORDER BY hour_start""".stripMargin

  // ---------------------------------------------------------------------
  // q50 — spatial point-in-polygon join (J3, the municipality
  // enrichment inferred from the reference's all_trips schema):
  // customers get synthetic coordinates (q17's derived-coordinate
  // parity), are classified against the literal demo polygon set by
  // unrolled ray-cast expressions, then aggregated per region. The
  // polygon side is dimension-sized → pure per-row scalar work, zero
  // extra shuffles beyond the final group-count.
  // ---------------------------------------------------------------------
  private def q50(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Spatial
    val c = t(s, dir, "customer")
    val lat = abs(col("c_acctbal")) % 90
    val lon = (col("c_custkey").cast("double") * 7.1) % 180
    c.select(col("c_acctbal"),
        Spatial.classifyExpr(Spatial.DemoMunicipalities, lat, lon).as("m"))
      .groupBy(col("m.municipality").as("municipality"),
        col("m.canton").as("canton"))
      .agg(count(lit(1)).as("n_points"),
        fixedSum(col("c_acctbal"), 2).as("total_bal"))
      .orderBy(col("municipality"), col("canton"))
  }

  private val q50Sql = {
    import graft.operators.Spatial
    val lat = "fmod(abs(c_acctbal), 90)"
    val lon = "fmod(CAST(c_custkey AS DOUBLE) * 7.1, 180)"
    def pick(f: graft.operators.Municipality => String) =
      Spatial.DemoMunicipalities.map(m =>
        s"WHEN ${Spatial.insideSql(m, lat, lon)} THEN '${f(m)}'")
        .mkString("CASE ", " ", " ELSE 'none' END")
    s"""SELECT ${pick(_.name)} AS municipality,
       |  ${pick(_.canton)} AS canton,
       |  count(*) AS n_points,
       |  ${fixedSumSql("c_acctbal")} AS total_bal
       |FROM customer
       |GROUP BY 1, 2
       |ORDER BY municipality, canton""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q64 — spatial enrichment at dimension scale: 100 synthetic
  // polygons through Spatial.enrichGrid (broadcast grid index, per-row
  // candidate ray-cast — the J3 shape that holds at ~2 100 real
  // municipalities, where q50's unrolled literal expressions stop
  // paying off). Oracle: the same 100 polygons unrolled into a
  // priority-ordered CASE chain — proving the grid index prunes
  // without changing a single assignment.
  // ---------------------------------------------------------------------
  private def q64(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Spatial
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"),
        (abs(col("c_acctbal")) % 90).as("lat"),
        ((col("c_custkey").cast("double") * 7.1) % 180).as("lon"))
    Spatial.enrichGrid(c, "lat", "lon", Spatial.SyntheticMunicipalities)
      .select(col("c_acctbal"),
        coalesce(col("municipality"), lit("none")).as("municipality"),
        coalesce(col("canton"), lit("none")).as("canton"))
      .groupBy(col("municipality"), col("canton"))
      .agg(count(lit(1)).as("n_points"),
        fixedSum(col("c_acctbal"), 2).as("total_bal"))
      .orderBy(col("municipality"), col("canton"))
  }

  private val q64Sql = {
    import graft.operators.Spatial
    val lat = "fmod(abs(c_acctbal), 90)"
    val lon = "fmod(CAST(c_custkey AS DOUBLE) * 7.1, 180)"
    def pick(f: graft.operators.Municipality => String) =
      Spatial.SyntheticMunicipalities.map(m =>
        s"WHEN ${Spatial.insideSql(m, lat, lon)} THEN '${f(m)}'")
        .mkString("CASE ", " ", " ELSE 'none' END")
    s"""SELECT ${pick(_.name)} AS municipality,
       |  ${pick(_.canton)} AS canton,
       |  count(*) AS n_points,
       |  ${fixedSumSql("c_acctbal")} AS total_bal
       |FROM customer
       |GROUP BY 1, 2
       |ORDER BY municipality, canton""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q70 — declarative data-quality profile (the reference's absent
  // utils/data_validation.py, evidenced by README.md:22): N rules,
  // ONE scan, map-side-combined conditional sums — the violation
  // report costs a single pass regardless of rule count.
  // ---------------------------------------------------------------------
  private def q70(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validate
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
      "HOUSEHOLD")
    Validate.profile(t(s, dir, "customer"), Seq(
        Validate.Rule("acctbal_range",
          col("c_acctbal").between(-1000.0, 10000.0)),
        Validate.Rule("key_positive", col("c_custkey") > 0),
        Validate.Rule("nation_range", col("c_nationkey").between(0, 24)),
        Validate.Rule("name_len", length(col("c_name")).between(1, 25)),
        Validate.Rule("segment_known",
          col("c_mktsegment").isInCollection(segs))))
      .orderBy(col("rule"))
  }

  private val q70Sql = {
    def row(name: String, pred: String) =
      s"""SELECT '$name' AS rule,
         |  CAST(sum(CASE WHEN NOT coalesce($pred, FALSE) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_violations,
         |  count(*) AS n_rows
         |FROM customer""".stripMargin
    Seq(
      row("acctbal_range", "c_acctbal BETWEEN -1000 AND 10000"),
      row("key_positive", "c_custkey > 0"),
      row("nation_range", "c_nationkey BETWEEN 0 AND 24"),
      row("name_len", "length(c_name) BETWEEN 1 AND 25"),
      row("segment_known", "c_mktsegment IN ('AUTOMOBILE', 'BUILDING', " +
        "'FURNITURE', 'MACHINERY', 'HOUSEHOLD')"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY rule")
  }

  // ---------------------------------------------------------------------
  // q147 — per-column Shannon entropy profile (feature selection /
  // constant-column and join-key-health detection) over four derived
  // events columns. The q68 exactness pattern: each distinct value's
  // c·ln(c) rounds to an e6 integer BEFORE the sum, so the
  // order-dependent float sum becomes exact; only the final H is one
  // IEEE expression over exact integers. One distinct-values-sized
  // aggregate per column — rows never shuffle.
  // ---------------------------------------------------------------------
  private def q147(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir).select(
      col("event_type"),
      col("user_id"),
      round(col("value") * 100).cast("long").as("value_e2"),
      date_trunc("day", col("ts_s")).as("day"))
    graft.operators.Validate.entropyProfile(e,
        Seq("event_type", "user_id", "value_e2", "day"))
      .orderBy(col("column_name"))
  }

  private val q147Sql = {
    def one(name: String, sqlExpr: String) =
      s"""SELECT '$name' AS column_name,
         |  CAST(sum(c) AS BIGINT) AS n_rows,
         |  count(*) AS n_distinct,
         |  CAST(sum(CAST(round(ln(CAST(c AS DOUBLE)) * c * 1000000)
         |    AS BIGINT)) AS BIGINT) AS sum_clnc_e6,
         |  CAST(round((ln(CAST(CAST(sum(c) AS BIGINT) AS DOUBLE))
         |      - CAST(CAST(sum(CAST(round(ln(CAST(c AS DOUBLE)) * c
         |          * 1000000) AS BIGINT)) AS BIGINT) AS DOUBLE)
         |        / CAST(1000000 AS DOUBLE)
         |        / CAST(CAST(sum(c) AS BIGINT) AS DOUBLE))
         |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS entropy_e6
         |FROM (SELECT v, count(*) AS c
         |      FROM (SELECT $sqlExpr AS v FROM events) GROUP BY v)""".stripMargin
    Seq(
      one("event_type", "event_type"),
      one("user_id", "user_id"),
      one("value_e2", "CAST(round(value * 100) AS BIGINT)"),
      one("day", "date_trunc('day', date_trunc('second', ts))"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  // ---------------------------------------------------------------------
  // q90 — numeric histogram profile: 20 fixed-width bins over
  // events.value, integer-exact binning (e4 fixed-point values,
  // integer bin width, integer division) so every engine bins
  // boundary values identically. One broadcast (min,max) scalar +
  // a 20-row groupBy — see Validate.histogram.
  // ---------------------------------------------------------------------
  private def q90(s: SparkSession, dir: String): DataFrame =
    graft.operators.Validate.histogram(
        t(s, dir, "events"), col("value"), bins = 20)
      .orderBy(col("bin_idx"))

  private val q90Sql =
    """WITH v AS (
      |  SELECT CAST(round(value * 10000) AS BIGINT) AS v FROM events),
      |w AS (
      |  SELECT min(v) AS lo, max(v) AS hi,
      |    (max(v) - min(v) + 20) // 20 AS w
      |  FROM v),
      |binned AS (
      |  SELECT v, (v - lo) // w AS bin_idx, lo, w FROM v, w)
      |SELECT CAST(bin_idx AS BIGINT) AS bin_idx,
      |  CAST(min(lo + bin_idx * w) AS BIGINT) AS lo_e4,
      |  count(*) AS n,
      |  CAST(min(v) AS BIGINT) AS min_e4,
      |  CAST(max(v) AS BIGINT) AS max_e4
      |FROM binned
      |GROUP BY bin_idx
      |ORDER BY bin_idx""".stripMargin

  // ---------------------------------------------------------------------
  // q55 — CSV round-trip through the ingest boundary (S7 sink +
  // enforced-schema PERMISSIVE source with a rejects channel): write
  // customer to CSV, read it back, aggregate. The oracle aggregates
  // the PARQUET directly, so the gate proves the text round-trip is
  // lossless — doubles serialize with round-trip-safe Java formatting
  // and parse back to the identical bits.
  // ---------------------------------------------------------------------
  private def q55(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Ingest
    val src = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_csv_roundtrip").toString
    Ingest.writeCsv(src, tmp)
    val (clean, rejects) = Ingest.readCsv(s, tmp,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c_mktsegment",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_acctbal",
          org.apache.spark.sql.types.DoubleType))))
    clean
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        fixedSum(col("c_acctbal"), 2).as("total_bal"),
        min(col("c_custkey")).as("min_key"),
        max(col("c_custkey")).as("max_key"))
      // fold the reject count in so a lossy parse can never pass —
      // as a 1-row broadcast aggregate INSIDE the returned plan (an
      // eager rejects.count() here would run an extra job at
      // plan-construction time and re-run under any retry)
      .crossJoin(broadcast(rejects.agg(count(lit(1)).as("n_rejects"))))
      .orderBy(col("c_mktsegment"))
  }

  // ---------------------------------------------------------------------
  // q151 — per-group MODE (most frequent value): counts per (group,
  // bucket), then one arg-max with frequency and value packed into a
  // single orderable BIGINT (larger count wins, ties break to the
  // smaller bucket) — deterministic on any engine, map-side
  // combinable, never a window sort over the counts.
  // ---------------------------------------------------------------------
  private def q151(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("event_type"),
      round(col("value")).cast("long").as("vb"))
    e.groupBy(col("event_type"), col("vb"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(
        max_by(col("vb"),
          col("n") * lit(10000000L) + (lit(1000000L) - col("vb")))
          .as("mode_bucket"),
        max(col("n")).as("n_mode"),
        count(lit(1)).as("n_buckets"))
      .orderBy(col("event_type"))
  }

  private val q151Sql =
    """WITH c AS (
      |  SELECT event_type, CAST(round(value) AS BIGINT) AS vb,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type,
      |  arg_max(vb, n * 10000000 + (1000000 - vb)) AS mode_bucket,
      |  max(n) AS n_mode,
      |  count(*) AS n_buckets
      |FROM c
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q152 — exact weighted median (lower median: smallest value whose
  // doubled running weight reaches the total): weights aggregate per
  // distinct value first, so the cumulative window runs over the
  // distinct-values table, never the rows — the grouped-median shape
  // that holds when values repeat heavily (and the winsorize
  // approx-bracket pattern is the fallback when they don't). All
  // integer comparisons — bit-exact by construction.
  // ---------------------------------------------------------------------
  private def q152(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("event_type"),
      round(col("value") * 10000).cast("long").as("v"),
      (col("event_id") % 7 + 1).as("w"))
    val agg = e.groupBy(col("event_type"), col("v"))
      .agg(sum(col("w")).as("wv"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = agg.groupBy(col("event_type"))
      .agg(sum(col("wv")).as("w_total"))
    agg.withColumn("cw", sum(col("wv")).over(win))
      .join(tot, Seq("event_type"))
      .filter(col("cw") * 2 >= col("w_total"))
      .groupBy(col("event_type"))
      .agg(min(col("v")).as("wmedian_e4"), min(col("w_total")).as("w_total"))
      .orderBy(col("event_type"))
  }

  private val q152Sql =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v,
      |    event_id % 7 + 1 AS w
      |  FROM events),
      |agg AS (
      |  SELECT event_type, v, CAST(sum(w) AS BIGINT) AS wv
      |  FROM e GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, v, wv,
      |    CAST(sum(wv) OVER (PARTITION BY event_type ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cw
      |  FROM agg),
      |tot AS (
      |  SELECT event_type, CAST(sum(wv) AS BIGINT) AS w_total
      |  FROM agg GROUP BY 1)
      |SELECT c.event_type, min(c.v) AS wmedian_e4, min(t.w_total) AS w_total
      |FROM cum c JOIN tot t ON c.event_type = t.event_type
      |WHERE c.cw * 2 >= t.w_total
      |GROUP BY c.event_type
      |ORDER BY c.event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q149 — ORC round-trip (the columnar interchange sibling of q55's
  // CSV and q98's JSONL gates): a lineitem projection written as ORC,
  // read back under an enforced schema, aggregated — the oracle
  // computes the same aggregate from the parquet source, so any
  // write/read fidelity loss (doubles, longs, nulls) breaks the hash.
  // ORC is binary: the round-trip must be bit-exact with no e-scaling
  // concessions at the format boundary.
  // ---------------------------------------------------------------------
  private def q149(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Ingest
    import org.apache.spark.sql.types._
    val src = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_orc_roundtrip").toString
    Ingest.writeOrc(src, tmp)
    Ingest.readOrc(s, tmp, StructType(Seq(
        StructField("l_orderkey", LongType),
        StructField("l_returnflag", StringType),
        StructField("l_quantity", DoubleType))))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        fixedSum(col("l_quantity"), 2).as("qty_total"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))
      .orderBy(col("l_returnflag"))
  }

  private val q149Sql =
    s"""SELECT l_returnflag, count(*) AS n,
       |  ${fixedSumSql("l_quantity")} AS qty_total,
       |  min(l_orderkey) AS min_key,
       |  max(l_orderkey) AS max_key
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q101 — order-independent table checksum (the migration audit op):
  // per-source (count, bit_xor, modular-sum) over a portable 60-bit
  // digest of each row's canonical serialization. The oracle computes
  // the identical triple in DuckDB — the exact cross-engine
  // comparison you run after any copy/merge/engine switch, and the
  // cheapest full-fidelity one: a single scan, map-side-combined
  // aggregates, one row per (source × task) on the wire.
  // ---------------------------------------------------------------------
  private def q101(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validate
    Validate.tableChecksum(
        t(s, dir, "documents"),
        concat_ws("|", col("doc_id"), col("lang"), col("source"),
          col("n_chars"), col("text")),
        Seq(col("source")))
      .orderBy(col("source"))
  }

  private val q101Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "concat_ws('|', doc_id, lang, source, n_chars, text)")
    s"""WITH hashed AS (
       |  SELECT source, $h AS h FROM documents)
       |SELECT source, count(*) AS n,
       |  bit_xor(h) AS xor_checksum,
       |  CAST(sum(h % 1000003) AS BIGINT) AS sum_mod
       |FROM hashed
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q113 — winsorization: global p01/p99 bounds from ONE exact-
  // percentile aggregate (rounded 4dp, the q37 cross-engine
  // discipline), broadcast back, per-row integer clip, per-type
  // exact totals. The feature-hygiene op: outliers clipped, sums
  // still bit-exact BIGINTs.
  // ---------------------------------------------------------------------
  private def q113(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validate
    Validate.winsorize(Tables.eventsSec(s, dir),
        round(col("value") * 10000).cast("long"), 0.01, 0.99)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("is_lo").cast("long")).as("n_lo"),
        sum(col("is_hi").cast("long")).as("n_hi"),
        sum(col("clipped")).as("clipped_e4_total"))
      .orderBy(col("event_type"))
  }

  private val q113Sql =
    """WITH v AS (
      |  SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v
      |  FROM events),
      |b AS (
      |  SELECT round(quantile_cont(v, 0.01), 4) AS lo,
      |    round(quantile_cont(v, 0.99), 4) AS hi
      |  FROM v)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      |  CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
      |  CAST(sum(CASE WHEN v < lo THEN CAST(ceil(lo) AS BIGINT)
      |                WHEN v > hi THEN CAST(floor(hi) AS BIGINT)
      |                ELSE v END) AS BIGINT) AS clipped_e4_total
      |FROM v, b
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q114 — referential-integrity audit: lineitem→orders under the
  // full parent (zero orphans — the clean case must read exactly
  // zero) and under a partial dimension load (orders keys %7=0
  // withheld — the late-arriving-dim case), one left-anti join each,
  // reduced to one audit row per relation.
  // ---------------------------------------------------------------------
  private def q114(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validate
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    Validate.refIntegrity("li_orders_full", li, col("l_orderkey"),
        o, col("o_orderkey"))
      .unionByName(Validate.refIntegrity("li_orders_partial",
        li, col("l_orderkey"),
        o.filter(col("o_orderkey") % 7 =!= 0), col("o_orderkey")))
      .orderBy(col("relation"))
  }

  private val q114Sql =
    """WITH full_o AS (
      |  SELECT 'li_orders_full' AS relation,
      |    count(*) AS n_child,
      |    count(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS n_orphans,
      |    COALESCE(min(CASE WHEN o.o_orderkey IS NULL THEN l_orderkey END),
      |      -1) AS min_orphan,
      |    COALESCE(max(CASE WHEN o.o_orderkey IS NULL THEN l_orderkey END),
      |      -1) AS max_orphan
      |  FROM lineitem l LEFT JOIN orders o ON l_orderkey = o_orderkey),
      |part_o AS (
      |  SELECT 'li_orders_partial' AS relation,
      |    count(*) AS n_child,
      |    count(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS n_orphans,
      |    COALESCE(min(CASE WHEN o.o_orderkey IS NULL THEN l_orderkey END),
      |      -1) AS min_orphan,
      |    COALESCE(max(CASE WHEN o.o_orderkey IS NULL THEN l_orderkey END),
      |      -1) AS max_orphan
      |  FROM lineitem l LEFT JOIN
      |    (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 != 0) o
      |    ON l_orderkey = o.o_orderkey)
      |SELECT * FROM full_o UNION ALL SELECT * FROM part_o
      |ORDER BY relation""".stripMargin

  // ---------------------------------------------------------------------
  // q109 — schema evolution at the scan: two parquet batches with
  // DIFFERENT schemas (v2 adds n_chars) read as one table via
  // mergeSchema; v1 rows surface the new column as NULL. This is the
  // drifting-producer reality of any long-lived lake — the gate
  // proves merged-read semantics (counts split by schema version,
  // null-filled sum) against the single-schema source of truth. At
  // scale you pin the merged schema in a catalog instead of paying
  // footer-merge on every read; the read semantics are identical.
  // ---------------------------------------------------------------------
  private def q109(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_schema_evo").toString
    graft.core.PlanStats.markBatchSinkIo()
    d.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(s"$tmp/batch=1")
    d.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/batch=2")
    s.read.option("mergeSchema", "true").parquet(tmp)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        count(col("n_chars")).as("n_v2"),
        sum(coalesce(col("n_chars"), lit(0L))).as("chars_v2"))
      .orderBy(col("lang"))
  }

  private val q109Sql =
    """SELECT lang, count(*) AS n,
      |  count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS n_v2,
      |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END)
      |    AS BIGINT) AS chars_v2
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q105 — exact distributed moments (profiling at 100 TB without a
  // float-drift or overflow cliff): per event type, (n, Σv, Σv²) with
  // the second moment as DECIMAL(38,0) — a BIGINT sum of squares
  // silently wraps around ~10⁶ mid-sized rows; 128-bit decimal is the
  // price of exactness, paid only in the accumulator. Emitted as a
  // string so both engines hash the identical digits; mean/variance
  // derive at the edge in one float step.
  // ---------------------------------------------------------------------
  private def q105(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validate
    Validate.momentsExact(t(s, dir, "events"), col("value"),
        Seq(col("event_type")))
      .select(col("event_type"), col("n"), col("sum_e4"),
        col("sumsq_e8").cast("string").as("sumsq_e8"))
      .orderBy(col("event_type"))
  }

  private val q105Sql =
    """WITH v AS (
      |  SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(v) AS BIGINT) AS sum_e4,
      |  CAST(sum(CAST(v AS HUGEINT) * v) AS VARCHAR) AS sumsq_e8
      |FROM v
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q98 — JSON-lines round-trip through the ingest boundary (the
  // interchange format every crawl/annotation pipeline speaks): write
  // documents to JSONL, read back under an ENFORCED schema (no
  // inference pass — at scale schema inference is a full extra scan)
  // with the PERMISSIVE rejects channel, aggregate. The oracle
  // aggregates the parquet directly, so the gate proves JSON string
  // escaping and integer serialization round-trip losslessly; the
  // rejects count rides inside the plan as a 1-row broadcast.
  // ---------------------------------------------------------------------
  private def q98(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Ingest
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val src = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_jsonl_roundtrip").toString
    Ingest.writeJson(src, tmp)
    val (clean, rejects) = Ingest.readJson(s, tmp, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("text", StringType))))
    clean
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("text")).cast("long")).as("text_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .crossJoin(broadcast(rejects.agg(count(lit(1)).as("n_rejects"))))
      .orderBy(col("lang"), col("source"))
  }

  private val q98Sql =
    """SELECT lang, source, count(*) AS n,
      |  CAST(sum(length(text)) AS BIGINT) AS text_chars,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
      |  CAST(0 AS BIGINT) AS n_rejects
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  private val q55Sql =
    s"""SELECT c_mktsegment, count(*) AS n,
       |  ${fixedSumSql("c_acctbal")} AS total_bal,
       |  min(c_custkey) AS min_key, max(c_custkey) AS max_key,
       |  CAST(0 AS BIGINT) AS n_rejects
       |FROM customer
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_haversine" -> (q17 _),
    "q18_json_extract" -> (q18 _),
    "q19_string_funcs" -> (q19 _),
    "q20_date_agg" -> (q20 _),
    "q33_cube" -> (q33 _),
    "q34_tumbling_window" -> (q34 _),
    "q50_spatial_join" -> (q50 _),
    "q55_csv_roundtrip" -> (q55 _),
    "q98_jsonl_roundtrip" -> (q98 _),
    "q101_table_checksum" -> (q101 _),
    "q105_moments_exact" -> (q105 _),
    "q109_schema_evolution" -> (q109 _),
    "q113_winsorize" -> (q113 _),
    "q114_ref_integrity" -> (q114 _),
    "q64_spatial_grid" -> (q64 _),
    "q70_data_quality" -> (q70 _),
    "q147_entropy" -> (q147 _),
    "q149_orc_roundtrip" -> (q149 _),
    "q150_stream_sliding" -> (q150 _),
    "q151_group_mode" -> (q151 _),
    "q152_weighted_median" -> (q152 _),
    "q90_histogram" -> (q90 _),
    "q95_stream_tumbling" -> (q95 _))

  val oracle: Map[String, String] = Map(
    "q17_haversine" -> q17Sql,
    "q18_json_extract" -> q18Sql,
    "q19_string_funcs" -> q19Sql,
    "q20_date_agg" -> q20Sql,
    "q33_cube" -> q33Sql,
    "q34_tumbling_window" -> q34Sql,
    "q50_spatial_join" -> q50Sql,
    "q55_csv_roundtrip" -> q55Sql,
    "q98_jsonl_roundtrip" -> q98Sql,
    "q101_table_checksum" -> q101Sql,
    "q105_moments_exact" -> q105Sql,
    "q109_schema_evolution" -> q109Sql,
    "q113_winsorize" -> q113Sql,
    "q114_ref_integrity" -> q114Sql,
    "q64_spatial_grid" -> q64Sql,
    "q70_data_quality" -> q70Sql,
    "q147_entropy" -> q147Sql,
    "q149_orc_roundtrip" -> q149Sql,
    "q150_stream_sliding" -> q150Sql,
    "q151_group_mode" -> q151Sql,
    "q152_weighted_median" -> q152Sql,
    "q90_histogram" -> q90Sql,
    "q95_stream_tumbling" -> q95Sql)
}
