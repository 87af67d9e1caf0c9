package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.PlanStats.Pinned
import graft.functions.{PortableHash, Text}

/** Safety/compliance tier (session 10): the scrubbing and audit
  * passes a training-data pipeline runs before anything ships — PII
  * scan + redaction with a zero-residual proof, cross-document
  * memorization risk (the duplicated-13-gram share that predicts
  * verbatim regurgitation), and rolling active-user reach (the
  * 7-day sliding DISTINCT that naive windowing cannot express
  * scale-safely). No reference analogue (the reference delegates
  * all queries to PostgreSQL, cf. `lambda/trips_lambda.py`); these
  * are the operations the 100 TB deployment runs on every corpus
  * refresh.
  *
  * Cross-engine discipline: counts are exact integers; the one
  * ratio per query is a single rounded division at the end. Regexes
  * are restricted to the class/quantifier subset Java regex and
  * RE2 interpret identically (no backrefs, no lookaround).
  */
object Safety {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // shared regex subset — identical semantics in Java regex (Spark)
  // and RE2 (DuckDB): literal classes, bounded quantifiers only
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "555-0[0-9]{3}"

  // ---------------------------------------------------------------------
  // q328 — PII scan + redaction round-trip audit. The corpus is
  // synthetic (no real PII), so the query plants deterministic PII
  // first — ~5% of docs get an email, ~5% a phone number, keyed by
  // the portable hash so both engines inject identically — then runs
  // the production pass: scan (regexp hit counts per type), redact
  // (global regexp_replace to typed placeholders), and RE-SCAN the
  // redacted text, proving residual_hits = 0 per source. The
  // re-scan-zero invariant is the audit a compliance gate actually
  // needs: not "we replaced something" but "nothing matching the
  // pattern survives". Per-row scalar work only — zero joins, one
  // map-side-combinable aggregate to the 20-source grain; a 100 TB
  // scrub is one scan.
  // ---------------------------------------------------------------------
  private def q328(s: SparkSession, dir: String): DataFrame = {
    val variant = pmod(
      PortableHash.hash60(concat(lit("pii:"), col("doc_id"))), lit(20L))
    val injected = when(variant === 0L,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com now")))
      .when(variant === 1L,
        concat(col("text"), lit(" call 555-0"),
          lpad(pmod(col("doc_id"), lit(1000L)).cast("string"), 3, "0"),
          lit(" today")))
      .otherwise(col("text"))
    val redacted = regexp_replace(
      regexp_replace(col("t"), EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]")
    t(s, dir, "documents")
      .select(col("source"), injected.as("t"))
      .select(col("source"), col("t"),
        regexp_count(col("t"), lit(EmailRe)).as("email_hits"),
        regexp_count(col("t"), lit(PhoneRe)).as("phone_hits"),
        redacted.as("r"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("email_hits") + col("phone_hits") > 0, 1L)
          .otherwise(0L)).as("docs_with_pii"),
        sum(col("email_hits")).cast("long").as("email_hits"),
        sum(col("phone_hits")).cast("long").as("phone_hits"),
        sum(regexp_count(col("r"), lit(EmailRe)) +
          regexp_count(col("r"), lit(PhoneRe))).cast("long")
          .as("residual_hits"),
        sum(length(col("t")) - length(col("r"))).cast("long")
          .as("redacted_char_delta"))
      .orderBy(col("source"))
  }

  private val q328Sql = {
    val h = PortableHash.hash60DuckSql("'pii:' || CAST(doc_id AS VARCHAR)")
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "555-0[0-9]{3}"
    s"""WITH inj AS (
       |  SELECT source,
       |    CASE $h % 20
       |      WHEN 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
       |                  || '@example.com now'
       |      WHEN 1 THEN text || ' call 555-0'
       |                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
       |                  || ' today'
       |      ELSE text END AS t
       |  FROM documents),
       |scanned AS (
       |  SELECT source, t,
       |    len(regexp_extract_all(t, '$email')) AS email_hits,
       |    len(regexp_extract_all(t, '$phone')) AS phone_hits,
       |    regexp_replace(regexp_replace(t, '$email', '[EMAIL]', 'g'),
       |      '$phone', '[PHONE]', 'g') AS r
       |  FROM inj)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN email_hits + phone_hits > 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS docs_with_pii,
       |  CAST(sum(email_hits) AS BIGINT) AS email_hits,
       |  CAST(sum(phone_hits) AS BIGINT) AS phone_hits,
       |  CAST(sum(len(regexp_extract_all(r, '$email'))
       |         + len(regexp_extract_all(r, '$phone'))) AS BIGINT)
       |    AS residual_hits,
       |  CAST(sum(length(t) - length(r)) AS BIGINT) AS redacted_char_delta
       |FROM scanned
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q329 — cross-document memorization risk: for each document, the
  // share of its distinct 13-grams that also occur in at least one
  // OTHER document (the standard verbatim-regurgitation predictor:
  // long n-grams shared across documents are what a model memorizes).
  // Shape is the honest inverted index — explode distinct 13-grams,
  // one map-side-combinable df aggregate on the gram, keep only the
  // df>=2 gram set, join it back to the gram table, re-aggregate to
  // document then source grain. Both shuffles hash-partition on the
  // gram string; the df aggregate is combine-enabled so hot grams
  // (boilerplate) cost map-side partials, not a hot reducer. Joining
  // on the gram STRING (not a 60-bit hash) keeps the gate
  // collision-exact; a production deployment at 10^11 grams would
  // swap in a 128-bit fingerprint, an isomorphic plan. The gram
  // table feeds two branches, so it is pinned once (pitfall: a
  // DataFrame feeding two branches re-runs the 13-gram construction
  // per branch).
  // ---------------------------------------------------------------------
  private def q329(s: SparkSession, dir: String): DataFrame = {
    val grams = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(array_distinct(Text.shingles(col("text"), 13))).as("g"))
      .pin() // feeds the df aggregate AND the join-back
    val dupSet = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select(col("g"), lit(1L).as("is_dup"))
    val perDoc = grams
      .join(dupSet, Seq("g"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_g"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_g")).cast("long").as("n_grams"),
        sum(col("n_dup")).cast("long").as("n_dup_grams"),
        sum(when(col("n_dup") * 2 > col("n_g"), 1L).otherwise(0L))
          .as("high_risk_docs"),
        round(sum(col("n_dup")).cast("double") /
          sum(col("n_g")).cast("double") * 1000000.0).cast("long")
          .as("dup_share_e6"))
      .orderBy(col("source"))
  }

  private val q329Sql = {
    val gram = (1 to 13).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS w
       |  FROM documents),
       |grams AS (
       |  SELECT DISTINCT doc_id, source,
       |    unnest(list_transform(range(len(w) - 12), i -> $gram)) AS g
       |  FROM toks WHERE len(w) >= 13),
       |dups AS (
       |  SELECT g, CAST(1 AS BIGINT) AS is_dup
       |  FROM grams GROUP BY g HAVING count(*) >= 2),
       |per_doc AS (
       |  SELECT doc_id, source, count(*) AS n_g,
       |    sum(coalesce(is_dup, 0)) AS n_dup
       |  FROM grams LEFT JOIN dups USING (g)
       |  GROUP BY doc_id, source)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_g) AS BIGINT) AS n_grams,
       |  CAST(sum(n_dup) AS BIGINT) AS n_dup_grams,
       |  CAST(sum(CASE WHEN n_dup * 2 > n_g THEN 1 ELSE 0 END) AS BIGINT)
       |    AS high_risk_docs,
       |  CAST(round(sum(n_dup) * 1000000.0 / sum(n_g)) AS BIGINT)
       |    AS dup_share_e6
       |FROM per_doc
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q330 — rolling 7-day active users per day (sliding DISTINCT).
  // A windowed count-distinct cannot be expressed as a running
  // aggregate (distinct does not decompose), and the naive per-day
  // self-join re-scans the fact table once per window. The
  // scale-safe shape: collapse events to the (day, user) grain once
  // (map-side-combinable), then each active day CONTRIBUTES itself
  // to the 7 window-end days it falls in (a bounded explode of
  // sequence(0,6) — ×7 on the already-collapsed grain, not on raw
  // events), and one distinct aggregate per window-end day closes
  // it. Report days are restricted to observed activity days by the
  // inner join with the 1-day aggregate. The (day, user) grain is
  // pinned: it feeds both the 7-day expansion and the 1-day
  // baseline, and at 100 TB it is the one table worth materializing
  // (users × days, orders of magnitude under raw events).
  // ---------------------------------------------------------------------
  private def q330(s: SparkSession, dir: String): DataFrame = {
    val du = t(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .pin() // feeds the window expansion AND the per-day baseline
    val act7 = du
      .select(explode(sequence(lit(0), lit(6))).as("off"),
        col("day"), col("user_id"))
      .select(date_add(col("day"), col("off")).as("rday"), col("user_id"))
      .groupBy(col("rday"))
      .agg(countDistinct(col("user_id")).as("n_active_7d"))
    val act1 = du.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n_active_1d"))
    act1.join(act7, act1("day") === act7("rday"))
      .select(col("day"), col("n_active_1d"), col("n_active_7d"),
        round(col("n_active_1d").cast("double") /
          col("n_active_7d").cast("double") * 1000000.0).cast("long")
          .as("stickiness_e6"))
      .orderBy(col("day"))
  }

  private val q330Sql =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |a7 AS (
      |  SELECT d.day AS rday, count(DISTINCT du.user_id) AS n_active_7d
      |  FROM (SELECT DISTINCT day FROM du) d
      |  JOIN du ON du.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY d.day),
      |a1 AS (
      |  SELECT day, count(DISTINCT user_id) AS n_active_1d
      |  FROM du GROUP BY day)
      |SELECT a1.day AS day, n_active_1d, n_active_7d,
      |  CAST(round(n_active_1d * 1000000.0 / n_active_7d) AS BIGINT)
      |    AS stickiness_e6
      |FROM a1 JOIN a7 ON a1.day = a7.rday
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // q334 — deletion-impact audit (the right-to-erasure planning
  // query): a deterministic 2% deletion cohort (portable hash of the
  // subject key, distinct salt per key domain) is sized against
  // every fact table BEFORE any rewrite — rows to delete, share, and
  // how many physical partitions (day for events, month for orders
  // and lineitem) the rewrite must touch. Events and orders are one
  // conditional aggregate each; lineitem carries no customer key, so
  // its cohort membership rides the co-partitioned orderkey join to
  // orders — the exact join the deletion rewrite itself would run.
  // Output is 3 rows; at 100 TB the cost is one scan per fact table
  // plus the lineitem–orders shuffle the rewrite pays anyway.
  // ---------------------------------------------------------------------
  private def q334(s: SparkSession, dir: String): DataFrame = {
    def cohort(prefix: String, key: Column): Column =
      pmod(PortableHash.hash60(concat(lit(prefix), key.cast("string"))),
        lit(50L)) === 0L
    def audit(df: DataFrame, table: String, del: Column,
              part: Column): DataFrame =
      df.select(del.as("del"), part.as("part"))
        .groupBy(col("part"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("del"), 1L).otherwise(0L)).as("n_del"))
        .agg(sum(col("n")).cast("long").as("rows_total"),
          sum(col("n_del")).cast("long").as("rows_deleted"),
          count(lit(1)).as("parts_total"),
          sum(when(col("n_del") > 0, 1L).otherwise(0L)).as("parts_touched"))
        .select(lit(table).as("table_name"), col("rows_total"),
          col("rows_deleted"),
          round(col("rows_deleted").cast("double") * 1000000.0 /
            col("rows_total").cast("double")).cast("long")
            .as("del_share_e6"),
          col("parts_total"), col("parts_touched"))
    val ev = audit(t(s, dir, "events"), "events",
      cohort("delu:", col("user_id")), to_date(col("ts")))
    val ord = audit(t(s, dir, "orders"), "orders",
      cohort("delc:", col("o_custkey")),
      date_format(col("o_orderdate"), "yyyy-MM"))
    val li = audit(
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
          Seq("l_orderkey")),
      "lineitem", cohort("delc:", col("o_custkey")),
      date_format(col("l_shipdate"), "yyyy-MM"))
    ev.unionByName(ord).unionByName(li).orderBy(col("table_name"))
  }

  private val q334Sql = {
    def h(prefix: String, key: String) =
      PortableHash.hash60DuckSql(s"'$prefix' || CAST($key AS VARCHAR)")
    def one(src: String, table: String, del: String, part: String) =
      s"""SELECT '$table' AS table_name,
         |  CAST(sum(n) AS BIGINT) AS rows_total,
         |  CAST(sum(n_del) AS BIGINT) AS rows_deleted,
         |  CAST(round(sum(n_del) * 1000000.0 / sum(n)) AS BIGINT)
         |    AS del_share_e6,
         |  count(*) AS parts_total,
         |  CAST(sum(CASE WHEN n_del > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS parts_touched
         |FROM (
         |  SELECT $part AS part, count(*) AS n,
         |    sum(CASE WHEN $del THEN 1 ELSE 0 END) AS n_del
         |  FROM $src GROUP BY 1) p""".stripMargin
    val ev = one("events", "events",
      s"${h("delu:", "user_id")} % 50 = 0", "CAST(ts AS DATE)")
    val ord = one("orders", "orders",
      s"${h("delc:", "o_custkey")} % 50 = 0",
      "strftime(o_orderdate, '%Y-%m')")
    val li = one(
      "(SELECT l.l_shipdate, o.o_custkey FROM lineitem l " +
        "JOIN orders o ON l.l_orderkey = o.o_orderkey) j",
      "lineitem", s"${h("delc:", "o_custkey")} % 50 = 0",
      "strftime(l_shipdate, '%Y-%m')")
    s"""$ev
       |UNION ALL
       |$ord
       |UNION ALL
       |$li
       |ORDER BY table_name""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q328_pii_redaction" -> (q328 _),
    "q329_memorization_13gram" -> (q329 _),
    "q330_rolling_active_users" -> (q330 _),
    "q334_deletion_impact" -> (q334 _))

  val oracle: Map[String, String] = Map(
    "q328_pii_redaction" -> q328Sql,
    "q329_memorization_13gram" -> q329Sql,
    "q330_rolling_active_users" -> q330Sql,
    "q334_deletion_impact" -> q334Sql)
}
