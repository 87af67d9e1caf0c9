package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Vectors
import graft.operators.Dedup
import Exact._
import graft.core.PlanStats.Pinned

/** Advanced analytics surface: the SQL frontend, corrected-mode
  * endpoint aggregates, exact percentiles, grouping sets, IVF-shaped
  * ANN, embedding near-dup, and approximate distinct counting.
  */
object Advanced {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.eventsSec(s, dir)

  // ---------------------------------------------------------------------
  // q35 — the SQL frontend: one dialect-neutral ANSI string executed
  // verbatim by BOTH Spark (spark.sql over registered views) and the
  // DuckDB oracle. TPC-H Q3 shape (segment revenue top-k).
  // ---------------------------------------------------------------------
  // Output types are harness-proof on purpose: integer ten-thousandths
  // of a dollar (no float division — DuckDB's `x / 10000.0` is DECIMAL
  // division, Spark's is DOUBLE) and the date as a 'YYYY-MM-DD' string.
  private val q35Sql =
    """SELECT o_orderkey,
      |  CAST(CAST(o_orderdate AS DATE) AS STRING) AS order_date,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
      |    AS revenue_e4
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue_e4 DESC, o_orderkey
      |LIMIT 20""".stripMargin

  private def q35(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.registerTestTables(s, dir)
    s.sql(q35Sql)
  }

  // ---------------------------------------------------------------------
  // q36 — corrected-mode endpoints (SURVEY §2.4 A1 quirk, fixed): the
  // value AT the first/last event via min_by/max_by over a unique
  // ordering key, instead of the reference's numeric MIN/MAX.
  // ---------------------------------------------------------------------
  private def q36(s: SparkSession, dir: String): DataFrame = {
    val ord = col("ts_s").cast("long") * 1000000L + col("event_id")
    ev(s, dir)
      .groupBy(col("user_id"))
      .agg(
        min_by(col("value"), ord).as("first_value"),
        max_by(col("value"), ord).as("last_value"),
        min_by(col("event_type"), ord).as("first_type"),
        min(col("ts_s")).as("first_ts"),
        max(col("ts_s")).as("last_ts"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  private val q36Sql = {
    val ord = s"${epochSSql("ts")} * 1000000 + event_id"
    s"""SELECT user_id,
       |  arg_min(value, $ord) AS first_value,
       |  arg_max(value, $ord) AS last_value,
       |  arg_min(event_type, $ord) AS first_type,
       |  min(${secSql("ts")}) AS first_ts,
       |  max(${secSql("ts")}) AS last_ts,
       |  count(*) AS n_events
       |FROM events
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q37 — exact interpolated percentiles (Spark `percentile` and
  // DuckDB `quantile_cont` share the linear-interpolation definition;
  // rounded to 4 decimals to absorb last-ulp interpolation ordering).
  // ---------------------------------------------------------------------
  private def q37(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
      .orderBy(col("o_orderpriority"))

  private val q37Sql =
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
      |  round(quantile_cont(o_totalprice, 0.95), 4) AS p95
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q38 — grouping sets (explicit set list, beyond rollup/cube).
  // ---------------------------------------------------------------------
  private val q38Sql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus ASC NULLS FIRST,
      |         o_orderpriority ASC NULLS FIRST, n""".stripMargin

  private def q38(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.registerTestTables(s, dir)
    s.sql(q38Sql)
  }

  // ---------------------------------------------------------------------
  // q39 — IVF-shaped ANN: 8 fixed "centroids" (vec_id < 8 — standing
  // in for trained k-means cells), corpus assigned to nearest cell by
  // L2, queries probe their own cell, cosine top-3 within it. The
  // operator shape of a real IVF index: cell assignment is one
  // broadcast join + argmin, probing touches |corpus|/cells vectors.
  // ---------------------------------------------------------------------
  private def q39(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    // nearest cell per vector (rounded distance + id tiebreak)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("d2"), col("cent_id"))
    val assigned = e.join(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        round(Vectors.l2(col("embedding"), col("cv")), 4).as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    val queries = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cell"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    assigned.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("cell"),
        round(Vectors.cosineNative(col("qv"), col("embedding")), 4).as("cos"))
      .withColumn("rank", row_number().over(wq).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy(col("query_id"), col("rank"))
  }

  private val q39Sql = {
    val l2 = "round(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])" +
      " - 2 * list_dot_product(e.embedding::DOUBLE[], c.cv::DOUBLE[])" +
      " + list_dot_product(c.cv::DOUBLE[], c.cv::DOUBLE[])), 4)"
    val cos = Vectors.cosineSql("q.qv", "a.embedding")
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cv
       |               FROM embeddings WHERE vec_id < 8),
       |dists AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id, $l2 AS d2
       |  FROM embeddings e, cents c),
       |assigned AS (
       |  SELECT vec_id, embedding, cent_id AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d2, cent_id) AS rn FROM dists) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, cell
       |      FROM assigned WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.query_id, a.vec_id, a.cell, round($cos, 4) AS cos
       |  FROM q JOIN assigned a USING (cell)
       |  WHERE a.vec_id != q.query_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |  ORDER BY cos DESC, vec_id ASC) AS rank FROM scored)
       |SELECT query_id, vec_id, cell, cos, rank FROM ranked
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q40 — embedding-cosine similar pairs via sign-LSH buckets
  // (SURVEY §2.12 "embedding-cosine near-dup"; threshold tuned to the
  // synthetic corpus where no true near-dups exist).
  // ---------------------------------------------------------------------
  private def q40(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDup(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.0)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .filter(col("cos") >= 0.3)
      .orderBy(col("id_a"), col("id_b"))

  private val q40Sql = {
    val bucket = Vectors.signBucketSql("embedding")
    val cos = Vectors.cosineSql("a.embedding", "b.embedding")
    s"""WITH e AS (SELECT vec_id, embedding, $bucket AS bucket
       |           FROM embeddings)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($cos, 4) AS cos
       |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE round($cos, 4) >= 0.3
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q69 — near-dup clustering: connected components over the q40
  // embedding pair list (pairs → transitive closure → one canonical
  // min-id representative per duplicate group, the step that turns
  // pairwise dedup output into an actual keep/drop decision). Spark
  // side is iterative min-label propagation; the oracle computes the
  // same closure with a recursive CTE — engine-independent truth for
  // an iterative distributed algorithm.
  // ---------------------------------------------------------------------
  private def q69(s: SparkSession, dir: String): DataFrame = {
    // pair list pinned (r12): the CC operator derives its input twice
    // (edge pin + node pin) — unpinned, each derivation re-ran the
    // bucket self-join + cosine chain (the q331 posture)
    val pairs = Dedup.embeddingNearDup(
        t(s, dir, "embeddings"), "vec_id", "embedding", threshold = 0.0)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .filter(col("cos") >= 0.3)
      .select(col("id_a"), col("id_b"))
      .pin()
    val cc = Dedup.connectedComponents(pairs)
    cc.join(cc.groupBy(col("cluster"))
        .agg(count(lit(1)).as("cluster_size")), Seq("cluster"))
      .select(col("id").as("vec_id"), col("cluster"), col("cluster_size"))
      .orderBy(col("vec_id"))
  }

  // ---------------------------------------------------------------------
  // q143 — the same near-dup clustering through the large-star /
  // small-star formulation (Kiveris et al.): O(log n) rounds
  // regardless of component diameter, vs the naive loop's
  // diameter-many. Identical output contract, same recursive-CTE
  // oracle as q69 — the gate proves the scale-path algorithm agrees
  // bit-for-bit with both the naive loop and the engine-independent
  // closure.
  // ---------------------------------------------------------------------
  private def q143(s: SparkSession, dir: String): DataFrame = {
    // pair list pinned (r12) — the q69 rationale
    val pairs = Dedup.embeddingNearDup(
        t(s, dir, "embeddings"), "vec_id", "embedding", threshold = 0.0)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .filter(col("cos") >= 0.3)
      .select(col("id_a"), col("id_b"))
      .pin()
    val cc = Dedup.connectedComponentsStar(pairs)
    cc.join(cc.groupBy(col("cluster"))
        .agg(count(lit(1)).as("cluster_size")), Seq("cluster"))
      .select(col("id").as("vec_id"), col("cluster"), col("cluster_size"))
      .orderBy(col("vec_id"))
  }

  private val q69Sql =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT id_a, id_b FROM (
       |$q40Sql
       |  ) q),
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
       |comp AS (
       |  SELECT src AS vec_id, least(src, min(dst)) AS cluster
       |  FROM reach GROUP BY src),
       |sizes AS (
       |  SELECT cluster, count(*) AS cluster_size FROM comp GROUP BY cluster)
       |SELECT vec_id, cluster, cluster_size
       |FROM comp JOIN sizes USING (cluster)
       |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // q331 — leakage-safe train/val/test assignment: near-duplicate
  // CLUSTERS (not items) are the unit of split assignment, so two
  // near-copies can never straddle train and test — the fix operator
  // for the leakage q188 audits. Pairs → large-star/small-star CC →
  // every item (singletons included, cluster = own id) → split by
  // portable hash OF THE CLUSTER id, 80/10/10. The audit column is
  // the proof: cross_split_pairs re-joins the near-dup pair list to
  // the assignment on BOTH endpoints and counts pairs whose splits
  // differ — 0 by construction, and the gate pins it. Pair list is
  // pinned (it feeds the CC loop and the leak audit); the final
  // readout is 3 rows.
  // ---------------------------------------------------------------------
  private def q331(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash
    val pairs = Dedup.embeddingNearDup(
        t(s, dir, "embeddings"), "vec_id", "embedding", threshold = 0.0)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .filter(col("cos") >= 0.3)
      .select(col("id_a"), col("id_b"))
      .pin() // feeds the CC loop AND the cross-split leak audit
    val cc = Dedup.connectedComponentsStar(pairs)
      .withColumnRenamed("id", "vec_id")
    val h = pmod(PortableHash.hash60(
      concat(lit("csplit:"), col("cluster").cast("string"))), lit(100L))
    val assigned = t(s, dir, "embeddings").select(col("vec_id"))
      .join(cc, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster"), col("vec_id")).as("cluster"))
      .withColumn("split",
        when(h < 80, "train").when(h < 90, "val").otherwise("test"))
      .pin() // feeds the 3-row rollup AND both sides of the leak join
    val leak = pairs
      .join(assigned.select(col("vec_id").as("id_a"),
        col("split").as("split_a")), Seq("id_a"))
      .join(assigned.select(col("vec_id").as("id_b"),
        col("split").as("split_b")), Seq("id_b"))
      .agg(coalesce(sum(when(col("split_a") =!= col("split_b"), 1L)
        .otherwise(0L)), lit(0L)).cast("long").as("cross_split_pairs"))
    assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("cluster")).as("n_clusters"))
      .crossJoin(broadcast(leak))
      .orderBy(col("split"))
  }

  private val q331Sql = {
    import graft.functions.PortableHash
    val h = PortableHash.hash60DuckSql("'csplit:' || CAST(cluster AS VARCHAR)")
    s"""WITH RECURSIVE pairs AS MATERIALIZED (
       |  SELECT id_a, id_b FROM (
       |$q40Sql
       |  ) q),
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
       |comp AS (
       |  SELECT src AS vec_id, least(src, min(dst)) AS cluster
       |  FROM reach GROUP BY src),
       |clustered AS (
       |  SELECT e.vec_id, coalesce(c.cluster, e.vec_id) AS cluster
       |  FROM (SELECT vec_id FROM embeddings) e
       |  LEFT JOIN comp c USING (vec_id)),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, cluster,
       |    CASE WHEN $h % 100 < 80 THEN 'train'
       |         WHEN $h % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM clustered),
       |leak AS (
       |  SELECT CAST(coalesce(sum(CASE WHEN a.split <> b.split
       |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS cross_split_pairs
       |  FROM pairs p
       |  JOIN assigned a ON p.id_a = a.vec_id
       |  JOIN assigned b ON p.id_b = b.vec_id)
       |SELECT split, count(*) AS n_items,
       |  count(DISTINCT cluster) AS n_clusters, cross_split_pairs
       |FROM assigned CROSS JOIN leak
       |GROUP BY split, cross_split_pairs
       |ORDER BY split""".stripMargin
  }
  // differ from any oracle, so the oracle checks the *semantic
  // contract* instead: exact counts bit-match, and the sketch
  // estimates land within the advertised error bound (flag columns
  // the oracle expects to be constant 1). HLL is deterministic for a
  // fixed input, so this is a stable gate, not a flaky one.
  // ---------------------------------------------------------------------
  private def q41(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // exact and approx distincts in SEPARATE aggregations, joined on
    // the 3-row group key: one combined agg makes Catalyst expand the
    // scan 4-ways (one replica per distinct-expression) — measured 4×
    // slower than two scans + a broadcast join of 3-row results
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"))
    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("ao"),
        approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
    exact.join(approx, "l_returnflag")
      .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        when(abs(col("ao") - col("exact_orders")) <=
          col("exact_orders") * 0.15, 1L).otherwise(0L).cast("long")
          .as("approx_orders_ok"),
        when(abs(col("ap") - col("exact_parts")) <=
          col("exact_parts") * 0.06, 1L).otherwise(0L).cast("long")
          .as("approx_parts_ok"))
      .orderBy(col("l_returnflag"))
  }

  private val q41Sql =
    """SELECT l_returnflag,
      |  count(DISTINCT l_orderkey) AS exact_orders,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  CAST(1 AS BIGINT) AS approx_orders_ok,
      |  CAST(1 AS BIGINT) AS approx_parts_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q116 — approximate-percentile sketch gated on its CONTRACT (the
  // q41 discipline for quantiles): percentile_approx(accuracy=100)
  // guarantees rank error ≤ n/100; the query computes the sketch
  // value's true rank with a second pass and flags whether it lands
  // within 2× the advertised bound. Exact medians hash-compare
  // against DuckDB; the sketch is deterministic for fixed input, so
  // the flag is stable. At 100 TB the sketch is the only affordable
  // quantile — this gate is what makes it trustworthy.
  // ---------------------------------------------------------------------
  private def q116(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type"),
        round(col("value") * 10000).cast("long").as("v"))
    val stats = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(v, 0.5)"), 4).as("p50_exact"),
        percentile_approx(col("v"), lit(0.5), lit(100)).as("__pa"))
    e.join(broadcast(stats), "event_type")
      .groupBy(col("event_type"))
      .agg(min(col("n")).as("n"), min(col("p50_exact")).as("p50_exact"),
        // true rank of the sketch's answer, counted distributively
        sum(when(col("v") <= col("__pa"), 1L).otherwise(0L)).as("__rank"))
      .select(col("event_type"), col("n"), col("p50_exact"),
        when(abs(col("__rank") - col("n") * 0.5) <= col("n") * 0.02, 1L)
          .otherwise(0L).as("p50_rank_ok"))
      .orderBy(col("event_type"))
  }

  private val q116Sql =
    """WITH v AS (
      |  SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      |  round(quantile_cont(v, 0.5), 4) AS p50_exact,
      |  CAST(1 AS BIGINT) AS p50_rank_ok
      |FROM v
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q42 — salted two-phase aggregation over the (skewed) events user
  // activity. Results are identical to a plain groupBy — which is
  // exactly what the plain-SQL oracle checks; the salting only changes
  // the physical distribution of work.
  // ---------------------------------------------------------------------
  private def q42(s: SparkSession, dir: String): DataFrame =
    graft.operators.Salt.aggregate(
        ev(s, dir).select(col("user_id"), col("value"),
          round(col("value") * 100).cast("long").as("cents")),
        Seq("user_id"), buckets = 8,
        sums = Seq("cents"), mins = Seq("value"), maxs = Seq("value"))
      .select(col("user_id"),
        (col("sum_cents") / 100.0).as("sum_value"), col("cnt"),
        col("min_value"), col("max_value"))
      .orderBy(col("user_id"))

  private val q42Sql =
    s"""SELECT user_id, ${fixedSumSql("value")} AS sum_value,
       |  count(*) AS cnt, min(value) AS min_value, max(value) AS max_value
       |FROM events
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q43 — pivot: event types to columns per day. Spark's pivot() with
  // an explicit value list (never the implicit distinct scan at
  // scale); the oracle is the equivalent conditional aggregation.
  // ---------------------------------------------------------------------
  private def q43(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("day", date_trunc("day", col("ts_s")))
      .groupBy(col("day"))
      .pivot("event_type", Seq("click", "view", "purchase", "error"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("click", "view", "purchase", "error"))
      // "view" is a reserved word in most engines — prefix all pivot
      // columns for oracle-name parity
      .withColumnRenamed("click", "n_click")
      .withColumnRenamed("view", "n_view")
      .withColumnRenamed("purchase", "n_purchase")
      .withColumnRenamed("error", "n_error")
      .orderBy(col("day"))

  private val q43Sql =
    """SELECT date_trunc('day', ts) AS day,
      |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
      |  count(*) FILTER (WHERE event_type = 'view') AS n_view,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      |  count(*) FILTER (WHERE event_type = 'error') AS n_error
      |FROM events
      |GROUP BY 1
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // q44 — positional explode (posexplode / zipped unnest): token
  // positions feed positional shingle features.
  // ---------------------------------------------------------------------
  private def q44(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(graft.functions.Text.words(col("text"))))
      .filter(col("pos") < 5)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("token"))
      .orderBy(col("doc_id"), col("pos"))

  private val q44Sql =
    """SELECT doc_id, CAST(pos AS BIGINT) AS pos, token FROM (
      |  SELECT doc_id,
      |    unnest(range(len(list_filter(string_split(text, ' '),
      |      w -> length(w) > 0)))) AS pos,
      |    unnest(list_filter(string_split(text, ' '),
      |      w -> length(w) > 0)) AS token
      |  FROM documents)
      |WHERE pos < 5
      |ORDER BY doc_id, pos""".stripMargin

  // ---------------------------------------------------------------------
  // q45 — array aggregation: per-user sorted distinct event-type
  // profile, serialized for cross-engine comparison.
  // ---------------------------------------------------------------------
  private def q45(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(col("user_id"))
      .agg(
        array_join(sort_array(collect_set(col("event_type"))), ",")
          .as("type_profile"),
        size(collect_set(col("event_type"))).cast("long").as("n_types"))
      .orderBy(col("user_id"))

  private val q45Sql =
    """SELECT user_id,
      |  array_to_string(list_sort(list(DISTINCT event_type)), ',')
      |    AS type_profile,
      |  count(DISTINCT event_type) AS n_types
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q46 — bounded range join: clicks within 10 minutes after an error
  // by the same user, via the time-bucketed formulation (each row
  // meets ~2 buckets of candidates, never the whole key group).
  // ---------------------------------------------------------------------
  private def q46(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).withColumn("ts_l", col("ts_s").cast("long"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        col("ts_l").as("err_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_l").as("click_ts"))
    graft.operators.RangeJoin.followingWithin(
        errors, clicks, Seq("user_id"),
        leftTs = "err_ts", rightTs = "click_ts", maxDeltaS = 600L)
      .select(col("user_id"), col("error_id"), col("click_id"),
        (col("click_ts") - col("err_ts")).as("delta_s"))
      .orderBy(col("user_id"), col("error_id"), col("click_id"))
  }

  private val q46Sql =
    s"""WITH e AS (SELECT user_id, event_id, ${epochSSql("ts")} AS ts_l,
       |                  event_type FROM events)
       |SELECT err.user_id, err.event_id AS error_id,
       |  c.event_id AS click_id, c.ts_l - err.ts_l AS delta_s
       |FROM e err JOIN e c
       |  ON err.user_id = c.user_id
       |  AND err.event_type = 'error' AND c.event_type = 'click'
       |  AND c.ts_l > err.ts_l AND c.ts_l <= err.ts_l + 600
       |ORDER BY err.user_id, error_id, click_id""".stripMargin

  // ---------------------------------------------------------------------
  // q47 — unpivot/melt: wide lineitem measures to long format
  // (dialect-neutral UNION ALL oracle).
  // ---------------------------------------------------------------------
  private def q47(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("stack(3, 'quantity', l_quantity, 'price', l_extendedprice," +
          " 'discount', l_discount) AS (measure, value)"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))

  private val q47Sql =
    """SELECT l_orderkey, l_linenumber, measure, value FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    'quantity' AS measure, l_quantity AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
      |  FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'discount', l_discount
      |  FROM lineitem)
      |WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin

  // ---------------------------------------------------------------------
  // q48 — correlated scalar subquery (SURVEY §4: "subquery
  // decorrelation ... free in Catalyst"). One dialect-neutral ANSI
  // string run verbatim by both engines; Catalyst decorrelates it
  // into an aggregate + join.
  // ---------------------------------------------------------------------
  // The outer table MUST be aliased and the correlation written
  // c2.col = c.col: an unqualified `c_nationkey` inside the subquery
  // binds to the INNER c2 (innermost scope wins, identically in both
  // engines), silently turning this into an uncorrelated global
  // average. The per-nation average itself uses the scaled-long exact
  // form so the threshold is bit-identical across engines.
  private val q48Sql =
    s"""SELECT n_name, c.c_custkey, c.c_acctbal
       |FROM customer c JOIN nation ON c.c_nationkey = n_nationkey
       |WHERE c.c_acctbal > (
       |  SELECT 1.5 * CAST(SUM(CAST(ROUND(c2.c_acctbal * 100) AS BIGINT))
       |               AS BIGINT) / 100.0 / COUNT(*)
       |  FROM customer c2
       |  WHERE c2.c_nationkey = c.c_nationkey)
       |ORDER BY n_name, c.c_custkey""".stripMargin

  private def q48(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.registerTestTables(s, dir)
    s.sql(q48Sql)
  }

  // ---------------------------------------------------------------------
  // q49 — multi-band sign-LSH ANN: 4 independent 6-bit bucketings,
  // candidates = union of band collisions. Higher recall than the
  // single-bucket q26 at ~4x the candidate cost; recall ordering vs
  // brute force is asserted in SimilaritySpec.
  // ---------------------------------------------------------------------
  private def q49(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    graft.operators.Similarity.multiBandTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val q49Sql = {
    val bandSelects = graft.operators.Similarity.DefaultBands
      .map(dims => Vectors.signBucketSql("embedding", dims))
      .zipWithIndex.map { case (b, i) =>
        s"SELECT vec_id, $i AS band, $b AS bucket FROM embeddings"
      }.mkString("\nUNION ALL\n")
    val cos = Vectors.cosineSql("q.embedding", "c.embedding")
    s"""WITH banded AS (
       |$bandSelects),
       |cand AS (
       |  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id
       |  FROM banded qb JOIN banded cb
       |    ON qb.band = cb.band AND qb.bucket = cb.bucket
       |  WHERE qb.vec_id < 10 AND cb.vec_id != qb.vec_id),
       |scored AS (
       |  SELECT cand.query_id, cand.vec_id,
       |    round($cos, 4) AS cos
       |  FROM cand
       |  JOIN embeddings q ON q.vec_id = cand.query_id
       |  JOIN embeddings c ON c.vec_id = cand.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, vec_id ASC) AS rank FROM scored)
       |SELECT query_id, vec_id, cos, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q54 — six-table star join (TPC-H Q5 shape): revenue by supplier
  // nation for intra-nation trade in one region and one order year.
  // The canonical warehouse join-planning exercise: three dimension
  // chains broadcast (region→nation→supplier is dim-sized), the only
  // shuffles are fact-side on orderkey; the date filter pushes to the
  // orders scan. Revenue via per-column scaled-int arithmetic (q35's
  // exactness pattern).
  // ---------------------------------------------------------------------
  // ---------------------------------------------------------------------
  // q92 — integer-exact PageRank (3 damped iterations) over the
  // nation-level trade graph (supplier-nation → customer-nation,
  // weighted by lineitem count). Ranks are e9 fixed-point longs and
  // every transfer is integer multiply-then-div, so the iterative
  // result is bit-identical on any engine or execution order —
  // floating-point PageRank is not (float sums reorder under
  // parallelism). Oracle: the same three iterations unrolled as CTEs.
  // Scale: node-sized rank table broadcast into the edge scan each
  // round; one map-side-combined shuffle per iteration (see
  // operators.Graph).
  // ---------------------------------------------------------------------
  private def q92(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val su = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val edges = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    graft.operators.Graph.pageRankIntExact(edges, iterations = 3)
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("node"), col("n_name"))), Seq("node"))
      .select(col("node").as("nationkey"), col("n_name"), col("rank_e9"))
      .orderBy(col("nationkey"))
  }

  // ---------------------------------------------------------------------
  // q144 — per-node triangle counts (the cohesion / spam-cluster
  // metric) over a synthetic lineitem projection graph
  // (l_partkey%5000 ↔ l_suppkey%5000, one shared id space).
  // Degree-oriented wedge enumeration: each edge directed from its
  // lower-(degree,id) endpoint, wedges built only from each
  // triangle's lowest corner — O(m^1.5) candidates with NO skew
  // cliff (a degree-10⁶ hub emits zero wedges from its own corner).
  // All-integer, so the oracle's identical join chain is bit-exact.
  // ---------------------------------------------------------------------
  // Input graph sized for a benchmark, not a stress test: a 1/6
  // lineitem sample projected onto a 4 000-id space keeps average
  // degree ~25 at sf0.1 (≈2.5M wedges — the m^1.5 term stays
  // proportionate to the rest of the suite; the operator itself is
  // the scale story, the fixture needn't be).
  private def q144(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 6 === 0)
      .select(
        (col("l_partkey") % 4000).as("id_a"),
        (col("l_suppkey") % 4000).as("id_b"))
    graft.operators.Graph.triangleCounts(pairs)
      .orderBy(col("node"))
  }

  private val q144Sql =
    """WITH raw AS (
      |  SELECT greatest(l_partkey % 4000, l_suppkey % 4000) AS x,
      |         least(l_partkey % 4000, l_suppkey % 4000) AS y
      |  FROM lineitem WHERE l_orderkey % 6 = 0),
      |e AS (SELECT DISTINCT x, y FROM raw WHERE x != y),
      |nodes AS (SELECT DISTINCT node FROM (
      |  SELECT x AS node FROM e UNION ALL SELECT y FROM e)),
      |deg AS (
      |  SELECT n, CAST(count(*) AS BIGINT) * 1000000000 + n AS k
      |  FROM (SELECT x AS n FROM e UNION ALL SELECT y AS n FROM e)
      |  GROUP BY n),
      |oriented AS (
      |  SELECT CASE WHEN dx.k < dy.k THEN e.x ELSE e.y END AS src,
      |         CASE WHEN dx.k < dy.k THEN e.y ELSE e.x END AS dst,
      |         greatest(dx.k, dy.k) AS kdst
      |  FROM e JOIN deg dx ON dx.n = e.x JOIN deg dy ON dy.n = e.y),
      |wedges AS (
      |  SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
      |  FROM oriented o1 JOIN oriented o2 ON o1.src = o2.src
      |  WHERE o1.kdst < o2.kdst),
      |tris AS (
      |  SELECT wd.u, wd.v, wd.w FROM wedges wd
      |  WHERE EXISTS (SELECT 1 FROM oriented o
      |                WHERE o.src = wd.v AND o.dst = wd.w)),
      |per AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
      |    SELECT u AS node FROM tris
      |    UNION ALL SELECT v FROM tris
      |    UNION ALL SELECT w FROM tris)
      |  GROUP BY node)
      |SELECT n.node, CAST(COALESCE(p.n_triangles, 0) AS BIGINT)
      |  AS n_triangles
      |FROM nodes n LEFT JOIN per p USING (node)
      |ORDER BY node""".stripMargin

  // ---------------------------------------------------------------------
  // q191 — per-node local clustering coefficient: n_triangles(v) /
  // C(deg(v),2) as exact ppm over the same synthetic co-purchase graph
  // family as q144 (sparser slice: ~25 avg degree at sf0.1, so the
  // oriented-wedge m^1.5 term stays bounded). Everything integer —
  // counts, wedges, and a `div`-emitted ratio — so engine-exact.
  // ---------------------------------------------------------------------
  private def q191(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 12 === 1)
      .select(
        (col("l_partkey") % 4000).as("id_a"),
        (col("l_suppkey") % 4000).as("id_b"))
    graft.operators.Graph.localClustering(pairs)
      .orderBy(col("node"))
  }

  private val q191Sql =
    """WITH raw AS (
      |  SELECT greatest(l_partkey % 4000, l_suppkey % 4000) AS x,
      |         least(l_partkey % 4000, l_suppkey % 4000) AS y
      |  FROM lineitem WHERE l_orderkey % 12 = 1),
      |e AS (SELECT DISTINCT x, y FROM raw WHERE x != y),
      |nodes AS (SELECT DISTINCT node FROM (
      |  SELECT x AS node FROM e UNION ALL SELECT y FROM e)),
      |deg AS (
      |  SELECT n, CAST(count(*) AS BIGINT) AS degree,
      |         CAST(count(*) AS BIGINT) * 1000000000 + n AS k
      |  FROM (SELECT x AS n FROM e UNION ALL SELECT y AS n FROM e)
      |  GROUP BY n),
      |oriented AS (
      |  SELECT CASE WHEN dx.k < dy.k THEN e.x ELSE e.y END AS src,
      |         CASE WHEN dx.k < dy.k THEN e.y ELSE e.x END AS dst,
      |         greatest(dx.k, dy.k) AS kdst
      |  FROM e JOIN deg dx ON dx.n = e.x JOIN deg dy ON dy.n = e.y),
      |wedges AS (
      |  SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
      |  FROM oriented o1 JOIN oriented o2 ON o1.src = o2.src
      |  WHERE o1.kdst < o2.kdst),
      |tris AS (
      |  SELECT wd.u, wd.v, wd.w FROM wedges wd
      |  WHERE EXISTS (SELECT 1 FROM oriented o
      |                WHERE o.src = wd.v AND o.dst = wd.w)),
      |per AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
      |    SELECT u AS node FROM tris
      |    UNION ALL SELECT v FROM tris
      |    UNION ALL SELECT w FROM tris)
      |  GROUP BY node)
      |SELECT n.node, d.degree,
      |  CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles,
      |  d.degree * (d.degree - 1) // 2 AS n_wedges,
      |  CASE WHEN d.degree < 2 THEN 0
      |       ELSE COALESCE(p.n_triangles, 0) * 1000000
      |            // (d.degree * (d.degree - 1) // 2) END AS lcc_ppm
      |FROM nodes n
      |JOIN deg d ON d.n = n.node
      |LEFT JOIN per p USING (node)
      |ORDER BY node""".stripMargin

  // ---------------------------------------------------------------------
  // q193 — autocorrelation profile of the daily-revenue series at lags
  // 1..3 (the seasonality screen next to q170's weekday profile): the
  // series is exact e2 daily sums, each lag is a calendar-day
  // self-join (both branches read one localCheckpointed 2.5k-row
  // aggregate — never the fact table twice), and the correlation
  // reduces to Validate.regressionExact's DECIMAL(38,0) sufficient
  // sums, so r² is one deterministic IEEE expression per lag.
  // ---------------------------------------------------------------------
  private def q193(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "lineitem")
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .as("rev"))
      .pin()
    val lags = (1 to 3).map { k =>
      daily.select(col("day"), col("rev").as("x"))
        .join(daily.select(date_sub(col("day"), k).as("day"),
          col("rev").as("y")), Seq("day"))
        .select(lit(k.toLong).as("lag"), col("x"), col("y"))
    }.reduce(_ unionByName _)
    graft.operators.Validate.regressionExact(lags, col("x"), col("y"),
        Seq(col("lag")))
      .orderBy(col("lag"))
  }

  private val q193Sql =
    """WITH daily AS (
      |  SELECT CAST(l_shipdate AS DATE) AS day,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |pairs AS (
      |  SELECT k.lag, a.rev AS x, b.rev AS y
      |  FROM (VALUES (1), (2), (3)) k(lag)
      |  JOIN daily a ON true
      |  JOIN daily b ON b.day = a.day + k.lag),
      |s AS (
      |  SELECT lag, count(*) AS n_raw,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE)
      |      AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE)
      |      AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE)
      |      AS syy
      |  FROM pairs GROUP BY lag),
      |c AS (
      |  SELECT lag, n_raw, n, sx, sy,
      |    n * sxy - sx * sy AS covn,
      |    n * sxx - sx * sx AS varxn,
      |    n * syy - sy * sy AS varyn
      |  FROM s)
      |SELECT CAST(lag AS BIGINT) AS lag, n_raw AS n,
      |  CAST(round((covn / varxn) * 1000000) AS BIGINT) AS slope_e6,
      |  CAST(round(((sy - (covn / varxn) * sx) / n / CAST(100 AS DOUBLE))
      |    * 1000000) AS BIGINT) AS intercept_e6,
      |  CAST(round(((covn * covn) / (varxn * varyn)) * 1000000) AS BIGINT)
      |    AS r2_e6
      |FROM c
      |ORDER BY lag""".stripMargin

  // ---------------------------------------------------------------------
  // q194 — classifier reliability report (calibration bins, the
  // companion to q176's ROC-AUC): purchase-vs-view outcomes against a
  // bounded e4 pseudo-score, rolled into equal-width deciles with the
  // observed positive rate, mean predicted mass, and the exact Brier
  // contribution — every column an integer (ppm/e4/e8), so the
  // reliability diagram is engine-exact. One hash aggregate.
  // ---------------------------------------------------------------------
  private def q194(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
      .filter(col("event_type").isin("purchase", "view"))
      .select(
        expr("CAST(round(value * 100) AS BIGINT) % 10001").as("p_e4"),
        (col("event_type") === "purchase").cast("long").as("y"))
    e.groupBy(expr("p_e4 div 1000").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"),
        sum(col("p_e4")).as("sum_p_e4"),
        sum(expr("(p_e4 - y * 10000) * (p_e4 - y * 10000)"))
          .as("brier_e8_sum"))
      .withColumn("obs_ppm", expr("n_pos * 1000000 div n"))
      .withColumn("pred_ppm", expr("sum_p_e4 * 100 div n"))
      .orderBy(col("bin"))
  }

  private val q194Sql =
    """WITH e AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) % 10001 AS p_e4,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events WHERE event_type IN ('purchase', 'view'))
      |SELECT p_e4 // 1000 AS bin, count(*) AS n,
      |  CAST(sum(y) AS BIGINT) AS n_pos,
      |  CAST(sum(p_e4) AS BIGINT) AS sum_p_e4,
      |  CAST(sum((p_e4 - y * 10000) * (p_e4 - y * 10000)) AS BIGINT)
      |    AS brier_e8_sum,
      |  CAST(sum(y) AS BIGINT) * 1000000 // count(*) AS obs_ppm,
      |  CAST(sum(p_e4) AS BIGINT) * 100 // count(*) AS pred_ppm
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q200 — association rules (market-basket): top-25 part pairs
  // co-occurring in the same order, with support, confidence and lift
  // as integer ppm (numerators never leave BIGINT). Baskets are tiny
  // (≈4 items) so the within-basket self-join emits C(4,2) pairs per
  // order — linear in the fact table, never quadratic in the
  // catalogue. Both sides of the self-join are renamed apart before
  // joining (Spark self-join ambiguity discipline).
  // ---------------------------------------------------------------------
  private def q200(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().pin()
    val nOrders = items.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val cnt = items.groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
    val pairs = items
      .join(items.select(col("ok"), col("pk").as("pk_b")), Seq("ok"))
      .filter(col("pk") < col("pk_b"))
      .groupBy(col("pk").as("pa"), col("pk_b").as("pb"))
      .agg(count(lit(1)).as("pair_cnt"))
    pairs
      .join(broadcast(cnt.select(col("pk").as("pa"), col("cnt").as("cnt_a"))),
        Seq("pa"))
      .join(broadcast(cnt.select(col("pk").as("pb"), col("cnt").as("cnt_b"))),
        Seq("pb"))
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("pair_cnt"), col("cnt_a"),
        col("cnt_b"),
        expr("pair_cnt * 1000000 div cnt_a").as("conf_ppm"),
        expr("pair_cnt * n_orders * 1000000 div (cnt_a * cnt_b)")
          .as("lift_ppm"))
      .orderBy(col("pair_cnt").desc, col("pa"), col("pb"))
      .limit(25)
  }

  private val q200Sql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |n AS (
      |  SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM items),
      |cnt AS (
      |  SELECT pk, CAST(count(*) AS BIGINT) AS cnt FROM items GROUP BY pk),
      |pairs AS (
      |  SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT)
      |      AS pair_cnt
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2)
      |SELECT pa, pb, pair_cnt, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
      |  pair_cnt * 1000000 // ca.cnt AS conf_ppm,
      |  pair_cnt * n.n_orders * 1000000 // (ca.cnt * cb.cnt) AS lift_ppm
      |FROM pairs
      |JOIN cnt ca ON ca.pk = pa
      |JOIN cnt cb ON cb.pk = pb, n
      |ORDER BY pair_cnt DESC, pa, pb
      |LIMIT 25""".stripMargin

  // ---------------------------------------------------------------------
  // q203 — trailing-7-day distinct actives (rolling DAU/WAU): exact
  // windowed COUNT DISTINCT without a distinct-in-window (Spark lacks
  // it and a collect_set frame buffers the partition): each distinct
  // (user, day) contributes itself to the 7 windows it belongs to via
  // a sequence-explode, then one hash distinct + count per window day.
  // Shuffle volume is 7× the (user, day) table — bounded, partition-
  // parallel, no per-row frame state; the standard 100 TB shape for
  // sliding distinct counts.
  // ---------------------------------------------------------------------
  private def q203(s: SparkSession, dir: String): DataFrame = {
    val ud = ev(s, dir)
      .select(expr("CAST(ts_s AS LONG) div 86400").as("day"),
        col("user_id"))
      .distinct().pin()
    val days = ud.select(col("day")).distinct()
    val wau = ud
      .select(explode(expr("sequence(day, day + 6)")).as("day"),
        col("user_id"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau7"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    days.join(dau, Seq("day")).join(wau, Seq("day"))
      .orderBy(col("day"))
  }

  private val q203Sql =
    s"""WITH ud AS (
       |  SELECT DISTINCT ${epochSSql("ts")} // 86400 AS day, user_id
       |  FROM events),
       |days AS (SELECT DISTINCT day FROM ud),
       |wau AS (
       |  SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau7
       |  FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
       |  GROUP BY d.day),
       |dau AS (
       |  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day)
       |SELECT day, dau.dau, wau.wau7
       |FROM days JOIN dau USING (day) JOIN wau USING (day)
       |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // q209 — multi-resolution rollup with Haar detail coefficients (the
  // change-detection screen at dyadic scales): the exact e2 daily
  // revenue series aggregates at bucket widths 2/4/8 days, each
  // bucket carrying its total AND the unnormalized Haar detail
  // (left-half sum − right-half sum). Pure integer signed sums — one
  // explode ×3 + one hash aggregate, no window, engine-exact.
  // ---------------------------------------------------------------------
  private def q209(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "lineitem")
      .groupBy(unix_date(col("l_shipdate").cast("date")).as("dk"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .as("rev"))
    daily
      .select(col("dk"), col("rev"),
        explode(expr("array(1, 2, 3)")).as("lvl"))
      .groupBy(col("lvl").cast("long").as("lvl"),
        expr("dk div CAST(pow(2, lvl) AS BIGINT)").as("bucket"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("rev")).as("total_e2"),
        sum(when(
          expr("(dk div CAST(pow(2, lvl - 1) AS BIGINT)) % 2 = 0"),
          col("rev")).otherwise(-col("rev"))).as("detail_e2"))
      .orderBy(col("lvl"), col("bucket"))
  }

  private val q209Sql =
    """WITH daily AS (
      |  SELECT CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS dk,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |lv AS (SELECT unnest([1, 2, 3]) AS lvl)
      |SELECT CAST(lvl AS BIGINT) AS lvl,
      |  dk // CAST(pow(2, lvl) AS BIGINT) AS bucket,
      |  count(*) AS n_days,
      |  CAST(sum(rev) AS BIGINT) AS total_e2,
      |  CAST(sum(CASE WHEN (dk // CAST(pow(2, lvl - 1) AS BIGINT)) % 2 = 0
      |    THEN rev ELSE -rev END) AS BIGINT) AS detail_e2
      |FROM daily, lv
      |GROUP BY 1, 2
      |ORDER BY lvl, bucket""".stripMargin

  // ---------------------------------------------------------------------
  // q210 — 2-D Pareto skyline: the orders no other order beats on
  // BOTH (cheaper price, more recent date) — Skyline.paretoFront2D's
  // per-cost collapse + strict prefix max over range partitions (the
  // q59 discipline), never an all-pairs dominance anti-join and never
  // a corpus-wide window. Equal-optimum duplicates all survive.
  // ---------------------------------------------------------------------
  private def q210(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_e2"),
      unix_date(col("o_orderdate").cast("date")).cast("long").as("day"))
    graft.operators.Skyline.paretoFront2D(o, "price_e2", "day")
      .orderBy(col("price_e2"), col("o_orderkey"))
  }

  private val q210Sql =
    """WITH o AS (
      |  SELECT o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_e2,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
      |      AS day
      |  FROM orders),
      |pm AS (SELECT price_e2, max(day) AS dmax FROM o GROUP BY price_e2),
      |pref AS (
      |  SELECT price_e2, dmax,
      |    max(dmax) OVER (ORDER BY price_e2
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
      |  FROM pm)
      |SELECT o.o_orderkey, o.price_e2, o.day
      |FROM o JOIN pref ON o.price_e2 = pref.price_e2
      |WHERE o.day = pref.dmax
      |  AND (pref.prevmax IS NULL OR pref.prevmax < pref.dmax)
      |ORDER BY o.price_e2, o.o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // q212 — clamped running inventory (the non-linear recurrence no
  // window frame can express: stock_t = clamp(stock_{t-1} + Δ, 0,
  // cap)): per part, ship events fold in exact (date, order, line)
  // order through a [stock, n_floor, n_ceil] BIGINT-array state. The
  // per-key event list is bounded (collect + fold, the q180 Holt
  // discipline); keys partition-parallelize, so scale-out is by part,
  // never by history length on one node.
  // ---------------------------------------------------------------------
  private def q212(s: SparkSession, dir: String): DataFrame = {
    val evs = t(s, dir, "lineitem")
      .select((col("l_partkey") % 2000).as("part"),
        ((unix_date(col("l_shipdate").cast("date")).cast("long")
          * lit(100000000L))
          + (col("l_orderkey") % 10000000L) * lit(10L)
          + col("l_linenumber")).as("pk"),
        when(col("l_returnflag") === "R",
          -col("l_quantity").cast("long"))
          .otherwise(col("l_quantity").cast("long")).as("delta"))
    evs.groupBy(col("part"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(array(col("pk"), col("delta"))))
          .as("evs"))
      .withColumn("st", expr(
        """aggregate(evs, CAST(array(0, 0, 0) AS array<bigint>),
          |  (acc, e) -> CASE
          |    WHEN element_at(acc, 1) + element_at(e, 2) < 0L
          |      THEN array(0L, element_at(acc, 2) + 1L,
          |             element_at(acc, 3))
          |    WHEN element_at(acc, 1) + element_at(e, 2) > 500L
          |      THEN array(500L, element_at(acc, 2),
          |             element_at(acc, 3) + 1L)
          |    ELSE array(element_at(acc, 1) + element_at(e, 2),
          |           element_at(acc, 2), element_at(acc, 3)) END)"""
          .stripMargin))
      .select(col("part"), col("n_events"),
        expr("element_at(st, 1)").as("final_stock"),
        expr("element_at(st, 2)").as("n_clamped_lo"),
        expr("element_at(st, 3)").as("n_clamped_hi"))
      .orderBy(col("part"))
  }

  private val q212Sql =
    """WITH ev AS (
      |  SELECT l_partkey % 2000 AS part,
      |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
      |      * 100000000
      |      + (l_orderkey % 10000000) * 10 + l_linenumber AS pk,
      |    CASE WHEN l_returnflag = 'R' THEN -CAST(l_quantity AS BIGINT)
      |         ELSE CAST(l_quantity AS BIGINT) END AS delta
      |  FROM lineitem),
      |g AS (
      |  SELECT part, count(*) AS n, list_sort(list([pk, delta])) AS evs
      |  FROM ev GROUP BY part),
      |f AS (
      |  SELECT part, n, list_reduce(
      |    list_prepend([0, 0, 0]::BIGINT[], evs),
      |    (acc, e) -> CASE
      |      WHEN acc[1] + e[2] < 0 THEN [0, acc[2] + 1, acc[3]]
      |      WHEN acc[1] + e[2] > 500 THEN [500, acc[2], acc[3] + 1]
      |      ELSE [acc[1] + e[2], acc[2], acc[3]] END) AS st
      |  FROM g)
      |SELECT part, CAST(n AS BIGINT) AS n_events, st[1] AS final_stock,
      |  st[2] AS n_clamped_lo, st[3] AS n_clamped_hi
      |FROM f
      |ORDER BY part""".stripMargin

  // ---------------------------------------------------------------------
  // q214 — two-hop reach (friend-of-friend audience size): per node,
  // the count of distinct nodes exactly two hops away, via
  // [[graft.operators.Graph.twoHopReach]] — mid-join over the
  // symmetrized adjacency, dedup, anti-join direct edges. Volume is
  // Σ deg² (the fixture keeps avg degree ~25); mids at degree ≥ 512
  // route through the salted hot path so one hub can't serialize its
  // d² pairs into a single task (GraphSpec pins salted/plain parity
  // on a deliberate-hub fixture).
  // ---------------------------------------------------------------------
  private def q214(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 10 === 3)
      .select((col("l_partkey") % 4000).as("a"),
        (col("l_suppkey") % 4000).as("b"))
      .filter(col("a") =!= col("b"))
    val und = raw
      .unionByName(raw.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    graft.operators.Graph.twoHopReach(und).orderBy(col("node"))
  }

  private val q214Sql =
    """WITH raw AS (
      |  SELECT l_partkey % 4000 AS a, l_suppkey % 4000 AS b
      |  FROM lineitem WHERE l_orderkey % 10 = 3),
      |und AS (
      |  SELECT DISTINCT a, b FROM (
      |    SELECT a, b FROM raw WHERE a != b
      |    UNION ALL SELECT b, a FROM raw WHERE a != b)),
      |two AS (
      |  SELECT DISTINCT x.a AS src, y.b AS dst
      |  FROM und x JOIN und y ON x.b = y.a
      |  WHERE x.a != y.b),
      |reach AS (
      |  SELECT src, CAST(count(*) AS BIGINT) AS two_hop
      |  FROM two t
      |  WHERE NOT EXISTS (SELECT 1 FROM und e
      |                    WHERE e.a = t.src AND e.b = t.dst)
      |  GROUP BY src)
      |SELECT n.a AS node, COALESCE(r.two_hop, 0) AS two_hop
      |FROM (SELECT DISTINCT a FROM und) n
      |LEFT JOIN reach r ON r.src = n.a
      |ORDER BY node""".stripMargin

  // ---------------------------------------------------------------------
  // q216 — rolling 30-day correlation between daily revenue and daily
  // order-line volume (the co-movement drift monitor): five exact
  // integer sufficient sums accumulate in one value-bounded RANGE
  // frame over the calendar-sized daily series (≤ one row per day —
  // dimension-sized, never corpus-sized, so the single-partition
  // window is bounded by the calendar, not the data), and Pearson r
  // forms in one deterministic IEEE expression (sqrt is correctly
  // rounded, so e6 output is engine-exact).
  // ---------------------------------------------------------------------
  private def q216(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "lineitem")
      .groupBy(unix_date(col("l_shipdate").cast("date")).cast("long")
        .as("day"))
      .agg(sum(expr("CAST(round(l_extendedprice) AS BIGINT)")).as("x"),
        count(lit(1)).as("y"))
    val w = Window.orderBy(col("day")).rangeBetween(-29, 0)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .filter(col("n") === 30)
      .select(col("day"), col("n"),
        expr("""CAST(round(
          |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
          |  * 1000000) AS BIGINT)""".stripMargin).as("corr_e6"))
      .orderBy(col("day"))
  }

  private val q216Sql =
    """WITH daily AS (
      |  SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
      |      AS BIGINT) AS day,
      |    CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT)
      |      AS x,
      |    count(*) AS y
      |  FROM lineitem GROUP BY 1),
      |win AS (
      |  SELECT day,
      |    count(*) OVER w AS n,
      |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
      |    sum(x * y) OVER w AS sxy,
      |    sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
      |  FROM daily
      |  WINDOW w AS (ORDER BY day
      |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW))
      |SELECT day, CAST(n AS BIGINT) AS n,
      |  CAST(round(
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS corr_e6
      |FROM win WHERE n = 30
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // q218 — grid-bucketed spatial neighbor pairs: all point pairs
  // within radius r, via the cell-join shape that replaces the O(n²)
  // distance join at scale — each point lands in one ⌈r⌉-sized cell,
  // the LEFT side explodes to its 3×3 cell neighborhood, the join is
  // a plain equi-join on cell coordinates, and the exact integer
  // dx²+dy² ≤ r² filter runs only inside candidate cells. Synthetic
  // integer coordinates keep every comparison engine-exact.
  // ---------------------------------------------------------------------
  private def q218(s: SparkSession, dir: String): DataFrame = {
    val r = 5000L
    val h = graft.functions.PortableHash
    // hash-scattered coordinates: arithmetic progressions would put
    // consecutive keys on a lattice line and make every point ~70
    // near-collinear neighbors
    val pts = t(s, dir, "customer").select(col("c_custkey").as("id"),
        (h.hash60(concat(lit("px:"), col("c_custkey"))) % 1000000L)
          .as("x"),
        (h.hash60(concat(lit("py:"), col("c_custkey"))) % 1000000L)
          .as("y"))
      .withColumn("cx", expr(s"x div $r")).withColumn("cy",
        expr(s"y div $r"))
      .pin()
    val probe = pts.select(col("id").as("id_a"), col("x").as("xa"),
        col("y").as("ya"),
        explode(expr("array(-1, 0, 1)")).as("dx"), col("cx"), col("cy"))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("cx") + col("dx")).as("cx"),
        explode(expr("array(-1, 0, 1)")).as("dy"), col("cy"))
      .select(col("id_a"), col("xa"), col("ya"), col("cx"),
        (col("cy") + col("dy")).as("cy"))
    probe.join(pts.select(col("id").as("id_b"), col("x").as("xb"),
        col("y").as("yb"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb"))
          + (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= lit(r * r))
      .select(col("id_a"), col("id_b"), col("dist2"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private lazy val q218Sql = {
    val hx = graft.functions.PortableHash.hash60DuckSql("'px:' || c_custkey")
    val hy = graft.functions.PortableHash.hash60DuckSql("'py:' || c_custkey")
    s"""WITH pts AS (
      |  SELECT c_custkey AS id, ($hx) % 1000000 AS x,
      |    ($hy) % 1000000 AS y
      |  FROM customer),
      |cells AS (
      |  SELECT id, x, y, x // 5000 AS cx, y // 5000 AS cy FROM pts),
      |offs AS (SELECT unnest([-1, 0, 1]) AS dx),
      |offs2 AS (SELECT unnest([-1, 0, 1]) AS dy),
      |probe AS (
      |  SELECT id AS id_a, x AS xa, y AS ya,
      |    cx + dx AS cx, cy + dy AS cy
      |  FROM cells, offs, offs2)
      |SELECT p.id_a, c.id AS id_b,
      |  (p.xa - c.x) * (p.xa - c.x) + (p.ya - c.y) * (p.ya - c.y)
      |    AS dist2
      |FROM probe p JOIN cells c ON p.cx = c.cx AND p.cy = c.cy
      |WHERE p.id_a < c.id
      |  AND (p.xa - c.x) * (p.xa - c.x) + (p.ya - c.y) * (p.ya - c.y)
      |      <= 25000000
      |ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q219 — time-decayed popularity: per part, Σ 1e6/(1+age_days) over
  // its order lines (harmonic decay — integer division per row, so
  // the decayed score is exact with no transcendental in sight),
  // anchored at the corpus max ship date (one broadcast scalar).
  // Top-25 by decayed score with full tiebreaks.
  // ---------------------------------------------------------------------
  private def q219(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey").as("part"),
        unix_date(col("l_shipdate").cast("date")).cast("long").as("dk"))
    val anchor = li.agg(max(col("dk")).as("mx"))
    li.crossJoin(broadcast(anchor))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr("1000000 div (1 + mx - dk)")).as("decayed_e6"))
      .orderBy(col("decayed_e6").desc, col("part"))
      .limit(25)
  }

  private val q219Sql =
    """WITH li AS (
      |  SELECT l_partkey AS part,
      |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
      |      AS dk
      |  FROM lineitem),
      |a AS (SELECT max(dk) AS mx FROM li)
      |SELECT part, count(*) AS n_lines,
      |  CAST(sum(1000000 // (1 + mx - dk)) AS BIGINT) AS decayed_e6
      |FROM li, a
      |GROUP BY part
      |ORDER BY decayed_e6 DESC, part
      |LIMIT 25""".stripMargin

  // ---------------------------------------------------------------------
  // q220 — winning-supplier census (TPC-H Q20's nested-aggregate
  // shape without partsupp): per part, the supplier shipping the
  // largest total quantity wins (ties → lowest suppkey, expressed as
  // a second aggregate — no vendor argmax function), then suppliers
  // count their wins. Aggregate-over-aggregate + deterministic argmax
  // in pure ANSI, executed VERBATIM by both engines through the SQL
  // frontend (the q35 discipline: one dialect-neutral string).
  // ---------------------------------------------------------------------
  private val q220Sql =
    """WITH sp AS (
      |  SELECT l_suppkey AS sk, l_partkey AS pk,
      |    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY l_suppkey, l_partkey),
      |best AS (SELECT pk, MAX(q) AS mq FROM sp GROUP BY pk),
      |winner AS (
      |  SELECT sp.pk, MIN(sp.sk) AS sk, MAX(best.mq) AS mq
      |  FROM sp JOIN best ON sp.pk = best.pk AND sp.q = best.mq
      |  GROUP BY sp.pk)
      |SELECT s_name, COUNT(*) AS n_top_parts,
      |  CAST(SUM(winner.mq) AS BIGINT) AS winning_qty
      |FROM winner
      |JOIN supplier ON s_suppkey = winner.sk
      |JOIN nation ON n_nationkey = s_nationkey
      |WHERE n_name = 'NATION_7'
      |GROUP BY s_name
      |ORDER BY n_top_parts DESC, s_name
      |LIMIT 20""".stripMargin

  private def q220(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.registerTestTables(s, dir)
    s.sql(q220Sql)
  }

  // ---------------------------------------------------------------------
  // q221 — personalized PageRank (random-walk-with-restart proximity,
  // the related-items recommender primitive): q92's trade-flow nation
  // graph, with ALL teleport mass restarting at nations 0–4. Same
  // integer-exact e9 fixed-point iteration — engine-exact under any
  // execution order — with the teleport vector concentrated on the
  // source set.
  // ---------------------------------------------------------------------
  private def q221(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val edges = li
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    graft.operators.Graph.personalizedPageRankIntExact(
        edges, node => node < 5, iterations = 3)
      .join(broadcast(t(s, dir, "nation")),
        col("node") === col("n_nationkey"))
      .select(col("node").as("nationkey"), col("n_name"), col("rank_e9"))
      .orderBy(col("nationkey"))
  }

  private val q221Sql = {
    def iter(prev: String, name: String) =
      s"""$name AS (
         |  SELECT nd.node,
         |    CAST(CASE WHEN nd.node < 5 THEN 150000000 // ns ELSE 0 END
         |      + (850 * COALESCE(ct.c, 0)) // 1000 AS BIGINT) AS r
         |  FROM nodes nd CROSS JOIN scnt
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(sum(($prev.r * e.w) // o.ow) AS BIGINT) AS c
         |    FROM edges e JOIN outw o ON e.src = o.src
         |    JOIN $prev ON $prev.node = e.src
         |    GROUP BY e.dst) ct ON ct.node = nd.node)""".stripMargin
    s"""WITH edges AS (
       |  SELECT s_nationkey AS src, c_nationkey AS dst,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY 1, 2),
       |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow
       |         FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM edges
       |  UNION ALL SELECT dst FROM edges)),
       |scnt AS (SELECT CAST(count(*) AS BIGINT) AS ns
       |         FROM nodes WHERE node < 5),
       |r0 AS (SELECT node,
       |         CAST(CASE WHEN node < 5 THEN 1000000000 // ns
       |              ELSE 0 END AS BIGINT) AS r
       |       FROM nodes CROSS JOIN scnt),
       |${iter("r0", "it1")},
       |${iter("it1", "it2")},
       |${iter("it2", "it3")}
       |SELECT CAST(it3.node AS BIGINT) AS nationkey, n_name,
       |  it3.r AS rank_e9
       |FROM it3 JOIN nation ON n_nationkey = it3.node
       |ORDER BY nationkey""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q169 — burst detection (peak request rate): for each user, the
  // maximum number of events inside ANY trailing 1-hour window — a
  // RANGE frame over integer epoch seconds (every event's frame is
  // value-bounded, so the window state is the trailing hour, not the
  // partition), reduced to one peak row per user. Pure integers.
  // ---------------------------------------------------------------------
  private def q169(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_l"))
      .rangeBetween(-3599L, 0L)
    ev(s, dir)
      .select(col("user_id"), Exact.epochS(col("ts_s")).as("ts_l"))
      .withColumn("in_hour", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("in_hour")).as("peak_hour_events"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  private val q169Sql =
    s"""WITH e AS (
       |  SELECT user_id, ${epochSSql("ts")} AS ts_l FROM events),
       |counted AS (
       |  SELECT user_id,
       |    count(*) OVER (PARTITION BY user_id ORDER BY ts_l
       |      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS in_hour
       |  FROM e)
       |SELECT user_id, max(in_hour) AS peak_hour_events,
       |  count(*) AS n_events
       |FROM counted
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q170 — hour-of-day seasonality fingerprint: per event type, the
  // 24-hour activity profile as exact ppm shares (integer division
  // against the type total) — the shape used to detect bot traffic
  // (flat profile) vs organic (diurnal). One aggregate + a broadcast
  // totals join; all integers.
  // ---------------------------------------------------------------------
  private def q170(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("event_type"),
      hour(col("ts_s")).cast("long").as("hr"))
    val counts = e.groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.groupBy(col("event_type")).agg(sum(col("n")).as("nt"))
    counts.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("hr"), col("n"),
        expr("n * 1000000 div nt").as("share_ppm"))
      .orderBy(col("event_type"), col("hr"))
  }

  private val q170Sql =
    s"""WITH c AS (
       |  SELECT event_type,
       |    CAST(extract(hour FROM ${secSql("ts")}) AS BIGINT) AS hr,
       |    count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |tot AS (
       |  SELECT event_type, CAST(sum(n) AS BIGINT) AS nt
       |  FROM c GROUP BY 1)
       |SELECT c.event_type, hr, n, (n * 1000000) // nt AS share_ppm
       |FROM c JOIN tot ON tot.event_type = c.event_type
       |ORDER BY c.event_type, hr""".stripMargin

  // ---------------------------------------------------------------------
  // q172 — robust outlier detection (median/MAD): the outlier screen
  // that, unlike q126's mean/σ, is immune to the outliers it hunts.
  // Per event type: med = median(v), MAD = median(|v − med|), flag
  // |v − med| > 3·1.4826·MAD (the normal-consistent 3σ equivalent).
  // Exactness: for p=0.5 over integers the interpolation is
  // a + 0.5·(b−a) — exact in doubles whichever way an engine
  // associates it — so 2·median is an integer; |4v − 2·med2| keeps
  // deviations integer, 2·median(dev4) = 8·MAD is an integer, and the
  // threshold compares as 20000·dev4 > 44478·mad8 — pure integers
  // end-to-end, no float boundary anywhere. Both medians come from
  // Validate.groupedPercentilesExact (approx bracket + exact boundary
  // pass), so no group ever buffers its full column — the q113/q127
  // scale posture.
  // ---------------------------------------------------------------------
  private def q172(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validate
    // pin the narrow (event_type, v) projection (r12): the two
    // grouped-percentile operators each make a bracket pass and an
    // exact boundary pass, and the final screen scans it again — five
    // derivations of the same parquet scan + round/cast before the
    // pin, one 16-byte-row materialization after (guide §5: reuse is
    // real and recompute is the expensive side). Same for dev below
    // (MAD bracket + boundary + final aggregate = three scans).
    val e = ev(s, dir).select(col("event_type"),
      round(col("value") * 10000).cast("long").as("v")).pin()
    val med = Validate.groupedPercentilesExact(e, col("event_type"),
        "event_type", col("v"), Seq(0.5), Seq("m"))
      .select(col("event_type"),
        round(col("m") * 2).cast("long").as("med2"))
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("dev4", abs(lit(4) * col("v") - lit(2) * col("med2")))
      .pin()
    val mad = Validate.groupedPercentilesExact(dev, col("event_type"),
        "event_type", col("dev4"), Seq(0.5), Seq("md"))
      .select(col("event_type"),
        round(col("md") * 2).cast("long").as("mad8"))
    dev.join(broadcast(mad), "event_type")
      .withColumn("is_out",
        lit(20000L) * col("dev4") > lit(44478L) * col("mad8"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("med2")).as("med2"), min(col("mad8")).as("mad8"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
        coalesce(sum(when(col("is_out"), col("v"))), lit(0L))
          .as("outlier_v_sum"),
        max(col("dev4")).as("max_dev4"))
      .orderBy(col("event_type"))
  }

  private val q172Sql =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v
      |  FROM events),
      |med AS (
      |  SELECT event_type,
      |    CAST(round(quantile_cont(v, 0.5) * 2) AS BIGINT) AS med2
      |  FROM e GROUP BY 1),
      |d AS (
      |  SELECT e.event_type, e.v, abs(4 * e.v - 2 * m.med2) AS dev4,
      |    m.med2
      |  FROM e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type,
      |    CAST(round(quantile_cont(dev4, 0.5) * 2) AS BIGINT) AS mad8
      |  FROM d GROUP BY 1)
      |SELECT d.event_type, count(*) AS n,
      |  min(d.med2) AS med2, min(mad.mad8) AS mad8,
      |  CAST(sum(CASE WHEN 20000 * d.dev4 > 44478 * mad.mad8
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST(coalesce(sum(CASE WHEN 20000 * d.dev4 > 44478 * mad.mad8
      |    THEN d.v END), 0) AS BIGINT) AS outlier_v_sum,
      |  max(d.dev4) AS max_dev4
      |FROM d JOIN mad USING (event_type)
      |GROUP BY d.event_type
      |ORDER BY d.event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q175 — product quantization (the PQ of IVF-PQ): every 64-dim
  // embedding compressed to four 4-bit codes against a 16-entry
  // codebook (here: the corpus' first 16 vectors — a valid PQ
  // codebook init; training it is q51/q74/q78's k-means machinery).
  // Nearest-centroid per 16-dim subspace under squared L2; distances
  // are identical left folds of per-dimension double squares on both
  // engines (the q123 pinned-order discipline), so even the argmin
  // TIE behavior matches (lowest code id). Reconstruction error
  // rounds per subspace to e6 before the sum. The corpus never
  // shuffles — one broadcast codebook row, all per-row lambdas.
  // ---------------------------------------------------------------------
  private def q175(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = t(s, dir, "embeddings")
    val cb = e.filter(col("vec_id") < 16)
    Similarity.pqEncode(e, "embedding", 64, 4, cb, "vec_id", "embedding")
      .groupBy(col("pq_code"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("err_e6")).as("err_e6_total"),
        min(col("vec_id")).as("min_vec_id"),
        sum(col("vec_id")).as("id_checksum"))
      .orderBy(col("pq_code"))
  }

  private val q175Sql = {
    val sq = "(ve[j*16+i]::DOUBLE - ce[j*16+i]::DOUBLE) * " +
      "(ve[j*16+i]::DOUBLE - ce[j*16+i]::DOUBLE)"
    s"""WITH cb AS (
       |  SELECT vec_id AS c, embedding AS ce FROM embeddings
       |  WHERE vec_id < 16),
       |v AS (SELECT vec_id, embedding AS ve FROM embeddings),
       |dists AS (
       |  SELECT v.vec_id, cb.c, js.j,
       |    list_reduce(
       |      list_prepend(CAST(0 AS DOUBLE),
       |        list_transform(range(1, 17), i -> $sq)),
       |      (a, x) -> a + x) AS d
       |  FROM v CROSS JOIN cb
       |  CROSS JOIN (SELECT unnest(range(4)) AS j) js),
       |best AS (
       |  SELECT vec_id, j, c, CAST(round(d * 1000000) AS BIGINT) AS e6
       |  FROM dists
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, j
       |    ORDER BY d, c) = 1),
       |coded AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE j WHEN 0 THEN c * 4096 WHEN 1 THEN c * 256
       |      WHEN 2 THEN c * 16 ELSE c END) AS BIGINT) AS pq_code,
       |    CAST(sum(e6) AS BIGINT) AS err_e6
       |  FROM best GROUP BY vec_id)
       |SELECT pq_code, count(*) AS n_vectors,
       |  CAST(sum(err_e6) AS BIGINT) AS err_e6_total,
       |  min(vec_id) AS min_vec_id,
       |  CAST(sum(vec_id) AS BIGINT) AS id_checksum
       |FROM coded
       |GROUP BY pq_code
       |ORDER BY pq_code""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q176 — exact ROC-AUC per cohort (the model-eval metric at corpus
  // scale): score = e4 value, positive = 'purchase', negatives =
  // 'view', cohort = user_id % 10. Mann-Whitney formulation with
  // tie-averaged ranks kept INTEGER throughout: per distinct score,
  // twice the positives' average-rank sum is
  // cp · (2·C_before + c + 1); AUC_ppm = (ΣR₂ − np(np+1)) · 10⁶ div
  // (2·np·nn). The corpus aggregates to the (cohort, score) grain
  // map-side FIRST; the rank window runs over that (vastly smaller)
  // table — the q152 shape, never a corpus-wide sort. Fits BIGINT to
  // ~10⁹ rows per cohort; beyond that the sums go DECIMAL(38).
  // ---------------------------------------------------------------------
  private def q176(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
      .filter(col("event_type").isin("purchase", "view"))
      .select((col("user_id") % 10).as("cohort"),
        round(col("value") * 10000).cast("long").as("score"),
        (col("event_type") === "purchase").cast("long").as("pos"))
    val byScore = e.groupBy(col("cohort"), col("score"))
      .agg(sum(col("pos")).as("cp"), count(lit(1)).as("ct"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort")).orderBy(col("score"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    byScore
      .withColumn("c_before", coalesce(sum(col("ct")).over(w), lit(0L)))
      .withColumn("r2", col("cp") * (lit(2L) * col("c_before")
        + col("ct") + lit(1L)))
      .groupBy(col("cohort"))
      .agg(sum(col("cp")).as("np"),
        (sum(col("ct")) - sum(col("cp"))).as("nn"),
        sum(col("r2")).as("r2sum"))
      .select(col("cohort"), col("np"), col("nn"),
        expr("(r2sum - np * (np + 1)) * 1000000 div (2 * np * nn)")
          .as("auc_ppm"))
      .orderBy(col("cohort"))
  }

  private val q176Sql =
    """WITH e AS (
      |  SELECT user_id % 10 AS cohort,
      |    CAST(round(value * 10000) AS BIGINT) AS score,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events WHERE event_type IN ('purchase', 'view')),
      |by_score AS (
      |  SELECT cohort, score, CAST(sum(pos) AS BIGINT) AS cp,
      |    count(*) AS ct
      |  FROM e GROUP BY 1, 2),
      |ranked AS (
      |  SELECT cohort, cp, ct,
      |    CAST(coalesce(sum(ct) OVER (PARTITION BY cohort ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS c_before
      |  FROM by_score),
      |agg AS (
      |  SELECT cohort, CAST(sum(cp) AS BIGINT) AS np,
      |    CAST(sum(ct) - sum(cp) AS BIGINT) AS nn,
      |    CAST(sum(cp * (2 * c_before + ct + 1)) AS BIGINT) AS r2sum
      |  FROM ranked GROUP BY cohort)
      |SELECT cohort, np, nn,
      |  (r2sum - np * (np + 1)) * 1000000 // (2 * np * nn) AS auc_ppm
      |FROM agg
      |ORDER BY cohort""".stripMargin

  // ---------------------------------------------------------------------
  // q177 — TPC-H Q8-shaped national market share: the deepest join in
  // the suite (lineitem → orders → customer → nation → region, and
  // lineitem → supplier → nation again, and lineitem → part — seven
  // relations, nation joined TWICE under different roles). The
  // optimizer-stress gate: every dimension broadcasts, the fact
  // shuffles once for the final (year) aggregate, and the doubled
  // nation dim must resolve without ambiguity. Revenue is exact e4
  // integers; the share is one integer ppm division.
  // ---------------------------------------------------------------------
  private def q177(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val rev = (round(col("l_extendedprice") * 100).cast("long")
      * (lit(100L) - round(col("l_discount") * 100).cast("long")))
    val nCust = t(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"),
        col("n_regionkey").as("cn_region"))
    val nSupp = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val vol = li
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("cn_key"))
      .join(broadcast(t(s, dir, "region")),
        col("cn_region") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .filter(col("p_type") === "PROMO")
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        rev.as("rev_e4"), col("supp_nation"))
    vol.groupBy(col("o_year"))
      .agg(sum(col("rev_e4")).as("total_e4"),
        sum(when(col("supp_nation") === "NATION_7", col("rev_e4"))
          .otherwise(0L)).as("nation_e4"),
        count(lit(1)).as("n_lines"))
      .select(col("o_year"), col("total_e4"), col("nation_e4"),
        expr("nation_e4 * 1000000 div total_e4").as("share_ppm"),
        col("n_lines"))
      .orderBy(col("o_year"))
  }

  private val q177Sql =
    """WITH vol AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) *
      |      (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4,
      |    ns.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation nc ON c_nationkey = nc.n_nationkey
      |  JOIN region   ON nc.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ns ON s_nationkey = ns.n_nationkey
      |  JOIN part     ON l_partkey = p_partkey
      |  WHERE r_name = 'EUROPE' AND p_type = 'PROMO')
      |SELECT o_year, CAST(sum(rev_e4) AS BIGINT) AS total_e4,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev_e4
      |    ELSE 0 END) AS BIGINT) AS nation_e4,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev_e4
      |    ELSE 0 END) AS BIGINT) * 1000000
      |    // CAST(sum(rev_e4) AS BIGINT) AS share_ppm,
      |  count(*) AS n_lines
      |FROM vol
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------------
  // q178 — ADC search over the PQ index (q175's codes at query time):
  // each query precomputes a 4×16 subspace-distance lookup table;
  // every corpus vector's approximate distance is FOUR integer table
  // lookups summed — the IVF-PQ query path, completing brute (q25) /
  // LSH (q26) / IVF (q39) / multi-band (q49) with the
  // compressed-index tier. Integer e6 distances end-to-end, ties on
  // vec_id, TopKPerKey-bounded ranking.
  // ---------------------------------------------------------------------
  private def q178(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = t(s, dir, "embeddings")
    val cb = e.filter(col("vec_id") < 16)
    val q = e.filter(col("vec_id").between(16, 23))
    Similarity.adcTopK(e, q, "vec_id", "embedding", 64, 4,
        cb, "vec_id", "embedding", k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  private val q178Sql = {
    def sq(vec: String) =
      s"($vec[j*16+i]::DOUBLE - ce[j*16+i]::DOUBLE) * " +
        s"($vec[j*16+i]::DOUBLE - ce[j*16+i]::DOUBLE)"
    def fold(vec: String) =
      s"""list_reduce(
         |      list_prepend(CAST(0 AS DOUBLE),
         |        list_transform(range(1, 17), i -> ${sq(vec)})),
         |      (a, x) -> a + x)""".stripMargin
    s"""WITH cb AS (
       |  SELECT vec_id AS c, embedding AS ce FROM embeddings
       |  WHERE vec_id < 16),
       |js AS (SELECT unnest(range(4)) AS j),
       |v AS (SELECT vec_id, embedding AS ve FROM embeddings),
       |dists AS (
       |  SELECT v.vec_id, cb.c, js.j, ${fold("ve")} AS d
       |  FROM v CROSS JOIN cb CROSS JOIN js),
       |codes AS (
       |  SELECT vec_id, j, c FROM dists
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, j
       |    ORDER BY d, c) = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qe
       |  FROM embeddings WHERE vec_id BETWEEN 16 AND 23),
       |qlut AS (
       |  SELECT q.query_id, cb.c, js.j,
       |    CAST(round((${fold("qe")}) * 1000000) AS BIGINT) AS e6
       |  FROM q CROSS JOIN cb CROSS JOIN js),
       |adist AS (
       |  SELECT ql.query_id, co.vec_id,
       |    CAST(sum(ql.e6) AS BIGINT) AS adist_e6
       |  FROM codes co JOIN qlut ql ON ql.j = co.j AND ql.c = co.c
       |  GROUP BY 1, 2)
       |SELECT query_id, vec_id, adist_e6, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adist_e6, vec_id) AS rank
       |  FROM adist)
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q181 — CUSUM change-point localization per user: where in the
  // sequence did the value level shift? The scaled deviation
  // d_i = |n·cum_i − i·cum_n| (the integer cross-multiplied form of
  // |cum_i − i·mean|) peaks at the most likely change point. All
  // integers: prefix sums from one ordered window per user, the
  // peak's POSITION recovered as min(i) where d_i equals the
  // per-user max — two window passes sharing one hash partitioning,
  // then one aggregate; no floats anywhere, so the argmax is
  // tie-stable by construction. q160 says WHETHER two samples drifted;
  // this says WHERE a stream shifted.
  // ---------------------------------------------------------------------
  private def q181(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).select(col("user_id"),
      Exact.epochS(col("ts_s")).as("ts_l"), col("event_id"),
      round(col("value") * 10000).cast("long").as("v"))
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_l"), col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    val pre = e
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("cum", sum(col("v")).over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("v")).over(wAll))
      .withColumn("d", abs(col("n") * col("cum") - col("i") * col("tot")))
      .withColumn("dmax", max(col("d")).over(wAll))
    pre.groupBy(col("user_id"))
      .agg(max(col("n")).as("n"),
        max(col("dmax")).as("max_dev"),
        min(when(col("d") === col("dmax"), col("i"))).as("peak_pos"))
      .orderBy(col("user_id"))
  }

  private val q181Sql =
    s"""WITH e AS (
       |  SELECT user_id, ${epochSSql("ts")} AS ts_l, event_id,
       |    CAST(round(value * 10000) AS BIGINT) AS v
       |  FROM events),
       |pre AS (
       |  SELECT user_id,
       |    CAST(row_number() OVER w AS BIGINT) AS i,
       |    CAST(sum(v) OVER w AS BIGINT) AS cum,
       |    CAST(count(*) OVER wa AS BIGINT) AS n,
       |    CAST(sum(v) OVER wa AS BIGINT) AS tot
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_l, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |         wa AS (PARTITION BY user_id)),
       |dev AS (
       |  SELECT user_id, i, n, abs(n * cum - i * tot) AS d,
       |    max(abs(n * cum - i * tot))
       |      OVER (PARTITION BY user_id) AS dmax
       |  FROM pre)
       |SELECT user_id, max(n) AS n, CAST(max(dmax) AS BIGINT) AS max_dev,
       |  CAST(min(CASE WHEN d = dmax THEN i END) AS BIGINT) AS peak_pos
       |FROM dev
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q185 — the SLA report: p50/p90/p99 per event type in ONE
  // operator call — groupedPercentilesExact's multi-probe form (three
  // percentiles share the two aggregate passes; a naive
  // percentile(v, array(...)) buffers every group's column). Exact
  // interpolated values, e4-rounded (the q37 boundary discipline),
  // plus the integer max for the tail beyond p99.
  // ---------------------------------------------------------------------
  private def q185(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validate
    // NOT pinned (r12 decision): unlike q172 (5+ derivations incl. a
    // joined dev table — pin measured −37%), this query derives the
    // projection only 4× and the A/B read the pin as a consistent
    // +0.14 s — re-decoding two parquet columns is cheaper here than
    // materializing + re-reading the row-format checkpoint.
    val e = ev(s, dir).select(col("event_type"),
      round(col("value") * 10000).cast("long").as("v"))
    val ps = Validate.groupedPercentilesExact(e, col("event_type"),
        "event_type", col("v"), Seq(0.5, 0.9, 0.99),
        Seq("r50", "r90", "r99"))
      .select(col("event_type"), round(col("r50"), 4).as("p50"),
        round(col("r90"), 4).as("p90"), round(col("r99"), 4).as("p99"))
    val mx = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("v")).as("v_max"))
    mx.join(broadcast(ps), Seq("event_type"))
      .select(col("event_type"), col("n"), col("p50"), col("p90"),
        col("p99"), col("v_max"))
      .orderBy(col("event_type"))
  }

  private val q185Sql =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      |  round(quantile_cont(v, 0.5), 4) AS p50,
      |  round(quantile_cont(v, 0.9), 4) AS p90,
      |  round(quantile_cont(v, 0.99), 4) AS p99,
      |  max(v) AS v_max
      |FROM e
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q186 — degree assortativity (does the q144 graph wire hubs to
  // hubs or hubs to leaves?): the degree-degree regression over the
  // directed edge list (each undirected edge counted both ways, the
  // standard convention), computed by Validate.regressionExact — the
  // five power sums are exact DECIMAL(38) integers, so slope and r²
  // are one IEEE expression over identical integers on both engines.
  // The graph-health companion to q144/q158: assortativity < 0 means
  // hub-leaf wiring (dedup clusters, star schemas), > 0 means
  // core-periphery.
  // ---------------------------------------------------------------------
  private def q186(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validate
    val raw = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 6 === 0)
      .select(greatest(col("l_partkey") % 4000, col("l_suppkey") % 4000)
        .as("x"),
        least(col("l_partkey") % 4000, col("l_suppkey") % 4000).as("y"))
    val e = raw.filter(col("x") =!= col("y")).distinct()
    val dirE = e.select(col("x").as("u"), col("y").as("v"))
      .unionByName(e.select(col("y").as("u"), col("x").as("v")))
    val deg = dirE.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val pairs = dirE
      .join(deg.select(col("u").as("uu"), col("d").as("du")),
        col("u") === col("uu"))
      .join(deg.select(col("u").as("vv"), col("d").as("dv")),
        col("v") === col("vv"))
      .select(lit("deg").as("g"), (col("du") * 100).as("dx"),
        (col("dv") * 100).as("dy"))
    Validate.regressionExact(pairs, col("dx"), col("dy"), Seq(col("g")))
  }

  private val q186Sql =
    """WITH raw AS (
      |  SELECT greatest(l_partkey % 4000, l_suppkey % 4000) AS x,
      |         least(l_partkey % 4000, l_suppkey % 4000) AS y
      |  FROM lineitem WHERE l_orderkey % 6 = 0),
      |e AS (SELECT DISTINCT x, y FROM raw WHERE x != y),
      |dire AS (SELECT x AS u, y AS v FROM e
      |         UNION ALL SELECT y, x FROM e),
      |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d
      |        FROM dire GROUP BY u),
      |pairs AS (
      |  SELECT du.d * 100 AS px, dv.d * 100 AS py
      |  FROM dire
      |  JOIN deg du ON dire.u = du.u
      |  JOIN deg dv ON dire.v = dv.u),
      |s AS (
      |  SELECT count(*) AS n_raw, CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(px AS HUGEINT)) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(py AS HUGEINT)) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(px AS HUGEINT) * CAST(py AS HUGEINT)) AS DOUBLE)
      |      AS sxy,
      |    CAST(sum(CAST(px AS HUGEINT) * CAST(px AS HUGEINT)) AS DOUBLE)
      |      AS sxx,
      |    CAST(sum(CAST(py AS HUGEINT) * CAST(py AS HUGEINT)) AS DOUBLE)
      |      AS syy
      |  FROM pairs),
      |c AS (
      |  SELECT n_raw, n, sx, sy,
      |    n * sxy - sx * sy AS covn,
      |    n * sxx - sx * sx AS varxn,
      |    n * syy - sy * sy AS varyn
      |  FROM s)
      |SELECT 'deg' AS g, n_raw AS n,
      |  CAST(round((covn / varxn) * 1000000) AS BIGINT) AS slope_e6,
      |  CAST(round(((sy - (covn / varxn) * sx) / n / CAST(100 AS DOUBLE))
      |    * 1000000) AS BIGINT) AS intercept_e6,
      |  CAST(round(((covn * covn) / (varxn * varyn)) * 1000000) AS BIGINT)
      |    AS r2_e6
      |FROM c""".stripMargin

  // ---------------------------------------------------------------------
  // q187 — IVF-PQ COMPOSED: the full compressed-index ANN query.
  // Coarse quantizer = pqEncode with m=1 over 8 centroids (IVF cell
  // assignment IS product quantization with one subspace); fine
  // quantizer = the q175 4×16 codes; search = q178's ADC restricted
  // to the query's OWN cell (adcTopK restrictCols) — the inverted
  // file bounds candidates, the codes make each candidate four
  // integer lookups. Everything integer/fold-exact, ties on vec_id.
  // ---------------------------------------------------------------------
  private def q187(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = t(s, dir, "embeddings")
    val cents = e.filter(col("vec_id") < 8)
    val cb = e.filter(col("vec_id") < 16)
    val withCell = Similarity.pqEncode(e, "embedding", 64, 1,
        cents, "vec_id", "embedding")
      .withColumnRenamed("code_0", "cell")
      .drop("pq_code", "err_e6")
    val q = withCell.filter(col("vec_id").between(16, 23))
      .select(col("vec_id"), col("embedding"), col("cell"))
    Similarity.adcTopK(withCell, q, "vec_id", "embedding", 64, 4,
        cb, "vec_id", "embedding", k = 3, restrictCols = Seq("cell"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val q187Sql = {
    def sq(vec: String) =
      s"($vec[j*16+i]::DOUBLE - ce[j*16+i]::DOUBLE) * " +
        s"($vec[j*16+i]::DOUBLE - ce[j*16+i]::DOUBLE)"
    def fold(vec: String) =
      s"""list_reduce(
         |      list_prepend(CAST(0 AS DOUBLE),
         |        list_transform(range(1, 17), i -> ${sq(vec)})),
         |      (a, x) -> a + x)""".stripMargin
    val sqFull = "(ve[i]::DOUBLE - cv[i]::DOUBLE) * " +
      "(ve[i]::DOUBLE - cv[i]::DOUBLE)"
    s"""WITH cents AS (
       |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  WHERE vec_id < 8),
       |cb AS (
       |  SELECT vec_id AS c, embedding AS ce FROM embeddings
       |  WHERE vec_id < 16),
       |js AS (SELECT unnest(range(4)) AS j),
       |v AS (SELECT vec_id, embedding AS ve FROM embeddings),
       |celld AS (
       |  SELECT v.vec_id, cents.cid,
       |    list_reduce(
       |      list_prepend(CAST(0 AS DOUBLE),
       |        list_transform(range(1, 65), i -> $sqFull)),
       |      (a, x) -> a + x) AS d
       |  FROM v CROSS JOIN cents),
       |cells AS (
       |  SELECT vec_id, cid AS cell FROM celld
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |    ORDER BY d, cid) = 1),
       |dists AS (
       |  SELECT v.vec_id, cb.c, js.j, ${fold("ve")} AS d
       |  FROM v CROSS JOIN cb CROSS JOIN js),
       |codes AS (
       |  SELECT vec_id, j, c FROM dists
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, j
       |    ORDER BY d, c) = 1),
       |q AS (
       |  SELECT e.vec_id AS query_id, e.embedding AS qe, cl.cell
       |  FROM embeddings e JOIN cells cl USING (vec_id)
       |  WHERE e.vec_id BETWEEN 16 AND 23),
       |qlut AS (
       |  SELECT q.query_id, q.cell, cb.c, js.j,
       |    CAST(round((${fold("qe")}) * 1000000) AS BIGINT) AS e6
       |  FROM q CROSS JOIN cb CROSS JOIN js),
       |adist AS (
       |  SELECT ql.query_id, co.vec_id,
       |    CAST(sum(ql.e6) AS BIGINT) AS adist_e6
       |  FROM codes co
       |  JOIN cells cl ON cl.vec_id = co.vec_id
       |  JOIN qlut ql ON ql.j = co.j AND ql.c = co.c
       |    AND ql.cell = cl.cell
       |  GROUP BY 1, 2)
       |SELECT query_id, vec_id, adist_e6, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adist_e6, vec_id) AS rank
       |  FROM adist)
       |WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q167 — audience-overlap matrix (exact Jaccard between event-type
  // user sets): per-type user sets pre-aggregated to (type, user)
  // grain, pair intersection via one self-join on user, union sizes
  // by inclusion-exclusion — all integers; jaccard_ppm is one integer
  // division. The every-pair shape is types², bounded by the (tiny)
  // type vocabulary, never by users.
  // ---------------------------------------------------------------------
  private def q167(s: SparkSession, dir: String): DataFrame = {
    val tu = ev(s, dir).select(col("event_type"), col("user_id"))
      .distinct().pin()
    val sizes = tu.groupBy(col("event_type")).agg(count(lit(1)).as("sz"))
    val a = tu.select(col("event_type").as("type_a"),
      col("user_id").as("u"))
    val b = tu.select(col("event_type").as("type_b"),
      col("user_id").as("u2"))
    val inter = a.join(b, col("u") === col("u2") &&
        col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("sz").as("sz_a"))), Seq("type_a"))
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("sz").as("sz_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_inter"),
        (col("sz_a") + col("sz_b") - col("n_inter")).as("n_union"),
        expr("n_inter * 1000000 div (sz_a + sz_b - n_inter)")
          .as("jaccard_ppm"))
      .orderBy(col("type_a"), col("type_b"))
  }

  private val q167Sql =
    """WITH tu AS (
      |  SELECT DISTINCT event_type, user_id FROM events),
      |sizes AS (
      |  SELECT event_type, count(*) AS sz FROM tu GROUP BY 1),
      |inter AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    count(*) AS n_inter
      |  FROM tu a JOIN tu b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, n_inter,
      |  sa.sz + sb.sz - n_inter AS n_union,
      |  (n_inter * 1000000) // (sa.sz + sb.sz - n_inter) AS jaccard_ppm
      |FROM inter
      |JOIN sizes sa ON sa.event_type = type_a
      |JOIN sizes sb ON sb.event_type = type_b
      |ORDER BY type_a, type_b""".stripMargin

  // ---------------------------------------------------------------------
  // q168 — longest consecutive-active-day streak per user
  // (gaps-and-islands on the day grid): distinct (user, day), a lag
  // window flags breaks (gap ≠ 1 day), a running flag-sum numbers
  // streaks, two grouped max/count steps finish. Pure integer date
  // arithmetic; the windows run over (user, day) pairs, never events.
  // ---------------------------------------------------------------------
  private def q168(s: SparkSession, dir: String): DataFrame = {
    val ud = ev(s, dir)
      .select(col("user_id"), to_date(col("ts_s")).as("day"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    val streaks = ud
      .withColumn("brk",
        when(datediff(col("day"), lag(col("day"), 1).over(w)) === 1, 0L)
          .otherwise(1L))
      .withColumn("streak_id", sum(col("brk")).over(
        w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("streak_id"))
      .agg(count(lit(1)).as("len"))
    streaks.groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
      .orderBy(col("user_id"))
  }

  private val q168Sql =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id,
       |    CAST(date_trunc('day', date_trunc('second', ts)) AS DATE) AS day
       |  FROM events),
       |flagged AS (
       |  SELECT user_id, day,
       |    CASE WHEN datediff('day',
       |        lag(day) OVER (PARTITION BY user_id ORDER BY day), day) = 1
       |      THEN 0 ELSE 1 END AS brk
       |  FROM ud),
       |streaks AS (
       |  SELECT user_id,
       |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS streak_id
       |  FROM flagged),
       |lens AS (
       |  SELECT user_id, streak_id, count(*) AS len
       |  FROM streaks GROUP BY 1, 2)
       |SELECT user_id, max(len) AS longest_streak,
       |  count(*) AS n_streaks,
       |  CAST(sum(len) AS BIGINT) AS active_days
       |FROM lens
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q165 — pointwise mutual information over the q153 co-occurrence
  // pairs (the collocation / related-items strength score):
  // PMI = ln(n·c_ab / (c_a·c_b)). All counts are exact integers from
  // the same capped projection; the single ln runs once per PAIR
  // (not per row) and is rounded e4 at the edge — the q17/q68
  // transcendental discipline. Item marginals broadcast back.
  // ---------------------------------------------------------------------
  private def q165(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curate
    val e = ev(s, dir).select(col("user_id"),
      (abs(round(col("value"))).cast("long") % 50).as("item"))
    val ui = e.groupBy(col("user_id"), col("item"))
      .agg(count(lit(1)).as("n"))
    val capped = Curate.capPerGroup(ui, Seq("user_id"),
        Seq("n" -> true, "item" -> false), 8)
      .select(col("user_id"), col("item")).pin()
    val nUsers = capped.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_total"))
    val marg = capped.groupBy(col("item")).agg(count(lit(1)).as("c"))
    val a = capped.select(col("user_id").as("u"), col("item").as("item_a"))
    val b = capped.select(col("user_id").as("u2"), col("item").as("item_b"))
    val pairs = a.join(b, col("u") === col("u2") &&
        col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    pairs
      .join(broadcast(marg.select(col("item").as("item_a"),
        col("c").as("c_a"))), Seq("item_a"))
      .join(broadcast(marg.select(col("item").as("item_b"),
        col("c").as("c_b"))), Seq("item_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("item_a"), col("item_b"), col("c_ab"), col("c_a"),
        col("c_b"),
        round(log(col("n_total").cast("double") *
          col("c_ab").cast("double") /
          (col("c_a").cast("double") * col("c_b").cast("double"))) *
          lit(10000.0)).cast("long").as("pmi_e4"))
      .orderBy(col("item_a"), col("item_b"))
  }

  private val q165Sql = {
    def dd(x: String) = s"CAST($x AS DOUBLE)"
    """WITH ui AS (
      |  SELECT user_id, abs(CAST(round(value) AS BIGINT)) % 50 AS item,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |capped AS (
      |  SELECT user_id, item FROM (
      |    SELECT user_id, item,
      |      row_number() OVER (PARTITION BY user_id
      |        ORDER BY n DESC, item) AS rn
      |    FROM ui) WHERE rn <= 8),
      |tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_total
      |        FROM capped),
      |marg AS (SELECT item, count(*) AS c FROM capped GROUP BY item),
      |pairs AS (
      |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS c_ab
      |  FROM capped a JOIN capped b
      |    ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2
      |  HAVING count(*) >= 5)
      |SELECT item_a, item_b, c_ab, ma.c AS c_a, mb.c AS c_b,
      |""".stripMargin +
    s"""  CAST(round(ln(${dd("n_total")} * ${dd("c_ab")}
       |      / (${dd("ma.c")} * ${dd("mb.c")}))
       |    * ${dd("10000")}) AS BIGINT) AS pmi_e4
       |FROM pairs
       |JOIN marg ma ON ma.item = pairs.item_a
       |JOIN marg mb ON mb.item = pairs.item_b
       |CROSS JOIN tot
       |ORDER BY item_a, item_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q166 — chi-square test of independence (event_type × user
  // parity): the contingency table is exact integers in ONE
  // conditional-aggregate pass; expected counts and the chi²
  // statistic are one IEEE expression per cell over those integers
  // (multiply/divide only — no transcendentals), summed AFTER
  // per-cell e6 rounding so the total is order-independent.
  // ---------------------------------------------------------------------
  private def q166(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("event_type"),
      (col("user_id") % 2).as("par"))
    val cells = e.groupBy(col("event_type"), col("par"))
      .agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy(col("event_type")).agg(sum(col("obs")).as("rt"))
    val colT = cells.groupBy(col("par")).agg(sum(col("obs")).as("ct"))
    val tot = cells.agg(sum(col("obs")).as("n"))
    def d(c: String) = col(c).cast("double")
    val expd = d("rt") * d("ct") / d("n")
    cells
      .join(broadcast(rowT), Seq("event_type"))
      .join(broadcast(colT), Seq("par"))
      .crossJoin(broadcast(tot))
      .select(col("event_type"), col("par"), col("obs"),
        round((d("obs") - expd) * (d("obs") - expd) / expd * lit(1000000.0))
          .cast("long").as("chi2_cell_e6"))
      .orderBy(col("event_type"), col("par"))
  }

  private val q166Sql = {
    def dd(x: String) = s"CAST($x AS DOUBLE)"
    s"""WITH cells AS (
       |  SELECT event_type, user_id % 2 AS par, count(*) AS obs
       |  FROM events GROUP BY 1, 2),
       |rt AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS rt
       |       FROM cells GROUP BY 1),
       |ct AS (SELECT par, CAST(sum(obs) AS BIGINT) AS ct
       |       FROM cells GROUP BY 1),
       |tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells)
       |SELECT cells.event_type, cells.par, obs,
       |  CAST(round((${dd("obs")} - ${dd("rt")} * ${dd("ct")} / ${dd("n")})
       |    * (${dd("obs")} - ${dd("rt")} * ${dd("ct")} / ${dd("n")})
       |    / (${dd("rt")} * ${dd("ct")} / ${dd("n")})
       |    * ${dd("1000000")}) AS BIGINT) AS chi2_cell_e6
       |FROM cells
       |JOIN rt ON rt.event_type = cells.event_type
       |JOIN ct ON ct.par = cells.par
       |CROSS JOIN tot
       |ORDER BY cells.event_type, cells.par""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q163 — Gini coefficient per nation (inequality profiling of
  // customer balances): G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
  // ascending-sorted positive balances. Ranks and both sums are
  // exact integers (rank windows are per-nation partitions — never a
  // global sort); only the final G is one IEEE expression over exact
  // integers, emitted e6.
  // ---------------------------------------------------------------------
  private def q163(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("c_acctbal") > 0)
      .select(col("n_name"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_name")).orderBy(col("x"), col("c_custkey"))
    val sums = base
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sum_x"),
        sum(col("i").cast("decimal(38,0)") * col("x").cast("decimal(38,0)"))
          .cast("long").as("sum_ix"))
    def d(c: String) = col(c).cast("double")
    val gini = (lit(2.0) * d("sum_ix") / (d("n") * d("sum_x")) -
      (d("n") + lit(1.0)) / d("n")) * lit(1000000.0)
    sums.select(col("n_name"), col("n"), col("sum_x"), col("sum_ix"),
        round(gini).cast("long").as("gini_e6"))
      .orderBy(col("n_name"))
  }

  private val q163Sql = {
    def dd(x: String) = s"CAST($x AS DOUBLE)"
    s"""WITH base AS (
       |  SELECT n_name, c_custkey,
       |    CAST(round(c_acctbal * 100) AS BIGINT) AS x
       |  FROM customer JOIN nation ON c_nationkey = n_nationkey
       |  WHERE c_acctbal > 0),
       |ranked AS (
       |  SELECT n_name, x,
       |    CAST(row_number() OVER (PARTITION BY n_name
       |      ORDER BY x, c_custkey) AS BIGINT) AS i
       |  FROM base),
       |sums AS (
       |  SELECT n_name, count(*) AS n,
       |    CAST(sum(x) AS BIGINT) AS sum_x,
       |    CAST(sum(i * x) AS BIGINT) AS sum_ix
       |  FROM ranked GROUP BY n_name)
       |SELECT n_name, n, sum_x, sum_ix,
       |  CAST(round((${dd("2")} * ${dd("sum_ix")}
       |      / (${dd("n")} * ${dd("sum_x")})
       |    - (${dd("n")} + ${dd("1")}) / ${dd("n")})
       |    * ${dd("1000000")}) AS BIGINT) AS gini_e6
       |FROM sums
       |ORDER BY n_name""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q164 — churn classification (period-over-period user movement):
  // users active in Jan 1-15 vs Jan 16-31 classified
  // retained / churned / new via one full-outer join of the two
  // per-user activity sets; counts plus id checksums pin exact
  // membership, not just cardinality. Both sides pre-aggregate to
  // user grain before the join — the join moves users, never events.
  // ---------------------------------------------------------------------
  private def q164(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    // cut so BOTH classes are populated in the fixture (the last two
    // days catch only ~90% of users — 17 churn at sf0.01)
    val cut = lit("2024-01-30 00:00:00").cast("timestamp")
    val a = e.filter(col("ts_s") < cut)
      .select(col("user_id")).distinct().withColumn("in_a", lit(1L))
    val b = e.filter(col("ts_s") >= cut)
      .select(col("user_id")).distinct().withColumn("in_b", lit(1L))
    a.join(b, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("in_a").isNotNull && col("in_b").isNotNull, "retained")
          .when(col("in_a").isNotNull, "churned")
          .otherwise("new").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("user_id")).as("id_checksum"))
      .orderBy(col("status"))
  }

  private val q164Sql =
    s"""WITH a AS (
       |  SELECT DISTINCT user_id FROM events
       |  WHERE ${secSql("ts")} < TIMESTAMP '2024-01-30 00:00:00'),
       |b AS (
       |  SELECT DISTINCT user_id FROM events
       |  WHERE ${secSql("ts")} >= TIMESTAMP '2024-01-30 00:00:00'),
       |classed AS (
       |  SELECT coalesce(a.user_id, b.user_id) AS user_id,
       |    CASE WHEN a.user_id IS NOT NULL AND b.user_id IS NOT NULL
       |           THEN 'retained'
       |         WHEN a.user_id IS NOT NULL THEN 'churned'
       |         ELSE 'new' END AS status
       |  FROM a FULL JOIN b ON a.user_id = b.user_id)
       |SELECT status, count(*) AS n_users,
       |  CAST(sum(user_id) AS BIGINT) AS id_checksum
       |FROM classed
       |GROUP BY status
       |ORDER BY status""".stripMargin

  // ---------------------------------------------------------------------
  // q162 — exact rank normalization (the quantile-normalize feature
  // transform): per group, each value mapped to its ppm position
  // (rank−1)·10⁶ div (n−1) — PURE integer arithmetic, so the
  // normalized feature is bit-stable on any engine (percent_rank()
  // is a float division per row; div makes it exact). Total order
  // via event_id tiebreak; summarized per (group, decile) to keep the
  // gate output bounded while pinning every row's normalized value
  // through the sum.
  // ---------------------------------------------------------------------
  private def q162(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("value").asc_nulls_first, col("event_id"))
    val n = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("event_type")))
    ev(s, dir)
      .select(col("event_type"), col("event_id"), col("value"),
        ((row_number().over(w).cast("long") - 1L) * 1000000L).as("num"),
        (n.cast("long") - 1L).as("den"))
      .select(col("event_type"), col("event_id"),
        expr("num div den").as("rank_ppm"))
      .groupBy(col("event_type"), expr("rank_ppm div 100000").as("decile"))
      .agg(count(lit(1)).as("n"),
        sum(col("rank_ppm")).as("ppm_sum"),
        sum(col("event_id")).as("id_checksum"))
      .orderBy(col("event_type"), col("decile"))
  }

  private val q162Sql =
    s"""WITH ranked AS (
       |  SELECT event_type, event_id,
       |    (CAST(row_number() OVER (PARTITION BY event_type
       |        ORDER BY value ASC NULLS FIRST, event_id) AS BIGINT) - 1)
       |      * 1000000 AS num,
       |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) - 1
       |      AS den
       |  FROM events),
       |ppm AS (
       |  SELECT event_type, event_id, num // den AS rank_ppm
       |  FROM ranked)
       |SELECT event_type, rank_ppm // 100000 AS decile,
       |  count(*) AS n,
       |  CAST(sum(rank_ppm) AS BIGINT) AS ppm_sum,
       |  CAST(sum(event_id) AS BIGINT) AS id_checksum
       |FROM ppm
       |GROUP BY 1, 2
       |ORDER BY event_type, decile""".stripMargin

  // ---------------------------------------------------------------------
  // q161 — interval coalescing (union of overlapping intervals per
  // key — the "coverage time" op: each event opens a 30-minute
  // activity interval; overlapping/adjacent intervals merge, and the
  // answer is exact covered seconds + merged-interval count per
  // user). Gaps-and-islands: one lag window flags starts where the
  // new interval begins after the running maximum end; a running sum
  // of flags numbers the islands. All integer epochs — bit-exact.
  // ---------------------------------------------------------------------
  private def q161(s: SparkSession, dir: String): DataFrame = {
    val span = 1800L
    val e = ev(s, dir).select(col("user_id"),
      Exact.epochS(col("ts_s")).as("st"))
      .distinct()
      .withColumn("en", col("st") + span)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("st"))
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val flagged = e
      .withColumn("prev_max_en", max(col("en")).over(wRun))
      .withColumn("is_start",
        when(col("prev_max_en").isNull ||
          col("st") > col("prev_max_en"), 1L).otherwise(0L))
      .withColumn("island", sum(col("is_start")).over(
        w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    flagged
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("st")).as("ivl_start"), max(col("en")).as("ivl_end"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("ivl_end") - col("ivl_start")).as("covered_s"))
      .orderBy(col("user_id"))
  }

  private val q161Sql =
    s"""WITH iv AS (
       |  SELECT DISTINCT user_id, ${epochSSql("ts")} AS st,
       |    ${epochSSql("ts")} + 1800 AS en
       |  FROM events),
       |flagged AS (
       |  SELECT user_id, st, en,
       |    CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY st
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |      OR st > max(en) OVER (PARTITION BY user_id ORDER BY st
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      THEN 1 ELSE 0 END AS is_start
       |  FROM iv),
       |islands AS (
       |  SELECT user_id, st, en,
       |    CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY st
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS island
       |  FROM flagged),
       |merged AS (
       |  SELECT user_id, island,
       |    min(st) AS ivl_start, max(en) AS ivl_end
       |  FROM islands GROUP BY 1, 2)
       |SELECT user_id, count(*) AS n_intervals,
       |  CAST(sum(ivl_end - ivl_start) AS BIGINT) AS covered_s
       |FROM merged
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q159 — Benford first-digit audit (the fraud/forensics op: natural
  // multiplicative data follows P(d)=log10(1+1/d); fabricated numbers
  // don't): exact first-digit counts in one aggregate, the expected
  // probabilities are SCALA-computed literals (no engine
  // transcendentals), and the chi² statistic is one IEEE expression
  // over exact integers and those literals — engine-stable.
  // ---------------------------------------------------------------------
  private def q159(s: SparkSession, dir: String): DataFrame = {
    // explicit floor on BOTH engines: DuckDB's double→BIGINT cast
    // ROUNDS where Spark's truncates — 999.6 must read digit 9, not 1
    val digit = substring(floor(col("o_totalprice")).cast("long")
      .cast("string"), 1, 1).cast("long")
    val counts = t(s, dir, "orders")
      .filter(col("o_totalprice") >= 1.0)
      .groupBy(digit.as("d")).agg(count(lit(1)).as("n_obs"))
    val tot = counts.agg(sum(col("n_obs")).as("n_total"))
    counts.crossJoin(broadcast(tot))
      .select(col("d"), col("n_obs"), col("n_total"),
        // p(d) rendered as a literal double computed in Scala: both
        // engines parse the identical round-trip value
        round((col("n_obs").cast("double") / col("n_total").cast("double"))
          * lit(1000000.0)).cast("long").as("share_e6"),
        round(((col("n_obs").cast("double") -
          col("n_total").cast("double") * benfordP(col("d"))) *
          (col("n_obs").cast("double") -
            col("n_total").cast("double") * benfordP(col("d"))) /
          (col("n_total").cast("double") * benfordP(col("d")))) *
          lit(1000000.0)).cast("long").as("chi2_term_e6"))
      .orderBy(col("d"))
  }

  /** log10(1+1/d) as a CASE over literal doubles — computed once in
    * Scala so neither engine runs a transcendental. */
  private def benfordP(d: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    (1 to 9).foldLeft(lit(0.0)) { (acc, k) =>
      when(d === k, lit(math.log10(1.0 + 1.0 / k))).otherwise(acc)
    }
  }

  private val q159Sql = {
    // literals CAST to DOUBLE: a bare decimal literal is DECIMAL in
    // DuckDB; the cast pins the same nearest-double both engines use
    val pCase = (1 to 9).map(k =>
      s"WHEN d = $k THEN CAST(${math.log10(1.0 + 1.0 / k)} AS DOUBLE)")
      .mkString("CASE ", " ", " ELSE CAST(0.0 AS DOUBLE) END")
    s"""WITH c AS (
       |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
       |      AS VARCHAR), 1, 1) AS BIGINT) AS d,
       |    count(*) AS n_obs
       |  FROM orders WHERE o_totalprice >= 1.0
       |  GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM c)
       |SELECT d, n_obs, n_total,
       |  CAST(round(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE)
       |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS share_e6,
       |  CAST(round((CAST(n_obs AS DOUBLE)
       |      - CAST(n_total AS DOUBLE) * ($pCase))
       |    * (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * ($pCase))
       |    / (CAST(n_total AS DOUBLE) * ($pCase))
       |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS chi2_term_e6
       |FROM c, tot
       |ORDER BY d""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q160 — exact two-sample Kolmogorov–Smirnov drift statistic (the
  // distribution-drift monitor an ML feature pipeline runs between
  // yesterday's and today's data): split events at the time midpoint,
  // compare value CDFs on the e1-quantized grid (~10³ bins — the
  // standard binned-ECDF drift monitor; binning bounds the global
  // cumulative window to the BIN table, so the one ordered window
  // runs over ~10³ rows regardless of data volume). The KS
  // sup-distance is a pure INTEGER maximum — max |cumA·nB − cumB·nA|
  // over the bins — so the decision quantity is bit-exact; only the
  // final normalized ks_e6 divides once.
  // ---------------------------------------------------------------------
  private def q160(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(
      round(col("value") * 10).cast("long").as("v"),
      (col("ts_s") < lit("2024-01-16 00:00:00").cast("timestamp"))
        .cast("long").as("is_a"))
    val perV = e.groupBy(col("v"))
      .agg(sum(col("is_a")).as("ca"), sum(lit(1L) - col("is_a")).as("cb"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        0)
    val cum = perV
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
    val tot = perV.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.crossJoin(broadcast(tot))
      .select(abs(col("cum_a") * col("nb") - col("cum_b") * col("na"))
        .as("diff_scaled"), col("na"), col("nb"))
      .groupBy(col("na"), col("nb"))
      .agg(max(col("diff_scaled")).as("ks_scaled"))
      .select(col("na"), col("nb"), col("ks_scaled"),
        round(col("ks_scaled").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")) *
          lit(1000000.0)).cast("long").as("ks_e6"))
  }

  private val q160Sql =
    """WITH e AS (
      |  SELECT CAST(round(value * 10) AS BIGINT) AS v,
      |    CASE WHEN date_trunc('second', ts) <
      |      TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS is_a
      |  FROM events),
      |perv AS (
      |  SELECT v, CAST(sum(is_a) AS BIGINT) AS ca,
      |    CAST(sum(1 - is_a) AS BIGINT) AS cb
      |  FROM e GROUP BY v),
      |cum AS (
      |  SELECT v, ca, cb,
      |    CAST(sum(ca) OVER w AS BIGINT) AS cum_a,
      |    CAST(sum(cb) OVER w AS BIGINT) AS cum_b
      |  FROM perv
      |  WINDOW w AS (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (
      |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
      |  FROM perv)
      |SELECT na, nb,
      |  max(abs(cum_a * nb - cum_b * na)) AS ks_scaled,
      |  CAST(round(CAST(max(abs(cum_a * nb - cum_b * na)) AS DOUBLE)
      |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
      |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS ks_e6
      |FROM cum, tot
      |GROUP BY na, nb""".stripMargin

  // ---------------------------------------------------------------------
  // q158 — join-key cardinality histogram: per-key frequencies
  // bucketed into log2 bands (1, 2-3, 4-7, ...) with exact counts and
  // row mass per band — the one-scan diagnosis of whether a join key
  // is uniform, long-tailed, or hub-dominated (q138 names the top
  // keys; this shows the whole distribution). Two chained
  // map-side-combined aggregates; the second input is keys-sized.
  // floor(log2(n)) computed as integer bit-length, no float log.
  // ---------------------------------------------------------------------
  private def q158(s: SparkSession, dir: String): DataFrame = {
    val perKey = t(s, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
    perKey
      // floor(log2(n)) as the BIGINT bit length minus one — a pure
      // integer/string computation, no float log to misround at
      // power-of-two boundaries
      .withColumn("band", (length(bin(col("n"))) - 1).cast("long"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
        min(col("n")).as("min_freq"), max(col("n")).as("max_freq"))
      .orderBy(col("band"))
  }

  private val q158Sql =
    """WITH perkey AS (
      |  SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1)
      |SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS band,
      |  count(*) AS n_keys,
      |  CAST(sum(n) AS BIGINT) AS n_rows,
      |  min(n) AS min_freq, max(n) AS max_freq
      |FROM perkey
      |GROUP BY 1
      |ORDER BY band""".stripMargin

  // ---------------------------------------------------------------------
  // q157 — ORDERED string aggregation (listagg / string_agg ... ORDER
  // BY): top-5 customer names per nation by balance, comma-joined in
  // rank order. collect_list is order-NONDETERMINISTIC under
  // parallelism, so the order key rides inside the collected struct
  // and array_sort imposes it after collection — deterministic on any
  // partitioning; the top-5 cut runs through the bounded-heap
  // TopKPerKey plan, not a window sort. Balances are exact 2-decimal
  // values, so the e2-long sort key introduces no ties the double
  // order doesn't have.
  // ---------------------------------------------------------------------
  private def q157(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curate
    val c = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_name"),
        round(col("c_acctbal") * 100).cast("long").as("bal_e2"))
    Curate.capPerGroup(c, Seq("n_name"),
        Seq("bal_e2" -> true, "c_custkey" -> false), 5)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_top"),
        expr("array_join(transform(array_sort(collect_list(" +
          "struct(-bal_e2 AS k1, c_custkey AS k2, c_name AS nm))), " +
          "x -> x.nm), ',')").as("top_names"))
      .orderBy(col("n_name"))
  }

  private val q157Sql =
    """WITH ranked AS (
      |  SELECT n_name, c_custkey, c_name,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_e2,
      |    row_number() OVER (PARTITION BY n_name
      |      ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
      |        c_custkey) AS rn
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
      |SELECT n_name, count(*) AS n_top,
      |  string_agg(c_name, ',' ORDER BY bal_e2 DESC, c_custkey)
      |    AS top_names
      |FROM ranked WHERE rn <= 5
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q156 — single-source BFS shortest-hop distances over the q92
  // nation trade graph: frontier expansion (per-round cost is
  // frontier-sized, not graph-sized; rounds = source eccentricity),
  // all-integer. Oracle: a depth-bounded recursive CTE reduced by
  // min(d) — engine-independent truth for an iterative traversal.
  // ---------------------------------------------------------------------
  private def q156(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val su = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val edges = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .distinct()
    graft.operators.Graph.bfsDistances(edges, source = 0L)
      .orderBy(col("node"))
  }

  private val q156Sql =
    """WITH RECURSIVE edges AS (
      |  SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey),
      |reach(node, d) AS (
      |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS d
      |  UNION
      |  SELECT CAST(e.dst AS BIGINT), r.d + 1
      |  FROM reach r JOIN edges e ON r.node = e.src
      |  WHERE r.d < 30)
      |SELECT node, CAST(min(d) AS BIGINT) AS dist
      |FROM reach
      |GROUP BY node
      |ORDER BY node""".stripMargin

  // ---------------------------------------------------------------------
  // q153 — bipartite co-occurrence projection (the recommender /
  // related-items op): users × item-buckets projected onto item-item
  // co-occurrence counts. The quadratic edge is capped INSIDE the
  // plan: each user contributes at most their top-8 items (by
  // engagement count, deterministic tiebreak) through the
  // bounded-heap TopKPerKey plan, so a power user yields C(8,2)=28
  // pairs instead of degree² — the cap real recommender pipelines
  // apply for exactly this reason. Keys renamed apart before the
  // self-join (the Dataset self-join ambiguity trap).
  // ---------------------------------------------------------------------
  private def q153(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curate
    val e = ev(s, dir).select(col("user_id"),
      (abs(round(col("value"))).cast("long") % 50).as("item"))
    val ui = e.groupBy(col("user_id"), col("item"))
      .agg(count(lit(1)).as("n"))
    val capped = Curate.capPerGroup(ui, Seq("user_id"),
        Seq("n" -> true, "item" -> false), 8)
      .select(col("user_id"), col("item"))
    val a = capped.select(col("user_id").as("u"), col("item").as("item_a"))
    val b = capped.select(col("user_id").as("u2"), col("item").as("item_b"))
    a.join(b, col("u") === col("u2") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= 3)
      .orderBy(col("n_users").desc, col("item_a"), col("item_b"))
  }

  private val q153Sql =
    """WITH ui AS (
      |  SELECT user_id, abs(CAST(round(value) AS BIGINT)) % 50 AS item,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |capped AS (
      |  SELECT user_id, item FROM (
      |    SELECT user_id, item,
      |      row_number() OVER (PARTITION BY user_id
      |        ORDER BY n DESC, item) AS rn
      |    FROM ui) WHERE rn <= 8)
      |SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_users
      |FROM capped a JOIN capped b
      |  ON a.user_id = b.user_id AND a.item < b.item
      |GROUP BY 1, 2
      |HAVING count(*) >= 3
      |ORDER BY n_users DESC, item_a, item_b""".stripMargin

  // ---------------------------------------------------------------------
  // q154 — A/B experiment readout with Welch's t: variants from user
  // parity, metric sums exact (e4 longs; second moment DECIMAL(38)
  // emitted as a BIGINT e8), the t statistic ONE IEEE expression over
  // those exact integers (sqrt is correctly-rounded by IEEE-754, so
  // it is engine-stable, unlike ln/sin). One conditional-aggregate
  // pass — no shuffle beyond the single reduction.
  // ---------------------------------------------------------------------
  private def q154(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select((col("user_id") % 2).as("variant"),
      round(col("value") * 10000).cast("long").as("v"))
    def side(i: Int, c: org.apache.spark.sql.Column) =
      sum(when(col("variant") === i, c).otherwise(lit(null)))
    val sums = e.agg(
      side(0, lit(1L)).as("n0"), side(1, lit(1L)).as("n1"),
      side(0, col("v")).as("s0_e4"), side(1, col("v")).as("s1_e4"),
      side(0, col("v").cast("decimal(38,0)") * col("v").cast("decimal(38,0)"))
        .cast("long").as("ss0_e8"),
      side(1, col("v").cast("decimal(38,0)") * col("v").cast("decimal(38,0)"))
        .cast("long").as("ss1_e8"))
    def d(c: String) = col(c).cast("double")
    def se(n: String, sm: String, ss: String) =
      (d(ss) - d(sm) * d(sm) / d(n)) / (d(n) - lit(1.0)) / d(n)
    val t = (d("s0_e4") / d("n0") - d("s1_e4") / d("n1")) /
      sqrt(se("n0", "s0_e4", "ss0_e8") + se("n1", "s1_e4", "ss1_e8"))
    sums.select(col("n0"), col("n1"), col("s0_e4"), col("s1_e4"),
      col("ss0_e8"), col("ss1_e8"),
      round(t * lit(1000000.0)).cast("long").as("t_e6"))
  }

  private val q154Sql = {
    def dd(x: String) = s"CAST($x AS DOUBLE)"
    def se(n: String, sm: String, ss: String) =
      s"(${dd(ss)} - ${dd(sm)} * ${dd(sm)} / ${dd(n)}) / " +
        s"(${dd(n)} - ${dd("1")}) / ${dd(n)}"
    s"""WITH e AS (
       |  SELECT user_id % 2 AS variant,
       |    CAST(round(value * 10000) AS BIGINT) AS v
       |  FROM events),
       |sums AS (
       |  SELECT
       |    CAST(count(CASE WHEN variant = 0 THEN 1 END) AS BIGINT) AS n0,
       |    CAST(count(CASE WHEN variant = 1 THEN 1 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN variant = 0 THEN v END) AS BIGINT) AS s0_e4,
       |    CAST(sum(CASE WHEN variant = 1 THEN v END) AS BIGINT) AS s1_e4,
       |    CAST(sum(CASE WHEN variant = 0 THEN v * v END) AS BIGINT)
       |      AS ss0_e8,
       |    CAST(sum(CASE WHEN variant = 1 THEN v * v END) AS BIGINT)
       |      AS ss1_e8
       |  FROM e)
       |SELECT n0, n1, s0_e4, s1_e4, ss0_e8, ss1_e8,
       |  CAST(round((${dd("s0_e4")} / ${dd("n0")} - ${dd("s1_e4")} /
       |      ${dd("n1")}) /
       |    sqrt(${se("n0", "s0_e4", "ss0_e8")} +
       |      ${se("n1", "s1_e4", "ss1_e8")})
       |    * ${dd("1000000")}) AS BIGINT) AS t_e6
       |FROM sums""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q146 — Spearman rank correlation (monotonic trend of value over
  // time, per event type): row_number ranks with an event_id tiebreak
  // make both orders total, so the no-ties closed form
  // ρ = 1 − 6Σd²/(n(n²−1)) applies with Σd² an exact integer; the
  // single float step runs over exact integers on both engines.
  // ---------------------------------------------------------------------
  private def q146(s: SparkSession, dir: String): DataFrame =
    graft.operators.Validate.spearmanExact(
        ev(s, dir), Seq("event_type"),
        x = col("ts_s"), y = col("value"), tie = col("event_id"))
      .orderBy(col("event_type"))

  private val q146Sql =
    s"""WITH ranked AS (
       |  SELECT event_type,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY ${secSql("ts")} ASC NULLS FIRST, event_id) AS rx,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY value ASC NULLS FIRST, event_id) AS ry
       |  FROM events),
       |sums AS (
       |  SELECT event_type, count(*) AS n,
       |    CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2
       |  FROM ranked
       |  GROUP BY event_type
       |  HAVING count(*) > 1)
       |SELECT event_type, n, sum_d2,
       |  CAST(round((CAST(1 AS DOUBLE) - CAST(6 AS DOUBLE)
       |      * CAST(sum_d2 AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       |         - CAST(1 AS DOUBLE))))
       |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS rho_e6
       |FROM sums
       |ORDER BY event_type""".stripMargin

  private val q92Sql = {
    def iter(prev: String, name: String) =
      s"""$name AS (
         |  SELECT nd.node,
         |    CAST(150000000 // n + (850 * COALESCE(ct.c, 0)) // 1000
         |      AS BIGINT) AS r
         |  FROM nodes nd CROSS JOIN cnt
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(sum(($prev.r * e.w) // o.ow) AS BIGINT) AS c
         |    FROM edges e JOIN outw o ON e.src = o.src
         |    JOIN $prev ON $prev.node = e.src
         |    GROUP BY e.dst) ct ON ct.node = nd.node)""".stripMargin
    s"""WITH edges AS (
       |  SELECT s_nationkey AS src, c_nationkey AS dst,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY 1, 2),
       |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow
       |         FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM edges
       |  UNION ALL SELECT dst FROM edges)),
       |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |r0 AS (SELECT node, CAST(1000000000 // n AS BIGINT) AS r
       |       FROM nodes CROSS JOIN cnt),
       |${iter("r0", "it1")},
       |${iter("it1", "it2")},
       |${iter("it2", "it3")}
       |SELECT CAST(it3.node AS BIGINT) AS nationkey, n_name,
       |  it3.r AS rank_e9
       |FROM it3 JOIN nation ON n_nationkey = it3.node
       |ORDER BY nationkey""".stripMargin
  }

  private def q54(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val discBp = round(col("l_discount") * 100).cast("long")
    val asia = broadcast(
      t(s, dir, "region").filter(col("r_name") === "ASIA")
        .join(t(s, dir, "nation"),
          col("r_regionkey") === col("n_regionkey"))
        .select(col("n_nationkey"), col("n_name")))
    val sup = broadcast(
      t(s, dir, "supplier").join(asia,
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name")))
    t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg((sum(cents * (lit(100L) - discBp)) / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q54Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
      |    / 10000.0 AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q62 — the custom Catalyst expression through the SQL frontend:
  // `haversine_km` is registered by GraftExtensions (injectFunction),
  // so plain SQL reaches the fused codegen'd native expression.
  // Distance-to-Zurich bands over synthesized customer coordinates;
  // the oracle recomputes with DuckDB's composed trig formula — a
  // cross-check of the native expression, the SQL registration, and
  // the band bucketing at once.
  // ---------------------------------------------------------------------
  private def q62(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.registerTestTables(s, dir)
    s.sql(
      """SELECT CAST(floor(round(haversine_km(
        |    abs(c_acctbal) % 90,
        |    (CAST(c_custkey AS DOUBLE) * 7.1) % 180,
        |    47.3769, 8.5417), 4) / 2000) AS BIGINT) AS dist_band,
        |  count(*) AS n,
        |  min(c_custkey) AS min_key,
        |  max(c_custkey) AS max_key
        |FROM customer
        |GROUP BY 1
        |ORDER BY dist_band""".stripMargin)
  }

  private val q62Sql = {
    val lat = "fmod(abs(c_acctbal), 90)"
    val lon = "fmod(CAST(c_custkey AS DOUBLE) * 7.1, 180)"
    s"""SELECT CAST(floor(round(
       |    ${graft.functions.Geo.haversineKmSql(lat, lon, "47.3769", "8.5417")}, 4)
       |    / 2000) AS BIGINT) AS dist_band,
       |  count(*) AS n,
       |  min(c_custkey) AS min_key,
       |  max(c_custkey) AS max_key
       |FROM customer
       |GROUP BY 1
       |ORDER BY dist_band""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_sql_frontend" -> (q35 _),
    "q36_minmax_by" -> (q36 _),
    "q37_percentiles" -> (q37 _),
    "q38_grouping_sets" -> (q38 _),
    "q39_ann_ivf" -> (q39 _),
    "q40_embedding_pairs" -> (q40 _),
    "q41_approx_distinct" -> (q41 _),
    "q116_approx_quantile" -> (q116 _),
    "q42_salted_agg" -> (q42 _),
    "q43_pivot" -> (q43 _),
    "q44_posexplode" -> (q44 _),
    "q45_array_agg" -> (q45 _),
    "q46_range_join" -> (q46 _),
    "q47_unpivot" -> (q47 _),
    "q48_scalar_subquery" -> (q48 _),
    "q49_ann_multiband" -> (q49 _),
    "q54_tpch_q5" -> (q54 _),
    "q92_pagerank" -> (q92 _),
    "q62_sql_native_fn" -> (q62 _),
    "q69_dedup_clusters" -> (q69 _),
    "q143_cc_star" -> (q143 _),
    "q331_leakage_safe_splits" -> (q331 _),
    "q144_triangles" -> (q144 _),
    "q146_spearman" -> (q146 _),
    "q153_cooccurrence" -> (q153 _),
    "q154_ab_welch" -> (q154 _),
    "q156_bfs_sssp" -> (q156 _),
    "q157_listagg" -> (q157 _),
    "q158_key_cardinality" -> (q158 _),
    "q159_benford" -> (q159 _),
    "q160_ks_drift" -> (q160 _),
    "q161_interval_coalesce" -> (q161 _),
    "q162_rank_normalize" -> (q162 _),
    "q163_gini" -> (q163 _),
    "q164_churn" -> (q164 _),
    "q165_pmi" -> (q165 _),
    "q166_chi2" -> (q166 _),
    "q167_audience_overlap" -> (q167 _),
    "q168_streaks" -> (q168 _),
    "q169_burst_detect" -> (q169 _),
    "q170_seasonality" -> (q170 _),
    "q172_mad_outliers" -> (q172 _),
    "q175_pq_encode" -> (q175 _),
    "q176_roc_auc" -> (q176 _),
    "q177_market_share" -> (q177 _),
    "q178_adc_search" -> (q178 _),
    "q181_cusum" -> (q181 _),
    "q185_sla_report" -> (q185 _),
    "q186_assortativity" -> (q186 _),
    "q187_ivf_pq" -> (q187 _),
    "q191_local_clustering" -> (q191 _),
    "q193_acf" -> (q193 _),
    "q194_calibration" -> (q194 _),
    "q200_assoc_rules" -> (q200 _),
    "q203_rolling_distinct" -> (q203 _),
    "q209_haar_rollup" -> (q209 _),
    "q210_skyline" -> (q210 _),
    "q212_clamped_stock" -> (q212 _),
    "q214_two_hop" -> (q214 _),
    "q216_rolling_corr" -> (q216 _),
    "q218_point_neighbors" -> (q218 _),
    "q219_decayed_popularity" -> (q219 _),
    "q220_share_dominance" -> (q220 _),
    "q221_personalized_pagerank" -> (q221 _))

  val oracle: Map[String, String] = Map(
    "q35_sql_frontend" -> q35Sql,
    "q41_approx_distinct" -> q41Sql,
    "q116_approx_quantile" -> q116Sql,
    "q36_minmax_by" -> q36Sql,
    "q37_percentiles" -> q37Sql,
    "q38_grouping_sets" -> q38Sql,
    "q39_ann_ivf" -> q39Sql,
    "q40_embedding_pairs" -> q40Sql,
    "q42_salted_agg" -> q42Sql,
    "q43_pivot" -> q43Sql,
    "q44_posexplode" -> q44Sql,
    "q45_array_agg" -> q45Sql,
    "q46_range_join" -> q46Sql,
    "q47_unpivot" -> q47Sql,
    "q48_scalar_subquery" -> q48Sql,
    "q49_ann_multiband" -> q49Sql,
    "q54_tpch_q5" -> q54Sql,
    "q92_pagerank" -> q92Sql,
    "q62_sql_native_fn" -> q62Sql,
    "q69_dedup_clusters" -> q69Sql,
    "q143_cc_star" -> q69Sql,
    "q331_leakage_safe_splits" -> q331Sql,
    "q144_triangles" -> q144Sql,
    "q146_spearman" -> q146Sql,
    "q153_cooccurrence" -> q153Sql,
    "q154_ab_welch" -> q154Sql,
    "q156_bfs_sssp" -> q156Sql,
    "q157_listagg" -> q157Sql,
    "q158_key_cardinality" -> q158Sql,
    "q159_benford" -> q159Sql,
    "q160_ks_drift" -> q160Sql,
    "q161_interval_coalesce" -> q161Sql,
    "q162_rank_normalize" -> q162Sql,
    "q163_gini" -> q163Sql,
    "q164_churn" -> q164Sql,
    "q165_pmi" -> q165Sql,
    "q166_chi2" -> q166Sql,
    "q167_audience_overlap" -> q167Sql,
    "q168_streaks" -> q168Sql,
    "q169_burst_detect" -> q169Sql,
    "q170_seasonality" -> q170Sql,
    "q172_mad_outliers" -> q172Sql,
    "q175_pq_encode" -> q175Sql,
    "q176_roc_auc" -> q176Sql,
    "q177_market_share" -> q177Sql,
    "q178_adc_search" -> q178Sql,
    "q181_cusum" -> q181Sql,
    "q185_sla_report" -> q185Sql,
    "q186_assortativity" -> q186Sql,
    "q187_ivf_pq" -> q187Sql,
    "q191_local_clustering" -> q191Sql,
    "q193_acf" -> q193Sql,
    "q194_calibration" -> q194Sql,
    "q200_assoc_rules" -> q200Sql,
    "q203_rolling_distinct" -> q203Sql,
    "q209_haar_rollup" -> q209Sql,
    "q210_skyline" -> q210Sql,
    "q212_clamped_stock" -> q212Sql,
    "q214_two_hop" -> q214Sql,
    "q216_rolling_corr" -> q216Sql,
    "q218_point_neighbors" -> q218Sql,
    "q219_decayed_popularity" -> q219Sql,
    "q220_share_dominance" -> q220Sql,
    "q221_personalized_pagerank" -> q221Sql)
}
