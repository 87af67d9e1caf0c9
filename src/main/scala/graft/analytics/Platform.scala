package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{PortableHash, Vectors}
import graft.operators.{Curate, Dedup, Graph}
import graft.core.PlanStats.Pinned

/** Platform tier (session 6): the operators a production data platform
  * runs ON TOP of the curation/graph/privacy tiers — link prediction
  * (Adamic–Adar), community structure (label propagation), semantic
  * deduplication (SemDeDup-style cluster-scoped near-dup), importance
  * reweighting (DSIR-style hashed-n-gram log-ratio weights), temporal
  * cost allocation, snapshot integrity trees, and calibrated
  * differentially-private releases. Integer-exact or
  * identical-IEEE-expression outputs throughout, same as the rest of
  * the gate.
  */
object Platform {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ---------------------------------------------------------------------
  // q246 — Adamic–Adar link prediction: for non-adjacent node pairs of
  // the part↔supplier co-occurrence graph, the sum over common
  // neighbors of 1/ln(degree) — the classic weighted-common-neighbor
  // score (promiscuous mids count less), top-25. Runs through
  // [[graft.operators.Graph.adamicAdar]]: mids capped at degree 64, so
  // wedge fan-out is bounded at cap² per mid and the join needs no
  // salting on a power-law graph — the cap IS the scale contract
  // (a hub's 1/ln(deg) weight is noise; production link prediction
  // df-prunes hubs for exactly this reason). Scores are e6 longs
  // summed exactly; ln over ≤63 distinct degrees is IEEE-identical
  // across engines.
  // ---------------------------------------------------------------------
  private def q246(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 10 === 3)
      .select((col("l_partkey") % 4000).as("a"),
        (col("l_suppkey") % 4000).as("b"))
      .filter(col("a") =!= col("b"))
    val und = raw
      .unionByName(raw.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    Graph.adamicAdar(und, degCap = 64)
      .orderBy(col("aa_e6").desc, col("u"), col("v"))
      .limit(25)
  }

  private val q246Sql =
    """WITH raw AS (
      |  SELECT l_partkey % 4000 AS a, l_suppkey % 4000 AS b
      |  FROM lineitem
      |  WHERE l_orderkey % 10 = 3 AND l_partkey % 4000 <> l_suppkey % 4000),
      |e AS (SELECT a, b FROM raw UNION SELECT b, a FROM raw),
      |deg AS (SELECT a AS mid, count(*) AS deg FROM e GROUP BY a),
      |w AS (SELECT mid, CAST(round(1000000.0 / ln(deg)) AS BIGINT) AS w_e6
      |      FROM deg WHERE deg BETWEEN 2 AND 64),
      |wed AS (
      |  SELECT l.a AS u, r.b AS v, w.w_e6
      |  FROM e l JOIN e r ON l.b = r.a JOIN w ON w.mid = l.b
      |  WHERE l.a < r.b),
      |sc AS (SELECT u, v, count(*) AS n_common,
      |         CAST(sum(w_e6) AS BIGINT) AS aa_e6
      |       FROM wed GROUP BY 1, 2),
      |cand AS (
      |  SELECT sc.* FROM sc
      |  LEFT JOIN e ON e.a = sc.u AND e.b = sc.v
      |  WHERE e.a IS NULL)
      |SELECT u, v, n_common, aa_e6 FROM cand
      |ORDER BY aa_e6 DESC, u, v
      |LIMIT 25""".stripMargin

  // ---------------------------------------------------------------------
  // q247 — label-propagation communities: 4 synchronous rounds of
  // "adopt your neighbors' most frequent label, ties to the smallest"
  // over the mod-2000 co-occurrence graph, via
  // [[graft.operators.Graph.labelPropagation]]. The FIXED round count
  // is the determinism contract (synchronous LPA can 2-cycle, so a
  // convergence loop would be engine-dependent); the per-node pick is
  // one integer arg-max, exact under any aggregation order. The
  // oracle unrolls the same 4 rounds as chained CTEs. Output is the
  // community census — label, size, membership checksum.
  // ---------------------------------------------------------------------
  private val LpaRounds = 4

  private def q247(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 10 === 7)
      .select((col("l_partkey") % 2000).as("a"),
        (col("l_suppkey") % 2000).as("b"))
      .filter(col("a") =!= col("b"))
    val und = raw
      .unionByName(raw.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    Graph.labelPropagation(und, LpaRounds)
      .groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("node")).as("id_checksum"))
      .orderBy(col("community"))
  }

  private val q247Sql = {
    val rounds = (1 to LpaRounds).map { i =>
      s"""c$i AS (
         |  SELECT e.a, l.lab, count(*) AS c
         |  FROM e JOIN l${i - 1} l ON l.node = e.b
         |  GROUP BY 1, 2),
         |l$i AS (
         |  SELECT a AS node,
         |    arg_max(lab, c * 10000000 + (9999999 - lab)) AS lab
         |  FROM c$i GROUP BY a)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS (
       |  SELECT l_partkey % 2000 AS a, l_suppkey % 2000 AS b
       |  FROM lineitem
       |  WHERE l_orderkey % 10 = 7 AND l_partkey % 2000 <> l_suppkey % 2000),
       |e AS (SELECT a, b FROM raw UNION SELECT b, a FROM raw),
       |l0 AS (SELECT DISTINCT a AS node, a AS lab FROM e),
       |$rounds
       |SELECT lab AS community, count(*) AS n_members,
       |  CAST(sum(node) AS BIGINT) AS id_checksum
       |FROM l$LpaRounds
       |GROUP BY lab
       |ORDER BY community""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q248 — SemDeDup-style semantic dedup (Abbas et al. 2023): assign
  // every embedding to its nearest of 8 fixed centers (q74's E-step),
  // generate near-dup pairs ONLY within (center, sign-LSH bucket)
  // blocks — the cluster-scoped blocking that makes semantic dedup
  // O(n²/k·b) instead of O(n²) — close them into components
  // (large-star/small-star), keep the min-id representative per
  // component, and report the keep/drop census per center. The
  // composed q74→q40→q143 pipeline, which is exactly what SemDeDup
  // is: k-means + within-cluster cosine dedup.
  // ---------------------------------------------------------------------
  private def q248(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val centers = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("center_id"), col("embedding").as("cvec"))
    val assigned = Curate.assignToCenters(
      e.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", centers, "center_id", "cvec")
    // (vec, center, bucket): the block key; checkpointed — feeds the
    // pair self-join twice plus the final census
    val withB = e.select(col("vec_id"), col("embedding"),
        Vectors.signBucket(col("embedding")).as("bucket"))
      .join(assigned.select(col("vec_id"), col("center_id")), Seq("vec_id"))
      .pin()
    val x = withB.select(col("center_id"), col("bucket"),
      col("vec_id").as("id_a"), col("embedding").as("va"))
    val y = withB.select(col("center_id"), col("bucket"),
      col("vec_id").as("id_b"), col("embedding").as("vb"))
    val pairs = x.join(y, Seq("center_id", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Vectors.cosineNative(col("va"), col("vb")), 4).as("cos"))
      .filter(col("cos") >= 0.3)
      .select(col("id_a"), col("id_b"))
      .pin() // r12: CC derives its input twice (edge + node pins)
    val cc = Dedup.connectedComponentsStar(pairs)
    withB.select(col("vec_id"), col("center_id"))
      .join(cc.select(col("id").as("vec_id"), col("cluster")),
        Seq("vec_id"), "left")
      .withColumn("kept",
        col("cluster").isNull || col("cluster") === col("vec_id"))
      .groupBy(col("center_id"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
        sum(when(col("kept"), col("vec_id")).otherwise(0L))
          .as("kept_checksum"))
      .orderBy(col("center_id"))
  }

  private val q248Sql = {
    val cosAssign =
      "list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) / " +
        "nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) * " +
        "list_dot_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[])), 0)"
    val bucket = Vectors.signBucketSql("embedding")
    val cosPair = Vectors.cosineSql("x.embedding", "y.embedding")
    s"""WITH RECURSIVE centers AS (
       |  SELECT vec_id AS center_id, embedding AS cvec
       |  FROM embeddings WHERE vec_id < 8),
       |scored AS (
       |  SELECT e.vec_id, c.center_id, $cosAssign AS cos
       |  FROM embeddings e, centers c),
       |assigned AS (
       |  SELECT vec_id, center_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, center_id) AS rn FROM scored)
       |  WHERE rn = 1),
       |w AS (
       |  SELECT e.vec_id, e.embedding, $bucket AS bucket, a.center_id
       |  FROM embeddings e JOIN assigned a USING (vec_id)),
       |p AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM w x JOIN w y
       |    ON x.center_id = y.center_id AND x.bucket = y.bucket
       |    AND x.vec_id < y.vec_id
       |  WHERE round($cosPair, 4) >= 0.3),
       |edges AS (SELECT id_a AS a, id_b AS b FROM p
       |          UNION ALL SELECT id_b, id_a FROM p),
       |reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a),
       |comp AS (
       |  SELECT src AS vec_id,
       |    LEAST(src, min(dst)) AS cluster
       |  FROM reach GROUP BY src)
       |SELECT w.center_id, count(*) AS n_vectors,
       |  CAST(sum(CASE WHEN comp.cluster IS NOT NULL
       |    AND comp.cluster <> w.vec_id THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dropped,
       |  CAST(sum(CASE WHEN comp.cluster IS NULL
       |    OR comp.cluster = w.vec_id THEN w.vec_id ELSE 0 END) AS BIGINT)
       |    AS kept_checksum
       |FROM w LEFT JOIN comp USING (vec_id)
       |GROUP BY w.center_id
       |ORDER BY center_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q249 — DSIR-style importance weights (Xie et al. 2023): hashed
  // unigram features (1024 buckets, portable md5 hash), a
  // Laplace-smoothed bucket LM for the target slice (lang='en') and
  // the raw corpus, per-bucket log-likelihood ratios at e6, and per
  // document the feature-count-weighted integer sum of ratios — the
  // importance weight data selection ranks by. Per-source weight
  // census out.
  //
  // Scale shape: the corpus tokenizes ONCE to (doc, bucket) grain
  // with map-side partial counts; both LMs are 1024-row aggregates;
  // the ratio table broadcasts back into the doc-grain scan. The only
  // corpus-sized shuffles are the two fixed-grain aggregations —
  // nothing quadratic, nothing driver-side.
  // ---------------------------------------------------------------------
  private def q249(s: SparkSession, dir: String): DataFrame = {
    val db = docs(s, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), col("source"), col("lang"),
        pmod(PortableHash.hash60(col("w")), lit(1024L)).as("b"))
      .pin()
    val docB = db.groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
    val tgt = db.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("tc"))
    val raw = db.groupBy(col("b")).agg(count(lit(1)).as("rc"))
    val nt = db.filter(col("lang") === "en").agg(count(lit(1)).as("nt"))
    val nr = db.agg(count(lit(1)).as("nr"))
    val lm = raw.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("tc"))
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("b"), expr(
        "CAST(round((ln((tc + 1.0) / (nt + 1024.0)) - " +
          "ln((rc + 1.0) / (nr + 1024.0))) * 1000000) AS BIGINT)")
        .as("lr_e6"))
    val docW = docB.join(broadcast(lm), Seq("b"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c") * col("lr_e6")).as("w_e6"))
    docW.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w_e6")).as("sum_w_e6"),
        min(col("w_e6")).as("min_w_e6"),
        max(col("w_e6")).as("max_w_e6"))
      .orderBy(col("source"))
  }

  private val q249Sql = {
    val h = PortableHash.hash60DuckSql("w")
    s"""WITH db AS (
       |  SELECT doc_id, source, lang, $h % 1024 AS b
       |  FROM (SELECT doc_id, source, lang,
       |          unnest(string_split(text, ' ')) AS w
       |        FROM documents)
       |  WHERE len(w) > 0),
       |docb AS (SELECT doc_id, source, b, count(*) AS c
       |         FROM db GROUP BY 1, 2, 3),
       |tgt AS (SELECT b, count(*) AS tc FROM db
       |        WHERE lang = 'en' GROUP BY b),
       |rawc AS (SELECT b, count(*) AS rc FROM db GROUP BY b),
       |nt AS (SELECT count(*) AS nt FROM db WHERE lang = 'en'),
       |nr AS (SELECT count(*) AS nr FROM db),
       |lm AS (
       |  SELECT rawc.b,
       |    CAST(round((ln((COALESCE(tc, 0) + 1.0) / (nt + 1024.0)) -
       |      ln((rc + 1.0) / (nr + 1024.0))) * 1000000) AS BIGINT)
       |      AS lr_e6
       |  FROM rawc LEFT JOIN tgt ON rawc.b = tgt.b, nt, nr),
       |docw AS (
       |  SELECT doc_id, source, CAST(sum(c * lr_e6) AS BIGINT) AS w_e6
       |  FROM docb JOIN lm USING (b)
       |  GROUP BY 1, 2)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(w_e6) AS BIGINT) AS sum_w_e6,
       |  CAST(min(w_e6) AS BIGINT) AS min_w_e6,
       |  CAST(max(w_e6) AS BIGINT) AS max_w_e6
       |FROM docw
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q250 — fulfillment-interval cost allocation: each line item's
  // value spreads uniformly over the days from order to ship, rolled
  // up per calendar month — the accrual-accounting allocation every
  // revenue warehouse runs (a shipment spanning a month boundary
  // splits its revenue). Exact integers: per-day share is value div
  // n_days with the remainder assigned to the FIRST day, so per-line
  // allocations sum to the line's value to the cent by construction.
  //
  // Scale shape: one equi-join orders→lineitem, then a per-row
  // Generate at MONTH grain — the per-day semantics collapse to the
  // closed form (value div nd)·overlap_days + remainder·[first
  // month], so the explode emits interval_days/30 rows instead of
  // interval_days (the fixture's ~830-day mean fulfillment window
  // made the naive day-grain Generate a 260 M-row, 57 s wall — the
  // month-grain closed form is the identical allocation at 1/28th
  // the Generate output). No window functions over the fact table.
  // ---------------------------------------------------------------------
  private def q250(s: SparkSession, dir: String): DataFrame = {
    // DateType throughout the hot path (day/month arithmetic on dates
    // is pure int32 work; the same ops on timestamps route through
    // zone-aware micros); the month re-emits as timestamp at the end
    // to match the oracle's date_trunc type
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("value_e2"),
        to_date(col("l_shipdate")).as("end_d"))
    val o = t(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"),
        to_date(col("o_orderdate")).as("start_d"))
    li.join(o, Seq("l_orderkey"))
      .filter(col("end_d") >= col("start_d"))
      .withColumn("nd", (datediff(col("end_d"), col("start_d")) + 1)
        .cast("long"))
      .withColumn("month", explode(sequence(
        trunc(col("start_d"), "MM"),
        trunc(col("end_d"), "MM"), expr("INTERVAL 1 MONTH"))))
      .withColumn("ov", (datediff(
        least(col("end_d"), date_sub(add_months(col("month"), 1), 1)),
        greatest(col("start_d"), col("month"))) + 1).cast("long"))
      .select(col("month"),
        (expr("value_e2 div nd") * col("ov") +
          when(col("month") === trunc(col("start_d"), "MM"),
            expr("value_e2 % nd")).otherwise(lit(0L))).as("alloc_e2"),
        col("ov"))
      .groupBy(col("month"))
      .agg(sum(col("alloc_e2")).as("alloc_e2"),
        sum(col("ov")).as("n_line_days"))
      .select(col("month").cast("timestamp").as("month"),
        col("alloc_e2"), col("n_line_days"))
      .orderBy(col("month"))
  }

  private val q250Sql =
    """WITH iv AS (
      |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS value_e2,
      |    date_trunc('day', o_orderdate) AS start_d,
      |    date_trunc('day', l_shipdate) AS end_d
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE date_trunc('day', l_shipdate)
      |    >= date_trunc('day', o_orderdate)),
      |m AS (
      |  SELECT *,
      |    date_diff('day', greatest(start_d, month),
      |      least(end_d, month + INTERVAL 1 MONTH - INTERVAL 1 DAY))
      |      + 1 AS ov
      |  FROM (SELECT *, date_diff('day', start_d, end_d) + 1 AS nd,
      |          unnest(generate_series(date_trunc('month', start_d),
      |            date_trunc('month', end_d), INTERVAL 1 MONTH)) AS month
      |        FROM iv)),
      |d AS (
      |  SELECT month,
      |    (value_e2 // nd) * ov
      |      + CASE WHEN month = date_trunc('month', start_d)
      |             THEN value_e2 % nd ELSE 0 END AS alloc_e2,
      |    ov
      |  FROM m)
      |SELECT month, CAST(sum(alloc_e2) AS BIGINT) AS alloc_e2,
      |  CAST(sum(ov) AS BIGINT) AS n_line_days
      |FROM d GROUP BY month ORDER BY month""".stripMargin

  // ---------------------------------------------------------------------
  // q251 — Merkle-style snapshot diff: both versions of the orders
  // table (B simulates the next day's snapshot — keys ≡ 5 mod 97
  // mutated, keys ≡ 7 mod 101 deleted) hash every row portably,
  // fold rows into 256 leaf buckets with a commutative XOR (so the
  // leaf hash is independent of row order AND of partitioning), and
  // the diff reports exactly the leaves whose hash or cardinality
  // moved, with their level-1 parent. The anti-entropy repair
  // primitive: two replicas exchange 256+16 hashes instead of the
  // table, then ship only the differing ranges.
  //
  // Scale shape: each side is one scan + one 256-group aggregate
  // (map-side combinable XOR); the diff is a 256-row full-outer join.
  // Row hashes use only integer-rendered fields, so the hash input
  // strings are engine-identical.
  // ---------------------------------------------------------------------
  private def q251(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100).cast("long").as("v"),
        date_trunc("day", col("o_orderdate")).cast("long").as("ts"))
    val a = o
    val b = o.filter(col("k") % 101 =!= 7)
      .withColumn("v",
        when(col("k") % 97 === 5, col("v") + 100).otherwise(col("v")))
    def leaves(df: DataFrame, nCol: String, hCol: String): DataFrame = df
      .withColumn("rh", PortableHash.hash60(concat_ws("|",
        lit("mk"), col("k"), col("v"), col("ts"))))
      .groupBy((col("k") % 256).as("leaf"))
      .agg(count(lit(1)).as(nCol), expr("bit_xor(rh)").as(hCol))
    leaves(a, "n_a", "h_a")
      .join(leaves(b, "n_b", "h_b"), Seq("leaf"), "full_outer")
      .filter(!(col("h_a") <=> col("h_b")) ||
        !(col("n_a") <=> col("n_b")))
      .select(expr("leaf div 16").as("l1"), col("leaf"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .orderBy(col("leaf"))
  }

  private val q251Sql = {
    val h = PortableHash.hash60DuckSql(
      "'mk' || '|' || CAST(k AS VARCHAR) || '|' || CAST(v AS VARCHAR)" +
        " || '|' || CAST(ts AS VARCHAR)")
    s"""WITH o AS (
       |  SELECT o_orderkey AS k,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
       |    CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS ts
       |  FROM orders),
       |a AS (SELECT k, v, ts FROM o),
       |b AS (SELECT k,
       |        CASE WHEN k % 97 = 5 THEN v + 100 ELSE v END AS v, ts
       |      FROM o WHERE k % 101 <> 7),
       |ha AS (SELECT k % 256 AS leaf, count(*) AS n_a,
       |         bit_xor($h) AS h_a
       |       FROM a GROUP BY 1),
       |hb AS (SELECT k % 256 AS leaf, count(*) AS n_b,
       |         bit_xor($h) AS h_b
       |       FROM b GROUP BY 1)
       |SELECT COALESCE(ha.leaf, hb.leaf) // 16 AS l1,
       |  COALESCE(ha.leaf, hb.leaf) AS leaf,
       |  COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
       |FROM ha FULL OUTER JOIN hb ON ha.leaf = hb.leaf
       |WHERE h_a IS DISTINCT FROM h_b
       |  OR COALESCE(n_a, -1) <> COALESCE(n_b, -1)
       |ORDER BY leaf""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q252 — calibrated differentially-private count release: grouped
  // event counts plus Laplace(b=2) noise (ε=0.5 per count), with the
  // noise made DETERMINISTIC by inverse-CDF sampling from the
  // portable hash of the group key — u = h/2^60 − ½, noise =
  // −b·sign(u)·ln(1−2|u|). This is the privacy-engineering audit
  // query: the release pipeline's noise must be reproducible under
  // replay (seeded by key, not by RNG state) or the privacy
  // accounting is unverifiable. Both engines evaluate the identical
  // IEEE expression tree, so noisy counts are bit-exact. h is clamped
  // to ≥1 (h=0 would put u at exactly −½ and ln(0) at −∞).
  // ---------------------------------------------------------------------
  private def q252(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.eventsSec(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts_s")).as("day"))
      .agg(count(lit(1)).as("n"))
    g.withColumn("h", greatest(PortableHash.hash60(concat(
        lit("dp:"), col("event_type"), lit(":"),
        col("day").cast("long").cast("string"))), lit(1L)))
      .withColumn("u", col("h").cast("double") /
        lit(1152921504606846976.0) - lit(0.5))
      .withColumn("noise", expr(
        "-2.0 * sign(u) * ln(1.0 - 2.0 * abs(u))"))
      .select(col("event_type"), col("day"), col("n"),
        (col("n") + expr("CAST(round(noise) AS BIGINT)")).as("noisy_n"),
        expr("CAST(round(noise * 10000) AS BIGINT)").as("noise_e4"))
      .orderBy(col("event_type"), col("day"))
  }

  private val q252Sql = {
    val h = PortableHash.hash60DuckSql(
      "'dp:' || event_type || ':' || " +
        "CAST(CAST(epoch(day) AS BIGINT) AS VARCHAR)")
    s"""WITH g AS (
       |  SELECT event_type, date_trunc('day', date_trunc('second', ts))
       |      AS day,
       |    count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |x AS (
       |  SELECT event_type, day, n,
       |    CAST(greatest($h, 1) AS DOUBLE)
       |      / 1152921504606846976.0 - 0.5 AS u
       |  FROM g)
       |SELECT event_type, day, n,
       |  n + CAST(round(-2.0 * sign(u) * ln(1.0 - 2.0 * abs(u)))
       |    AS BIGINT) AS noisy_n,
       |  CAST(round(-2.0 * sign(u) * ln(1.0 - 2.0 * abs(u)) * 10000)
       |    AS BIGINT) AS noise_e4
       |FROM x
       |ORDER BY event_type, day""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q253 — l-diversity audit: the companion to q238's k-anonymity —
  // an equivalence class can be large (k-anonymous) yet expose its
  // members if the SENSITIVE attribute barely varies inside it.
  // Per quasi-identifier class, the count of distinct sensitive
  // values; per candidate l, how many classes (and records) fall
  // below. Same two-stage shape as q238: one shuffle to QI grain,
  // then a class-grain rollup crossed with a 4-row threshold dim.
  // ---------------------------------------------------------------------
  private def q253(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type"), date_trunc("day", col("ts_s")).as("day"),
        floor(col("value")).cast("long").as("v"),
        (col("user_id") % 100).as("sens"))
    val classes = e.groupBy(col("event_type"), col("day"), col("v"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("sens")).as("ndv"))
    val ls = s.range(4).select(element_at(
      array(lit(2L), lit(3L), lit(5L), lit(10L)),
      col("id").cast("int") + 1).as("l"))
    classes.crossJoin(broadcast(ls))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("ndv") < col("l"), 1L).otherwise(0L))
          .as("n_classes_below"),
        sum(when(col("ndv") < col("l"), col("n")).otherwise(0L))
          .as("n_records_below"),
        min(col("ndv")).as("min_ndv"))
      .orderBy(col("l"))
  }

  private val q253Sql =
    """WITH e AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(floor(value) AS BIGINT) AS v, user_id % 100 AS sens
      |  FROM events),
      |classes AS (
      |  SELECT event_type, day, v, count(*) AS n,
      |    count(DISTINCT sens) AS ndv
      |  FROM e GROUP BY 1, 2, 3),
      |ls AS (SELECT unnest([2, 3, 5, 10]) AS l)
      |SELECT CAST(l AS BIGINT) AS l,
      |  count(*) AS n_classes,
      |  CAST(sum(CASE WHEN ndv < l THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_classes_below,
      |  CAST(sum(CASE WHEN ndv < l THEN n ELSE 0 END) AS BIGINT)
      |    AS n_records_below,
      |  CAST(min(ndv) AS BIGINT) AS min_ndv
      |FROM classes CROSS JOIN ls
      |GROUP BY l
      |ORDER BY l""".stripMargin

  // ---------------------------------------------------------------------
  // q254 — sequence-pattern matching (the MATCH_RECOGNIZE gap): per
  // user, order events into an initial-letter string (event types
  // map to distinct initials) and count non-overlapping
  // view→click→purchase funnels tolerating interleaved signup/error
  // noise — regex 'v[se]*c[se]*p' (character classes only, so Java
  // and RE2 agree on every match boundary). Users with ≥1 match out.
  //
  // Scale shape: ONE shuffle to user grain; the per-user sequence is
  // session-bounded (a user's own event count), not corpus-bounded —
  // the standard contract for per-entity sequence analytics. The
  // sort is inside the aggregated array (array_sort), not a window.
  // ---------------------------------------------------------------------
  private val FunnelRe = "v[se]*c[se]*p"

  private def q254(s: SparkSession, dir: String): DataFrame =
    Tables.eventsSec(s, dir)
      .select(col("user_id"), col("ts_s"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ini"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("array_sort(collect_list(struct(ts_s, event_id, ini)))")
          .as("arr"))
      .select(col("user_id"), col("n_events"),
        expr(s"CAST(size(regexp_extract_all(" +
          s"concat_ws('', transform(arr, x -> x.ini)), '$FunnelRe', 0)) " +
          "AS BIGINT)").as("n_matches"))
      .filter(col("n_matches") > 0)
      .orderBy(col("user_id"))

  private val q254Sql =
    s"""WITH e AS (
       |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id,
       |    substr(event_type, 1, 1) AS ini
       |  FROM events),
       |sq AS (
       |  SELECT user_id, count(*) AS n_events,
       |    string_agg(ini, '' ORDER BY ts_s, event_id) AS seq
       |  FROM e GROUP BY user_id)
       |SELECT user_id, n_events,
       |  CAST(len(regexp_extract_all(seq, '$FunnelRe')) AS BIGINT)
       |    AS n_matches
       |FROM sq
       |WHERE len(regexp_extract_all(seq, '$FunnelRe')) > 0
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q255 — grid-density clustering (DBSCAN-lite): hash-scattered
  // points (q218's coordinate trick) bucket into 50k-wide grid
  // cells; cells with ≥6 points are "core"; 8-adjacent core cells
  // merge into clusters via large-star/small-star components; the
  // census reports per-cluster cell/point totals plus one noise row
  // (cluster −1) for sub-threshold cells. The spatial-clustering
  // operator at cell grain — adjacency is the 9-probe explode +
  // equi-join (never a non-equi join), and the iterative closure
  // runs on CORE CELLS only, a density-bounded fraction of the data.
  // ---------------------------------------------------------------------
  private val DenseCell = 50000L
  private val DenseMinPts = 6L

  private def q255(s: SparkSession, dir: String): DataFrame = {
    val h = PortableHash
    val cells = t(s, dir, "customer")
      .select(
        (h.hash60(concat(lit("px:"), col("c_custkey"))) % 1000000L)
          .as("x"),
        (h.hash60(concat(lit("py:"), col("c_custkey"))) % 1000000L)
          .as("y"))
      .groupBy(expr(s"x div $DenseCell").as("cx"),
        expr(s"y div $DenseCell").as("cy"))
      .agg(count(lit(1)).as("n"))
      .pin()
    val core = cells.filter(col("n") >= DenseMinPts)
      .withColumn("cid", col("cx") * 1000 + col("cy"))
    val probes = core
      .withColumn("dx", explode(expr("array(-1, 0, 1)")))
      .withColumn("dy", explode(expr("array(-1, 0, 1)")))
      .select((col("cx") + col("dx")).as("cx"),
        (col("cy") + col("dy")).as("cy"), col("cid").as("id_a"))
    val pairs = probes
      .join(core.select(col("cx"), col("cy"), col("cid").as("id_b")),
        Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .pin() // r12: CC derives its input twice (edge + node pins)
    val cc = Dedup.connectedComponentsStar(pairs)
    val clusters = core
      .join(cc.select(col("id").as("cid"), col("cluster")),
        Seq("cid"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("cid")))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_points"))
    val noise = cells.filter(col("n") < DenseMinPts)
      .agg(count(lit(1)).as("n_cells"),
        coalesce(sum(col("n")), lit(0L)).as("n_points"))
      .select(lit(-1L).as("cluster"), col("n_cells"), col("n_points"))
    clusters.unionByName(noise).orderBy(col("cluster"))
  }

  private val q255Sql = {
    val px = PortableHash.hash60DuckSql("'px:' || c_custkey")
    val py = PortableHash.hash60DuckSql("'py:' || c_custkey")
    s"""WITH RECURSIVE cells AS (
       |  SELECT x // $DenseCell AS cx, y // $DenseCell AS cy,
       |    count(*) AS n
       |  FROM (SELECT $px % 1000000 AS x, $py % 1000000 AS y
       |        FROM customer)
       |  GROUP BY 1, 2),
       |core AS (SELECT cx, cy, n, cx * 1000 + cy AS cid
       |         FROM cells WHERE n >= $DenseMinPts),
       |p AS (
       |  SELECT a.cid AS id_a, b.cid AS id_b
       |  FROM core a JOIN core b
       |    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
       |    AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
       |    AND a.cid < b.cid),
       |edges AS (SELECT id_a AS a, id_b AS b FROM p
       |          UNION ALL SELECT id_b, id_a FROM p),
       |reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a),
       |comp AS (
       |  SELECT src AS cid, LEAST(src, min(dst)) AS cluster
       |  FROM reach GROUP BY src),
       |asg AS (
       |  SELECT core.cid, core.n, COALESCE(comp.cluster, core.cid)
       |    AS cluster
       |  FROM core LEFT JOIN comp USING (cid)),
       |cl AS (SELECT cluster, count(*) AS n_cells,
       |         CAST(sum(n) AS BIGINT) AS n_points
       |       FROM asg GROUP BY cluster),
       |noise AS (SELECT CAST(-1 AS BIGINT) AS cluster,
       |            count(*) AS n_cells,
       |            CAST(COALESCE(sum(n), 0) AS BIGINT) AS n_points
       |          FROM cells WHERE n < $DenseMinPts)
       |SELECT * FROM cl UNION ALL SELECT * FROM noise
       |ORDER BY cluster""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q256 — spend-band migration matrix: each user's first-half vs
  // second-half spend maps to a log2 band (bin-string length — PURE
  // INTEGER banding, no floats, no global rank window), and the
  // matrix counts users per (band_then, band_now) — the
  // rank-migration dashboard without the scale trap: a decile
  // version needs a global sort window; log2 bands need only two
  // user-grain aggregates and one join. Only users active in both
  // halves migrate.
  // ---------------------------------------------------------------------
  private def q256(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("ts_s"),
        round(col("value") * 10000).cast("long").as("v_e4"))
    val cut = lit("2024-01-16").cast("timestamp")
    def half(f: DataFrame, out: String) = f.groupBy(col("user_id"))
      .agg(sum(col("v_e4")).as(out))
    half(e.filter(col("ts_s") < cut), "s1")
      .join(half(e.filter(col("ts_s") >= cut), "s2"), Seq("user_id"))
      .select(col("user_id"),
        length(bin(greatest(col("s1"), lit(1L)))).cast("long").as("band1"),
        length(bin(greatest(col("s2"), lit(1L)))).cast("long").as("band2"))
      .groupBy(col("band1"), col("band2"))
      .agg(count(lit(1)).as("n_users"), sum(col("user_id")).as("id_checksum"))
      .orderBy(col("band1"), col("band2"))
  }

  private val q256Sql =
    """WITH e AS (
      |  SELECT user_id, date_trunc('second', ts) AS ts_s,
      |    CAST(round(value * 10000) AS BIGINT) AS v_e4
      |  FROM events),
      |h1 AS (SELECT user_id, CAST(sum(v_e4) AS BIGINT) AS s1 FROM e
      |       WHERE ts_s < TIMESTAMP '2024-01-16' GROUP BY user_id),
      |h2 AS (SELECT user_id, CAST(sum(v_e4) AS BIGINT) AS s2 FROM e
      |       WHERE ts_s >= TIMESTAMP '2024-01-16' GROUP BY user_id)
      |SELECT CAST(length(bin(greatest(s1, 1))) AS BIGINT) AS band1,
      |  CAST(length(bin(greatest(s2, 1))) AS BIGINT) AS band2,
      |  count(*) AS n_users,
      |  CAST(sum(user_id) AS BIGINT) AS id_checksum
      |FROM h1 JOIN h2 USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY band1, band2""".stripMargin

  // ---------------------------------------------------------------------
  // q257 — edge-neighborhood Jaccard (structural similarity of
  // ADJACENT pairs — the complement of q246's non-adjacent link
  // prediction): on the hub-pruned backbone (nodes with degree ≤ 64;
  // a hub's neighborhood overlap is co-occurrence noise, and pruning
  // is what bounds the wedge join at cap² per mid), each edge scores
  // |N(u)∩N(v)| / |N(u)∪N(v)| at e6, top-25. Common neighbors are
  // the per-edge triangle supports; the union is deg(u)+deg(v)−common
  // (endpoints are never common neighbors — no self loops).
  // ---------------------------------------------------------------------
  private def q257(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 10 === 3)
      .select((col("l_partkey") % 4000).as("a"),
        (col("l_suppkey") % 4000).as("b"))
      .filter(col("a") =!= col("b"))
    val und = raw
      .unionByName(raw.select(col("b").as("a"), col("a").as("b")))
      .distinct().pin()
    val keep = und.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= 64).select(col("a").as("n"))
    val e2 = und
      .join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
      .join(keep.select(col("n").as("b")), Seq("b"), "left_semi")
      .pin()
    val deg = e2.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    val common = e2.select(col("b").as("mid"), col("a").as("u"))
      .join(e2.select(col("a").as("mid"), col("b").as("v")), Seq("mid"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("common"))
    e2.filter(col("a") < col("b"))
      .select(col("a").as("u"), col("b").as("v"))
      .join(common, Seq("u", "v"), "left")
      .na.fill(0L, Seq("common"))
      .join(deg.select(col("a").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("a").as("v"), col("deg").as("dv")), Seq("v"))
      .select(col("u"), col("v"), col("common"),
        expr("common * 1000000 div (du + dv - common)").as("jacc_e6"))
      .orderBy(col("jacc_e6").desc, col("u"), col("v"))
      .limit(25)
  }

  private val q257Sql =
    """WITH raw AS (
      |  SELECT l_partkey % 4000 AS a, l_suppkey % 4000 AS b
      |  FROM lineitem
      |  WHERE l_orderkey % 10 = 3 AND l_partkey % 4000 <> l_suppkey % 4000),
      |e AS (SELECT a, b FROM raw UNION SELECT b, a FROM raw),
      |keep AS (SELECT a AS n FROM e GROUP BY a HAVING count(*) <= 64),
      |e2 AS (
      |  SELECT e.a, e.b FROM e
      |  JOIN keep ka ON ka.n = e.a
      |  JOIN keep kb ON kb.n = e.b),
      |deg AS (SELECT a, count(*) AS deg FROM e2 GROUP BY a),
      |cm AS (
      |  SELECT l.a AS u, r.b AS v, count(*) AS common
      |  FROM e2 l JOIN e2 r ON l.b = r.a
      |  WHERE l.a < r.b
      |  GROUP BY 1, 2)
      |SELECT ed.u, ed.v,
      |  CAST(COALESCE(cm.common, 0) AS BIGINT) AS common,
      |  COALESCE(cm.common, 0) * 1000000
      |    // (du.deg + dv.deg - COALESCE(cm.common, 0)) AS jacc_e6
      |FROM (SELECT a AS u, b AS v FROM e2 WHERE a < b) ed
      |LEFT JOIN cm ON cm.u = ed.u AND cm.v = ed.v
      |JOIN deg du ON du.a = ed.u
      |JOIN deg dv ON dv.a = ed.v
      |ORDER BY jacc_e6 DESC, ed.u, ed.v
      |LIMIT 25""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q246_adamic_adar" -> (q246 _),
    "q247_label_propagation" -> (q247 _),
    "q248_semdedup" -> (q248 _),
    "q249_dsir_weights" -> (q249 _),
    "q250_ship_allocation" -> (q250 _),
    "q251_merkle_diff" -> (q251 _),
    "q252_dp_release" -> (q252 _),
    "q253_l_diversity" -> (q253 _),
    "q254_event_regex" -> (q254 _),
    "q255_density_clusters" -> (q255 _),
    "q256_spend_migration" -> (q256 _),
    "q257_edge_jaccard" -> (q257 _))

  val oracle: Map[String, String] = Map(
    "q246_adamic_adar" -> q246Sql,
    "q247_label_propagation" -> q247Sql,
    "q248_semdedup" -> q248Sql,
    "q249_dsir_weights" -> q249Sql,
    "q250_ship_allocation" -> q250Sql,
    "q251_merkle_diff" -> q251Sql,
    "q252_dp_release" -> q252Sql,
    "q253_l_diversity" -> q253Sql,
    "q254_event_regex" -> q254Sql,
    "q255_density_clusters" -> q255Sql,
    "q256_spend_migration" -> q256Sql,
    "q257_edge_jaccard" -> q257Sql)
}
