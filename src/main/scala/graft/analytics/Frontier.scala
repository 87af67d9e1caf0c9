package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.PortableHash

/** Frontier analytics surface (session 4): sketch maintenance
  * (count-min heavy hitters), weighted graph traversal (Bellman–Ford),
  * corpus drift (vocabulary KL), and density peeling (k-core) — each
  * integer-exact against the DuckDB oracle, each with an explicit
  * 100 TB shape argument in its header.
  */
object Frontier {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** The nation trade graph (q92/q156's edge derivation): one edge
    * per (supplier nation → customer nation) pair with its line
    * count — dims broadcast into the one lineitem↔orders join. */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val su = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
  }

  private val tradeEdgesSql =
    """SELECT s_nationkey AS src, c_nationkey AS dst,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q228 — count-min sketch heavy hitters + error audit (the
  // fixed-memory frequency sketch next to q118's HLL and q222's
  // MinHash audit): per-part counts hash into a 4×128 sketch through
  // the portable md5 family; each top-20 key's estimate (min over
  // the 4 rows) is reported against its exact count — the
  // always-≥0 overcount a sketch consumer budgets around.
  //
  // Scale shape: the corpus aggregates ONCE to key grain (one
  // shuffle, map-side partial); the sketch build explodes the
  // key-grain table ×4 into a 512-row aggregate; estimates join the
  // 512-row sketch back as one broadcast. At 100 TB the key-grain
  // pre-aggregate is the sketch's whole point — the corpus is never
  // rescanned per hash row, and sketch size is independent of scale.
  // ---------------------------------------------------------------------
  private val CmsW = 128L
  private val CmsD = 4

  private def q228(s: SparkSession, dir: String): DataFrame = {
    val cnt = t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("c"))
      .withColumn("h", PortableHash.hash60(col("k").cast("string")))
      .localCheckpoint()
    def dbStructs = array((0 until CmsD).map(d =>
      struct(lit(d.toLong).as("d"),
        (PortableHash.perm(d, col("h")) % CmsW).as("b"))): _*)
    val cms = cnt
      .select(col("c"), explode(dbStructs).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(sum(col("c")).as("cms"))
    val top = cnt.orderBy(col("c").desc, col("k").asc).limit(20)
    top
      .select(col("k"), col("c"), explode(dbStructs).as("db"))
      .select(col("k"), col("c"), col("db.d").as("d"), col("db.b").as("b"))
      .join(broadcast(cms), Seq("d", "b"))
      .groupBy(col("k"), col("c")).agg(min(col("cms")).as("est"))
      .select(col("k").as("partkey"), col("c").as("exact_cnt"),
        col("est"), (col("est") - col("c")).as("overcount"))
      .orderBy(col("exact_cnt").desc, col("partkey"))
  }

  private val q228Sql = {
    val h = PortableHash.hash60DuckSql("CAST(k AS VARCHAR)")
    def rows(src: String, cols: String) = (0 until CmsD).map { d =>
      s"SELECT $cols, $d AS d, (${PortableHash.permDuckSql(d, "h")}) % $CmsW AS b FROM $src"
    }.mkString("\n  UNION ALL ")
    s"""WITH cnt AS (
       |  SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1),
       |hashed AS (SELECT k, c, $h AS h FROM cnt),
       |ex AS (
       |  ${rows("hashed", "c")}),
       |cms AS (
       |  SELECT d, b, CAST(sum(c) AS BIGINT) AS cms
       |  FROM ex GROUP BY d, b),
       |top AS (SELECT k, c, h FROM hashed ORDER BY c DESC, k LIMIT 20),
       |tb AS (
       |  ${rows("top", "k, c")})
       |SELECT tb.k AS partkey, tb.c AS exact_cnt,
       |  CAST(min(cms.cms) AS BIGINT) AS est,
       |  CAST(min(cms.cms) AS BIGINT) - tb.c AS overcount
       |FROM tb JOIN cms ON tb.d = cms.d AND tb.b = cms.b
       |GROUP BY tb.k, tb.c
       |ORDER BY exact_cnt DESC, partkey""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q229 — single-source WEIGHTED shortest paths (Bellman–Ford with
  // a delta frontier) over the nation trade graph, edge weight
  // 1 + cnt%5 — the weighted companion to q156's BFS, where a cheap
  // two-hop route can beat an expensive direct edge. All-integer →
  // engine-exact. Oracle: each weight-w edge expands into w unit
  // hops through virtual chain nodes, so a depth-bounded BFS
  // recursive CTE reduced by min(d) IS the weighted distance —
  // engine-independent truth with no recursive aggregation.
  //
  // Scale shape: [[graft.operators.Graph.bellmanFord]] relaxes only
  // the frontier (nodes improved last round) against the
  // once-materialized edge table; per-round cost is frontier×degree
  // and rounds bound by the weighted eccentricity, not |V|.
  // ---------------------------------------------------------------------
  private def q229(s: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(s, dir)
      .select(col("src"), col("dst"), (lit(1L) + col("cnt") % 5L).as("w"))
    val nat = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name")))
    graft.operators.Graph.bellmanFord(edges, source = 0L)
      .join(nat, col("node") === col("n_nationkey"))
      .select(col("node").as("nationkey"), col("n_name"), col("dist"))
      .orderBy(col("nationkey"))
  }

  private val q229Sql =
    s"""WITH RECURSIVE edges AS (
       |  SELECT src, dst, 1 + cnt % 5 AS w FROM (
       |  $tradeEdgesSql)),
       |unit AS (
       |  SELECT
       |    CASE WHEN i = 0 THEN src
       |         ELSE 1000 + (src * 100 + dst) * 10 + i END AS u,
       |    CASE WHEN i = w - 1 THEN dst
       |         ELSE 1000 + (src * 100 + dst) * 10 + i + 1 END AS v
       |  FROM (SELECT src, dst, w, unnest(range(w)) AS i FROM edges)),
       |reach(node, d) AS (
       |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS d
       |  UNION
       |  SELECT un.v, r.d + 1
       |  FROM reach r JOIN unit un ON r.node = un.u
       |  WHERE r.d < 150)
       |SELECT CAST(node AS BIGINT) AS nationkey, n_name,
       |  CAST(min(d) AS BIGINT) AS dist
       |FROM reach JOIN nation ON n_nationkey = node
       |WHERE node < 1000
       |GROUP BY node, n_name
       |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // q230 — vocabulary KL drift between the train and holdout hash
  // splits (the distribution-shift screen run before trusting a
  // held-out perplexity): add-one-smoothed unigram distributions
  // P (train) and Q (holdout) over the joint vocabulary; each
  // word's contribution p·(ln p − ln q) surfaces what the split
  // disagrees on. Probabilities are integer e9 fixed-point (`div`
  // in both engines), ln() is taken on those integer-derived
  // doubles and e4-rounded PER ROW (the q68/q224 transcendental
  // discipline), and the reported score p_e9·Δln_e4 is an exact
  // integer product.
  //
  // Scale shape: tokens aggregate once to word grain (one shuffle,
  // map-side partial — the split flag rides as two conditional
  // sums, not a second pass); the three corpus scalars join back as
  // one broadcast row; top-25 is a TakeOrdered, never a
  // vocabulary-wide window. (At extreme corpus sizes the e9
  // products approach 2^63 — the scaled columns would move to
  // DECIMAL(38,0) like q124's power sums.)
  // ---------------------------------------------------------------------
  private def q230(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("part",
        PortableHash.hash60(concat(lit("split:"),
          col("doc_id").cast("string"))) % 10)
    val wc = tok.groupBy(col("w")).agg(
      sum(when(col("part") < 8, 1L).otherwise(0L)).as("c_train"),
      sum(when(col("part") >= 8, 1L).otherwise(0L)).as("c_hold"))
    val scal = wc.agg(sum(col("c_train")).as("nt"),
      sum(col("c_hold")).as("nh"), count(lit(1)).as("v"))
    wc.crossJoin(broadcast(scal))
      .withColumn("p_e9", expr("(c_train + 1) * 1000000000L div (nt + v)"))
      .withColumn("q_e9", expr("(c_hold + 1) * 1000000000L div (nh + v)"))
      .withColumn("lnp_e4", expr(
        "CAST(round(ln(CAST(p_e9 AS DOUBLE) / 1e9) * 10000) AS BIGINT)"))
      .withColumn("lnq_e4", expr(
        "CAST(round(ln(CAST(q_e9 AS DOUBLE) / 1e9) * 10000) AS BIGINT)"))
      .withColumn("score", col("p_e9") * (col("lnp_e4") - col("lnq_e4")))
      .select(col("w"), col("c_train"), col("c_hold"),
        col("p_e9"), col("q_e9"), col("score"))
      .orderBy(col("score").desc, col("w").asc).limit(25)
  }

  private val q230Sql = {
    val h = PortableHash.hash60DuckSql(
      "'split:' || CAST(doc_id AS VARCHAR)")
    s"""WITH tok AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents)
       |  WHERE len(w) > 0),
       |tagged AS (
       |  SELECT w, CASE WHEN ($h) % 10 < 8 THEN 1 ELSE 0 END AS tr
       |  FROM tok),
       |wc AS (
       |  SELECT w,
       |    CAST(sum(tr) AS BIGINT) AS c_train,
       |    CAST(sum(1 - tr) AS BIGINT) AS c_hold
       |  FROM tagged GROUP BY w),
       |scal AS (
       |  SELECT CAST(sum(c_train) AS BIGINT) AS nt,
       |    CAST(sum(c_hold) AS BIGINT) AS nh,
       |    CAST(count(*) AS BIGINT) AS v
       |  FROM wc),
       |scored AS (
       |  SELECT w, c_train, c_hold,
       |    (c_train + 1) * 1000000000 // (nt + v) AS p_e9,
       |    (c_hold + 1) * 1000000000 // (nh + v) AS q_e9
       |  FROM wc CROSS JOIN scal),
       |lns AS (
       |  SELECT w, c_train, c_hold, p_e9, q_e9,
       |    CAST(round(ln(CAST(p_e9 AS DOUBLE) / 1e9) * 10000) AS BIGINT)
       |      AS lnp_e4,
       |    CAST(round(ln(CAST(q_e9 AS DOUBLE) / 1e9) * 10000) AS BIGINT)
       |      AS lnq_e4
       |  FROM scored)
       |SELECT w, c_train, c_hold, p_e9, q_e9,
       |  p_e9 * (lnp_e4 - lnq_e4) AS score
       |FROM lns
       |ORDER BY score DESC, w
       |LIMIT 25""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q231 — k-core of the sparse part↔supplier bipartite graph (the
  // density-peel that separates structurally-embedded nodes from
  // peripheral ones — the graph-curation companion to the dedup
  // tier's connected components): rare trade links (quantity < 3)
  // form the graph; the 2-core iteratively peels every node with
  // fewer than 2 surviving neighbors until fixpoint. Oracle: the
  // peel UNROLLED to 10 rounds as chained CTEs (peeling is monotone,
  // so post-fixpoint rounds are no-ops); the Spark side converges by
  // count probe and THROWS past 10 rounds rather than mismatching.
  //
  // Scale shape: each round is one join of the shrinking id-only
  // survivor set against the once-materialized adjacency plus a
  // degree aggregate — cost tracks surviving edges, monotonically
  // down; the convergence probe is one scalar count per round.
  // ---------------------------------------------------------------------
  private val PartOffset = 1000000000L

  private def q231(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "lineitem")
      .filter(col("l_quantity") < 3)
      .select(col("l_suppkey").as("sk"),
        (col("l_partkey") + PartOffset).as("pk"))
      .distinct()
    val adj = e.select(col("sk").as("u"), col("pk").as("v"))
      .unionByName(e.select(col("pk").as("u"), col("sk").as("v")))
    graft.operators.Graph.kCore(adj, k = 2, maxRounds = 10)
      .select(
        when(col("node") >= PartOffset, lit("part"))
          .otherwise(lit("supplier")).as("ntype"),
        when(col("node") >= PartOffset, col("node") - PartOffset)
          .otherwise(col("node")).as("id"),
        col("core_deg"))
      .orderBy(col("ntype"), col("id"))
  }

  private val q231Sql = {
    // each round references the previous one TWICE (both join sides);
    // DuckDB inlines plain CTEs, which would expand 2^10 copies of
    // the base query — MATERIALIZED pins each round to evaluate once
    val rounds = (1 to 10).map { i =>
      s"""surv$i AS MATERIALIZED (
         |  SELECT a.u AS node FROM adj a
         |  JOIN surv${i - 1} x ON a.u = x.node
         |  JOIN surv${i - 1} y ON a.v = y.node
         |  GROUP BY a.u HAVING count(*) >= 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT l_suppkey AS sk, $PartOffset + l_partkey AS pk
       |  FROM lineitem WHERE l_quantity < 3),
       |adj AS MATERIALIZED (
       |  SELECT sk AS u, pk AS v FROM e0
       |  UNION ALL SELECT pk, sk FROM e0),
       |surv0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM adj),
       |$rounds,
       |core AS (
       |  SELECT a.u AS node, CAST(count(*) AS BIGINT) AS core_deg
       |  FROM adj a
       |  JOIN surv10 x ON a.u = x.node
       |  JOIN surv10 y ON a.v = y.node
       |  GROUP BY a.u)
       |SELECT CASE WHEN node >= $PartOffset THEN 'part'
       |            ELSE 'supplier' END AS ntype,
       |  CAST(CASE WHEN node >= $PartOffset THEN node - $PartOffset
       |            ELSE node END AS BIGINT) AS id,
       |  core_deg
       |FROM core
       |ORDER BY ntype, id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q228_countmin" -> (q228 _),
    "q229_bellman_ford" -> (q229 _),
    "q230_vocab_kl" -> (q230 _),
    "q231_kcore" -> (q231 _))

  val oracle: Map[String, String] = Map(
    "q228_countmin" -> q228Sql,
    "q229_bellman_ford" -> q229Sql,
    "q230_vocab_kl" -> q230Sql,
    "q231_kcore" -> q231Sql)
}
