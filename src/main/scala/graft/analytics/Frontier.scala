package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.PortableHash
import graft.core.PlanStats.Pinned

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
      .pin()
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
    // pinned: wc feeds both the scalar row and the scored rows —
    // without the checkpoint each branch re-tokenizes the corpus
    val wc = tok.groupBy(col("w")).agg(
      sum(when(col("part") < 8, 1L).otherwise(0L)).as("c_train"),
      sum(when(col("part") >= 8, 1L).otherwise(0L)).as("c_hold"))
      .pin()
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

  // ---------------------------------------------------------------------
  // q232 — chunk-level duplication audit (the RAG-ingest hygiene
  // check q21's document-level dedup misses: boilerplate chunks
  // shared ACROSS distinct documents): q83's 20/15 token windows,
  // each chunk's corpus-wide occurrence count joined back, per-doc
  // duplicated-chunk share. Composition gate: Generate (zero
  // shuffle) → chunk-text aggregate → join-back → doc rollup.
  //
  // Scale shape: the only wide exchange is at chunk-text grain; at
  // 100 TB the join key would be xxhash64(chunk_text) to keep
  // shuffle rows narrow (the q21/q213 note) — same plan shape.
  // ---------------------------------------------------------------------
  private def q232(s: SparkSession, dir: String): DataFrame = {
    val ch = graft.operators.Curate
      .chunkWindows(docs(s, dir), "doc_id", "text", win = 20, stride = 15)
      .select(col("doc_id"), col("chunk_text"))
    val occ = ch.groupBy(col("chunk_text"))
      .agg(count(lit(1)).as("n_occ"))
    ch.join(occ, Seq("chunk_text"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_ppm",
        expr("n_dup_chunks * 1000000 div n_chunks"))
      .orderBy(col("doc_id"))
  }

  private val q232Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS w
      |  FROM documents),
      |ch AS (
      |  SELECT doc_id,
      |    array_to_string(list_slice(w, chunk_start + 1, chunk_start + 20),
      |      ' ') AS chunk_text
      |  FROM (SELECT doc_id, w, unnest(range(0, len(w), 15)) AS chunk_start
      |        FROM toks)),
      |occ AS (
      |  SELECT chunk_text, count(*) AS n_occ FROM ch GROUP BY 1)
      |SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(CASE WHEN occ.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_chunks,
      |  CAST(sum(CASE WHEN occ.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000 // count(*) AS dup_ppm
      |FROM ch JOIN occ USING (chunk_text)
      |GROUP BY ch.doc_id
      |ORDER BY ch.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q233 — HITS hubs & authorities on the trade graph (the
  // bipartite-tendency centrality next to q92's PageRank: exporters
  // score as hubs, importers as authorities): 3 iterations of
  // [[graft.operators.Graph.hitsIntExact]]'s e9 integer fixed-point
  // with L1 renormalization each half-step. Oracle: the identical
  // recurrence unrolled as chained CTEs (the q92 pattern) — raw
  // transfer, total, renormalize, per half-step.
  // ---------------------------------------------------------------------
  private def q233(s: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(s, dir)
      .select(col("src"), col("dst"), col("cnt").as("w"))
    val nat = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name")))
    graft.operators.Graph.hitsIntExact(edges, iterations = 3)
      .join(nat, col("node") === col("n_nationkey"))
      .select(col("node").as("nationkey"), col("n_name"),
        col("hub_e9"), col("auth_e9"))
      .orderBy(col("nationkey"))
  }

  private val q233Sql = {
    def half(prev: String, from: String, to: String, out: String) =
      s"""${out}r AS (
         |  SELECT e.$to AS node, CAST(sum($prev.s * e.w) AS BIGINT) AS raw
         |  FROM edges e JOIN $prev ON $prev.node = e.$from
         |  GROUP BY 1),
         |${out}t AS (SELECT CAST(sum(raw) AS BIGINT) AS t FROM ${out}r),
         |$out AS (
         |  SELECT nd.node,
         |    CAST(CAST(COALESCE(r.raw, 0) AS HUGEINT) * 1000000000
         |      // tt.t AS BIGINT) AS s
         |  FROM nodes nd CROSS JOIN ${out}t tt
         |  LEFT JOIN ${out}r r ON r.node = nd.node)""".stripMargin
    val steps = (1 to 3).map { i =>
      half(s"h${i - 1}", "src", "dst", s"a$i") + ",\n" +
        half(s"a$i", "dst", "src", s"h$i")
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT src, dst, cnt AS w FROM (
       |  $tradeEdgesSql)),
       |nodes AS (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
       |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |h0 AS (SELECT node, CAST(1000000000 // n AS BIGINT) AS s
       |       FROM nodes CROSS JOIN cnt),
       |$steps
       |SELECT CAST(h3.node AS BIGINT) AS nationkey, n_name,
       |  h3.s AS hub_e9, a3.s AS auth_e9
       |FROM h3 JOIN a3 ON a3.node = h3.node
       |JOIN nation ON n_nationkey = h3.node
       |ORDER BY nationkey""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q234 — grouped median imputation (the feature-hygiene fill step
  // before training): a value is "missing" under a deterministic
  // rule (event_id % 7 = 0 — synthetic missingness both engines
  // derive identically); each event type fills its holes with the
  // EXACT median of its present values. Medians use the
  // doubled-integer trick (med2 = 2·median is an integer for p=0.5
  // over integers — the q172 discipline) through
  // Validate.groupedPercentilesExact, so no group buffers its full
  // column; the audit total sums 2×imputed values — pure integers
  // end-to-end.
  // ---------------------------------------------------------------------
  private def q234(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validate
    // pinned (r12): three percentile-operator passes over the
    // non-missing slice plus the imputation join's own scan — one
    // narrow materialization, four fewer parquet re-derivations
    val e = Tables.eventsSec(s, dir)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 10000).cast("long").as("v"))
      .withColumn("miss", (col("event_id") % 7 === 0).cast("long"))
      .pin()
    val med = Validate.groupedPercentilesExact(
        e.filter(col("miss") === 0), col("event_type"), "event_type",
        col("v"), Seq(0.5), Seq("m"))
      .select(col("event_type"), round(col("m") * 2).cast("long").as("med2"))
    e.join(broadcast(med), Seq("event_type"))
      .withColumn("imp2",
        when(col("miss") === 1, col("med2")).otherwise(lit(2L) * col("v")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("miss")).as("n_missing"),
        min(col("med2")).as("med2"),
        sum(col("imp2")).as("imputed_sum2"))
      .orderBy(col("event_type"))
  }

  private val q234Sql =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 10000) AS BIGINT) AS v,
      |    CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS miss
      |  FROM events),
      |med AS (
      |  SELECT event_type,
      |    CAST(round(quantile_cont(v, 0.5) * 2) AS BIGINT) AS med2
      |  FROM e WHERE miss = 0 GROUP BY 1)
      |SELECT e.event_type, count(*) AS n,
      |  CAST(sum(e.miss) AS BIGINT) AS n_missing,
      |  min(m.med2) AS med2,
      |  CAST(sum(CASE WHEN e.miss = 1 THEN m.med2 ELSE 2 * e.v END)
      |    AS BIGINT) AS imputed_sum2
      |FROM e JOIN med m USING (event_type)
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q235 — FIFO supply allocation (the warehouse-classic lot
  // matching: demand consumes supply lots strictly in order): per
  // part, demand lines (ship order) and synthetic supply lots each
  // carry cumulative [lo, hi) integer intervals; a line draws
  // min(hi,hi)−max(lo,lo) from every lot its interval overlaps —
  // exactly FIFO, with no iterative matching. The join is an
  // equi-join on partkey with an overlap post-filter: ≤ lots-per-
  // part candidates per line, never a range blowup.
  //
  // Scale shape: two running-sum windows (one exchange each, keyed
  // by part) + one keyed join; allocation output is lots × parts.
  // ---------------------------------------------------------------------
  private def q235(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dw = Window.partitionBy(col("pk"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val demand = t(s, dir, "lineitem")
      .select(col("l_partkey").as("pk"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("q"))
      .withColumn("dhi", sum(col("q")).over(dw))
      .withColumn("dlo", col("dhi") - col("q"))
    val lots = t(s, dir, "part")
      .select(col("p_partkey").as("pk2"), explode(expr(
        "transform(sequence(1, 3), " +
          "i -> struct(CAST(i AS BIGINT) AS lot, " +
          "CAST(i * 100 + p_partkey % 97 AS BIGINT) AS sq))")).as("l"))
      .select(col("pk2"), col("l.lot").as("lot"), col("l.sq").as("sq"))
      .withColumn("shi", expr(
        "((lot * (lot + 1)) div 2) * 100 + lot * (pk2 % 97)"))
      .withColumn("slo", col("shi") - col("sq"))
    demand
      .join(lots, col("pk") === col("pk2") &&
        col("dlo") < col("shi") && col("slo") < col("dhi"))
      .select(col("pk").as("partkey"), col("lot"),
        (least(col("dhi"), col("shi")) -
          greatest(col("dlo"), col("slo"))).as("alloc"))
      .groupBy(col("partkey"), col("lot"))
      .agg(sum(col("alloc")).as("alloc_qty"), count(lit(1)).as("n_lines"))
      .orderBy(col("partkey"), col("lot"))
  }

  private val q235Sql =
    """WITH demand AS (
      |  SELECT l_partkey AS pk,
      |    CAST(l_quantity AS BIGINT) AS q,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
      |      PARTITION BY l_partkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS dhi
      |  FROM lineitem),
      |d2 AS (SELECT pk, q, dhi, dhi - q AS dlo FROM demand),
      |lots AS (
      |  SELECT p_partkey AS pk, CAST(i AS BIGINT) AS lot,
      |    CAST(i * 100 + p_partkey % 97 AS BIGINT) AS sq,
      |    CAST(((i * (i + 1)) // 2) * 100 + i * (p_partkey % 97)
      |      AS BIGINT) AS shi
      |  FROM part, unnest(range(1, 4)) AS t(i)),
      |l2 AS (SELECT pk, lot, sq, shi, shi - sq AS slo FROM lots)
      |SELECT d2.pk AS partkey, l2.lot,
      |  CAST(sum(least(d2.dhi, l2.shi) - greatest(d2.dlo, l2.slo))
      |    AS BIGINT) AS alloc_qty,
      |  count(*) AS n_lines
      |FROM d2 JOIN l2 ON d2.pk = l2.pk
      |  AND d2.dlo < l2.shi AND l2.slo < d2.dhi
      |GROUP BY d2.pk, l2.lot
      |ORDER BY partkey, lot""".stripMargin

  // ---------------------------------------------------------------------
  // q236 — Hill tail-index estimator over per-source word
  // frequencies (the heavy-tail health check next to q224's Zipf
  // slope — α ≈ 1/slope, estimated from order statistics instead of
  // a regression): per source, the top-20 frequencies against the
  // 21st (the synthetic vocab is ~31 words/source), H = mean(ln c_(i) − ln c_(k+1)), α = 1/H. The top-21
  // per source come from the bounded-heap TopKPerKey plan (never a
  // vocabulary-wide window); ln is e4-rounded per row on
  // integer-derived doubles; the final α is one integer division.
  // ---------------------------------------------------------------------
  private def q236(s: SparkSession, dir: String): DataFrame = {
    val wc = docs(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("freq"))
    // pinned: both the head rows and the tail threshold read the one
    // TopK result — without the checkpoint the corpus aggregate and
    // the bounded-heap pass would run twice
    val top = graft.operators.Curate.capPerGroup(wc, Seq("source"),
      Seq("freq" -> true, "w" -> false), 21)
      .pin()
    val tail = top.filter(col("rank") === 21)
      .select(col("source").as("s2"), col("freq").as("f_tail"))
    top.filter(col("rank") <= 20)
      .join(broadcast(tail), col("source") === col("s2"))
      .select(col("source"), expr(
        "CAST(round(ln(CAST(freq AS DOUBLE)) * 10000) AS BIGINT) - " +
          "CAST(round(ln(CAST(f_tail AS DOUBLE)) * 10000) AS BIGINT)")
        .as("d_e4"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("k"), sum(col("d_e4")).as("h_sum_e4"))
      // h_sum_e4 = 0 (all top-20 freqs equal the 21st) → NULL alpha
      // on BOTH engines: DuckDB // raises on zero where Spark div
      // yields NULL, so the zero case must never reach the divide
      .withColumn("alpha_e6",
        expr("k * 10000 * 1000000 div nullif(h_sum_e4, 0)"))
      .orderBy(col("source"))
  }

  private val q236Sql =
    """WITH wc AS (
      |  SELECT source, w, count(*) AS freq FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w
      |    FROM documents)
      |  WHERE len(w) > 0 GROUP BY source, w),
      |ranked AS (
      |  SELECT source, w, freq, row_number() OVER (
      |    PARTITION BY source ORDER BY freq DESC, w) AS rank
      |  FROM wc),
      |tail AS (
      |  SELECT source, freq AS f_tail FROM ranked WHERE rank = 21),
      |d AS (
      |  SELECT r.source,
      |    CAST(round(ln(CAST(r.freq AS DOUBLE)) * 10000) AS BIGINT)
      |    - CAST(round(ln(CAST(t.f_tail AS DOUBLE)) * 10000) AS BIGINT)
      |      AS d_e4
      |  FROM ranked r JOIN tail t USING (source)
      |  WHERE r.rank <= 20)
      |SELECT source, count(*) AS k,
      |  CAST(sum(d_e4) AS BIGINT) AS h_sum_e4,
      |  count(*) * 10000 * 1000000
      |    // NULLIF(CAST(sum(d_e4) AS BIGINT), 0) AS alpha_e6
      |FROM d
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q237 — streaming late-data accounting, in the gate: the
  // watermark's DROP path (every other streaming gate picks delays
  // that drop nothing). Four pinned micro-batches — on-time bulk
  // (even users ≠ 0), a user-0 nudge batch (Spark's late-event
  // filter lags the eviction watermark by one batch), late half
  // (odd users), sentinel — through a 6-hour-watermark hourly
  // aggregate: an odd-user row survives iff its hourly window's END
  // is later than max(even, non-zero user ts) − 6h (the filter is
  // window-end-based, probed in StreamingSpec). That condition is
  // pure SQL, so the drop semantics themselves are oracle-checked.
  // Values sum as e4 longs (exact); windows are hour-aligned.
  // ---------------------------------------------------------------------
  private def q237(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.lateDataReplayFromParquet(
        s, s"$dir/events.parquet", window = "1 hour", delay = "6 hours")
      .select(col("window_start").as("hour_start"), col("n_events"),
        col("value_e4_total"))
      .orderBy(col("hour_start"))

  private val q237Sql =
    """WITH e AS (
      |  SELECT date_trunc('second', ts) AS ts_s, user_id,
      |    CAST(round(value * 10000) AS BIGINT) AS v
      |  FROM events),
      |wm AS (
      |  SELECT COALESCE(max(ts_s) - INTERVAL 6 HOUR,
      |    TIMESTAMP '1900-01-01') AS w
      |  FROM e WHERE user_id % 2 = 0 AND user_id <> 0),
      |kept AS (
      |  SELECT ts_s, v FROM e WHERE user_id % 2 = 0
      |  UNION ALL
      |  SELECT ts_s, v FROM e, wm
      |  WHERE user_id % 2 <> 0
      |    AND date_trunc('hour', ts_s) + INTERVAL 1 HOUR > wm.w)
      |SELECT date_trunc('hour', ts_s) AS hour_start,
      |  count(*) AS n_events,
      |  CAST(sum(v) AS BIGINT) AS value_e4_total
      |FROM kept
      |GROUP BY 1
      |ORDER BY hour_start""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q228_countmin" -> (q228 _),
    "q229_bellman_ford" -> (q229 _),
    "q230_vocab_kl" -> (q230 _),
    "q231_kcore" -> (q231 _),
    "q232_chunk_dedup" -> (q232 _),
    "q233_hits" -> (q233 _),
    "q234_impute" -> (q234 _),
    "q235_fifo_alloc" -> (q235 _),
    "q236_hill_tail" -> (q236 _),
    "q237_late_data" -> (q237 _))

  val oracle: Map[String, String] = Map(
    "q228_countmin" -> q228Sql,
    "q229_bellman_ford" -> q229Sql,
    "q230_vocab_kl" -> q230Sql,
    "q231_kcore" -> q231Sql,
    "q232_chunk_dedup" -> q232Sql,
    "q233_hits" -> q233Sql,
    "q234_impute" -> q234Sql,
    "q235_fifo_alloc" -> q235Sql,
    "q236_hill_tail" -> q236Sql,
    "q237_late_data" -> q237Sql)
}
