package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.PlanStats.Pinned

/** Graph propagation operators (SURVEY.md §2.12 follow-on; the
  * iterative-analytics tier next to [[Dedup.connectedComponents]]).
  *
  * PageRank here is formulated INTEGER-EXACT: ranks are e9
  * fixed-point longs, every transfer is integer multiply-then-`div`,
  * and per-node contributions sum associatively — so the result is
  * bit-identical on any engine, partitioning, or execution order
  * (floating-point PageRank is not: float sums reorder under
  * parallelism). The truncation bias is ≤1e-9 per edge per step —
  * irrelevant for ranking, decisive for verifiability.
  *
  * Scale shape: the rank table is node-sized (≪ edges) and is
  * broadcast into the edge scan each iteration; contributions
  * partial-aggregate map-side before the one per-iteration shuffle on
  * dst. Edges are materialized once (localCheckpoint) and re-scanned,
  * never re-derived, per iteration.
  */
object Graph {

  /** Single-source BFS distances (unweighted shortest hops) over
    * directed `edges` (src, dst) — frontier-expansion formulation:
    * each round joins ONLY the newly-reached frontier against the
    * edge table and anti-joins the settled set, so per-round cost is
    * frontier-sized, not graph-sized, and rounds = eccentricity of
    * the source. Edges materialize once; every frontier
    * localCheckpoints to cut iterative lineage. All-integer →
    * engine-exact. Returns (node, dist) for REACHED nodes only. */
  def bfsDistances(edges: DataFrame, source: Long,
                   maxDepth: Int = 50): DataFrame = {
    // Edge layout deliberately stays distinct-on-(src,dst) (r12
    // finding): a repartition(src)+dropDuplicates variant — zero
    // e-side exchange per round once the frontier outgrows broadcast
    // — measured slightly SLOWER at sf0.1 (interleaved A/B: q156
    // +0.26 s, q309 +0.29 s against a +0.15 s same-code bias floor)
    // because hash-repartitioning the RAW pair stream forfeits
    // distinct()'s map-side partial dedup (guide §2.3: aggregate
    // before you shuffle), and the local frontier joins broadcast
    // anyway, so the src layout never pays. On a cluster where the
    // frontier exceeds broadcast, add `.repartition(n, col("src"))`
    // AFTER the distinct (one extra narrow exchange of the deduped
    // set) rather than instead of it.
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().pin()
    val spark = edges.sparkSession
    var dist = spark.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist")).pin()
    var frontier = dist
    // r13: checkpointed frames carry no size stats, so the planner
    // never auto-broadcasts the frontier or the settled set — it
    // falls to AQE's runtime conversion, which still pays each join's
    // map-side shuffle write first. The loop KNOWS both sizes for
    // free (the per-round emptiness probe is a count; the settled set
    // is the disjoint union of all frontiers), so broadcast is hinted
    // explicitly below [[BroadcastMaxNodes]] and degrades to the
    // shuffle join above it — same rows either way.
    var frontierN = 1L
    var distN = 1L
    var depth = 0
    var done = false
    while (!done && depth < maxDepth) {
      depth += 1
      val f = if (frontierN <= BroadcastMaxNodes) broadcast(frontier)
              else frontier
      val settled = dist.select(col("node"))
      val next = f
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(if (distN <= BroadcastMaxNodes) broadcast(settled)
              else settled,
          Seq("node"), "left_anti")
        .withColumn("dist", lit(depth.toLong))
        .pin()
      val n = next.count() // the emptiness probe, now also the size
      if (n == 0L) done = true
      else {
        // the settled set re-pins per round DELIBERATELY: an r12
        // lazy-union variant (accumulate pinned frontiers, union
        // without re-pinning) measured consistently SLOWER on the
        // interleaved A/B (q309 +0.63 s, q156 +0.39 s, q241 +0.71 s
        // at sf0.1) — the per-round anti-join over a growing
        // union-of-checkpoint-scans costs more in planning + task
        // count than the one narrow re-materialization saves.
        dist = dist.unionByName(next).pin()
        frontier = next
        frontierN = n
        distN += n
      }
    }
    dist
  }

  /** Node count at or below which the per-iteration rank table (and
    * the one-time out-weight table) is broadcast into the edge scan.
    * 1M (long, long) rows is ~30 MB in executor memory — comfortably
    * inside broadcast capacity. Above it, a forced broadcast of a
    * node-sized table is a scale-killer (a 1B-node rank table is
    * ~16 GB on the wire), so the hint is dropped and the join
    * degrades to a shuffle join on src — AQE picks shuffle-hash at
    * runtime. Same ranks either way (integer arithmetic is
    * order-insensitive here); only the physical plan changes. */
  val BroadcastMaxNodes: Long = 1000000L

  /** One damped-PageRank step: rankᵏ⁺¹(v) = (0.15·E9 div n) +
    * 0.85·Σ_{(u,v)} (rankᵏ(u)·w div out_w(u)). Exposed so plan tests
    * can assert the non-broadcast shape without the localCheckpoint
    * in [[pageRankIntExact]] truncating the lineage. */
  private[graft] def pageRankStep(eOut: DataFrame, nodes: DataFrame,
      ranks: DataFrame, n: Long, small: Boolean): DataFrame = {
    val r = ranks.withColumnRenamed("node", "src")
    val contrib = eOut
      .join(if (small) broadcast(r) else r, Seq("src"))
      .select(col("dst").as("node"),
        expr("rank_e9 * w div ow").as("c"))
      .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
    nodes
      .join(contrib, Seq("node"), "left")
      .select(col("node"),
        (lit(150000000L / n) +
          expr("850 * coalesce(contrib, 0L) div 1000")).as("rank_e9"))
  }

  /** Per-node triangle counts over an undirected simple graph
    * (`pairs`: id_a, id_b; self-loops and duplicate/reversed pairs
    * tolerated) — the classic cohesion/spam-cluster metric.
    *
    * Uses the standard degree orientation (each edge directed from
    * its lower-(degree, id) endpoint), so every wedge is enumerated
    * exactly once FROM its lowest-degree corner: per-node out-degree
    * is O(√m), which bounds the wedge join to O(m^1.5) candidates
    * regardless of skew — a star node of degree 10⁶ generates ZERO
    * wedges from its own corner instead of 10¹². The orientation key
    * packs (degree, id) into one BIGINT so ordering is a single long
    * comparison; ids must be in [0, 10⁹) for the packing (callers
    * with larger ids hash-remap first).
    *
    * Shape: one groupBy for degrees, two narrow joins (wedge build +
    * closing-edge semi-join), one final groupBy — everything integer,
    * so the result is engine-exact. Returns (node, n_triangles) for
    * every node of the graph, zeros included. */
  /** Target wedge rows per reduce partition for the adaptive wedge
    * width — the [[Dedup]] pairsPerPartition discipline applied to
    * the triangle family: the wedge join's output volume is Σ
    * C(outdeg,2) over the ORIENTED edges (wedge mass), not edge
    * count, so inheriting the session's edge-sized shuffle width
    * melts exactly when the graph densifies (measured r11: q508 at
    * the organic ×30 point, 183.5 s, growth exponent 1.22 under 32
    * fixed partitions while per-wedge cost was falling). 4 M wedge
    * rows ≈ 100–200 MB of shuffle input per task. */
  private[graft] val wedgesPerPartition = 4L * 1000 * 1000

  /** Hard ceiling on the adaptive wedge width (same rationale as
    * Dedup.maxAdaptiveWidth: past 2 M partitions the degree
    * orientation / input slicing, not width, is the fix). */
  private[graft] val maxWedgeWidth = 2 * 1000 * 1000

  /** Upper bound on the wedge mass Σ C(outdeg,2) reachable from `m`
    * degree-oriented edges: the orientation caps out-degree at √(2m)
    * (a node of out-degree d has d neighbors of degree ≥ d, so
    * 2m ≥ d²), hence mass ≤ Σ outdeg·√(2m)/2 = m·√(2m)/2. Used as a
    * probe-skip gate, never as the width itself. */
  private[graft] def wedgeMassUpperBound(m: Long): Double =
    m.toDouble * math.sqrt(2.0 * math.max(0L, m)) / 2.0

  /** Probe the wedge mass Σ C(outdeg,2) of an oriented edge set —
    * ONE 1-row aggregate (out-degree histogram folded into a sum),
    * known BEFORE any wedge materializes — and size the wedge-grain
    * shuffle width from it. Callers pass an `oriented` frame whose
    * upstream is pinned, so the probe re-evaluates only the narrow
    * degree joins, never the source scan. Never narrower than the
    * session default.
    *
    * `pinnedEdges` (when the caller has the edge count cheap — one
    * single-stage count of its already-pinned grain) gates the probe:
    * if even [[wedgeMassUpperBound]] fits the session width's
    * capacity (session × wedgesPerPartition), the probe cannot
    * change the answer, so its aggregate job is skipped outright —
    * the r12 round's one measured regression (q191 +11%) was exactly
    * this probe taxing a graph far too small to ever widen. */
  private[graft] def wedgeWidth(oriented: DataFrame,
                                pinnedEdges: Option[Long] = None): Int = {
    val session =
      oriented.sparkSession.sessionState.conf.numShufflePartitions
    val capacity = session.toDouble * wedgesPerPartition
    if (pinnedEdges.exists(m => wedgeMassUpperBound(m) <= capacity))
      return session
    val mass = oriented.groupBy(col("src"))
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1)")).cast("long"), lit(0L)))
      .head().getLong(0) / 2L
    math.min(maxWedgeWidth.toLong, math.max(session.toLong,
      (mass + wedgesPerPartition - 1L) / wedgesPerPartition)).toInt
  }

  def triangleCounts(pairs: DataFrame): DataFrame = {
    val e = pairs
      .select(greatest(col("id_a"), col("id_b")).as("x"),
        least(col("id_a"), col("id_b")).as("y"))
      .filter(col("x") =!= col("y"))
      .distinct().pin()
    val nodes = e.select(col("x").as("node"))
      .unionByName(e.select(col("y").as("node"))).distinct()
    val deg = e.select(col("x").as("n"))
      .unionByName(e.select(col("y").as("n")))
      .groupBy(col("n"))
      .agg((count(lit(1)) * lit(1000000000L) + col("n")).as("k"))
    // orient each edge from the smaller (degree, id) key
    val orientedRaw = e
      .join(deg.select(col("n").as("x"), col("k").as("kx")), Seq("x"))
      .join(deg.select(col("n").as("y"), col("k").as("ky")), Seq("y"))
      .select(
        when(col("kx") < col("ky"), col("x")).otherwise(col("y")).as("src"),
        when(col("kx") < col("ky"), col("y")).otherwise(col("x")).as("dst"),
        greatest(col("kx"), col("ky")).as("kdst"))
    // adaptive wedge width from the MEASURED wedge mass (probe cost:
    // the narrow degree joins over pinned e, once) — probe skipped
    // entirely when the pinned edge count proves the mass bound fits
    // the session width (r13; kills the probe tax on small graphs)
    val width = wedgeWidth(orientedRaw, Some(e.count()))
    val session = pairs.sparkSession.sessionState.conf.numShufflePartitions
    // explicit-count repartition: AQE would coalesce a small edge
    // set to one partition, and the wedge self-join's m^1.5 output
    // inherits the stream side's partitioning — a single-task wedge
    // blow-up (same hazard fixed in [[twoHopReach]])
    val oriented = orientedRaw
      .repartition(width, col("src"))
      .pin()
    // wedges (u; v, w) with k(v) < k(w): the closing edge, if present,
    // is oriented v → w by the same total order
    val wedges = oriented.select(col("src"), col("dst").as("v"),
        col("kdst").as("kv"))
      .join(oriented.select(col("src"), col("dst").as("w"),
        col("kdst").as("kw")), Seq("src"))
      .filter(col("kv") < col("kw"))
      .select(col("src").as("u"), col("v"), col("w"))
    // widen the closing-edge shuffle too: its input is wedge-grain.
    // The explicit hash layout on (v, w) satisfies the semi-join's
    // clustering, so this is the join's own exchange made wider,
    // not an extra one.
    val wedgesLaid =
      if (width > session) wedges.repartition(width, col("v"), col("w"))
      else wedges
    val tris = wedgesLaid.join(
      oriented.select(col("src").as("v"), col("dst").as("w")),
      Seq("v", "w"), "left_semi")
    val perNode = tris.select(col("u").as("node"))
      .unionByName(tris.select(col("v").as("node")))
      .unionByName(tris.select(col("w").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    nodes.join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Per-node local clustering coefficient: how close each node's
    * neighborhood is to a clique — n_triangles(v) / C(deg(v), 2).
    * The community-structure probe next to [[triangleCounts]]'s
    * closure census (a node can sit on many triangles yet have a
    * sparse neighborhood when its degree is large).
    *
    * All-integer: triangles and wedges (deg·(deg−1)/2) are exact
    * counts, and the coefficient is emitted as ppm via integer
    * division (0 for degree-<2 nodes, where it is undefined), so the
    * result is engine-exact — no float ratio ever forms.
    *
    * Shape: [[triangleCounts]]'s oriented-wedge pipeline plus one
    * degree aggregate over the same deduped edge set — the m^1.5
    * wedge bound is unchanged and the extra join is node-sized.
    * Returns (node, degree, n_triangles, n_wedges, lcc_ppm). */
  def localClustering(pairs: DataFrame): DataFrame = {
    val e = pairs
      .select(greatest(col("id_a"), col("id_b")).as("x"),
        least(col("id_a"), col("id_b")).as("y"))
      .filter(col("x") =!= col("y"))
      .distinct()
    val deg = e.select(col("x").as("node"))
      .unionByName(e.select(col("y").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    triangleCounts(pairs)
      .join(deg, Seq("node"))
      .select(col("node"), col("degree"), col("n_triangles"),
        expr("degree * (degree - 1) div 2").as("n_wedges"),
        when(col("degree") < 2, lit(0L))
          .otherwise(expr("n_triangles * 1000000 div " +
            "(degree * (degree - 1) div 2)")).as("lcc_ppm"))
  }

  /** `iterations` rounds of damped PageRank over weighted directed
    * `edges` (columns: src, dst, w — positive long weights).
    *
    * rank⁰ = E9 div n for every node appearing as src or dst;
    * rankᵏ⁺¹(v) = (0.15·E9 div n) + 0.85·Σ_{(u,v)} (rankᵏ(u)·w div
    * out_w(u)), all in integer arithmetic (damping as ·850 div 1000).
    * Dangling nodes (no out-edges) simply contribute nothing — the
    * standard simplification, mirrored exactly by the oracle.
    *
    * `broadcastMaxNodes` gates the per-iteration broadcast (see
    * [[BroadcastMaxNodes]]); pass 0 to force the shuffle-join path.
    *
    * Returns (node, rank_e9). */
  def pageRankIntExact(edges: DataFrame, iterations: Int,
      broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    val E9 = 1000000000L
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long")).pin()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().pin()
    val n = nodes.count()
    val small = n <= broadcastMaxNodes
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    // out-weight rides along each edge once, up front: per-iteration
    // work is then a single join against the current ranks
    val eOut = e.join(if (small) broadcast(outW) else outW, Seq("src"))
      .pin()
    var ranks = nodes.withColumn("rank_e9", lit(E9 / n))
    for (_ <- 1 to iterations) {
      ranks = pageRankStep(eOut, nodes, ranks, n, small).pin()
    }
    ranks
  }

  /** Personalized PageRank: identical integer-exact formulation to
    * [[pageRankIntExact]], but ALL teleport mass returns to the
    * source set (`isSource` over the node id — must be a pure
    * function), so ranks measure proximity to the sources instead of
    * global centrality — the random-walk recommender / related-items
    * primitive. Initial mass and the 0.15 teleport split E9 div |S|
    * across sources; non-sources get contribution mass only. Same
    * per-iteration shape and the same conditional broadcast guard. */
  def personalizedPageRankIntExact(edges: DataFrame,
      isSource: Column => Column, iterations: Int,
      broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    val E9 = 1000000000L
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long")).pin()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().pin()
    val nSrc = nodes.filter(isSource(col("node"))).count()
    require(nSrc > 0, "source set matches no graph node")
    val small = nodes.count() <= broadcastMaxNodes
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val eOut = e.join(if (small) broadcast(outW) else outW, Seq("src"))
      .pin()
    val teleport = when(isSource(col("node")), lit(150000000L / nSrc))
      .otherwise(lit(0L))
    var ranks = nodes.withColumn("rank_e9",
      when(isSource(col("node")), lit(E9 / nSrc)).otherwise(lit(0L)))
    for (_ <- 1 to iterations) {
      val r = ranks.withColumnRenamed("node", "src")
      val contrib = eOut
        .join(if (small) broadcast(r) else r, Seq("src"))
        .select(col("dst").as("node"),
          expr("rank_e9 * w div ow").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (teleport + expr("850 * coalesce(contrib, 0L) div 1000"))
            .as("rank_e9"))
        .pin()
    }
    ranks
  }

  /** Single-source WEIGHTED shortest paths (Bellman–Ford with a
    * delta frontier) over directed `edges` (src, dst, w), positive
    * integer weights — the weighted companion to [[bfsDistances]].
    *
    * Per round, only nodes whose tentative distance IMPROVED last
    * round re-relax their out-edges (the frontier), so round cost is
    * frontier×degree, not graph-sized; rounds are bounded by the
    * hop-length of the longest shortest path (≤ the classic V−1, in
    * practice the weighted eccentricity). All arithmetic is long
    * integer — engine-exact under any execution order. Edges
    * materialize once; each round's frontier and the distance table
    * localCheckpoint to cut iterative lineage.
    *
    * Returns (node, dist) for REACHED nodes only. */
  def bellmanFord(edges: DataFrame, source: Long,
                  maxRounds: Int = 100,
                  broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long")).pin()
    // node-sized tables (frontier, tentative distances) broadcast
    // into the edge scan below this bound — the [[BroadcastMaxNodes]]
    // posture: never force a broadcast of something that grows with
    // the graph; above the bound the joins degrade to shuffles
    val small =
      e.select(col("dst").as("node")).distinct().count() <= broadcastMaxNodes
    def bc(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val spark = edges.sparkSession
    var dist = spark.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist")).pin()
    var frontier = dist
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      val cand = e
        .join(bc(frontier), frontier("node") === e("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("nd"))
        .groupBy(col("node")).agg(min(col("nd")).as("nd"))
      val improved = cand
        .join(bc(dist.select(col("node").as("n0"), col("dist").as("old"))),
          cand("node") === col("n0"), "left_outer")
        .filter(col("old").isNull || col("nd") < col("old"))
        .select(col("node"), col("nd").as("dist"))
        .pin()
      if (improved.isEmpty) done = true
      else {
        dist = dist
          .join(bc(improved.select(col("node").as("n1"))),
            dist("node") === col("n1"), "left_anti")
          .unionByName(improved)
          .pin()
        frontier = improved
      }
    }
    // loud, not silently non-optimal: a deeper graph than maxRounds
    // would otherwise return truncated distances that fail the oracle
    // downstream with no hint of why (kCore discipline)
    require(done,
      s"bellmanFord did not converge within $maxRounds rounds — " +
        "raise maxRounds (longest shortest-path exceeds it)")
    dist
  }

  /** k-core membership: the maximal subgraph where every node keeps
    * at least `k` neighbors — iterative peel (drop nodes with
    * in-core degree < k, recompute, repeat) to the fixpoint.
    *
    * `adj` is the SYMMETRIZED adjacency (u, v) — pass both
    * directions for an undirected graph. Each round is one join of
    * the (narrow, id-only) survivor set against the adjacency plus a
    * degree aggregate; cost is edges-among-survivors, monotonically
    * shrinking. The convergence probe compares survivor COUNTS
    * (peeling is monotone, so equal counts ⇔ fixpoint) — one scalar
    * action per round, the [[Dedup.connectedComponents]] discipline.
    *
    * Throws if the peel hasn't converged within `maxRounds`, rather
    * than silently returning a non-core — callers pin `maxRounds`
    * to what their oracle unrolls. Returns (node, core_deg) for
    * members, core_deg the node's degree INSIDE the core. */
  def kCore(adj: DataFrame, k: Int, maxRounds: Int = 10,
            broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val a = adj.select(col("u").cast("long"), col("v").cast("long"))
      .distinct().pin()
    var surv = a.select(col("u").as("node")).distinct().pin()
    var nSurv = surv.count()
    // the id-only survivor set broadcasts into the adjacency scan
    // while node-sized (same conditional posture as PageRank's rank
    // table); above the bound both semi-joins degrade to shuffles
    def bc(df: DataFrame): DataFrame =
      if (nSurv <= broadcastMaxNodes) broadcast(df) else df
    def among(surviving: DataFrame): DataFrame = a
      .join(bc(surviving.select(col("node").as("su"))), col("u") === col("su"))
      .join(bc(surviving.select(col("node").as("sv"))), col("v") === col("sv"))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      round += 1
      val next = among(surv).filter(col("deg") >= k)
        .select(col("u").as("node")).pin()
      val nNext = next.count()
      if (nNext == nSurv) converged = true
      else { surv = next; nSurv = nNext }
    }
    require(converged, s"kCore(k=$k) did not converge in $maxRounds rounds")
    among(surv).select(col("u").as("node"), col("deg").as("core_deg"))
  }

  /** HITS hubs-and-authorities (Kleinberg), INTEGER-EXACT like
    * [[pageRankIntExact]]: scores are e9 fixed-point longs
    * renormalized to sum 1e9 after every half-step (auth from hubs,
    * then hubs from auths), every transfer an integer
    * multiply-then-sum and every normalization one integer `div` —
    * bit-identical on any engine or execution order.
    *
    * Scale shape: per half-step one edge↔score join (score table
    * node-sized, broadcast under `broadcastMaxNodes`, shuffle-join
    * above) + one aggregate on the opposite endpoint; the
    * normalizing total rides as a broadcast 1-row cross join, never
    * a collect. Returns (node, hub_e9, auth_e9). */
  def hitsIntExact(edges: DataFrame, iterations: Int,
      broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    val E9 = 1000000000L
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long")).pin()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().pin()
    val n = nodes.count()
    require(n > 0, "hitsIntExact: edges must be non-empty")
    val small = n <= broadcastMaxNodes
    def bc(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // raw scores renormalized to Σ=1e9: node-sized aggregate, one
    // broadcast scalar row — integer div floors identically anywhere
    // raw·1e9 can exceed 2^63 (raw is bounded by t, itself up to
    // score-scale × total edge weight) — the multiply runs in
    // DECIMAL(38,0), the q140 128-bit discipline; the quotient is
    // < 1e9 so the final long cast is exact
    def normalized(raw: DataFrame): DataFrame = {
      val tot = raw.agg(sum(col("raw")).as("t"))
      nodes.join(bc(raw), Seq("node"), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          expr("CAST(coalesce(raw, 0L) AS DECIMAL(38,0)) * 1000000000 div t")
            .cast("long").as("s"))
    }
    var hubs = nodes.withColumn("s", lit(E9 / n))
    var auths = hubs
    for (_ <- 1 to iterations) {
      auths = normalized(e
        .join(bc(hubs.select(col("node").as("src"), col("s").as("hs"))),
          Seq("src"))
        .select(col("dst").as("node"), (col("hs") * col("w")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("raw")))
        .pin()
      hubs = normalized(e
        .join(bc(auths.select(col("node").as("dst"), col("s").as("as_"))),
          Seq("dst"))
        .select(col("src").as("node"), (col("as_") * col("w")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("raw")))
        .pin()
    }
    hubs.select(col("node"), col("s").as("hub_e9"))
      .join(auths.select(col("node"), col("s").as("auth_e9")), Seq("node"))
  }

  /** Strongly connected components of a directed graph — the FW-BW
    * coloring formulation (Orzan), fully deterministic:
    *
    * Each outer round (1) propagates MIN labels forward along edges
    * to a fixpoint, so c(v) = the smallest node that can reach v in
    * the still-active subgraph (frontier-optimized: only improved
    * labels re-join the edge table, the Bellman–Ford shape); (2)
    * runs a backward BFS from each color's pivot (the node p with
    * c(p) = p — the color class IS "nodes whose min reacher is p")
    * restricted to the pivot's color, which yields exactly
    * SCC(p) = forward-reach(p) ∩ backward-reach(p); (3) removes the
    * settled SCCs and repeats on the remainder. ALL colors process
    * their pivots in the same round — one multi-source BFS keyed by
    * color — so a round settles as many SCCs as there are colors,
    * and outer rounds are bounded by the depth of the condensation
    * DAG along min-label chains, not by the SCC count.
    *
    * Min-label fixpoints are order-independent → engine-exact.
    * Every per-round table is frontier- or node-sized; edges
    * repartition once per outer round (explicit count — the
    * AQE-coalesce posture from [[twoHopReach]]) and re-scan from a
    * localCheckpoint. Loud failure (kCore discipline) if either
    * fixpoint exhausts its round budget.
    *
    * Returns (node, scc_id = min node of the component). */
  def stronglyConnectedComponents(edges: DataFrame, maxOuter: Int = 30,
                                  maxInner: Int = 80): DataFrame = {
    val sp = edges.sparkSession.sessionState.conf.numShufflePartitions
    var e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .repartition(sp, col("src")).pin()
    var nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().pin()
    var result: DataFrame = null
    var outer = 0
    // The bfsDistances r13 gated-broadcast rework was tried on every
    // node-grain join in this operator and REJECTED by measurement:
    // interleaved fresh-JVM A/B at sf0.1, q241 SLOWER in all 3
    // paired rounds (min 4.10 → 5.26 s, +28%; /tmp/ab_q241). The
    // difference from BFS: SCC runs DOZENS of inner fixpoint rounds
    // (trim + forward-label + backward passes), each with 2–4 joins
    // whose small sides are minuscule — a broadcast hint per join
    // per round adds a driver collect + broadcast-build job each
    // time, which costs more than the tiny shuffles it replaces.
    // `bc` is kept as the identity so the rejected variant is one
    // edit away for a future cluster-scale re-A/B.
    def bc(nodeGrain: DataFrame): DataFrame = nodeGrain
    while (!nodes.isEmpty && outer < maxOuter) {
      outer += 1
      // (0) trim: a node with no in-edges or no out-edges in the
      // active subgraph is its own SCC — peel to a fixpoint (each
      // settled SCC exposes new periphery). This is what keeps
      // DAG-heavy graphs from serializing one color per round
      // through the coloring phase: the acyclic periphery settles
      // here, coloring only ever sees the cyclic cores.
      var peeling = true
      var pr = 0
      while (peeling && pr < maxInner && !nodes.isEmpty) {
        pr += 1
        val core = e.select(col("src").as("node")).distinct()
          .join(bc(e.select(col("dst").as("node")).distinct()),
            Seq("node"), "left_semi")
        val singles = nodes.join(bc(core), Seq("node"), "left_anti")
          .pin()
        if (singles.isEmpty) peeling = false
        else {
          val settled = singles.select(col("node"),
            col("node").as("lbl"))
          result =
            (if (result == null) settled else result.unionByName(settled))
              .pin()
          nodes = nodes.join(bc(singles), Seq("node"), "left_anti")
            .pin()
          e = e.join(bc(singles.select(col("node").as("src"))), Seq("src"),
              "left_anti")
            .join(bc(singles.select(col("node").as("dst"))), Seq("dst"),
              "left_anti")
            .repartition(sp, col("src")).pin()
        }
      }
      require(!peeling || pr < maxInner,
        s"SCC trim did not reach a fixpoint within $maxInner rounds")
      if (nodes.isEmpty) {
        // everything peeled — no cyclic core left this round
      } else {
      // (1) forward min-label fixpoint on the active subgraph
      var c = nodes.select(col("node"), col("node").as("lbl"))
        .pin()
      var frontier = c
      var inner = 0
      while (!frontier.isEmpty && inner < maxInner) {
        inner += 1
        val cand = e
          .join(bc(frontier.select(col("node").as("src"),
            col("lbl").as("plbl"))), Seq("src"))
          .select(col("dst").as("node"), col("plbl"))
          .groupBy(col("node")).agg(min(col("plbl")).as("plbl"))
        val improved = cand.join(bc(c), Seq("node"))
          .filter(col("plbl") < col("lbl"))
          .select(col("node"), col("plbl").as("lbl")).pin()
        if (improved.isEmpty) frontier = improved
        else {
          c = c.join(bc(improved.select(col("node").as("n1"))),
              col("node") === col("n1"), "left_anti")
            .unionByName(improved).pin()
          frontier = improved
        }
      }
      require(frontier.isEmpty,
        s"SCC forward pass did not converge within $maxInner rounds")
      // (2) multi-source backward BFS from every pivot, color-locked
      var reached = c.filter(col("node") === col("lbl")).pin()
      var bf = reached
      var bRounds = 0
      while (!bf.isEmpty && bRounds < maxInner) {
        bRounds += 1
        val cand = e
          .join(bc(bf.select(col("node").as("dst"), col("lbl").as("flbl"))),
            Seq("dst"))
          .select(col("src").as("node"), col("flbl")).distinct()
          .join(bc(c), Seq("node"))
          .filter(col("lbl") === col("flbl"))
          .select(col("node"), col("lbl"))
        bf = cand.join(bc(reached), Seq("node"), "left_anti").pin()
        if (!bf.isEmpty)
          reached = reached.unionByName(bf).pin()
      }
      require(bf.isEmpty,
        s"SCC backward pass did not converge within $maxInner rounds")
      // (3) settle and shrink
      result =
        (if (result == null) reached else result.unionByName(reached))
          .pin()
      nodes = nodes.join(bc(reached.select("node")), Seq("node"),
          "left_anti")
        .pin()
      e = e.join(bc(reached.select(col("node").as("src"))), Seq("src"),
          "left_anti")
        .join(bc(reached.select(col("node").as("dst"))), Seq("dst"),
          "left_anti")
        .repartition(sp, col("src")).pin()
      }
    }
    require(nodes.isEmpty,
      s"SCC did not settle every node within $maxOuter outer rounds")
    result.select(col("node"), col("lbl").as("scc_id"))
  }

  /** Degree-capped ranked adjacency: (src, dst, idx) with idx the
    * 0-based ascending-dst rank among src's neighbors, keeping only
    * the `maxDeg` smallest dst per src. The random-walk input shape
    * (q292): a walker at node v picks neighbor `hash % degC(v)`, so
    * ranking the top-`maxDeg` neighbors and taking the modulus over
    * the CAPPED degree (= the row count of this output per src)
    * preserves the pick-is-always-resolvable invariant while bounding
    * the per-node work.
    *
    * Scale shape: the naive `row_number().over(partitionBy(src))`
    * sorts each node's whole neighbor list in ONE task — a 10⁷-degree
    * hub serializes. This routes through the TopKPerKey bounded-heap
    * plan instead: each map task keeps ≤ maxDeg neighbors per src
    * (heap insert, no sort), shuffle volume ≤ maxDeg·nodes·partitions
    * rows INDEPENDENT of hub degree, and the merge side emits the
    * rank. A hub's surplus neighbors die map-side. */
  def rankedAdjacency(edges: DataFrame, maxDeg: Int): DataFrame = {
    require(maxDeg > 0, "maxDeg must be positive")
    org.apache.spark.sql.graftx.TopKPerKeyPlan
      .topK(edges.select(col("src"), col("dst")), Seq("src"),
        Seq("dst" -> false), maxDeg, "idx")
      .withColumn("idx", col("idx") - 1)
  }

  /** Two-hop reach (friend-of-friend audience size) over a symmetric
    * edge set `und` (a, b): per node, the count of distinct nodes
    * exactly two hops away — mid-join, dedup, anti-join direct edges.
    *
    * Volume is inherently Σ deg²(mid), but on a power-law graph the
    * plain `join(..., "mid")` serializes one hub of degree d into a
    * single d²-pair task — the classic skew cliff. Mitigation: mids
    * with degree ≥ `hubThreshold` split off into a [[Salt.join]]
    * (fact side salted, hub-restricted dim side replicated ×
    * `buckets`), so a hub's d² pairs spread over `buckets` tasks; the
    * cold mids take the plain co-partitioned join. The hub set is at
    * most 2·|E|/hubThreshold nodes — broadcast-sized by construction
    * — so the hot/cold routing is two broadcast (anti-)semi-joins,
    * never a shuffle. Replication cost is buckets·deg(hot) rows
    * against a d² ≥ hubThreshold·deg output — strictly amortized.
    * Results are exactly the plain join's: the mid partition is
    * disjoint and the pair-level `distinct` runs over the union.
    * Returns (node, two_hop) for every node, 0 when none. */
  def twoHopReach(und: DataFrame, hubThreshold: Int = 512,
                  buckets: Int = 16): DataFrame = {
    require(hubThreshold > 0 && buckets > 0,
      "hubThreshold and buckets must be positive")
    // repartition (with an EXPLICIT count — column-only repartition
    // is AQE-coalescible) BEFORE the checkpoint: AQE shrinks a small
    // edge set to one partition, and the mid-join's Σ deg² output
    // inherits the stream side's partitioning — without this the
    // downstream pair-distinct partial-aggregates the entire Σ deg²
    // blow-up in a single task
    val shufflePartitions =
      und.sparkSession.sessionState.conf.numShufflePartitions
    val e = und.select(col("a").cast("long").as("a"),
        col("b").cast("long").as("b"))
      .repartition(shufflePartitions, col("a")).pin()
    val hot = e.groupBy(col("a").as("mid")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= hubThreshold).select("mid")
    val l = e.select(col("a").as("src"), col("b").as("mid"))
    val r = e.select(col("a").as("mid"), col("b").as("dst"))
    val twoCold = l.join(broadcast(hot), Seq("mid"), "left_anti")
      .join(r.join(broadcast(hot), Seq("mid"), "left_anti"), Seq("mid"))
    val twoHot = Salt.join(
      l.join(broadcast(hot), Seq("mid"), "left_semi"),
      r.join(broadcast(hot), Seq("mid"), "left_semi"),
      Seq("mid"), buckets)
    val two = twoCold.select(col("src"), col("dst"))
      .unionByName(twoHot.select(col("src"), col("dst")))
      .filter(col("src") =!= col("dst")).distinct()
    val reach = two
      .join(e.select(col("a").as("src"), col("b").as("dst")),
        Seq("src", "dst"), "left_anti")
      .groupBy(col("src")).agg(count(lit(1)).as("two_hop"))
    e.select(col("a").as("src")).distinct()
      .join(reach, Seq("src"), "left")
      .select(col("src").as("node"),
        coalesce(col("two_hop"), lit(0L)).as("two_hop"))
  }

  /** Adamic–Adar link prediction over a symmetric edge set `und`
    * (a, b): for every NON-adjacent pair (u < v), the sum over common
    * neighbors w of 1/ln(deg(w)) — the classic common-neighbor score
    * weighted so that promiscuous mids count less.
    *
    * Mids are restricted to 2 ≤ deg ≤ `degCap`. The lower bound is
    * definitional (a degree-1 node has no wedges; ln(1) = 0 would
    * divide by zero); the cap is the operator's scale contract: a
    * hub's 1/ln(deg) weight is already near-noise, and capping bounds
    * the per-mid wedge fan-out at degCap² — so the wedge join needs
    * NO salting to survive a power-law graph (contrast
    * [[twoHopReach]], whose unweighted semantics force it to keep
    * hubs and salt them). Scores are e6 fixed-point longs —
    * round(1e6/ln(deg)) per mid, integer-summed, engine-exact
    * (ln over the ≤ degCap distinct degree values is IEEE-identical
    * everywhere).
    *
    * Returns (u, v, n_common, aa_e6) for candidate pairs only
    * (non-adjacent, ≥1 eligible common neighbor). */
  def adamicAdar(und: DataFrame, degCap: Int = 64): DataFrame = {
    require(degCap >= 2, "degCap must be at least 2")
    val shufflePartitions =
      und.sparkSession.sessionState.conf.numShufflePartitions
    val e = und.select(col("a").cast("long").as("a"),
        col("b").cast("long").as("b"))
      .repartition(shufflePartitions, col("a")).pin()
    // node-grain weights ride the wedge join attached to the right
    // leg (one co-partitioned join on mid) — NOT broadcast: the
    // weight table grows with the graph
    val w = e.groupBy(col("a").as("mid")).agg(count(lit(1)).as("deg"))
      .filter(col("deg").between(2, degCap))
      .select(col("mid"),
        round(lit(1000000.0) / log(col("deg"))).cast("long").as("w_e6"))
    val l = e.select(col("b").as("mid"), col("a").as("u"))
    val r = e.select(col("a").as("mid"), col("b").as("v"))
      .join(w, Seq("mid"))
    val scored = l.join(r, Seq("mid"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"), sum(col("w_e6")).as("aa_e6"))
    scored.join(
      e.select(col("a").as("u"), col("b").as("v")),
      Seq("u", "v"), "left_anti")
  }

  /** Synchronous label propagation over a symmetric edge set `und`
    * (a, b), `rounds` fixed rounds: every node starts as its own
    * label; each round every node adopts the most frequent label
    * among its neighbors, ties broken by smallest label. The round
    * count is part of the operator contract (synchronous LPA need not
    * converge — it can 2-cycle on bipartite structures — so a fixed
    * horizon is what makes the computation deterministic and
    * engine-exact, not a convergence loop).
    *
    * The pick is a single integer arg-max — key = c·10^7 + (10^7−1−lab)
    * — so it is reproducible under any aggregation order; labels must
    * be < 10^7 (checked).
    *
    * Scale shape: per round, ONE co-partitioned join of the
    * edge table against the node-sized label table (both hash-
    * partitioned on the same key count), a (node, lab) partial-
    * aggregating count, and a node-grain arg-max; label tables
    * localCheckpoint per round to cut iterative lineage. Returns
    * (node, lab). */
  def labelPropagation(und: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20, "rounds must be in [1, 20]")
    val shufflePartitions =
      und.sparkSession.sessionState.conf.numShufflePartitions
    val e = und.select(col("a").cast("long").as("a"),
        col("b").cast("long").as("b"))
      .repartition(shufflePartitions, col("b")).pin()
    val maxLab = e.agg(max(greatest(col("a"), col("b")))).head().getLong(0)
    require(maxLab < 10000000L,
      s"labelPropagation: labels must be < 1e7 (got $maxLab) — the " +
        "tie-break arg-max packs (count, label) into one long")
    var lab = e.select(col("a").as("node")).distinct()
      .withColumn("lab", col("node"))
      .repartition(shufflePartitions, col("node")).pin()
    // Broadcast-hinting the label table into the per-round edge join
    // (the bfsDistances r13 change) was tried here and REJECTED by
    // measurement: 7 interleaved fresh-JVM rounds at sf0.1, 5 slower,
    // median ≈ +0.3 s (/tmp/ab_wave1, /tmp/ab_q247q309). Unlike the
    // BFS frontier joins, e (hash(b)) and lab (hash(node→b)) are
    // ALREADY co-partitioned by construction, so the join runs with
    // zero exchange and the hint only replaces a cheap local hash
    // build with a per-round driver collect + rebroadcast.
    for (_ <- 1 to rounds) {
      lab = e.join(lab.select(col("node").as("b"), col("lab")), Seq("b"))
        .groupBy(col("a"), col("lab")).agg(count(lit(1)).as("c"))
        .groupBy(col("a")).agg(max_by(col("lab"),
          col("c") * lit(10000000L) + (lit(9999999L) - col("lab")))
          .as("lab"))
        .select(col("a").as("node"), col("lab"))
        .repartition(shufflePartitions, col("node")).pin()
    }
    lab
  }
}
