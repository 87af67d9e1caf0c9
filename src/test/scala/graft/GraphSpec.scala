package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Integer-exact PageRank semantics on hand-computable graphs. */
class GraphSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)],
                    iters: Int): Map[Long, Long] =
    Graph.pageRankIntExact(edges.toDF("src", "dst", "w"), iters)
      .as[(Long, Long)].collect().toMap

  test("symmetric 2-cycle stays uniform at every iteration") {
    for (i <- 1 to 3)
      assert(ranks(Seq((1L, 2L, 1L), (2L, 1L, 1L)), i) ==
        Map(1L -> 500000000L, 2L -> 500000000L))
  }

  test("single edge: source decays to the teleport floor, sink " +
       "accumulates — exact hand-computed fixed-point values") {
    // n=2, r0=500M each; a has the only out-edge
    // it1: a = 75M, b = 75M + (850*500M) div 1000 = 500M
    // it2+: b = 75M + (850*75M) div 1000 = 138_750_000
    assert(ranks(Seq((1L, 2L, 1L)), 1) ==
      Map(1L -> 75000000L, 2L -> 500000000L))
    assert(ranks(Seq((1L, 2L, 1L)), 3) ==
      Map(1L -> 75000000L, 2L -> 138750000L))
  }

  test("forced shuffle-join path (broadcastMaxNodes=0) produces " +
       "identical ranks to the broadcast path") {
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L),
      (3L, 1L, 1L), (4L, 1L, 5L))
    val bc = Graph.pageRankIntExact(edges.toDF("src", "dst", "w"), 4)
      .as[(Long, Long)].collect().toMap
    val sh = Graph.pageRankIntExact(edges.toDF("src", "dst", "w"), 4,
      broadcastMaxNodes = 0L).as[(Long, Long)].collect().toMap
    assert(bc == sh)
  }

  test("non-broadcast step plan contains no broadcast of the rank " +
       "table (scale posture: node-sized tables must not be forced " +
       "onto the wire)") {
    val e = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val nodes = e.select($"src".as("node"))
      .union(e.select($"dst".as("node"))).distinct()
    val eOut = e.join(
      e.groupBy($"src").agg(org.apache.spark.sql.functions.sum($"w").as("ow")),
      Seq("src"))
    val ranks = nodes.withColumn("rank_e9",
      org.apache.spark.sql.functions.lit(500000000L))
    val step = Graph.pageRankStep(eOut, nodes, ranks, 2L, small = false)
    step.collect() // materialize so AQE finalizes the physical plan
    val plan = step.queryExecution.executedPlan.toString
    // AQE may still broadcast tiny test inputs on its own size
    // estimates; the property under test is the LOGICAL one — no
    // forced hint. Assert on the optimized logical plan instead.
    val logical = step.queryExecution.optimizedPlan.toString
    assert(!logical.contains("ResolvedHint") &&
        !logical.contains("strategy=broadcast"),
      s"rank-table broadcast hint leaked into non-broadcast path:\n$logical\n$plan")
  }

  test("bfsDistances: chain distances, branch minimum, unreachable " +
       "nodes absent") {
    // 0→1→2→3 chain, plus shortcut 0→5→3 (still 2 hops... 5 at 1,
    // 3 at min(3 via chain, 2 via shortcut) = 2), and 9→0 (9 is
    // UPSTREAM of the source — unreachable from 0)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 5L), (5L, 3L),
      (9L, 0L)).toDF("src", "dst")
    val d = graft.operators.Graph.bfsDistances(edges, source = 0L)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(0L -> 0L, 1L -> 1L, 5L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("triangleCounts: K4 has 3 per node, squares and stars have " +
       "none, duplicate/reversed/self pairs are tolerated") {
    // K4 on {1,2,3,4} with noisy input (dups, reversals, self-loop),
    // a 4-cycle {10,11,12,13} (no diagonals), a star center 20
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 1L), (1L, 1L), // noise
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L),
      (20L, 21L), (20L, 22L), (20L, 23L)).toDF("id_a", "id_b")
    val r = graft.operators.Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(r(_) == 3L))
    assert(Seq(10L, 11L, 12L, 13L, 20L, 21L, 22L, 23L).forall(r(_) == 0L))
    assert(r.size == 12)
  }

  test("localClustering: K4 corner is fully closed (1.0), a square " +
       "corner is open, leaves have zero wedges") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L),
      (20L, 21L)).toDF("id_a", "id_b")
    val r = graft.operators.Graph.localClustering(edges)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    // K4 node: deg 3, 3 triangles, 3 wedges → ppm 1_000_000
    assert(r(1L) == ((3L, 3L, 3L, 1000000L)))
    // square node: deg 2, 0 triangles, 1 wedge → 0
    assert(r(10L) == ((2L, 0L, 1L, 0L)))
    // leaf: deg 1, no wedge, coefficient defined as 0
    assert(r(20L) == ((1L, 0L, 0L, 0L)))
  }

  test("weights split a source's rank proportionally (integer div)") {
    // n=3 ⇒ r0 = 333_333_333 each, teleport floor = 50M; ow(a)=4
    // contrib(b) = (333333333·3) div 4 = 249_999_999
    //   → b = 50M + (850·249999999) div 1000 = 262_499_999
    // contrib(c) = (333333333·1) div 4 = 83_333_333
    //   → c = 50M + (850·83333333) div 1000 = 120_833_333
    val r = ranks(Seq((1L, 2L, 3L), (1L, 3L, 1L)), 1)
    assert(r(2L) == 262499999L)
    assert(r(3L) == 120833333L)
    assert(r(1L) == 50000000L)
  }

  test("bellmanFord: cheap multi-hop route beats the expensive " +
       "direct edge; unreachable nodes are absent") {
    // 1→4 direct costs 10; 1→2→3→4 costs 3; node 5 feeds 1 only
    val e = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L),
      (3L, 4L, 1L), (5L, 1L, 7L)).toDF("src", "dst", "w")
    val d = Graph.bellmanFord(e, source = 1L)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bellmanFord: a later-found longer-hop path still wins when " +
       "cheaper (relaxation past the BFS distance)") {
    // direct hop w=9; 3-hop chain w=1 each → dist 3
    val e = Seq((1L, 9L, 9L), (1L, 2L, 1L), (2L, 3L, 1L),
      (3L, 9L, 1L)).toDF("src", "dst", "w")
    val d = Graph.bellmanFord(e, 1L).as[(Long, Long)].collect().toMap
    assert(d(9L) == 3L)
  }

  test("kCore: a chain peels completely, a cycle survives as its " +
       "own 2-core, and peeling cascades through tails") {
    // square 1-2-3-4 (2-core) with a tail 4-5-6 (peels in 2 rounds)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (4L, 5L), (5L, 6L))
    val adj = (und ++ und.map(p => (p._2, p._1))).toDF("u", "v")
    val core = Graph.kCore(adj, k = 2).as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("hitsIntExact: two pure hubs feeding one authority — exact " +
       "L1-normalized fixed point") {
    // 1→2, 3→2: authority mass all on 2, hub mass split between 1,3
    val e = Seq((1L, 2L, 1L), (3L, 2L, 1L)).toDF("src", "dst", "w")
    val r = Graph.hitsIntExact(e, iterations = 3)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(1L) == ((500000000L, 0L)))
    assert(r(3L) == ((500000000L, 0L)))
    assert(r(2L) == ((0L, 1000000000L)))
  }

  test("hitsIntExact: edge weights split authority 3:1 (exact " +
       "integer division)") {
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r = Graph.hitsIntExact(e, 3)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(1L) == ((1000000000L, 0L)))
    assert(r(2L) == ((0L, 750000000L)))
    assert(r(3L) == ((0L, 250000000L)))
  }

  test("kCore: k above the max degree empties; k=1 keeps every " +
       "non-isolated node") {
    val und = Seq((1L, 2L), (2L, 3L))
    val adj = (und ++ und.map(p => (p._2, p._1))).toDF("u", "v")
    assert(Graph.kCore(adj, k = 3).isEmpty)
    val k1 = Graph.kCore(adj, k = 1).as[(Long, Long)].collect().toMap
    assert(k1 == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("stronglyConnectedComponents: two cycles joined by a one-way " +
       "bridge stay separate components; the tail is singletons") {
    // cycle {1,2,3}, bridge 3→5, cycle {5,6,7}, tail 7→9→10
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 5L),
      (5L, 6L), (6L, 7L), (7L, 5L), (7L, 9L), (9L, 10L))
      .toDF("src", "dst")
    val r = Graph.stronglyConnectedComponents(e)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 9L -> 9L, 10L -> 10L))
  }

  test("stronglyConnectedComponents: a pure path is all singletons " +
       "(trim-only), a full cycle is one component (coloring-only)") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val rp = Graph.stronglyConnectedComponents(path)
      .as[(Long, Long)].collect().toMap
    assert(rp == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    val cycle = (0L to 9L).map(i => (i, (i + 1) % 10)).toDF("src", "dst")
    val rc = Graph.stronglyConnectedComponents(cycle)
      .as[(Long, Long)].collect().toMap
    assert(rc == (0L to 9L).map(_ -> 0L).toMap)
  }

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).distinct.toDF("a", "b")

  test("twoHopReach: path counts one node at distance 2, triangle " +
       "counts none (all neighbors direct)") {
    // path 1-2-3-4 + triangle 5-6-7
    val und = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (5L, 7L)))
    val r = Graph.twoHopReach(und).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 0L, 6L -> 0L, 7L -> 0L))
  }

  test("twoHopReach: deliberate hub — salted hot path (threshold " +
       "below hub degree) is row-identical to the plain cold path") {
    // star: hub 0 ↔ leaves 1..100, plus a chord 1-2 (so leaves 1, 2
    // see each other at distance 1 — two_hop = 98, not 99)
    val und = sym((1L to 100L).map(l => (0L, l)) :+ (1L, 2L))
    val plain = Graph.twoHopReach(und, hubThreshold = 1 << 20)
      .as[(Long, Long)].collect().toMap
    val salted = Graph.twoHopReach(und, hubThreshold = 16, buckets = 8)
      .as[(Long, Long)].collect().toMap
    assert(plain == salted)
    assert(plain(0L) == 0L) // hub's 2-hop closes back on itself only
    assert(plain(1L) == 98L && plain(2L) == 98L)
    assert(plain(3L) == 99L) // all other 99 leaves via the hub
  }

  test("adamicAdar: path endpoints score 1/ln(2) through the shared " +
       "mid, adjacent pairs are excluded, capped hubs contribute " +
       "no wedges") {
    // path 1-2-3 (mid 2 has deg 2) + hub 0 ↔ 10..20 (deg 11 > cap 8)
    val und = sym(Seq((1L, 2L), (2L, 3L)) ++
      (10L to 20L).map(l => (0L, l)))
    val r = Graph.adamicAdar(und, degCap = 8)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (u, v, n, aa) => ((u, v), (n, aa)) }.toMap
    val w2 = math.round(1000000.0 / math.log(2.0)) // 1442695
    assert(r == Map((1L, 3L) -> (1L, w2)),
      s"expected only the (1,3) wedge through mid 2, got $r")
  }

  test("adamicAdar: triangle pairs are adjacent so no candidates; " +
       "square diagonals score through both shared mids") {
    val und = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), // triangle
      (11L, 12L), (12L, 13L), (13L, 14L), (14L, 11L))) // square
    val r = Graph.adamicAdar(und, degCap = 8)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (u, v, n, aa) => ((u, v), (n, aa)) }.toMap
    val w2 = math.round(1000000.0 / math.log(2.0))
    assert(r == Map((11L, 13L) -> (2L, 2 * w2),
      (12L, 14L) -> (2L, 2 * w2)))
  }

  test("labelPropagation: two cliques joined by one bridge edge " +
       "settle to two communities labeled by their min node") {
    val clique = (of: Long) => for {
      i <- 0L to 3L; j <- 0L to 3L if i < j
    } yield (of + i, of + j)
    val und = sym(clique(0L) ++ clique(10L) :+ (3L, 10L))
    val r = Graph.labelPropagation(und, rounds = 4)
      .as[(Long, Long)].collect().toMap
    val communities = r.groupBy(_._2).view.mapValues(_.keySet).toMap
    assert(r.keySet == ((0L to 3L) ++ (10L to 13L)).toSet)
    // each clique converges to ONE label (the bridge may pull node 3
    // or 10 across, but the cores must be uniform)
    assert(communities.size <= 3,
      s"cliques failed to coalesce: $communities")
    assert((0L to 2L).map(r).toSet.size == 1, "clique A core split")
    assert((11L to 13L).map(r).toSet.size == 1, "clique B core split")
  }

  test("labelPropagation: fixed rounds are deterministic — two runs " +
       "agree exactly; labels over 1e7 are rejected") {
    val und = sym(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    val a = Graph.labelPropagation(und, 3).as[(Long, Long)].collect().toMap
    val b = Graph.labelPropagation(und, 3).as[(Long, Long)].collect().toMap
    assert(a == b)
    val big = sym(Seq((10000001L, 2L)))
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(big, 2).collect()
    }
  }

  test("rankedAdjacency: deliberate 100k-degree hub — capped to " +
       "maxDeg kept rows, idx == the window formulation's rank on " +
       "the kept prefix, no row past the cap") {
    // hub node 0 with neighbors 1..100_000 (descending insert order
    // so the bounded heap actually evicts), plus two cold nodes
    val hub = spark.range(1, 100001)
      .select(org.apache.spark.sql.functions.lit(0L).as("src"),
        $"id".as("dst"))
    val cold = Seq((7L, 3L), (7L, 1L), (8L, 5L)).toDF("src", "dst")
    val adj = Graph.rankedAdjacency(hub.unionByName(cold), maxDeg = 512)
      .as[(Long, Long, Long)].collect()
    val byNode = adj.groupBy(_._1)
    // hub: exactly 512 kept rows — the 512 SMALLEST dst, idx dense
    val hubRows = byNode(0L).sortBy(_._3)
    assert(hubRows.length == 512)
    assert(hubRows.map(_._2).toSeq == (1L to 512L))
    assert(hubRows.map(_._3).toSeq == (0L until 512L))
    // cold nodes: untouched, ranked ascending by dst
    assert(byNode(7L).sortBy(_._3).map(_._2).toSeq == Seq(1L, 3L))
    assert(byNode(8L).map(_._2).toSeq == Seq(5L))
    // no idx at or past the cap anywhere
    assert(adj.forall(_._3 < 512))
  }

  test("wedgeWidth: session width on small graphs; ceil(mass/4M), " +
       "capped, when the measured wedge mass exceeds the session " +
       "default's capacity") {
    import org.apache.spark.sql.functions.{col, lit}
    val session = spark.sessionState.conf.numShufflePartitions
    // K4 oriented from any corner: tiny mass -> session width
    val small = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L))
      .toDF("src", "dst").withColumn("kdst", col("dst"))
    assert(Graph.wedgeWidth(small) == session)
    // one star of out-degree 20000: mass = C(20000,2) ~ 2.0e8 ->
    // ceil(2.0e8 / 4e6) = 50 partitions (> the 32 session default)
    val star = spark.range(20000)
      .select(lit(0L).as("src"), col("id").as("dst"),
        col("id").as("kdst"))
    val w = Graph.wedgeWidth(star)
    val mass = 20000L * 19999L / 2
    val expect = math.max(session.toLong,
      (mass + 4000000L - 1) / 4000000L).toInt
    assert(w == expect, s"width $w != $expect")
  }

  test("wedgeWidth probe-skip gate: a pinned edge count whose mass " +
       "upper bound fits the session capacity skips the probe job " +
       "entirely; a large count still probes") {
    import org.apache.spark.sql.functions.{col, expr, lit}
    val session = spark.sessionState.conf.numShufflePartitions
    // mass bound m·√(2m)/2 for m=49_359 (the q191 fixture's sf0.1
    // edge count) ≈ 7.8e6 ≤ session×4M — gate must fire. The frame
    // poisons evaluation with raise_error: if the probe ran, this
    // test would throw instead of returning the session width.
    val poisoned = spark.range(1).select(
      expr("CAST(raise_error('wedge probe must be skipped') AS LONG)")
        .as("src"),
      lit(1L).as("dst"), lit(1L).as("kdst"))
    assert(Graph.wedgeWidth(poisoned, Some(49359L)) == session)
    // gate must NOT fire when the bound exceeds capacity: for
    // m=10M the bound ≈ 2.2e10 > session×4M, so the probe runs and
    // the star graph still widens exactly as the ungated call does
    val star = spark.range(20000)
      .select(lit(0L).as("src"), col("id").as("dst"),
        col("id").as("kdst"))
    assert(Graph.wedgeWidth(star, Some(10L * 1000 * 1000)) ==
      Graph.wedgeWidth(star))
    // bound is monotone and zero-safe
    assert(Graph.wedgeMassUpperBound(0L) == 0.0)
    assert(Graph.wedgeMassUpperBound(100L) <
      Graph.wedgeMassUpperBound(101L))
  }
}
