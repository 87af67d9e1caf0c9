package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup tiers against constructed near-duplicates. */
class DedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the cat sleeps near the warm fire in the old house"
  private val nearDup = base.replace("old house", "new house")
  private val unrelated = "completely different words about spark " +
    "catalyst optimizer plans and shuffle partitions at scale"

  private val docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, base))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val out = Dedup.exact(docs, Seq(col("text")), col("doc_id"))
      .orderBy("representative").collect()
    assert(out.length == 3)
    val rep = out.map(r => (r.getAs[Long]("representative"),
      r.getAs[Long]("dup_count")))
    assert(rep.contains((1L, 2L))) // docs 1 and 4 collapse
  }

  test("jaccard pairs find near-dups, not unrelated docs") {
    val sh = Dedup.shingleTable(docs.filter(col("doc_id") < 4),
      "doc_id", "text", 3)
    val pairs = Dedup.jaccardPairs(sh, 0.5).collect()
    assert(pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet == Set((1L, 2L)))
    val j = pairs.head.getAs[Double]("jaccard")
    assert(j > 0.5 && j < 1.0)
  }

  test("minhash LSH recalls the same near-dup pair") {
    val out = Dedup.minhashDedup(docs.filter(col("doc_id") < 4),
      "doc_id", "text", threshold = 0.5).collect()
    assert(out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet == Set((1L, 2L)))
  }

  test("simhash: identical docs at distance 0, near-dups close, " +
       "unrelated docs far") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 64).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(pairs((1L, 4L)) == 0)                  // identical
    assert(pairs.get((1L, 2L)).forall(_ <= 10))   // near-dup: close
  }

  test("df-pruning drops shingles present in nearly all docs") {
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 1)
    val pruned = Dedup.dfPrune(sh, totalDocs = 4, maxDocFrac = 0.6)
    val remaining = pruned.select("shingle").distinct()
      .as[String].collect().toSet
    assert(!remaining.contains("the")) // in all docs -> pruned
    assert(remaining.nonEmpty)
  }

  test("dfPruneFrac caps the hot-shingle quadratic edge: a shingle " +
       "shared by the whole corpus emits NO pairs after the prune") {
    // 40 docs that share one boilerplate sentence (the hot shingles)
    // but are otherwise disjoint; plus one true near-dup pair. All
    // C(40,2)=780 boilerplate pairs must vanish; the planted pair
    // must survive on its non-boilerplate shingles.
    val boiler = "subscribe to our newsletter for updates today"
    val hot = (1L to 40L).map(i =>
      (i, s"$boiler unique alpha$i beta$i gamma$i delta$i epsilon$i"))
    val pair = Seq(
      (100L, "galaxies collide slowly over eons forming new bright stars"),
      (101L, "galaxies collide slowly over eons forming many bright stars"))
    val corpus = (hot ++ pair).toDF("doc_id", "text")
    val sh = Dedup.shingleTable(corpus, "doc_id", "text", 3)
    val pruned = Dedup.dfPruneFrac(sh, maxDocFrac = 0.1)
    val pairs = Dedup.jaccardPairs(pruned, 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)), s"got $pairs")
    // unpruned ground truth really is quadratic in the hot docs
    val unpruned = Dedup.jaccardPairs(sh, 0.2)
      .filter(col("id_a") <= 40 && col("id_b") <= 40).count()
    assert(unpruned > 100L)
  }

  test("maxPostingLen tripwire: a hot posting past the cap fails " +
       "loudly in jaccardPairs / incrementalJaccardPairs / " +
       "lshCandidates; under the cap results match the unguarded run") {
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // one shingle hash shared by 50 docs (posting length 50)
    val hotSh = (1L to 50L).map(i => (i, 7L)) ++
      Seq((1L, 11L), (2L, 11L)) // plus one benign 2-doc posting
    val sh = hotSh.toDF("id", "sh")
    val ex1 = intercept[Throwable] {
      Dedup.jaccardPairs(sh, 0.0, maxPostingLen = Some(10L)).count()
    }
    assert(msgs(ex1).exists(_.contains("maxPostingLen")), msgs(ex1))
    val ex2 = intercept[Throwable] {
      Dedup.incrementalJaccardPairs(sh, id => id % 2 === 1, 0.0,
        maxPostingLen = Some(10L)).count()
    }
    assert(msgs(ex2).exists(_.contains("maxPostingLen")), msgs(ex2))
    // under the cap: guard is results-preserving (loud, never lossy)
    val guarded = Dedup.jaccardPairs(sh, 0.0, maxPostingLen = Some(64L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val unguarded = Dedup.jaccardPairs(sh, 0.0, maxPostingLen = None)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(guarded == unguarded && guarded.size == 50 * 49 / 2)
    // LSH: 50 ids in one (band, bucket)
    val buckets = (1L to 50L).map(i => (i, 0, 99L))
      .toDF("id", "band", "bucket")
    val ex3 = intercept[Throwable] {
      Dedup.lshCandidates(buckets, maxBucketLen = Some(10L)).count()
    }
    assert(msgs(ex3).exists(_.contains("maxBucketLen")), msgs(ex3))
    assert(Dedup.lshCandidates(buckets, maxBucketLen = Some(64L))
      .count() == 50L * 49 / 2)
  }

  test("connectedComponents: chain, clique, and pair collapse to " +
       "min-id clusters") {
    // chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L).forall(cc(_) == 20L))
    assert(cc.size == 9)
  }

  test("connectedComponentsStar matches the naive loop on mixed " +
       "topology and converges on a 120-long chain the naive round " +
       "budget cannot reach") {
    val mixed = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
    val naive = Dedup.connectedComponents(mixed)
      .as[(Long, Long)].collect().toMap
    val star = Dedup.connectedComponentsStar(mixed)
      .as[(Long, Long)].collect().toMap
    assert(star == naive)
    // a path graph of diameter 120: naive needs ~120 rounds (> its
    // default 25-round budget); the star loop contracts in O(log n)
    val chain = (1L until 121L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponentsStar(chain)
      .as[(Long, Long)].collect().toMap
    assert(cc.size == 121 && cc.values.forall(_ == 1L))
  }

  test("embedding near-dup finds a duplicated vector") {
    val v1 = Array(1.0f, 2.0f, 3.0f, 4.0f, 1.0f, 2.0f, 3.0f, 4.0f,
      1.0f, 2.0f, 3.0f, 4.0f, 1.0f, 2.0f, 3.0f, 4.0f,
      1.0f, 2.0f, 3.0f, 4.0f, 1.0f, 2.0f, 3.0f, 4.0f,
      1.0f, 2.0f, 3.0f, 4.0f, 1.0f, 2.0f, 3.0f, 4.0f,
      1.0f, 2.0f, 3.0f, 4.0f, 1.0f, 2.0f, 3.0f, 4.0f,
      1.0f, 2.0f, 3.0f, 4.0f, 1.0f, 2.0f, 3.0f, 4.0f,
      1.0f, 2.0f, 3.0f, 4.0f, 1.0f, 2.0f, 3.0f, 4.0f,
      1.0f, 2.0f, 3.0f, 4.0f, 1.0f, 2.0f, 3.0f, 4.0f)
    val v2 = v1.map(_ * 1.001f)               // same direction
    val v3 = v1.map(x => -x)                   // opposite
    val emb = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.99)
      .collect()
    assert(out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet == Set((1L, 2L)))
  }

  test("blockedEditDistance: pairs only within the block, emitted " +
       "once, scored by prefix Levenshtein") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "hello world"),
      (2L, "s1", "hello warld"),  // dist 1 from #1, same block
      (3L, "s2", "hello world"),  // identical text, DIFFERENT block
      (4L, "s1", "zzzzzzzzzzz"))  // same block, far from #1/#2
      .toDF("doc_id", "src", "text")
    val out = graft.operators.Dedup.blockedEditDistance(
        docs, "doc_id", "text", Seq(col("src")),
        prefixLen = 60, maxDist = 3)
      .select(col("id_a"), col("id_b"), col("dist").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 1L)),
      s"only the in-block near pair qualifies, got $out")
  }

  test("blockedEditDistance chunk tier: identity at the gated " +
       "thresholds (gate-scale blocks fit one chunk — no pair the " +
       "oracle keeps is lost), pairs chunk-local past it") {
    import spark.implicits._
    // the exact q108 configuration on the gate table: refined
    // (chunk=32) must equal unrefined — every (source, lb) block at
    // gate scale is smaller than one chunk
    val gate = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
    def pairsOf(chunk: Option[Int]): Set[(Long, Long)] =
      graft.operators.Dedup.blockedEditDistance(
          gate, "doc_id", "text",
          Seq(col("source"), expr("n_chars div 25")),
          prefixLen = 60, maxDist = 40, chunkSize = chunk,
          pairsPerRow = None) // isolate the chunk tier under test
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val refined = pairsOf(Some(32))
    val unrefined = pairsOf(None)
    assert(refined == unrefined,
      s"chunking lost ${(unrefined -- refined).size} gate-threshold pairs")

    // a block BIGGER than the chunk: pair count becomes chunk-local
    // (n/c chunks × C(c,2) — linear in n), not C(n,2)
    val big = (1L to 100L).map(i => (i, "s", f"t$i%03d"))
      .toDF("doc_id", "src", "text")
    val chunked = graft.operators.Dedup.blockedEditDistance(
      big, "doc_id", "text", Seq(col("src")),
      prefixLen = 10, maxDist = 10, chunkSize = Some(10))
    assert(chunked.count() == 10L * 45L, // vs C(100,2) = 4950 unchunked
      "pairs must stay chunk-local")
  }

  test("blockedEditDistance pair-budget guard: raise_error when pairs " +
       "per ROW exceed the declared bound (the scale-invariant form — " +
       "linear growth never trips it); silent under it") {
    import spark.implicits._
    val big = (1L to 100L).map(i => (i, "s", f"t$i%03d"))
      .toDF("doc_id", "src", "text")
    // one 100-row block: C(100,2)/100 = 49.5 pairs/row > 10: fail loudly
    // (chunkSize = None: the unchunked config is what the guard exists
    // to catch — both knobs are now opt-OUT)
    val ex = intercept[Throwable] {
      graft.operators.Dedup.blockedEditDistance(
        big, "doc_id", "text", Seq(col("src")),
        prefixLen = 10, maxDist = 10, chunkSize = None,
        pairsPerRow = Some(10L)).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("candidate-pair budget")),
      s"expected the budget raise_error, got: ${messages(ex)}")
    // within budget (49.5 <= 64 pairs/row): same result as unguarded
    val n = graft.operators.Dedup.blockedEditDistance(
      big, "doc_id", "text", Seq(col("src")),
      prefixLen = 10, maxDist = 10, chunkSize = None,
      pairsPerRow = Some(64L)).count()
    assert(n == 4950L)
    // chunked + guarded (the q108 shape): chunk tier keeps pairs/row
    // at (c-1)/2, so the SAME tight budget that fires unchunked
    // passes chunked — the guard and the fix compose
    val nc = graft.operators.Dedup.blockedEditDistance(
      big, "doc_id", "text", Seq(col("src")),
      prefixLen = 10, maxDist = 10, chunkSize = Some(10),
      pairsPerRow = Some(10L)).count()
    assert(nc == 450L)
  }

  test("blockedEditDistance DEFAULTS are the safe config: a block " +
       "bigger than one chunk gets chunk-local pairs (not C(n,2)) " +
       "with no argument passed") {
    import spark.implicits._
    val big = (1L to 100L).map(i => (i, "s", f"t$i%03d"))
      .toDF("doc_id", "src", "text")
    // default chunkSize=Some(32): chunks of 32,32,32,4 ->
    // 3*C(32,2)+C(4,2) = 1494 pairs (14.94/row, under the default
    // 16/row budget); the unbounded config would be C(100,2) = 4950
    val n = graft.operators.Dedup.blockedEditDistance(
      big, "doc_id", "text", Seq(col("src")),
      prefixLen = 10, maxDist = 10).count()
    assert(n == 1494L,
      s"library default must be the chunked config, got $n pairs")
  }

  test("incrementalJaccardPairs equals the full recompute restricted " +
       "to new-involving pairs, and emits both-new pairs once") {
    import spark.implicits._
    val docs = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .limit(200)
    val sh = graft.operators.Dedup
      .shingleTable(docs, "doc_id", "text", 3).select("id", "sh")
    val isNew = (id: org.apache.spark.sql.Column) => id % 4 === 1
    val incr = graft.operators.Dedup
      .incrementalJaccardPairs(sh, isNew, 0.1)
      .select("id_a", "id_b", "inter", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    val full = graft.operators.Dedup.jaccardPairs(sh, 0.1)
      .filter(col("id_a") % 4 === 1 || col("id_b") % 4 === 1)
      .select("id_a", "id_b", "inter", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(incr == full, s"incremental diverged: ${incr.diff(full)} / ${full.diff(incr)}")
    // single emission: no (a,b)/(b,a) duplicates
    assert(incr.size == incr.map(p => (p._1, p._2)).size)
  }
}
