package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.BloomFilterX

import graft.core.Tables
import graft.functions.{PortableHash, Text}
import graft.operators.{Curate, Dedup, Layout, Salt}
import Exact._
import graft.core.PlanStats.Pinned

/** Corpus-curation gate queries: deterministic weighted sampling,
  * corpus-wide heavy hitters, content-defined shared-span dedup,
  * nearest-centroid assignment, and explicit bloom-filter join
  * pruning (SURVEY.md §2.12 follow-ons; operators in
  * [[graft.operators.Curate]] / [[org.apache.spark.sql.graftx.BloomFilterX]]).
  */
object Curation {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)
  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")

  private def h60Duck(x: String): String = PortableHash.hash60DuckSql(x)

  // ---------------------------------------------------------------------
  // q71 — deterministic weighted sampling (token-budget-proportional
  // corpus selection): keep doc iff u(doc) · W < k · w. Inclusion is
  // a pure function of the row and one broadcast scalar — the corpus
  // never shuffles, and the same rows are chosen on any engine,
  // layout, or cluster size. Weight = n_chars, k = 100 expected docs.
  // ---------------------------------------------------------------------
  private def q71(s: SparkSession, dir: String): DataFrame =
    Curate.weightedSample(
        docs(s, dir).select(col("doc_id"), col("n_chars")),
        col("doc_id"), col("n_chars"), expectedK = 100.0)
      .orderBy(col("doc_id"))

  private val q71Sql =
    s"""WITH tot AS (
       |  SELECT CAST(sum(n_chars) AS BIGINT) AS w_total FROM documents)
       |SELECT doc_id, n_chars
       |FROM documents, tot
       |WHERE (CAST(${h60Duck("'ws:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)
       |    / CAST(1152921504606846976 AS DOUBLE))
       |    * CAST(w_total AS DOUBLE)
       |  < CAST(100 AS DOUBLE) * CAST(n_chars AS DOUBLE)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q148 — weighted sampling WITHOUT replacement, exactly k
  // (Efraimidis–Spirakis): rank = −ln(u)/w rounded e9 (one IEEE
  // expression per row, rounding absorbs libm ln ulps), k smallest
  // kept. q71's Bernoulli design concentrates AROUND k; this is the
  // exact-budget variant a token-capped corpus selection needs. The
  // global k-smallest plans as TakeOrderedAndProject — the corpus
  // never shuffles.
  // ---------------------------------------------------------------------
  private def q148(s: SparkSession, dir: String): DataFrame =
    Curate.weightedTopKSample(
        docs(s, dir).select(col("doc_id"), col("n_chars")),
        col("doc_id"), col("n_chars"), k = 100)
      .orderBy(col("aes_rank_e9"), col("doc_id"))

  private val q148Sql = {
    val u = s"CAST(${h60Duck("'aes:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)" +
      " / CAST(1152921504606846976 AS DOUBLE)"
    s"""WITH ranked AS (
       |  SELECT doc_id, n_chars,
       |    CAST(round(-ln($u) / CAST(n_chars AS DOUBLE)
       |      * CAST(1000000000 AS DOUBLE)) AS BIGINT) AS aes_rank_e9
       |  FROM documents)
       |SELECT doc_id, n_chars, aes_rank_e9
       |FROM ranked
       |ORDER BY aes_rank_e9, doc_id
       |LIMIT 100""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q72 — corpus-wide heavy hitters: top-25 word 3-grams by document
  // frequency (boilerplate discovery — what df-pruning will cut, what
  // a dedup pass should inspect first). Shape at 100 TB: the explode
  // partial-aggregates map-side, and the global top-k plans as
  // TakeOrderedAndProject — each task keeps 25 rows, the driver
  // merges #partitions·25, nothing ever globally sorts.
  // ---------------------------------------------------------------------
  private def q72(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(Text.shingles(col("text"), 3))).as("shingle"))
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("shingle"))
      .limit(25)

  private val q72Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS w
      |  FROM documents),
      |shing AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(len(w) - 2),
      |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
      |  FROM toks WHERE len(w) >= 3)
      |SELECT shingle, count(*) AS df
      |FROM shing
      |GROUP BY shingle
      |ORDER BY df DESC, shingle
      |LIMIT 25""".stripMargin

  // ---------------------------------------------------------------------
  // q73 — shared-span detection (exact-substring dedup): document
  // pairs sharing an identical 8-token window anchored by content
  // (window starts where hash(token) ≡ 0 mod 4), so equal runs match
  // at ANY offset in either document. Postings are df-pruned before
  // pair emission — the boilerplate-window quadratic edge is capped
  // inside the plan, same discipline as q23.
  // ---------------------------------------------------------------------
  private def q73(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // checkpointed: the prune references the postings twice (hot-list
    // aggregate + anti-join); build+action both land inside the timer
    val wins = Dedup.dfPruneFrac(
      Curate.anchorWindowTable(d, "doc_id", "text", win = 8, modulus = 4)
        .pin(),
      0.1, d)
    Curate.sharedSpanPairs(wins).orderBy(col("id_a"), col("id_b"))
  }

  private val q73Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS w
       |  FROM documents),
       |anch AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_transform(
       |      list_filter(range(1, len(w) - 6),
       |        i -> ${h60Duck("w[i]")} % 4 = 0),
       |      i -> array_to_string(list_slice(w, i, i + 7), ' ')))) AS win
       |  FROM toks WHERE len(w) >= 8),
       |posts AS (SELECT doc_id, ${h60Duck("win")} AS wh FROM anch),
       |freq AS (SELECT wh, count(*) AS df FROM posts GROUP BY wh),
       |tot AS (SELECT count(*) AS nd FROM documents),
       |pruned AS (
       |  SELECT p.doc_id, p.wh
       |  FROM posts p JOIN freq f USING (wh), tot
       |  WHERE f.df <= greatest(2.0, nd * 0.1))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       |FROM pruned a JOIN pruned b ON a.wh = b.wh AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // q74 — nearest-centroid assignment (k-means E-step / semantic
  // clustering): 8 fixed centers (vec_id < 8), every vector assigned
  // to its max-cosine center, cluster cardinalities + checksums out.
  // Centers broadcast; the corpus is scanned in place; the argmax is
  // a map-side-combinable struct max.
  // ---------------------------------------------------------------------
  private def q74(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val centers = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("center_id"), col("embedding").as("cvec"))
    Curate.assignToCenters(e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", centers, "center_id", "cvec")
      .groupBy(col("center_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("vec_id")).as("id_checksum"),
        sum(round(col("cos") * 10000).cast("long")).as("cos_e4_sum"))
      .orderBy(col("center_id"))
  }

  private val q74Sql = {
    val cos = "list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) / " +
      "nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) * " +
      "list_dot_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[])), 0)"
    s"""WITH centers AS (
       |  SELECT vec_id AS center_id, embedding AS cvec
       |  FROM embeddings WHERE vec_id < 8),
       |scored AS (
       |  SELECT e.vec_id, c.center_id, $cos AS cos
       |  FROM embeddings e, centers c),
       |assigned AS (
       |  SELECT vec_id, center_id, cos,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, center_id) AS rn
       |  FROM scored)
       |SELECT center_id, count(*) AS n_members,
       |  CAST(sum(vec_id) AS BIGINT) AS id_checksum,
       |  CAST(sum(CAST(round(cos * 10000) AS BIGINT)) AS BIGINT)
       |    AS cos_e4_sum
       |FROM assigned WHERE rn = 1
       |GROUP BY center_id
       |ORDER BY center_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q199 — round-robin curriculum interleave: a global training order
  // that alternates sources WITHOUT a global sort — position =
  // rank_within_source · n_sources + source_index, so each source is
  // ranked independently (per-source window, quality-descending) and
  // the interleaved position is pure arithmetic. The 100 TB shape:
  // per-source sorts parallelize and the "global" order never
  // materializes on one node; a schedule writer just sorts each
  // output partition by the position column.
  // ---------------------------------------------------------------------
  private def q199(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    // source list is a small enumeration; the bound is enforced,
    // not assumed (boundedRank raises if the grain ever grows)
    val srcIdx = graft.operators.Curate
      .boundedRank(d.select(col("source")).distinct(), 4096L,
        "src_rn", col("source"))
      .withColumn("src_idx", col("src_rn") - 1)
      .drop("src_rn")
    val nSrc = srcIdx.agg(count(lit(1)).as("n_src"))
    val ranked = d
      .withColumn("r", (row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)) - 1)
        .cast("long"))
    ranked.join(broadcast(srcIdx), Seq("source"))
      .crossJoin(broadcast(nSrc))
      .select(col("doc_id"), col("source"),
        (col("r") * col("n_src") + col("src_idx")).as("position"))
      .orderBy(col("position"))
  }

  private val q199Sql =
    """WITH src AS (
      |  SELECT source,
      |    CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT)
      |      AS src_idx
      |  FROM (SELECT DISTINCT source FROM documents)),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM src),
      |ranked AS (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) - 1 AS BIGINT) AS r
      |  FROM documents)
      |SELECT ranked.doc_id, ranked.source,
      |  ranked.r * n.n_src + src.src_idx AS position
      |FROM ranked JOIN src USING (source), n
      |ORDER BY position""".stripMargin

  // ---------------------------------------------------------------------
  // q215 — decile quantile normalization: align a feature (document
  // length) across sources by mapping each within-source decile to
  // the pooled cross-source decile mean — the rank-based batch-effect
  // correction (quantile normalization) at decile granularity. Ranks
  // are per-source ntile windows (partition-parallel, unique
  // tiebreak); the reference row is one integer-div mean per decile.
  // ---------------------------------------------------------------------
  private def q215(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = docs(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        ntile(10).over(Window.partitionBy(col("source"))
          .orderBy(col("n_chars").asc, col("doc_id").asc))
          .cast("long").as("decile"))
      .pin() // the per-source and pooled passes share it
    val ref = ranked.groupBy(col("decile"))
      .agg(expr("sum(n_chars) div count(1)").as("ref_mean"))
    ranked.groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(n_chars) div count(1)").as("src_mean"))
      .join(broadcast(ref), Seq("decile"))
      .select(col("source"), col("decile"), col("n_docs"),
        col("src_mean"), col("ref_mean"),
        (col("ref_mean") - col("src_mean")).as("shift"))
      .orderBy(col("source"), col("decile"))
  }

  private val q215Sql =
    """WITH ranked AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(ntile(10) OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS decile
      |  FROM documents),
      |ref AS (
      |  SELECT decile,
      |    CAST(sum(n_chars) AS BIGINT) // count(*) AS ref_mean
      |  FROM ranked GROUP BY decile)
      |SELECT source, decile, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) // count(*) AS src_mean,
      |  max(ref.ref_mean) AS ref_mean,
      |  max(ref.ref_mean) - CAST(sum(n_chars) AS BIGINT) // count(*)
      |    AS shift
      |FROM ranked JOIN ref USING (decile)
      |GROUP BY source, decile
      |ORDER BY source, decile""".stripMargin

  // ---------------------------------------------------------------------
  // q217 — consistent-hash ring rebalance audit: 10 shards × 64
  // virtual nodes hashed onto the 60-bit ring (portable md5 family);
  // every order key takes the first boundary at-or-above its hash
  // (wrapping to the ring minimum). The 640 boundaries become 641
  // half-open segments (lo, hi] → shard (a lag window over the tiny
  // dimension, plus one wrap segment back to the ring minimum), each
  // exploded into the ~2^50-wide coarse buckets it overlaps (~1.6
  // buckets/segment). Keys then resolve their shard via a broadcast
  // HASH join on bucket(kh) with the (lo, hi] range as the join
  // residual — fully codegen'd, one candidate segment per key, no
  // per-row lambda over the ring (the previous interpreted
  // filter+array_min scan was ~96 M lambda evals and 16% of the whole
  // bench). Per-shard loads then compare against naive mod-10
  // placement: the load profile and the mod-vs-ring disagreement rate
  // are what an operator checks before a shard-count change.
  // ---------------------------------------------------------------------
  private def q217(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.PortableHash
    val bucketBits = 50 // 2^60 ring / 2^50 → 1024 coarse buckets
    val bounds = s.range(10).crossJoin(s.range(64).select(
        col("id").as("v")))
      .select(h.hash60(concat(lit("shard:"), col("id"), lit(":"),
        col("v"))).as("bh"), col("id").as("shard"))
    // 640 rows: the unpartitioned window is dimension-side only
    val segs = bounds
      .withColumn("lo", coalesce(
        lag(col("bh"), 1).over(Window.orderBy(col("bh"))), lit(-1L)))
      .select(col("lo"), col("bh").as("hi"), col("shard"))
    val wrap = bounds.agg(max(col("bh")).as("lo"),
      lit(1L << 60).as("hi"),
      min_by(col("shard"), col("bh")).as("shard"))
    val segB = segs.unionByName(wrap)
      .withColumn("bkt", explode(sequence(
        shiftright(col("lo") + 1, bucketBits),
        shiftright(col("hi"), bucketBits))))
    val keys = t(s, dir, "orders")
      .select(col("o_orderkey"),
        h.hash60(concat(lit("key:"), col("o_orderkey"))).as("kh"))
      .withColumn("bkt", shiftright(col("kh"), bucketBits))
    keys.join(broadcast(segB),
        keys("bkt") === segB("bkt") &&
          col("kh") > col("lo") && col("kh") <= col("hi"))
      .select(col("o_orderkey"), col("shard").as("ring_shard"),
        (col("kh") % 10).as("mod_shard"))
      .groupBy(col("ring_shard"))
      .agg(count(lit(1)).as("n_keys"),
        sum((col("ring_shard") === col("mod_shard")).cast("long"))
          .as("n_mod_agree"))
      .orderBy(col("ring_shard"))
  }

  private val q217Sql = {
    val bh = graft.functions.PortableHash.hash60DuckSql(
      "'shard:' || s || ':' || v")
    val kh = graft.functions.PortableHash.hash60DuckSql(
      "'key:' || o_orderkey")
    s"""WITH vs AS (SELECT unnest(range(0, 10)) AS s),
       |vn AS (SELECT unnest(range(0, 64)) AS v),
       |ring AS (
       |  SELECT list_sort(list([$bh, s])) AS ring
       |  FROM vs, vn),
       |keys AS (
       |  SELECT o_orderkey, $kh AS kh FROM orders),
       |assigned AS (
       |  SELECT o_orderkey, kh,
       |    COALESCE(
       |      list_min(list_filter(ring, p -> p[1] >= kh)),
       |      list_min(ring))[2] AS ring_shard,
       |    kh % 10 AS mod_shard
       |  FROM keys, ring)
       |SELECT ring_shard, count(*) AS n_keys,
       |  CAST(sum(CASE WHEN ring_shard = mod_shard THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_mod_agree
       |FROM assigned
       |GROUP BY ring_shard
       |ORDER BY ring_shard""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q208 — reciprocal-rank-fusion hybrid search (the lexical+dense
  // merge every retrieval stack runs): BM25 top-50 (TakeOrdered, no
  // global window over the corpus) fuses with brute-cosine top-50 for
  // one query vector via RRF = Σ 1/(60+rank), summed in one fixed
  // IEEE expression and emitted e9. Items missing from one ranking
  // contribute only the other's term — the standard RRF convention.
  // ---------------------------------------------------------------------
  private def q208(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = graft.operators.TfIdf.bm25(docs(s, dir), "doc_id", "text",
        bm25Terms, k1 = 1.2, b = 0.75, k = 50)
      .select(col("doc_id"), col("score_e4"))
    // 50-row post-top-k table: the global window is bounded by k,
    // not the corpus — and the bound is enforced via boundedRank
    val lexRanked = graft.operators.Curate
      .boundedRank(lex, 50L, "r_lex", col("score_e4").desc,
        col("doc_id"))
      .select(col("doc_id"), col("r_lex"))
    val e = t(s, dir, "embeddings")
    val dense = graft.operators.Similarity.bruteForceTopK(
        e, e.filter(col("vec_id") === 0), "vec_id", "embedding", 50)
      .select(col("vec_id").as("doc_id"),
        col("rank").cast("long").as("r_dense"))
    lexRanked.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("r_lex"), lit(-1L)).as("r_lex"),
        coalesce(col("r_dense"), lit(-1L)).as("r_dense"),
        round((coalesce(lit(1.0) / (lit(60.0) + col("r_lex").cast("double")),
            lit(0.0))
          + coalesce(lit(1.0) / (lit(60.0) + col("r_dense").cast("double")),
            lit(0.0))) * lit(1000000000.0)).cast("long").as("rrf_e9"))
      .orderBy(col("rrf_e9").desc, col("doc_id")).limit(15)
  }

  // lazy: bm25Terms declares later in the file; strict init order
  // would read it as null
  private lazy val q208Sql = {
    val tfs = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(w, t -> t = '$t')) AS BIGINT) AS tf$i"
    }.mkString(",\n      |    ")
    val dfs = bm25Terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(", ")
    val terms = bm25Terms.indices.map { i =>
      s"""round(ln((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5)
         |      / (CAST(df$i AS DOUBLE) + 0.5) + 1.0), 4)
         |    * (CAST(tf$i AS DOUBLE) * 2.2)
         |    / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25
         |      + 0.75 * CAST(dl * n AS DOUBLE) / CAST(sumdl AS DOUBLE)))"""
        .stripMargin
    }.mkString("\n      |  + ")
    val cos = graft.functions.Vectors.cosineSql("q.qv", "e.embedding")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS w
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
       |    $tfs
       |  FROM toks),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(dl) AS BIGINT) AS sumdl, $dfs
       |  FROM base),
       |lexall AS (
       |  SELECT doc_id,
       |    CAST(round(($terms) * 10000.0) AS BIGINT) AS score_e4
       |  FROM base, stats),
       |lex AS (
       |  SELECT doc_id, r_lex FROM (
       |    SELECT doc_id, CAST(row_number() OVER (
       |      ORDER BY score_e4 DESC, doc_id) AS BIGINT) AS r_lex
       |    FROM lexall)
       |  WHERE r_lex <= 50),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |dscored AS (
       |  SELECT e.vec_id AS doc_id, round($cos, 4) AS cos
       |  FROM q, embeddings e WHERE e.vec_id != 0),
       |dense AS (
       |  SELECT doc_id, r_dense FROM (
       |    SELECT doc_id, CAST(row_number() OVER (
       |      ORDER BY cos DESC, doc_id) AS BIGINT) AS r_dense
       |    FROM dscored)
       |  WHERE r_dense <= 50),
       |fused AS (
       |  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.r_lex, d.r_dense,
       |    CAST(round((COALESCE(CAST(1 AS DOUBLE)
       |        / (CAST(60 AS DOUBLE) + CAST(l.r_lex AS DOUBLE)),
       |        CAST(0 AS DOUBLE))
       |      + COALESCE(CAST(1 AS DOUBLE)
       |        / (CAST(60 AS DOUBLE) + CAST(d.r_dense AS DOUBLE)),
       |        CAST(0 AS DOUBLE))) * CAST(1000000000 AS DOUBLE))
       |      AS BIGINT) AS rrf_e9
       |  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id)
       |SELECT doc_id, COALESCE(r_lex, -1) AS r_lex,
       |  COALESCE(r_dense, -1) AS r_dense, rrf_e9
       |FROM fused
       |ORDER BY rrf_e9 DESC, doc_id
       |LIMIT 15""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q204 — embedding gram matrix (the d×d second-moment table behind
  // PCA whitening, feature-correlation audits, and OOD screens): each
  // row emits its upper-triangle outer product as e4-int cell
  // contributions, one hash aggregate reduces to d(d+1)/2 = 2080
  // cells. Map-side partial aggregation collapses the explode before
  // it ever shuffles — the shuffle carries ~cells × partitions rows
  // regardless of corpus size, which is why this shape (not a
  // driver-side matrix) survives 100 TB.
  // ---------------------------------------------------------------------
  private def q204(s: SparkSession, dir: String): DataFrame = {
    // r13: native cell generator (graftx.GramCells, the PostingPairs
    // discipline) instead of the flatten(transform(transform(...)))
    // HOF — the lambda chain was interpreted (no whole-stage codegen;
    // `interpreted_hof: true` in the r12 bench fingerprint, 2.27 s)
    // and allocated sequence/struct/flatten arrays per row. A chained
    // double-posexplode rewrite was codegen but copied an array slice
    // into every intermediate row and measured SLOWER (r13 A/B:
    // +0.7 s) — the generator emits each (i, j, p) cell from one
    // tight loop over a single rounded copy of the vector. Same
    // cells, same e4 rounding (shortest-decimal HALF_UP), same
    // aggregate: bit-identical output (oracle-checked; parity with
    // the composed form locked by CurationSpec).
    t(s, dir, "embeddings")
      .select(org.apache.spark.sql.graftx.GramCells.col(col("embedding")))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("dot_e8"))
      .orderBy(col("i"), col("j"))
  }

  // dim is 64 at every SF (TESTDATA.md); the engine side stays
  // dimension-agnostic via size(xe), the oracle pins the fixture dim.
  private val q204Sql =
    """WITH cells AS (
      |  SELECT CAST(ii AS BIGINT) AS i, CAST(jj AS BIGINT) AS j,
      |    CAST(round(CAST(embedding[CAST(ii AS INT)] AS DOUBLE) * 10000)
      |      AS BIGINT)
      |    * CAST(round(CAST(embedding[CAST(jj AS INT)] AS DOUBLE) * 10000)
      |      AS BIGINT) AS p
      |  FROM embeddings, range(1, 65) r1(ii), range(1, 65) r2(jj)
      |  WHERE jj >= ii)
      |SELECT i, j, count(*) AS n, CAST(sum(p) AS BIGINT) AS dot_e8
      |FROM cells GROUP BY i, j
      |ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------------
  // q195 — adjusted Rand index between two clusterings of the
  // embedding corpus (q74's nearest-center assignment vs the ground-
  // truth labels): the clustering-agreement audit a curation pipeline
  // runs before trusting k-means buckets for balanced sampling. The
  // contingency table is one (center × label) hash aggregate; every
  // pair count C(n,2) and the ARI numerator/denominator (scaled by
  // 2·C(n,2) to stay rational-free) are exact BIGINTs.
  // ---------------------------------------------------------------------
  private def q195(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val centers = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("center_id"), col("embedding").as("cvec"))
    val assigned = Curate.assignToCenters(
      e.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", centers, "center_id", "cvec")
    val cells = assigned
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy(col("center_id"), col("label"))
      .agg(count(lit(1)).as("nij"))
      .pin() // three scalar reductions share one pass
    val p = cells.agg(
      sum(expr("nij * (nij - 1) div 2")).as("sum_pairs_cells"),
      sum(col("nij")).as("n"))
    val a = cells.groupBy(col("center_id"))
      .agg(sum(col("nij")).as("ai"))
      .agg(sum(expr("ai * (ai - 1) div 2")).as("sum_pairs_pred"))
    val b = cells.groupBy(col("label"))
      .agg(sum(col("nij")).as("bj"))
      .agg(sum(expr("bj * (bj - 1) div 2")).as("sum_pairs_true"))
    p.crossJoin(broadcast(a)).crossJoin(broadcast(b))
      .select(col("n"), col("sum_pairs_cells"), col("sum_pairs_pred"),
        col("sum_pairs_true"),
        expr("2 * (n * (n - 1) div 2) * sum_pairs_cells - " +
          "2 * sum_pairs_pred * sum_pairs_true").as("ari_num"),
        expr("(n * (n - 1) div 2) * (sum_pairs_pred + sum_pairs_true) - " +
          "2 * sum_pairs_pred * sum_pairs_true").as("ari_den"))
  }

  private val q195Sql = {
    val cos = "list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) / " +
      "nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) * " +
      "list_dot_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[])), 0)"
    s"""WITH centers AS (
       |  SELECT vec_id AS center_id, embedding AS cvec
       |  FROM embeddings WHERE vec_id < 8),
       |scored AS (
       |  SELECT e.vec_id, c.center_id, $cos AS cos
       |  FROM embeddings e, centers c),
       |assigned AS (
       |  SELECT vec_id, center_id FROM (
       |    SELECT vec_id, center_id,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY cos DESC, center_id) AS rn
       |    FROM scored) WHERE rn = 1),
       |cells AS (
       |  SELECT a.center_id, e.label, CAST(count(*) AS BIGINT) AS nij
       |  FROM assigned a JOIN embeddings e USING (vec_id)
       |  GROUP BY 1, 2),
       |p AS (
       |  SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT)
       |      AS sum_pairs_cells,
       |    CAST(sum(nij) AS BIGINT) AS n FROM cells),
       |aa AS (
       |  SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS sum_pairs_pred
       |  FROM (SELECT CAST(sum(nij) AS BIGINT) AS ai
       |        FROM cells GROUP BY center_id)),
       |bb AS (
       |  SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS sum_pairs_true
       |  FROM (SELECT CAST(sum(nij) AS BIGINT) AS bj
       |        FROM cells GROUP BY label))
       |SELECT n, sum_pairs_cells, sum_pairs_pred, sum_pairs_true,
       |  2 * (n * (n - 1) // 2) * sum_pairs_cells
       |    - 2 * sum_pairs_pred * sum_pairs_true AS ari_num,
       |  (n * (n - 1) // 2) * (sum_pairs_pred + sum_pairs_true)
       |    - 2 * sum_pairs_pred * sum_pairs_true AS ari_den
       |FROM p, aa, bb""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q76 — explicit bloom-filter join pruning: revenue by order
  // priority for a date-windowed order cohort, with the lineitem scan
  // pre-filtered by a bloom built over the cohort's keys (the
  // runtime-filter shape, pinned in the plan rather than left to the
  // optimizer). The bloom only discards rows the join would discard —
  // false positives die in the exact equi-join — so the result is
  // byte-identical to the plain join while the fact-side shuffle
  // carries ~selectivity·|lineitem| rows instead of all of them.
  // ---------------------------------------------------------------------
  private def q76(s: SparkSession, dir: String): DataFrame = {
    val cohort = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val bloom = cohort.agg(
      BloomFilterX.agg(xxhash64(col("o_orderkey")),
        estimatedItems = 100000L, numBits = 800000L).as("bf"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
      .filter(BloomFilterX.mightContain(bloom, xxhash64(col("l_orderkey"))))
      .join(cohort, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        fixedSum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  private val q76Sql =
    s"""SELECT o_orderpriority,
       |  count(*) AS n_items,
       |  ${fixedSumSql("l_extendedprice")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1996-04-01'
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q77 — Z-order layout keys: interleave (user bucket, hour-of-day)
  // into a Morton key and aggregate per aligned 8×8 tile (z >> 6).
  // The key is the clustering column Layout.zorderWrite sorts files
  // by — min/max row-group stats then prune 2-D (entity, time) box
  // queries, the layout that matters when the table is 100 TB. Pure
  // codegen'd integer arithmetic; zero extra shuffle beyond the tile
  // aggregate.
  // ---------------------------------------------------------------------
  private def q77(s: SparkSession, dir: String): DataFrame =
    Tables.eventsSec(s, dir)
      .withColumn("z", Layout.zorder2(
        pmod(col("user_id"), lit(32L)), hour(col("ts_s")), bits = 5))
      .withColumn("tile", shiftright(col("z"), 6).cast("long"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_events"),
        min(col("z")).as("z_min"), max(col("z")).as("z_max"),
        fixedSum(col("value")).as("value_total"))
      .orderBy(col("tile"))

  private val q77Sql = {
    val z = Layout.zorder2DuckSql("user_id % 32",
      "EXTRACT(hour FROM date_trunc('second', ts))", 5)
    s"""WITH zed AS (SELECT $z AS z, value FROM events)
       |SELECT CAST(z >> 6 AS BIGINT) AS tile,
       |  count(*) AS n_events,
       |  CAST(min(z) AS BIGINT) AS z_min, CAST(max(z) AS BIGINT) AS z_max,
       |  ${fixedSumSql("value")} AS value_total
       |FROM zed
       |GROUP BY tile
       |ORDER BY tile""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q78 — one full k-means step (E + M): per-row nearest-centroid
  // assignment fused with the exact-centroid UDAF recomputation.
  // Assignment happens per row against the broadcast center pack
  // (NO corpus shuffle — cf. q74's plan), so the only exchange in
  // the whole step is k scaled-long buffers per partition: the
  // iteration cost at 100 TB is one scan. Centroids serialize like
  // q51 (the driver's checker cannot sort array cells).
  // ---------------------------------------------------------------------
  private def q78(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val centers = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("center_id"), col("embedding").as("cvec"))
    Curate.assignRows(e.select(col("vec_id"), col("embedding")),
        "embedding", centers, "center_id", "cvec")
      .groupBy(col("center_id"))
      .agg(count(lit(1)).as("n_members"),
        graft.functions.VectorAggregates.centroidUdaf(4)(col("embedding"))
          .as("centroid"))
      .withColumn("centroid_e4",
        array_join(transform(col("centroid"),
          x => round(x * 10000).cast("long").cast("string")), ","))
      .drop("centroid")
      .orderBy(col("center_id"))
  }

  private val q78Sql = {
    val cos = "list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) / " +
      "nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) * " +
      "list_dot_product(c.cvec::DOUBLE[], c.cvec::DOUBLE[])), 0)"
    s"""WITH centers AS (
       |  SELECT vec_id AS center_id, embedding AS cvec
       |  FROM embeddings WHERE vec_id < 8),
       |scored AS (
       |  SELECT e.vec_id, c.center_id, $cos AS cos
       |  FROM embeddings e, centers c),
       |assigned AS (
       |  SELECT vec_id, center_id
       |  FROM (SELECT vec_id, center_id,
       |          row_number() OVER (PARTITION BY vec_id
       |            ORDER BY cos DESC, center_id) AS rn
       |        FROM scored) WHERE rn = 1),
       |ex0 AS (
       |  SELECT a.center_id,
       |    unnest(list_zip(range(len(e.embedding)), e.embedding)) AS zz
       |  FROM embeddings e JOIN assigned a ON e.vec_id = a.vec_id),
       |ex AS (
       |  SELECT center_id, zz[1] AS i,
       |    CAST(sum(CAST(round(CAST(zz[2] AS DOUBLE) * 10000.0)
       |      AS BIGINT)) AS BIGINT) AS s2,
       |    count(*) AS n
       |  FROM ex0 GROUP BY center_id, i)
       |SELECT center_id, any_value(n) AS n_members,
       |  array_to_string(
       |    list_transform(list(CAST(s2 AS DOUBLE) / 10000.0 / n ORDER BY i),
       |      v -> CAST(CAST(round(v * 10000) AS BIGINT) AS VARCHAR)),
       |    ',') AS centroid_e4
       |FROM ex
       |GROUP BY center_id
       |ORDER BY center_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q79 — salted join under key skew: half of all events collapse
  // onto one hot key, then join to a derived dimension. Salt.join
  // spreads the hot key's probe rows over 8 salt buckets (the dim
  // side replicates 8×), so no single task serializes the hot key —
  // the explicit fix when AQE's post-hoc skew split isn't enough.
  // Bit-identical to the plain join by construction.
  // ---------------------------------------------------------------------
  private def q79(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.eventsSec(s, dir)
      .select(
        when(col("user_id") % 10 < 5, 0L).otherwise(col("user_id")).as("k"),
        col("value"))
    // derived, tiny, referenced as the join's build side: checkpoint
    // so the events scan isn't repeated inside the replicated dim
    val dim = fact.select(col("k")).distinct()
      .withColumn("grp", concat(lit("g"), (col("k") % 7).cast("string")))
      .pin()
    Salt.join(fact, dim, Seq("k"), buckets = 8)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), fixedSum(col("value")).as("value_total"))
      .orderBy(col("grp"))
  }

  private val q79Sql =
    s"""WITH fact AS (
       |  SELECT CASE WHEN user_id % 10 < 5 THEN 0
       |              ELSE user_id END AS k,
       |    value
       |  FROM events),
       |dim AS (
       |  SELECT k, 'g' || CAST(k % 7 AS VARCHAR) AS grp
       |  FROM (SELECT DISTINCT k FROM fact))
       |SELECT grp, count(*) AS n,
       |  ${fixedSumSql("value")} AS value_total
       |FROM fact JOIN dim USING (k)
       |GROUP BY grp
       |ORDER BY grp""".stripMargin

  // ---------------------------------------------------------------------
  // q80 — sliding event-time windows (1 h length, 15 min slide): the
  // overlapping-window aggregation q34's tumbling form cannot
  // express — each event contributes to 4 windows. Spark's window()
  // expands in place (a Generate, no join), then the aggregate
  // partial-combines map-side; the oracle derives the same 4
  // epoch-aligned window starts arithmetically.
  // ---------------------------------------------------------------------
  private def q80(s: SparkSession, dir: String): DataFrame =
    Tables.eventsSec(s, dir)
      .groupBy(
        window(col("ts_s"), "1 hour", "15 minutes").getField("start")
          .as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        fixedSum(col("value")).as("value_total"))
      .orderBy(col("window_start"), col("event_type"))

  private val q80Sql =
    s"""WITH e AS (
       |  SELECT date_trunc('second', ts) AS ts_s, event_type, value
       |  FROM events),
       |w AS (
       |  SELECT make_timestamp(
       |      ((CAST(epoch(ts_s) AS BIGINT) // 900) - k) * 900 * 1000000)
       |      AS window_start,
       |    event_type, value
       |  FROM e, (SELECT unnest([0, 1, 2, 3]) AS k))
       |SELECT window_start, event_type, count(*) AS n_events,
       |  ${fixedSumSql("value")} AS value_total
       |FROM w
       |GROUP BY window_start, event_type
       |ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q81 — gap-filled resampling (the time-series completeness op):
  // per-user hourly event counts with every missing hour inside the
  // user's own [first, last] span filled with zeros. Each aggregated
  // hour row generates ITS OWN gap (sequence up to the next hour with
  // data, via lead) — never a calendar cross join, never a grid
  // self-join, and the raw events are scanned exactly once; the only
  // exchanges after the aggregate move the hours-sized frame, not
  // the corpus.
  // ---------------------------------------------------------------------
  // ---------------------------------------------------------------------
  // q145 — LINEAR interpolation onto the hourly grid (q81 fills gaps
  // with zeros/carry semantics; this draws the straight line between
  // surrounding observations — the sensor-regularization op). Same
  // single-scan shape: one lead window, each observation explodes
  // only its own span; the fill value is one fixed IEEE expression
  // over the two surrounding observations (no sums), so Spark and
  // DuckDB agree bitwise with no rounding step. Observations
  // pre-aggregate per hour via arg_max(value, event_id) — a
  // deterministic selection, not an order-dependent average.
  // ---------------------------------------------------------------------
  private def q145(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.eventsSec(s, dir)
      .filter(col("user_id") < 50 &&
        col("ts_s") >= lit("2024-01-01").cast("timestamp") &&
        col("ts_s") < lit("2024-02-01").cast("timestamp"))
      .groupBy(col("user_id"), date_trunc("hour", col("ts_s")).as("h"))
      .agg(max_by(col("value"), col("event_id")).as("v"))
    graft.operators.TimeSeries
      .interpolateHourlyLinear(obs, Seq("user_id"), "h", "v")
      .orderBy(col("user_id"), col("grid_hour"))
  }

  private val q145Sql =
    s"""WITH obs AS (
       |  SELECT user_id,
       |    date_trunc('hour', date_trunc('second', ts)) AS h,
       |    arg_max(value, event_id) AS v
       |  FROM events
       |  WHERE user_id < 50
       |    AND date_trunc('second', ts) >= TIMESTAMP '2024-01-01'
       |    AND date_trunc('second', ts) < TIMESTAMP '2024-02-01'
       |  GROUP BY 1, 2),
       |led AS (
       |  SELECT user_id, h, v,
       |    lead(h) OVER (PARTITION BY user_id ORDER BY h) AS hn,
       |    lead(v) OVER (PARTITION BY user_id ORDER BY h) AS vn
       |  FROM obs),
       |grid AS (
       |  SELECT user_id, h, v, hn, vn,
       |    unnest(generate_series(h,
       |      coalesce(hn - INTERVAL 1 HOUR, h), INTERVAL 1 HOUR))
       |      AS grid_hour
       |  FROM led)
       |SELECT user_id, grid_hour,
       |  CASE WHEN grid_hour = h THEN v
       |       ELSE v + (vn - v) *
       |         (CAST(epoch(grid_hour) - epoch(h) AS DOUBLE)
       |          / CAST(epoch(hn) - epoch(h) AS DOUBLE)) END
       |    AS value_interp,
       |  CAST(CASE WHEN grid_hour = h THEN 1 ELSE 0 END AS BIGINT)
       |    AS is_observed
       |FROM grid
       |ORDER BY user_id, grid_hour""".stripMargin

  private def q81(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("user_id"), date_trunc("hour", col("ts_s")).as("h"),
        col("value"))
    val agg = e.groupBy(col("user_id"), col("h"))
      .agg(count(lit(1)).as("n_events"),
        fixedSum(col("value")).as("value_total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("h"))
    agg.withColumn("next_h", lead(col("h"), 1).over(w))
      .select(col("user_id"), col("h"), col("n_events"), col("value_total"),
        explode(sequence(col("h"),
          coalesce(col("next_h") - expr("INTERVAL 1 HOUR"), col("h")),
          expr("INTERVAL 1 HOUR"))).as("hour"))
      .select(col("user_id"), col("hour"),
        when(col("hour") === col("h"), col("n_events")).otherwise(0L)
          .as("n_events"),
        when(col("hour") === col("h"), col("value_total")).otherwise(0.0)
          .as("value_total"))
      .orderBy(col("user_id"), col("hour"))
  }

  private val q81Sql =
    s"""WITH e AS (
       |  SELECT user_id,
       |    date_trunc('hour', date_trunc('second', ts)) AS h, value
       |  FROM events),
       |agg AS (
       |  SELECT user_id, h, count(*) AS n_events,
       |    ${fixedSumSql("value")} AS value_total
       |  FROM e GROUP BY user_id, h),
       |grid AS (
       |  SELECT user_id,
       |    unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR))
       |      AS hour
       |  FROM agg GROUP BY user_id)
       |SELECT g.user_id, g.hour,
       |  coalesce(a.n_events, 0) AS n_events,
       |  coalesce(a.value_total, CAST(0 AS DOUBLE)) AS value_total
       |FROM grid g
       |LEFT JOIN agg a ON a.user_id = g.user_id AND a.h = g.hour
       |ORDER BY g.user_id, g.hour""".stripMargin

  // ---------------------------------------------------------------------
  // q82 — the full ranking-window family in one gate (rank,
  // dense_rank, percent_rank, cume_dist, ntile, lag, lead,
  // first_value): every function shares ONE window spec, so the plan
  // carries a single sort+window pass — adding the ninth function to
  // a dashboard costs nothing. percent_rank/cume_dist are ratios of
  // exact integers (engine-stable); the (value, event_id) ordering is
  // unique, which makes RANGE and ROWS frames agree across engines.
  // ---------------------------------------------------------------------
  private def q82(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value"), col("event_id"))
    Tables.eventsSec(s, dir)
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"), col("value"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).cast("long").as("quartile"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first_value(col("value")).over(w).as("min_value"))
      .orderBy(col("user_id"), col("rnk"))
  }

  private val q82Sql =
    """SELECT user_id, event_id, value,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  percent_rank() OVER w AS prnk,
      |  cume_dist() OVER w AS cdist,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 1) OVER w AS next_value,
      |  first_value(value) OVER w AS min_value
      |FROM events
      |WHERE user_id < 50
      |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
      |ORDER BY user_id, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // q83 — overlapping token-window chunking (documents → fixed-size
  // training windows, 20-token windows every 15 tokens). Pure per-row
  // Generate: tokenize once, explode the window starts, slice — the
  // corpus pass with NO shuffle at all (see Curate.chunkWindows).
  // ---------------------------------------------------------------------
  private def q83(s: SparkSession, dir: String): DataFrame =
    Curate.chunkWindows(docs(s, dir), "doc_id", "text",
        win = 20, stride = 15)
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val q83Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS w
      |  FROM documents),
      |starts AS (
      |  SELECT doc_id, w,
      |    unnest(range(0, len(w), 15)) AS chunk_start
      |  FROM toks)
      |SELECT doc_id,
      |  CAST(chunk_start // 15 AS BIGINT) AS chunk_idx,
      |  CAST(chunk_start AS BIGINT) AS chunk_start,
      |  CAST(len(list_slice(w, chunk_start + 1, chunk_start + 20))
      |    AS BIGINT) AS n_chunk_tokens,
      |  array_to_string(list_slice(w, chunk_start + 1, chunk_start + 20),
      |    ' ') AS chunk_text
      |FROM starts
      |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------------
  // q84 — BM25 retrieval scoring (Okapi k1=1.2 b=0.75) for a 3-term
  // query, top-25 documents. One stats row (N, Σdl, per-term df)
  // broadcast into per-row scoring; ln rounded to 4 decimals (the only
  // transcendental), score emitted as e4 fixed-point — cross-engine
  // bit parity by construction. Top-k = TakeOrderedAndProject.
  // ---------------------------------------------------------------------
  private val bm25Terms = Seq("spark", "merge", "window")

  private def q84(s: SparkSession, dir: String): DataFrame =
    graft.operators.TfIdf.bm25(docs(s, dir), "doc_id", "text",
      bm25Terms, k1 = 1.2, b = 0.75, k = 25)

  private val q84Sql = {
    val tfs = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(w, t -> t = '$t')) AS BIGINT) AS tf$i"
    }.mkString(",\n      |    ")
    val dfs = bm25Terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(", ")
    val terms = bm25Terms.indices.map { i =>
      s"""round(ln((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5)
         |      / (CAST(df$i AS DOUBLE) + 0.5) + 1.0), 4)
         |    * (CAST(tf$i AS DOUBLE) * 2.2)
         |    / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25
         |      + 0.75 * CAST(dl * n AS DOUBLE) / CAST(sumdl AS DOUBLE)))"""
        .stripMargin
    }.mkString("\n      |  + ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS w
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
       |    $tfs
       |  FROM toks),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(dl) AS BIGINT) AS sumdl, $dfs
       |  FROM base)
       |SELECT doc_id, dl,
       |  CAST(round(($terms) * 10000.0) AS BIGINT) AS score_e4
       |FROM base, stats
       |ORDER BY score_e4 DESC, doc_id
       |LIMIT 25""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q86 — temperature-balanced multilingual sampling (p_l^α corpus
  // mixing, α=0.5, expected 150 docs): per-language budgets from one
  // language-sized aggregate, inclusion a pure function of the row +
  // two broadcast scalars — deterministic on any engine or layout,
  // corpus never shuffles (see Curate.temperatureSample).
  // ---------------------------------------------------------------------
  private def q86(s: SparkSession, dir: String): DataFrame =
    Curate.temperatureSample(
        docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
        col("doc_id"), col("lang"), col("n_chars"),
        alpha = 0.5, totalK = 150.0)
      .orderBy(col("doc_id"))

  private val q86Sql =
    s"""WITH g AS (
       |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS c,
       |    CAST(round(pow(CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE),
       |      0.5) * 10000.0) AS BIGINT) AS p_e4
       |  FROM documents GROUP BY lang),
       |s AS (SELECT CAST(sum(p_e4) AS BIGINT) AS s_tot FROM g)
       |SELECT d.doc_id, d.lang, d.n_chars
       |FROM documents d JOIN g ON d.lang = g.lang, s
       |WHERE ((CAST(${h60Duck("'ts:' || CAST(d.doc_id AS VARCHAR)")}
       |      AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE))
       |    * CAST(c AS DOUBLE)) * CAST(s_tot AS DOUBLE)
       |  < (CAST(150.0 AS DOUBLE) * CAST(p_e4 AS DOUBLE))
       |    * CAST(d.n_chars AS DOUBLE)
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q88 — sequence packing: 20-token chunks (q83's partition mode)
  // packed into 240-token training bins by running prefix sum, 8 hash
  // buckets packing independently (the parallelism knob — packing is
  // sequential WITHIN a bucket, and only there; see
  // Curate.packSequences). Bin composition is a pure function of the
  // bucketed order — bit-identical on any engine.
  // ---------------------------------------------------------------------
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val chunks = Curate.chunkWindows(docs(s, dir), "doc_id", "text",
        win = 20, stride = 20)
      .withColumn("bucket",
        PortableHash.hash60(concat(lit("pk:"), col("doc_id").cast("string")))
          % 8)
    Curate.packSequences(chunks, col("bucket"),
        Seq(col("doc_id"), col("chunk_idx")), col("n_chunk_tokens"),
        budget = 240L)
      .groupBy(col("bucket"), col("bin_idx"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("bucket"), col("bin_idx"))
  }

  private val q88Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS w
       |  FROM documents),
       |chunks AS (
       |  SELECT doc_id,
       |    CAST(chunk_start // 20 AS BIGINT) AS chunk_idx,
       |    CAST(len(list_slice(w, chunk_start + 1, chunk_start + 20))
       |      AS BIGINT) AS nt,
       |    CAST(${h60Duck("'pk:' || CAST(doc_id AS VARCHAR)")} % 8
       |      AS BIGINT) AS bucket
       |  FROM (SELECT doc_id, w, unnest(range(0, len(w), 20))
       |          AS chunk_start FROM toks)),
       |packed AS (
       |  SELECT bucket, doc_id, chunk_idx, nt,
       |    COALESCE(sum(nt) OVER (PARTITION BY bucket
       |      ORDER BY doc_id, chunk_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS tokens_before
       |  FROM chunks)
       |SELECT bucket, CAST(tokens_before // 240 AS BIGINT) AS bin_idx,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(nt) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM packed
       |GROUP BY bucket, tokens_before // 240
       |ORDER BY bucket, bin_idx""".stripMargin

  // ---------------------------------------------------------------------
  // q97 — per-source document cap (the per-domain quota of web-corpus
  // curation): at most 20 docs per source, longest-first with doc_id
  // as the unique tiebreaker, through the two-phase TopKPerKey custom
  // plan — map-side bounded heaps mean the shuffle carries at most
  // k·sources·partitions rows however large the corpus is. Oracle:
  // the row_number window formulation, which must agree rank-for-rank
  // under the same total order.
  // ---------------------------------------------------------------------
  private def q97(s: SparkSession, dir: String): DataFrame =
    Curate.capPerGroup(
        docs(s, dir).select(col("doc_id"), col("source"), col("n_chars")),
        Seq("source"), Seq(("n_chars", true), ("doc_id", false)), k = 20)
      .orderBy(col("source"), col("rank"))

  private val q97Sql =
    """SELECT doc_id, source, n_chars, rank FROM (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rank
      |  FROM documents)
      |WHERE rank <= 20
      |ORDER BY source, rank""".stripMargin

  // ---------------------------------------------------------------------
  // q107 — per-class heavy hitters: top-3 word 3-grams per language
  // by document frequency. q72's global TakeOrdered cannot express a
  // per-group limit; the TopKPerKey plan runs on the AGGREGATED
  // (lang, shingle, df) rows — partial heaps on the agg output, one
  // bounded exchange on lang — so neither the corpus nor the full
  // n-gram vocabulary ever sorts globally.
  // ---------------------------------------------------------------------
  private def q107(s: SparkSession, dir: String): DataFrame =
    Curate.capPerGroup(
        docs(s, dir)
          .select(col("lang"), col("doc_id"),
            explode(array_distinct(Text.shingles(col("text"), 3)))
              .as("shingle"))
          .groupBy(col("lang"), col("shingle"))
          .agg(count(lit(1)).as("df")),
        Seq("lang"), Seq(("df", true), ("shingle", false)), k = 3)
      .orderBy(col("lang"), col("rank"))

  private val q107Sql =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS w
      |  FROM documents),
      |shing AS (
      |  SELECT DISTINCT doc_id, lang,
      |    unnest(list_transform(range(len(w) - 2),
      |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
      |  FROM toks WHERE len(w) >= 3),
      |df AS (
      |  SELECT lang, shingle, count(*) AS df
      |  FROM shing GROUP BY lang, shingle)
      |SELECT lang, shingle, df, rank FROM (
      |  SELECT lang, shingle, df,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY df DESC, shingle) AS rank
      |  FROM df)
      |WHERE rank <= 3
      |ORDER BY lang, rank""".stripMargin

  // ---------------------------------------------------------------------
  // q104 — class-balanced uniform downsample: exactly 10 docs per
  // language, uniformly without replacement (rank over a
  // deterministic per-row hash — a random permutation both engines
  // reproduce), through the same bounded-heap TopKPerKey plan as
  // q97. The class-rebalancing primitive: cap over-represented
  // languages at a fixed per-class budget.
  // ---------------------------------------------------------------------
  private def q104(s: SparkSession, dir: String): DataFrame =
    Curate.balancedSample(
        docs(s, dir).select(col("doc_id"), col("lang")),
        Seq("lang"), "doc_id", k = 10)
      .drop("__u")
      .orderBy(col("lang"), col("rank"))

  private val q104Sql =
    s"""WITH h AS (
       |  SELECT doc_id, lang,
       |    ${h60Duck("'bs:' || CAST(doc_id AS VARCHAR)")} AS u
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang ORDER BY u, doc_id)
       |      AS rank
       |  FROM h)
       |SELECT doc_id, lang, rank FROM r
       |WHERE rank <= 10
       |ORDER BY lang, rank""".stripMargin

  // ---------------------------------------------------------------------
  // q115 — categorical dictionary encoding (string interning): lang
  // and source interned to dense 1-based ids ordered by value; the
  // ONLY windows run over the distinct vocabularies (5 and 20 rows),
  // the corpus sees two broadcast joins and zero shuffles. Oracle:
  // dense_rank over the full table, which assigns the identical id
  // to every equal value.
  // ---------------------------------------------------------------------
  private def q115(s: SparkSession, dir: String): DataFrame =
    Curate.dictEncode(
        Curate.dictEncode(
          docs(s, dir).select(col("doc_id"), col("lang"), col("source")),
          "lang", "lang_id"),
        "source", "source_id")
      .groupBy(col("lang"), col("lang_id"), col("source"),
        col("source_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang_id"), col("source_id"))

  private val q115Sql =
    """SELECT lang, dense_rank() OVER (ORDER BY lang) AS lang_id,
      |  source, dense_rank() OVER (ORDER BY source) AS source_id,
      |  count(*) AS n
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang_id, source_id""".stripMargin

  // ---------------------------------------------------------------------
  // q100 — regex scrub/redaction (the PII-masking shape): mask every
  // vowel run, audit the per-row match count, and prove the masked
  // strings identical on both engines via md5 — rewrite and count are
  // codegen'd per-row expressions over one scan, zero shuffle.
  // ---------------------------------------------------------------------
  private def q100(s: SparkSession, dir: String): DataFrame =
    Curate.redact(docs(s, dir).select(col("doc_id"), col("text")),
        "text", "[aeiou]+", "*")
      .select(col("doc_id"), col("n_matches"),
        length(col("text")).cast("long").as("masked_len"),
        md5(col("text").cast("binary")).as("masked_md5"))
      .orderBy(col("doc_id"))

  private val q100Sql =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
      |    AS n_matches,
      |  CAST(length(regexp_replace(text, '[aeiou]+', '*', 'g'))
      |    AS BIGINT) AS masked_len,
      |  md5(regexp_replace(text, '[aeiou]+', '*', 'g')) AS masked_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q97_source_cap" -> (q97 _),
    "q100_regex_scrub" -> (q100 _),
    "q104_balanced_sample" -> (q104 _),
    "q107_group_ngrams" -> (q107 _),
    "q115_dict_encode" -> (q115 _),
    "q71_weighted_sample" -> (q71 _),
    "q72_top_ngrams" -> (q72 _),
    "q73_span_dedup" -> (q73 _),
    "q74_kmeans_assign" -> (q74 _),
    "q76_bloom_join" -> (q76 _),
    "q77_zorder_tiles" -> (q77 _),
    "q78_kmeans_step" -> (q78 _),
    "q79_salted_join" -> (q79 _),
    "q80_sliding_window" -> (q80 _),
    "q81_resample" -> (q81 _),
    "q145_interpolate" -> (q145 _),
    "q148_aes_sample" -> (q148 _),
    "q82_window_suite" -> (q82 _),
    "q83_chunk_windows" -> (q83 _),
    "q84_bm25" -> (q84 _),
    "q86_temperature_mix" -> (q86 _),
    "q88_pack_sequences" -> (q88 _),
    "q195_ari" -> (q195 _),
    "q199_interleave" -> (q199 _),
    "q204_gram_matrix" -> (q204 _),
    "q208_rrf_fusion" -> (q208 _),
    "q215_quantile_norm" -> (q215 _),
    "q217_hash_ring" -> (q217 _))

  val oracle: Map[String, String] = Map(
    "q97_source_cap" -> q97Sql,
    "q100_regex_scrub" -> q100Sql,
    "q104_balanced_sample" -> q104Sql,
    "q107_group_ngrams" -> q107Sql,
    "q115_dict_encode" -> q115Sql,
    "q71_weighted_sample" -> q71Sql,
    "q72_top_ngrams" -> q72Sql,
    "q73_span_dedup" -> q73Sql,
    "q74_kmeans_assign" -> q74Sql,
    "q76_bloom_join" -> q76Sql,
    "q77_zorder_tiles" -> q77Sql,
    "q78_kmeans_step" -> q78Sql,
    "q79_salted_join" -> q79Sql,
    "q80_sliding_window" -> q80Sql,
    "q81_resample" -> q81Sql,
    "q145_interpolate" -> q145Sql,
    "q148_aes_sample" -> q148Sql,
    "q82_window_suite" -> q82Sql,
    "q83_chunk_windows" -> q83Sql,
    "q84_bm25" -> q84Sql,
    "q86_temperature_mix" -> q86Sql,
    "q88_pack_sequences" -> q88Sql,
    "q195_ari" -> q195Sql,
    "q199_interleave" -> q199Sql,
    "q204_gram_matrix" -> q204Sql,
    "q208_rrf_fusion" -> q208Sql,
    "q215_quantile_norm" -> q215Sql,
    "q217_hash_ring" -> q217Sql)
}
