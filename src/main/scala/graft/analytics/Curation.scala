package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.BloomFilterX

import graft.core.Tables
import graft.functions.{PortableHash, Text}
import graft.operators.{Curate, Dedup}
import Exact._

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
        .localCheckpoint(),
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_weighted_sample" -> (q71 _),
    "q72_top_ngrams" -> (q72 _),
    "q73_span_dedup" -> (q73 _),
    "q74_kmeans_assign" -> (q74 _),
    "q76_bloom_join" -> (q76 _))

  val oracle: Map[String, String] = Map(
    "q71_weighted_sample" -> q71Sql,
    "q72_top_ngrams" -> q72Sql,
    "q73_span_dedup" -> q73Sql,
    "q74_kmeans_assign" -> q74Sql,
    "q76_bloom_join" -> q76Sql)
}
