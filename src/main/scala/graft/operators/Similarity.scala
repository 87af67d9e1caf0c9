package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY.md §2.12).
  *
  * Two tiers:
  *  - brute-force — broadcast the (small) query set against the corpus
  *    and keep top-k per query with a per-partition window. Exact;
  *    linear in |corpus|×|queries|. The right baseline, and at 100 TB
  *    still correct when the query set is small: the corpus is never
  *    shuffled, only scanned.
  *  - sign-LSH    — bucket both sides on hyperplane sign bits and
  *    only score within buckets: recall < 1, cost ~ |corpus|/2^bits
  *    per query. This is the scale path; IVF (k-means cells) has the
  *    same operator shape with learned buckets.
  *
  * Cosines are rounded to 4 decimals before ranking so that ranking
  * and output are reproducible across engines (see Exact's rationale —
  * dot products of floats are deterministic, but sqrt/division land
  * within an ulp across engines' libms).
  */
object Similarity {

  /** Four disjoint 6-bit dimension sets for multi-band LSH over
    * 64-dim embeddings (64 buckets per band). */
  val DefaultBands: Seq[Seq[Int]] = Seq(
    Seq(0, 4, 8, 12, 16, 20), Seq(1, 5, 9, 13, 17, 21),
    Seq(2, 6, 10, 14, 18, 22), Seq(3, 7, 11, 15, 19, 23))

  private def cos4(a: Column, b: Column): Column =
    round(Vectors.cosineNative(a, b), 4)

  /** Default ceiling on the broadcast-side query-set size of the
    * brute-force tier. The brute plan is a BroadcastNestedLoopJoin of
    * corpus × queries: correct and cheap for a dimension-sized query
    * set, a silent cartesian explosion for a corpus-sized one (10M
    * queries × 1B corpus rows = 10¹⁶ cosines). The guard turns that
    * silent cliff into a loud, actionable error at plan-construction
    * time. */
  val MaxBroadcastQueries: Long = 100000L

  /** Contract check for the brute-force tier: one cheap count of the
    * (by-contract small) query side; fails fast with the scale-path
    * alternative named. Callers who KNOW they want a bigger broadcast
    * raise `maxQueries` explicitly — a conscious override, not a
    * default. */
  private def requireSmallQuerySet(queries: DataFrame, maxQueries: Long,
                                   op: String): Unit = {
    val nq = queries.count()
    require(nq <= maxQueries,
      s"$op: query set has $nq rows > maxQueries=$maxQueries; the " +
        "brute-force tier broadcasts the query set and scores " +
        "corpus × queries — at this size use the bucketed scale path " +
        "(Similarity.multiBandTopK / lshTopK) or raise maxQueries " +
        "explicitly if the cartesian cost is intended")
  }

  /** The shared ranking contract of every ANN variant: top-k per
    * query by (cos desc, vec_id asc), rank as long. One definition so
    * the operators can never diverge on tiebreak or rounding.
    *
    * Runs on the custom two-phase TopKPerKey plan, not
    * `row_number().over(window)`: the window form shuffles EVERY
    * scored candidate to its query's reducer and sorts the full group
    * before dropping all but k; the custom plan bounds each map task
    * to k survivors per query before the exchange, so shuffle volume
    * is k·queries·partitions regardless of candidate count
    * (TopKPerKeySpec pins row-for-row equivalence incl. ties). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    org.apache.spark.sql.graftx.TopKPerKeyPlan.topK(scored,
      Seq("query_id"), Seq("cos" -> true, "vec_id" -> false), k)

  /** Exact top-k neighbors per query by cosine. Output:
    * (query_id, vec_id, cos, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     maxQueries: Long = MaxBroadcastQueries): DataFrame = {
    requireSmallQuerySet(queries, maxQueries, "bruteForceTopK")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cos4(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }

  /** Hard-negative mining — the contrastive-training data op: for
    * each query, the top-k most similar corpus vectors with a
    * DIFFERENT label (similar-but-wrong is exactly what a contrastive
    * loss needs to push apart; easy random negatives teach nothing).
    * Same scan shape as [[bruteForceTopK]] — corpus scanned in place,
    * queries broadcast, bounded-heap TopK plan — plus a null-safe
    * label-inequality predicate evaluated inside the join.
    * Output: (query_id, vec_id, neg_label, cos, rank). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int,
                    maxQueries: Long = MaxBroadcastQueries): DataFrame = {
    requireSmallQuerySet(queries, maxQueries, "hardNegatives")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("q_label"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"),
      col(labelCol).as("neg_label"))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("vec_id") &&
          !(col("q_label") <=> col("neg_label")))
      .select(col("query_id"), col("vec_id"), col("neg_label"),
        cos4(col("qv"), col("cv")).as("cos"))
    org.apache.spark.sql.graftx.TopKPerKeyPlan.topK(scored,
      Seq("query_id"), Seq("cos" -> true, "vec_id" -> false), k)
  }

  /** Multi-band sign-LSH ANN: `bands` independent bucketings over
    * disjoint dimension sets; a corpus vector is a candidate when it
    * shares ANY band's bucket with the query. Recall grows with each
    * band (1-(1-p)^bands for per-band collision p) while per-query
    * cost stays ~bands × corpus/2^bits — the standard knob between
    * the single-bucket LSH and brute force. */
  def multiBandTopK(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    bands: Seq[Seq[Int]] = Similarity.DefaultBands)
      : DataFrame = {
    val bandCols = bands.zipWithIndex.map { case (dims, i) =>
      struct(lit(i).as("band"),
        Vectors.signBucket(col(vecCol), dims).as("bucket")).as(s"b$i")
    }
    def withBands(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).as(id), col(vecCol).as(v),
          explode(array(bandCols: _*)).as("bb"))
        .select(col(id), col(v),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val q = withBands(queries, "query_id", "qv")
    val c = withBands(corpus, "vec_id", "cv")
    // dedupe candidate PAIRS (a pair can collide in several bands) on
    // the narrow id columns, then join the vectors back — the distinct
    // shuffle never carries embeddings
    val candidates = c.drop("cv").join(broadcast(q.drop("qv")),
        Seq("band", "bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val scored = candidates
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))), Seq("query_id"))
      .join(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv")),
        Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cos4(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }

  /** Bucketed ANN: score only corpus vectors in the query's sign-LSH
    * bucket. Same output shape as [[bruteForceTopK]]; k is per query
    * and recall depends on bucket granularity. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Vectors.signBucket(col(vecCol)).as("bucket"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"),
      Vectors.signBucket(col(vecCol)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cos4(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }

  /** Product quantization: compress each `dim`-dimensional vector to
    * `m` sub-codes by assigning every length-(dim/m) subvector to its
    * nearest codebook centroid (squared L2) — the memory leg of
    * IVF-PQ ANN: a 64-dim float vector (256 B) becomes m 4-bit codes
    * (2 B at m=4, |codebook|=16), letting a 100 TB embedding corpus'
    * index live in RAM while [[lshTopK]]/IVF handle candidate
    * selection. The codebook (k rows: id, vector) is dimension-sized:
    * collected once into a single broadcast row — the corpus is only
    * scanned, never shuffled, and the per-row work is codegen'd
    * array lambdas.
    *
    * Determinism: distances are identical LEFT FOLDS of per-dimension
    * double squares on both engines (the q123 pinned-order
    * discipline), argmin tie-breaks on the lowest code id
    * (`array_position` returns the FIRST index achieving the min),
    * and the reconstruction error rounds each subspace distance to
    * e6 BEFORE the cross-subspace sum.
    *
    * Output: input columns + `code_0..code_{m-1}` (long),
    * `pq_code` (the codes base-|codebook| packed, long),
    * `err_e6` (long). */
  def pqEncode(df: DataFrame, vecCol: String, dim: Int, m: Int,
               codebook: DataFrame, cbIdCol: String,
               cbVecCol: String): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val cb = codebook
      .select(struct(col(cbIdCol).cast("long").as("cid"),
        col(cbVecCol).as("cv")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("cbs"))
      .select(transform(col("cbs"), r => r.getField("cv")).as("__cb"))
    val k = codebook.count()
    val joined = df.crossJoin(broadcast(cb))
    def distsFor(j: Int): Column = transform(col("__cb"), ce =>
      aggregate(
        zip_with(
          slice(col(vecCol), j * sub + 1, sub),
          slice(ce, j * sub + 1, sub),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, x) => a + x))
    val withCodes = (0 until m).foldLeft(joined) { (acc, j) =>
      acc
        .withColumn(s"__d_$j", distsFor(j))
        .withColumn(s"code_$j",
          (array_position(col(s"__d_$j"), array_min(col(s"__d_$j")))
            - 1).cast("long"))
        .withColumn(s"__e_$j",
          round(array_min(col(s"__d_$j")) * 1e6).cast("long"))
    }
    val packed = (0 until m).map(j =>
      col(s"code_$j") * math.pow(k.toDouble, (m - 1 - j).toDouble).toLong)
      .reduce(_ + _)
    val err = (0 until m).map(j => col(s"__e_$j")).reduce(_ + _)
    withCodes
      .withColumn("pq_code", packed)
      .withColumn("err_e6", err)
      .drop((0 until m).flatMap(j => Seq(s"__d_$j", s"__e_$j")) :+ "__cb": _*)
  }

  /** ADC (asymmetric distance computation) top-k over PQ codes — the
    * query leg of IVF-PQ: the corpus is represented ONLY by its
    * [[pqEncode]] codes; each query precomputes an m×|codebook|
    * lookup table of subspace distances (e6-rounded, the pqEncode
    * discipline), and a vector's approximate distance is m integer
    * table lookups summed — no vector arithmetic per corpus row at
    * query time, which is what makes a RAM-resident 100 TB index
    * answerable. Queries broadcast; the corpus never shuffles; the
    * per-query ranking runs on the bounded-heap TopKPerKey plan
    * (shuffle ≤ k·queries·partitions rows). Ties break on the lower
    * vec_id. Output: (query_id, vec_id, adist_e6, rank). */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, m: Int,
              codebook: DataFrame, cbIdCol: String, cbVecCol: String,
              k: Int,
              maxQueries: Long = MaxBroadcastQueries,
              restrictCols: Seq[String] = Nil): DataFrame = {
    requireSmallQuerySet(queries, maxQueries, "adcTopK")
    val sub = dim / m
    val enc = pqEncode(corpus, vecCol, dim, m, codebook, cbIdCol, cbVecCol)
      .select(col(idCol).as("vec_id") +:
        (restrictCols.map(col) ++
          (0 until m).map(j => col(s"code_$j"))): _*)
    val cb = codebook
      .select(struct(col(cbIdCol).cast("long").as("cid"),
        col(cbVecCol).as("cv")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("cbs"))
      .select(transform(col("cbs"), r => r.getField("cv")).as("__cb"))
    def lutFor(j: Int): Column = transform(col("__cb"), ce =>
      round(aggregate(
        zip_with(
          slice(col(vecCol), j * sub + 1, sub),
          slice(ce, j * sub + 1, sub),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, x) => a + x) * 1e6).cast("long"))
    val luts = queries.crossJoin(broadcast(cb))
      .select(col(idCol).as("query_id") +:
        (restrictCols.map(col) ++
          (0 until m).map(j => lutFor(j).as(s"__lut_$j"))): _*)
    // restrictCols (e.g. an IVF cell id): candidates are only corpus
    // rows sharing the query's value — the IVF-PQ composition, where
    // the inverted file bounds the candidate set and the PQ codes
    // make each candidate a k-lookup integer add
    val scored = (if (restrictCols.isEmpty) enc.crossJoin(broadcast(luts))
      else enc.join(broadcast(luts), restrictCols))
      .withColumn("adist_e6", (0 until m).map(j =>
        element_at(col(s"__lut_$j"), (col(s"code_$j") + 1).cast("int")))
        .reduce(_ + _))
      .select(col("query_id"), col("vec_id"), col("adist_e6"))
    org.apache.spark.sql.graftx.TopKPerKeyPlan.topK(scored,
      Seq("query_id"), Seq("adist_e6" -> false, "vec_id" -> false), k)
  }
}
