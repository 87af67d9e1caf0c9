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

  private def cos4(a: Column, b: Column): Column =
    round(Vectors.cosine(a, b), 4)

  /** Exact top-k neighbors per query by cosine. Output:
    * (query_id, vec_id, cos, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cos4(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
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
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
