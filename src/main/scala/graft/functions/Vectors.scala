package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns
  * (SURVEY.md §2.12; `embeddings.embedding` in the driver testdata).
  *
  * Elements are cast to double BEFORE multiplying: a float×float
  * product is exact in double (24-bit × 24-bit mantissas fit in 53),
  * and the left-to-right `aggregate` fold makes the accumulation order
  * explicit — which is what lets results be compared across engines.
  * Composed from built-ins, so everything stays codegen'd;
  * per-row work only, no shuffle.
  */
object Vectors {

  /** Left-to-right dot product with double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity; null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(sqrt(norm2(a) * norm2(b)), lit(0.0))

  /** [[cosine]] as ONE fused whole-stage-codegen expression (custom
    * Catalyst `Expression` with `doGenCode`): one generated loop,
    * three accumulators, zero intermediate arrays — versus three
    * interpreted higher-order folds. Bit-identical to [[cosine]] by
    * construction (same per-accumulator IEEE sequence; CosineExprSpec
    * asserts it), so the two are interchangeable under the oracle
    * gate. Use this in hot paths (the ANN/near-dup tier scores
    * millions of candidate pairs per query). */
  def cosineNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graftx.CosineSimilarity.col(a, b)

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, x) => acc + x))

  /** Sign-LSH bucket: one bit per sampled dimension (>= 0 → 1),
    * concatenated into a string key. With the default 8 sampled dims
    * this is a 256-bucket random-hyperplane sketch using axis-aligned
    * planes — deterministic and SQL-expressible, which keeps the
    * operator oracle-checkable. For production recall, pass more dims
    * or multiple offsets and union the candidate sets.
    */
  def signBucket(v: Column, dims: Seq[Int] = Seq(0, 8, 16, 24, 32, 40, 48, 56)): Column =
    concat(dims.map(d =>
      when(element_at(v, d + 1) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** DuckDB fragment for the same bucket key (1-based indexing). */
  def signBucketSql(v: String, dims: Seq[Int] = Seq(0, 8, 16, 24, 32, 40, 48, 56)): String =
    dims.map(d => s"CASE WHEN $v[${d + 1}] >= 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")")

  /** DuckDB fragment for cosine over DOUBLE-cast lists. */
  def cosineSql(a: String, b: String): String =
    s"list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"nullif(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[]) * " +
      s"list_dot_product($b::DOUBLE[], $b::DOUBLE[])), 0)"
}
