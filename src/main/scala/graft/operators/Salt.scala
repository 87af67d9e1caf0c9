package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase (salted) aggregation for skewed group keys (SURVEY.md §7
  * "Skew": per-bike snapshot counts are skewed — popular bikes have
  * orders of magnitude more rows).
  *
  * A plain groupBy hashes each key to exactly one reducer, so one hot
  * key serializes into one task. Salting splits every group into
  * `buckets` sub-groups on a deterministic salt (hash of the whole
  * row), aggregates partially per (key, salt), then re-aggregates the
  * partials per key — the hot key's work spreads over `buckets`
  * tasks, at the price of a second (tiny: |groups| × buckets rows)
  * shuffle.
  *
  * AQE's skew handling covers joins; for aggregations with extreme
  * single-key skew this explicit form is still the reliable tool.
  * Only algebraic aggregates decompose this way; the API takes the
  * (partial, final) pairs explicitly.
  */
object Salt {

  /** A salted aggregate: count/sum/min/max decompose as
    * (partial op, then sum/sum/min/max of partials). */
  def aggregate(df: DataFrame, keys: Seq[String], buckets: Int,
                sums: Seq[String] = Nil, counts: Boolean = true,
                mins: Seq[String] = Nil, maxs: Seq[String] = Nil)
      : DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(buckets)))
    val partialAggs =
      sums.map(c => sum(col(c)).as(s"__sum_$c")) ++
        (if (counts) Seq(count(lit(1)).as("__cnt")) else Nil) ++
        mins.map(c => min(col(c)).as(s"__min_$c")) ++
        maxs.map(c => max(col(c)).as(s"__max_$c"))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      sums.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")) ++
        (if (counts) Seq(sum(col("__cnt")).as("cnt")) else Nil) ++
        mins.map(c => min(col(s"__min_$c")).as(s"min_$c")) ++
        maxs.map(c => max(col(s"__max_$c")).as(s"max_$c"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted (replicate-fact-spread) inner equi-join for skewed join
    * keys: every fact row gets a deterministic salt in [0, buckets),
    * the dimension side is replicated once per salt value, and the
    * join runs on (keys, salt) — a hot key's probe rows spread over
    * `buckets` tasks instead of serializing into one.
    *
    * Cost model: the dimension is multiplied by `buckets` (apply to
    * dim-sized sides only, or pre-filter to the hot keys and union
    * with a plain join for the cold ones); the fact side's shuffle is
    * unchanged in volume, only better distributed. AQE's skew-join
    * split covers sort-merge cases after the fact; this form fixes
    * the partitioning itself, which also helps the downstream
    * aggregate. Results are exactly the plain join's rows: each fact
    * row matches the single dim replica carrying its salt. */
  def join(fact: DataFrame, dim: DataFrame, keys: Seq[String],
           buckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(buckets)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
