package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the reference's
  * `utils/data_validation.py` capability (file absent from the
  * snapshot; behavior evidenced by `README.md:22` and the ingest
  * lambdas' null-guarded inserts, e.g. `lambda/air_lambda.py:57-60`)
  * as a Spark operator pair.
  *
  * Scale shape: [[profile]] is ONE scan with an aggregate of
  * conditional sums (map-side combined — the violation report costs a
  * single pass no matter how many rules); [[split]] is a per-row
  * filter, no shuffle at all. Rules are plain `Column` predicates, so
  * everything stays in whole-stage codegen and pushes down where the
  * scan supports it.
  */
object Validate {

  /** A named row-level constraint. `predicate` must be true for a
    * clean row; null predicate results count as violations (null-safe
    * like SQL CHECK ... IS NOT FALSE inverted). */
  case class Rule(name: String, predicate: Column)

  /** One row per rule: (rule, n_violations, n_rows). Single scan. */
  def profile(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r =>
      sum(when(coalesce(r.predicate, lit(false)), 0L).otherwise(1L))
        .as(r.name)) :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map(r =>
      s"'${r.name}', ${r.name}").mkString(", ")
    wide.select(expr(
        s"stack(${rules.length}, $stacked) AS (rule, n_violations)"),
        col("__n").as("n_rows"))
      .select(col("rule"), col("n_violations"), col("n_rows"))
  }

  /** (clean, rejects): rejects carry a `violated` column with the
    * names of every failed rule, comma-joined in rule order. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val violated = array_compact(array(rules.map(r =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name))): _*))
    val tagged = df.withColumn("__violated", violated)
    val clean = tagged.filter(size(col("__violated")) === 0)
      .drop("__violated")
    val rejects = tagged.filter(size(col("__violated")) > 0)
      .withColumn("violated", array_join(col("__violated"), ","))
      .drop("__violated")
    (clean, rejects)
  }
}
