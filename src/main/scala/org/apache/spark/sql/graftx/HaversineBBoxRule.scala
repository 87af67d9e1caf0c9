package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule (the SURVEY.md §4 showcase): rewrites a radius
  * predicate `haversine(lat1, lon1, lat2, lon2) <= r` into
  * `latitude-band AND original`.
  *
  * Any two points within r km satisfy |Δlat| <= r/110.574°, so the
  * band is a NECESSARY condition — adding it as a conjunct never
  * changes results. The win: when the query center is a literal
  * ("bikes within 5 km of Zurich"), the band becomes plain
  * col-vs-literal comparisons, which Spark pushes into the parquet
  * scan (row-group min/max pruning) — the trig evaluates only for
  * rows that survive. With a non-literal center the band is still a
  * cheap short-circuit ahead of four trig calls per row.
  *
  * Registered through [[GraftExtensions]]
  * (`SparkSession.builder.withExtensions`). Idempotence: the rule
  * tags rewritten comparisons by wrapping them once; a band guard
  * matching the same operands is never added twice (checked
  * structurally, so the fixed-point optimizer batch converges).
  */
object HaversineBBoxRule extends Rule[LogicalPlan] {

  // conservative: 1° latitude >= 110.0 km everywhere
  private val KmPerLatDegree = 110.0

  private def bandFor(latC: Expression, latV: Expression,
                      rKm: Double): Expression = {
    val d = Literal(rKm / KmPerLatDegree, DoubleType)
    if (latC.foldable) {
      val c = latC.eval(null)
      if (c == null) Literal.TrueLiteral
      else {
        val cd = c.asInstanceOf[Double]
        And(
          GreaterThanOrEqual(latV, Literal(cd - rKm / KmPerLatDegree)),
          LessThanOrEqual(latV, Literal(cd + rKm / KmPerLatDegree)))
      }
    } else LessThanOrEqual(Abs(Subtract(latV, latC)), d)
  }

  /** Structural idempotence: does `cond` already contain this band? */
  private def hasBand(cond: Expression, band: Expression): Boolean =
    cond.exists(_.semanticEquals(band))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = cond.transformUp {
        case cmp @ LessThanOrEqual(
              Haversine(lat1, _, lat2, _), r @ Literal(rv, DoubleType))
            if rv != null =>
          val band = bandFor(lat1, lat2, rv.asInstanceOf[Double])
          if (band == Literal.TrueLiteral || hasBand(cond, band)) cmp
          else And(band, cmp)
        case cmp @ LessThan(
              Haversine(lat1, _, lat2, _), r @ Literal(rv, DoubleType))
            if rv != null =>
          val band = bandFor(lat1, lat2, rv.asInstanceOf[Double])
          if (band == Literal.TrueLiteral || hasBand(cond, band)) cmp
          else And(band, cmp)
      }
      if (newCond fastEquals cond) f else Filter(newCond, child)
  }
}

/** Session extension registering the graft Catalyst surface
  * (`SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graftx.GraftExtensions`):
  * the bounding-box optimizer rule plus `haversine_km` as a SQL
  * function, so the SQL frontend reaches the codegen'd native
  * expression (and the rule fires on SQL-authored predicates too).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => HaversineBBoxRule)
    e.injectPlannerStrategy(_ => TopKPerKeyPlan.TopKPerKeyStrategy)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("haversine_km"),
      new ExpressionInfo(classOf[Haversine].getName, "haversine_km"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          s"haversine_km expects 4 arguments, got ${children.length}")
        // SQL numeric literals arrive as DECIMAL; the native
        // expression is DOUBLE-only, so coerce here (no-op casts are
        // optimized away)
        val Seq(a, b, c, d) = children.map(Cast(_, DoubleType))
        Haversine(a, b, c, d)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"cosine_sim expects 2 arguments, got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("md5_60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_60"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"md5_60 expects 1 argument, got ${children.length}")
        Md5Prefix60(children.head)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"word_ngrams expects 2 arguments, got ${children.length}")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions
              .Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions
              .Literal(v, t) if t.isInstanceOf[org.apache.spark.sql.types
              .DecimalType] => v.asInstanceOf[org.apache.spark.sql.types
              .Decimal].toInt
          case other => throw new IllegalArgumentException(
            s"word_ngrams(text, n): n must be an integer literal, got $other")
        }
        WordNgrams(children.head, n)
      }))
  }
}
