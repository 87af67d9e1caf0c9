package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Custom Catalyst `Generator`s for inverted-index candidate-pair
  * expansion — the hot inner loop of the exact-Jaccard / containment /
  * PPJoin family (`graft.operators.Dedup`): a grouped posting list of
  * k documents emits its C(k,2) ordered pairs.
  *
  * The composed form — `explode(flatten(transform(ids, (a, i) ->
  * transform(slice(ids, i+2, …), b -> struct(…)))))` — is correct but
  * evaluates as interpreted higher-order functions (Spark does not
  * codegen `LambdaFunction`s), allocating a slice array and a struct
  * array per outer element before the explode even starts. These
  * generators keep the exact output contract (pairs in sorted-array
  * order, i < j, so id_a < id_b) while writing each output row
  * directly from one tight nested loop — no intermediate arrays, no
  * lambda dispatch. Generators run inside `GenerateExec` (only
  * built-ins codegen), but the loop body is a monomorphic JVM method;
  * the cost was never the dispatch, it was the per-element array
  * churn of the HOF chain. Parity with the composed form is locked by
  * DedupSpec.
  */

/** (id, sz) posting array → one row per unordered pair:
  * (id_a, id_b, size_a, size_b) with array order preserved (input is
  * sorted ascending, so id_a < id_b). Used by
  * [[graft.operators.Dedup.jaccardPairs]] / `containmentPairs`. */
case class PostingPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 2 &&
          fs.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"PostingPairs expects array<struct<long,long>>, got $other")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("size_a", LongType, nullable = false),
    StructField("size_b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    val arr = raw.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < 2) return Nil
    // one flat copy of the (id, sz) longs, then the pair loop reads
    // primitives only — no per-pair struct access
    val ids = new Array[Long](n)
    val szs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 2)
      ids(i) = s.getLong(0)
      szs(i) = s.getLong(1)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](
      n * (n - 1) / 2)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out += new GenericInternalRow(
          Array[Any](ids(i), ids(j), szs(i), szs(j)))
        j += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): PostingPairs =
    copy(child = c)
}

object PostingPairs {
  def col(c: Column): Column =
    ExpressionUtils.column(PostingPairs(ExpressionUtils.expression(c)))
}

/** PPJoin positional-filtered pair expansion: (id, sz, pos) prefix
  * posting array → (id_a, id_b) for pairs whose positional overlap
  * upper bound `min(sz_a − pos_a, sz_b − pos_b)` reaches the minimum
  * intersection `ceil(minIsect · (sz_a + sz_b))` a Jaccard ≥ t pair
  * requires (minIsect = t/(1+t)). Same contract as the composed
  * `flatten(transform(…, filter(transform(…), p -> p.ub >= ceil(…))))`
  * chain in [[graft.operators.Dedup.ppjoinPairs]]. */
case class PrefixFilteredPairs(child: Expression, minIsect: Double)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 3 &&
          fs(0).dataType == LongType && fs(1).dataType == LongType &&
          fs(2).dataType == IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"PrefixFilteredPairs expects array<struct<long,long,int>>, " +
              s"got $other")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    val arr = raw.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < 2) return Nil
    val ids = new Array[Long](n)
    val rem = new Array[Long](n) // sz − pos: the per-side overlap bound
    val szs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 3)
      ids(i) = s.getLong(0)
      szs(i) = s.getLong(1)
      rem(i) = s.getLong(1) - s.getInt(2).toLong
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val ub = math.min(rem(i), rem(j))
        // same arithmetic as the SQL form: ceil over the IEEE double
        // product (SQL ceil(double) → long), compared to the long ub
        if (ub >= math.ceil(minIsect * (szs(i) + szs(j)).toDouble).toLong)
          out += new GenericInternalRow(Array[Any](ids(i), ids(j)))
        j += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression)
      : PrefixFilteredPairs = copy(child = c)
}

object PrefixFilteredPairs {
  def col(c: Column, minIsect: Double): Column =
    ExpressionUtils.column(
      PrefixFilteredPairs(ExpressionUtils.expression(c), minIsect))
}
