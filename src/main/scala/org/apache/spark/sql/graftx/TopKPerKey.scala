package org.apache.spark.sql.graftx

import java.util.{PriorityQueue => JPriorityQueue}

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Top-k rows per key — the whole-operator custom-plan showcase
  * (SURVEY.md §7 ladder step (c): logical node + planner strategy +
  * physical plans).
  *
  * The DataFrame formulation (`row_number().over(Window.partitionBy
  * (key).orderBy(ord)) <= k`) must shuffle EVERY scored row to its
  * key's reducer and sort the whole group before discarding all but
  * k rows. This operator plans two phases instead, like a hash
  * aggregate: a map-side phase keeps a bounded heap of k rows per key
  * per partition — shuffle volume ≤ k·keys·partitions rows,
  * independent of input size, the property that matters when an ANN
  * query scores 10⁹ candidates for k=10 — and the reduce-side phase
  * merges heaps and emits a 1-based `rank`, identical to
  * `row_number` under the same (total, deterministic) sort order.
  */
object TopKPerKeyPlan {

  /** Logical node: output = child's columns plus the rank column. */
  case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
                        k: Int, rankAttr: Attribute, child: LogicalPlan)
      extends UnaryNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    // rank is born here, not read from the child
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
    override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
      copy(child = c)
  }

  object TopKPerKeyStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKey(keys, order, k, rankAttr, child) =>
        TopKFinalExec(keys, order, k, rankAttr,
          TopKPartialExec(keys, order, k, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Bounded per-key selection shared by both phases: a hash map of
    * size-k max-heaps (reverse of the sort order), so the worst row
    * is evicted in O(log k). Returns the survivors per key, SORTED by
    * the sort order. */
  private def selectTopK(iter: Iterator[InternalRow], output: Seq[Attribute],
                         keys: Seq[Expression], order: Seq[SortOrder],
                         k: Int): Iterator[(UnsafeRow, Array[InternalRow])] = {
    val keyProj = UnsafeProjection.create(keys, output)
    val ord = GenerateOrdering.generate(order, output)
    val reverse = ord.reverse
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, JPriorityQueue[InternalRow]]
    iter.foreach { row =>
      val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
        new JPriorityQueue[InternalRow](k + 1, reverse))
      if (heap.size < k) heap.add(row.copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll()
        heap.add(row.copy())
      }
    }
    heaps.iterator.map { case (key, heap) =>
      val arr = new Array[InternalRow](heap.size)
      var i = heap.size - 1
      while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // drain worst-first
      (key, arr)
    }
  }

  /** Map-side phase: no distribution requirement, passes through only
    * each partition's top-k rows per key (no rank yet). */
  case class TopKPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
                             k: Int, child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override protected def doExecute(): RDD[InternalRow] = {
      val (ks, os, n, out) = (keys, order, k, child.output)
      child.execute().mapPartitionsInternal { iter =>
        selectTopK(iter, out, ks, os, n).flatMap(_._2)
      }
    }
    override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
      copy(child = c)
  }

  /** Reduce-side phase: requires clustering on the keys (the planner
    * inserts the hash exchange over the partial phase's bounded
    * output), merges the per-partition survivors, and emits rank. */
  case class TopKFinalExec(keys: Seq[Expression], order: Seq[SortOrder],
                           k: Int, rankAttr: Attribute,
                           child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(keys) :: Nil
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override protected def doExecute(): RDD[InternalRow] = {
      val (ks, os, n, childOut, out) = (keys, order, k, child.output, output)
      child.execute().mapPartitionsInternal { iter =>
        val proj = UnsafeProjection.create(out.zipWithIndex.map {
          case (a, i) => BoundReference(i, a.dataType, a.nullable)
        })
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        selectTopK(iter, childOut, ks, os, n).flatMap { case (_, rows) =>
          rows.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.update(0, (i + 1).toLong)
            proj(joined(r, rankRow)).copy()
          }
        }
      }
    }
    override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
      copy(child = c)
  }

  /** Public entry point: top-k rows of `df` per `keyCols`, ordered by
    * `orderSpec` — (columnName, descending) pairs — plus a `rank`
    * column: a drop-in for the window formulation. Columns are
    * resolved here against the analyzed child (Spark 4's lazy
    * Column-node conversion does not reach inside foreign logical
    * nodes), and the planner strategy is registered idempotently, so
    * the operator works on any session (with or without
    * GraftExtensions). */
  def topK(df: DataFrame, keyCols: Seq[String],
           orderSpec: Seq[(String, Boolean)], k: Int,
           rankName: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(sys.error(s"topK: no column '$n' in ${analyzed.output}"))
    val keys: Seq[Expression] = keyCols.map(attr)
    val order = orderSpec.map { case (n, desc) =>
      SortOrder(attr(n),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else Ascending)
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      TopKPerKey(keys, order, k, rankAttr, analyzed))
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(TopKPerKeyStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerKeyStrategy
  }
}
