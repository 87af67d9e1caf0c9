package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.PlanStats.Pinned

/** 2-D Pareto front (skyline): the rows not dominated under
  * (minimize `cost`, maximize `gain`) — row r dominates row q when
  * cost(r) ≤ cost(q) ∧ gain(r) ≥ gain(q) with at least one strict;
  * equal (cost, gain) pairs do not dominate each other, so duplicate
  * optima all survive.
  *
  * Shape — the q59 global-rank discipline applied to a prefix max,
  * NEVER a global window or an all-pairs anti-join:
  *  1. collapse to one row per distinct cost (groupBy → gmax(cost) =
  *     best gain at that cost) — domination only depends on this;
  *  2. range-repartition the per-cost table on cost (unique keys, so
  *     no tie ever spans a partition boundary) and take the strict
  *     running max of gmax: a per-PARTITION window plus the earlier
  *     partitions' maxima joined in from a broadcast ~#partitions-row
  *     table (localCheckpoint pins one materialization of the range
  *     exchange — both the stats pass and the window pass branch off
  *     it);
  *  3. a cost survives iff its gmax beats every strictly-cheaper
  *     cost's gmax; rows survive iff their cost survives AND they
  *     attain its gmax. One broadcast-ready join back to the input.
  *
  * Both columns must be integer-valued (exact comparisons). Output:
  * the surviving input rows, unmodified.
  */
object Skyline {

  def paretoFront2D(df: DataFrame, costCol: String,
                    gainCol: String): DataFrame = {
    val perCost = df
      .groupBy(col(costCol).as("__cost"))
      .agg(max(col(gainCol)).as("__gmax"))
      .repartitionByRange(32, col("__cost"))
      .sortWithinPartitions(col("__cost"))
      .withColumn("__pid", spark_partition_id())
      .pin()
    val pmax = perCost.groupBy(col("__pid")).agg(max(col("__gmax")).as("__pm"))
    // strict prefix over earlier partitions: every cost there is
    // strictly cheaper (unique costs + range partitioning)
    val prev = pmax.as("a")
      .join(broadcast(pmax.as("b")), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(max(col("b.__pm")).as("__prev"))
    val wStrict = Window.partitionBy(col("__pid")).orderBy(col("__cost"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val winners = perCost
      .join(broadcast(prev), Seq("__pid"))
      .withColumn("__before",
        greatest(coalesce(max(col("__gmax")).over(wStrict), lit(Long.MinValue)),
          coalesce(col("__prev"), lit(Long.MinValue))))
      .filter(col("__before") < col("__gmax"))
      .select(col("__cost"), col("__gmax"))
    df.join(broadcast(winners),
        col(costCol) === col("__cost") && col(gainCol) === col("__gmax"),
        "left_semi")
  }
}
