package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Salt
import graft.sources.Ingest

/** The scale patterns: salted aggregation equals plain aggregation;
  * bucketed tables join with no exchange. */
class ScaleOpsSpec extends AnyFunSuite {
  import TestSpark.spark

  test("skew lint: the q298 audit flags a planted hot key and " +
       "clears every gate join key on the driver testdata — the " +
       "build-time form of the salting rule (a key the lint flags " +
       "must route through Salt.join, cf. Graph.twoHopReach)") {
    import spark.implicits._
    // the gate's shuffled join keys on real testdata: none may trip
    // the 16x-mean salting threshold the q298 verdict encodes
    val flagged = analytics.Ops.queries("q298_skew_lint")(
        spark, TestSpark.sf001)
      .filter(col("needs_salt") === 1)
      .select("join_key").as[String].collect().toSet
    assert(flagged.isEmpty,
      s"join keys now exceed the salting threshold without a " +
        s"Salt.join in their plan: $flagged — route them through " +
        s"Salt.join or document the mitigation")
    // and the verdict is not vacuous: a planted 20x hot key trips it
    val hot = (1 to 2000).map(_ => 7L) ++ (1L to 1000L)
    val df = hot.toDF("k")
    val audit = df.groupBy("k").agg(count(lit(1)).as("c"))
      .agg(sum("c").as("n"), count(lit(1)).as("d"), max("c").as("m"))
      .select((col("m") * col("d") >= col("n") * 16).cast("long"))
      .as[Long].head()
    assert(audit == 1L, "planted 20x skew must trip the verdict")
  }

  test("salted aggregate == plain aggregate on skewed keys") {
    import spark.implicits._
    // skew: one hot key with 50k rows, 100 cold keys
    val hot = (1 to 50000).map(i => ("hot", i.toDouble))
    val cold = (1 to 100).flatMap(k => (1 to 10).map(i => (s"k$k", i.toDouble)))
    val df = (hot ++ cold).toDF("key", "v")
    val salted = Salt.aggregate(df, Seq("key"), buckets = 8,
      sums = Seq("v"), mins = Seq("v"), maxs = Seq("v"))
    val plain = df.groupBy("key").agg(
      sum($"v").as("sum_v"), count(lit(1)).as("cnt"),
      min($"v").as("min_v"), max($"v").as("max_v"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the partial phase really fans the hot key out
    val nPartials = df.withColumn("__salt",
      pmod(xxhash64(col("key"), col("v")), lit(8)))
      .filter($"key" === "hot").select("__salt").distinct().count()
    assert(nPartials == 8)
  }

  test("tables bucketed on the join key join without an exchange") {
    val o = Tables.load(spark, TestSpark.sf001, "orders")
    val l = Tables.load(spark, TestSpark.sf001, "lineitem")
    Ingest.writeBucketed(o, "b_orders", 4, Seq("o_orderkey"),
      Seq("o_orderkey"))
    Ingest.writeBucketed(l, "b_lineitem", 4, Seq("l_orderkey"),
      Seq("l_orderkey"))
    // disable broadcast so the join must pick SMJ/shuffled-hash — the
    // only way bucketing's no-exchange property is actually observable
    // at this tiny scale factor
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"join repartitioned bucketed input:\n$plan")
      // and the result is right
      assert(joined.collect().map(_.getLong(1)).sum ==
        l.join(o, col("o_orderkey") === col("l_orderkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
