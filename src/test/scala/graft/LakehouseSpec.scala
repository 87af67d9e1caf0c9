package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, MergeByKey, Validate}

/** Round-3 closing tier: bucketed layout joins, snapshot diff,
  * survivorship, dynamic partition overwrite, decayed features, and
  * the exact-sums regression profile. */
class LakehouseSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // -------------------------------------------------------------- q117
  test("bucketed co-located join: neither side exchanges or sorts " +
       "between scan and sort-merge join") {
    val plan = SparkEntry.queries("q117_bucketed_join")(spark, TestSpark.sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("SelectedBucketsCount"), plan)
    // the only exchanges are ABOVE the join (aggregate + output sort):
    // cut the plan at the join node and assert nothing below it shuffles
    val belowJoin = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!belowJoin.contains("Exchange"),
      s"bucketed join must not re-shuffle its inputs\n$plan")
    assert(!belowJoin.contains("+- Sort "),
      s"bucket-sorted scans must not re-sort\n$plan")
  }

  test("bucketed join result equals a plain join") {
    val viaBuckets =
      SparkEntry.queries("q117_bucketed_join")(spark, TestSpark.sf001)
        .collect().map(_.toSeq).toSeq
    val o = spark.read.parquet(s"${TestSpark.sf001}/orders.parquet")
    val l = spark.read.parquet(s"${TestSpark.sf001}/lineitem.parquet")
    val plain = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        graft.analytics.Exact.fixedSum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect().map(_.toSeq).toSeq
    assert(viaBuckets == plain)
  }

  // -------------------------------------------------------------- q119
  test("tableDiff classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("key", "v")
    val v2 = Seq((2L, "b"), (3L, "X"), (4L, "d")).toDF("key", "v")
    val d = Validate.tableDiff(v1, v2, col("key"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  // -------------------------------------------------------------- q121
  test("survivor: each attribute keeps its own latest non-null value") {
    val obs = Seq(
      // (key, ord, a, b): a's latest non-null is at ord 3, b's at ord 1
      ("u1", 1L, Some("a1"), Some("b1")),
      ("u1", 2L, None: Option[String], None: Option[String]),
      ("u1", 3L, Some("a3"), None: Option[String]),
      ("u2", 9L, None: Option[String], None: Option[String])
    ).toDF("k", "ord", "a", "b")
    val out = MergeByKey.survivor(obs, Seq("k"), "ord", Seq("a", "b"))
      .orderBy("k").collect()
    assert(out(0).getString(0) == "u1")
    assert(out(0).getAs[String]("a") == "a3")
    assert(out(0).getAs[String]("b") == "b1")
    assert(out(0).getAs[Long]("n_obs") == 3L)
    assert(out(0).getAs[Long]("last_ord") == 3L)
    // u2: every observation null -> attribute stays null
    assert(out(1).getAs[String]("a") == null)
  }

  // -------------------------------------------------------------- q122
  test("dynamic partition overwrite leaves untouched partitions' " +
       "files byte-identical") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_dyn_spec").toString
    Seq((1L, "p1", 10L), (2L, "p2", 20L), (3L, "p2", 30L))
      .toDF("id", "p", "v")
      .write.mode("overwrite").partitionBy("p").parquet(base)
    def files(part: String): Map[String, Long] = {
      val d = new java.io.File(s"$base/p=$part")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val p1Before = files("p1")
    Layout.dynamicOverwrite(
      Seq((9L, "p2", 99L)).toDF("id", "p", "v").select($"id", $"p", $"v"),
      "p", base)
    assert(files("p1") == p1Before,
      "p1 files must be untouched by a p2-only dynamic overwrite")
    val back = spark.read.parquet(base)
      .select($"id", $"v").orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(back == Seq((1L, 10L), (9L, 99L)),
      "p2 replaced wholesale, p1 intact")
  }

  // -------------------------------------------------------------- q123
  test("EWMA fold matches the hand-computed recursion") {
    val ev = Seq((1L, 10L, 1L, 8.0), (1L, 20L, 2L, 4.0), (1L, 5L, 3L, 2.0))
      .toDF("user_id", "s", "event_id", "v")
    val out = ev.groupBy($"user_id")
      .agg(aggregate(
        transform(sort_array(collect_list(struct($"s", $"event_id", $"v"))),
          r => r.getField("v")),
        lit(0.0), (acc, x) => acc * lit(0.5) + x * lit(0.5)).as("ewma"))
      .collect()(0).getDouble(1)
    // sorted by s: 2.0, 8.0, 4.0 -> 0->1.0->4.5->4.25
    assert(out == 4.25)
  }

  // -------------------------------------------------------------- q124
  test("regressionExact recovers a known line exactly") {
    // y = 3x + 7 (in units), e2-scaled inputs
    val pts = Seq((100L, 1000L), (200L, 1300L), (300L, 1600L),
      (400L, 1900L)).map { case (x, y) => ("g", x, y) }
      .toDF("g", "x", "y")
    val r = Validate.regressionExact(pts, col("x"), col("y"), Seq(col("g")))
      .collect()(0)
    assert(r.getAs[Long]("slope_e6") == 3000000L)
    assert(r.getAs[Long]("intercept_e6") == 7000000L)
    assert(r.getAs[Long]("r2_e6") == 1000000L)
  }

  // -------------------------------------------------------------- q125
  test("null-safe join matches null to null and plans as a hash join") {
    val df = SparkEntry.queries("q125_null_safe_join")(spark, TestSpark.sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"null-safe equality must stay a hash-joinable key\n$plan")
    // the -1 bucket (the nullified class) must be present and joined
    val buckets = df.collect().map(_.getInt(0)).toSeq
    assert(buckets.contains(-1), s"null bucket missing: $buckets")
  }

  // -------------------------------------------------------------- q126
  test("exact z-score outliers: integer inequality matches the float " +
       "z-score away from the boundary") {
    // group: values 0..9 plus one wild point 1000 -> only 1000 is >3 sigma
    val vals = (0L to 9L) :+ 1000L
    val df = vals.map(v => ("g", v)).toDF("event_type", "v")
    val dec = "decimal(38,0)"
    val stats = df.groupBy($"event_type")
      .agg(count(lit(1)).cast(dec).as("sn"),
        sum($"v").cast(dec).as("ss"),
        sum($"v".cast(dec) * $"v".cast(dec)).as("sq"))
    val lhs = ($"sn" * $"v".cast(dec) - $"ss") *
      ($"sn" * $"v".cast(dec) - $"ss")
    val rhs = lit(9).cast(dec) * ($"sn" * $"sq" - $"ss" * $"ss")
    val outliers = df.join(broadcast(stats), "event_type")
      .filter(lhs > rhs).select($"v").collect().map(_.getLong(0)).toSeq
    assert(outliers == Seq(1000L))
  }

  // -------------------------------------------------------------- q128
  test("bucket-pruned point lookup reads fewer buckets than the table " +
       "has") {
    val plan = SparkEntry.queries("q128_bucket_lookup")(spark, TestSpark.sf001)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"bucketed scan missing\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"expected bucket pruning, read ${m.get.group(1)}/${m.get.group(2)}\n$plan")
  }

  // -------------------------------------------------------------- q129
  test("TWAP integrates the step function exactly") {
    val ev = Seq((1L, 0L, 1L, 10L), (1L, 10L, 2L, 20L), (1L, 30L, 3L, 0L))
      .toDF("user_id", "es", "event_id", "v")
    val r = graft.operators.TimeSeries.twap(ev, Seq("user_id"),
      $"es", $"event_id", $"v").collect()(0)
    // area = 10*10 + 20*20 = 500 over span 30
    assert(r.getAs[Long]("n_samples") == 3L)
    assert(r.getAs[Long]("span_s") == 30L)
    assert(r.getAs[Long]("area_e4s") == 500L)
    assert(r.getAs[Double]("twap_e4") == 500.0 / 30.0)
  }

  // -------------------------------------------------------------- q130
  test("activity bitmap ORs hours and popcounts them") {
    val ev = Seq((0, 0), (0, 0), (0, 1), (0, 23)).map { case (u, h) =>
      (u.toLong, h) }.toDF("user_id", "h")
      .withColumn("hbit", expr("shiftleft(CAST(1 AS BIGINT), h)"))
    val mask = ev.groupBy($"user_id").agg(expr("bit_or(hbit)").as("mask"))
      .collect()(0).getLong(1)
    assert(mask == ((1L << 0) | (1L << 1) | (1L << 23)))
    assert(java.lang.Long.bitCount(mask) == 3)
  }

  // -------------------------------------------------------------- q131
  test("poissonWeight inverts the Poisson(1) CDF at the thresholds") {
    import graft.operators.Curate
    val us = Seq(0.0, 0.3, 0.4, 0.8, 0.95, 0.99, 0.999, 0.99999)
    val out = us.map(u => (u, 0)).toDF("u", "z")
      .select(Curate.poissonWeight($"u").as("w"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 0, 1, 2, 3, 4, 5, 6))
  }

  // -------------------------------------------------------------- q133
  test("dynamic partition pruning: the fact scan carries a runtime " +
       "pruning expression from the dim side") {
    val plan = SparkEntry.queries("q133_dynamic_pruning")(spark, TestSpark.sf001)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must be runtime-pruned by the dim filter\n$plan")
  }

  // -------------------------------------------------------------- q120
  test("attribution: ties at the same second resolve to the larger " +
       "event id; out-of-window touches do not attribute") {
    import graft.operators.AsOfJoin
    val purchases = Seq((1L, 100L, 1000L), (2L, 101L, 5000L))
      .toDF("user_id", "p_id", "p_s")
    val touches = Seq(
      (1L, 10L, 1000L, "click"), (1L, 11L, 1000L, "view"), // tie at p_s
      (2L, 12L, 1000L, "click") // 4000 s before purchase: out of window
    ).toDF("user_id", "t_id", "t_s", "t_type")
    val out = AsOfJoin.lastBeforeWithin(purchases, touches, Seq("user_id"),
        "p_s", "t_s", Seq("t_s", "t_id", "t_type"), lit(3600L))
      .orderBy($"p_id").collect()
    assert(out(0).getAs[Long]("t_id") == 11L, "max t_id wins the tie")
    assert(out(1).getAs[Any]("t_id") == null, "out-of-window -> null")
  }
}
