package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Validate

/** Declarative DQ rules: profile counts and the clean/rejects split
  * must agree, nulls count as violations, rejects name every failed
  * rule in rule order. */
class ValidateSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rules = Seq(
    Validate.Rule("v_pos", col("v") > 0),
    Validate.Rule("name_short", length(col("name")) <= 3))

  private val df = Seq(
    (1L, 5, "ab"),            // clean
    (2L, -1, "ab"),           // v_pos
    (3L, 5, "abcd"),          // name_short
    (4L, -2, "abcde"),        // both
    (5L, 5, "xyz")            // clean
  ).toDF("id", "v", "name")
    .union(Seq((6L, null.asInstanceOf[Integer], "ok"))
      .toDF("id", "v", "name")) // null predicate -> violation

  test("profile counts per rule in one scan") {
    val p = Validate.profile(df, rules)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(p("v_pos") == ((3L, 6L)))
    assert(p("name_short") == ((2L, 6L)))
  }

  test("split partitions the input; rejects carry failed rule names " +
       "in rule order") {
    val (clean, rejects) = Validate.split(df, rules)
    assert(clean.select("id").as[Long].collect().toSet == Set(1L, 5L))
    val v = rejects.select("id", "violated").as[(Long, String)]
      .collect().toMap
    assert(v == Map(2L -> "v_pos", 3L -> "name_short",
      4L -> "v_pos,name_short", 6L -> "v_pos"))
    assert(clean.count() + rejects.count() == df.count())
  }

  test("histogram: every row binned exactly once, bins integer-exact, " +
       "extremes land in first and last bin") {
    val vals = Seq(-2.5, -1.0, 0.0, 0.5, 1.0, 2.5, 2.5, 7.5)
    val data = vals.toDF("v")
    val h = Validate.histogram(data, col("v"), bins = 4)
      .orderBy("bin_idx")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(h.map(_._3).sum == vals.length, "every row in exactly one bin")
    // lo = -25000, hi = 75000, w = ceil(100001/4) = 25001
    assert(h.head._1 == 0L && h.head._4 == -25000L)
    assert(h.last._4 <= 75000L && h.last._5 == 75000L)
    // bin bounds: each bin's values fall in [lo_e4, lo_e4 + w)
    h.foreach { case (_, lo, _, mn, mx) =>
      assert(mn >= lo && mx < lo + 25001L)
    }
  }

  test("momentsExact: second moment survives where a BIGINT " +
       "accumulator would overflow") {
    // 200 rows of value 3e5 -> v=3e9 e4-units, v^2=9e18 > Long.Max:
    // TWO rows already wrap a long accumulator
    val big = Seq.fill(200)(300000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val r = Validate.momentsExact(big, col("v"), Seq(lit(1).as("g")))
      .select(col("n"), col("sum_e4"), col("sumsq_e8").cast("string"))
      .as[(Long, Long, String)].head()
    val v = BigInt(3000000000L)
    assert(r._1 == 200L && r._2 == 200L * 3000000000L)
    assert(BigInt(r._3) == v * v * 200,
      s"exact 128-bit sum of squares expected, got ${r._3}")
  }

  test("winsorize clips to integer bounds and flags exactly the " +
       "outlier rows") {
    // 100 rows 1..100 (e4 units): p01=1.99, p99=99.01 under linear
    // interpolation -> lows clip to ceil(1.99)=2, highs to floor=99
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val r = Validate.winsorize(df, col("v"), 0.01, 0.99)
      .select(col("id"), col("clipped"), col("is_lo"), col("is_hi"))
      .as[(Long, Long, Boolean, Boolean)].collect()
      .sortBy(_._1)
    assert(r.count(_._3) == 1 && r.count(_._4) == 1)
    assert(r.head == ((1L, 2L, true, false)))
    assert(r.last == ((100L, 99L, false, true)))
    assert(r(49) == ((50L, 50L, false, false)))
  }

  test("tableChecksum: layout-invariant; detects a single changed " +
       "row; modular sum catches what xor cancels") {
    def ck(d: org.apache.spark.sql.DataFrame) =
      Validate.tableChecksum(d,
          concat_ws("|", col("id"), col("s")), Seq(col("g")))
        .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    val base = Seq((1L, "a", "g1"), (2L, "b", "g1"), (3L, "c", "g2"))
      .toDF("id", "s", "g")
    assert(ck(base) == ck(base.repartition(7).sortWithinPartitions("s")),
      "checksum must not depend on partitioning or row order")
    val edited = Seq((1L, "a", "g1"), (2L, "B", "g1"), (3L, "c", "g2"))
      .toDF("id", "s", "g")
    assert(ck(base) != ck(edited), "one changed row must change the triple")
    // a row duplicated twice xor-cancels back to the ORIGINAL xor —
    // count and modular sum must still flag the divergence
    val duped = base.union(Seq((2L, "b", "g1"), (2L, "b", "g1"))
      .toDF("id", "s", "g"))
    val (b1, d1) = (ck(base).head, ck(duped).head)
    assert(d1._3 == b1._3, "xor alone is blind to a duplicated pair")
    assert(d1._2 != b1._2 && d1._4 != b1._4,
      "count and modular sum must catch the duplicated pair")
  }

  test("groupedPercentilesExact is bit-equal to the single-buffer " +
       "exact percentile, per group, including awkward sizes") {
    import org.apache.spark.sql.functions.expr
    // group sizes chosen for the edge positions: n=1 (h=0), n=4
    // (h=0.75 fractional), n=5 (h integral at p=0.25/0.5/0.75 —
    // frac==0 path), plus a bigger group with duplicates
    val rows =
      Seq(("a", 42L)) ++
      (1 to 4).map(i => ("b", i * 10L)) ++
      (1 to 5).map(i => ("c", 100L - i)) ++
      (1 to 97).map(i => ("d", (i * 37 % 50).toLong))
    val df = rows.toDF("g", "v")
    val got = Validate.groupedPercentilesExact(df, col("g"), "g",
        col("v"), Seq(0.25, 0.5, 0.75), Seq("p25", "p50", "p75"),
        accuracy = 100)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    val want = df.groupBy("g")
      .agg(expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.75)").as("p75"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq == want.toSeq) // bit-equal doubles, == is exact
  }

  test("groupedPercentilesExact windows stay ~8n/accuracy, not n") {
    // 10k rows, one group, accuracy 1000: each boundary window's
    // collect_list must hold far fewer rows than the column
    val df = (1 to 10000).map(i => ("g", (i * 7919 % 10007).toLong))
      .toDF("g", "v")
    val r = Validate.groupedPercentilesExact(df, col("g"), "g",
      col("v"), Seq(0.5), Seq("p50"), accuracy = 1000)
    val exact = df.groupBy("g").agg(expr("percentile(v, 0.5)").as("p"))
      .head.getDouble(1)
    assert(r.head.getDouble(1) == exact)
    // the plan must contain no exact-percentile aggregate over the
    // full column (the OOM shape this operator exists to avoid)
    val plan = r.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("percentile("),
      s"full-column exact percentile found in plan:\n$plan")
  }
}
