package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.Audit

/** Hand-computed truths for the audit-tier operators — these checks
  * validate the SEMANTICS (the gate's DuckDB comparison proves
  * cross-engine equality, which a shared formula error would pass).
  */
class AuditSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("rocAuc: separable = 1.0, tie-credit case = 0.75, inverted = 0") {
    val sep = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("v", "y")
    val r = Audit.rocAuc(sep, col("v"), col("y")).collect().head
    assert(r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 2)
    assert(r.getAs[Long]("auc_e6") == 1000000L)
    // one positive ties the negative at v=1 (0.5 credit), one beats
    // it: AUC = (0.5 + 1) / 2
    val tied = Seq((1L, 0L), (1L, 1L), (2L, 1L)).toDF("v", "y")
    assert(Audit.rocAuc(tied, col("v"), col("y"))
      .collect().head.getAs[Long]("auc_e6") == 750000L)
    val inv = Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L)).toDF("v", "y")
    assert(Audit.rocAuc(inv, col("v"), col("y"))
      .collect().head.getAs[Long]("auc_e6") == 0L)
  }

  test("ksStatistic: disjoint samples reach D = 1 at the last A value; " +
       "identical samples give D = 0 with the smallest-v tiebreak") {
    val disj = Seq((1L, 1L, 0L), (2L, 1L, 0L), (3L, 0L, 1L),
      (4L, 0L, 1L)).toDF("v", "a", "b")
    val r = Audit.ksStatistic(disj, col("v"), col("a"), col("b"))
      .collect().head
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Long]("d_num") == 4L) // = n_a·n_b -> D = 1
    assert(r.getAs[Long]("v_at") == 2L)
    assert(r.getAs[Long]("ks_e6") == 1000000L)
    val same = Seq((1L, 1L, 1L), (2L, 1L, 1L)).toDF("v", "a", "b")
    val r2 = Audit.ksStatistic(same, col("v"), col("a"), col("b"))
      .collect().head
    assert(r2.getAs[Long]("d_num") == 0L)
    assert(r2.getAs[Long]("v_at") == 1L) // ties -> smallest value
    assert(r2.getAs[Long]("ks_e6") == 0L)
  }

  test("gini: equal values -> 0; {1,3} -> 0.25 exactly") {
    val eq = Seq((5L, 1L), (5L, 2L)).toDF("x", "k")
    assert(Audit.gini(eq, col("x"), col("k"))
      .collect().head.getAs[Long]("gini_e6") == 0L)
    // n=2, Σx=4, Σi·x = 1·1 + 2·3 = 7: G = (14 − 12) / 8 = 0.25
    val two = Seq((1L, 1L), (3L, 2L)).toDF("x", "k")
    val r = Audit.gini(two, col("x"), col("k")).collect().head
    assert(r.getAs[Long]("n_rows") == 2 && r.getAs[Long]("total") == 4)
    assert(r.getAs[Long]("gini_e6") == 250000L)
  }

  test("sortedNeighborhoodPairs: each row pairs with exactly its w " +
       "successors in key order — n·w minus the boundary, never more") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "key")
    val got = Audit.sortedNeighborhoodPairs(df, col("id"), col("key"), 2)
      .select("j", "id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 2L), (1L, 2L, 3L), (1L, 3L, 4L), // adjacent
      (2L, 1L, 3L), (2L, 2L, 4L)))              // skip-one
  }
}
