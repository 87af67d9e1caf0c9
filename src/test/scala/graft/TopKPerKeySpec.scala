package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.TopKPerKeyPlan
import org.scalatest.funsuite.AnyFunSuite

/** The custom top-k-per-key operator (logical node + strategy +
  * two-phase physical plan) must reproduce the window formulation
  * row-for-row, and its plan must show the bounded map-side phase
  * BELOW the exchange — the property that caps shuffle volume at
  * k·keys·partitions regardless of input size. */
class TopKPerKeySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("vec_id").asc)).cast("long"))
      .filter(col("rank") <= k)

  private lazy val scored = {
    val emb = graft.core.Tables.load(spark, TestSpark.sf001, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    emb.select(col("vec_id"), col("embedding").as("cv"))
      .join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(graft.functions.Vectors.cosineNative(col("qv"), col("cv")), 4)
          .as("cos"))
  }

  test("custom operator == window row_number on real scored data, " +
       "including rank values and tie handling") {
    val custom = TopKPerKeyPlan.topK(scored, Seq("query_id"),
      Seq("cos" -> true, "vec_id" -> false), 5)
    val window = windowTopK(scored, 5)
    val c = custom.select("query_id", "vec_id", "cos", "rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val w = window.select("query_id", "vec_id", "cos", "rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    assert(c.length == 50 && c.toSeq == w.toSeq)
  }

  test("plan: partial phase below the exchange, final above — the " +
       "shuffle only carries bounded survivors") {
    val plan = TopKPerKeyPlan.topK(scored, Seq("query_id"),
        Seq("cos" -> true, "vec_id" -> false), 5)
      .queryExecution.executedPlan.toString
    val partial = plan.indexOf("TopKPartial")
    val exchange = plan.indexOf("Exchange hashpartitioning(query_id")
    val fin = plan.indexOf("TopKFinal")
    assert(fin >= 0 && exchange > fin && partial > exchange,
      s"expected Final above Exchange above Partial:\n$plan")
  }

  test("k larger than any group returns whole groups, ranked") {
    val df = Seq((1L, 1L, 0.5), (1L, 2L, 0.9), (2L, 3L, 0.1))
      .toDF("query_id", "vec_id", "cos")
    val out = TopKPerKeyPlan.topK(df, Seq("query_id"),
        Seq("cos" -> true, "vec_id" -> false), 10)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 1L), (1L, 1L, 2L), (2L, 3L, 1L)))
  }
}
