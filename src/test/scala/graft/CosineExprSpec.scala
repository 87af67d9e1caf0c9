package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors

/** The fused native cosine expression must be bit-identical to the
  * composed higher-order-function form on every input class, and must
  * participate in whole-stage codegen. */
class CosineExprSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("native cosine == composed cosine bit-for-bit on the real " +
       "embeddings (float arrays)") {
    val emb = graft.core.Tables.load(spark, TestSpark.sf001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val paired = emb.as("x").join(emb.as("y"),
      col("x.vec_id") + 1 === col("y.vec_id"))
    val diff = paired.select(
        Vectors.cosine(col("x.embedding"), col("y.embedding")).as("hof"),
        Vectors.cosineNative(col("x.embedding"), col("y.embedding"))
          .as("native"))
      .filter(!(col("hof") <=> col("native")))
    assert(diff.count() == 0)
  }

  test("null contract matches the fold: zero vector, null element, " +
       "length mismatch, null array") {
    val rows = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),        // plain
      (Array(1.0f, 0.0f), Array(0.0f, 0.0f)),        // zero vector
      (Array(0.0f), Array(0.0f)),                    // both zero
      (Array(1.0f, 2.0f), Array(1.0f))               // length mismatch
    ).toDF("a", "b")
      .union(Seq((Array(1.0f), null.asInstanceOf[Array[Float]]))
        .toDF("a", "b"))
      .union(spark.sql(
        "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS b"))
    val out = rows.select(
      Vectors.cosine(col("a"), col("b")).as("hof"),
      Vectors.cosineNative(col("a"), col("b")).as("native")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
    assert(out.count(_.isNullAt(1)) == 5)
  }

  test("double-element arrays work too") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)))
      .toDF("a", "b")
    val Array(r) = df.select(
      Vectors.cosine(col("a"), col("b")).as("hof"),
      Vectors.cosineNative(col("a"), col("b")).as("native")).collect()
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("cosine_sim is reachable from the SQL frontend") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head.getDouble(0)
    assert(r == 1.0)
  }

  test("native cosine stays inside WholeStageCodegen") {
    val emb = graft.core.Tables.load(spark, TestSpark.sf001, "embeddings")
    val df = emb.select(
      Vectors.cosineNative(col("embedding"), col("embedding")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators fused into a WholeStageCodegen stage; a
    // non-codegen expression would force the Project out of the stage
    assert(plan.contains("*(1) Project") &&
      plan.toLowerCase.contains("cosinesimilarity"), plan)
    assert(df.filter(col("c") > 0.999).count() > 0)
  }
}
