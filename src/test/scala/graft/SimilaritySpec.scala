package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ANN variants: brute-force correctness and the recall ordering
  * brute >= multi-band >= single-bucket on real embeddings. */
class SimilaritySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("multi-band LSH recall beats single-bucket LSH on real data") {
    val e = graft.core.Tables.load(TestSpark.spark, TestSpark.sf001,
      "embeddings")
    val q = e.filter(col("vec_id") < 20)
    def top1(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("rank") === 1)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val brute = top1(Similarity.bruteForceTopK(e, q, "vec_id",
      "embedding", 1))
    val single = top1(Similarity.lshTopK(e, q, "vec_id", "embedding", 1))
    val multi = top1(Similarity.multiBandTopK(e, q, "vec_id",
      "embedding", 1))
    def recall(m: Map[Long, Long]) =
      brute.count { case (k, v) => m.get(k).contains(v) }
    assert(recall(multi) >= recall(single))
    assert(multi.size >= single.size) // at least as many queries served
  }

  test("brute-force top-k: correct neighbors, self excluded, k bound") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 1),
      "vec_id", "embedding", 2).orderBy("rank")
      .select("vec_id").as[Long].collect()
    assert(out.toSeq == Seq(2L, 3L)) // nearest then orthogonal; self and
                                     // antipode excluded by k
  }

  test("brute-force tier fails loudly when the query set exceeds the " +
       "broadcast contract instead of building a silent cartesian") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 1,
        maxQueries = 2)
    }
    assert(e1.getMessage.contains("multiBandTopK"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.hardNegatives(
        emb.withColumn("label", col("vec_id") % 2),
        emb.withColumn("label", col("vec_id") % 2),
        "vec_id", "embedding", "label", 1, maxQueries = 2)
    }
    assert(e2.getMessage.contains("hardNegatives"))
    // explicit override: the same call succeeds when the caller raises
    // the ceiling consciously
    assert(Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 1,
      maxQueries = 10).count() > 0)
  }

  test("pqEncode assigns each subvector to its nearest centroid, " +
       "breaks exact ties on the lowest code id, and packs codes") {
    // dim 4, m 2 -> two 2-dim subspaces; codebook of 3
    val cb = Seq(
      (0L, Array(0.0f, 0.0f, 10.0f, 10.0f)),
      (1L, Array(5.0f, 5.0f, 0.0f, 0.0f)),
      (2L, Array(5.0f, 5.0f, 20.0f, 20.0f))) // subspace 0 TIES with c1
      .toDF("cid", "cv")
    val vecs = Seq(
      (100L, Array(1.0f, 1.0f, 0.5f, 0.5f)),   // sub0 -> c0, sub1 -> c1
      (101L, Array(5.0f, 5.0f, 19.0f, 19.0f))) // sub0 tie c1/c2 -> c1
      .toDF("vec_id", "embedding")
    val r = Similarity.pqEncode(vecs, "embedding", 4, 2, cb, "cid", "cv")
      .select("vec_id", "code_0", "code_1", "pq_code", "err_e6")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r(100L)._2 == 0L && r(100L)._3 == 1L)
    assert(r(100L)._4 == 0L * 3 + 1L) // base-k packing
    // err: sub0 = 1+1 = 2.0, sub1 = .25+.25 = 0.5 -> 2.5e6
    assert(r(100L)._5 == 2500000L)
    // exact distance tie between c1 and c2 in subspace 0 -> lowest id
    assert(r(101L)._2 == 1L)
  }
}
