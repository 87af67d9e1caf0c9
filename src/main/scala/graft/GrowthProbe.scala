package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.Dedup

/** Growth-certification probe for the all-pairs jaccard family: the
  * queries' cost driver is the CANDIDATE-PAIR mass (Σ C(posting, 2)
  * over the df-pruned inverted index — every candidate is work no
  * all-pairs-exact algorithm can skip), so the honest growth metric
  * across scale points is candidates/second, not raw seconds vs rows
  * (on near-dup-bearing corpora the output itself grows faster than
  * n). This main prints one JSON line per run:
  * docs, postings, candidate pairs (q23/q136's shared grain),
  * incremental-join candidates (q137's grain), and the gated output
  * pair counts — README's growth table divides the Bench times by
  * these.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.GrowthProbe
  */
object GrowthProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.core.Tables.load(spark, dir, "documents")
    val nDocs = d.count()
    val sh = Dedup.dfPruneFrac(
      Dedup.shingleTable(d, "doc_id", "text", 3).select("id", "sh"),
      0.1, d).localCheckpoint()
    val nPost = sh.count()
    // q23/q136 candidate mass: Σ C(k,2) over the posting grain
    val cand = sh.groupBy("sh").agg(count(lit(1)).as("k"))
      .filter(col("k") > 1)
      .agg(coalesce(sum(col("k").cast("decimal(38,0)") *
        (col("k") - 1) / 2), lit(0).cast("decimal(38,0)")))
      .collect()(0).getDecimal(0).longValueExact()
    // q137 candidate mass: the delta-vs-corpus join rows that survive
    // the orientation filter (each is one verification unit)
    val newSide = sh.filter(col("id") % 10 === 7)
      .select(col("id").as("nid"), col("sh"))
    val incCand = newSide
      .join(sh.select(col("id").as("oid"), col("sh")), Seq("sh"))
      .filter(col("nid") =!= col("oid") &&
        (!(col("oid") % 10 === 7) || col("nid") < col("oid")))
      .count()
    val jacc = Dedup.jaccardPairs(sh, 0.2).count()
    val cont = Dedup.containmentPairs(sh, 0.4).count()
    val inc = Dedup.incrementalJaccardPairs(sh, id => id % 10 === 7,
      0.2).count()
    println(s"""{"dir":"$dir","docs":$nDocs,"postings":$nPost,""" +
      s""""cand_pairs":$cand,"inc_cand":$incCand,""" +
      s""""jaccard_out":$jacc,"containment_out":$cont,""" +
      s""""incremental_out":$inc}""")
    spark.stop()
  }
}
