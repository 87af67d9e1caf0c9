package graft

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.operators.Dedup

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }

    docs.count() // warm the scan
    val li = Tables.load(spark, dir, "lineitem")
    li.count()
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.mode("overwrite").format("noop").save(); 0L
    }
    for (i <- 1 to 3) time(s"q41 as-is #$i") {
      noop(SparkEntry.queries("q41_approx_distinct")(spark, dir))
    }
    time("q41 exact-only") {
      noop(li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("eo"),
          countDistinct(col("l_partkey")).as("ep")))
    }
    time("q41 hll-only") {
      noop(li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey")).as("ao"),
          approx_count_distinct(col("l_partkey"), 0.02).as("ap")))
    }
    time("q41 hll loose rsd") {
      noop(li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey")).as("ao"),
          approx_count_distinct(col("l_partkey"), 0.05).as("ap")))
    }
    for (i <- 1 to 2) time(s"q22 noop #$i") {
      noop(SparkEntry.queries("q22_dedup_minhash_lsh")(spark, dir))
    }
    for (i <- 1 to 2) time(s"q24 noop #$i") {
      noop(SparkEntry.queries("q24_simhash")(spark, dir))
    }
    time("tokenize+shingle only") {
      docs.select(col("doc_id").as("id"),
          graft.functions.Text.words(col("text")).as("__toks"))
        .select(col("id"), explode(array_distinct(
          graft.functions.Text.shinglesFromTokens(col("__toks"), 3))).as("shingle"))
        .count()
    }
    time("shingleTable xxhash") {
      Dedup.shingleTable(docs, "doc_id", "text", 3).count()
    }
    time("shingleTable portable") {
      Dedup.shingleTablePortable(docs, "doc_id", "text", 3).count()
    }
    val shP = Dedup.shingleTablePortable(docs, "doc_id", "text", 3)
    time("signatures portable") {
      Dedup.minhashSignaturesPortable(shP, 32).count()
    }
    time("sig+buckets+candidates") {
      Dedup.lshCandidates(Dedup.lshBucketsPortable(
        Dedup.minhashSignaturesPortable(shP, 32), 4)).count()
    }
    val shX = Dedup.shingleTable(docs, "doc_id", "text", 3)
    time("jaccardPairs (q23 core)") {
      Dedup.jaccardPairs(shX, 0.2).count()
    }
    time("inter join only") {
      val narrow = shX.select("id", "sh")
      narrow.as("x").join(narrow.as("y"),
          col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
        .groupBy(col("x.id"), col("y.id")).agg(count(lit(1))).count()
    }
    time("full q22") {
      SparkEntry.queries("q22_dedup_minhash_lsh")(spark, dir).count()
    }
    time("full q22 warm") {
      SparkEntry.queries("q22_dedup_minhash_lsh")(spark, dir).count()
    }
    spark.stop()
  }
}
