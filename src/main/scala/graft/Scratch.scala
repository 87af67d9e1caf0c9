package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import graft.operators.Multimodal
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = graft.core.Tables.load(spark, s"/root/testdata/$sf",
        "documents")
      val media = Multimodal.syntheticBmpWithCopies(docs, 5, 2, 10000000L)
      val n = media.count()
      val sigs = Multimodal.dhashBmp(media).toDF()
      val banded = sigs.select(col("media_id").as("id"),
          explode(lit((0 until 4).toArray)).as("band"),
          col("hash_hi"), col("hash_lo"))
        .withColumn("bucket", expr(
          "CASE WHEN band < 2 THEN shiftright(hash_lo, band * 16) " +
            "ELSE shiftright(hash_hi, (band - 2) * 16) END & 65535"))
      val mx = banded.groupBy("band", "bucket").count()
        .agg(max("count"), sum(col("count") * (col("count") - 1) / 2))
        .collect()(0)
      val pairs = Multimodal.dhashPairs(media, 4)
      val np = pairs.count()
      val copies = pairs
        .filter(col("id_b") - col("id_a") === 10000000L).count()
      println(s"SCRATCH $sf media=$n maxBucket=${mx.get(0)} " +
        s"candUpper=${mx.get(1)} pairs_h4=$np copyPairs=$copies")
    }
    spark.stop()
  }
}
