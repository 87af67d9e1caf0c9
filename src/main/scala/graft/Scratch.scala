package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    if (sys.env.contains("SCRATCH_V2")) {
      val kg = spark.read
        .format("graft.sources.v2.SynthEventsProvider")
        .option("rows", "200000").option("users", "64")
        .option("layout", "mod").option("userparts", "true").load()
        .groupBy("user_id")
        .agg(sum("value_e2").as("sv"), count(lit(1)).as("n"))
      kg.collect()  // force AQE final plan
      println("=== AQE-on executed plan ===")
      println(kg.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
