package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * Parquet carries its own schema; we deliberately do NOT pass an
  * expected StructType here so that scale factors with wider columns
  * still load. Ingest-boundary readers with enforced schemas live in
  * [[graft.sources]].
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table with its nanosecond `ts` normalized to a
    * second-truncated `ts_s` timestamp (cross-engine stable; see
    * graft.analytics.Exact). The single loader every query module
    * uses — the ns handling must not fork. */
  def eventsSec(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "events")
    e.withColumn("ts_s", graft.analytics.Exact.secFromAny(e, "ts"))
      .drop("ts")
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
