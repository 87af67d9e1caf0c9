package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-enforced readers and layout-policy writers (S4–S8 in
  * SURVEY.md §2.1, §4 "layout policy").
  *
  * Readers never `inferSchema` — production paths declare their
  * StructType (the reference's create-on-write DDL, relocated to read
  * time). Writers encode the physical-design answer to the
  * reference's B-tree indexes (`trips_lambda.py:81-84`): partition
  * directories give partition pruning (the reference's `trip_start`
  * index), sortWithinPartitions gives parquet min/max row-group
  * pruning on the sort keys (the `bike_id` index).
  */
object Ingest {

  /** CSV with header (S7), explicit schema, PERMISSIVE parse with a
    * rejects channel: malformed lines land in `_corrupt_record`. */
  def readCsv(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val df = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      .cache() // corrupt-record column requires referencing the same scan
    (df.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      df.filter(col("_corrupt_record").isNotNull))
  }

  /** JSON-lines with explicit schema + rejects channel. */
  def readJson(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val df = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .json(path)
      .cache()
    (df.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      df.filter(col("_corrupt_record").isNotNull))
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Layout-policy writer: hash-partition to `files` writer tasks,
    * directory-partition by `partitionCols`, sort rows within each
    * file by `sortCols` so parquet row-group stats prune point/range
    * lookups on those keys. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String], sortCols: Seq[String],
                       files: Int = 0): Unit = {
    val sized = if (files > 0)
      df.repartition(files, partitionCols.map(col): _*) else df
    val sorted = if (sortCols.nonEmpty)
      sized.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    else sized
    graft.core.PlanStats.markBatchSinkIo()
    val w = sorted.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Bucketed managed table: co-locates join/agg keys at write time
    * so later equi-joins between tables bucketed on the same key need
    * NO exchange (asserted in BucketingSpec). This is the Spark
    * answer to "pre-partition the big fact tables once, join cheap
    * forever" — at 100 TB the one-time bucketed write amortizes over
    * every downstream join. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil)
      : Unit = {
    graft.core.PlanStats.markBatchSinkIo()
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** CSV sink with header (S7, notebook cells 0-1). */
  def writeCsv(df: DataFrame, path: String): Unit = {
    graft.core.PlanStats.markBatchSinkIo()
    df.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** JSON-lines sink — the interchange twin of [[readJson]]: one
    * object per line, schema re-imposed by the reader (JSONL carries
    * no schema; inferring one at read time would cost a full extra
    * pass over the data at scale). */
  def writeJson(df: DataFrame, path: String): Unit = {
    graft.core.PlanStats.markBatchSinkIo()
    df.write.mode("overwrite").json(path)
  }

  /** ORC sink/scan pair — the columnar interchange format next to
    * parquet (vectorized reader, predicate pushdown and column
    * pruning work the same way; schema passed explicitly so the
    * reader never pays a footer-inference pass across a large
    * directory). Binary round-trip: doubles and longs come back
    * bit-identical. */
  def writeOrc(df: DataFrame, path: String): Unit = {
    graft.core.PlanStats.markBatchSinkIo()
    df.write.mode("overwrite").orc(path)
  }

  def readOrc(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Small-file compaction — the table-maintenance twin of the
    * incremental merge: every micro-batch append ([[MergeByKey]]
    * scope-rewrites, streaming sinks) leaves small files behind, and
    * at 100 TB the scan cost of a table is dominated by file count
    * long before byte count. Rewrites the directory into
    * ceil(rows / targetRowsPerFile) evenly-sized files via the same
    * rename-aside swap as `MergeByKey.mergeWrite` (the full table
    * exists at every instant; a crashed compaction is recovered on
    * the next run). The driver-side count is a maintenance-job cost,
    * not a query cost — in production you'd read the row count from
    * parquet footers. Single-writer, like the reference's Lambda. */
  def compact(spark: SparkSession, path: String,
              targetRowsPerFile: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val dest = new Path(path)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + "__compact_tmp")
    val old = new Path(path + "__compact_old")
    if (!fs.exists(dest) && fs.exists(old)) {
      if (!fs.rename(old, dest))
        sys.error(s"compact: failed to recover $old -> $dest")
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val df = spark.read.parquet(path)
    val n = df.count()
    val files =
      math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    graft.core.PlanStats.markBatchSinkIo()
    df.repartition(files).write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(dest, old))
      sys.error(s"compact: failed to retire $dest")
    if (!fs.rename(tmp, dest))
      sys.error(s"compact: failed to promote $tmp -> $dest")
    fs.delete(old, true)
  }
}
