package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming variants of the ingestion + trip semantics
  * (SURVEY.md §2.9). The reference's "streaming" is scheduled batch;
  * these are the true streaming formulations, with the batch pipeline
  * remaining the source of truth (§7 step 8).
  *
  * All aggregations use event-time watermarks so state is bounded:
  * session/tumbling state for keys older than the watermark is
  * evicted — the property that keeps a 100 TB/day stream's state at
  * O(active keys), not O(history).
  */
object Streaming {

  /** File-source stream with enforced schema (the streaming twin of
    * the batch ingest readers; Trigger.AvailableNow makes it the
    * incremental-batch runner the reference's daily Lambda is). */
  def fileStream(spark: SparkSession, path: String,
                 schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Tumbling-window counts/sums per window (streaming twin of q34). */
  def tumblingStats(events: DataFrame, tsCol: String, valueCol: String,
                    window: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("value_total"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("value_total"))

  /** Session windows per key with an inactivity gap — the streaming
    * formulation of trip/session derivation.
    *
    * Boundary semantics caveat: `session_window` windows are
    * half-open, so an event exactly `gap` after its predecessor
    * starts a NEW session (strict <), while the batch
    * Sessionize.byGap keeps it (inclusive <=, matching the
    * reference's inclusive BETWEEN at `trips_lambda.py:128`). The two
    * agree on every gap != exactly `gap`; pass byGap `gap - 1` when
    * exact parity with session_window is required. */
  def sessionStats(events: DataFrame, tsCol: String, keyCol: String,
                   gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming exact dedup with bounded state: duplicates of `keys`
    * are dropped as long as they arrive within the watermark delay of
    * each other; key state older than the watermark is evicted. The
    * streaming twin of Dedup.exact for at-least-once sources (the
    * reference's re-ingested snapshots, PK `(bike_id, timestamp)` at
    * `bike_lambda.py:46`). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           keys: Seq[String], watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Drain a (bounded) stream into an in-memory table and return its
    * content — the synchronous harness for tests and AvailableNow
    * incremental runs. */
  def runToMemory(stream: DataFrame, name: String,
                  outputMode: String = "append"): DataFrame = {
    val spark = stream.sparkSession
    val q: StreamingQuery = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
