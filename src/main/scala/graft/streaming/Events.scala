package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Event-time windowed aggregation, shared between batch and Structured Streaming.
 * The reference engine is batch-only (SURVEY.md §2.10); this is the engine's
 * incremental-ingestion analog: the same `windowed` transform runs over a static
 * DataFrame (the oracle-checked query) and over readStream with a watermark
 * (StreamingSpec drives it through a memory sink).
 */
object Events {

  /** 5-minute tumbling windows per event_type. */
  def windowed(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("n_users"), col("sum_value"))

  def batchQuery(spark: SparkSession, dir: String): DataFrame =
    windowed(spark.read.parquet(s"$dir/events.parquet"))

  /** Streaming exact dedup for at-least-once ingestion: re-deliveries of an
   * event_id within the watermark window are dropped; dedup state is evicted
   * once the watermark passes, so state stays bounded at any scale. Batch twin
   * = dropDuplicates("event_id") (PipelineSpec asserts equality). */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming variant with watermark (for tests: memory sink + processAllAvailable).
   * `eventsDir` must be a DIRECTORY of parquet files (file-source contract). */
  def streamingWindowed(spark: SparkSession, eventsDir: String): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    stream
      // parquet ts is TIMESTAMP_NTZ; watermarks need TIMESTAMP (session tz is UTC)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
  }
}
