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

  /**
   * q_asof_join: attribution as-of join — each purchase matched to the user's
   * most recent click at-or-before it (the temporal join Spark has no native
   * operator for; the reference engine's products/orbits join the same way by
   * time). Implemented scale-safely as union-tag + one per-user window pass
   * with `last(_, ignoreNulls)`: NO range-join row blowup, one user_id shuffle,
   * O(events) at any scale. At equal timestamps the click sorts before the
   * purchase (inclusive >= semantics, matching DuckDB's native ASOF JOIN in
   * the oracle — a genuinely independent physical derivation); ties between
   * distinct clicks at one (user, ts) would be broken by event_id here but are
   * engine-arbitrary in the oracle's ASOF — the fixture has none (asserted in
   * the spec).
   */
  /** The 1-hour attribution window, in microseconds. */
  val AttributionUs: Long = 3600L * 1000000

  /** Shared range-join pair transform: every (purchase, click) of one user with
   * click_ts in (purchase_ts - 1h, purchase_ts]; left outer so unattributed
   * purchases survive with NULL click columns. An equi-join on user_id with the
   * time band as a residual filter — per-user fan-out is bounded by the window,
   * so the shuffled volume is O(events), not a range-join blowup. */
  def rangeJoinPairs(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"), col("user_id"),
      col("ts_us").as("click_ts_us"))
    val p = purchases.select(col("event_id").as("purchase_id"), col("user_id"),
      col("ts_us").as("purchase_ts_us"))
    p.join(c,
      p("user_id") === c("user_id") &&
        col("click_ts_us") <= col("purchase_ts_us") &&
        col("click_ts_us") > col("purchase_ts_us") - AttributionUs,
      "left_outer")
      .select(col("purchase_id"), p("user_id"), col("purchase_ts_us"),
        col("click_id"), col("click_ts_us"))
  }

  private def typedEvents(spark: SparkSession, dir: String, tpe: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .where(col("event_type") === tpe)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"))

  /**
   * q_range_join: the interval/range join the as-of join's top-1 semantics sit
   * on — ALL clicks within the 1-hour attribution window per purchase, rolled
   * up per purchase (n_clicks_1h, min/sum gap). The DuckDB oracle states it as
   * a plain inequality join. [[streamingRangeJoin]] runs the identical pair
   * semantics as a watermarked stream-stream LEFT OUTER join; the spec pins
   * stream pairs == batch pairs.
   */
  def rangeJoinQuery(spark: SparkSession, dir: String): DataFrame =
    rangeJoinPairs(typedEvents(spark, dir, "click"), typedEvents(spark, dir, "purchase"))
      .groupBy("purchase_id", "user_id", "purchase_ts_us")
      .agg(count(col("click_id")).as("n_clicks_1h"),
        min(expr("purchase_ts_us - click_ts_us")).as("min_gap_us"),
        sum(expr("purchase_ts_us - click_ts_us")).as("sum_gap_us"))

  /**
   * Streaming twin: a watermarked stream-stream LEFT OUTER join — click state
   * is evictable once the watermark passes its ts + 1h (the join's time bound
   * makes state bounded at any scale); unmatched purchases emit after the
   * watermark closes their window. Same pair schema as [[rangeJoinPairs]].
   */
  def streamingRangeJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withColumn("click_ts", col("ts").cast("timestamp"))
      .withWatermark("click_ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
        col("click_ts"), expr("unix_micros(click_ts)").as("click_ts_us"))
    val p = purchases
      .withColumn("purchase_ts", col("ts").cast("timestamp"))
      .withWatermark("purchase_ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("purchase_ts"), expr("unix_micros(purchase_ts)").as("purchase_ts_us"))
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") > col("purchase_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts_us"),
        col("click_id"), col("click_ts_us"))
  }

  def asofJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$dir/events.parquet")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"),
        expr("CAST(event_type = 'purchase' AS INT)").as("is_probe"))
    val w = Window.partitionBy("user_id")
      .orderBy(asc("ts_us"), asc("is_probe"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e
      .withColumn("click_id",
        last(when(col("is_probe") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when(col("is_probe") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .where(col("is_probe") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("purchase_ts_us"), col("click_id"),
        col("click_ts").as("click_ts_us"),
        expr("ts_us - click_ts").as("gap_us"))
  }
}
