package graft.geom

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cells.CellIndex
import graft.gen.Fixtures

/**
 * Geofencing — the spatial join on an event stream: which events fall inside
 * which AOI polygons, batch and streaming with identical semantics.
 *
 * The synthetic events table carries no geolocation, so the query PLANTS a
 * deterministic position per event from its id hash (the same device as the
 * PII-scrub gate's planted emails): md5-60 of 'g:'||event_id drives lon/lat
 * uniformly over the scene region, identically derivable in DuckDB, the JVM,
 * and Spark SQL (identical-IEEE arithmetic, same operation order).
 *
 * Join shape — the scale story: the AOI side (polygons + their cell covers) is
 * tiny and BROADCAST; the event side computes its level-11 cell map-side and
 * probes the broadcast cover by equi-join with the exact bbox test as a
 * residual — the event stream is never shuffled for the join, so the same
 * plan runs unchanged on an unbounded stream (stream-static broadcast join,
 * stateless). At 10^12 events the only wide exchange is the final per-AOI
 * rollup on the (aoi, type) key space.
 *
 * Reference frame: AOI selection is TOPSARSplitOp.java:261-306's two-phase
 * test; this is the same two phases with the probe side unbounded.
 */
object Geofence {

  /** Deterministic planted position: lon in [-30,-20), lat in [10,12). */
  def positioned(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat('g:', CAST(event_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("lon", lit(-30.0) + (col("h") % 1000000L).cast("double") / 1e6 * 10.0)
      .withColumn("lat", lit(10.0) + expr("(h div 1000000) % 1000000").cast("double") / 1e6 * 2.0)
      .drop("h")

  /** Broadcastable AOI frame: one row per (aoi, cover cell). */
  def aoiCells(spark: SparkSession, sfDir: String): DataFrame =
    Fixtures.table(spark, sfDir, "aoi").select(
      col("aoi_id"), col("lon_min"), col("lat_min"), col("lon_max"), col("lat_max"),
      explode(CellIndex.coverCol(
        col("lon_min"), col("lat_min"), col("lon_max"), col("lat_max"))).as("cell"))

  /** The stateless enrich+join core, shared verbatim by batch and streaming:
   * cell probe against the broadcast AOI cover, exact bbox residual. */
  def matched(events: DataFrame, aoi: DataFrame): DataFrame =
    events
      .withColumn("cell", CellIndex.cellCol(col("lon"), col("lat")))
      .join(broadcast(aoi), Seq("cell"))
      .where(col("lon").between(col("lon_min"), col("lon_max")) &&
             col("lat").between(col("lat_min"), col("lat_max")))

  /** Batch gate: per-(aoi, event_type) containment rollup. */
  def geofenceQuery(spark: SparkSession, sfDir: String): DataFrame =
    matched(positioned(spark, sfDir), aoiCells(spark, sfDir))
      .groupBy(col("aoi_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("value_c"))

  /** Streaming leg: the identical matched() core on an unbounded source —
   * stream-static broadcast join, stateless, emits (event_id, aoi_id) alerts.
   * The spec pins stream alerts == batch alerts on the same rows. */
  def streamingGeofence(events: DataFrame, aoi: DataFrame): DataFrame =
    matched(events, aoi).select(col("event_id"), col("aoi_id"))
}
