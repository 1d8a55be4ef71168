package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.Fixtures
import graft.model.Layout

/**
 * Utility / detection / tracking operators:
 *  - Data-Analysis (reference DataAnalysisOp.java:56): per-band statistics
 *    (min/max/mean/stddev over valid pixels) — two-moment partials per tile, one
 *    final aggregation (the map-side-combine shape).
 *  - Undersample (UndersamplingOp.java:88): 2x2 decimation per tile.
 *  - Flood-Detection (FloodDetectionOp.java:40): 3x3 boxcar mean below threshold.
 *  - Offset-Tracking (OffsetTrackingOp.java:66-134): xcorr offsets scaled to
 *    velocities by pixel spacing / time baseline, max-velocity validity filter.
 *  - GCP grid (CrossCorrelationOp.addGCPGrid:285-314): the exact pin lattice —
 *    n = sqrt(numPins/ratio), m = ratio*n, pins at (int)(spacing/2 + k*spacing).
 */
object Utility {

  private val ND = Raster.ND

  def dataAnalysisQuery(spark: SparkSession, sfDir: String): DataFrame =
    Raster.intensityTiles(spark, sfDir)
      .withColumn("valid", expr(s"filter(v, x -> not(isnan(x) or x = $ND))"))
      .groupBy("scene_id", "subswath", "pol")
      .agg(
        sum(expr("CAST(size(valid) AS BIGINT)")).as("n_px"),
        sum(expr("aggregate(valid, 0D, (a, x) -> a + x)")).as("s1"),
        sum(expr("aggregate(valid, 0D, (a, x) -> a + x * x)")).as("s2"),
        min(expr("array_min(valid)")).as("mn"),
        max(expr("array_max(valid)")).as("mx"))
      .select(col("scene_id"), col("subswath"), col("pol"), col("n_px"),
        round(col("s1") / col("n_px"), 4).as("mean_v"),
        round(sqrt((col("s2") - col("n_px") * (col("s1") / col("n_px")) * (col("s1") / col("n_px")))
          / (col("n_px") - 1)), 4).as("stddev_v"),
        round(col("mn"), 4).as("min_v"), round(col("mx"), 4).as("max_v"))
      .orderBy("scene_id", "subswath", "pol")

  def undersampleQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val w2 = Layout.TileW / 2
    Raster.rollup(Raster.intensityTiles(spark, sfDir)
      .withColumn("out", expr(
        s"""transform(sequence(0, ${w2 * Layout.TileH / 2 - 1}), j ->
           |  element_at(v, CAST((j div $w2) * 2 * ${Layout.TileW} + (j % $w2) * 2 + 1 AS INT)))""".stripMargin)))
  }

  val FloodThreshold = 80.0

  def floodDetectionQuery(spark: SparkSession, sfDir: String): DataFrame =
    Speckle.statsTiles(spark, sfDir)
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"),
        expr(s"CAST(size(filter(stats, s -> s.n > 0 and s.m < $FloodThreshold)) AS BIGINT)")
          .as("n_flooded"))
      .orderBy("scene_id", "subswath", "pol", "burst_idx", "tile_y", "tile_x")

  val RangeSpacingM = 10.0 // m/px
  val TimeBaselineDays = 6.0

  def offsetTrackingQuery(spark: SparkSession, sfDir: String): DataFrame =
    Coregistration.xcorrOffsetsQuery(spark, sfDir)
      .select(col("gcp_id"), col("scene_id"),
        round(col("est_dx") * RangeSpacingM / TimeBaselineDays, 6).as("vx_m_day"),
        round(col("est_dy") * RangeSpacingM / TimeBaselineDays, 6).as("vy_m_day"),
        round(sqrt((col("est_dx") * RangeSpacingM / TimeBaselineDays) * (col("est_dx") * RangeSpacingM / TimeBaselineDays)
          + (col("est_dy") * RangeSpacingM / TimeBaselineDays) * (col("est_dy") * RangeSpacingM / TimeBaselineDays)), 6).as("v_mag"),
        (abs(col("est_dx") * RangeSpacingM / TimeBaselineDays) <= 5.0 &&
          abs(col("est_dy") * RangeSpacingM / TimeBaselineDays) <= 5.0).as("valid"))
      .orderBy("gcp_id")

  /** The reference pin lattice per (width, height) = subswath raster, numPins = 24. */
  def gcpGridQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Layout.SamplesPerBurst
    val h = Layout.LinesPerBurst * Layout.BurstsPerSubswath
    val numPins = 24
    val ratio = w / h.toDouble
    val n = math.sqrt(numPins / ratio)
    val m = ratio * n
    val spacingX = w / m
    val spacingY = h / n
    Fixtures.table(spark, sfDir, "scenes").select("scene_id")
      .withColumn("subswath", explode(array(Layout.Subswaths.map(lit(_)): _*)))
      .withColumn("iy", explode(sequence(lit(0), lit((h / spacingY).toInt))))
      .withColumn("ix", explode(sequence(lit(0), lit((w / spacingX).toInt))))
      .withColumn("py", lit(spacingY / 2f) + col("iy") * spacingY)
      .withColumn("px", lit(spacingX / 2f) + col("ix") * spacingX)
      .where(col("py") < h && col("px") < w)
      .select(col("scene_id"), col("subswath"),
        expr("CAST(px AS INT)").as("pin_x"), expr("CAST(py AS INT)").as("pin_y"))
      .orderBy("scene_id", "subswath", "pin_y", "pin_x")
  }
}
