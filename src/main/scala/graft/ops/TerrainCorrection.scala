package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.gen.Fixtures
import graft.model.Layout

/**
 * Range-Doppler Terrain Correction (reference RangeDopplerGeocodingOp.java:923-1177 +
 * SARGeocoding.java): for each target map-grid cell — (1) DEM height lookup,
 * (2) zero-Doppler time from the orbit (linear state-vector model; the reference's
 * binary search over sensor positions, SARGeocoding.java:64-107, collapses to one
 * solve for a constant-velocity ephemeris), (3) slant range -> range sample via the
 * linear SRGR (SARGeocoding.java:351-359), (4) azimuth line from zero-Doppler time
 * with burst ownership (the deburst midTime rule), (5) gather the source pixel.
 *
 * Spark shape: the map grid is generated (no input scan), DEM + orbit + burst tables
 * broadcast; the only shuffle is the final *gather join* keyed by tile id against the
 * tile table — range-partitionable, AQE-skew-splittable, exactly the north rule's
 * geometry-keyed redistribution.
 */
object TerrainCorrection {

  val CellDeg = 0.02 // target grid step
  val GridNx = 160 // cells in lon
  val GridNy = 100 // cells in lat
  val XMetersPerDeg = 100000.0 // local frame scale, range direction
  val YMetersPerDeg = 3800.0 // azimuth scale chosen so the scene lat extent maps onto
  // the ~1s burst-train time span (synthetic frame; documented in FIXTURES.md terms)
  val DR = 520.0 // slant-range sample spacing (m)
  val DemStep = 0.05

  /** target grid with DEM height and scene/orbit constants joined (all broadcastable). */
  def targetGrid(spark: SparkSession, sfDir: String): DataFrame = {
    val scenes = Fixtures.table(spark, sfDir, "scenes")
      .select("scene_id", "first_line_time", "azimuth_time_interval", "lon0", "lat0")
    val orbit0 = Fixtures.table(spark, sfDir, "orbit")
      .withColumn("rn", row_number().over(Window.partitionBy("scene_id").orderBy("t_sec")))
      .where(col("rn") === 1)
      .select(col("scene_id"), col("t_sec").as("orb_t"), col("x").as("orb_x"),
        col("y").as("orb_y"), col("z").as("orb_z"), col("vy").as("orb_vy"))
    val dem = Fixtures.table(spark, sfDir, "dem")
      .select("scene_id", "lat_idx", "lon_idx", "height")
    scenes.join(orbit0, Seq("scene_id"))
      .withColumn("ci", explode(sequence(lit(0), lit(GridNx - 1))))
      .withColumn("cj", explode(sequence(lit(0), lit(GridNy - 1))))
      .withColumn("lon", col("lon0") + (col("ci") + 0.5) * CellDeg)
      .withColumn("lat", col("lat0") + (col("cj") + 0.5) * CellDeg)
      .withColumn("lat_idx", expr(s"CAST(round((lat - lat0) / $DemStep, 0) AS INT)"))
      .withColumn("lon_idx", expr(s"CAST(round((lon - lon0) / $DemStep, 0) AS INT)"))
      .join(broadcast(dem), Seq("scene_id", "lat_idx", "lon_idx"))
  }

  /** target cells resolved to (subswath, burst, tile, pixel) source keys. */
  def resolvedTargets(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("scene_id", "subswath").orderBy("burst_idx")
    val bursts = Fixtures.table(spark, sfDir, "bursts")
      .select("scene_id", "subswath", "burst_idx", "burst_first_line_time", "burst_last_line_time")
      .withColumn("own_from",
        when(lag("burst_idx", 1).over(w).isNull, lit(Double.NegativeInfinity))
          .otherwise((lag("burst_last_line_time", 1).over(w) + col("burst_first_line_time")) / 2))
      .withColumn("own_to",
        when(lead("burst_idx", 1).over(w).isNull, lit(Double.PositiveInfinity))
          .otherwise((col("burst_last_line_time") + lead("burst_first_line_time", 1).over(w)) / 2))

    targetGrid(spark, sfDir)
      // local tangent coords (m); zero-Doppler solve on the linear ephemeris
      .withColumn("tx_m", (col("lon") - col("lon0")) * XMetersPerDeg)
      .withColumn("ty_m", (col("lat") - col("lat0")) * YMetersPerDeg)
      .withColumn("t_zd", col("orb_t") + (col("ty_m") - col("orb_y")) / col("orb_vy"))
      .withColumn("slant", expr(
        "sqrt((orb_x - tx_m) * (orb_x - tx_m) + (orb_z - height) * (orb_z - height))"))
      .withColumn("r0", expr("sqrt(orb_x * orb_x + orb_z * orb_z)"))
      .withColumn("s_idx", expr(s"CAST(floor((slant - r0) / $DR) AS INT)"))
      .where(col("s_idx") >= 0 && col("s_idx") < 3 * Layout.SamplesPerBurst)
      .withColumn("subswath", concat(lit("IW"), expr(s"s_idx div ${Layout.SamplesPerBurst} + 1")))
      .withColumn("x_in_sw", expr(s"CAST(s_idx % ${Layout.SamplesPerBurst} AS INT)"))
      .join(broadcast(bursts), Seq("scene_id", "subswath"))
      .where(col("t_zd") > col("own_from") && col("t_zd") <= col("own_to") &&
        col("t_zd") >= col("burst_first_line_time") - col("azimuth_time_interval") / 2 &&
        col("t_zd") <= col("burst_last_line_time") + col("azimuth_time_interval") / 2)
      .withColumn("local_line", expr(
        "CAST(round((t_zd - burst_first_line_time) / azimuth_time_interval, 0) AS INT)"))
      .where(col("local_line") >= 0 && col("local_line") < Layout.LinesPerBurst)
      .withColumn("tile_y", expr(s"local_line div ${Layout.TileH}"))
      .withColumn("tile_x", expr(s"x_in_sw div ${Layout.TileW}"))
      .withColumn("px", expr(s"CAST((local_line % ${Layout.TileH}) * ${Layout.TileW} + x_in_sw % ${Layout.TileW} AS INT)"))
  }

  /** The gather join: resolved targets x tile table (VV intensity), nearest neighbor. */
  def query(spark: SparkSession, sfDir: String): DataFrame = {
    val tiles = Raster.intensityTiles(spark, sfDir)
      .where(col("pol") === "VV")
      .select(col("scene_id"), col("subswath"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("v"))
    resolvedTargets(spark, sfDir)
      .join(tiles, Seq("scene_id", "subswath", "burst_idx", "tile_x", "tile_y"))
      .select(col("scene_id"), col("ci"), col("cj"), col("subswath"), col("burst_idx"),
        col("local_line"), col("x_in_sw"),
        expr("round(if(element_at(v, px + 1) = -9999.0D, -9999.0D, element_at(v, px + 1)), 6)").as("value"))
      .orderBy("scene_id", "ci", "cj")
  }
}
