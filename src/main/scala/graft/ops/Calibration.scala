package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.Fixtures
import graft.model.Layout

/**
 * Radiometric calibration (reference CalibrationOp.java:43-191 dispatching to
 * Sentinel1Calibrator.java:327-462): per pixel, bracket the calibration vectors by
 * azimuth line (CalibrationInfo.getCalibrationVectorIndex, :586-593), bracket the LUT
 * pixel knots on the first vector's grid (getPixelIndex, :464-477), bilinear-interpolate
 * the LUT A (:412-417, one muX shared by both vector rows), and apply
 * calibrationFactor = 1/A^2 (:419) to dn^2 = i^2 + q^2 (REAL/IMAGINARY branch :433-440).
 *
 * Spark shape: the LUT dimension table collapses to one sorted ARRAY<STRUCT> row per
 * (scene, subswath, pol), broadcast-joined to tiles; bracketing + interpolation are staged
 * array expressions over each tile buffer (batched, UDF-free, codegen'd). No explode.
 */
object Calibration {

  private val ND = Raster.ND

  /** One row per (scene, subswath, pol): vectors sorted by line. */
  def lutTable(spark: SparkSession, sfDir: String, lutCol: String): DataFrame =
    Fixtures.table(spark, sfDir, "cal_vectors")
      .groupBy("scene_id", "subswath", "pol")
      .agg(array_sort(collect_list(struct(col("line"), col("pixels"), col(lutCol).as("lut"))))
        .as("vecs"))

  /** Tile df + broadcast LUT -> per-pixel interpolated LUT array column "lut_a". */
  def withLutA(tiles: DataFrame, lut: DataFrame): DataFrame = {
    val gline = s"((burst_idx - 1) * ${Layout.LinesPerBurst} + tile_y * ${Layout.TileH} + k div ${Layout.TileW})"
    val gx = s"(tile_x * ${Layout.TileW} + k % ${Layout.TileW})"
    tiles.join(broadcast(lut), Seq("scene_id", "subswath", "pol"))
      // stage 1: pixel coords + bracketing vector index (linear scan over <=10 vectors,
      // the reference's interval lookup)
      .withColumn("c1", expr(
        s"""transform(sequence(0, ${Layout.TileW * Layout.TileH - 1}), k -> struct(
           |  $gline AS gl, $gx AS gx,
           |  greatest(1, least(size(vecs) - 1, size(filter(vecs, e -> e.line <= $gline)))) AS vi))""".stripMargin))
      // stage 2: the two bracketing vectors + pixel-knot index on v0's grid
      .withColumn("c2", expr(
        """transform(c1, t -> struct(
          |  t.gl, t.gx,
          |  element_at(vecs, t.vi) AS v0, element_at(vecs, t.vi + 1) AS v1,
          |  greatest(1, least(size(element_at(vecs, t.vi).pixels) - 1,
          |    size(filter(element_at(vecs, t.vi).pixels, p -> p <= t.gx)))) AS pi))""".stripMargin))
      // stage 3: interpolation weights + the four LUT corners
      .withColumn("c3", expr(
        """transform(c2, t -> struct(
          |  (CAST(t.gl AS DOUBLE) - t.v0.line) / (t.v1.line - t.v0.line) AS muY,
          |  (CAST(t.gx AS DOUBLE) - element_at(t.v0.pixels, t.pi))
          |    / (element_at(t.v0.pixels, t.pi + 1) - element_at(t.v0.pixels, t.pi)) AS muX,
          |  element_at(t.v0.lut, t.pi) AS l00, element_at(t.v0.lut, t.pi + 1) AS l01,
          |  element_at(t.v1.lut, t.pi) AS l10, element_at(t.v1.lut, t.pi + 1) AS l11))""".stripMargin))
      // stage 4: bilinear (Sentinel1Calibrator.java:416-417)
      .withColumn("lut_a", expr(
        """transform(c3, t ->
          |  (1D - t.muY) * ((1D - t.muX) * t.l00 + t.muX * t.l01)
          |  + t.muY * ((1D - t.muX) * t.l10 + t.muX * t.l11))""".stripMargin))
      .drop("c1", "c2", "c3", "vecs")
  }

  /** sigma0 = dn^2 / A^2 per pixel; per-tile rollup scaled by 1e6 for stable rounding. */
  def sigma0Query(spark: SparkSession, sfDir: String): DataFrame = {
    val tiles = Raster.intensityTiles(spark, sfDir)
    val lut = lutTable(spark, sfDir, "sigma_nought")
    val out = withLutA(tiles, lut)
      .withColumn("out", expr(s"zip_with(v, lut_a, (dn2, a) -> if(dn2 = $ND, $ND, dn2 / (a * a)))"))
    Raster.rollup(out, scale = 1e6)
  }

  /** Thermal-noise removal (reference Sentinel1RemoveThermalNoiseOp.java:54): subtract the
   * interpolated noise LUT from dn^2, clamp at 0 — same broadcast-LUT shape. */
  def thermalNoiseQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val tiles = Raster.intensityTiles(spark, sfDir)
    val lut = Fixtures.table(spark, sfDir, "noise_vectors")
      .groupBy("scene_id", "subswath", "pol")
      .agg(array_sort(collect_list(struct(col("line"), col("pixels"), col("noise_lut").as("lut"))))
        .as("vecs"))
    val out = withLutA(tiles, lut)
      .withColumn("out", expr(s"zip_with(v, lut_a, (dn2, nz) -> if(dn2 = $ND, $ND, greatest(0D, dn2 - nz)))"))
    Raster.rollup(out, scale = 1.0)
  }
}
