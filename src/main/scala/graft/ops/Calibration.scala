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

  /** Tile df + broadcast LUT -> per-pixel interpolated LUT array column "lut_a".
   * Native codegen'd kernel (graft.exprs.LutInterpExpr -> Kernels.lutInterp): cached
   * binary-search bracketing + bilinear, one static call per tile — the reference's
   * getCalibrationVectorIndex/getPixelIndex interval lookups
   * (Sentinel1Calibrator.java:464-477, 586-593) as a compiled loop. */
  def withLutA(tiles: DataFrame, lut: DataFrame): DataFrame =
    tiles.join(broadcast(lut), Seq("scene_id", "subswath", "pol"))
      .withColumn("lut_a", graft.exprs.KernelExprs.lutInterp(
        col("vecs"), col("burst_idx"), col("tile_x"), col("tile_y"),
        Layout.TileW, Layout.TileH, Layout.LinesPerBurst))
      .drop("vecs")

  /** sigma0 = dn^2 / A^2 per pixel; per-tile rollup scaled by 1e1 (quantum 1e-7: the DuckDB oracle's expression engine contracts multiply-adds, so cross-engine doubles agree only to ~1e-13 relative). */
  def sigma0Query(spark: SparkSession, sfDir: String): DataFrame = {
    val tiles = Raster.intensityTiles(spark, sfDir)
    val lut = lutTable(spark, sfDir, "sigma_nought")
    val out = withLutA(tiles, lut)
      .withColumn("out", expr(s"zip_with(v, lut_a, (dn2, a) -> if(dn2 = $ND, $ND, dn2 / (a * a)))"))
    Raster.rollup(out, scale = 1e1)
  }

  /** beta0 = dn^2 / A_beta^2 — the LUT-selection branch of CalibrationOp
   * (Sentinel1Calibrator.java:479-505: sigma/beta/gamma/dn select the LUT column). */
  def beta0Query(spark: SparkSession, sfDir: String): DataFrame = {
    val out = withLutA(Raster.intensityTiles(spark, sfDir), lutTable(spark, sfDir, "beta_nought"))
      .withColumn("out", expr(s"zip_with(v, lut_a, (dn2, a) -> if(dn2 = $ND, $ND, dn2 / (a * a)))"))
    Raster.rollup(out, scale = 1e1)
  }

  /** gamma0 = dn^2 / A_gamma^2. */
  def gamma0Query(spark: SparkSession, sfDir: String): DataFrame = {
    val out = withLutA(Raster.intensityTiles(spark, sfDir), lutTable(spark, sfDir, "gamma"))
      .withColumn("out", expr(s"zip_with(v, lut_a, (dn2, a) -> if(dn2 = $ND, $ND, dn2 / (a * a)))"))
    Raster.rollup(out, scale = 1e1)
  }

  /** sigma0 in dB (outputImageScaleInDb, Sentinel1Calibrator.java:358-364). */
  def sigma0DbQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val out = withLutA(Raster.intensityTiles(spark, sfDir), lutTable(spark, sfDir, "sigma_nought"))
      .withColumn("out", expr(
        s"zip_with(v, lut_a, (dn2, a) -> if(dn2 = $ND or dn2 <= 0D, $ND, 10D * log10(dn2 / (a * a))))"))
    Raster.rollup(out)
  }

  /** Complex-output calibration (Sentinel1Calibrator.java:450-452): i' = i / A —
   * the phase-preserving branch; the gate rolls up the calibrated real part. */
  def complexCalQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val tiles = Fixtures.table(spark, sfDir, "tiles")
      .withColumn("iq", expr(s"transform(i, x -> floor(x * ${Raster.Dyadic}) / ${Raster.Dyadic})"))
    val out = withLutA(tiles, lutTable(spark, sfDir, "sigma_nought"))
      .withColumn("out", expr(
        s"zip_with(iq, lut_a, (x, a) -> if(x = $ND, $ND, x / a))"))
    Raster.rollup(out)
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
