package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Grid-resampling operators built on one nearest-neighbor polynomial warp-gather
 * kernel over haloed tiles:
 *  - ALOS-Deskewing (ALOSDeskewingOp.java computeTileStack, MapReady branch):
 *    each range column x shifts in azimuth by round(fracShift * x); out(x, y) =
 *    src(x, y - shift). fracShift is the Doppler-derived per-scene constant.
 *  - CrossResampling (jlinda CrossResamplingOp): target grid resampled from the
 *    source at a degree-1 polynomial position, nearest-neighbor kernel.
 *
 * Both gather strictly within the tile halo (margin bounds the admissible warp),
 * so the plan is the halo exchange plus a per-tile compiled pass — no shuffle of
 * pixel rows.
 */
object Resampling {

  val Margin = 4

  /** Doppler-derived azimuth fractional shift per range sample (deskew). */
  val DeskewFrac = 0.013

  /** Degree-1 cross-resampling polynomial (dx, dy) coefficient rows. */
  val CrossDx: Seq[Double] = Seq(1.2, 0.01, -0.004)
  val CrossDy: Seq[Double] = Seq(-0.8, 0.006, 0.012)

  private def gatherQuery(spark: SparkSession, sfDir: String,
      coeffs: Seq[Double]): DataFrame = {
    val haloed = Speckle.haloTiles(spark, sfDir, Margin)
    Raster.rollup(haloed.withColumn("out",
      graft.exprs.KernelExprs.warpGather(col("halo"), col("tile_x"), col("tile_y"),
        Raster.W, Raster.H, Margin, coeffs)))
  }

  /** q_deskew: azimuth shift round(frac * gx) per column. */
  def deskewQuery(spark: SparkSession, sfDir: String): DataFrame =
    gatherQuery(spark, sfDir, Seq(0.0, 0.0, 0.0, 0.0, DeskewFrac, 0.0))

  /** q_cross_resampling: degree-1 polynomial source offset in both axes. */
  def crossResamplingQuery(spark: SparkSession, sfDir: String): DataFrame =
    gatherQuery(spark, sfDir,
      Seq(CrossDx(0), CrossDx(1), CrossDx(2), CrossDy(0), CrossDy(1), CrossDy(2)))

  /** q_bisinc_resampling: 5-point truncated-sinc (BiSinc) range resample at a
   * per-burst constant fractional shift — the reference's DEFAULT resampling for
   * Back-Geocoding (BackGeocodingOp.java:91-94 BISINC_5_POINT). The shift is a
   * deterministic function of burst_idx that both engines restate; weights are
   * computed once per tile and applied in one compiled pass over the halo. */
  def bisincResamplingQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val haloed = Speckle.haloTiles(spark, sfDir, Margin)
      .withColumn("d", expr(
        "((burst_idx * 13) % 17) / CAST(17.0 AS DOUBLE) - CAST(0.5 AS DOUBLE)"))
    Raster.rollup(haloed.withColumn("out",
      graft.exprs.KernelExprs.bisincRange(col("halo"), col("d"),
        Raster.W, Raster.H, Margin)))
  }
}
