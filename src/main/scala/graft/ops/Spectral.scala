package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.exprs.KernelExprs
import graft.gen.Fixtures
import graft.model.Layout

/**
 * FFT-domain operators (reference OversamplingOp.java:46, BandPassFilterOp /
 * RangeFilterOp / AzimuthFilterOp, GoldsteinFilterOp.java:48). Each kernel is a
 * native expression running real FFTs (commons-math3) per tile row — one static
 * call per tile inside whole-stage codegen; the DuckDB oracles restate the SAME
 * transforms in closed form (periodic-sinc interpolation kernel, Dirichlet
 * convolution, direct 2-D DFT), so the FFT path is verified against an
 * independent derivation.
 */
object Spectral {

  val BandKc = 6 // band-pass cutoff bin
  val GoldsteinAlpha = 0.5

  /** smooth (no-data-free) single-band tiles for the 1-D spectral ops. */
  private def smooth(spark: SparkSession, sfDir: String): DataFrame =
    Fixtures.table(spark, sfDir, "tiles_smooth")
      .select("scene_id", "subswath", "pol", "burst_idx", "tile_x", "tile_y", "i")

  /** Range oversampling x2: per row FFT -> zero-pad (split Nyquist) -> IFFT. */
  def oversampleQuery(spark: SparkSession, sfDir: String): DataFrame =
    Raster.rollup(smooth(spark, sfDir)
      .withColumn("out", KernelExprs.oversample(col("i"), Layout.TileW, Layout.TileH))
      .drop("i"))

  /** Range band-pass: zero DFT bins |k| > kc per row. */
  def bandpassRangeQuery(spark: SparkSession, sfDir: String): DataFrame =
    Raster.rollup(smooth(spark, sfDir)
      .withColumn("out", KernelExprs.bandpass(col("i"), Layout.TileW, Layout.TileH, BandKc, 0))
      .drop("i"))

  /** Azimuth band-pass: same along columns. */
  def bandpassAzimuthQuery(spark: SparkSession, sfDir: String): DataFrame =
    Raster.rollup(smooth(spark, sfDir)
      .withColumn("out", KernelExprs.bandpass(col("i"), Layout.TileW, Layout.TileH, BandKc, 1))
      .drop("i"))

  /** Goldstein phase filtering of the (tiles, tiles_sec) interferogram, bursts 1-2
   * (the oracle's direct 2-D DFT bounds the verification subset). */
  def goldsteinQuery(spark: SparkSession, sfDir: String): DataFrame =
    Raster.rollup(InSAR.crossTiles(spark, sfDir)
      .where(col("pol") === "VV" && col("burst_idx") <= 2)
      .withColumn("out", KernelExprs.goldstein(col("cre"), col("cim"),
        Layout.TileW, Layout.TileH, GoldsteinAlpha))
      .drop("cre", "cim", "p1", "p2"))
}
