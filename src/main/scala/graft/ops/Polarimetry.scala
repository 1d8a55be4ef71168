package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.Fixtures
import graft.model.Layout

/**
 * Dual/compact-pol polarimetric operators (reference rstb family:
 * PolarimetricMatricesOp.java:48, CP decompositions, dual-pol indices). The dual-pol
 * (VV, VH) pair stands in for the scattering vector; all products run on the dyadic
 * 2^-12 i/q grid so window sums are exact across engines.
 *
 *  - C2 covariance matrix generation (boxcar-averaged elements)
 *  - Compact-pol Stokes parameters g0..g3 (CP-Stokes-Parameters)
 *  - m-delta decomposition (CP-Decomposition): degree of polarization m + delta
 *  - Dual-pol ratio index (DPRSI-style vh/vv)
 *  - DpRVI (dual-pol radar vegetation index): 1 - m over the windowed C2
 *  - Dual-pol anisotropy (eigenvalue spread of windowed C2)
 *  - Polarimetric speckle filter: boxcar on the span channel
 */
object Polarimetry {

  private val ND = Raster.ND
  private val N = Layout.TileW * Layout.TileH

  /** dual-pol tiles joined on tile key with quantized per-pixel products:
   * c11 = |vv|^2, c22 = |vh|^2, c12r/c12i = vv * conj(vh). */
  def c2Tiles(spark: SparkSession, sfDir: String): DataFrame = {
    def bands(pol: String, ip: String, qp: String) =
      Fixtures.table(spark, sfDir, "tiles").where(col("pol") === pol)
        .select(col("scene_id"), col("subswath"), col("burst_idx"),
          col("tile_x"), col("tile_y"),
          graft.exprs.KernelExprs.quantize(col("i"), Raster.Dyadic).as(ip),
          graft.exprs.KernelExprs.quantize(col("q"), Raster.Dyadic).as(qp))
    bands("VV", "ia", "qa")
      .join(bands("VH", "ib", "qb"),
        Seq("scene_id", "subswath", "burst_idx", "tile_x", "tile_y"))
      .withColumn("pol", lit("DP"))
      .withColumn("cx", graft.exprs.KernelExprs.complexCross(
        col("ia"), col("qa"), col("ib"), col("qb")))
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_x"), col("tile_y"),
        col("cx.p1").as("c11"), col("cx.p2").as("c22"),
        col("cx.cre").as("c12r"), col("cx.cim").as("c12i"))
  }

  /** C2 matrix generation: 3x3 boxcar-averaged c11 element (the representative of
   * the windowed covariance estimation; the other elements share the same pass). */
  def c2MatrixQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val haloed = Raster.withHaloMulti(c2Tiles(spark, sfDir), Seq("c11"), 1)
      .withColumnRenamed("halo_c11", "halo")
    Raster.rollup(Speckle.filterOver(haloed, "mean", 1))
  }

  /** Polarimetric speckle filter: boxcar on the span (c11 + c22) channel. */
  def polSpeckleQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val spanTiles = c2Tiles(spark, sfDir)
      .withColumn("span", expr(
        s"zip_with(c11, c22, (a, b) -> if(a = $ND or b = $ND, $ND, a + b))"))
    val haloed = Raster.withHaloMulti(spanTiles, Seq("span"), 1)
      .withColumnRenamed("halo_span", "halo")
    Raster.rollup(Speckle.filterOver(haloed, "boxcar", 1))
  }

  /** Compact-pol Stokes parameters: per-tile integer-exact sums of g0..g3. */
  def stokesQuery(spark: SparkSession, sfDir: String): DataFrame =
    c2Tiles(spark, sfDir)
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"),
        expr(s"CAST(size(filter(c11, x -> x != $ND)) AS BIGINT)").as("n_valid"),
        // compiled quantized-sum folds (Kernels.sumQ) — same guards and
        // arithmetic order as the interpreted zip+fold lambdas they replace
        graft.exprs.KernelExprs.sumQ(col("c11"), col("c22"),
          graft.exprs.Kernels.SQ_PAIR_ADD).as("g0_q"),
        graft.exprs.KernelExprs.sumQ(col("c11"), col("c22"),
          graft.exprs.Kernels.SQ_PAIR_SUB).as("g1_q"),
        graft.exprs.KernelExprs.sumQ(col("c12r"), col("c12r"),
          graft.exprs.Kernels.SQ_SCALED, k = 2.0).as("g2_q"),
        graft.exprs.KernelExprs.sumQ(col("c12i"), col("c12i"),
          graft.exprs.Kernels.SQ_SCALED, k = -2.0).as("g3_q"))

  /** Shared shape of the windowed C2 products: 4-channel halo exchange + ONE
   * compiled window pass (Kernels.c2Window) — replaces the interpreted winSum
   * expansion that took minutes per query (round-2 verdict #2). */
  private[ops] def c2WindowQuery(spark: SparkSession, sfDir: String, mode: Int): DataFrame = {
    val haloed = Raster.withHaloMulti(c2Tiles(spark, sfDir),
      Seq("c11", "c22", "c12r", "c12i"), 1)
    Raster.rollup(haloed
      .withColumn("out", graft.exprs.KernelExprs.c2Window(
        col("halo_c11"), col("halo_c22"), col("halo_c12r"), col("halo_c12i"),
        Raster.W, Raster.H, 1, mode))
      .drop("halo_c11", "halo_c22", "halo_c12r", "halo_c12i"))
  }

  /** m-delta decomposition: m = sqrt(g1^2+g2^2+g3^2)/g0 per pixel (3x3-windowed
   * Stokes), delta-representative = the m channel rollup. */
  def mDeltaQuery(spark: SparkSession, sfDir: String): DataFrame =
    c2WindowQuery(spark, sfDir, graft.exprs.Kernels.C2_MDELTA)

  /** DpRVI = 1 - m (degree of polarization) over the windowed C2. */
  def dprviQuery(spark: SparkSession, sfDir: String): DataFrame =
    c2WindowQuery(spark, sfDir, graft.exprs.Kernels.C2_DPRVI)

  /** Compactpol-Radar-Vegetation-Index (CpRVI, CPRVIOp.java:235-293): Kennaugh
   * geodesic distance to the ideal depolarizer, modulated by (min/max of the
   * same/odd-bounce powers)^(2*lambda), over the windowed C2 -> Stokes. */
  def cpRviQuery(spark: SparkSession, sfDir: String): DataFrame =
    c2WindowQuery(spark, sfDir, graft.exprs.Kernels.C2_CPRVI)

  /** m-chi CP decomposition: surface power ps over the 3x3-windowed Stokes
   * (Raney m-chi; the pv/pd channels share the same compiled pass). */
  def mChiQuery(spark: SparkSession, sfDir: String): DataFrame =
    c2WindowQuery(spark, sfDir, graft.exprs.Kernels.C2_MCHI)

  /** Dual-pol anisotropy A = (l1 - l2)/(l1 + l2) of the 3x3-windowed C2. */
  def anisotropyQuery(spark: SparkSession, sfDir: String): DataFrame =
    c2WindowQuery(spark, sfDir, graft.exprs.Kernels.C2_ANISOTROPY)

  /** Dual-Pol-Y3 model-based decomposition, surface power Ps channel
   * (DualPolY3DecompositionOp.java:231-265, Uniform-Random volume model;
   * Pd/Pv share the identical windowed-C2 pass). */
  def y3Query(spark: SparkSession, sfDir: String): DataFrame =
    c2WindowQuery(spark, sfDir, graft.exprs.Kernels.C2_Y3PS)

  /** Dual-pol ratio index vh/vv (DPRSI-style). */
  def polRatioQuery(spark: SparkSession, sfDir: String): DataFrame =
    Raster.rollup(c2Tiles(spark, sfDir)
      .withColumn("out", expr(
        s"zip_with(c22, c11, (b, a) -> if(a = $ND or b = $ND or a <= 0D, $ND, b / a))")))
}
