package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.exprs.KernelExprs
import graft.gen.Fixtures
import graft.model.Layout

/**
 * Quad-pol polarimetric family over the HH/HV/VH/VV `tiles_quad` fixture
 * (reference rstb: PolarimetricMatricesOp.java:48 T3 generation,
 * PolarimetricDecompositionOp.java:47 H-A-alpha, PolarimetricClassificationOp.java:43
 * H-alpha Wishart classification).
 *
 * Spark shape: the 4 pol channels join on the tile key (co-partitioned equi-join of
 * a bounded 4-row group — broadcastable per scene at full scale), then every
 * windowed product runs through ONE compiled kernel call per tile
 * (exprs/Kernels.scala t3Sums / hAlphaTile / wishartTile). The Wishart iteration is
 * a driver loop whose per-round state is 9 cluster centers (90 longs) — a global
 * agg + broadcast per round, never a per-pixel driver collect.
 */
object PolarimetryQuad {

  private val ChannelCols = Seq("i_hh", "q_hh", "i_hv", "q_hv", "i_vh", "q_vh", "i_vv", "q_vv")

  /** 4-pol tiles joined on tile key; i/q snapped to the dyadic grid so T3 products
   * and window sums are exact across engines. */
  def quadTiles(spark: SparkSession, sfDir: String, maxBurst: Int = Layout.BurstsPerSubswath): DataFrame = {
    def band(pol: String) =
      Fixtures.table(spark, sfDir, "tiles_quad")
        .where(col("pol") === pol && col("burst_idx") <= maxBurst)
        .select(col("scene_id"), col("subswath"), col("burst_idx"),
          col("tile_x"), col("tile_y"),
          graft.exprs.KernelExprs.quantize(col("i"), Raster.Dyadic)
            .as(s"i_${pol.toLowerCase}"),
          graft.exprs.KernelExprs.quantize(col("q"), Raster.Dyadic)
            .as(s"q_${pol.toLowerCase}"))
    Seq("HV", "VH", "VV").foldLeft(band("HH")) { (df, p) =>
      df.join(band(p), Seq("scene_id", "subswath", "burst_idx", "tile_x", "tile_y"))
    }.withColumn("pol", lit("QP"))
  }

  /** T3 coherency matrix generation: per-tile integer-exact sums of the 9 matrix
   * channels (t11, t22, t33, t12r/i, t13r/i, t23r/i). */
  def t3Query(spark: SparkSession, sfDir: String): DataFrame = {
    val st = KernelExprs.t3Sums(ChannelCols.map(col))
    quadTiles(spark, sfDir)
      .withColumn("st", st)
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"),
        col("st.n").as("n_valid"),
        col("st.s11").as("t11_q"), col("st.s22").as("t22_q"), col("st.s33").as("t33_q"),
        col("st.s12r").as("t12r_q"), col("st.s12i").as("t12i_q"),
        col("st.s13r").as("t13r_q"), col("st.s13i").as("t13i_q"),
        col("st.s23r").as("t23r_q"), col("st.s23i").as("t23i_q"))
  }

  private def haloedQuad(spark: SparkSession, sfDir: String, maxBurst: Int = Layout.BurstsPerSubswath): DataFrame =
    Raster.withHaloMulti(quadTiles(spark, sfDir, maxBurst), ChannelCols, 1)

  private def haloChannels: Seq[Column] = ChannelCols.map(c => col(s"halo_$c"))

  /** H-A-alpha decomposition of the 3x3-windowed T3: per-tile quantized sums of
   * entropy, anisotropy and mean alpha (deg). */
  def hAlphaQuery(spark: SparkSession, sfDir: String): DataFrame =
    haloedQuad(spark, sfDir)
      .withColumn("st", KernelExprs.hAlpha(haloChannels, Raster.W, Raster.H, 1))
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"),
        col("st.n").as("n_valid"), col("st.h_q").as("h_sum_q"),
        col("st.a_q").as("a_sum_q"), col("st.al_q").as("alpha_sum_q"))

  /** Polarimetric Refined Lee (rstb RefinedLee.java:226-321, the operator's
   * DEFAULT filter on the T3 path): 7x7 window (margin 3), edge direction and
   * gain b from the span image, applied to all 9 T3 channels. Bursts 1-2 bound
   * the 49-tap 9-channel DuckDB twin. */
  val PolSpeckleMaxBurst = 2
  val PolSpeckleM = 3

  def polRefinedLeeQuery(spark: SparkSession, sfDir: String): DataFrame =
    Raster.withHaloMulti(quadTiles(spark, sfDir, PolSpeckleMaxBurst), ChannelCols, PolSpeckleM)
      .withColumn("st", KernelExprs.polRefinedLee(haloChannels, Raster.W, Raster.H,
        PolSpeckleM, Speckle.Enl))
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"),
        col("st.n").as("n_valid"),
        col("st.s11").as("t11_q"), col("st.s22").as("t22_q"), col("st.s33").as("t33_q"),
        col("st.s12r").as("t12r_q"), col("st.s12i").as("t12i_q"),
        col("st.s13r").as("t13r_q"), col("st.s13i").as("t13i_q"),
        col("st.s23r").as("t23r_q"), col("st.s23i").as("t23i_q"))

  /** Max burst for the Wishart gate subset (per-pixel 9-class distance argmin has
   * a heavy DuckDB twin). */
  val WishartMaxBurst = 2

  /** One round of cluster centers from a wishart kernel pass: global integer sums
   * over the per-tile partials, returned as the flat 9x10 center vector. */
  private def centersOf(passed: DataFrame): Array[Long] = {
    val agg = passed
      .select(explode(col("wz")).as("z"))
      .groupBy(col("z.zone").as("zone"))
      .agg(sum("z.cnt").as("cnt"),
        sum("z.s11").as("s11"), sum("z.s22").as("s22"), sum("z.s33").as("s33"),
        sum("z.s12r").as("s12r"), sum("z.s12i").as("s12i"),
        sum("z.s13r").as("s13r"), sum("z.s13i").as("s13i"),
        sum("z.s23r").as("s23r"), sum("z.s23i").as("s23i"))
      .collect()
    val flat = new Array[Long](90)
    agg.foreach { r =>
      val z = r.getInt(0)
      (0 until 10).foreach(j => flat(z * 10 + j) = r.getLong(j + 1))
    }
    flat
  }

  /**
   * H-alpha Wishart classification, `iters` reassignment rounds: zone seeds from
   * the H-alpha plane, centers = mean windowed T3 per zone, reassignment by the
   * revised Wishart distance ln det(C_z) + tr(C_z^-1 Tbar). Output: per-tile class
   * histogram. The driver holds only the 9 centers between rounds.
   */
  def wishartQuery(spark: SparkSession, sfDir: String, iters: Int = 1): DataFrame = {
    val haloed = haloedQuad(spark, sfDir, WishartMaxBurst)
    def pass(centers: Array[Long]): DataFrame =
      haloed.withColumn("wz",
        KernelExprs.wishart(haloChannels, typedLit(centers), Raster.W, Raster.H, 1))
    var centers = centersOf(pass(Array.empty[Long]))
    var it = 1
    while (it < iters) { // re-center from the previous round's assignment
      centers = centersOf(pass(centers))
      it += 1
    }
    pass(centers)
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"), explode(col("wz")).as("z"))
      .where(col("z.cnt") > 0)
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"), col("z.zone").as("zone"), col("z.cnt").as("n_px"))
  }

  /** Burst subset for the scalar quad-alias gates: bounds the DuckDB window-oracle
   * self-join cost; the Spark side is identical machinery at any burst count. */
  val ScalarMaxBurst = 3

  private val tileKeys = Seq("scene_id", "subswath", "pol", "burst_idx", "tile_y", "tile_x")

  private def scalarQuery(spark: SparkSession, sfDir: String, mode: Int,
      outs: Seq[(String, String)]): DataFrame = {
    val st = KernelExprs.quadScalar(haloChannels, Raster.W, Raster.H, 1, mode)
    haloedQuad(spark, sfDir, ScalarMaxBurst)
      .withColumn("st", st)
      .select(tileKeys.map(col) ++ (col("st.n").as("n_valid") +:
        outs.map { case (slot, name) => col(s"st.$slot").as(name) }): _*)
  }

  /** Polarization orientation angle estimation from the windowed T3
   * (OrientationAngleCorrectionOp.java:311-315: theta = (atan2(2 Re t23,
   * t33 - t22) + pi)/4 wrapped to (-pi/4, pi/4]). */
  def orientationQuery(spark: SparkSession, sfDir: String): DataFrame =
    scalarQuery(spark, sfDir, graft.exprs.Kernels.QS_ORIENT, Seq("s1" -> "theta_sum_q"))

  /** Faraday rotation angle, Lee window estimator: omega = -atan2(Im, Re)/4 of the
   * windowed mean circular cross product Z_rl Z_lr^*
   * (FaradayRotationCorrectionOp.java:311-348). */
  def faradayQuery(spark: SparkSession, sfDir: String): DataFrame =
    scalarQuery(spark, sfDir, graft.exprs.Kernels.QS_FARADAY, Seq("s1" -> "omega_sum_q"))

  /** Generalized Freeman-Durden 3-component decomposition of the windowed T3
   * (GeneralizedFreemanDurden.java:34-53: pv = 4 t33, ps/pd = (tmp1 +- tmp3)/2). */
  def freemanQuery(spark: SparkSession, sfDir: String): DataFrame =
    scalarQuery(spark, sfDir, graft.exprs.Kernels.QS_FREEMAN,
      Seq("s1" -> "pv_sum_q", "s2" -> "pd_sum_q", "s3" -> "ps_sum_q"))

  /** Yamaguchi 4-component model-based decomposition with helix power and the
   * Freeman-Durden fallback branch (Yamaguchi.java:164-237): pv / ps / pc
   * channels of the windowed T3+C3 (pd shares the identical pass). */
  def yamaguchiQuery(spark: SparkSession, sfDir: String): DataFrame =
    scalarQuery(spark, sfDir, graft.exprs.Kernels.QS_YAMAGUCHI,
      Seq("s1" -> "pv_sum_q", "s2" -> "ps_sum_q", "s3" -> "pc_sum_q"))

  /** van Zyl eigen 3-component decomposition (vanZyl.java:185-227): closed-form
   * 2x2-block eigenvalues of the windowed C3, lambda3 = volume. */
  def vanZylQuery(spark: SparkSession, sfDir: String): DataFrame =
    scalarQuery(spark, sfDir, graft.exprs.Kernels.QS_VANZYL,
      Seq("s1" -> "pv_sum_q", "s2" -> "pd_sum_q", "s3" -> "ps_sum_q"))

  /** Krogager sphere/diplane/helix decomposition from the windowed-T3 Huynen
   * parameters (Krogager.java:181-198). */
  def krogagerQuery(spark: SparkSession, sfDir: String): DataFrame =
    scalarQuery(spark, sfDir, graft.exprs.Kernels.QS_KROGAGER,
      Seq("s1" -> "ks_sum_q", "s2" -> "kd_sum_q", "s3" -> "kh_sum_q"))

  /** Touzi decomposition, dominant-eigenvector psi / tau / alpha parameters
   * (Touzi.java:215-280; phase-aligned unit eigenvector, psi rotation, the
   * |psi| > pi/4 tau sign fold). */
  def touziQuery(spark: SparkSession, sfDir: String): DataFrame =
    scalarQuery(spark, sfDir, graft.exprs.Kernels.QS_TOUZI,
      Seq("s1" -> "psi_sum_q", "s2" -> "tau_sum_q", "s3" -> "alpha_sum_q"))

  /** Cloude decomposition: dominant-component coherency diagonal in dB
   * (Cloude.java:120-145, EPS floor). */
  def cloudeQuery(spark: SparkSession, sfDir: String): DataFrame =
    scalarQuery(spark, sfDir, graft.exprs.Kernels.QS_CLOUDE,
      Seq("s1" -> "t11_db_sum_q", "s2" -> "t22_db_sum_q", "s3" -> "t33_db_sum_q"))

  /** Polarimetric parameters: span, pedestal height (l3/l1) and RVI over the
   * windowed T3 eigenvalues (PolarimetricParametersOp.java
   * computePolarimetricParameters; RVI denominator reads the reference's
   * lambda1 + alpha2 + lambda3 as a typo for lambda2 — published formula used). */
  def polParamsQuery(spark: SparkSession, sfDir: String): DataFrame =
    scalarQuery(spark, sfDir, graft.exprs.Kernels.QS_PARAMS,
      Seq("s1" -> "span_sum_q", "s2" -> "pedestal_sum_q", "s3" -> "rvi_sum_q"))

  /** Shared Quegan-solve SQL stages (identical text in the DuckDB oracle so both
   * engines walk the same IEEE sequence over the exact covariance sums). */
  val PolCalStages: Seq[(String, String)] = Seq(
    "fre" -> "CASE WHEN c00 > 0.0 AND c33 > 0.0 THEN sqrt(c33 / c00) * cos(0.5 * atan2(c03i, c03r)) ELSE 1.0 END",
    "fim" -> "CASE WHEN c00 > 0.0 AND c33 > 0.0 THEN sqrt(c33 / c00) * sin(0.5 * atan2(c03i, c03r)) ELSE 0.0 END",
    "mag2" -> "fre * fre + fim * fim",
    "ifr" -> "fre / mag2",
    "ifi" -> "0.0 - fim / mag2",
    "a1r" -> "c33 * ifr",
    "a1i" -> "c33 * ifi",
    "c33p" -> "CASE WHEN mag2 >= 1.0E-30 THEN a1r * ifr + a1i * ifi ELSE c33 END",
    "c23pr" -> "CASE WHEN mag2 >= 1.0E-30 THEN c23r * ifr + c23i * ifi ELSE c23r END",
    "c23pi" -> "CASE WHEN mag2 >= 1.0E-30 THEN 0.0 - c23r * ifi + c23i * ifr ELSE c23i END",
    "c13pr" -> "CASE WHEN mag2 >= 1.0E-30 THEN c13r * ifr + c13i * ifi ELSE c13r END",
    "c13pi" -> "CASE WHEN mag2 >= 1.0E-30 THEN 0.0 - c13r * ifi + c13i * ifr ELSE c13i END",
    "d1r" -> "CASE WHEN c00 > 1.0E-30 THEN c02r / c00 ELSE 0.0 END",
    "d1i" -> "CASE WHEN c00 > 1.0E-30 THEN c02i / c00 ELSE 0.0 END",
    "d2r" -> "CASE WHEN c00 > 1.0E-30 THEN c01r / c00 ELSE 0.0 END",
    "d2i" -> "CASE WHEN c00 > 1.0E-30 THEN c01i / c00 ELSE 0.0 END",
    "d3r" -> "CASE WHEN c33p > 1.0E-30 THEN c23pr / c33p ELSE 0.0 END",
    "d3i" -> "CASE WHEN c33p > 1.0E-30 THEN c23pi / c33p ELSE 0.0 END",
    "d4r" -> "CASE WHEN c33p > 1.0E-30 THEN c13pr / c33p ELSE 0.0 END",
    "d4i" -> "CASE WHEN c33p > 1.0E-30 THEN c13pi / c33p ELSE 0.0 END")

  private val deltaCols = Seq("d1r", "d1i", "d2r", "d2i", "d3r", "d3i", "d4r", "d4i")

  /**
   * Quegan polarimetric calibration (PolarimetricCalibrationOp.java:176-199, 1
   * iteration): global per-scene 4x4 scattering covariance (exact dyadic sums),
   * channel-imbalance fold f = sqrt(C44/C11) exp(i arg(C14)/2), closed-form
   * crosstalk deltas from the off-diagonal residuals, then the Kronecker inverse
   * D^-1 = R^-1 (x) T^-1 applied per pixel. The per-scene solve is a 12-double
   * broadcast — the pixel volume shuffles nowhere.
   */
  def polCalibrationQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val tiles = quadTiles(spark, sfDir)
    val covSums = Seq("c00", "c33", "c01r", "c01i", "c02r", "c02i", "c03r", "c03i",
      "c13r", "c13i", "c23r", "c23i")
    val cov = tiles
      .withColumn("cv", KernelExprs.polCalCov(ChannelCols.map(col)))
      .groupBy("scene_id", "subswath")
      .agg(covSums.map(c => sum(s"cv.$c").as(c)).head, covSums.tail.map(c => sum(s"cv.$c").as(c)): _*)
    val deltas = PolCalStages.foldLeft(cov) { case (df, (name, sql)) =>
      df.withColumn(name, expr(sql))
    }.select((Seq("scene_id", "subswath") ++ deltaCols).map(col): _*)
    tiles.join(broadcast(deltas), Seq("scene_id", "subswath"))
      .withColumn("o", KernelExprs.polCalApply((ChannelCols ++ deltaCols).map(col)))
      .select(tileKeys.map(col) ++ (col("o.n").as("n_valid") +:
        Seq("hhr", "hhi", "hvr", "hvi", "vhr", "vhi", "vvr", "vvi")
          .map(f => col(s"o.s_$f").as(s"${f}_sum_q"))): _*)
  }

  /** Generalized RVI: geodesic distances between the windowed-T3 Kennaugh matrix
   * and the GVSM volume / canonical target Kennaugh matrices (GRVIOp.java:216-410,
   * gRVI = (1 - GD_rv) * beta^GD_rv with beta = (min/max GD of the 4 targets)^2). */
  def grviQuery(spark: SparkSession, sfDir: String): DataFrame =
    scalarQuery(spark, sfDir, graft.exprs.Kernels.QS_GRVI, Seq("s1" -> "grvi_sum_q"))

  /** Cross-channel SNR correction: HV scaled by the HV/VH window coherence
   * gamma = |<HV VH*>| / sqrt(<|HV|^2><|VH|^2>) (CrossChannelSNRCorrectionOp.java:197-211). */
  def xChannelSnrQuery(spark: SparkSession, sfDir: String): DataFrame =
    scalarQuery(spark, sfDir, graft.exprs.Kernels.QS_SNR,
      Seq("s1" -> "ihv_sum_q", "s2" -> "qhv_sum_q"))

  /** Compact-pol data simulation (RCH mode): per-tile integer-exact C2 sums of the
   * projected scattering vector (CompactPolDataSimulationOp.java:498-541). */
  def cpSimulationQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val st = KernelExprs.cpC2Sums(ChannelCols.map(col))
    quadTiles(spark, sfDir)
      .withColumn("st", st)
      .select(tileKeys.map(col) ++ Seq(col("st.n").as("n_valid"),
        col("st.s11").as("c11_q"), col("st.s22").as("c22_q"),
        col("st.s12r").as("c12r_q"), col("st.s12i").as("c12i_q")): _*)
  }

  /** Scene pairing for polarimetric change detection: consecutive (even, odd)
   * scene indices form an epoch pair on the shared burst/tile grid. */
  val ChangeMaxBurst = 3

  /** Two-epoch polarimetric change statistic: per-pixel omnibus likelihood-ratio
   * core 2 ln det((T1+T2)/2) - ln det T1 - ln det T2 over windowed T3 means
   * (PolarimetricChangeDetectionOp.java:316-351), rolled up per tile. */
  def polChangeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val haloed = Raster.withHaloMulti(quadTiles(spark, sfDir, ChangeMaxBurst), ChannelCols, 1)
      .withColumn("scene_idx", expr("CAST(substring(scene_id, 7, 4) AS INT)"))
      .withColumn("pair_idx", expr("CAST(scene_idx / 2 AS INT)"))
    val joinKeys = Seq("pair_idx", "subswath", "pol", "burst_idx", "tile_y", "tile_x")
    val e1 = haloed.where(col("scene_idx") % 2 === 0)
    val e2 = ChannelCols.foldLeft(haloed.where(col("scene_idx") % 2 === 1)) { (df, c) =>
      df.withColumnRenamed(s"halo_$c", s"halo2_$c")
    }.select((joinKeys.map(col) ++ ChannelCols.map(c => col(s"halo2_$c"))): _*)
    val chans = ChannelCols.map(c => col(s"halo_$c")) ++ ChannelCols.map(c => col(s"halo2_$c"))
    e1.join(e2, joinKeys)
      .withColumn("st", KernelExprs.polChange(chans, Raster.W, Raster.H, 1))
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"),
        col("st.n").as("n_valid"), col("st.s_q").as("stat_sum_q"))
  }

  /** Supervised Wishart classification: training centers from the burst-1
   * H-alpha-zone-labelled samples only, then one fixed-center classification pass
   * over bursts <= WishartMaxBurst (SupervisedWishartClassificationOp.java:
   * train-then-classify split; same revised-Wishart distance as wishartQuery). */
  def supervisedWishartQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val train = haloedQuad(spark, sfDir, 1)
    val centers = centersOf(train.withColumn("wz",
      KernelExprs.wishart(haloChannels, typedLit(Array.empty[Long]), Raster.W, Raster.H, 1)))
    haloedQuad(spark, sfDir, WishartMaxBurst)
      .withColumn("wz",
        KernelExprs.wishart(haloChannels, typedLit(centers), Raster.W, Raster.H, 1))
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"), explode(col("wz")).as("z"))
      .where(col("z.cnt") > 0)
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"), col("z.zone").as("zone"), col("z.cnt").as("n_px"))
  }
}
