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
          expr(s"transform(i, x -> floor(x * ${Raster.Dyadic}) / ${Raster.Dyadic})")
            .as(s"i_${pol.toLowerCase}"),
          expr(s"transform(q, x -> floor(x * ${Raster.Dyadic}) / ${Raster.Dyadic})")
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
}
