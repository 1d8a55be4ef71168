package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.exprs.KernelExprs
import graft.gen.Fixtures

/**
 * Dual-pol radar backscatter/scattering index family (rstb DPRBIOp.java:425-505,
 * DPRSIOp.java:345-400, DpDecompositionOp.java:500-560, DpFactorizationOp.java:465-540):
 * slope-masked Stokes magnitudes over the 5x5-windowed C2, per-scene 5th/95th
 * percentile normalization, entropy-gated scattering index, and the derived
 * power decomposition / factorization.
 *
 * Spark shape: two compiled kernel passes over the haloed C2+slope channels.
 * Pass A emits per-pixel |Stokes| magnitudes that feed ONE global per-scene
 * percentile aggregation (the reference's own global-stats pass; at scale this
 * is a per-scene distributed sort — the only shuffle whose volume is the pixel
 * count, exactly like the reference's full-image percentile collect). The tiny
 * per-scene stats frame then broadcast-joins back onto the tiles for pass B,
 * which rolls the final indices up per tile with no further shuffle.
 *
 * Percentile rule: linear interpolation at position p*(n-1) with the reference's
 * association v[idx]*(1-frac) + v[idx+1]*frac (DPRBIOp.java:265-288
 * ComputePercentile), computed from two order statistics per scene rather than
 * an in-RAM sort (the reference's float-cast before sorting is not reproduced —
 * magnitudes stay doubles end-to-end).
 */
object PolarimetryIndices {

  /** Reference default windowSize 5 => half-window margin 2 (DPRBIOp.java:70). */
  val M = 2

  /** Verification subset: bursts 1-3 bound the DuckDB oracle's 25-tap pixel
   * self-join (the same trick as goldstein/refinedlee); the per-scene percentile
   * pass runs over the same subset in BOTH engines. */
  val DpMaxBurst = 3

  private val haloCols = Seq("halo_c11", "halo_c22", "halo_c12r", "halo_c12i", "halo_sl")
  private val statCols = Seq("p5_g1", "p95_g1", "p5_g2", "p95_g2", "p5_g3", "p95_g3",
    "p5_g1s", "p95_g1s")
  private val tileKeys = Seq("scene_id", "subswath", "pol", "burst_idx", "tile_y", "tile_x")

  /** C2 tiles with the aligned terrain-slope channel (the reference reads a
   * `slope` band off the source product, DPRBIOp.java:119). */
  private def c2SlopeTiles(spark: SparkSession, sfDir: String): DataFrame =
    Polarimetry.c2Tiles(spark, sfDir)
      .where(col("burst_idx") <= DpMaxBurst)
      .join(Fixtures.table(spark, sfDir, "slope")
          .withColumnRenamed("s", "sl"),
        Seq("scene_id", "subswath", "burst_idx", "tile_x", "tile_y"))

  private def haloed(spark: SparkSession, sfDir: String): DataFrame =
    Raster.withHaloMulti(c2SlopeTiles(spark, sfDir),
      Seq("c11", "c22", "c12r", "c12i", "sl"), M)

  /** Per-(scene, subswath) p5/p95 of the pass-A magnitudes: two order statistics
   * per group selected by rank, combined with the reference's interpolation. */
  private def stats(h: DataFrame): DataFrame = {
    val px = h
      .withColumn("ga", KernelExprs.dpStokes(haloCols.map(col), Raster.W, Raster.H, M))
      .selectExpr("scene_id", "subswath",
        "explode(arrays_zip(ga.g1a, ga.g2a, ga.g3a, ga.g1s)) AS p")
      .selectExpr("scene_id", "subswath",
        "stack(4, 'g1', p.g1a, 'g2', p.g2a, 'g3', p.g3a, 'g1s', p.g1s) AS (gname, v)")
      .where(col("v") =!= Raster.ND)
    val grp = Window.partitionBy("scene_id", "subswath", "gname")
    val ranked = px
      .withColumn("rn", row_number().over(grp.orderBy("v")) - 1)
      .withColumn("nv", count(lit(1)).over(grp))
      .withColumn("pos5", expr("0.05D * CAST(nv - 1 AS DOUBLE)"))
      .withColumn("pos95", expr("0.95D * CAST(nv - 1 AS DOUBLE)"))
      .withColumn("idx5", expr("CAST(floor(pos5) AS BIGINT)"))
      .withColumn("idx95", expr("CAST(floor(pos95) AS BIGINT)"))
    def sel(rnExpr: String) = max(when(expr(rnExpr), col("v")))
    val agg = ranked.groupBy("scene_id", "subswath", "gname")
      .agg(
        sel("rn = idx5").as("a5"), sel("rn = idx5 + 1").as("b5"),
        sel("rn = idx95").as("a95"), sel("rn = idx95 + 1").as("b95"),
        first(expr("pos5 - CAST(idx5 AS DOUBLE)")).as("f5"),
        first(expr("pos95 - CAST(idx95 AS DOUBLE)")).as("f95"))
      .withColumn("p5", expr("a5 * (1.0D - f5) + coalesce(b5, a5) * f5"))
      .withColumn("p95", expr("a95 * (1.0D - f95) + coalesce(b95, a95) * f95"))
    agg.groupBy("scene_id", "subswath")
      .pivot("gname", Seq("g1", "g2", "g3", "g1s"))
      .agg(first("p5").as("p5"), first("p95").as("p95"))
      .select(col("scene_id"), col("subswath"),
        col("g1_p5").as("p5_g1"), col("g1_p95").as("p95_g1"),
        col("g2_p5").as("p5_g2"), col("g2_p95").as("p95_g2"),
        col("g3_p5").as("p5_g3"), col("g3_p95").as("p95_g3"),
        col("g1s_p5").as("p5_g1s"), col("g1s_p95").as("p95_g1s"))
  }

  private def indexQuery(spark: SparkSession, sfDir: String, mode: Int,
      outs: Seq[(String, String)]): DataFrame = {
    val h = haloed(spark, sfDir)
    h.join(broadcast(stats(h)), Seq("scene_id", "subswath"))
      .withColumn("o", KernelExprs.dpIndex((haloCols ++ statCols).map(col),
        Raster.W, Raster.H, M, mode))
      .select(tileKeys.map(col) ++ (col("o.n").as("n_valid") +:
        outs.map { case (slot, name) => col(s"o.$slot").as(name) }): _*)
  }

  /** DPRBI: slope-masked normalized Stokes magnitude sqrt(sum g_norm^2)/sqrt(3). */
  def dprbiQuery(spark: SparkSession, sfDir: String): DataFrame =
    indexQuery(spark, sfDir, graft.exprs.Kernels.DP_RBI, Seq("s1" -> "rbi_sum_q"))

  /** DPRSI: entropy-gated sqrt(1 - g1_norm^2) with the NESZ=-16 dB noise branch. */
  def dprsiQuery(spark: SparkSession, sfDir: String): DataFrame =
    indexQuery(spark, sfDir, graft.exprs.Kernels.DP_RSI, Seq("s1" -> "rsi_sum_q"))

  /** Dual-pol powers decomposition: Pu/Pd/Ps + the dual alpha angle. */
  def dpPowersQuery(spark: SparkSession, sfDir: String): DataFrame =
    indexQuery(spark, sfDir, graft.exprs.Kernels.DP_POWERS,
      Seq("s1" -> "pu_sum_q", "s2" -> "pd_sum_q", "s3" -> "ps_sum_q", "s4" -> "alpha_sum_q"))

  /** Dual-pol powers factorization: Ps/Pd/Pr from the two indices. */
  def dpFactorQuery(spark: SparkSession, sfDir: String): DataFrame =
    indexQuery(spark, sfDir, graft.exprs.Kernels.DP_FACT,
      Seq("s1" -> "ps_sum_q", "s2" -> "pd_sum_q", "s3" -> "pr_sum_q"))
}
