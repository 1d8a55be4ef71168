package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.exprs.KernelExprs
import graft.gen.Fixtures
import graft.model.Layout

/**
 * Soil-moisture family (rstb-op-soil-moisture):
 *  - IEM Multi-Pol inversion (IEMMultiPolInverOp.java:48): per-pixel nearest LUT
 *    row in (sigmaHH, sigmaVV) dB space within the pixel's integer-degree
 *    incidence section; the reference's KD-tree is re-expressed as an exact
 *    argmin over the (tiny) broadcast per-section LUT — same result, no index
 *    structure to ship.
 *  - IEM Multi-Angle inversion (IEMMultiAngleInverOp.java): same search with the
 *    two sigma channels taken from an AM/PM acquisition pair (here the even/odd
 *    scene pairing of the stack fixture).
 *  - SM Dielectric Modeling (SMDielectricModelInverOp.java + Hallikainen model):
 *    closed-form inversion of the quadratic Hallikainen RDC polynomial
 *    rdc = A + B sm + C sm^2 (the analytic minimizer of the reference's 1-D
 *    golden-section search), clamped to the model's [0, 0.55] validity range.
 *
 * Scale shape: the LUT is a ~1k-row broadcast; everything else is per-pixel map +
 * per-tile rollup — no shuffle beyond the pair join.
 */
object SoilMoisture {

  private val ND = Raster.ND
  private val N = Layout.TileW * Layout.TileH
  private val tileKeys = Seq("scene_id", "subswath", "pol", "burst_idx", "tile_y", "tile_x")

  /** Burst subset bounding the DuckDB oracle's px-x-LUT argmin join. */
  val IemMaxBurst = 3

  /** dB sigma channel: 10 log10(v), ND where invalid or non-positive. */
  private def dbSql(vCol: String): String =
    s"transform($vCol, x -> if(x = $ND or x <= 0.0D, $ND, 10 * log10(x)))"

  private val thetaSql: String =
    s"transform(sequence(0, ${N - 1}), k -> 20.0D + 20.0D * (tile_x * ${Layout.TileW} + k % ${Layout.TileW}) / ${Layout.SamplesPerBurst})"

  /** The LUT collected to a flat broadcast literal [theta, rms, rdc, s1, s2]*rows
   * in row_id order (deterministic). */
  private def lutFlat(spark: SparkSession, sfDir: String): Array[Double] =
    Fixtures.table(spark, sfDir, "sm_lut")
      .orderBy("row_id")
      .select("theta_idx", "rms", "rdc", "s1", "s2")
      .collect()
      .flatMap(r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))

  private def vvVh(spark: SparkSession, sfDir: String): DataFrame = {
    def side(pol: String, as: String) =
      Raster.intensityTiles(spark, sfDir)
        .where(col("pol") === pol && col("burst_idx") <= IemMaxBurst)
        .select(col("scene_id"), col("subswath"), col("burst_idx"),
          col("tile_x"), col("tile_y"), col("v").as(as))
    side("VV", "v1").join(side("VH", "v2"),
      Seq("scene_id", "subswath", "burst_idx", "tile_x", "tile_y"))
      .withColumn("pol", lit("DP"))
  }

  /** q_sm_iem_multipol: nearest-LUT-row inversion on (sigmaVV, sigmaVH) dB. */
  def iemMultiPolQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val lut = typedLit(lutFlat(spark, sfDir))
    vvVh(spark, sfDir)
      .withColumn("o", KernelExprs.iemInvert(
        expr(dbSql("v1")), expr(dbSql("v2")), expr(thetaSql), lut))
      .where(col("o.n") > 0)
      .select(tileKeys.map(col) ++ Seq(col("o.n").as("n_valid"),
        col("o.rms_q").as("rms_sum_q"), col("o.rdc_q").as("rdc_sum_q")): _*)
  }

  /** q_sm_iem_multiangle: the same search with sigma from the even/odd scene pair
   * (two incidence geometries of the same site). */
  def iemMultiAngleQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val lut = typedLit(lutFlat(spark, sfDir))
    val base = Raster.intensityTiles(spark, sfDir)
      .where(col("pol") === "VV" && col("burst_idx") <= IemMaxBurst)
      .withColumn("scene_idx", expr("CAST(substring(scene_id, 7, 4) AS INT)"))
      .withColumn("pair_idx", expr("CAST(scene_idx / 2 AS INT)"))
    val joinKeys = Seq("pair_idx", "subswath", "pol", "burst_idx", "tile_x", "tile_y")
    val am = base.where(col("scene_idx") % 2 === 0)
    val pm = base.where(col("scene_idx") % 2 === 1)
      .select((joinKeys.map(col) :+ col("v").as("v2")): _*)
    am.join(pm, joinKeys)
      .withColumn("o", KernelExprs.iemInvert(
        expr(dbSql("v")), expr(dbSql("v2")), expr(thetaSql), lut))
      .where(col("o.n") > 0)
      .select(tileKeys.map(col) ++ Seq(col("o.n").as("n_valid"),
        col("o.rms_q").as("rms_sum_q"), col("o.rdc_q").as("rdc_sum_q")): _*)
  }

  /** PM-image incidence offset (deg): the evening pass views the same site at a
   * steeper angle; sections falling outside the LUT's theta range drop the pixel
   * in BOTH engines (no section rows to match). */
  val HybridThetaOffset = 4.0

  /** q_sm_iem_hybrid (IEMHybridInverOp.java:54-65): FOUR sigma channels — VV+VH
   * from the AM image and VV+VH from the PM image of the even/odd scene pair —
   * argmin over the shared (rms, rdc) LUT grid with each image's sigma pair read
   * from its own integer-degree incidence section. One compiled kernel call per
   * tile; the LUT is the same ~1k-row broadcast as the other IEM gates. */
  def iemHybridQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val lut = typedLit(lutFlat(spark, sfDir))
    def polPair(parity: Int, v1As: String, v2As: String) = {
      def side(pol: String, as: String) =
        Raster.intensityTiles(spark, sfDir)
          .where(col("pol") === pol && col("burst_idx") <= IemMaxBurst)
          .withColumn("scene_idx", expr("CAST(substring(scene_id, 7, 4) AS INT)"))
          .where(col("scene_idx") % 2 === parity)
          .withColumn("pair_idx", expr("CAST(scene_idx / 2 AS INT)"))
          .select(col("pair_idx"), col("scene_id"), col("subswath"), col("burst_idx"),
            col("tile_x"), col("tile_y"), col("v").as(as))
      side("VV", v1As).join(side("VH", v2As).drop("scene_id"),
        Seq("pair_idx", "subswath", "burst_idx", "tile_x", "tile_y"))
    }
    val am = polPair(0, "v1a", "v2a")
    val pm = polPair(1, "v1b", "v2b").drop("scene_id")
    am.join(pm, Seq("pair_idx", "subswath", "burst_idx", "tile_x", "tile_y"))
      .withColumn("pol", lit("DP"))
      .withColumn("o", KernelExprs.iemHybrid(Seq(
        expr(dbSql("v1a")), expr(dbSql("v2a")), expr(dbSql("v1b")), expr(dbSql("v2b")),
        expr(thetaSql),
        expr(s"transform($thetaSql, t -> t + $HybridThetaOffset)"),
        lut)))
      .where(col("o.n") > 0)
      .select(tileKeys.map(col) ++ Seq(col("o.n").as("n_valid"),
        col("o.rms_q").as("rms_sum_q"), col("o.rdc_q").as("rdc_sum_q")): _*)
  }

  /** Hallikainen C-band polynomial coefficients (Hallikainen et al. 1985, the
   * model family behind SMDielectricModelInverOp's config). */
  val HkA = "(2.927 + -0.012 * sand + -0.001 * clay)"
  val HkB = "(5.505 + 0.371 * sand + 0.062 * clay)"
  val HkC = "(114.826 + -0.389 * sand + -0.547 * clay)"

  /** q_sm_dielectric: closed-form inversion of rdc = A + B sm + C sm^2 for sm,
   * clamped to [0, 0.55]; rdc is the per-pixel real dielectric surface, clay/sand
   * per-scene texture fractions. */
  def smDielectricQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val gx = s"(tile_x * ${Layout.TileW} + k % ${Layout.TileW})"
    val gy = s"(tile_y * ${Layout.TileH} + k div ${Layout.TileW})"
    val rdc = s"(6.0 + 3.0 * sin(($gx) / 20) + 2.0 * cos(($gy) / 15))"
    val disc = s"($HkB * $HkB - 4.0 * $HkC * ($HkA - $rdc))"
    val sm = s"((0.0 - $HkB + sqrt($disc)) / (2.0 * $HkC))"
    Raster.rollup(Raster.intensityTiles(spark, sfDir).where(col("pol") === "VV")
      .withColumn("scene_idx", expr("CAST(substring(scene_id, 7, 4) AS INT)"))
      .withColumn("sand", expr("CAST(30.6 + 2.0 * (scene_idx % 3) AS DOUBLE)"))
      .withColumn("clay", expr("CAST(13.5 + 3.0 * (scene_idx % 2) AS DOUBLE)"))
      .withColumn("out", expr(
        s"""transform(v, (x, k) ->
           |  if(x = $ND or $disc < 0.0D, $ND,
           |     least(greatest($sm, 0.0D), 0.55D)))""".stripMargin)))
  }
}
