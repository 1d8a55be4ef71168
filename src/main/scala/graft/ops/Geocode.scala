package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.gen.Fixtures
import graft.model.Layout

/**
 * Geocoding / mosaicking / polarimetric operators:
 *  - SAR-Mosaic (reference MosaicOp.java:54): pixels geolocated through the burst
 *    footprint affine, scattered into map cells, per-cell mean across overlapping
 *    bursts/subswaths — scatter + groupBy(map cell).
 *  - SRGR (SRGROp.java:45): slant<->ground mapping along range (1-D map).
 *  - InSAR-Overview baselines (InSAROverviewOp.java:45): scene-pair cross join.
 *  - Radar-Vegetation-Index (rstb RVIOp.java:61): dual-pol 4*vh/(vv+vh).
 *  - Dual-pol H-alpha entropy (rstb dual-pol decompositions): closed-form 2x2
 *    Hermitian eigenvalues of the per-pixel covariance, Shannon entropy of the
 *    normalized eigenvalue spectrum.
 */
object Geocode {

  private val ND = Raster.ND
  val MosaicCell = 0.05

  /** Pixel scatter -> map-cell mean (VV intensity). */
  def mosaicQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val bursts = Fixtures.table(spark, sfDir, "bursts")
      .select("scene_id", "subswath", "burst_idx", "lon1", "lat1", "lon2", "lat2", "lon4", "lat4")
    val scenes = Fixtures.table(spark, sfDir, "scenes").select("scene_id", "lon0", "lat0")
    Raster.intensityTiles(spark, sfDir).where(col("pol") === "VV")
      .select(col("scene_id"), col("subswath"), col("burst_idx"),
        col("tile_x"), col("tile_y"), posexplode(col("v")).as(Seq("k", "val")))
      .where(col("val") =!= Layout.NoData)
      .join(broadcast(bursts), Seq("scene_id", "subswath", "burst_idx"))
      .join(broadcast(scenes), Seq("scene_id"))
      .withColumn("u", expr(s"(tile_x * ${Layout.TileW} + k % ${Layout.TileW} + 0.5) / ${Layout.SamplesPerBurst}"))
      .withColumn("vv", expr(s"(tile_y * ${Layout.TileH} + k div ${Layout.TileW} + 0.5) / ${Layout.LinesPerBurst}"))
      .withColumn("lon", col("lon1") + col("u") * (col("lon2") - col("lon1")) + col("vv") * (col("lon4") - col("lon1")))
      .withColumn("lat", col("lat1") + col("vv") * (col("lat4") - col("lat1")))
      .withColumn("cell_x", expr(s"CAST(floor((lon - lon0) / $MosaicCell) AS INT)"))
      .withColumn("cell_y", expr(s"CAST(floor((lat - lat0) / $MosaicCell) AS INT)"))
      .groupBy("scene_id", "cell_x", "cell_y")
      .agg(count(lit(1)).as("n_px"),
        sum(expr("CAST(floor(0.031415926535897934 + val * 1.0E6) AS BIGINT)")).as("sum_q"))
  }

  /** Slant-range sample -> ground range (closed-form inverse of the TC slant eq). */
  def srgrQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val orbit0 = Fixtures.table(spark, sfDir, "orbit")
      .withColumn("rn", row_number().over(Window.partitionBy("scene_id").orderBy("t_sec")))
      .where(col("rn") === 1)
      .select(col("scene_id"), col("x").as("orb_x"), col("z").as("orb_z"))
    orbit0
      .withColumn("s_idx", explode(sequence(lit(0), lit(3 * Layout.SamplesPerBurst - 1))))
      .withColumn("r0", expr("sqrt(orb_x * orb_x + orb_z * orb_z)"))
      .withColumn("slant", col("r0") + col("s_idx") * TerrainCorrection.DR)
      .withColumn("ground_x", expr("orb_x + sqrt(slant * slant - orb_z * orb_z)"))
      .select(col("scene_id"), col("s_idx"), round(col("slant"), 4).as("slant_r"),
        round(col("ground_x"), 4).as("ground_x_r"))
  }

  /** Scene-pair baselines (temporal + footprint-origin distance). */
  def baselineQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Fixtures.table(spark, sfDir, "scenes")
      .select("scene_id", "first_line_time", "lon0", "lat0")
    val a = s.select(col("scene_id").as("scene_a"), col("first_line_time").as("ta"),
      col("lon0").as("lona"), col("lat0").as("lata"))
    val b = s.select(col("scene_id").as("scene_b"), col("first_line_time").as("tb"),
      col("lon0").as("lonb"), col("lat0").as("latb"))
    a.join(b, col("scene_a") < col("scene_b"))
      .select(col("scene_a"), col("scene_b"),
        round(col("tb") - col("ta"), 6).as("temporal_baseline_s"),
        round(expr("sqrt((lonb - lona) * (lonb - lona) + (latb - lata) * (latb - lata))"), 6)
          .as("origin_dist_deg"))
  }

  /** RVI = 4*vh / (vv + vh) per pixel; per-tile rollup. */
  def rviQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val vv = Raster.intensityTiles(spark, sfDir).where(col("pol") === "VV")
      .select(col("scene_id"), col("subswath"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("v").as("vvv"))
    val vh = Raster.intensityTiles(spark, sfDir).where(col("pol") === "VH")
      .select(col("scene_id"), col("subswath"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("v").as("vvh"))
    Raster.rollup(vv.join(vh, Seq("scene_id", "subswath", "burst_idx", "tile_x", "tile_y"))
      .withColumn("pol", lit("DP"))
      .withColumn("out", expr(
        s"""zip_with(vvv, vvh, (a, b) ->
           |  if(a = $ND or b = $ND or a + b <= 0D, $ND, 4D * b / (a + b)))""".stripMargin)))
  }

  /** Dual-pol entropy from closed-form 2x2 covariance eigenvalues; per-tile rollup. */
  def dualPolEntropyQuery(spark: SparkSession, sfDir: String): DataFrame = {
    def bands(table: String, pol: String, ip: String, qp: String) =
      Fixtures.table(spark, sfDir, table).where(col("pol") === pol)
        .select(col("scene_id"), col("subswath"), col("burst_idx"),
          col("tile_x"), col("tile_y"),
          // dyadic-grid snap (Raster.Dyadic): covariance window sums become exact
          expr(s"transform(i, x -> floor(x * ${Raster.Dyadic}) / ${Raster.Dyadic})").as(ip),
          expr(s"transform(q, x -> floor(x * ${Raster.Dyadic}) / ${Raster.Dyadic})").as(qp))
    val joined = bands("tiles", "VV", "ia", "qa")
      .join(bands("tiles", "VH", "ib", "qb"),
        Seq("scene_id", "subswath", "burst_idx", "tile_x", "tile_y"))
      .withColumn("pol", lit("DP"))
    // c11 = |a|^2, c22 = |b|^2, |c12|^2 = |a·conj(b)|^2 = c11*c22 for a rank-1 pixel —
    // entropy needs window-averaged covariance; use the 3x3 boxcar of c11/c22/c12.
    // validity requires BOTH pols valid at the pixel, for all four covariance arrays
    val pre = joined.withColumn("c11", expr(
        s"""transform(sequence(0, ${Layout.TileW * Layout.TileH - 1}), k ->
           |  if(element_at(ia, k + 1) = $ND or element_at(ib, k + 1) = $ND, $ND,
           |    element_at(ia, k + 1) * element_at(ia, k + 1) + element_at(qa, k + 1) * element_at(qa, k + 1)))""".stripMargin))
      .withColumn("c22", expr(
        s"""transform(sequence(0, ${Layout.TileW * Layout.TileH - 1}), k ->
           |  if(element_at(ia, k + 1) = $ND or element_at(ib, k + 1) = $ND, $ND,
           |    element_at(ib, k + 1) * element_at(ib, k + 1) + element_at(qb, k + 1) * element_at(qb, k + 1)))""".stripMargin))
      .withColumn("c12r", expr(
        s"""transform(sequence(0, ${Layout.TileW * Layout.TileH - 1}), k ->
           |  if(element_at(ia, k + 1) = $ND or element_at(ib, k + 1) = $ND, $ND,
           |    element_at(ia, k + 1) * element_at(ib, k + 1) + element_at(qa, k + 1) * element_at(qb, k + 1)))""".stripMargin))
      .withColumn("c12i", expr(
        s"""transform(sequence(0, ${Layout.TileW * Layout.TileH - 1}), k ->
           |  if(element_at(ia, k + 1) = $ND or element_at(ib, k + 1) = $ND, $ND,
           |    element_at(qa, k + 1) * element_at(ib, k + 1) - element_at(ia, k + 1) * element_at(qb, k + 1)))""".stripMargin))
    val haloed = Raster.withHaloMulti(pre, Seq("c11", "c22", "c12r", "c12i"), margin = 1)
    val W = Raster.W; val HW = W + 2
    def el(c: String, dy: Int, dx: Int) =
      s"element_at(halo_$c, CAST((k div $W + 1 + $dy) * $HW + (k % $W + 1 + $dx) + 1 AS INT))"
    def winSum(c: String) = (for (dy <- -1 to 1; dx <- -1 to 1) yield
      s"if(${el("c11", dy, dx)} = $ND, 0D, ${el(c, dy, dx)})").mkString(" + ")
    val winN = (for (dy <- -1 to 1; dx <- -1 to 1) yield
      s"if(${el("c11", dy, dx)} = $ND, 0, 1)").mkString(" + ")
    // eigenvalues of [[m11, m12],[m12*, m22]]: l = (T +- sqrt(T^2 - 4 det)) / 2
    Raster.rollup(haloed
      .withColumn("st", expr(
        s"""transform(sequence(0, ${W * Raster.H - 1}), k -> named_struct(
           |  'n', $winN, 'm11', ${winSum("c11")}, 'm22', ${winSum("c22")},
           |  'mr', ${winSum("c12r")}, 'mi', ${winSum("c12i")}))""".stripMargin))
      .withColumn("out", expr(
        s"""transform(st, s ->
           |  if(s.n = 0 or s.m11 + s.m22 <= 0D, $ND,
           |    if((s.m11 + s.m22) * (s.m11 + s.m22) - 4D * (s.m11 * s.m22 - s.mr * s.mr - s.mi * s.mi) < 0D, 0D,
           |      -1D * aggregate(
           |        filter(array(
           |          ((s.m11 + s.m22) + sqrt((s.m11 + s.m22) * (s.m11 + s.m22) - 4D * (s.m11 * s.m22 - s.mr * s.mr - s.mi * s.mi))) / (2D * (s.m11 + s.m22)),
           |          ((s.m11 + s.m22) - sqrt((s.m11 + s.m22) * (s.m11 + s.m22) - 4D * (s.m11 * s.m22 - s.mr * s.mr - s.mi * s.mi))) / (2D * (s.m11 + s.m22))),
           |          p -> p > 0D),
           |        0D, (acc, p) -> acc + p * log2(p)))))""".stripMargin)))
  }
}
