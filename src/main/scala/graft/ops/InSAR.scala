package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.Fixtures
import graft.model.Layout

/**
 * InSAR operators over the coregistered (tiles, tiles_sec) pair:
 *  - Interferogram (reference InterferogramOp.java:64-106): ifg = ref * conj(sec)
 *    per pixel — re = i1*i2 + q1*q2, im = q1*i2 - i1*q2, phase = atan2(im, re).
 *  - Coherence (reference CoherenceOp.java:69-87, 722, 752-755): windowed
 *    |sum r*conj(s)| / sqrt(sum |r|^2 * sum |s|^2) over a 3x3 window.
 *  - TOPSAR deramp/demod phase (reference Sentinel1Utils.java:735-805):
 *    phi = -pi*kt*(ta - tref)^2 - 2*pi*fdc*ta, wrapped to (-pi, pi].
 */
object InSAR {

  private val ND = Raster.ND

  /** tiles joined with tiles_sec per tile key, with complex-cross per-pixel arrays. */
  def crossTiles(spark: SparkSession, sfDir: String): DataFrame = {
    val ref = Fixtures.table(spark, sfDir, "tiles")
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("i").as("i1"), col("q").as("q1"))
    val sec = Fixtures.table(spark, sfDir, "tiles_sec")
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("i").as("i2"), col("q").as("q2"))
    ref.join(sec, Seq("scene_id", "subswath", "pol", "burst_idx", "tile_x", "tile_y"))
      .withColumn("zipped", expr(
        s"""transform(sequence(0, ${Layout.TileW * Layout.TileH - 1}), k -> struct(
           |  element_at(i1, k + 1) AS i1k, element_at(q1, k + 1) AS q1k,
           |  element_at(i2, k + 1) AS i2k, element_at(q2, k + 1) AS q2k))""".stripMargin))
      .withColumn("cre", expr(s"transform(zipped, z -> " +
        "if(z.i1k = -9999.0D or z.q1k = -9999.0D or z.i2k = -9999.0D or z.q2k = -9999.0D, " +
        "-9999.0D, z.i1k * z.i2k + z.q1k * z.q2k))"))
      .withColumn("cim", expr(s"transform(zipped, z -> " +
        "if(z.i1k = -9999.0D or z.q1k = -9999.0D or z.i2k = -9999.0D or z.q2k = -9999.0D, " +
        "-9999.0D, z.q1k * z.i2k - z.i1k * z.q2k))"))
      .withColumn("p1", expr(s"transform(zipped, z -> " +
        "if(z.i1k = -9999.0D or z.q1k = -9999.0D or z.i2k = -9999.0D or z.q2k = -9999.0D, " +
        "-9999.0D, z.i1k * z.i1k + z.q1k * z.q1k))"))
      .withColumn("p2", expr(s"transform(zipped, z -> " +
        "if(z.i1k = -9999.0D or z.q1k = -9999.0D or z.i2k = -9999.0D or z.q2k = -9999.0D, " +
        "-9999.0D, z.i2k * z.i2k + z.q2k * z.q2k))"))
      .drop("zipped", "i1", "q1", "i2", "q2")
  }

  /** Per-tile interferogram phase rollup. */
  def interferogramQuery(spark: SparkSession, sfDir: String): DataFrame =
    Raster.rollup(crossTiles(spark, sfDir)
      .withColumn("out", expr(
        s"zip_with(cim, cre, (b, a) -> if(b = $ND or a = $ND, $ND, atan2(b, a)))")))

  /** Coherence: one 4-column halo exchange, single-pass 3x3 moment struct
   * (each window sum computed exactly once), per-tile rollup. */
  def coherenceQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val haloed = Raster.withHaloMulti(crossTiles(spark, sfDir),
      Seq("cre", "cim", "p1", "p2"), margin = 1)
    val W = Raster.W; val HW = W + 2
    def el(c: String, dy: Int, dx: Int) =
      s"element_at(halo_$c, CAST((k div $W + 1 + $dy) * $HW + (k % $W + 1 + $dx) + 1 AS INT))"
    def winSum(c: String) = (for (dy <- -1 to 1; dx <- -1 to 1) yield
      s"if(${el("p1", dy, dx)} = $ND, 0D, ${el(c, dy, dx)})").mkString(" + ")
    val winN = (for (dy <- -1 to 1; dx <- -1 to 1) yield
      s"if(${el("p1", dy, dx)} = $ND, 0, 1)").mkString(" + ")
    Raster.rollup(haloed
      .withColumn("st", expr(
        s"""transform(sequence(0, ${W * Raster.H - 1}), k -> struct(
           |  ($winN) AS n, (${winSum("cre")}) AS sre, (${winSum("cim")}) AS sim,
           |  (${winSum("p1")}) AS sp1, (${winSum("p2")}) AS sp2))""".stripMargin))
      .withColumn("out", expr(
        s"""transform(st, s ->
           |  if(s.n = 0, $ND,
           |    sqrt(s.sre * s.sre + s.sim * s.sim) / sqrt(s.sp1 * s.sp2)))""".stripMargin))
      .drop("st"))
  }

  /** Deramp/demod phase per pixel, wrapped; per-tile rollup. */
  def derampQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val bursts = Fixtures.table(spark, sfDir, "bursts")
      .select("scene_id", "subswath", "burst_idx", "burst_first_line_time",
        "doppler_rate", "doppler_centroid", "reference_time")
    val scenes = Fixtures.table(spark, sfDir, "scenes")
      .select("scene_id", "azimuth_time_interval")
    val tiles = Fixtures.table(spark, sfDir, "tiles").where(col("pol") === "VV")
      .select("scene_id", "subswath", "pol", "burst_idx", "tile_x", "tile_y")
    Raster.rollup(tiles
      .join(broadcast(bursts), Seq("scene_id", "subswath", "burst_idx"))
      .join(broadcast(scenes), Seq("scene_id"))
      .withColumn("out", expr(
        s"""transform(sequence(0, ${Layout.TileW * Layout.TileH - 1}), k ->
           |  atan2(sin(-pi() * doppler_rate * (burst_first_line_time + (tile_y * ${Layout.TileH} + k div ${Layout.TileW}) * azimuth_time_interval - reference_time)
           |                 * (burst_first_line_time + (tile_y * ${Layout.TileH} + k div ${Layout.TileW}) * azimuth_time_interval - reference_time)
           |            - 2 * pi() * doppler_centroid * (burst_first_line_time + (tile_y * ${Layout.TileH} + k div ${Layout.TileW}) * azimuth_time_interval)),
           |        cos(-pi() * doppler_rate * (burst_first_line_time + (tile_y * ${Layout.TileH} + k div ${Layout.TileW}) * azimuth_time_interval - reference_time)
           |                 * (burst_first_line_time + (tile_y * ${Layout.TileH} + k div ${Layout.TileW}) * azimuth_time_interval - reference_time)
           |            - 2 * pi() * doppler_centroid * (burst_first_line_time + (tile_y * ${Layout.TileH} + k div ${Layout.TileW}) * azimuth_time_interval))))""".stripMargin)))
  }
}
