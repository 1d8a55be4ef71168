package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.Fixtures
import graft.model.Layout

/**
 * Detection / stack operators:
 *  - Change-Detection (reference ChangeDetectionOp.java:50): per-pixel log10-ratio of
 *    two epochs joined on pixel key.
 *  - Stack-Averaging / Multitemporal-Compositing (StackAveragingOp.java:39,
 *    MultitemporalCompositingOp.java:46): per-pixel mean over the epoch stack.
 *  - AdaptiveThresholding two-parameter CFAR (AdaptiveThresholdingOp.java:59-148):
 *    background ring statistics (9x9 minus the 3x3 guard) around each pixel,
 *    t = (cp - bgMean) / bgStd, detection when t > threshold. Margin-4 halo exchange.
 */
object Detection {

  private val ND = Raster.ND
  val CfarThreshold = 3.5

  private def epochJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e1 = Raster.intensityTiles(spark, sfDir, "tiles")
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("v").as("v1"))
    val e2 = Raster.intensityTiles(spark, sfDir, "tiles_sec")
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("v").as("v2"))
    e1.join(e2, Seq("scene_id", "subswath", "pol", "burst_idx", "tile_x", "tile_y"))
  }

  /** Per-tile rollup of the log-ratio image 10*log10(v2/v1). */
  def changeDetectionQuery(spark: SparkSession, sfDir: String): DataFrame =
    Raster.rollup(epochJoin(spark, sfDir)
      .withColumn("out", expr(
        s"zip_with(v2, v1, (b, a) -> if(b = $ND or a = $ND or a <= 0D or b <= 0D, $ND, 10D * log10(b / a)))")))

  /** Per-tile rollup of the 2-epoch stack mean. */
  def stackAverageQuery(spark: SparkSession, sfDir: String): DataFrame =
    Raster.rollup(epochJoin(spark, sfDir)
      .withColumn("out", expr(
        s"""zip_with(v1, v2, (a, b) ->
           |  if(a = $ND and b = $ND, $ND,
           |    if(a = $ND, b, if(b = $ND, a, (a + b) / 2D))))""".stripMargin)))

  /** CFAR: per-tile detection count + max test statistic. */
  def cfarQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val m = 4
    val haloed = Raster.withHaloMulti(
      Raster.intensityTiles(spark, sfDir).where(col("pol") === "VV"), Seq("v"), m)
    val W = Raster.W; val hw = W + 2 * m
    def el(dy: Int, dx: Int) =
      s"element_at(halo_v, CAST((k div $W + $m + $dy) * $hw + (k % $W + $m + $dx) + 1 AS INT))"
    val ring = for (dy <- -m to m; dx <- -m to m
      if !(math.abs(dy) <= 1 && math.abs(dx) <= 1)) yield (dy, dx)
    val n = ring.map { case (dy, dx) => s"if(${el(dy, dx)} = $ND, 0, 1)" }.mkString(" + ")
    val s1 = ring.map { case (dy, dx) => s"if(${el(dy, dx)} = $ND, 0D, ${el(dy, dx)})" }.mkString(" + ")
    val s2 = ring.map { case (dy, dx) =>
      s"if(${el(dy, dx)} = $ND, 0D, ${el(dy, dx)} * ${el(dy, dx)})" }.mkString(" + ")
    val cp = el(0, 0)
    // t statistic per pixel: (cp - bgMean) / bgStd with sample-variance background
    val tArr =
      s"""transform(sequence(0, ${W * Raster.H - 1}), k ->
         |  named_struct('n', $n, 'cp', $cp, 's1', $s1, 's2', $s2))""".stripMargin
    haloed
      .withColumn("st", expr(tArr))
      .withColumn("t", expr(
        s"""transform(st, s ->
           |  if(s.cp = $ND or s.n < 2, $ND,
           |    if((s.s2 - s.n * (s.s1 / s.n) * (s.s1 / s.n)) / (s.n - 1) <= 0D, $ND,
           |      (s.cp - s.s1 / s.n) / sqrt((s.s2 - s.n * (s.s1 / s.n) * (s.s1 / s.n)) / (s.n - 1)))))""".stripMargin))
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"),
        expr(s"CAST(size(filter(t, x -> x != $ND and x > $CfarThreshold)) AS BIGINT)").as("n_detect"),
        expr(s"round(array_max(filter(t, x -> x != $ND)), 4)").as("max_t"))
      .orderBy("scene_id", "subswath", "pol", "burst_idx", "tile_y", "tile_x")
  }
}
