package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Layout

/**
 * Multilook (reference MultilookOp.java:60-653): target (bx, by) <- mean over the
 * nRg x nAz source block (:499-554). Unit rules: complex -> mean of i^2+q^2 (:523-534),
 * amplitude out = sqrt(mean intensity) (:535-546, unbiased under speckle), dB out
 * = 10*log10(mean linear) (:513-522). No-data samples are excluded; an all-no-data
 * block stays no-data.
 *
 * Spark shape: looks divide the tile size, so the block mean is a pure array expression
 * per tile — zero shuffle (the textbook partial aggregation degenerates to a map).
 */
object Multilook {

  val Looks = 4 // nRg = nAz = 4
  private val ND = Raster.ND
  private val BX = Layout.TileW / Looks // blocks per tile in x
  private val BY = Layout.TileH / Looks

  def query(spark: SparkSession, sfDir: String): DataFrame = {
    val tiles = Raster.intensityTiles(spark, sfDir)
    // per block b (row-major over BX*BY): gather the Looks*Looks source pixels
    val blockVals = (for (dy <- 0 until Looks; dx <- 0 until Looks) yield
      s"element_at(v, CAST((b div $BX * $Looks + $dy) * ${Layout.TileW} + (b % $BX) * $Looks + $dx + 1 AS INT))")
      .mkString(", ")
    tiles
      .withColumn("blocks", expr(
        s"""transform(sequence(0, ${BX * BY - 1}), b -> struct(
           |  b AS bi,
           |  filter(array($blockVals), x -> not(isnan(x) or x = $ND)) AS valid))""".stripMargin))
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"), explode(col("blocks")).as("blk"))
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"),
        expr(s"CAST(blk.bi div $BX AS INT)").as("block_y"),
        expr(s"blk.bi % $BX").as("block_x"),
        expr("CAST(size(blk.valid) AS BIGINT)").as("n_valid"),
        expr(s"round(if(size(blk.valid) <= 0, ${Layout.NoData}D, " +
          "aggregate(blk.valid, 0D, (a, x) -> a + x) / size(blk.valid)), 6)").as("ml_intensity"),
        expr(s"round(if(size(blk.valid) <= 0, ${Layout.NoData}D, " +
          "sqrt(aggregate(blk.valid, 0D, (a, x) -> a + x) / size(blk.valid))), 6)").as("ml_amplitude"),
        expr(s"round(if(size(blk.valid) <= 0, ${Layout.NoData}D, " +
          "10D * log10(aggregate(blk.valid, 0D, (a, x) -> a + x) / size(blk.valid))), 6)").as("ml_db"))
      .orderBy("scene_id", "subswath", "pol", "burst_idx", "tile_y", "tile_x", "block_y", "block_x")
  }
}
