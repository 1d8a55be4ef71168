package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.gen.Fixtures
import graft.model.Layout

/**
 * Cross-Correlation tie-point matching + Warp fit (reference CrossCorrelationOp.java:
 * 74-1520, WarpOp.java:83-866): per GCP, extract a reference imagette and search the
 * secondary image over a shift window for the best alignment; then fit a global warp
 * from the per-GCP offsets. The fixtures plant a per-scene integer shift in tiles_sec
 * (ground truth in the gcps table, which the engine does NOT read for estimation);
 * the matching criterion is SSD (sum of squared differences) — argmin, ties broken by
 * (dy, dx) — which for a planted pure translation recovers the shift exactly with
 * SSD = 0, the degenerate case of the reference's normalized cross-correlation peak.
 *
 * Spark shape (the north rule's kNN tie-point matching): imagette pixels resolve to
 * tile keys; candidate shifts explode per GCP; both gathers are equi-joins on
 * (scene, subswath, pol, burst, gx, gy) pixel keys; argmin = Window top-1 per GCP.
 */
object Coregistration {

  val Half = 8 // imagette 16x16
  val SearchR = 3 // shift window [-3, 3]^2

  /** pixel-level view of a tile table: (scene, subswath, pol, burst, gx, gy, v). */
  def pixels(spark: SparkSession, sfDir: String, table: String): DataFrame =
    Raster.intensityTiles(spark, sfDir, table)
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_x"), col("tile_y"), posexplode(col("v")).as(Seq("k", "val")))
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        expr(s"tile_x * ${Layout.TileW} + k % ${Layout.TileW}").as("gx"),
        expr(s"tile_y * ${Layout.TileH} + k div ${Layout.TileW}").as("gy"),
        col("val"))

  // warp fit and the coregistered stack reuse the offset estimates — cache per session
  private val cache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Per-GCP offset estimate: argmin over shifts of SSD(ref imagette, shifted sec). */
  def xcorrOffsetsQuery(spark: SparkSession, sfDir: String): DataFrame =
    cache.getOrElseUpdate(s"${spark.hashCode}|$sfDir",
      xcorrOffsetsUncached(spark, sfDir).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  def xcorrOffsetsUncached(spark: SparkSession, sfDir: String): DataFrame = {
    val gcps = Fixtures.table(spark, sfDir, "gcps")
      .select("gcp_id", "scene_id", "subswath", "pol", "burst_idx", "cx", "cy")
    // one row per (gcp, shift, imagette offset)
    val probes = gcps
      .withColumn("sh", explode(expr(
        s"""flatten(transform(sequence(-$SearchR, $SearchR), dy ->
           |  transform(sequence(-$SearchR, $SearchR), dx -> struct(dx AS dx, dy AS dy))))""".stripMargin)))
      .withColumn("o", explode(expr(
        s"""flatten(transform(sequence(-$Half, ${Half - 1}), oy ->
           |  transform(sequence(-$Half, ${Half - 1}), ox -> struct(ox AS ox, oy AS oy))))""".stripMargin)))
      .select(col("gcp_id"), col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("sh.dx").as("dx"), col("sh.dy").as("dy"),
        (col("cx") + col("o.ox")).as("rx"), (col("cy") + col("o.oy")).as("ry"))
    val ref = pixels(spark, sfDir, "tiles")
      .withColumnRenamed("gx", "rx").withColumnRenamed("gy", "ry")
      .withColumnRenamed("val", "ref_v")
    val sec = pixels(spark, sfDir, "tiles_sec")
      .withColumnRenamed("val", "sec_v")
    probes
      .join(ref, Seq("scene_id", "subswath", "pol", "burst_idx", "rx", "ry"))
      .withColumn("gx", col("rx") + col("dx"))
      .withColumn("gy", col("ry") + col("dy"))
      .join(sec, Seq("scene_id", "subswath", "pol", "burst_idx", "gx", "gy"))
      .groupBy("gcp_id", "scene_id", "dx", "dy")
      .agg(sum(expr("(ref_v - sec_v) * (ref_v - sec_v)")).as("ssd"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("gcp_id").orderBy(asc("ssd"), asc("dy"), asc("dx"))))
      .where(col("rank") === 1)
      .select(col("gcp_id"), col("scene_id"),
        col("dx").as("est_dx"), col("dy").as("est_dy"), round(col("ssd"), 6).as("ssd_min"))
      .orderBy("gcp_id")
  }

  /** Warp fit (constant-offset model per scene, the degree-0 case of WarpOp's
   * polynomial fit): mean offset + RMS residual from the per-GCP estimates. */
  def warpFitQuery(spark: SparkSession, sfDir: String): DataFrame =
    xcorrOffsetsQuery(spark, sfDir)
      .groupBy("scene_id")
      .agg(
        count(lit(1)).as("n_gcps"),
        round(avg("est_dx"), 6).as("warp_dx"),
        round(avg("est_dy"), 6).as("warp_dy"),
        round(sqrt(greatest(lit(0.0),
          avg(expr("CAST(est_dx AS DOUBLE) * est_dx")) - pow(avg("est_dx"), 2))), 6).as("rms_dx_dev"))
      .orderBy("scene_id")

  /** Back-geocoding style coregistered stack: apply the *estimated* shift to gather
   * secondary pixels onto the reference grid, then verify per-tile agreement
   * (reference BackGeocodingOp.java:1383-1476 shape: compute alignment, resample,
   * stack). Output per tile: count + max |ref - sec_aligned|. */
  def coregStackQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val shifts = xcorrOffsetsQuery(spark, sfDir)
      .groupBy("scene_id")
      .agg(expr("CAST(round(avg(est_dx), 0) AS INT)").as("sdx"),
        expr("CAST(round(avg(est_dy), 0) AS INT)").as("sdy"))
    val ref = pixels(spark, sfDir, "tiles").withColumnRenamed("val", "ref_v")
    val sec = pixels(spark, sfDir, "tiles_sec").withColumnRenamed("val", "sec_v")
      .withColumnRenamed("gx", "sgx").withColumnRenamed("gy", "sgy")
    ref.join(broadcast(shifts), Seq("scene_id"))
      .withColumn("sgx", col("gx") + col("sdx"))
      .withColumn("sgy", col("gy") + col("sdy"))
      .join(sec, Seq("scene_id", "subswath", "pol", "burst_idx", "sgx", "sgy"))
      .groupBy(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"))
      .agg(
        count(lit(1)).as("n_px"),
        round(max(abs(col("ref_v") - col("sec_v"))), 6).as("max_abs_diff"))
      .orderBy("scene_id", "subswath", "pol", "burst_idx")
  }
}
