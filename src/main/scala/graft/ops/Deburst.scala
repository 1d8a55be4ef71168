package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.gen.Fixtures

/**
 * TOPSAR-Deburst line assignment (reference TOPSARDeburstOp.java:168-232, 1152-1183):
 * the output azimuth grid spans [min firstLineTime, max lastLineTime] at
 * azimuthTimeInterval; each target line t maps to the burst whose interval contains it,
 * overlaps resolved by the midTime rule — take burst i if t <= mid(last_i, first_{i+1})
 * else burst i+1 (:1176-1181).
 *
 * Spark shape: turn the midTime rule into per-burst half-open *effective* ownership
 * windows (lag/lead over the tiny burst dimension table), generate target lines, then a
 * broadcast interval join — at most one burst matches each line, so no dedup pass.
 */
object Deburst {

  def query(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("scene_id", "subswath").orderBy("burst_idx")
    val bursts = Fixtures.table(spark, sfDir, "bursts")
      .select("scene_id", "subswath", "burst_idx", "burst_first_line_time", "burst_last_line_time")
      .withColumn("own_from", // exclusive
        when(lag("burst_idx", 1).over(w).isNull, lit(Double.NegativeInfinity))
          .otherwise((lag("burst_last_line_time", 1).over(w) + col("burst_first_line_time")) / 2))
      .withColumn("own_to", // inclusive
        when(lead("burst_idx", 1).over(w).isNull, lit(Double.PositiveInfinity))
          .otherwise((col("burst_last_line_time") + lead("burst_first_line_time", 1).over(w)) / 2))

    val grid = Fixtures.table(spark, sfDir, "bursts")
      .groupBy("scene_id", "subswath")
      .agg(min("burst_first_line_time").as("t0"), max("burst_last_line_time").as("t1"))
      .join(Fixtures.table(spark, sfDir, "scenes").select("scene_id", "azimuth_time_interval"), Seq("scene_id"))
      .withColumn("line", explode(expr("sequence(0, CAST(round((t1 - t0) / azimuth_time_interval, 0) AS INT))")))
      .withColumn("t", col("t0") + col("line") * col("azimuth_time_interval"))

    grid.join(broadcast(bursts), Seq("scene_id", "subswath"))
      .where(col("t") > col("own_from") && col("t") <= col("own_to") &&
        col("t") >= col("burst_first_line_time") - col("azimuth_time_interval") / 2 &&
        col("t") <= col("burst_last_line_time") + col("azimuth_time_interval") / 2)
      .select(col("scene_id"), col("subswath"), col("line"), col("burst_idx"),
        expr("CAST(round((t - burst_first_line_time) / azimuth_time_interval, 0) AS INT)").as("local_line"))
  }
}
