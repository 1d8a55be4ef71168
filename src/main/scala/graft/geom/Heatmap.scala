package graft.geom

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cells.CellIndex

/**
 * Spatial density surface (heatmap): level-11 cell counts of the geolocated
 * media spans smoothed by the 5x5 binomial kernel (1,4,6,4,1)⊗(1,4,6,4,1) —
 * the discrete-Gaussian KDE a tile server renders.
 *
 * The engine exploits SEPARABILITY: two 1-D passes (x then y) with fan-out 5
 * each instead of one 2-D scatter with fan-out 25 — at corpus scale that
 * halves the shuffled row volume (10x vs 25x the occupied-cell frame) for the
 * identical integer result, because the binomial kernel factorizes exactly:
 * w(dx,dy) = w(dx)*w(dy). The DuckDB oracle deliberately computes the DIRECT
 * 2-D 25-term scatter — a genuinely different factorization of the same
 * mathematical object, so agreement checks the algebra, not the plan. The
 * kernel is truncated at the grid border identically on both sides. All
 * integer (counts x binomial weights) — bit-exact cross-engine.
 */
object Heatmap {

  val Weights = Seq(1L, 4L, 6L, 4L, 1L) // binomial(4, k) — sums to 16
  private val N = 1L << CellIndex.DefaultLevel
  private val IdxMask = (1L << 29) - 1

  /** Coarsest pyramid level (finest is CellIndex.DefaultLevel = 11). */
  val PyramidFloor = 8

  /**
   * Tile pyramid (web-map zoom stack / raster overviews): the level-11 cell
   * counts rolled up through levels 10..8 by quadtree parent aggregation —
   * each zoom level is the exact sum of its four children, computed by ONE
   * pass per level over the already-reduced previous level (cascading
   * rollup: the raw points are aggregated once at the finest level, every
   * coarser level reduces the cell frame, never the points — at 10^12 docs
   * the pyramid costs one point-level shuffle plus log-many tiny ones).
   * Output is the union of all levels, keyed by packed cell id (level in the
   * id's high bits).
   */
  def tilePyramidQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val base = graft.ops.Spans.geolocatedMediaSpans(spark, sfDir)
      .groupBy("cell").agg(count(lit(1)).as("n"))
    val levels = Iterator.iterate(base) { prev =>
      // parent: level-1, iy/2, ix/2 — pure integer bit arithmetic on the id
      prev.groupBy(
        ((shiftright(col("cell"), 58) - 1) * lit(1L << 58)
          + shiftright(shiftright(col("cell"), 29).bitwiseAND(IdxMask), 1) * lit(1L << 29)
          + shiftright(col("cell").bitwiseAND(IdxMask), 1)).as("cell"))
        .agg(sum("n").as("n"))
    }.take(CellIndex.DefaultLevel - PyramidFloor + 1).toSeq
    levels.reduce(_ unionByName _)
      .select(shiftright(col("cell"), 58).as("level"), col("cell"), col("n"))
  }

  /**
   * Spatial data card: the release report of the spatial family as ONE
   * long-format (metric, value) frame — reports are queries, not a separate
   * system (the corpus q_data_card device applied to geometry). Every row is
   * an aggregate of an ALREADY-GATED operator, so the card is a composition
   * proof: footprint counts, dissolved union area, exact shoelace area mass,
   * polyfill fill/interior cells, coverage-gap totals, DBSCAN cluster/noise
   * counts, pyramid/layout bucket counts. All BIGINT so the union compares
   * exactly cross-engine.
   */
  def spatialCardQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.geom.{Spatial, Dbscan}
    def one(metric: String, v: org.apache.spark.sql.Column, df: DataFrame): DataFrame =
      df.agg(v.cast("long").as("value")).select(lit(metric).as("metric"), col("value"))
    val bursts = graft.gen.Fixtures.table(spark, sfDir, "bursts")
    val fill = Spatial.polyfillQuery(spark, sfDir)
    val dbscan = Dbscan.dbscanQuery(spark, sfDir)
    Seq(
      one("n_bursts", count(lit(1)), bursts),
      one("n_scenes", countDistinct(col("scene_id")), bursts),
      one("union_area_total", sum(col("area")), Spatial.unionAreaQuery(spark, sfDir)),
      one("footprint_area2_total", sum(col("area2")), Spatial.shoelaceQuery(spark, sfDir)),
      one("fill_cells", count(lit(1)), fill),
      one("fill_interior_cells", count(lit(1)), fill.where(col("kind") === "in")),
      one("gap_cells_total", sum(col("n_gap")), Spatial.coverageGapQuery(spark, sfDir)),
      one("dbscan_clusters", countDistinct(col("cluster")), dbscan),
      one("dbscan_noise_pts", count(lit(1)), dbscan.where(col("role") === "noise")),
      one("pyramid_l8_cells", count(lit(1)),
        tilePyramidQuery(spark, sfDir).where(col("level") === 8)),
      one("zorder_buckets", count(lit(1)), Spatial.zorderQuery(spark, sfDir)),
      one("hilbert_buckets", count(lit(1)), Spatial.hilbertQuery(spark, sfDir))
    ).reduce(_ unionByName _)
  }

  def heatmapQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = graft.ops.Spans.geolocatedMediaSpans(spark, sfDir)
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .withColumn("ix", col("cell").bitwiseAND(IdxMask))
      .withColumn("iy", shiftright(col("cell"), 29).bitwiseAND(IdxMask))
    val offs = expr("explode(array(" +
      Weights.zipWithIndex.map { case (w, i) => s"struct(${i - 2}L AS d, ${w}L AS w)" }
        .mkString(", ") + "))")
    // pass 1: smooth along x (fan-out 5)
    val gx = counts.withColumn("o", offs)
      .withColumn("tix", col("ix") + col("o.d"))
      .where(col("tix") >= 0 && col("tix") < N)
      .groupBy(col("tix").as("ix"), col("iy"))
      .agg(sum(col("n") * col("o.w")).as("gx"))
    // pass 2: smooth along y (fan-out 5)
    gx.withColumn("o", offs)
      .withColumn("tiy", col("iy") + col("o.d"))
      .where(col("tiy") >= 0 && col("tiy") < N)
      .groupBy(col("ix"), col("tiy").as("iy"))
      .agg(sum(col("gx") * col("o.w")).as("density"))
      .select(CellIndex.packCol(CellIndex.DefaultLevel, col("iy"), col("ix")).as("cell"),
        col("density"))
  }
}
