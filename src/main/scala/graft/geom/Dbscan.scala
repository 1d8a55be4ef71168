package graft.geom

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.cells.CellIndex

/**
 * Grid DBSCAN — the PostGIS `ST_ClusterDBSCAN` analog over the geolocated
 * media-span point cloud, in the grid formulation (GriDBSCAN): eps is the
 * level-11 cell lattice (a point's eps-neighborhood is its 3x3 cell block),
 * a point is CORE iff its 3x3 block holds >= MinPts points, clusters are the
 * connected components of core CELLS under Chebyshev-1 adjacency, BORDER
 * points sit in a non-core cell touching >= 1 core cell (assigned the min
 * cluster label among them — deterministic tie-break), everything else is
 * NOISE.
 *
 * Scale shape: the point set is touched exactly twice (one groupBy(cell)
 * count, one final broadcast join of the tiny cell->role map back onto the
 * points); the ITERATIVE part — convergence-checked min-label propagation —
 * runs on the reduced cell graph only (occupied cells ~ points/density,
 * bounded by the grid size, never the raw points). At 10^12 docs the cell
 * frame is still only as large as the occupied grid, so rounds are narrow
 * shuffles over aggregates; labels only decrease, so the DECIMAL label sum is
 * strictly decreasing until the true fixed point (same convergence device as
 * ops.Detection2.ccClusters, which propagates over raw pixels instead).
 *
 * Reference frame: the toolbox clusters CFAR detections / dark pixels by
 * 8-connected components (ObjectDiscriminationOp.java:74,
 * OilSpillClusteringOp.java:46); DBSCAN generalizes that to density-gated
 * clustering with the core/border/noise split.
 */
object Dbscan {

  /** Min points in the 3x3 cell neighborhood for a core cell (point counts at
   * sf0.01 range 116..639 per block — 400 splits the fixture into 23 clusters
   * with all three roles populated). */
  val MinPts = 400L

  val Level = CellIndex.DefaultLevel // 11
  private val N = 1L << Level
  private val IdxMask = (1L << 29) - 1

  private def ixOf(cell: org.apache.spark.sql.Column) = cell.bitwiseAND(IdxMask)
  private def iyOf(cell: org.apache.spark.sql.Column) = shiftright(cell, 29).bitwiseAND(IdxMask)

  /** Explode a cell frame to its 3x3 Chebyshev neighborhood (self included),
   * dropping off-grid neighbors — identical boundary rule in the oracle. */
  private def explodeNbrs(df: DataFrame, cellCol: String, out: String): DataFrame = {
    val offs = expr("explode(array(" +
      (for (dy <- -1 to 1; dx <- -1 to 1) yield s"struct(${dy}L AS dy, ${dx}L AS dx)")
        .mkString(", ") + "))")
    df.withColumn("o", offs)
      .withColumn("nix", ixOf(col(cellCol)) + col("o.dx"))
      .withColumn("niy", iyOf(col(cellCol)) + col("o.dy"))
      .where(col("nix") >= 0 && col("nix") < N && col("niy") >= 0 && col("niy") < N)
      .withColumn(out, CellIndex.packCol(Level, col("niy"), col("nix")))
      .drop("o", "nix", "niy")
  }

  def dbscanQuery(spark: SparkSession, sfDir: String): DataFrame =
    dbscanQuery(spark, sfDir, MinPts)

  /** minPts-parameterized form: the gate uses MinPts (tuned to the sf0.01
   * density the oracle hardcodes); the spec drops it to keep all three roles
   * populated on the 10x-sparser sf0.001 test fixture. */
  def dbscanQuery(spark: SparkSession, sfDir: String, minPts: Long): DataFrame = {
    val pts = graft.ops.Spans.geolocatedMediaSpans(spark, sfDir)
      .select(col("doc_id"), col("offset"), col("cell"))
    // one aggregation pass over the raw points -> occupied-cell counts
    val counts = pts.groupBy("cell").agg(count(lit(1)).as("n")).localCheckpoint()
    // density per cell = sum of counts over the 3x3 block (scatter form: each
    // occupied cell contributes its count to its 9 neighbors)
    val density = explodeNbrs(counts, "cell", "tgt")
      .groupBy(col("tgt").as("cell")).agg(sum("n").as("nbr_n"))
    val coreCells = density.where(col("nbr_n") >= minPts)
      .join(counts.select("cell"), Seq("cell"), "leftsemi") // occupied core cells only
      .select("cell").localCheckpoint()
    // min-label propagation over core-cell Chebyshev-1 adjacency, run to the
    // exact fixed point (labels only decrease -> strictly decreasing sum)
    var labels = coreCells.withColumn("label", col("cell")).localCheckpoint()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.select(sum(col("label").cast(DecimalType(38, 0)))).collect()(0).getDecimal(0)
    var prev = labelSum(labels)
    var converged = prev == null
    var rounds = 0
    while (!converged && rounds < 64) {
      val contrib = explodeNbrs(labels, "cell", "tgt")
        .select(col("tgt").as("cell"), col("label"))
      val next = contrib.join(coreCells, Seq("cell"), "leftsemi")
        .groupBy("cell").agg(min("label").as("label"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(prev) == 0
      prev = s
      labels = next
      rounds += 1
    }
    // cell -> (role, cluster): core cells carry their own component label;
    // non-core occupied cells take the min label of adjacent core cells
    val borderLabel = explodeNbrs(counts.select("cell"), "cell", "tgt")
      .join(labels.withColumnRenamed("cell", "tgt"), Seq("tgt"))
      .groupBy("cell").agg(min("label").as("blabel"))
    val cellRole = counts.select("cell")
      .join(labels, Seq("cell"), "left")
      .join(borderLabel, Seq("cell"), "left")
      .select(col("cell"),
        when(col("label").isNotNull, lit("core"))
          .when(col("blabel").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("label"), col("blabel")).as("cluster"))
    // second and final pass over the points: broadcast the tiny role map
    pts.join(broadcast(cellRole), Seq("cell"))
      .select(col("doc_id"), col("offset"), col("role"), col("cluster"))
  }
}
