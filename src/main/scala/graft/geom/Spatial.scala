package graft.geom

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.cells.CellIndex
import graft.gen.Fixtures

/**
 * Spatial-join engine depth beyond the SAR operator chain — the north rule's
 * own vocabulary (H3/S2-style cell index, point-in-polygon, kNN, raster<->vector):
 *
 *  - spatialKnnQuery: distributed k-nearest-neighbour join with a CERTIFIED
 *    ring-expansion radius (the classic grid-kNN-join construction: candidates
 *    from a bounded bbox cell cover, a query is final only once its k-th
 *    distance is <= the radius that bounds every unseen point). All geometry is
 *    integer microdegrees so the result is bit-exact cross-engine.
 *  - cellCompactQuery: quadtree cover compaction (the H3 `compact` analog) —
 *    any full 4-child quad is replaced by its parent, iterated over levels.
 *    At 10^12-doc scale this is how AOI cover sets stay small enough to
 *    broadcast while still partition-pruning a cell-bucketed table.
 *  - zonalStatsQuery: raster->vector zonal statistics — per-polygon pixel
 *    count/power over the calibrated tile table, with the tile-level cell join
 *    pruning tiles BEFORE any pixel explode (the raster side never expands
 *    except for candidate (tile, polygon) pairs).
 *
 * Reference frame: the toolbox's AOI selection does the same two phases
 * (cheap bbox test then exact geometry, TOPSARSplitOp.java:261-306); these
 * queries generalize that shape to the three remaining spatial-join primitives.
 */
object Spatial {

  /** k for the kNN join gate. */
  val K = 5

  /** Start radius (microdegrees) for ring expansion — about 1.1 cell heights. */
  val StartRadiusUs = 100000L

  /** Max radius: covers the whole lon/lat plane; loop is guaranteed to certify. */
  val MaxRadiusUs = 1L << 30

  private def microdeg(c: Column): Column = floor(c * 1e6).cast("long")

  /** Query points: AOI centers, integer microdegrees (+ double lon/lat for cells). */
  private def aoiCenters(spark: SparkSession, sfDir: String): DataFrame =
    Fixtures.table(spark, sfDir, "aoi").select(
      col("aoi_id"),
      ((col("lon_min") + col("lon_max")) / 2).as("qlon"),
      ((col("lat_min") + col("lat_max")) / 2).as("qlat"),
      microdeg((col("lon_min") + col("lon_max")) / 2).as("qx"),
      microdeg((col("lat_min") + col("lat_max")) / 2).as("qy"))

  /** Data points: burst footprint centers with their level-11 cell (shuffle key). */
  private def burstCenters(spark: SparkSession, sfDir: String): DataFrame = {
    val lonC = (col("lon1") + col("lon2") + col("lon3") + col("lon4")) / 4
    val latC = (col("lat1") + col("lat2") + col("lat3") + col("lat4")) / 4
    Fixtures.table(spark, sfDir, "bursts").select(
      col("scene_id"), col("subswath"), col("burst_idx"),
      microdeg(lonC).as("px"), microdeg(latC).as("py"),
      CellIndex.cellCol(lonC, latC).as("cell"))
  }

  /**
   * Certified grid kNN join: per AOI center, the K nearest burst centers under
   * squared Euclidean microdegree distance, ties broken by (scene, subswath,
   * burst). Ring expansion doubles the candidate radius until the k-th best
   * distance is certified: a point outside the radius-r bbox has |dx| or |dy|
   * >= r+1, so d2 > r^2 — if the k-th candidate distance is <= r^2 nothing
   * unseen can displace it. Integer arithmetic end to end; the cell cover join
   * is the only join (equi on cell, data side pre-bucketed — at corpus scale
   * the points table is cell-partitioned parquet and each round touches only
   * the covered buckets; queries certify early where density is high, so the
   * expensive wide rings run for a vanishing residue of queries).
   */
  /** Cover level for a ring radius: coarsen so the bbox cover stays <= ~64
   * cells per axis (wide rings never explode into millions of level-11 cells —
   * the data side's key is re-derived by bit-shifting its packed cell). */
  private def levelFor(radiusUs: Long): Int = {
    val rdeg = radiusUs / 1e6
    var lvl = CellIndex.DefaultLevel
    while (lvl > 1 && 2 * rdeg / (180.0 / (1L << lvl)) > 64) lvl -= 1
    lvl
  }

  /** Re-pack a DefaultLevel cell at a coarser level (parent of depth d). */
  private def coarsenCol(cell: Column, lvl: Int): Column = {
    val d = CellIndex.DefaultLevel - lvl
    if (d == 0) cell
    else lit(lvl.toLong << 58).bitwiseOR(
      shiftleft(shiftright(shiftright(cell, 29).bitwiseAND(IdxMask), d), 29)
        .bitwiseOR(shiftright(cell.bitwiseAND(IdxMask), d)))
  }

  def spatialKnnQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val points = burstCenters(spark, sfDir)
    var remaining = aoiCenters(spark, sfDir)
    var radius = StartRadiusUs
    var done: DataFrame = null
    while (radius <= MaxRadiusUs && !remaining.isEmpty) {
      val rdeg = radius / 1e6
      val lvl = levelFor(radius)
      val cand = remaining
        .withColumn("cell", explode(CellIndex.coverCol(
          col("qlon") - rdeg, col("qlat") - rdeg, col("qlon") + rdeg, col("qlat") + rdeg, lvl)))
        .join(points.withColumn("cell", coarsenCol(col("cell"), lvl)), Seq("cell"))
        .where(abs(col("px") - col("qx")) <= radius && abs(col("py") - col("qy")) <= radius)
        .withColumn("d2",
          (col("px") - col("qx")) * (col("px") - col("qx")) +
          (col("py") - col("qy")) * (col("py") - col("qy")))
      val ranked = cand.withColumn("rank", row_number().over(
          Window.partitionBy("aoi_id")
            .orderBy(col("d2"), col("scene_id"), col("subswath"), col("burst_idx"))))
        .where(col("rank") <= K)
        .select("aoi_id", "rank", "scene_id", "subswath", "burst_idx", "d2")
      // certified: K candidates found and the k-th distance is inside the ring bound
      val certified = ranked.groupBy("aoi_id")
        .agg(count(lit(1)).as("n"), max("d2").as("kd2"))
        .where(col("n") === K && col("kd2") <= radius * radius)
        .select("aoi_id")
      val newDone = ranked.join(certified, Seq("aoi_id"), "left_semi")
        .select("aoi_id", "rank", "scene_id", "subswath", "burst_idx", "d2")
      done = if (done == null) newDone else done.unionByName(newDone)
      // localCheckpoint: cuts the per-round lineage so the (rare) wide rings
      // don't replan the whole expansion history
      done = done.localCheckpoint()
      remaining = remaining.join(certified, Seq("aoi_id"), "left_anti").localCheckpoint()
      radius *= 2
    }
    done
  }

  /** Compaction floor: 3 rounds, level 11 -> 8 (cells grow 8x per axis). */
  val CompactFloorLevel = 8

  private val IdxMask = (1L << 29) - 1

  /**
   * Quadtree cover compaction (H3/S2 `compact`): per AOI, the level-11 bbox
   * cover set with every full 4-child quad replaced by its parent, iterated
   * down to CompactFloorLevel. Pure integer bit arithmetic on packed cell ids;
   * each round is one (aoi, parent) aggregation — no joins on raw data, the
   * frame only shrinks. Output: (aoi_id, level, cell) of the minimal mixed-
   * level set.
   */
  def cellCompactQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val aoi = Fixtures.table(spark, sfDir, "aoi")
    var cur = aoi.select(col("aoi_id"), explode(CellIndex.coverCol(
      col("lon_min"), col("lat_min"), col("lon_max"), col("lat_max"))).as("cell"))
    for (lvl <- CellIndex.DefaultLevel until CompactFloorLevel by -1) {
      val atLvl = cur.where(shiftright(col("cell"), 58) === lvl)
        .withColumn("parent",
          lit((lvl - 1).toLong << 58).bitwiseOR(
            shiftleft(shiftright(shiftright(col("cell"), 29).bitwiseAND(IdxMask), 1), 29)
              .bitwiseOR(shiftright(col("cell").bitwiseAND(IdxMask), 1))))
      val full = atLvl.groupBy("aoi_id", "parent")
        .agg(count(lit(1)).as("n")).where(col("n") === 4)
        .select(col("aoi_id"), col("parent"))
      cur = cur.where(shiftright(col("cell"), 58) =!= lvl)
        .unionByName(full.select(col("aoi_id"), col("parent").as("cell")))
        .unionByName(atLvl.join(full, Seq("aoi_id", "parent"), "left_anti")
          .select("aoi_id", "cell"))
    }
    cur.select(col("aoi_id"), shiftright(col("cell"), 58).as("level"), col("cell"))
  }

  /**
   * Raster->vector zonal statistics: per AOI polygon, the pixel count, tile
   * count, and quantized total power of all VV pixels whose geodetic position
   * (the same burst-bilinear geolocation the span pipeline uses,
   * ops/Spans.scala:53-57) falls inside the polygon. Plan shape for 100 TB:
   * tile bbox cover x AOI cover equi-join picks candidate (tile, aoi) PAIRS
   * first (tile arrays untouched), pixels explode only for candidates, and
   * the exact point-in-polygon filter runs map-side on the exploded rows.
   */
  def zonalStatsQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val w = graft.model.Layout.SamplesPerBurst // 128
    val h = graft.model.Layout.LinesPerBurst   // 64
    val tw = graft.model.Layout.TileW
    val th = graft.model.Layout.TileH
    val aoiCells = Fixtures.table(spark, sfDir, "aoi")
      .withColumn("cell", explode(CellIndex.coverCol(
        col("lon_min"), col("lat_min"), col("lon_max"), col("lat_max"))))
    val bursts = Fixtures.table(spark, sfDir, "bursts")
      .select("scene_id", "subswath", "burst_idx",
        "lon1", "lat1", "lon2", "lat2", "lon4", "lat4")
    val tiles = Fixtures.table(spark, sfDir, "tiles").where(col("pol") === "VV")
    // tile corner geolocation -> bbox -> cell cover (corners at u in {x0/w, x1/w},
    // v in {y0/h, y1/h}; the bilinear map is monotone in u and v so corner
    // extrema bound the tile)
    def lonAt(u: Column, v: Column): Column =
      col("lon1") + u * (col("lon2") - col("lon1")) + v * (col("lon4") - col("lon1"))
    def latAt(v: Column): Column = col("lat1") + v * (col("lat4") - col("lat1"))
    val u0 = col("tile_x") * tw / lit(w.toDouble)
    val u1 = (col("tile_x") + 1) * tw / lit(w.toDouble)
    val v0 = col("tile_y") * th / lit(h.toDouble)
    val v1 = (col("tile_y") + 1) * th / lit(h.toDouble)
    val tileKeyed = tiles.select("scene_id", "subswath", "burst_idx", "tile_x", "tile_y")
      .join(broadcast(bursts), Seq("scene_id", "subswath", "burst_idx"))
    val tileCells = tileKeyed.withColumn("cell", explode(CellIndex.coverCol(
      least(lonAt(u0, v0), lonAt(u1, v0), lonAt(u0, v1), lonAt(u1, v1)),
      least(latAt(v0), latAt(v1)),
      greatest(lonAt(u0, v0), lonAt(u1, v0), lonAt(u0, v1), lonAt(u1, v1)),
      greatest(latAt(v0), latAt(v1)))))
    // candidate (tile, aoi) pairs — distinct BEFORE touching pixel arrays
    val pairs = tileCells.join(broadcast(aoiCells.select(
        col("cell"), col("aoi_id"), col("lon_min"), col("lat_min"),
        col("lon_max"), col("lat_max"))), Seq("cell"))
      .select("aoi_id", "lon_min", "lat_min", "lon_max", "lat_max",
        "scene_id", "subswath", "burst_idx", "tile_x", "tile_y",
        "lon1", "lat1", "lon2", "lat2", "lon4", "lat4")
      .distinct()
    val px = pairs.join(tiles.select("scene_id", "subswath", "burst_idx",
        "tile_x", "tile_y", "i", "q", "no_data"),
        Seq("scene_id", "subswath", "burst_idx", "tile_x", "tile_y"))
      .select(col("*"), posexplode(col("i")).as(Seq("k", "iv")))
      .withColumn("qv", element_at(col("q"), col("k") + 1))
      .where(col("iv") =!= col("no_data"))
      .withColumn("u", (col("tile_x") * tw + col("k") % tw + 0.5) / w)
      .withColumn("v", (col("tile_y") * th + floor(col("k") / tw) + 0.5) / h)
      .withColumn("lon", lonAt(col("u"), col("v")))
      .withColumn("lat", latAt(col("v")))
      .where(col("lon").between(col("lon_min"), col("lon_max")) &&
             col("lat").between(col("lat_min"), col("lat_max")))
    px.groupBy("aoi_id").agg(
      count(lit(1)).as("n_px"),
      countDistinct(col("scene_id"), col("subswath"), col("burst_idx"),
        col("tile_x"), col("tile_y")).as("n_tiles"),
      sum(floor(lit(0.031415926535897934) + (col("iv") * col("iv") + col("qv") * col("qv")) * 1e6)
        .cast("long")).as("pow_q"))
  }
}
