package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cells.CellIndex
import graft.geom.Spatial
import graft.gen.Fixtures

/** The spatial-join-engine gates recomputed from scratch in plain Scala:
 * certified ring-expansion kNN vs brute force, quadtree compaction vs a direct
 * set iteration (plus the expansion-roundtrip invariant), zonal statistics vs
 * a per-pixel loop. */
class SpatialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.Sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def md(x: Double): Long = math.floor(x * 1e6).toLong

  test("spatial kNN join equals brute force exactly (certified ring expansion)") {
    val aois = Fixtures.table(spark, sf, "aoi")
      .select("aoi_id", "lon_min", "lat_min", "lon_max", "lat_max")
      .as[(String, Double, Double, Double, Double)].collect()
    val bursts = Fixtures.table(spark, sf, "bursts")
      .selectExpr("scene_id", "subswath", "burst_idx",
        "(lon1 + lon2 + lon3 + lon4) / 4", "(lat1 + lat2 + lat3 + lat4) / 4")
      .as[(String, String, Int, Double, Double)].collect()
    val expected = (for {
      (aid, lo0, la0, lo1, la1) <- aois
      qx = md((lo0 + lo1) / 2); qy = md((la0 + la1) / 2)
      ranked = bursts.map { case (sc, sw, b, lon, lat) =>
          val dx = md(lon) - qx; val dy = md(lat) - qy
          (dx * dx + dy * dy, sc, sw, b)
        }.sortBy(identity).take(Spatial.K).zipWithIndex
      ((d2, sc, sw, b), i) <- ranked
    } yield (aid, i + 1, sc, sw, b, d2)).toSet
    val got = Spatial.spatialKnnQuery(spark, sf)
      .as[(String, Int, String, String, Int, Long)].collect().toSet
    assert(got == expected)
  }

  test("cell compaction equals a direct set iteration and expands back to the cover") {
    val aois = Fixtures.table(spark, sf, "aoi")
      .select("aoi_id", "lon_min", "lat_min", "lon_max", "lat_max")
      .as[(String, Double, Double, Double, Double)].collect()
    val mask = (1L << 29) - 1
    def parent(cell: Long): Long = {
      val lvl = cell >> 58
      ((lvl - 1) << 58) | ((((cell >> 29) & mask) >> 1) << 29) | ((cell & mask) >> 1)
    }
    def compact(cover: Set[Long]): Set[Long] =
      (CellIndex.DefaultLevel until Spatial.CompactFloorLevel by -1).foldLeft(cover) { (cur, lvl) =>
        val (at, rest) = cur.partition(c => (c >> 58) == lvl)
        val full = at.groupBy(parent).collect { case (p, kids) if kids.size == 4 => p }.toSet
        rest ++ full ++ at.filterNot(c => full.contains(parent(c)))
      }
    val expected = (for {
      (aid, lo0, la0, lo1, la1) <- aois
      cover = CellIndex.cover(lo0, la0, lo1, la1).toSet
      c <- compact(cover)
    } yield (aid, c >> 58, c)).toSet
    val got = Spatial.cellCompactQuery(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
    // roundtrip: expanding every compacted cell back to level 11 reproduces the
    // cover exactly, with no overlap between compacted cells
    for ((aid, lo0, la0, lo1, la1) <- aois) {
      val cover = CellIndex.cover(lo0, la0, lo1, la1).toSet
      val cells = got.collect { case (a, _, c) if a == aid => c }
      val expanded = cells.toSeq.flatMap { c =>
        val lvl = (c >> 58).toInt; val d = CellIndex.DefaultLevel - lvl
        val iy = (c >> 29) & mask; val ix = c & mask
        for {
          dy <- 0L until (1L << d); dx <- 0L until (1L << d)
        } yield CellIndex.pack(CellIndex.DefaultLevel, (iy << d) + dy, (ix << d) + dx)
      }
      assert(expanded.size == expanded.toSet.size, s"$aid: compacted cells overlap")
      assert(expanded.toSet == cover, s"$aid: expansion does not reproduce the cover")
    }
    // the fixture actually exercises promotion: some cell sits above level 11
    assert(got.exists(_._2 < CellIndex.DefaultLevel), "no cell was ever promoted")
  }

  test("zonal statistics equal a per-pixel reference loop") {
    val tiles = Fixtures.table(spark, sf, "tiles").where(col("pol") === "VV")
      .select("scene_id", "subswath", "burst_idx", "tile_x", "tile_y", "i", "q", "no_data")
      .as[(String, String, Int, Int, Int, Array[Double], Array[Double], Double)].collect()
    val bursts = Fixtures.table(spark, sf, "bursts")
      .select("scene_id", "subswath", "burst_idx", "lon1", "lat1", "lon2", "lat2", "lon4", "lat4")
      .as[(String, String, Int, Double, Double, Double, Double, Double, Double)].collect()
      .map(b => (b._1, b._2, b._3) -> ((b._4, b._5, b._6, b._7, b._8, b._9))).toMap
    val aois = Fixtures.table(spark, sf, "aoi")
      .select("aoi_id", "lon_min", "lat_min", "lon_max", "lat_max")
      .as[(String, Double, Double, Double, Double)].collect()
    val acc = scala.collection.mutable.Map.empty[String, (Long, Set[(String, String, Int, Int, Int)], Long)]
    for ((sc, sw, b, tx, ty, iv, qv, nd) <- tiles) {
      val (lon1, lat1, lon2, lat2, lon4, lat4) = bursts((sc, sw, b))
      for (k <- 0 until 1024 if iv(k) != nd) {
        val u = (tx * 32 + k % 32 + 0.5) / 128
        val v = (ty * 32 + math.floor(k.toDouble / 32) + 0.5) / 64
        val lon = lon1 + u * (lon2 - lon1) + v * (lon4 - lon1)
        val lat = lat1 + v * (lat4 - lat1)
        for ((aid, lo0, la0, lo1, la1) <- aois
             if lon >= lo0 && lon <= lo1 && lat >= la0 && lat <= la1) {
          val p = math.floor(0.031415926535897934 + (iv(k) * iv(k) + qv(k) * qv(k)) * 1e6).toLong
          val (n, ts, pw) = acc.getOrElse(aid, (0L, Set.empty[(String, String, Int, Int, Int)], 0L))
          acc(aid) = (n + 1, ts + ((sc, sw, b, tx, ty)), pw + p)
        }
      }
    }
    val expected = acc.map { case (aid, (n, ts, pw)) => (aid, n, ts.size.toLong, pw) }.toSet
    val got = Spatial.zonalStatsQuery(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("spatial gates keep scale-shaped plans (no cartesian, aoi side broadcast)") {
    val pk = plan(Spatial.spatialKnnQuery(spark, sf))
    assert(!pk.contains("CartesianProduct") && !pk.contains("BroadcastNestedLoopJoin"), pk.take(2000))
    val pz = plan(Spatial.zonalStatsQuery(spark, sf))
    assert(!pz.contains("CartesianProduct") && !pz.contains("BroadcastNestedLoopJoin"), pz.take(2000))
    assert(pz.contains("BroadcastHashJoin"), pz.take(2000))
    val pc = plan(Spatial.cellCompactQuery(spark, sf))
    assert(!pc.contains("CartesianProduct"), pc.take(2000))
  }
}
