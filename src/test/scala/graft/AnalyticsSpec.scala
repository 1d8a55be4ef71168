package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.geom.{Analytics, GraphOps}
import graft.gen.Fixtures

/** The spatial-analytics + graph + maintenance gates recomputed from scratch in
 * plain Scala: K-direction hull argmax/shoelace, IDW integer weighting, Moran
 * sufficient statistics, k-core peeling, bounded BFS, stratified bottom-k
 * sampling, and prefix-sum compaction binning. */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.Sf

  private def md(x: Double): Long = math.floor(x * 1e6).toLong

  /** Geolocated media-span points (scene, px, py) — input shared with the
   * engine; its own derivation is separately gated (q_span_cells). */
  private lazy val pts: Array[(String, Long, Long)] =
    graft.ops.Spans.geolocatedMediaSpans(spark, sf)
      .selectExpr("scene_id", "CAST(floor(lon * 1e6) AS LONG)", "CAST(floor(lat * 1e6) AS LONG)")
      .as[(String, Long, Long)].collect()

  test("convex hull: extremes, vertex count and doubled shoelace area match a direct recompute") {
    val expected = pts.groupBy(_._1).map { case (scene, ps) =>
      val ext = Analytics.Dirs.map { case (dx, dy) =>
        ps.map { case (_, px, py) => (dx * px + dy * py, -px, -py, px, py) }.max match {
          case (_, _, _, px, py) => (px, py)
        }
      }
      val k = ext.size
      val area2 = math.abs((0 until k).map { i =>
        val (x1, y1) = ext(i); val (x2, y2) = ext((i + 1) % k)
        x1 * y2 - x2 * y1
      }.sum)
      (scene, ps.length.toLong, ext.distinct.size.toLong, area2)
    }.toSet
    val got = Analytics.convexHullQuery(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.forall(_._4 > 0L)) // every scene's hull is non-degenerate
  }

  test("IDW: integer weights, neighbor counts and floor-div estimate match a direct recompute") {
    val dem = Fixtures.table(spark, sf, "dem")
      .selectExpr("CAST(floor(lon * 1e6) AS LONG)", "CAST(floor(lat * 1e6) AS LONG)",
        "CAST(floor(height * 1000) AS LONG)")
      .as[(Long, Long, Long)].collect()
    val aois = Fixtures.table(spark, sf, "aoi")
      .select("aoi_id", "lon_min", "lat_min", "lon_max", "lat_max")
      .as[(String, Double, Double, Double, Double)].collect()
    val r = Analytics.IdwRadiusUs
    val expected = aois.flatMap { case (aid, lo0, la0, lo1, la1) =>
      val qx = md((lo0 + lo1) / 2); val qy = md((la0 + la1) / 2)
      val nb = dem.flatMap { case (px, py, hq) =>
        val d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
        if (d2 <= r * r) {
          val w = math.floor(1.0e12 / math.max(d2, 1000000L).toDouble).toLong
          Some((w, hq))
        } else None
      }
      if (nb.isEmpty) None
      else {
        val wSum = nb.map(_._1).sum
        val whSum = nb.map { case (w, h) => w * h }.sum
        Some((aid, nb.length.toLong, wSum, whSum * 1000 / wSum))
      }
    }.toSet
    val got = Analytics.idwQuery(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  /** Occupied level-11 grid cells with counts, from the shared points. */
  private lazy val cellCounts: Map[(Long, Long), Long] =
    // recompute from raw lon/lat (grid formula is on the doubles, not microdeg)
    graft.ops.Spans.geolocatedMediaSpans(spark, sf)
      .selectExpr(
        "CAST(least(2047, greatest(0, floor((lon + 180.0) / 360.0 * 2048.0))) AS LONG)",
        "CAST(least(2047, greatest(0, floor((lat + 90.0) / 180.0 * 2048.0))) AS LONG)")
      .as[(Long, Long)].collect()
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("Moran's I: sufficient statistics match a direct recompute over the occupied-cell lattice") {
    val cnt = cellCounts
    val n = cnt.size.toLong
    val sumX = cnt.values.sum
    val sumX2 = cnt.values.map(x => x * x).sum
    val offs = Seq((1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L))
    val nbr = for {
      ((ix, iy), xa) <- cnt.toSeq
      (dx, dy) <- offs
      xb <- cnt.get((ix + dx, iy + dy))
    } yield (xa, xb)
    val wSum = nbr.size.toLong
    val crossSum = nbr.map { case (a, b) => a * b }.sum
    val degXSum = nbr.map(_._1).sum
    val row = Analytics.moranQuery(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(row.length == 1)
    val (gn, gw, gsx, gsx2, gcs, gdx, moranQ) = row.head
    assert((gn, gw, gsx, gsx2, gcs, gdx) == ((n, wSum, sumX, sumX2, crossSum, degXSum)))
    // sanity range: |I| is O(1) (the sign is data-dependent at tiny scale —
    // slightly negative at sf0.001, positive at sf0.01)
    assert(math.abs(moranQ) < 2000000L)
  }

  test("k-core: peel fixpoint matches a direct recompute at every k, with real peeling") {
    val occ = cellCounts.keySet
    val adj0: Map[(Long, Long), Set[(Long, Long)]] = occ.map { case (x, y) =>
      (x, y) -> (for {
        dx <- -1L to 1L; dy <- -1L to 1L
        if (dx, dy) != ((0L, 0L)) && occ((x + dx, y + dy))
      } yield (x + dx, y + dy)).toSet
    }.toMap
    def pack(ix: Long, iy: Long): Long = (11L << 58) | (iy << 29) | ix
    val expected = GraphOps.CoreKs.flatMap { k =>
      var adj = adj0
      var changed = true
      while (changed) {
        val bad = adj.filter(_._2.size < k).keySet
        changed = bad.nonEmpty
        adj = (adj -- bad).map { case (u, vs) => u -> (vs -- bad) }
      }
      adj.map { case ((ix, iy), vs) => (k.toLong, pack(ix, iy), vs.size.toLong) }
    }.toSet
    val got = GraphOps.kcoreQuery(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
    // the gate exercises actual peeling: some occupied cell is outside the core
    GraphOps.CoreKs.foreach { k =>
      assert(got.count(_._1 == k) < occ.size)
    }
  }

  test("BFS hops: bounded multi-source expansion matches a direct recompute") {
    val aoi = Fixtures.table(spark, sf, "aoi")
      .select("aoi_id", "lon_min", "lat_min", "lon_max", "lat_max")
      .as[(String, Double, Double, Double, Double)].collect().minBy(_._1)
    val bursts = Fixtures.table(spark, sf, "bursts")
      .selectExpr("concat_ws('/', scene_id, subswath, CAST(burst_idx AS STRING))",
        "CAST(floor((lon1 + lon2 + lon3 + lon4) / 4 * 1e6) AS LONG)",
        "CAST(floor((lat1 + lat2 + lat3 + lat4) / 4 * 1e6) AS LONG)")
      .as[(String, Long, Long)].collect()
    val (x0, y0, x1, y1) = (md(aoi._2), md(aoi._3), md(aoi._4), md(aoi._5))
    val seeds = bursts.collect {
      case (n, px, py) if px >= x0 && px <= x1 && py >= y0 && py <= y1 => n
    }.toSet
    val d = Spatial.TriDistUs
    val adj = bursts.flatMap { case (u, ux, uy) =>
      bursts.collect { case (v, vx, vy)
        if v != u && (ux - vx) * (ux - vx) + (uy - vy) * (uy - vy) <= d * d => (u, v) }
    }.groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (h <- 1 to GraphOps.BfsHops) {
      val next = frontier.flatMap(u => adj.getOrElse(u, Set.empty)) -- dist.keySet
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    val got = GraphOps.bfsHopsQuery(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(got == dist)
    assert(seeds.nonEmpty)
  }

  test("SSSP: weighted Bellman-Ford fixpoint matches a direct Dijkstra recompute") {
    val aoi = Fixtures.table(spark, sf, "aoi")
      .select("aoi_id", "lon_min", "lat_min", "lon_max", "lat_max")
      .as[(String, Double, Double, Double, Double)].collect().minBy(_._1)
    val bursts = Fixtures.table(spark, sf, "bursts")
      .selectExpr("concat_ws('/', scene_id, subswath, CAST(burst_idx AS STRING))",
        "CAST(floor((lon1 + lon2 + lon3 + lon4) / 4 * 1e6) AS LONG)",
        "CAST(floor((lat1 + lat2 + lat3 + lat4) / 4 * 1e6) AS LONG)")
      .as[(String, Long, Long)].collect()
    val (x0, y0, x1, y1) = (md(aoi._2), md(aoi._3), md(aoi._4), md(aoi._5))
    val seeds = bursts.collect {
      case (n, px, py) if px >= x0 && px <= x1 && py >= y0 && py <= y1 => n
    }.toSet
    val d = Spatial.TriDistUs
    val wadj = bursts.flatMap { case (u, ux, uy) =>
      bursts.collect { case (v, vx, vy)
        if v != u && (ux - vx) * (ux - vx) + (uy - vy) * (uy - vy) <= d * d =>
          (u, v, (ux - vx) * (ux - vx) + (uy - vy) * (uy - vy)) }
    }.groupBy(_._1).map { case (u, es) => u -> es.map(e => (e._2, e._3)) }
    // Dijkstra from the multi-seed set
    val dist = scala.collection.mutable.Map(seeds.toSeq.map(_ -> 0L): _*)
    val pq = scala.collection.mutable.PriorityQueue(
      seeds.toSeq.map(s => (0L, s)): _*)(Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (du, u) = pq.dequeue()
      if (dist(u) == du)
        wadj.getOrElse(u, Array.empty[(String, Long)]).foreach { case (v, w) =>
          if (dist.get(v).forall(_ > du + w)) { dist(v) = du + w; pq.enqueue((du + w, v)) }
        }
    }
    val got = GraphOps.ssspQuery(spark, sf).as[(String, Long)].collect().toMap
    assert(got == dist.toMap)
    // real multi-hop relaxation: some node's shortest path uses >1 edge
    val maxEdge = d * d
    assert(got.values.exists(_ > maxEdge))
  }

  test("kNN join: bounded-radius candidates and rank order match a brute-force recompute") {
    val bursts = Fixtures.table(spark, sf, "bursts")
      .selectExpr("concat_ws('/', scene_id, subswath, CAST(burst_idx AS STRING))",
        "CAST(floor((lon1 + lon2 + lon3 + lon4) / 4 * 1e6) AS LONG)",
        "CAST(floor((lat1 + lat2 + lat3 + lat4) / 4 * 1e6) AS LONG)")
      .as[(String, Long, Long)].collect()
    val dem = Fixtures.table(spark, sf, "dem")
      .selectExpr("CAST(floor(lon * 1e6) AS LONG)", "CAST(floor(lat * 1e6) AS LONG)",
        "CAST(floor(height * 1000) AS LONG)")
      .as[(Long, Long, Long)].collect()
    val r = Analytics.KnnRadiusUs
    val expected = bursts.flatMap { case (node, qx, qy) =>
      dem.flatMap { case (px, py, hq) =>
        val d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
        if (d2 <= r * r) Some((d2, px, py, hq)) else None
      }.sorted.take(Analytics.KnnK).zipWithIndex.map { case ((d2, px, py, hq), i) =>
        (node, d2, px, py, hq, i + 1L)
      }
    }.toSet
    val got = Analytics.knnJoinQuery(spark, sf)
      .select("node", "d2", "px", "py", "hq", "rk")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // the k cap binds somewhere (some query point has more than k candidates)
    assert(got.exists(_._6 == Analytics.KnnK.toLong))
  }

  test("Gi*: local neighborhood statistics and quantized z-score match a direct recompute") {
    val cnt = cellCounts
    val n = cnt.size.toLong
    val sumX = cnt.values.sum
    val sumX2 = cnt.values.map(x => x * x).sum
    val expected = cnt.map { case ((ix, iy), x) =>
      val nbrs = for {
        dx <- -1L to 1L; dy <- -1L to 1L
        xb <- cnt.get((ix + dx, iy + dy))
      } yield xb
      val nl = nbrs.size.toLong
      val sl = nbrs.sum
      val mu = sumX.toDouble / n.toDouble
      val z = (sl.toDouble - mu * nl.toDouble) /
        (math.sqrt(sumX2.toDouble / n.toDouble - mu * mu) *
         math.sqrt((n.toDouble * nl.toDouble - nl.toDouble * nl.toDouble) / (n.toDouble - 1.0)))
      val giQ = math.floor(0.031415926535897934 + z * 1.0e6).toLong
      (ix, iy, x, nl, sl, giQ)
    }.toSet
    val got = Analytics.giStarQuery(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    // hot and cold spots both occur (positive and negative z)
    assert(got.exists(_._6 > 0L) && got.exists(_._6 < 0L))
  }

  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("stratified sample: bottom-k-by-hash per stratum matches a direct recompute") {
    val docs = graft.dedup.Dedup.docs(spark, sf)
      .select("source", "doc_id").as[(String, Long)].collect()
    val cap = graft.text.Curation.StratumCap
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val ranked = ds.map { case (_, id) => (h60(s"samp:$id"), id) }.sortBy(identity)
      val kept = ranked.take(cap)
      (src, ds.length.toLong, kept.length.toLong, kept.map(_._2).sum, kept.map(_._1).max)
    }.toSet
    val got = graft.text.Curation.stratifiedSampleQuery(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    // the cap actually binds in at least one stratum
    assert(got.exists { case (_, total, kept, _, _) => kept < total })
  }

  test("compaction plan: prefix-sum bin packing matches a direct recompute and respects the bound") {
    val files = graft.ops.Spans.geolocatedMediaSpans(spark, sf)
      .groupBy("scene_id", "subswath", "burst_idx").agg(count(lit(1)).as("n"))
      .as[(String, String, Int, Long)].collect()
    val t = graft.lineage.Checkpoint.CompactionTargetRows
    val expected = files.groupBy(f => (f._1, f._2)).flatMap { case ((sc, sw), fs) =>
      val sorted = fs.sortBy(_._3)
      var prefix = 0L
      sorted.map { case (_, _, b, n) =>
        val bin = prefix / t
        prefix += n
        (sc, sw, bin, b, n)
      }.groupBy(_._3).map { case (bin, rows) =>
        (sc, sw, bin, rows.length.toLong, rows.map(_._5).sum,
          rows.map(_._4).min, rows.map(_._4).max)
      }
    }.toSet
    val got = graft.lineage.Checkpoint.compactionPlanQuery(spark, sf)
      .as[(String, String, Long, Long, Long, Int, Int)].collect().toSet
    assert(got == expected)
    val maxFile = files.map(_._4).max
    // first-fit bound: no bin exceeds target + largest file
    assert(got.forall(_._5 <= t + maxFile))
    // bins never interleave the sort order: ranges within a partition are disjoint
    got.groupBy(r => (r._1, r._2)).values.foreach { bins =>
      val ordered = bins.toSeq.sortBy(_._3)
      ordered.sliding(2).foreach {
        case Seq(a, b) => assert(a._7 < b._6)
        case _ =>
      }
    }
  }

  private val Spatial = graft.geom.Spatial
}
