package graft

/**
 * DuckDB twins for the spatial-join-engine gates (geom/Spatial.scala,
 * lineage/Checkpoint.scala). All four are integer-exact or identical-IEEE
 * derivations: the kNN oracle is a plain brute-force cross join (a genuinely
 * different algorithm from the engine's certified ring expansion), the
 * compaction oracle an unrolled per-level CTE chain, the zonal oracle a full
 * pixel unnest + inequality join (no cell prefilter — independent derivation),
 * and the lineage manifest the same md5-60-bit checksum the library helper
 * defines.
 */
object GeoOracles {

  private val FIX = "/root/repo/fixtures/sf0.01"
  private def fx(t: String) = s"read_parquet('$FIX/$t.parquet/*.parquet')"
  private def h60(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** q_spatial_knn: brute-force exact kNN (integer microdegree metric). */
  val spatialKnn: String =
    s"""WITH qc AS (SELECT aoi_id,
       |  CAST(floor((lon_min + lon_max) / 2 * 1e6) AS BIGINT) AS qx,
       |  CAST(floor((lat_min + lat_max) / 2 * 1e6) AS BIGINT) AS qy
       |  FROM ${fx("aoi")}),
       |pc AS (SELECT scene_id, subswath, burst_idx,
       |  CAST(floor((lon1 + lon2 + lon3 + lon4) / 4 * 1e6) AS BIGINT) AS px,
       |  CAST(floor((lat1 + lat2 + lat3 + lat4) / 4 * 1e6) AS BIGINT) AS py
       |  FROM ${fx("bursts")}),
       |d AS (SELECT aoi_id, scene_id, subswath, burst_idx,
       |        (px - qx) * (px - qx) + (py - qy) * (py - qy) AS d2,
       |        row_number() OVER (PARTITION BY aoi_id
       |          ORDER BY (px - qx) * (px - qx) + (py - qy) * (py - qy),
       |                   scene_id, subswath, burst_idx) AS rank
       |      FROM qc, pc)
       |SELECT aoi_id, rank, scene_id, subswath, burst_idx, d2
       |FROM d WHERE rank <= 5 ORDER BY aoi_id, rank""".stripMargin

  /** q_cell_compact: unrolled full-quad -> parent promotion, levels 11 -> 8. */
  val cellCompact: String = {
    val mask = (1L << 29) - 1
    def step(lvl: Int): String = {
      val prev = if (lvl == 11) "c11" else s"c${lvl + 1}x"
      s"""p$lvl AS (SELECT aoi_id, cell,
         |  (${lvl - 1}::BIGINT << 58) | ((((cell >> 29) & $mask) >> 1) << 29) | ((cell & $mask) >> 1) AS parent
         |  FROM $prev WHERE (cell >> 58) = $lvl),
         |f$lvl AS (SELECT aoi_id, parent FROM p$lvl GROUP BY 1, 2 HAVING count(*) = 4),
         |c${lvl}x AS (
         |  SELECT aoi_id, cell FROM $prev WHERE (cell >> 58) <> $lvl
         |  UNION ALL SELECT aoi_id, parent AS cell FROM f$lvl
         |  UNION ALL SELECT p.aoi_id, p.cell FROM p$lvl p ANTI JOIN f$lvl f USING (aoi_id, parent))""".stripMargin
    }
    s"""WITH b AS (SELECT aoi_id,
       |  CAST(least(2047, greatest(0, floor((lon_min + 180.0) / 360.0 * 2048.0))) AS BIGINT) AS x0,
       |  CAST(least(2047, greatest(0, floor((lon_max + 180.0) / 360.0 * 2048.0))) AS BIGINT) AS x1,
       |  CAST(least(2047, greatest(0, floor((lat_min + 90.0) / 180.0 * 2048.0))) AS BIGINT) AS y0,
       |  CAST(least(2047, greatest(0, floor((lat_max + 90.0) / 180.0 * 2048.0))) AS BIGINT) AS y1
       |  FROM ${fx("aoi")}),
       |ys AS (SELECT aoi_id, x0, x1, unnest(generate_series(y0, y1)) AS yy FROM b),
       |xs AS (SELECT aoi_id, yy, unnest(generate_series(x0, x1)) AS xx FROM ys),
       |c11 AS (SELECT aoi_id, (11::BIGINT << 58) | (yy << 29) | xx AS cell FROM xs),
       |${step(11)},
       |${step(10)},
       |${step(9)}
       |SELECT aoi_id, (cell >> 58) AS level, cell FROM c9x
       |ORDER BY aoi_id, level, cell""".stripMargin
  }

  /** q_zonal_stats: full pixel unnest + inequality join (no prefilter). */
  val zonalStats: String =
    s"""WITH t AS (SELECT scene_id, subswath, burst_idx, tile_x, tile_y, no_data,
       |  unnest(i) AS iv, unnest(q) AS qv, unnest(generate_series(0, 1023)) AS k
       |  FROM ${fx("tiles")} WHERE pol = 'VV'),
       |g AS (SELECT t.*, b.lon1, b.lat1, b.lon2, b.lat2, b.lon4, b.lat4
       |      FROM t JOIN ${fx("bursts")} b USING (scene_id, subswath, burst_idx)
       |      WHERE iv <> no_data),
       |px AS (SELECT *,
       |         (tile_x * 32 + k % 32 + 0.5) / 128 AS u,
       |         (tile_y * 32 + floor(k / 32) + 0.5) / 64 AS v
       |       FROM g),
       |geo AS (SELECT *, lon1 + u * (lon2 - lon1) + v * (lon4 - lon1) AS lon,
       |               lat1 + v * (lat4 - lat1) AS lat FROM px)
       |SELECT a.aoi_id, count(*) AS n_px,
       |       count(DISTINCT (scene_id, subswath, burst_idx, tile_x, tile_y)) AS n_tiles,
       |       CAST(sum(CAST(floor(0.031415926535897934 + (iv * iv + qv * qv) * 1e6) AS BIGINT)) AS BIGINT) AS pow_q
       |FROM geo, ${fx("aoi")} a
       |WHERE lon BETWEEN a.lon_min AND a.lon_max AND lat BETWEEN a.lat_min AND a.lat_max
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q_lineage_manifest: per-scene semantic manifest (rows + md5-60 checksum). */
  val lineageManifest: String =
    s"""WITH sp AS (SELECT doc_id, unnest(spans) AS s FROM ${fx("docs")}),
       |m AS (SELECT doc_id, s."offset" AS o, s.media_ref AS mr,
       |             string_split(s.media_ref, '/') AS p
       |      FROM sp WHERE s.kind = 'media')
       |SELECT p[3] AS part_key, count(*) AS n_rows,
       |       CAST(sum(${h60("doc_id || '|' || o::VARCHAR || '|' || mr")} % 1099511627776) AS BIGINT) AS checksum
       |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
}
