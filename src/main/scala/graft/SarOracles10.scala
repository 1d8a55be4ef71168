package graft

import graft.model.Layout
import graft.exprs.Kernels

/**
 * DuckDB oracles for the round-3 small-operator batch: Range-Shift, Stack-Split,
 * Remodulate, Integer-Interferogram, PhaseFilter (spatial), MuLog (log-domain
 * boxcar pipeline), GaborFilter.
 */
object SarOracles10 {

  private val FIX = "/root/repo/fixtures/sf0.01"
  private def fx(t: String) = s"read_parquet('$FIX/$t.parquet/*.parquet')"
  private val W = Layout.TileW
  private val N = Layout.TileW * Layout.TileH
  private val rollup = SarOracles.rollupSql(1.0)

  /** Range-Shift estimation: the planted per-scene integer shift is the truth. */
  val rangeShift: String =
    s"""SELECT scene_id, count(*) AS n_gcps, round(avg(true_dx), 6) AS rg_shift_px
       |FROM ${fx("gcps")} GROUP BY 1""".stripMargin

  /** Stack-Split: master (epoch 0) + selected slave per-tile rollups. */
  val stackSplit: String =
    s"""WITH px AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, epoch,
       |         unnest(range($N)) AS k, unnest(i) AS iv, unnest(q) AS qv
       |  FROM ${fx("tiles_stack")} WHERE epoch = 0 OR epoch = ${ops.Stack.SplitEpoch}),
       |p2 AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |         CASE WHEN epoch = 0 THEN 'master' ELSE 'slave' END AS role,
       |         CASE WHEN iv = -9999.0 OR qv = -9999.0 THEN -9999.0 ELSE floor(((floor(iv * 4096) / 4096) * (floor(iv * 4096) / 4096) + (floor(qv * 4096) / 4096) * (floor(qv * 4096) / 4096)) * 16384) / 16384 END AS v
       |  FROM px)
       |SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, role,
       |       count(*) FILTER (v <> -9999.0) AS n_valid,
       |       CAST(coalesce(sum(CAST(floor(0.031415926535897934 + v * 1E6) AS BIGINT)) FILTER (v <> -9999.0), 0) AS BIGINT) AS sum_q
       |FROM p2 GROUP BY 1, 2, 3, 4, 5, 6, 7""".stripMargin

  /** Remodulate: wrap(demodulated phase + phi) — round trip of the deramp ramp. */
  val remodulate: String = {
    val ta = "(b.burst_first_line_time + p.gy * s.azimuth_time_interval)"
    val phi = s"(-pi() * b.doppler_rate * ($ta - b.reference_time) * ($ta - b.reference_time) - 2 * pi() * b.doppler_centroid * $ta)"
    val phid = s"atan2(sin(atan2(p.qv, p.iv) - $phi), cos(atan2(p.qv, p.iv) - $phi))"
    s"""WITH ${SarOracles2.pxCte("tiles", "p0")},
       |p AS (SELECT * FROM p0 WHERE pol = 'VV'),
       |j AS (
       |  SELECT p.scene_id, p.subswath, p.pol, p.burst_idx, p.tile_y, p.tile_x,
       |    CASE WHEN p.iv = -9999.0 OR p.qv = -9999.0 THEN -9999.0
       |         ELSE atan2(sin($phid + $phi), cos($phid + $phi)) END AS out
       |  FROM p
       |  JOIN ${fx("bursts")} b ON b.scene_id = p.scene_id AND b.subswath = p.subswath AND b.burst_idx = p.burst_idx
       |  JOIN ${fx("scenes")} s ON s.scene_id = p.scene_id),
       |o AS (SELECT * FROM j)
       |$rollup""".stripMargin
  }

  /** Geolocation-Grid geocoding: footprint-affine inversion + nearest gather. */
  val ggGeocode: String = {
    val tc = ops.TerrainCorrection
    s"""WITH grid AS (
       |  SELECT s.scene_id, s.lon0, s.lat0, ci.ci, cj.cj,
       |         s.lon0 + (ci.ci + 0.5) * ${tc.CellDeg} AS lon,
       |         s.lat0 + (cj.cj + 0.5) * ${tc.CellDeg} AS lat
       |  FROM ${fx("scenes")} s,
       |       (SELECT unnest(range(${tc.GridNx})) AS ci) ci,
       |       (SELECT unnest(range(${tc.GridNy})) AS cj) cj),
       |uv AS (
       |  SELECT g.scene_id, g.ci, g.cj, b.subswath, b.burst_idx,
       |         (g.lat - b.lat1) / (b.lat4 - b.lat1) AS vv,
       |         (g.lon - b.lon1 - ((g.lat - b.lat1) / (b.lat4 - b.lat1)) * (b.lon4 - b.lon1)) / (b.lon2 - b.lon1) AS u
       |  FROM grid g JOIN ${fx("bursts")} b ON b.scene_id = g.scene_id),
       |hit AS (
       |  SELECT *, row_number() OVER (PARTITION BY scene_id, ci, cj ORDER BY subswath, burst_idx) AS rn
       |  FROM uv WHERE u >= 0 AND u < 1 AND vv >= 0 AND vv < 1),
       |r AS (
       |  SELECT scene_id, ci, cj, subswath, burst_idx,
       |    greatest(0, least(${Layout.SamplesPerBurst - 1}, CAST(round(u * ${Layout.SamplesPerBurst} - 0.5, 0) AS INT))) AS x,
       |    greatest(0, least(${Layout.LinesPerBurst - 1}, CAST(round(vv * ${Layout.LinesPerBurst} - 0.5, 0) AS INT))) AS line
       |  FROM hit WHERE rn = 1),
       |px0 AS (
       |  SELECT scene_id, subswath, burst_idx, tile_y, tile_x,
       |         unnest(range($N)) AS k,
       |         floor(unnest(i) * 4096) / 4096 AS iv, floor(unnest(q) * 4096) / 4096 AS qv
       |  FROM ${fx("tiles")} WHERE pol = 'VV'),
       |px AS (
       |  SELECT scene_id, subswath, burst_idx,
       |         tile_x * $W + k % $W AS gx,
       |         tile_y * ${Layout.TileH} + CAST(k // $W AS INT) AS gy,
       |         CASE WHEN iv = -9999.0 OR qv = -9999.0 THEN -9999.0
       |              ELSE floor((iv * iv + qv * qv) * 16384) / 16384 END AS v
       |  FROM px0)
       |SELECT r.scene_id, r.ci, r.cj, r.subswath, r.burst_idx, r.line, r.x,
       |       round(CASE WHEN p.v = -9999.0 THEN -9999.0 ELSE p.v END, 6) AS value
       |FROM r JOIN px p ON p.scene_id = r.scene_id AND p.subswath = r.subswath
       |  AND p.burst_idx = r.burst_idx AND p.gx = r.x AND p.gy = r.line""".stripMargin
  }

  /** ETAD timing correction: corrected fractional range sample from the LUT. */
  val etad: String =
    s"""WITH ${SarOracles2.pxCte("tiles", "p0")},
       |o AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |    CASE WHEN iv = -9999.0 OR qv = -9999.0 THEN -9999.0
       |         ELSE gx + (2.0 + 0.01 * ((burst_idx - 1) * ${Layout.LinesPerBurst} + gy) + 0.004 * gx) / ${ops.TerrainCorrection.DR} END AS out
       |  FROM p0)
       |$rollup""".stripMargin

  /** Interferogram pixel CTE (tiles x tiles_sec complex cross, dyadic grid). */
  private val ifgCte: String =
    s"""pa0 AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |         unnest(range($N)) AS k, unnest(i) AS iv0, unnest(q) AS qv0
       |  FROM ${fx("tiles")}),
       |pb0 AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |         unnest(range($N)) AS k, unnest(i) AS iv0, unnest(q) AS qv0
       |  FROM ${fx("tiles_sec")}),
       |pa AS (SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, k,
       |              floor(iv0 * 4096) / 4096 AS iv, floor(qv0 * 4096) / 4096 AS qv FROM pa0),
       |pb AS (SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, k,
       |              floor(iv0 * 4096) / 4096 AS iv, floor(qv0 * 4096) / 4096 AS qv FROM pb0),
       |ifg AS (
       |  SELECT a.scene_id, a.subswath, a.pol, a.burst_idx, a.tile_y, a.tile_x, a.k,
       |    a.tile_x * $W + a.k % $W AS gx,
       |    a.tile_y * ${Layout.TileH} + CAST(a.k // $W AS INT) AS gy,
       |    CASE WHEN a.iv = -9999.0 OR a.qv = -9999.0 OR b.iv = -9999.0 OR b.qv = -9999.0
       |         THEN -9999.0 ELSE a.iv * b.iv + a.qv * b.qv END AS cre,
       |    CASE WHEN a.iv = -9999.0 OR a.qv = -9999.0 OR b.iv = -9999.0 OR b.qv = -9999.0
       |         THEN -9999.0 ELSE a.qv * b.iv - a.iv * b.qv END AS cim
       |  FROM pa a JOIN pb b ON a.scene_id = b.scene_id AND a.subswath = b.subswath
       |    AND a.pol = b.pol AND a.burst_idx = b.burst_idx AND a.tile_y = b.tile_y
       |    AND a.tile_x = b.tile_x AND a.k = b.k)""".stripMargin

  /** Integer interferogram: wrapped phase quantized to the integer lattice. */
  val integerIfg: String =
    s"""WITH $ifgCte,
       |o AS (SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |             CASE WHEN cim = -9999.0 OR cre = -9999.0 THEN -9999.0
       |                  ELSE CAST(round(atan2(cim, cre) * (128 / pi()), 0) AS DOUBLE) END AS out
       |      FROM ifg)
       |$rollup""".stripMargin

  /** Spatial phase filter: atan2(boxcar sin, boxcar cos) over 3x3. */
  val phaseFilter: String =
    s"""WITH $ifgCte,
       |sc AS (
       |  SELECT *, CASE WHEN cim = -9999.0 THEN -9999.0 ELSE floor(sin(atan2(cim, cre)) * 1048576.0) / 1048576.0 END AS sg,
       |         CASE WHEN cim = -9999.0 THEN -9999.0 ELSE floor(cos(atan2(cim, cre)) * 1048576.0) / 1048576.0 END AS cg
       |  FROM ifg),
       |d AS (SELECT a.dx, b.dy FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)),
       |st AS (
       |  SELECT c.scene_id, c.subswath, c.pol, c.burst_idx, c.tile_y, c.tile_x, c.gx, c.gy,
       |    count(*) FILTER (n.sg IS NOT NULL AND n.sg <> -9999.0) AS n,
       |    coalesce(sum(n.sg) FILTER (n.sg <> -9999.0), 0) AS ssum,
       |    coalesce(sum(n.cg) FILTER (n.sg <> -9999.0), 0) AS csum
       |  FROM sc c CROSS JOIN d
       |  LEFT JOIN sc n ON n.scene_id = c.scene_id AND n.subswath = c.subswath
       |    AND n.pol = c.pol AND n.burst_idx = c.burst_idx
       |    AND n.gx = c.gx + d.dx AND n.gy = c.gy + d.dy
       |  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
       |o AS (SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |             CASE WHEN n = 0 THEN -9999.0 ELSE atan2(ssum / n, csum / n) END AS out
       |      FROM st)
       |$rollup""".stripMargin

  /** MuLog: exp(boxcar(ln v)) over valid positive 3x3 neighbors (center-valid). */
  val mulog: String =
    s"""WITH px AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |         unnest(range($N)) AS k, unnest(i) AS iv, unnest(q) AS qv
       |  FROM ${fx("tiles")}),
       |p2 AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |         tile_x * $W + k % $W AS gx,
       |         tile_y * ${Layout.TileH} + CAST(k // $W AS INT) AS gy,
       |         CASE WHEN iv = -9999.0 OR qv = -9999.0 THEN -9999.0 ELSE floor(((floor(iv * 4096) / 4096) * (floor(iv * 4096) / 4096) + (floor(qv * 4096) / 4096) * (floor(qv * 4096) / 4096)) * 16384) / 16384 END AS v
       |  FROM px),
       |d AS (SELECT a.dx, b.dy FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)),
       |st AS (
       |  SELECT c.scene_id, c.subswath, c.pol, c.burst_idx, c.tile_y, c.tile_x,
       |    c.gx, c.gy, c.v AS cp,
       |    count(*) FILTER (n.v IS NOT NULL AND n.v <> -9999.0 AND n.v > 0) AS n,
       |    coalesce(sum(CASE WHEN n.v <> -9999.0 AND n.v > 0 THEN floor(ln(n.v) * 1048576.0) / 1048576.0 END), 0) AS s1
       |  FROM p2 c CROSS JOIN d
       |  LEFT JOIN p2 n ON n.scene_id = c.scene_id AND n.subswath = c.subswath
       |    AND n.pol = c.pol AND n.burst_idx = c.burst_idx
       |    AND n.gx = c.gx + d.dx AND n.gy = c.gy + d.dy
       |  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9),
       |o AS (SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |             CASE WHEN cp = -9999.0 THEN -9999.0
       |                  WHEN n = 0 THEN -9999.0
       |                  ELSE exp(s1 / n) END AS out
       |      FROM st)
       |$rollup""".stripMargin

  /** Gabor 5x5 convolution; weight table inlined from the kernel's Scala doubles. */
  val gabor: String = {
    val wVals = (for (dy <- -2 to 2; dx <- -2 to 2)
      yield s"($dy, $dx, ${Kernels.gaborW(dy, dx)})").mkString(", ")
    s"""WITH px AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |         unnest(range($N)) AS k, unnest(i) AS iv, unnest(q) AS qv
       |  FROM ${fx("tiles")}),
       |p2 AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |         tile_x * $W + k % $W AS gx,
       |         tile_y * ${Layout.TileH} + CAST(k // $W AS INT) AS gy,
       |         CASE WHEN iv = -9999.0 OR qv = -9999.0 THEN -9999.0 ELSE floor(((floor(iv * 4096) / 4096) * (floor(iv * 4096) / 4096) + (floor(qv * 4096) / 4096) * (floor(qv * 4096) / 4096)) * 16384) / 16384 END AS v
       |  FROM px),
       |d AS (SELECT * FROM (VALUES $wVals) t(dy, dx, w)),
       |st AS (
       |  SELECT c.scene_id, c.subswath, c.pol, c.burst_idx, c.tile_y, c.tile_x,
       |    c.gx, c.gy, c.v AS cp,
       |    coalesce(sum(floor(d.w * n.v * 1048576.0) / 1048576.0) FILTER (n.v <> -9999.0), 0) AS acc
       |  FROM p2 c CROSS JOIN d
       |  LEFT JOIN p2 n ON n.scene_id = c.scene_id AND n.subswath = c.subswath
       |    AND n.pol = c.pol AND n.burst_idx = c.burst_idx
       |    AND n.gx = c.gx + d.dx AND n.gy = c.gy + d.dy
       |  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9),
       |o AS (SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |             CASE WHEN cp = -9999.0 THEN -9999.0 ELSE acc END AS out
       |      FROM st)
       |$rollup""".stripMargin
  }
}
