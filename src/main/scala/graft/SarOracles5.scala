package graft

import graft.model.Layout
import graft.ops.{Stack, TerrainCorrection}

/**
 * DuckDB oracles for the stack family (CreateStack, compositing, SBAS, REACTIV,
 * SliceAssembly, TOPSAR-Merge, ESD) and the terrain scatter-add operators
 * (Terrain-Flattening, SAR-Simulation). Per-pixel series come from unnest +
 * group-by-pixel (not the engine's array folds); geometry chains are restated
 * from the dimension tables.
 */
object SarOracles5 {

  private val FIX = "/root/repo/fixtures/sf0.01"
  private def fx(t: String) = s"read_parquet('$FIX/$t.parquet/*.parquet')"
  private val N = Layout.TileW * Layout.TileH
  private val W = Layout.TileW

  /** stack pixels with quantized i/q/v and epoch. */
  private val sxCte: String =
    s"""sx0 AS (
       |  SELECT scene_id, subswath, pol, epoch, burst_idx, tile_y, tile_x,
       |         unnest(range($N)) AS k, unnest(i) AS iv0, unnest(q) AS qv0
       |  FROM ${fx("tiles_stack")}),
       |sx1 AS (
       |  SELECT scene_id, subswath, pol, epoch, burst_idx, tile_y, tile_x, k,
       |         floor(iv0 * 4096) / 4096 AS iv, floor(qv0 * 4096) / 4096 AS qv
       |  FROM sx0),
       |sx AS (
       |  SELECT *, CASE WHEN iv = -9999.0 OR qv = -9999.0 THEN -9999.0
       |                 ELSE floor((iv * iv + qv * qv) * 16384) / 16384 END AS v
       |  FROM sx1)""".stripMargin

  val createStack: String =
    s"""WITH $sxCte,
       |ts AS (
       |  SELECT scene_id, subswath, pol, epoch, burst_idx, tile_y, tile_x,
       |    CAST(coalesce(sum(CASE WHEN v = -9999.0 THEN 0 ELSE CAST(floor(0.031415926535897934 + v * 1.0E6) AS BIGINT) END), 0) AS BIGINT) AS tsq
       |  FROM sx GROUP BY 1, 2, 3, 4, 5, 6, 7)
       |SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |       count(*) AS n_epochs,
       |       max(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) = 1 AS in_master_extent,
       |       count(*) = ${Stack.Epochs} AS in_minimum_extent,
       |       CAST(sum(tsq) AS BIGINT) AS sum_q
       |FROM ts GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin

  val composite: String =
    s"""WITH $sxCte,
       |p AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, k,
       |    count(*) FILTER (v <> -9999.0) AS n,
       |    coalesce(sum(v) FILTER (v <> -9999.0), 0) AS s
       |  FROM sx GROUP BY 1, 2, 3, 4, 5, 6, 7),
       |o AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |    CASE WHEN n = 0 THEN -9999.0 ELSE s / n END AS out
       |  FROM p)
       |${SarOracles.rollupSql(1.0)}""".stripMargin

  val sbasVelocity: String =
    s"""WITH $sxCte,
       |p AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, k,
       |    CAST(count(*) FILTER (iv <> -9999.0 AND qv <> -9999.0) AS DOUBLE) AS n,
       |    coalesce(sum(epoch) FILTER (iv <> -9999.0 AND qv <> -9999.0), 0) AS se,
       |    coalesce(sum(atan2(qv, iv)) FILTER (iv <> -9999.0 AND qv <> -9999.0), 0) AS sph,
       |    coalesce(sum(epoch * atan2(qv, iv)) FILTER (iv <> -9999.0 AND qv <> -9999.0), 0) AS sep,
       |    coalesce(sum(CAST(epoch AS DOUBLE) * epoch) FILTER (iv <> -9999.0 AND qv <> -9999.0), 0) AS see
       |  FROM sx GROUP BY 1, 2, 3, 4, 5, 6, 7),
       |o AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |    CASE WHEN n < 2 OR n * see - se * se = 0 THEN -9999.0
       |         ELSE (n * sep - se * sph) / (n * see - se * se) END AS out
       |  FROM p)
       |${SarOracles.rollupSql(1.0)}""".stripMargin

  val reactiv: String =
    s"""WITH $sxCte,
       |p AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, k,
       |    CAST(count(*) FILTER (v <> -9999.0) AS DOUBLE) AS n,
       |    coalesce(sum(v) FILTER (v <> -9999.0), 0) AS s1,
       |    coalesce(sum(v * v) FILTER (v <> -9999.0), 0) AS s2
       |  FROM sx GROUP BY 1, 2, 3, 4, 5, 6, 7),
       |o AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |    CASE WHEN n < 2 OR s1 <= 0 THEN -9999.0
       |         ELSE sqrt(greatest(0, s2 / n - (s1 / n) * (s1 / n))) / (s1 / n) END AS out
       |  FROM p)
       |${SarOracles.rollupSql(1.0)}""".stripMargin

  val sliceAssembly: String =
    s"""WITH ps AS (
       |  SELECT scene_id, subswath,
       |         min(burst_first_line_time) AS t0, max(burst_last_line_time) AS t1
       |  FROM ${fx("bursts")} GROUP BY 1, 2),
       |ps2 AS (
       |  SELECT ps.*, s.azimuth_time_interval AS dt
       |  FROM ps JOIN ${fx("scenes")} s USING (scene_id)),
       |ps3 AS (SELECT *, CAST(round((t1 - t0) / dt, 0) AS BIGINT) + 1 AS n_lines FROM ps2)
       |SELECT scene_id, subswath, n_lines,
       |       coalesce(sum(n_lines) OVER (PARTITION BY subswath ORDER BY t0, scene_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS line_offset
       |FROM ps3""".stripMargin

  val topsarMerge: String =
    s"""SELECT *, (CAST(substring(subswath, 3, 1) AS INT) - 1) * ${Layout.SamplesPerBurst} AS merged_x0
       |FROM (${SarOracles.deburst}) d""".stripMargin

  val esdShift: String = {
    val ovStart = Layout.LinesPerBurst - Layout.BurstOverlapLines
    s"""WITH ${SarOracles2.crossCte},
       |t AS (SELECT * FROM cx WHERE pol = 'VV' AND gy >= $ovStart),
       |b AS (SELECT * FROM cx WHERE pol = 'VV' AND gy < ${Layout.BurstOverlapLines} AND burst_idx > 1),
       |dd AS (
       |  SELECT t.scene_id, t.subswath, t.burst_idx AS burst_a,
       |    count(*) AS n_px,
       |    sum(t.cre * b.cre + t.cim * b.cim) AS sre,
       |    sum(t.cim * b.cre - t.cre * b.cim) AS sim
       |  FROM t JOIN b ON b.scene_id = t.scene_id AND b.subswath = t.subswath
       |    AND b.burst_idx = t.burst_idx + 1 AND b.gx = t.gx AND b.gy = t.gy - $ovStart
       |  WHERE t.cre <> -9999.0 AND b.cre <> -9999.0
       |  GROUP BY 1, 2, 3),
       |df AS (
       |  SELECT a.scene_id, a.subswath, a.burst_idx AS burst_a,
       |         b.doppler_centroid - a.doppler_centroid AS dfdc
       |  FROM ${fx("bursts")} a JOIN ${fx("bursts")} b
       |    ON b.scene_id = a.scene_id AND b.subswath = a.subswath
       |   AND b.burst_idx = a.burst_idx + 1)
       |SELECT dd.scene_id, dd.subswath, dd.burst_a, dd.n_px,
       |       CAST(floor(0.031415926535897934 + atan2(sim, sre) * 1.0E6) AS BIGINT) AS phase_q,
       |       CAST(floor(0.031415926535897934 + atan2(sim, sre) / (2 * pi() * dfdc * ${Layout.AzimuthTimeInterval}) * 1.0E6) AS BIGINT) AS az_shift_q
       |FROM dd JOIN df ON df.scene_id = dd.scene_id AND df.subswath = dd.subswath
       |  AND df.burst_a = dd.burst_a""".stripMargin
  }

  /** q_esd_apply (SpectralDiversityOp azimuth-correction leg twin): cumulative
   * overlap phases in burst order, per-pixel wrap(phase - corr_b) for b >= 2. */
  val esdApply: String = {
    val ovStart = Layout.LinesPerBurst - Layout.BurstOverlapLines
    s"""WITH ${SarOracles2.crossCte},
       |t AS (SELECT * FROM cx WHERE pol = 'VV' AND gy >= $ovStart),
       |b AS (SELECT * FROM cx WHERE pol = 'VV' AND gy < ${Layout.BurstOverlapLines} AND burst_idx > 1),
       |dd AS (
       |  SELECT t.scene_id, t.subswath, t.burst_idx AS burst_a,
       |    sum(t.cre * b.cre + t.cim * b.cim) AS sre,
       |    sum(t.cim * b.cre - t.cre * b.cim) AS sim
       |  FROM t JOIN b ON b.scene_id = t.scene_id AND b.subswath = t.subswath
       |    AND b.burst_idx = t.burst_idx + 1 AND b.gx = t.gx AND b.gy = t.gy - $ovStart
       |  WHERE t.cre <> -9999.0 AND b.cre <> -9999.0
       |  GROUP BY 1, 2, 3),
       |cs AS (
       |  SELECT scene_id, subswath, burst_a + 1 AS burst_idx,
       |    sum(atan2(sim, sre)) OVER (PARTITION BY scene_id, subswath ORDER BY burst_a) AS corr
       |  FROM dd),
       |o AS (
       |  SELECT cx.scene_id, cx.subswath, cx.pol, cx.burst_idx, cx.tile_y, cx.tile_x,
       |    CASE WHEN cx.cim = -9999.0 OR cx.cre = -9999.0 THEN -9999.0
       |         ELSE atan2(sin(atan2(cx.cim, cx.cre) - cs.corr), cos(atan2(cx.cim, cx.cre) - cs.corr)) END AS out
       |  FROM cx JOIN cs ON cs.scene_id = cx.scene_id AND cs.subswath = cx.subswath
       |    AND cs.burst_idx = cx.burst_idx
       |  WHERE cx.pol = 'VV')
       |${SarOracles.rollupSql(1.0)}""".stripMargin
  }

  /** TC geometry chain kept through slant/tx_m/orb_x for the scatter-add operators. */
  private val tfChain: String = {
    val tc = TerrainCorrection
    s"""orb AS (
       |  SELECT scene_id, t_sec AS orb_t, x AS orb_x, y AS orb_y, z AS orb_z, vy AS orb_vy
       |  FROM (SELECT *, row_number() OVER (PARTITION BY scene_id ORDER BY t_sec) AS rn FROM ${fx("orbit")})
       |  WHERE rn = 1),
       |grid AS (
       |  SELECT s.scene_id, s.lon0, s.lat0, s.azimuth_time_interval, ci.ci, cj.cj,
       |         s.lon0 + (ci.ci + 0.5) * ${tc.CellDeg} AS lon,
       |         s.lat0 + (cj.cj + 0.5) * ${tc.CellDeg} AS lat
       |  FROM ${fx("scenes")} s,
       |       (SELECT unnest(range(${tc.GridNx})) AS ci) ci,
       |       (SELECT unnest(range(${tc.GridNy})) AS cj) cj),
       |g2 AS (
       |  SELECT g.*, d.height, o.orb_t, o.orb_x, o.orb_y, o.orb_z, o.orb_vy
       |  FROM grid g
       |  JOIN ${fx("dem")} d ON d.scene_id = g.scene_id
       |    AND d.lat_idx = CAST(round((g.lat - g.lat0) / ${tc.DemStep}, 0) AS INT)
       |    AND d.lon_idx = CAST(round((g.lon - g.lon0) / ${tc.DemStep}, 0) AS INT)
       |  JOIN orb o ON o.scene_id = g.scene_id),
       |g3 AS (
       |  SELECT *,
       |    (lon - lon0) * ${tc.XMetersPerDeg} AS tx_m,
       |    (lat - lat0) * ${tc.YMetersPerDeg} AS ty_m
       |  FROM g2),
       |g4 AS (
       |  SELECT *,
       |    orb_t + (ty_m - orb_y) / orb_vy AS t_zd,
       |    sqrt((orb_x - tx_m) * (orb_x - tx_m) + (orb_z - height) * (orb_z - height)) AS slant,
       |    sqrt(orb_x * orb_x + orb_z * orb_z) AS r0
       |  FROM g3),
       |g5 AS (
       |  SELECT *, CAST(floor((slant - r0) / ${tc.DR}) AS INT) AS s_idx FROM g4),
       |g6 AS (
       |  SELECT *, 'IW' || CAST(s_idx // ${Layout.SamplesPerBurst} + 1 AS VARCHAR) AS subswath,
       |         CAST(s_idx % ${Layout.SamplesPerBurst} AS INT) AS x_in_sw
       |  FROM g5 WHERE s_idx >= 0 AND s_idx < ${3 * Layout.SamplesPerBurst}),
       |bst AS (
       |  SELECT scene_id, subswath, burst_idx, burst_first_line_time AS bft, burst_last_line_time AS blt,
       |         lag(burst_last_line_time) OVER w AS prev_last,
       |         lead(burst_first_line_time) OVER w AS next_first
       |  FROM ${fx("bursts")} WINDOW w AS (PARTITION BY scene_id, subswath ORDER BY burst_idx)),
       |g7 AS (
       |  SELECT g6.scene_id, g6.subswath, bst.burst_idx, g6.x_in_sw, g6.orb_x, g6.tx_m, g6.slant,
       |         CAST(round((g6.t_zd - bst.bft) / g6.azimuth_time_interval, 0) AS INT) AS local_line
       |  FROM g6 JOIN bst ON bst.scene_id = g6.scene_id AND bst.subswath = g6.subswath
       |  WHERE g6.t_zd > coalesce((bst.prev_last + bst.bft) / 2, -1e18)
       |    AND g6.t_zd <= coalesce((bst.blt + bst.next_first) / 2, 1e18)
       |    AND g6.t_zd >= bst.bft - g6.azimuth_time_interval / 2
       |    AND g6.t_zd <= bst.blt + g6.azimuth_time_interval / 2),
       |g8 AS (SELECT * FROM g7 WHERE local_line >= 0 AND local_line < ${Layout.LinesPerBurst}),
       |f AS (
       |  SELECT scene_id, subswath, burst_idx,
       |         CAST(local_line // ${Layout.TileH} AS INT) AS tile_y,
       |         CAST(x_in_sw // ${Layout.TileW} AS INT) AS tile_x,
       |         abs(orb_x - tx_m) / slant AS sin_inc
       |  FROM g8)
       |""".stripMargin
  }

  /** The fractional-xcorr gate: the engine must recover the planted warp at every
   * GCP to +-0.1 px — expected outcome is all-true booleans. */
  val xcorrFrac: String =
    s"""SELECT gcp_id, scene_id, true AS ok_dx, true AS ok_dy
       |FROM ${fx("gcps_frac")}""".stripMargin

  /** Degree-2 warp: expected outcome — the quadratic fit must recover the planted
   * degree-1 warp (all-true booleans), like warpPoly. */
  val warpPoly2: String =
    s"""SELECT w.scene_id,
       |       (SELECT count(*) FROM ${fx("gcps_frac")} g WHERE g.scene_id = w.scene_id) AS n_gcps,
       |       true AS ok_x, true AS ok_y
       |FROM ${fx("warp_truth")} w""".stripMargin

  /** Polynomial SRGR: expected outcome — the per-scene cubic must track the
   * closed-form slant->ground curve within the tolerance at every probe. */
  val srgrPoly: String =
    s"""SELECT scene_id, ${3 * graft.model.Layout.SamplesPerBurst}::BIGINT AS n_samples, true AS ok_fit
       |FROM ${fx("scenes")}""".stripMargin

  val warpPoly: String =
    s"""SELECT w.scene_id,
       |       (SELECT count(*) FROM ${fx("gcps_frac")} g WHERE g.scene_id = w.scene_id) AS n_gcps,
       |       true AS ok_x, true AS ok_y
       |FROM ${fx("warp_truth")} w""".stripMargin

  val terrainFlattening: String = {
    val tc = TerrainCorrection
    s"""WITH $tfChain
       |SELECT scene_id, subswath, burst_idx, tile_y, tile_x,
       |       count(*) AS n_facets,
       |       CAST(sum(CAST(floor(0.031415926535897934 + ((${tc.XMetersPerDeg * tc.CellDeg} * ${tc.YMetersPerDeg * tc.CellDeg}) / sin_inc) * 1.0E2) AS BIGINT)) AS BIGINT) AS area_sum_q
       |FROM f WHERE sin_inc > 0.0
       |GROUP BY 1, 2, 3, 4, 5""".stripMargin
  }

  val sarSimulation: String =
    s"""WITH $tfChain,
       |f2 AS (SELECT *, sqrt(greatest(0, 1 - sin_inc * sin_inc)) AS cos_inc FROM f WHERE sin_inc > 0.0)
       |SELECT scene_id, subswath, burst_idx, tile_y, tile_x,
       |       count(*) AS n_facets,
       |       CAST(sum(CAST(floor(0.031415926535897934 + (0.0133 * cos_inc / ((sin_inc + 0.1 * cos_inc) * (sin_inc + 0.1 * cos_inc) * (sin_inc + 0.1 * cos_inc))) * 1.0E6) AS BIGINT)) AS BIGINT) AS sim_sum_q
       |FROM f2 GROUP BY 1, 2, 3, 4, 5""".stripMargin
}
