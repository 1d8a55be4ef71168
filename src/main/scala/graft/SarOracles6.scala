package graft

import graft.model.Layout
import graft.ops.Spectral

/**
 * DuckDB oracles for the FFT-domain operators. The engine runs real FFTs
 * (commons-math3); these oracles restate the same transforms in independent closed
 * forms — periodic-sinc (trigonometric) interpolation for oversampling, Dirichlet
 * circular convolution for band-pass, and a direct O(N^2) two-pass 2-D DFT for the
 * Goldstein filter — so an FFT indexing/scaling bug cannot self-confirm.
 */
object SarOracles6 {

  private val FIX = "/root/repo/fixtures/sf0.01"
  private def fx(t: String) = s"read_parquet('$FIX/$t.parquet/*.parquet')"
  private val W = Layout.TileW
  private val N = Layout.TileW * Layout.TileH

  private val rollup = SarOracles.rollupSql(1.0)

  /** smooth tile pixels with tile-local (lx, ly). */
  private val smCte: String =
    s"""sm AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |         unnest(range($N)) AS k, unnest(i) AS x
       |  FROM ${fx("tiles_smooth")}),
       |sm2 AS (
       |  SELECT *, CAST(k % $W AS INT) AS lx, CAST(k // $W AS INT) AS ly FROM sm)""".stripMargin

  /** Oversampling x2: trigonometric interpolation, K(u) = sin(pi u)/(W tan(pi u/W)),
   * K(0) = 1, K(other integer) = 0 (|u| < W here). */
  val oversample: String =
    s"""WITH $smCte,
       |m AS (SELECT unnest(range(${2 * N})) AS m),
       |o1 AS (
       |  SELECT s.scene_id, s.subswath, s.pol, s.burst_idx, s.tile_y, s.tile_x, m.m,
       |    sum(s.x * (CASE WHEN m.m % ${2 * W} = 2 * s.lx THEN 1.0
       |               WHEN (m.m % ${2 * W}) % 2 = 0 THEN 0.0
       |               ELSE sin(pi() * ((m.m % ${2 * W}) / 2.0 - s.lx))
       |                    / ($W * tan(pi() * ((m.m % ${2 * W}) / 2.0 - s.lx) / $W)) END)) AS out
       |  FROM m JOIN sm2 s ON s.ly = CAST(m.m // ${2 * W} AS INT)
       |  GROUP BY 1, 2, 3, 4, 5, 6, 7),
       |o AS (SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, out FROM o1)
       |$rollup""".stripMargin

  /** Dirichlet kernel for cutoff kc: h(d) = (1 + 2 sum_{k=1..kc} cos(2 pi k d / W)) / W. */
  private def dirichlet(dExpr: String): String = {
    val terms = (1 to Spectral.BandKc)
      .map(k => s"cos(2 * pi() * $k * ($dExpr) / $W)").mkString(" + ")
    s"(1.0 + 2.0 * ($terms)) / $W"
  }

  val bandpassRange: String =
    s"""WITH $smCte,
       |o1 AS (
       |  SELECT c.scene_id, c.subswath, c.pol, c.burst_idx, c.tile_y, c.tile_x,
       |    c.ly, c.lx,
       |    sum(s.x * ${dirichlet("((c.lx - s.lx) % 32 + 32) % 32")}) AS out
       |  FROM sm2 c JOIN sm2 s ON s.scene_id = c.scene_id AND s.subswath = c.subswath
       |    AND s.pol = c.pol AND s.burst_idx = c.burst_idx
       |    AND s.tile_y = c.tile_y AND s.tile_x = c.tile_x AND s.ly = c.ly
       |  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
       |o AS (SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, out FROM o1)
       |$rollup""".stripMargin

  val bandpassAzimuth: String =
    s"""WITH $smCte,
       |o1 AS (
       |  SELECT c.scene_id, c.subswath, c.pol, c.burst_idx, c.tile_y, c.tile_x,
       |    c.ly, c.lx,
       |    sum(s.x * ${dirichlet("((c.ly - s.ly) % 32 + 32) % 32")}) AS out
       |  FROM sm2 c JOIN sm2 s ON s.scene_id = c.scene_id AND s.subswath = c.subswath
       |    AND s.pol = c.pol AND s.burst_idx = c.burst_idx
       |    AND s.tile_y = c.tile_y AND s.tile_x = c.tile_x AND s.lx = c.lx
       |  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
       |o AS (SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, out FROM o1)
       |$rollup""".stripMargin

  /** Azimuth-Spectrum: the deramp-only rotation (phi = -pi kt (ta - t_ref)^2)
   * restated pixel-wise, dyadic-quantized exactly as the engine stages it, then a
   * direct O(h^2) column DFT (same convention as the Goldstein rd CTE) and the
   * reference's |F|^2 / h^2 power scaling. */
  val azimuthSpectrum: String = {
    val H = Layout.TileH
    s"""WITH px AS (
       |  SELECT t.scene_id, t.subswath, t.pol, t.burst_idx, t.tile_y, t.tile_x,
       |         unnest(range($N)) AS k, unnest(i) AS xi, unnest(q) AS xq
       |  FROM ${fx("tiles")} t WHERE t.pol = 'VV' AND t.burst_idx <= 2),
       |ph AS (
       |  SELECT p.*, CAST(p.k % $W AS INT) AS lx, CAST(p.k // $W AS INT) AS ly,
       |    (-pi() * b.doppler_rate
       |      * ((b.burst_first_line_time + (p.tile_y * $H + p.k // $W) * s.azimuth_time_interval) - b.reference_time)
       |      * ((b.burst_first_line_time + (p.tile_y * $H + p.k // $W) * s.azimuth_time_interval) - b.reference_time)) AS phi,
       |    CASE WHEN p.xi = -9999.0 OR isnan(p.xi) THEN 0.0 ELSE floor(p.xi * 4096) / 4096 END AS iq,
       |    CASE WHEN p.xq = -9999.0 OR isnan(p.xq) THEN 0.0 ELSE floor(p.xq * 4096) / 4096 END AS qq
       |  FROM px p
       |  JOIN ${fx("bursts")} b ON b.scene_id = p.scene_id AND b.subswath = p.subswath AND b.burst_idx = p.burst_idx
       |  JOIN ${fx("scenes")} s ON s.scene_id = p.scene_id),
       |rot AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, lx, ly,
       |    floor((iq * cos(phi) - qq * sin(phi)) * 4096) / 4096 AS di,
       |    floor((iq * sin(phi) + qq * cos(phi)) * 4096) / 4096 AS dq
       |  FROM ph),
       |rr AS (SELECT unnest(range($H)) AS r),
       |spec AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, lx, rr.r,
       |    sum(di * cos(2 * pi() * rr.r * ly / $H) + dq * sin(2 * pi() * rr.r * ly / $H)) AS fr,
       |    sum(dq * cos(2 * pi() * rr.r * ly / $H) - di * sin(2 * pi() * rr.r * ly / $H)) AS fi
       |  FROM rot CROSS JOIN rr GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
       |o AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |    floor(((fr * fr + fi * fi) / ${H * H}) * 4096) / 4096 AS out
       |  FROM spec)
       |$rollup""".stripMargin
  }

  /** Goldstein: direct two-pass 2-D DFT, |F|^alpha weighting, two-pass inverse. */
  val goldstein: String =
    s"""WITH ${SarOracles2.crossCte},
       |z AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |    CAST(gy % $W AS INT) AS ly, CAST(gx % $W AS INT) AS lx,
       |    CASE WHEN cre = -9999.0 THEN 0 ELSE cre END AS zr,
       |    CASE WHEN cim = -9999.0 THEN 0 ELSE cim END AS zi
       |  FROM cx WHERE pol = 'VV' AND burst_idx <= 2),
       |uu AS (SELECT unnest(range($W)) AS u),
       |rd AS (
       |  SELECT z.scene_id, z.subswath, z.pol, z.burst_idx, z.tile_y, z.tile_x, z.ly, uu.u AS v,
       |    sum(zr * cos(2 * pi() * uu.u * lx / $W) + zi * sin(2 * pi() * uu.u * lx / $W)) AS rr,
       |    sum(zi * cos(2 * pi() * uu.u * lx / $W) - zr * sin(2 * pi() * uu.u * lx / $W)) AS ri
       |  FROM z CROSS JOIN uu GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
       |cd AS (
       |  SELECT rd.scene_id, rd.subswath, rd.pol, rd.burst_idx, rd.tile_y, rd.tile_x, uu.u AS fu, rd.v,
       |    sum(rr * cos(2 * pi() * uu.u * ly / $W) + ri * sin(2 * pi() * uu.u * ly / $W)) AS fr,
       |    sum(ri * cos(2 * pi() * uu.u * ly / $W) - rr * sin(2 * pi() * uu.u * ly / $W)) AS fi
       |  FROM rd CROSS JOIN uu GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
       |wgt AS (
       |  SELECT *, pow(sqrt(fr * fr + fi * fi), ${Spectral.GoldsteinAlpha}) AS wt FROM cd),
       |wg AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, fu, v,
       |    fr * wt AS fr, fi * wt AS fi
       |  FROM wgt),
       |icd AS (
       |  SELECT wg.scene_id, wg.subswath, wg.pol, wg.burst_idx, wg.tile_y, wg.tile_x, uu.u AS ly, wg.v,
       |    sum(fr * cos(2 * pi() * wg.fu * uu.u / $W) - fi * sin(2 * pi() * wg.fu * uu.u / $W)) AS gr,
       |    sum(fi * cos(2 * pi() * wg.fu * uu.u / $W) + fr * sin(2 * pi() * wg.fu * uu.u / $W)) AS gi
       |  FROM wg CROSS JOIN uu GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
       |ird AS (
       |  SELECT icd.scene_id, icd.subswath, icd.pol, icd.burst_idx, icd.tile_y, icd.tile_x, icd.ly, uu.u AS lx,
       |    sum(gr * cos(2 * pi() * icd.v * uu.u / $W) - gi * sin(2 * pi() * icd.v * uu.u / $W)) / $N AS zr2,
       |    sum(gi * cos(2 * pi() * icd.v * uu.u / $W) + gr * sin(2 * pi() * icd.v * uu.u / $W)) / $N AS zi2
       |  FROM icd CROSS JOIN uu GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
       |o AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |    atan2(zi2, zr2) AS out
       |  FROM ird)
       |$rollup""".stripMargin
}
