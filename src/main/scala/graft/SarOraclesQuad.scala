package graft

import graft.model.Layout

/**
 * DuckDB oracles for the quad-pol T3 family (rstb PolarimetricMatricesOp /
 * PolarimetricDecompositionOp / PolarimetricClassificationOp twins).
 *
 * Exactness strategy: T3 entries and their 3x3 window sums are EXACT doubles on
 * the dyadic i/q grid (products need <= 48 mantissa bits), so they compare
 * bit-for-bit regardless of association. The transcendental Cardano / eigenvector
 * / Wishart-distance stages are staged with the SAME association order and the
 * SAME inlined double constants as the compiled kernel (Kernels.hAlphaOf /
 * wishartTile), so both engines walk identical IEEE operation sequences.
 */
object SarOraclesQuad {

  private val FIX = "/root/repo/fixtures/sf0.01"
  private def fx(t: String) = s"read_parquet('$FIX/$t.parquet/*.parquet')"
  private val W = Layout.TileW
  private val N = Layout.TileW * Layout.TileH

  // constants inlined from the kernel's Scala doubles (parse-roundtrip exact)
  private val Log3 = math.log(3.0).toString
  private val DegPerRad = (180.0 / math.Pi).toString
  private val TwoPiThird = (2.0 * math.Pi / 3.0).toString

  /** Per-pixel T3 channels of the quad fixture (optionally burst-subset). */
  private def t3Cte(maxBurst: Int): String = {
    val pols = Seq("hh", "hv", "vh", "vv")
    val unnests = pols.map { p =>
      s"""p_$p AS (
         |  SELECT scene_id, subswath, burst_idx, tile_y, tile_x,
         |         unnest(range($N)) AS k,
         |         floor(unnest(i) * 4096) / 4096 AS iv, floor(unnest(q) * 4096) / 4096 AS qv
         |  FROM ${fx("tiles_quad")} WHERE pol = '${p.toUpperCase}' AND burst_idx <= $maxBurst)""".stripMargin
    }.mkString(",\n")
    val joins = pols.tail.map(p =>
      s"JOIN p_$p $p ON $p.scene_id = hh.scene_id AND $p.subswath = hh.subswath AND " +
        s"$p.burst_idx = hh.burst_idx AND $p.tile_y = hh.tile_y AND $p.tile_x = hh.tile_x AND $p.k = hh.k")
      .mkString("\n  ")
    val nd = pols.flatMap(p => Seq(s"$p.iv = -9999.0", s"$p.qv = -9999.0")).mkString(" OR ")
    s"""$unnests,
       |t3 AS (
       |  SELECT hh.scene_id, hh.subswath, 'QP' AS pol, hh.burst_idx, hh.tile_y, hh.tile_x,
       |    hh.tile_x * $W + hh.k % $W AS gx,
       |    hh.tile_y * ${Layout.TileH} + CAST(hh.k // $W AS INT) AS gy,
       |    NOT ($nd) AS valid,
       |    ((hh.iv + vv.iv) * (hh.iv + vv.iv) + (hh.qv + vv.qv) * (hh.qv + vv.qv)) / 2 AS t11,
       |    ((hh.iv - vv.iv) * (hh.iv - vv.iv) + (hh.qv - vv.qv) * (hh.qv - vv.qv)) / 2 AS t22,
       |    ((hv.iv + vh.iv) * (hv.iv + vh.iv) + (hv.qv + vh.qv) * (hv.qv + vh.qv)) / 2 AS t33,
       |    ((hh.iv + vv.iv) * (hh.iv - vv.iv) + (hh.qv + vv.qv) * (hh.qv - vv.qv)) / 2 AS t12r,
       |    ((hh.qv + vv.qv) * (hh.iv - vv.iv) - (hh.iv + vv.iv) * (hh.qv - vv.qv)) / 2 AS t12i,
       |    ((hh.iv + vv.iv) * (hv.iv + vh.iv) + (hh.qv + vv.qv) * (hv.qv + vh.qv)) / 2 AS t13r,
       |    ((hh.qv + vv.qv) * (hv.iv + vh.iv) - (hh.iv + vv.iv) * (hv.qv + vh.qv)) / 2 AS t13i,
       |    ((hh.iv - vv.iv) * (hv.iv + vh.iv) + (hh.qv - vv.qv) * (hv.qv + vh.qv)) / 2 AS t23r,
       |    ((hh.qv - vv.qv) * (hv.iv + vh.iv) - (hh.iv - vv.iv) * (hv.qv + vh.qv)) / 2 AS t23i
       |  FROM p_hh hh
       |  $joins)""".stripMargin
  }

  private def q6(e: String) = s"CAST(floor(0.031415926535897934 + ($e) * 1.0E6) AS BIGINT)"

  /** q_pol_t3: per-tile integer-exact sums of the 9 T3 channels. */
  val t3Sums: String =
    s"""WITH ${t3Cte(Layout.BurstsPerSubswath)}
       |SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |  count(*) FILTER (valid) AS n_valid,
       |  CAST(coalesce(sum(${q6("t11")}) FILTER (valid), 0) AS BIGINT) AS t11_q,
       |  CAST(coalesce(sum(${q6("t22")}) FILTER (valid), 0) AS BIGINT) AS t22_q,
       |  CAST(coalesce(sum(${q6("t33")}) FILTER (valid), 0) AS BIGINT) AS t33_q,
       |  CAST(coalesce(sum(${q6("t12r")}) FILTER (valid), 0) AS BIGINT) AS t12r_q,
       |  CAST(coalesce(sum(${q6("t12i")}) FILTER (valid), 0) AS BIGINT) AS t12i_q,
       |  CAST(coalesce(sum(${q6("t13r")}) FILTER (valid), 0) AS BIGINT) AS t13r_q,
       |  CAST(coalesce(sum(${q6("t13i")}) FILTER (valid), 0) AS BIGINT) AS t13i_q,
       |  CAST(coalesce(sum(${q6("t23r")}) FILTER (valid), 0) AS BIGINT) AS t23r_q,
       |  CAST(coalesce(sum(${q6("t23i")}) FILTER (valid), 0) AS BIGINT) AS t23i_q
       |FROM t3 GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin

  private val dCte: String =
    "d AS (SELECT a.dx, b.dy FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy))"

  /** 3x3 windowed T3 sums per center pixel (self-join over the burst raster). */
  private val winCte: String =
    s"""win AS (
       |  SELECT c.scene_id, c.subswath, c.pol, c.burst_idx, c.tile_y, c.tile_x, c.gx, c.gy,
       |    count(*) FILTER (n.valid) AS n,
       |    coalesce(sum(n.t11) FILTER (n.valid), 0) AS sw11,
       |    coalesce(sum(n.t22) FILTER (n.valid), 0) AS sw22,
       |    coalesce(sum(n.t33) FILTER (n.valid), 0) AS sw33,
       |    coalesce(sum(n.t12r) FILTER (n.valid), 0) AS sw12r,
       |    coalesce(sum(n.t12i) FILTER (n.valid), 0) AS sw12i,
       |    coalesce(sum(n.t13r) FILTER (n.valid), 0) AS sw13r,
       |    coalesce(sum(n.t13i) FILTER (n.valid), 0) AS sw13i,
       |    coalesce(sum(n.t23r) FILTER (n.valid), 0) AS sw23r,
       |    coalesce(sum(n.t23i) FILTER (n.valid), 0) AS sw23i
       |  FROM t3 c CROSS JOIN d
       |  LEFT JOIN t3 n ON n.scene_id = c.scene_id AND n.subswath = c.subswath
       |    AND n.burst_idx = c.burst_idx AND n.gx = c.gx + d.dx AND n.gy = c.gy + d.dy
       |  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8)""".stripMargin

  /** Cardano eigen stages over `win` — staged exactly as Kernels.hAlphaOf. */
  private val cardanoCtes: String =
    s"""cd AS (
       |  SELECT *, sw11 + sw22 + sw33 AS tr,
       |    sw12r * sw12r + sw12i * sw12i + sw13r * sw13r + sw13i * sw13i + sw23r * sw23r + sw23i * sw23i AS p1
       |  FROM win WHERE n > 0),
       |c1 AS (SELECT *, tr / 3.0 AS q3 FROM cd WHERE tr > 0),
       |c2 AS (SELECT *, CASE WHEN p1 = 0 THEN NULL
       |         ELSE sqrt(((sw11 - q3) * (sw11 - q3) + (sw22 - q3) * (sw22 - q3) + (sw33 - q3) * (sw33 - q3) + 2.0 * p1) / 6.0) END AS pp
       |       FROM c1),
       |c3 AS (SELECT *,
       |    (sw11 - q3) / pp AS b11, (sw22 - q3) / pp AS b22, (sw33 - q3) / pp AS b33,
       |    sw12r / pp AS e12r, sw12i / pp AS e12i, sw13r / pp AS e13r, sw13i / pp AS e13i,
       |    sw23r / pp AS e23r, sw23i / pp AS e23i
       |  FROM c2),
       |c4 AS (SELECT *,
       |    b11 * b22 * b33 - b11 * (e23r * e23r + e23i * e23i) - b22 * (e13r * e13r + e13i * e13i) - b33 * (e12r * e12r + e12i * e12i) + 2.0 * ((e12r * e23r - e12i * e23i) * e13r + (e12r * e23i + e12i * e23r) * e13i) AS detb
       |  FROM c3),
       |c5 AS (SELECT *, acos(greatest(-1.0, least(1.0, detb / 2.0))) / 3.0 AS phi FROM c4),
       |lam AS (SELECT *,
       |    CASE WHEN p1 = 0 THEN greatest(sw11, greatest(sw22, sw33)) ELSE q3 + 2.0 * pp * cos(phi) END AS l1,
       |    CASE WHEN p1 = 0 THEN least(sw11, least(sw22, sw33)) ELSE q3 + 2.0 * pp * cos(phi + $TwoPiThird) END AS l3
       |  FROM c5),
       |lam2 AS (SELECT *, tr - l1 - l3 AS l2 FROM lam)""".stripMargin

  /** probability term pk for a lambda expression (clamped at 0 like the kernel). */
  private def pk(l: String) = s"greatest(($l) / tr, 0.0)"

  private def entTerm(l: String) =
    s"CASE WHEN ${pk(l)} > 0 THEN ${pk(l)} * (ln(${pk(l)}) / $Log3) ELSE 0 END"

  /** eigenvector alpha for one lambda (complex cross of two rows of T - l I). */
  private def alphaK(l: String): String = {
    val v1r = s"(sw12r * sw23r - sw12i * sw23i - sw13r * (sw22 - ($l)))"
    val v1i = s"(sw12r * sw23i + sw12i * sw23r - sw13i * (sw22 - ($l)))"
    val v2r = s"(sw13r * sw12r + sw13i * sw12i - (sw11 - ($l)) * sw23r)"
    val v2i = s"(sw13i * sw12r - sw13r * sw12i - (sw11 - ($l)) * sw23i)"
    val v3r = s"((sw11 - ($l)) * (sw22 - ($l)) - (sw12r * sw12r + sw12i * sw12i))"
    val norm2 = s"($v1r * $v1r + $v1i * $v1i + $v2r * $v2r + $v2i * $v2i + $v3r * $v3r)"
    s"""CASE WHEN $norm2 <= 0 THEN 0.0
       |     ELSE acos(least(1.0, sqrt(($v1r * $v1r + $v1i * $v1i) / $norm2))) * $DegPerRad END""".stripMargin
  }

  private def alphaDiagK(l: String) = s"CASE WHEN ($l) = sw11 THEN 0.0 ELSE 90.0 END"

  /** per-pixel H, A, alpha columns over lam2. */
  private val haaCte: String =
    s"""haa AS (
       |  SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, gx, gy, n,
       |    sw11, sw22, sw33, sw12r, sw12i, sw13r, sw13i, sw23r, sw23i, tr, p1, l1, l2, l3,
       |    0 - (${entTerm("l1")}) - (${entTerm("l2")}) - (${entTerm("l3")}) AS hent,
       |    CASE WHEN l2 + l3 > 0 THEN (l2 - l3) / (l2 + l3) ELSE 0.0 END AS anis,
       |    CASE WHEN p1 = 0
       |         THEN ${pk("l1")} * (${alphaDiagK("l1")}) + ${pk("l2")} * (${alphaDiagK("l2")}) + ${pk("l3")} * (${alphaDiagK("l3")})
       |         ELSE ${pk("l1")} * (${alphaK("l1")}) + ${pk("l2")} * (${alphaK("l2")}) + ${pk("l3")} * (${alphaK("l3")}) END AS alpha
       |  FROM lam2)""".stripMargin

  /** q_halpha_quad: per-tile quantized sums of H, A, alpha. */
  val hAlpha: String =
    s"""WITH ${t3Cte(Layout.BurstsPerSubswath)},
       |$dCte,
       |$winCte,
       |$cardanoCtes,
       |$haaCte
       |SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x,
       |  count(*) AS n_valid,
       |  CAST(coalesce(sum(${q6("hent")}), 0) AS BIGINT) AS h_sum_q,
       |  CAST(coalesce(sum(${q6("anis")}), 0) AS BIGINT) AS a_sum_q,
       |  CAST(coalesce(sum(${q6("alpha")}), 0) AS BIGINT) AS alpha_sum_q
       |FROM haa GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin

  // ------------------------------------------------------------------ Wishart

  private def qw(e: String) = s"CAST(floor(0.031415926535897934 + ($e) * 1000.0) AS BIGINT)"

  /** q_wishart (1 reassignment round on the bursts<=2 subset): H-alpha zone seed,
   * integer cluster-center sums, revised-Wishart argmin, per-tile class counts. */
  val wishart: String =
    s"""WITH ${t3Cte(ops.PolarimetryQuad.WishartMaxBurst)},
       |$dCte,
       |$winCte,
       |$cardanoCtes,
       |$haaCte,
       |zs AS (
       |  SELECT *,
       |    (CASE WHEN hent < 0.5 THEN 0 WHEN hent < 0.9 THEN 1 ELSE 2 END) * 3 +
       |    (CASE WHEN alpha >= 47.5 THEN 0 WHEN alpha >= 42.5 THEN 1 ELSE 2 END) AS zone
       |  FROM haa),
       |ctr AS (
       |  SELECT zone, count(*) AS cnt,
       |    CAST(sum(${qw("sw11")}) AS BIGINT) AS s11, CAST(sum(${qw("sw22")}) AS BIGINT) AS s22,
       |    CAST(sum(${qw("sw33")}) AS BIGINT) AS s33,
       |    CAST(sum(${qw("sw12r")}) AS BIGINT) AS s12r, CAST(sum(${qw("sw12i")}) AS BIGINT) AS s12i,
       |    CAST(sum(${qw("sw13r")}) AS BIGINT) AS s13r, CAST(sum(${qw("sw13i")}) AS BIGINT) AS s13i,
       |    CAST(sum(${qw("sw23r")}) AS BIGINT) AS s23r, CAST(sum(${qw("sw23i")}) AS BIGINT) AS s23i
       |  FROM zs GROUP BY 1),
       |cz AS (
       |  SELECT zone, cnt,
       |    (s11 / 1000.0) / cnt AS ca, (s22 / 1000.0) / cnt AS cb, (s33 / 1000.0) / cnt AS cc,
       |    (s12r / 1000.0) / cnt AS c12r, (s12i / 1000.0) / cnt AS c12i,
       |    (s13r / 1000.0) / cnt AS c13r, (s13i / 1000.0) / cnt AS c13i,
       |    (s23r / 1000.0) / cnt AS c23r, (s23i / 1000.0) / cnt AS c23i
       |  FROM ctr WHERE cnt > 0),
       |czd AS (
       |  SELECT *,
       |    ca * cb * cc - ca * (c23r * c23r + c23i * c23i) - cb * (c13r * c13r + c13i * c13i) - cc * (c12r * c12r + c12i * c12i) + 2.0 * ((c12r * c23r - c12i * c23i) * c13r + (c12r * c23i + c12i * c23r) * c13i) AS det
       |  FROM cz),
       |czi AS (
       |  SELECT zone, ln(det) AS lndet,
       |    (cb * cc - (c23r * c23r + c23i * c23i)) / det AS i11,
       |    (ca * cc - (c13r * c13r + c13i * c13i)) / det AS i22,
       |    (ca * cb - (c12r * c12r + c12i * c12i)) / det AS i33,
       |    (c13r * c23r + c13i * c23i - c12r * cc) / det AS i12r,
       |    (c13i * c23r - c13r * c23i - c12i * cc) / det AS i12i,
       |    (c12r * c23r - c12i * c23i - c13r * cb) / det AS i13r,
       |    (c12r * c23i + c12i * c23r - c13i * cb) / det AS i13i,
       |    (c13r * c12r + c13i * c12i - ca * c23r) / det AS i23r,
       |    (c13i * c12r - c13r * c12i - ca * c23i) / det AS i23i
       |  FROM czd WHERE det > 0),
       |dist AS (
       |  SELECT p.scene_id, p.subswath, p.pol, p.burst_idx, p.tile_y, p.tile_x, p.gx, p.gy,
       |    z.zone,
       |    z.lndet + (z.i11 * (p.sw11 / p.n) + z.i22 * (p.sw22 / p.n) + z.i33 * (p.sw33 / p.n) +
       |      2.0 * (z.i12r * (p.sw12r / p.n) + z.i12i * (p.sw12i / p.n) + z.i13r * (p.sw13r / p.n) + z.i13i * (p.sw13i / p.n) + z.i23r * (p.sw23r / p.n) + z.i23i * (p.sw23i / p.n))) AS dd
       |  FROM haa p CROSS JOIN czi z),
       |asgn AS (
       |  SELECT *, row_number() OVER (PARTITION BY scene_id, subswath, burst_idx, gx, gy ORDER BY dd, zone) AS rn
       |  FROM dist)
       |SELECT scene_id, subswath, pol, burst_idx, tile_y, tile_x, zone,
       |       CAST(count(*) AS BIGINT) AS n_px
       |FROM asgn WHERE rn = 1
       |GROUP BY 1, 2, 3, 4, 5, 6, 7""".stripMargin
}
