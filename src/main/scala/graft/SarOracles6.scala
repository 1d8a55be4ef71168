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

  /** q_goldstein twin — the FULL reference block pipeline the compiled kernel
   * runs (GoldsteinFilterOp.java:330-826): 75%-overlap 64x64 blocks, Baran-2003
   * adaptive alpha from the dyadic-staged analytic coherence surface, 3x3
   * valid-bin magnitude smoothing ^alpha, triangular accumulation. The FFTs are
   * the kernel's OWN radix-2 butterflies replayed VERBATIM — the bit-reversal
   * table and every per-stage twiddle constant are interpolated as literals of
   * the same JVM Math.cos/sin values the kernel computes, so the two engines
   * agree bit-for-bit (no FFT-vs-DFT low-bit drift, the ADVICE r3 flaky class). */
  val goldstein: String = {
    import graft.exprs.Kernels
    val F = Kernels.GoldFft
    val rW = Layout.TilesX * Layout.TileW
    val rH = Layout.TilesY * Layout.TileH
    val half2 = F / 2
    def dlit(v: Double) = { val s = v.toString; if (s.contains("E") || s.contains("e")) s else s + "E0" }
    def dlist(a: Array[Double]) = a.map(dlit).mkString("[", ", ", "]")
    val brL = Kernels.bitRev(F).mkString("[", ", ", "]")
    val tws = Kernels.twiddles(F)
    def origins(max: Int): Array[Int] = {
      if (max <= 0) Array(0)
      else {
        val n0 = max / Kernels.GoldStep + 1
        val base = Array.tabulate(n0)(_ * Kernels.GoldStep)
        if (base(n0 - 1) < max) base :+ max else base
      }
    }
    val xsL = origins(rW - F).mkString("[", ", ", "]")
    val ysL = origins(rH - F).mkString("[", ", ", "]")
    val K = "scene_id, subswath, pol, burst_idx, x0, y0"
    /** one FFT pass over UNNESTED rows (bit-rev permute join + log2(F) window-
     * function butterfly stages). `along` is the transform axis ("c" for row
     * FFTs, "r" for column FFTs — no physical transpose, just the partition
     * key); `other` the perpendicular coordinate. Each stage's lag/lead runs
     * with a CONSTANT offset (len/2) inside one sorted window pass. */
    def fftPass(inName: String, prefix: String, along: String, other: String,
        inverse: Boolean): (String, String) = {
      val sb = new StringBuilder
      var cur = inName
      val perm = s"${prefix}p"
      sb.append(
        s"""$perm AS MATERIALIZED (
           |  SELECT p.scene_id, p.subswath, p.pol, p.burst_idx, p.x0, p.y0, p.r, p.c,
           |    q.re AS re, q.im AS im
           |  FROM $cur p JOIN (SELECT unnest(range($F)) AS dst, unnest($brL) AS src) m ON p.$along = m.dst
           |  JOIN $cur q ON q.scene_id = p.scene_id AND q.subswath = p.subswath AND q.pol = p.pol
           |    AND q.burst_idx = p.burst_idx AND q.x0 = p.x0 AND q.y0 = p.y0
           |    AND q.$other = p.$other AND q.$along = m.src),\n""".stripMargin)
      cur = perm
      tws.zipWithIndex.foreach { case ((len, wr, wi0), si) =>
        val wi = if (inverse) wi0.map(x => -x) else wi0
        val h = len / 2
        val wrL = dlist(wr); val wiL = dlist(wi)
        val nm = s"$prefix$si"
        val win = s"OVER (PARTITION BY $K, $other ORDER BY $along)"
        sb.append(
          s"""$nm AS MATERIALIZED (
             |  SELECT $K, r, c,
             |    CASE WHEN ($along % $len) < $h
             |      THEN re + (($wrL)[($along % $len) + 1] * lead(re, $h) $win - ($wiL)[($along % $len) + 1] * lead(im, $h) $win)
             |      ELSE lag(re, $h) $win - (($wrL)[($along % $len) - $h + 1] * re - ($wiL)[($along % $len) - $h + 1] * im) END AS re,
             |    CASE WHEN ($along % $len) < $h
             |      THEN im + (($wrL)[($along % $len) + 1] * lead(im, $h) $win + ($wiL)[($along % $len) + 1] * lead(re, $h) $win)
             |      ELSE lag(im, $h) $win - (($wrL)[($along % $len) - $h + 1] * im + ($wiL)[($along % $len) - $h + 1] * re) END AS im
             |  FROM $cur),\n""".stripMargin)
        cur = nm
      }
      (sb.toString, cur)
    }
    val (fr, frLast) = fftPass("b0", "fr", "c", "r", inverse = false)
    val (fc, fcLast) = fftPass(frLast, "fc", "r", "c", inverse = false)
    val (ic, icLast) = fftPass("mul", "ic", "r", "c", inverse = true)
    val (ir, irLast) = fftPass(icLast, "ir", "c", "r", inverse = true)
    s"""WITH ${SarOracles2.crossCte},
       |gz AS MATERIALIZED (
       |  SELECT scene_id, subswath, pol, burst_idx, gy, gx,
       |    cre <> -9999.0 AND cim <> -9999.0 AS vld,
       |    CASE WHEN cre <> -9999.0 AND cim <> -9999.0 THEN cre ELSE 0 END AS re,
       |    CASE WHEN cre <> -9999.0 AND cim <> -9999.0 THEN cim ELSE 0 END AS im,
       |    CAST(floor(0.031415926535897934 + (0.2 + 0.8 * abs(sin(gx / 17.0) * cos(gy / 13.0))) * 1.0E6) AS BIGINT) AS cohq
       |  FROM cx WHERE pol = 'VV' AND burst_idx <= 2),
       |bdef AS (SELECT x.x0, y.y0 FROM (SELECT unnest($xsL) AS x0) x, (SELECT unnest($ysL) AS y0) y),
       |bpx AS MATERIALIZED (
       |  SELECT g.scene_id, g.subswath, g.pol, g.burst_idx, b.x0, b.y0,
       |         g.gy - b.y0 AS r, g.gx - b.x0 AS c, g.re, g.im, g.vld, g.cohq
       |  FROM gz g JOIN bdef b ON g.gx >= b.x0 AND g.gx < b.x0 + $F AND g.gy >= b.y0 AND g.gy < b.y0 + $F),
       |alf AS MATERIALIZED (
       |  SELECT $K, bool_or(vld) AS anyv, sum(cohq) AS cs, count(*) AS cn
       |  FROM bpx GROUP BY 1, 2, 3, 4, 5, 6),
       |alf2 AS MATERIALIZED (
       |  SELECT $K,
       |    CASE WHEN cn = 0 THEN ${Spectral.GoldsteinAlpha}
       |         WHEN 1.0 - (cs / 1.0E6) / cn < ${Spectral.GoldsteinAlphaMin} THEN ${Spectral.GoldsteinAlphaMin}
       |         WHEN 1.0 - (cs / 1.0E6) / cn > ${Spectral.GoldsteinAlphaMax} THEN ${Spectral.GoldsteinAlphaMax}
       |         ELSE 1.0 - (cs / 1.0E6) / cn END AS alpha
       |  FROM alf WHERE anyv),
       |b0 AS MATERIALIZED (
       |  SELECT b.scene_id, b.subswath, b.pol, b.burst_idx, b.x0, b.y0, b.r, b.c, b.re, b.im
       |  FROM bpx b JOIN alf2 a USING (scene_id, subswath, pol, burst_idx, x0, y0)),
       |$fr
       |$fc
       |sp AS MATERIALIZED (
       |  SELECT $K, r, c, re, im, sqrt(re * re + im * im) AS pw FROM $fcLast),
       |h1 AS MATERIALIZED (
       |  SELECT s.*, a.alpha,
       |    (CASE WHEN lag(pw) OVER wv IS NOT NULL AND lag(pw) OVER wv <> 0 THEN lag(pw) OVER wv ELSE 0 END
       |     + CASE WHEN pw <> 0 THEN pw ELSE 0 END
       |     + CASE WHEN lead(pw) OVER wv IS NOT NULL AND lead(pw) OVER wv <> 0 THEN lead(pw) OVER wv ELSE 0 END) AS hs,
       |    (CASE WHEN lag(pw) OVER wv IS NOT NULL AND lag(pw) OVER wv <> 0 THEN 1 ELSE 0 END
       |     + CASE WHEN pw <> 0 THEN 1 ELSE 0 END
       |     + CASE WHEN lead(pw) OVER wv IS NOT NULL AND lead(pw) OVER wv <> 0 THEN 1 ELSE 0 END) AS hc
       |  FROM sp s JOIN alf2 a USING (scene_id, subswath, pol, burst_idx, x0, y0)
       |  WINDOW wv AS (PARTITION BY s.scene_id, s.subswath, s.pol, s.burst_idx, s.x0, s.y0, s.c ORDER BY s.r)),
       |mul AS MATERIALIZED (
       |  SELECT $K, r, c,
       |    re * (CASE WHEN (coalesce(lag(hc) OVER wh, 0) + hc + coalesce(lead(hc) OVER wh, 0)) <> 0
       |          THEN pow((coalesce(lag(hs) OVER wh, 0) + hs + coalesce(lead(hs) OVER wh, 0))
       |                   / (coalesce(lag(hc) OVER wh, 0) + hc + coalesce(lead(hc) OVER wh, 0)), alpha)
       |          ELSE 0 END) AS re,
       |    im * (CASE WHEN (coalesce(lag(hc) OVER wh, 0) + hc + coalesce(lead(hc) OVER wh, 0)) <> 0
       |          THEN pow((coalesce(lag(hs) OVER wh, 0) + hs + coalesce(lead(hs) OVER wh, 0))
       |                   / (coalesce(lag(hc) OVER wh, 0) + hc + coalesce(lead(hc) OVER wh, 0)), alpha)
       |          ELSE 0 END) AS im
       |  FROM h1
       |  WINDOW wh AS (PARTITION BY $K, r ORDER BY c)),
       |$ic
       |$ir
       |fx2 AS MATERIALIZED (SELECT $K, r, c, re, im FROM $irLast),
       |acc AS MATERIALIZED (
       |  SELECT f.scene_id, f.subswath, f.pol, f.burst_idx, f.y0 + f.r AS gy, f.x0 + f.c AS gx,
       |    CAST(sum(CAST(floor(0.031415926535897934 + (((1.0 - abs(f.c - $half2 + 0.5) / $half2) * (1.0 - abs(f.r - $half2 + 0.5) / $half2)) * (f.re / ${F * F}.0)) * 1.0E2) AS BIGINT)) AS BIGINT) AS qre,
       |    CAST(sum(CAST(floor(0.031415926535897934 + (((1.0 - abs(f.c - $half2 + 0.5) / $half2) * (1.0 - abs(f.r - $half2 + 0.5) / $half2)) * (f.im / ${F * F}.0)) * 1.0E2) AS BIGINT)) AS BIGINT) AS qim
       |  FROM fx2 f JOIN gz g ON g.scene_id = f.scene_id AND g.subswath = f.subswath
       |    AND g.pol = f.pol AND g.burst_idx = f.burst_idx
       |    AND g.gy = f.y0 + f.r AND g.gx = f.x0 + f.c AND g.vld
       |  GROUP BY 1, 2, 3, 4, 5, 6)
       |SELECT scene_id, subswath, pol, burst_idx,
       |  CAST(gy // ${Layout.TileH} AS INT) AS tile_y, CAST(gx // ${Layout.TileW} AS INT) AS tile_x,
       |  count(*) AS n_valid,
       |  CAST(sum(CAST(floor(0.031415926535897934 + atan2(qim / 1.0E2, qre / 1.0E2) * 1.0E6) AS BIGINT)) AS BIGINT) AS phase_sum_q
       |FROM acc GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin
  }
}
