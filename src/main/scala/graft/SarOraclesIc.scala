package graft

import graft.ops.InSARCorrections

/**
 * DuckDB oracles for the InSAR phase-correction family (ionospheric split-spectrum,
 * empirical tropospheric fit, horizontal/vertical motion). Per-pixel formula text
 * is shared verbatim with ops.InSARCorrections (identical IEEE staging); the tropo
 * fit runs on dyadic-quantized samples so its global sums are exact cross-engine.
 */
object SarOraclesIc {

  private def q6(e: String) = s"CAST(floor(0.031415926535897934 + ($e) * 1.0E6) AS BIGINT)"
  private val keys = "scene_id, subswath, pol, burst_idx, tile_y, tile_x"

  /** q_iono twin — restates the FULL reference pipeline the compiled kernel runs
   * (IonosphericCorrectionOp.java:289-480): raw split-spectrum estimate,
   * coherence-threshold weights, separable weighted Gaussian as TWO lag/lead
   * window passes (the 423a6e3 no-self-join discipline; zero padding = the
   * coalesced out-of-partition lags), filtered = conv(w*d)/conv(w), corrected =
   * wrap(phiF - filtered). Kernel weights are Double.toString literals of the
   * SAME JVM Math.exp values the compiled kernel computes. */
  val iono: String = {
    val sg = InSARCorrections.IonoSigma
    val thr = InSARCorrections.IonoCohThr
    val hw = (8 * sg + 1) / 2
    val ker = (0 to 2 * hw).map { i => val r = i - hw; math.exp(-(r * r) / (2.0 * sg * sg)) }
    def chain(v: String, part: String, ord: String): String =
      (-hw to hw).map { r =>
        val k = ker(r + hw)
        if (r < 0) s"$k * coalesce(lag($v, ${-r}) OVER (PARTITION BY $part ORDER BY $ord), 0)"
        else if (r == 0) s"$k * $v"
        else s"$k * coalesce(lead($v, $r) OVER (PARTITION BY $part ORDER BY $ord), 0)"
      }.mkString("(", " + ", ")")
    val phf = "atan2(cim, cre)"
    val iraw = InSARCorrections.ionoSql(
      InSARCorrections.phlSql(phf, "gx"), InSARCorrections.phhSql(phf, "gy"))
    val kb = "scene_id, subswath, pol, burst_idx"
    s"""WITH ${SarOracles2.crossCte},
       |r0 AS MATERIALIZED (
       |  SELECT *, cim <> -9999.0 AND cre <> -9999.0 AS vld FROM cx),
       |r1 AS MATERIALIZED (
       |  SELECT *,
       |    CASE WHEN vld THEN $phf ELSE 0 END AS phv,
       |    CASE WHEN vld THEN
       |      (CASE WHEN (0.2 + 0.8 * abs(sin(gx / 17.0) * cos(gy / 13.0))) < $thr THEN 0.0
       |            ELSE (0.2 + 0.8 * abs(sin(gx / 17.0) * cos(gy / 13.0))) END)
       |      ELSE 0.0 END AS wgt,
       |    CASE WHEN vld THEN $iraw ELSE 0 END AS iraw
       |  FROM r0),
       |r2 AS MATERIALIZED (SELECT *, wgt * iraw AS wd FROM r1),
       |xp AS MATERIALIZED (
       |  SELECT *, ${chain("wd", s"$kb, gy", "gx")} AS xwd,
       |            ${chain("wgt", s"$kb, gy", "gx")} AS xw
       |  FROM r2),
       |yp AS MATERIALIZED (
       |  SELECT *, ${chain("xwd", s"$kb, gx", "gy")} AS cwd,
       |            ${chain("xw", s"$kb, gx", "gy")} AS cw
       |  FROM xp),
       |fin AS MATERIALIZED (
       |  SELECT *, vld AND cw <> 0.0 AS ok,
       |    CASE WHEN vld AND cw <> 0.0 THEN cwd / cw ELSE 0 END AS filtered
       |  FROM yp),
       |fin2 AS MATERIALIZED (
       |  SELECT *, atan2(sin(phv - filtered), cos(phv - filtered)) AS corr FROM fin)
       |SELECT $keys,
       |  count(*) FILTER (ok) AS n_valid,
       |  CAST(coalesce(sum(${q6("filtered")}) FILTER (ok), 0) AS BIGINT) AS iono_sum_q,
       |  CAST(coalesce(sum(${q6("corr")}) FILTER (ok), 0) AS BIGINT) AS corr_sum_q
       |FROM fin2 GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin
  }

  val tropo: String = {
    val phf = "atan2(cim, cre)"
    val z = "(100.0 + 50.0 * sin((gx) / 40.0) + 40.0 * cos((gy) / 25.0))"
    val zq = s"(floor(($z) * CAST(256.0 AS DOUBLE)) / CAST(256.0 AS DOUBLE))"
    val pq = s"(floor(($phf) * CAST(65536.0 AS DOUBLE)) / CAST(65536.0 AS DOUBLE))"
    s"""WITH ${SarOracles2.crossCte},
       |u AS (SELECT *, cim <> -9999.0 AND cre <> -9999.0 AND ($z) >= 1.0 AS use_px FROM cx),
       |fit0 AS (
       |  SELECT scene_id, subswath, pol,
       |    CAST(count(*) FILTER (use_px) AS DOUBLE) AS fn,
       |    coalesce(sum($zq) FILTER (use_px), 0) AS sz,
       |    coalesce(sum($zq * $zq) FILTER (use_px), 0) AS szz,
       |    coalesce(sum($pq) FILTER (use_px), 0) AS sp,
       |    coalesce(sum($zq * $pq) FILTER (use_px), 0) AS spz
       |  FROM u GROUP BY 1, 2, 3),
       |fit1 AS (SELECT *, (fn * spz - sz * sp) / (fn * szz - sz * sz) AS c1 FROM fit0),
       |fit AS (SELECT *, (sp - c1 * sz) / fn AS c0 FROM fit1),
       |o AS (
       |  SELECT u.scene_id, u.subswath, u.pol, u.burst_idx, u.tile_y, u.tile_x,
       |    CASE WHEN use_px THEN ($phf) - (c0 + c1 * ($z)) ELSE -9999.0 END AS out
       |  FROM u JOIN fit f ON f.scene_id = u.scene_id AND f.subswath = u.subswath AND f.pol = u.pol)
       |${SarOracles.rollupSql(1.0)}""".stripMargin
  }

  val hvMotion: String = {
    import InSARCorrections._
    val phd = "atan2(d.cim, d.cre)"
    val pha = "atan2(a.cim, a.cre)"
    val (dD, dA) = (defoSql(phd), defoSql(pha))
    val a1 = s"(0.0 - cos(${radSql(HeadingDsc)})) * sin(${radSql(incDscSql("d.gx"))})"
    val a2 = s"(0.0 - cos(${radSql(HeadingAsc)})) * sin(${radSql(incAscSql("d.gx"))})"
    val b1 = s"cos(${radSql(incDscSql("d.gx"))})"
    val b2 = s"cos(${radSql(incAscSql("d.gx"))})"
    val den = s"(($a1) * ($b2) - ($b1) * ($a2))"
    val hm = s"((($dD) * ($b2) - ($b1) * ($dA)) / $den)"
    val vm = s"((($a1) * ($dA) - ($dD) * ($a2)) / $den)"
    s"""WITH ${SarOracles2.crossCte},
       |cs AS (SELECT *, CAST(substring(scene_id, 7, 4) AS INT) AS scene_idx FROM cx WHERE pol = 'VV'),
       |cp AS (SELECT *, scene_idx // 2 AS pair_idx FROM cs),
       |j AS (
       |  SELECT d.scene_id, d.subswath, d.pol, d.burst_idx, d.tile_y, d.tile_x, d.gx,
       |    d.cre, d.cim, a.cre AS acre, a.cim AS acim,
       |    d.cim <> -9999.0 AND d.cre <> -9999.0 AND a.cim <> -9999.0 AND a.cre <> -9999.0 AS vld,
       |    ${q6(hm)} AS hq, ${q6(vm)} AS vq
       |  FROM cp d
       |  JOIN cp a ON a.pair_idx = d.pair_idx AND a.subswath = d.subswath
       |    AND a.pol = d.pol AND a.burst_idx = d.burst_idx AND a.gx = d.gx AND a.gy = d.gy
       |    AND a.scene_idx % 2 = 1
       |  WHERE d.scene_idx % 2 = 0)
       |SELECT $keys,
       |  count(*) FILTER (vld) AS n_valid,
       |  CAST(coalesce(sum(hq) FILTER (vld), 0) AS BIGINT) AS h_sum_q,
       |  CAST(coalesce(sum(vq) FILTER (vld), 0) AS BIGINT) AS v_sum_q
       |FROM j GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin
  }
}
