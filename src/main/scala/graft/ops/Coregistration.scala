package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.exprs.KernelExprs
import graft.gen.Fixtures
import graft.model.Layout

/**
 * Cross-Correlation tie-point matching + Warp fit (reference CrossCorrelationOp.java:
 * 74-1520, jlinda CoregistrationUtils.java:186-288, WarpOp.java:83-866).
 *
 * Scale-safe Spark shape (NO pixel explode anywhere): each GCP joins to its <= 9
 * covering TILES on tile keys (a partition-prunable equi-join against the tile
 * table), the imagette is sliced from the gathered arrays, and the whole match runs
 * as ONE native kernel call per GCP (graft.exprs.Kernels.fftXcorrMatch / ssdMatch).
 * At 100 TB the shuffled volume is (#GCPs x 9 tiles), not (pixels x probes).
 *
 * Two matchers:
 *  - ssdMatch: integer-lattice SSD argmin (the degenerate planted-translation case,
 *    on the speckled tiles/tiles_sec pair).
 *  - fftXcorrMatch: zero-mean zero-padded FFT cross-correlation, per-lag NCC,
 *    iterative re-centering (<= 10 rounds) + 3-point parabolic subpixel peak and a
 *    coherence threshold — on the band-limited smooth pair with a planted
 *    FRACTIONAL degree-1 warp the engine must recover to +-0.1 px.
 *
 * Warp: degree-1 polynomial least squares per scene with iterative RMS outlier
 * elimination (WarpOp.java:100-105, 708-709), fitted driver-side on the collected
 * GCP offsets (<= 2000 rows — the reference's own driver-side shape).
 */
object Coregistration {

  val Half = 8 // legacy SSD imagette 16x16
  val SearchR = 3 // legacy shift window [-3, 3]^2
  val FracHalf = 16 // FFT imagette 32x32
  val FracSearchR = 4

  /** Join GCPs to their covering tiles (reach px around (cx, cy)) and collect the
   * tile arrays per GCP. `valueCol` is the per-tile array column to gather. */
  private def gatherPatches(gcps: DataFrame, tiles: DataFrame, reach: Int,
      valueCol: String, outCol: String): DataFrame = {
    val keyed = gcps
      .withColumn("tx", explode(expr(
        s"""sequence(greatest(0, CAST(floor((cx - $reach) / ${Layout.TileW}.0) AS INT)),
           |         least(${Layout.TilesX - 1}, CAST(floor((cx + $reach - 1) / ${Layout.TileW}.0) AS INT)))""".stripMargin)))
      .withColumn("ty", explode(expr(
        s"""sequence(greatest(0, CAST(floor((cy - $reach) / ${Layout.TileH}.0) AS INT)),
           |         least(${Layout.TilesY - 1}, CAST(floor((cy + $reach - 1) / ${Layout.TileH}.0) AS INT)))""".stripMargin)))
    keyed.join(
        tiles.select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
          col("tile_x").as("tx"), col("tile_y").as("ty"), col(valueCol).as("arr")),
        Seq("scene_id", "subswath", "pol", "burst_idx", "tx", "ty"))
      .groupBy("gcp_id", "scene_id", "subswath", "pol", "burst_idx", "cx", "cy")
      .agg(collect_list(struct(col("tx").as("tile_x"), col("ty").as("tile_y"), col("arr")))
        .as(outCol))
  }

  /** Per-GCP integer offset estimate (SSD argmin) on the speckled pair. */
  def xcorrOffsetsQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val gcps = Fixtures.table(spark, sfDir, "gcps")
      .select("gcp_id", "scene_id", "subswath", "pol", "burst_idx", "cx", "cy")
    val ref = gatherPatches(gcps, Raster.intensityTiles(spark, sfDir), Half, "v", "ref_tiles")
    val sec = gatherPatches(gcps, Raster.intensityTiles(spark, sfDir, "tiles_sec"),
      Half + SearchR, "v", "sec_tiles")
    ref.join(sec, Seq("gcp_id", "scene_id", "subswath", "pol", "burst_idx", "cx", "cy"))
      .withColumn("m", KernelExprs.ssdMatch(col("ref_tiles"), col("sec_tiles"),
        col("cx"), col("cy"), Half, SearchR, Layout.TileW, Layout.TileH))
      .select(col("gcp_id"), col("scene_id"),
        col("m.est_dx").as("est_dx"), col("m.est_dy").as("est_dy"),
        round(col("m.ssd_min"), 6).as("ssd_min"))
  }

  /** Warp fit (constant-offset model per scene, the degree-0 case of WarpOp's
   * polynomial fit): mean offset + RMS residual from the per-GCP estimates. */
  def warpFitQuery(spark: SparkSession, sfDir: String): DataFrame =
    xcorrOffsetsQuery(spark, sfDir)
      .groupBy("scene_id")
      .agg(
        count(lit(1)).as("n_gcps"),
        round(avg("est_dx"), 6).as("warp_dx"),
        round(avg("est_dy"), 6).as("warp_dy"),
        round(sqrt(greatest(lit(0.0),
          avg(expr("CAST(est_dx AS DOUBLE) * est_dx")) - pow(avg("est_dx"), 2))), 6).as("rms_dx_dev"))

  /** Range-Shift estimation (reference RangeShiftOp: constant range offset from
   * averaged cross-correlation offsets; the azimuth leg is q_esd_shift). */
  def rangeShiftQuery(spark: SparkSession, sfDir: String): DataFrame =
    xcorrOffsetsQuery(spark, sfDir)
      .groupBy("scene_id")
      .agg(count(lit(1)).as("n_gcps"),
        round(avg("est_dx"), 6).as("rg_shift_px"))

  /** Back-geocoding style coregistered stack: apply the *estimated* shift via a
   * tile-key gather (each ref tile joins its <= 4 shifted covering sec tiles), then
   * verify per-burst agreement. No pixel explode (BackGeocodingOp.java:1383-1476
   * shape: compute alignment, resample, stack). */
  def coregStackQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val shifts = xcorrOffsetsQuery(spark, sfDir)
      .groupBy("scene_id")
      .agg(expr("CAST(round(avg(est_dx), 0) AS INT)").as("sdx"),
        expr("CAST(round(avg(est_dy), 0) AS INT)").as("sdy"))
    val ref = Raster.intensityTiles(spark, sfDir)
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("v"))
    val sec = Raster.intensityTiles(spark, sfDir, "tiles_sec")
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_x").as("stx"), col("tile_y").as("sty"), col("v").as("sec_arr"))
    ref.join(broadcast(shifts), Seq("scene_id"))
      .withColumn("stx", explode(expr(
        s"""sequence(greatest(0, CAST(floor((tile_x * ${Layout.TileW} + sdx) / ${Layout.TileW}.0) AS INT)),
           |         least(${Layout.TilesX - 1}, CAST(floor((tile_x * ${Layout.TileW} + ${Layout.TileW - 1} + sdx) / ${Layout.TileW}.0) AS INT)))""".stripMargin)))
      .withColumn("sty", explode(expr(
        s"""sequence(greatest(0, CAST(floor((tile_y * ${Layout.TileH} + sdy) / ${Layout.TileH}.0) AS INT)),
           |         least(${Layout.TilesY - 1}, CAST(floor((tile_y * ${Layout.TileH} + ${Layout.TileH - 1} + sdy) / ${Layout.TileH}.0) AS INT)))""".stripMargin)))
      .join(sec, Seq("scene_id", "subswath", "pol", "burst_idx", "stx", "sty"))
      .groupBy("scene_id", "subswath", "pol", "burst_idx", "tile_x", "tile_y", "sdx", "sdy")
      .agg(first("v").as("v"),
        collect_list(struct(col("stx").as("tile_x"), col("sty").as("tile_y"),
          col("sec_arr").as("arr"))).as("sec_tiles"))
      .withColumn("d", KernelExprs.alignDiff(col("v"), col("sec_tiles"),
        col("tile_x"), col("tile_y"), col("sdx"), col("sdy"), Layout.TileW, Layout.TileH))
      .groupBy("scene_id", "subswath", "pol", "burst_idx")
      .agg(sum(col("d.n")).as("n_px"), round(max(col("d.max_abs")), 6).as("max_abs_diff"))
  }

  /** Per-GCP FRACTIONAL offset via FFT-NCC subpixel matching on the smooth pair;
   * the gate checks recovery of the planted warp to +-0.1 px (truth columns are
   * read only for the comparison, never for estimation). */
  def xcorrFracEstimates(spark: SparkSession, sfDir: String): DataFrame = {
    val gcps = Fixtures.table(spark, sfDir, "gcps_frac")
    val keys = gcps.select("gcp_id", "scene_id", "subswath", "pol", "burst_idx", "cx", "cy")
    val ref = gatherPatches(keys, Fixtures.table(spark, sfDir, "tiles_smooth"),
      FracHalf, "i", "ref_tiles")
    val sec = gatherPatches(keys, Fixtures.table(spark, sfDir, "tiles_smooth_sec"),
      FracHalf + FracSearchR, "i", "sec_tiles")
    ref.join(sec, Seq("gcp_id", "scene_id", "subswath", "pol", "burst_idx", "cx", "cy"))
      .withColumn("m", KernelExprs.fftXcorr(col("ref_tiles"), col("sec_tiles"),
        col("cx"), col("cy"), FracHalf, FracSearchR, Layout.TileW, Layout.TileH))
      .select(col("gcp_id"), col("scene_id"), col("cx"), col("cy"), col("burst_idx"),
        col("m.est_dx").as("est_dx"), col("m.est_dy").as("est_dy"),
        col("m.peak_ncc").as("peak_ncc"))
  }

  def xcorrFracQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = Fixtures.table(spark, sfDir, "gcps_frac")
      .select("gcp_id", "true_fdx", "true_fdy")
    xcorrFracEstimates(spark, sfDir)
      .join(truth, Seq("gcp_id"))
      .select(col("gcp_id"), col("scene_id"),
        (abs(col("est_dx") - col("true_fdx")) <= 0.1).as("ok_dx"),
        (abs(col("est_dy") - col("true_fdy")) <= 0.1).as("ok_dy"))
  }

  /** Degree-1 polynomial warp per scene with iterative RMS outlier elimination
   * (WarpOp.java:708-709): fit dx(x,y), dy(x,y) = a0 + a1*x + a2*y per scene,
   * drop residuals > 1.5*rms, refit (<= 3 rounds). Each round aggregates only
   * the 3x3 normal-equation moments per scene (groupBy + sum — O(scenes) to the
   * driver, never the GCPs) and the residual cut runs executor-side behind a
   * broadcast of the per-scene coefficients, so a 1e5-scene corpus never funnels
   * its GCPs through the driver. Gate: fitted coefficients within tolerance of
   * the planted truth. */
  def warpPolyQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = xcorrFracEstimates(spark, sfDir)
      .where(!isnan(col("est_dx")))
      .select(col("scene_id"), col("cx").cast("double").as("x"),
        (expr(s"(burst_idx - 1) * ${Layout.LinesPerBurst}") + col("cy")).cast("double").as("y"),
        col("est_dx").as("dx"), col("est_dy").as("dy"))
      .persist()
    base.count()

    // LS on basis [1, x, y] via 3x3 normal equations (Cramer) from moment sums
    def fitM(s00: Double, s01: Double, s02: Double, s11: Double, s12: Double,
             s22: Double, b0: Double, b1: Double, b2: Double): Array[Double] = {
      val det = s00 * (s11 * s22 - s12 * s12) - s01 * (s01 * s22 - s12 * s02) +
        s02 * (s01 * s12 - s11 * s02)
      if (math.abs(det) < 1e-12) return Array(if (s00 > 0) b0 / s00 else 0.0, 0.0, 0.0)
      val a0 = (b0 * (s11 * s22 - s12 * s12) - s01 * (b1 * s22 - s12 * b2) +
        s02 * (b1 * s12 - s11 * b2)) / det
      val a1 = (s00 * (b1 * s22 - b2 * s12) - b0 * (s01 * s22 - s12 * s02) +
        s02 * (s01 * b2 - b1 * s02)) / det
      val a2 = (s00 * (s11 * b2 - b1 * s12) - s01 * (s01 * b2 - b1 * s02) +
        b0 * (s01 * s12 - s11 * s02)) / det
      Array(a0, a1, a2)
    }

    /** Per-scene robust fit of column `d`, distributed: returns
     * scene -> (kept-point count at last fit, coefficients). */
    def robustFitDist(d: Column): Map[String, (Long, Array[Double])] = {
      var kept = base.select(col("scene_id"), col("x"), col("y"), d.as("d"))
      def solveNow(): Array[(String, Long, Array[Double])] =
        kept.groupBy("scene_id").agg(
          count(lit(1)).as("n"), sum("x").as("s01"), sum("y").as("s02"),
          sum(col("x") * col("x")).as("s11"), sum(col("x") * col("y")).as("s12"),
          sum(col("y") * col("y")).as("s22"), sum("d").as("b0"),
          sum(col("x") * col("d")).as("b1"), sum(col("y") * col("d")).as("b2"))
          .collect().map { r =>
            val n = r.getAs[Long]("n")
            (r.getString(0), n, fitM(n.toDouble, r.getAs[Double]("s01"),
              r.getAs[Double]("s02"), r.getAs[Double]("s11"), r.getAs[Double]("s12"),
              r.getAs[Double]("s22"), r.getAs[Double]("b0"), r.getAs[Double]("b1"),
              r.getAs[Double]("b2")))
          }
      var fits = solveNow()
      var round = 0
      var stable = false
      // the persisted frame of the PREVIOUS round — unpersisted as soon as it is
      // superseded, so robust-fit rounds don't accumulate cached blocks in the
      // long-lived Verify JVM (ADVICE r3)
      var keptPersisted: DataFrame = null
      // fixed point: a scene whose cut removes nothing refits to identical
      // coefficients, so iterating it again is a no-op — one global stop flag
      // reproduces the reference's per-scene early exit exactly
      while (round < 3 && !stable) {
        val coefDf = fits.toSeq.map { case (s, n, c) => (s, n, c(0), c(1), c(2)) }
          .toDF("scene_id", "n0", "a0", "a1", "a2")
        val joined = kept.join(broadcast(coefDf), Seq("scene_id"))
          .withColumn("res", col("d") - (col("a0") + col("a1") * col("x") + col("a2") * col("y")))
        val rms = joined.groupBy("scene_id")
          .agg(sqrt(sum(col("res") * col("res")) / count(lit(1))).as("rms"))
        val filtered = joined.join(broadcast(rms), Seq("scene_id"))
          .where(col("n0") <= 4 || abs(col("res")) <= greatest(col("rms") * 1.5, lit(1e-9)))
          .select("scene_id", "x", "y", "d")
          .persist()
        val before = fits.map(_._2).sum
        if (filtered.count() == before) { stable = true; filtered.unpersist() }
        else {
          if (keptPersisted != null) keptPersisted.unpersist()
          keptPersisted = filtered; kept = filtered; fits = solveNow()
        }
        round += 1
      }
      if (keptPersisted != null) keptPersisted.unpersist()
      fits.map(f => f._1 -> (f._2, f._3)).toMap
    }

    val nGcps0 = base.groupBy("scene_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fx = robustFitDist(col("dx"))
    val fy = robustFitDist(col("dy"))
    base.unpersist()

    val truth = Fixtures.table(spark, sfDir, "warp_truth")
    val fitted = nGcps0.keys.toSeq.sorted.map { scene =>
      val cx = fx(scene)._2; val cy = fy(scene)._2
      (scene, nGcps0(scene), cx(0), cx(1), cx(2), cy(0), cy(1), cy(2))
    }.toDF("scene_id", "n_gcps", "fa0x", "fa1x", "fa2x", "fa0y", "fa1y", "fa2y")
    // gate on PREDICTION error at GCP-hull probe points (the operational warp
    // accuracy; raw coefficients trade off on the 3-column pin lattice): the fitted
    // polynomial must match the planted one to <= 0.1 px everywhere on the hull
    val probes = Seq((32.0, 88.0), (32.0, 488.0), (96.0, 88.0), (96.0, 488.0), (64.0, 288.0))
    def maxPredErr(f0: String, f1: String, f2: String, t0: String, t1: String, t2: String) =
      probes.map { case (px, py) =>
        abs((col(f0) + col(f1) * px + col(f2) * py) - (col(t0) + col(t1) * px + col(t2) * py))
      }.reduce(greatest(_, _))
    fitted.join(truth, Seq("scene_id"))
      .select(col("scene_id"), col("n_gcps"),
        (maxPredErr("fa0x", "fa1x", "fa2x", "a0x", "a1x", "a2x") <= 0.1).as("ok_x"),
        (maxPredErr("fa0y", "fa1y", "fa2y", "a0y", "a1y", "a2y") <= 0.1).as("ok_y"))
  }

  /**
   * Degree-2 polynomial warp (the reference DEFAULT, WarpOp.java:105
   * warpPolynomialOrder = 2): basis [1, x, y, x^2, xy, y^2]. The normal-equation
   * moments aggregate DISTRIBUTED per scene (groupBy + sum — only the 6x6 moment
   * matrix reaches the driver, O(scenes) not O(GCPs), fixing the round-2 global
   * GCP collect), then LinSolve solves per scene. Gate: the fitted quadratic must
   * predict the planted (degree-1) warp to <= 0.1 px at the hull probes — the
   * quadratic terms must come out ~0 for that to hold.
   */
  def warpPoly2Query(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ests = xcorrFracEstimates(spark, sfDir)
      .where(!isnan(col("est_dx")))
      .select(col("scene_id"), col("cx").cast("double").as("x"),
        (expr(s"(burst_idx - 1) * ${Layout.LinesPerBurst}") + col("cy")).cast("double").as("y"),
        col("est_dx").as("dx"), col("est_dy").as("dy"))
    val basis = Seq("1.0D", "x", "y", "x * x", "x * y", "y * y")
    val momCols =
      (for (i <- 0 until 6; j <- i until 6)
        yield sum(expr(s"(${basis(i)}) * (${basis(j)})")).as(s"m${i}_$j")) ++
        (for (i <- 0 until 6) yield sum(expr(s"(${basis(i)}) * dx")).as(s"bx$i")) ++
        (for (i <- 0 until 6) yield sum(expr(s"(${basis(i)}) * dy")).as(s"by$i")) :+
        count(lit(1)).as("n_gcps")
    val moments = ests.groupBy("scene_id").agg(momCols.head, momCols.tail: _*).collect()
    val fits = moments.map { r =>
      def m = Array.tabulate(6, 6)((i, j) =>
        r.getDouble(r.fieldIndex(s"m${math.min(i, j)}_${math.max(i, j)}")))
      val cx = graft.geom.LinSolve.solve(m, Array.tabulate(6)(i => r.getDouble(r.fieldIndex(s"bx$i"))))
      val cy = graft.geom.LinSolve.solve(m, Array.tabulate(6)(i => r.getDouble(r.fieldIndex(s"by$i"))))
      (r.getString(0), r.getLong(r.fieldIndex("n_gcps")), cx, cy)
    }
    val probes = Seq((32.0, 88.0), (32.0, 488.0), (96.0, 88.0), (96.0, 488.0), (64.0, 288.0))
    val fitted = fits.toSeq.toDF("scene_id", "n_gcps", "cx", "cy")
    val truth = Fixtures.table(spark, sfDir, "warp_truth")
    fitted.join(truth, Seq("scene_id"))
      .select(col("scene_id"), col("n_gcps"),
        probes.map { case (px, py) =>
          abs(expr(s"cx[0] + cx[1] * $px + cx[2] * $py + cx[3] * $px * $px + cx[4] * $px * $py + cx[5] * $py * $py") -
            (col("a0x") + col("a1x") * px + col("a2x") * py))
        }.reduce(greatest(_, _)).leq(0.1).as("ok_x"),
        probes.map { case (px, py) =>
          abs(expr(s"cy[0] + cy[1] * $px + cy[2] * $py + cy[3] * $px * $px + cy[4] * $px * $py + cy[5] * $py * $py") -
            (col("a0y") + col("a1y") * px + col("a2y") * py))
        }.reduce(greatest(_, _)).leq(0.1).as("ok_y"))
  }
}
