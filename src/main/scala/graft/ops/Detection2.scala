package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.exprs.KernelExprs
import graft.model.Layout

/**
 * Feature-extraction / classification operators (reference sar-op-feature-extraction:
 * OilSpillDetectionOp.java, SpeckleDivergenceOp.java, ForestAreaDetectionOp.java,
 * WindFieldEstimationOp.java, ObjectDiscriminationOp.java, DecisionTreeOp,
 * PrincipalComponentsOp). Per-pixel / windowed closed forms over the dyadic grid;
 * PCA is the groupBy(band-pair).closed-form-eigen shape with integer-exact moments.
 */
object Detection2 {

  private val ND = Raster.ND
  private val N = Layout.TileW * Layout.TileH
  private val W = Layout.TileW

  /** Oil-spill (dark-area) detection: pixel is dark when v < k * mean5x5; per-tile
   * dark count (OilSpillDetectionOp threshold-below-background shape). */
  val OilK = 0.5
  def oilSpillQuery(spark: SparkSession, sfDir: String): DataFrame =
    Speckle.haloTiles(spark, sfDir, margin = 2)
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"),
        KernelExprs.darkCount(col("halo"), W, Raster.H, 2, OilK).as("n_dark"))

  /** Speckle divergence: out = vr / m^2 over the 3x3 window (texture measure). */
  def speckleDivergenceQuery(spark: SparkSession, sfDir: String): DataFrame =
    Raster.rollup(Speckle.filterOver(Speckle.haloTiles(spark, sfDir), "specklediv", 1))

  /** Wind-field estimation (CMOD-lite): w = (v / (150 sin(theta)))^0.6 with the
   * incidence angle a linear function of range position — the per-pixel inversion
   * shape of WindFieldEstimationOp (the full CMOD5 polynomial swaps in here). */
  def windFieldQuery(spark: SparkSession, sfDir: String): DataFrame =
    Raster.rollup(Raster.intensityTiles(spark, sfDir).where(col("pol") === "VV")
      .withColumn("out", expr(
        s"""transform(sequence(0, ${N - 1}), k ->
           |  if(element_at(v, k + 1) = $ND, $ND,
           |    pow(element_at(v, k + 1) / (150D * sin(radians(20D + 20D * (tile_x * $W + k % $W) / ${Layout.SamplesPerBurst}))), 0.6D)))""".stripMargin)))

  /** Forest-area detection: forest = (vh/vv in [0.3, 0.9]) AND vv above floor;
   * per-tile forest-pixel count (band-ratio classification shape). */
  def forestAreaQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val vv = Raster.intensityTiles(spark, sfDir).where(col("pol") === "VV")
      .select(col("scene_id"), col("subswath"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("v").as("vvv"))
    val vh = Raster.intensityTiles(spark, sfDir).where(col("pol") === "VH")
      .select(col("scene_id"), col("subswath"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("v").as("vvh"))
    vv.join(vh, Seq("scene_id", "subswath", "burst_idx", "tile_x", "tile_y"))
      .select(col("scene_id"), col("subswath"), col("burst_idx"), col("tile_y"), col("tile_x"),
        expr(
          s"""CAST(size(filter(zip_with(vvv, vvh, (a, b) ->
             |  if(a != $ND and b != $ND and a > 30D and b / a >= 0.3D and b / a <= 0.9D, 1D, 0D)),
             |  x -> x = 1D)) AS BIGINT)""".stripMargin).as("n_forest"))
  }

  /** Forest-Area-Classification class boundaries on the VH/VV ratio (the
   * reference's [3.76, 6.55] forest band rescaled to the fixture's ratio
   * range, ForestAreaClassificationOp.java:56-58). */
  val FcLow = 0.3
  val FcHigh = 0.9

  /** Forest-Area-Classification (ForestAreaClassificationOp.java:44-58, 216-330):
   * initial classes from ratio-range boundaries (1 = forest [FcLow, FcHigh),
   * 2 = below, 3 = above), exact per-class center means from the
   * dyadic-quantized ratios, then one maximum-likelihood reassignment pass
   * (argmin |r - center|, lowest class wins ties — the equal-variance
   * simplification of the reference's Mahalanobis distance, documented).
   * Output: per-tile class counts. The center frame is 3 rows — broadcast. */
  def forestClassQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val dv = Raster.DyadicV
    val keys = Seq("scene_id", "subswath", "burst_idx", "tile_x", "tile_y")
    def side(pol: String, as: String) =
      Raster.intensityTiles(spark, sfDir).where(col("pol") === pol)
        .select((keys.map(col) :+ col("v").as(as)): _*)
    val rq = side("VV", "vvv").join(side("VH", "vvh"), keys)
      .withColumn("rq", expr(
        s"""zip_with(vvh, vvv, (b, a) -> if(a = $ND or b = $ND or a <= 0D, CAST(NULL AS DOUBLE),
           |  floor(b / a * $dv) / $dv))""".stripMargin))
      .select((keys.map(col) :+ col("rq")): _*)
    val binned = rq.select(col("scene_id"), explode(col("rq")).as("r"))
      .where(col("r").isNotNull)
      .withColumn("cls", expr(
        s"CASE WHEN r >= $FcLow AND r < $FcHigh THEN 1 WHEN r < $FcLow THEN 2 ELSE 3 END"))
    // per-scene centers (the reference clusters per product)
    val centers = binned.groupBy("scene_id", "cls")
      .agg(count(lit(1)).as("nc"),
        sum(expr(s"CAST(floor(0.031415926535897934 + r * $dv) AS BIGINT)")).as("sq"))
      .withColumn("center", expr(s"CAST(sq AS DOUBLE) / CAST(nc AS DOUBLE) / $dv"))
      .groupBy("scene_id")
      .pivot("cls", Seq("1", "2", "3"))
      .agg(first("center"))
      .select(col("scene_id"), col("1").as("c1"), col("2").as("c2"), col("3").as("c3"))
    val counts = (1 to 3).map(c => expr(
      s"""CAST(size(filter(rq, r -> r IS NOT NULL
         |  AND (CASE WHEN abs(r - c1) <= abs(r - c2) AND abs(r - c1) <= abs(r - c3) THEN 1
         |            WHEN abs(r - c2) <= abs(r - c3) THEN 2 ELSE 3 END) = $c)) AS BIGINT)""".stripMargin)
      .as(s"n_class$c"))
    rq.join(broadcast(centers), Seq("scene_id"))
      .select((Seq("scene_id", "subswath", "burst_idx", "tile_y", "tile_x").map(col) ++ counts): _*)
  }

  /** Principal components over the (VV, VH) band pair per (scene, subswath):
   * closed-form 2x2 eigenvalues from integer-exact second moments. */
  def pcaQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val vv = Raster.intensityTiles(spark, sfDir).where(col("pol") === "VV")
      .select(col("scene_id"), col("subswath"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("v").as("va"))
    val vh = Raster.intensityTiles(spark, sfDir).where(col("pol") === "VH")
      .select(col("scene_id"), col("subswath"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("v").as("vb"))
    val q = "1.0E4" // quantize pair products (v*v exceeds exact-sum range at scene size)
    vv.join(vh, Seq("scene_id", "subswath", "burst_idx", "tile_x", "tile_y"))
      .withColumn("zz", expr(s"zip_with(va, vb, (a, b) -> struct(a AS a, b AS b))"))
      .groupBy("scene_id", "subswath")
      .agg(
        sum(expr(s"CAST(size(filter(zz, t -> t.a != $ND and t.b != $ND)) AS BIGINT)")).as("n"),
        sum(expr(s"aggregate(zz, 0L, (s, t) -> s + if(t.a = $ND or t.b = $ND, 0L, CAST(floor(0.031415926535897934 + t.a * $q) AS BIGINT)))")).as("sa_q"),
        sum(expr(s"aggregate(zz, 0L, (s, t) -> s + if(t.a = $ND or t.b = $ND, 0L, CAST(floor(0.031415926535897934 + t.b * $q) AS BIGINT)))")).as("sb_q"),
        sum(expr(s"aggregate(zz, 0L, (s, t) -> s + if(t.a = $ND or t.b = $ND, 0L, CAST(floor(0.031415926535897934 + t.a * t.a * $q) AS BIGINT)))")).as("saa_q"),
        sum(expr(s"aggregate(zz, 0L, (s, t) -> s + if(t.a = $ND or t.b = $ND, 0L, CAST(floor(0.031415926535897934 + t.b * t.b * $q) AS BIGINT)))")).as("sbb_q"),
        sum(expr(s"aggregate(zz, 0L, (s, t) -> s + if(t.a = $ND or t.b = $ND, 0L, CAST(floor(0.031415926535897934 + t.a * t.b * $q) AS BIGINT)))")).as("sab_q"))
      // covariance + eigen from the exact integer moments — identical staged
      // arithmetic both engines (caa/cbb/cab then trace/disc/lambdas)
      .withColumn("ma", expr(s"sa_q / $q / n"))
      .withColumn("mb", expr(s"sb_q / $q / n"))
      .withColumn("caa", expr(s"saa_q / $q / n - ma * ma"))
      .withColumn("cbb", expr(s"sbb_q / $q / n - mb * mb"))
      .withColumn("cab", expr(s"sab_q / $q / n - ma * mb"))
      .withColumn("disc", expr("sqrt((caa - cbb) * (caa - cbb) + 4D * cab * cab)"))
      .select(col("scene_id"), col("subswath"), col("n"),
        expr("CAST(floor(0.031415926535897934 + (caa + cbb + disc) / 2D * 1.0E3) AS BIGINT)").as("lambda1_q"),
        expr("CAST(floor(0.031415926535897934 + (caa + cbb - disc) / 2D * 1.0E3) AS BIGINT)").as("lambda2_q"))
  }

  /** Object discrimination: size-gate the CFAR detections per tile
   * (ObjectDiscriminationOp min/max target size rule, at tile granularity). */
  def objectDiscriminationQuery(spark: SparkSession, sfDir: String): DataFrame =
    Detection.cfarQuery(spark, sfDir)
      .where(col("n_detect") > 0)
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"), col("n_detect"),
        expr("CASE WHEN n_detect BETWEEN 2 AND 50 THEN 'target' WHEN n_detect < 2 THEN 'speck' ELSE 'clutter' END")
          .as("class"))

  /** Decision-tree classification: per-pixel rule cascade over (vv, vh/vv);
   * per-tile class counts. */
  def decisionTreeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val vv = Raster.intensityTiles(spark, sfDir).where(col("pol") === "VV")
      .select(col("scene_id"), col("subswath"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("v").as("vvv"))
    val vh = Raster.intensityTiles(spark, sfDir).where(col("pol") === "VH")
      .select(col("scene_id"), col("subswath"), col("burst_idx"),
        col("tile_x"), col("tile_y"), col("v").as("vvh"))
    val cls = s"""zip_with(vvv, vvh, (a, b) ->
                 |  if(a = $ND or b = $ND, -1,
                 |    if(a < 60D, 0, if(b / a > 0.55D, 1, 2))))""".stripMargin
    vv.join(vh, Seq("scene_id", "subswath", "burst_idx", "tile_x", "tile_y"))
      .select(col("scene_id"), col("subswath"), col("burst_idx"), col("tile_y"), col("tile_x"),
        expr(s"CAST(size(filter($cls, x -> x = 0)) AS BIGINT)").as("n_water"),
        expr(s"CAST(size(filter($cls, x -> x = 1)) AS BIGINT)").as("n_vegetation"),
        expr(s"CAST(size(filter($cls, x -> x = 2)) AS BIGINT)").as("n_urban"))
  }

  // -------------------------------------------- connected-component clustering

  /** Detection threshold / size gates for object clustering. */
  val ClusterThr = 250.0

  /** Upper bound on label-propagation rounds: the engine stops at the exact
   * convergence fixed point (the reference ObjectDiscriminationOp.java:74
   * clusters to completion); the DuckDB oracles unroll exactly this bound, so
   * both sides agree whenever every component's diameter stays below it. The
   * planted L-snakes (gen.Fixtures.snakeSql, diameter ~14) sit well inside. */
  val CcMaxRounds = 40
  val MinClusterPx = 2
  val MaxClusterPx = 500

  /**
   * Connected-component object clustering (reference ObjectDiscriminationOp.java:74
   * clustering of CFAR detections; OilSpillClusteringOp.java:46 is the same shape
   * on dark pixels): sparse above-threshold pixels (compiled extraction — the full
   * pixel volume is never exploded), then convergence-checked rounds of
   * 8-connected min-label propagation — each round one narrow shuffle keyed by
   * pixel position, stopped when the (overflow-proof DECIMAL) label sum stops
   * decreasing — and a final per-label size/extent aggregation with the
   * reference's min/max target size discrimination. Labels only decrease, so
   * the sum is strictly decreasing until the true fixed point (VERDICT r3 #4:
   * a fixed round count under-merges long chains).
   */
  def objectClusterQuery(spark: SparkSession, sfDir: String): DataFrame =
    ccClusters(
      Raster.intensityTiles(spark, sfDir).where(col("pol") === "VV")
        .withColumn("ks", graft.exprs.KernelExprs.aboveThr(col("v"), ClusterThr)),
      MinClusterPx, MaxClusterPx)

  /** Minimum oil-slick cluster size in pixels (OilSpillClusteringOp.java:46
   * minClusterSizeInKm -> pixels; no upper bound in the reference). */
  val OilMinClusterPx = 3

  /** Oil-spill clustering: connected components over the dark-pixel mask of the
   * oil-spill detector, keeping slicks of at least OilMinClusterPx pixels
   * (OilSpillClusteringOp.java:46 clustering + size gate). */
  def oilSpillClusterQuery(spark: SparkSession, sfDir: String): DataFrame =
    ccClusters(
      Speckle.haloTiles(spark, sfDir, margin = 2)
        .withColumn("ks", graft.exprs.KernelExprs.darkKs(col("halo"), W, Raster.H, 2, OilK)),
      OilMinClusterPx, Long.MaxValue)

  /** Shared connected-component pipeline: sparse flagged-pixel indices per tile
   * (column `ks`), CcIters rounds of 8-connected min-label propagation, per-label
   * size/extent aggregation with a size gate. */
  private def ccClusters(flagged: DataFrame, minPx: Long, maxPx: Long): DataFrame = {
    val keys = Seq("scene_id", "subswath", "pol", "burst_idx")
    var dets = flagged
      .select((keys ++ Seq("tile_x", "tile_y")).map(col) :+ explode(col("ks")).as("k"): _*)
      .withColumn("gx", col("tile_x") * Layout.TileW + col("k") % Layout.TileW)
      .withColumn("gy", col("tile_y") * Layout.TileH + expr(s"k div ${Layout.TileW}"))
      .withColumn("label", (col("gy") * Layout.SamplesPerBurst + col("gx")).cast("long"))
      .select((keys ++ Seq("gx", "gy", "label")).map(col): _*)
    val offs = expr("explode(array(" +
      (for (dy <- -1 to 1; dx <- -1 to 1) yield s"struct($dy AS dy, $dx AS dx)").mkString(", ") + "))")
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.select(sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect()(0).getDecimal(0)
    // localCheckpoint (eager) BOTH caches the round's frame AND truncates the
    // logical plan: persist alone leaves the lineage growing by one join per
    // round, so Catalyst re-plans (and AQE re-renders the plan string of) an
    // O(rounds)-deep tree every round — O(rounds^2) driver work that wedged the
    // 40-round version for >20 min. With a truncated plan each round is a
    // constant-size narrow shuffle. (On a multi-executor cluster the reliable
    // variant is sc.setCheckpointDir + checkpoint(); local checkpointing is the
    // single-JVM equivalent.) Superseded blocks are reclaimed by the
    // ContextCleaner once the reference drops (Verify forces periodic GC).
    dets = dets.localCheckpoint()
    var prevSum = labelSum(dets)
    var converged = prevSum == null // empty mask -> nothing to propagate
    var it = 0
    while (!converged && it < CcMaxRounds) {
      val contrib = dets
        .select((keys ++ Seq("gx", "gy", "label")).map(col) :+ offs.as("o"): _*)
        .select(keys.map(col) :+ (col("gx") + col("o.dx")).as("tgx") :+
          (col("gy") + col("o.dy")).as("tgy") :+ col("label"): _*)
      val minl = contrib.groupBy((keys ++ Seq("tgx", "tgy")).map(col): _*)
        .agg(min("label").as("nl"))
        .withColumnRenamed("tgx", "gx").withColumnRenamed("tgy", "gy")
      dets = dets.drop("label").join(minl, keys ++ Seq("gx", "gy"))
        .withColumnRenamed("nl", "label")
        .localCheckpoint()
      val s = labelSum(dets)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      it += 1
    }
    // eagerly materialize the tiny per-label rollup, then drop the cached
    // label frame (block-manager hygiene in the long-lived Verify JVM)
    dets.groupBy((keys :+ "label").map(col): _*)
      .agg(count(lit(1)).as("n_px"),
        min("gx").as("min_gx"), max("gx").as("max_gx"),
        min("gy").as("min_gy"), max("gy").as("max_gy"))
      .where(col("n_px") >= minPx && col("n_px") <= maxPx)
      .localCheckpoint()
  }

  /** Full CMOD5 wind-speed inversion (WindFieldEstimationOp.java:885-912 +
   * CMOD5.compute :1029-1122): per-tile mean NRCS (the 20-km block shape), a
   * deterministic per-burst wind-direction input, incidence angle linear in
   * range position, 200-candidate grid search in compiled code. */
  def windCmod5Query(spark: SparkSession, sfDir: String): DataFrame =
    Raster.intensityTiles(spark, sfDir).where(col("pol") === "VV")
      .withColumn("theta", expr(s"20.0D + 20.0D * (tile_x * ${Layout.TileW} + ${Layout.TileW / 2}) / ${Layout.SamplesPerBurst}.0D"))
      .withColumn("fi", expr("atan2((burst_idx - 5) / 4.0D, 1.0D) * 57.29577951308232D"))
      .withColumn("cosfi", expr("cos(fi * 0.017453292519943295D)"))
      .withColumn("o", graft.exprs.KernelExprs.cmod5(col("v"), col("theta"), col("cosfi")))
      .where(col("o.n") > 0)
      .select(col("scene_id"), col("subswath"), col("pol"), col("burst_idx"),
        col("tile_y"), col("tile_x"),
        col("o.n").as("n_valid"), col("o.idx").as("err_min_idx"),
        expr("CAST(o.idx + 1 AS DOUBLE) * 0.1D").as("wind_speed"))
}
