package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Speckle filters (reference dispatcher SpeckleFilterOp.java:44-326; kernels in
 * filtering/SpeckleFilters/). Exact ports of the per-window math:
 *  - neighborhood gather with out-of-raster/no-data -> sentinel, complex -> i^2+q^2
 *    (SpeckleFilter.getNeighborValues:78-146)
 *  - mean over valid, sentinel when none (getMeanValue:169-183)
 *  - sample variance (n-1), 0 when n<2 (getVarianceValue:195-211)
 *  - Boxcar = mean (Boxcar.java), Median = sorted[n/2] (Median.java:150-162)
 *  - Lee (Lee.java:168-187): ci < cu -> mean else cp*w + mean*(1-w), w = 1 - cu^2/ci^2
 *  - Gamma-MAP (GammaMap.java:166-199): ci <= cu -> mean; ci < sqrt(2)*cu -> MAP solve
 *    with d < 0 -> cp; else cp
 * Window = 3x3, ENL is a parameter (cu = 1/sqrt(enl), SpeckleFilterOp behavior with
 * estimateENL = false). cp is the *raw* window center, as in the reference.
 *
 * Execution shape: ONE halo-exchange shuffle (Raster.withHalo) shared by all filters
 * within a session (persisted — the analog of the reference's JAI tile cache,
 * Benchmark.java:405-409); then pure array expressions per tile row. The sort needed
 * by the median runs only in the median's kernel, not in the shared stats pass.
 */
object Speckle {

  val Enl = 16.0 // chosen so the ci<cu branch is actually exercised by the fixtures
  private val cu = 1.0 / math.sqrt(Enl)
  private val cu2 = cu * cu
  private val cmax = math.sqrt(2) * cu
  private val ND = Raster.ND

  private val haloCache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val statsCache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** tiles -> assembled halo (persisted per session+scale). */
  def haloTiles(spark: SparkSession, sfDir: String): DataFrame =
    haloCache.getOrElseUpdate(s"${spark.hashCode}|$sfDir",
      Raster.withHalo(Raster.intensityTiles(spark, sfDir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** halo -> per-pixel derived stats (n, m=mean, vr=sample variance, cp, ci, alpha, dd)
   * shared by boxcar/Lee/Gamma-MAP (persisted per session+scale). */
  def statsTiles(spark: SparkSession, sfDir: String): DataFrame =
    statsCache.getOrElseUpdate(s"${spark.hashCode}|$sfDir",
      statsChain(haloTiles(spark, sfDir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Uncached full pipeline (for benchmarking a cold pass). */
  def leeUncached(spark: SparkSession, sfDir: String): DataFrame =
    Raster.rollup(leeOver(Raster.intensityTiles(spark, sfDir)))

  /** halo + stats over an arbitrary intensity-tile df. */
  def statsOver(tiles: DataFrame): DataFrame = statsChain(Raster.withHalo(tiles))

  /** halo + stats + Lee kernel over an arbitrary intensity-tile df (pre-rollup). */
  def leeOver(tiles: DataFrame): DataFrame =
    statsOver(tiles).withColumn("out", expr(s"transform(stats, s -> $leeKernel)"))

  private def statsChain(haloed: DataFrame): DataFrame =
    haloed
        .withColumn("st0", expr(Raster.windowStatsSql))
        .withColumn("st1", expr(
          """transform(st0, s -> struct(
            |  s.n AS n,
            |  s.s1 / s.n AS m,
            |  if(s.n > 1, (s.s2 - s.n * (s.s1 / s.n) * (s.s1 / s.n)) / (s.n - 1), 0D) AS vr,
            |  s.cp AS cp))""".stripMargin))
        .withColumn("st2", expr(
          s"""transform(st1, s -> struct(
             |  s.n AS n, s.m AS m, s.vr AS vr, s.cp AS cp,
             |  sqrt(s.vr) / s.m AS ci,
             |  (1D + ${cu2}D) / ((sqrt(s.vr) / s.m) * (sqrt(s.vr) / s.m) - ${cu2}D) AS alpha))""".stripMargin))
        .withColumn("stats", expr(
          s"""transform(st2, s -> struct(
             |  s.n AS n, s.m AS m, s.vr AS vr, s.cp AS cp, s.ci AS ci, s.alpha AS alpha,
             |  s.m * s.m * (s.alpha - ${Enl}D - 1D) * (s.alpha - ${Enl}D - 1D)
             |    + 4D * s.alpha * ${Enl}D * s.m * s.cp AS dd))""".stripMargin))
        .drop("st0", "st1", "st2", "halo")

  private def filtered(spark: SparkSession, sfDir: String, kernel: String): DataFrame =
    Raster.rollup(statsTiles(spark, sfDir)
      .withColumn("out", expr(s"transform(stats, s -> $kernel)")))

  val boxcarKernel: String = s"if(s.n <= 0, $ND, s.m)"

  val leeKernel: String =
    s"""if(s.n <= 0, $ND,
       |  if(s.m <= 0D or s.vr <= 0D, s.m,
       |    if(s.ci < ${cu}D, s.m,
       |      s.cp * (1D - ${cu2}D / (s.ci * s.ci)) + s.m * (${cu2}D / (s.ci * s.ci)))))""".stripMargin

  val gammaMapKernel: String =
    s"""if(s.n <= 0, $ND,
       |  if(s.m <= 0D or s.vr <= 0D, s.m,
       |    if(s.ci <= ${cu}D, s.m,
       |      if(s.ci < ${cmax}D,
       |        if(s.dd < 0D, s.cp,
       |          ((s.alpha - ${Enl}D - 1D) * s.m + sqrt(s.dd)) / (2D * s.alpha)),
       |        s.cp))))""".stripMargin

  def boxcar(spark: SparkSession, sfDir: String): DataFrame = filtered(spark, sfDir, boxcarKernel)
  def lee(spark: SparkSession, sfDir: String): DataFrame = filtered(spark, sfDir, leeKernel)
  def gammaMap(spark: SparkSession, sfDir: String): DataFrame = filtered(spark, sfDir, gammaMapKernel)

  /** Median pays for its sort + array allocation only here, straight off the halo. */
  def median(spark: SparkSession, sfDir: String): DataFrame =
    Raster.rollup(haloTiles(spark, sfDir)
      .withColumn("win", expr(Raster.windowSortedSql))
      .withColumn("out", expr(
        s"""transform(win, s ->
           |  if(size(s) <= 0, $ND,
           |    element_at(s, CAST(size(s) div 2 + 1 AS INT))))""".stripMargin))
      .drop("win", "halo"))
}
