package graft

import org.apache.spark.sql.SparkSession
import graft.lineage.Checkpoint

/**
 * spark-submit entry point for the full processing chain with resumable checkpoints
 * (north rule): each stage commits a parquet snapshot + per-partition lineage metrics
 * + manifest; a rerun replays completed stages and continues from the first missing
 * one. Usage: PipelineRunner <sfDir> <runDir> [cpus]
 */
object PipelineRunner {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val runDir = if (args.length > 1) args(1) else "/tmp/graft_run"
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = s"sf=${gen.Fixtures.scale(sfDir).tag}|v1"
    val stages: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "split" -> (() => ops.Split.topsarSplitQuery(spark, sfDir)),
      "span_cells" -> (() => ops.Spans.spanCellsQuery(spark, sfDir)),
      "calibration" -> (() => ops.Calibration.sigma0Query(spark, sfDir)),
      "speckle_lee" -> (() => ops.Speckle.lee(spark, sfDir)),
      "terrain_correction" -> (() => ops.TerrainCorrection.query(spark, sfDir)),
      "mosaic" -> (() => ops.Geocode.mosaicQuery(spark, sfDir)),
      // corpus-curation leg: dedup keepers -> quality/repetition -> packing manifest
      "dedup_clusters" -> (() => dedup.Dedup.dedupClustersQuery(spark, sfDir)),
      "corpus_filter" -> (() => text.TextAnalysis.corpusFilterQuery(spark, sfDir)),
      "seq_packing" -> (() => text.Curation.seqPackingQuery(spark, sfDir)))

    stages.foreach { case (name, f) =>
      val t0 = System.nanoTime()
      val r = Checkpoint.stage(spark, runDir, name, cfg)(f())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[pipeline] $name%-20s ${if (r.resumed) "RESUMED" else "COMPUTED"}%-9s $sec%8.2fs  rows=${r.df.count()}")
    }
    spark.stop()
  }
}
