package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Each entry in `queries` is one operator of the engine (SURVEY.md §2 inventory);
 * `oracleSql` holds an independent DuckDB derivation over the same parquet inputs.
 * Fixture-based queries read /root/repo/fixtures/<tag>/ (generated deterministically
 * on first use by graft.gen.Fixtures); the driver's verify scale is sf0.01, and the
 * oracle SQL hardcodes that fixture path.
 */
object SparkEntry {

  /** sf0.01 fixture dir as seen by the DuckDB oracle. */
  private val FIX = "/root/repo/fixtures/sf0.01"
  private def fx(t: String) = s"read_parquet('$FIX/$t.parquet/*.parquet')"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Split.aoiDocTilesQuery(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => Tpch.q1(s, dir)),
    "q_join_pipeline" -> ((s, dir) => Tpch.joinPipeline(s, dir)),
    "q_topsar_split" -> ((s, dir) => ops.Split.topsarSplitQuery(s, dir)),
    "q_span_cells" -> ((s, dir) => ops.Spans.spanCellsQuery(s, dir)),
    "q_aoi_doc_tiles" -> ((s, dir) => ops.Split.aoiDocTilesQuery(s, dir)),
    "q_calibration_sigma0" -> ((s, dir) => ops.Calibration.sigma0Query(s, dir)),
    "q_thermal_noise" -> ((s, dir) => ops.Calibration.thermalNoiseQuery(s, dir)),
    "q_multilook" -> ((s, dir) => ops.Multilook.query(s, dir)),
    "q_speckle_boxcar" -> ((s, dir) => ops.Speckle.boxcar(s, dir)),
    "q_speckle_median" -> ((s, dir) => ops.Speckle.median(s, dir)),
    "q_speckle_lee" -> ((s, dir) => ops.Speckle.lee(s, dir)),
    "q_speckle_gammamap" -> ((s, dir) => ops.Speckle.gammaMap(s, dir)),
    "q_deburst" -> ((s, dir) => ops.Deburst.query(s, dir)),
    "q_dedup_exact" -> ((s, dir) => dedup.Dedup.exactQuery(s, dir)),
    "q_dedup_minhash_sig" -> ((s, dir) => dedup.Dedup.minhashSignaturesQuery(s, dir)),
    "q_dedup_minhash_pairs" -> ((s, dir) => dedup.Dedup.minhashPairsQuery(s, dir)),
    "q_dedup_simhash" -> ((s, dir) => dedup.Dedup.simhashQuery(s, dir)),
    "q_dedup_ngram_pairs" -> ((s, dir) => dedup.Dedup.ngramJaccardQuery(s, dir)),
    "q_text_quality" -> ((s, dir) => text.TextAnalysis.qualityQuery(s, dir)),
    "q_token_count" -> ((s, dir) => text.TextAnalysis.tokenCountQuery(s, dir)),
    "q_lang_id" -> ((s, dir) => text.TextAnalysis.langIdQuery(s, dir)),
    "q_doc_fingerprint" -> ((s, dir) => text.TextAnalysis.fingerprintQuery(s, dir)),
    "q_ann_topk" -> ((s, dir) => ann.Ann.topKQuery(s, dir)),
    "q_cosine_pairs" -> ((s, dir) => ann.Ann.cosinePairsQuery(s, dir)),
    "q_ann_lsh" -> ((s, dir) => ann.Ann.lshTopKQuery(s, dir)),
    "q_media_meta" -> ((s, dir) => media.Multimodal.mediaMetaQuery(s, dir)),
    "q_events_window" -> ((s, dir) => streaming.Events.batchQuery(s, dir)),
    "q_terrain_correction" -> ((s, dir) => ops.TerrainCorrection.query(s, dir)),
    "q_xcorr_offsets" -> ((s, dir) => ops.Coregistration.xcorrOffsetsQuery(s, dir)),
    "q_warp_fit" -> ((s, dir) => ops.Coregistration.warpFitQuery(s, dir)),
    "q_coreg_stack" -> ((s, dir) => ops.Coregistration.coregStackQuery(s, dir)),
    "q_interferogram" -> ((s, dir) => ops.InSAR.interferogramQuery(s, dir)),
    "q_coherence" -> ((s, dir) => ops.InSAR.coherenceQuery(s, dir)),
    "q_deramp" -> ((s, dir) => ops.InSAR.derampQuery(s, dir)),
    "q_change_detection" -> ((s, dir) => ops.Detection.changeDetectionQuery(s, dir)),
    "q_stack_average" -> ((s, dir) => ops.Detection.stackAverageQuery(s, dir)),
    "q_cfar" -> ((s, dir) => ops.Detection.cfarQuery(s, dir)),
    "q_mosaic" -> ((s, dir) => ops.Geocode.mosaicQuery(s, dir)),
    "q_srgr" -> ((s, dir) => ops.Geocode.srgrQuery(s, dir)),
    "q_baseline" -> ((s, dir) => ops.Geocode.baselineQuery(s, dir)),
    "q_rvi" -> ((s, dir) => ops.Geocode.rviQuery(s, dir)),
    "q_dualpol_entropy" -> ((s, dir) => ops.Geocode.dualPolEntropyQuery(s, dir)),
    "q_data_analysis" -> ((s, dir) => ops.Utility.dataAnalysisQuery(s, dir)),
    "q_undersample" -> ((s, dir) => ops.Utility.undersampleQuery(s, dir)),
    "q_flood_detection" -> ((s, dir) => ops.Utility.floodDetectionQuery(s, dir)),
    "q_offset_tracking" -> ((s, dir) => ops.Utility.offsetTrackingQuery(s, dir)),
    "q_gcp_grid" -> ((s, dir) => ops.Utility.gcpGridQuery(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_join_pipeline" ->
      """SELECT r.r_name AS region, n.n_name AS nation,
        |       count(DISTINCT o.o_orderkey) AS n_orders,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Exact rect x sheared-parallelogram intersection, derived independently of the
    // engine's SAT: y-overlap interval + the (linear-in-y) x-interval overlap test.
    "q_topsar_split" ->
      s"""SELECT a.aoi_id, b.scene_id, b.subswath,
         |       min(b.burst_idx) AS first_burst, max(b.burst_idx) AS last_burst,
         |       count(*) AS n_hit
         |FROM ${fx("aoi")} a, ${fx("bursts")} b
         |WHERE greatest(a.lat_min, b.lat1) <= least(a.lat_max, b.lat4)
         |  AND b.lon2 + (b.lon4 - b.lon1) / (b.lat4 - b.lat1) * (least(a.lat_max, b.lat4) - b.lat1) >= a.lon_min
         |  AND b.lon1 + (b.lon4 - b.lon1) / (b.lat4 - b.lat1) * (greatest(a.lat_min, b.lat1) - b.lat1) <= a.lon_max
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_span_cells" ->
      s"""WITH sp AS (SELECT doc_id, unnest(spans) AS s FROM ${fx("docs")}),
         |e AS (SELECT doc_id, s."offset" AS "offset", s.kind AS kind, s.media_ref AS media_ref,
         |             string_split(s.media_ref, '/') AS p FROM sp),
         |m AS (SELECT e.doc_id, e."offset", e.kind, e.media_ref,
         |             b.lon1 + ((CAST(p[8] AS INT) + 0.5) / 4) * (b.lon2 - b.lon1)
         |                    + ((CAST(p[7] AS INT) + 0.5) / 2) * (b.lon4 - b.lon1) AS lon,
         |             b.lat1 + ((CAST(p[7] AS INT) + 0.5) / 2) * (b.lat4 - b.lat1) AS lat
         |      FROM e JOIN ${fx("bursts")} b
         |        ON b.scene_id = p[3] AND b.subswath = p[4] AND b.burst_idx = CAST(p[6] AS INT)
         |      WHERE e.kind = 'media')
         |SELECT doc_id, "offset", kind, media_ref,
         |       3170534137668829184 + CAST(least(2047, greatest(0, floor((lat + 90.0) / 180.0 * 2048.0))) AS BIGINT) * 536870912
         |                           + CAST(least(2047, greatest(0, floor((lon + 180.0) / 360.0 * 2048.0))) AS BIGINT) AS cell,
         |       round(lon, 6) AS lon_r, round(lat, 6) AS lat_r
         |FROM m
         |UNION ALL
         |SELECT doc_id, s."offset", s.kind, s.media_ref,
         |       NULL::BIGINT, NULL::DOUBLE, NULL::DOUBLE
         |FROM sp WHERE s.kind = 'text'
         |ORDER BY doc_id, "offset"""".stripMargin,
    "q_aoi_doc_tiles" ->
      s"""WITH sel AS (
         |  SELECT a.aoi_id, b.scene_id, b.subswath,
         |         min(b.burst_idx) AS first_burst, max(b.burst_idx) AS last_burst
         |  FROM ${fx("aoi")} a, ${fx("bursts")} b
         |  WHERE greatest(a.lat_min, b.lat1) <= least(a.lat_max, b.lat4)
         |    AND b.lon2 + (b.lon4 - b.lon1) / (b.lat4 - b.lat1) * (least(a.lat_max, b.lat4) - b.lat1) >= a.lon_min
         |    AND b.lon1 + (b.lon4 - b.lon1) / (b.lat4 - b.lat1) * (greatest(a.lat_min, b.lat1) - b.lat1) <= a.lon_max
         |  GROUP BY 1, 2, 3),
         |sp AS (SELECT doc_id, unnest(spans) AS s FROM ${fx("docs")}),
         |m AS (SELECT doc_id, string_split(s.media_ref, '/') AS p FROM sp WHERE s.kind = 'media')
         |SELECT sel.aoi_id, sel.scene_id, sel.subswath,
         |       count(DISTINCT m.doc_id) AS n_docs,
         |       count(*) AS n_spans,
         |       count(DISTINCT p[6] || '_' || p[7] || '_' || p[8]) AS n_tiles
         |FROM m JOIN sel
         |  ON p[3] = sel.scene_id AND p[4] = sel.subswath
         | AND CAST(p[6] AS INT) BETWEEN sel.first_burst AND sel.last_burst
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_calibration_sigma0" -> SarOracles.calibrationSigma0,
    "q_thermal_noise" -> SarOracles.thermalNoise,
    "q_multilook" -> SarOracles.multilook,
    "q_speckle_boxcar" -> SarOracles.speckleBoxcar,
    "q_speckle_median" -> SarOracles.speckleMedian,
    "q_speckle_lee" -> SarOracles.speckleLee,
    "q_speckle_gammamap" -> SarOracles.speckleGammaMap,
    "q_deburst" -> SarOracles.deburst,
    "q_dedup_exact" -> PipelineOracles.dedupExact,
    "q_dedup_minhash_sig" -> PipelineOracles.minhashSignatures,
    "q_dedup_minhash_pairs" -> PipelineOracles.minhashPairs,
    "q_dedup_simhash" -> PipelineOracles.simhash,
    "q_dedup_ngram_pairs" -> PipelineOracles.ngramPairs,
    "q_text_quality" -> PipelineOracles.textQuality,
    "q_token_count" -> PipelineOracles.tokenCount,
    "q_lang_id" -> PipelineOracles.langId,
    "q_doc_fingerprint" -> PipelineOracles.fingerprint,
    "q_ann_topk" -> PipelineOracles.annTopK,
    "q_cosine_pairs" -> PipelineOracles.cosinePairs,
    "q_ann_lsh" -> PipelineOracles.annLsh,
    "q_media_meta" -> PipelineOracles.mediaMeta,
    "q_events_window" -> PipelineOracles.eventsWindow,
    "q_terrain_correction" -> SarOracles2.terrainCorrection,
    "q_xcorr_offsets" -> SarOracles2.xcorrOffsets,
    "q_warp_fit" -> SarOracles2.warpFit,
    "q_coreg_stack" -> SarOracles2.coregStack,
    "q_interferogram" -> SarOracles2.interferogram,
    "q_coherence" -> SarOracles2.coherence,
    "q_deramp" -> SarOracles2.deramp,
    "q_change_detection" -> SarOracles2.changeDetection,
    "q_stack_average" -> SarOracles2.stackAverage,
    "q_cfar" -> SarOracles2.cfar,
    "q_mosaic" -> SarOracles2.mosaic,
    "q_srgr" -> SarOracles2.srgr,
    "q_baseline" -> SarOracles2.baseline,
    "q_rvi" -> SarOracles2.rvi,
    "q_dualpol_entropy" -> SarOracles2.dualPolEntropy,
    "q_data_analysis" -> SarOracles3.dataAnalysis,
    "q_undersample" -> SarOracles3.undersample,
    "q_flood_detection" -> SarOracles3.floodDetection,
    "q_offset_tracking" -> SarOracles3.offsetTracking,
    "q_gcp_grid" -> SarOracles3.gcpGrid,
  )
}
