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
    "q_speckle_frost" -> ((s, dir) => ops.Speckle.frost(s, dir)),
    "q_speckle_leesigma" -> ((s, dir) => ops.Speckle.leeSigma(s, dir)),
    "q_speckle_refinedlee" -> ((s, dir) => ops.Speckle.refinedLee(s, dir)),
    "q_speckle_idan" -> ((s, dir) => ops.Speckle.idan(s, dir)),
    "q_speckle_lee_enl" -> ((s, dir) => ops.Speckle.leeEnlEstimated(s, dir)),
    "q_speckle_multitemporal" -> ((s, dir) => ops.Speckle.multiTemporal(s, dir)),
    "q_interferogram_flatearth" -> ((s, dir) => ops.InSAR.interferogramFlatEarthQuery(s, dir)),
    "q_coherence_bias" -> ((s, dir) => ops.InSAR.coherenceBiasCorrectedQuery(s, dir)),
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
    "q_ann_lsh_pairs" -> ((s, dir) => ann.Ann.lshCosinePairsQuery(s, dir)),
    "q_media_meta" -> ((s, dir) => media.Multimodal.mediaMetaQuery(s, dir)),
    "q_events_window" -> ((s, dir) => streaming.Events.batchQuery(s, dir)),
    "q_terrain_correction" -> ((s, dir) => ops.TerrainCorrection.query(s, dir)),
    "q_terrain_correction_nn" -> ((s, dir) => ops.TerrainCorrection.nearestNeighborQuery(s, dir)),
    "q_ellipsoid_rd" -> ((s, dir) => ops.TerrainCorrection.ellipsoidRdQuery(s, dir)),
    "q_ellipsoid_gg" -> ((s, dir) => ops.Geocode.ggGeocodeQuery(s, dir)),
    "q_etad" -> ((s, dir) => ops.Geocode.etadQuery(s, dir)),
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
    "q_create_stack" -> ((s, dir) => ops.Stack.createStackQuery(s, dir)),
    "q_stack_composite" -> ((s, dir) => ops.Stack.compositeQuery(s, dir)),
    "q_sbas_velocity" -> ((s, dir) => ops.Stack.sbasVelocityQuery(s, dir)),
    "q_reactiv" -> ((s, dir) => ops.Stack.reactivQuery(s, dir)),
    "q_slice_assembly" -> ((s, dir) => ops.Stack.sliceAssemblyQuery(s, dir)),
    "q_topsar_merge" -> ((s, dir) => ops.Stack.topsarMergeQuery(s, dir)),
    "q_esd_shift" -> ((s, dir) => ops.Stack.esdShiftQuery(s, dir)),
    "q_terrain_flattening" -> ((s, dir) => ops.TerrainCorrection.terrainFlatteningQuery(s, dir)),
    "q_xcorr_frac" -> ((s, dir) => ops.Coregistration.xcorrFracQuery(s, dir)),
    "q_warp_poly" -> ((s, dir) => ops.Coregistration.warpPolyQuery(s, dir)),
    "q_warp_poly2" -> ((s, dir) => ops.Coregistration.warpPoly2Query(s, dir)),
    "q_range_shift" -> ((s, dir) => ops.Coregistration.rangeShiftQuery(s, dir)),
    "q_stack_split" -> ((s, dir) => ops.Stack.stackSplitQuery(s, dir)),
    "q_remodulate" -> ((s, dir) => ops.InSAR.remodulateQuery(s, dir)),
    "q_integer_ifg" -> ((s, dir) => ops.InSAR.integerIfgQuery(s, dir)),
    "q_phase_filter" -> ((s, dir) => ops.InSAR.phaseFilterQuery(s, dir)),
    "q_speckle_mulog" -> ((s, dir) => ops.Speckle.mulog(s, dir)),
    "q_gabor" -> ((s, dir) => ops.Speckle.gabor(s, dir)),
    "q_srgr_poly" -> ((s, dir) => ops.Geocode.srgrPolyQuery(s, dir)),
    "q_sar_simulation" -> ((s, dir) => ops.TerrainCorrection.sarSimulationQuery(s, dir)),
    "q_oversample" -> ((s, dir) => ops.Spectral.oversampleQuery(s, dir)),
    "q_bandpass_range" -> ((s, dir) => ops.Spectral.bandpassRangeQuery(s, dir)),
    "q_bandpass_azimuth" -> ((s, dir) => ops.Spectral.bandpassAzimuthQuery(s, dir)),
    "q_goldstein" -> ((s, dir) => ops.Spectral.goldsteinQuery(s, dir)),
    "q_calibration_beta0" -> ((s, dir) => ops.Calibration.beta0Query(s, dir)),
    "q_calibration_gamma0" -> ((s, dir) => ops.Calibration.gamma0Query(s, dir)),
    "q_calibration_db" -> ((s, dir) => ops.Calibration.sigma0DbQuery(s, dir)),
    "q_calibration_complex" -> ((s, dir) => ops.Calibration.complexCalQuery(s, dir)),
    "q_orbit_interp" -> ((s, dir) => ops.TerrainCorrection.orbitInterpQuery(s, dir)),
    "q_zero_doppler" -> ((s, dir) => ops.TerrainCorrection.zeroDopplerQuery(s, dir)),
    "q_pol_c2" -> ((s, dir) => ops.Polarimetry.c2MatrixQuery(s, dir)),
    "q_pol_speckle" -> ((s, dir) => ops.Polarimetry.polSpeckleQuery(s, dir)),
    "q_cp_stokes" -> ((s, dir) => ops.Polarimetry.stokesQuery(s, dir)),
    "q_pol_t3" -> ((s, dir) => ops.PolarimetryQuad.t3Query(s, dir)),
    "q_phase_linking" -> ((s, dir) => ops.Stack.phaseLinkQuery(s, dir)),
    "q_rpca" -> ((s, dir) => ops.Stack.rpcaQuery(s, dir)),
    "q_border_noise" -> ((s, dir) => ops.Grd.borderNoiseQuery(s, dir)),
    "q_object_cluster" -> ((s, dir) => ops.Detection2.objectClusterQuery(s, dir)),
    "q_dedup_simhash_pairs" -> ((s, dir) => dedup.Dedup.simhashPairsQuery(s, dir)),
    "q_thermal_noise_az" -> ((s, dir) => ops.Grd.thermalNoiseAzQuery(s, dir)),
    "q_halpha_quad" -> ((s, dir) => ops.PolarimetryQuad.hAlphaQuery(s, dir)),
    "q_wishart" -> ((s, dir) => ops.PolarimetryQuad.wishartQuery(s, dir)),
    "q_wishart_supervised" -> ((s, dir) => ops.PolarimetryQuad.supervisedWishartQuery(s, dir)),
    "q_pol_orientation" -> ((s, dir) => ops.PolarimetryQuad.orientationQuery(s, dir)),
    "q_pol_faraday" -> ((s, dir) => ops.PolarimetryQuad.faradayQuery(s, dir)),
    "q_pol_freeman" -> ((s, dir) => ops.PolarimetryQuad.freemanQuery(s, dir)),
    "q_pol_params" -> ((s, dir) => ops.PolarimetryQuad.polParamsQuery(s, dir)),
    "q_pol_xchannel_snr" -> ((s, dir) => ops.PolarimetryQuad.xChannelSnrQuery(s, dir)),
    "q_cp_simulation" -> ((s, dir) => ops.PolarimetryQuad.cpSimulationQuery(s, dir)),
    "q_pol_change" -> ((s, dir) => ops.PolarimetryQuad.polChangeQuery(s, dir)),
    "q_cp_mdelta" -> ((s, dir) => ops.Polarimetry.mDeltaQuery(s, dir)),
    "q_dprvi" -> ((s, dir) => ops.Polarimetry.dprviQuery(s, dir)),
    "q_dualpol_anisotropy" -> ((s, dir) => ops.Polarimetry.anisotropyQuery(s, dir)),
    "q_pol_ratio" -> ((s, dir) => ops.Polarimetry.polRatioQuery(s, dir)),
    "q_oil_spill" -> ((s, dir) => ops.Detection2.oilSpillQuery(s, dir)),
    "q_speckle_divergence" -> ((s, dir) => ops.Detection2.speckleDivergenceQuery(s, dir)),
    "q_wind_field" -> ((s, dir) => ops.Detection2.windFieldQuery(s, dir)),
    "q_forest_area" -> ((s, dir) => ops.Detection2.forestAreaQuery(s, dir)),
    "q_pca" -> ((s, dir) => ops.Detection2.pcaQuery(s, dir)),
    "q_object_discrimination" -> ((s, dir) => ops.Detection2.objectDiscriminationQuery(s, dir)),
    "q_decision_tree" -> ((s, dir) => ops.Detection2.decisionTreeQuery(s, dir)),
    "q_topo_phase_removal" -> ((s, dir) => ops.InSAR.topoPhaseRemovalQuery(s, dir)),
    "q_phase_to_elevation" -> ((s, dir) => ops.InSAR.phaseToElevationQuery(s, dir)),
    "q_phase_to_displacement" -> ((s, dir) => ops.InSAR.phaseToDisplacementQuery(s, dir)),
    "q_demodulate" -> ((s, dir) => ops.InSAR.demodulateQuery(s, dir)),
    "q_dinsar" -> ((s, dir) => ops.InSAR.dinsarQuery(s, dir)),
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
    "q_speckle_frost" -> SarOracles4.frost,
    "q_speckle_leesigma" -> SarOracles4.leeSigma,
    "q_speckle_refinedlee" -> SarOracles4.refinedLee,
    "q_speckle_idan" -> SarOracles4.idan,
    "q_speckle_lee_enl" -> SarOracles4.leeEnlEstimated,
    "q_speckle_multitemporal" -> SarOracles4.multiTemporal,
    "q_interferogram_flatearth" -> SarOracles4.interferogramFlatEarth,
    "q_coherence_bias" -> SarOracles4.coherenceBias,
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
    "q_ann_lsh_pairs" -> PipelineOracles.annLshPairs,
    "q_media_meta" -> PipelineOracles.mediaMeta,
    "q_events_window" -> PipelineOracles.eventsWindow,
    "q_terrain_correction" -> SarOraclesTc.terrainCorrectionFull,
    "q_terrain_correction_nn" -> SarOracles2.terrainCorrection,
    "q_ellipsoid_rd" -> SarOraclesTc.ellipsoidRd,
    "q_ellipsoid_gg" -> SarOracles10.ggGeocode,
    "q_etad" -> SarOracles10.etad,
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
    "q_create_stack" -> SarOracles5.createStack,
    "q_stack_composite" -> SarOracles5.composite,
    "q_sbas_velocity" -> SarOracles5.sbasVelocity,
    "q_reactiv" -> SarOracles5.reactiv,
    "q_slice_assembly" -> SarOracles5.sliceAssembly,
    "q_topsar_merge" -> SarOracles5.topsarMerge,
    "q_esd_shift" -> SarOracles5.esdShift,
    "q_terrain_flattening" -> SarOracles5.terrainFlattening,
    "q_xcorr_frac" -> SarOracles5.xcorrFrac,
    "q_warp_poly" -> SarOracles5.warpPoly,
    "q_warp_poly2" -> SarOracles5.warpPoly2,
    "q_range_shift" -> SarOracles10.rangeShift,
    "q_stack_split" -> SarOracles10.stackSplit,
    "q_remodulate" -> SarOracles10.remodulate,
    "q_integer_ifg" -> SarOracles10.integerIfg,
    "q_phase_filter" -> SarOracles10.phaseFilter,
    "q_speckle_mulog" -> SarOracles10.mulog,
    "q_gabor" -> SarOracles10.gabor,
    "q_srgr_poly" -> SarOracles5.srgrPoly,
    "q_sar_simulation" -> SarOracles5.sarSimulation,
    "q_oversample" -> SarOracles6.oversample,
    "q_bandpass_range" -> SarOracles6.bandpassRange,
    "q_bandpass_azimuth" -> SarOracles6.bandpassAzimuth,
    "q_goldstein" -> SarOracles6.goldstein,
    "q_calibration_beta0" -> SarOracles7.beta0,
    "q_calibration_gamma0" -> SarOracles7.gamma0,
    "q_calibration_db" -> SarOracles7.sigma0Db,
    "q_calibration_complex" -> SarOracles7.complexCal,
    "q_orbit_interp" -> SarOracles7.orbitInterp,
    "q_zero_doppler" -> SarOracles7.zeroDoppler,
    "q_pol_c2" -> SarOracles7.c2Matrix,
    "q_pol_speckle" -> SarOracles7.polSpeckle,
    "q_cp_stokes" -> SarOracles7.stokes,
    "q_pol_t3" -> SarOraclesQuad.t3Sums,
    "q_phase_linking" -> SarOraclesPl.phaseLink,
    "q_rpca" -> SarOraclesPl.rpca,
    "q_border_noise" -> SarOraclesGrd.borderNoise,
    "q_object_cluster" -> SarOraclesGrd.objectCluster,
    "q_dedup_simhash_pairs" -> PipelineOracles.simhashPairs,
    "q_thermal_noise_az" -> SarOraclesGrd.thermalNoiseAz,
    "q_halpha_quad" -> SarOraclesQuad.hAlpha,
    "q_wishart" -> SarOraclesQuad.wishart,
    "q_wishart_supervised" -> SarOraclesQuad.supervisedWishart,
    "q_pol_orientation" -> SarOraclesQuad.orientation,
    "q_pol_faraday" -> SarOraclesQuad.faraday,
    "q_pol_freeman" -> SarOraclesQuad.freeman,
    "q_pol_params" -> SarOraclesQuad.polParams,
    "q_pol_xchannel_snr" -> SarOraclesQuad.xChannelSnr,
    "q_cp_simulation" -> SarOraclesQuad.cpSimulation,
    "q_pol_change" -> SarOraclesQuad.polChange,
    "q_cp_mdelta" -> SarOracles7.mDelta,
    "q_dprvi" -> SarOracles7.dprvi,
    "q_dualpol_anisotropy" -> SarOracles7.anisotropy,
    "q_pol_ratio" -> SarOracles7.polRatio,
    "q_oil_spill" -> SarOracles8.oilSpill,
    "q_speckle_divergence" -> SarOracles8.speckleDivergence,
    "q_wind_field" -> SarOracles8.windField,
    "q_forest_area" -> SarOracles8.forestArea,
    "q_pca" -> SarOracles8.pca,
    "q_object_discrimination" -> SarOracles8.objectDiscrimination,
    "q_decision_tree" -> SarOracles8.decisionTree,
    "q_topo_phase_removal" -> SarOracles8.topoPhaseRemoval,
    "q_phase_to_elevation" -> SarOracles8.phaseToElevation,
    "q_phase_to_displacement" -> SarOracles8.phaseToDisplacement,
    "q_demodulate" -> SarOracles8.demodulate,
    "q_dinsar" -> SarOracles8.dinsar,
  )
}
