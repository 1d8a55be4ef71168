package graft.model

/**
 * Core data model of the engine (SURVEY.md §1.4).
 *
 * The authoritative input shape (BASELINE.json `input_hint`) is the interleaved
 * text+media document table:
 *   docs(doc_id STRING, spans ARRAY<STRUCT<kind,text,media_ref,offset>>)
 * Every media span references an SLC/GRD tile:
 *   media_ref = "s1://{scene_id}/{subswath}/{pol}/{burst_idx}/{tile_y}/{tile_x}"
 *
 * The dimension tables mirror the reference's SubSwathInfo / CalibrationVector /
 * OrbitStateVectors model (reference: sar-op-sentinel1/.../Sentinel1Utils.java:1355-1460,
 * sar-io-ephemeris/.../ApplyOrbitFileOp.java:60-101), re-expressed as small
 * broadcast-joinable DataFrames instead of in-memory singletons.
 */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)
final case class SceneDoc(doc_id: String, spans: Seq[Span])

/** One burst of one subswath — the tiling/geometry unit (Sentinel1Utils.java:1355-1415). */
final case class Burst(
    scene_id: String,
    subswath: String,
    burst_idx: Int, // 1-based, as in TOPSARSplitOp.java:75-79
    lines_per_burst: Int,
    samples_per_burst: Int,
    burst_first_line_time: Double, // seconds
    burst_last_line_time: Double, // = first + (lines-1)*azInterval (Sentinel1Utils.java:324-325)
    // 4-corner footprint parallelogram, ring order (BL, BR, TR, TL):
    lon1: Double, lat1: Double,
    lon2: Double, lat2: Double,
    lon3: Double, lat3: Double,
    lon4: Double, lat4: Double,
    footprint_wkt: String,
    doppler_rate: Double, // kt, Hz/s (Sentinel1Utils.java:557-601 precompute)
    doppler_centroid: Double, // fdc, Hz
    reference_time: Double) // tref, seconds (deramp reference)

final case class Scene(
    scene_id: String,
    mission: String,
    acq_mode: String,
    first_line_time: Double,
    azimuth_time_interval: Double,
    num_subswaths: Int,
    footprint_wkt: String,
    lon0: Double, lat0: Double)

/** Calibration LUT vector (Sentinel1Utils.java:1432-1460 / Sentinel1Calibrator.CalibrationInfo). */
final case class CalVector(
    scene_id: String, subswath: String, pol: String,
    line: Int, time_sec: Double,
    pixels: Seq[Int],
    sigma_nought: Seq[Double], beta_nought: Seq[Double],
    gamma: Seq[Double], dn: Seq[Double])

final case class NoiseVector(
    scene_id: String, subswath: String, pol: String,
    line: Int, time_sec: Double,
    pixels: Seq[Int], noise_lut: Seq[Double])

/** Orbit state vector (ApplyOrbitFileOp.java:60-101). */
final case class OrbitSV(
    scene_id: String, t_sec: Double,
    x: Double, y: Double, z: Double,
    vx: Double, vy: Double, vz: Double)

/** Complex raster tile: one row = one (w x h) tile, i/q row-major double buffers. */
final case class RasterTile(
    scene_id: String, subswath: String, pol: String,
    burst_idx: Int, tile_x: Int, tile_y: Int,
    w: Int, h: Int,
    i: Array[Double], q: Array[Double],
    no_data: Double)

final case class Aoi(
    aoi_id: String,
    lon_min: Double, lat_min: Double, lon_max: Double, lat_max: Double,
    wkt: String)

/** Planted ground-control point: true offset is generator ground truth, the engine must
 * recover it from pixel data alone (reference: CrossCorrelationOp.java:935-990). */
final case class Gcp(
    gcp_id: String, scene_id: String, subswath: String, pol: String,
    burst_idx: Int, cx: Int, cy: Int,
    true_dx: Int, true_dy: Int)

object Layout {
  /** Fixture raster layout constants (FIXTURES.md; small deterministic sample of the
   * 10^12-doc schema — the real layout is cell-bucketed / burst-partitioned parquet). */
  val TileW = 32
  val TileH = 32
  val TilesX = 4 // tiles per burst in range
  val TilesY = 2 // tiles per burst in azimuth
  val LinesPerBurst: Int = TileH * TilesY // 64
  val SamplesPerBurst: Int = TileW * TilesX // 128
  val BurstsPerSubswath = 9
  val Subswaths: Seq[String] = Seq("IW1", "IW2", "IW3")
  val Pols: Seq[String] = Seq("VV", "VH")
  val AzimuthTimeInterval = 0.002 // seconds per line
  val BurstOverlapLines = 8 // azimuth overlap between consecutive bursts
  val NoData: Double = -9999.0
}
