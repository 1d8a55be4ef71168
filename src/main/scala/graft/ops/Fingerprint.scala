package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.Fixtures

/**
 * Fixture-fingerprint attribution gate (VERDICT r3 "what's wrong" #2): both
 * engines compute an order-independent checksum of the SAME fixture parquet, so
 * a driver-side hash mismatch on any data gate becomes attributable — if
 * q_fixture_fingerprint is green the inputs are bit-identical and the engine is
 * wrong; if it is red the fixture files differ (stale marker / partial write)
 * and every other red row is input noise.
 *
 * Checksum construction (engine-agnostic by design):
 *  - per row: md5 of a '|'-joined canonical string of integer/string key
 *    columns (doubles enter only as exact floor(x*4096) BIGINTs), folded to a
 *    60-bit integer (first 15 hex digits) — both Spark and DuckDB compute the
 *    identical value;
 *  - per table: row count + bit_xor over rows (commutative, overflow-free).
 */
object Fingerprint {

  /** 60-bit integer from the md5 hex of `s` — Spark side. */
  private def h60(s: String) =
    s"CAST(conv(substring(md5($s), 1, 15), 16, 10) AS BIGINT)"

  def query(spark: SparkSession, sfDir: String): DataFrame = {
    def ck(table: String, keyExpr: String): DataFrame =
      Fixtures.table(spark, sfDir, table)
        .select(expr(s"${h60(keyExpr)}").as("h"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("ck"))
        .select(lit(table).as("tbl"), col("n_rows"), col("ck"))

    val bursts = ck("bursts",
      "concat_ws('|', scene_id, subswath, burst_idx, " +
        "CAST(floor(burst_first_line_time * 4096) AS BIGINT), " +
        "CAST(floor(burst_last_line_time * 4096) AS BIGINT))")
    val scenes = ck("scenes",
      "concat_ws('|', scene_id, mission, acq_mode, num_subswaths, " +
        "CAST(floor(first_line_time * 4096) AS BIGINT), " +
        "CAST(floor(lon0 * 4096) AS BIGINT), CAST(floor(lat0 * 4096) AS BIGINT))")
    val orbit = ck("orbit",
      "concat_ws('|', scene_id, CAST(floor(t_sec * 4096) AS BIGINT), " +
        "CAST(floor(x * 4096) AS BIGINT), CAST(floor(y * 4096) AS BIGINT), " +
        "CAST(floor(z * 4096) AS BIGINT))")
    val gcps = ck("gcps",
      "concat_ws('|', gcp_id, scene_id, subswath, pol, burst_idx, cx, cy, true_dx, true_dy)")
    // tiles: the pixel CONTENT rides in via the dyadic-quantized i/q fold — the
    // table whose silent divergence the round-3 mismatches pointed at.
    val tiles = Fixtures.table(spark, sfDir, "tiles")
      .select(expr(
        s"""${h60("concat_ws('|', scene_id, subswath, pol, burst_idx, tile_y, tile_x)")}
           | ^ aggregate(zip_with(i, sequence(0, size(i) - 1), (x, j) ->
           |     CAST(floor(x * 4096) AS BIGINT) * 1000003L + j), 0L, (a, t) -> a ^ t)
           | ^ aggregate(zip_with(q, sequence(0, size(q) - 1), (x, j) ->
           |     CAST(floor(x * 4096) AS BIGINT) * 999983L + j), 0L, (a, t) -> a ^ t)""".stripMargin)
        .as("h"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("ck"))
      .select(lit("tiles").as("tbl"), col("n_rows"), col("ck"))

    bursts.unionByName(scenes).unionByName(orbit).unionByName(gcps).unionByName(tiles)
  }
}
