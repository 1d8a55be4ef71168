package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cells.CellIndex
import graft.gen.Fixtures
import graft.model.Layout

/**
 * Interleaved-document span pipeline: posexplode the spans array, parse media_refs,
 * geolocate each media span inside its burst footprint, and encode to a cell id —
 * a batched, UDF-free Catalyst expression pipeline (north rule).
 *
 * media_ref grammar: s1://{scene_id}/{subswath}/{pol}/{burst_idx}/{tile_y}/{tile_x}
 *
 * The per-row invariant (BASELINE.json input_hint) — span sequence (kind, text,
 * media_ref, order) — is carried through unchanged: `offset` is emitted with every
 * exploded row and every aggregate keeps (doc_id, offset) lineage.
 */
object Spans {

  /** Explode docs to one row per span, keeping document order. */
  def explodeSpans(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"),
        col("span.kind").as("kind"), col("span.text").as("text"),
        col("span.media_ref").as("media_ref"), col("span.offset").as("offset"))

  /** Parse media_ref into its tiling key; non-media rows pass through with nulls. */
  def parseMediaRef(spans: DataFrame): DataFrame = {
    val p = split(col("media_ref"), "/")
    spans
      .withColumn("scene_id", when(col("kind") === "media", element_at(p, 3)))
      .withColumn("subswath", when(col("kind") === "media", element_at(p, 4)))
      .withColumn("pol", when(col("kind") === "media", element_at(p, 5)))
      .withColumn("burst_idx", when(col("kind") === "media", element_at(p, 6).cast("int")))
      .withColumn("tile_y", when(col("kind") === "media", element_at(p, 7).cast("int")))
      .withColumn("tile_x", when(col("kind") === "media", element_at(p, 8).cast("int")))
  }

  /**
   * Geolocate media spans: tile center mapped through the burst footprint parallelogram
   * (affine in (u, v) like the reference's geolocation-grid interpolation,
   * TOPSARSplitOp.java:282-294), then cell-encode. Burst table is broadcast — it is a
   * few-thousand-row dimension table even at 10^12 docs.
   */
  def geolocatedMediaSpans(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Fixtures.table(spark, sfDir, "docs")
    val bursts = Fixtures.table(spark, sfDir, "bursts")
      .select("scene_id", "subswath", "burst_idx",
        "lon1", "lat1", "lon2", "lat2", "lon3", "lat3", "lon4", "lat4")
    val media = parseMediaRef(explodeSpans(docs)).where(col("kind") === "media")
    val u = (col("tile_x") + 0.5) / Layout.TilesX
    val v = (col("tile_y") + 0.5) / Layout.TilesY
    media.join(broadcast(bursts), Seq("scene_id", "subswath", "burst_idx"))
      .withColumn("lon", col("lon1") + u * (col("lon2") - col("lon1")) + v * (col("lon4") - col("lon1")))
      .withColumn("lat", col("lat1") + v * (col("lat4") - col("lat1")))
      // native codegen'd expression (graft.exprs.CellId); property-tested equal to
      // the Column-composed CellIndex.cellCol
      .withColumn("cell", graft.exprs.CellId.cellId(col("lon"), col("lat")))
  }

  /** Query: per-span parse + cell encode, preserving span sequence (the invariant). */
  def spanCellsQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val geo = geolocatedMediaSpans(spark, sfDir)
      .select(col("doc_id"), col("offset"), col("kind"), col("media_ref"),
        col("cell"), round(col("lon"), 6).as("lon_r"), round(col("lat"), 6).as("lat_r"))
    val text = parseMediaRef(explodeSpans(Fixtures.table(spark, sfDir, "docs")))
      .where(col("kind") === "text")
      .select(col("doc_id"), col("offset"), col("kind"), col("media_ref"),
        lit(null).cast("long").as("cell"),
        lit(null).cast("double").as("lon_r"), lit(null).cast("double").as("lat_r"))
    geo.unionByName(text)
  }
}
