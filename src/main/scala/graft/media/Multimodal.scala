package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.Fixtures

/**
 * Multimodal columns: media payloads are opaque BINARY columns with typed metadata.
 * The fixture `media` table carries a deterministic fake payload (an "IMG1;W=..;H=..;"
 * header + bytes) because no image/audio codecs ship in this environment — the DECODE
 * STEP IS A STUB (clearly marked below); the Spark-side plumbing (binary column IO,
 * schema, batch iteration shape, metadata extraction) is real and tested.
 */
object Multimodal {

  final case class MediaRow(media_ref: String, kind: String, content: Array[Byte])
  final case class MediaMeta(media_ref: String, kind: String, n_bytes: Int,
      width: Int, height: Int, content_md5: String)

  /** Expression-pipeline metadata extraction (oracle-checkable). */
  def mediaMetaQuery(spark: SparkSession, dir: String): DataFrame =
    Fixtures.table(spark, dir, "media")
      .withColumn("header", col("content").cast("string"))
      .select(
        col("media_ref"), col("kind"),
        length(col("content")).as("n_bytes"),
        regexp_extract(col("header"), "W=([0-9]+)", 1).cast("int").as("width"),
        regexp_extract(col("header"), "H=([0-9]+)", 1).cast("int").as("height"),
        md5(col("header")).as("content_md5")) // md5 over the utf-8 text form (DuckDB md5 is VARCHAR-only)

  /**
   * Batch decode via typed mapPartitions — the shape a real codec would use (one
   * library init per partition, batched row iteration). `decodeStub` stands in for
   * the codec: ??? in production; here a deterministic header parse so the plumbing
   * is testable.
   */
  def decodeBatch(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real pipeline: val codec = HeavyCodec.init()  // once per partition
      rows.map(r => decodeStub(r))
    }
  }

  /** STUB: stands in for image/audio decode (no codecs in this environment). */
  def decodeStub(r: MediaRow): MediaMeta = {
    val header = new String(r.content, "UTF-8")
    def num(k: String): Int = s"$k=([0-9]+)".r.findFirstMatchIn(header).map(_.group(1).toInt).getOrElse(-1)
    val md = java.security.MessageDigest.getInstance("MD5").digest(r.content)
    MediaMeta(r.media_ref, r.kind, r.content.length, num("W"), num("H"),
      md.map("%02x".format(_)).mkString)
  }
}
