package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/**
 * Multi-format source parity: the engine's tables are parquet-first, but the
 * ingestion edge of a 100 TB pipeline reads JSON lines and CSV drops too.
 * Spark gives those readers for free; what needs a GATE is value fidelity —
 * a round trip through each text format must preserve every row bit-for-bit.
 *
 * q_source_roundtrip writes the documents table as JSON-lines and headered
 * CSV to a scratch dir, reads each back (CSV with the explicit schema — header
 * inference is not schema), and emits (format, n_rows, checksum) where the
 * checksum is an order-independent BIGINT sum of a 40-bit per-row hash over
 * every column (text enters via md5, so delimiter ambiguity cannot alias two
 * rows). The DuckDB oracle computes the parquet row once and asserts all three
 * formats equal it — the invariant IS format-independence.
 */
object Formats {

  /** Order-independent row-set checksum: sum of h60(payload) % 2^40 (500k rows
   * stay far from BIGINT overflow; the oracle shares the exact expression). */
  private val RowHash =
    s"${Dedup.h60("concat_ws('|', CAST(doc_id AS STRING), lang, source, CAST(n_chars AS STRING), md5(text))")} % 1099511627776"

  private def summary(d: DataFrame, fmt: String): DataFrame =
    d.agg(count(lit(1)).as("n_rows"), sum(expr(RowHash)).as("checksum"))
      .select(lit(fmt).as("fmt"), col("n_rows"), col("checksum"))

  def roundTripQuery(spark: SparkSession, dir: String): DataFrame = {
    val d = Dedup.docs(spark, dir).select("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_roundtrip").toString
    d.write.mode("overwrite").json(s"$tmp/json")
    d.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    val j = spark.read.json(s"$tmp/json")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val c = spark.read.option("header", "true").schema(d.schema).csv(s"$tmp/csv")
      .select("doc_id", "text", "lang", "source", "n_chars")
    summary(d, "parquet").unionByName(summary(j, "json")).unionByName(summary(c, "csv"))
  }
}
