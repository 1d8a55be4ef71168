package graft.lineage

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Resumable checkpoints with per-partition lineage + metrics (the north rule's
 * Iceberg-snapshot role, emulated as atomic parquet + manifest commits — no Iceberg
 * runtime ships in this environment, SURVEY.md §7.4). Mirrors the reference
 * benchmark's provenance record design (Benchmark.java:192-239: environment +
 * config + append-only history).
 *
 * Contract:
 *  - `stage(...)(compute)` either REPLAYS a completed snapshot (manifest present and
 *    config hash matches) or computes, writes parquet, writes per-partition metrics
 *    (partition_id, rows, order-independent checksum), and commits the manifest LAST
 *    (write-ahead data, atomic rename of the manifest) so a crashed run never leaves
 *    a half-committed stage that would be replayed.
 *  - checksum is XOR of per-row xxhash64 over the canonical JSON of the row: stable
 *    under partitioning and row order (the two-cluster-size identity requirement).
 */
object Checkpoint {

  final case class StageResult(df: DataFrame, resumed: Boolean, manifest: String)

  def rowChecksum(df: DataFrame): DataFrame =
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"),
      spark_partition_id().as("pid"))

  def stage(spark: SparkSession, runDir: String, name: String, configHash: String)
      (compute: => DataFrame): StageResult = {
    val dir = Paths.get(runDir, name)
    val manifestPath = dir.resolve("_MANIFEST.json")
    if (Files.exists(manifestPath)) {
      val m = Files.readString(manifestPath)
      if (m.contains(s""""config_hash": "$configHash"""")) {
        return StageResult(spark.read.parquet(dir.resolve("data").toString), resumed = true, m)
      }
    }
    Files.createDirectories(dir)
    val df = compute
    val dataPath = dir.resolve("data").toString
    df.write.mode("overwrite").parquet(dataPath)

    // per-partition lineage metrics over the *written* snapshot
    val written = spark.read.parquet(dataPath)
    val metrics = rowChecksum(written)
      .groupBy("pid")
      .agg(count(lit(1)).as("rows"), expr("bit_xor(h)").as("checksum"))
    metrics.write.mode("overwrite").parquet(dir.resolve("metrics").toString)
    val total = metrics.agg(sum("rows"), expr("bit_xor(checksum)")).head()
    val totalRows = Option(total.get(0)).map(_.toString).getOrElse("0")
    val checksum = Option(total.get(1)).map(_.toString).getOrElse("0")

    val manifest =
      s"""{
         |  "stage": "$name",
         |  "config_hash": "$configHash",
         |  "total_rows": $totalRows,
         |  "checksum": $checksum,
         |  "n_partitions": ${written.rdd.getNumPartitions},
         |  "spark_version": "${spark.version}",
         |  "default_parallelism": ${spark.sparkContext.defaultParallelism}
         |}""".stripMargin
    // commit point: manifest written atomically (tmp + move) AFTER data + metrics
    val tmp = dir.resolve("_MANIFEST.json.tmp")
    Files.writeString(tmp, manifest)
    Files.move(tmp, manifestPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    StageResult(written, resumed = false, manifest)
  }

  /** Order/partitioning-independent checksum of a DataFrame (for output-identity
   * evidence between cluster sizes). */
  def datasetChecksum(df: DataFrame): (Long, Long) = {
    val r = rowChecksum(df).agg(count(lit(1)), expr("bit_xor(h)")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
