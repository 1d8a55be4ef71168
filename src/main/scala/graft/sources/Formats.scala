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

  /** Scratch artifacts (catalog table names + temp dirs) from prior
   * invocations, reclaimed in two tiers. Catalog tables are dropped at the
   * NEXT invocation: a returned frame's plan is resolved at creation and the
   * tables are external, so dropping the catalog entry never breaks a pending
   * lazy consumer — this stops the per-run catalog accumulation. Temp DIRS
   * are swept only by a JVM shutdown hook: Verify runs gates 6-concurrent,
   * so an eager dir delete could race a concurrently-created, not-yet-
   * materialized lazy frame (its files must outlive its first action). */
  private val tablesToDrop =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val dirsToDelete =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val hookRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def deleteDir(path: String): Unit = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(path)
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(f => Files.deleteIfExists(f))
    }
  }

  private def reclaimPrevious(spark: SparkSession): Unit = {
    var t = tablesToDrop.poll()
    while (t != null) {
      try spark.sql(s"DROP TABLE IF EXISTS $t") catch { case _: Exception => () }
      t = tablesToDrop.poll()
    }
  }

  private def registerCleanup(tables: Seq[String], dir: String): Unit = {
    tables.foreach(tablesToDrop.add)
    dirsToDelete.add(dir)
    if (hookRegistered.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        // catalog dies with the JVM; only the on-disk scratch needs sweeping
        var p = dirsToDelete.poll()
        while (p != null) { try deleteDir(p) catch { case _: Exception => () }; p = dirsToDelete.poll() }
      }))
  }

  /** Order-independent row-set checksum: sum of h60(payload) % 2^40 (500k rows
   * stay far from BIGINT overflow; the oracle shares the exact expression). */
  private val RowHash =
    s"${Dedup.h60("concat_ws('|', CAST(doc_id AS STRING), lang, source, CAST(n_chars AS STRING), md5(text))")} % 1099511627776"

  private def summary(d: DataFrame, fmt: String): DataFrame =
    d.agg(count(lit(1)).as("n_rows"), sum(expr(RowHash)).as("checksum"))
      .select(lit(fmt).as("fmt"), col("n_rows"), col("checksum"))

  def roundTripQuery(spark: SparkSession, dir: String): DataFrame = {
    reclaimPrevious(spark)
    val d = Dedup.docs(spark, dir).select("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_roundtrip").toString
    registerCleanup(Seq.empty, tmp)
    d.write.mode("overwrite").json(s"$tmp/json")
    d.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    val j = spark.read.json(s"$tmp/json")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val c = spark.read.option("header", "true").schema(d.schema).csv(s"$tmp/csv")
      .select("doc_id", "text", "lang", "source", "n_chars")
    summary(d, "parquet").unionByName(summary(j, "json")).unionByName(summary(c, "csv"))
  }

  /**
   * Bucketed co-located join (q_bucketed_join) — the storage-level shuffle
   * eliminator the scale docs promise, demonstrated for real: the geolocated
   * span table and its per-cell density dimension are both written as
   * cell-bucketed (+ in-bucket sorted) tables, so the cell equi-join runs as
   * a sort-merge join with ZERO exchanges on either input (PlanSpec pins
   * SortMergeJoin + at most the one final rollup Exchange + the bucketed
   * scan). At 10^12 docs this is THE difference between re-shuffling the
   * span stream on every enrichment join and reading co-located buckets; the
   * density self-enrichment here (each span weighted by its cell's
   * occupancy) is the smallest real query with that shape.
   *
   * Tables land in a per-invocation scratch path + unique name (the
   * in-memory catalog is session-scoped while table files persist — a fixed
   * name would collide across Verify's recycled sessions).
   */
  def bucketedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    reclaimPrevious(spark)
    val spans = graft.ops.Spans.geolocatedMediaSpans(spark, dir)
      .select(col("doc_id"), col("offset"), col("scene_id"), col("cell"))
    val dens = spans.groupBy("cell").agg(count(lit(1)).as("n_in_cell"))
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val tA = s"graft_spans_$tag"
    val tB = s"graft_cells_$tag"
    registerCleanup(Seq(tA, tB), tmp)
    spans.write.format("parquet").option("path", s"$tmp/a")
      .bucketBy(8, "cell").sortBy("cell").saveAsTable(tA)
    dens.write.format("parquet").option("path", s"$tmp/b")
      .bucketBy(8, "cell").sortBy("cell").saveAsTable(tB)
    spark.table(tA).hint("merge").join(spark.table(tB).hint("merge"), Seq("cell"))
      .groupBy("scene_id")
      .agg(count(lit(1)).as("n_spans"), sum("n_in_cell").as("density_mass"))
  }
}
