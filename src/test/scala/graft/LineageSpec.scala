package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lineage.Checkpoint

/** Resumable checkpoints: snapshot replay, config invalidation, per-partition
 * metrics, order-independent checksums (the two-cluster-size identity tool). */
class LineageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stage computes once, replays on rerun, recomputes on config change") {
    val dir = Files.createTempDirectory("ckpt").toString
    var computes = 0
    def job() = { computes += 1; spark.range(100).withColumn("x", col("id") * 2) }
    val r1 = Checkpoint.stage(spark, dir, "s1", "cfgA")(job())
    assert(!r1.resumed && computes == 1 && r1.df.count() == 100)
    val r2 = Checkpoint.stage(spark, dir, "s1", "cfgA")(job())
    assert(r2.resumed && computes == 1 && r2.df.count() == 100)
    val r3 = Checkpoint.stage(spark, dir, "s1", "cfgB")(job())
    assert(!r3.resumed && computes == 2)
    // manifest + per-partition metrics exist
    assert(Files.exists(Paths.get(dir, "s1", "_MANIFEST.json")))
    val metrics = spark.read.parquet(s"$dir/s1/metrics")
    assert(metrics.agg(sum("rows")).as[Long].head() == 100)
  }

  test("dataset checksum is invariant to partitioning and row order") {
    val df = spark.range(1000).withColumn("v", col("id") % 7)
    val (n1, c1) = Checkpoint.datasetChecksum(df.repartition(3))
    val (n2, c2) = Checkpoint.datasetChecksum(df.repartition(13).sort(desc("id")))
    assert(n1 == n2 && c1 == c2)
    val (_, c3) = Checkpoint.datasetChecksum(df.withColumn("v", col("id") % 8))
    assert(c3 != c1)
  }
}
