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

  test("stageKeyed resumes at partition granularity (committed keys never recompute)") {
    val dir = Files.createTempDirectory("ckptk").toString
    def job() = Seq(("A", 1), ("A", 2), ("B", 10), ("B", 20)).toDF("k", "v")
    val r1 = Checkpoint.stageKeyed(spark, dir, "s", "k", "cfg")(job())
    assert(!r1.resumed && r1.df.count() == 4)
    // full rerun: everything committed -> resumed, nothing rewritten
    val aFiles = Paths.get(dir, "s", "data", "k=A").toFile.list().toSet
    val r2 = Checkpoint.stageKeyed(spark, dir, "s", "k", "cfg")(job())
    assert(r2.resumed && r2.df.count() == 4)
    assert(Paths.get(dir, "s", "data", "k=A").toFile.list().toSet == aFiles,
      "resume rewrote a committed partition")
    // simulate a crash AFTER writing B's data but BEFORE committing it: key B
    // absent from _KEYS.json -> only B recomputes (idempotent dynamic overwrite);
    // A's files stay byte-identical
    val keysPath = Paths.get(dir, "s", "_KEYS.json")
    Files.writeString(keysPath,
      Files.readString(keysPath).replace(""", "k:B"""", ""))
    val r3 = Checkpoint.stageKeyed(spark, dir, "s", "k", "cfg")(job())
    assert(!r3.resumed && r3.df.count() == 4)
    assert(Paths.get(dir, "s", "data", "k=A").toFile.list().toSet == aFiles,
      "partial resume rewrote the committed partition")
    assert(Files.readString(keysPath).contains("k:B"), "recomputed key not re-committed")
    // config change wipes the stage (stale partitions cannot survive)
    val r4 = Checkpoint.stageKeyed(spark, dir, "s", "k", "cfg2")(job().where(col("k") === "A"))
    assert(!r4.resumed && r4.df.count() == 2)
    assert(!Files.exists(Paths.get(dir, "s", "data", "k=B")), "stale partition survived a config change")
  }

  test("semantic manifest: keyed rows+checksum reconcile with the dataset totals") {
    val df = graft.ops.Spans.geolocatedMediaSpans(spark, TestSpark.Sf)
    val m = Checkpoint.semanticManifest(df, "scene_id", Seq("doc_id", "offset", "media_ref"))
    val rows = m.agg(sum("n_rows")).as[Long].head()
    assert(rows == df.count())
    // checksum is order/partitioning-independent
    val m2 = Checkpoint.semanticManifest(df.repartition(13).sortWithinPartitions(desc("offset")),
      "scene_id", Seq("doc_id", "offset", "media_ref"))
    assert(m.collect().map(_.toString).sorted.sameElements(m2.collect().map(_.toString).sorted))
  }

  test("manifest-pruned read physically skips pruned partitions and loses no matching row") {
    val dir = Files.createTempDirectory("prune").toString
    val df = Seq(("A", 5L), ("A", 15L), ("B", 100L), ("B", 120L), ("C", 7L), ("C", 9L))
      .toDF("k", "v")
    Checkpoint.stageKeyed(spark, dir, "s", "k", "cfg")(df)
    val manifest = Checkpoint.writeStatsManifest(spark, s"$dir/s", "k", "v")
    assert(manifest.split("\n").length == 3)
    // predicate [10, 50]: A (5..15) overlaps; B (100..120) and C (7..9) prune
    val pruned = Checkpoint.prunedRead(spark, s"$dir/s", "k", 10L, 50L)
    val touched = pruned.inputFiles.toSeq
    assert(touched.nonEmpty && touched.forall(_.contains("k=A")),
      s"pruned read touched non-kept partitions: $touched")
    // equality with the full-scan filter
    val full = spark.read.parquet(s"$dir/s/data")
    assert(pruned.where(col("v").between(10, 50)).select("v").as[Long].collect().sorted
      .sameElements(full.where(col("v").between(10, 50)).select("v").as[Long].collect().sorted))
    // the gate query itself: scanned partitions' n_match equals a direct filter,
    // pruned partitions report 0 and truly contain 0 matches
    val gate = Checkpoint.manifestPruneQuery(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(gate.nonEmpty)
    assert(gate.exists(_._5 == 0L), "no partition pruned — predicate too wide to test pruning")
    assert(gate.exists(_._5 == 1L), "every partition pruned — predicate too narrow")
    val direct = graft.ops.Spans.geolocatedMediaSpans(spark, TestSpark.Sf)
      .withColumn("lon_q", floor(col("lon") * 1e6).cast("long"))
      .groupBy("scene_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("lon_q").between(Checkpoint.PruneLo, Checkpoint.PruneHi), 1L).otherwise(0L)).as("m"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((k, n, _, _, _, m) <- gate) {
      assert(direct(k)._1 == n, s"$k n_rows")
      assert(direct(k)._2 == m, s"$k n_match (pruning lost rows)")
    }
  }

  test("dataset checksum is invariant to partitioning and row order") {
    val df = spark.range(1000).withColumn("v", col("id") % 7)
    val (n1, c1) = Checkpoint.datasetChecksum(df.repartition(3))
    val (n2, c2) = Checkpoint.datasetChecksum(df.repartition(13).sort(desc("id")))
    assert(n1 == n2 && c1 == c2)
    val (_, c3) = Checkpoint.datasetChecksum(df.withColumn("v", col("id") % 8))
    assert(c3 != c1)
  }

  test("snapshot diff: manifest diff matches a direct recomputation; all outcomes exercised") {
    def h60s(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    val spans = graft.ops.Spans.geolocatedMediaSpans(spark, TestSpark.Sf)
      .select("doc_id", "offset", "media_ref", "scene_id", "subswath")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getString(4)))
    val mod = 1099511627776L
    def manifest(rows: Seq[(String, Int, String, String, String)]) =
      rows.groupBy(r => s"${r._4}/${r._5}").map { case (k, g) =>
        k -> ((g.size.toLong, g.map(r => h60s(s"${r._1}|${r._2}|${r._3}") % mod).sum))
      }
    val b = manifest(spans.toSeq)
    val a = manifest(spans.toSeq.filter(r =>
      r._5 == "IW2" || (r._5 == "IW1" && h60s(r._1) % 5 != 0)))
    val exp = (a.keySet ++ b.keySet).map { k =>
      val (na, ca) = a.getOrElse(k, (0L, 0L))
      val (nb, cb) = b.getOrElse(k, (0L, 0L))
      val status =
        if (!a.contains(k)) "added" else if (!b.contains(k)) "removed"
        else if (na == nb && ca == cb) "unchanged" else "changed"
      (k, status, na, ca, nb, cb)
    }
    val got = Checkpoint.snapshotDiffQuery(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == exp)
    // the fixture exercises added (IW3), changed (IW1), unchanged (IW2)
    assert(got.map(_._2).intersect(Set("added", "changed", "unchanged")).size == 3)
    // incremental-consumption invariant: the new-batch row mass equals the
    // per-partition deltas of the non-removed partitions
    val newRows = spans.count(r => !(r._5 == "IW2" || (r._5 == "IW1" && h60s(r._1) % 5 != 0)))
    assert(got.toSeq.map(x => x._5 - x._3).sum == newRows)
  }

  test("cdc merge: routing counts and merged checksum match a direct upsert") {
    def h60s(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    import spark.implicits._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
      .filter(_._3 != null)
    val mod = 1099511627776L
    // direct upsert: apply the batch over the base map
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long, Long, Long)]
      .withDefaultValue((0L, 0L, 0L, 0L))
    raw.foreach { case (id, src, text) =>
      val bkt = h60s(s"cdc:$id") % 10
      val (action, finalText) = bkt match {
        case 0 => ("inserted", text)
        case 1 => ("updated", text + " v2")
        case _ => ("unchanged", text)
      }
      val (u, up, i, cs) = acc(src)
      val h = h60s(s"$id|${md5hex(finalText)}") % mod
      acc(src) = (u + (if (action == "unchanged") 1 else 0),
        up + (if (action == "updated") 1 else 0),
        i + (if (action == "inserted") 1 else 0), cs + h)
    }
    val got = Checkpoint.cdcMergeQuery(spark, TestSpark.Sf)
      .select("source", "n_unchanged", "n_updated", "n_inserted", "snapshot_checksum")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == acc.toMap)
    // all three routes genuinely occur
    assert(got.values.map(_._1).sum > 0 && got.values.map(_._2).sum > 0 &&
      got.values.map(_._3).sum > 0)
  }
}
