package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Geo
import graft.gen.Fixtures
import graft.ops.{Spans, Split}

/** TOPSAR-Split semantics vs a JTS brute-force oracle (reference TOPSARSplitOp.java:261-306)
 * plus the two engine invariants: span-sequence preservation and partitioning invariance. */
class SplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.Sf

  test("burst selection matches JTS brute force with min..max contiguity") {
    val aoi = Fixtures.table(spark, sf, "aoi")
      .select("aoi_id", "wkt").as[(String, String)].collect()
    val bursts = Fixtures.table(spark, sf, "bursts")
      .select("scene_id", "subswath", "burst_idx", "footprint_wkt")
      .as[(String, String, Int, String)].collect()
    val expected = (for {
      (aid, awkt) <- aoi
      ((scene, sw), group) <- bursts.groupBy(b => (b._1, b._2))
      hit = group.filter(b => Geo.intersectsWkt(awkt, b._4)).map(_._3)
      if hit.nonEmpty
    } yield (aid, scene, sw, hit.min, hit.max, hit.length.toLong)).toSet

    val got = Split.topsarSplitQuery(spark, sf)
      .as[(String, String, String, Int, Int, Long)].collect().toSet
    assert(got == expected)
  }

  test("span-sequence invariant: exploded output reconstructs the exact input sequences") {
    val docs = Fixtures.table(spark, sf, "docs")
    val original = docs.select(col("doc_id"),
      expr("transform(spans, s -> concat(s.kind, '#', s.text, '#', s.media_ref, '#', s.offset))").as("seq"))
    val rebuilt = Spans.spanCellsQuery(spark, sf)
      .join(Spans.explodeSpans(docs).select(col("doc_id"), col("offset"), col("text")), Seq("doc_id", "offset"))
      .groupBy("doc_id")
      .agg(expr("transform(array_sort(collect_list(struct(offset, kind, text, media_ref))), " +
        "s -> concat(s.kind, '#', s.text, '#', s.media_ref, '#', s.offset))").as("seq"))
    val diff = original.join(rebuilt, Seq("doc_id"))
      .where(original("seq") =!= rebuilt("seq"))
    assert(diff.count() == 0)
    assert(rebuilt.count() == original.count())
  }

  test("partitioning invariance: identical result sets at different shuffle partitioning") {
    val a = Split.aoiDocTilesQuery(spark, sf)
    val b = Split.aoiDocTilesQuery(spark, sf).repartition(13)
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
    assert(a.count() > 0)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
