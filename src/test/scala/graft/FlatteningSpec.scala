package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.TerrainCorrection

/**
 * Terrain-Flattening fidelity pins (reference TerrainFlatteningOp.java:1301-1377,
 * 896-958): the projection-perpendicular-to-slant + Heron two-triangle area is
 * checked against an INDEPENDENT vector restatement (projection via Gram-Schmidt
 * rejection, triangle areas via cross products — no Heron), and the end-to-end
 * query's structural invariants (projection cannot grow area; the threshold guard
 * bounds the flattened-pixel count) run on the sf0.001 fixtures.
 */
class FlatteningSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cross(a: Array[Double], b: Array[Double]) = Array(
    a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2), a(0) * b(1) - a(1) * b(0))
  private def sub(a: Array[Double], b: Array[Double]) = Array(a(0) - b(0), a(1) - b(1), a(2) - b(2))
  private def norm(a: Array[Double]) = math.sqrt(a(0) * a(0) + a(1) * a(1) + a(2) * a(2))
  private def dot(a: Array[Double], b: Array[Double]) = a(0) * b(0) + a(1) * b(1) + a(2) * b(2)
  /** area of triangle (a, b, c) = |cross(b-a, c-a)| / 2 — the non-Heron form. */
  private def triArea(a: Array[Double], b: Array[Double], c: Array[Double]) =
    norm(cross(sub(b, a), sub(c, a))) / 2.0

  test("projected Heron two-triangle area equals the cross-product restatement") {
    val r = new scala.util.Random(4242)
    val rows = (0 until 64).map { i =>
      // facet anchored at (tx0, ty0) with sides ~ (2000, 76) m and noisy heights;
      // sensor in the x-z plane like the fixture's zero-Doppler geometry
      val tx0 = r.nextDouble() * 300000.0; val ty0 = r.nextDouble() * 7000.0
      val tx1 = tx0 + 2000.0; val ty1 = ty0 + 76.0
      def h() = 100.0 + r.nextDouble() * 400.0
      (i, tx0, ty0, tx1, ty1, h(), h(), h(), h(), -400000.0, 700000.0)
    }
    val df = rows.toDF("id", "tx0", "ty0", "tx1", "ty1", "h00", "h01", "h10", "h11", "orb_x", "orb_z")
      .withColumn("slant", expr("sqrt((orb_x - tx0) * (orb_x - tx0) + (orb_z - h00) * (orb_z - h00))"))
      .withColumn("sx", expr("(orb_x - tx0) / slant"))
      .withColumn("sz", expr("(orb_z - h00) / slant"))
      .withColumn("q00", expr("tx0 * sx + h00 * sz")).withColumn("q01", expr("tx0 * sx + h01 * sz"))
      .withColumn("q10", expr("tx1 * sx + h10 * sz")).withColumn("q11", expr("tx1 * sx + h11 * sz"))
      .withColumn("p00x", expr("tx0 - q00 * sx")).withColumn("p00z", expr("h00 - q00 * sz"))
      .withColumn("p01x", expr("tx0 - q01 * sx")).withColumn("p01z", expr("h01 - q01 * sz"))
      .withColumn("p10x", expr("tx1 - q10 * sx")).withColumn("p10z", expr("h10 - q10 * sz"))
      .withColumn("p11x", expr("tx1 - q11 * sx")).withColumn("p11z", expr("h11 - q11 * sz"))
      .withColumn("e0001", expr("sqrt((p00x - p01x) * (p00x - p01x) + (ty0 - ty1) * (ty0 - ty1) + (p00z - p01z) * (p00z - p01z))"))
      .withColumn("e0010", expr("sqrt((p00x - p10x) * (p00x - p10x) + (ty0 - ty0) * (ty0 - ty0) + (p00z - p10z) * (p00z - p10z))"))
      .withColumn("e1101", expr("sqrt((p11x - p01x) * (p11x - p01x) + (ty1 - ty1) * (ty1 - ty1) + (p11z - p01z) * (p11z - p01z))"))
      .withColumn("e1110", expr("sqrt((p11x - p10x) * (p11x - p10x) + (ty1 - ty0) * (ty1 - ty0) + (p11z - p10z) * (p11z - p10z))"))
      .withColumn("e1001", expr("sqrt((p10x - p01x) * (p10x - p01x) + (ty0 - ty1) * (ty0 - ty1) + (p10z - p01z) * (p10z - p01z))"))
      .withColumn("gamma_area", expr(TerrainCorrection.heronSum("e0001", "e0010", "e1101", "e1110", "e1001")))
    val got = df.select("id", "gamma_area").as[(Int, Double)].collect().toMap
    rows.foreach { case (i, tx0, ty0, tx1, ty1, h00, h01, h10, h11, ox, oz) =>
      val sv = Array(ox - tx0, 0.0, oz - h00); val sl = norm(sv)
      val s = Array(sv(0) / sl, 0.0, sv(2) / sl)
      def proj(t: Array[Double]) = { val d = dot(t, s); Array(t(0) - d * s(0), t(1) - d * s(1), t(2) - d * s(2)) }
      val p00 = proj(Array(tx0, ty0, h00)); val p01 = proj(Array(tx0, ty1, h01))
      val p10 = proj(Array(tx1, ty0, h10)); val p11 = proj(Array(tx1, ty1, h11))
      val exp = triArea(p00, p01, p10) + triArea(p11, p01, p10)
      assert(math.abs(got(i) - exp) / exp < 1e-9, s"facet $i: ${got(i)} vs $exp")
    }
  }

  test("flattening query invariants: projection shrinks area; threshold bounds flat pixels") {
    val out = TerrainCorrection.terrainFlatteningQuery(spark, TestSpark.Sf)
      .select("n_px", "n_facets", "garea_sum_q", "sarea_sum_q", "n_flat", "flat_sum_q")
      .collect()
    assert(out.nonEmpty)
    var flat = 0L
    out.foreach { row =>
      val nPx = row.getLong(0); val g = row.getLong(2); val s = row.getLong(3); val nF = row.getLong(4)
      // projecting onto the plane perpendicular to the slant vector cannot grow a
      // facet (quantization slack: 1 ulp of the 1e-2 grid per contribution)
      assert(g <= s + 4 * row.getLong(1), s"gamma area $g > sigma area $s")
      assert(nF <= nPx)
      flat += nF
    }
    assert(flat > 0, "threshold guard killed every pixel — normalization leg untested")
  }
}
