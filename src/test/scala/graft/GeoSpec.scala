package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.geom.Geo
import graft.cells.CellIndex

/** Property tests: the engine's pure-arithmetic spatial predicates vs the JTS oracle
 * (the reference's own exactness authority, TOPSARSplitOp.java:261-306). */
class GeoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Random convex quad: a rectangle sheared+rotated — generated as center + two
   * non-collinear edge vectors. Ring order guaranteed. */
  private val quadGen: Gen[Array[(Double, Double)]] = for {
    cx <- Gen.choose(-10.0, 10.0); cy <- Gen.choose(-10.0, 10.0)
    w <- Gen.choose(0.5, 4.0); h <- Gen.choose(0.5, 4.0)
    theta <- Gen.choose(0.0, math.Pi / 2 * 0.9)
    shear <- Gen.choose(-0.5, 0.5)
  } yield {
    val ux = (w * math.cos(theta), w * math.sin(theta))
    val vx = (-h * math.sin(theta) + shear * w, h * math.cos(theta))
    Array(
      (cx, cy), (cx + ux._1, cy + ux._2),
      (cx + ux._1 + vx._1, cy + ux._2 + vx._2), (cx + vx._1, cy + vx._2))
  }

  private def asWkt(c: Array[(Double, Double)]): String = graft.gen.Fixtures.cornersToWkt(c)

  test("quadIntersectsSAT matches JTS intersects on random convex quads") {
    val pairs = Gen.listOfN(200, Gen.zip(quadGen, quadGen)).pureApply(Gen.Parameters.default, Seed(42L))
    val df = pairs.map { case (a, b) =>
      (a(0)._1, a(0)._2, a(1)._1, a(1)._2, a(2)._1, a(2)._2, a(3)._1, a(3)._2,
        b(0)._1, b(0)._2, b(1)._1, b(1)._2, b(2)._1, b(2)._2, b(3)._1, b(3)._2)
    }.toDF("ax1", "ay1", "ax2", "ay2", "ax3", "ay3", "ax4", "ay4",
      "bx1", "by1", "bx2", "by2", "bx3", "by3", "bx4", "by4")
    val got = df.withColumn("hit", Geo.quadIntersectsSAT(
      Seq(col("ax1"), col("ax2"), col("ax3"), col("ax4")),
      Seq(col("ay1"), col("ay2"), col("ay3"), col("ay4")),
      Seq(col("bx1"), col("bx2"), col("bx3"), col("bx4")),
      Seq(col("by1"), col("by2"), col("by3"), col("by4"))))
      .select("hit").as[Boolean].collect()
    val expected = pairs.map { case (a, b) => Geo.intersectsWkt(asWkt(a), asWkt(b)) }
    assert(got.toSeq == expected.toSeq)
  }

  test("pointInQuad matches JTS contains on random points") {
    val cases = Gen.listOfN(300, Gen.zip(quadGen,
      Gen.zip(Gen.choose(-12.0, 14.0), Gen.choose(-12.0, 14.0)))).pureApply(Gen.Parameters.default, Seed(42L))
    val df = cases.map { case (a, (px, py)) =>
      (a(0)._1, a(0)._2, a(1)._1, a(1)._2, a(2)._1, a(2)._2, a(3)._1, a(3)._2, px, py)
    }.toDF("x1", "y1", "x2", "y2", "x3", "y3", "x4", "y4", "px", "py")
    val got = df.withColumn("hit", Geo.pointInQuad(col("px"), col("py"),
      Seq(col("x1"), col("x2"), col("x3"), col("x4")),
      Seq(col("y1"), col("y2"), col("y3"), col("y4"))))
      .select("hit").as[Boolean].collect()
    val expected = cases.map { case (a, (px, py)) => Geo.containsPoint(asWkt(a), px, py) }
    assert(got.toSeq == expected.toSeq)
  }

  test("cell column form equals scala form and packs uniquely") {
    val pts = Gen.listOfN(200, Gen.zip(Gen.choose(-179.0, 179.0), Gen.choose(-89.0, 89.0))).pureApply(Gen.Parameters.default, Seed(42L))
    val df = pts.toDF("lon", "lat")
    val got = df.withColumn("c", CellIndex.cellCol(col("lon"), col("lat"))).select("c").as[Long].collect()
    val exp = pts.map { case (lon, lat) => CellIndex.cell(lon, lat) }
    assert(got.toSeq == exp.toSeq)
    // level is encoded: cells at different levels never collide
    assert(CellIndex.cell(0, 0, 5) != CellIndex.cell(0, 0, 11))
  }

  test("coverCol covers exactly the bbox cell range") {
    val got = TestSpark.spark.range(1).select(
      CellIndex.coverCol(lit(-0.5), lit(-0.3), lit(0.4), lit(0.2)).as("c"))
      .select(explode(col("c"))).as[Long].collect().sorted
    val exp = CellIndex.cover(-0.5, -0.3, 0.4, 0.2).sorted
    assert(got.toSeq == exp)
  }
}
