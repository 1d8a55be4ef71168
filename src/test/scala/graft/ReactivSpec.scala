package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.Layout
import graft.ops.{Raster, Stack}

/**
 * REACTIV fidelity pin: an INDEPENDENT straight-loop Scala port of the reference
 * raster-scan (ReactivOp.java:258-392 main pass, 441-555 threshold pass) is run
 * over the sf0.001 fixture and compared EXACTLY (quantized integer sums) against
 * the engine's declarative/fold implementation. Also asserts the fixture
 * genuinely exercises the poison-recovery quirk (a pixel poisoned at some epoch
 * that a later record re-validates) and the terminal-poison path (final time -1).
 */
class ReactivSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  val ND = 9999.0 * -1
  val N = Layout.TileW * Layout.TileH
  val E = Stack.Epochs

  case class Key(scene: String, sw: String, burst: Int, ty: Int, tx: Int)

  test("engine REACTIV equals the straight-loop reference port; quirks exercised") {
    val rows = Raster.intensityTiles(spark, TestSpark.Sf, "tiles_stack")
      .select(col("scene_id"), col("subswath"), col("pol"), col("epoch"),
        col("burst_idx"), col("tile_y"), col("tile_x"), col("v"))
      .as[(String, String, String, Int, Int, Int, Int, Seq[Double])].collect()

    // (key, epoch) -> pol -> v
    val byKey = rows.groupBy(r => Key(r._1, r._2, r._5, r._6, r._7))
      .map { case (k, rs) => k -> rs.groupBy(_._4).map { case (e, es) =>
        e -> es.map(r => r._3 -> r._8).toMap }.toMap }

    var recovered = 0; var terminal = 0
    // per pixel: (mx, tm, neverPoisoned, smax, per-pol sums)
    case class Px(mx: Double, tm: Double, np: Boolean, smax: Double,
      svv: Double, s2vv: Double, svh: Double, s2vh: Double, value0: Double, maxvc: Double)
    def fold(epochs: Map[Int, Map[String, Seq[Double]]], k: Int): Px = {
      var mx = 0.0; var tm = 0.0; var np = true; var smax = 0.0
      var svv = 0.0; var s2vv = 0.0; var svh = 0.0; var s2vh = 0.0
      var poisonedOnce = false
      (0 until E).foreach { e =>
        epochs.get(e).foreach { pols =>
          val vv = pols.get("VV").map(_(k)); val vh = pols.get("VH").map(_(k))
          val poison = vv.contains(ND) || vh.contains(ND)
          if (poison) { tm = -1.0; np = false; poisonedOnce = true }
          else {
            val vmax = math.max(vv.getOrElse(Double.MinValue), vh.getOrElse(Double.MinValue))
            smax += vmax
            if (mx < vmax) { mx = vmax; tm = e.toDouble }
            vv.foreach { x => svv += x; s2vv += x * x }
            vh.foreach { x => svh += x; s2vh += x * x }
          }
        }
      }
      if (poisonedOnce && tm != -1.0) recovered += 1
      if (tm == -1.0) terminal += 1
      val value0 = 0.4 * (mx + smax / E)
      def cv(s: Double, s2: Double): Option[Double] = {
        val m = s / E
        if (m == 0.0) None else Some(math.sqrt(math.max(0.0, s2 / E - m * m)) / m)
      }
      val maxvc = (cv(svv, s2vv) ++ cv(svh, s2vh)).reduceOption(_ max _).getOrElse(0.0)
      Px(mx, tm, np, smax, svv, s2vv, svh, s2vh, value0, maxvc)
    }

    val pixels = byKey.toSeq.flatMap { case (key, epochs) =>
      (0 until N).map(k => (key, fold(epochs, k))) }
    def q(x: Double, s: Double) = math.floor(0.031415926535897934 + x * s).toLong
    // scene threshold over never-poisoned pixels (dyadic 1e-2 staging)
    val thr = pixels.groupBy(_._1.scene).map { case (s, ps) =>
      val np = ps.filter(_._2.np)
      if (np.isEmpty) s -> 0.0
      else {
        val tn = np.size.toLong
        val ts = np.map(p => q(p._2.value0, 1e2)).sum
        val ts2 = np.map { p => val t = q(p._2.value0, 1e2); t * t }.sum
        val mean = (ts / 1e2) / tn
        s -> (mean + math.sqrt(math.max(0.0, (ts2 / 1e4) / tn - mean * mean)))
      }
    }
    val expect = pixels.groupBy(_._1).map { case (key, ps) =>
      val valid = ps.map(_._2).filter(_.tm != -1.0)
      val t = thr(key.scene)
      key -> (valid.size.toLong,
        valid.map(p => q(0.9 * p.tm / (E - 1), 1e6)).sum,
        valid.map(p => q(math.min(1.0, math.max(0.0, (p.maxvc - 0.2286) / (10.0 * 0.1616) + 0.25)), 1e6)).sum,
        valid.map(p => q(if (t > 0 && p.value0 < t) p.value0 / t else 1.0, 1e6)).sum)
    }

    val got = Stack.reactivQuery(spark, TestSpark.Sf)
      .as[(String, String, Int, Int, Int, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.length == expect.size)
    got.foreach { case (s, sw, b, ty, tx, n, hq, sq, vq) =>
      val e = expect(Key(s, sw, b, ty, tx))
      assert((n, hq, sq, vq) == e, s"tile ($s,$sw,$b,$ty,$tx): got ${(n, hq, sq, vq)} expected $e")
    }
    assert(recovered > 0, "fixture exercises no poison-recovered pixel")
    assert(terminal > 0, "fixture exercises no terminally-poisoned pixel")
  }
}
