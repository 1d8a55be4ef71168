package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.ChainGraph

/** The declarative chain runner (GPF graph analog): parser fidelity, fused
 * single-plan compilation, checkpointed Write, and the pinned end-to-end
 * validation case (the analog of the reference's validation YAML cases with
 * declared metrics + tolerances). */
class ChainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.Sf

  test("XML parser: node/operator/sources/parameters round-trip; presentation blocks ignored") {
    val spec = ChainGraph.parseXml(ChainGraph.topsCoregXml)
    assert(spec.nodes.map(_.id) === Seq("Read", "Read(2)", "TOPSAR-Split", "TOPSAR-Split(2)",
      "Apply-Orbit-File", "Apply-Orbit-File(2)", "Back-Geocoding", "Write"))
    val bg = spec.byId("Back-Geocoding")
    assert(bg.operator === "Back-Geocoding")
    assert(bg.sources === Seq("Apply-Orbit-File", "Apply-Orbit-File(2)"))
    val split = spec.byId("TOPSAR-Split")
    assert(split.params("firstBurstIndex") === "1" && split.params("lastBurstIndex") === "3")
    // a graph carrying an applicationData presentation block (as every
    // reference-shipped XML does) parses to the same spec
    val withPresentation = ChainGraph.topsCoregXml.replace("</graph>",
      """<applicationData id="Presentation"><node id="Read"><displayPosition x="1" y="2"/></node></applicationData></graph>""")
    assert(ChainGraph.parseXml(withPresentation).nodes.map(_.id) === spec.nodes.map(_.id))
  }

  test("compile rejects unknown operators, unknown refs, cycles, and multi-sink graphs") {
    def spec(xml: String) = ChainGraph.parseXml(xml)
    intercept[RuntimeException] {
      ChainGraph.compile(spark, sf, spec(
        "<graph><node id=\"a\"><operator>NoSuchOp</operator><sources/><parameters/></node></graph>"))
    }
    intercept[RuntimeException] {
      ChainGraph.compile(spark, sf, spec(
        "<graph><node id=\"a\"><operator>Write</operator><sources><sourceProduct refid=\"ghost\"/></sources><parameters/></node></graph>"))
    }
    intercept[RuntimeException] { // two sinks
      ChainGraph.compile(spark, sf, spec(
        """<graph><node id="a"><operator>Read</operator><sources/><parameters/></node>
          |<node id="b"><operator>Read</operator><sources/><parameters/></node></graph>""".stripMargin))
    }
  }

  test("tops-coreg chain: Split params genuinely prune; pairing is even->odd per (subswath, burst)") {
    val out = ChainGraph.topsCoregQuery(spark, sf).collect()
    assert(out.nonEmpty)
    // burst range 1..3 declared in the XML reaches the output
    assert(out.forall(r => { val b = r.getAs[Number]("burst_idx").longValue; b >= 1 && b <= 3 }))
    // every master is even-ordinal, every secondary its +1 odd partner
    out.foreach { r =>
      val m = r.getAs[String]("m_scene_id").substring(6).toInt
      val s = r.getAs[String]("sec_scene_id").substring(6).toInt
      assert(m % 2 == 0 && s == m + 1)
    }
    // direct recompute of az_dt for one row: burst mid-time difference of the
    // paired scenes from the fixture generator's own timeline
    val r0 = out.minBy(r => (r.getAs[String]("m_scene_id"), r.getAs[String]("subswath"), r.getAs[Number]("burst_idx").longValue))
    val b = r0.getAs[Number]("burst_idx").intValue
    val mOrd = r0.getAs[String]("m_scene_id").substring(6).toInt
    def mid(s: Int) = (gen.Fixtures.burstFirstLineTime(s, b) + gen.Fixtures.burstLastLineTime(s, b)) / 2
    val expected = math.floor(0.031415926535897934 + (mid(mOrd + 1) - mid(mOrd)) * 1e6).toLong
    assert(r0.getAs[Long]("az_dt_q") === expected)
  }

  test("e2e chain compiles to ONE fused plan: split filters push into the scan, no mid-chain writes") {
    val df = ChainGraph.e2eChainQuery(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    // the Split node's predicates reach the parquet scan as pushed filters
    assert(physical.contains("PushedFilters"), physical.take(2000))
    assert(physical.replaceAll("\\s+", " ").matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(subswath,IW1\\).*"),
      physical.take(3000))
    // fused: nothing materializes between declared stages (no InMemoryRelation,
    // no LogicalRDD barrier from a mid-chain collect/checkpoint)
    assert(!physical.contains("InMemoryTableScan") && !physical.contains("Scan ExistingRDD"), physical.take(2000))
  }

  test("pinned E2E validation case (declared metrics + tolerance, SURVEY §5.2 shape 4)") {
    // The analog of the reference's validation YAML (cases/*.yml: a declared
    // chain + expected metrics + tolerance): Read -> Split(IW1, VV, 1..3) ->
    // Calibration(sigma0) -> Lee -> Multilook(4x4), pinned end numbers at
    // sf0.001. Integer metrics carry tolerance 0 — any engine change that
    // shifts a single quantized pixel fails this case loudly.
    case class Pinned(metric: String, expected: Long, tolerance: Long)
    val cases = Seq(
      Pinned("n_blocks", 3072L, 0L),
      Pinned("total_valid", 49152L, 0L),
      Pinned("total_sum_q", -243551709688614L, 0L))
    val r = ChainGraph.e2eChainQuery(spark, sf)
      .agg(count(lit(1)).as("n_blocks"), sum("n_valid").as("total_valid"), sum("sum_q").as("total_sum_q"))
      .head()
    val got = Map("n_blocks" -> r.getAs[Long]("n_blocks"),
      "total_valid" -> r.getAs[Long]("total_valid"), "total_sum_q" -> r.getAs[Long]("total_sum_q"))
    cases.foreach { c =>
      assert(math.abs(got(c.metric) - c.expected) <= c.tolerance,
        s"${c.metric}: got ${got(c.metric)}, pinned ${c.expected} ± ${c.tolerance}")
    }
  }

  test("pinned tops-coreg validation case") {
    val r = ChainGraph.topsCoregQuery(spark, sf)
      .agg(count(lit(1)).as("n"), sum("az_dt_q").as("az"), sum("bx_q").as("bx"),
        sum("bz_q").as("bz"), sum("ay_resid_q").as("ay"))
      .head()
    assert(r.getAs[Long]("n") === 9L)
    assert(r.getAs[Long]("az") === 900000000L)
    assert(r.getAs[Long]("bx") === 0L)
    assert(r.getAs[Long]("bz") === 0L)
    assert(r.getAs[Long]("ay") === -6750000000000L)
  }

  test("insar chain: fused two-source DAG; coherence recomputed directly for one burst") {
    val out = ChainGraph.insarChainQuery(spark, sf)
    // fused plan: split filters reach both scans; no mid-chain materialization
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.replaceAll("\\s+", " ").matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(subswath,IW1\\).*"))
    assert(!physical.contains("InMemoryTableScan") && !physical.contains("Scan ExistingRDD"))
    val rows = out.collect()
    assert(rows.nonEmpty && rows.forall(r => { val b = r.getAs[Number]("burst_idx").longValue; b >= 1 && b <= 3 }))

    // direct recompute: coherence -> 4x4 block stats for ONE burst, from the raw
    // fixture pixels, sharing only the formula (not the engine dataflow)
    val w = model.Layout.TileW; val h = model.Layout.TileH
    val nd = model.Layout.NoData
    def grid(table: String, scene: String): Map[(Int, Int), (Double, Double)] = {
      gen.Fixtures.table(spark, sf, table)
        .where(col("scene_id") === scene && col("subswath") === "IW1" &&
          col("pol") === "VV" && col("burst_idx") === 1)
        .select("tile_x", "tile_y", "i", "q").collect().flatMap { r =>
          val tx = r.getAs[Number](0).intValue; val ty = r.getAs[Number](1).intValue
          val iv = r.getSeq[Double](2); val qv = r.getSeq[Double](3)
          (0 until w * h).map { k =>
            def snap(x: Double) = math.floor(x * 4096.0) / 4096.0
            ((tx * w + k % w, ty * h + k / w), (snap(iv(k)), snap(qv(k))))
          }
        }.toMap
    }
    val scene = rows.head.getAs[String]("scene_id")
    val a = grid("tiles", scene); val b = grid("tiles_sec", scene)
    def cross(p: (Int, Int)): Option[(Double, Double, Double, Double)] = {
      val (i1, q1) = a(p); val (i2, q2) = b(p)
      if (i1 == nd || q1 == nd || i2 == nd || q2 == nd) None
      else Some((i1 * i2 + q1 * q2, q1 * i2 - i1 * q2, i1 * i1 + q1 * q1, i2 * i2 + q2 * q2))
    }
    def coh(p: (Int, Int)): Double = {
      var n = 0; var sre = 0.0; var sim = 0.0; var sp1 = 0.0; var sp2 = 0.0
      for (dy <- -1 to 1; dx <- -1 to 1) {
        val q = (p._1 + dx, p._2 + dy)
        if (a.contains(q)) cross(q).foreach { c =>
          n += 1; sre += c._1; sim += c._2; sp1 += c._3; sp2 += c._4
        }
      }
      if (n == 0 || sp1 <= 0 || sp2 <= 0) nd
      else math.sqrt(sre * sre + sim * sim) / math.sqrt(sp1 * sp2)
    }
    val chainRows = rows.filter(r => r.getAs[String]("scene_id") == scene &&
      r.getAs[Number]("burst_idx").longValue == 1)
    assert(chainRows.nonEmpty)
    chainRows.take(8).foreach { r =>
      val tx = r.getAs[Number]("tile_x").intValue; val ty = r.getAs[Number]("tile_y").intValue
      val bx = r.getAs[Int]("block_x"); val by = r.getAs[Int]("block_y")
      var nValid = 0L; var sumQ = 0L
      for (jy <- 0 until 4; jx <- 0 until 4) {
        val c = coh((tx * w + bx * 4 + jx, ty * h + by * 4 + jy))
        if (c != nd) { nValid += 1; sumQ += math.floor(0.031415926535897934 + c * 1e9).toLong }
      }
      assert(r.getAs[Long]("n_valid") === nValid, s"tile ($tx,$ty) block ($bx,$by)")
      assert(r.getAs[Long]("sum_q") === sumQ, s"tile ($tx,$ty) block ($bx,$by)")
    }
  }

  test("dinsar chain: topo-phase removal recomputed directly for one burst") {
    val out = ChainGraph.dinsarChainQuery(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.forall(r => { val b = r.getAs[Number]("burst_idx").longValue; b >= 1 && b <= 3 }))

    val w = model.Layout.TileW; val h = model.Layout.TileH
    val nd = model.Layout.NoData
    def grid(table: String, scene: String): Map[(Int, Int), (Double, Double)] = {
      gen.Fixtures.table(spark, sf, table)
        .where(col("scene_id") === scene && col("subswath") === "IW1" &&
          col("pol") === "VV" && col("burst_idx") === 1)
        .select("tile_x", "tile_y", "i", "q").collect().flatMap { r =>
          val tx = r.getAs[Number](0).intValue; val ty = r.getAs[Number](1).intValue
          val iv = r.getSeq[Double](2); val qv = r.getSeq[Double](3)
          (0 until w * h).map { k =>
            def snap(x: Double) = math.floor(x * 4096.0) / 4096.0
            ((tx * w + k % w, ty * h + k / w), (snap(iv(k)), snap(qv(k))))
          }
        }.toMap
    }
    val scene = rows.head.getAs[String]("scene_id")
    val a = grid("tiles", scene); val b = grid("tiles_sec", scene)
    // wrap(ifg_phase - Ktopo * h(gx, gy)) per pixel, sharing only the formula
    def dphase(p: (Int, Int)): Double = {
      val (i1, q1) = a(p); val (i2, q2) = b(p)
      if (i1 == nd || q1 == nd || i2 == nd || q2 == nd) nd
      else {
        val ph = math.atan2(q1 * i2 - i1 * q2, i1 * i2 + q1 * q2)
        val f = ops.InSAR.Ktopo * (100.0 + 50.0 * math.sin(p._1 / 40.0) + 40.0 * math.cos(p._2 / 25.0))
        math.atan2(math.sin(ph - f), math.cos(ph - f))
      }
    }
    val chainRows = rows.filter(r => r.getAs[String]("scene_id") == scene &&
      r.getAs[Number]("burst_idx").longValue == 1)
    assert(chainRows.nonEmpty)
    chainRows.take(8).foreach { r =>
      val tx = r.getAs[Number]("tile_x").intValue; val ty = r.getAs[Number]("tile_y").intValue
      val bx = r.getAs[Int]("block_x"); val by = r.getAs[Int]("block_y")
      var nValid = 0L; var sumQ = 0L
      for (jy <- 0 until 4; jx <- 0 until 4) {
        val d = dphase((tx * w + bx * 4 + jx, ty * h + by * 4 + jy))
        if (d != nd) { nValid += 1; sumQ += math.floor(0.031415926535897934 + d * 1e9).toLong }
      }
      assert(r.getAs[Long]("n_valid") === nValid, s"tile ($tx,$ty) block ($bx,$by)")
      assert(r.getAs[Long]("sum_q") === sumQ, s"tile ($tx,$ty) block ($bx,$by)")
    }
    // same declared prefix as the InSAR chain -> identical block structure
    // (per-pixel valid counts legitimately differ: coherence is defined from
    // any valid 3x3 neighbor, phase only from a valid center pixel)
    val ins = ChainGraph.insarChainQuery(spark, sf)
      .agg(count(lit(1)).as("n")).head()
    assert(rows.length.toLong === ins.getAs[Long]("n"))
  }

  test("pinned insar-chain validation case") {
    val r = ChainGraph.insarChainQuery(spark, sf)
      .agg(count(lit(1)).as("n_blocks"), sum("n_valid").as("total_valid"), sum("sum_q").as("total_sum_q"))
      .head()
    assert(r.getAs[Long]("n_blocks") === 3072L)
    assert(r.getAs[Long]("total_valid") === 49152L)
    assert(r.getAs[Long]("total_sum_q") === 14868570500917L)
  }

  test("tc chain: fused Split -> Terrain-Correction equals the standalone normalized TC on the split window") {
    val chain = ChainGraph.tcChainQuery(spark, sf)
    // fused plan: the Split predicates reach the tile scan feeding the gather
    val physical = chain.queryExecution.executedPlan.toString
    assert(physical.replaceAll("\\s+", " ").matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(subswath,IW1\\).*"),
      physical.take(3000))
    assert(!physical.contains("CartesianProduct"), physical.take(2000))
    // the chain IS the standalone q_tc_normalized machinery, input-driven:
    // equality on the declared window is a complete behavioral pin
    val got = chain.collect().map(_.toString).sorted
    val want = ops.TerrainCorrection.tcNormalizedQuery(spark, sf)
      .where(col("subswath") === "IW1" && col("burst_idx").between(1, 3))
      .collect().map(_.toString).sorted
    assert(got.nonEmpty && got.sameElements(want))
    // split pruning is real: the unrestricted standalone resolves more rows
    assert(want.length < ops.TerrainCorrection.tcNormalizedQuery(spark, sf).count())
  }

  test("goldstein chain: declared Goldstein node equals the standalone filter on the split window") {
    val spec = ChainGraph.parseXml(ChainGraph.goldsteinChainXml)
    assert(spec.nodes.map(_.operator).contains("GoldsteinPhaseFiltering"))
    assert(spec.byId("TOPSAR-Split").params("lastBurstIndex") === "2")
    val got = ChainGraph.goldsteinChainQuery(spark, sf).collect().map(_.toString).sorted
    val want = ops.Spectral.goldsteinQuery(spark, sf)
      .where(col("subswath") === "IW1").collect().map(_.toString).sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("pinned dinsar-chain validation case") {
    val r = ChainGraph.dinsarChainQuery(spark, sf)
      .agg(count(lit(1)).as("n_blocks"), sum("n_valid").as("total_valid"), sum("sum_q").as("total_sum_q"))
      .head()
    assert(r.getAs[Long]("n_blocks") === 3072L)
    assert(r.getAs[Long]("total_valid") === 48964L)
    assert(r.getAs[Long]("total_sum_q") === 115797476811L)
  }

  test("pinned grd-chain validation case; thermal-noise node genuinely denoises") {
    val r = ChainGraph.grdChainQuery(spark, sf)
      .agg(count(lit(1)).as("n_blocks"), sum("n_valid").as("total_valid"), sum("sum_q").as("total_sum_q"))
      .head()
    assert(r.getAs[Long]("n_blocks") === 3072L)
    assert(r.getAs[Long]("total_valid") === 49152L)
    assert(r.getAs[Long]("total_sum_q") === -268536447251353L)
    // the GRD chain is the e2e chain plus the ThermalNoiseRemoval node: same
    // block structure, strictly smaller calibrated mass (the noise floor is
    // positive wherever pixels are valid)
    val e = ChainGraph.e2eChainQuery(spark, sf)
      .agg(sum("n_valid").as("tv"), sum("sum_q").as("ts")).head()
    assert(e.getAs[Long]("tv") === r.getAs[Long]("total_valid"))
    assert(r.getAs[Long]("total_sum_q") < e.getAs[Long]("ts"))
  }

  test("chain compiler is stream-capable: the per-row GRD prefix runs as a structured stream and equals the batch chain") {
    import org.apache.spark.sql.streaming.Trigger
    val prefixXml =
      """<graph id="Graph">
        |  <node id="Read"><operator>Read</operator><sources/><parameters><table>tiles</table></parameters></node>
        |  <node id="TOPSAR-Split"><operator>TOPSAR-Split</operator><sources><sourceProduct refid="Read"/></sources><parameters><subswath>IW1</subswath><selectedPolarisations>VV</selectedPolarisations><firstBurstIndex>1</firstBurstIndex><lastBurstIndex>3</lastBurstIndex></parameters></node>
        |  <node id="ThermalNoiseRemoval"><operator>ThermalNoiseRemoval</operator><sources><sourceProduct refid="TOPSAR-Split"/></sources><parameters/></node>
        |  <node id="Calibration"><operator>Calibration</operator><sources><sourceProduct refid="ThermalNoiseRemoval"/></sources><parameters/></node>
        |  <node id="Write"><operator>Write</operator><sources><sourceProduct refid="Calibration"/></sources><parameters><file></file></parameters></node>
        |</graph>""".stripMargin
    val spec = ChainGraph.parseXml(prefixXml)
    val cols = Seq("scene_id", "subswath", "pol", "burst_idx", "tile_y", "tile_x", "v")
    val batchTiles = gen.Fixtures.table(spark, sf, "tiles")
    val exp = ChainGraph.compile(spark, sf, spec)
      .select(cols.map(col): _*).collect().map(_.toString).sorted
    // the SAME declared chain over a readStream source: per-row nodes are pure
    // frame transformations, the noise/calibration LUT joins run stream-static
    val streamTiles = spark.readStream.schema(batchTiles.schema)
      .parquet(new java.io.File(batchTiles.inputFiles.head).getParent)
    val q = ChainGraph.compile(spark, sf, spec, Map("Read" -> streamTiles))
      .select(cols.map(col): _*)
      .writeStream.format("memory").queryName("chain_stream_twin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("chain_stream_twin").collect().map(_.toString).sorted
    assert(got.length === exp.length && got.sameElements(exp))
  }

  test("deburst chain: split reshapes the deburst timeline; equals the input-driven op directly") {
    val out = ChainGraph.deburstChainQuery(spark, sf).collect()
    assert(out.nonEmpty && out.forall { r =>
      val b = r.getAs[Number]("burst_idx").longValue; b >= 2 && b <= 5 })
    // line 0 of the restricted product is burst 2's first line (the grid spans
    // the SELECTED bursts, not the scene) — the reshaping under test
    assert(out.filter(_.getAs[Number]("line").longValue == 0L)
      .forall(r => r.getAs[Number]("burst_idx").longValue == 2L))
    val direct = ops.Deburst.fromBursts(spark, sf,
      gen.Fixtures.table(spark, sf, "bursts")
        .where(col("subswath") === "IW2" && col("burst_idx").between(2, 5)))
      .collect().map(_.toString).sorted
    assert(out.map(_.toString).sorted.sameElements(direct))
  }

  test("fuzz: node declaration order is irrelevant — shuffled graphs compile to identical results") {
    val rng = new scala.util.Random(7)
    val base = ChainGraph.parseXml(ChainGraph.dinsarChainXml)
    val exp = ChainGraph.dinsarChainQuery(spark, sf).collect().map(_.toString).sorted
    (1 to 3).foreach { i =>
      val perm = ChainGraph.Spec(rng.shuffle(base.nodes))
      val got = ChainGraph.compile(spark, sf, perm).collect().map(_.toString).sorted
      assert(got.sameElements(exp), s"permutation $i diverged")
    }
  }

  test("subset chain: pixel-exact crop — non-overlapping tiles drop, surviving tiles mask") {
    val out = ChainGraph.subsetChainQuery(spark, sf).collect()
    assert(out.nonEmpty)
    // region (40, 34) 80x20: tile column 0 (x 0..31) and tile row 0 (y 0..31)
    // have no overlap and must be gone from the product
    assert(out.forall(r => r.getAs[Number]("tile_x").intValue >= 1 &&
      r.getAs[Number]("tile_y").intValue >= 1))
    // surviving tiles are partially masked: tile (1,1) covers x 32..63, y 32..63;
    // its region intersection is x 40..63, y 34..53 -> 24 * 20 = 480 region pixels,
    // minus the fixture's PLANTED no-data pixels (u < 0.002) inside the window —
    // expected counts come from a direct recomputation over the raw tiles frame
    val tw = model.Layout.TileW; val th = model.Layout.TileH
    val nd = model.Layout.NoData
    val expected = gen.Fixtures.table(spark, sf, "tiles")
      .where(col("subswath") === "IW1" && col("pol") === "VV" && col("burst_idx").between(1, 3))
      .select(col("scene_id"), col("burst_idx"), col("tile_y"), col("tile_x"),
        expr(s"""aggregate(transform(i, (x, k) ->
          if((tile_x * $tw + k % $tw) BETWEEN 40 AND 119
             AND (tile_y * $th + k div $tw) BETWEEN 34 AND 53
             AND x != ${nd}d, 1L, 0L)), 0L, (a, b) -> a + b)""").as("exp_valid"))
      .collect().map(r => (r.getString(0), r.getAs[Number]("burst_idx").intValue,
        r.getAs[Number]("tile_y").intValue, r.getAs[Number]("tile_x").intValue) ->
        r.getAs[Long]("exp_valid")).toMap
    out.foreach { r =>
      val key = (r.getAs[String]("scene_id"), r.getAs[Number]("burst_idx").intValue,
        r.getAs[Number]("tile_y").intValue, r.getAs[Number]("tile_x").intValue)
      assert(r.getAs[Long]("n_valid") === expected(key), s"tile $key")
    }
    // the geometric ceiling still pins the crop window: no tile exceeds 480 and
    // the fully-in-window tiles reach it wherever no no-data was planted
    val t11 = out.filter(r => r.getAs[Number]("tile_x").intValue == 1 &&
      r.getAs[Number]("tile_y").intValue == 1)
    assert(t11.nonEmpty && t11.forall(_.getAs[Long]("n_valid") <= 480L))
    assert(out.exists(_.getAs[Long]("n_valid") == 480L))
  }

  test("chains on an empty split window return empty frames, not failures") {
    val emptyWin = "<firstBurstIndex>50</firstBurstIndex><lastBurstIndex>60</lastBurstIndex>"
    Seq(
      ChainGraph.e2eChainXml.replace("<firstBurstIndex>1</firstBurstIndex><lastBurstIndex>3</lastBurstIndex>", emptyWin),
      ChainGraph.dinsarChainXml.replace("<firstBurstIndex>1</firstBurstIndex><lastBurstIndex>3</lastBurstIndex>", emptyWin),
      ChainGraph.deburstChainXml.replace("<firstBurstIndex>2</firstBurstIndex><lastBurstIndex>5</lastBurstIndex>", emptyWin)
    ).foreach { xml =>
      assert(ChainGraph.compile(spark, sf, ChainGraph.parseXml(xml)).count() === 0L)
    }
  }

  test("dinsar stream gate: the stream-static two-source chain equals its batch twin") {
    val got = ChainGraph.dinsarStreamQuery(spark, sf).collect().map(_.toString).sorted
    val exp = ChainGraph.dinsarChainQuery(spark, sf).collect().map(_.toString).sorted
    assert(got.nonEmpty && got.sameElements(exp))
  }

  test("grd stream gate: the driver-gated streaming chain equals its batch twin") {
    val got = ChainGraph.grdStreamQuery(spark, sf).collect().map(_.toString).sorted
    val batch = ChainGraph.compile(spark, sf, ChainGraph.parseXml(ChainGraph.grdStreamXml))
    val exp = ops.Raster.rollup(batch.withColumn("out", col("v")), scale = 1e1)
      .collect().map(_.toString).sorted
    assert(got.nonEmpty && got.sameElements(exp))
  }

  test("chain scans are column-pruned: only the consumed columns reach the parquet read") {
    // the e2e chain consumes keys + i/q; the tiles table also carries w/h/
    // no_data columns that must be pruned out of the scan's ReadSchema
    // (raise the scan-metadata string cap so ReadSchema isn't elided)
    val orig = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val physical = ChainGraph.e2eChainQuery(spark, sf).queryExecution.executedPlan.toString
      val read = "ReadSchema: [^\\n]*".r.findFirstIn(physical).getOrElse("")
      val fields = "[<,](\\w+):".r.findAllMatchIn(read).map(_.group(1)).toSet
      assert(fields.contains("i") && fields.contains("q"), read)
      assert(!fields.contains("no_data") && !fields.contains("w") && !fields.contains("h"),
        s"unused columns not pruned: $read")
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", orig)
  }

  test("Write node with a file param commits a resumable checkpoint and replays on rerun") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chain_ckpt").toString
    val xml = ChainGraph.topsCoregXml.replace("<file></file>", s"<file>$dir</file>")
    val first = ChainGraph.compile(spark, sf, ChainGraph.parseXml(xml)).collect().map(_.toString).sorted
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "write", "_MANIFEST.json")),
      "Write node did not commit a checkpoint manifest")
    val second = ChainGraph.compile(spark, sf, ChainGraph.parseXml(xml)).collect().map(_.toString).sorted
    assert(first.sameElements(second))
    // replayed frame reads the snapshot, not the recomputed plan
    val replayed = ChainGraph.compile(spark, sf, ChainGraph.parseXml(xml))
    assert(replayed.queryExecution.logical.toString.contains("Relation") ||
      replayed.queryExecution.executedPlan.toString.contains("parquet"))
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  test("PipelineRunner chain spec is data-driven: parses, rejects malformed lines, keys resolve") {
    val parsed = PipelineRunner.parseChainSpec(PipelineRunner.DefaultChainSpec)
    assert(parsed.nonEmpty && parsed.head === ("split", "q_topsar_split"))
    // every declared stage references a registered query
    parsed.foreach { case (_, key) => assert(SparkEntry.queries.contains(key), s"unknown query $key") }
    assert(PipelineRunner.parseChainSpec("# comment\n\na=q_x\n") === Seq(("a", "q_x")))
    intercept[IllegalArgumentException] { PipelineRunner.parseChainSpec("no-equals-here") }
  }

  test("diamond DAG: a node referenced twice compiles once; self-interferogram phase is zero") {
    // one Read feeds BOTH sides of the two-source Interferogram (the memoized
    // post-order walk must not re-evaluate or reject the shared node), and an
    // image interfered with itself has cim = 0 -> wrapped phase identically 0
    val xml =
      """<graph><node id="R"><operator>Read</operator><sources/><parameters><table>tiles</table></parameters></node>
        |<node id="S"><operator>TOPSAR-Split</operator><sources><sourceProduct refid="R"/></sources>
        |<parameters><subswath>IW1</subswath><selectedPolarisations>VV</selectedPolarisations><firstBurstIndex>1</firstBurstIndex><lastBurstIndex>1</lastBurstIndex></parameters></node>
        |<node id="I"><operator>Interferogram</operator>
        |<sources><sourceProduct refid="S"/><sourceProduct.1 refid="S"/></sources><parameters/></node></graph>""".stripMargin
    val out = ChainGraph.compile(spark, sf, ChainGraph.parseXml(xml))
    val bad = out.select(expr(
      "aggregate(v, 0L, (acc, ph) -> acc + if(ph = -9999.0 OR ph = 0.0, 0L, 1L))").as("nonzero"))
      .agg(sum("nonzero")).head().getLong(0)
    assert(out.count() > 0 && bad === 0L, s"$bad self-interferogram pixels with nonzero phase")
  }

  test("fuzz: random split-parameter chains compile and match the direct filter") {
    val rng = new scala.util.Random(42)
    (1 to 10).foreach { _ =>
      val first = 1 + rng.nextInt(3); val last = first + rng.nextInt(3)
      val sw = Seq("IW1", "IW2", "IW3")(rng.nextInt(3))
      val xml =
        s"""<graph><node id="R"><operator>Read</operator><sources/><parameters><table>bursts</table></parameters></node>
           |<node id="S"><operator>TOPSAR-Split</operator><sources><sourceProduct refid="R"/></sources>
           |<parameters><subswath>$sw</subswath><firstBurstIndex>$first</firstBurstIndex><lastBurstIndex>$last</lastBurstIndex></parameters></node></graph>""".stripMargin
      val out = ChainGraph.compile(spark, sf, ChainGraph.parseXml(xml))
      val direct = gen.Fixtures.table(spark, sf, "bursts")
        .where(col("subswath") === sw && col("burst_idx").between(first, last))
      assert(out.count() === direct.count(), s"sw=$sw bursts=$first..$last")
    }
  }

  test("mission-dispatch calibration: each mission branch takes its calibrator") {
    val out = ops.Calibration.dispatchQuery(spark, sf)
    val missions = out.select("mission").distinct().collect().map(_.getString(0)).toSet
    // sf0.001 has 2 scenes x 3 subswaths -> the (scene*3 + subswath) % 6 key
    // reaches ALL six calibrator branches even at the smallest fixture scale
    assert(missions === Set("SENTINEL-1", "ICEYE", "ALOS", "RADARSAT-2", "ASAR", "TERRASAR-X"))
    // ICEYE branch: sigma0 = k * dn2 exactly (IceyeCalibrator.java:237 with the
    // reference's own synthetic calibration factor) — recompute one tile
    val row = out.where(col("mission") === "ICEYE").orderBy("scene_id", "subswath", "pol", "burst_idx", "tile_y", "tile_x").head()
    val k = ops.Calibration.IceyeK.toDouble
    val tile = ops.Raster.intensityTiles(spark, sf)
      .where(col("scene_id") === row.getAs[String]("scene_id") &&
        col("subswath") === row.getAs[String]("subswath") &&
        col("pol") === row.getAs[String]("pol") &&
        col("burst_idx") === row.getAs[Number]("burst_idx").longValue &&
        col("tile_y") === row.getAs[Number]("tile_y").longValue &&
        col("tile_x") === row.getAs[Number]("tile_x").longValue)
      .select("v").head().getSeq[Double](0)
    val q = ops.Raster.quantum(1e1).toDouble
    val expSum = tile.filter(_ != model.Layout.NoData)
      .map(v => math.floor(0.031415926535897934 + v * k * q).toLong).sum
    assert(row.getAs[Long]("sum_q") === expSum)

    // ASAR branch: sigma0 = dn2 * sin(theta(gx) * DTOR) / K with the tie-point-grid
    // theta (ASARCalibrator.java:991,947) — recompute one tile pixel-by-pixel
    // with the identical double arithmetic
    def tileOf(r: org.apache.spark.sql.Row): (Seq[Double], Int) = {
      val t = ops.Raster.intensityTiles(spark, sf)
        .where(col("scene_id") === r.getAs[String]("scene_id") &&
          col("subswath") === r.getAs[String]("subswath") &&
          col("pol") === r.getAs[String]("pol") &&
          col("burst_idx") === r.getAs[Number]("burst_idx").longValue &&
          col("tile_y") === r.getAs[Number]("tile_y").longValue &&
          col("tile_x") === r.getAs[Number]("tile_x").longValue)
        .select(col("v"), col("tile_x")).head()
      (t.getSeq[Double](0), t.getAs[Number]("tile_x").intValue)
    }
    val dtor = ops.Calibration.Dtor.toDouble
    val spb = model.Layout.SamplesPerBurst
    val asarRow = out.where(col("mission") === "ASAR")
      .orderBy("scene_id", "subswath", "pol", "burst_idx", "tile_y", "tile_x").head()
    val (av, atx) = tileOf(asarRow)
    val asarK = ops.Calibration.AsarK.toDouble
    val asarExp = av.zipWithIndex.filter(_._1 != model.Layout.NoData).map { case (x, kk) =>
      val gx = atx * model.Layout.TileW + kk % model.Layout.TileW
      val s0 = x * math.sin((20.0 + 20.0 * gx / spb) * dtor) / asarK
      math.floor(0.031415926535897934 + s0 * q).toLong
    }.sum
    assert(asarRow.getAs[Long]("sum_q") === asarExp)

    // TERRASAR-X branch: Ks * |dn2 - NEBN(u)| * sin(theta) (TerraSARXCalibrator
    // .java:459-461 with the range noise polynomial :285-287)
    val tsxRow = out.where(col("mission") === "TERRASAR-X")
      .orderBy("scene_id", "subswath", "pol", "burst_idx", "tile_y", "tile_x").head()
    val (tv, ttx) = tileOf(tsxRow)
    val ks = ops.Calibration.TsxKs.toDouble
    val tsxExp = tv.zipWithIndex.filter(_._1 != model.Layout.NoData).map { case (x, kk) =>
      val gx = ttx * model.Layout.TileW + kk % model.Layout.TileW
      val u = gx / spb.toDouble
      val s0 = ks * math.abs(x - (0.02 + 0.01 * u - 0.005 * u * u)) *
        math.sin((20.0 + 20.0 * gx / spb) * dtor)
      math.floor(0.031415926535897934 + s0 * q).toLong
    }.sum
    assert(tsxRow.getAs[Long]("sum_q") === tsxExp)
  }
}
