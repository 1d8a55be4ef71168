package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.media.Multimodal

/** Training-data pipeline ops: planted-duplicate recall, streaming/batch agreement,
 * multimodal decode paths, hash-primitive cross-checks. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.Sf

  test("LSH pair mining: bucket population bounded by the hot cap; bits scale with N") {
    import graft.ann.Ann
    val e = Ann.emb(spark, sf)
    val n = e.count()
    val bits = Ann.pairBitsFor(n)
    val cap = Ann.hotCapFor(n, bits)
    val mask = (1L << bits) - 1
    val bt = Ann.withBucketT(e.select(col("vec_id"), col("embedding")), 0, Ann.MaxPairBits)
      .withColumn("bucket", expr(s"bucket & ${mask}L"))
    val hot = bt.groupBy("bucket").count().where(col("count") > cap).select("bucket")
    val maxCold = bt.join(hot, Seq("bucket"), "left_anti")
      .groupBy("bucket").count().agg(max("count")).head().getLong(0)
    assert(maxCold <= cap, s"cold bucket population $maxCold exceeds cap $cap")
    // parameterization scales: a 10^12-row corpus gets (far) more bucket bits
    assert(Ann.pairBitsFor(1L << 40) == Ann.MaxPairBits)
    assert(Ann.pairBitsFor(n) >= Ann.PairBits)
  }

  test("h60 via conv(md5) matches jvm md5 parsing (the DuckDB-shared primitive)") {
    val got = Seq("abc", "", "hello world").toDF("s")
      .withColumn("h", expr(Dedup.h60("s"))).select("h").as[Long].collect()
    val exp = Seq("abc", "", "hello world").map { s =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    assert(got.toSeq == exp)
  }

  test("exact dedup finds every planted exact copy") {
    val dups = Dedup.exactQuery(spark, sf).where(col("n_docs") >= 2)
    val base = Dedup.docs(spark, sf)
      .where(col("doc_id") % 7 === 0 && col("text").isNotNull).count()
    // every 7th doc was copied verbatim -> at least that many duplicate slots
    // (near-copies may also collide with other texts, adding a few more)
    assert(dups.agg(sum(col("n_docs") - 1)).as[Long].head() >= base)
    // and specifically: every planted exact copy's text hash is in a dup group
    val plantedHashes = Dedup.docs(spark, sf).where(col("doc_id") % 7 === 0)
      .select(md5(col("text")).as("text_md5")).distinct()
    assert(plantedHashes.join(dups, Seq("text_md5"), "left_anti").count() == 0)
  }

  test("minhash LSH recalls planted near-duplicates (drop-last-word copies)") {
    val pairs = Dedup.minhashPairsQuery(spark, sf)
      .where(col("doc_b") >= 2000000 && col("doc_b") - 2000000 === col("doc_a"))
    val planted = Dedup.augmented(spark, sf).where(col("doc_id") >= 2000000).count()
    val found = pairs.count()
    // near-copies have jaccard ~ (n-3)/n; with 16 hashes x 4-row bands recall is high
    assert(found >= (planted * 0.7).toLong, s"found $found of $planted planted near-dups")
    // and the found pairs really are near-identical
    assert(pairs.where(col("jaccard") < 0.4).count() == 0)
  }

  test("streaming windowed agg equals the batch transform (memory sink)") {
    val batch = streaming.Events.windowed(spark.read.parquet(s"$sf/events.parquet"))
      .select("window_start", "event_type", "n_events", "sum_value")
    val stage = java.nio.file.Files.createTempDirectory("events_stream").toString
    spark.read.parquet(s"$sf/events.parquet").write.mode("overwrite").parquet(stage)
    val q = streaming.Events.streamingWindowed(spark, stage)
      .writeStream.outputMode("complete").format("memory").queryName("ev_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ev_out")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("PQ ADC top-10 recalls the exact L2 top-1 for most queries") {
    import graft.ann.Ann
    val vecs = Ann.emb(spark, sf).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0
      for (i <- a.indices) { val t = a(i).toDouble - b(i).toDouble; d += t * t }
      d
    }
    val exact1 = (0L until 20L).map { q =>
      q -> vecs.filter(_._1 != q).minBy { case (_, v) => l2(vecs(q), v) }._1
    }.toMap
    val pqAll = Ann.pqTopKQuery(spark, sf, nQueries = 20, k = 499)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._3 -> t._2).toMap).toMap
    // the fixture embeddings are label-free uniform noise (same-label and
    // cross-label mean L2 agree to 4 decimals), so recall@10 of untrained
    // 16-codeword PQ is inherently modest — the meaningful invariant is that
    // ADC ranks the true L2 top-1 FAR better than chance (expected rank ~250)
    val ranks = exact1.toSeq.map { case (q, n1) => pqAll(q)(n1).toDouble }
    val meanRank = ranks.sum / ranks.size
    assert(meanRank < 60.0, s"mean ADC rank of exact L2 top-1 = $meanRank (chance ~250)")
    val hits10 = ranks.count(_ <= 10)
    assert(hits10 >= 5, s"PQ top-10 recalled exact L2 top-1 for only $hits10/20 queries")
  }

  test("streaming sessionization (flatMapGroupsWithState) equals the batch gap-split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, uid: Long, minutes: Double, v: Double) =
      (id, uid, new Timestamp(t0 + (minutes * 60000).toLong), v)
    // user 1: gap-split inside one batch; user 2: one session spanning batches
    // (its batch-2 event at minute 45 stays >= the post-batch-1 watermark of 44.5);
    // user 3: single event; user 4: a LATE in-watermark (44.8 >= 44.5) event OLDER
    // than the open session's 45.5 start (must pull start_us back — ADVICE r3);
    // user 999: sentinel advancing the watermark
    val batch1 = Seq(ev(0, 1, 0, 1.25), ev(1, 1, 5, 2.5), ev(2, 1, 45, 4.0),
      ev(3, 2, 20, 3.0), ev(4, 3, 1, 7.75), ev(9, 4, 45.5, 1.0))
    val batch2 = Seq(ev(5, 2, 45, 1.0), ev(10, 4, 44.8, 2.0))
    val sentinel = Seq(ev(6, 999, 100000, 0.0), ev(7, 999, 100001, 0.0))

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val src = in.toDF().toDF("event_id", "user_id", "ts", "value")
    val q = graft.streaming.Sessions.streamingSessions(src)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    in.addData(batch1); q.processAllAvailable()
    in.addData(batch2); q.processAllAvailable()
    in.addData(sentinel); q.processAllAvailable()
    in.addData(Seq(ev(8, 999, 100002, 0.0))); q.processAllAvailable() // fire timeouts
    q.stop()

    val streamed = spark.table("sess_out").where(col("user_id") =!= 999)
      .select("user_id", "start_us", "duration_us", "n_events", "value_sum_c")
    val batchDf = (batch1 ++ batch2).toDF("event_id", "user_id", "ts", "value")
    val expected = graft.streaming.Sessions.batchSessions(batchDf)
      .select("user_id", "start_us", "duration_us", "n_events", "value_sum_c")
    assert(streamed.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(streamed).count() == 0)
    assert(streamed.count() == 5) // u1 x2 (gap split), u2 x1 (cross-batch), u3 x1, u4 x1 (late start pull-back)
  }

  test("dedup clusters collapse planted duplicate families onto the original keeper") {
    val cl = Dedup.dedupClustersQuery(spark, sf)
      .select("keeper_doc", "n_members", "max_doc").as[(Long, Long, Long)].collect()
    assert(cl.nonEmpty)
    // docs divisible by 35 plant a 3-member family (x, x+1e6 exact, x+2e6 near)
    assert(cl.exists(_._2 >= 3), "expected at least one 3-member duplicate family")
    // the keeper is the min label = the ORIGINAL doc id (< the copy id spaces)
    assert(cl.forall(c => c._1 < 1000000L), cl.filter(_._1 >= 1000000L).take(3).mkString(","))
  }

  test("streaming dedup drops at-least-once re-deliveries within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, minutes: Double) = (id, new Timestamp(t0 + (minutes * 60000).toLong), id * 1.5)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val src = in.toDF().toDF("event_id", "ts", "value")
    val q = graft.streaming.Events.streamingDedup(src)
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    in.addData(Seq(ev(1, 0), ev(2, 1), ev(2, 1), ev(3, 2))) // in-batch duplicate
    q.processAllAvailable()
    in.addData(Seq(ev(3, 2), ev(4, 3)))                     // cross-batch re-delivery
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L, 4L), out.mkString(","))
  }

  test("multimodal: typed mapPartitions decode equals the expression pipeline") {
    val exprPath = Multimodal.mediaMetaQuery(spark, sf)
    val typed = graft.gen.Fixtures.table(spark, sf, "media").as[Multimodal.MediaRow]
    val mapped = Multimodal.decodeBatch(typed).toDF()
      .orderBy("media_ref")
    assert(mapped.exceptAll(exprPath).count() == 0)
    assert(exprPath.exceptAll(mapped).count() == 0)
    assert(exprPath.where(col("width") < 16 || col("width") > 255).count() == 0)
  }

  test("ann topk: rank-1 neighbor has the max cosine (spot check vs collected brute force)") {
    val top = ann.Ann.topKQuery(spark, sf, nQueries = 3, k = 1)
      .select("query_id", "neighbor_id", "cos_r").as[(Long, Long, Double)].collect()
    val emb = ann.Ann.emb(spark, sf).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    for ((q, n, c) <- top) {
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      val best = emb.filter(_._1 != q).map { case (id, v) => id -> cos(emb(q), v) }.maxBy(_._2)
      assert(best._1 == n, s"query $q")
      assert(math.abs(best._2 - c) < 1e-5)
    }
  }

  test("ann ivf: probed-list search recalls most of the exact top-k") {
    val exact = ann.Ann.topKQuery(spark, sf, nQueries = 10, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = ann.Ann.ivfTopKQuery(spark, sf, nQueries = 10, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // nprobe=2 of 8 cells scans ~25% of the corpus; label-clustered embeddings
    // keep true neighbors mostly inside the probed cells
    assert(recall >= 0.5, s"IVF recall@5 = $recall")
  }

  test("trained IVF centroids do not lose recall vs the seeded quantizer") {
    val exact = ann.Ann.topKQuery(spark, sf, nQueries = 10, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val seeded = recallOf(ann.Ann.ivfTopKQuery(spark, sf, nQueries = 10, k = 5))
    val trained = recallOf(ann.Ann.ivfTrainedTopKQuery(spark, sf, nQueries = 10, k = 5))
    assert(trained >= seeded - 1e-9, s"trained IVF recall $trained < seeded $seeded")
  }

  test("trained PQ codebook keeps all 8x16 codewords and does not degrade ADC rank") {
    val cb = ann.Ann.pqTrainedCb(spark, sf).select("cb")
      .as[Seq[Double]].collect()(0)
    assert(cb.size == 8 * 16 * 8, s"trained codebook size ${cb.size}") // no empty codewords
    def meanRank(df: org.apache.spark.sql.DataFrame): Double = {
      val exact1 = ann.Ann.topKQuery(spark, sf, nQueries = 20, k = 1)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
      val all = df.select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
        .collect().groupBy(_._1).map { case (q, rs) => q -> rs.map(r => r._3 -> r._2).toMap }
      exact1.toSeq.map { case (q, n1) => all(q).getOrElse(n1, 999).toDouble }.sum / exact1.size
    }
    // ranks computed over top-500 would be exactly comparable; top-10 membership
    // is the cheap proxy: trained must place the exact top-1 at least as often
    val seededHits = meanRank(ann.Ann.pqTopKQuery(spark, sf, nQueries = 20, k = 10))
    val trainedHits = meanRank(ann.Ann.pqTrainedTopKQuery(spark, sf, nQueries = 20, k = 10))
    assert(trainedHits <= seededHits + 1e-9,
      s"trained PQ mean top-1 rank $trainedHits worse than seeded $seededHits")
  }

  test("semantic dedup: cluster-scoped pairs recall most of the exact tau-pair graph") {
    import org.apache.spark.sql.functions._
    // exact global tau-pairs (the q_cosine_pairs baseline at the SemDeDup tau)
    val exact = ann.Ann.cosinePairsQuery(spark, sf, threshold = dedup.Dedup.SemTau)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val groups = dedup.Dedup.semanticDedupQuery(spark, sf)
      .select("keeper_vec", "n_members", "max_vec").collect()
    assert(groups.nonEmpty, "no semantic duplicate groups found — tau too high for the fixture")
    groups.foreach { r => assert(r.getLong(1) >= 2 && r.getLong(0) <= r.getLong(2)) }
    // every grouped vec pair is tau-close to SOMETHING (soundness is by
    // construction); the scale tradeoff to document is RECALL: the share of
    // exact tau-pairs whose endpoints land in the same k-means cluster
    val e = ann.Ann.emb(spark, sf)
    val cent = ann.Ann.ivfTrainedCentroids(spark, sf)
      .select(col("centroid_id"), col("cv").as("vb"))
    val assign = e.select(col("vec_id"), col("embedding").as("va"))
      .join(broadcast(cent))
      .withColumn("ccos", expr(ann.Ann.cosSql))
      .withColumn("crn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(desc("ccos"), asc("centroid_id"))))
      .where(col("crn") === 1)
      .select("vec_id", "centroid_id").as[(Long, Int)].collect().toMap
    val recalled = exact.count { case (a, b) => assign(a) == assign(b) }
    val recall = recalled.toDouble / math.max(1, exact.size)
    // measured ~0.29 on this fixture (8 clusters, tau 0.4): the documented
    // SemDeDup tradeoff — cross-cluster near-dups are invisible by design; the
    // floor is an anti-regression pin, not a quality claim (the paper accepts
    // the same miss class at k=11k clusters / 100M embeddings)
    assert(recall >= 0.2, s"cluster-scoped recall $recall below floor (exact pairs: ${exact.size})")
  }

  // --- Curation ops: independent Scala recomputation of each query on the fixture ---

  private def scalaWords(t: String): Array[String] =
    if (t == null) Array.empty else t.toLowerCase.split(" ", -1)

  private def scalaH60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.substring(0, 15), 16)
  }

  test("contamination: benchmark shingle overlap matches direct recomputation") {
    import graft.text.Curation
    val out = Curation.contaminationQuery(spark, sf)
      .select("doc_id", "n_shingles", "n_hits", "contaminated")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val raw = Dedup.docs(spark, sf).select("doc_id", "text").as[(Long, String)].collect()
    def sh(t: String): Set[String] = {
      val ws = scalaWords(t)
      if (ws.length < 3) Set.empty else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val bench = raw.filter(_._1 % 41 == 0).flatMap(x => sh(x._2)).toSet
    val expected = raw
      .filter(x => x._1 % 41 != 0 && sh(x._2).nonEmpty)
      .map { case (id, t) =>
        val s = sh(t); val hits = s.count(bench.contains).toLong
        id -> ((s.size.toLong, hits, if (hits >= 2) 1L else 0L))
      }.toMap
    assert(out == expected)
    // the bench side itself never appears in the scored output
    assert(out.keys.forall(_ % 41 != 0))
  }

  test("repetition rules: top-word / dup-bigram fractions match direct recomputation") {
    import graft.text.Curation
    val out = Curation.repetitionQuery(spark, sf)
      .select("doc_id", "top_word_count", "n_distinct_bigrams", "top_word_frac_q", "dup_bigram_frac_q", "quality_pass")
      .as[(Long, Int, Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val raw = Dedup.docs(spark, sf).select("doc_id", "text").as[(Long, String)].collect()
    val expected = raw.flatMap { case (id, t) =>
      val ws = scalaWords(t).filter(_.nonEmpty)
      if (ws.length < 2) None else {
        val top = ws.groupBy(identity).values.map(_.length).max
        val nb = ws.length - 1
        val ndb = ws.sliding(2).map(_.mkString(" ")).toSet.size
        val twf = math.floor(0.031415926535897934 + top.toDouble * 1.0e6 / ws.length).toLong
        val dbf = math.floor(0.031415926535897934 + (nb - ndb).toDouble * 1.0e6 / nb).toLong
        Some(id -> ((id, top, ndb, twf, dbf, if (twf <= 200000 && dbf <= 200000) 1L else 0L)))
      }
    }.toMap
    assert(out.size == expected.size)
    expected.foreach { case (id, (_, top, ndb, twf, dbf, pass)) =>
      val g = out(id)
      assert((g._2, g._3, g._4, g._5, g._6) == ((top, ndb, twf, dbf, pass)), s"doc $id")
    }
  }

  test("domain mix: sqrt-temperature thresholds and kept masses match direct recomputation") {
    import graft.text.Curation
    val out = Curation.domainMixQuery(spark, sf)
      .select("source", "n_docs", "tok_sum", "keep_thr", "n_kept", "kept_tok")
      .as[(String, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val raw = Dedup.docs(spark, sf).select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
      .map { case (id, src, t) => (id, src, scalaWords(t).count(_.nonEmpty).toLong) }
    val per = raw.groupBy(_._2).map { case (src, rows) =>
      src -> ((rows.length.toLong, rows.map(_._3).sum))
    }
    val sq = per.map { case (src, (_, tok)) =>
      src -> math.floor(math.sqrt(tok.toDouble) * 1048576.0).toLong
    }
    val tokTotal = per.values.map(_._2).sum
    val sqTotal = sq.values.sum
    per.foreach { case (src, (nDocs, tok)) =>
      val thr = math.min(1048576.0,
        math.floor(tokTotal.toDouble * 576460752303423488.0 / (sqTotal.toDouble * sq(src).toDouble))).toLong
      val keep = raw.filter(_._2 == src).map { case (id, _, nw) =>
        (if (scalaH60(id.toString) % 1048576L < thr) 1L else 0L, nw)
      }
      val g = out(src)
      assert((g._2, g._3, g._4, g._5, g._6) ==
        ((nDocs, tok, thr, keep.map(_._1).sum, keep.collect { case (1L, nw) => nw }.sum)), s"source $src")
    }
    // the sampler actually downsamples: at least one source is below threshold 2^20
    assert(out.values.exists(_._4 < 1048576L))
  }

  test("perplexity filter: integer-bit unigram LM costs match direct recomputation") {
    import graft.text.Curation
    val out = Curation.perplexityQuery(spark, sf)
      .select("doc_id", "n_tokens", "total_bits", "avg_bits_q", "keep")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val raw = Dedup.docs(spark, sf).select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> scalaWords(t).filter(_.nonEmpty) }
      .filter(_._2.nonEmpty)
    val vocab = raw.flatMap(_._2).groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val t = vocab.values.sum; val v = vocab.size.toLong
    def bits(w: String): Long = 63L - java.lang.Long.numberOfLeadingZeros((t + v) / (vocab(w) + 1L))
    val per = raw.map { case (id, ws) => id -> ((ws.length.toLong, ws.map(bits).sum)) }
    val gTok = per.map(_._2._1).sum; val gBits = per.map(_._2._2).sum
    assert(out.size == per.length)
    per.foreach { case (id, (n, tb)) =>
      val avg = math.floor(0.031415926535897934 + tb.toDouble * 1.0e6 / n).toLong
      val keep = if (tb * gTok <= gBits * n) 1L else 0L
      assert(out(id) == ((id, n, tb, avg, keep)), s"doc $id")
    }
    // the keep rule splits the corpus (neither all-keep nor all-drop)
    val kept = out.values.count(_._5 == 1L)
    assert(kept > 0 && kept < out.size)
  }

  test("bigram perplexity: integer-bit LM costs match direct recomputation") {
    import graft.text.Curation
    val out = Curation.perplexityBigramQuery(spark, sf)
      .select("doc_id", "n_tokens", "total_bits", "avg_bits_q", "keep")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val raw = Dedup.docs(spark, sf).select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> scalaWords(t).filter(_.nonEmpty) }
      .filter(_._2.nonEmpty)
    val uni = raw.flatMap(_._2).groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val bi = raw.flatMap(d => d._2.zip(d._2.drop(1)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val t = uni.values.sum; val v = uni.size.toLong
    def lg2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val per = raw.map { case (id, ws) =>
      val first = lg2((t + v) / (uni(ws.head) + 1L))
      val rest = ws.zip(ws.drop(1)).map { case (p, w) => lg2((uni(p) + v) / (bi((p, w)) + 1L)) }
      id -> ((ws.length.toLong, first + rest.sum))
    }
    val gTok = per.map(_._2._1).sum; val gBits = per.map(_._2._2).sum
    assert(out.size == per.length)
    per.foreach { case (id, (n, tb)) =>
      val avg = math.floor(0.031415926535897934 + tb.toDouble * 1.0e6 / n).toLong
      assert(out(id) == ((id, n, tb, avg, if (tb * gTok <= gBits * n) 1L else 0L)), s"doc $id")
    }
    // the keep rule splits the corpus (synthetic text has near-unique
    // continuations, so unlike natural language the bigram model does NOT
    // compress vs unigram here — the split, not compression, is the invariant)
    val kept = out.values.count(_._5 == 1L)
    assert(kept > 0 && kept < out.size)
  }

  test("sequence packing: concat-and-chunk manifest matches direct recomputation (1 shard and 64-doc shards)") {
    import graft.text.Curation
    val L = Curation.SeqLen
    val raw = Dedup.docs(spark, sf).select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
      .map { case (id, src, txt) =>
        (id, src, scalaWords(txt).filter(_.nonEmpty).map(w => (w.length + 3) / 4).map(_.toLong).sum)
      }
      .filter(_._3 >= 1)
    def expectedFor(shardSize: Long): Map[(String, Long, Long), (Long, Long, Long)] = {
      val m = scala.collection.mutable.Map[(String, Long, Long), (Long, Long, Long)]()
      raw.groupBy(d => (d._2, d._1 / shardSize)).foreach { case ((src, shard), ds) =>
        var cum = 0L
        ds.sortBy(_._1).foreach { case (_, _, tok) =>
          val start = cum; cum += tok
          val sf0 = start / L; val sl = (cum - 1) / L
          (sf0 to sl).foreach { s =>
            val tin = math.min(cum, (s + 1) * L) - math.max(start, s * L)
            val (a, b, c) = m.getOrElse((src, shard, s), (0L, 0L, 0L))
            m((src, shard, s)) = (a + 1, b + tin, c + (if (sl > sf0) 1L else 0L))
          }
        }
      }
      m.toMap
    }
    def outFor(shardSize: Long): Map[(String, Long, Long), (Long, Long, Long)] =
      Curation.seqPackingQuery(spark, sf, shardSize)
        .select("source", "shard", "seq_idx", "n_docs", "n_tokens", "n_boundary_docs")
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6))).toMap
    // gate shape: one shard covers all fixture ids
    val exp1 = expectedFor(1L << 40)
    assert(outFor(1L << 40) == exp1)
    assert(exp1.keys.forall(_._2 == 0L))
    // scale shape: shards pack independently (the bounded-window-partition guarantee)
    val exp64 = expectedFor(64L)
    assert(outFor(64L) == exp64)
    assert(exp64.keys.map(_._2).toSet.size > 1, "shardSize 64 should produce multiple shards")
    // every chunk except each stream's tail is exactly full
    val tails = exp1.keys.groupBy(k => (k._1, k._2)).map { case (sk, ks) => sk -> ks.map(_._3).max }
    exp1.foreach { case ((src, shard, s), (_, nTok, _)) =>
      if (s != tails((src, shard))) assert(nTok == L, s"chunk ($src, $shard, $s) not full: $nTok")
    }
  }

  test("importance weights: hashed-feature affinity ratios match direct recomputation") {
    import graft.text.Curation
    val out = Curation.importanceQuery(spark, sf)
      .select("doc_id", "n_tokens", "weight_sum", "avg_ratio_q", "resampled")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val raw = Dedup.docs(spark, sf).select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect()
      .map { case (id, lang, t) => (id, lang, scalaWords(t).filter(_.nonEmpty).map(w => scalaH60(w) % 4096L)) }
      .filter(_._3.nonEmpty)
    val cAll = raw.flatMap(_._3).groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val cTgt = raw.filter(_._2 == "en").flatMap(_._3).groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    def ratio(b: Long): Long = ((cTgt.getOrElse(b, 0L) + 1L) * 1048576L) / (cAll(b) + 1L)
    val per = raw.map { case (id, _, bs) => id -> ((bs.length.toLong, bs.map(ratio).sum)) }
    val gTok = per.map(_._2._1).sum; val gW = per.map(_._2._2).sum
    assert(out.size == per.length)
    per.foreach { case (id, (n, w)) =>
      val resampled = if (w * gTok >= gW * n) 1L else 0L
      assert(out(id) == ((id, n, w, w / n, resampled)), s"doc $id")
    }
    // the resampler separates target-affine docs from the rest
    val in = out.values.count(_._5 == 1L)
    assert(in > 0 && in < out.size)
  }

  test("substring dup mass: interval-union coverage matches direct recomputation; planted copies are fully covered") {
    import graft.dedup.Substring
    val K = Substring.SubK
    val out = Substring.dupMassQuery(spark, sf)
      .select("doc_id", "n_words", "n_dup_pos", "dup_mass", "dup_frac_q", "dup_heavy")
      .as[(Long, Int, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val base = Dedup.docs(spark, sf).select("doc_id", "text").as[(Long, String)].collect()
    val aug = base ++
      base.filter(_._1 % 7 == 0).map { case (id, t) => (id + 1000000L, t) } ++
      base.filter { case (id, t) => id % 5 == 0 && t != null && t.split(" ", -1).length >= 4 }
        .map { case (id, t) => (id + 2000000L, t.split(" ", -1).dropRight(1).mkString(" ")) }
    val docsW = aug.map { case (id, t) => id -> scalaWords(t).filter(_.nonEmpty) }
      .filter(_._2.length >= K)
    val grams = docsW.flatMap { case (id, ws) =>
      ws.sliding(K).zipWithIndex.map { case (g, i) => (id, i, scalaH60(g.mkString(" "))) }
    }
    val mult = grams.groupBy(_._3).map { case (h, xs) => h -> xs.length }
    val expected = docsW.map { case (id, ws) =>
      val dupPos = grams.filter(g => g._1 == id && mult(g._3) >= 2).map(_._2).sorted
      val mass = dupPos.zipAll(dupPos.drop(1).map(Some(_)), -1, None).collect {
        case (p, Some(nx)) if p >= 0 => math.min(K, nx - p).toLong
        case (p, None) if p >= 0 => K.toLong
      }.sum
      val frac = math.floor(0.031415926535897934 + mass.toDouble * 1.0e6 / ws.length).toLong
      id -> ((id, ws.length, dupPos.length.toLong, mass, frac, if (frac >= 500000) 1L else 0L))
    }.toMap
    assert(out.size == expected.size)
    expected.foreach { case (id, e) => assert(out(id) == e, s"doc $id") }
    // every planted exact copy (and its original) is fully covered
    docsW.map(_._1).filter(id => id >= 1000000L && id < 2000000L).foreach { id =>
      assert(out(id)._5 == 1000000L && out(id)._6 == 1L, s"planted copy $id not fully covered")
      assert(out(id - 1000000L)._5 == 1000000L, s"original ${id - 1000000L} not fully covered")
    }
  }

  test("incremental dedup: planted copies hit the prior snapshot's exact and LSH band indexes") {
    import graft.dedup.Dedup
    val out = Dedup.incrementalDedupQuery(spark, sf)
      .select("doc_id", "matched_exact", "n_band_hits", "matched_near", "is_new_content")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val base = Dedup.docs(spark, sf).select("doc_id", "text").as[(Long, String)].collect()
    val nExact = base.count(_._1 % 7 == 0)
    val nearIds = base.filter { case (id, t) => id % 5 == 0 && t != null && t.split(" ", -1).length >= 4 }
      .map(_._1 + 2000000L)
    assert(out.size == nExact + nearIds.length)
    // exact copies: identical text -> md5 hit; identical signature -> all 4 bands hit
    out.filterKeys(id => id >= 1000000L && id < 2000000L).foreach { case (id, r) =>
      assert(r._2 == 1L && r._3 == 4L && r._4 == 1L && r._5 == 0L, s"exact copy $id: $r")
    }
    // near copies: never exact (unless the truncation equals some base text), LSH recalls most
    val nearRows = nearIds.flatMap(out.get)
    val nearHit = nearRows.count(_._4 == 1L)
    assert(nearHit.toDouble / math.max(1, nearRows.length) >= 0.8,
      s"LSH recall on drop-last-word copies: $nearHit/${nearRows.length}")
    // flag algebra holds everywhere
    out.values.foreach { r => assert(r._5 == (if (r._2 == 0L && r._3 == 0L) 1L else 0L)) }
  }

  test("int8 quantization: codes and error mass match direct recomputation; top-k survives") {
    import graft.ann.Ann
    val out = Ann.quantizeQuery(spark, sf)
      .select("vec_id", "n_dims", "mx_q", "code_sum", "code_l2", "err_sum_q")
      .as[(Long, Int, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val raw = Ann.emb(spark, sf).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    def codesOf(ef: Array[Float]): (Array[Double], Double, Array[Long]) = {
      val ve = ef.map(_.toDouble)
      val mx = ve.map(math.abs).foldLeft(0.0)(math.max)
      (ve, mx, ve.map(x => if (mx == 0.0) 0L else math.floor(x * 127.0 / mx).toLong))
    }
    raw.foreach { case (id, ef) =>
      val (ve, mx, codes) = codesOf(ef)
      val errQ = ve.zip(codes).map { case (x, c) =>
        math.floor(math.abs(x - c.toDouble * mx / 127.0) * 1.0e9).toLong
      }.sum
      val mxQ = math.floor(0.031415926535897934 + mx * 1.0e6).toLong
      assert(out(id) == ((id, ve.length, mxQ, codes.sum, codes.map(c => c * c).sum, errQ)), s"vec $id")
    }
    // per-vector scales cancel in cosine, so int8 search = cosine over code vectors;
    // the quantized top-10 must keep most of the float top-10 (the storage tradeoff)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.max(1e-300, math.sqrt(na) * math.sqrt(nb))
    }
    val floats = raw.map { case (id, ef) => id -> ef.map(_.toDouble) }.toMap
    val quants = raw.map { case (id, ef) => id -> codesOf(ef)._3.map(_.toDouble) }.toMap
    val overlaps = (0L until 20L).map { q =>
      def top10(m: Map[Long, Array[Double]]): Set[Long] =
        m.keys.filter(_ != q).toSeq
          .sortBy(id => (-cos(m(q), m(id)), id)).take(10).toSet
      (top10(floats) intersect top10(quants)).size
    }
    val mean = overlaps.sum.toDouble / (10.0 * overlaps.length)
    assert(mean >= 0.7, s"int8 top-10 overlap $mean below floor")
  }

  test("BPE training matches a classic sequential implementation (merges + applied token counts)") {
    import graft.text.Bpe
    // classic BPE: word histogram -> char symbols -> argmax-pair merge rounds
    // with a SEQUENTIAL left-to-right fuse (independent of the engine's
    // declarative run-parity window formulation)
    val raw = Dedup.docs(spark, sf).select("doc_id", "text").as[(Long, String)].collect()
    val hist = raw.flatMap(d => scalaWords(d._2).filter(_.nonEmpty))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    def fuse(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
        else { out += syms(i); i += 1 }
      }
      out.result()
    }
    var segs = hist.map { case (w, c) => w -> (w.map(_.toString).toVector, c) }
    val expMerges = (1 to Bpe.Rounds).map { r =>
      val pairCnt = scala.collection.mutable.Map[(String, String), Long]()
      segs.values.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => pairCnt(p) = pairCnt.getOrElse(p, 0L) + c)
      }
      val ((a, b), cnt) = pairCnt.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      segs = segs.map { case (w, (syms, c)) => w -> (fuse(syms, a, b), c) }
      (r, a, b, cnt)
    }
    val gotMerges = Bpe.mergesQuery(spark, sf)
      .select("round", "sym_a", "sym_b", "pair_count")
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(gotMerges == expMerges, s"merge tables differ:\n got $gotMerges\n exp $expMerges")
    // applied: per-doc piece counts under the trained tokenizer
    val pieceOf = segs.map { case (w, (syms, _)) => w -> syms.length.toLong }
    val gotTok = Bpe.tokensQuery(spark, sf)
      .select("doc_id", "n_words", "n_bpe_tokens")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val expTok = raw.map { case (id, t) => id -> scalaWords(t).filter(_.nonEmpty) }
      .filter(_._2.nonEmpty)
      .map { case (id, ws) => id -> ((ws.length.toLong, ws.map(pieceOf).sum)) }.toMap
    assert(gotTok == expTok)
    // the trained tokenizer genuinely compresses vs per-char segmentation
    val charTotal = raw.flatMap(d => scalaWords(d._2).filter(_.nonEmpty)).map(_.length.toLong).sum
    assert(gotTok.values.map(_._2).sum < charTotal)
  }

  test("pii scrub: planted emails/URLs are detected and redacted exactly") {
    import graft.text.Curation
    val out = Curation.piiScrubQuery(spark, sf)
      .select("doc_id", "n_emails", "n_urls", "len_before", "len_after", "has_pii")
      .as[(Long, Int, Int, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    val raw = Dedup.docs(spark, sf).select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._2 != null)
    assert(out.size == raw.length)
    raw.foreach { case (id, t) =>
      val email = if (id % 13 == 0) s" user$id@example.com" else ""
      val url = if (id % 17 == 0) s" https://site$id.example/path" else ""
      val augLen = t.length + email.length + url.length
      val redLen = t.length +
        (if (email.nonEmpty) " <EMAIL>".length else 0) + (if (url.nonEmpty) " <URL>".length else 0)
      val (ne, nu) = (if (id % 13 == 0) 1 else 0, if (id % 17 == 0) 1 else 0)
      assert(out(id) == ((id, ne, nu, augLen, redLen, if (ne + nu > 0) 1L else 0L)), s"doc $id")
    }
    // the corpus itself carries no PII: only planted docs flag
    assert(out.values.count(_._6 == 1L) ==
      raw.count { case (id, _) => id % 13 == 0 || id % 17 == 0 })
  }

  test("line dedup: keep-first boilerplate removal matches direct recomputation") {
    import graft.text.Curation
    val raw = Dedup.docs(spark, sf).select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._2 != null).sortBy(_._1)
    // direct recomputation: expand lines exactly as the query plants them
    val lines = raw.flatMap { case (id, t) =>
      val ls = Seq(Some(t),
        if (id % 7 == 0) Some(Curation.BoilerFooter) else None,
        if (id % 5 == 0) Some(Curation.BoilerLegal) else None,
        if (id % 11 == 0) Some(s"promo code team${id / 44}") else None).flatten
      ls.zipWithIndex.map { case (l, pos) => (id, pos, l) }
    }
    val keeper = lines.groupBy(_._3).map { case (l, g) =>
      l -> ((g.map(x => (x._1, x._2)).min, g.size.toLong))
    }
    val exp = lines.groupBy(_._1).map { case (id, g) =>
      val kept = g.filter(x => keeper(x._3)._1 == ((x._1, x._2)))
      id -> ((g.length.toLong, kept.length.toLong,
        g.map(_._3.length.toLong).sum, kept.map(_._3.length.toLong).sum,
        g.filter(x => keeper(x._3)._1 != ((x._1, x._2))).map(x => keeper(x._3)._2)
          .foldLeft(0L)(math.max)))
    }
    val got = Curation.lineDedupQuery(spark, sf)
      .select("doc_id", "n_lines", "n_kept", "chars_before", "chars_after", "max_dup_copies")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == exp)
    // the pass genuinely removes mass: every planted global footer past the first dies
    val n7 = raw.count(_._1 % 7 == 0)
    assert(n7 > 2 && got.values.map(v => v._1 - v._2).sum >= n7 - 1)
    // keep-first: the least doc_id with a footer keeps it
    val firstFooter = raw.map(_._1).filter(_ % 7 == 0).min
    assert(got(firstFooter)._2 >= 2)
  }

  test("span align: caption pairing matches a direct per-doc scan; fixture exercises both directions") {
    val docsRows = graft.gen.Fixtures.table(spark, sf, "docs").select("doc_id", "spans").collect()
    def toks(t: String): Long = t.split(' ').count(_.nonEmpty).toLong
    val exp = docsRows.map { r =>
      val id = r.getString(0)
      val sp = r.getSeq[org.apache.spark.sql.Row](1)
        .map(s => (s.getString(0), s.getString(1), s.getInt(3))).sortBy(_._3)
      val texts = sp.filter(_._1 == "text")
      var (nm, np, nn, no, ct, cg) = (0L, 0L, 0L, 0L, 0L, 0L)
      for ((k, _, off) <- sp if k == "media") {
        nm += 1
        val prev = texts.filter(_._3 < off).lastOption
        val next = texts.find(_._3 > off)
        if (prev.exists(_._3 == off - 1)) np += 1
        if (next.exists(_._3 == off + 1)) nn += 1
        (prev, next) match {
          case (Some(p), _) => ct += toks(p._2); cg += off - p._3
          case (None, Some(n)) => ct += toks(n._2); cg += n._3 - off
          case _ => no += 1
        }
      }
      id -> ((nm, texts.length.toLong, np, nn, no, ct, cg))
    }.toMap
    val got = graft.ops.Spans.spanAlignQuery(spark, sf)
      .select("doc_id", "n_media", "n_text", "n_prev_adj", "n_next_adj",
        "n_orphan", "cap_tok_sum", "cap_gap_sum")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    assert(got == exp)
    // the op does real pairing work: captions exist, and the corpus has media
    assert(got.values.map(_._1).sum > 0 && got.values.map(_._6).sum > 0)
  }

  test("quality classifier: hashed linear inference matches direct recomputation; both labels occur") {
    import graft.text.Curation
    def h60s(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    val raw = Dedup.docs(spark, sf).select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._2 != null)
    val exp = raw.flatMap { case (id, t) =>
      val ws = t.toLowerCase.split(' ').filter(_.nonEmpty)
      if (ws.isEmpty) None else {
        val score = ws.map { w =>
          val b = h60s(w) % Curation.QcBuckets
          h60s(s"qw:$b") % 2001 - 1000
        }.sum
        val spt = Math.floorDiv(score, ws.length.toLong)
        Some(id -> ((ws.length.toLong, score, spt, if (score >= 0) 1L else 0L)))
      }
    }.toMap
    val got = Curation.qualityClassifierQuery(spark, sf)
      .select("doc_id", "n_tokens", "score", "score_per_tok", "label")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == exp)
    // the score genuinely separates: both labels occur in the fixture
    assert(got.values.exists(_._4 == 1L) && got.values.exists(_._4 == 0L))
  }

  test("ann truncate recall + knn classify match direct recomputation") {
    import graft.ann.Ann
    def cosD(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val raw = Ann.emb(spark, sf).select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()
    val vecs = raw.map { case (id, e, _) => id -> e.map(_.toDouble) }.toMap
    val labels = raw.map { case (id, _, l) => id -> l }.toMap
    def top10(q: Long, dims: Int): Seq[Long] =
      vecs.keys.filter(_ != q).toSeq
        .sortBy(id => (-cosD(vecs(q).take(dims), vecs(id).take(dims)), id)).take(10)
    // truncate recall
    val gotTr = Ann.truncateRecallQuery(spark, sf)
      .select("query_id", "n_overlap", "recall_ppm")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    (0L until 20L).foreach { q =>
      val ov = (top10(q, 64).toSet intersect top10(q, 16).toSet).size.toLong
      if (ov == 0L) assert(!gotTr.contains(q))
      else assert(gotTr(q) == ((ov, ov * 1000000L / 10L)), s"query $q")
    }
    // knn classify
    val gotKnn = Ann.knnClassifyQuery(spark, sf)
      .select("query_id", "true_label", "predicted_label", "votes", "correct")
      .as[(Long, Int, Int, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(gotKnn.size == 100)
    (0L until 100L).foreach { q =>
      val votes = top10(q, 64).map(labels).groupBy(identity).map { case (l, xs) => l -> xs.length }
      val (pl, pv) = votes.toSeq.minBy { case (l, v) => (-v, l) }
      assert(gotKnn(q) == ((q, labels(q), pl, pv.toLong, if (labels(q) == pl) 1L else 0L)), s"query $q")
    }
  }

  test("vocab stats: type/token/hapax/top-10 masses match direct recomputation") {
    import graft.text.TextAnalysis
    val out = TextAnalysis.vocabStatsQuery(spark, sf)
      .select("source", "n_types", "n_tokens", "n_hapax", "top10_mass", "ttr_ppm", "top10_ppm", "hapax_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val raw = Dedup.docs(spark, sf).select("source", "text").as[(String, String)].collect()
    val bySrc = raw.groupBy(_._1).map { case (src, docs) =>
      src -> docs.flatMap(d => scalaWords(d._2).filter(_.nonEmpty))
        .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    }
    assert(out.size == bySrc.size)
    bySrc.foreach { case (src, wc) =>
      val nTypes = wc.size.toLong
      val nTokens = wc.values.sum
      val hapax = wc.values.count(_ == 1L).toLong
      val top10 = wc.toSeq.sortBy { case (w, c) => (-c, w) }.take(10).map(_._2).sum
      assert(out(src) == ((src, nTypes, nTokens, hapax, top10,
        nTypes * 1000000L / nTokens, top10 * 1000000L / nTokens, hapax * 1000000L / nTypes)), s"source $src")
    }
  }

  test("dedup agreement: the audit reconciles both pair sets and they genuinely differ") {
    import graft.dedup.Dedup
    val out = Dedup.dedupAgreementQuery(spark, sf)
      .select("a", "b", "lexical", "semantic", "both")
      .as[(Long, Long, Long, Long, Long)].collect()
    val lexSet = Dedup.minhashPairsQuery(spark, sf).where(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val semSet = ann.Ann.cosinePairsQuery(spark, sf, Dedup.SemTau)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(out.length == (lexSet ++ semSet).size)
    out.foreach { case (a, b, l, s, both) =>
      assert(l == (if (lexSet((a, b))) 1L else 0L) && s == (if (semSet((a, b))) 1L else 0L)
        && both == l * s, s"pair ($a, $b)")
    }
    // the two dedup families cut differently — each contributes pairs the other misses
    assert(out.exists(r => r._3 == 1L && r._4 == 0L), "no lexical-only pairs")
    assert(out.exists(r => r._3 == 0L && r._4 == 1L), "no semantic-only pairs")
    // planted exact copies (>= 3 words) always land on the lexical side
    val texts = Dedup.docs(spark, sf).select("doc_id", "text").as[(Long, String)].collect()
    texts.filter { case (id, t) => id % 7 == 0 && scalaWords(t).count(_.nonEmpty) >= 3 }
      .foreach { case (id, _) =>
        assert(lexSet((id, id + 1000000L)), s"planted copy pair ($id, ${id + 1000000L}) missing")
      }
  }

  test("corpus split: hash assignment and rollup match direct recomputation") {
    import graft.text.Curation
    val out = Curation.corpusSplitQuery(spark, sf)
      .select("source", "split", "n_docs", "n_tokens", "n_chars_sum")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val raw = Dedup.docs(spark, sf).select("doc_id", "text", "source", "n_chars")
      .as[(Long, String, String, Long)].collect()
    val expected = raw.groupBy { case (id, _, src, _) =>
      val b = scalaH60(s"split:$id") % 1048576L
      (src, if (b < 1006633L) "train" else if (b < 1027604L) "val" else "test")
    }.map { case (k, rows) =>
      k -> ((rows.length.toLong,
        rows.map(r => scalaWords(r._2).count(_.nonEmpty).toLong).sum,
        rows.map(_._4).sum))
    }
    assert(out == expected)
    // all three splits exist somewhere and doc mass is ~96/2/2
    val bySplit = expected.groupBy(_._1._2).view.mapValues(_.values.map(_._1).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), s"splits seen: ${bySplit.keySet}")
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("bm25: scoring chain and top-5 match direct recomputation") {
    import graft.text.Retrieval
    val out = Retrieval.bm25Query(spark, sf)
      .select("query_id", "rank", "doc_id", "score_q", "n_terms_hit")
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val raw = Dedup.docs(spark, sf).select("doc_id", "text").as[(Long, String)].collect()
    val toks = raw.map { case (id, t) => id -> scalaWords(t).filter(_.nonEmpty) }
    val tf = toks.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => (id, ws.length.toLong, w, g.length.toLong) }
    }
    val nDocs = raw.length.toLong
    val sumDl = toks.map(_._2.length.toLong).sum
    val avgdl = sumDl.toDouble / nDocs.toDouble
    val dfm = tf.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val qterms = tf.filter(_._1 < 5).groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.map(r => (dfm(r._3), r._3)).distinct.sorted.take(3).map(t => (qid, t._2, t._1))
    }
    val scored = qterms.flatMap { case (qid, w, dfw) =>
      val idfQ = (((nDocs - dfw) * 2 + 1) * 1048576L) / (dfw * 2 + 1)
      tf.filter(_._3 == w).map { case (did, dl, _, tfv) =>
        val x = idfQ.toDouble * (tfv.toDouble * 2.2 /
          (tfv.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))
        ((qid, did), math.floor(0.031415926535897934 + x).toLong)
      }
    }.groupBy(_._1).map { case (k, vs) => (k._1, k._2, vs.map(_._2).sum, vs.length.toLong) }
    val expected = scored.groupBy(_._1).flatMap { case (qid, rows) =>
      rows.toSeq.sortBy(r => (-r._3, r._2)).take(5).zipWithIndex
        .map { case (r, i) => (qid, i + 1) -> ((r._2, r._3, r._4)) }
    }
    assert(out == expected)
  }

  private def scalaShingleHashes(raw: Seq[(String, String)]): Seq[(String, Long)] =
    raw.flatMap { case (src, t) =>
      val ws = scalaWords(t)
      if (ws.length < 3) Seq.empty
      else ws.sliding(3).map(g => src -> scalaH60(g.mkString(" "))).toSeq
    }

  test("hll distinct: registers, raw sum, and estimate match direct recomputation") {
    import graft.sketch.Sketches
    val out = Sketches.hllDistinctQuery(spark, sf)
      .select("source", "n_exact", "n_zero_regs", "raw_scaled", "est", "err_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val raw = Dedup.docs(spark, sf).select("source", "text").as[(String, String)].collect()
    val hashes = scalaShingleHashes(raw.toIndexedSeq)
    val expected = hashes.groupBy(_._1).map { case (src, hs) =>
      val regs = Array.fill(64)(0L)
      hs.foreach { case (_, h) =>
        val j = (h % 64).toInt; val w = h / 64
        val rho = if (w == 0) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(j)) regs(j) = rho
      }
      val rawScaled = regs.map(m => 1L << (56 - m)).sum
      val nZero = regs.count(_ == 0L).toLong
      val est = math.floor(Sketches.HllAlphaC / rawScaled.toDouble).toLong
      val nExact = hs.map(_._2).distinct.length.toLong
      src -> ((nExact, nZero, rawScaled, est, math.abs(est - nExact) * 1000000L / nExact))
    }
    assert(out == expected)
    // statistical sanity: m=64 stderr is ~13%; every source within 5 sigma
    out.values.foreach { case (_, _, _, _, errPpm) =>
      assert(errPpm < 650000L, s"HLL error $errPpm ppm beyond 5x stderr")
    }
  }

  test("source overlap: signatures, match counts, and exact jaccard match recomputation") {
    import graft.sketch.Sketches
    val out = Sketches.sourceOverlapQuery(spark, sf)
      .select("src_a", "src_b", "n_match", "jacc_est_ppm", "n_inter", "n_union", "jacc_exact_ppm")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    val raw = Dedup.docs(spark, sf).select("source", "text").as[(String, String)].collect()
    val hashes = scalaShingleHashes(raw.toIndexedSeq)
    val sets = hashes.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sigs = sets.map { case (src, hs) =>
      src -> Array.tabulate(Sketches.Slots) { k =>
        hs.iterator.map { h =>
          ((h >>> 30) * Sketches.MixA(k) + (h & 0x3FFFFFFFL) * Sketches.MixB(k) +
            Sketches.MixC(k)) & graft.exprs.Kernels.MinhashMask
        }.min
      }
    }
    val srcs = sets.keys.toSeq.sorted
    val expected = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      a = srcs(i); b = srcs(j)
    } yield {
      val nMatch = (0 until Sketches.Slots).count(k => sigs(a)(k) == sigs(b)(k)).toLong
      val inter = (sets(a) & sets(b)).size.toLong
      val union = sets(a).size.toLong + sets(b).size.toLong - inter
      (a, b) -> ((nMatch, nMatch * 1000000L / 64L, inter, union, inter * 1000000L / union))
    }).toMap
    assert(out == expected)
    // the estimate tracks the exact jaccard: corpus-wide mean absolute error
    // within the 64-slot binomial band (stderr ~ sqrt(J(1-J)/64) <= 62500 ppm)
    val mae = expected.values.map(v => math.abs(v._2 - v._5)).sum / expected.size
    assert(mae < 125000L, s"minhash overlap MAE $mae ppm out of band")
  }

  private def scalaMix(h: Long, k: Int): Long = {
    import graft.sketch.Sketches.{MixA, MixB, MixC}
    ((h >>> 30) * MixA(k) + (h & 0x3FFFFFFFL) * MixB(k) + MixC(k)) &
      graft.exprs.Kernels.MinhashMask
  }

  test("count-min heavy hitters: table, estimates, and overestimate invariant match") {
    import graft.sketch.Sketches
    val out = Sketches.heavyHittersQuery(spark, sf)
      .select("w", "rk", "c_exact", "c_est", "overestimate")
      .as[(String, Int, Long, Long, Long)].collect()
    val raw = Dedup.docs(spark, sf).select("text").as[String].collect()
    val wc = raw.flatMap(t => scalaWords(t).filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val buckets = (w: String, r: Int) => (scalaMix(scalaH60(w), r) % Sketches.CmWidth).toInt
    val cms = Array.ofDim[Long](Sketches.CmDepth, Sketches.CmWidth)
    wc.foreach { case (w, c) => (0 until Sketches.CmDepth).foreach(r => cms(r)(buckets(w, r)) += c) }
    val est = wc.map { case (w, c) =>
      w -> ((c, (0 until Sketches.CmDepth).map(r => cms(r)(buckets(w, r))).min))
    }
    val expected = est.toSeq.sortBy { case (w, (c, _)) => (-c, w) }.take(20).zipWithIndex
      .map { case ((w, (c, e)), i) => (w, i + 1, c, e, e - c) }.toSet
    assert(out.toSet == expected)
    // CMS never underestimates
    out.foreach { case (w, _, _, _, over) => assert(over >= 0L, s"word $w underestimated") }
    // with 31 words in 4x32 buckets, min-over-depth recovers at least one exact count
    assert(out.exists(_._5 == 0L), "no word recovered exactly — sketch wiring suspect")
  }

  test("token quantiles: histogram rank rule matches a direct sorted percentile") {
    import graft.sketch.Sketches
    val out = Sketches.quantileTokensQuery(spark, sf)
      .select("source", "q", "v", "n_docs")
      .as[(String, Int, Int, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val raw = Dedup.docs(spark, sf).select("source", "text").as[(String, String)].collect()
    val bySrc = raw.groupBy(_._1).view
      .mapValues(_.map(r => scalaWords(r._2).count(_.nonEmpty)).sorted).toMap
    val expected = (for {
      (src, dls) <- bySrc; q <- Seq(50, 90, 99)
    } yield {
      // smallest v with cum(v) * 100 >= q * n == the element at 0-based index
      // ceil(q * n / 100) - 1 of the sorted list
      val idx = (q * dls.length + 99) / 100 - 1
      (src, q) -> ((dls(idx), dls.length.toLong))
    }).toMap
    assert(out == expected)
  }

  test("bloom membership: filters, probes, and the no-false-negative invariant match") {
    import graft.sketch.Sketches
    val out = Sketches.bloomMembershipQuery(spark, sf)
      .select("source", "n_probes", "n_member", "n_pass", "n_false_pos", "n_false_neg", "fp_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    val raw = Dedup.docs(spark, sf).select("source", "text").as[(String, String)].collect()
    val sets = scalaShingleHashes(raw.toIndexedSeq).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val posOf = (h: Long, i: Int) => (scalaMix(h, i + 4) % Sketches.BloomBits).toInt
    val filters = sets.map { case (src, hs) =>
      val bits = new java.util.BitSet(Sketches.BloomBits)
      hs.foreach(h => (0 until Sketches.BloomK).foreach(i => bits.set(posOf(h, i))))
      src -> bits
    }
    val probes = sets("src0")
    val expected = sets.keys.map { tgt =>
      val f = filters(tgt)
      val results = probes.toSeq.map { h =>
        val pass = (0 until Sketches.BloomK).forall(i => f.get(posOf(h, i)))
        val member = sets(tgt)(h)
        (pass, member)
      }
      val nPass = results.count(_._1).toLong
      val nMember = results.count(_._2).toLong
      val nFp = results.count(r => r._1 && !r._2).toLong
      val nFn = results.count(r => !r._1 && r._2).toLong
      tgt -> ((probes.size.toLong, nMember, nPass, nFp, nFn, nFp * 1000000L / probes.size))
    }.toMap
    assert(out == expected)
    // a Bloom filter never false-negatives
    out.foreach { case (src, (_, _, _, _, fn, _)) => assert(fn == 0L, s"false negative vs $src") }
    // self-probe: every src0 shingle is a member of src0's own filter
    assert(out("src0")._2 == out("src0")._1 && out("src0")._5 == 0L)
  }

  test("as-of join: window implementation equals a direct per-user temporal scan") {
    import graft.streaming.Events
    val out = Events.asofJoinQuery(spark, sf)
      .select("purchase_id", "user_id", "purchase_ts_us", "click_id", "click_ts_us", "gap_us")
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    // determinism precondition for the DuckDB ASOF oracle: no two clicks of one
    // user share a timestamp
    val clicks = ev.filter(_._4 == "click")
    assert(clicks.groupBy(c => (c._2, c._3)).forall(_._2.length == 1),
      "fixture grew (user, ts) click ties — ASOF oracle would be nondeterministic")
    val clicksByUser = clicks.groupBy(_._2).view.mapValues(_.sortBy(_._3)).toMap
    val expected = ev.filter(_._4 == "purchase").map { case (pid, uid, ts, _) =>
      val prior = clicksByUser.getOrElse(uid, Array.empty[(Long, Long, Long, String)])
        .filter(_._3 <= ts)
      val best = if (prior.isEmpty) None else Some(prior.maxBy(c => (c._3, c._1)))
      pid -> ((uid, ts, best.map(_._1), best.map(_._3), best.map(b => ts - b._3)))
    }.toMap
    assert(out == expected)
    // both match shapes occur on the fixture
    assert(out.values.exists(_._3.isEmpty), "no unmatched purchase (left semantics untested)")
    assert(out.values.exists(_._3.nonEmpty), "no matched purchase")
  }

  test("stream-stream range join (left outer, watermarked) equals the batch pairs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    import graft.streaming.Events
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp"), col("event_type"))
      .as[(Long, Long, Timestamp, String)].collect()
    val clicks = ev.filter(_._4 == "click").map(e => (e._1, e._2, e._3))
    val purchases = ev.filter(_._4 == "purchase").map(e => (e._1, e._2, e._3))
    val far = new Timestamp(ev.map(_._3.getTime).max + 24L * 3600 * 1000)
    val sentinel = Seq((-1L, 999999L, far))

    implicit val sqlCtx = spark.sqlContext
    val inC = MemoryStream[(Long, Long, Timestamp)]
    val inP = MemoryStream[(Long, Long, Timestamp)]
    val q = Events.streamingRangeJoin(
        inC.toDF().toDF("event_id", "user_id", "ts"),
        inP.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.outputMode("append").format("memory").queryName("rj_out").start()
    // two event-time-ordered halves per side, then sentinels to push the
    // watermark past every purchase's window so unmatched LEFT rows emit
    val (c1, c2) = clicks.sortBy(_._3.getTime).splitAt(clicks.length / 2)
    val (p1, p2) = purchases.sortBy(_._3.getTime).splitAt(purchases.length / 2)
    inC.addData(c1.toIndexedSeq); inP.addData(p1.toIndexedSeq); q.processAllAvailable()
    inC.addData(c2.toIndexedSeq); inP.addData(p2.toIndexedSeq); q.processAllAvailable()
    inC.addData(sentinel); inP.addData(sentinel); q.processAllAvailable()
    inC.addData(sentinel.map(s => (-2L, s._2, s._3))); inP.addData(sentinel.map(s => (-2L, s._2, s._3)))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("rj_out").where(col("user_id") =!= 999999L)
      .select("purchase_id", "user_id", "purchase_ts_us", "click_id", "click_ts_us")
    val batchC = clicks.toSeq.toDF("event_id", "user_id", "ts")
      .withColumn("ts_us", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
    val batchP = purchases.toSeq.toDF("event_id", "user_id", "ts")
      .withColumn("ts_us", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
    val expected = Events.rangeJoinPairs(batchC, batchP)
    assert(streamed.exceptAll(expected).count() == 0,
      streamed.exceptAll(expected).take(3).mkString(","))
    assert(expected.exceptAll(streamed).count() == 0,
      expected.exceptAll(streamed).take(3).mkString(","))
    // both outer shapes occur: matched pairs and watermark-closed unmatched purchases
    val rows = expected.collect()
    assert(rows.exists(_.isNullAt(3)) && rows.exists(!_.isNullAt(3)))
  }

  test("pagerank: fixed-point iterate equals a direct 8-round recomputation") {
    val out = Dedup.pagerankQuery(spark, sf)
      .select("doc_id", "deg", "pr_q").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val Scale = 1099511627776L
    val pairs = Dedup.minhashPairsQuery(spark, sf).where(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val outEdges = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = outEdges.keys.toSeq.sorted
    val n = nodes.length.toLong
    var r = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to 8) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      nodes.foreach { u =>
        val share = r(u) / outEdges(u).length
        outEdges(u).foreach(v => contrib(v) += share)
      }
      r = nodes.map(u => u -> ((15L * Scale) / (100L * n) + (85L * contrib(u)) / 100L)).toMap
    }
    val expected = nodes.map(u => u -> ((outEdges(u).length.toLong, r(u)))).toMap
    assert(out == expected)
    // every node keeps at least the damping floor of rank mass
    val floor = (15L * Scale) / (100L * n)
    out.values.foreach { case (_, pr) => assert(pr >= floor) }
  }

  test("new pipeline ops are partition-invariant (shuffle-partition count cannot change results)") {
    // the class of bug this pins: any logic that accidentally depends on row
    // co-location (a Misra-Gries-style sketch, a non-commutative fold) changes
    // output when the shuffle fan-out changes; every shipped op must not
    val queries: Seq[(String, () => Array[String])] = Seq(
      ("bm25", () => graft.text.Retrieval.bm25Query(spark, sf).collect().map(_.toString).sorted),
      ("hll", () => graft.sketch.Sketches.hllDistinctQuery(spark, sf).collect().map(_.toString).sorted),
      ("cms", () => graft.sketch.Sketches.heavyHittersQuery(spark, sf).collect().map(_.toString).sorted),
      ("asof", () => graft.streaming.Events.asofJoinQuery(spark, sf).collect().map(_.toString).sorted),
      ("pagerank", () => Dedup.pagerankQuery(spark, sf).collect().map(_.toString).sorted),
      ("range_join", () => graft.streaming.Events.rangeJoinQuery(spark, sf).collect().map(_.toString).sorted),
      ("corpus_split", () => graft.text.Curation.corpusSplitQuery(spark, sf).collect().map(_.toString).sorted),
      ("line_dedup", () => graft.text.Curation.lineDedupQuery(spark, sf).collect().map(_.toString).sorted),
      ("quality_classifier", () => graft.text.Curation.qualityClassifierQuery(spark, sf).collect().map(_.toString).sorted),
      ("source_overlap", () => graft.sketch.Sketches.sourceOverlapQuery(spark, sf).collect().map(_.toString).sorted),
      ("ivfpq", () => graft.ann.Ann.ivfPqTopKQuery(spark, sf).collect().map(_.toString).sorted),
      ("data_card", () => graft.text.Curation.dataCardQuery(spark, sf).collect().map(_.toString).sorted),
      ("spatial_knn", () => graft.geom.Spatial.spatialKnnQuery(spark, sf).collect().map(_.toString).sorted),
      ("cell_compact", () => graft.geom.Spatial.cellCompactQuery(spark, sf).collect().map(_.toString).sorted),
      ("zonal_stats", () => graft.geom.Spatial.zonalStatsQuery(spark, sf).collect().map(_.toString).sorted),
      ("lineage_manifest", () => graft.lineage.Checkpoint.lineageManifestQuery(spark, sf).collect().map(_.toString).sorted),
      ("within_dist", () => graft.geom.Spatial.withinDistQuery(spark, sf).collect().map(_.toString).sorted),
      ("footprint_intersects", () => graft.geom.Spatial.footprintIntersectsQuery(spark, sf).collect().map(_.toString).sorted),
      ("track_cells", () => graft.geom.Spatial.trackCellsQuery(spark, sf).collect().map(_.toString).sorted),
      ("polyfill", () => graft.geom.Spatial.polyfillQuery(spark, sf).collect().map(_.toString).sorted),
      ("union_area", () => graft.geom.Spatial.unionAreaQuery(spark, sf).collect().map(_.toString).sorted),
      ("dbscan", () => graft.geom.Dbscan.dbscanQuery(spark, sf, 100L).collect().map(_.toString).sorted),
      ("shoelace", () => graft.geom.Spatial.shoelaceQuery(spark, sf).collect().map(_.toString).sorted),
      ("zorder", () => graft.geom.Spatial.zorderQuery(spark, sf).collect().map(_.toString).sorted),
      ("hilbert", () => graft.geom.Spatial.hilbertQuery(spark, sf).collect().map(_.toString).sorted),
      ("spatial_partition", () => graft.geom.Spatial.spatialPartitionQuery(spark, sf).collect().map(_.toString).sorted),
      ("clip_area", () => graft.geom.Spatial.clipAreaQuery(spark, sf).collect().map(_.toString).sorted),
      ("zonal_area", () => graft.geom.Spatial.zonalAreaQuery(spark, sf).collect().map(_.toString).sorted),
      ("span_align", () => graft.ops.Spans.spanAlignQuery(spark, sf).collect().map(_.toString).sorted),
      ("simplify", () => graft.geom.Spatial.simplifyQuery(spark, sf).collect().map(_.toString).sorted),
      ("vector_tiles", () => graft.geom.Spatial.vectorTilesQuery(spark, sf).collect().map(_.toString).sorted),
      ("snap_track", () => graft.geom.Spatial.snapTrackQuery(spark, sf).collect().map(_.toString).sorted),
      ("snapshot_diff", () => graft.lineage.Checkpoint.snapshotDiffQuery(spark, sf).collect().map(_.toString).sorted),
      ("cdc_merge", () => graft.lineage.Checkpoint.cdcMergeQuery(spark, sf).collect().map(_.toString).sorted),
      ("triangles", () => graft.geom.Spatial.trianglesQuery(spark, sf).collect().map(_.toString).sorted),
      ("bucketed_join", () => graft.sources.Formats.bucketedJoinQuery(spark, sf).collect().map(_.toString).sorted),
      ("cell_buffer", () => graft.geom.Spatial.cellBufferQuery(spark, sf).collect().map(_.toString).sorted),
      ("geofence", () => graft.geom.Geofence.geofenceQuery(spark, sf).collect().map(_.toString).sorted),
      ("heatmap", () => graft.geom.Heatmap.heatmapQuery(spark, sf).collect().map(_.toString).sorted),
      ("coverage_gap", () => graft.geom.Spatial.coverageGapQuery(spark, sf).collect().map(_.toString).sorted),
      ("tile_pyramid", () => graft.geom.Heatmap.tilePyramidQuery(spark, sf).collect().map(_.toString).sorted),
      ("spatial_card", () => graft.geom.Heatmap.spatialCardQuery(spark, sf).collect().map(_.toString).sorted),
      ("convex_hull", () => graft.geom.Analytics.convexHullQuery(spark, sf).collect().map(_.toString).sorted),
      ("idw", () => graft.geom.Analytics.idwQuery(spark, sf).collect().map(_.toString).sorted),
      ("moran", () => graft.geom.Analytics.moranQuery(spark, sf).collect().map(_.toString).sorted),
      ("kcore", () => graft.geom.GraphOps.kcoreQuery(spark, sf).collect().map(_.toString).sorted),
      ("bfs_hops", () => graft.geom.GraphOps.bfsHopsQuery(spark, sf).collect().map(_.toString).sorted),
      ("stratified_sample", () => graft.text.Curation.stratifiedSampleQuery(spark, sf).collect().map(_.toString).sorted),
      ("compaction_plan", () => graft.lineage.Checkpoint.compactionPlanQuery(spark, sf).collect().map(_.toString).sorted),
      ("sssp", () => graft.geom.GraphOps.ssspQuery(spark, sf).collect().map(_.toString).sorted),
      ("knn_join", () => graft.geom.Analytics.knnJoinQuery(spark, sf).collect().map(_.toString).sorted),
      ("gi_star", () => graft.geom.Analytics.giStarQuery(spark, sf).collect().map(_.toString).sorted),
      ("calibration_dispatch", () => graft.ops.Calibration.dispatchQuery(spark, sf).collect().map(_.toString).sorted),
      ("chain_tops_coreg", () => graft.graph.ChainGraph.topsCoregQuery(spark, sf).collect().map(_.toString).sorted),
      ("chain_e2e", () => graft.graph.ChainGraph.e2eChainQuery(spark, sf).collect().map(_.toString).sorted),
      ("chain_insar", () => graft.graph.ChainGraph.insarChainQuery(spark, sf).collect().map(_.toString).sorted),
      ("chain_grd", () => graft.graph.ChainGraph.grdChainQuery(spark, sf).collect().map(_.toString).sorted),
      ("chain_dinsar", () => graft.graph.ChainGraph.dinsarChainQuery(spark, sf).collect().map(_.toString).sorted),
      ("chain_tc", () => graft.graph.ChainGraph.tcChainQuery(spark, sf).collect().map(_.toString).sorted),
      ("chain_goldstein", () => graft.graph.ChainGraph.goldsteinChainQuery(spark, sf).collect().map(_.toString).sorted),
      ("chain_grd_stream", () => graft.graph.ChainGraph.grdStreamQuery(spark, sf).collect().map(_.toString).sorted),
      ("chain_deburst", () => graft.graph.ChainGraph.deburstChainQuery(spark, sf).collect().map(_.toString).sorted),
      ("chain_dinsar_stream", () => graft.graph.ChainGraph.dinsarStreamQuery(spark, sf).collect().map(_.toString).sorted),
      ("chain_subset", () => graft.graph.ChainGraph.subsetChainQuery(spark, sf).collect().map(_.toString).sorted))
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    try {
      val results = Seq("3", "13").map { parts =>
        conf.set("spark.sql.shuffle.partitions", parts)
        queries.map { case (n, f) => n -> f() }.toMap
      }
      queries.foreach { case (n, _) =>
        assert(results(0)(n).sameElements(results(1)(n)), s"$n varies with shuffle partitions")
        assert(results(0)(n).nonEmpty, s"$n empty")
      }
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }

  test("ivf-pq (IVFADC): cell restriction and ADC ranks match a direct recomputation") {
    import graft.ann.Ann
    val out = Ann.ivfPqTopKQuery(spark, sf)
      .select("query_id", "rank", "neighbor_id", "adist_q")
      .as[(Long, Int, Long, Long)].collect()
    val vecs = Ann.emb(spark, sf).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap.view.mapValues(_.map(_.toDouble)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (a.indices).foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = (0L until Ann.IvfCells.toLong).map(c => c -> vecs(c)).toMap
    def cellsOf(v: Array[Double], n: Int): Seq[Long] =
      cents.toSeq.map { case (c, cv) => (c, cos(v, cv)) }
        .sortBy { case (c, s) => (-s, c) }.take(n).map(_._1)
    val assign = vecs.map { case (id, v) => id -> cellsOf(v, 1).head }
    // codebook: subspace s codeword c = dims [s*8, s*8+8) of vec c (c < 16)
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def sub(v: Array[Double], s: Int): Array[Double] = v.slice(s * 8, s * 8 + 8)
    val codes = vecs.map { case (id, v) =>
      id -> Array.tabulate(8) { s =>
        (0 until Ann.PqK).minBy(c => (l2(sub(v, s), sub(vecs(c.toLong), s)), c))
      }
    }
    val expected = (0L until 20L).flatMap { q =>
      val probed = cellsOf(vecs(q), Ann.IvfNProbe).toSet
      val cand = vecs.keys.filter(n => n != q && probed(assign(n)))
      val scored = cand.map { n =>
        val ad = (0 until 8).map(s => l2(sub(vecs(q), s), sub(vecs(codes(n)(s).toLong), s))).sum
        (n, ad)
      }.toSeq.sortBy { case (n, ad) => (ad, n) }.take(10)
      scored.zipWithIndex.map { case ((n, ad), i) =>
        (q, i + 1, n, math.floor(0.031415926535897934 + ad * 1.0e6).toLong)
      }
    }.toSet
    assert(out.toSet == expected)
  }

  test("eval pr: per-label precision/recall reconciles with the raw kNN predictions") {
    import graft.ann.Ann
    val out = Ann.evalPrQuery(spark, sf)
      .select("label", "n_true", "n_pred", "tp", "fp", "fn", "precision_ppm", "recall_ppm")
      .as[(Int, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    val knn = Ann.knnClassifyQuery(spark, sf)
      .select("true_label", "predicted_label").as[(Int, Int)].collect()
    val labels = (knn.map(_._1) ++ knn.map(_._2)).distinct
    val expected = labels.map { l =>
      val nTrue = knn.count(_._1 == l).toLong
      val nPred = knn.count(_._2 == l).toLong
      val tp = knn.count(r => r._1 == l && r._2 == l).toLong
      l -> ((nTrue, nPred, tp, nPred - tp, nTrue - tp,
        if (nPred == 0) 0L else tp * 1000000L / nPred,
        if (nTrue == 0) 0L else tp * 1000000L / nTrue))
    }.toMap
    assert(out == expected)
  }

  test("source formats: JSON and CSV round trips preserve every row bit-for-bit") {
    import graft.sources.Formats
    val out = Formats.roundTripQuery(spark, sf)
      .select("fmt", "n_rows", "checksum").as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set("parquet", "json", "csv"))
    val n = Dedup.docs(spark, sf).count()
    assert(out("parquet")._1 == n)
    assert(out("json") == out("parquet"), "JSON round trip altered content")
    assert(out("csv") == out("parquet"), "CSV round trip altered content")
  }

  test("data card: every metric row reconciles with its standalone derivation") {
    import graft.text.Curation
    import graft.sketch.Sketches
    val card = Curation.dataCardQuery(spark, sf)
      .select("source", "metric", "value_q").as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val raw = Dedup.docs(spark, sf)
      .select("source", "lang", "n_chars", "text")
      .as[(String, String, Long, String)].collect()
    val bySrc = raw.groupBy(_._1)
    assert(card.size == bySrc.size * 10, s"expected 10 metrics x ${bySrc.size} sources")
    bySrc.foreach { case (src, rows) =>
      val toks = rows.map(r => scalaWords(r._4).count(_.nonEmpty).toLong)
      assert(card((src, "n_docs")) == rows.length.toLong)
      assert(card((src, "n_tokens")) == toks.sum)
      assert(card((src, "n_chars")) == rows.map(_._3).sum)
      assert(card((src, "n_en_docs")) == rows.count(_._2 == "en").toLong)
      assert(card((src, "n_langs")) == rows.map(_._2).distinct.length.toLong)
      assert(card((src, "avg_tokens")) == toks.sum / rows.length)
    }
    val hll = Sketches.hllDistinctQuery(spark, sf)
      .select("source", "n_exact", "est").as[(String, Long, Long)].collect()
    hll.foreach { case (src, exact, est) =>
      assert(card((src, "distinct_shingles")) == exact && card((src, "hll_est_shingles")) == est)
    }
    val qs = Sketches.quantileTokensQuery(spark, sf)
      .where(col("q").isin(50, 90))
      .select("source", "q", "v").as[(String, Int, Int)].collect()
    qs.foreach { case (src, q, v) => assert(card((src, s"p${q}_tokens")) == v.toLong) }
  }

  test("streaming HLL (mapGroupsWithState) converges to the batch register rollup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.HllStream
    // the real fixture events, replayed through a MemoryStream in 3 micro-batches
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type", "user_id").as[(String, Long)].collect()
    val chunks = events.grouped(math.max(1, events.length / 3 + 1)).toSeq
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val src = in.toDF().toDF("event_type", "user_id").as[HllStream.EvIn]
    val q = HllStream.streaming(src)
      .writeStream.outputMode("update").format("memory").queryName("hll_out").start()
    chunks.foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    // registers only grow, so raw_scaled is non-increasing and est non-decreasing:
    // the final state per key is the min/max across the per-batch emissions
    val streamed = spark.table("hll_out")
      .groupBy("event_type")
      .agg(min("raw_scaled").as("raw_scaled"), max("est").as("est"),
        min("n_zero_regs").as("n_zero_regs"))
      .select("event_type", "raw_scaled", "est", "n_zero_regs")
      .as[(String, Long, Long, Long)].collect().toSet
    val batch = HllStream.batch(spark, sf)
      .map(o => (o.event_type, o.raw_scaled, o.est, o.n_zero_regs)).collect().toSet
    assert(streamed == batch)
    // and the per-key state stayed bounded: one 64-register row per event type
    assert(streamed.size == events.map(_._1).distinct.length)
  }
}
