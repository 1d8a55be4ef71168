package graft.sketch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/**
 * Distributed sketch operators over the `documents` corpus — the cardinality /
 * set-overlap estimators a 100 TB pipeline runs where exact distinct counts or
 * pairwise set intersections would be a full-shuffle job:
 *
 *  - HyperLogLog distinct-shingle estimation per source (m = 64 registers).
 *    At scale the register frame is (n_sources x 64) rows produced by one
 *    map-side-combined groupBy max — the raw item stream never shuffles more
 *    than its (source, register) partial maxima. The exact countDistinct
 *    column next to it is the fixture-scale audit (itself scalable: one
 *    hash-keyed distinct).
 *  - Source-level MinHash signatures (64 slots from ONE md5 per shingle via
 *    the exact integer universal-hash family shared with doc-level MinHash in
 *    [[graft.exprs.Kernels.minhash16]]) and the pairwise Jaccard matrix
 *    between sources they estimate. Exact intersection/union per pair ride
 *    along as the audit columns; at 10^4 sources the signature frame is
 *    (n_sources x 64) rows and the pair matrix never touches the corpus.
 *
 * Everything is integer arithmetic except the single final HLL division
 * (alpha * m^2 * 2^56 / raw_scaled) — one correctly-rounded IEEE op on a
 * bit-identical BIGINT, so the DuckDB twin is bit-exact. The HLL small-range
 * linear-counting correction (E <= 2.5m with empty registers) is deliberately
 * omitted: it needs ln(), and per-source fixture cardinality (~900 distinct
 * shingles) sits far above the m=64 correction band; documented here and in
 * the gate.
 */
object Sketches {

  val Registers = 64 // HLL m
  val Slots = 64 // source-level minhash slots

  /** alpha_64 * m^2 * 2^56 as one double literal (computed once, the identical
   * decimal rendering is inlined into the DuckDB twin). */
  val HllAlphaC: Double =
    (0.7213 / (1.0 + 1.079 / Registers)) * Registers * Registers * math.pow(2.0, 56.0)

  /** The 64-slot universal-hash family: same generator formulas as
   * Kernels.MinhashA/B/C but tabulated to 64 (every intermediate < 2^62). */
  val MixA: Array[Long] = Array.tabulate(Slots)(k => ((2654435761L * (2 * k + 1)) & 0x3FFFFFFEL) | 1L)
  val MixB: Array[Long] = Array.tabulate(Slots)(k => ((2246822519L * (2 * k + 3)) & 0x3FFFFFFEL) | 1L)
  val MixC: Array[Long] = Array.tabulate(Slots)(k => (1181783497276652981L * (k + 1)) & graft.exprs.Kernels.MinhashMask)

  /** (source, h) 60-bit shingle-hash stream (not distinct — HLL max is idempotent). */
  private def sourceShingleHashes(spark: SparkSession, dir: String): DataFrame =
    Dedup.withShingles(Dedup.docs(spark, dir).select("source", "text"))
      .select(col("source"), explode(col("shingles")).as("g"))
      .withColumn("h", expr(Dedup.h60("g")))
      .select("source", "h")

  /**
   * q_hll_distinct: per-source HLL cardinality estimate vs the exact distinct
   * shingle-hash count. Register index = h % 64; rank = leading zeros of the
   * remaining 54-bit word + 1 (w = 0 -> 55), i.e. 55 - floorlog2(w) via the
   * engine-shared `length(bin(w))` idiom. raw_scaled = sum(2^(56 - M_j)) is an
   * exact BIGINT (max 64 * 2^56 = 2^62), so the only float op is the final
   * alpha-division.
   */
  def hllDistinctQuery(spark: SparkSession, dir: String): DataFrame =
    hllRollup(sourceShingleHashes(spark, dir), "source")

  /** The generic HLL rollup over a (key, h) frame: registers -> raw harmonic
   * sum (exact BIGINT) -> estimate + exact-distinct audit. Shared by the
   * per-source shingle gate, the per-event-type user gate, and the streaming
   * twin's batch reference. */
  def hllRollup(h: DataFrame, key: String): DataFrame = {
    val regs = h
      .select(col(key),
        expr("CAST(h % 64 AS INT)").as("j"),
        expr("h div 64").as("wv"))
      .withColumn("rho", expr("IF(wv = 0, 55, 55 - length(bin(wv)))"))
      .groupBy(key, "j").agg(max("rho").as("mj"))
    val filled = h.select(key).distinct()
      .select(col(key), explode(expr("sequence(0, 63)")).as("j"))
      .join(regs, Seq(key, "j"), "left")
      .withColumn("mj", coalesce(col("mj"), lit(0)))
    val raw = filled.groupBy(key).agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), 56 - mj)")).as("raw_scaled"),
      sum(expr("CAST(mj = 0 AS BIGINT)")).as("n_zero_regs"))
    val exact = h.groupBy(key).agg(countDistinct(col("h")).as("n_exact"))
    raw.join(exact, Seq(key))
      // HllAlphaC ~ 2.09E20: Double.toString already carries the exponent, so
      // the literal parses as DOUBLE (not DECIMAL) in both engines as-is.
      .withColumn("est", expr(
        s"CAST(floor($HllAlphaC / CAST(raw_scaled AS DOUBLE)) AS BIGINT)"))
      .select(col(key), col("n_exact"), col("n_zero_regs"), col("raw_scaled"),
        col("est"),
        expr("(abs(est - n_exact) * 1000000) div n_exact").as("err_ppm"))
  }

  /**
   * q_hll_users: distinct users per event type by the same 64-register HLL —
   * the streaming-native cardinality every event pipeline tracks. The batch
   * leg is this gate; [[graft.streaming.HllStream]] runs the identical
   * register semantics incrementally in mapGroupsWithState, and the spec
   * pins stream register-state == this batch rollup.
   */
  def hllUsersQuery(spark: SparkSession, dir: String): DataFrame =
    hllRollup(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type"),
          expr(Dedup.h60("concat('u:', CAST(user_id AS STRING))")).as("h")),
      "event_type")

  /** Per-source 64-slot MinHash signature rows (source, k, mh). */
  def sourceSignatures(spark: SparkSession, dir: String): DataFrame = {
    val mc = {
      import spark.implicits._
      (0 until Slots).map(k => (k, MixA(k), MixB(k), MixC(k))).toDF("k", "ma", "mb", "mct")
    }
    sourceShingleHashes(spark, dir)
      .crossJoin(broadcast(mc))
      .withColumn("v", expr(
        s"(shiftright(h, 30) * ma + (h & 1073741823) * mb + mct) & ${graft.exprs.Kernels.MinhashMask}"))
      .groupBy("source", "k").agg(min("v").as("mh"))
  }

  /**
   * q_source_overlap: pairwise source-overlap matrix — MinHash slot-agreement
   * estimate (n_match/64 in ppm) next to the exact Jaccard (intersection via
   * one hash-keyed equi-join of the distinct per-source shingle sets). The
   * estimate path is what survives 10^4 sources x 10^12 docs; the exact
   * columns are the audit.
   */
  def sourceOverlapQuery(spark: SparkSession, dir: String): DataFrame = {
    val sig = sourceSignatures(spark, dir)
    val est = sig.select(col("source").as("src_a"), col("k"), col("mh").as("mh_a"))
      .join(sig.select(col("source").as("src_b"), col("k"), col("mh").as("mh_b")), Seq("k"))
      .where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(sum(expr("CAST(mh_a = mh_b AS BIGINT)")).as("n_match"))
      .withColumn("jacc_est_ppm", expr("(n_match * 1000000) div 64"))
    val ds = sourceShingleHashes(spark, dir).distinct()
    val counts = ds.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = ds.select(col("source").as("src_a"), col("h"))
      .join(ds.select(col("source").as("src_b"), col("h")), Seq("h"))
      .where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_inter"))
    est
      .join(counts.select(col("source").as("src_a"), col("n").as("n_a")), Seq("src_a"))
      .join(counts.select(col("source").as("src_b"), col("n").as("n_b")), Seq("src_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("n_union", expr("n_a + n_b - n_inter"))
      .select(col("src_a"), col("src_b"), col("n_match"), col("jacc_est_ppm"),
        col("n_inter"), col("n_union"),
        expr("(n_inter * 1000000) div n_union").as("jacc_exact_ppm"))
  }

  val CmDepth = 4
  val CmWidth = 32 // fixture width: small enough that rows collide, so the
  // min-over-depth recovery is actually exercised; production is 2^20+

  /** Count-Min row hash: mix row r of the universal family, folded to CmWidth. */
  private def cmBucketSql(r: Int): String =
    s"((shiftright(h, 30) * ${MixA(r)} + (h & 1073741823) * ${MixB(r)} + ${MixC(r)}) " +
      s"& ${graft.exprs.Kernels.MinhashMask}) % $CmWidth"

  /**
   * q_heavy_hitters: Count-Min sketch (depth 4 x width 32) over the corpus
   * word counts, audited against the exact counts for the top-20 words. The
   * batch-CMS plan is the scalable one: the token stream reduces to the exact
   * word-count frame first (ONE map-side-combined shuffle — the same wc any
   * pipeline already runs), then the tiny distinct-word frame scatters into
   * the 4 x 32 counter table; estimates = min over the 4 rows. Pure integers;
   * the CMS overestimate-only invariant (est >= exact, equality iff no
   * colliding mass) is pinned in the spec.
   */
  def heavyHittersQuery(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = Dedup.docs(spark, dir).select("text")
      .select(explode(expr("filter(split(lower(text), ' '), w -> w != '')")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_exact"))
      .withColumn("h", expr(Dedup.h60("w")))
    val cms = (0 until CmDepth).map { r =>
      wc.select(lit(r).as("r"), expr(cmBucketSql(r)).as("b"), col("c_exact"))
    }.reduce(_ unionByName _)
      .groupBy("r", "b").agg(sum("c_exact").as("bucket_cnt"))
    val withBuckets = wc.select(
      (col("w") +: col("c_exact") +:
        (0 until CmDepth).map(r => expr(cmBucketSql(r)).as(s"b_$r"))): _*)
    val est = (0 until CmDepth).map { r =>
      withBuckets.select(col("w"), col("c_exact"), lit(r).as("r"), col(s"b_$r").as("b"))
    }.reduce(_ unionByName _)
      .join(cms, Seq("r", "b"))
      .groupBy("w", "c_exact").agg(min("bucket_cnt").as("c_est"))
    // top-K via orderBy + limit — plans as a distributed TakeOrderedAndProject
    // (per-partition top-K, K rows to the driver) instead of the former
    // unpartitioned row_number window, which moved the ENTIRE vocabulary frame
    // to one partition (a 10^7-row serialization point at corpus scale; the
    // WindowExec single-partition warning in every suite run). The (c_exact
    // desc, w asc) key is total — w is the group key — so limit(topK) selects
    // exactly the rows the rank filter kept; the rank is then re-derived by the
    // same window over only the K survivors.
    est
      .orderBy(desc("c_exact"), asc("w")).limit(topK)
      .withColumn("rk", row_number().over(Window.orderBy(desc("c_exact"), asc("w"))))
      .select(col("w"), col("rk"), col("c_exact"), col("c_est"),
        expr("c_est - c_exact").as("overestimate"))
  }

  /**
   * q_quantile_tokens: per-source token-length quantiles (p50/p90/p99) by the
   * distributed value-histogram method — the exact-quantile plan for integer
   * columns at any scale: one (source, dl) histogram shuffle (cardinality =
   * sources x distinct lengths, tiny), a per-source cumulative window over
   * THAT frame only, and the integer cross-multiplied rank rule
   * v_q = min { v : cum(v) * 100 >= q * n } (no float percentile, no sort of
   * the raw data). This is quantile_disc semantics, restated identically in
   * the DuckDB twin.
   */
  def quantileTokensQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dl = Dedup.docs(spark, dir).select(col("source"),
      expr("size(filter(split(lower(text), ' '), w -> w != ''))").as("dl"))
    val hist = dl.groupBy("source", "dl").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("source").orderBy("dl")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = dl.groupBy("source").agg(count(lit(1)).as("n_docs"))
    hist.join(n, Seq("source"))
      .select(col("source"), col("dl"), col("cum"), col("n_docs"),
        explode(expr("array(50, 90, 99)")).as("q"))
      .where(expr("cum * 100 >= q * n_docs"))
      .groupBy("source", "q")
      .agg(min("dl").as("v"), max("n_docs").as("n_docs"))
  }

  val BloomBits = 16384
  val BloomK = 3

  /** Bloom bit position i (i < BloomK) for hash column h: mix rows 4..6. */
  private def bloomPosSql(i: Int): String =
    s"((shiftright(h, 30) * ${MixA(i + 4)} + (h & 1073741823) * ${MixB(i + 4)} + ${MixC(i + 4)}) " +
      s"& ${graft.exprs.Kernels.MinhashMask}) % $BloomBits"

  /**
   * q_bloom_membership: per-source Bloom filter (m = 16384 bits as 512 OR-
   * aggregated 32-bit words — bit 63 of a 64-bit shift overflows DuckDB's
   * signed `<<`, so words stay at 32 bits in both engines — k = 3) over the distinct shingle-hash sets, then
   * the probe pass every pipeline runs: src0's distinct shingles probed
   * against EVERY source's filter, reporting true members, filter passes, and
   * false positives. The filter frame is tiny (sources x 256 words) and
   * broadcasts onto the probe stream — the standard "pre-filter a 100 TB
   * stream against a set" plan where the exact set would not fit. No false
   * negatives ever (every member passes — spec-pinned); FP rate at fixture
   * load (~1400 keys in 16384 bits) is the documented few-percent band.
   */
  def bloomMembershipQuery(spark: SparkSession, dir: String): DataFrame = {
    val ds = sourceShingleHashes(spark, dir).distinct()
    val positions = (0 until BloomK).map { i =>
      ds.select(col("source"), expr(bloomPosSql(i)).as("p"))
    }.reduce(_ unionByName _)
    val filters = positions
      .select(col("source"), expr("CAST(p div 32 AS INT)").as("w_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("m"))
      .groupBy("source", "w_idx").agg(expr("bit_or(m)").as("bits"))
    val probes = ds.where(col("source") === "src0").select(col("h"))
    val probePos = (0 until BloomK).map { i =>
      probes.select(col("h"), expr(bloomPosSql(i)).as("p"))
    }.reduce(_ unionByName _)
      .select(col("h"), expr("CAST(p div 32 AS INT)").as("w_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("m"))
    // every probe position must be tested against every source's filter even
    // when that filter word carries no set bits (absent row = bits 0), so the
    // probe grid is (positions x sources) with the filter LEFT-joined on.
    val srcs = ds.select(col("source").as("tgt")).distinct()
    val tested = probePos
      .crossJoin(broadcast(srcs))
      .join(broadcast(filters.withColumnRenamed("source", "tgt")), Seq("tgt", "w_idx"), "left")
      .withColumn("bits", coalesce(col("bits"), lit(0L)))
      .groupBy("tgt", "h")
      .agg(sum(expr("CAST((bits & m) = m AS BIGINT)")).as("n_bits_set"))
      .withColumn("pass", expr(s"CAST(n_bits_set = $BloomK AS BIGINT)"))
    val truth = ds.select(col("source").as("tgt"), col("h"), lit(1L).as("member"))
    tested.join(truth, Seq("tgt", "h"), "left")
      .withColumn("member", coalesce(col("member"), lit(0L)))
      .groupBy("tgt")
      .agg(count(lit(1)).as("n_probes"),
        sum("member").as("n_member"),
        sum("pass").as("n_pass"),
        sum(expr("CAST(pass = 1 AND member = 0 AS BIGINT)")).as("n_false_pos"),
        sum(expr("CAST(pass = 0 AND member = 1 AS BIGINT)")).as("n_false_neg"))
      .select(col("tgt").as("source"), col("n_probes"), col("n_member"),
        col("n_pass"), col("n_false_pos"), col("n_false_neg"),
        expr("(n_false_pos * 1000000) div n_probes").as("fp_ppm"))
  }
}
