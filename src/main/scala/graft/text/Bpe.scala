package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * BPE tokenizer TRAINING on the corpus itself — the canonical preprocessing
 * step the ceil(len/4) piece estimator (tokenCountQuery) stands in for. This
 * is the map-reduce formulation of Sennrich-style BPE:
 *
 *  1. vocab frame = distinct words with corpus counts (the training corpus
 *     compressed to its word histogram — at 10^12 docs this is the ~10^7-row
 *     frame BPE trainers actually operate on, never the token stream);
 *  2. each round: count adjacent symbol pairs weighted by word count, take
 *     the argmax pair (ties: count desc, then pair lexicographic — fully
 *     deterministic), fuse every greedy left-to-right occurrence;
 *  3. apply: a word's segmentation depends only on the word, so the corpus
 *     application is a broadcast join of per-word piece counts back onto the
 *     token stream.
 *
 * Greedy fuse without a sequential scan (both engines share this DECLARATIVE
 * formulation): a candidate position can only be adjacent to another candidate
 * when the pair is a doubled symbol (a == b) — for (a != b) the next symbol
 * after a match starts with b != a and cannot match. So greedy left-to-right
 * = "pick all candidates" when a != b, and "pick odd ranks within each run of
 * consecutive candidates" when a == b (run = consecutive symbol indexes,
 * rank via row_number). All integer/window arithmetic — the DuckDB twin is
 * exact, including tie-breaks.
 *
 * Fixed `Rounds` merges (no early stop) so the unrolled oracle stays in
 * lockstep; the fixture corpus has far more than Rounds productive pairs.
 */
object Bpe {

  val Rounds = 8

  import graft.dedup.Dedup.docs

  /** (word, wc) corpus word histogram. */
  private def wordCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(expr("filter(split(lower(text), ' '), w -> w != '')")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))

  /** Initial symbol frame: (w, wc, pos, sym) — one row per character. */
  private def initialSymbols(wc: DataFrame): DataFrame =
    wc.select(col("w"), col("wc"),
        posexplode(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
          .as(Seq("pos", "sym")))

  /** One training round: returns (bestPair row, fused symbol frame). */
  private def round(syms: DataFrame): (org.apache.spark.sql.Row, DataFrame) = {
    val wWin = Window.partitionBy("w").orderBy("pos")
    val withNext = syms
      .withColumn("idx", row_number().over(wWin))
      .withColumn("nxt", lead("sym", 1).over(wWin))
    val pairs = withNext.where(col("nxt").isNotNull)
      .groupBy(col("sym").as("a"), col("nxt").as("b"))
      .agg(sum("wc").as("cnt"))
    val best = pairs.orderBy(desc("cnt"), asc("a"), asc("b")).limit(1).collect()(0)
    val (a, b) = (best.getString(0), best.getString(1))
    val cand = withNext
      .withColumn("is_cand", col("sym") === lit(a) && col("nxt") === lit(b))
    // run-parity pick: for a == b, odd rank within each run of consecutive
    // candidate idx; for a != b candidates are never idx-adjacent, so the same
    // formula picks all of them (each is its own run).
    val candWin = Window.partitionBy("w", "is_cand").orderBy("idx")
    val picked = cand
      .withColumn("grp", when(col("is_cand"), col("idx") - row_number().over(candWin)))
      .withColumn("crank", when(col("is_cand"),
        row_number().over(Window.partitionBy("w", "grp").orderBy("idx"))))
      .withColumn("picked", col("is_cand") && col("crank") % 2 === 1)
    val fused = picked
      .withColumn("prev_picked",
        coalesce(lag("picked", 1).over(wWin), lit(false)))
      .where(!col("prev_picked"))
      .select(col("w"), col("wc"), col("pos"),
        when(col("picked"), concat(col("sym"), lit(b))).otherwise(col("sym")).as("sym"))
    (best, fused.localCheckpoint())
  }

  /** Learned merge table: (round, sym_a, sym_b, pair_count). */
  def mergesQuery(spark: SparkSession, dir: String): DataFrame = {
    var syms = initialSymbols(wordCounts(spark, dir)).localCheckpoint()
    val rows = (1 to Rounds).map { r =>
      val (best, next) = round(syms)
      syms = next
      (r, best.getString(0), best.getString(1), best.getLong(2))
    }
    import spark.implicits._
    rows.toDF("round", "sym_a", "sym_b", "pair_count")
  }

  /** Per-doc token counts under the trained tokenizer: the real-BPE
   * replacement for the ceil(len/4) estimator, plus the estimator for
   * comparison. The per-word piece table is broadcast back onto the stream. */
  def tokensQuery(spark: SparkSession, dir: String): DataFrame = {
    var syms = initialSymbols(wordCounts(spark, dir)).localCheckpoint()
    (1 to Rounds).foreach { _ => syms = round(syms)._2 }
    val piecesPerWord = syms.groupBy("w").agg(count(lit(1)).as("pieces"))
    docs(spark, dir)
      .select(col("doc_id"),
        explode(expr("filter(split(lower(text), ' '), w -> w != '')")).as("w"))
      .join(broadcast(piecesPerWord), Seq("w"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum("pieces").as("n_bpe_tokens"),
        sum(expr("CAST(ceil(length(w) / 4.0) AS BIGINT)")).as("n_est_tokens"))
  }
}
