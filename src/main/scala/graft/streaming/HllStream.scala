package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Streaming HyperLogLog: incremental distinct-user cardinality per event type,
 * the stateful twin of the batch gate q_hll_users
 * ([[graft.sketch.Sketches.hllUsersQuery]]).
 *
 * State per key is the raw 64-register array — a few hundred bytes per event
 * type regardless of stream length, the textbook bounded-state sketch. Every
 * micro-batch folds its events into the registers (max is commutative +
 * idempotent, so replays and reorderings cannot corrupt the state) and emits
 * the refreshed estimate; the spec drives a MemoryStream in multiple batches
 * and asserts the final emission equals the batch rollup register-for-register.
 *
 * The user hash is the same md5-based h60 of 'u:' || user_id the batch leg
 * computes in SQL, evaluated here on the JVM — PipelineSpec already pins the
 * jvm-vs-SQL h60 equivalence.
 */
object HllStream {

  case class EvIn(event_type: String, user_id: Long)
  case class HllOut(event_type: String, raw_scaled: Long, est: Long, n_zero_regs: Long)

  def h60Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.substring(0, 15), 16)
  }

  /** Fold one user hash into the register array (mutates). */
  def foldHash(regs: Array[Long], h: Long): Unit = {
    val j = (h % 64).toInt
    val w = h / 64
    val rho = if (w == 0L) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > regs(j)) regs(j) = rho
  }

  def outOf(key: String, regs: Array[Long]): HllOut = {
    val raw = regs.map(m => 1L << (56 - m)).sum
    HllOut(key, raw,
      math.floor(graft.sketch.Sketches.HllAlphaC / raw.toDouble).toLong,
      regs.count(_ == 0L).toLong)
  }

  private def update(key: String, events: Iterator[EvIn],
      state: GroupState[Array[Long]]): HllOut = {
    val regs = state.getOption.getOrElse(Array.fill(64)(0L))
    events.foreach(e => foldHash(regs, h60Jvm("u:" + e.user_id)))
    state.update(regs)
    outOf(key, regs)
  }

  /** The streaming transform: one updated estimate row per key per micro-batch. */
  def streaming(events: Dataset[EvIn]): Dataset[HllOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update _)
  }

  /** Batch reference with the same output shape (for the equality spec). */
  def batch(spark: SparkSession, dir: String): Dataset[HllOut] = {
    import spark.implicits._
    graft.sketch.Sketches.hllUsersQuery(spark, dir)
      .selectExpr("event_type", "raw_scaled", "est", "n_zero_regs")
      .as[HllOut]
  }
}
