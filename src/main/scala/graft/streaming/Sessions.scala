package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * User sessionization over the events stream: a session is a maximal run of one
 * user's events with no inactivity gap exceeding [[Sessions.GapUs]]. The reference
 * engine is batch-only (SURVEY.md §2.10); this is the training-pipeline analog of
 * its stack/temporal grouping, in both execution modes:
 *
 *  - BATCH (gate q_events_sessions): gap flags via lag() + running-sum session
 *    index — two narrow window passes over one user_id shuffle; at 100 TB the
 *    shuffle is the events table keyed by user, embarrassingly parallel per user.
 *  - STREAMING: the same semantics as incremental state — one open session per
 *    user in [[GroupState]], gap-splits emitted immediately, the final session
 *    emitted when the event-time watermark passes last_ts + gap
 *    (flatMapGroupsWithState + EventTimeTimeout). PipelineSpec drives it through
 *    a MemoryStream and asserts equality with the batch transform.
 *
 * Values are fixed-point cents (round(value*100)) so sums are integer-exact and
 * order-independent across engines and modes.
 */
object Sessions {

  /** 30-minute inactivity gap, in microseconds. */
  val GapUs: Long = 30L * 60 * 1000000

  /** `ts` carries the watermark tag through to the stateful operator (the
   * event-time timeout checker requires a watermarked column in its input). */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long, value_c: Long)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, sumC: Long)
  case class SessionOut(user_id: Long, start_us: Long, duration_us: Long,
      n_events: Long, value_sum_c: Long)

  /** Batch sessionization with a per-user session ordinal (ties broken by event_id). */
  def batchSessions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("value_c"))
      .withColumn("new_s",
        when(lag("ts_us", 1).over(byUser).isNull ||
          col("ts_us") - lag("ts_us", 1).over(byUser) > GapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum("new_s").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(min("ts_us").as("start_us"),
        (max("ts_us") - min("ts_us")).as("duration_us"),
        count(lit(1)).as("n_events"),
        sum("value_c").as("value_sum_c"))
  }

  def batchQuery(spark: SparkSession, dir: String): DataFrame =
    batchSessions(spark.read.parquet(s"$dir/events.parquet"))

  /** Streaming sessionization: one open session per user in state; sessions closed
   * by an in-stream gap emit immediately, the trailing session emits when the
   * watermark passes last_ts + gap. Late rows older than the open session's last
   * event fold into it conservatively (the watermark bounds their lateness). */
  def streamingSessions(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), col("ts"), expr("unix_micros(ts)").as("ts_us"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("value_c"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.startUs, s.lastUs - s.startUs, s.n, s.sumC))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts_us)
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            for (e <- sorted) {
              open match {
                case Some(s) if e.ts_us - s.lastUs > GapUs =>
                  closed += SessionOut(uid, s.startUs, s.lastUs - s.startUs, s.n, s.sumC)
                  open = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value_c))
                case Some(s) =>
                  // a late-but-in-watermark event older than the open session's
                  // start must also pull start_us back, or batch/stream outputs
                  // diverge on out-of-order input (ADVICE r3)
                  open = Some(OpenSession(math.min(s.startUs, e.ts_us),
                    math.max(s.lastUs, e.ts_us), s.n + 1, s.sumC + e.value_c))
                case None =>
                  open = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value_c))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastUs + GapUs) / 1000 + 1)
            }
            closed.result().iterator
          }
      }
  }
}
