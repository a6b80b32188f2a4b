package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization over the event log — the classic event-
 * analytics operator the reference's arrival-ordered subscriptions stop
 * short of: group each stream's events into sessions separated by an
 * inactivity gap.
 *
 * Two implementations with the same semantics:
 *
 *  - [[sessions]] — analytic-window formulation over integer µs
 *    (`unix_micros(ts)`; lag → gap flag → running sum → session id). All
 *    arithmetic is exact integer µs, so the DuckDB oracle reproduces it
 *    bit-for-bit; this is the batch/backfill gate path.
 *  - [[sessionsNative]] — Spark's built-in `session_window`, the
 *    streaming-capable form (merging windows + watermark state expiry).
 *    `SessionizeSpec` pins the two equal at µs precision.
 *
 * Scale: both shapes partition by stream — one hash shuffle on the
 * stream key, per-stream local sort inside each partition (no global
 * sort). Streaming state for the native form is one row per open
 * (stream, session) pair, expired by the watermark — bounded by active
 * streams inside the lateness horizon, independent of log length. A
 * skewed stream concentrates its own events on one task, but sessions
 * are per-stream by definition; the window never crosses streams.
 */
object Sessionize {

  /**
   * Exact-arithmetic sessionization: a new session starts at the first
   * event of a stream, and whenever the gap to the stream's previous
   * event is `>= gap` (in the unit of the integer `time` column). Returns
   * one row per (stream, session) with 1-based `session_idx`, event count
   * and start/end bounds named `start_$unit`/`end_$unit`.
   */
  def sessions(events: DataFrame, gap: Long, time: Column, unit: String): DataFrame = {
    // (time, position) orders deterministically even under equal
    // timestamps; explicit ROWS frame so ties cannot widen the running
    // sum (RANGE default would include peer rows)
    val timed = events.withColumn("t", time)
    val w = Window.partitionBy("stream").orderBy(col("t"), col("position"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    timed
      .withColumn("prev_t", lag(col("t"), 1).over(w))
      .withColumn(
        "new_sess",
        when(col("prev_t").isNull || col("t") - col("prev_t") >= gap, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(run))
      .groupBy(col("stream"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("t")).as(s"start_$unit"),
        max(col("t")).as(s"end_$unit"))
  }

  /** ns→µs with exact decimal arithmetic (`long / long` is DOUBLE division
    * in Spark — a half-ULP at ~1.7e18 ns is ~1µs, enough to flip a
    * boundary). Only used by [[graft.log.Fixture.raw]]'s legacy int64-nanos
    * normalization branch; the canonical event log carries `ts` as
    * µs-precision TimestampType, so query code uses `unix_micros(ts)`
    * directly. */
  def microsFromNanos(tsNanos: Column): Column =
    floor(tsNanos.cast("decimal(38,0)") / lit(1000)).cast("long")

  /**
   * Built-in `session_window` formulation: windows merge while events
   * keep arriving within `gap` of the session's moving end. On a
   * streaming DataFrame the watermark finalizes closed sessions and
   * expires their state; on batch it is a plain merging-window
   * aggregation with the same result.
   */
  def sessionsNative(src: DataFrame, eventTime: Column, gap: String,
                     watermark: String = "0 seconds"): DataFrame =
    src
      .withColumn("event_time", eventTime)
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("stream"))
      .agg(count(lit(1)).as("n_events"))
}
