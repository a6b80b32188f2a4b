package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-time windowed aggregation over the event log — the canonical
 * Structured Streaming windowed count with a watermark. Not part of the
 * reference's surface (its subscriptions are arrival-ordered), but the
 * natural Spark-native capability a log analytics engine exposes: per
 * (stream, event-time window) volumes that stay correct under
 * out-of-order arrival, with bounded state.
 *
 * Scale: streaming state is one row per open (window, stream) pair; the
 * watermark expires windows so state size is bounded by (streams ×
 * windows inside the lateness horizon), independent of log length. The
 * same expression tree runs batch (no watermark) for backfills —
 * one shuffle, map-side partial counts.
 */
object EventTimeStats {

  /**
   * Per-(stream, window) event counts. On a streaming DataFrame, rows
   * later than `watermark` behind the max seen event time are dropped and
   * closed windows are finalized (Append) / stop updating (Update); on a
   * batch DataFrame the watermark is a no-op and this is a plain windowed
   * aggregation (backfill path).
   */
  def eventsPerWindow(src: DataFrame, eventTime: Column, windowDur: String,
                      watermark: String): DataFrame =
    src
      .withColumn("event_time", eventTime)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDur), col("stream"))
      .agg(count(lit(1)).as("n"))

  /**
   * Sliding-window variant: each event lands in `windowDur / slideDur`
   * overlapping windows (starts aligned to the slide). Same state/
   * watermark behaviour as the tumbling form — state rows per open
   * (window, stream), expired by the watermark; the window explosion is
   * map-side (one row per covering window before the shuffle).
   */
  def eventsPerSlidingWindow(src: DataFrame, eventTime: Column, windowDur: String,
                             slideDur: String, watermark: String): DataFrame =
    src
      .withColumn("event_time", eventTime)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDur, slideDur), col("stream"))
      .agg(count(lit(1)).as("n"))
}
