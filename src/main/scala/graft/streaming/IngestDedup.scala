package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming ingestion dedup — the streaming complement of the append
 * path's `(stream, uuid)` conflict check ([[graft.append.Appender]],
 * reference PK `backend.go:48`): when events arrive as an unbounded
 * stream (at-least-once transports redeliver), drop redeliveries before
 * they reach the log.
 *
 * Scale: `dropDuplicatesWithinWatermark` keeps one state row per key
 * only until the watermark passes its event time — state is bounded by
 * (arrival rate × lateness horizon), independent of log length. Plain
 * `dropDuplicates` on a stream would grow state forever; the watermarked
 * form is the only shape that survives an unbounded 100 TB ingest. The
 * contract is correspondingly bounded: a duplicate arriving after the
 * watermark has expired its original is re-admitted (exactly the
 * at-least-once window any bounded-state dedup has).
 */
object IngestDedup {

  /** Deduplicate a streaming event source on `(stream, uuid)` within the
    * watermark lateness horizon. */
  def dedupByUuid(src: DataFrame, eventTime: Column, withinWatermark: String): DataFrame =
    src
      .withColumn("event_time", eventTime)
      .withWatermark("event_time", withinWatermark)
      .dropDuplicatesWithinWatermark("stream", "uuid")

  /** Content-based variant: deduplicate on the codegen'd polynomial hash
    * of a payload column — catches *re-submitted identical content* under
    * fresh uuids (the streaming analogue of [[graft.dedup.Dedup.exact]]).
    * State is one 8-byte key per distinct document within the horizon. */
  def dedupByContent(src: DataFrame, payload: Column, eventTime: Column,
                     withinWatermark: String): DataFrame =
    src
      .withColumn("content_fp", call_function("graft_polyhash", payload))
      .withColumn("event_time", eventTime)
      .withWatermark("event_time", withinWatermark)
      .dropDuplicatesWithinWatermark("content_fp")
}
