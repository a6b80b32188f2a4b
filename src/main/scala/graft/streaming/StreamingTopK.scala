package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One top-k entry for `stream` as of version `ver` (= total events the
  * stream has absorbed — monotone, so consumers keep the max-ver rows). */
final case class TopKEntry(stream: String, event_type: String, n: Long, rk: Long, ver: Long)

/** Input row of [[StreamingTopK.topTypes]] (top-level so the encoder's
  * generated projection can reach the class). */
final case class TopKIn(stream: String, event_type: String)

/**
 * Incremental per-stream top-k event types — the streaming counterpart
 * of the `graft_topk_by` heap aggregate (`top_types_per_stream_heap`):
 * keyed state holds each stream's per-type counts and every micro-batch
 * re-emits that stream's current top-k, so the "most frequent types per
 * stream" panel is servable after every batch instead of per batch scan.
 *
 * State is one map per stream bounded by the TYPE VOCABULARY (5 here —
 * the reference's event-type domain; an unbounded tag domain would cap
 * the map with a Misra-Gries summary, trading the exact counts for a
 * bounded-error guarantee at the same state size). Only streams touched
 * by a micro-batch recompute; emission is Update-mode (the latest `ver`
 * per stream supersedes earlier emissions).
 *
 * The same fold runs on a batch frame (one "micro-batch" per group), so
 * `StreamingSpec` pins streaming-final == batch-heap exactly.
 */
object StreamingTopK {

  private implicit val inEnc: Encoder[TopKIn] = Encoders.product[TopKIn]
  private implicit val outEnc: Encoder[TopKEntry] = Encoders.product[TopKEntry]
  private implicit val keyEnc: Encoder[String] = Encoders.STRING
  private implicit val stateEnc: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  /** events(stream, event_type) → Update-mode top-k entries per touched
    * stream. Works on streaming and batch frames alike. */
  def topTypes(events: DataFrame, k: Int): Dataset[TopKEntry] = {
    events.select(col("stream"), col("event_type")).as[TopKIn]
      .groupByKey(_.stream)
      .flatMapGroupsWithState[Map[String, Long], TopKEntry](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (stream: String, rows: Iterator[TopKIn], state: GroupState[Map[String, Long]]) =>
          val cur = state.getOption.getOrElse(Map.empty[String, Long])
          val upd = rows.foldLeft(cur) { (m, r) =>
            m.updated(r.event_type, m.getOrElse(r.event_type, 0L) + 1L)
          }
          state.update(upd)
          val ver = upd.valuesIterator.sum
          upd.toSeq
            .sortBy { case (t, n) => (-n, t) } // n DESC, tag ASC — the heap's rank order
            .take(k)
            .zipWithIndex
            .map { case ((t, n), i) => TopKEntry(stream, t, n, i + 1L, ver) }
            .iterator
      }
  }
}
