package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Continuously-maintained read models over a streaming event log — the
 * streaming complement of the batch snapshot/compaction query
 * (`snapshot_latest` in [[graft.queries.RelationalQueries]]).
 *
 * [[latestByStream]] keeps, per stream, the event with the highest
 * position seen so far and emits the updated snapshot row whenever it
 * advances — an upsert changelog a sink can merge into a serving store
 * (the "current state" table every event-sourced read model wants).
 *
 * Scale design: state is ONE small row per stream — bounded by stream
 * cardinality, not log length — partitioned by the stream key like every
 * other stateful op here; a micro-batch emits at most one row per stream
 * it touched, so the changelog volume tracks update activity, not log
 * volume. No watermark is needed (the state never grows per event), and
 * out-of-order replays are absorbed: a row with a lower position than
 * the current snapshot is a no-op.
 */
object Materialize {

  /** One snapshot row: the newest event's coordinates for a stream. */
  final case class SnapshotRow(stream: String, position: Long, revision: Long, event_type: String)

  /** Upsert changelog of the latest-event-per-stream snapshot. Attach a
    * sink in Update mode; replay-safe (monotone position guard). */
  def latestByStream(src: DataFrame): Dataset[SnapshotRow] = {
    val spark = src.sparkSession
    import spark.implicits._
    src.select(col("stream"), col("position"), col("revision"), col("event_type"))
      .as[SnapshotRow]
      .groupByKey(_.stream)
      .flatMapGroupsWithState[SnapshotRow, SnapshotRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[SnapshotRow], state: GroupState[SnapshotRow]) =>
          val before = state.getOption
          val newest = it.foldLeft(before) {
            case (Some(b), e) if b.position >= e.position => Some(b)
            case (_, e)                                   => Some(e)
          }
          newest match {
            case Some(n) if before.forall(_.position < n.position) =>
              state.update(n)
              Iterator.single(n)
            case _ => Iterator.empty // batch only contained stale replays
          }
      }
  }
}
