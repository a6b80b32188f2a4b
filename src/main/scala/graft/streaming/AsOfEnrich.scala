package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming AS-OF enrichment — the live twin of the batch
 * [[graft.plans.AsOfJoinExec]] operator (`join_asof_native`): as events
 * flow, every `emitType` event is enriched with the latest PRIOR
 * `matchType` event of the same stream (strictly earlier position).
 *
 * Shape: `groupByKey(stream)` → `flatMapGroupsWithState`; state is ONE
 * small row per stream (the latest match seen so far) — bounded by
 * stream cardinality, never history length — and each micro-batch folds
 * its group slice in position order, so matches and emissions interleave
 * exactly as the batch operator's per-partition merge does. A match in
 * one micro-batch enriches emissions in every later one (state carries
 * across batches); replays with stale positions cannot regress the state
 * (monotone guard, same contract as [[Materialize.latestByStream]]).
 *
 * `StreamingSpec` pins the streamed output equal to the batch
 * `join_asof_native` result over the same prefix of the log, including
 * across a multi-batch split.
 */
object AsOfEnrich {

  final case class Enriched(position: Long, stream: String,
                            last_match_pos: Long, match_value_x1000: Long)

  /** Canonical input row (encoder-visible). */
  final case class Ev(stream: String, position: Long,
                      event_type: String, value_x1000: Long)

  /** Per-stream state: the latest match seen so far (encoder-visible). */
  final case class MatchState(position: Long, value_x1000: Long)

  /** Enrich `emitType` events with the latest strictly-prior `matchType`
    * event of the same stream. Unmatched emissions are dropped (inner
    * as-of), matching the `join_asof` gate semantics. */
  def latestPriorMatch(src: DataFrame, matchType: String, emitType: String): Dataset[Enriched] = {
    val spark = src.sparkSession
    import spark.implicits._
    src.select(col("stream"), col("position"), col("event_type"),
        floor(col("value") * lit(1000.0)).cast("long").as("value_x1000"))
      .as[Ev]
      .groupByKey(_.stream)
      .flatMapGroupsWithState[MatchState, Enriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (stream: String, it: Iterator[Ev], state: GroupState[MatchState]) =>
          var cur = state.getOption.orNull
          val out = Seq.newBuilder[Enriched]
          // a micro-batch's group slice is bounded (backpressure contract);
          // the position sort makes the fold order-exact like the batch merge
          for (e <- it.toArray.sortBy(_.position)) {
            if (e.event_type == emitType && cur != null && cur.position < e.position)
              out += Enriched(e.position, stream, cur.position, cur.value_x1000)
            if (e.event_type == matchType && (cur == null || e.position > cur.position))
              cur = MatchState(e.position, e.value_x1000)
          }
          if (cur != null) state.update(cur)
          out.result().iterator
      }
  }
}
