package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row: scope label (one sketch per scope) + tag observation. */
final case class HhIn(scope: String, tag: String)

/** Scope `scope`'s current Misra–Gries summary after absorbing `ver`
  * rows: `tags`/`lower_bounds` are parallel arrays, counts descending,
  * ties by tag (the batch aggregate's output order). */
final case class HhRow(scope: String, tags: Seq[String], lower_bounds: Seq[Long], ver: Long)

/**
 * Incremental Misra–Gries heavy-hitters summary — the streaming twin of
 * `graft_heavy_hitters` ([[graft.plans.HeavyHittersSketch]]): keyed
 * state holds ≤ k counters per scope over an UNBOUNDED tag domain, each
 * micro-batch folds its rows through the same update/decrement step and
 * re-emits the touched scopes' current summary.
 *
 * Counts are merge-order-dependent (here: arrival-order), so — exactly
 * like the batch side — the pinned property is the GUARANTEE, not the
 * counts: after any batching, every tag with true count > n/(k+1) is
 * present and every reported count is a lower bound within n/(k+1)
 * (`StreamingSpec` replays the fixture's tag stream in micro-batches
 * and checks the contract against exact counts, the same probe the
 * `text_heavy_hitters` gate oracles in batch).
 *
 * State per scope is ≤ k (tag, count) pairs — bounded regardless of
 * vocabulary size; no watermark needed.
 */
object StreamingHeavyHitters {

  private implicit val inEnc: Encoder[HhIn] = Encoders.product[HhIn]
  private implicit val outEnc: Encoder[HhRow] = Encoders.product[HhRow]
  private implicit val keyEnc: Encoder[String] = Encoders.STRING
  private implicit val stateEnc: Encoder[(Map[String, Long], Long)] =
    Encoders.kryo[(Map[String, Long], Long)]

  /** rows(scope, tag) → Update-mode summary rows per touched scope. */
  def summaries(rows: DataFrame, k: Int): Dataset[HhRow] = {
    rows.select(col("scope"), col("tag")).as[HhIn]
      .groupByKey(_.scope)
      .flatMapGroupsWithState[(Map[String, Long], Long), HhRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (scope: String, it: Iterator[HhIn], state: GroupState[(Map[String, Long], Long)]) =>
          var (m, seen) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
          it.foreach { r =>
            seen += 1
            val prev = m.getOrElse(r.tag, 0L)
            if (prev > 0L) m = m.updated(r.tag, prev + 1L)
            else {
              m = m.updated(r.tag, 1L)
              if (m.size > k) {
                // MG decrement: subtract the (k+1)-th largest count,
                // drop non-positives (same step as the batch sketch)
                val dec = m.valuesIterator.toArray.sorted.apply(m.size - (k + 1))
                m = m.flatMap { case (t, n) =>
                  val nv = n - dec; if (nv <= 0) None else Some(t -> nv)
                }
              }
            }
          }
          state.update((m, seen))
          val ordered = m.toSeq.sortBy { case (t, n) => (-n, t) }
          Iterator.single(HhRow(scope, ordered.map(_._1), ordered.map(_._2), seen))
      }
  }
}
