package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row: a (group, hash-rank, value) observation. */
final case class QIn(g: String, h: Long, v: Double)

/** One quantile panel row for group `g` as of `ver` (= rows absorbed). */
final case class QPanel(g: String, n_sample: Long, p25: Double, p50: Double,
                        p90: Double, ver: Long)

/**
 * Incremental per-group sampled quantiles — the streaming twin of the
 * `graft_bottomk`-backed `agg_sampled_quantiles` gate: keyed state
 * holds each group's bottom-k-by-hash sample (the SAME deterministic
 * summary the batch aggregate computes — a pure function of the rows
 * seen, independent of micro-batch boundaries), and every batch
 * re-emits the touched groups' current p25/p50/p90.
 *
 * State per group is k (hash, value) pairs — bounded, no watermark
 * needed (sample updates are idempotent-ish set operations: re-seeing
 * a hash keeps the smaller value, the batch sketch's tie rule).
 * Because the sample is partitioning- AND batching-independent, the
 * final streaming panel equals the batch query exactly
 * (`StreamingSpec` pins it) — not a property reservoir sampling or
 * t-digest state could offer.
 */
object StreamingQuantiles {

  private implicit val inEnc: Encoder[QIn] = Encoders.product[QIn]
  private implicit val outEnc: Encoder[QPanel] = Encoders.product[QPanel]
  private implicit val keyEnc: Encoder[String] = Encoders.STRING
  private implicit val stateEnc: Encoder[(Map[Long, Double], Long)] =
    Encoders.kryo[(Map[Long, Double], Long)]

  /** rows(g, h, v) → Update-mode quantile panels per touched group. */
  def panels(rows: DataFrame, k: Int): Dataset[QPanel] = {
    rows.select(col("g"), col("h"), col("v")).as[QIn]
      .groupByKey(_.g)
      .flatMapGroupsWithState[(Map[Long, Double], Long), QPanel](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[QIn], state: GroupState[(Map[Long, Double], Long)]) =>
          val (sample0, seen0) = state.getOption.getOrElse((Map.empty[Long, Double], 0L))
          var sample = sample0
          var seen = seen0
          it.foreach { r =>
            seen += 1
            val cur = sample.get(r.h)
            // same fold as BottomKSketch: smallest value per hash, keep
            // the k smallest hashes
            if (cur.isEmpty || r.v < cur.get) {
              sample = sample.updated(r.h, r.v)
              if (sample.size > k) sample = sample - sample.keysIterator.max
            }
          }
          state.update((sample, seen))
          val vs = sample.valuesIterator.toArray.sorted
          val n = vs.length
          def at(idx: Int): Double = vs(math.max(idx, 1) - 1)
          // empty sample (reachable only if a timeout / empty-group
          // invocation is ever introduced): no panel rather than vs(0)
          if (n == 0) Iterator.empty
          else Iterator.single(QPanel(g, n.toLong,
            at((n + 3) / 4), at((n + 1) / 2), at((9 * n + 9) / 10), seen))
      }
  }
}
