package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row: population label + uniformized element hash. */
final case class KmvIn(pop: String, h: Long)

/** Population `pop`'s current k-minimum-values sketch after absorbing
  * `ver` rows (monotone — consumers keep the max-ver row per pop). */
final case class KmvRow(pop: String, kmv: Seq[Long], ver: Long)

/**
 * Incremental per-population KMV distinct sketches — the streaming twin
 * of the `graft_kmv` aggregate ([[graft.plans.KmvSketch]]) and the
 * `agg_kmv_setops` audience-overlap gate: keyed state holds each
 * population's k smallest distinct hashes (the SAME deterministic
 * summary the batch aggregate computes — a pure function of the hash
 * set seen, independent of micro-batch boundaries and arrival order),
 * and every micro-batch re-emits the touched populations' current
 * sketch.
 *
 * The set-op panel (union/intersection/Jaccard estimates between two
 * live populations) is then the identical declarative arithmetic the
 * batch gate runs — `AnalyticsQueries.kmvSetopsPanel` over the two
 * 64-long arrays — so the live audience-overlap dashboard needs no
 * exact distinct-intersection shuffle, and `StreamingSpec` pins
 * streaming-final == batch EXACTLY (determinism HLL state could not
 * offer). State per population is k longs; no watermark needed.
 */
object StreamingKmv {

  private implicit val inEnc: Encoder[KmvIn] = Encoders.product[KmvIn]
  private implicit val outEnc: Encoder[KmvRow] = Encoders.product[KmvRow]
  private implicit val keyEnc: Encoder[String] = Encoders.STRING
  private implicit val stateEnc: Encoder[(Vector[Long], Long)] =
    Encoders.kryo[(Vector[Long], Long)]

  /** rows(pop, h) → Update-mode sketch rows per touched population. */
  def sketches(rows: DataFrame, k: Int): Dataset[KmvRow] = {
    rows.select(col("pop"), col("h")).as[KmvIn]
      .groupByKey(_.pop)
      .flatMapGroupsWithState[(Vector[Long], Long), KmvRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (pop: String, it: Iterator[KmvIn], state: GroupState[(Vector[Long], Long)]) =>
          val (cur, seen0) = state.getOption.getOrElse((Vector.empty[Long], 0L))
          // same fold as KmvSketch: k smallest DISTINCT hashes
          var set = scala.collection.immutable.SortedSet.empty[Long] ++ cur
          var seen = seen0
          it.foreach { r =>
            seen += 1
            set += r.h
            if (set.size > k) set -= set.last
          }
          state.update((set.toVector, seen))
          Iterator.single(KmvRow(pop, set.toVector, seen))
      }
  }
}
