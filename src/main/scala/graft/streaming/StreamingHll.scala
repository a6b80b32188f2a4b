package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row: population label + uniformized element hash on [0, 2^31). */
final case class HllIn(pop: String, h: Long)

/** Population `pop`'s full register vector (index = bucket, value = max
  * rho, 0 = empty) after absorbing `ver` rows (monotone — consumers
  * keep the max-ver row per pop). */
final case class HllRow(pop: String, regs: Seq[Long], ver: Long)

/**
 * Incremental per-population HLL register state — the streaming twin of
 * [[graft.plans.Hll]] and the `agg_hll_distinct` gate. Keyed state is
 * the register vector itself (2^p slots of max-rho), updated with the
 * IDENTICAL bucket/rho fold the batch groupBy-max computes; registers
 * are a pure function of the hash set seen — arrival order and
 * micro-batch boundaries cannot move them — so `StreamingSpec` pins the
 * streaming-final estimate == the batch gate EXACTLY (the same
 * determinism contract as [[StreamingKmv]], which the library-internal
 * datasketches state could not make).
 *
 * 100 TB story: this is the canonical bounded streaming distinct —
 * state per population is FIXED at 2^p small integers regardless of
 * stream length (no watermark, no growing distinct set), updates are
 * O(1) per event, and the emitted register vector is the same storable
 * artifact the batch rollup merges by max, so live and nightly paths
 * share one representation.
 */
object StreamingHll {

  private implicit val inEnc: Encoder[HllIn] = Encoders.product[HllIn]
  private implicit val outEnc: Encoder[HllRow] = Encoders.product[HllRow]
  private implicit val keyEnc: Encoder[String] = Encoders.STRING
  private implicit val stateEnc: Encoder[(Vector[Long], Long)] =
    Encoders.kryo[(Vector[Long], Long)]

  /** rows(pop, h) → Update-mode register rows per touched population. */
  def registers(rows: DataFrame, p: Int): Dataset[HllRow] = {
    val m = 1 << p
    val maxRho = (32 - p).toLong
    rows.select(col("pop"), col("h")).as[HllIn]
      .groupByKey(_.pop)
      .flatMapGroupsWithState[(Vector[Long], Long), HllRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (pop: String, it: Iterator[HllIn], state: GroupState[(Vector[Long], Long)]) =>
          val (cur, seen0) = state.getOption.getOrElse((Vector.fill(m)(0L), 0L))
          val regs = cur.toArray
          var seen = seen0
          it.foreach { r =>
            seen += 1
            val bucket = (r.h % m).toInt
            val suffix = r.h / m
            val rho =
              if (suffix == 0) maxRho
              else maxRho - java.lang.Long.toBinaryString(suffix).length
            if (rho > regs(bucket)) regs(bucket) = rho
          }
          state.update((regs.toVector, seen))
          Iterator.single(HllRow(pop, regs.toVector, seen))
      }
  }
}
