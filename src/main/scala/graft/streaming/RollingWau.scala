package graft.streaming

import org.apache.datasketches.hll.HllSketch
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One unit of rolling-window activity: `stream` was active on some day
  * covered by report day `day`. */
final case class WauUpdate(day: Long, stream: String)

/** Rolling 7-day distinct-streams estimate for report day `day`. */
final case class WauEstimate(day: Long, wau: Long)

/**
 * Rolling 7-day active users (WAU) over per-day HLL sketches — the
 * incremental form of `agg_rolling_wau` (SeriesQueries), which computes the
 * same report with exact `countDistinct`. At 100 TB the exact form re-scans
 * ≤7 days of activity per report day; this form keeps ONE mergeable sketch
 * per report day, so a micro-batch only touches the ≤7 report-day groups
 * each event covers and the estimate is servable after every batch.
 *
 * Design notes:
 *  - the map-side fan-out (each activity day covers report days d..d+6) is
 *    identical to the batch plan — the state key IS the report day, so
 *    "union over the trailing window" becomes plain sketch update, and
 *    state size is bounded by (report days × sketch size), not activity;
 *  - no `distinct` / watermark is needed: HLL updates are idempotent, so
 *    repeated (stream, day) rows cost nothing and the pipeline is purely
 *    append-driven with NoTimeout keyed state;
 *  - batch and streaming share the same fold ([[foldSketch]]), so the spec
 *    pins incremental == batch exactly (same sketch parameters → identical
 *    estimates, not merely within tolerance).
 */
object RollingWau {

  /** Matches spark.sql hll_sketch_agg's default lgConfigK. */
  val LgK = 12

  private implicit val updEnc: Encoder[WauUpdate] = Encoders.product[WauUpdate]
  private implicit val estEnc: Encoder[WauEstimate] = Encoders.product[WauEstimate]
  private implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  private implicit val bytesEnc: Encoder[Array[Byte]] = Encoders.BINARY

  /** events(stream, tsMicros) → fan-out to the ≤7 report days each
    * activity row covers. Works on batch and streaming frames alike. */
  def updates(events: DataFrame, streamCol: String = "stream",
              microsCol: String = "tus"): Dataset[WauUpdate] = {
    events
      .select(col(streamCol).as("stream"),
        expr(s"$microsCol div 86400000000").as("act_day"))
      .select(explode(sequence(col("act_day"), col("act_day") + 6)).as("day"),
        col("stream"))
      .as[WauUpdate]
  }

  /** The shared fold: absorb a batch of updates into the (possibly
    * pre-existing) sketch; returns (serialized sketch, estimate). */
  private def foldSketch(prev: Option[Array[Byte]],
                         rows: Iterator[WauUpdate]): (Array[Byte], Long) = {
    val sk = prev.map(HllSketch.heapify).getOrElse(new HllSketch(LgK))
    rows.foreach(r => sk.update(r.stream))
    (sk.toUpdatableByteArray, math.round(sk.getEstimate))
  }

  /** Batch form: one sketch per report day in a single groupByKey pass. */
  def estimatesBatch(upd: Dataset[WauUpdate]): Dataset[WauEstimate] =
    upd.groupByKey(_.day).mapGroups { (day, rows) =>
      WauEstimate(day, foldSketch(None, rows)._2)
    }

  /** Streaming form: keyed sketch state, an updated estimate emitted for
    * every report day a micro-batch touches (use with OutputMode.Update;
    * estimates are monotone, so "latest per day" is also "max per day"). */
  def estimatesStreaming(upd: Dataset[WauUpdate]): Dataset[WauEstimate] =
    upd.groupByKey(_.day).flatMapGroupsWithState(
      OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
      (day: Long, rows: Iterator[WauUpdate], state: GroupState[Array[Byte]]) =>
        val (bytes, est) = foldSketch(state.getOption, rows)
        state.update(bytes)
        Iterator.single(WauEstimate(day, est))
    }
}
