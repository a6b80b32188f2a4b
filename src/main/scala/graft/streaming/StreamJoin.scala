package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Stream-stream event-time correlation — join two live subscriptions on
 * a key with a bounded time horizon (e.g. "view within 10s of the click
 * on the same stream"). The canonical Structured Streaming interval
 * join: both sides carry watermarks, and the time-range condition is
 * what lets Spark expire join state.
 *
 * Scale: state is bounded by (arrival rate × (horizon + lateness)) per
 * side — the range condition plus watermarks give the engine a provable
 * expiry bound, so neither side's history accumulates. Both inputs
 * shuffle on the join key once; matches emit eagerly (inner join), state
 * cleanup follows the watermark.
 */
object StreamJoin {

  /**
   * Inner-join `left` and `right` rows with equal keys where
   * `rightTime ∈ [leftTime, leftTime + horizon]`. Key columns must be
   * distinctly named on the two sides (rename before calling); the
   * event-time columns are exposed as `l_time` / `r_time`.
   */
  def within(left: DataFrame, leftTime: Column, leftKey: String,
             right: DataFrame, rightTime: Column, rightKey: String,
             horizon: String, lateness: String): DataFrame = {
    val l = left.withColumn("l_time", leftTime).withWatermark("l_time", lateness)
    val r = right.withColumn("r_time", rightTime).withWatermark("r_time", lateness)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col("r_time") >= col("l_time") &&
        col("r_time") <= col("l_time") + expr(s"interval $horizon"))
  }
}
