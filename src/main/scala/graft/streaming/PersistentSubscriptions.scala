package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/**
 * Persistent subscriptions — consumer groups with server-side progress,
 * ack/nack and parking. The reference DECLARES this surface but never
 * registers it (`/root/reference/transport/grpc/persistent.proto:8-17`,
 * nack actions park/retry/skip/stop `persistent.proto:53-62`, consumer
 * strategies `persistent.proto:174-178`, SURVEY §2.9); the semantics here
 * follow the proto (EventStoreDB's model), re-expressed batch-first:
 *
 *  - a GROUP subscribes to a stream or `$all` with a start position; its
 *    progress lives server-side (here: a parquet-backed op log per groups
 *    dir, merge-on-read like [[graft.proj.Catalog]]);
 *  - `read(group, consumer, n)` delivers the next unprocessed events for
 *    one consumer under the group's strategy:
 *      `DispatchToSingle` — every event to the single active consumer
 *      (the first registered); `RoundRobin` — events rotate across
 *      consumers by delivery order; `Pinned` — each source stream sticks
 *      to one consumer (hash affinity), preserving per-stream order;
 *  - `ack` marks processed; `nack` applies the proto's actions: `park`
 *    (dead-letter, redeliverable only via [[replayParked]]), `retry`
 *    (redeliver on next read), `skip` (treat as processed);
 *
 * Scale design: the op log is append-only and tiny relative to the event
 * log (one row per consumed event op; compactable to a checkpoint + parked
 * set — noted, not needed at fixture scale). Deliverability is one
 * anti-join of the filtered log scan against the group's latest-op set;
 * the op table is broadcastable after compaction, the log scan stays
 * pushdown-filtered by the subscription's selector/position like any
 * subscription read.
 */
object PersistentSubscriptions {

  sealed trait Strategy { def name: String }
  case object DispatchToSingle extends Strategy { val name = "DispatchToSingle" }
  case object RoundRobin extends Strategy { val name = "RoundRobin" }
  case object Pinned extends Strategy { val name = "Pinned" }

  private def strategyOf(s: String): Strategy = s match {
    case "DispatchToSingle" => DispatchToSingle
    case "RoundRobin"       => RoundRobin
    case "Pinned"           => Pinned
    case other              => throw new IllegalArgumentException(s"unknown strategy '$other'")
  }

  /** Nack actions (persistent.proto:53-62; `stop` is a client-side signal
    * and has no server state). */
  sealed trait NackAction
  case object Park extends NackAction
  case object Retry extends NackAction
  case object Skip extends NackAction

  val groupSchema: StructType = StructType(Seq(
    StructField("group", StringType, nullable = false),
    StructField("stream", StringType, nullable = true), // null = $all
    StructField("from_position", LongType, nullable = false),
    StructField("strategy", StringType, nullable = false),
    StructField("created_at", LongType, nullable = false)
  ))

  // op ∈ acked | parked | skipped | retried | consumer-joined
  val opSchema: StructType = StructType(Seq(
    StructField("group", StringType, nullable = false),
    StructField("position", LongType, nullable = false), // consumer ops: join seq
    StructField("op", StringType, nullable = false),
    StructField("consumer", StringType, nullable = true),
    StructField("at", LongType, nullable = false)
  ))

  private def readOr(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    graft.util.ParquetDirs.readOrEmpty(spark, dir, schema)

  private def groupsDir(dir: String) = s"$dir/groups"
  private def opsDir(dir: String) = s"$dir/ops"

  /** Create a consumer group (proto `Create`). `stream = None` subscribes
    * to `$all`. Fails if the group exists. */
  def create(spark: SparkSession, dir: String, group: String, stream: Option[String],
             fromPosition: Long = 0L, strategy: Strategy = RoundRobin,
             nowNanos: Long = System.nanoTime()): Unit = {
    require(groupInfo(spark, dir, group).isEmpty, s"group '$group' already exists")
    import spark.implicits._
    Seq((group, stream.orNull, fromPosition, strategy.name, nowNanos))
      .toDF("group", "stream", "from_position", "strategy", "created_at")
      .write.mode("append").parquet(groupsDir(dir))
  }

  /** Delete a group and its progress (proto `Delete`). */
  def delete(spark: SparkSession, dir: String, group: String,
             nowNanos: Long = System.nanoTime()): Unit = {
    // append-only storage: a tombstone row wins by created_at (merge-on-read)
    import spark.implicits._
    Seq((group, null: String, -1L, "$deleted", nowNanos))
      .toDF("group", "stream", "from_position", "strategy", "created_at")
      .write.mode("append").parquet(groupsDir(dir))
  }

  /** Latest definition of a group + its creation stamp (the incarnation
    * boundary: ops written before it belong to a previous, deleted
    * incarnation of the name and are ignored). None if absent/deleted. */
  private def groupRow(spark: SparkSession, dir: String,
                       group: String): Option[(Option[String], Long, Strategy, Long)] = {
    val w = Window.partitionBy("group").orderBy(col("created_at").desc)
    readOr(spark, groupsDir(dir), groupSchema)
      .filter(col("group") === group)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().headOption
      .filter(r => r.getString(3) != "$deleted")
      .map(r => (Option(r.getString(1)), r.getLong(2), strategyOf(r.getString(3)), r.getLong(4)))
  }

  /** Latest definition of a group, None if absent or deleted. */
  def groupInfo(spark: SparkSession, dir: String, group: String): Option[(Option[String], Long, Strategy)] =
    groupRow(spark, dir, group).map { case (s, p, st, _) => (s, p, st) }

  /** Register a consumer in the group (proto `Read` handshake). Idempotent. */
  def join(spark: SparkSession, dir: String, group: String, consumer: String,
           nowNanos: Long = System.nanoTime()): Unit = {
    val since = groupRow(spark, dir, group).map(_._4).getOrElse(Long.MinValue)
    ensureJoined(spark, dir, group, consumer, since, nowNanos)
    ()
  }

  /** Idempotent join returning the group's consumer list (one ops scan). */
  private def ensureJoined(spark: SparkSession, dir: String, group: String, consumer: String,
                           since: Long, nowNanos: Long): Seq[String] = {
    import spark.implicits._
    val cs = consumersSince(spark, dir, group, since)
    if (cs.contains(consumer)) cs
    else {
      Seq((group, 0L, "consumer-joined", consumer, nowNanos))
        .toDF("group", "position", "op", "consumer", "at")
        .write.mode("append").parquet(opsDir(dir))
      cs :+ consumer
    }
  }

  /** Active consumers in join order (first join wins ties by name). */
  def consumers(spark: SparkSession, dir: String, group: String): Seq[String] =
    consumersSince(spark, dir, group,
      groupRow(spark, dir, group).map(_._4).getOrElse(Long.MinValue))

  private def consumersSince(spark: SparkSession, dir: String, group: String,
                             since: Long): Seq[String] =
    readOr(spark, opsDir(dir), opSchema)
      .filter(col("group") === group && col("op") === "consumer-joined" && col("at") >= since)
      .groupBy("consumer").agg(min(col("at")).as("at"))
      .orderBy(col("at"), col("consumer"))
      .collect().map(_.getString(0)).toSeq

  /** Latest op per event position for the CURRENT incarnation of the
    * group (merge-on-read): ops older than the group's created_at belong
    * to a previous, deleted group of the same name and are ignored. */
  private def latestOps(spark: SparkSession, dir: String, group: String,
                        since: Long): DataFrame = {
    val w = Window.partitionBy("position").orderBy(col("at").desc)
    readOr(spark, opsDir(dir), opSchema)
      .filter(col("group") === group && col("op") =!= "consumer-joined" && col("at") >= since)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("position"), col("op"))
  }

  /** Positions whose latest op makes them non-deliverable. A `retried` op
    * supersedes a park/ack and restores deliverability. */
  private def processed(spark: SparkSession, dir: String, group: String,
                        since: Long): DataFrame =
    latestOps(spark, dir, group, since)
      .filter(col("op").isin("acked", "parked", "skipped"))
      .select(col("position").as("done_pos"))

  /**
   * Next deliverable events for `consumer`, up to `maxCount`, in position
   * order (proto `Read`): log scan filtered by the group's selector and
   * start position, anti-joined against processed positions, then routed
   * by the group's consumer strategy.
   */
  def read(spark: SparkSession, dir: String, log: DataFrame, group: String,
           consumer: String, maxCount: Int): DataFrame = {
    val (stream, fromPos, strategy, since) = groupRow(spark, dir, group)
      .getOrElse(throw new NoSuchElementException(s"no such group '$group'"))
    val cs = ensureJoined(spark, dir, group, consumer, since, System.nanoTime())
    val idx = cs.indexOf(consumer)
    val n = cs.length

    val base = stream.foldLeft(log.filter(col("position") >= fromPos))(
      (df, s) => df.filter(col("stream") === s))
    val deliverable = base
      .join(broadcast(processed(spark, dir, group, since)),
        col("position") === col("done_pos"), "left_anti")
    val routed = strategy match {
      case DispatchToSingle =>
        // all events to the single active consumer (the first registered)
        if (idx == 0) deliverable else deliverable.limit(0)
      case RoundRobin =>
        // rotate by delivery order — row_number over position order. The
        // global window IS the reference's single-dispatcher semantics
        // (serial rotation); bounded by the backlog, and `Pinned` is the
        // strategy that scales without a global ordering
        val w = Window.orderBy("position")
        deliverable.withColumn("rr", row_number().over(w) - 1)
          .filter(pmod(col("rr"), lit(n)) === idx).drop("rr")
      case Pinned =>
        // per-source-stream affinity: hash(stream) picks the consumer, so
        // one stream's events always flow to one consumer, in order
        deliverable.filter(pmod(abs(hash(col("stream"))), lit(n)) === idx)
    }
    routed.orderBy("position").limit(maxCount)
  }

  private def writeOps(spark: SparkSession, dir: String, group: String, positions: Seq[Long],
                       op: String, consumer: String, nowNanos: Long): Unit = {
    import spark.implicits._
    positions.map(p => (group, p, op, consumer, nowNanos))
      .toDF("group", "position", "op", "consumer", "at")
      .write.mode("append").parquet(opsDir(dir))
  }

  /** Acknowledge processing (proto `Ack`). */
  def ack(spark: SparkSession, dir: String, group: String, consumer: String,
          positions: Seq[Long], nowNanos: Long = System.nanoTime()): Unit =
    writeOps(spark, dir, group, positions, "acked", consumer, nowNanos)

  /** Negative-acknowledge with the proto's actions (persistent.proto:53-62). */
  def nack(spark: SparkSession, dir: String, group: String, consumer: String,
           positions: Seq[Long], action: NackAction,
           nowNanos: Long = System.nanoTime()): Unit = action match {
    case Park  => writeOps(spark, dir, group, positions, "parked", consumer, nowNanos)
    case Skip  => writeOps(spark, dir, group, positions, "skipped", consumer, nowNanos)
    case Retry => writeOps(spark, dir, group, positions, "retried", consumer, nowNanos)
  }

  private def sinceOf(spark: SparkSession, dir: String, group: String): Long =
    groupRow(spark, dir, group).map(_._4).getOrElse(Long.MinValue)

  /** Parked (dead-lettered) events of the group, joined back to the log. */
  def parked(spark: SparkSession, dir: String, log: DataFrame, group: String): DataFrame =
    log.join(
      broadcast(latestOps(spark, dir, group, sinceOf(spark, dir, group))
        .filter(col("op") === "parked")
        .select(col("position").as("p"))),
      col("position") === col("p")).drop("p")

  /** Redeliver all parked events (proto `ReplayParked`). */
  def replayParked(spark: SparkSession, dir: String, group: String,
                   nowNanos: Long = System.nanoTime()): Unit = {
    val ps = latestOps(spark, dir, group, sinceOf(spark, dir, group))
      .filter(col("op") === "parked")
      .collect().map(_.getLong(0)).toSeq
    if (ps.nonEmpty) writeOps(spark, dir, group, ps, "retried", "$server", nowNanos)
  }
}
