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
 *  - a group created with a message timeout (the proto's ack deadline)
 *    LEASES delivered events to the reading consumer: while the lease is
 *    live the events are in-flight (not redelivered to anyone); an event
 *    not acked within the deadline becomes deliverable again — the
 *    redelivery contract. ack/park/skip supersede the lease;
 *  - [[compact]] rewrites the op log to its minimal equivalent: a
 *    checkpoint below which everything is acked/skipped, the latest op
 *    per in-flight position, live leases, and one join row per consumer.
 *
 * Scale design: the op log is append-only and tiny relative to the event
 * log (one row per consumed event op). Deliverability is a pushdown-able
 * `position > checkpoint` range filter on the log scan plus one anti-join
 * against the latest-op set — which compaction keeps bounded by the
 * in-flight backlog (broadcastable), not by consumption history. The
 * checkpoint can only advance past positions whose latest op is terminal
 * (acked/skipped) — parked and retried events hold it back, conservatively
 * and correctly.
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
    StructField("created_at", LongType, nullable = false),
    StructField("timeout_ns", LongType, nullable = true) // null = no ack deadline
  ))

  // op ∈ acked | parked | skipped | retried | leased | ckpt | consumer-joined
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
    * to `$all`; `messageTimeoutNanos` is the proto's ack deadline — when
    * set, delivered events are leased and redelivered if not acked in
    * time. Fails if the group exists. */
  def create(spark: SparkSession, dir: String, group: String, stream: Option[String],
             fromPosition: Long = 0L, strategy: Strategy = RoundRobin,
             messageTimeoutNanos: Option[Long] = None,
             nowNanos: Long = System.nanoTime()): Unit = {
    require(groupInfo(spark, dir, group).isEmpty, s"group '$group' already exists")
    import spark.implicits._
    Seq((group, stream.orNull, fromPosition, strategy.name, nowNanos,
      messageTimeoutNanos.map(java.lang.Long.valueOf).orNull))
      .toDF("group", "stream", "from_position", "strategy", "created_at", "timeout_ns")
      .write.mode("append").parquet(groupsDir(dir))
  }

  /** Delete a group and its progress (proto `Delete`). */
  def delete(spark: SparkSession, dir: String, group: String,
             nowNanos: Long = System.nanoTime()): Unit = {
    // append-only storage: a tombstone row wins by created_at (merge-on-read)
    import spark.implicits._
    Seq((group, null: String, -1L, "$deleted", nowNanos, null: java.lang.Long))
      .toDF("group", "stream", "from_position", "strategy", "created_at", "timeout_ns")
      .write.mode("append").parquet(groupsDir(dir))
  }

  /** A group's latest definition. `since` is the creation stamp — the
    * incarnation boundary: ops written before it belong to a previous,
    * deleted incarnation of the name and are ignored. */
  private final case class GroupDef(stream: Option[String], fromPos: Long,
                                    strategy: Strategy, timeoutNs: Option[Long], since: Long)

  private def groupRow(spark: SparkSession, dir: String, group: String): Option[GroupDef] = {
    val w = Window.partitionBy("group").orderBy(col("created_at").desc)
    readOr(spark, groupsDir(dir), groupSchema)
      .filter(col("group") === group)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().headOption
      .filter(r => r.getString(3) != "$deleted")
      .map(r => GroupDef(Option(r.getString(1)), r.getLong(2), strategyOf(r.getString(3)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getLong(4)))
  }

  /** Latest definition of a group, None if absent or deleted. */
  def groupInfo(spark: SparkSession, dir: String, group: String): Option[(Option[String], Long, Strategy)] =
    groupRow(spark, dir, group).map(g => (g.stream, g.fromPos, g.strategy))

  /** Register a consumer in the group (proto `Read` handshake). Idempotent. */
  def join(spark: SparkSession, dir: String, group: String, consumer: String,
           nowNanos: Long = System.nanoTime()): Unit = {
    val since = groupRow(spark, dir, group).map(_.since).getOrElse(Long.MinValue)
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
      groupRow(spark, dir, group).map(_.since).getOrElse(Long.MinValue))

  private def consumersSince(spark: SparkSession, dir: String, group: String,
                             since: Long): Seq[String] =
    readOr(spark, opsDir(dir), opSchema)
      .filter(col("group") === group && col("op") === "consumer-joined" && col("at") >= since)
      .groupBy("consumer").agg(min(col("at")).as("at"))
      .orderBy(col("at"), col("consumer"))
      .collect().map(_.getString(0)).toSeq

  /** Latest op per event position for the CURRENT incarnation of the
    * group (merge-on-read): ops older than the group's created_at belong
    * to a previous, deleted group of the same name and are ignored.
    * Checkpoint rows are not per-position ops and are excluded. */
  private def latestOps(spark: SparkSession, dir: String, group: String,
                        since: Long): DataFrame = {
    val w = Window.partitionBy("position").orderBy(col("at").desc)
    readOr(spark, opsDir(dir), opSchema)
      .filter(col("group") === group && col("at") >= since
        && !col("op").isin("consumer-joined", "ckpt"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("position"), col("op"), col("at"))
  }

  /** The group's compaction checkpoint: every selector position at or
    * below it is terminally processed (acked/skipped). None before the
    * first compaction. */
  private def ckptOf(spark: SparkSession, dir: String, group: String,
                     since: Long): Option[Long] =
    readOr(spark, opsDir(dir), opSchema)
      .filter(col("group") === group && col("op") === "ckpt" && col("at") >= since)
      .agg(max(col("position"))).collect().headOption
      .filter(!_.isNullAt(0)).map(_.getLong(0))

  /** Positions whose latest op makes them non-deliverable: terminal ops
    * (acked/parked/skipped) and live leases (delivered less than the ack
    * deadline ago). A `retried` op — or lease expiry — restores
    * deliverability. */
  private def processed(spark: SparkSession, dir: String, group: String,
                        since: Long, timeoutNs: Option[Long], nowNanos: Long): DataFrame = {
    val leaseLive = timeoutNs match {
      case Some(t) => col("op") === "leased" && col("at") > nowNanos - t
      case None    => lit(false)
    }
    latestOps(spark, dir, group, since)
      .filter(col("op").isin("acked", "parked", "skipped") || leaseLive)
      .select(col("position").as("done_pos"))
  }

  /**
   * Next deliverable events for `consumer`, up to `maxCount`, in position
   * order (proto `Read`): log scan filtered by the group's selector,
   * start position and compaction checkpoint (a pushdown-able range
   * predicate), anti-joined against processed positions, then routed by
   * the group's consumer strategy. If the group has an ack deadline, the
   * returned events are leased to `consumer` as of `nowNanos` (delivery
   * is a server-side effect, like the proto's `Read`).
   */
  def read(spark: SparkSession, dir: String, log: DataFrame, group: String,
           consumer: String, maxCount: Int,
           nowNanos: Long = System.nanoTime()): DataFrame = {
    val GroupDef(stream, fromPos, strategy, timeoutNs, since) = groupRow(spark, dir, group)
      .getOrElse(throw new NoSuchElementException(s"no such group '$group'"))
    val cs = ensureJoined(spark, dir, group, consumer, since, nowNanos)
    val idx = cs.indexOf(consumer)
    val n = cs.length

    val lo = (ckptOf(spark, dir, group, since).map(_ + 1) ++ Seq(fromPos)).max
    val base = stream.foldLeft(log.filter(col("position") >= lo))(
      (df, s) => df.filter(col("stream") === s))
    val deliverable = base
      .join(broadcast(processed(spark, dir, group, since, timeoutNs, nowNanos)),
        col("position") === col("done_pos"), "left_anti")
    val routed = strategy match {
      case DispatchToSingle =>
        // all events to the single active consumer (the first registered)
        if (idx == 0) deliverable else deliverable.limit(0)
      case RoundRobin =>
        // rotate by delivery order — a global row number over position
        // order (the reference's single-dispatcher serial rotation).
        // The rotation only ever hands out the first maxCount ranks per
        // consumer, so rank the first maxCount·n positions ONLY: the
        // orderBy+limit fuses to TakeOrderedAndProject (no full-backlog
        // sort or materialization — ranking the whole deliverable set
        // here would localCheckpoint the entire backlog on every poll),
        // and a rank prefix rotates identically to the full rotation.
        // The rank comes from Ranking.globalRank (range partitioning +
        // per-range offsets), NOT a partitionBy-less window; `Pinned`
        // remains the strategy that scales without global ordering.
        val lim = math.min(maxCount.toLong * n, Int.MaxValue.toLong).toInt
        val head = deliverable.orderBy("position").limit(lim)
        graft.corpus.Ranking.globalRank(head, Seq.empty, Seq("position"), "rr")
          .filter(pmod(col("rr") - 1, lit(n)) === idx).drop("rr")
      case Pinned =>
        // per-source-stream affinity: hash(stream) picks the consumer, so
        // one stream's events always flow to one consumer, in order
        deliverable.filter(pmod(abs(hash(col("stream"))), lit(n)) === idx)
    }
    val batch = routed.orderBy("position").limit(maxCount)
    timeoutNs match {
      case None => batch
      case Some(_) =>
        // delivery is an effect: lease the batch to this consumer. The
        // materialization is bounded by maxCount (the proto's buffer size)
        val delivered = batch.localCheckpoint()
        val ps = delivered.select("position").collect().map(_.getLong(0)).toSeq
        if (ps.nonEmpty) writeOps(spark, dir, group, ps, "leased", consumer, nowNanos)
        delivered
    }
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
    groupRow(spark, dir, group).map(_.since).getOrElse(Long.MinValue)

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

  /**
   * Compact one group's share of the op log to its minimal equivalent
   * (offline maintenance, single-writer like [[graft.append.Appender]]'s
   * contract; other groups' rows pass through untouched):
   *
   *  - a `ckpt` row at the highest selector position F such that every
   *    selector position ≤ F has a terminal latest op (acked/skipped) —
   *    reads then skip `≤ F` with a range predicate instead of an
   *    anti-join row each;
   *  - the latest op per position above F — EXCEPT `retried` rows and
   *    expired leases, whose meaning ("deliverable again") is the default
   *    state of an op-less position, so dropping the row is equivalent;
   *  - one `consumer-joined` row per consumer (earliest stamp, preserving
   *    join order).
   *
   * After compaction the op set is bounded by the in-flight backlog
   * (unacked + parked + leased), not by consumption history — this is
   * what keeps the anti-join side broadcastable indefinitely.
   */
  def compact(spark: SparkSession, dir: String, log: DataFrame, group: String,
              nowNanos: Long = System.nanoTime()): Unit = {
    import spark.implicits._
    val GroupDef(stream, fromPos, _, timeoutNs, since) =
      groupRow(spark, dir, group)
        .getOrElse(throw new NoSuchElementException(s"no such group '$group'"))
    val all = readOr(spark, opsDir(dir), opSchema)
    val others = all.filter(col("group") =!= group || col("at") < since)

    // one join row per consumer, earliest stamp
    val joins = all
      .filter(col("group") === group && col("op") === "consumer-joined" && col("at") >= since)
      .groupBy("consumer").agg(min(col("at")).as("at"))
      .select(lit(group).as("group"), lit(0L).as("position"),
        lit("consumer-joined").as("op"), col("consumer"), col("at"))

    val latest = latestOps(spark, dir, group, since) // (position, op, at)
    val prevCkpt = ckptOf(spark, dir, group, since)
    val lo = (prevCkpt.map(_ + 1) ++ Seq(fromPos)).max

    // checkpoint frontier: the highest selector position below the FIRST
    // non-terminal one. Two tiny aggregations (min open position, then
    // max position under it) — no prefix-scan window, so the backlog
    // above the previous checkpoint never funnels into one task
    val base = stream.foldLeft(log.filter(col("position") >= lo))(
      (df, s) => df.filter(col("stream") === s))
      .select(col("position"))
    val flagged = base
      .join(latest, Seq("position"), "left")
      .withColumn("terminal",
        when(col("op").isin("acked", "skipped"), 1).otherwise(0))
      .localCheckpoint()
    val firstOpen = flagged.filter(col("terminal") === 0)
      .agg(min(col("position"))).collect().headOption
      .filter(!_.isNullAt(0)).map(_.getLong(0))
    val frontier = firstOpen
      .map(m => flagged.filter(col("position") < m))
      .getOrElse(flagged)
      .agg(max(col("position"))).collect().headOption
      .filter(!_.isNullAt(0)).map(_.getLong(0))
    val newCkpt = (frontier ++ prevCkpt).reduceOption((a, b) => math.max(a, b))

    // keep: non-terminal-below-ckpt positions' latest ops, minus rows whose
    // meaning is "deliverable" (retried, expired leases)
    val leaseLive = timeoutNs match {
      case Some(t) => col("op") =!= "leased" || col("at") > nowNanos - t
      case None    => col("op") =!= "leased"
    }
    val kept = latest
      .filter(col("position") > newCkpt.getOrElse(Long.MinValue))
      .filter(col("op") =!= "retried" && leaseLive)
      .select(lit(group).as("group"), col("position"), col("op"),
        lit("$server").as("consumer"), col("at"))

    val ckptRows = newCkpt.toSeq.toDF("position")
      .select(lit(group).as("group"), col("position"), lit("ckpt").as("op"),
        lit("$server").as("consumer"), lit(nowNanos).as("at"))

    val compacted = others.unionByName(joins).unionByName(kept).unionByName(ckptRows)
      .localCheckpoint() // materialize BEFORE touching the source files

    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(opsDir(dir)).getFileSystem(hconf)
    val tmp = new org.apache.hadoop.fs.Path(opsDir(dir) + ".compacting")
    compacted.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(new org.apache.hadoop.fs.Path(opsDir(dir)), true)
    fs.rename(tmp, new org.apache.hadoop.fs.Path(opsDir(dir)))
    ()
  }
}
