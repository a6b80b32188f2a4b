package graft.append

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.streaming.Subscriptions

/** A proposed event (client-supplied part; server assigns the rest).
  * Mirrors the append-side of `model.Event`
  * (`/root/reference/internal/model/model.go:26-34`). */
final case class ProposedEvent(
    uuid: String,
    eventType: String,
    data: String,
    metadata: Map[String, String] = Map.empty,
    customMetadata: Option[String] = None // opaque caller payload (ref backend.go:43)
)

/** Result of an append: committed revision range + global positions
  * (ref `streams/streams.go:125-189` returns first/last). */
final case class AppendResult(firstRevision: Long, lastRevision: Long,
                              firstPosition: Long, lastPosition: Long)

/**
 * Append path with the reference's transactional semantics
 * (`/root/reference/internal/streams/streams.go:93-203`, SURVEY.md §2.6 T7):
 *
 *  - every event must carry `type` and `content-type` metadata
 *    (streams.go:191-203) → [[MissingMetadata]];
 *  - expected-revision precondition: Any / NoStream / StreamExists /
 *    Exact(r) against the stream's current revision (-1 if absent,
 *    streams.go:61-91) → [[WrongExpectedRevision]];
 *  - server assigns dense per-stream `revision = current + 1 + i`
 *    (streams.go:150) and dense global `position = max + 1 + i` (the
 *    BIGSERIAL, backend.go:46) — deterministic, no
 *    `monotonically_increasing_id`;
 *  - `created` system metadata stamped in 100-ns ticks
 *    (streams.go:151, EventStoreDB convention).
 *
 * Concurrency: the reference serializes appends via the Postgres
 * transaction + UNIQUE(stream, revision) constraint. A parquet log has no
 * compare-and-swap, so this appender assumes a single writer per log (the
 * normal Spark deployment: one ingest job per table; use a
 * transactional table format for multi-writer). The max-revision /
 * max-position lookups are one small aggregation per call — at scale
 * they'd come from the writer's own watermark state (SURVEY.md §7.3), not
 * a log scan.
 */
object Appender {

  private val requiredMeta = Seq("type", "content-type") // streams.go:205-209

  /** Current max revision of a stream, -1 if the stream doesn't exist
    * (ref streams.go:61-91) — and the global high-water position. */
  def currentState(log: DataFrame, stream: String): (Long, Long) = {
    val row: Row = log
      .agg(
        max(when(col("stream") === stream, col("revision"))).as("rev"),
        max(col("position")).as("pos")
      )
      .head()
    (if (row.isNullAt(0)) -1L else row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  private def checkRevision(stream: String, current: Long, expected: ExpectedRevision): Unit = {
    val ok = expected match {
      case AnyRevision      => true
      case NoStream         => current == -1L
      case StreamExists     => current != -1L
      case ExactRevision(r) => current == r
    }
    if (!ok) throw WrongExpectedRevision(stream, expected, if (current == -1L) None else Some(current))
  }

  private def validate(events: Seq[ProposedEvent]): Unit =
    for (e <- events; k <- requiredMeta if !e.metadata.contains(k)) throw MissingMetadata(k)

  /** Duplicate (stream, uuid) detection — the reference's PK on
    * (stream, uuid) surfaces `ErrConflict` on a replayed append
    * (`backend/backend.go:48,316-329`). One filtered lookup against the
    * log per append call; at scale this comes from the single writer's
    * own key state (bloom/watermark), not a log scan. */
  private def checkConflicts(log: DataFrame, stream: String, events: Seq[ProposedEvent]): Unit = {
    val dupInBatch = events.groupBy(_.uuid).collectFirst { case (u, es) if es.size > 1 => u }
    dupInBatch.foreach(u => throw EventConflict(stream, u))
    val uuids = events.map(_.uuid)
    val existing = log
      .filter(col("stream") === stream && col("uuid").isin(uuids: _*))
      .select("uuid").limit(1).collect()
    if (existing.nonEmpty) throw EventConflict(stream, existing(0).getString(0))
  }

  /**
   * Append a batch of proposed events to `stream` in the parquet log at
   * `logDir`, enforcing the expected-revision precondition. `nowNanos`
   * is injected for deterministic `created` stamps.
   */
  def append(spark: SparkSession, logDir: String, stream: String,
             events: Seq[ProposedEvent], expected: ExpectedRevision = AnyRevision,
             nowNanos: Long = System.nanoTime()): AppendResult = {
    validate(events)
    appendInternal(spark, logDir, stream, events, expected, nowNanos)
  }

  /** Shared append path (markers skip user-metadata validation). */
  private def appendInternal(spark: SparkSession, logDir: String, stream: String,
                             events: Seq[ProposedEvent], expected: ExpectedRevision,
                             nowNanos: Long): AppendResult = {
    require(events.nonEmpty, "empty append")
    val log = readLog(spark, logDir)
    if (isTombstoned(log, stream)) throw StreamDeleted(stream)
    val (currentRev, maxPos) = currentState(log, stream)
    checkRevision(stream, currentRev, expected)
    // after the precondition, like the reference (revision check in
    // streams.go, PK conflict at insert time)
    checkConflicts(log, stream, events)

    val created = (nowNanos / 100L).toString // 100-ns ticks, streams.go:151
    import spark.implicits._
    val rows = events.zipWithIndex.map { case (e, i) =>
      (stream, e.uuid, e.eventType, e.data,
        e.metadata + ("created" -> created), e.customMetadata,
        currentRev + 1L + i, maxPos + 1L + i)
    }.toDF("stream", "uuid", "event_type", "data", "metadata", "custom_metadata",
      "revision", "position")
    rows.write.mode("append").parquet(logDir)
    AppendResult(currentRev + 1L, currentRev + events.size,
      maxPos + 1L, maxPos + events.size)
  }

  // system event types for the stream-lifecycle markers (the reference
  // declares Delete/Tombstone/BatchAppend but stubs them,
  // transport/grpc/streams/grpc_server.go:271-281 — completed here with
  // EventStoreDB's semantics: soft delete truncates, tombstone is final)
  val DeletedMarker = "$deleted"
  val TombstoneMarker = "$tombstoned"

  private def isTombstoned(log: DataFrame, stream: String): Boolean =
    log.filter(col("stream") === stream && col("event_type") === TombstoneMarker)
      .limit(1).count() > 0

  private def marker(uuid: String, tpe: String): ProposedEvent =
    ProposedEvent(uuid, tpe, "",
      Map("type" -> tpe, "content-type" -> "application/json"))

  /**
   * Soft delete: appends a `$deleted` marker; events at or before the
   * marker become invisible to [[visible]] reads. The stream can be
   * recreated by appending again (EventStoreDB soft-delete semantics).
   */
  def delete(spark: SparkSession, logDir: String, stream: String,
             expected: ExpectedRevision = AnyRevision, nowNanos: Long = System.nanoTime()): AppendResult =
    appendInternal(spark, logDir, stream, Seq(marker(s"del-$nowNanos", DeletedMarker)), expected, nowNanos)

  /**
   * Hard delete: appends a `$tombstoned` marker; any later append to the
   * stream fails with [[StreamDeleted]] (irreversible).
   */
  def tombstone(spark: SparkSession, logDir: String, stream: String,
                expected: ExpectedRevision = AnyRevision, nowNanos: Long = System.nanoTime()): AppendResult =
    appendInternal(spark, logDir, stream, Seq(marker(s"tomb-$nowNanos", TombstoneMarker)), expected, nowNanos)

  /**
   * Batch append: one call, many streams, one global position sequence
   * (each stream's expected-revision precondition checked up front; all
   * rows written together — single-writer contract as [[append]]).
   */
  def batchAppend(spark: SparkSession, logDir: String,
                  batches: Seq[(String, Seq[ProposedEvent], ExpectedRevision)],
                  nowNanos: Long = System.nanoTime()): Seq[(String, AppendResult)] = {
    require(batches.nonEmpty, "empty batch")
    batches.foreach { case (_, events, _) => validate(events) }
    // (stream, uuid) must be unique across the whole call, like one tx
    batches.flatMap { case (s, es, _) => es.map(e => (s, e.uuid)) }
      .groupBy(identity).collectFirst { case ((s, u), xs) if xs.size > 1 =>
        throw EventConflict(s, u)
      }
    val log = readLog(spark, logDir)
    val created = (nowNanos / 100L).toString
    import spark.implicits._
    // Precondition state for ALL touched streams in TWO jobs (not three
    // per stream): one grouped aggregation for global max position +
    // per-touched-stream current revision + tombstone flag (untouched
    // streams collapse into one null group that still feeds the position
    // max), and one broadcast join for (stream, uuid) conflicts. The
    // checks themselves then replay driver-side in batch order, so which
    // precondition throws first is exactly the sequential semantics —
    // but a 1,500-stream micro-batch costs 2 Spark jobs, not 4,500 (the
    // ingest probe's single-sink numbers were unusable before this).
    val touched = batches.map(_._1).distinct
    val aggRows = log
      .groupBy(when(col("stream").isin(touched: _*), col("stream")).as("s"))
      .agg(max(col("revision")).as("rev"), max(col("position")).as("pos"),
        max(when(col("event_type") === TombstoneMarker, 1L).otherwise(0L)).as("tomb"))
      .collect()
    var maxPos = if (aggRows.isEmpty) 0L else aggRows.map(_.getLong(2)).max
    val streamInfo: Map[String, (Long, Boolean)] = aggRows
      .filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3) == 1L)).toMap
    val proposedPairs = batches
      .flatMap { case (s, es, _) => es.map(e => (s, e.uuid)) }.distinct
    val conflictPairs: Set[(String, String)] = log
      .join(broadcast(proposedPairs.toDF("stream", "uuid")), Seq("stream", "uuid"))
      .select("stream", "uuid").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val results = Seq.newBuilder[(String, AppendResult)]
    val rows =
      Seq.newBuilder[(String, String, String, String, Map[String, String], Option[String], Long, Long)]
    // running per-stream revision across the call: a stream appearing in
    // two batches of one call continues its dense sequence (one tx)
    val revs = scala.collection.mutable.Map.empty[String, Long]
    batches.foreach { case (stream, events, expected) =>
      if (streamInfo.get(stream).exists(_._2)) throw StreamDeleted(stream)
      val currentRev = revs.getOrElse(stream, streamInfo.get(stream).fold(-1L)(_._1))
      checkRevision(stream, currentRev, expected)
      events.groupBy(_.uuid).collectFirst { case (u, es) if es.size > 1 =>
        throw EventConflict(stream, u)
      }
      events.collectFirst {
        case e if conflictPairs((stream, e.uuid)) => throw EventConflict(stream, e.uuid)
      }
      events.zipWithIndex.foreach { case (e, i) =>
        rows += ((stream, e.uuid, e.eventType, e.data,
          e.metadata + ("created" -> created), e.customMetadata,
          currentRev + 1L + i, maxPos + 1L + i))
      }
      results += stream -> AppendResult(currentRev + 1L, currentRev + events.size,
        maxPos + 1L, maxPos + events.size)
      revs(stream) = currentRev + events.size
      maxPos += events.size
    }
    // parallelize, NOT a local Seq toDF: a LocalRelation embeds every row
    // in the serialized plan and encodes+writes them in ONE task, which
    // at throughput-tier triggers (100k+ rows) makes the parquet encode
    // the sink's bottleneck. An RDD ships rows as blocks and spreads the
    // encode/write across tasks — position/revision assignment above
    // stays the sequential driver fold (the single-writer contract), but
    // nothing downstream of it needs to be single-threaded.
    val assigned = rows.result()
    val slices = math.max(1, math.min(8, assigned.size / 10000))
    spark.sparkContext.parallelize(assigned, slices)
      .toDF("stream", "uuid", "event_type", "data", "metadata", "custom_metadata",
        "revision", "position")
      .write.mode("append").parquet(logDir)
    results.result()
  }

  /**
   * Visibility view over the raw log: strips system markers and applies
   * soft-delete truncation (events at or before a stream's last `$deleted`
   * marker are hidden). One window over the marker rows only — the
   * truncation points are a tiny broadcast-joined dimension at scale.
   */
  def visible(log: DataFrame): DataFrame = {
    val cutoffs = log
      .filter(col("event_type") === DeletedMarker || col("event_type") === TombstoneMarker)
      .groupBy(col("stream").as("del_stream"))
      .agg(max(col("position")).as("del_pos"))
    log
      .filter(col("event_type") =!= DeletedMarker && col("event_type") =!= TombstoneMarker)
      .join(broadcast(cutoffs), col("stream") === col("del_stream"), "left")
      .filter(col("del_pos").isNull || col("position") > col("del_pos"))
      .drop("del_stream", "del_pos")
  }

  /** Read the canonical log (empty DataFrame with the canonical schema if
    * the directory has no files yet). */
  def readLog(spark: SparkSession, logDir: String): DataFrame =
    graft.util.ParquetDirs.readOrEmpty(spark, logDir, Subscriptions.eventSchema)
}
