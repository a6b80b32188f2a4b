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
    metadata: Map[String, String] = Map.empty
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

  /**
   * Append a batch of proposed events to `stream` in the parquet log at
   * `logDir`, enforcing the expected-revision precondition. `nowNanos`
   * is injected for deterministic `created` stamps.
   */
  def append(spark: SparkSession, logDir: String, stream: String,
             events: Seq[ProposedEvent], expected: ExpectedRevision = AnyRevision,
             nowNanos: Long = System.nanoTime()): AppendResult = {
    require(events.nonEmpty, "empty append")
    validate(events)
    val log = readLog(spark, logDir)
    val (currentRev, maxPos) = currentState(log, stream)
    checkRevision(stream, currentRev, expected)

    val created = (nowNanos / 100L).toString // 100-ns ticks, streams.go:151
    import spark.implicits._
    val rows = events.zipWithIndex.map { case (e, i) =>
      (stream, e.uuid, e.eventType, e.data,
        e.metadata + ("created" -> created),
        currentRev + 1L + i, maxPos + 1L + i)
    }.toDF("stream", "uuid", "event_type", "data", "metadata", "revision", "position")
    rows.write.mode("append").parquet(logDir)
    AppendResult(currentRev + 1L, currentRev + events.size,
      maxPos + 1L, maxPos + events.size)
  }

  /** Read the canonical log (empty DataFrame with the canonical schema if
    * the directory has no files yet). */
  def readLog(spark: SparkSession, logDir: String): DataFrame = {
    val dir = new java.io.File(logDir)
    val hasData = dir.exists && dir.listFiles != null &&
      dir.listFiles.exists(f => f.getName.endsWith(".parquet"))
    if (hasData) spark.read.schema(Subscriptions.eventSchema).parquet(logDir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Subscriptions.eventSchema)
  }
}
