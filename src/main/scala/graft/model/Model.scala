package graft.model

/**
 * Core data model of the engine — the canonical event record and the
 * read-option ADTs.
 *
 * Mirrors the reference's data model (an append-only event log partitioned
 * into named streams) while staying Spark-idiomatic:
 *
 *  - reference storage row: `/root/reference/internal/backend/backend.go:38-53`
 *    (stream, uuid, data, metadata, custom_metadata, revision, position)
 *  - reference in-memory record: `/root/reference/internal/model/model.go:26-34`
 *  - reference read options: `/root/reference/internal/model/model.go:90-125`
 *
 * The engine itself is untyped-DataFrame-first (schema-on-read payloads,
 * predicate pushdown); [[Event]] is provided for the typed `Dataset[Event]`
 * surface where compile-time field checks help.
 */
final case class Event(
    stream: String,
    uuid: String,
    eventType: String,
    data: String, // JSON payload (schema-on-read), ref model.go:47-58
    metadata: Map[String, String],
    customMetadata: Option[String], // opaque caller payload (ref backend.go:43)
    revision: Long, // 0-based, dense per stream   (ref streams.go:150)
    position: Long // 1-based, dense global order (ref backend.go:46)
)

/** Read direction (ref `model/model.go:95-98`). */
sealed trait Direction
case object Forwards extends Direction
case object Backwards extends Direction

/** Where a read starts (ref proto `stream_option`/`all_option` oneofs). */
sealed trait ReadFrom
case object FromStart extends ReadFrom
case object FromEnd extends ReadFrom
/** From a specific revision (stream reads) or position ($all reads). */
final case class From(value: Long) extends ReadFrom

/** What a server-side filter applies to (ref `model/model.go:115-119`). */
sealed trait FilterTarget
case object OnStreamId extends FilterTarget
case object OnEventType extends FilterTarget

/**
 * Server-side event filter: a regex XOR a prefix list
 * (ref `model/model.go:109-125`, compilation `backend/backend.go:228-246`).
 *
 * Unlike the reference — which compiles prefix lists to an anchored
 * alternation regex, defeating index prefix scans — prefixes here become a
 * `startsWith` disjunction so Catalyst pushes `StringStartsWith` into the
 * parquet scan (see SURVEY.md §4).
 */
sealed trait EventFilter { def target: FilterTarget }
final case class PrefixFilter(target: FilterTarget, prefixes: Seq[String]) extends EventFilter
final case class RegexFilter(target: FilterTarget, regex: String) extends EventFilter

/** Which part of the log a read addresses. */
sealed trait StreamSelector
/** Single named stream: order/limit by `revision` (ref backend.go:118-152). */
final case class OneStream(stream: String) extends StreamSelector
/** The `$all` global log: order/limit by `position` (ref backend.go:154-194). */
case object AllStreams extends StreamSelector

/**
 * Bounded-read options (ref `model/model.go:90-107`).
 * `count = None` reads everything (the reference's `Count<0` subscription
 * branch is the streaming module's job, see graft.streaming).
 */
final case class ReadOptions(
    selector: StreamSelector,
    direction: Direction = Forwards,
    from: ReadFrom = FromStart,
    count: Option[Long] = None,
    filter: Option[EventFilter] = None
)

/** Expected-revision precondition for appends (ref `model/model.go:72-84`). */
sealed trait ExpectedRevision
case object AnyRevision extends ExpectedRevision
case object NoStream extends ExpectedRevision
case object StreamExists extends ExpectedRevision
final case class ExactRevision(revision: Long) extends ExpectedRevision

/** Append failures (ref `streams/streams.go:21-29`). */
final case class WrongExpectedRevision(stream: String, expected: ExpectedRevision, current: Option[Long])
    extends RuntimeException(
      s"wrong expected revision on '$stream': expected=$expected current=${current.getOrElse(-1L)}"
    )
final case class MissingMetadata(key: String)
    extends RuntimeException(s"missing required metadata key: $key")

/** Duplicate (stream, uuid) append — the reference's PK violation surfaced
  * as `ErrConflict` (`backend/backend.go:48,316-329`): a replayed append
  * must fail, not silently double-write. */
final case class EventConflict(stream: String, uuid: String)
    extends RuntimeException(s"event '$uuid' already exists in stream '$stream'")

/** Append to a hard-deleted (tombstoned) stream (EventStoreDB
  * `StreamDeleted`; the reference declares Delete/Tombstone but stubs
  * them, `grpc_server.go:271-281`). */
final case class StreamDeleted(stream: String)
    extends RuntimeException(s"stream '$stream' is tombstoned")
