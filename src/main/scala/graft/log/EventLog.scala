package graft.log

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model._

/**
 * Batch read path over an event-log DataFrame — the engine's main "query".
 *
 * Re-expresses the reference's SQL assembly
 * (`/root/reference/internal/backend/backend.go:97-226`: WHERE ∧-join,
 * ORDER BY revision|position, LIMIT) as a declarative DataFrame plan so
 * Catalyst does predicate/limit pushdown and `TakeOrderedAndProject` top-k
 * for free (SURVEY.md §4).
 *
 * Required input columns: `stream` (STRING), `event_type` (STRING),
 * `revision` (LONG, 0-based dense per stream), `position` (LONG, 1-based
 * dense global). All other columns pass through.
 *
 * Scale notes (100 TB):
 *  - every predicate here is a plain comparison / StartsWith on a scan
 *    column — pushed into the parquet reader (row-group pruning on
 *    `position` works because the log is written in position order);
 *  - `orderBy + limit` compiles to `TakeOrderedAndProject` — a per-partition
 *    top-k plus a single driver merge, no global sort;
 *  - prefix filters are a `startsWith` disjunction, NOT the reference's
 *    anchored alternation regex (`backend.go:228-238`), so they remain
 *    sargable/pushable.
 */
object EventLog {

  /** Execute a bounded read. Result rows are sorted in read order. */
  def read(events: DataFrame, opts: ReadOptions): DataFrame = {
    // Field the read orders and ranges over: `revision` for single-stream
    // reads, `position` for $all (ref backend.go:118-152 vs 154-194).
    val (field, streamPred) = opts.selector match {
      case OneStream(s) => (col("revision"), Some(col("stream") === lit(s)))
      case AllStreams   => (col("position"), None)
    }

    // Direction × origin semantics, incl. the degenerate boundary reads the
    // reference pins in tests (`streams_test.go:235-303`):
    //   Forwards  from End   -> the single LAST event   (backend.go:135-143)
    //   Backwards from Start -> the single FIRST event  (backend.go:164-171)
    val (rangePred, sortCol, limit1) = (opts.direction, opts.from) match {
      case (Forwards, FromStart) => (None, field.asc, false)
      case (Forwards, From(v))   => (Some(field >= v), field.asc, false)
      case (Forwards, FromEnd)   => (None, field.desc, true)
      case (Backwards, FromEnd)  => (None, field.desc, false)
      case (Backwards, From(v))  => (Some(field <= v), field.desc, false)
      case (Backwards, FromStart) => (None, field.asc, true)
    }

    val filterPred = opts.filter.map(compileFilter)

    val predicates: Seq[Column] = streamPred.toSeq ++ rangePred.toSeq ++ filterPred.toSeq
    val filtered = predicates.foldLeft(events)((df, p) => df.filter(p))
    val sorted = filtered.orderBy(sortCol)

    if (limit1) sorted.limit(1)
    else opts.count.fold(sorted)(n => sorted.limit(n.toInt))
  }

  /**
   * Compile a server-side filter to a pushable Column predicate
   * (ref `backend/backend.go:180-186,228-246`).
   */
  def compileFilter(f: EventFilter): Column = {
    val target = f.target match {
      case OnStreamId  => col("stream")
      case OnEventType => col("event_type")
    }
    f match {
      case PrefixFilter(_, prefixes) =>
        // startsWith disjunction — sargable, unlike the reference's
        // `^(p1|p2|…)` regex compilation (backend.go:228-238).
        prefixes.map(p => target.startsWith(lit(p))).reduce(_ || _)
      case RegexFilter(_, re) =>
        target.rlike(re)
    }
  }

  /** Latest revision of a stream (ref `backend/backend.go:82-95`). */
  def maxRevision(events: DataFrame, stream: String): DataFrame =
    events.filter(col("stream") === stream).agg(max("revision").as("max_revision"))
}
