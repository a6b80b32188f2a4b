package graft.proj

/**
 * Projection DSL + fold core — the engine's user-programmability surface
 * (the reference's entire UDF/UDAF system, SURVEY.md §2.4/§2.8).
 *
 * The reference compiles a JavaScript source with goja
 * (`/root/reference/internal/projections/projection.go:363-373`); the DSL
 * calls (`fromStream` → `when` → `transformBy`/`filterBy` → …) build a
 * composed fold closure by host-function side effects
 * (`projection.go:82-92`). Here the same DSL is a typed Scala fluent
 * builder producing an immutable [[Projection]] value; execution is a
 * Spark fold (see [[ProjectionBatch]] for batch, graft.streaming for live).
 *
 * Semantics pinned against the reference (and its unit tests, ported in
 * `src/test/scala/graft/proj/ProjectionSpec.scala`):
 *
 *  - `when`: on first event of a partition, state is created via `$init`
 *    (`projection.go:176-180`); the handler for the event's type runs, a
 *    specific handler winning over `$any` (`projection.go:166-174`,
 *    precedence test `projection_test.go:218-251`); no handler → state
 *    unchanged (but still initialized).
 *  - the chain `when → filterBy/transformBy…` runs in declaration order and
 *    threads the state through; the FINAL chain state is stored back
 *    (`projection.go:399-414`) — i.e. `transformBy` rewrites the stored
 *    state, not just the emitted view.
 *  - `filterBy(false)` short-circuits the rest of the chain and suppresses
 *    emission, while updates made so far persist (`projection.go:88-91,
 *    234-246`; test `projection_test.go:145-181`).
 *  - `partitionBy` routes state per key; the current partition is injected
 *    into the event before the chain runs (`projection.go:399-407`).
 */
final case class ProjEvent(
    streamId: String,
    eventType: String,
    isJson: Boolean,
    bodyRaw: String,
    metadataRaw: Map[String, String],
    partition: String,
    sequenceNumber: Long,
    /** Global fold order (the reference pump processes strictly by
      * `position`, `streams/streams.go:264-309`). Not part of the JS event
      * shape but required for a deterministic distributed fold. */
    position: Long
)

object ProjEvent {
  def apply(streamId: String = "", eventType: String = "", bodyRaw: String = "",
            metadataRaw: Map[String, String] = Map.empty, position: Long = 0L): ProjEvent =
    ProjEvent(streamId, eventType, isJson = bodyRaw.nonEmpty, bodyRaw, metadataRaw,
      partition = "", sequenceNumber = -1L, position = position)
}

/** `options({...})` knobs (ref `projection.go:47-53`). Like the reference,
  * only `resultStreamName` is acted upon; the rest are carried for parity. */
final case class ProjOptions(
    resultStreamName: String = "",
    includeLinks: Boolean = false,
    reorderEvents: Boolean = false,
    processingLag: Int = 0
)

/** Source selector (ref `projection.go:96-119`). */
sealed trait Selector {
  def matches(streamId: String): Boolean = this match {
    case SelectAll              => true
    case SelectStreams(streams) => streams.contains(streamId)
  }
}
case object SelectAll extends Selector
final case class SelectStreams(streams: Seq[String]) extends Selector

/** A post-`when` chain step, kept in declaration order (ref
  * `projection.go:82-92` Chain). */
sealed trait Step[S]
final case class TransformStep[S](f: S => S) extends Step[S]
final case class FilterStep[S](f: S => Boolean) extends Step[S]

/** Compiled projection — immutable description of the fold. */
final case class Projection[S](
    name: String,
    options: ProjOptions,
    selector: Selector,
    partitioner: Option[ProjEvent => String],
    init: () => S,
    handlers: Map[String, (S, ProjEvent) => S],
    anyHandler: Option[(S, ProjEvent) => S],
    steps: Seq[Step[S]],
    output: Boolean
) extends Serializable {

  /** Result stream name (ref `projection.go:135-141`). */
  def resultStream: String =
    if (options.resultStreamName.nonEmpty) options.resultStreamName
    else s"$$projections-$name-result"

  def isPartitioned: Boolean = partitioner.isDefined

  def partitionOf(e: ProjEvent): String = partitioner.fold("")(_(e))

  /** One fold step: `when` + the declared chain. Returns the new stored
    * state and whether it is forwarded (emitted). Mirrors
    * `Projection.Update` minus state routing (ref `projection.go:399-414`). */
  def step(state: Option[S], e0: ProjEvent): (S, Boolean) = {
    val e = e0.copy(partition = partitionOf(e0))
    val s0 = state.getOrElse(init())
    // handler dispatch: specific wins over $any (projection.go:166-174)
    val s1 = handlers.get(e.eventType).orElse(anyHandler).fold(s0)(h => h(s0, e))
    // chain: declaration order, short-circuit on filter false
    var s = s1
    var forward = true
    val it = steps.iterator
    while (forward && it.hasNext) it.next() match {
      case TransformStep(f) => s = f(s)
      case FilterStep(f)    => forward = f(s)
    }
    (s, forward)
  }

  /** Whether an already-folded (post-chain) state passes the declared
    * filter steps — the emit decision for a state handed over WHOLE
    * rather than built per event (the hybrid catch-up's seed states),
    * mirroring the per-event gate. Transform steps are skipped: a
    * stored state already carries them. */
  def emits(s: S): Boolean = steps.forall {
    case FilterStep(f) => f(s)
    case _             => true
  }
}

/**
 * Driver-side sequential runner — the reference's in-memory `Update` loop
 * (`projection.go:375-414`) for unit tests and small folds. Distributed
 * execution lives in [[ProjectionBatch]].
 */
final class LocalRunner[S](val projection: Projection[S]) {
  private var defaultState: Option[S] = None
  private val partitionStates = scala.collection.mutable.Map.empty[String, S]

  /** Feed one event; returns the emitted state, or None if suppressed. */
  def update(e: ProjEvent): Option[S] = {
    val key = projection.partitionOf(e)
    val prev = if (projection.isPartitioned) partitionStates.get(key) else defaultState
    val (next, forward) = projection.step(prev, e)
    if (projection.isPartitioned) partitionStates(key) = next else defaultState = Some(next)
    if (forward) Some(next) else None
  }

  /** Feed events that pass the selector, in the given order. */
  def run(events: Iterable[ProjEvent]): Unit =
    events.iterator.filter(e => projection.selector.matches(e.streamId)).foreach(update)

  def state: Option[S] = defaultState
  def stateOf(partition: String): Option[S] = partitionStates.get(partition)
  def states: Map[String, S] = partitionStates.toMap
}

// ---------------------------------------------------------------------------
// Fluent builder, staged like the reference's goja host objects
// (fromAll → partitionBy/foreachStream → when → transformBy/filterBy/...)
// ---------------------------------------------------------------------------

object Projection {
  /** Entry point: `Projection.named("p").fromStream("s").when(...)…` */
  def named(name: String): ProjectionDef = ProjectionDef(name, ProjOptions())
}

final case class ProjectionDef(name: String, opts: ProjOptions) {
  def options(o: ProjOptions): ProjectionDef = copy(opts = o)
  /** Result stream name before `when` (for options parity tests;
    * ref `projection.go:135-141`). */
  def resultStream: String =
    if (opts.resultStreamName.nonEmpty) opts.resultStreamName
    else s"$$projections-$name-result"
  def fromStream(stream: String): SelectedDef = fromStreams(stream)
  def fromStreams(streams: String*): SelectedDef =
    SelectedDef(name, opts, SelectStreams(streams))
  def fromAll(): SelectedDef = SelectedDef(name, opts, SelectAll)
}

final case class SelectedDef(name: String, opts: ProjOptions, selector: Selector,
                             partitioner: Option[ProjEvent => String] = None,
                             outputFlag: Boolean = false) {
  def partitionBy(f: ProjEvent => String): SelectedDef = copy(partitioner = Some(f))
  /** Shorthand: partition key = stream id (ref `projection.go:274-290`). */
  def foreachStream(): SelectedDef = copy(partitioner = Some(_.streamId))
  /** `outputState()` is reachable pre-`when` in the reference DSL
    * (`projection.go:292-303`; test `projection_test.go:76-84`). */
  def outputState(): SelectedDef = copy(outputFlag = true)

  /** `$init` + typed handlers; a handler under key `"$any"` is the fallback
    * (ref `projection.go:42-45,164-196`). */
  def when[S](init: => S, handlers: Map[String, (S, ProjEvent) => S]): WhenDef[S] =
    WhenDef(Projection[S](
      name, opts, selector, partitioner,
      () => init,
      handlers - "$any",
      handlers.get("$any"),
      steps = Vector.empty,
      output = outputFlag
    ))
}

final case class WhenDef[S](p: Projection[S]) {
  def transformBy(f: S => S): WhenDef[S] =
    WhenDef(p.copy(steps = p.steps :+ TransformStep(f)))
  def filterBy(f: S => Boolean): WhenDef[S] =
    WhenDef(p.copy(steps = p.steps :+ FilterStep(f)))
  def outputState(): WhenDef[S] = WhenDef(p.copy(output = true))
  def build: Projection[S] = p
}
