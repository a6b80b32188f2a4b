package graft.proj

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** A projection event tagged with its routing key (the shuffle unit). */
final case class KeyedEvent(key: String, event: ProjEvent)

/** An event routed to one projection's fold (the multiplexed shuffle unit). */
final case class TaggedEvent(proj: String, key: String, event: ProjEvent)

/**
 * Distributed batch execution of a [[Projection]] fold.
 *
 * The reference folds events strictly in `position` order against in-memory
 * per-partition state (`/root/reference/internal/projections/projection.go:375-414`,
 * pump design `streams/streams.go:264-309`). Spark's `groupByKey` guarantees
 * no intra-group order, so the scalable plan here is the secondary-sort
 * pattern:
 *
 *   selector filter (pushed to scan) → map to (key, event) →
 *   `repartition($"key")` (ONE shuffle) →
 *   `sortWithinPartitions(key, position)` (external, spill-friendly sort —
 *   no per-group in-memory materialization) →
 *   `mapPartitions` streaming fold, emitting on key change.
 *
 * At 100 TB this holds: each task streams its sorted run once, state is one
 * value per key, and no operator collects a whole group into memory. A
 * heavily-skewed key degrades to a sequential fold of that key's events —
 * inherent to the fold's semantics (order-dependent state), not the plan.
 * The unpartitioned (global-state) fold is a single sequential pass by
 * construction (`repartition(1)`) — same caveat, same semantics.
 */
object ProjectionBatch {

  /**
   * Adapt a canonical event-log DataFrame (`stream`, `event_type`,
   * `position`, optional `data`/`props` JSON payload, optional `metadata`
   * map) to the projection event shape (ref `projection.go:55-80`).
   */
  def toProjEvents(events: DataFrame): Dataset[ProjEvent] = {
    val cols = events.columns.toSet
    val body: Column =
      if (cols("data")) col("data").cast("string")
      else if (cols("props")) col("props").cast("string")
      else lit("")
    val meta: Column =
      if (cols("metadata")) col("metadata")
      else typedLit(Map.empty[String, String])
    implicit val enc: Encoder[ProjEvent] = Encoders.product[ProjEvent]
    events
      .select(
        col("stream").as("streamId"),
        col("event_type").as("eventType"),
        lit(true).as("isJson"),
        coalesce(body, lit("")).as("bodyRaw"),
        meta.as("metadataRaw"),
        lit("").as("partition"),
        lit(-1L).as("sequenceNumber"),
        col("position").cast("long").as("position")
      )
      .as[ProjEvent]
  }

  /** Selector filter as a pushable Column predicate (ref `projection.go:96-119`). */
  private[graft] def selected(p: Projection[_], events: Dataset[ProjEvent]): Dataset[ProjEvent] =
    p.selector match {
      case SelectAll          => events
      case SelectStreams(ss)  => events.filter(col("streamId").isin(ss: _*))
    }

  /** Shuffle by fold key, externally sorted by (key, position). */
  private def keyedSorted[S](p: Projection[S], events: DataFrame): Dataset[KeyedEvent] = {
    implicit val enc: Encoder[KeyedEvent] = Encoders.product[KeyedEvent]
    val keyed = selected(p, toProjEvents(events)).map(e => KeyedEvent(p.partitionOf(e), e))
    val shuffled = if (p.isPartitioned) keyed.repartition(col("key")) else keyed.repartition(1)
    shuffled.sortWithinPartitions(col("key"), col("event.position"))
  }

  /**
   * Final state per partition key after folding all selected events in
   * position order. The batch analogue of reading the projection's state
   * (`Projections.State` in the reference wire surface).
   */
  def finalStates[S](p: Projection[S], events: DataFrame)(implicit enc: Encoder[S]): Dataset[(String, S)] = {
    implicit val outEnc: Encoder[(String, S)] = Encoders.tuple(Encoders.STRING, enc)
    keyedSorted(p, events).mapPartitions { base =>
      new Iterator[(String, S)] {
        private var pending: Option[(String, S)] = None
        private var curKey: String = _
        private var curState: Option[S] = None
        private var open = false // a group is in progress
        private def advance(): Unit = {
          while (pending.isEmpty && base.hasNext) {
            val ke = base.next()
            if (open && ke.key != curKey) {
              pending = curState.map((curKey, _))
              curState = None
            }
            curKey = ke.key
            open = true
            curState = Some(p.step(curState, ke.event)._1)
          }
          if (pending.isEmpty && !base.hasNext && open) {
            pending = curState.map((curKey, _))
            curState = None
            open = false
          }
        }
        def hasNext: Boolean = { advance(); pending.isDefined }
        def next(): (String, S) = {
          advance(); val r = pending.get; pending = None; r
        }
      }
    }
  }

  /**
   * [[finalStates]] plus each key's HIGH-WATER position (the last folded
   * event's) — the handoff shape for [[graft.streaming.ProjectionPump]]'s
   * hybrid catch-up: the streaming fold is seeded with (state, maxPos)
   * per key, so its cross-trigger order guard spans the batch/stream
   * boundary (a tail event at or below the catch-up's high water is
   * rejected exactly like an out-of-order file).
   */
  def finalStatesWithPos[S](p: Projection[S], events: DataFrame)(
      implicit enc: Encoder[S]): Dataset[(String, S, Long)] = {
    implicit val outEnc: Encoder[(String, S, Long)] =
      Encoders.tuple(Encoders.STRING, enc, Encoders.scalaLong)
    keyedSorted(p, events).mapPartitions { base =>
      new Iterator[(String, S, Long)] {
        private var pending: Option[(String, S, Long)] = None
        private var curKey: String = _
        private var curState: Option[S] = None
        private var curPos: Long = Long.MinValue
        private var open = false
        private def advance(): Unit = {
          while (pending.isEmpty && base.hasNext) {
            val ke = base.next()
            if (open && ke.key != curKey) {
              pending = curState.map((curKey, _, curPos))
              curState = None
              curPos = Long.MinValue
            }
            curKey = ke.key
            open = true
            curState = Some(p.step(curState, ke.event)._1)
            curPos = ke.event.position
          }
          if (pending.isEmpty && !base.hasNext && open) {
            pending = curState.map((curKey, _, curPos))
            curState = None
            open = false
          }
        }
        def hasNext: Boolean = { advance(); pending.isDefined }
        def next(): (String, S, Long) = {
          advance(); val r = pending.get; pending = None; r
        }
      }
    }
  }

  /**
   * Run MANY projections in ONE pass of the log — scan sharing the
   * reference cannot do (it folds each projection in its own
   * subscription, re-reading the log per projection;
   * `projections/service.go` starts one runner each). Here each event
   * fans out map-side to the projections whose selector matches, tagged
   * with that projection's OWN fold key, and a single shuffle on
   * (projection, key) delivers every fold's sorted run: at 100 TB, N
   * catalog projections cost one log read + one shuffle of the matched
   * events instead of N of each. Global-state projections ride the same
   * shuffle (constant key → one reducer group — exactly their
   * sequential-fold contract). Equivalence with the per-projection
   * runner is spec-pinned.
   */
  def finalStatesAll[S](ps: Seq[(String, Projection[S])], events: DataFrame)(
      implicit enc: Encoder[S]): Dataset[(String, String, S)] = {
    implicit val te: Encoder[TaggedEvent] = Encoders.product[TaggedEvent]
    implicit val outEnc: Encoder[(String, String, S)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING, enc)
    val local = ps.toVector
    val tagged = toProjEvents(events).flatMap { e =>
      local.iterator
        .filter { case (_, p) =>
          p.selector match {
            case SelectAll         => true
            case SelectStreams(ss) => ss.contains(e.streamId)
          }
        }
        .map { case (n, p) => TaggedEvent(n, p.partitionOf(e), e) }
    }
    val byName = local.toMap
    tagged
      .repartition(col("proj"), col("key"))
      .sortWithinPartitions(col("proj"), col("key"), col("event.position"))
      .mapPartitions { it =>
        var curProj: String = null
        var curKey: String = null
        var curState: Option[S] = None
        var open = false
        def closed(): Iterator[(String, String, S)] =
          if (open && curState.isDefined) Iterator.single((curProj, curKey, curState.get))
          else Iterator.empty
        val main = it.flatMap { tev =>
          val out =
            if (open && (tev.proj != curProj || tev.key != curKey)) closed()
            else Iterator.empty
          if (!open || tev.proj != curProj || tev.key != curKey) {
            curProj = tev.proj; curKey = tev.key; curState = None; open = true
          }
          curState = Some(byName(tev.proj).step(curState, tev.event)._1)
          out
        }
        main ++ closed()
      }
  }

  /**
   * Every state emission in fold order — the content of the projection's
   * result stream (`$projections-{name}-result`, ref `projection.go:135-141`)
   * honoring `filterBy` emit-gating (ref `projection_test.go:145-181`).
   */
  def emittedStates[S](p: Projection[S], events: DataFrame)(implicit enc: Encoder[S]): Dataset[(String, S)] = {
    implicit val outEnc: Encoder[(String, S)] = Encoders.tuple(Encoders.STRING, enc)
    keyedSorted(p, events).mapPartitions { it =>
      var curKey: String = null
      var curState: Option[S] = None
      var open = false
      it.flatMap { ke =>
        if (!open || ke.key != curKey) { curKey = ke.key; curState = None; open = true }
        val (s, fwd) = p.step(curState, ke.event)
        curState = Some(s)
        if (fwd) Iterator.single((ke.key, s)) else Iterator.empty
      }
    }
  }

  /**
   * Last emitted state per partition — the "current value" of the result
   * stream per partition (what a consumer of
   * `$projections-{name}-result` observes as the latest state).
   */
  def lastEmitted[S](p: Projection[S], events: DataFrame)(implicit enc: Encoder[S]): Dataset[(String, S)] = {
    implicit val outEnc: Encoder[(String, S)] = Encoders.tuple(Encoders.STRING, enc)
    keyedSorted(p, events).mapPartitions { base =>
      new Iterator[(String, S)] {
        private var pending: Option[(String, S)] = None
        private var curKey: String = _
        private var curState: Option[S] = None
        private var lastEmit: Option[S] = None
        private var open = false
        private def advance(): Unit = {
          while (pending.isEmpty && base.hasNext) {
            val ke = base.next()
            if (open && ke.key != curKey) {
              pending = lastEmit.map((curKey, _))
              curState = None; lastEmit = None
            }
            curKey = ke.key
            open = true
            val (s, fwd) = p.step(curState, ke.event)
            curState = Some(s)
            if (fwd) lastEmit = Some(s)
          }
          if (pending.isEmpty && !base.hasNext && open) {
            pending = lastEmit.map((curKey, _))
            curState = None; lastEmit = None; open = false
          }
        }
        def hasNext: Boolean = { advance(); pending.isDefined }
        def next(): (String, S) = {
          advance(); val r = pending.get; pending = None; r
        }
      }
    }
  }
}
