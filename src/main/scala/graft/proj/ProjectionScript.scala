package graft.proj

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/**
 * Serializable projection descriptor — the storable form that closes the
 * reference's create→store→run lifecycle: the reference persists JS source
 * and compiles it per run (`/root/reference/internal/projections/
 * projection.go:363-373`, stored via `projections/service.go:20-28`); here
 * the [[Catalog]] stores this JSON descriptor and [[ProjectionScript.compile]]
 * turns it into a runnable [[Projection]] (batch via [[ProjectionBatch]],
 * live via [[graft.streaming.ProjectionPump]]).
 *
 * The state is a counter bag (`Map[String, Long]`) and the op vocabulary
 * covers the reference's projection test surface (count, dispatch by type,
 * JSON-field sums, threshold filters, state rewrites):
 *
 * {{{
 * { "name": "clicks",
 *   "from": ["$all"],                       // or explicit stream names
 *   "partitionBy": "stream",                // "stream" | "eventType" | "none"
 *   "state": ["clicks", "total"],           // counter fields, init 0
 *   "when": {                               // eventType -> ops ($any fallback)
 *     "click": [{"op": "inc", "field": "clicks"}],
 *     "$any":  [{"op": "inc", "field": "total"}]
 *   },
 *   "steps": [                              // post-when chain, declaration order
 *     {"step": "filterBy", "field": "total", "cmp": "gt", "value": 60},
 *     {"step": "transformBy", "op": "set", "field": "x", "value": 1}
 *   ],
 *   "outputState": true,
 *   "options": {"resultStreamName": "r"} }
 * }}}
 *
 * Handler ops: `inc` (optional `by`), `addJsonInt` (add an integer field of
 * the event body, `key`), `set`, `max`, `min` (of `value`). Step `cmp`:
 * `gt|ge|lt|le|eq` against `value`. Unknown fields read as 0, like a JS
 * projection reading an uninitialized counter as falsy.
 */
object ProjectionScript {

  type Bag = Map[String, Long]

  private val mapper = new ObjectMapper()

  /** Render a descriptor-shaped JSON for [[Catalog.save]] (identity here —
    * validation only: parse must succeed). */
  def validated(json: String): String = { parse(json); json }

  private def parse(json: String): JsonNode = {
    val n = mapper.readTree(json)
    require(n != null && n.isObject, "projection script: not a JSON object")
    require(n.hasNonNull("name"), "projection script: missing 'name'")
    require(n.hasNonNull("when"), "projection script: missing 'when'")
    n
  }

  // {"k": 42}-style body access (the reference handler's e.Json() reads,
  // model.go:47-58) — schema-on-read, non-numeric/absent → 0
  private def jsonInt(bodyRaw: String, key: String): Long = {
    val m = ("\"" + java.util.regex.Pattern.quote(key) + "\"\\s*:\\s*(-?\\d+)").r
    m.findFirstMatchIn(bodyRaw).map(_.group(1).toLong).getOrElse(0L)
  }

  private def handlerOps(ops: JsonNode): (Bag, ProjEvent) => Bag = {
    val compiled: Seq[(Bag, ProjEvent) => Bag] = ops.elements().asScala.map { op =>
      val field = op.path("field").asText()
      op.path("op").asText() match {
        case "inc" =>
          val by = if (op.hasNonNull("by")) op.get("by").asLong() else 1L
          (st: Bag, _: ProjEvent) => st.updated(field, st.getOrElse(field, 0L) + by)
        case "addJsonInt" =>
          val key = op.path("key").asText()
          (st: Bag, e: ProjEvent) => st.updated(field, st.getOrElse(field, 0L) + jsonInt(e.bodyRaw, key))
        case "set" =>
          val v = op.path("value").asLong()
          (st: Bag, _: ProjEvent) => st.updated(field, v)
        case "max" =>
          val v = op.path("value").asLong()
          (st: Bag, _: ProjEvent) => st.updated(field, math.max(st.getOrElse(field, 0L), v))
        case "min" =>
          val v = op.path("value").asLong()
          (st: Bag, _: ProjEvent) => st.updated(field, math.min(st.getOrElse(field, 0L), v))
        case other => throw new IllegalArgumentException(s"projection script: unknown op '$other'")
      }
    }.toSeq
    (st, e) => compiled.foldLeft(st)((s, f) => f(s, e))
  }

  private def cmp(kind: String): (Long, Long) => Boolean = kind match {
    case "gt" => _ > _
    case "ge" => _ >= _
    case "lt" => _ < _
    case "le" => _ <= _
    case "eq" => _ == _
    case other => throw new IllegalArgumentException(s"projection script: unknown cmp '$other'")
  }

  /** Compile a stored descriptor into a runnable [[Projection]]. */
  def compile(json: String): Projection[Bag] = {
    val n = parse(json)
    val name = n.get("name").asText()

    val fromNode = n.path("from")
    val streams =
      if (fromNode.isArray) fromNode.elements().asScala.map(_.asText()).toSeq else Seq("$all")
    val sel0 =
      if (streams.isEmpty || streams.contains("$all")) ProjectionDef(name, ProjOptions()).fromAll()
      else ProjectionDef(name, ProjOptions()).fromStreams(streams: _*)

    val opts = {
      val o = n.path("options")
      ProjOptions(resultStreamName = o.path("resultStreamName").asText(""))
    }

    val sel1 = n.path("partitionBy").asText("none") match {
      case "stream"    => sel0.foreachStream()
      case "eventType" => sel0.partitionBy(_.eventType)
      case "none" | "" => sel0
      case other => throw new IllegalArgumentException(s"projection script: unknown partitionBy '$other'")
    }

    val initFields = n.path("state").elements().asScala.map(_.asText()).toSeq
    val init: Bag = initFields.map(_ -> 0L).toMap

    val whenNode = n.get("when")
    val handlers: Map[String, (Bag, ProjEvent) => Bag] =
      whenNode.fieldNames().asScala.map(k => k -> handlerOps(whenNode.get(k))).toMap

    var when = sel1.copy(opts = opts).when[Bag](init, handlers)
    n.path("steps").elements().asScala.foreach { s =>
      s.path("step").asText() match {
        case "filterBy" =>
          val field = s.path("field").asText()
          val op = cmp(s.path("cmp").asText())
          val v = s.path("value").asLong()
          when = when.filterBy(st => op(st.getOrElse(field, 0L), v))
        case "transformBy" =>
          val f = handlerOps(mapper.createArrayNode().add(s.deepCopy[JsonNode]()))
          when = when.transformBy(st => f(st, ProjEvent()))
        case other => throw new IllegalArgumentException(s"projection script: unknown step '$other'")
      }
    }
    if (n.path("outputState").asBoolean(false)) when = when.outputState()
    when.build
  }
}
