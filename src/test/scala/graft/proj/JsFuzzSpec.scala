package graft.proj

import org.scalatest.funsuite.AnyFunSuite

import JsProjection.JsVal

/**
 * Grammar fuzz for the restricted-JS projection compiler — the largest
 * user-input surface in the repo. Two properties:
 *
 *  1. VALID programs (drawn from a seeded generator over the supported
 *     grammar: selectors, routing, $init/$any/typed handlers built from
 *     the statement pool, transformBy/filterBy/outputState chains)
 *     must compile, and two independent compiles must fold the same
 *     event sequence to identical emissions — the determinism the
 *     distributed runner depends on.
 *
 *  2. MUTATED sources (truncation, char deletion/insertion/substitution,
 *     slice duplication over those valid programs) must either still
 *     compile or reject with [[JsProjection.JsParseException]] — NEVER
 *     any other throwable. A stored-projection service feeds user text
 *     straight into compile(); an escaping NumberFormatException or
 *     IndexOutOfBounds would surface as an opaque 500 instead of the
 *     clean "invalid projection source" error.
 */
/** Seeded generator over the supported restricted-JS grammar — shared by
  * [[JsFuzzSpec]] (compile/reject totality) and [[JsDifferentialSpec]]
  * (local fold == distributed ProjectionBatch semantics). */
object JsFuzzGen {

  private val stmtPool = Vector(
    "state.c += 1",
    "state.c = state.c + 2",
    "if (event.eventType == 'tA') { state.c += 10 } else { state.c += 1 }",
    "var x = 3; state.c += x",
    "state.c = state.c > 100 ? state.c : state.c + 5",
    "for (var i = 0; i < 3; i++) { state.c += i }",
    "state.arr.push(event.eventType)",
    "state.s = state.s + '.'",
    "if (event.body != null && event.body.k != null) { state.c += event.body.k }",
    "state.c = Math.max(state.c, 7)",
    "var j = 0; while (j < 2) { j++; state.c += 1 }",
    "if (state.arr.length > 2) { state.c += state.arr.indexOf('tB') }"
  )

  private def body(rnd: scala.util.Random): String =
    Seq.fill(1 + rnd.nextInt(3))(stmtPool(rnd.nextInt(stmtPool.size)))
      .mkString("\n            ", "\n            ", "\n          ")

  def genProgram(rnd: scala.util.Random): String = {
    val selector = rnd.nextInt(3) match {
      case 0 => "fromAll()"
      case 1 => s"fromStream('s-${rnd.nextInt(3)}')"
      case _ => "fromStreams('s-0', 's-1')"
    }
    val routing = rnd.nextInt(3) match {
      case 0 => ""
      case 1 => "\n        .partitionBy(function(e) { return e.streamId })"
      case _ => "\n        .foreachStream()"
    }
    val typed = Seq("tA", "tB").filter(_ => rnd.nextBoolean())
    val any = if (typed.isEmpty || rnd.nextBoolean()) Seq("$any") else Seq.empty
    val handlers = (typed ++ any)
      .map(t => s"$t: function(state, event) {${body(rnd)}}")
      .mkString(",\n          ")
    val when =
      s"""
        .when({
          $$init: function() {
            return {c: 0, s: '', arr: []}
          },
          $handlers
        })"""
    val transform =
      if (rnd.nextBoolean())
        "\n        .transformBy(function(state) { return {c: state.c, s: state.s, arr: state.arr, extra: 1} })"
      else ""
    val filter =
      if (rnd.nextBoolean())
        "\n        .filterBy(function(state) { return state.c > 3 })"
      else ""
    val out = if (rnd.nextBoolean()) "\n        .outputState()" else ""
    s"$selector$routing$when$transform$filter$out"
  }
}

class JsFuzzSpec extends AnyFunSuite {
  import JsFuzzGen.genProgram

  private val events: Seq[ProjEvent] = (0 until 16).map { i =>
    val tpe = Seq("tA", "tB", "tC")(i % 3)
    val raw = if (i % 4 == 0) s"""{"k":${i % 5}}""" else s"plain-$i"
    ProjEvent(streamId = s"s-${i % 3}", eventType = tpe, bodyRaw = raw)
  }

  private def fold(src: String): Seq[Any] = {
    val compiled = JsProjection.compile(src, "fuzz")
    val runner = new LocalRunner(compiled.projection)
    events.map(e => runner.update(e).map(JsVal.toAny).orNull)
  }

  test("generated valid programs compile and fold deterministically") {
    (1 to 150).foreach { seed =>
      val src = genProgram(new scala.util.Random(seed * 7919L))
      val (a, b) =
        try (fold(src), fold(src))
        catch { case e: Throwable =>
          fail(s"valid program failed (${e.getClass.getSimpleName}: ${e.getMessage}):\n$src")
        }
      assert(a == b, s"non-deterministic fold for:\n$src")
    }
  }

  test("mutated/truncated sources reject cleanly: JsParseException or success, nothing else") {
    val alphabet = "{}()[]'\"$.,;+-=<>! abcdefwhilefor0123456789\n"
    var compiled = 0
    var rejected = 0
    (1 to 400).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729L)
      val src = genProgram(rnd)
      val mutant = rnd.nextInt(5) match {
        case 0 => src.take(rnd.nextInt(src.length)) // truncate
        case 1 => // delete a char
          val i = rnd.nextInt(src.length); src.take(i) + src.drop(i + 1)
        case 2 => // insert a char
          val i = rnd.nextInt(src.length)
          src.take(i) + alphabet(rnd.nextInt(alphabet.length)) + src.drop(i)
        case 3 => // substitute a char
          val i = rnd.nextInt(src.length)
          src.take(i) + alphabet(rnd.nextInt(alphabet.length)) + src.drop(i + 1)
        case _ => // duplicate a slice
          val i = rnd.nextInt(src.length)
          val j = math.min(src.length, i + 1 + rnd.nextInt(20))
          src.take(j) + src.substring(i, j) + src.drop(j)
      }
      try { JsProjection.compile(mutant, "fuzz"); compiled += 1 }
      catch {
        case _: JsProjection.JsParseException => rejected += 1
        case e: Throwable =>
          fail(s"non-JsParseException ${e.getClass.getName}: ${e.getMessage}\nsource:\n$mutant")
      }
    }
    // sanity: the mutator actually exercises both paths
    assert(rejected > 50, s"mutator too tame: $rejected rejections of 400")
    assert(compiled > 10, s"mutator too harsh: $compiled survivors of 400")
  }
}
