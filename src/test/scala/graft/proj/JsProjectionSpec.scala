package graft.proj

import org.scalatest.funsuite.AnyFunSuite

import JsProjection.JsVal

/**
 * The reference's projection unit suite run against its OWN JavaScript
 * sources (`/root/reference/internal/projections/projection_test.go:19-251`,
 * all 8 cases, sources verbatim) — the compatibility contract: a stored
 * eventstorm projection source string compiles here unmodified and produces
 * the reference-pinned states. [[ProjectionSpec]] pins the same semantics
 * through the typed Scala DSL; this spec pins the JS ingestion path.
 */
class JsProjectionSpec extends AnyFunSuite {

  private def run(p: Projection[JsProjection.JsVal]) = new LocalRunner(p)

  private def ev(typ: String, stream: String = "", body: String = ""): ProjEvent =
    ProjEvent(streamId = stream, eventType = typ, bodyRaw = body)

  private def state(r: Option[JsProjection.JsVal]): Any =
    r.map(JsVal.toAny).orNull

  // --- TestOptionsFunc (projection_test.go:19-56) ---
  test("js: options() with defaults and with resultStreamName") {
    val p = JsProjection.compile(
      """
      options({
        $includeLinks:    true,
        reorderEvents:    false,
        processingLag:    10
      })
      """, "test")
    assert(p.options == ProjOptions("", includeLinks = true, reorderEvents = false, processingLag = 10))
    assert(p.resultStream == "$projections-test-result")
    assert(!p.output)

    val p2 = JsProjection.compile(
      """
      options({
        resultStreamName: "test_projection_result",
        $includeLinks:    true,
        reorderEvents:    false,
        processingLag:    10
      })
      """, "test")
    assert(p2.options == ProjOptions("test_projection_result",
      includeLinks = true, reorderEvents = false, processingLag = 10))
    assert(p2.resultStream == "test_projection_result")
    assert(!p2.output)
  }

  // --- TestFromStreamSelector (projection_test.go:58-74) ---
  test("js: fromStream selector matches only its stream") {
    val p = JsProjection.compile("fromStream('test-stream')", "test")
    assert(p.selector == SelectStreams(Seq("test-stream")))
    assert(!p.selector.matches(""))
    assert(p.selector.matches("test-stream"))
  }

  // --- TestOutputState (projection_test.go:76-84) ---
  test("js: outputState sets the output flag") {
    val p = JsProjection.compile(
      """
      fromStream('test-stream')
        .outputState()
      """, "test")
    assert(p.output)
  }

  // --- TestFromStreamWhen (projection_test.go:86-115) ---
  test("js: when with $init and a typed handler") {
    val p = JsProjection.compile(
      """
      fromStream('test-stream')
        .when({
          $init: function() {
            return {count: 0}
          },
          testEvent: function(state, event) {
            state.count += 1
          }
        })
      """, "test")
    val r = run(p.projection)

    // unknown type: state is initialized, unchanged, still emitted
    assert(state(r.update(ev("invalid-type"))) == Map("count" -> 0L))

    (1 to 100).foreach { i =>
      assert(state(r.update(ev("testEvent"))) == Map("count" -> i.toLong))
    }
  }

  // --- TestTransformBy (projection_test.go:117-143) ---
  test("js: transformBy rewrites the stored state (spread + extra field)") {
    val p = JsProjection.compile(
      """
      fromStream('test-stream')
        .when({
          $init: function() {
            return {count: 0}
          },
          testEvent: function(state, event) {
            state.count += 1
          }
        })
        .transformBy(function(state) {
          return {...state, extraField: 'extra-field'}
        })
      """, "test")
    val r = run(p.projection)
    (1 to 100).foreach { i =>
      assert(state(r.update(ev("testEvent"))) ==
        Map("count" -> i.toLong, "extraField" -> "extra-field"))
    }
  }

  // --- TestFilterBy (projection_test.go:145-181) ---
  test("js: filterBy gates emission while state keeps updating") {
    val p = JsProjection.compile(
      """
      fromStream('test-stream')
        .when({
          $init: function() {
            return {count: 0}
          },
          testEvent: function(state, event) {
            state.count += 1
          }
        })
        .filterBy(function(state) {
          return state.count > 50
        })
        .transformBy(function(state) {
          return {...state, extraField: 'extra-field'}
        })
      """, "test")
    val r = run(p.projection)
    (1 to 50).foreach { _ =>
      assert(r.update(ev("testEvent")).isEmpty)
    }
    (0 until 50).foreach { i =>
      assert(state(r.update(ev("testEvent"))) ==
        Map("count" -> (51L + i), "extraField" -> "extra-field"))
    }
  }

  // --- TestPartitionBy (projection_test.go:183-216) ---
  test("js: partitionBy routes state per key and injects event.partition") {
    val p = JsProjection.compile(
      """
      fromStream('test-stream')
        .partitionBy(function(e) {
          return e.eventType
        })
        .when({
          $init: function() {
            return { count: 0 }
          },
          $any: function(state, event) {
            state.count += 1
            state.partition = event.partition
          }
        })
      """, "test")
    assert(p.partitioned)
    val r = run(p.projection)
    (0 until 100).foreach { i =>
      val part = s"p-${i / 10}"
      assert(state(r.update(ev(part))) ==
        Map("count" -> (i % 10 + 1).toLong, "partition" -> part))
    }
  }

  // --- TestAnyEventHandler (projection_test.go:218-251) ---
  test("js: a typed handler takes precedence over $any") {
    val p = JsProjection.compile(
      """
      fromStream('test-stream')
        .when({
          $init: function() {
            return { count: 0, anyCount: 0 }
          },
          $any: function(state, event) {
            state.anyCount += 1
          },
          testEvent: function(state, event) {
            state.count += 1
          }
        })
      """, "test")
    val r = run(p.projection)
    assert(state(r.update(ev("testEvent"))) == Map("count" -> 1L, "anyCount" -> 0L))
    assert(state(r.update(ev("testEvent1"))) == Map("count" -> 1L, "anyCount" -> 1L))
  }

  // --- beyond the ported suite: handler access to the JSON body and
  //     conditionals, the shape real stored projections use ---
  test("js: body field reads, if/else, and string/number semantics") {
    val p = JsProjection.compile(
      """
      fromAll()
        .foreachStream()
        .when({
          $init: function() { return { sum: 0, big: 0, last: '' } },
          $any: function(state, event) {
            state.sum += event.body.k
            if (event.body.k >= 5) {
              state.big += 1
            } else {
              state.big += 0
            }
            state.last = event.eventType + '!'
          }
        })
      """, "p")
    val r = run(p.projection)
    r.update(ev("a", "s", """{"k": 3}"""))
    r.update(ev("b", "s", """{"k": 7}"""))
    val got = state(r.update(ev("c", "s", """{"nope": 1}""")))
    assert(got == Map("sum" -> 10L, "big" -> 1L, "last" -> "c!"))
  }

  test("js: filterBy forwards only on an actual boolean true (goja type assertion)") {
    // projection.go:236 — `forward, _ := filterFunc.Call(...).(bool)`:
    // a non-boolean result means forward=false, not truthiness
    val p = JsProjection.compile(
      """
      fromAll()
        .when({
          $init: function() { return { n: 0 } },
          $any: function(state, event) { state.n += 1 }
        })
        .filterBy(function(state) { return state.n })
      """, "p")
    val r = run(p.projection)
    assert(r.update(ev("x")).isEmpty) // n=1 is truthy but NOT boolean true
  }

  test("js: partitionBy with a non-string result keys to empty (goja type assertion)") {
    // projection.go:266 — `partition, _ := partitionFunc.Call(...).(string)`
    val p = JsProjection.compile(
      """
      fromAll()
        .partitionBy(function(e) { return 42 })
        .when({
          $init: function() { return { n: 0 } },
          $any: function(state, event) { state.n += 1 }
        })
      """, "p")
    val r = run(p.projection)
    r.update(ev("x"))
    assert(state(r.stateOf("")) == Map("n" -> 1L))
  }

  test("js: local vars, compound local assignment, and ternaries") {
    val p = JsProjection.compile(
      """
      fromAll()
        .when({
          $init: function() { return { n: 0, grade: '' } },
          $any: function(state, event) {
            var bump = event.body.k >= 5 ? 2 : 1
            bump += 1
            state.n += bump
            state.grade = state.n > 4 ? 'high' : 'low'
          }
        })
      """, "p")
    val r = run(p.projection)
    r.update(ev("a", "s", """{"k": 9}""")) // bump 2+1=3
    val got = state(r.update(ev("b", "s", """{"k": 1}"""))) // bump 1+1=2 -> n=5
    assert(got == Map("n" -> 5L, "grade" -> "high"))
  }

  test("js: handler-level log() is a no-op; Math.max/min/abs/floor work") {
    val p = JsProjection.compile(
      """
      fromAll()
        .when({
          $init: function() { return { hi: 0, lo: 0 } },
          $any: function(state, event) {
            log('seen', event.eventType)
            state.hi = Math.max(state.hi, event.body.k)
            state.lo = Math.min(state.lo - 0, Math.abs(-3), Math.floor(2.9))
          }
        })
      """, "p")
    val r = run(p.projection)
    r.update(ev("a", "s", """{"k": 4}"""))
    val got = state(r.update(ev("b", "s", """{"k": 2}""")))
    assert(got == Map("hi" -> 4L, "lo" -> 0L))
  }

  test("js: for loops, ++, break/continue over a body array") {
    val p = JsProjection.compile(
      """
      fromAll()
        .when({
          $init: function() { return { sum: 0, firstBig: -1, n: 0 } },
          $any: function(state, event) {
            var xs = event.body.xs
            for (var i = 0; i < xs.length; i++) {
              if (xs[i] < 0) continue
              state.sum += xs[i]
              if (xs[i] >= 10 && state.firstBig == -1) { state.firstBig = i; break }
            }
            var j = 0
            while (j < 2) { state.n++; j++ }
          }
        })
      """, "p")
    val r = run(p.projection)
    // xs = [3, -1, 12, 100]: sum 3+12=15, stop at index 2, while adds 2
    val got = state(r.update(ev("a", "s", """{"xs": [3, -1, 12, 100]}""")))
    assert(got == Map("sum" -> 15L, "firstBig" -> 2L, "n" -> 2L))
  }

  test("js: array literals, push/pop/indexOf/includes/join/slice, index writes") {
    val p = JsProjection.compile(
      """
      fromAll()
        .when({
          $init: function() { return { tags: [], head: '', idx: 0, has: false, joined: '', cell: 0 } },
          $any: function(state, event) {
            var a = [10, 20, 30]
            a[1] = 25          // index write
            a[1] += 1          // compound index write
            a.push(event.body.k)
            state.cell = a[1]
            state.idx = a.indexOf(30)
            state.has = a.includes(26)
            state.joined = a.slice(1, 3).join('-')
            state.tags = a
            state.head = '' + a[0]
          }
        })
      """, "p")
    val r = run(p.projection)
    val got = state(r.update(ev("a", "s", """{"k": 40}""")))
    assert(got == Map(
      "tags" -> Vector(10L, 26L, 30L, 40L), "head" -> "10", "idx" -> 2L,
      "has" -> true, "joined" -> "26-30", "cell" -> 26L))
  }

  test("js: runaway loop in a handler fails instead of wedging the task") {
    val p = JsProjection.compile(
      """
      fromAll()
        .when({
          $init: function() { return { n: 0 } },
          $any: function(state, event) { while (true) { state.n += 1 } }
        })
      """, "p")
    val r = run(p.projection)
    intercept[JsProjection.JsParseException] {
      r.update(ev("a", "s", "{}"))
    }
  }

  test("js: rejects source outside the restricted subset") {
    intercept[JsProjection.JsParseException] {
      JsProjection.compile("while (true) { fromAll() }", "p")
    }
    intercept[JsProjection.JsParseException] {
      JsProjection.compile("fromAll().somethingElse()", "p")
    }
  }
}
