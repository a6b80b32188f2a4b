package graft.proj

import org.scalatest.funsuite.AnyFunSuite

/**
 * 1:1 port of the reference's projection DSL unit tests
 * (`/root/reference/internal/projections/projection_test.go`) against the
 * Scala DSL + LocalRunner. These pin the golden fold semantics
 * (SURVEY.md §5, FIXTURES.md §A3).
 */
class ProjectionSpec extends AnyFunSuite {

  case class Count(count: Long)
  case class CountAny(count: Long, anyCount: Long)
  case class CountExtra(count: Long, extraField: String)
  case class CountPart(count: Long, partition: String)

  // --- TestOptionsFunc (projection_test.go:19-56) ---
  test("options: default and custom result stream name") {
    val p = Projection
      .named("test")
      .options(ProjOptions(includeLinks = true, reorderEvents = false, processingLag = 10))
    assert(p.opts == ProjOptions("", includeLinks = true, reorderEvents = false, processingLag = 10))
    assert(p.resultStream == "$projections-test-result")

    val p2 = Projection
      .named("test")
      .options(ProjOptions(resultStreamName = "test_projection_result", includeLinks = true, processingLag = 10))
    assert(p2.resultStream == "test_projection_result")
  }

  // --- TestFromStreamSelector (projection_test.go:58-74) ---
  test("fromStream selector matches only its stream") {
    val sel = Projection.named("test").fromStream("test-stream").selector
    assert(sel == SelectStreams(Seq("test-stream")))
    assert(!sel.matches(""))
    assert(sel.matches("test-stream"))
  }

  // --- TestOutputState (projection_test.go:76-84) ---
  test("outputState sets the output flag") {
    val d = Projection.named("test").fromStream("test-stream").outputState()
    assert(d.outputFlag)
    val p = d.when[Count](Count(0), Map.empty).build
    assert(p.output)
  }

  // --- TestFromStreamWhen (projection_test.go:86-115) ---
  test("when: counting fold; unmatched type initializes but does not count") {
    val r = new LocalRunner(
      Projection
        .named("test")
        .fromStream("test-stream")
        .when[Count](
          Count(0),
          Map("testEvent" -> ((s: Count, _: ProjEvent) => s.copy(count = s.count + 1)))
        )
        .build
    )
    assert(r.update(ProjEvent(eventType = "invalid-type")) == Some(Count(0)))
    for (i <- 0 until 100)
      assert(r.update(ProjEvent(eventType = "testEvent")) == Some(Count(i + 1)))
  }

  // --- TestTransformBy (projection_test.go:117-143) ---
  test("transformBy rewrites every emitted (and stored) state") {
    val r = new LocalRunner(
      Projection
        .named("test")
        .fromStream("test-stream")
        .when[CountExtra](
          CountExtra(0, ""),
          Map("testEvent" -> ((s: CountExtra, _: ProjEvent) => s.copy(count = s.count + 1)))
        )
        .transformBy(s => s.copy(extraField = "extra-field"))
        .build
    )
    for (i <- 0 until 100)
      assert(r.update(ProjEvent(eventType = "testEvent")) == Some(CountExtra(i + 1, "extra-field")))
  }

  // --- TestFilterBy (projection_test.go:145-181) ---
  test("filterBy gates emission; state still advances; transform after filter skipped while suppressed") {
    val r = new LocalRunner(
      Projection
        .named("test")
        .fromStream("test-stream")
        .when[CountExtra](
          CountExtra(0, ""),
          Map("testEvent" -> ((s: CountExtra, _: ProjEvent) => s.copy(count = s.count + 1)))
        )
        .filterBy(_.count > 50)
        .transformBy(s => s.copy(extraField = "extra-field"))
        .build
    )
    for (_ <- 0 until 50)
      assert(r.update(ProjEvent(eventType = "testEvent")).isEmpty)
    for (i <- 0 until 50)
      assert(r.update(ProjEvent(eventType = "testEvent")) == Some(CountExtra(51 + i, "extra-field")))
  }

  // --- TestPartitionBy (projection_test.go:183-216) ---
  test("partitionBy: independent state per key; partition injected into event") {
    val r = new LocalRunner(
      Projection
        .named("test")
        .fromStream("test-stream")
        .partitionBy(_.eventType)
        .when[CountPart](
          CountPart(0, ""),
          Map("$any" -> ((s: CountPart, e: ProjEvent) =>
            s.copy(count = s.count + 1, partition = e.partition)))
        )
        .build
    )
    for (i <- 0 until 100) {
      val part = s"p-${i / 10}"
      assert(r.update(ProjEvent(eventType = part)) == Some(CountPart(i % 10 + 1, part)))
    }
    assert(r.states.size == 10)
  }

  // --- TestAnyEventHandler (projection_test.go:218-251) ---
  test("$any runs only when no specific handler matches") {
    val r = new LocalRunner(
      Projection
        .named("test")
        .fromStream("test-stream")
        .when[CountAny](
          CountAny(0, 0),
          Map(
            "$any" -> ((s: CountAny, _: ProjEvent) => s.copy(anyCount = s.anyCount + 1)),
            "testEvent" -> ((s: CountAny, _: ProjEvent) => s.copy(count = s.count + 1))
          )
        )
        .build
    )
    assert(r.update(ProjEvent(eventType = "testEvent")) == Some(CountAny(1, 0)))
    assert(r.update(ProjEvent(eventType = "testEvent1")) == Some(CountAny(1, 1)))
  }

  // --- selector-driven run (reference pump semantics) ---
  test("run() applies the selector filter before folding") {
    val p = Projection
      .named("test")
      .fromStream("s1")
      .when[Count](Count(0), Map("$any" -> ((s: Count, _: ProjEvent) => s.copy(count = s.count + 1))))
      .build
    val r = new LocalRunner(p)
    r.run(Seq(
      ProjEvent(streamId = "s1", eventType = "a", position = 1),
      ProjEvent(streamId = "s2", eventType = "a", position = 2),
      ProjEvent(streamId = "s1", eventType = "b", position = 3)
    ))
    assert(r.state == Some(Count(2)))
  }
}
