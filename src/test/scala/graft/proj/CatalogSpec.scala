package graft.proj

import java.nio.file.Files

import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  test("save/get/list with last-writer-wins upsert (backend.go:291-309)") {
    val dir = Files.createTempDirectory("graft-catalog").toString
    assert(Catalog.get(spark, dir, "missing").isEmpty)
    Catalog.save(spark, dir, "p1", "fromStream('s').when(...)", nowNanos = 100L)
    Catalog.save(spark, dir, "p2", "fromAll().when(...)", nowNanos = 200L)
    assert(Catalog.get(spark, dir, "p1") == Some("fromStream('s').when(...)"))
    // upsert: newer version wins
    Catalog.save(spark, dir, "p1", "fromStream('s2').when(...)", nowNanos = 300L)
    assert(Catalog.get(spark, dir, "p1") == Some("fromStream('s2').when(...)"))
    assert(Catalog.list(spark, dir) ==
      Map("p1" -> "fromStream('s2').when(...)", "p2" -> "fromAll().when(...)"))
  }

  test("stored descriptor round-trip: save → get → compile → run (service.go:20-28)") {
    val dir = Files.createTempDirectory("graft-catalog-rt").toString
    val script =
      """{"name":"rt","from":["a","b"],"partitionBy":"stream",
        |"state":["clicks","others","k"],
        |"when":{"click":[{"op":"inc","field":"clicks"},
        |                 {"op":"addJsonInt","field":"k","key":"k"}],
        |        "$any":[{"op":"inc","field":"others"}]},
        |"steps":[{"step":"filterBy","field":"clicks","cmp":"ge","value":1}],
        |"outputState":true,
        |"options":{"resultStreamName":"rt-out"}}""".stripMargin
    Catalog.save(spark, dir, "rt", ProjectionScript.validated(script))
    val p = ProjectionScript.compile(Catalog.get(spark, dir, "rt").get)
    assert(p.name == "rt" && p.output && p.resultStream == "rt-out")
    assert(p.selector == SelectStreams(Seq("a", "b")))

    val runner = new LocalRunner(p)
    // selector drops stream c; specific handler wins over $any; filterBy
    // gates emissions until a click is seen
    val e1 = runner.update(ProjEvent(streamId = "a", eventType = "view", bodyRaw = "{}"))
    assert(e1.isEmpty) // no click yet -> suppressed
    val e2 = runner.update(ProjEvent(streamId = "a", eventType = "click", bodyRaw = """{"k":5}"""))
    assert(e2 == Some(Map("clicks" -> 1L, "others" -> 1L, "k" -> 5L)))
    runner.run(Seq(
      ProjEvent(streamId = "c", eventType = "click", bodyRaw = """{"k":9}"""), // filtered by selector
      ProjEvent(streamId = "b", eventType = "click", bodyRaw = """{"k":2}""")
    ))
    assert(runner.stateOf("a") == Some(Map("clicks" -> 1L, "others" -> 1L, "k" -> 5L)))
    assert(runner.stateOf("b") == Some(Map("clicks" -> 1L, "others" -> 0L, "k" -> 2L)))
    assert(runner.stateOf("c").isEmpty)

    // malformed scripts are rejected at save time
    intercept[IllegalArgumentException](ProjectionScript.validated("""["not an object"]"""))
    intercept[IllegalArgumentException](
      ProjectionScript.compile("""{"name":"x","when":{"t":[{"op":"nope","field":"f"}]}}"""))
  }
}
