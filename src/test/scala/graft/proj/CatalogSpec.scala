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
}
