package graft.queries

import graft.SparkSpec

/**
 * Degenerate-input sweep: every gate query must EXECUTE (no exception)
 * against an empty corpus — all ten tables present with the production
 * schemas and zero rows. At 100 TB the empty slice is not an edge case,
 * it is Tuesday: a new tenant, a filtered-out day partition, a dry
 * source. A query that throws on zero rows (divide-by-zero on a count,
 * `.head` on an empty aggregate, a collect-fed build step) fails the
 * whole pipeline run instead of producing an empty result.
 *
 * The empty tables are derived from the real fixture via `limit(0)`, so
 * schema parity with the driver's testdata is by construction, not by
 * hand-maintained DDL. Row counts are NOT asserted (0 rows out is the
 * usual right answer; a handful of panel queries legitimately emit
 * constant-shaped rows) — only that execution completes.
 */
class EmptyInputSpec extends SparkSpec {

  private val srcDir = "/root/testdata/sf0.001"

  private lazy val emptyDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  private lazy val oneRowDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-one").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet").limit(1)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  private def sweep(dir: String): Unit = {
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, dir).collect(); () }
      catch { case e: Throwable =>
        failures += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}"
      }
    }
    assert(failures.isEmpty,
      failures.map { case (n, m) => s"\n  $n -> $m" }.mkString)
  }

  test("every gate query executes on an empty corpus") { sweep(emptyDir) }

  // one row per table: aggregates of one, windows with no neighbor,
  // single-vertex graphs, self-only similarity
  test("every gate query executes on a single-row corpus") { sweep(oneRowDir) }
}
