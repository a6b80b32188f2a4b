package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dev tool: bisect an isolation-confirmed bench regression against the
 * in-session environment, per the round-9 review of
 * `snapshot_incremental` (isolated 0.604s vs historical best 0.135s at
 * sf0.1 with the query's code and plan unchanged — so the slowdown must
 * be environmental *within the JVM*, and the suspect is block-manager
 * occupancy from the round-9 `Tables` memo additions).
 *
 * Stages, all in ONE session (the bench's JVM shape):
 *
 *  1. fresh-JVM time of the query (warmup + min-of-2) — nothing else
 *     loaded; this is the "historical best" regime;
 *  2. materialize every [[graft.queries.Tables]] memo (the shared
 *     signature/posting/banded-state tables a full sweep loads), then
 *     re-time — if the time jumps here, the memos' cached blocks are
 *     the cause (eviction of the query's own `Fixture.events` persist,
 *     or GC/block-manager pressure);
 *  3. report the storage state: every cached RDD with its cached
 *     fraction, so an evicted fixture cache is visible directly.
 *
 * Usage: `sbt "runMain graft.tools.RegressionBisect [query] [sfDir]"`
 * (honors SPARK_GRAFT_CPUS; prints one JSON line for the record).
 */
object RegressionBisect {

  private def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "snapshot_incremental"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)

    def time2(): Double = {
      fn(spark, sfDir).count() // warmup (JIT/codegen + fixture load)
      def one(): Double = {
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(one(), one())
    }

    val tFresh = time2()
    System.err.println(f"[bisect] $name fresh-JVM: ${f(tFresh)}s")

    // load every sweep-shared memo, as a full bench pass would
    val memoLoads: Seq[(String, () => Long)] = Seq(
      "shingleSets" -> (() => graft.queries.Tables.shingleSets(spark, sfDir).count()),
      "simhashSigs" -> (() => graft.queries.Tables.simhashSigs(spark, sfDir).count()),
      "simhashWideSigs" -> (() => graft.queries.Tables.simhashWideSigs(spark, sfDir).count()),
      "winnowPostings" -> (() => graft.queries.Tables.winnowPostings(spark, sfDir).count()),
      "normedEmb" -> (() => graft.queries.Tables.normedEmb(spark, sfDir).count()),
      "spanPostings" -> (() => graft.queries.Tables.spanPostings(spark, sfDir).count()),
      "docLines" -> (() => graft.queries.Tables.docLines(spark, sfDir).count()),
      "oldSets" -> (() => graft.queries.Tables.oldSets(spark, sfDir).count()),
      "oldBanded" -> (() => graft.queries.Tables.oldBanded(spark, sfDir).count()),
      "oldLabels" -> (() => graft.queries.Tables.oldLabels(spark, sfDir).count()))
    memoLoads.foreach { case (n, load) =>
      System.err.println(s"[bisect] loading memo $n: ${load()} rows")
    }
    val tAfterMemos = time2()
    System.err.println(f"[bisect] $name after Tables memos: ${f(tAfterMemos)}s")

    // storage-state report: is anything (the fixture persist above all)
    // partially evicted?
    val storage = spark.sparkContext.getRDDStorageInfo.toSeq.map { i =>
      s"""{"id":${i.id},"name":${"\"" + String.valueOf(i.name).replace("\"", "'") + "\""},"parts_cached":${i.numCachedPartitions},"parts":${i.numPartitions},"mem_mb":${i.memSize / 1024 / 1024},"disk_mb":${i.diskSize / 1024 / 1024}}"""
    }
    val rt = Runtime.getRuntime
    val heapUsedMb = (rt.totalMemory() - rt.freeMemory()) / 1024 / 1024
    val json =
      s"""{"query":"$name","sf":"$sfDir","t_fresh_s":${f(tFresh)},"t_after_memos_s":${f(tAfterMemos)},"ratio":${f(tAfterMemos / tFresh)},"heap_used_mb":$heapUsedMb,"storage":[${storage.mkString(",")}]}"""
    println(json)
    spark.stop()
  }
}
