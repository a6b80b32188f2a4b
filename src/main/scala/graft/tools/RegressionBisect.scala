package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dev tool: bisect an isolation-confirmed bench regression against the
 * in-session environment. Round 9 built it for `snapshot_incremental`
 * (verdict: environmental, refuting the block-manager theory); round 10
 * confirmed six more >2x regressions whose code had not changed
 * (`dedup_clusters_ls`, `dedup_embedding_cosine`, `agg_sessions`,
 * `agg_funnel_time`, `sim_recall`, `sim_topk_twostage`), so the tool now
 * measures process-CPU time and host steal next to wall time — the
 * box's hypervisor steal is bimodal (same workload 5.1s clean / 15-28s
 * stolen) and stolen cycles never show up in process CPU, so
 * wall >> cpu/threads separates "the host was stolen" from "the query
 * really does more work now".
 *
 * Stages, all in ONE session (the bench's JVM shape):
 *
 *  1. fresh-JVM time of the query (warmup + min-of-2, every sample
 *     recorded with wall AND cpu) — nothing else loaded; this is the
 *     "historical best" regime;
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

  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.asInstanceOf[com.sun.management.OperatingSystemMXBean]

  /** (steal, total) jiffies from /proc/stat's aggregate cpu line. */
  private def stealJiffies(): (Long, Long) =
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
      val fs = line.trim.split("\\s+").drop(1).map(_.toLong)
      (if (fs.length > 7) fs(7) else 0L, fs.sum)
    } catch { case _: Throwable => (0L, 0L) }

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
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)

    // each sample: (wall_s, cpu_s)
    def one(): (Double, Double) = {
      val w0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      fn(spark, sfDir).count()
      ((System.nanoTime() - w0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
    }
    def samplesJson(ss: Seq[(Double, Double)]): String =
      ss.map { case (w, c) => s"""{"wall_s":${f(w)},"cpu_s":${f(c)}}""" }
        .mkString("[", ",", "]")

    val (s0, g0) = stealJiffies()
    val warm = one() // warmup (JIT/codegen + fixture load), kept on record
    val fresh = Seq(one(), one(), one())
    val (s1, g1) = stealJiffies()
    val tFresh = fresh.map(_._1).min
    System.err.println(f"[bisect] $name fresh-JVM min: ${f(tFresh)}s wall, ${f(fresh.map(_._2).min)}s cpu")

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
    val afterMemos = Seq(one(), one())
    val (s2, g2) = stealJiffies()
    val tAfterMemos = afterMemos.map(_._1).min
    System.err.println(f"[bisect] $name after Tables memos: ${f(tAfterMemos)}s")

    def stealPct(sa: Long, sb: Long, ga: Long, gb: Long): Double =
      if (gb > ga) 100.0 * (sb - sa) / (gb - ga) else 0.0

    // storage-state report: is anything (the fixture persist above all)
    // partially evicted?
    val storage = spark.sparkContext.getRDDStorageInfo.toSeq.map { i =>
      s"""{"id":${i.id},"name":${"\"" + String.valueOf(i.name).replace("\"", "'") + "\""},"parts_cached":${i.numCachedPartitions},"parts":${i.numPartitions},"mem_mb":${i.memSize / 1024 / 1024},"disk_mb":${i.diskSize / 1024 / 1024}}"""
    }
    val rt = Runtime.getRuntime
    val heapUsedMb = (rt.totalMemory() - rt.freeMemory()) / 1024 / 1024
    val json =
      s"""{"query":"$name","sf":"$sfDir","t_fresh_s":${f(tFresh)},"cpu_fresh_s":${f(fresh.map(_._2).min)},"t_after_memos_s":${f(tAfterMemos)},"cpu_after_memos_s":${f(afterMemos.map(_._2).min)},"ratio":${f(tAfterMemos / tFresh)},"warmup":${samplesJson(Seq(warm))},"fresh_samples":${samplesJson(fresh)},"after_memos_samples":${samplesJson(afterMemos)},"steal_fresh_pct":${f(stealPct(s0, s1, g0, g1))},"steal_after_memos_pct":${f(stealPct(s1, s2, g1, g2))},"heap_used_mb":$heapUsedMb,"storage":[${storage.mkString(",")}]}"""
    println(json)
    spark.stop()
  }
}
