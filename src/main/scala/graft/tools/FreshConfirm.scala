package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Fresh-JVM single-query confirmation — the escalation stage of the
 * bench regression ratchet. A long-lived sweep JVM bleeds concurrent-GC
 * and background CPU into per-query process-CPU attribution in
 * proportion to wall time, which makes in-sweep CPU readings
 * unconfirmable for low-parallelism queries (a serial query can regress
 * 10x while its cpu excess stays inside any wall-scaled bleed
 * allowance). A FRESH JVM has no sweep bleed: its CPU reading needs
 * only a small absolute allowance (~0.5 cpu-s of startup/GC noise), so
 * it can confirm or clear a flag at EVERY effective parallelism.
 * `Bench` spawns this main for each flag whose isolated in-sweep excess
 * falls inside the bleed bound, instead of auto-clearing it.
 *
 * Prints exactly one JSON line on stdout:
 *   {"query":"<name>","wall":<settled s>,"cpu":<settled cpu-s>,
 *    "cold_wall":<first-pass s>,"cold_cpu":<first-pass cpu-s>}
 * The settled pair is the floor reading (one untimed warmup pass first —
 * JIT, codegen, memo builds — matching the sweep's warm-floor
 * semantics); the cold pair is the very FIRST execution of the query in
 * this JVM, recorded so every escalation also contributes a clean
 * fresh-JVM data point to the COLD axis (on a real cluster cold is the
 * common case, and the sweep's own cold pass is confounded by the 244
 * queries compiling around it).
 *
 * Usage: `java -cp <bench classpath> graft.tools.FreshConfirm <query> <sfDir>`
 */
object FreshConfirm {

  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.asInstanceOf[com.sun.management.OperatingSystemMXBean]
  private def cpuNs(): Long = osBean.getProcessCpuTime

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FreshConfirm <query> <sfDir>")
    val name = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // match Bench's codegen cache so fresh-JVM confirms measure the
      // same regime the sweep runs in
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def one(): (Double, Double) = {
      val w0 = System.nanoTime(); val c0 = cpuNs()
      fn(spark, sfDir).count()
      ((System.nanoTime() - w0) / 1e9, (cpuNs() - c0) / 1e9)
    }
    val (coldW, coldC) = one() // warmup: JIT + codegen + per-(session,
    // sf-dir) memo builds — recorded as the fresh-JVM COLD reading
    // SETTLE before sampling: background C2 compiler threads keep
    // burning process CPU long after startup (compiling Spark itself),
    // and for a SUB-SECOND query that churn dominates every sample in
    // the min-of-10 budget (a 0.65 cpu-s query read 7.4 cpu-s fresh
    // while its wall time sat at its floor). Idle-interval burn is the
    // direct signal: sleep 250ms slices until an idle slice shows under
    // half a thread of background CPU (or give up after 90s) — only
    // then is a process-CPU sample attributable to the query.
    locally {
      val deadline = System.nanoTime() + 90L * 1000000000L
      var settled = false
      while (!settled && System.nanoTime() < deadline) {
        val c0 = cpuNs()
        Thread.sleep(250)
        settled = (cpuNs() - c0) / 1e9 < 0.125 // < 0.5 cpu-s per wall-s
      }
    }
    // a fresh JVM's C2 compiler threads bleed into process CPU for the
    // first many executions (a 1-cpu-s query can read 30+ cpu-s on pass
    // 2), so keep sampling until the min stops improving — the settled
    // min is the comparable floor reading, not the first sample
    var w = Double.MaxValue
    var c = Double.MaxValue
    var stale = 0
    var pass = 0
    while (pass < 10 && stale < 2) {
      val (wi, ci) = one()
      if (ci < c * 0.97) stale = 0 else stale += 1
      w = math.min(w, wi)
      c = math.min(c, ci)
      pass += 1
    }
    spark.stop()
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    System.out.println(s"""{"query":"$name","wall":${r3(w)},"cpu":${r3(c)},"cold_wall":${r3(coldW)},"cold_cpu":${r3(coldC)}}""")
    System.out.flush()
  }
}
