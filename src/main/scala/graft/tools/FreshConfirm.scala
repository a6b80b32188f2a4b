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
 *   {"query":"<name>","wall":<min-of-2 s>,"cpu":<min-of-2 cpu-s>}
 * (one untimed warmup pass first — JIT, codegen, memo builds — matching
 * the sweep's warm-floor semantics).
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def one(): (Double, Double) = {
      val w0 = System.nanoTime(); val c0 = cpuNs()
      fn(spark, sfDir).count()
      ((System.nanoTime() - w0) / 1e9, (cpuNs() - c0) / 1e9)
    }
    one() // warmup: JIT + codegen + per-(session, sf-dir) memo builds
    val (w1, c1) = one()
    val (w2, c2) = one()
    spark.stop()
    val w = math.min(w1, w2)
    val c = math.min(c1, c2)
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    System.out.println(s"""{"query":"$name","wall":${r3(w)},"cpu":${r3(c)}}""")
    System.out.flush()
  }
}
