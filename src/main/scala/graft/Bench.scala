package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** JSON string escape (same contract as Verify's). */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def pass(record: Boolean): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            // a failed query must NOT look like a fast success
            if (record) errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    // one untimed warmup pass (JIT + codegen + shared fixture/signature
    // materialization), then the timed pass — steady-state numbers; the
    // warmup pass total is also reported as cold_total
    val cold = pass(record = false)
    val results = pass(record = true)
    val qs = results.map { case (k, v) => q(k) + ":" + v }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => q(k) + ":" + q(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val coldTotal = if (cold.nonEmpty) cold.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_errors":${errors.size},"sf":${q(sfDir)},"cold_total":$coldTotal}"""
    spark.stop()
    // last line on stdout, after Spark's shutdown chatter (which goes to
    // stderr) — the driver parses this line
    System.out.println(json)
    System.out.flush()
  }
}
