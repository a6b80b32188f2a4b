package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared helpers for specs that need a canonical parquet log on disk. */
object StreamingSpecHelpers {
  /** Write (stream, uuid, event_type, revision, position) rows as a
    * canonical log (metadata/data columns omitted — optional for reads). */
  def writeCanonical(spark: SparkSession, dir: String,
                     rows: Seq[(String, String, String, Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("stream", "uuid", "event_type", "revision", "position")
      .write.mode("append").parquet(dir)
  }
}
