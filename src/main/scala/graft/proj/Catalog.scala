package graft.proj

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/**
 * Projection catalog — the `(name, query)` store
 * (`/root/reference/internal/backend/backend.go:291-309`, proto surface
 * `Projections.Create/Update` §2.9). A tiny parquet-backed metadata table
 * with last-writer-wins upsert.
 *
 * NB the reference's `GetProjectionByName` has a bug (`SELECT query WHERE
 * name = $1` without `FROM projections`, backend.go:304) — not replicated
 * (SURVEY §2.1 S7).
 *
 * The stored `query` is the projection's source text in whatever DSL the
 * deployment uses (the reference stores JS; here typically the Scala
 * builder expression or a serialized description). The catalog is
 * deliberately dumb storage — compilation/wiring is [[Projection]] +
 * [[graft.streaming.ProjectionPump]].
 */
object Catalog {

  val schema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("query", StringType, nullable = false),
    StructField("updated_at", LongType, nullable = false)
  ))

  private def read(spark: SparkSession, dir: String) =
    graft.util.ParquetDirs.readOrEmpty(spark, dir, schema)

  /** Upsert a projection (ref `SaveProjection`: INSERT … ON CONFLICT DO
    * UPDATE, backend.go:292-300). Last writer wins via `updated_at`. */
  def save(spark: SparkSession, dir: String, name: String, query: String,
           nowNanos: Long = System.nanoTime()): Unit = {
    import spark.implicits._
    // append-only storage; readers resolve the latest version (merge-on-read)
    Seq((name, query, nowNanos)).toDF("name", "query", "updated_at")
      .write.mode("append").parquet(dir)
  }

  /** Fetch a projection's query by name, None if absent
    * (ref `GetProjectionByName`, backend.go:302-309 — with the missing
    * FROM fixed). */
  def get(spark: SparkSession, dir: String, name: String): Option[String] = {
    import org.apache.spark.sql.functions._
    read(spark, dir)
      .filter(col("name") === name)
      .orderBy(col("updated_at").desc)
      .limit(1)
      .collect()
      .headOption
      .map(_.getString(1))
  }

  /** All current projections (latest version per name). */
  def list(spark: SparkSession, dir: String): Map[String, String] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("name").orderBy(col("updated_at").desc)
    read(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("name", "query")
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
  }
}
