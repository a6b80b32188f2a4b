package graft.log

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Catalog-registered BUCKETED tables — the co-located-join layout for
 * derived stores that are repeatedly joined or re-aggregated on the same
 * key (SURVEY §4's shuffle-avoidance list). Where [[PartitionedLog]] is
 * the *directory*-partitioned raw log (prunes single-stream scans),
 * bucketed tables carry their hash distribution in the catalog, so
 * Catalyst plans joins and aggregations on the bucket key with NO
 * exchange on either side: at 100 TB the event log joins its snapshot /
 * per-stream state table with zero shuffle — the dominant cost of the
 * naive plan — and per-stream aggregation reuses the layout the same way.
 *
 * The two layouts compose: raw log directory-partitioned for stream
 * pruning; derived per-key stores bucketed for shuffle-free re-joining.
 */
object BucketedLog {

  /** Persist `df` as a managed parquet table bucketed (and sorted) by
    * `key` — one-time shuffle now, zero shuffles for every later join or
    * aggregation on `key` against any table bucketed the same way. */
  def save(df: DataFrame, table: String, key: String, nBuckets: Int = 64,
           sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  /** The bucketed table back as a DataFrame (bucket metadata attached —
    * plans on the bucket key skip their exchanges). */
  def open(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
