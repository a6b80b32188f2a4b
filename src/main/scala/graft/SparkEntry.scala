package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.log.{EventLog, Fixture}
import graft.model._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-domain query packs under graft.queries. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A bounded filtered $all read — the reference's main query shape
    * (SURVEY.md §3.1). */
  def entry(spark: SparkSession): DataFrame =
    EventLog.read(
      Fixture.events(spark, "/root/testdata/sf0.001"),
      ReadOptions(
        AllStreams,
        Forwards,
        From(1),
        count = Some(100),
        filter = Some(PrefixFilter(OnEventType, Seq("s", "cl")))
      )
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.LogQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.SeriesQueries.queries ++
      graft.queries.ProjectionQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.StoreQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.LogQueries.oracles ++
      graft.queries.RelationalQueries.oracles ++
      graft.queries.AnalyticsQueries.oracles ++
      graft.queries.SeriesQueries.oracles ++
      graft.queries.ProjectionQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.SimQueries.oracles ++
      graft.queries.CorpusQueries.oracles ++
      graft.queries.MultimodalQueries.oracles ++
      graft.queries.StoreQueries.oracles
}
