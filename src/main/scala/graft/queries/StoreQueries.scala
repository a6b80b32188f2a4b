package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.log.Fixture
import graft.streaming.ParquetTwinStore

/**
 * Gate coverage for the [[graft.streaming.ParquetTwinStore]] RESOLUTION
 * itself — the engine's most load-bearing streaming-state mechanism
 * (every curation/ANN/cluster twin's merged tables ride it). The store
 * is spec- and fuzz-pinned (`TwinStoreSpec`), but those pins live in
 * the test suite; this query puts the merge-on-read semantics under the
 * driver's DuckDB oracle too, so a regression in last-writer-wins
 * ordering, tombstone sequencing or re-insert-after-delete would land
 * as a CORRECTNESS failure, not only a test failure.
 *
 * Shape: the canonical event log deterministically compiles to an
 * ACTION LOG — per (stream, trigger) one upsert (carrying that slice's
 * max position and row count) or one delete (an arithmetic rule both
 * sides compute: `(value + seq) % 4 == 0`) — and the four triggers
 * replay IN ORDER through `ParquetTwinStore.merge` on a fresh store.
 * The result is the store's resolved table; the oracle replays the
 * same action log as plain ANSI last-writer-wins window SQL (latest
 * trigger per stream wins; a latest-trigger delete removes the key).
 * Deletes and re-inserts interleave by construction (a stream whose
 * delete lands at seq 1 re-enters at its next upsert seq), so the
 * sequence-ordered tombstone path is genuinely exercised.
 *
 * Scale: the action log is aggregate-mass (streams x 4 rows, shuffled
 * once with map-side partial aggregation); each trigger's merge is
 * update-mass against the bucketed store — exactly the per-trigger
 * economics the streaming twins rely on at 100 TB.
 */
object StoreQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "twinstore_resolve" -> { (s: SparkSession, dir: String) =>
      val ev = Fixture.events(s, dir).select(col("position"), col("stream"))
      // the action log is tiny (streams x 4 rows) and every downstream
      // job is TASK-LAUNCH bound, not data bound — bound its partitions
      // so the per-trigger staging/fold jobs don't pay 32 task launches
      // for kilobytes (the store itself coalesces its checkpoints)
      val acts = ev
        .groupBy(col("stream"), pmod(col("position"), lit(4L)).as("seq"))
        .agg(max(col("position")).as("value"), count(lit(1)).as("n"))
        .withColumn("del", pmod(col("value") + col("seq"), lit(4L)) === 0L)
        .coalesce(4)
        .localCheckpoint() // one aggregation feeds all four triggers
      val root = java.nio.file.Files
        .createTempDirectory("graft-tsresolve").toString
      val store = new ParquetTwinStore(root, 2)
      for (t <- 0L to 3L) {
        val tr = acts.filter(col("seq") === t)
        store.merge("t", Seq("stream"),
          tr.filter(!col("del")).select(col("stream"), col("value"), col("n")),
          Some(tr.filter(col("del")).select(col("stream")))): Unit
      }
      // an empty corpus stages no merge, so the store holds no table —
      // serve the (empty) action-log schema instead. The result is
      // localCheckpointED (materialized off the store's files) so the
      // temp root can be deleted HERE — the bench reruns every gate
      // query a dozen-plus times per sweep, and a leaked root per
      // execution would strand parquet trees in /tmp across rounds.
      val out = store.load(s, "t")
        .getOrElse(acts.select(col("stream"), col("value"), col("n")).limit(0))
        .select(col("stream"), col("value"), col("n"))
        .localCheckpoint() // materialize off the store's files (see above);
      // the single orderBy below defines the result order — sorting before
      // the checkpoint too would pay one extra exchange+sort for nothing
      graft.util.TempRoots.rm(root)
      out.orderBy(col("stream"))
    }
  )

  private def EV = LogQueries.evCte

  val oracles: Map[String, String] = Map(
    "twinstore_resolve" ->
      s"""$EV, acts AS (
         |  SELECT stream, position % 4 AS seq,
         |         max(position) AS value, count(*) AS n
         |  FROM ev GROUP BY stream, position % 4
         |), tagged AS (
         |  SELECT stream, seq, value, n,
         |         ((value + seq) % 4 = 0) AS del,
         |         row_number() OVER (PARTITION BY stream ORDER BY seq DESC) AS rn
         |  FROM acts
         |)
         |SELECT stream, value, n FROM tagged
         |WHERE rn = 1 AND NOT del
         |ORDER BY stream""".stripMargin
  )
}
