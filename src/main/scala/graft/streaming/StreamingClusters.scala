package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/**
 * Streaming near-dup CLUSTER MAINTENANCE — the live twin of the batch
 * delta-merge [[graft.dedup.Dedup.incrementalClusters]], completing the
 * pipeline-stage story [[IngestDedup]] starts: where `nearDupSuspects`
 * only FLAGS arriving documents whose bands collide with the corpus,
 * this maintains the actual duplicate-cluster LABEL TABLE across
 * micro-batches, so the serving side always has the current
 * (id, keeper) clustering without ever re-running connected components
 * over the corpus pair history.
 *
 * Per micro-batch (drive from `foreachBatch` — the cross-batch state
 * here is two append-only signature tables plus the label table, not a
 * keyed-state store, so `foreachBatch` + `localCheckpoint` is the right
 * Structured Streaming shape):
 *
 *  1. shingle + minhash-band the arriving documents (ONE signature pass
 *     — the `FromBanded` discipline of the batch gate);
 *  2. delta pairs = new×corpus band collisions + new×new self-collisions,
 *     both exact-Jaccard verified — identical generators to the batch
 *     nightly;
 *  3. fold yesterday's labels + delta through `incrementalClusters`
 *     (stars(labels) ∪ delta is connectivity-equivalent to the full
 *     pair history, so the result IS the full-recompute labeling —
 *     `StreamingSpec` pins streaming-final == batch recompute exactly);
 *  4. append the batch's signatures to the corpus side.
 *
 * Scale shape: per-trigger cost tracks the BATCH pair volume (band
 * collisions of the arriving docs), never the corpus pair history; the
 * corpus-side state is band keys + shingle sets (bytes per doc, the
 * same artifact the batch pipeline persists). Where that state LIVES is
 * the [[TwinStore]]'s decision: the default in-memory store keeps the
 * original `localCheckpoint` shape; [[ParquetTwinStore]] appends the
 * per-trigger deltas to on-disk tables (the 100 TB shape — both
 * signature tables are append-only here, so every trigger's write is
 * delta-sized) and `StreamingSpec` pins streaming-final == batch
 * through both.
 */
final class StreamingClusters(thresholdX1000: Long,
                              store: TwinStore = new InMemoryTwinStore) {

  private var corpusSets: Option[DataFrame] = None   // (id, sh, n_sh)
  private var corpusBands: Option[DataFrame] = None  // (id, band, r0, r1)
  private var labelTable: Option[DataFrame] = None   // (id, keeper)
  private var resumed = false

  /** A restarted maintainer resumes from whatever the store holds — the
    * crash-recovery half of the disk-backed state story (no-op for a
    * fresh store). Runs once, before the first state access. */
  private def resume(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!resumed) {
      resumed = true
      corpusSets = store.load(spark, "corpusSets")
      corpusBands = store.load(spark, "corpusBands")
      labelTable = store.load(spark, "labels")
    }

  /** Current clustering: (id, keeper) for every id in >=1 near-dup pair. */
  def labels(spark: org.apache.spark.sql.SparkSession): DataFrame = synchronized {
    resume(spark)
    labelTable.getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("id", "keeper")
    }
  }

  /** Absorb one micro-batch of (doc_id, text) rows. Synchronized: one
    * trigger at a time mutates the state tables (foreachBatch already
    * serializes triggers; this guards ad-hoc callers).
    *
    * Replay safety: a crash-redelivered micro-batch would double-append
    * the signature tables and pair arriving docs against their own
    * corpus copies, so (a) docs already in the LAST-written state table
    * (`corpusBands`) anti-join out up front — a fully committed trigger
    * replays as a no-op — and (b) each signature append itself
    * anti-joins against its own table, so a crash BETWEEN the two
    * appends re-lands only the missing one (`StreamingSpec` pins the
    * redelivery). */
  def processBatch(docs0: DataFrame): Unit = synchronized {
    resume(docs0.sparkSession)
    val docs = corpusBands.fold(docs0)(cb =>
      docs0.join(cb.select(col("id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti").localCheckpoint())
    if (docs.isEmpty) return
    val newSets = Dedup.shingleSets(docs).localCheckpoint()
    val newBands = Dedup.bandedSignatures(newSets)
    val delta = corpusSets.zip(corpusBands) match {
      case Some((cSets, cBands)) =>
        Dedup.minhashLshPairsBetweenBanded(newBands, newSets, cBands, cSets, thresholdX1000)
          .unionByName(
            Dedup.minhashLshPairsFromBanded(newBands, newSets, thresholdX1000))
      case None =>
        Dedup.minhashLshPairsFromBanded(newBands, newSets, thresholdX1000)
    }
    val pairs = delta.select(col("a"), col("b"))
    // the label table goes through the store as an update-mass keyed
    // MERGE: only the changed/new (id, keeper) rows — the components the
    // batch's pairs touch — are written; ids never leave this table (no
    // dethronement here), so there are no deletes
    labelTable = Some(labelTable match {
      case Some(old) =>
        val nx = Dedup.incrementalClusters(old, pairs).localCheckpoint()
        store.merge("labels", Seq("id"),
          nx.join(old, Seq("id", "keeper"), "left_anti"), None)
      case None =>
        store.merge("labels", Seq("id"),
          Dedup.duplicateClustersAltStar(pairs), None)
    })
    // per-table replay guards: only rows whose id is genuinely absent
    // land (covers a crash between the two appends)
    corpusSets = Some(store.append("corpusSets", corpusSets.fold(newSets)(cs =>
      newSets.join(cs.select(col("id")).distinct(), Seq("id"), "left_anti"))))
    corpusBands = Some(store.append("corpusBands", corpusBands.fold(newBands)(cb =>
      newBands.join(cb.select(col("id")).distinct(), Seq("id"), "left_anti"))))
  }

  /** Attach to a streaming (doc_id, text) source: every micro-batch is
    * folded into the label table. */
  def sink(stream: DataFrame): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      processBatch(batch)
    }
}
