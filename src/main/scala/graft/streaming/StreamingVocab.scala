package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.{Unigram, Wordpiece}

/**
 * Streaming TOKENIZER-VOCABULARY twin — the live counterpart of the
 * batch tokenizer-training family (`text_unigram_train`,
 * `text_wordpiece_vocab`), completing the "every batch operator has a
 * live twin" story for round 10's additions.
 *
 * Both tokenizer trainers ride ONE corpus collapse: the word-TYPE
 * frequency table `(w, wc)` ([[Unigram.wordTypes]] — the only
 * corpus-mass pass either algorithm makes; everything downstream is
 * vocabulary-scale EM / top-K over the type table). So the streaming
 * twin maintains exactly that collapse as keyed state:
 *
 *  - per micro-batch: collapse the ARRIVING docs to their own type
 *    counts (delta-sized — one map-side-combined aggregation of the
 *    batch), add the standing counts for just those types (a keyed
 *    lookup), and [[TwinStore.merge]] the updated rows — the write is
 *    update-mass (the batch's word types only), never type-table mass;
 *  - on serve: retrain from the maintained table via
 *    [[Unigram.trainFromTypes]] / [[Wordpiece.vocabReportFromTypes]].
 *    Retraining is the batch algorithm's own vocabulary-scale cost; the
 *    streaming win is that the corpus is never re-read — at 100 TB the
 *    nightly retrain consumes a megabyte-scale stored table instead of
 *    the document store.
 *
 * Because addition is associative and the trainers are deterministic
 * functions of the type table, the served vocabulary after the last
 * trigger is EXACTLY the batch training output on the full corpus —
 * `StreamingSpec` pins both families under micro-batch splits, and the
 * restart path through [[ParquetTwinStore]].
 *
 * Exactly-once ingest under crash-redelivery: the type table is
 * ADDITIVE state (a replayed fold would double-add the batch's
 * counts), so each stored row carries the id of the last micro-batch
 * folded into it (`last_bid` — Structured Streaming redelivers an
 * uncommitted trigger with the SAME batch id and data). The upsert
 * derivation keeps a row's standing count unchanged when its
 * `last_bid` already equals the arriving batch id, making the fold
 * idempotent PER WORD-TYPE ROW — a crash even mid-merge re-applies
 * cleanly. `StreamingSpec` pins a redelivered trigger as a no-op.
 */
final class StreamingVocab(store: TwinStore = new InMemoryTwinStore) {

  private var types: Option[DataFrame] = None // (w, wc, last_bid) cumulative
  private var resumed = false

  private def resume(spark: SparkSession): Unit =
    if (!resumed) {
      resumed = true
      types = store.load(spark, "wordTypes")
    }

  /** The maintained word-type frequency table `(w, wc)`. */
  def wordTypes(spark: SparkSession): DataFrame = synchronized {
    resume(spark)
    types.fold {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("w", "wc")
    }(_.select(col("w"), col("wc")))
  }

  /** Absorb one micro-batch of documents (needs a `text` column);
    * `batchId` is the Structured Streaming micro-batch id — stable
    * across a crash redelivery, which is what makes the additive fold
    * idempotent. */
  def processBatch(docs: DataFrame, batchId: Long): Unit = synchronized {
    resume(docs.sparkSession)
    if (docs.isEmpty) return
    val bt = Unigram.wordTypes(docs).localCheckpoint()
    val upserts = types match {
      case None => bt.withColumn("last_bid", lit(batchId))
      case Some(t) =>
        // updated counts for the batch's types only: standing count (a
        // keyed semi-lookup into the state) + batch count — unless this
        // row already absorbed this very batch id (crash redelivery)
        bt.select(col("w"), col("wc").as("bwc"))
          .join(t.withColumnRenamed("wc", "wc_old"), Seq("w"), "left")
          .select(col("w"),
            when(col("last_bid") === batchId, col("wc_old"))
              .otherwise(col("bwc") + coalesce(col("wc_old"), lit(0L))).as("wc"),
            lit(batchId).as("last_bid"))
    }
    types = Some(store.merge("wordTypes", Seq("w"), upserts, None))
  }

  /** Current unigram-LM vocabulary — identical to
    * `Unigram.train(corpus-so-far)` by construction. */
  def unigramVocab(spark: SparkSession, maxLen: Int = 6, seedSize: Int = 200,
                   keepK: Int = 60, minFreq: Long = 2, rounds: Int = 2): DataFrame =
    synchronized {
      Unigram.trainFromTypes(wordTypes(spark), maxLen, seedSize, keepK,
        minFreq, rounds)
    }

  /** Current WordPiece vocabulary — identical to
    * `Wordpiece.vocabReport(corpus-so-far)` by construction. */
  def wordpieceVocab(spark: SparkSession, maxLen: Int = 6, initK: Int = 40,
                     contK: Int = 40, minFreq: Long = 2): DataFrame =
    synchronized {
      Wordpiece.vocabReportFromTypes(wordTypes(spark), maxLen, initK, contK,
        minFreq)
    }

  /** Attach to a streaming document source. */
  def sink(stream: DataFrame): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, bid: Long) =>
      processBatch(batch, bid)
    }
}
