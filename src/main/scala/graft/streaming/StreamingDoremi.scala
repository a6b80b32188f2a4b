package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.{Doremi, LmScore}

/**
 * Streaming DOMAIN-MIXTURE twin — the live counterpart of the dynamic
 * mixture query (`corpus_mix_doremi`), completing the twin family for
 * the round-11 additions the way [[StreamingVocab]] did for the
 * tokenizer trainers.
 *
 * What is mergeable here and what is not: DoReMi's hardness signal is
 * the corpus-TRAINED bigram-LM score, so per-domain score sums are NOT
 * additive across batches — every arrival shifts the model and with it
 * every document's score (the first cut of this twin merged score sums
 * and diverged from batch by exactly the model drift). The state that
 * IS additive is one level down:
 *
 *  - the LM MODEL `(w1, w2, c_big)` — plain occurrence sums, maintained
 *    through [[TwinStore.merge]] with update-mass writes (the batch's
 *    bigram types only) and per-row `last_bid` idempotency (Structured
 *    Streaming redelivers an uncommitted trigger with the same batch
 *    id, so a row whose `last_bid` already equals the arriving id keeps
 *    its count — crash-redelivery cannot double-add);
 *  - the per-doc bigram PROFILES `(doc_id, w1, w2, cnt)` — the
 *    tokenize+explode pass collapsed per doc, append-only with an id
 *    anti-join replay guard;
 *  - the `(doc_id, source)` map — append-only, written LAST (the
 *    commit record the ingest guard reads).
 *
 * Ingest is therefore update-mass: one tokenize pass over the ARRIVING
 * docs, one keyed model merge, two appends. Serve re-scores from the
 * STORED tables ([[LmScore.bigramLmScoresFromProfiles]] — integer
 * joins over the profile and model tables) and runs the MW rounds on
 * the collapse ([[Doremi.weightsFromMeans]]): profile-table-mass work,
 * but the corpus text is never re-read and never re-tokenized — at
 * 100 TB the nightly reweight consumes the integer posting tables, not
 * the document store, exactly the [[StreamingVocab]] "retrain from the
 * collapse" shape one level deeper. `StreamingSpec` pins streaming-final
 * weights == batch under micro-batch splits with a restart, and a
 * redelivered trigger as a no-op.
 */
final class StreamingDoremi(store: TwinStore = new InMemoryTwinStore) {

  private var model: Option[DataFrame] = None    // (w1, w2, c_big, last_bid)
  private var profiles: Option[DataFrame] = None // (doc_id, w1, w2, cnt)
  private var docSrc: Option[DataFrame] = None   // (doc_id, source) — commit record
  private var resumed = false

  private def resume(spark: SparkSession): Unit =
    if (!resumed) {
      resumed = true
      model = store.load(spark, "lmModel")
      profiles = store.load(spark, "docProfiles")
      docSrc = store.load(spark, "docSources")
    }

  /** The maintained corpus bigram model `(w1, w2, c_big)`. */
  def bigramModel(spark: SparkSession): DataFrame = synchronized {
    resume(spark)
    model.fold {
      import spark.implicits._
      Seq.empty[(String, String, Long)].toDF("w1", "w2", "c_big")
    }(_.select(col("w1"), col("w2"), col("c_big")))
  }

  /** Absorb one micro-batch of documents (needs `doc_id`, `source`,
    * `text`); `batchId` is the Structured Streaming micro-batch id —
    * stable across a crash redelivery. */
  def processBatch(docs0: DataFrame, batchId: Long): Unit = synchronized {
    resume(docs0.sparkSession)
    // exactly-once guard: docSources is the LAST write (commit record),
    // so a fully committed trigger replays as a no-op
    val docs = docSrc.fold(docs0)(ds =>
      docs0.join(ds.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .localCheckpoint())
    if (docs.isEmpty) return
    val bp = LmScore.bigramProfiles(docs).localCheckpoint()
    // model merge, idempotent per (w1, w2) row via last_bid
    val bt = LmScore.bigramModel(bp)
    val upserts = model match {
      case None => bt.withColumn("last_bid", lit(batchId))
      case Some(m) =>
        bt.select(col("w1"), col("w2"), col("c_big").as("bc"))
          .join(m, Seq("w1", "w2"), "left")
          .select(col("w1"), col("w2"),
            when(col("last_bid") === batchId, col("c_big"))
              .otherwise(coalesce(col("c_big"), lit(0L)) + col("bc")).as("c_big"),
            lit(batchId).as("last_bid"))
    }
    model = Some(store.merge("lmModel", Seq("w1", "w2"), upserts, None))
    // profile append with an id replay guard (covers a crash between
    // the model merge and this append)
    profiles = Some(store.append("docProfiles", profiles.fold(bp)(p =>
      bp.join(p.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti"))))
    // commit record, last
    docSrc = Some(store.append("docSources",
      docs.select(col("doc_id"), col("source"))))
  }

  /** Current mixture weights — identical to
    * `Doremi.domainWeights(corpus-so-far)` by construction: re-score
    * the stored profiles under the stored model, collapse per domain,
    * run the MW rounds. */
  def weights(spark: SparkSession, etaX1000: Long = 500,
              rounds: Int = 3): DataFrame = synchronized {
    resume(spark)
    val ds = docSrc.getOrElse {
      import spark.implicits._
      Seq.empty[(Long, String)].toDF("doc_id", "source")
    }
    val scores = LmScore.bigramLmScoresFromProfiles(
      profiles.getOrElse {
        import spark.implicits._
        Seq.empty[(Long, String, String, Long)].toDF("doc_id", "w1", "w2", "cnt")
      },
      ds.select(col("doc_id")), bigramModel(spark))
    Doremi.weightsFromMeans(
      Doremi.meansFromSums(Doremi.domainSumsFromScores(scores, ds)),
      etaX1000, rounds)
  }

  /** Attach to a streaming document source. */
  def sink(stream: DataFrame): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, bid: Long) =>
      processBatch(batch, bid)
    }
}
