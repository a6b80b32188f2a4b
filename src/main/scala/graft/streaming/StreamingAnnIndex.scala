package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/**
 * Streaming ANN-INDEX maintenance — the live twin of the similarity
 * family's serving paths: the batch queries treat the normed corpus and
 * its LSH bucket signatures as stored artifacts ("computed once by the
 * ingest pipeline"); this twin IS that ingest pipeline. Per micro-batch
 * of arriving vectors it computes the per-vector index row — L2 norm +
 * the per-table hyperplane bucket ids, one map-only pass, no shuffle —
 * and MERGES it through the [[TwinStore]] (keyed by id: the
 * Delta/Iceberg-MERGE shape of every production vector index, so the
 * per-trigger parquet write is update-mass and the 100 TB form is a
 * keyed index table).
 *
 * DELETION is first-class: a curation pipeline that dethrones a doc
 * after it was indexed (exact-dup keeper replaced by a smaller id,
 * near-dup cluster keep-best change) hands the dethroned ids to
 * [[processBatch]] and they leave the index through the store's
 * tombstone path — a batch query that re-restricts the corpus per
 * serve never notices, but a LIVE index that only ever inserts would
 * keep serving dethroned docs forever (`StreamingSpec` pins a
 * dethronement-crossing retrieval: a doc indexed at trigger T and
 * dethroned at T+k must leave the served panel). The twin also keeps
 * an `annDeleted` ledger of recently-dethroned ids, BOUNDED to the
 * crash-REDELIVERY horizon: Structured Streaming redelivers only the
 * last uncommitted trigger (under the same batch id), so the only
 * insert set that can legitimately re-offer a since-deleted id is the
 * current trigger's own redelivery — ledger rows are tagged with the
 * trigger's batch id and rows older than the PREVIOUS trigger prune on
 * every write, keeping the table (and its per-batch anti-join) sized
 * by recent dethronement mass, never corpus dup-mass (at real web dup
 * rates the ever-dethroned set is 30-50% of the corpus — an unbounded
 * ledger would be a second corpus-mass table with a per-trigger scan).
 * Offers from OUTSIDE the horizon can't carry dethroned ids under the
 * ingest contract: dethronement is MONOTONE (a dethroned doc never
 * re-enters the curation survivor set), so a later curation trigger
 * never emits one as an insert — `StreamingSpec` pins the same-batch
 * redelivery and next-trigger re-offer cases.
 *
 * LIMITATION (the horizon bound's contract): the bound is safe exactly
 * under Structured Streaming's redelivery guarantee — at most the LAST
 * uncommitted trigger replays, under its original batch id. A source
 * that replays FURTHER back (checkpoint deletion, manual offset reset,
 * `availableNow` reprocessing over an old checkpoint) re-offers insert
 * sets outside the `bid >= batchId-1` horizon, and ids dethroned since
 * then would silently resurrect where the old unbounded ledger blocked
 * them. [[processBatch]] therefore REJECTS a batch-id regression
 * (batchId < the largest id it has seen — tracked in-memory and
 * persisted as the 1-row `annLastBid` watermark on every processed
 * trigger, so the guard survives restarts even across insert-only
 * runs) loudly instead of processing it: recovery from a rewound
 * checkpoint is rebuild-the-index territory, not a silent merge.
 *
 * Serving reads the maintained index directly:
 *
 *  - [[topK]] — exact brute-force top-k over the corpus-so-far
 *    (broadcast query + TakeOrderedAndProject);
 *  - [[topKLsh]] — the approximate path, riding the STORED bucket
 *    signatures (`Similarity.topKLshFromIndexed`): queries pay only the
 *    membership filter + top-k, never a corpus re-hash;
 *  - [[rangeSearch]] — all vectors within a cosine threshold.
 *
 * Every serving path is the batch operator over the same rows, so
 * streaming == batch holds by construction; `StreamingSpec` pins all
 * three against the batch results over the full corpus after
 * micro-batch splits, with a restart through [[ParquetTwinStore]]
 * (a new incarnation resumes the index from disk).
 */
final class StreamingAnnIndex(store: TwinStore = new InMemoryTwinStore) {

  private var index: Option[DataFrame] = None   // (id, v, nrm, cb)
  // (id, bid) — dethroned within the redelivery horizon (bid >= last
  // trigger's id); pruned on every ledger write
  private var deleted: Option[DataFrame] = None
  private var resumed = false
  // largest trigger id processed so far — in-memory within an
  // incarnation, re-seeded across a restart from the PERSISTED
  // `annLastBid` watermark (a 1-row replace table written on every
  // processed trigger, the StreamingCuration intent/commit-bid shape).
  // Re-seeding from the dethronement ledger alone was a wider
  // false-negative window than the class doc implied: the ledger
  // advances only on dethroning triggers, so a checkpoint rewound past
  // a run of insert-only triggers (but not past the last dethronement)
  // was silently accepted, re-inserting ids whose pruned-away ledger
  // entries could no longer block them. The ledger max still folds in
  // as a floor for stores written before the watermark existed.
  private var lastBid = Long.MinValue

  private def resume(spark: SparkSession): Unit =
    if (!resumed) {
      resumed = true
      index = store.load(spark, "annIndex")
      deleted = store.load(spark, "annDeleted").map { d =>
        // pre-horizon (r13) ledgers carry only (id): tag them with a
        // sentinel bid so they prune at the next write — every entry of
        // a resumed ledger is from a committed trigger, outside the
        // redelivery horizon by definition
        if (d.columns.contains("bid")) d else d.withColumn("bid", lit(-1L))
      }
      deleted.foreach { d =>
        val m = d.agg(max(col("bid"))).head().get(0)
        if (m != null) lastBid = math.max(lastBid, m.asInstanceOf[Long])
      }
      store.load(spark, "annLastBid").foreach { w =>
        val m = w.agg(max(col("bid"))).head().get(0)
        if (m != null) lastBid = math.max(lastBid, m.asInstanceOf[Long])
      }
    }

  /** The maintained index `(id, v, nrm, cb)` — empty before any batch. */
  def indexed(spark: SparkSession): DataFrame = synchronized {
    resume(spark)
    index.getOrElse {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("v", ArrayType(FloatType, containsNull = true)),
          StructField("nrm", DoubleType, nullable = true),
          StructField("cb", ArrayType(LongType, containsNull = true)))))
    }
  }

  /** Absorb one micro-batch: arriving (vec_id, embedding) rows enter the
    * index, `dethroned` ids (a curation pipeline's exited survivors)
    * leave it. One map-only pass computes each new vector's norm and
    * bucket signature ([[Similarity.annIndexRows]] — the same builder
    * the batch serving queries read through, so twin and batch index
    * rows are identical by construction); the store merge is keyed, so
    * the parquet write is update-mass.
    *
    * Exactly-once under crash-redelivery: inserts are id-keyed — a
    * redelivered micro-batch's already-landed ids anti-join out against
    * the stored index, and its since-dethroned ids against the
    * `annDeleted` ledger (dethronement is monotone, so the ledger never
    * wrongly blocks a live doc); deletes are idempotent tombstones (a
    * re-delete of an absent key is a no-op). Insert and delete key sets
    * are disjoint by construction: an arriving id that enters is its
    * group's CURRENT keeper, a dethroned id is by definition not.
    *
    * `batchId` is the Structured-Streaming trigger id (foreachBatch
    * provides it; [[sink]] threads it through). It tags this trigger's
    * ledger rows and prunes rows older than the previous trigger — the
    * redelivery horizon (see the class doc). Ad-hoc callers without a
    * trigger sequence can leave the default, which never prunes. */
  def processBatch(vecs: DataFrame,
                   dethroned: Option[DataFrame] = None,
                   batchId: Long = 0L): Unit = synchronized {
    resume(vecs.sparkSession)
    // a batch-id REGRESSION means the source replayed past the
    // redelivery horizon (rewound/lost checkpoint) — the horizon-bounded
    // ledger cannot block resurrections that far back, so fail loudly
    // instead of silently merging (class doc: LIMITATION)
    if (batchId < lastBid)
      throw new IllegalStateException(
        s"StreamingAnnIndex: batch id regressed ($batchId < last seen $lastBid) — " +
          "replay beyond the redelivery horizon; rebuild the index instead of merging")
    val advanced = batchId > lastBid
    lastBid = math.max(lastBid, batchId)
    val gone = dethroned.map(_.select(col("id")).distinct().localCheckpoint())
      .filter(!_.isEmpty)
    if (vecs.isEmpty && gone.isEmpty) return
    // persist the watermark on EVERY processed trigger, insert-only ones
    // included, BEFORE the state writes: a crash anywhere in this
    // trigger redelivers under the SAME batch id (== passes the strict-<
    // guard), while a rewound checkpoint replaying any earlier id is
    // rejected by the next incarnation even when no dethronement
    // happened since. 1 row; the replace write is a constant tier.
    if (advanced)
      store.replace("annLastBid",
        vecs.sparkSession.createDataFrame(Seq(Tuple1(batchId))).toDF("bid")): Unit
    val delta = Similarity.annIndexRows(vecs)
    val guarded = index.fold(delta)(ix =>
      delta.join(ix.select(col("id")), Seq("id"), "left_anti"))
    val fresh = deleted.fold(guarded)(d =>
      guarded.join(d.select(col("id")), Seq("id"), "left_anti")).localCheckpoint()
    // the dethronement ledger lands FIRST: a crash between the two
    // writes re-runs the merge on redelivery with the ledger already in
    // place. The write is a REPLACE of a horizon-bounded table (rows
    // with bid >= batchId - 1): tiny by construction, and idempotent
    // under same-batch-id redelivery (same kept rows + same new rows).
    gone.foreach { g =>
      val kept = deleted.map(_.filter(col("bid") >= batchId - 1L)).toSeq
      val next = (kept :+ g.withColumn("bid", lit(batchId)))
        .reduce(_ unionByName _)
        .groupBy(col("id")).agg(max(col("bid")).as("bid"))
      deleted = Some(store.replace("annDeleted", next))
    }
    if (!fresh.isEmpty || gone.nonEmpty)
      index = Some(store.merge("annIndex", Seq("id"), fresh, gone))
  }

  /** Exact top-k over the corpus-so-far. */
  def topK(spark: SparkSession, query: DataFrame, k: Int): DataFrame =
    synchronized {
      Similarity.topKBruteForceFromNormed(indexed(spark), query, k)
    }

  /** LSH top-k riding the STORED bucket signatures. */
  def topKLsh(spark: SparkSession, query: DataFrame, k: Int, dim: Int): DataFrame =
    synchronized {
      Similarity.topKLshFromIndexed(indexed(spark), query, k, dim)
    }

  /** All corpus-so-far vectors within cosine `tau` of the query. */
  def rangeSearch(spark: SparkSession, query: DataFrame, tau: Double): DataFrame =
    synchronized {
      Similarity.rangeSearchFromNormed(indexed(spark), query, tau)
    }

  /** Attach to a streaming (vec_id, embedding) source (insert-only —
    * deletion riders come from a curation pipeline calling
    * [[processBatch]] directly with its dethroned ids). */
  def sink(stream: DataFrame): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processBatch(batch, None, batchId)
    }
}
