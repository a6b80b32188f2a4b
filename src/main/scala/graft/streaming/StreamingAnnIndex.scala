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
 * and appends it through the [[TwinStore]] (append verb: the index is
 * insert-only, so every trigger's write is delta-sized by construction
 * and the 100 TB shape is a date-partitioned index table).
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

  private var index: Option[DataFrame] = None // (id, v, nrm, cb)
  private var resumed = false

  private def resume(spark: SparkSession): Unit =
    if (!resumed) {
      resumed = true
      index = store.load(spark, "annIndex")
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

  /** Absorb one micro-batch of (vec_id, embedding) rows: one map-only
    * pass computes each vector's norm and bucket signature
    * ([[Similarity.annIndexRows]] — the same builder the batch serving
    * queries read through, so twin and batch index rows are identical
    * by construction); the store append is delta-sized.
    *
    * Exactly-once ingest under crash-redelivery: the index is id-keyed
    * and insert-only, so a redelivered micro-batch re-offers ids that
    * already landed — they anti-join out against the stored index (a
    * keyed lookup), leaving only the genuinely new rows. Because ids
    * drop out individually, even a partially-committed append replays
    * cleanly (`StreamingSpec` pins the redelivery no-op). */
  def processBatch(vecs: DataFrame): Unit = synchronized {
    resume(vecs.sparkSession)
    if (vecs.isEmpty) return
    val delta = Similarity.annIndexRows(vecs)
    val fresh = index.fold(delta)(ix =>
      delta.join(ix.select(col("id")), Seq("id"), "left_anti").localCheckpoint())
    if (index.isEmpty || !fresh.isEmpty)
      index = Some(store.append("annIndex", fresh))
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

  /** Attach to a streaming (vec_id, embedding) source. */
  def sink(stream: DataFrame): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      processBatch(batch)
    }
}
