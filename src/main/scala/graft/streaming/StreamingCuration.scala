package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.Curation
import graft.dedup.{Dedup, Winnow}

/**
 * Streaming END-TO-END CURATION — the live twin of the whole
 * `corpus_e2e_curate` pipeline, not just one stage: as documents
 * arrive, it maintains every piece of pipeline state (normalized-md5
 * exact keepers, the near-dup cluster labeling AMONG the exact
 * survivors, winnow fingerprint postings, per-doc quality/token
 * metadata), and serves the batch pipeline's report at any moment via
 * the SHARED report tail ([[Curation.report]]) — `StreamingSpec` pins
 * the streaming-final report AND label table equal to the batch
 * recompute under adversarial arrival orders.
 *
 * The two hard parts, and why they stay cheap:
 *
 *  - **Keeper dethronement.** The exact keeper of a normalized-md5
 *    group is the MIN doc id, so a later-arriving smaller id dethrones
 *    the stored keeper. Dethronement changes the cluster graph's NODE
 *    SET (clusters are among exact survivors), i.e. node REMOVAL — the
 *    case plain `incrementalClusters` (edge addition) cannot absorb.
 *    Because min ids only ever decrease, membership is MONOTONE per
 *    doc: a doc enters the survivor set only on arrival and, once
 *    dethroned, can never return — so the corpus-side signature store
 *    only needs CURRENT survivors, and every "entered" doc is from the
 *    current batch.
 *  - **Cluster repair under removal.** Components are the pair graph's
 *    connectivity classes, so a removed node only affects ITS component:
 *    the repair re-derives pairs among that component's remaining
 *    members (bands semi-joined to the member set — component-mass
 *    sized, never corpus-sized) and re-labels just those, then folds the
 *    arriving docs' delta pairs through `incrementalClusters` as usual.
 *
 * Per micro-batch cost therefore tracks the batch's own pair volume
 * plus the dup-mass of components touched by dethronements — never the
 * corpus pair history. State tables are id-keyed columnar frames
 * (bytes/doc); WHERE they live is the [[TwinStore]]'s decision: the
 * default in-memory store keeps the original `localCheckpoint` shape,
 * [[ParquetTwinStore]] holds them on disk — `meta` and `posts` are
 * append-only (delta-sized trigger writes); the exact-keeper map,
 * survivor signature store and label table go through the `replace`
 * verb, whose parquet form rewrites and whose production form is a
 * keyed Delta/Iceberg MERGE (update-mass-sized). `StreamingSpec` pins
 * streaming-final == batch through both stores. The report itself is
 * the serving refresh: one scan over the metadata store through the
 * identical tail the batch gate runs (publish nightly or on demand;
 * making the per-source counters delta-maintained under flag flips is
 * the next increment, and would serve the same numbers).
 *
 * Ingest contract: exactly-once doc ids (replays would double-count
 * `n_raw` — dedupe upstream or by id at the sink).
 */
final class StreamingCuration(thresholdX1000: Long,
                              store: TwinStore = new InMemoryTwinStore) {

  private var meta: Option[DataFrame] = None       // docMeta: (doc_id, source, h, qx, nt)
  private var exactKeep: Option[DataFrame] = None  // (h, keep_id)
  private var eSets: Option[DataFrame] = None      // (id, sh, n_sh) — CURRENT exact survivors
  private var eBands: Option[DataFrame] = None     // (id, band, r0, r1) — same membership
  private var labelTable: Option[DataFrame] = None // (id, keeper) among exact survivors
  private var posts: Option[DataFrame] = None      // (doc_id, fp) winnow postings
  private var resumed = false

  /** A restarted pipeline resumes every state table from the store —
    * the crash-recovery half of the disk-backed state story (no-op for
    * a fresh store). Runs once, before the first state access. NB
    * Structured Streaming redelivers the last uncommitted micro-batch
    * on restart; the ingest contract (exactly-once doc ids) therefore
    * requires the redelivered batch be deduplicated upstream or by id
    * against `meta` before it reaches processBatch. */
  private def resume(spark: SparkSession): Unit =
    if (!resumed) {
      resumed = true
      meta = store.load(spark, "meta")
      posts = store.load(spark, "posts")
      exactKeep = store.load(spark, "exactKeep")
      eSets = store.load(spark, "eSets")
      eBands = store.load(spark, "eBands")
      labelTable = store.load(spark, "labels")
    }

  /** Current near-dup clustering among the exact survivors. */
  def labels(spark: SparkSession): DataFrame = synchronized {
    resume(spark)
    labelTable.getOrElse(emptyLabels(spark))
  }

  private def emptyLabels(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("id", "keeper")
  }

  /** The batch pipeline's per-source report over the current state —
    * byte-identical semantics to `corpus_e2e_curate` by construction
    * (same [[Curation.report]] tail). */
  def report(spark: SparkSession): DataFrame = synchronized {
    resume(spark)
    import spark.implicits._
    val m = meta.getOrElse(
      Seq.empty[(Long, String, String, Long, Long)]
        .toDF("doc_id", "source", "h", "qx", "nt"))
    val ek = exactKeep.getOrElse(Seq.empty[(String, Long)].toDF("h", "keep_id"))
    val ps = posts.getOrElse(Seq.empty[(Long, Long)].toDF("doc_id", "fp"))
    Curation.report(m, ek, labels(spark), ps)
  }

  /** Absorb one micro-batch of (doc_id, source, text) rows. Synchronized:
    * foreachBatch already serializes triggers; this guards ad-hoc
    * callers. */
  def processBatch(docs: DataFrame): Unit = synchronized {
    resume(docs.sparkSession)
    if (docs.isEmpty) return
    val bm = Curation.docMeta(docs).localCheckpoint()
    meta = Some(store.append("meta", bm))
    posts = Some(store.append("posts", Winnow.postings(docs)))

    // ---- exact-keeper merge + survivor-set deltas ----
    val bMin = bm.groupBy("h").agg(min(col("doc_id")).as("new_id"))
    val (nextEk, entered, exited) = exactKeep match {
      case None =>
        (store.replace("exactKeep", bMin.select(col("h"), col("new_id").as("keep_id"))),
          bMin.select(col("new_id").as("id")).localCheckpoint(),
          None)
      case Some(old) =>
        // least() skips nulls, so a one-sided h keeps its only candidate
        val merged = old.join(bMin, Seq("h"), "full_outer")
          .select(col("h"), col("keep_id").as("old_keep"), col("new_id"))
          .withColumn("keep_id", least(col("old_keep"), col("new_id")))
          .localCheckpoint()
        (store.replace("exactKeep", merged.select(col("h"), col("keep_id"))),
          // a changed keeper is ALWAYS a batch doc (min ids only decrease)
          merged.filter(col("old_keep").isNull || col("keep_id") < col("old_keep"))
            .select(col("keep_id").as("id")).localCheckpoint(),
          Some(merged.filter(col("old_keep").isNotNull && col("keep_id") < col("old_keep"))
            .select(col("old_keep").as("id")).localCheckpoint()))
    }
    exactKeep = Some(nextEk)

    // ---- signature store: one minhash pass over the batch ----
    val bSets = Dedup.shingleSets(docs).localCheckpoint()
    val bBands = Dedup.bandedSignatures(bSets)
    val enteredSets = bSets.join(entered, Seq("id"), "left_semi").localCheckpoint()
    val enteredBands = bBands.join(entered, Seq("id"), "left_semi").localCheckpoint()

    // remove dethroned survivors BEFORE generating the batch's delta
    // pairs, so the delta is against the post-removal survivor set
    val (prevSets, prevBands) = (eSets, eBands) match {
      case (Some(s), Some(b)) =>
        exited match {
          case Some(x) =>
            (s.join(x, Seq("id"), "left_anti").localCheckpoint(),
              b.join(x, Seq("id"), "left_anti").localCheckpoint())
          case None => (s, b)
        }
      case _ => (null, null)
    }

    // ---- cluster repair for removed nodes (component-local) ----
    val repaired: DataFrame = (labelTable, exited) match {
      case (Some(lt), Some(x)) if prevSets != null =>
        val hitKeepers = lt.join(x, Seq("id"), "left_semi")
          .select(col("keeper")).distinct().localCheckpoint()
        val survivors = lt.join(hitKeepers, Seq("keeper"), "left_semi")
          .select(col("id"))
          .join(x, Seq("id"), "left_anti").localCheckpoint()
        val subSets = prevSets.join(survivors, Seq("id"), "left_semi")
        val subBands = prevBands.join(survivors, Seq("id"), "left_semi")
        val rebuilt = Dedup.duplicateClustersAltStar(
          Dedup.minhashLshPairsFromBanded(subBands, subSets, thresholdX1000))
        lt.join(hitKeepers, Seq("keeper"), "left_anti")
          .unionByName(rebuilt)
      case (Some(lt), _) => lt
      case _             => null
    }

    // ---- delta pairs for the arriving survivors ----
    val selfPairs = Dedup.minhashLshPairsFromBanded(enteredBands, enteredSets, thresholdX1000)
    val delta =
      if (prevSets != null)
        Dedup.minhashLshPairsBetweenBanded(enteredBands, enteredSets,
          prevBands, prevSets, thresholdX1000).unionByName(selfPairs)
      else selfPairs
    val pairs = delta.select(col("a"), col("b"))
    val next =
      if (repaired != null) Dedup.incrementalClusters(repaired, pairs)
      else Dedup.duplicateClustersAltStar(pairs)
    labelTable = Some(store.replace("labels", next))

    // ---- survivor signature store: removals already applied, add batch ----
    // `replace`, not `append`: dethronement REMOVES rows, so the survivor
    // tables are merged state (a keyed MERGE/delete at 100 TB)
    eSets = Some(store.replace("eSets",
      if (prevSets != null) prevSets.unionByName(enteredSets) else enteredSets))
    eBands = Some(store.replace("eBands",
      if (prevBands != null) prevBands.unionByName(enteredBands) else enteredBands))
  }

  /** Attach to a streaming (doc_id, source, text) source. */
  def sink(stream: DataFrame): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      processBatch(batch)
    }
}
