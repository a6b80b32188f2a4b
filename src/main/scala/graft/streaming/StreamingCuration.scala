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
 * survivor signature store, label table and flag ledger go through the
 * `merge` verb (keyed MERGE: per-trigger writes are UPDATE-mass — the
 * changed keys only — with the parquet form merge-on-read plus periodic
 * compaction; only the O(sources) counter table uses table-mass
 * `replace`). `StreamingSpec` pins
 * streaming-final == batch through both stores. Serving has two forms:
 * [[report]] re-derives everything from the state tables through the
 * identical tail the batch gate runs (the audit path), while
 * [[reportServed]] reads the delta-maintained per-source counters —
 * O(sources) rows, no corpus scan — kept current by
 * [[maintainCounters]] folding per-doc flag FLIPS (dethronement,
 * keep-best changes inside touched clusters, monotone contamination)
 * into the counter table every trigger; the two are pinned equal after
 * every trigger in `StreamingSpec`.
 *
 * Ingest contract: exactly-once doc ids — ENFORCED at the sink, and
 * CRASH-ATOMIC per trigger. The trigger's state writes are framed by a
 * write-ahead/commit pair of O(1) BATCH-ID watermarks (Structured
 * Streaming numbers micro-batches and redelivers the last uncommitted
 * one under the SAME id, so the id is the natural transaction handle):
 * a one-row `intent_bid` marker is written FIRST, and a one-row
 * `commit_bid` marker is written LAST, after the `meta` append — the
 * per-doc replay guard every batch is anti-joined against. A fully
 * committed trigger therefore absorbs its redelivery as a no-op (the
 * per-doc guard), and a trigger that crashed between any two state
 * writes is detected on redelivery by a CONSTANT-TIME comparison
 * (`intent_bid == batchId` while `commit_bid < batchId`) and
 * RE-PROCESSED rather than dropped — no corpus-cardinality intent
 * table, no per-trigger membership scan against the ingest history.
 * Every state write is idempotent under
 * re-application (`posts` appends behind a doc-id anti-join, `meta` is
 * disjoint from the batch by the guard itself; the exact-keeper,
 * signature, label and flag merges re-derive their upserts from
 * post-state), the dethronement set widens to a touched-group sweep
 * against the stored metadata (a tombstone for an already-removed key
 * is a no-op, so over-approximating is safe), and the flag ledger plus
 * the serving counters — whose pre-crash deltas are unrecoverable once
 * the label merge committed — are re-evaluated from the stored state
 * wholesale (table-mass on exactly the replay trigger; the
 * crash-recovery price of exactly-once re-processing without a
 * cross-table transactional store — clean triggers stay
 * affected-set-sized). `StreamingSpec`
 * pins a crash at EVERY write boundary: kill the trigger after its
 * k-th store write, redeliver through a fresh twin, and the final
 * state must equal the batch recompute for all k.
 */
final class StreamingCuration(thresholdX1000: Long,
                              store: TwinStore = new InMemoryTwinStore) {

  private var meta: Option[DataFrame] = None       // docMeta: (doc_id, source, h, qx, nt)
  private var exactKeep: Option[DataFrame] = None  // (h, keep_id)
  private var eSets: Option[DataFrame] = None      // (id, sh, n_sh) — CURRENT exact survivors
  private var eBands: Option[DataFrame] = None     // (id, band, r0, r1) — same membership
  private var labelTable: Option[DataFrame] = None // (id, keeper) among exact survivors
  private var posts: Option[DataFrame] = None      // (doc_id, fp) winnow postings
  // per-doc curation ledger: every doc's current stage flags — the
  // materialized "is this doc in the training set right now" table
  private var flags: Option[DataFrame] = None      // (doc_id, source, h, qx, nt, s_exact, s_kb, s_q, contam, s_clean)
  // per-source counter table the serving report reads (O(sources) rows)
  private var counters: Option[DataFrame] = None   // (source, n_raw, n_exact, n_keepbest, n_quality, n_clean, n_toks)
  // write-ahead/commit batch-id watermarks: intentBid is written before
  // any other state write, commitBid after the last one — their gap is
  // the O(1) partial-trigger detector (no intent TABLE, no history scan)
  private var intentBid: Option[Long] = None
  private var commitBid: Option[Long] = None
  // ids dethroned by the last absorbed trigger (exact-keeper removals;
  // on a replay trigger, the over-approximating sweep — every id in it
  // is a genuine non-keeper, so downstream eviction stays correct).
  // PERSISTED through the store (an `exited` replace-verb table tagged
  // with the trigger's batch id): a crash can land AFTER this pipeline's
  // commit record but BEFORE a downstream consumer in the same
  // foreachBatch (the live ANN index) absorbs the eviction set — the
  // redelivery then takes the fully-committed early-return path, where
  // an in-memory-only lastExited would resume as None and the trigger's
  // dethronements would be lost to the consumer forever. The persisted
  // copy lets that path re-serve the committed trigger's exited ids
  // (downstream eviction is an idempotent tombstone, so re-serving to a
  // consumer that already absorbed them is a no-op).
  private var lastExited: Option[DataFrame] = None
  private var resumed = false

  /** A restarted pipeline resumes every state table from the store —
    * the crash-recovery half of the disk-backed state story (no-op for
    * a fresh store). Runs once, before the first state access.
    * Redelivered micro-batches are handled in [[processBatch]], which
    * anti-joins arrivals against the resumed `meta` table by doc id. */
  private def resume(spark: SparkSession): Unit =
    if (!resumed) {
      resumed = true
      meta = store.load(spark, "meta")
      posts = store.load(spark, "posts")
      intentBid = loadBid(spark, "intent_bid")
      commitBid = loadBid(spark, "commit_bid")
      exactKeep = store.load(spark, "exactKeep")
      eSets = store.load(spark, "eSets")
      eBands = store.load(spark, "eBands")
      labelTable = store.load(spark, "labels")
      flags = store.load(spark, "flags")
      counters = store.load(spark, "counters")
    }

  /** Current near-dup clustering among the exact survivors. */
  def labels(spark: SparkSession): DataFrame = synchronized {
    resume(spark)
    labelTable.getOrElse(emptyLabels(spark))
  }

  /** Ids dethroned by the LAST absorbed trigger (`(id)` rows) — the
    * hook a serving-side consumer wires into its own maintenance in the
    * same foreachBatch: [[StreamingAnnIndex.processBatch]] takes these
    * as its eviction set, so a doc indexed at trigger T and dethroned
    * at T+k leaves the served index at T+k (`StreamingSpec` pins the
    * crossing). Empty before any trigger and on triggers without
    * dethronements. */
  def dethronedLastTrigger(spark: SparkSession): DataFrame = synchronized {
    lastExited.getOrElse {
      import spark.implicits._
      Seq.empty[Long].toDF("id")
    }
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

  /** Absorb one micro-batch of (doc_id, source, text) rows, identified
    * by its Structured-Streaming `batchId`. Synchronized: foreachBatch
    * already serializes triggers; this guards ad-hoc callers.
    *
    * Replay safety: Structured Streaming REDELIVERS the last uncommitted
    * micro-batch after a crash, under the SAME batchId. A FULLY
    * committed trigger is caught by the guard below — the batch
    * anti-joins against the stored metadata table on doc_id (`meta` is
    * appended at the end of a trigger), so its redelivery is a no-op. A
    * PARTIALLY committed trigger (crash between two state writes) is
    * detected in O(1) by the batch-id watermark pair — this batchId
    * already declared intent but never committed — and re-processed
    * through replay-stable derivations (see the class doc); the only
    * increment-based table, the serving counters, is recomputed from the
    * flag ledger on that trigger alone. `StreamingSpec` pins a crash at
    * every write boundary. */
  def processBatch(rawDocs: DataFrame, batchId: Long): Unit = synchronized {
    resume(rawDocs.sparkSession)
    val docs = meta match {
      case Some(m) =>
        rawDocs.join(m.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .localCheckpoint()
      case None => rawDocs
    }
    if (docs.isEmpty) {
      // redelivery whose every row the per-doc guard absorbed (the meta
      // append committed): re-serve THIS trigger's persisted eviction
      // set — a crash can land after the meta append (with or without
      // the commit marker) but before a same-foreachBatch consumer (the
      // live ANN index) absorbed the dethronements, and an
      // in-memory-only lastExited would hand that consumer None
      // forever. The persisted set's batch-id tag is the gate: a
      // genuinely empty NEW batch finds the previous trigger's tag and
      // serves the empty set. Re-serving to a consumer that already
      // absorbed the evictions is an idempotent tombstone no-op.
      lastExited = loadExited(rawDocs.sparkSession, batchId)
      return
    }
    val oldLabels = labelTable // pre-trigger labeling, for the counter diff
    val bm = Curation.docMeta(docs).localCheckpoint()
    // this batch id declared intent on a previous delivery but never
    // committed: state is partially updated, so switch every
    // non-idempotent derivation to its replay-stable form — a
    // constant-time comparison, never a membership scan
    val replay = intentBid.contains(batchId) && commitBid.forall(_ < batchId)
    writeBid(rawDocs.sparkSession, "intent_bid", batchId)
    intentBid = Some(batchId)

    val bp = Winnow.postings(docs).localCheckpoint()
    // append with an id replay guard: a replayed trigger re-lands only
    // the docs whose postings never committed (append-only tables must
    // NOT go through the keyed merge verb — a doc-id delta sprays every
    // store bucket, so the merge's touched-bucket re-materialization
    // degenerates to table mass per trigger; the anti-join keeps the
    // write delta-sized AND idempotent at doc granularity)
    posts = Some(store.append("posts", posts.fold(bp)(p =>
      bp.join(p.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti"))))

    // ---- exact-keeper merge + survivor-set deltas ----
    val bMin = bm.groupBy("h").agg(min(col("doc_id")).as("new_id"))
    val (nextEk, entered, exited) = exactKeep match {
      case None =>
        (store.merge("exactKeep", Seq("h"),
          bMin.select(col("h"), col("new_id").as("keep_id")), None),
          bMin.select(col("new_id").as("id")).localCheckpoint(),
          None)
      case Some(old) =>
        // least() skips nulls, so a one-sided h keeps its only candidate.
        // Only the CHANGED keys (new h, or a dethroning smaller id) go
        // through the store — the merge upsert is update-mass.
        val ful = old.join(bMin, Seq("h"), "full_outer")
          .select(col("h"), col("keep_id").as("old_keep"), col("new_id"))
          .localCheckpoint()
        val changed = ful
          .withColumn("keep_id", least(col("old_keep"), col("new_id")))
          .filter(col("old_keep").isNull || col("keep_id") < col("old_keep"))
        val ek = store.merge("exactKeep", Seq("h"),
          changed.select(col("h"), col("keep_id")), None)
        // entered = batch docs that ARE the post-merge keeper of their
        // group. On a clean trigger this is exactly the changed-keeper
        // set (a new doc id can only be the stored keeper by dethroning
        // or creating the group this trigger); on a replay — where the
        // keeper merge already applied and `changed` is empty — it still
        // re-derives the docs whose downstream absorption may not have
        // committed. Always a batch-doc set (min ids only decrease).
        val ent = ful.filter(col("new_id").isNotNull &&
            least(col("old_keep"), col("new_id")) === col("new_id"))
          .select(col("new_id").as("id")).localCheckpoint()
        val exi =
          if (!replay)
            Some(changed.filter(col("old_keep").isNotNull)
              .select(col("old_keep").as("id")).localCheckpoint())
          else
            // replay-stable dethronement sweep: every HISTORICAL doc of
            // a batch-touched group that is NOT the group's current
            // keeper — catches removals the crashed delivery computed
            // but only partially committed (deleting an already-removed
            // key is a no-op, so over-approximating is safe, and it
            // re-tombstones whichever of eSets/eBands missed its
            // delete). Restricted to the batch's h groups via the
            // pre-trigger metadata (meta lacks the batch: it is the
            // commit record), so the sweep is touched-group-mass; it
            // runs only on the crash-recovery trigger, never the
            // steady-state path.
            meta match {
              case Some(m0) =>
                Some(m0.select(col("doc_id"), col("h"))
                  .join(bMin.select(col("h")), Seq("h"), "left_semi")
                  .join(ek.select(col("h"), col("keep_id")), Seq("h"))
                  .filter(col("doc_id") =!= col("keep_id"))
                  .select(col("doc_id").as("id")).localCheckpoint())
              case _ => None
            }
        (ek, ent, exi)
    }
    exactKeep = Some(nextEk)
    lastExited = exited
    // persist the eviction set (tagged with the batch id) BEFORE the
    // commit record: the committed-redelivery path above re-serves it to
    // same-trigger consumers that crashed before absorbing it
    writeExited(rawDocs.sparkSession, exited, batchId)

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
        // the corpus side excludes the entering docs: a no-op on clean
        // triggers (a new doc id can't be in the standing store), but on
        // a replay — where the signature merge may already have absorbed
        // the batch — it keeps the between-pass sides disjoint (no
        // self-pairs, no duplicate orientations)
        Dedup.minhashLshPairsBetweenBanded(enteredBands, enteredSets,
          prevBands.join(entered, Seq("id"), "left_anti"),
          prevSets.join(entered, Seq("id"), "left_anti"),
          thresholdX1000).unionByName(selfPairs)
      else selfPairs
    val pairs = delta.select(col("a"), col("b"))
    val next =
      if (repaired != null) Dedup.incrementalClusters(repaired, pairs)
      else Dedup.duplicateClustersAltStar(pairs)
    // labels go through the store as an update-mass MERGE: upserts are
    // the changed/new (id, keeper) rows (touched components only),
    // deletes the ids that left the table (dethroned, or their last
    // partner dethroned — such an id may RE-ENTER later, which the
    // store's sequence-ordered tombstones handle)
    labelTable = Some(labelTable match {
      case None => store.merge("labels", Seq("id"), next, None)
      case Some(old) =>
        val nx = next.localCheckpoint()
        store.merge("labels", Seq("id"),
          nx.join(old, Seq("id", "keeper"), "left_anti"),
          Some(old.select(col("id"))
            .join(nx.select(col("id")), Seq("id"), "left_anti")))
    })

    // ---- survivor signature store: keyed MERGE — the batch's rows in,
    // the dethroned ids out; the store never rewrites the standing mass
    eSets = Some(store.merge("eSets", Seq("id"), enteredSets, exited))
    eBands = Some(store.merge("eBands", Seq("id"), enteredBands, exited))

    maintainCounters(docs.sparkSession, bm, bp, oldLabels, exited, nextEk,
      labelTable.get, replay)

    // the per-doc guard table: a redelivery after this write anti-joins
    // to nothing. Plain APPEND (not merge — see the posts comment): the
    // batch is disjoint from the stored metadata by the guard itself,
    // and a crash mid-append leaves some docs committed — the per-doc
    // guard then re-processes exactly the missing ones on the next
    // delivery.
    meta = Some(store.append("meta", bm))
    // COMMIT RECORD, last: closing the watermark pair marks the trigger
    // fully committed, so the next delivery of this batchId (or the
    // next batch) takes the clean-trigger path
    writeBid(rawDocs.sparkSession, "commit_bid", batchId)
    commitBid = Some(batchId)
  }

  /** One-row batch-id watermark through the store's replace verb (tiny
    * by construction; survives restarts with the rest of the state). */
  private def writeBid(spark: SparkSession, name: String, bid: Long): Unit = {
    import spark.implicits._
    store.replace(name, Seq(bid).toDF("bid")): Unit
  }

  /** Persist the trigger's eviction set through the replace verb —
    * trigger-sized by construction (this trigger's dethronements only),
    * tagged with the batch id so [[loadExited]] can tell WHICH trigger
    * it belongs to. Written on every trigger (an empty set overwrites
    * the previous trigger's ids — `dethronedLastTrigger`'s contract is
    * empty on triggers without dethronements). */
  private def writeExited(spark: SparkSession, exited: Option[DataFrame],
                          bid: Long): Unit = {
    import spark.implicits._
    val df = exited.getOrElse(Seq.empty[Long].toDF("id"))
    store.replace("exited", df.select(col("id"), lit(bid).as("_bid"))): Unit
  }

  /** The persisted eviction set of trigger `bid`, or None when the
    * stored table belongs to a different trigger (a torn write loads as
    * whatever committed — both directions are safe: the consumer's
    * eviction is an idempotent tombstone). */
  private def loadExited(spark: SparkSession, bid: Long): Option[DataFrame] =
    scala.util.Try(store.load(spark, "exited").map(_.filter(col("_bid") === bid)
      .select(col("id")).localCheckpoint()))
      .toOption.flatten.filter(!_.isEmpty)

  /** A torn marker (crash mid-replace) loads as None — sound in both
    * directions: a torn INTENT means no later state write happened (it
    * is the trigger's first write), so clean-trigger processing is
    * correct; a torn COMMIT means everything up to and including `meta`
    * committed, so the per-doc guard absorbs the redelivery before the
    * replay flag is ever consulted. */
  private def loadBid(spark: SparkSession, name: String): Option[Long] =
    scala.util.Try(store.load(spark, name).map(_.head().getLong(0)))
      .toOption.flatten

  /**
   * Delta-maintenance of the per-doc stage-flag ledger and the
   * per-source serving counters — the "report without a corpus scan"
   * increment: instead of re-deriving every doc's flags at serve time,
   * each trigger re-evaluates flags ONLY for the AFFECTED set and folds
   * the flag FLIPS into the counters, so [[reportServed]] reads an
   * O(sources) table. The affected set is exactly the docs whose flags
   * CAN change this trigger:
   *
   *  - the batch's own docs (new rows);
   *  - dethroned keepers (lose `s_exact` and everything downstream);
   *  - every member of every cluster the new labeling touches —
   *    clusters of batch docs and of the dethroned docs' old
   *    components — because keep-best is a cluster-local argmax and a
   *    new member (or a removed best) flips OTHER members' `s_kb`;
   *  - docs whose contamination newly crosses the >=2-shared-fp bound.
   *    Contamination is monotone (postings only append, bench
   *    membership is static), so candidates are the pairs with >=1 NEW
   *    shared fingerprint, totals counted over the full posting store —
   *    a pair can only reach the bound on the trigger that lands one of
   *    its sides.
   *
   * Everything here is delta- or touched-component-sized except the
   * keyed lookups into the ledger (semi/anti joins on doc id) and the
   * contamination totals pass, which looks up the candidate docs'
   * posting lists in the accumulated posting store — a broadcast-keyed
   * lookup that SCANS the append table at this scale; the 100 TB form
   * partitions the posting store by doc-id bucket (exactly the
   * [[ParquetTwinStore]] layout) so the lookup prunes to the candidate
   * docs' buckets instead of scanning corpus history.
   * `StreamingSpec` pins `reportServed` == the full recomputed report
   * after EVERY trigger under the adversarial orders.
   */
  private def maintainCounters(spark: SparkSession, bm: DataFrame, bp: DataFrame,
                               oldLabels: Option[DataFrame], exited: Option[DataFrame],
                               nextEk: DataFrame, nextLabels: DataFrame,
                               replay: Boolean): Unit = {
    import org.apache.spark.sql.functions.broadcast
    val bIds = bm.select(col("doc_id").as("id"))
    // on a replay the ledger may already hold the batch docs' rows; the
    // batch metadata is authoritative for them, so drop the ledger's
    // copies from every union below (a no-op on clean triggers — the
    // guard keeps ledger and batch disjoint)
    val fl0 = flags.getOrElse(emptyFlags(spark))
      .join(bIds, col("doc_id") === bIds("id"), "left_anti")

    // ---- newly contaminated docs (monotone flip) ----
    val ps = posts.get
    val psBench = ps.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("bench_id"), col("fp"))
    val psNon = ps.filter(col("doc_id") % 50 =!= 0)
    val bpBench = bp.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("bench_id"), col("fp"))
    val bpNon = bp.filter(col("doc_id") % 50 =!= 0)
    val cand = bpNon.join(broadcast(psBench), "fp").select(col("doc_id"), col("bench_id"))
      .unionByName(psNon.join(broadcast(bpBench), "fp").select(col("doc_id"), col("bench_id")))
      .distinct().localCheckpoint()
    val newContam = cand
      .join(psNon.select(col("doc_id"), col("fp")), "doc_id")
      .join(psBench, Seq("bench_id", "fp"))
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .select(col("doc_id").as("id")).distinct().localCheckpoint()

    // ---- affected set ----
    val xIds = exited.getOrElse(bIds.limit(0))
    val oldHitMembers = (oldLabels, exited) match {
      case (Some(ol), Some(x)) =>
        val hitK = ol.join(x, Seq("id"), "left_semi").select(col("keeper")).distinct()
        ol.join(hitK, Seq("keeper"), "left_semi").select(col("id"))
      case _ => bIds.limit(0)
    }
    val a1base = bIds.unionByName(xIds).unionByName(oldHitMembers)
      .unionByName(newContam)
    // crash-recovery trigger: the pre-crash labeling is unrecoverable
    // (the label merge may have committed), so flag flips the crashed
    // delivery computed for OTHER members of its touched clusters can't
    // be re-derived from any delta — re-evaluate the WHOLE ledger once.
    // Table-mass on exactly the replay trigger (like the counters
    // rebuild below — the price of exactly-once re-processing without a
    // cross-table transactional store); clean triggers stay
    // affected-set-sized.
    val a1 =
      (if (replay) a1base.unionByName(fl0.select(col("doc_id").as("id")))
       else a1base).distinct().localCheckpoint()
    // close over whole clusters in the NEW labeling: keep-best is a
    // cluster-local argmax, so any touched cluster re-evaluates ALL its
    // members
    val k = nextLabels.join(a1, Seq("id"), "left_semi")
      .select(col("keeper")).distinct()
    val m = nextLabels.join(k, Seq("keeper"), "left_semi").localCheckpoint()
    val aIds = a1.unionByName(m.select(col("id"))).distinct().localCheckpoint()

    // ---- new flags for the affected set ----
    val attrs = bm.select(col("doc_id"), col("source"), col("h"), col("qx"), col("nt"),
        lit(false).as("contam0"))
      .unionByName(fl0.select(col("doc_id"), col("source"), col("h"), col("qx"),
        col("nt"), col("contam").as("contam0")))
      .join(aIds, col("doc_id") === aIds("id"), "left_semi")
    val qxAll = bm.select(col("doc_id").as("qid"), col("qx").as("q"))
      .unionByName(fl0.select(col("doc_id").as("qid"), col("qx").as("q")))
    val mq = m.join(qxAll, col("id") === col("qid")).select(col("id"), col("keeper"), col("q"))
    val best = mq.groupBy("keeper")
      .agg(max(struct(col("q").as("qx"), (col("id") * lit(-1L)).as("nid"))).as("b"))
      .select(col("keeper"), (col("b.nid") * lit(-1L)).as("best_id"))
    val losersA = mq.join(best.hint("merge"), Seq("keeper"))
      .filter(col("id") =!= col("best_id")).select(col("id").as("nd_id"))
    val nf = attrs
      .join(nextEk.select(col("h"), col("keep_id")), Seq("h"))
      .withColumn("s_exact", col("doc_id") === col("keep_id"))
      .join(losersA.hint("merge"), col("doc_id") === col("nd_id"), "left")
      .withColumn("s_kb", col("s_exact") && col("nd_id").isNull)
      .withColumn("s_q", col("s_kb") && col("qx") >= 550)
      .join(newContam.select(col("id").as("ct_id")), col("doc_id") === col("ct_id"), "left")
      .withColumn("contam", col("contam0") || col("ct_id").isNotNull)
      .withColumn("s_clean", col("s_q") && !col("contam"))
      .select(col("doc_id"), col("source"), col("h"), col("qx"), col("nt"),
        col("s_exact"), col("s_kb"), col("s_q"), col("contam"), col("s_clean"))
      .localCheckpoint()

    // ---- ledger merge FIRST: the re-evaluated (affected-set) rows
    // upsert by doc id; unaffected rows are never rewritten (update-mass
    // write). Written before the counters so a replay can rebuild the
    // counters from a ledger that already absorbed this batch.
    flags = Some(store.merge("flags", Seq("doc_id"), nf, None))

    def vec(df: DataFrame, sign: Long): DataFrame = df.select(col("source"),
      lit(sign).as("d_raw"),
      when(col("s_exact"), sign).otherwise(0L).as("d_exact"),
      when(col("s_kb"), sign).otherwise(0L).as("d_kb"),
      when(col("s_q"), sign).otherwise(0L).as("d_q"),
      when(col("s_clean"), sign).otherwise(0L).as("d_clean"),
      when(col("s_clean"), col("nt") * sign).otherwise(0L).as("d_toks"))
    def fold(deltas: DataFrame): DataFrame = deltas.groupBy("source")
      .agg(sum(col("d_raw")).as("n_raw"), sum(col("d_exact")).as("n_exact"),
        sum(col("d_kb")).as("n_keepbest"), sum(col("d_q")).as("n_quality"),
        sum(col("d_clean")).as("n_clean"), sum(col("d_toks")).as("n_toks"))
    counters = Some(store.replace("counters",
      if (replay)
        // crash-recovery trigger: the increment-based diff cannot know
        // whether the crashed delivery already folded its delta, so
        // rebuild the counters from the (just-merged, authoritative)
        // flag ledger — table-mass ONCE, on this trigger only
        fold(vec(flags.get, 1L))
      else {
        // counter deltas = new-flag vectors minus old-flag vectors; a
        // NEW doc has no old row, so its +1 raw contribution survives
        // the diff, while an existing doc's raw contributions cancel
        val oldA = fl0.join(aIds, fl0("doc_id") === aIds("id"), "left_semi")
        val delta = vec(nf, 1L).unionByName(vec(oldA, -1L))
        val prev = counters.getOrElse(emptyCounters(spark))
          .select(col("source"), col("n_raw").as("d_raw"), col("n_exact").as("d_exact"),
            col("n_keepbest").as("d_kb"), col("n_quality").as("d_q"),
            col("n_clean").as("d_clean"), col("n_toks").as("d_toks"))
        fold(prev.unionByName(delta))
      }))
  }

  private def emptyFlags(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, String, Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .toDF("doc_id", "source", "h", "qx", "nt", "s_exact", "s_kb", "s_q", "contam", "s_clean")
  }

  private def emptyCounters(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long, Long, Long, Long, Long)]
      .toDF("source", "n_raw", "n_exact", "n_keepbest", "n_quality", "n_clean", "n_toks")
  }

  /** The serving report: the identical output to [[report]] read from
    * the delta-maintained per-source counters — O(sources) rows through
    * the shared [[Curation.temperatureTail]], no corpus scan. */
  def reportServed(spark: SparkSession): DataFrame = synchronized {
    resume(spark)
    Curation.temperatureTail(counters.getOrElse(emptyCounters(spark)))
  }

  /** Attach to a streaming (doc_id, source, text) source. */
  def sink(stream: DataFrame): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processBatch(batch, batchId)
    }
}
