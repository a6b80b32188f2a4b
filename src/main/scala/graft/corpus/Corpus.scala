package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/**
 * Corpus-preparation operators a large-scale training-data pipeline runs
 * between "raw documents" and "tokenized shards": deterministic stratified
 * sampling, context-window chunking, and greedy sequence packing.
 *
 * Everything is *deterministic and engine-mirrorable* (no RNG state): a
 * sampling decision is a pure function of `(doc_id, salt)`, so reruns,
 * retries and audits reproduce the same subcorpus bit-for-bit — the same
 * reproducibility contract as the dedup hashing ([[graft.dedup.Hashing]]).
 */
object Sampling {

  /** Deterministic permille bucket of a document id: the rolling polynomial
    * hash ([[graft.plans.PolyHash]], codegen'd) of `"<id>#<salt>"` mod 1000.
    * Changing the salt draws an independent sample; the same salt always
    * draws the same one. Map-only — no shuffle, no RNG. */
  def bucket1000(id: Column, salt: String): Column =
    pmod(call_function("graft_polyhash", concat(id.cast("string"), lit("#" + salt))), lit(1000L))

  /** Per-stratum rate as a Column: chained `when` over the (small, fixed)
    * rate map; unknown strata fall back to `defaultPermille`. */
  def rateFor(stratum: Column, rates: Map[String, Int], defaultPermille: Int): Column =
    rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille.toLong)) {
      case (acc, (k, v)) => when(stratum === k, lit(v.toLong)).otherwise(acc)
    }

  /** Stratified subsample: keep a row iff its deterministic bucket falls
    * below its stratum's permille rate. Scale: a map-only filter pushed
    * into the scan's projection — sampling 100 TB reads 100 TB once but
    * shuffles nothing and keeps only the sampled fraction downstream. */
  def stratified(docs: DataFrame, stratumCol: String, rates: Map[String, Int],
                 salt: String, defaultPermille: Int = 0): DataFrame =
    docs
      .withColumn("bucket", bucket1000(col("doc_id"), salt))
      .filter(col("bucket") < rateFor(col(stratumCol), rates, defaultPermille))

  /** Deterministic train/val/test assignment: the permille bucket of
    * `(doc_id, salt)` partitions the corpus into `train` (< trainPermille),
    * `val` (next valPermille), `test` (rest). Map-only and engine-
    * mirrorable like [[stratified]]; because the bucket is a pure function
    * of the id, the split is STABLE under corpus growth — a document never
    * migrates between splits when new data arrives, which is the property
    * that keeps eval sets uncontaminated across pipeline reruns. */
  def splitAssign(docs: DataFrame, salt: String,
                  trainPermille: Int, valPermille: Int): DataFrame = {
    val b = bucket1000(col("doc_id"), salt)
    docs
      .withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPermille, "train")
          .when(col("bucket") < trainPermille + valPermille, "val")
          .otherwise("test"))
  }

  /** Exactly-k-per-stratum deterministic sample: rank documents within
    * each stratum by the full salt hash (doc_id tiebreak) and keep the
    * first `k` — the reproducible way to draw a fixed-size eval/holdout
    * set per domain. Scale: one shuffle on the stratum key + a window
    * top-k; for huge strata, pre-filter with [[stratified]] at a rate
    * comfortably above k/|stratum| so the window's sort input is small. */
  def fixedSizePerStratum(docs: DataFrame, stratumCol: String, k: Int,
                          salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = call_function("graft_polyhash",
      concat(col("doc_id").cast("string"), lit("#" + salt)))
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("h"), col("doc_id"))
    docs
      .withColumn("h", h)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}

/**
 * Context-window chunking: split each document's token stream into
 * consecutive windows of `chunkSize` tokens (the RAG / embedding-input
 * shape). Pure Column algebra — map-only, codegen'd, one row in → n/size
 * rows out, no shuffle.
 */
object Chunking {

  val defaultChunkSize = 32

  /** `array<struct<chunk_idx, chunk_text, n_tokens>>` of `text`'s token
    * windows. The token array is expected as a *bound column* (not an
    * expression) — lambda bodies re-evaluate captured subtrees per element,
    * so splitting inside the lambda would re-tokenize per chunk. */
  def chunksOf(toks: Column, chunkSize: Int): Column = {
    val n = size(toks)
    val nChunks = floor((n.cast("double") + lit(chunkSize - 1)) / lit(chunkSize)).cast("int")
    transform(sequence(lit(0), nChunks - 1), i => {
      val piece = slice(toks, i * chunkSize + 1, lit(chunkSize))
      struct(
        i.cast("long").as("chunk_idx"),
        array_join(piece, " ").as("chunk_text"),
        size(piece).cast("long").as("n_tokens"))
    })
  }

  /** Exploded `(doc_id, chunk_idx, n_tokens, fp_chunk)` chunk table of
    * `documents` — fingerprints via the codegen'd polyhash kernel. */
  def chunkTable(docs: DataFrame, chunkSize: Int = defaultChunkSize): DataFrame =
    docs
      .select(col("doc_id"), Hashing.toks(col("text")).as("toks"))
      .select(col("doc_id"), explode(chunksOf(col("toks"), chunkSize)).as("c"))
      .select(
        col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.n_tokens").as("n_tokens"),
        call_function("graft_polyhash", col("c.chunk_text")).as("fp_chunk"))
}

/**
 * Greedy sequence packing: assign documents to fixed-token-budget bins
 * (training context windows), first-come order within each source. A
 * document that would overflow the current bin starts the next one; a
 * document larger than the whole budget gets a bin of its own.
 *
 * Packing is inherently a *sequential fold* per source (bin state carries
 * across documents), so it cannot be a window function; it runs as a
 * per-partition primitive loop after co-locating and ordering each source
 * — the same secondary-sort-fold shape as the projection batch runner
 * ([[graft.proj.ProjectionBatch]]).
 *
 * Scale: one shuffle (repartition by source) + a streaming per-partition
 * pass; state is O(1) per task. A single giant source serializes into one
 * task by construction — shard it first (pack within `(source, shard)`
 * where `shard = doc_id / k`) when a stratum outgrows a task, which
 * changes bin numbering but not the packing invariant.
 */
object Packing {

  val defaultBudget = 256L

  /** `(source, doc_id, n_tokens, bin)` — bins numbered from 0 per source,
    * documents visited in `doc_id` order. */
  def packGreedy(docs: DataFrame, budget: Long = defaultBudget): DataFrame =
    packGreedyByCount(
      docs.select(col("source"), col("doc_id"),
        size(Hashing.toks(col("text"))).cast("long").as("n_tokens")),
      budget)

  /** Same first-fit walk over PRECOMPUTED counts `(source, doc_id,
    * n_tokens)` — the e2e tokenize pipeline packs by trained-tokenizer
    * subword counts instead of whitespace tokens. */
  def packGreedyByCount(counted: DataFrame, budget: Long): DataFrame = {
    val spark = counted.sparkSession
    import spark.implicits._
    counted
      .select(col("source"), col("doc_id"), col("n_tokens").cast("long"))
      .repartition(col("source"))
      .sortWithinPartitions("source", "doc_id")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curSource: String = null
        var bin = 0L
        var fill = 0L
        it.map { case (src, id, nt) =>
          if (src != curSource) { curSource = src; bin = 0L; fill = nt }
          else if (fill + nt <= budget) fill += nt
          else { bin += 1L; fill = nt }
          (src, id, nt, bin)
        }
      }
      .toDF("source", "doc_id", "n_tokens", "bin")
  }
}

/**
 * Distributed total-order ranking — the scale-safe form of
 * `row_number() OVER (PARTITION BY p ORDER BY k)` when a partition is the
 * whole corpus (training-order shuffles, global leaderboards). A plain
 * window moves every row of the partition into ONE task; here the rank is
 * assembled from range partitioning instead:
 *
 *  1. `repartitionByRange` on `(partitionCols ++ orderCols)` — rows land in
 *     range-contiguous shuffle partitions (materialized once,
 *     `localCheckpoint`, so the counting pass and the rank pass share it);
 *  2. per-(partition, range) row counts — a partial-agg shuffle of
 *     #ranges × #partitions rows;
 *  3. cumulative offsets over that TINY table (a triangular broadcast
 *     join over ≤ #ranges rows per partition key — no window at all, so
 *     even a fully-global rank plans zero partitionBy-less windows),
 *     broadcast back;
 *  4. rank = local `row_number` within the range + the range's offset.
 *
 * Identical output to the window form for any total `orderCols` order
 * (ties must be broken — include a unique key last); pinned bit-identical
 * in `CorpusSpec`. No driver collect; no task ever holds more than one
 * range of one partition key.
 */
object Ranking {

  /** `df` + `rankCol` (1-based dense position within each `partitionCols`
    * group ordered by `orderCols`). `orderCols` must be a total order. */
  def globalRank(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[String],
                 rankCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rangeCols = (partitionCols ++ orderCols).map(col)
    val pCols = partitionCols.map(col)
    val ranged = df.repartitionByRange(rangeCols: _*)
      .withColumn("_range", spark_partition_id().cast("long"))
      .localCheckpoint()
    val counts = ranged
      .groupBy(pCols :+ col("_range"): _*)
      .agg(count(lit(1)).as("_n"))
    // cumulative count of earlier ranges, per partition key. The counts
    // table is ≤ #ranges × #keys rows, so the prefix sum rides a
    // triangular broadcast join rather than a window — with empty
    // partitionCols a window here would be THE partitionBy-less
    // single-task shape this helper exists to avoid (and the repo-wide
    // WindowSweepSpec asserts out).
    val bCols = counts.columns.map("_b_" + _)
    val earlier = counts.toDF(bCols.toIndexedSeq: _*)
    val joinCond = partitionCols.foldLeft(col("_b__range") < col("_range")) {
      (c, p) => c && col("_b_" + p) === col(p)
    }
    val offs = counts
      .join(broadcast(earlier), joinCond, "left")
      .groupBy(pCols :+ col("_range"): _*)
      .agg(coalesce(sum(col("_b__n")), lit(0L)).as("_off"))
    val localW = Window.partitionBy(pCols :+ col("_range"): _*)
      .orderBy(orderCols.map(col): _*)
    ranged
      .join(broadcast(offs), partitionCols :+ "_range")
      .withColumn(rankCol, (row_number().over(localW) + col("_off")).cast("long"))
      .drop("_range", "_off")
  }
}
