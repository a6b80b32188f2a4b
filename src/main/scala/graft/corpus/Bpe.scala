package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Distributed BPE merge training (Sennrich et al. 2016, "Neural Machine
 * Translation of Rare Words with Subword Units") — the tokenizer-training
 * op of an LLM data pipeline, as iterated Spark aggregations.
 *
 * Classic algorithm, distributed shape: the corpus collapses ONCE to the
 * word-frequency table (one shuffle on word — at 100 TB the wire carries
 * word types, not occurrences, thanks to map-side partial counts); every
 * merge round is then (1) a pair-count aggregation over the CURRENT
 * per-word symbol segmentation — map-side explode of adjacent symbol
 * pairs weighted by word frequency, partial-aggregated, vocabulary-sized
 * — and (2) a greedy left-to-right merge of the winning pair applied as
 * a column expression (an array fold, no UDF). The driver sees exactly
 * ONE row per round (the argmax pair — the same codebook-tier feedback
 * as [[Classifier]]'s weight update); documents are never re-read after
 * the first collapse.
 *
 * Determinism: pair counts are integer sums; the argmax tie-breaks
 * (count desc, left asc, right asc); greedy left-to-right application is
 * the standard BPE semantics and is replayed by the DuckDB oracle as a
 * string fold. Pair counts use the standard overlapping-adjacent
 * convention (wc × per-word adjacent occurrences), like the reference
 * implementation's `get_stats`.
 */
object Bpe {

  /** Greedy left-to-right merge of adjacent (l, r) into l+r over a
    * symbol-array column. A just-merged symbol never re-merges within
    * the round (l+r is strictly longer than l, so it can't equal l). */
  def mergeExpr(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 && element_at(acc, -1) === l && x === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent-pair counts of the current segmentation, weighted by word
    * frequency: `(l, r, n)`, vocabulary-pair-sized. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("wc"), explode(
        zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("wc")).as("n"))

  /** The word-frequency table with initial character segmentation:
    * `(syms: array<string>, wc: long)`. */
  def initialWords(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("syms"),
        col("wc"))

  private val mergeSchema = StructType(Seq(
    StructField("merge_round", LongType, nullable = false),
    StructField("left_sym", StringType, nullable = false),
    StructField("right_sym", StringType, nullable = false),
    StructField("pair_n", LongType, nullable = false),
    StructField("corpus_symbols_after", LongType, nullable = false)))

  /** Train `rounds` merges; returns the merge table
    * `(merge_round, left_sym, right_sym, pair_n, corpus_symbols_after)`.
    * Stops early if no pair remains (all words single-symbol).
    *
    * BATCHED driver rounds: each driver round collects the top
    * `maxBatch + 1` pairs and applies the longest safe prefix in one
    * chained pass — cutting driver round-trips (and pair-count
    * aggregations, the per-round cost) up to `maxBatch`×. The merge
    * table is IDENTICAL to one-merge-at-a-time training ([[trainSequential]],
    * pinned by `BpeSpec`); the batch prefix is safe because
    *  - candidates are accepted in rank order only while their symbol
    *    sets `{l, r, l+r}` are pairwise disjoint — a merge can only
    *    change counts of pairs sharing one of its symbols (adjacency
    *    positions of fully-disjoint pairs are untouched), so each
    *    accepted candidate's live count equals its snapshot count; and
    *  - the prefix is truncated where its count no longer STRICTLY
    *    exceeds 4× the first non-accepted candidate's count `nb`. Why 4×
    *    is airtight: a pair P whose live count can ever EXCEED its
    *    snapshot count must contain a concat value `l+r` of an accepted
    *    merge (only created symbol occurrences create new adjacencies),
    *    so P interacts and is not accepted — hence snapshot n(P) <= nb
    *    (were it above the boundary it would have been hit by the
    *    rank-ordered takeWhile and stopped the prefix there). Every
    *    CREATED occurrence of P=(u,v) charges a distinct snapshot
    *    adjacency at its junction — one of (r_i, v), (u, l_j) or
    *    (r_i, l_j) for the (unique, used-set-distinct) merges i, j whose
    *    concats equal u, v — each a symbol-sharing pair with snapshot
    *    count <= nb. So live(P) <= n(P) + 3·nb <= 4·nb < every accepted
    *    count: no interloper ever reaches the sequential argmax, and
    *    ties INSIDE the prefix follow the same snapshot tie-break both
    *    ways.
    * A truncation to zero falls back to applying the argmax alone,
    * which is literally the sequential step. `corpus_symbols_after` is
    * read per stage from one chained aggregation (size after each
    * merge of the batch), matching the sequential per-round totals. */
  def train(spark: SparkSession, docs: DataFrame, rounds: Int,
            maxBatch: Int = 8): DataFrame = {
    var words = initialWords(docs).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var done = false
    var round = 1
    var driverRounds = 0
    while (round <= rounds && !done) {
      val want = math.min(maxBatch, rounds - round + 1)
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(want + 1).collect()
      driverRounds += 1
      if (top.isEmpty) done = true
      else {
        // longest rank-prefix with pairwise-disjoint {l, r, l+r}
        val used = scala.collection.mutable.Set.empty[String]
        val prefix = top.take(want).takeWhile { b =>
          val (l, r) = (b.getString(0), b.getString(1))
          val ok = !used(l) && !used(r) && !used(l + r)
          if (ok) used ++= Seq(l, r, l + r)
          ok
        }
        // strictness boundary: first candidate NOT in the prefix (next
        // rank after truncation, or the +1 probe row). If the list ran
        // dry inside the prefix, no other pair exists anywhere — and a
        // fully-disjoint exhaustive prefix admits no new pairs either
        // (a created pair (l+r, x) needs a snapshot (r, x) adjacency,
        // which would be a listed pair sharing r).
        val boundary: Option[Long] =
          if (prefix.length < top.length) Some(top(prefix.length).getLong(2)) else None
        val safeLen = boundary match {
          case None => prefix.length
          case Some(nb) =>
            val strict = prefix.takeWhile(_.getLong(2) > 4L * nb).length
            math.max(strict, 1) // the argmax alone is always the sequential step
        }
        val batch = prefix.take(safeLen)
          .map(b => (b.getString(0), b.getString(1), b.getLong(2)))
        // one chained pass: syms after merge 1, 2, …, k as staged columns
        val staged = batch.scanLeft(col("syms")) { case (acc, (l, r, _)) =>
          mergeExpr(acc, l, r)
        }.tail
        val proj = words.select(
          col("wc") +: staged.zipWithIndex.map { case (e, i) => e.as(s"s$i") }: _*)
          .localCheckpoint()
        val totals = proj.agg(
          sum(col("wc") * size(col("s0"))).as("t0"),
          batch.indices.drop(1).map(i =>
            sum(col("wc") * size(col(s"s$i"))).as(s"t$i")): _*).collect()(0)
        batch.zipWithIndex.foreach { case ((l, r, n), i) =>
          merges += Row((round + i).toLong, l, r, n, totals.getLong(i))
        }
        words = proj.select(col(s"s${batch.length - 1}").as("syms"), col("wc"))
        round += batch.length
      }
    }
    lastDriverRounds = driverRounds
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), mergeSchema)
  }

  /** Driver-round count of the most recent [[train]] call (test-only
    * observability for the batching win — `BpeSpec` pins it well below
    * the merge count). */
  @volatile private[graft] var lastDriverRounds: Int = 0

  /** One merge per driver round — the reference implementation the
    * batched [[train]] is pinned against (identical merge table on any
    * corpus; `BpeSpec` checks it on several). */
  def trainSequential(spark: SparkSession, docs: DataFrame, rounds: Int): DataFrame = {
    var words = initialWords(docs).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var done = false
    for (r <- 1 to rounds if !done) {
      val best = pairCounts(words)
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, rr, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        words = words
          .withColumn("syms", mergeExpr(col("syms"), l, rr))
          .localCheckpoint()
        val symsAfter = words
          .agg(sum(col("wc") * size(col("syms")))).collect()(0).getLong(0)
        merges += Row(r.toLong, l, rr, n, symsAfter)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), mergeSchema)
  }
}
