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

  /** Train `rounds` merges; returns the merge table
    * `(merge_round, left_sym, right_sym, pair_n, corpus_symbols_after)`.
    * Stops early if no pair remains (all words single-symbol). */
  def train(spark: SparkSession, docs: DataFrame, rounds: Int): DataFrame = {
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
    val schema = StructType(Seq(
      StructField("merge_round", LongType, nullable = false),
      StructField("left_sym", StringType, nullable = false),
      StructField("right_sym", StringType, nullable = false),
      StructField("pair_n", LongType, nullable = false),
      StructField("corpus_symbols_after", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), schema)
  }
}
