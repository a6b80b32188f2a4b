package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/**
 * Corpus-trained bigram language-model quality score — the perplexity-proxy
 * filter stage of a pretraining pipeline (CCNet-style: score each document
 * under a LM trained on the corpus itself; low-probability documents are
 * gibberish/boilerplate candidates).
 *
 * The per-bigram score is the conditional frequency P(w2|w1) =
 * C(w1,w2) / C(w1·) over the corpus's observed bigrams, floor-scaled to an
 * integer (×10⁶) *before* summing — floor(sum/n) of integers is exact on
 * every engine, whereas a log-prob sum would be addition-order- and
 * libm-dependent (same rationale as the rational TF-IDF idf).
 *
 * Scale: the context counts C(w1·) derive from the bigram counts (groupBy
 * over the *already aggregated* table, not a second pass over the corpus);
 * the per-document join shuffles on (w1, w2) then w1 — hot contexts
 * ("the", boilerplate headers) are classic skew keys, which AQE's skew
 * join splits; the final fold is one partial-aggregated groupBy(doc_id).
 */
object LmScore {

  /** `array<struct<w1,w2>>` of consecutive token pairs. `toks` must be a
    * bound column (lambda capture re-evaluates per element). */
  def bigramPairs(toks: Column): Column =
    when(size(toks) >= 2,
      zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** `(doc_id, n_bigrams, lm_x1e6)` — mean scaled conditional bigram
    * frequency per document; documents with no bigrams score 0. */
  def bigramLmScores(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), Hashing.toks(col("text")).as("toks"))
      .select(col("doc_id"), explode(bigramPairs(col("toks"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_big"))
    val ctx = big.groupBy("w1").agg(sum("c_big").as("c_ctx"))
    val scored = pairs
      .join(big, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .withColumn("t", floor(lit(1000000.0) * col("c_big") / col("c_ctx")).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("t").as("sum_t"))
      .withColumn("lm_x1e6",
        floor(col("sum_t").cast("double") / col("n_bigrams")).cast("long"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_x1e6"), lit(0L)).as("lm_x1e6"))
  }
}
