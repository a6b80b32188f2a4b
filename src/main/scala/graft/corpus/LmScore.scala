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

  /** Per-document bigram PROFILE `(doc_id, w1, w2, cnt)` — each doc's
    * bigram occurrence counts, the tokenize+explode pass collapsed to
    * its mergeable form. This is the expensive corpus-mass pass of the
    * LM family; everything downstream is joins over already-aggregated
    * integer tables, which is what lets
    * [[graft.streaming.StreamingDoremi]] maintain profiles + model
    * incrementally and re-score WITHOUT re-reading the corpus. */
  def bigramProfiles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Hashing.toks(col("text")).as("toks"))
      .select(col("doc_id"), explode(bigramPairs(col("toks"))).as("p"))
      .groupBy(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))

  /** The corpus bigram model `(w1, w2, c_big)` from profiles — additive
    * across any corpus split (a plain sum), so a streaming maintainer
    * can merge per-batch models into a standing one. */
  def bigramModel(profiles: DataFrame): DataFrame =
    profiles.groupBy("w1", "w2").agg(sum("cnt").as("c_big"))

  /** Scores from an already-collapsed profile table and a model —
    * Σ_occurrences floor(1e6·C(w1w2)/C(w1·)) computed as Σ_types
    * cnt·floor(...), exactly the per-occurrence sum (integer identity).
    * `docIds` supplies the docs with no bigrams (score 0). */
  def bigramLmScoresFromProfiles(profiles: DataFrame, docIds: DataFrame,
                                 model: DataFrame): DataFrame = {
    val ctx = model.groupBy("w1").agg(sum("c_big").as("c_ctx"))
    val scored = profiles
      .join(model, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .withColumn("t", floor(lit(1000000.0) * col("c_big") / col("c_ctx")).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_bigrams"), sum(col("cnt") * col("t")).as("sum_t"))
      .withColumn("lm_x1e6",
        floor(col("sum_t").cast("double") / col("n_bigrams")).cast("long"))
    docIds.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_x1e6"), lit(0L)).as("lm_x1e6"))
  }

  /** `(doc_id, n_bigrams, lm_x1e6)` — mean scaled conditional bigram
    * frequency per document; documents with no bigrams score 0. */
  def bigramLmScores(docs: DataFrame): DataFrame = {
    val profiles = bigramProfiles(docs)
    bigramLmScoresFromProfiles(profiles, docs.select(col("doc_id")),
      bigramModel(profiles))
  }
}
