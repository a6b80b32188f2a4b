package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * DoReMi-style ITERATIVE domain reweighting (Xie et al. 2023, "DoReMi:
 * Optimizing Data Mixtures Speeds Up Language Model Pretraining") — the
 * missing dynamic member of the mixture family next to the static rules
 * (`corpus_mix`, `corpus_mix_temperature`, `corpus_domain_cap`,
 * `corpus_importance`): instead of fixing shares by token mass or a
 * hand-picked temperature, run multiplicative-weights rounds that
 * UPWEIGHT the domains the corpus-trained language model finds hard —
 * DoReMi's excess-loss signal, with the proxy-model loss stood in by
 * the deterministic integer bigram-LM score ([[LmScore]], the CCNet
 * perplexity proxy this repo already oracles).
 *
 * Deterministic integer variant (exact-oracle discipline): domain
 * hardness in round r is `excess_d = max(wmean - mean_d, 0)` where
 * `mean_d` is the domain's integer mean LM score (low score = the LM
 * finds the domain surprising = hard) and `wmean = (Σ w_d·mean_d) div
 * (Σ w_d)` is the CURRENT-mixture mean — so the excess genuinely
 * changes as weights move (hard domains gain weight → the mixture mean
 * drops toward them → their excess shrinks: converging MW dynamics,
 * not a one-shot ranking). The update is the rational multiplicative
 * rule `w' = w · (1000 + (η·excess) div 10^6) div 1000` (η permille in
 * excess units — exp(η·excess) to first order, exactly replayable);
 * weights stay UNNORMALIZED through the rounds (no compounding floor
 * loss) and normalize to permille once at the end. Every quantity is a
 * BIGINT and every operation div/greatest, so the whole trajectory
 * replays bit-exactly in DuckDB (`corpus_mix_doremi`).
 *
 * Distributed shape (the 100 TB story): ONE corpus-mass pass (the
 * bigram LM scoring — already the shape of `text_lm_score`) collapses
 * to the per-domain table `(source, n_docs, mean)`; every MW round is
 * then one aggregate + one broadcast cross-join over that
 * DOMAIN-cardinality table (tens of rows) — the corpus is never
 * re-read, exactly like the BPE/unigram codebook rounds.
 *
 * Reference anchor: the reference engine has no mixture surface (its
 * projections fold events — eventstorm/internal/projections/
 * projection.go); this extends the engine's training-data curation
 * family per the brief.
 */
object Doremi {

  /** Per-domain LM-score summary `(source, n_docs, s)` from
    * already-computed per-doc scores + a (doc_id, source) map — shared
    * by the batch collapse and [[graft.streaming.StreamingDoremi]]'s
    * serve path (which re-scores from its STORED profile/model tables,
    * never the corpus). NOTE this summary is NOT itself mergeable
    * across batches: `lm_x1e6` is scored under the corpus-TRAINED
    * model, which changes as data arrives — the mergeable state is the
    * bigram model and the per-doc profiles (plain sums), not the score
    * sums. */
  def domainSumsFromScores(scores: DataFrame, docSource: DataFrame): DataFrame =
    scores
      .join(docSource.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("lm_x1e6")).as("s"))

  /** Per-domain LM-score summary `(source, n_docs, s)`. */
  def domainSums(docs: DataFrame): DataFrame =
    domainSumsFromScores(LmScore.bigramLmScores(docs), docs)

  /** `(source, n_docs, mean_lm_x1e6)` from the additive summary. */
  def meansFromSums(sums: DataFrame): DataFrame =
    sums.select(col("source"), col("n_docs"),
      expr("s div n_docs").as("mean_lm_x1e6"))

  /** Per-domain LM-score summary `(source, n_docs, mean_lm_x1e6)` — the
    * single corpus collapse the MW rounds iterate on. Documents without
    * bigrams score 0 (they drag their domain's mean, deterministically). */
  def domainMeans(docs: DataFrame): DataFrame =
    meansFromSums(domainSums(docs))

  /** `rounds` multiplicative-weights rounds over [[domainMeans]]:
    * `(source, n_docs, mean_lm_x1e6, w_mult, weight_permille)` with
    * `w_mult` the final unnormalized weight (start 1000) and
    * `weight_permille` its share of the final mixture. */
  def domainWeights(docs: DataFrame, etaX1000: Long = 500,
                    rounds: Int = 3): DataFrame =
    weightsFromMeans(domainMeans(docs), etaX1000, rounds)

  /** The MW rounds over an already-collapsed `(source, n_docs,
    * mean_lm_x1e6)` table — shared by the batch query and the streaming
    * twin's serve path (which retrains from the maintained domain table
    * without re-reading the corpus). */
  def weightsFromMeans(means: DataFrame, etaX1000: Long,
                       rounds: Int): DataFrame = {
    var w = means.withColumn("w", lit(1000L))
    for (_ <- 1 to rounds) {
      val tot = w.agg(sum(expr("w * mean_lm_x1e6")).as("sw"), sum(col("w")).as("tw"))
      w = w.crossJoin(broadcast(tot))
        .withColumn("excess",
          greatest(expr("sw div tw") - col("mean_lm_x1e6"), lit(0L)))
        .withColumn("w",
          expr(s"(w * (1000 + ($etaX1000 * excess) div 1000000)) div 1000"))
        .select(col("source"), col("n_docs"), col("mean_lm_x1e6"), col("w"))
    }
    val tw = w.agg(sum(col("w")).as("twf"))
    w.crossJoin(broadcast(tw))
      .select(col("source"), col("n_docs"), col("mean_lm_x1e6"),
        col("w").as("w_mult"),
        expr("(1000 * w) div twf").as("weight_permille"))
  }

  // ---------------------------------------------------------------------
  // Sequential reference (test-only): the same MW trajectory as plain
  // Scala over a collected (source, mean) table — DoremiSpec pins the
  // distributed rounds to it and the dynamics direction.
  // ---------------------------------------------------------------------

  private[graft] def weightsSequential(domains: Seq[(String, Long, Long)],
                                       etaX1000: Long, rounds: Int): Seq[(String, Long, Long, Long, Long)] = {
    var w = domains.map { case (s, n, m) => (s, n, m, 1000L) }
    for (_ <- 1 to rounds) {
      val sw = w.map { case (_, _, m, wi) => wi * m }.sum
      val tw = w.map(_._4).sum
      val wmean = sw / tw
      w = w.map { case (s, n, m, wi) =>
        val excess = math.max(wmean - m, 0L)
        (s, n, m, wi * (1000L + etaX1000 * excess / 1000000L) / 1000L)
      }
    }
    val twf = w.map(_._4).sum
    w.map { case (s, n, m, wi) => (s, n, m, wi, 1000L * wi / twf) }
  }
}
