package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * DSIR-style data selection via importance resampling (Xie et al. 2023,
 * "Data Selection for Language Models via Importance Resampling"): score
 * every raw document by how much it looks like a TARGET domain under
 * hashed bag-of-token models, then keep a deterministic pseudo-random
 * subset with acceptance probability proportional to that importance
 * weight.
 *
 * Integer-exact variant: the published method sums log-probability
 * ratios; logs are libm- and order-dependent across engines, so the
 * weight here is the MEAN of the per-token probability ratios, scaled
 * ×1e6 and floored — the same determinism trade [[LmScore]] makes for
 * CCNet perplexity. Both numerator and denominator models are
 * add-one-smoothed over `buckets` hashed token classes.
 *
 * Scale shape: the two bucket-count models aggregate to `buckets` rows
 * each (partial-aggregated map-side; the wire carries bucket cells, not
 * tokens) and the merged ratio table BROADCASTS back into one map-side
 * scoring pass over the exploded corpus — the corpus itself never
 * shuffles; the per-doc mean is one partial-aggregated rollup on doc_id.
 * The acceptance draw is the hash-threshold sampler of
 * [[Sampling]] — reproducible across engines, retries, and cluster
 * sizes. At data scales where 1e6·tokens² overflows int64, drop the
 * ratio scale to 1e3 (like the sketch permille constants) — the model
 * build GUARDS this bound with an in-expression assert_true and fails
 * loudly rather than silently serving wrapped weights.
 */
object Importance {

  /** The `(bucket, s_x1e6)` ratio model as a DataFrame (buckets rows). */
  def modelDf(docs: DataFrame, targetSource: String, buckets: Int = 256): DataFrame = {
    val toks = tokenBuckets(docs, buckets)
    val raw = toks.groupBy("b").agg(count(lit(1)).as("rc"))
    val tgt = toks.filter(col("source") === targetSource)
      .groupBy("b").agg(count(lit(1)).as("tc"))
    // totals fold the 256-row bucket tables, NOT the corpus — the model
    // build costs exactly two token-explode passes (raw + target), like
    // the oracle's single `tot` CTE
    val rTot = raw.agg(coalesce(sum(col("rc")), lit(0L)).as("r_tot"))
    val tTot = tgt.agg(coalesce(sum(col("tc")), lit(0L)).as("t_tot"))
    // ratio model: s_x1e6 = (1e6 · (tc+1) · (Rtot+B)) div ((rc+1) · (Ttot+B)).
    // The numerator wraps int64 once (tc+1)·(r_tot+B) reaches ~9.2e12
    // (≈3e6 tokens in both corpus and target) — fail LOUDLY there instead
    // of silently serving wrapped weights: the assert_true rides inside
    // the s_x1e6 expression so column pruning can never drop it, and it
    // costs one comparison per bucket row (256 rows, not the corpus).
    raw.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("tc"))
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(tTot))
      .select(col("b"),
        expr(
          s"""(1000000 * (tc + 1) * (r_tot + $buckets)) div ((rc + 1) * (t_tot + $buckets))
             | + coalesce(CAST(assert_true(
             |     (tc + 1) <= (${Long.MaxValue}L div 1000000) div (r_tot + $buckets),
             |     'graft.corpus.Importance: the 1e6 ratio scale would overflow int64 at this corpus token count; rebuild the model with a smaller scale constant') AS BIGINT), 0)
             |""".stripMargin)
          .as("s_x1e6"))
  }

  private def tokenBuckets(docs: DataFrame, buckets: Int): DataFrame =
    docs.select(col("doc_id"), col("source"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .withColumn("b", pmod(call_function("graft_polyhash", col("tok")), lit(buckets.toLong)))

  /** Per-document importance weights against `targetSource`:
    * `(doc_id, n_toks, imp_x1e6, keep)`. `acceptBand` is the acceptance
    * scale: a doc with imp_x1e6 >= acceptBand is always kept, others
    * keep with probability imp_x1e6 / acceptBand. */
  def weights(docs: DataFrame, targetSource: String, buckets: Int = 256,
              acceptBand: Long = 2000000L): DataFrame =
    tokenBuckets(docs, buckets)
      .join(broadcast(modelDf(docs, targetSource, buckets)), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum(col("s_x1e6")).as("s_sum"))
      .select(col("doc_id"), col("n_toks"),
        expr("s_sum div n_toks").as("imp_x1e6"))
      .withColumn("keep",
        (pmod(call_function("graft_polyhash",
          concat(col("doc_id").cast("string"), lit("#dsir"))), lit(acceptBand))
          < col("imp_x1e6")).cast("int"))

  /** The trained model as a driver-side map (buckets entries — codebook
    * tier, like the IVF/PQ codebooks) for [[score]]'s broadcast-literal
    * serving form. */
  def model(docs: DataFrame, targetSource: String, buckets: Int = 256): Map[Long, Long] =
    modelDf(docs, targetSource, buckets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** SERVING / STREAMING form: scores any frame with (doc_id, text)
    * against a trained model as a PURE MAP EXPRESSION — no join, no
    * shuffle, no state — so the same expression runs identically over a
    * batch corpus or a readStream micro-batch (the ingest-time data
    * selection gate). Tokens hashing to a bucket absent from the model
    * (possible only for post-training vocabulary) score at the add-one-
    * smoothed unseen ratio `unseenX1e6`. Output mirrors [[weights]]. */
  def score(docs: DataFrame, model: Map[Long, Long], unseenX1e6: Long,
            buckets: Int = 256, acceptBand: Long = 2000000L): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    val scores = transform(toks, t =>
      coalesce(
        element_at(typedLit(model),
          pmod(call_function("graft_polyhash", t), lit(buckets.toLong))),
        lit(unseenX1e6)))
    docs
      .withColumn("n_toks", size(toks).cast("long"))
      .filter(col("n_toks") > 0L)
      .withColumn("s_sum", aggregate(scores, lit(0L), (acc, x) => acc + x))
      .select(col("doc_id"), col("n_toks"),
        expr("s_sum div n_toks").as("imp_x1e6"))
      .withColumn("keep",
        (pmod(call_function("graft_polyhash",
          concat(col("doc_id").cast("string"), lit("#dsir"))), lit(acceptBand))
          < col("imp_x1e6")).cast("int"))
  }
}
