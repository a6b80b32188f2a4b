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
 * ratio scale to 1e3 (documented, like the sketch permille constants).
 */
object Importance {

  /** Per-document importance weights against `targetSource`:
    * `(doc_id, n_toks, imp_x1e6, keep)`. `acceptBand` is the acceptance
    * scale: a doc with imp_x1e6 >= acceptBand is always kept, others
    * keep with probability imp_x1e6 / acceptBand. */
  def weights(docs: DataFrame, targetSource: String, buckets: Int = 256,
              acceptBand: Long = 2000000L): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .withColumn("b", pmod(call_function("graft_polyhash", col("tok")), lit(buckets.toLong)))
    val raw = toks.groupBy("b").agg(count(lit(1)).as("rc"))
    val tgt = toks.filter(col("source") === targetSource)
      .groupBy("b").agg(count(lit(1)).as("tc"))
    val rTot = toks.agg(count(lit(1)).as("r_tot"))
    val tTot = toks.filter(col("source") === targetSource).agg(count(lit(1)).as("t_tot"))
    // ratio model: s_x1e6 = (1e6 · (tc+1) · (Rtot+B)) div ((rc+1) · (Ttot+B))
    val model = raw.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("tc"))
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(tTot))
      .select(col("b"),
        expr(s"(1000000 * (tc + 1) * (r_tot + $buckets)) div ((rc + 1) * (t_tot + $buckets))")
          .as("s_x1e6"))
    toks.join(broadcast(model), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum(col("s_x1e6")).as("s_sum"))
      .select(col("doc_id"), col("n_toks"),
        expr("s_sum div n_toks").as("imp_x1e6"))
      .withColumn("keep",
        (pmod(call_function("graft_polyhash",
          concat(col("doc_id").cast("string"), lit("#dsir"))), lit(acceptBand))
          < col("imp_x1e6")).cast("int"))
  }
}
