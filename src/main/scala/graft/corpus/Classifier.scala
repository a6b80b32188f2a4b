package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/**
 * Distributed training of the hashed-feature linear quality classifier —
 * the data-parallel shape behind fastText-style corpus filters (train on
 * labeled docs, then serve corpus-wide; serving is `text_classify`'s
 * broadcast-weights scan).
 *
 * Scale design: a training epoch is (1) broadcast the weight vector down
 * (nFeatures doubles — KBs), (2) one scan computing per-doc margins and
 * residuals, (3) a per-feature gradient aggregation whose key space is
 * nFeatures (map-side combine collapses it immediately — the shuffle
 * carries ≤ nFeatures rows per partition, never token occurrences). The
 * weight UPDATE is driver-side over nFeatures doubles — an aggregate, not
 * data. This is synchronous data-parallel SGD with a full batch; at 100 TB
 * the same plan runs per epoch with the token table as the stored feature
 * matrix.
 */
object Classifier {

  /** Hashed token occurrences with the binary label: `(doc_id, y, feature)`
    * — y = 1 iff lang = 'en', feature = polyhash(tok) mod nFeatures. */
  def tokenFeatures(docs: DataFrame, nFeatures: Int): DataFrame =
    docs.select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        explode(Hashing.toks(col("text"))).as("tok"))
      .select(col("doc_id"), col("y"),
        pmod(call_function("graft_polyhash", col("tok")), lit(nFeatures.toLong)).as("feature"))

  /**
   * Per-feature logistic-loss gradient at w = 0, scaled ×2 so it is
   * integer-exact: at w = 0 every prediction is ½, so
   * ∂L/∂w_f = Σ_occurrences (½ − y) and 2·∂L/∂w_f = Σ (1 − 2y) — a pure
   * int64 aggregation, order-independent, hence fully DuckDB-oracled
   * (`text_classifier_grad`). The first step of every training run, and
   * the exact aggregation shape of all later steps.
   */
  def gradientAtZero(docs: DataFrame, nFeatures: Int): DataFrame =
    tokenFeatures(docs, nFeatures)
      .select(col("feature"), (lit(1L) - lit(2L) * col("y")).as("c"))
      .groupBy(col("feature"))
      .agg(sum(col("c")).as("g2"), count(lit(1)).as("n_occ"))

  /** Training record: weights after the last epoch and the mean log-loss
    * measured at the START of each epoch (loss(0) = ln 2). */
  final case class Trained(weights: Array[Double], epochLoss: Seq[Double])

  /**
   * Full-batch gradient descent for `epochs` epochs at learning rate `lr`
   * (applied to the mean gradient). Deterministic up to fp partial-sum
   * order; spec-pinned by monotone loss descent rather than a SQL oracle.
   */
  def train(docs: DataFrame, nFeatures: Int, epochs: Int, lr: Double): Trained = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = tokenFeatures(docs, nFeatures)
      .select(col("doc_id"), col("y"), col("feature")).persist()
    try {
      val nDocs = feats.select(col("doc_id")).distinct().count().toDouble
      var w = new Array[Double](nFeatures)
      val losses = Seq.newBuilder[Double]
      var e = 0
      while (e < epochs) {
        val wDf = broadcast(w.zipWithIndex
          .map { case (v, f) => (f.toLong, v) }.toSeq.toDF("feature", "w"))
        // margin per doc = Σ w_f over its occurrences (x is the count vector)
        val perDoc = feats.join(wDf, "feature")
          .groupBy(col("doc_id"), col("y"))
          .agg(sum(col("w")).as("margin"))
          .select(col("doc_id"), col("y"), col("margin"),
            (lit(1.0) / (lit(1.0) + exp(-col("margin")))).as("p"))
        val loss = perDoc
          .agg(avg(when(col("y") === 1L, -log(col("p")))
            .otherwise(-log(lit(1.0) - col("p")))))
          .head().getDouble(0)
        losses += loss
        // residual (p − y) fans back to the doc's occurrences; gradient is
        // the per-feature residual sum — nFeatures keys, map-side combined
        val grad = feats.join(perDoc.select(col("doc_id"), (col("p") - col("y")).as("r")), "doc_id")
          .groupBy(col("feature")).agg(sum(col("r")).as("g"))
          .collect().map(r => (r.getLong(0).toInt, r.getDouble(1)))
        val w2 = w.clone()
        for ((f, g) <- grad) w2(f) -= lr * g / nDocs
        w = w2
        e += 1
      }
      Trained(w, losses.result())
    } finally feats.unpersist()
  }

  /** Mean log-loss of a weight vector over the docs (one scan). */
  def loss(docs: DataFrame, nFeatures: Int, weights: Array[Double]): Double = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDf = broadcast(weights.zipWithIndex
      .map { case (v, f) => (f.toLong, v) }.toSeq.toDF("feature", "w"))
    tokenFeatures(docs, nFeatures).join(wDf, "feature")
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(col("w")).as("margin"))
      .select(col("y"), (lit(1.0) / (lit(1.0) + exp(-col("margin")))).as("p"))
      .agg(avg(when(col("y") === 1L, -log(col("p")))
        .otherwise(-log(lit(1.0) - col("p")))))
      .head().getDouble(0)
  }
}
