package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import graft.plans._

/**
 * Engine extensions, registered with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")`:
 *
 *  - `graft_polyhash(text)` — polynomial document hash ([[PolyHash]]);
 *  - `graft_shingle_hashes(text)` — distinct 3-gram shingle hashes;
 *  - `graft_winnow(text)` — winnowing fingerprint set (window minima);
 *  - `graft_minhash(shingles)` — MinHash signature;
 *  - `graft_simhash16(text)` — 16-bit SimHash;
 *  - `graft_dot(a, b)` / `graft_norm(v)` — left-fold vector algebra;
 *  - `graft_intersect_size(a, b)` — |a ∩ b| of BIGINT arrays (the
 *    dedup verify joins' kernel, == size(array_intersect(a, b)));
 *  - `graft_lsh_buckets(v)` — hyperplane-LSH bucket ids;
 *  - `graft_cdc_chunks(text)` — content-defined chunk strings;
 *  - `graft_kmv(hash[, k])` — deterministic k-minimum-values distinct
 *    sketch (custom mergeable TypedImperativeAggregate);
 *  - `graft_bottomk(hash, value[, k])` — deterministic bottom-k-by-hash
 *    sample sketch (custom mergeable TypedImperativeAggregate);
 *  - `graft_topk_by(score, tag[, k])` — bounded top-k-per-group heap
 *    aggregate (replaces window-sort top-N at scale);
 *  - `graft_heavy_hitters(tag[, k])` — Misra–Gries frequency summary
 *    over unbounded tag domains (k counters, n/(k+1) error bound);
 *  - the native as-of join planner strategy ([[AsOfJoinStrategy]]).
 *
 * All are codegen'd Catalyst expressions (graft.plans.Kernels) — the
 * engine's hot kernels participate in whole-stage codegen instead of
 * paying a UDF encoder boundary per row. The extension-point route
 * (SparkSessionExtensions) keeps custom pieces out of the query-building
 * API: any SQL client of the session gets the functions, and Catalyst
 * treats them like built-ins (null folding, constant folding, codegen).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def unary(name: String, mk: Expression => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[GraftExtensions].getName, name),
    (children: Seq[Expression]) => mk(children.head)
  )

  /** Resolve an optional literal-int `k` argument. The sketch size must be
   *  fixed at plan time (it shapes the aggregation buffer), so anything
   *  non-foldable — a column reference, a NULL — is a clear analysis error
   *  naming the function, not a NullPointerException from a blind eval. */
  private def literalK(fn: String, arg: Option[Expression], default: Int): Int =
    arg match {
      case None => default
      case Some(e) =>
        if (!e.foldable)
          throw new org.apache.spark.sql.AnalysisException(
            "_LEGACY_ERROR_TEMP_0060",
            Map("msg" ->
              s"$fn: the k argument must be a foldable integer literal, got ${e.sql}"))
        e.eval(null) match {
          case n: Number => n.intValue()
          case other =>
            throw new org.apache.spark.sql.AnalysisException(
              "_LEGACY_ERROR_TEMP_0060",
              Map("msg" ->
                s"$fn: the k argument must be a non-null integer literal, got $other"))
        }
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator tier: the native as-of join (custom LogicalPlan →
    // custom SparkPlan; see graft.plans.AsOfJoin)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction(unary("graft_polyhash", PolyHash))
    ext.injectFunction(unary("graft_shingle_hashes", ShingleHashes))
    ext.injectFunction(unary("graft_winnow", WinnowFps))
    ext.injectFunction(unary("graft_minhash", MinhashSig))
    ext.injectFunction(unary("graft_simhash16", Simhash16))
    ext.injectFunction(unary("graft_simhash62", Simhash62))
    ext.injectFunction(unary("graft_norm", NormL2))
    ext.injectFunction(unary("graft_lsh_buckets", LshBuckets))
    ext.injectFunction(unary("graft_cdc_chunks", CdcChunks))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))
    ))
    // |a ∩ b| of BIGINT arrays — the dedup verify joins' per-candidate
    // kernel (== size(array_intersect(a, b)) for null-free elements)
    ext.injectFunction((
      new FunctionIdentifier("graft_intersect_size"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_intersect_size"),
      (children: Seq[Expression]) => IntersectSize(children(0), children(1))
    ))
    // identity evaluation barrier (non-deterministic flag) — pins a pure
    // kernel to one evaluation site; see graft.plans.Pinned
    ext.injectFunction(unary("graft_pinned", Pinned))
    // Spark's own runtime-filter bloom pair, exposed as SQL functions.
    // The optimizer only injects these itself between shuffle-join sides
    // (InjectRuntimeFilter); registering them lets a query build the same
    // semi-join pre-filter EXPLICITLY — e.g. decontamination, where the
    // bench n-gram set is too large to broadcast as a hash relation at
    // corpus scale but its bloom is ~10 bits/key and map-side prunes the
    // corpus before the exact verify join. might_contain requires the
    // bloom argument to be foldable or a scalar subquery (it is evaluated
    // once, not per row).
    // graft_bloom_agg(hash[, expected_items]): the optional second argument
    // sizes the filter to the REGISTRY'S actual cardinality (8 bits/key).
    // Spark's default sizing assumes 1M items → a ~1 MiB filter regardless
    // of input; since the scalar-subquery result rides every downstream
    // stage's task binary, an unsized bloom is what produced the
    // `Broadcasting large task binary with size 2.1 MiB` bench warnings.
    // A decontamination registry's size is known (it's a curated eval
    // suite), so callers state it and the filter shrinks to match.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        val items = literalK("graft_bloom_agg", children.lift(1), 1000000)
        new BloomFilterAggregate(children.head, items.toLong)
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => BloomFilterMightContain(children(0), children(1))
    ))
    // custom mergeable aggregate: k-minimum-values distinct sketch
    // (graft.plans.KmvSketch); k defaults to 64, or a foldable int literal
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_kmv"),
      (children: Seq[Expression]) => {
        val k = literalK("graft_kmv", children.lift(1), 64)
        KmvSketch(children.head, k).toAggregateExpression()
      }
    ))
    // custom mergeable aggregate: bottom-k-by-hash sample sketch
    // (graft.plans.BottomKSketch); k defaults to 128, or a foldable int
    ext.injectFunction((
      new FunctionIdentifier("graft_bottomk"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_bottomk"),
      (children: Seq[Expression]) => {
        val k = literalK("graft_bottomk", children.lift(2), 128)
        BottomKSketch(children(0), children(1), k).toAggregateExpression()
      }
    ))
    // custom mergeable aggregate: bounded top-k-per-group heap
    // (graft.plans.TopKBySketch); k defaults to 3, or a foldable int
    // NOTE: SET semantics over (score, tag) pairs — duplicate pairs
    // collapse; feed pre-aggregated one-row-per-(group, tag) input for
    // window-formulation parity (contract documented in the usage text
    // and graft.plans.TopKBySketch's Scaladoc).
    ext.injectFunction((
      new FunctionIdentifier("graft_topk_by"),
      new ExpressionInfo(
        classOf[GraftExtensions].getName, null, "graft_topk_by",
        "_FUNC_(score, tag[, k]) - top-k (score, tag) pairs per group, score " +
          "descending, ties to the smallest tag. SET semantics: duplicate " +
          "(score, tag) input pairs collapse to one entry, so on raw " +
          "non-pre-aggregated rows the result may hold fewer than k entries " +
          "than the row_number window form would; aggregate to one row per " +
          "(group, tag) first for window parity.",
        ""),
      (children: Seq[Expression]) => {
        val k = literalK("graft_topk_by", children.lift(2), 3)
        TopKBySketch(children(0), children(1), k).toAggregateExpression()
      }
    ))
    // custom mergeable aggregate: Misra–Gries heavy-hitters summary
    // (graft.plans.HeavyHittersSketch); k defaults to 16
    ext.injectFunction((
      new FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_heavy_hitters"),
      (children: Seq[Expression]) => {
        val k = literalK("graft_heavy_hitters", children.lift(1), 16)
        HeavyHittersSketch(children.head, k).toAggregateExpression()
      }
    ))
  }
}
