package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD '03 —
 * the MOSS algorithm): slide a window of `w` consecutive positional n-gram
 * hashes over the document and keep each window's minimum; the distinct
 * selected hashes are the document's fingerprint set. Guarantee: any run
 * of at least `n + w - 1` shared tokens between two documents yields at
 * least one shared fingerprint, at a storage budget of ~2/(w+1) of the
 * shingle hashes.
 *
 * The content-defined sampling complement of MinHash ([[Hashing]]):
 * MinHash estimates whole-document Jaccard; winnowing finds *local*
 * overlap (shared passages) — the training-data use case is benchmark
 * contamination / passage-copy detection, where a document is clean
 * globally but contains a copied span.
 *
 * Scale: fingerprint extraction is a map-only column (codegen kernel
 * `graft_winnow`); pair generation is the same inverted-index equality
 * join as [[Dedup.ngramJaccardPairs]] — shuffle moves 8-byte fingerprint
 * postings, never documents; hot fingerprints can be DF-cut the same way
 * (boilerplate shared passages behave like hot shingles).
 *
 * This object is the declarative reference implementation; the hot path
 * is [[graft.functions.Fast.winnowFast]] (native codegen'd expression),
 * pinned bit-identical by `FastEquivalenceSpec` and the DuckDB oracles.
 */
object Winnow {

  val defaultN = 3
  val defaultW = 4

  /** Fingerprint set of `text`: sorted distinct window-of-`w` minima over
    * the positional `n`-gram hashes. Documents with fewer than `n` tokens
    * have no shingles and yield an empty set. */
  def fingerprints(text: Column, n: Int = defaultN, w: Int = defaultW): Column = {
    val h = Hashing.shingleHashesOrdered(text, n)
    val nw = greatest(size(h) - lit(w - 1), lit(1))
    val mins = transform(sequence(lit(1), nw), j => array_min(slice(h, j, lit(w))))
    when(size(h) >= 1, array_sort(array_distinct(mins)))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Exploded `(doc_id, fp)` fingerprint postings of `documents` — the
    * inverted-index input (hot path: the `graft_winnow` kernel). */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.Fast.winnowFast(col("text"))).as("fp"))

  /** Document pairs sharing at least `minShared` fingerprints, from a
    * postings table: equality self-join on the fingerprint key + count.
    * Because fingerprint sets are distinct per document, the shared count
    * is exactly |fps(a) ∩ fps(b)|. */
  def sharedPairsFromPostings(postings: DataFrame, minShared: Long): DataFrame = {
    val l = postings.as("l")
    val r = postings.as("r")
    l.join(r, col("l.fp") === col("r.fp") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Convenience: postings + pair join in one call. */
  def sharedPairs(docs: DataFrame, minShared: Long): DataFrame =
    sharedPairsFromPostings(postings(docs), minShared)
}
