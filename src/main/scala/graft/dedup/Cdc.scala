package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Content-defined chunking (CDC): split each document at positions where a
 * rolling hash of the trailing `W` characters hits a boundary condition
 * (`H % MOD == 0`), so chunk boundaries synchronize on CONTENT rather than
 * offsets — two documents sharing a passage produce identical chunks for
 * it regardless of where the passage sits (the property fixed-size
 * chunking lacks; the basis of dedup in storage systems like LBFS/restic
 * and of blob-level near-dedup in data pipelines).
 *
 * Boundary rule (mirrored exactly by the DuckDB oracle as an 8-term
 * Horner expression over `ascii(substr(...))`): position p (1-based,
 * p ≥ W) is a boundary iff
 * `fold(codepoints[p-W+1..p], h -> (h*31 + c) % 2147483647) % 64 == 0`.
 * Chunks are the spans between consecutive boundaries (first chunk starts
 * at 1; the tail chunk ends at len; an empty tail is dropped).
 *
 * Scale: chunking is a pure map (one codepoint pass per document, JVM
 * primitive loop); the dedup report is a hash-keyed aggregation of chunk
 * digests — documents never shuffle, only (md5, len) pairs do.
 */
object Cdc {

  val W = 8
  val MOD = 64L
  private val P = Hashing.P

  /** Chunk spans of a text as (start, end) codepoint indices, 1-based
    * inclusive — single rolling pass, identical to the oracle's per-
    * position 8-term Horner hash. */
  def chunkSpansJvm(text: String): Array[(Int, Int)] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    val bounds = Array.newBuilder[Int]
    var p = W
    while (p <= n) {
      var h = 0L
      var k = p - W
      while (k < p) { h = (h * 31L + cps(k)) % P; k += 1 }
      if (h % MOD == 0L) bounds += p
      p += 1
    }
    val bs = bounds.result()
    val out = Array.newBuilder[(Int, Int)]
    var start = 1
    for (b <- bs) { out += ((start, b)); start = b + 1 }
    if (start <= n) out += ((start, n))
    out.result()
  }

  /** Chunk strings of a text (codepoint-exact substrings). */
  def chunksJvm(text: String): Array[String] = {
    val cps = text.codePoints().toArray
    chunkSpansJvm(text).map { case (s, e) => new String(cps, s - 1, e - s + 1) }
  }

  /** UDF tier — kept for equivalence pinning against the codegen'd
    * expression (FastEquivalenceSpec pattern). */
  val chunksUdf = udf((text: String) => chunksJvm(text))

  /** `(doc_id, chunk_idx, chunk)` rows — chunk_idx is 1-based. Rides the
    * codegen'd `graft_cdc_chunks` expression (graft.plans.CdcChunks). */
  def chunks(docs: DataFrame, idCol: Column = col("doc_id"),
             textCol: Column = col("text")): DataFrame =
    docs.select(idCol.as("doc_id"),
        posexplode(call_function("graft_cdc_chunks", textCol)).as(Seq("i", "chunk")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("chunk_idx"), col("chunk"))

  /** Corpus-wide duplicated-chunk report: `(chunk_md5, chunk_len, n_docs,
    * n_occ)` for every chunk occurring more than once. */
  def duplicatedChunks(docs: DataFrame): DataFrame =
    chunks(docs)
      .select(col("doc_id"), md5(col("chunk")).as("chunk_md5"),
        length(col("chunk")).cast("long").as("chunk_len"))
      .groupBy(col("chunk_md5"), col("chunk_len"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
}
