package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.Dedup
import graft.sim.Similarity

/**
 * Per-(session, sf-dir) memoized corpus materializations shared by the
 * query packs — the same pattern as [[graft.log.Fixture.events]].
 *
 * Why: a verify/bench batch runs every operator over ONE corpus. The
 * expensive signature passes (shingle sets, minhash input, simhash,
 * embedding norms) are inputs to several operators each; recomputing and
 * re-localCheckpointing them per query both multiplies work and — the
 * round-1 bench lesson — accumulates dead checkpoint RDDs across 30+
 * queries until the heap thrashes. In a real deployment these are stored
 * columns written by the ingest pipeline (compute once, amortized); the
 * memo is the in-session equivalent.
 */
object Tables {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  private def memo(s: SparkSession, dir: String, key: String)(mk: => DataFrame): DataFrame =
    cache.getOrElseUpdate((s, dir, key), mk)

  def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Materialized shingle-hash sets of `documents` (see [[Dedup.shingleSets]]). */
  def shingleSets(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "shingleSets")(Dedup.shingleSets(docs(s, dir)))

  /** Materialized simhash signatures of `documents`. */
  def simhashSigs(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "simhashSigs")(Dedup.simhashSigs(docs(s, dir)))

  /** Materialized 62-bit simhash signatures of `documents`. */
  def simhashWideSigs(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "simhashWideSigs")(Dedup.simhashWideSigs(docs(s, dir)))

  /** Materialized winnowing fingerprint postings `(doc_id, fp)` of
    * `documents` (see [[graft.dedup.Winnow.postings]]) — shared by the
    * fingerprint dump and the shared-passage pair join. */
  def winnowPostings(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "winnowPostings")(
      graft.dedup.Winnow.postings(docs(s, dir)).localCheckpoint())

  /** Materialized normed embedding corpus (see [[Similarity.normed]]). */
  def normedEmb(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "normedEmb")(Similarity.normed(emb(s, dir)))

  /** Materialized 8-token span-hash postings `(id, pos, span_h)` of
    * `documents` (see [[Dedup.spanPostings]]) — shared by the span
    * blocklist and the per-doc contamination profile. */
  def spanPostings(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "spanPostings")(
      Dedup.spanPostings(docs(s, dir), spanTokens = 8).localCheckpoint())

  /** Materialized 4-token line chunking `(id, line_no, line)` of
    * `documents` (see [[Dedup.docLines]]) — shared by the boilerplate
    * report and the stripping pass. */
  def docLines(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "docLines")(
      Dedup.docLines(docs(s, dir), wordsPerLine = 4).localCheckpoint())
}
