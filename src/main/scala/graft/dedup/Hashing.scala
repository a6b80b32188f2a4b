package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Shared hashing primitives for the dedup suite — token/shingle hashes,
 * MinHash signatures, SimHash — as pure Column algebra (codegen'd, no UDFs).
 *
 * Everything here is *engine-mirrorable*: the same arithmetic (integer
 * polynomial hashes mod a 31-bit prime, left-fold sums) can be re-expressed
 * in any SQL engine, which is what the DuckDB oracles do. That property is
 * deliberate — content-defined hashing must be reproducible across the
 * stack, or dedup decisions can't be audited.
 */
object Hashing {

  /** 31-bit prime modulus for all polynomial hashes. */
  val P: Long = 2147483647L

  /** MinHash permutation parameters (k = 8 hash functions), fixed so runs
    * are deterministic and oracle-reproducible. */
  val minhashA: Seq[Long] = Seq(1L, 3L, 7L, 11L, 13L, 17L, 19L, 23L)
  val minhashB: Seq[Long] = Seq(0L, 5L, 9L, 2L, 8L, 4L, 6L, 10L)
  /** Banding: k=8 rows → 4 bands × 2 rows (LSH candidate if any band equal). */
  val bands = 4
  val rowsPerBand = 2

  /** Whitespace tokens of normalized text (same shape as
    * [[graft.functions.TextFunctions.tokens]]). */
  def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Polynomial rolling hash of a string (base 31 mod P) — identical to
    * [[graft.functions.TextFunctions.fingerprint]] but usable inside
    * higher-order lambdas. */
  def strHash(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L),
      (h, c) => (h * 31L + c) % P
    )

  /** Per-token hashes of a document. */
  def tokenHashes(text: Column): Column = transform(toks(text), strHash(_))

  /**
   * Hashes of the n-gram (word) shingles, derived from token hashes:
   * sh_i = ((th_i * 31 + th_i+1) % P * 31 + th_i+2) % P for n = 3.
   * Distinct (set semantics for Jaccard). Documents with fewer than n
   * tokens yield an empty set.
   */
  def shingleHashes(text: Column, n: Int = 3): Column =
    array_distinct(shingleHashesOrdered(text, n))

  /** Positional (non-distinct, in-order) n-gram shingle hashes — the
    * winnowing input ([[Winnow]]): window selection needs every shingle at
    * its original offset, so no set collapse. */
  def shingleHashesOrdered(text: Column, n: Int = 3): Column = {
    val th = tokenHashes(text)
    val m = size(th) - lit(n - 1)
    val raw = transform(
      sequence(lit(1), greatest(m, lit(1))),
      i => {
        // combine n consecutive token hashes
        (1 until n).foldLeft(element_at(th, i)) { (acc, j) =>
          (acc * 31L + element_at(th, i + lit(j))) % P
        }
      }
    )
    when(m >= 1, raw).otherwise(array().cast("array<bigint>"))
  }

  /** MinHash signature (array of k minima) over the shingle-hash set.
    * Null-safe: empty shingle sets give null minima — filter those rows
    * before banding. */
  def minhashSignature(shingles: Column): Column = {
    val sigs = minhashA.zip(minhashB).map { case (a, b) =>
      array_min(transform(shingles, h => (lit(a) * h + lit(b)) % P))
    }
    array(sigs: _*)
  }

  /** SimHash (16-bit) over the token-hash multiset: bit i is set iff
    * sum over tokens of (2*((th >> i) & 1) - 1) > 0. */
  def simhash16(text: Column): Column = {
    val th = tokenHashes(text)
    val bits = (0 until 16).map { i =>
      val bitSum = aggregate(
        th,
        lit(0L),
        (acc, h) => acc + (shiftright(h, i).bitwiseAND(lit(1L)) * lit(2L) - lit(1L))
      )
      when(bitSum > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _).as("simhash")
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
