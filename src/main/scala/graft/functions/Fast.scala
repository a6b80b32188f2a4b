package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import graft.dedup.Hashing

/**
 * Primitive-loop implementations of the hot inner kernels (hashing,
 * signatures, dot products) as Scala UDFs.
 *
 * Spark's higher-order array lambdas (`transform`/`aggregate`/`zip_with`)
 * are *interpreted* per element — fine for the declarative reference
 * implementations in [[TextFunctions]]/[[Hashing]]/[[graft.sim.Similarity]],
 * but a 10-100× tax on the quadratic/pair-join paths. These UDFs compute
 * the *identical* arithmetic (same fold order, same casts, same modulus)
 * with JVM while-loops, so results are bit-for-bit the same — the DuckDB
 * oracles pin that. A custom codegen'd Catalyst `Expression` would shave
 * the remaining row-boxing cost; that's the next step if these ever top a
 * profile again.
 */
object Fast {

  private val P = Hashing.P

  /** Polynomial rolling hash of a string — identical to
    * [[Hashing.strHash]] / [[TextFunctions.fingerprint]]. */
  @inline def strHashJvm(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      // ascii() semantics: Unicode code point of the char
      h = (h * 31L + s.codePointAt(i)) % P
      i += (if (Character.isHighSurrogate(s.charAt(i)) && i + 1 < s.length) 2 else 1)
    }
    h
  }

  /** Whitespace tokens of lower(trim(text)) — identical to
    * [[Hashing.toks]]'s split semantics. */
  @inline def toksJvm(text: String): Array[String] = {
    val t = text.trim.toLowerCase
    if (t.isEmpty) Array("") else t.split("\\s+")
  }

  /** Positional (non-distinct) n-gram shingle hashes — identical to
    * [[Hashing.shingleHashesOrdered]]. */
  def shingleHashesOrderedJvm(text: String, n: Int): Array[Long] = {
    val toks = toksJvm(text)
    val th = toks.map(strHashJvm)
    val m = th.length - (n - 1)
    if (m < 1) Array.empty[Long]
    else {
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        var acc = th(i)
        var j = 1
        while (j < n) { acc = (acc * 31L + th(i + j)) % P; j += 1 }
        out(i) = acc
        i += 1
      }
      out
    }
  }

  /** Distinct 3-gram shingle hashes — identical to [[Hashing.shingleHashes]]. */
  def shingleHashesJvm(text: String, n: Int): Array[Long] = {
    val out = shingleHashesOrderedJvm(text, n)
    // array_distinct preserves first-occurrence order
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    out.foreach(seen.add(_))
    val res = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { res(k) = it.next(); k += 1 }
    res
  }

  /** Winnowing fingerprint set (sorted distinct window minima) — identical
    * to [[graft.dedup.Winnow.fingerprints]]. */
  def winnowJvm(text: String, n: Int, w: Int): Array[Long] = {
    val h = shingleHashesOrderedJvm(text, n)
    if (h.isEmpty) Array.empty[Long]
    else {
      val nw = math.max(h.length - (w - 1), 1)
      val set = new java.util.TreeSet[java.lang.Long]()
      var j = 0
      while (j < nw) {
        var m = h(j)
        var i = j + 1
        val end = math.min(j + w, h.length)
        while (i < end) { if (h(i) < m) m = h(i); i += 1 }
        set.add(m)
        j += 1
      }
      val res = new Array[Long](set.size)
      val it = set.iterator()
      var k = 0
      while (it.hasNext) { res(k) = it.next(); k += 1 }
      res
    }
  }

  /** MinHash signature over a shingle set — identical to
    * [[Hashing.minhashSignature]]. */
  def minhashJvm(sh: Array[Long]): Array[Long] = {
    val a = Hashing.minhashA.toArray
    val b = Hashing.minhashB.toArray
    val sig = new Array[Long](a.length)
    var j = 0
    while (j < a.length) {
      var m = Long.MaxValue
      var i = 0
      while (i < sh.length) {
        val v = (a(j) * sh(i) + b(j)) % P
        if (v < m) m = v
        i += 1
      }
      sig(j) = m
      j += 1
    }
    sig
  }

  /** 16-bit SimHash over token hashes — identical to [[Hashing.simhash16]]. */
  def simhash16Jvm(text: String): Long = {
    val th = toksJvm(text).map(strHashJvm)
    var out = 0L
    var bit = 0
    while (bit < 16) {
      var s = 0L
      var i = 0
      while (i < th.length) { s += 2L * ((th(i) >> bit) & 1L) - 1L; i += 1 }
      if (s > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** 62-bit SimHash: bits 0-30 vote on the token polyhash, bits 31-61 on
    * its multiplicative mix mod the same prime (polyhash carries 31 bits
    * of entropy, so the wide fingerprint needs a second derived hash).
    * The width is the collision-robustness lever the 16-bit pedagogical
    * form lacks: random same-band collisions scale as n²/2^bandBits, and
    * the scale probe measured the 16-bit pair output growing ~n² on the
    * natural corpus ladder (347,788 pairs at sf0.1) — birthday mass, not
    * near-duplicates. 4 × 16-bit bands over 62 bits put the same mass
    * at n²/65,536 per band with near-dup recall preserved (hamming ≤ 3
    * still collides on ≥1 band by pigeonhole). */
  def simhash62Jvm(text: String): Long = {
    val th = toksJvm(text).map(strHashJvm)
    val mh = th.map(h => (h * 2654435761L) % 2147483647L)
    var out = 0L
    var bit = 0
    while (bit < 62) {
      val src = if (bit < 31) th else mh
      val b = if (bit < 31) bit else bit - 31
      var s = 0L
      var i = 0
      while (i < src.length) { s += 2L * ((src(i) >> b) & 1L) - 1L; i += 1 }
      if (s > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Left-fold dot product with per-element float→double cast — identical
    * to [[graft.sim.Similarity.dot]]. */
  @inline def dotJvm(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s = s + a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Left-fold signed projection on a ±1 hyperplane — identical to
    * [[graft.sim.Similarity.projection]]. */
  @inline def projJvm(v: Array[Float], hp: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(v.length, hp.length)
    while (i < n) { s = s + v(i).toDouble * hp(i); i += 1 }
    s
  }

  // per-dim hyperplane cache (tables × bitsPerTable planes)
  private val hpCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
  private def hyperplanes(dim: Int): Array[Array[Double]] =
    hpCache.computeIfAbsent(dim, d => {
      import graft.sim.Similarity.{tables, bitsPerTable, hyperplane}
      Array.tabulate(tables * bitsPerTable)(j => hyperplane(j / bitsPerTable, j % bitsPerTable, d).toArray)
    })

  /** All LSH table bucket ids — identical to [[graft.sim.Similarity.buckets]]. */
  def bucketsJvm(v: Array[Float]): Array[Long] = {
    import graft.sim.Similarity.{tables, bitsPerTable}
    val hps = hyperplanes(v.length)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bitsPerTable) {
        if (projJvm(v, hps(t * bitsPerTable + b)) >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  // ---- Tungsten-typed static entry points for the codegen'd expressions
  // in graft.plans (generated Java calls these directly — no boxing) ----

  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  /** UTF8String entry point for the codegen'd [[graft.plans.PolyHash]]. */
  def polyHashUtf8(s: UTF8String): Long =
    strHashJvm(s.toString.trim.toLowerCase)

  def shingleHashesUtf8(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(shingleHashesJvm(s.toString, 3))

  def winnowUtf8(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      winnowJvm(s.toString, graft.dedup.Winnow.defaultN, graft.dedup.Winnow.defaultW))

  def minhashArr(sh: ArrayData): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(minhashJvm(sh.toLongArray()))

  def simhash16Utf8(s: UTF8String): Long = simhash16Jvm(s.toString)

  def simhash62Utf8(s: UTF8String): Long = simhash62Jvm(s.toString)

  def dotArr(a: ArrayData, b: ArrayData): Double =
    dotJvm(a.toFloatArray(), b.toFloatArray())

  def normArr(a: ArrayData): Double = {
    val arr = a.toFloatArray()
    math.sqrt(dotJvm(arr, arr))
  }

  def bucketsArr(v: ArrayData): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(bucketsJvm(v.toFloatArray()))

  /** |a ∩ b| over long arrays — the r16 verify-join kernel. Exactly
    * `size(array_intersect(a, b))` for arrays without null elements
    * (DISTINCT intersection: duplicates on either side count once), but
    * computed as one primitive open-addressing build over the smaller
    * side + one probe pass over the larger — no boxing, no output array,
    * no per-element null branches. The dedup verify joins evaluate this
    * per candidate pair over ~10²-10³-element shingle sets, and Spark's
    * generic ArrayIntersect (SQLOpenHashSet + result buffer) was the
    * dominant stage of every verify-join query (measured: 5.6 of 7.3
    * task-cpu-s in dedup_jaccard_prefix at sf0.1). */
  def intersectSizeJvm(a: Array[Long], b: Array[Long]): Int = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return 0
    // the capacity computation below overflows Int for >= 2^29 elements;
    // the kernel is a registered SQL function, so fail with a clear error
    // instead of a NegativeArraySizeException (shingle sets are orders of
    // magnitude smaller; a legitimate >= 2^29-element set needs a
    // different algorithm anyway)
    require(s.length < (1 << 29),
      s"graft_intersect_size supports arrays under 2^29 elements, got ${s.length}")
    // power-of-2 capacity, load factor <= 0.5; slot value 0 = empty (the
    // zero KEY is tracked by a flag instead of a slot)
    val cap = Integer.highestOneBit(math.max(s.length, 2)) * 4
    val table = new Array[Long](cap)
    val matched = new Array[Boolean](cap)
    val mask = cap - 1
    var hasZero = false
    var i = 0
    while (i < s.length) {
      val k = s(i)
      if (k == 0L) hasZero = true
      else {
        var idx = (mix64(k) & mask).toInt
        while (table(idx) != 0L && table(idx) != k) idx = (idx + 1) & mask
        table(idx) = k
      }
      i += 1
    }
    var c = 0
    i = 0
    while (i < l.length) {
      val k = l(i)
      if (k == 0L) {
        if (hasZero) { c += 1; hasZero = false } // count the 0 key once
      } else {
        var idx = (mix64(k) & mask).toInt
        while (table(idx) != 0L && table(idx) != k) idx = (idx + 1) & mask
        if (table(idx) == k && !matched(idx)) { c += 1; matched(idx) = true }
      }
      i += 1
    }
    c
  }

  /** SplitMix64 finalizer — avalanche mix for the intersect probe table
    * (shingle hashes are polynomial and cluster under low-bit masking). */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def intersectSizeArr(a: ArrayData, b: ArrayData): Int =
    intersectSizeJvm(a.toLongArray(), b.toLongArray())

  /** Null-aware twin of [[intersectSizeArr]] for arrays whose TYPE admits
    * null elements (parquet round-trips mark elements nullable):
    * exactly `size(array_intersect(a, b))` — distinct common non-null
    * values, plus one when BOTH sides hold a null. The [[graft.plans.IntersectSize]]
    * expression dispatches here only when the schema says nulls are
    * possible, so null-free plans keep the bulk-copy path. */
  def intersectSizeNullAware(a: ArrayData, b: ArrayData): Int = {
    def split(x: ArrayData): (Array[Long], Boolean) = {
      val n = x.numElements()
      val buf = new Array[Long](n)
      var m = 0; var hasNull = false; var i = 0
      while (i < n) {
        if (x.isNullAt(i)) hasNull = true
        else { buf(m) = x.getLong(i); m += 1 }
        i += 1
      }
      (if (m == n) buf else java.util.Arrays.copyOf(buf, m), hasNull)
    }
    val (aa, an) = split(a)
    val (bb, bn) = split(b)
    intersectSizeJvm(aa, bb) + (if (an && bn) 1 else 0)
  }

  /** UTF8String entry point for the codegen'd [[graft.plans.CdcChunks]]:
    * content-defined chunk strings ([[graft.dedup.Cdc.chunksJvm]]). */
  def cdcChunksUtf8(s: UTF8String): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.dedup.Cdc.chunksJvm(s.toString)
        .map(c => UTF8String.fromString(c): Any))

  // ---- Column-facing API ----
  // call_function resolves the codegen'd expressions registered by
  // graft.GraftExtensions (every engine session registers them); the UDF
  // tier below is kept for equivalence pinning in FastEquivalenceSpec.
  import org.apache.spark.sql.functions.call_function

  val fingerprintUdf = udf((s: String) => strHashJvm(s.trim.toLowerCase))
  val shingleHashesUdf = udf((text: String) => shingleHashesJvm(text, 3))
  val winnowUdf = udf((text: String) =>
    winnowJvm(text, graft.dedup.Winnow.defaultN, graft.dedup.Winnow.defaultW))
  val minhashUdf = udf((sh: Seq[Long]) => minhashJvm(sh.toArray))
  val simhash16Udf = udf((text: String) => simhash16Jvm(text))
  val simhash62Udf = udf((text: String) => simhash62Jvm(text))
  val dotUdf = udf((a: Seq[Float], b: Seq[Float]) => dotJvm(a.toArray, b.toArray))
  val normUdf = udf((a: Seq[Float]) => { val arr = a.toArray; math.sqrt(dotJvm(arr, arr)) })
  val bucketsUdf = udf((v: Seq[Float]) => bucketsJvm(v.toArray))

  /** Identical to [[TextFunctions.fingerprint]]. */
  def fingerprintFast(text: Column): Column = call_function("graft_polyhash", text)
  def shingleHashesFast(text: Column): Column = call_function("graft_shingle_hashes", text)
  def winnowFast(text: Column): Column = call_function("graft_winnow", text)
  def minhashFast(sh: Column): Column = call_function("graft_minhash", sh)
  def simhash16Fast(text: Column): Column = call_function("graft_simhash16", text)
  def simhash62Fast(text: Column): Column = call_function("graft_simhash62", text)
  def dotFast(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def intersectSizeFast(a: Column, b: Column): Column =
    call_function("graft_intersect_size", a, b)

  /** [[intersectSizeFast]] wrapped in the `graft_pinned` evaluation
    * barrier: the verify joins project this ONCE per candidate and both
    * the threshold filter and the reported jaccard read the projected
    * column — without the barrier the optimizer inlines the kernel into
    * the pushed join condition AND the survivors' projection (two
    * evaluations). Use where a filter + a projection share the value. */
  def intersectSizeOnce(a: Column, b: Column): Column =
    call_function("graft_pinned", call_function("graft_intersect_size", a, b))
  def normFast(a: Column): Column = call_function("graft_norm", a)
  def bucketsFast(v: Column): Column = call_function("graft_lsh_buckets", v)
}
