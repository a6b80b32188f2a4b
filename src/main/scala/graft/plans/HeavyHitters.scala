package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graft_heavy_hitters(tag[, k])` — MISRA–GRIES frequency summary as a
 * custom mergeable aggregate: at most k counters over an UNBOUNDED tag
 * domain, with the classic guarantees (n = stream length):
 *
 *  - every tag with true count > n/(k+1) is present in the summary
 *    (no false negatives among the heavy tags);
 *  - each reported count underestimates the true count by at most
 *    n/(k+1) (the summary's counts are lower bounds).
 *
 * This is what bounds [[TopKBySketch]]-style state when the tag domain
 * does NOT fit in memory (URLs, n-grams, user agents at 100 TB): exact
 * per-tag counts need a full (tag)-keyed shuffle; the MG summary is k
 * counters per partition, merged pairwise with the summary-merge rule
 * (add counts, subtract the (k+1)-th largest, drop ≤ 0 — Agarwal et
 * al.'s mergeable-summaries construction, which preserves the error
 * bound n_total/(k+1)).
 *
 * Counts (and for borderline tags, membership) depend on merge order,
 * so there is deliberately NO oracle gate query — the operator is
 * spec-pinned by its guarantees under random partitionings
 * (`HeavyHittersSpec`), the same treatment as the reference's
 * non-SQL-expressible surface (appends, subscriptions).
 *
 * Returns `array<struct<tag: string, lower_bound: bigint>>`, counts
 * descending, ties by tag — feed it a threshold to extract guaranteed
 * heavies: report tags whose lower bound exceeds `threshold − n/(k+1)`.
 */
case class HeavyHittersSketch(child: Expression, k: Int,
                              override val mutableAggBufferOffset: Int = 0,
                              override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "graft_heavy_hitters"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tag", StringType, nullable = false),
      StructField("lower_bound", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters expects (STRING[, k > 0]), got ${child.dataType.catalogString}, k=$k")

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long]()

  /** The MG decrement step: buffer exceeded k counters — subtract the
    * (k+1)-th largest count from every counter and drop non-positives
    * (equivalently: decrement all by the smallest count present). */
  private def shrink(buf: java.util.HashMap[UTF8String, Long]): Unit = {
    if (buf.size <= k) return
    // find the (k+1)-th largest = the min count once size is k+1; for
    // merges (size up to 2k) take the (k+1)-th largest properly
    val counts = new Array[Long](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { counts(i) = it.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val dec = counts(buf.size - (k + 1)) // (k+1)-th largest
    val eit = buf.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      val nv = e.getValue - dec
      if (nv <= 0) eit.remove() else e.setValue(nv)
    }
  }

  override def update(buf: java.util.HashMap[UTF8String, Long],
                      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val t = child.eval(input)
    if (t != null) {
      val tag = t.asInstanceOf[UTF8String]
      val prev = buf.getOrDefault(tag, 0L)
      // present: put with an equal key retains the stored (owned) key.
      // absent: clone — eval-returned UTF8Strings may alias row memory.
      if (prev > 0L) buf.put(tag, prev + 1L)
      else {
        buf.put(tag.clone(), 1L)
        shrink(buf)
      }
    }
    buf
  }

  override def merge(b1: java.util.HashMap[UTF8String, Long],
                     b2: java.util.HashMap[UTF8String, Long]): java.util.HashMap[UTF8String, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b1.put(e.getKey, b1.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    shrink(b1)
    b1
  }

  override def eval(buf: java.util.HashMap[UTF8String, Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    java.util.Arrays.sort(entries, new java.util.Comparator[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    new GenericArrayData(entries.map { case (t, n) => InternalRow(t, n): Any })
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.keySet().iterator()
    while (it0.hasNext) bytes += 12 + it0.next().numBytes()
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tb = e.getKey.getBytes
      bb.putInt(tb.length)
      bb.put(tb)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.put(UTF8String.fromBytes(tb), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersSketch =
    copy(child = newChild)
}
