package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graft_topk_by(score, tag[, k])` — TOP-K-PER-GROUP as a custom
 * mergeable aggregate (`TypedImperativeAggregate`): the buffer is a
 * bounded heap of the k largest `(score, tag)` entries (score
 * descending, ties to the binary-smallest tag — the `ORDER BY n DESC,
 * tag ASC` rule of the window formulation).
 *
 * This replaces the sort-based top-N-per-group pattern
 * (`row_number() OVER (PARTITION BY g ORDER BY …) <= k`) with a
 * partial-aggregated bounded buffer: the window form must shuffle and
 * SORT every group's full row set; the heap form pre-combines map-side
 * and ships exactly k entries per group — at 100 TB the difference
 * between a full sort of the aggregate table and a k-row-per-group
 * shuffle. Like [[KmvSketch]]/[[BottomKSketch]] the result is a pure
 * function of the input set (dedup + total order → merge- and
 * partitioning-independent), so gate queries are fully value-oracled
 * against the window formulation's SQL.
 *
 * Returns `array<struct<score: bigint, tag: string>>` in rank order.
 *
 * CONTRACT — SET semantics over `(score, tag)` PAIRS: duplicate input
 * pairs collapse to one entry (the buffer is a TreeSet keyed on the
 * rank order). On pre-aggregated input — one row per (group, tag), the
 * intended shape, e.g. `graft_topk_by(count, tag)` over a counted
 * subquery — this is exactly the `row_number` window formulation. On
 * RAW rows with repeated (score, tag) pairs the result can hold fewer
 * than k entries where the window form would emit duplicates.
 * Aggregate first, or use the window form, if duplicate-pair
 * multiplicity matters.
 */
case class TopKBySketch(left: Expression, right: Expression, k: Int,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, UTF8String)]]
  with BinaryLike[Expression] {

  override def prettyName: String = "graft_topk_by"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("tag", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == StringType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_by expects (BIGINT, STRING[, k > 0]), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString}), k=$k")

  override def createAggregationBuffer(): java.util.TreeSet[(Long, UTF8String)] =
    new java.util.TreeSet[(Long, UTF8String)](TopKBySketch.RankOrder)

  override def update(buf: java.util.TreeSet[(Long, UTF8String)],
                      input: InternalRow): java.util.TreeSet[(Long, UTF8String)] = {
    val s = left.eval(input)
    val t = right.eval(input)
    if (s != null && t != null) {
      // UTF8String from eval may be backed by reused row memory — copy
      buf.add((s.asInstanceOf[Long], t.asInstanceOf[UTF8String].clone()))
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[(Long, UTF8String)],
                     b2: java.util.TreeSet[(Long, UTF8String)]): java.util.TreeSet[(Long, UTF8String)] = {
    val it = b2.iterator()
    while (it.hasNext) {
      b1.add(it.next())
      if (b1.size > k) b1.pollLast()
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[(Long, UTF8String)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, t) = it.next()
      out(i) = InternalRow(s, t)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, UTF8String)]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.iterator()
    while (it0.hasNext) bytes += 12 + it0.next()._2.numBytes()
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, t) = it.next()
      val tb = t.getBytes
      bb.putLong(s)
      bb.putInt(tb.length)
      bb.put(tb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, UTF8String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = bb.getLong
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.add((s, UTF8String.fromBytes(tb)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBySketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBySketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TopKBySketch =
    copy(left = newLeft, right = newRight)
}

object TopKBySketch {
  /** Rank order: score DESC, tag ASC (binary) — the head of the set is
    * the best entry, the tail the weakest (eviction point). The
    * expression tree ships to executors, so the comparator must be
    * serializable. */
  object RankOrder extends java.util.Comparator[(Long, UTF8String)] with Serializable {
    override def compare(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else a._2.compareTo(b._2)
    }
  }
}
