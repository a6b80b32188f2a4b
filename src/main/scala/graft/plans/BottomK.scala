package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `graft_bottomk(hash, value[, k])` — BOTTOM-K-BY-HASH sample sketch as a
 * custom mergeable aggregate (`TypedImperativeAggregate`): the buffer
 * keeps the `(hash, value)` pairs with the k smallest DISTINCT hashes
 * seen (equal hashes resolve to the smallest value, so the summary is a
 * pure function of the input SET — order- and partitioning-independent).
 *
 * This is the deterministic replacement for reservoir sampling: ranking
 * rows by a uniform hash of a unique key makes "the k smallest hash
 * ranks" a uniform random sample that (a) merges losslessly from any
 * partitioning (set union, re-truncate — the same property as
 * [[KmvSketch]]), (b) is identical run-to-run and engine-to-engine, so
 * downstream sample statistics (quantiles, means) are fully
 * value-oracled, and (c) computes per GROUP in one partial-aggregated
 * pass — no per-group sort, no window — which is what makes per-key
 * quantile estimation viable at 100 TB (an exact per-key percentile
 * needs a full sort of every group; the sketch shuffles k rows per
 * group, pre-combined map-side).
 *
 * Returns `map<bigint, double>` keyed by hash; samplers read the values,
 * quantile arithmetic stays declarative on top (see the
 * `agg_sampled_quantiles` gate query).
 */
case class BottomKSketch(left: Expression, right: Expression, k: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]]
  with BinaryLike[Expression] {

  override def prettyName: String = "graft_bottomk"
  override def dataType: DataType = MapType(LongType, DoubleType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == DoubleType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bottomk expects (BIGINT, DOUBLE[, k > 0]), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString}), k=$k")

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  private def put(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                  h: Long, v: Double): Unit = {
    val prev = buf.get(h)
    // equal hashes keep the SMALLEST value — a commutative, associative
    // tie rule, so the sketch stays a pure function of the input set
    if (prev == null || v < prev) buf.put(h, v)
    if (buf.size > k) buf.pollLastEntry()
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null) put(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: java.util.TreeMap[java.lang.Long, java.lang.Double],
                     b2: java.util.TreeMap[java.lang.Long, java.lang.Double])
      : java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      put(b1, e.getKey, e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
    val n = buf.size
    val ks = new Array[Any](n)
    val vs = new Array[Any](n)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      ks(i) = e.getKey.longValue()
      vs(i) = e.getValue.doubleValue()
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeMap[java.lang.Long, java.lang.Double]()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BottomKSketch =
    copy(left = newLeft, right = newRight)
}
