package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/**
 * Algebraic laws of the custom mergeable aggregates, exercised directly
 * on the buffer API with scalacheck-generated inputs and merge trees:
 * for ANY partitioning of the input and ANY merge order, the final
 * buffer must equal the single-partition fold (this is the property the
 * distributed correctness of partial aggregation rests on), and
 * serialize/deserialize must round-trip at every merge boundary —
 * exactly what Spark does between partial and final passes.
 */
class SketchAlgebraSpec extends AnyFunSuite {

  private val seeds = (1 to 12).map(i => 1000L + i * 7919L)

  private def splitInto[A](xs: List[A], nParts: Int, seed: Long): Seq[List[A]] = {
    val rnd = new scala.util.Random(seed)
    xs.groupBy(_ => rnd.nextInt(nParts)).values.toList
  }

  // ---- KMV ----

  private def kmvRun(rows: Seq[Long], agg: KmvSketch): java.util.TreeSet[java.lang.Long] = {
    val buf = agg.createAggregationBuffer()
    rows.foreach { v =>
      agg.update(buf, new GenericInternalRow(Array[Any](v)))
    }
    buf
  }

  test("KMV: any partitioning + serde at merge boundaries == one-pass fold") {
    val agg = KmvSketch(BoundReference(0, LongType, nullable = true), k = 16)
    val gen = Gen.listOfN(200, Gen.chooseNum(0L, 500L))
    for (seed <- seeds) {
      val rows = gen.pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
      val want = agg.eval(kmvRun(rows, agg))
      for (nParts <- Seq(1, 2, 5, 9)) {
        val partials = splitInto(rows, nParts, seed)
          .map(p => agg.deserialize(agg.serialize(kmvRun(p, agg))))
        val merged = partials.reduce(agg.merge)
        assert(agg.eval(merged).asInstanceOf[GenericArrayData].array.toSeq ==
          want.asInstanceOf[GenericArrayData].array.toSeq, s"seed=$seed parts=$nParts")
      }
    }
  }

  // ---- BottomK ----

  private def bkRun(rows: Seq[(Long, Double)],
                    agg: BottomKSketch): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val buf = agg.createAggregationBuffer()
    rows.foreach { case (h, v) =>
      agg.update(buf, new GenericInternalRow(Array[Any](h, v)))
    }
    buf
  }

  private def bkPairs(m: Any): Seq[(Long, Double)] = {
    val md = m.asInstanceOf[ArrayBasedMapData]
    md.keyArray.asInstanceOf[GenericArrayData].array.map(_.asInstanceOf[Long])
      .zip(md.valueArray.asInstanceOf[GenericArrayData].array.map(_.asInstanceOf[Double])).toSeq
  }

  test("BottomK: any partitioning + serde at merge boundaries == one-pass fold") {
    val agg = BottomKSketch(
      BoundReference(0, LongType, nullable = true),
      BoundReference(1, DoubleType, nullable = true), k = 16)
    // duplicate hashes on purpose: chooseNum(0, 60) over 150 rows collides
    val gen = Gen.listOfN(150, Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(-5.0, 5.0)))
    for (seed <- seeds) {
      val rows = gen.pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
      val want = bkPairs(agg.eval(bkRun(rows, agg)))
      for (nParts <- Seq(1, 3, 7)) {
        val partials = splitInto(rows, nParts, seed)
          .map(p => agg.deserialize(agg.serialize(bkRun(p, agg))))
        val merged = partials.reduce(agg.merge)
        assert(bkPairs(agg.eval(merged)) == want, s"seed=$seed parts=$nParts")
      }
    }
  }

  // ---- TopKBy ----

  private def tkRun(rows: Seq[(Long, String)],
                    agg: TopKBySketch): java.util.TreeSet[(Long, UTF8String)] = {
    val buf = agg.createAggregationBuffer()
    rows.foreach { case (s, t) =>
      agg.update(buf, new GenericInternalRow(Array[Any](s, UTF8String.fromString(t))))
    }
    buf
  }

  private def tkEntries(a: Any): Seq[(Long, String)] =
    a.asInstanceOf[GenericArrayData].array.toSeq.map { r =>
      val row = r.asInstanceOf[InternalRow]
      (row.getLong(0), row.getUTF8String(1).toString)
    }

  test("TopKBy: any partitioning + serde at merge boundaries == one-pass fold") {
    val agg = TopKBySketch(
      BoundReference(0, LongType, nullable = true),
      BoundReference(1, StringType, nullable = true), k = 8)
    // small score range forces ties; tags collide across partitions
    val gen = Gen.listOfN(120,
      Gen.zip(Gen.chooseNum(0L, 9L), Gen.oneOf("a", "b", "c", "dd", "ee", "f", "g", "hh")))
    for (seed <- seeds) {
      val rows = gen.pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
      val want = tkEntries(agg.eval(tkRun(rows, agg)))
      for (nParts <- Seq(1, 2, 6)) {
        val partials = splitInto(rows, nParts, seed)
          .map(p => agg.deserialize(agg.serialize(tkRun(p, agg))))
        val merged = partials.reduce(agg.merge)
        assert(tkEntries(agg.eval(merged)) == want, s"seed=$seed parts=$nParts")
      }
    }
  }
}
