package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/**
 * Misra–Gries guarantees under real distributed execution: membership
 * of true heavies and the n/(k+1) count error bound must hold for ANY
 * partitioning (counts themselves may vary with merge order — that is
 * the documented trade, and why this operator has no value oracle).
 */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private def summarize(rows: Seq[String], k: Int, parts: Int): Map[String, Long] =
    rows.toDF("t").repartition(parts)
      .agg(call_function("graft_heavy_hitters", col("t"), lit(k)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.tag"), col("e.lower_bound"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("every tag above n/(k+1) is present; counts are lower bounds within n/(k+1)") {
    val gen = Gen.frequency(
      (40, Gen.const("whale")), (25, Gen.const("shark")),
      (5, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")),
      (5, Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString))) // long tail
    for (seed <- 1 to 6) {
      val rows = Gen.listOfN(2000, gen)
        .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed.toLong))
      val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = rows.size.toLong
      for ((k, parts) <- Seq((8, 1), (8, 4), (16, 7), (16, 32))) {
        val mg = summarize(rows, k, parts)
        assert(mg.size <= k, s"summary exceeded $k counters")
        val bound = n / (k + 1)
        exact.foreach { case (tag, c) =>
          if (c > bound)
            assert(mg.contains(tag), s"heavy tag $tag (count $c > $bound) missing, k=$k parts=$parts")
        }
        mg.foreach { case (tag, lb) =>
          val c = exact.getOrElse(tag, 0L)
          assert(lb <= c, s"$tag lower bound $lb exceeds true count $c")
          assert(c - lb <= bound, s"$tag underestimate ${c - lb} exceeds $bound")
        }
      }
    }
  }

  test("k >= distinct tags degenerates to exact counts, any partitioning") {
    val rows = Seq.fill(30)("x") ++ Seq.fill(20)("y") ++ Seq.fill(10)("z")
    for (parts <- Seq(1, 5)) {
      val mg = summarize(scala.util.Random.shuffle(rows), 16, parts)
      assert(mg == Map("x" -> 30L, "y" -> 20L, "z" -> 10L), s"parts=$parts")
    }
  }

  test("fixture tokens: guarantees hold over a real long-tail vocabulary") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(graft.dedup.Hashing.toks(col("text"))).as("t"))
    val exact = toks.groupBy("t").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 32
    val mg = toks.repartition(16)
      .agg(call_function("graft_heavy_hitters", col("t"), lit(k)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.tag"), col("e.lower_bound"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = n / (k + 1)
    assert(mg.size <= k)
    exact.foreach { case (t, c) =>
      if (c > bound) assert(mg.contains(t), s"heavy token $t (count $c > $bound) missing")
    }
    mg.foreach { case (t, lb) =>
      val c = exact.getOrElse(t, 0L)
      assert(lb <= c && c - lb <= bound, s"$t: lb=$lb exact=$c bound=$bound")
    }
  }

  test("guaranteed-heavy extraction: threshold filter has no false negatives") {
    // report tags whose lower bound > threshold - n/(k+1): any tag with
    // true count > threshold must be reported (may include extras —
    // one-sided guarantee, the useful direction for blocklists)
    val rows = (1 to 1000).map(i => if (i % 3 == 0) "hot" else s"t${i % 97}")
    val n = rows.size.toLong
    val k = 24
    val mg = summarize(rows, k, parts = 8)
    val threshold = 200L
    val reported = mg.filter { case (_, lb) => lb > threshold - n / (k + 1) }.keySet
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.filter(_._2 > threshold).keySet.foreach { t =>
      assert(reported.contains(t), s"true heavy $t not reported")
    }
  }
}
