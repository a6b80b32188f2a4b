package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins graft.sim.Kmeans' integer Lloyd semantics: nearest-centroid
  * assignment with lowest-cid tie-break, exact truncated-integer-mean
  * recentering, and partitioning-independence of the whole loop. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("every vector lands on its true nearest centroid; ties break to the lowest cid") {
    // seeds are vec 0 (at 0.0) and vec 1 (at 1.0); vec 2 sits exactly
    // between the quantized seeds (0 and 1000 → 500 is equidistant) → cid 0
    val df = emb(
      0L -> Seq(0.0f, 0.0f),
      1L -> Seq(1.0f, 0.0f),
      2L -> Seq(0.5f, 0.0f),
      3L -> Seq(0.9f, 0.0f))
    val a = Kmeans.assign(Kmeans.quantized(df),
      Kmeans.quantized(df).filter(col("vec_id") < 2)
        .select(col("vec_id").as("cid"), col("qv").as("cv")))
      .select(col("vec_id"), col("cid")).as[(Long, Long)].collect().toMap
    assert(a == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("recentering is the exact truncated integer mean of the members") {
    // seeds: vec 0 → centroid [0], vec 1 → centroid [1000]; quantized
    // members {0,1,2} and {1000,1001}
    val df = emb(
      0L -> Seq(0.0f), 2L -> Seq(0.001f), 3L -> Seq(0.002f),
      1L -> Seq(1.0f), 4L -> Seq(1.001f))
    val out = Kmeans.lloydInt(df, k = 2, iters = 1)
      .select(col("cid"), col("dist")).as[(Long, Long)].collect()
    // after one step: c0 = (0+1+2)/3 = 1, c1 = (1000+1001)/2 = 1000
    val sse = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(sse == Map(0L -> 2L, 1L -> 1L)) // c0: 1+0+1, c1: 0+1
  }

  test("farthest-point seeding picks the spread, not the mass") {
    // dense blob near 0 plus two far outliers: Gonzalez must pick the
    // outliers as seeds 1 and 2 even though the blob holds the mass
    val df = emb(
      0L -> Seq(0.0f), 1L -> Seq(0.001f), 2L -> Seq(0.002f), 3L -> Seq(0.003f),
      4L -> Seq(10.0f), 5L -> Seq(-10.0f))
    val seeds = Kmeans.farthestSeeds(df, k = 3)
      .select(col("cid"), col("seed_id")).as[(Long, Long)].collect().sortBy(_._1)
    // seed 0 = vec 0 at 0; farthest from it: vec 4 (10000) and vec 5
    // (-10000) tie in |.|² → lowest vec_id 4 first, then 5
    assert(seeds.toSeq == Seq(0L -> 0L, 1L -> 4L, 2L -> 5L))
  }

  test("the whole loop is partitioning-independent") {
    val base = (0L until 60L).map(i => i -> Seq((i % 7).toFloat, (i % 11).toFloat))
    val a = Kmeans.lloydInt(emb(base: _*).repartition(1), 4, 2)
      .select("vec_id", "cid", "dist").as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = Kmeans.lloydInt(emb(base: _*).repartition(7), 4, 2)
      .select("vec_id", "cid", "dist").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }
}
