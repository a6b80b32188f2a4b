package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def bfsMap(edges: Seq[(Long, Long)], seeds: Seq[Long], hops: Int) =
    Graph.bfs(edges.toDF("src", "dst"), seeds.toDF("id"), hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand graph: min hop distances, bounded by maxHops") {
    // 0 -> 1 -> 2 -> 3 -> 4, plus shortcut 0 -> 3
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L))
    val got = bfsMap(edges, Seq(0L), hops = 2)
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L))
  }

  test("multi-source: distance is min over all seeds; seeds stay 0") {
    val edges = Seq((0L, 1L), (1L, 2L), (5L, 2L), (2L, 3L))
    val got = bfsMap(edges, Seq(0L, 5L), hops = 3)
    assert(got(2L) == 1L) // via seed 5, not 2 hops via seed 0
    assert(got(0L) == 0L && got(5L) == 0L)
    assert(got(3L) == 2L)
  }

  test("unreachable vertices are absent; cycles terminate") {
    val edges = Seq((0L, 1L), (1L, 0L), (7L, 8L))
    val got = bfsMap(edges, Seq(0L), hops = 5)
    assert(got == Map(0L -> 0L, 1L -> 1L))
  }

  test("matches a driver-side reference BFS on the sf0.001 kNN graph") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val edges = Similarity.knnGraphFromNormed(Similarity.normed(emb), 3)
      .select(col("a").as("src"), col("b").as("dst"))
    val seeds = emb.filter(col("vec_id") % 50 === 0).select(col("vec_id").as("id"))
    val got = Graph.bfs(edges, seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference: textbook BFS over the collected edge list
    val adj = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var dist = seeds.collect().map(r => r.getLong(0) -> 0L).toMap
    var frontier = dist.keySet
    for (h <- 1 to 3) {
      val next = frontier.flatMap(adj.getOrElse(_, Seq.empty)).diff(dist.keySet)
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    assert(got == dist)
  }
}
