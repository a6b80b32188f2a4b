package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bounded multi-source BFS over an edge table — the seed-expansion
 * operator of corpus curation: "every vector reachable within H hops of
 * a curated seed set" (quality propagation through the kNN graph, the
 * LAB/seed-crawl pattern for growing a training corpus from trusted
 * examples).
 *
 * Same iterative join–aggregate discipline as
 * [[graft.dedup.Dedup.duplicateClusters]] and the PageRank gate: each
 * round joins only the newly-discovered FRONTIER (not the full reach
 * set) against the edges, anti-joins out already-reached vertices, and
 * `localCheckpoint`s to truncate lineage. Rounds are bounded by the hop
 * limit; per-round cost is one hash join frontier⋈edges plus one
 * anti-join — the driver never sees a row. At 100 TB the same loop runs
 * with the edge table bucketed by `src` so every round's join is
 * co-partitioned.
 */
object Graph {

  /**
   * Minimum hop distance (≤ `maxHops`) from any seed, over directed
   * `(src, dst)` edges. Returns `(id, dist)` for every reached vertex;
   * unreached vertices are absent (result size follows the reachable
   * set, not the graph).
   */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    var dist = seeds.select(col("id"), lit(0L).as("dist")).distinct().localCheckpoint()
    var frontier = dist.select(col("id"))
    var h = 1
    while (h <= maxHops) {
      val discovered = frontier
        .join(e, frontier("id") === e("src"))
        .select(col("dst").as("id"))
        .distinct()
        .join(dist.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(h.toLong).as("dist"))
        .localCheckpoint()
      // converged before the hop budget: an empty frontier can discover
      // nothing, so skip the remaining rounds' join/anti-join jobs
      if (discovered.isEmpty) return dist
      dist = dist.union(discovered).localCheckpoint()
      frontier = discovered.select(col("id"))
      h += 1
    }
    dist
  }
}
