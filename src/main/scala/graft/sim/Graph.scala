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

  /**
   * Clamped label spreading over directed `(src, dst)` edges (pass both
   * directions for an undirected graph) — the weak-supervision operator
   * that grows a labeled corpus from trusted seeds: unlabeled vertices
   * adopt the MAJORITY label of their already-labeled neighbors (ties →
   * lexicographically smallest label), seeds keep their label, and a
   * label once assigned is FROZEN, so the spread is a deterministic
   * layered flood (majority-vote BFS), not an oscillating fixpoint.
   *
   * Per round: one join of edges against the labeled set, one
   * partial-aggregated vote count on (dst, label), one struct-min argmax
   * per vertex (no window, no sort), one coalesce join back — all
   * bounded by the edge table, never the corpus; the driver sees only a
   * per-round labeled count for the convergence check. Returns
   * `(node, label)` for every vertex of the graph; vertices no seed can
   * reach keep a NULL label.
   */
  def labelPropagate(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    // both endpoints: a vertex appearing only as dst (directed input)
    // must still exist in the output and be labelable
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var lab = nodes
      .join(seeds.select(col("node"), col("label")), Seq("node"), "left")
      .localCheckpoint()
    var nLabeled = lab.filter(col("label").isNotNull).count()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val labeled = lab.filter(col("label").isNotNull)
      val votes = e
        .join(labeled.select(col("node").as("src"), col("label")), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc) via struct-min — no window
      val best = votes
        .groupBy("node")
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("b"))
        .select(col("node"), col("b.l").as("new_label"))
      lab = lab.join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("new_label")).as("label"))
        .localCheckpoint()
      val n = lab.filter(col("label").isNotNull).count()
      converged = n == nLabeled // nothing gained a label: flood is done
      nLabeled = n
      r += 1
    }
    lab
  }
}
