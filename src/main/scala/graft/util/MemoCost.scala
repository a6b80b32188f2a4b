package graft.util

/**
 * Build-cost ledger for the per-(session, sf-dir) memoized
 * materializations ([[graft.queries.Tables]], [[graft.log.Fixture]],
 * the SimQueries codebooks, the partitioned-log copy). The bench's COLD
 * pass attributes each memo's one-time build to whichever query touches
 * it first — which made r10's cold numbers unattributable (e.g.
 * `dedup_simhash_wide` 35.9s cold was mostly memo construction, not the
 * query). Every memoized builder now records its build seconds here and
 * `Bench` dumps the ledger as `memo_build_s` in `bench_detail.json`, so
 * cold_total decomposes into (memo builds) + (first-run query cost).
 */
object MemoCost {

  private val costs = scala.collection.concurrent.TrieMap.empty[String, Double]

  /** Run `mk`, record its wall seconds under `name` (last build wins —
    * one build per session in practice), and return the result. */
  def timed[A](name: String)(mk: => A): A = {
    val t0 = System.nanoTime()
    val r = mk
    costs.put(name, (System.nanoTime() - t0) / 1e9)
    r
  }

  /** All recorded builds (name → seconds). */
  def snapshot: Map[String, Double] = costs.toMap
}
