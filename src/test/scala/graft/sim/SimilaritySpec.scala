package graft.sim

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq

  test("block-partitioned exact all-pairs equals the broadcast baseline bit-for-bit") {
    val base = pairs(Similarity.bruteForcePairs(corpus, 0.45))
    assert(base.nonEmpty)
    // several block counts, incl. B > distinct blocks touched and B = 1
    for (b <- Seq(1, 3, 8)) {
      val blocked = pairs(Similarity.bruteForcePairsBlocked(corpus, 0.45, nBlocks = b))
      assert(blocked == base, s"nBlocks=$b diverged")
    }
  }

  test("multi-probe LSH recall dominates single-probe at equal k") {
    import org.apache.spark.sql.functions.col
    val nc = Similarity.normed(corpus)
    val q = corpus.filter(col("vec_id") === 0)
    val k = 10
    val exact = Similarity.topKBruteForceFromNormed(nc, q, k)
      .collect().map(_.getLong(0)).toSet
    val single = Similarity.topKLshFromNormed(nc, q, k, 64)
      .collect().map(_.getLong(0)).toSet
    val multi = Similarity.topKLshMultiProbeFromNormed(nc, q, k, 64)
      .collect().map(_.getLong(0)).toSet
    // the probe set strictly contains the single-probe set, so recall of
    // the true top-k can only improve (both intersect the exact answer)
    assert((multi & exact).size >= (single & exact).size)
    // self-hit: the query's own bucket is always probed
    assert(multi.contains(0L))
  }
}
