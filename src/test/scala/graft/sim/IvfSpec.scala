package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val query: Array[Float] = corpus
    .filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

  test("probing all cells equals brute-force top-k exactly") {
    val index = Ivf.build(corpus, nlist = 8)
    val ivfAll = index.topK(query, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity
      .topKBruteForce(corpus, corpus.filter(col("vec_id") === 0), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfAll == brute)
  }

  test("partial probe returns k results from probed cells only, ranked by cosine") {
    val index = Ivf.build(corpus, nlist = 8)
    val got = index.topK(query, k = 10, nprobe = 2).collect()
    assert(got.length == 10)
    val cosines = got.map(_.getDouble(1)).toSeq
    assert(cosines == cosines.sorted.reverse) // descending
    // the query vector itself lives in a probed cell (its own)
    assert(got.head.getLong(0) == 0L && got.head.getDouble(1) > 0.999999)
  }
}
