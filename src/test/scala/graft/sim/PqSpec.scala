package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("sampled codewords encode to their own code in every subspace") {
    val idx = Pq.buildSampled(emb)
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    val stride = maxId / Pq.defaultNcode + 1
    val own = idx.codesFlat
      .filter(col("vec_id") % stride === 0)
      .withColumn("cid", (col("vec_id") / stride).cast("long"))
      .filter(col("code") =!= col("cid"))
      .count()
    assert(own == 0, "a codeword's own subvectors are at distance 0 from themselves")
  }

  test("ADC ranks the query vector itself first (minimal LUT row sum)") {
    val idx = Pq.buildSampled(emb)
    val top = idx.topKAdc(emb.filter(col("vec_id") === 0), k = 5).collect()
    assert(top.head.getLong(0) == 0L,
      "the query's own codes hit the per-subspace LUT minima; ties break to the lowest id")
    val adcs = top.map(_.getLong(1))
    assert(adcs.sameElements(adcs.sorted), "ascending distance order")
  }

  test("ADC among all members degenerates to the unrestricted scan") {
    val idx = Pq.buildSampled(emb)
    val q = emb.filter(col("vec_id") === 0)
    val all = emb.select(col("vec_id").as("id"))
    val a = idx.topKAdc(q, k = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = idx.topKAdcAmong(q, k = 10, all).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b, "probe-all IVF-PQ must equal plain PQ (the IvfSpec invariant, one level up)")
  }

  test("code table is m codes per vector, all within the codebook") {
    val idx = Pq.buildSampled(emb)
    val n = emb.count()
    assert(idx.codesFlat.count() == n * Pq.defaultM)
    val maxCid = idx.codewords.map(_._1).max
    assert(idx.codesFlat.agg(max("code")).head().getLong(0) <= maxCid)
    assert(idx.codesFlat.agg(min("code")).head().getLong(0) >= 0)
  }
}
