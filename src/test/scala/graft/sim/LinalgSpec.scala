package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinalgSpec extends SparkSpec {

  private val DIM = 64

  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("gramInt matches a single-threaded reference fold") {
    import spark.implicits._
    val vecs = corpus.select(col("embedding")).as[Array[Float]].collect()
    val want = Array.ofDim[Long](DIM, DIM)
    for (v <- vecs) {
      val q = v.map(x => math.floor(x * 1000.0).toLong)
      for (i <- 0 until DIM; j <- i until DIM) want(i)(j) += q(i) * q(j)
    }
    val got = Linalg.gramInt(corpus, DIM).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.size == DIM * (DIM + 1) / 2)
    for (i <- 0 until DIM; j <- i until DIM)
      assert(got((i.toLong, j.toLong)) == want(i)(j), s"G[$i][$j]")
  }

  test("gramInt is partitioning-invariant (map-side partials are exact)") {
    val a = Linalg.gramInt(corpus.repartition(1), DIM).orderBy("i", "j").collect().toSeq
    val b = Linalg.gramInt(corpus.repartition(7), DIM).orderBy("i", "j").collect().toSeq
    assert(a == b)
  }

  test("randomProjection matches the reference fold and preserves relative scale") {
    import spark.implicits._
    val got = Linalg.randomProjection(corpus, DIM, 16).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val rows = corpus.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    assert(got.size == rows.length * 16)
    for ((id, v) <- rows.take(20)) {
      val q = v.map(x => math.floor(x * 1000.0).toLong)
      for (j <- 0 until 16) {
        val want = (0 until DIM).map(i => q(i) * Linalg.lcgEntry(i, j, 16)).sum
        assert(got((id, j.toLong)) == want, s"p[$id][$j]")
      }
    }
  }

  test("topComponent converges to a unit-norm dominant direction") {
    // near-isotropic random embeddings have a small eigengap, so power
    // iteration converges geometrically but slowly — assert the residual
    // is small after 60 iterations AND strictly improves with depth
    val early = Linalg.topComponent(corpus, DIM, iters = 15)
    val tc = Linalg.topComponent(corpus, DIM, iters = 60)
    val n = math.sqrt(tc.vector.map(x => x * x).sum)
    assert(math.abs(n - 1.0) < 1e-9, s"norm $n")
    assert(tc.eigenvalue > 0.0)
    // Gv ≈ λv after convergence
    assert(tc.residual < 1e-2, s"residual ${tc.residual}")
    assert(tc.residual < early.residual, "deeper iteration did not improve the residual")
    // λ is bounded by the trace of G = Σ‖e‖² and is at least trace/d
    import spark.implicits._
    val trace = corpus.select(col("embedding")).as[Array[Float]].collect()
      .map(v => v.map(x => x.toDouble * x).sum).sum
    assert(tc.eigenvalue <= trace + 1e-6)
    assert(tc.eigenvalue >= trace / DIM - 1e-6)
  }
}
