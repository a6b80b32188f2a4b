package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed linear algebra over the embedding corpus — the primitives a
 * training-data pipeline needs around its vector column: a Gram/covariance
 * accumulation (the input to PCA / whitening / quality diagnostics), a
 * Johnson–Lindenstrauss random projection (cheap dimensionality reduction
 * ahead of clustering or ANN), and a power-iteration top principal
 * component (data drift / dominant-direction monitoring).
 *
 * Scale design: every operator here is a single scan with MAP-SIDE partial
 * aggregation of a FIXED-size state (O(d²) resp. O(d·k) longs per
 * partition, independent of corpus size), so at 100 TB the shuffle carries
 * one small array per partition — never rows. The per-row inner loops are
 * JVM primitive loops (the [[graft.functions.Fast]] pattern): the d²/d·k
 * multiply-adds per vector are the hot path and must not box.
 *
 * Integer-exactness contract (same as the rest of the query packs): the
 * oracled forms quantize each coordinate to `floor(x * 1000)` (int64) so
 * sums are order-independent and bit-comparable across engines; the real
 * double-precision forms (power iteration) are spec-pinned by invariants
 * (Rayleigh growth, residual, unit norm) instead.
 */
object Linalg {

  /** Quantized coordinates: floor(x * 1000) per element, int64. */
  @inline private def quantize(v: scala.collection.Seq[Float]): Array[Long] = {
    val q = new Array[Long](v.length)
    var i = 0
    while (i < q.length) { q(i) = math.floor(v(i) * 1000.0).toLong; i += 1 }
    q
  }

  /**
   * Integer Gram matrix of the quantized corpus: G[i][j] = Σ_rows q_i·q_j
   * for the upper triangle (i ≤ j), as rows `(i, j, g)`.
   *
   * One scan; each partition folds its rows into a single d² long array
   * and emits THAT (32 arrays total at local[32]); the final sum groups
   * 32×d² cells — the classic outer-product accumulation that makes
   * covariance/PCA a map-side-combine problem instead of a shuffle of
   * per-row outer products (d²·N cells).
   */
  def gramInt(corpus: DataFrame, dim: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val partials = corpus.select(col(vecCol)).as[Array[Float]]
      .mapPartitions { it =>
        val acc = new Array[Long](dim * dim)
        var any = false
        while (it.hasNext) {
          val q = quantize(it.next())
          any = true
          var i = 0
          while (i < dim) {
            val qi = q(i)
            val base = i * dim
            var j = i
            while (j < dim) { acc(base + j) += qi * q(j); j += 1 }
            i += 1
          }
        }
        if (any) Iterator.single(acc) else Iterator.empty
      }
    partials.select(posexplode(col("value")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(sum(col("v")).as("g"))
      .select((col("pos") / dim).cast("long").as("i"),
        pmod(col("pos"), lit(dim)).cast("long").as("j"), col("g"))
      .filter(col("j") >= col("i"))
  }

  /** Deterministic LCG-derived projection matrix entry, shared with the
    * DuckDB oracle: idx = i·dOut + j →
    * ((1103515245·idx + 12345) mod 2147483647) mod 2001 − 1000. */
  @inline def lcgEntry(i: Int, j: Int, dOut: Int): Long =
    ((1103515245L * (i.toLong * dOut + j) + 12345L) % 2147483647L) % 2001L - 1000L

  /**
   * Johnson–Lindenstrauss-style random projection of the quantized corpus
   * to `dOut` dimensions with the deterministic integer matrix above:
   * p[j] = Σ_i q_i·R[i][j], as rows `(vec_id, j, p)`.
   *
   * The d×dOut matrix is a compile-time-size constant captured by the
   * closure (no broadcast join, no shuffle at all — the projection is a
   * map); integer arithmetic keeps it engine-exact.
   */
  def randomProjection(corpus: DataFrame, dim: Int, dOut: Int,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val r = Array.tabulate(dim * dOut)(idx => lcgEntry(idx / dOut, idx % dOut, dOut))
    val projected = corpus.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .map { case (id, v) =>
        val q = quantize(v)
        val p = new Array[Long](dOut)
        var i = 0
        while (i < dim) {
          val qi = q(i)
          val base = i * dOut
          var j = 0
          while (j < dOut) { p(j) += qi * r(base + j); j += 1 }
          i += 1
        }
        (id, p)
      }
    projected.toDF("vec_id", "p")
      .select(col("vec_id"), posexplode(col("p")).as(Seq("j", "p")))
      .select(col("vec_id"), col("j").cast("long"), col("p"))
  }

  /** Result of [[topComponent]]: unit eigenvector estimate, its Rayleigh
    * quotient λ = vᵀGv (G = Σ eeᵀ), and the residual ‖Gv − λv‖/λ. */
  final case class TopComponent(vector: Array[Double], eigenvalue: Double, residual: Double)

  /**
   * Power iteration for the top principal direction of the (uncentered)
   * second-moment matrix G = Σ_rows e·eᵀ — WITHOUT materializing G: each
   * iteration computes G·v = Σ_rows e·(e·v) as one scan with a d-vector
   * partial per partition (broadcast v down, d doubles up). Deterministic
   * start (all-ones); double precision; spec-pinned by invariants rather
   * than a SQL oracle (fp partial-sum order is partition-dependent).
   */
  def topComponent(corpus: DataFrame, dim: Int, iters: Int = 12,
                   vecCol: String = "embedding"): TopComponent = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = corpus.select(col(vecCol)).as[Array[Float]].cache()
    try {
      var v = Array.fill(dim)(1.0 / math.sqrt(dim))
      var lambda = 0.0
      var it = 0
      while (it < iters) {
        val gv = matVec(rows, v, dim)
        lambda = math.sqrt(gv.map(x => x * x).sum) // ‖Gv‖; with v unit, → λ
        v = gv.map(_ / lambda)
        it += 1
      }
      val gv = matVec(rows, v, dim)
      val res = math.sqrt(gv.zip(v).map { case (g, x) => val d = g - lambda * x; d * d }.sum) / lambda
      TopComponent(v, lambda, res)
    } finally rows.unpersist()
  }

  /** One distributed mat-vec G·v = Σ e·(e·v): fixed d-double state per
    * partition, reduced on the driver (d doubles — an aggregate, not data). */
  private def matVec(rows: org.apache.spark.sql.Dataset[Array[Float]],
                     v: Array[Double], dim: Int): Array[Double] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val acc = new Array[Double](dim)
      var any = false
      while (it.hasNext) {
        val e = it.next()
        any = true
        var d = 0.0
        var i = 0
        while (i < dim) { d += e(i) * v(i); i += 1 }
        i = 0
        while (i < dim) { acc(i) += e(i) * d; i += 1 }
      }
      if (any) Iterator.single(acc) else Iterator.empty
    }.reduce { (a, b) =>
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) { out(i) = a(i) + b(i); i += 1 }
      out
    }
  }
}
