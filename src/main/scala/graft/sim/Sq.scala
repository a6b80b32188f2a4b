package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * SQ8 scalar quantization — the third quantizer next to [[Ivf]] and
 * [[Pq]]: each dimension is affinely mapped to an unsigned byte code
 * using the corpus-wide per-dimension [min, max] range
 * (`c_i = floor((x_i − mn_i) · 255 / (mx_i − mn_i))`, clamped to
 * [0, 255]). 64-dim float vectors (256 B) become 64 codes (64 B) — the
 * 4× memory-resident compression every large ANN deployment starts
 * with before PQ, with much cheaper encode (no codebook training) and
 * per-dimension decode (`mn_i + c_i · Δ_i / 255`).
 *
 * Scale shape: the range statistics are one partial-aggregated shuffle
 * of d rows (posexplode → min/max per dimension) collected to the
 * driver — d rows, the same codebook-tier collect as Ivf/Pq centroid
 * tables, NOT a corpus collect. Encode and ADC scoring are map-only
 * passes with the d-element range arrays as broadcast literals; the ADC
 * top-k fuses into TakeOrderedAndProject (no corpus shuffle or sort).
 *
 * Determinism: ranges, codes, and the left-fold ADC dot product are
 * pure double arithmetic in fixed element order, so DuckDB reproduces
 * every score bit-for-bit (see the `sim_topk_sq8` gate query oracle).
 */
object Sq {

  /** Per-dimension [min, max] of the corpus (index build). */
  final case class SqIndex(mn: Array[Double], mx: Array[Double]) {
    def delta(i: Int): Double = mx(i) - mn(i)
  }

  /** One partial-aggregated shuffle of `dim` rows; driver receives the
    * d-row range table (codebook-tier, corpus-size independent). */
  def build(emb: DataFrame, dim: Int): SqIndex = {
    val rows = emb
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .collect()
    val mn = new Array[Double](dim)
    val mx = new Array[Double](dim)
    rows.foreach { r =>
      val i = r.getInt(0)
      mn(i) = r.getDouble(1)
      mx(i) = r.getDouble(2)
    }
    SqIndex(mn, mx)
  }

  private def litArr(a: Array[Double]): Column = array(a.map(lit): _*)

  /** Map-only encode: `vec_id`, 64 byte codes as an int array. A
    * zero-width dimension (mx == mn) codes to 0. */
  def codes(emb: DataFrame, idx: SqIndex): DataFrame = {
    val mnA = litArr(idx.mn)
    val dA = litArr(idx.mx.indices.map(idx.delta).toArray)
    emb.select(col("vec_id"),
      transform(col("embedding"), (x, i) => {
        val mn = element_at(mnA, i + 1)
        val d = element_at(dA, i + 1)
        when(d <= 0.0, lit(0))
          .otherwise(least(lit(255), greatest(lit(0),
            floor((x.cast("double") - mn) * lit(255.0) / d).cast("int"))))
      }).as("code"))
  }

  /**
   * ADC top-k: decode each code per dimension and left-fold the dot
   * product with the raw query vector (`Σ (mn_i + c_i·Δ_i/255) · q_i`,
   * ascending i — the order DuckDB mirrors). Map-only scan over the code
   * table fused into TakeOrderedAndProject.
   */
  def topKAdc(codesDf: DataFrame, idx: SqIndex, q: Array[Double], k: Int): DataFrame = {
    val mnA = litArr(idx.mn)
    val dA = litArr(idx.mx.indices.map(idx.delta).toArray)
    val qA = litArr(q)
    val adc = aggregate(
      transform(col("code"), (c, i) =>
        (element_at(mnA, i + 1) + c.cast("double") * element_at(dA, i + 1) / lit(255.0))
          * element_at(qA, i + 1)),
      lit(0.0), (acc, x) => acc + x)
    codesDf
      .select(col("vec_id"), adc.as("adc"))
      .orderBy(col("adc").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), floor(col("adc") * lit(1000000.0)).cast("long").as("adc_x1e6"))
  }
}
