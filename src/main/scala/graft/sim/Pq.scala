package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) — the memory-resident ANN scale path: split
 * each vector into `m` subvectors, quantize each against a per-subspace
 * codebook, and store only the `m` code bytes. A 100 TB corpus of 64-dim
 * float vectors (256 B each) compresses to 8 B/vector of codes — the
 * whole index fits in executor memory, and a query scans codes, not
 * vectors (ADC: asymmetric distance computation via a tiny lookup table).
 *
 * Codebook: the deterministic sampled quantizer (the [[Ivf.buildSampled]]
 * pattern — codeword `j` of every subspace is the matching subvector of
 * the corpus vector `id == j * stride`), which makes encoding and ADC
 * fully SQL-reproducible for the DuckDB oracle. A k-means-per-subspace
 * build slots into the same index shape.
 *
 * Exactness contract: per-subspace squared-L2 terms use the same
 * left-fold float→double arithmetic as IVF assignment, ties to the lowest
 * code; ADC *floor-scales each per-subspace lookup to an integer (×10⁶)
 * before summing* — integer sums are addition-order-independent, so the
 * ranking key is bit-identical on every engine (real PQ deployments
 * quantize the LUT to int8/int16 for SIMD for the same structural reason).
 *
 * Scale: encode is one map-only pass with a broadcast codebook; the codes
 * table is m bytes/vector; ADC top-k is a broadcast (m × ncode) integer
 * table + a map-only scan fused into TakeOrderedAndProject. IVF and PQ
 * compose (IVF-PQ): route to cells, ADC-scan only the probed cells' codes.
 */
object Pq {

  val defaultM = 8
  val defaultNcode = 16

  /** Squared L2 between `v[s*subDim ..)` and codeword `cw[s*subDim ..)` —
    * left-fold, float→double per element. */
  private def l2Sub(v: scala.collection.Seq[Float], cw: Array[Double],
                    s: Int, subDim: Int): Double = {
    var d = 0.0
    var i = s * subDim
    val end = math.min((s + 1) * subDim, math.min(v.length, cw.length))
    while (i < end) {
      val t = v(i).toDouble - cw(i)
      d += t * t
      i += 1
    }
    d
  }

  /** Build the sampled codebook and encode the corpus (one map-only pass;
    * codebook broadcast). `codewords` are full sampled vectors — subspace
    * `s` of codeword `j` is their `[s*subDim, (s+1)*subDim)` slice. */
  def buildSampled(corpus: DataFrame, m: Int = defaultM, ncode: Int = defaultNcode,
                   idCol: String = "vec_id", vecCol: String = "embedding"): PqIndex = {
    val base = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    // null-safe: an empty corpus builds an empty codebook, not a
    // driver-side NPE
    val maxId = Option(base.agg(max(col("id"))).head().get(0))
      .fold(-1L)(_.asInstanceOf[Long])
    val stride = maxId / ncode + 1
    val codewords: Array[(Int, Array[Double])] = base
      .filter(col("id") % stride === 0)
      .orderBy(col("id"))
      .collect() // tiny driver-side codebook (≤ ncode rows), like any quantizer's
      .map(r => ((r.getLong(0) / stride).toInt, r.getSeq[Float](1).map(_.toDouble).toArray))
    val bc = corpus.sparkSession.sparkContext.broadcast(codewords)
    val encodeUdf = udf { (v: scala.collection.Seq[Float]) =>
      val cs = bc.value
      val subDim = v.length / m
      Array.tabulate(m) { s =>
        var bestCid = -1
        var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          val d = l2Sub(v, cs(c)._2, s, subDim)
          if (d < bestD) { bestD = d; bestCid = cs(c)._1 } // ties to lowest cid
          c += 1
        }
        bestCid
      }
    }
    val encoded = base
      .withColumn("codes", encodeUdf(col("v")))
      .select(col("id"), col("codes"))
      .localCheckpoint() // the stored code table (m bytes/vector at scale)
    PqIndex(encoded, codewords, m)
  }

  final case class PqIndex(encoded: DataFrame, codewords: Array[(Int, Array[Double])], m: Int) {

    /** Flat `(vec_id, sub, code)` view of the code table. */
    def codesFlat: DataFrame = encoded
      .select(col("id").as("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .select(col("vec_id"), col("sub").cast("long").as("sub"), col("code").cast("long").as("code"))

    /** Integer ADC lookup table for `query`: `lut(s)(cid) = floor(1e6 *
      * l2(query_s, codeword_cid_s))` — floored per cell so ADC sums are
      * order-independent. */
    def lut(query: Array[Float]): Array[Array[Long]] = {
      val subDim = query.length / m
      Array.tabulate(m) { s =>
        val row = new Array[Long](codewords.map(_._1).max + 1)
        codewords.foreach { case (cid, cw) =>
          row(cid) = math.floor(1e6 * l2Sub(query.toSeq, cw, s, subDim)).toLong
        }
        row
      }
    }

    /** ADC top-k: approximate distance = Σ_s lut(s)(code_s) (integer sum),
      * ascending, ties to the lowest id. Map-only scan over the code table
      * + TakeOrderedAndProject. */
    def topKAdc(query: DataFrame, k: Int, vecCol: String = "embedding"): DataFrame =
      topKAdcScan(encoded, query, k, vecCol)

    /** IVF-PQ: ADC top-k over only the ids in `member` (the IVF-probed
      * cells' members). In a deployment the code table is stored
      * partitioned BY cell, so this is a pruned scan, not a join. */
    def topKAdcAmong(query: DataFrame, k: Int, member: DataFrame,
                     vecCol: String = "embedding"): DataFrame =
      topKAdcScan(encoded.join(member, Seq("id"), "left_semi"), query, k, vecCol)

    private def topKAdcScan(codeTable: DataFrame, query: DataFrame, k: Int,
                            vecCol: String): DataFrame = {
      // empty query relation → empty result with the same schema,
      // instead of a driver-side head() crash
      val qOpt = query.select(col(vecCol)).take(1).headOption
      if (qOpt.isEmpty)
        return codeTable.limit(0)
          .select(col("id").as("vec_id"), lit(0L).as("adc_x1e6"))
      val qArr = qOpt.get.getSeq[Float](0).toArray
      val bcLut = encoded.sparkSession.sparkContext.broadcast(lut(qArr))
      val adcUdf = udf { (codes: scala.collection.Seq[Int]) =>
        val t = bcLut.value
        var s = 0
        var acc = 0L
        while (s < codes.length) { acc += t(s)(codes(s)); s += 1 }
        acc
      }
      codeTable
        .select(col("id").as("vec_id"), adcUdf(col("codes")).as("adc_x1e6"))
        .orderBy(col("adc_x1e6").asc, col("vec_id").asc)
        .limit(k)
    }
  }
}
