package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Fast

/**
 * IVF (inverted-file) approximate nearest neighbor: k-means partitions the
 * corpus into `nlist` cells; a query probes only the `nprobe` nearest
 * cells and runs exact cosine inside them.
 *
 * The other scale path next to hyperplane LSH ([[Similarity.lshPairs]]):
 * where LSH is data-independent, IVF adapts to the corpus distribution —
 * the standard trade (train a coarse quantizer once, then route).
 *
 * Scale design: the index build is one ML fit + one routing pass
 * (both linear, the assignment is a stored column in a real deployment,
 * partitioned/bucketed BY cell so a probe reads only its cells' files);
 * the probe filters on the cell column — partition pruning turns top-k
 * into a scan of nprobe/nlist of the data.
 *
 * `probe(nprobe = nlist)` degenerates to exact brute-force search — the
 * invariant pinned by `IvfSpec`.
 */
object Ivf {

  /** Corpus with an ivf_cell routing column (the "index"). Deterministic
    * for a fixed seed. */
  def build(corpus: DataFrame, nlist: Int, seed: Long = 42L,
            idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("features", array_to_vector(col("v").cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features").fit(vecs)
    val assigned = model.transform(vecs)
      .select(col("id"), col("v"), col("prediction").as("ivf_cell"))
      .withColumn("nrm", Fast.normFast(col("v")))
      .localCheckpoint() // the stored, routed corpus (one pass)
    IvfIndex(assigned, model.clusterCenters.map(_.toArray))
  }

  final case class IvfIndex(assigned: DataFrame, centroids: Array[Array[Double]]) {

    /** Exact cosine top-k within the `nprobe` cells nearest the query. */
    def topK(query: Array[Float], k: Int, nprobe: Int): DataFrame = {
      val qd = query.map(_.toDouble)
      // rank cells by centroid distance to the query (centroids are tiny —
      // driver-side, like any coarse-quantizer routing table)
      val cells = centroids.zipWithIndex
        .map { case (c, i) =>
          var d = 0.0
          var j = 0
          while (j < c.length && j < qd.length) { val t = c(j) - qd(j); d += t * t; j += 1 }
          (i, d)
        }
        .sortBy { case (i, d) => (d, i) }
        .take(nprobe)
        .map(_._1)
      val qn = math.sqrt(Fast.dotJvm(query, query))
      val spark = assigned.sparkSession
      import spark.implicits._
      val probed = assigned.filter(col("ivf_cell").isin(cells.toSeq: _*))
      probed
        .select(col("id"), col("v"), col("nrm"))
        .as[(Long, Array[Float], Double)]
        .map { case (id, v, nrm) => (id, Fast.dotJvm(v, query) / (nrm * qn)) }
        .toDF("vec_id", "cos")
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(k)
    }
  }
}
