package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Fast

/**
 * IVF (inverted-file) approximate nearest neighbor: a coarse quantizer
 * partitions the corpus into cells; a query probes only the `nprobe`
 * nearest cells and runs exact cosine inside them.
 *
 * The other scale path next to hyperplane LSH ([[Similarity.lshPairs]]):
 * where LSH is data-independent, IVF adapts to the corpus — train/choose a
 * coarse quantizer once, then route.
 *
 * Two codebooks:
 *  - [[build]] — k-means (`spark.ml`), the quality path;
 *  - [[buildSampled]] — deterministic sampled codebook (every `stride`-th
 *    vector by id, the classic random-sample quantizer): same routing
 *    structure, fully reproducible by the DuckDB oracle (the verify gate
 *    runs this one; k-means exactness is pinned by `IvfSpec`).
 *
 * Scale design: the index build is one pass (the assignment is a stored
 * column in a real deployment, partitioned/bucketed BY cell so a probe
 * reads only its cells' files); the probe filters on the cell column —
 * partition pruning turns top-k into a scan of nprobe/nlist of the data.
 * The centroid table is tiny and lives driver-side (the routing table).
 *
 * `probe(nprobe = nlist)` degenerates to exact brute-force search — the
 * invariant pinned by `IvfSpec`.
 */
object Ivf {

  /** K-means codebook (the quality path). Deterministic for a fixed seed. */
  def build(corpus: DataFrame, nlist: Int, seed: Long = 42L,
            idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("features", array_to_vector(col("v").cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features").fit(vecs)
    val assigned = model.transform(vecs)
      .select(col("id"), col("v"), col("prediction").as("ivf_cell"))
      .withColumn("nrm", Fast.normFast(col("v")))
      .localCheckpoint() // the stored, routed corpus (one pass)
    IvfIndex(assigned, model.clusterCenters.map(_.toArray).zipWithIndex.map(_.swap))
  }

  /**
   * Deterministic sampled codebook: centroids are the corpus vectors with
   * `id % stride == 0` where `stride = maxId/nlist + 1` (≤ nlist cells,
   * cid = id/stride). Assignment is nearest-centroid by squared L2 with
   * left-fold double arithmetic (float→double per element) and ties to the
   * lowest cid — exactly reproducible in SQL, which is what makes this
   * variant oracle-verifiable end to end.
   */
  def buildSampled(corpus: DataFrame, nlist: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val base = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    // null-safe: an empty corpus builds an empty codebook (assignment
    // stays -1 on nothing), not a driver-side NPE
    val maxId = Option(base.agg(max(col("id"))).head().get(0))
      .fold(-1L)(_.asInstanceOf[Long])
    val stride = maxId / nlist + 1
    val centroids: Array[(Int, Array[Double])] = base
      .filter(col("id") % stride === 0)
      .orderBy(col("id"))
      .collect() // the tiny driver-side routing table (≤ nlist rows)
      .map(r => ((r.getLong(0) / stride).toInt, r.getSeq[Float](1).map(_.toDouble).toArray))
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    val nearest = udf { (v: scala.collection.Seq[Float]) =>
      val cs = bc.value
      var bestCid = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        val (cid, cv) = cs(c)
        var d = 0.0
        var i = 0
        while (i < cv.length && i < v.length) {
          val t = v(i).toDouble - cv(i) // left-fold, float→double per element
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; bestCid = cid } // strict < → ties to lowest cid
        c += 1
      }
      bestCid
    }
    val assigned = base
      .withColumn("ivf_cell", nearest(col("v")))
      .withColumn("nrm", Fast.normFast(col("v")))
      .localCheckpoint() // the stored, routed corpus (one pass)
    IvfIndex(assigned, centroids)
  }

  /**
   * Persist a routed corpus as the SERVING layout: one parquet partition
   * directory per IVF cell (`ivf_cell=<cid>/`). A probe's
   * `ivf_cell IN (...)` filter then prunes at the PARTITION level — the
   * scan plans only nprobe/nlist of the files, before any row is read
   * (`PartitionFilters` in the scan node, pinned by `IvfSpec`). This is
   * the difference between "filter the corpus per query" and "read only
   * the index shard a query routes to" at 100 TB.
   */
  def writeLayout(index: IvfIndex, path: String): Unit =
    index.assigned.write.mode("overwrite").partitionBy("ivf_cell").parquet(path)

  /** Reopen a [[writeLayout]] directory with its routing table. */
  def openLayout(spark: org.apache.spark.sql.SparkSession, path: String,
                 centroids: Array[(Int, Array[Double])]): IvfIndex =
    IvfIndex(spark.read.parquet(path), centroids)

  final case class IvfIndex(assigned: DataFrame, centroids: Array[(Int, Array[Double])]) {

    /** Rank cells by centroid distance to the query (driver-side — the
      * routing table is tiny, like any coarse quantizer's). Same arithmetic
      * and tie-break as assignment. */
    def probeCells(query: Array[Float], nprobe: Int): Seq[Int] =
      centroids.toSeq
        .map { case (cid, cv) =>
          var d = 0.0
          var i = 0
          while (i < cv.length && i < query.length) {
            val t = query(i).toDouble - cv(i)
            d += t * t
            i += 1
          }
          (cid, d)
        }
        .sortBy { case (cid, d) => (d, cid) }
        .take(nprobe)
        .map(_._1)

    /** Exact cosine top-k within the `nprobe` cells nearest the query —
      * a cell-pruned scan + the brute-force top-k plan (map-only +
      * TakeOrderedAndProject over nprobe/nlist of the corpus). */
    def topK(query: DataFrame, k: Int, nprobe: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
      // empty query relation → no probed cells → empty result (same
      // plan shape), instead of a driver-side head() crash
      val qArr = query.select(col(vecCol)).take(1).headOption
        .map(_.getSeq[Float](0).toArray).getOrElse(Array.empty[Float])
      val cells = probeCells(qArr, nprobe)
      val probed = assigned
        .filter(col("ivf_cell").isin(cells: _*)) // partition-prunable cell filter
        .select(col("id"), col("v"), col("nrm"))
      Similarity.topKBruteForceFromNormed(probed, query, k, idCol, vecCol)
    }
  }
}
