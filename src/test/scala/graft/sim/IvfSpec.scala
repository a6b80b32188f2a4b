package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val queryDf = corpus.filter(col("vec_id") === 0)

  test("probing all cells equals brute-force top-k exactly (k-means codebook)") {
    val index = Ivf.build(corpus, nlist = 8)
    val ivfAll = index.topK(queryDf, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity
      .topKBruteForce(corpus, queryDf, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfAll == brute)
  }

  test("probing all cells equals brute-force top-k exactly (sampled codebook)") {
    val index = Ivf.buildSampled(corpus, nlist = 8)
    val nCells = index.centroids.length
    val ivfAll = index.topK(queryDf, k = 10, nprobe = nCells)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity
      .topKBruteForce(corpus, queryDf, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfAll == brute)
  }

  test("partial probe returns k results from probed cells only, ranked by cosine") {
    val index = Ivf.build(corpus, nlist = 8)
    val got = index.topK(queryDf, k = 10, nprobe = 2).collect()
    assert(got.length == 10)
    val cosines = got.map(_.getDouble(1)).toSeq
    assert(cosines == cosines.sorted.reverse) // descending
    // the query vector itself lives in a probed cell (its own)
    assert(got.head.getLong(0) == 0L && got.head.getDouble(1) > 0.999999)
  }

  test("sampled codebook: assignment ties route to the lowest cid, cells cover corpus") {
    val index = Ivf.buildSampled(corpus, nlist = 8)
    val n = corpus.count()
    assert(index.assigned.count() == n) // every vector routed to exactly one cell
    val cells = index.assigned.select("ivf_cell").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf(index.centroids.map(_._1).toSet))
    // each sampled centroid vector is assigned to its own cell (distance 0)
    val maxId = corpus.agg(max(col("vec_id"))).head().getLong(0)
    val stride = maxId / 8 + 1
    val own = index.assigned.filter(col("id") % lit(stride) === 0)
      .filter(col("ivf_cell") =!= (col("id") / lit(stride)).cast("int"))
    assert(own.count() == 0)
  }

  test("cell-partitioned layout: probe prunes partitions, results identical to in-memory") {
    val index = Ivf.buildSampled(corpus, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf_layout").toString
    try {
      Ivf.writeLayout(index, dir)
      // one directory per cell on disk — the physical index shards
      val cellDirs = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("ivf_cell=")).map(_.getName).toSet
      assert(cellDirs.size == index.centroids.length, s"expected one dir per cell, got $cellDirs")

      val opened = Ivf.openLayout(spark, dir, index.centroids)
      val probed = opened.topK(queryDf, k = 10, nprobe = 2)
      // the scan must prune at the PARTITION level: the cell predicate
      // appears in PartitionFilters (planned before any row is read), and
      // the scan's file listing covers only the probed cells
      val scan = probed.queryExecution.executedPlan.toString()
      assert(scan.contains("PartitionFilters: [ivf_cell") ||
        scan.contains("PartitionFilters: [isnotnull(ivf_cell") ||
        "PartitionFilters: \\[.*ivf_cell".r.findFirstIn(scan).isDefined,
        s"expected the cell filter as a partition filter in:\n$scan")
      // and the answer is bit-identical to the in-memory routed corpus
      val fromDisk = probed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val inMem = index.topK(queryDf, k = 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(fromDisk == inMem)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
