package graft.queries

import graft.SparkSpec

/** Cross-query invariants of the round-8 part-6 operators — relations
  * that must hold BETWEEN results, beyond each query's own value oracle
  * (the Round8Spec pattern). */
class Part6InvariantsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("vocab coverage curve is monotone and bounded by 1000") {
    val r = TextQueries.queries("text_vocab_coverage")(spark, dir).collect()(0)
    val (c10, c100, c1000) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(c10 <= c100 && c100 <= c1000 && c1000 <= 1000L)
    assert(c10 > 0L)
  }

  test("threshold curve is monotone non-increasing in pairs and docs") {
    val rows = DedupQueries.queries("dedup_threshold_curve")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, p1, d1), (_, p2, d2)) => assert(p2 <= p1 && d2 <= d1)
      case _ =>
    }
  }

  test("seasonality shares sum to ~1000 globally and per dow") {
    val rows = SeriesQueries.queries("agg_seasonality")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    val total = rows.map(_._2).sum
    // truncated permilles: sum in (1000 - #cells, 1000]
    assert(total <= 1000L && total > 1000L - rows.length)
    rows.groupBy(_._1).foreach { case (_, cells) =>
      val s = cells.map(_._3).sum
      assert(s <= 1000L && s > 1000L - cells.length)
    }
  }

  test("cluster margins: members partition the corpus; margins are non-negative") {
    val emb = Tables.emb(spark, dir)
    val rows = SimQueries.queries("sim_cluster_margin")(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum == emb.count())
    assert(rows.forall(_.getLong(4) >= 0L)) // min_margin
  }

  test("kmeans and kmeans++ report the same corpus size; sse is non-negative") {
    val n = Tables.emb(spark, dir).count()
    val km = SimQueries.queries("sim_kmeans")(spark, dir).collect()
    val pp = SimQueries.queries("sim_kmeans_pp")(spark, dir).collect()
    assert(km.map(_.getLong(1)).sum == n)
    assert(pp.map(_.getLong(2)).sum == n)
    assert((km.map(_.getLong(2)) ++ pp.map(_.getLong(3))).forall(_ >= 0L))
  }

  test("bpe apply conserves words and never expands a segmentation") {
    val rows = TextQueries.queries("text_bpe_apply")(spark, dir).collect()
    rows.foreach { r =>
      val (nChars, nSub) = (r.getLong(2), r.getLong(3))
      assert(nSub <= nChars, "merges only ever shrink the symbol count")
      assert(r.getLong(4) <= 1000L, "compression permille bounded by 1")
    }
  }

  test("bucketed interval join equals the sweep-line form row-for-row") {
    val a = RelationalQueries.queries("join_interval")(spark, dir).collect().toSeq
    val b = RelationalQueries.queries("join_interval_buckets")(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("salted join equals the direct join aggregate") {
    val direct = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .groupBy("o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = RelationalQueries.queries("join_salted_skew")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == direct)
  }
}
