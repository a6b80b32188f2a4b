package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Semantics pins for the round-8 additions: cube subtotal algebra,
 * compaction-bin conservation/ordering, positional phrase search vs a
 * direct token-window rescan, and split-leakage consistency with its
 * two inputs (the DuckDB oracle pins exact values at sf0.01; these pin
 * the invariants the oracle can't state directly).
 */
class Round8Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("olap_cube: subtotal planes are consistent sums of the detail plane") {
    val rows = RelationalQueries.queries("olap_cube")(spark, dir).collect()
    assert(rows.nonEmpty)
    case class R(nation: String, priority: String, n: Long, cents: Long)
    val rs = rows.map(r => R(r.getAs[String]("nation"), r.getAs[String]("priority"),
      r.getAs[Long]("n_orders"), r.getAs[Long]("revenue_x100")))
    val detail = rs.filter(r => r.nation != "ALL" && r.priority != "ALL")
    val grand = rs.filter(r => r.nation == "ALL" && r.priority == "ALL")
    assert(grand.length == 1)
    assert(grand.head.n == detail.map(_.n).sum)
    assert(grand.head.cents == detail.map(_.cents).sum)
    // each one-dim subtotal row equals the sum of its detail rows
    rs.filter(r => r.nation != "ALL" && r.priority == "ALL").foreach { sub =>
      val d = detail.filter(_.nation == sub.nation)
      assert(sub.n == d.map(_.n).sum && sub.cents == d.map(_.cents).sum, s"nation subtotal: $sub")
    }
    rs.filter(r => r.nation == "ALL" && r.priority != "ALL").foreach { sub =>
      val d = detail.filter(_.priority == sub.priority)
      assert(sub.n == d.map(_.n).sum && sub.cents == d.map(_.cents).sum, s"priority subtotal: $sub")
    }
  }

  test("log_compaction_bins: bytes conserved, bins contiguous and disjoint per day") {
    val bins = SeriesQueries.queries("log_compaction_bins")(spark, dir).collect()
    assert(bins.nonEmpty)
    val fileBytes = graft.log.Fixture.raw(spark, dir)
      .select((length(col("props")).cast("long") + lit(64L)).as("b"))
      .agg(sum("b")).head().getLong(0)
    assert(bins.map(_.getAs[Long]("bin_bytes")).sum == fileBytes, "byte conservation")
    bins.groupBy(_.getAs[Long]("day")).foreach { case (day, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("bin"))
      ordered.foreach { r =>
        assert(r.getAs[Long]("first_shard") <= r.getAs[Long]("last_shard"), s"day $day: $r")
        assert(r.getAs[Long]("n_files") >= 1L)
      }
      // greedy packing in shard order: consecutive bins own disjoint,
      // increasing shard ranges
      ordered.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(0).getAs[Long]("last_shard") < w(1).getAs[Long]("first_shard"),
          s"day $day: overlapping bins ${w(0)} / ${w(1)}")
      }
    }
  }

  test("text_phrase_search: matches a direct token-window rescan") {
    val got = TextQueries.queries("text_phrase_search")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), (r.getAs[Long]("n_hits"), r.getAs[Long]("first_pos"))))
      .toMap
    val phrase = Seq("slow", "hash", "batch")
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val toks = r.getAs[String]("text").trim.toLowerCase.split("\\s+").toSeq
        val hits = toks.sliding(3).zipWithIndex.collect {
          case (w, i) if w == phrase => i.toLong
        }.toSeq
        if (hits.isEmpty) None
        else Some(r.getAs[Long]("doc_id") -> ((hits.size.toLong, hits.min)))
      }.toMap
    assert(got == want)
    assert(got.nonEmpty || want.isEmpty)
  }

  test("labelPropagate: flood order, majority vote, tie-break, early convergence") {
    import spark.implicits._
    // chain 1-2-3-4 with competing seeds at the ends, plus 5 adjacent to
    // both seeds (a perfect 1-1 tie)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq((1L, "b"), (4L, "a")).toDF("node", "label")
    val got = graft.sim.Graph.labelPropagate(edges, seeds, rounds = 10)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[String]("label")).toMap
    // seeds clamped; 2 floods from 1, 3 floods from 4; 5 ties → min label
    assert(got == Map(1L -> "b", 2L -> "b", 3L -> "a", 4L -> "a", 5L -> "a"))
  }

  test("labelPropagate: a dst-only vertex of a directed edge exists and is labeled") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq((1L, "x")).toDF("node", "label")
    val got = graft.sim.Graph.labelPropagate(edges, seeds, rounds = 1)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[String]("label")).toMap
    assert(got == Map(1L -> "x", 2L -> "x"))
  }

  test("graph_label_prop: seeds keep their source; labels only where a seed can reach") {
    val labs = DedupQueries.queries("graph_label_prop")(spark, dir).collect()
      .map(r => r.getAs[Long]("node") -> Option(r.getAs[String]("label"))).toMap
    val sources = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    // every in-graph seed must carry its own source label
    labs.foreach { case (node, lab) =>
      if (node % 5 == 0) assert(lab.contains(sources(node)), s"seed $node: $lab")
    }
    // any assigned label is some document's source (labels never invented)
    val valid = sources.values.toSet
    labs.values.flatten.foreach(l => assert(valid(l)))
  }

  test("text_lang_confusion: regroups the per-doc lang_id dump exactly") {
    val per = TextQueries.queries("text_lang_id")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    val truth = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    val want = truth.groupBy { case (id, lang) => (lang, per(id)) }
      .map { case (k, vs) => k -> vs.length.toLong }
    val got = TextQueries.queries("text_lang_confusion")(spark, dir).collect()
    assert(got.map(r => ((r.getAs[String]("lang"), r.getAs[String]("lang_pred")),
      r.getAs[Long]("n"))).toMap == want)
    // per-lang permille shares are consistent and bounded
    got.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val nLang = truth.count(_._2 == lang).toLong
      rs.foreach { r =>
        assert(r.getAs[Long]("share_permille") == 1000L * r.getAs[Long]("n") / nLang)
      }
      assert(rs.map(_.getAs[Long]("n")).sum == nLang)
    }
  }

  test("corpus_split_leakage: consistent with the pair set joined to the split") {
    val got = CorpusQueries.queries("corpus_split_leakage")(spark, dir).collect()
      .map(r => ((r.getAs[String]("split_lo"), r.getAs[String]("split_hi")),
        (r.getAs[Long]("n_leaks"), r.getAs[Long]("max_jaccard_x1000")))).toMap
    val split = graft.corpus.Sampling
      .splitAssign(spark.read.parquet(s"$dir/documents.parquet"), "split", 900, 50)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val pairs = graft.dedup.Dedup
      .minhashLshPairsFromSets(
        graft.dedup.Dedup.shingleSets(spark.read.parquet(s"$dir/documents.parquet")),
        thresholdX1000 = 300)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("jaccard_x1000")))
    val want = pairs
      .map { case (a, b, j) => (split(a), split(b), j) }
      .filter { case (sa, sb, _) => sa != sb }
      .groupBy { case (sa, sb, _) => if (sa < sb) (sa, sb) else (sb, sa) }
      .map { case (k, vs) => k -> ((vs.length.toLong, vs.map(_._3).max)) }
    assert(got == want)
    got.foreach { case ((lo, hi), (n, mx)) =>
      assert(lo < hi && n >= 1L && mx >= 300L)
    }
  }
}
