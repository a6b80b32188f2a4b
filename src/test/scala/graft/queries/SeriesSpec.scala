package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Semantics pins for the series/planner pack (the DuckDB oracle pins
 * exact values at sf0.01; these pin the structural invariants).
 */
class SeriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ts_gapfill: per-stream days are contiguous and LOCF leaves no nulls") {
    val rows = SeriesQueries.queries("ts_gapfill")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("stream")).foreach { case (st, rs) =>
      val days = rs.map(_.getAs[Long]("day")).sorted
      assert(days.head + days.length - 1 == days.last,
        s"$st: resampled days must be gap-free: ${days.toSeq}")
      assert(rs.forall(!_.isNullAt(2)), s"$st: LOCF must fill every day")
    }
    // a filled (unobserved) day carries the previous day's value
    val byKey = rows.map(r => (r.getAs[String]("stream"), r.getAs[Long]("day")) -> r).toMap
    rows.filter(_.getAs[Long]("observed") == 0L).foreach { r =>
      val prev = byKey((r.getAs[String]("stream"), r.getAs[Long]("day") - 1))
      assert(r.getAs[Long]("v_x1000") == prev.getAs[Long]("v_x1000"),
        s"filled day must carry forward: $r vs $prev")
    }
  }

  test("anomaly_cusum: sequential fold equals the prefix-min window identity") {
    import org.apache.spark.sql.expressions.Window
    // the fold: s_i = max(0, s_{i-1} + d_i), emitted while s > 150
    val fold = ProjectionQueries.queries("anomaly_cusum")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fold.nonEmpty, "fixture must contain drift excursions")
    // the window identity: s_i = P_i - min(0, min_{j<=i} P_j)
    val w = Window.partitionBy("stream").orderBy("position")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val win = graft.log.Fixture.events(spark, dir)
      .withColumn("d",
        coalesce(regexp_extract(col("props").cast("string"),
          "\"k\"\\s*:\\s*(-?\\d+)", 1).cast("long"), lit(0L)) - 55L)
      .withColumn("pf", sum(col("d")).over(w))
      .withColumn("cusum", col("pf") - least(lit(0L), min(col("pf")).over(w)))
      .filter(col("cusum") > 150L)
      .select(col("stream"), col("position").cast("long"), col("cusum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fold == win, "fold and window forms must agree row-for-row")
  }

  test("backfill_shards: shards partition the log into balanced disjoint ranges") {
    val rows = SeriesQueries.queries("backfill_shards")(spark, dir).collect()
    val total = graft.log.Fixture.events(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total, "shards must cover every event")
    val sorted = rows.sortBy(_.getAs[Long]("shard"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_pos") < b.getAs[Long]("min_pos"),
          s"shard ranges must be disjoint and ordered: $a / $b")
      case _ =>
    }
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.max - ns.min <= math.max(2L, total / 50),
      s"count-balanced shards expected, got ${ns.toSeq}")
  }

  test("agg_histogram: bins in [0,9] and counts cover every event") {
    val rows = SeriesQueries.queries("agg_histogram")(spark, dir).collect()
    val total = graft.log.Fixture.events(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bin"); b >= 0L && b <= 9L
    })
  }

  test("agg_activity_deciles: deciles ordered by volume, streams fully covered") {
    val rows = SeriesQueries.queries("agg_activity_deciles")(spark, dir).collect()
    val nStreams = graft.log.Fixture.events(spark, dir)
      .select(col("stream")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_streams")).sum == nStreams)
    val sorted = rows.sortBy(_.getAs[Long]("decile"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_n") <= b.getAs[Long]("min_n"),
          s"decile volume ranges must be non-decreasing: $a / $b")
      case _ =>
    }
  }

  test("agg_path_signature: path order equals the per-stream position order") {
    val rows = SeriesQueries.queries("agg_path_signature")(spark, dir).collect()
    assert(rows.nonEmpty)
    val ev = graft.log.Fixture.events(spark, dir)
      .filter(col("revision") < 10)
      .select("stream", "position", "event_type")
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val want = ev(r.getString(0)).sortBy(_.getLong(1)).map(_.getString(2)).mkString("->")
      assert(r.getAs[String]("path") == want, s"path mismatch for ${r.getString(0)}")
      assert(r.getAs[Long]("n") == ev(r.getString(0)).length)
    }
  }

  test("graph_pagerank: one rank per node, mass bounded by damping") {
    val rows = SeriesQueries.queries("graph_pagerank")(spark, dir).collect()
    assert(rows.map(_.getAs[String]("node")).distinct.length == rows.length)
    val ranks = rows.map(_.getAs[Long]("rank"))
    assert(ranks.forall(_ >= 30000L), "every node keeps the teleport mass")
    // total mass never exceeds the initial 1e6 (integer division only leaks)
    assert(ranks.sum <= 1000000L, s"mass must not be created: ${ranks.sum}")
    // deterministic: a second construction yields identical ranks
    val again = SeriesQueries.queries("graph_pagerank")(spark, dir).collect()
    assert(again.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      rows.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }
}
