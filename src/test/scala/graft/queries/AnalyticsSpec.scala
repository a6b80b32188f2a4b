package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Semantics pins for the round-4 analytics pack (the DuckDB oracle pins
 * exact values at sf0.01; these pin the invariants and the arithmetic
 * the oracle can't state directly).
 */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("funnel_steps: step positions strictly increase and agree with steps_completed") {
    val rows = AnalyticsQueries.queries("funnel_steps")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ps = Seq("p1", "p2", "p3", "p4").map(c => r.getAs[Long](c))
      val steps = r.getAs[Long]("steps_completed")
      // completed prefix: exactly the first `steps` positions are set,
      // and they strictly increase (each step strictly after the last)
      assert(ps.takeWhile(_ >= 0).size == steps, s"prefix/steps mismatch: $r")
      assert(ps.drop(steps.toInt).forall(_ == -1L), s"non-prefix completion: $r")
      val done = ps.take(steps.toInt)
      assert(done == done.sorted && done.distinct.size == done.size,
        s"step positions must strictly increase: $r")
    }
  }

  test("agg_ewma: integer-halving fold arithmetic (hand-computed)") {
    // v = [100, 51, 7]: e0=100; e1=floor(151/2)=75; e2=floor(82/2)=41
    val got = spark.sql(
      """SELECT aggregate(
        |  array(named_struct('position', 1L, 'v', 100L),
        |        named_struct('position', 2L, 'v', 51L),
        |        named_struct('position', 3L, 'v', 7L)),
        |  CAST(NULL AS BIGINT),
        |  (acc, x) -> CASE WHEN acc IS NULL THEN x.v
        |              ELSE CAST(floor((acc + x.v) / 2.0) AS BIGINT) END) AS e""".stripMargin)
      .head().getLong(0)
    assert(got == 41L)
  }

  test("agg_ewma: one row per stream, ewma bounded by the stream's value range") {
    val ew = AnalyticsQueries.queries("agg_ewma")(spark, dir)
    val bounds = graft.log.Fixture.events(spark, dir)
      .select(col("stream"), floor(col("value") * lit(1000.0)).cast("long").as("v"))
      .groupBy("stream").agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("cnt"))
    val joined = ew.join(bounds, "stream").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getAs[Long]("ewma_x1000")
      assert(e >= r.getAs[Long]("lo") && e <= r.getAs[Long]("hi"), s"ewma out of range: $r")
      assert(r.getAs[Long]("n") == r.getAs[Long]("cnt"), s"n mismatch: $r")
    }
  }

  test("agg_salted_skew: two-stage salted aggregation equals the direct form") {
    val salted = AnalyticsQueries.queries("agg_salted_skew")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val direct = graft.log.Fixture.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * lit(1000.0)).cast("long")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(salted.sameElements(direct))
  }

  test("markov_transitions: permille rows sum to ~1000 per from_type (floor loss only)") {
    val rows = AnalyticsQueries.queries("markov_transitions")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rs) =>
      val s = rs.map(_.getAs[Long]("permille")).sum
      assert(s <= 1000 && s > 1000 - rs.length, s"permille sum $s for $ft")
    }
  }

  test("zorder_keys: 4+4-bit interleave is a bijection into 0..255") {
    val rows = AnalyticsQueries.queries("zorder_keys")(spark, dir).collect()
    val zs = rows.map(_.getAs[Long]("z"))
    assert(zs.forall(z => z >= 0 && z <= 255))
    assert(zs.distinct.length == rows.map(r =>
      (r.getAs[Long]("ubucket"), r.getAs[Long]("tbucket"))).distinct.length)
  }

  test("agg_pivot: per-type columns sum to n_total, totals sum to the log size") {
    val rows = AnalyticsQueries.queries("agg_pivot")(spark, dir).collect()
    rows.foreach { r =>
      val parts = Seq("n_click", "n_error", "n_purchase", "n_signup", "n_view")
        .map(c => r.getAs[Long](c)).sum
      assert(parts == r.getAs[Long]("n_total"), s"pivot parts != total: $r")
    }
    val total = rows.map(_.getAs[Long]("n_total")).sum
    assert(total == graft.log.Fixture.events(spark, dir).count())
  }

  test("retention_cohorts: offset-0 cell is each cohort's maximum (full cohort active)") {
    val rows = AnalyticsQueries.queries("retention_cohorts")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort_wk")).foreach { case (_, rs) =>
      val byOffset = rs.map(r => r.getAs[Long]("week_offset") -> r.getAs[Long]("n_active")).toMap
      assert(byOffset.contains(0L), "cohort without its defining week")
      assert(byOffset.values.forall(_ <= byOffset(0L)),
        s"offset-0 must dominate: $byOffset")
    }
  }

  test("anomaly_mad: outlier count bounded and max_d2 consistent") {
    val rows = AnalyticsQueries.queries("anomaly_mad")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("max_d2") >= 0L)
    }
  }

  test("agg_sketch_union: unioned daily sketches land within tolerance") {
    val Row(check: String, groups: Long, ok: Long) =
      AnalyticsQueries.queries("agg_sketch_union")(spark, dir).head()
    assert(check == "hll_daily_union" && groups == 1L && ok == 1L)
  }

  test("dedup_incremental: matches pair batch docs against corpus docs only") {
    val rows = DedupQueries.queries("dedup_incremental")(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 10 == 0, s"non-batch doc in output: $r")
      assert(r.getAs[Long]("first_match") % 10 != 0, s"batch doc as match: $r")
      assert(r.getAs[Long]("best_jaccard_x1000") >= 300L)
      assert(r.getAs[Long]("n_matches") >= 1L)
    }
  }
}
