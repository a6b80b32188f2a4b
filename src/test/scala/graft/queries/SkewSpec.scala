package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Runtime skew handling: `agg_salted_skew` is the COMPILE-TIME rewrite
 * for a known-hot aggregation key; AQE's skew-join split is the RUNTIME
 * answer when the hot key is only discovered mid-job — at 100 TB both
 * are in play. This spec manufactures a pathologically skewed join
 * (≈90% of the log on one key) with thresholds scaled to fixture size,
 * and pins that (a) AQE actually splits the skewed partition —
 * `skew=true` in the final adaptive plan — and (b) the split changes no
 * results vs the unsplit plan.
 */
class SkewSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def skewed = {
    val ev = graft.log.Fixture.events(spark, dir)
    // ~90% of events collapse onto one hot join key. The round-robin
    // repartition gives the join shuffle MULTIPLE mappers — AQE's split
    // unit is one mapper's output per reducer, so a single-mapper
    // fixture could never be split no matter how skewed (at cluster
    // scale the mappers are the thousands of upstream tasks).
    ev.repartition(12)
      .select(
        when(pmod(col("position"), lit(10L)) < 9, lit("hot"))
          .otherwise(col("stream")).as("k"),
        col("position"), col("event_type"))
  }

  private def dim = {
    val ev = graft.log.Fixture.events(spark, dir)
    ev.select(col("stream").as("k")).distinct()
      .union(spark.range(1).select(lit("hot").as("k")))
      .withColumn("tag", length(col("k")).cast("long"))
  }

  test("AQE splits the skewed join partition and preserves results") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fixture-scale thresholds: any partition beyond ~2 KB of
      // (compressed) shuffle bytes counts as skewed (production
      // defaults are 256 MB — same mechanism, same code path)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2048",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2048",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // a global aggregate imposes NO distribution requirement on the
      // join output, so AQE is free to split the skewed partition (a
      // per-key groupBy directly above the join would pin the
      // partitioning and suppress the split — that shape is what the
      // salted rewrite is for)
      val j = skewed.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(col("tag")).as("st"), sum(col("position")).as("sp"))
      val got = j.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
      // the FINAL adaptive plan (post-execution) must show the skew split
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join side:\n$plan")

      // same numbers with skew handling off
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val want = skewed.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(col("tag")).as("st"), sum(col("position")).as("sp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
      assert(got == want)
      // and the hot key really dominates — the scenario is the real one
      val counts = skewed.groupBy("k").count().collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val hot = counts.find(_._1 == "hot").get._2
      assert(hot > counts.filter(_._1 != "hot").map(_._2).sum)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
