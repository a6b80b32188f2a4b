package graft.log

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The co-located-join contract: two tables bucketed on the same key with
 * the same bucket count must join AND aggregate with zero exchanges —
 * the layout a 100 TB deployment gives its (log ⋈ per-stream state)
 * hot path. Broadcast is disabled inside the join test so the assert
 * exercises the bucketed sort-merge path, not a small-table shortcut.
 */
class BucketedLogSpec extends SparkSpec {

  private val N = 8

  private lazy val tables: Unit = {
    val ev = Fixture.events(spark, "/root/testdata/sf0.001")
    BucketedLog.save(ev, "ev_bucketed", "stream", N, sortCols = Seq("stream", "position"))
    val snap = ev.groupBy(col("stream"))
      .agg(max(col("revision")).as("max_rev"), count(lit(1)).as("n"))
    BucketedLog.save(snap, "snap_bucketed", "stream", N)
  }

  test("bucketed log joins its bucketed snapshot with zero exchanges") {
    tables
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // >= (not ===) so the predicate stays a join FILTER: an equality
      // would be folded into the join keys as (stream, revision) and the
      // stream-only bucket distribution could no longer serve the join
      val j = BucketedLog.open(spark, "ev_bucketed")
        .join(BucketedLog.open(spark, "snap_bucketed"), "stream")
        .filter(col("revision") >= col("max_rev"))
        .select(col("stream"), col("position"), col("n"))
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"co-located join must not shuffle either side:\n$plan")
      // and it still computes the right thing: one latest row per stream
      assert(j.count() == BucketedLog.open(spark, "snap_bucketed").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("per-stream aggregation over the bucketed log skips its shuffle") {
    tables
    val agg = BucketedLog.open(spark, "ev_bucketed")
      .groupBy(col("stream")).agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed distribution must satisfy the aggregation:\n$plan")
    val direct = Fixture.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("stream")).agg(count(lit(1)).as("n"))
    assert(agg.orderBy("stream").collect().toSeq ==
      direct.orderBy("stream").collect().toSeq)
  }

  test("incremental append preserves bucketing: joins stay exchange-free, content complete") {
    tables
    val ev = Fixture.events(spark, "/root/testdata/sf0.001")
    BucketedLog.save(ev.filter(col("position") % 2 === 0), "ev_incr", "stream", N)
    // append the second half through the bucketed-insert path — each
    // batch shuffles into the SAME bucket layout, so the catalog's
    // distribution claim stays true as the table grows
    ev.filter(col("position") % 2 === 1)
      .write.mode("append").format("parquet").insertInto("ev_incr")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = BucketedLog.open(spark, "ev_incr")
        .join(BucketedLog.open(spark, "snap_bucketed"), "stream")
        .filter(col("revision") >= col("max_rev"))
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"appended bucketed table must still join shuffle-free:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(BucketedLog.open(spark, "ev_incr").count() == ev.count())
  }

  test("bucketed content is bit-identical to the source log") {
    tables
    val a = BucketedLog.open(spark, "ev_bucketed")
      .select("position", "stream", "revision", "event_type")
      .orderBy("position").collect().toSeq
    val b = Fixture.events(spark, "/root/testdata/sf0.001")
      .select("position", "stream", "revision", "event_type")
      .orderBy("position").collect().toSeq
    assert(a == b)
  }
}
