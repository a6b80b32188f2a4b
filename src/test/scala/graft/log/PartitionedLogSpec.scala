package graft.log

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._

class PartitionedLogSpec extends SparkSpec {

  private val N = 8

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-plog").toString
    PartitionedLog.write(Fixture.events(spark, "/root/testdata/sf0.001"), d, nBuckets = N)
    d
  }

  test("single-stream read prunes to the stream's bucket at planning time") {
    val q = PartitionedLog.read(spark, dir,
      ReadOptions(OneStream("user-3"), Forwards, From(0)), nBuckets = N)
    val plan = q.queryExecution.executedPlan.toString()
    // directory pruning is visible in the scan: PartitionFilters on bucket
    assert(plan.contains("PartitionFilters"), plan)
    // attribute ids vary: match `bucket#<id> = <expected>`
    val expect = s"bucket#\\d+ = ${PartitionedLog.bucketOf("user-3", N)}".r
    assert(expect.findFirstIn(plan).isDefined, plan)
  }

  test("partitioned reads return exactly the unpartitioned results") {
    val base = Fixture.events(spark, "/root/testdata/sf0.001")
    for (opts <- Seq(
        ReadOptions(OneStream("user-3"), Forwards, From(0)),
        ReadOptions(OneStream("user-7"), Backwards, FromEnd, count = Some(5)),
        ReadOptions(AllStreams, Forwards, From(10), count = Some(20),
          filter = Some(PrefixFilter(OnEventType, Seq("cl")))))) {
      val want = EventLog.read(base, opts)
        .select("position", "stream", "revision").collect().toSeq
      val got = PartitionedLog.read(spark, dir, opts, nBuckets = N)
        .select("position", "stream", "revision").collect().toSeq
      assert(got == want, s"mismatch for $opts")
    }
  }

  test("buckets cover all streams; each stream lives in exactly one bucket") {
    val df = PartitionedLog.open(spark, dir)
    assert(df.count() == Fixture.events(spark, "/root/testdata/sf0.001").count())
    val multi = df.groupBy("stream").agg(countDistinct(col("bucket")).as("nb"))
      .filter(col("nb") =!= 1)
    assert(multi.count() == 0)
  }
}
