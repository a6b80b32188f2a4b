package graft.log

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.model._
import graft.streaming.StreamingSpecHelpers

/**
 * Read-path semantics ported from the reference's integration tests
 * (`/root/reference/internal/streams/streams_test.go:228-480`, FIXTURES.md
 * §A2), plus plan-quality assertions: on a canonical log with STORED
 * revision/position columns (the real deployment shape — ingest-assigned
 * by graft.append), every read predicate must reach the parquet scan.
 */
class EventLogSpec extends SparkSpec {

  // --- fixtures -----------------------------------------------------------
  private lazy val oneStreamLog: DataFrame = {
    import spark.implicits._
    // 1 stream × 100 events (streams_test.go:228-303)
    (0L until 100L).map(i => ("test-stream", s"u$i", "event-type", i, i + 1))
      .toDF("stream", "uuid", "event_type", "revision", "position")
  }

  private lazy val manyStreamsLog: DataFrame = {
    import spark.implicits._
    // 100 streams × 1 event (streams_test.go:305-364); types type-0..99
    (0L until 100L).map(i => (s"stream-$i", s"u$i", s"type-$i", 0L, i + 1))
      .toDF("stream", "uuid", "event_type", "revision", "position")
  }

  private def revs(df: DataFrame): Seq[Long] =
    df.select("revision").collect().map(_.getLong(0)).toSeq
  private def poss(df: DataFrame): Seq[Long] =
    df.select("position").collect().map(_.getLong(0)).toSeq

  // --- single-stream reads (streams_test.go:228-303) ----------------------
  test("forwards from start / from revision / degenerate from end") {
    assert(revs(EventLog.read(oneStreamLog,
      ReadOptions(OneStream("test-stream"), Forwards, FromStart, Some(10)))) == (0L to 9L))
    assert(revs(EventLog.read(oneStreamLog,
      ReadOptions(OneStream("test-stream"), Forwards, From(50), Some(10)))) == (50L to 59L))
    // forwards-from-end degenerates to the single LAST event (backend.go:135-143)
    assert(revs(EventLog.read(oneStreamLog,
      ReadOptions(OneStream("test-stream"), Forwards, FromEnd, Some(10)))) == Seq(99L))
  }

  test("backwards from start / from revision / from end (streams_test.go:270-303)") {
    // backwards-from-start degenerates to the single FIRST event
    assert(revs(EventLog.read(oneStreamLog,
      ReadOptions(OneStream("test-stream"), Backwards, FromStart, Some(10)))) == Seq(0L))
    assert(revs(EventLog.read(oneStreamLog,
      ReadOptions(OneStream("test-stream"), Backwards, From(50), Some(10)))) == (50L to 41L by -1L))
    assert(revs(EventLog.read(oneStreamLog,
      ReadOptions(OneStream("test-stream"), Backwards, FromEnd, Some(10)))) == (99L to 90L by -1L))
  }

  test("$all reads order by position (streams_test.go:305-364)") {
    assert(poss(EventLog.read(manyStreamsLog,
      ReadOptions(AllStreams, Forwards, FromStart, Some(10)))) == (1L to 10L))
    assert(poss(EventLog.read(manyStreamsLog,
      ReadOptions(AllStreams, Backwards, FromEnd, Some(10)))) == (100L to 91L by -1L))
    assert(poss(EventLog.read(manyStreamsLog,
      ReadOptions(AllStreams, Forwards, From(51), Some(10)))) == (51L to 60L))
    assert(poss(EventLog.read(manyStreamsLog,
      ReadOptions(AllStreams, Backwards, From(50), Some(10)))) == (50L to 41L by -1L))
  }

  // --- filters (streams_test.go:366-480) -----------------------------------
  test("prefix filter on event type: {type-0, type-1, type-5} matches 23 of 100") {
    val got = EventLog.read(manyStreamsLog,
      ReadOptions(AllStreams, Forwards, FromStart,
        filter = Some(PrefixFilter(OnEventType, Seq("type-0", "type-1", "type-5")))))
    // type-0, type-1, type-5, type-1x (10), type-5x (10) = 23 (test pins 23)
    assert(got.count() == 23L)
  }

  test("regex filter exact-match alternation: 3 of 100; same on stream ids") {
    assert(EventLog.read(manyStreamsLog,
      ReadOptions(AllStreams, Forwards, FromStart,
        filter = Some(RegexFilter(OnEventType, "^(type-0|type-1|type-2)$")))).count() == 3L)
    assert(EventLog.read(manyStreamsLog,
      ReadOptions(AllStreams, Forwards, FromStart,
        filter = Some(PrefixFilter(OnStreamId, Seq("stream-9"))))).count() == 11L)
  }

  // --- plan quality on a stored-column parquet log -------------------------
  test("predicates are pushed into the parquet scan; top-k plan is TakeOrderedAndProject") {
    val dir = Files.createTempDirectory("graft-planlog").toString
    StreamingSpecHelpers.writeCanonical(spark, dir,
      (1L to 1000L).map(p => (s"s-${p % 7}", s"u$p", s"t-${p % 5}", p / 7, p)))
    val log = spark.read.parquet(dir)

    val q = EventLog.read(log,
      ReadOptions(AllStreams, Forwards, From(500), Some(10),
        filter = Some(PrefixFilter(OnEventType, Seq("t-1", "t-3")))))
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k fusion in:\n$plan")
    assert(plan.contains("StringStartsWith(event_type,t-1"), s"prefix not pushed in:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(position,500"), s"range not pushed in:\n$plan")

    val q2 = EventLog.read(log, ReadOptions(OneStream("s-3"), Forwards, From(5), Some(10)))
    val plan2 = q2.queryExecution.executedPlan.toString()
    assert(plan2.contains("EqualTo(stream,s-3"), s"stream equality not pushed in:\n$plan2")

    // column pruning: selecting 2 columns must prune the scan schema
    val pruned = q2.select("position", "revision").queryExecution.executedPlan.toString()
    assert(!pruned.contains("uuid"), s"scan schema not pruned in:\n$pruned")
  }

  test("format independence: same read semantics over a JSON-lines log") {
    // the read path takes any DataFrame with the canonical columns — the
    // storage format is the caller's choice (parquet is the deployment
    // default; JSON here proves nothing in the operator stack assumes it)
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonlog").toString
    (1L to 100L).map(p => (s"s-${p % 4}", s"u$p", s"t-${p % 3}", (p - 1) / 4, p))
      .toDF("stream", "uuid", "event_type", "revision", "position")
      .write.mode("overwrite").json(dir)
    val log = spark.read.schema(
      "stream string, uuid string, event_type string, revision long, position long").json(dir)
    val fwd = EventLog.read(log, ReadOptions(OneStream("s-1"), Forwards, From(3), Some(5)))
    assert(revs(fwd) == (3L to 7L))
    val filtered = EventLog.read(log,
      ReadOptions(AllStreams, Forwards, FromStart, Some(1000),
        filter = Some(PrefixFilter(OnEventType, Seq("t-1")))))
    assert(filtered.count() == 34) // p%3==1 for p in 1..100
  }
}
