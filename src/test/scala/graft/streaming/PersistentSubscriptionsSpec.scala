package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.{PersistentSubscriptions => PS}

/**
 * Consumer-group semantics per the reference's declared (never-registered)
 * persistent-subscriptions proto (`persistent.proto:8-17,53-62,174-178`).
 */
class PersistentSubscriptionsSpec extends SparkSpec {

  private def log(n: Int) = {
    import spark.implicits._
    (1 to n).map(p => EvRow(s"s-${p % 3}", s"u-$p", "t", "{}",
      Map.empty[String, String], p / 3L, p.toLong)).toDF()
  }

  private def positions(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("position").collect().map(_.getLong(0)).toSeq

  test("create/read/ack: progress is server-side; acked events are not redelivered") {
    val dir = Files.createTempDirectory("graft-ps").toString
    val l = log(10)
    PS.create(spark, dir, "g", stream = None, fromPosition = 3L,
      strategy = PS.DispatchToSingle, nowNanos = 1L)
    intercept[IllegalArgumentException](PS.create(spark, dir, "g", None)) // exists
    assert(PS.groupInfo(spark, dir, "g").contains((None, 3L, PS.DispatchToSingle)))

    val first = positions(PS.read(spark, dir, l, "g", "c1", maxCount = 4))
    assert(first == Seq(3L, 4L, 5L, 6L)) // from start position, in order
    PS.ack(spark, dir, "g", "c1", Seq(3L, 4L), nowNanos = 2L)
    val next = positions(PS.read(spark, dir, l, "g", "c1", maxCount = 4))
    assert(next == Seq(5L, 6L, 7L, 8L)) // acked gone, backlog advances
  }

  test("nack actions: park dead-letters until replay, skip completes, retry redelivers") {
    val dir = Files.createTempDirectory("graft-ps2").toString
    val l = log(6)
    PS.create(spark, dir, "g", None, strategy = PS.DispatchToSingle, nowNanos = 1L)
    PS.nack(spark, dir, "g", "c1", Seq(1L), PS.Park, nowNanos = 2L)
    PS.nack(spark, dir, "g", "c1", Seq(2L), PS.Skip, nowNanos = 2L)
    PS.nack(spark, dir, "g", "c1", Seq(3L), PS.Retry, nowNanos = 2L)
    assert(positions(PS.read(spark, dir, l, "g", "c1", 10)) == Seq(3L, 4L, 5L, 6L))
    assert(positions(PS.parked(spark, dir, l, "g")) == Seq(1L))
    PS.replayParked(spark, dir, "g", nowNanos = 3L)
    assert(positions(PS.read(spark, dir, l, "g", "c1", 10)) == Seq(1L, 3L, 4L, 5L, 6L))
    assert(positions(PS.parked(spark, dir, l, "g")).isEmpty)
  }

  test("strategies: DispatchToSingle starves the second consumer; RoundRobin rotates; Pinned keeps per-stream affinity and order") {
    val dir = Files.createTempDirectory("graft-ps3").toString
    val l = log(12)
    PS.create(spark, dir, "single", None, strategy = PS.DispatchToSingle, nowNanos = 1L)
    PS.join(spark, dir, "single", "c1", nowNanos = 2L)
    PS.join(spark, dir, "single", "c2", nowNanos = 3L)
    assert(positions(PS.read(spark, dir, l, "single", "c1", 5)) == (1L to 5L))
    assert(positions(PS.read(spark, dir, l, "single", "c2", 5)).isEmpty)

    PS.create(spark, dir, "rr", None, strategy = PS.RoundRobin, nowNanos = 4L)
    PS.join(spark, dir, "rr", "c1", nowNanos = 5L)
    PS.join(spark, dir, "rr", "c2", nowNanos = 6L)
    assert(positions(PS.read(spark, dir, l, "rr", "c1", 10)) == (1L to 11L by 2))
    assert(positions(PS.read(spark, dir, l, "rr", "c2", 10)) == (2L to 12L by 2))

    PS.create(spark, dir, "pin", None, strategy = PS.Pinned, nowNanos = 7L)
    PS.join(spark, dir, "pin", "c1", nowNanos = 8L)
    PS.join(spark, dir, "pin", "c2", nowNanos = 9L)
    val p1 = PS.read(spark, dir, l, "pin", "c1", 12)
      .select("stream", "position").collect().map(r => (r.getString(0), r.getLong(1)))
    val p2 = PS.read(spark, dir, l, "pin", "c2", 12)
      .select("stream", "position").collect().map(r => (r.getString(0), r.getLong(1)))
    // disjoint cover of all 12 events
    assert((p1.map(_._2) ++ p2.map(_._2)).sorted.toSeq == (1L to 12L))
    // whole streams stick to one consumer
    assert(p1.map(_._1).toSet.intersect(p2.map(_._1).toSet).isEmpty)
    // per-stream order preserved within a consumer
    assert(p1.map(_._2).toSeq == p1.map(_._2).sorted.toSeq)
  }

  test("group lifecycle: delete removes, stream-scoped group filters the log") {
    val dir = Files.createTempDirectory("graft-ps4").toString
    val l = log(9)
    PS.create(spark, dir, "g", Some("s-1"), nowNanos = 1L)
    val got = PS.read(spark, dir, l, "g", "c", 10)
    assert(got.select("stream").collect().forall(_.getString(0) == "s-1"))
    assert(positions(got) == Seq(1L, 4L, 7L))
    PS.delete(spark, dir, "g", nowNanos = 2L)
    assert(PS.groupInfo(spark, dir, "g").isEmpty)
    intercept[NoSuchElementException](PS.read(spark, dir, l, "g", "c", 1).collect())
  }

  test("ack deadline: delivered events are leased, redelivered after expiry, acks stick") {
    val dir = Files.createTempDirectory("graft-ps6").toString
    val l = log(6)
    val timeout = 100L
    PS.create(spark, dir, "g", None, strategy = PS.DispatchToSingle,
      messageTimeoutNanos = Some(timeout), nowNanos = 1L)
    // c1 reads 3 → they are in-flight: an immediate re-read sees the rest
    val first = positions(PS.read(spark, dir, l, "g", "c1", 3, nowNanos = 10L))
    assert(first == Seq(1L, 2L, 3L))
    assert(positions(PS.read(spark, dir, l, "g", "c1", 10, nowNanos = 20L)) == Seq(4L, 5L, 6L))
    // past the deadline the unacked leases expire → 1..3 deliverable again
    PS.ack(spark, dir, "g", "c1", Seq(2L), nowNanos = 30L)
    val redelivered = positions(PS.read(spark, dir, l, "g", "c1", 10, nowNanos = 10L + timeout + 1))
    assert(redelivered == Seq(1L, 3L)) // 2 acked; 4..6 still leased (read at t=20)
    // lease is per-delivery: the redelivery itself re-leases 1 and 3
    assert(positions(PS.read(spark, dir, l, "g", "c1", 10, nowNanos = 10L + timeout + 2)).isEmpty)
  }

  test("compact: checkpoint + pruned ops preserve read/parked semantics and shrink the log") {
    val dir = Files.createTempDirectory("graft-ps7").toString
    val l = log(12)
    PS.create(spark, dir, "g", None, strategy = PS.DispatchToSingle, nowNanos = 1L)
    PS.create(spark, dir, "other", None, strategy = PS.DispatchToSingle, nowNanos = 1L)
    PS.ack(spark, dir, "other", "oc", Seq(1L, 2L), nowNanos = 2L)
    // history: 1-4 acked (2 twice), 5 parked, 6 skipped, 7 retried after park, 8 acked
    PS.ack(spark, dir, "g", "c1", Seq(1L, 2L, 3L, 4L), nowNanos = 3L)
    PS.ack(spark, dir, "g", "c1", Seq(2L), nowNanos = 4L)
    PS.nack(spark, dir, "g", "c1", Seq(5L), PS.Park, nowNanos = 5L)
    PS.nack(spark, dir, "g", "c1", Seq(6L), PS.Skip, nowNanos = 6L)
    PS.nack(spark, dir, "g", "c1", Seq(7L), PS.Park, nowNanos = 7L)
    PS.nack(spark, dir, "g", "c1", Seq(7L), PS.Retry, nowNanos = 8L)
    PS.ack(spark, dir, "g", "c1", Seq(8L), nowNanos = 9L)

    val before = positions(PS.read(spark, dir, l, "g", "c1", 20))
    val parkedBefore = positions(PS.parked(spark, dir, l, "g"))
    val rawBefore = spark.read.parquet(s"$dir/ops").count()

    PS.compact(spark, dir, l, "g", nowNanos = 100L)

    // identical observable state
    assert(positions(PS.read(spark, dir, l, "g", "c1", 20)) == before)
    assert(positions(PS.parked(spark, dir, l, "g")) == parkedBefore)
    assert(before == Seq(7L, 9L, 10L, 11L, 12L))
    assert(parkedBefore == Seq(5L))
    // history collapsed: ckpt at 4 (5 parked blocks it), parked row for 5,
    // retried row for 7 dropped (deliverable is the default state)
    val ops = spark.read.parquet(s"$dir/ops")
      .filter(org.apache.spark.sql.functions.col("group") === "g")
    assert(ops.filter(org.apache.spark.sql.functions.col("op") === "ckpt")
      .select("position").collect().map(_.getLong(0)).toSeq == Seq(4L))
    assert(spark.read.parquet(s"$dir/ops").count() < rawBefore)
    // the other group is untouched
    assert(positions(PS.read(spark, dir, l, "other", "oc", 20)) == (3L to 12L))

    // acking past the parked row then recompacting advances the checkpoint
    PS.replayParked(spark, dir, "g", nowNanos = 101L)
    PS.ack(spark, dir, "g", "c1", Seq(5L, 7L), nowNanos = 102L)
    PS.compact(spark, dir, l, "g", nowNanos = 103L)
    val ops2 = spark.read.parquet(s"$dir/ops")
      .filter(org.apache.spark.sql.functions.col("group") === "g")
    assert(ops2.filter(org.apache.spark.sql.functions.col("op") === "ckpt")
      .select("position").collect().map(_.getLong(0)).max == 8L)
    assert(positions(PS.read(spark, dir, l, "g", "c1", 20)) == Seq(9L, 10L, 11L, 12L))
  }

  test("recreating a deleted group starts a fresh incarnation: no inherited acks or consumers") {
    val dir = Files.createTempDirectory("graft-ps5").toString
    val l = log(6)
    PS.create(spark, dir, "g", None, strategy = PS.DispatchToSingle, nowNanos = 1L)
    PS.join(spark, dir, "g", "old-consumer", nowNanos = 2L)
    PS.ack(spark, dir, "g", "old-consumer", Seq(1L, 2L, 3L), nowNanos = 3L)
    assert(positions(PS.read(spark, dir, l, "g", "old-consumer", 10)) == Seq(4L, 5L, 6L))
    PS.delete(spark, dir, "g", nowNanos = 4L)
    // same name, new incarnation: old acks must not suppress delivery and
    // old consumers must not occupy routing slots
    PS.create(spark, dir, "g", None, strategy = PS.DispatchToSingle, nowNanos = 5L)
    assert(PS.consumers(spark, dir, "g").isEmpty)
    PS.join(spark, dir, "g", "new-consumer", nowNanos = 6L)
    assert(PS.consumers(spark, dir, "g") == Seq("new-consumer"))
    assert(positions(PS.read(spark, dir, l, "g", "new-consumer", 10)) == (1L to 6L))
  }
}
