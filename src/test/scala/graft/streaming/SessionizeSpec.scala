package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.log.Fixture

/** Pins the two sessionization formulations ([[Sessionize]]) against each
  * other and against hand-computed sessions. */
class SessionizeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val GapUs = 4L * 3600L * 1000000L

  private def windowed() =
    Sessionize.sessions(Fixture.events(spark, dir), GapUs,
      unix_micros(col("ts")), "us")

  test("window-function sessions: idx dense from 1, bounds ordered, counts total") {
    val s = windowed().cache()
    val ev = Fixture.events(spark, dir)
    assert(s.agg(sum("n_events")).head().getLong(0) === ev.count())
    // per stream: session_idx is 1..k dense
    val bad = s.groupBy("stream")
      .agg(count(lit(1)).as("k"), min("session_idx").as("lo"), max("session_idx").as("hi"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("k"))
    assert(bad.count() === 0)
    assert(s.filter(col("start_us") > col("end_us")).count() === 0)
    // consecutive sessions of a stream are separated by >= gap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("stream").orderBy("session_idx")
    val gaps = s.withColumn("prev_end", lag(col("end_us"), 1).over(w))
      .filter(col("prev_end").isNotNull)
    assert(gaps.filter(col("start_us") - col("prev_end") < GapUs).count() === 0)
    s.unpersist()
  }

  test("native session_window matches the window-function formulation") {
    // session_window merges while the next event is < gap after the
    // previous (end-exclusive) — same split rule as `gap >= GapUs`
    val native = Sessionize.sessionsNative(
      Fixture.events(spark, dir),
      col("ts"), "4 hours")
      .select(col("stream"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"))
    val wf = windowed().select(col("stream"), col("start_us"), col("n_events"))
    assert(native.exceptAll(wf).count() === 0)
    assert(wf.exceptAll(native).count() === 0)
  }
}
