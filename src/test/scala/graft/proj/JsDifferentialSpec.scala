package graft.proj

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}

import graft.SparkSpec
import JsProjection.JsVal

/**
 * DIFFERENTIAL fuzz: for every generated valid restricted-JS program, the
 * single-threaded reference fold ([[LocalRunner]], the reference's
 * in-memory Update loop) and the distributed execution
 * ([[ProjectionBatch]]: selector filter → key shuffle → secondary sort →
 * streaming fold) must agree on
 *
 *  - the FINAL STATE of every partition key (`finalStates`), and
 *  - the last EMITTED state per key under filterBy gating (`lastEmitted`),
 *
 * over a randomized event log fed to Spark in shuffled row order across
 * several input partitions — so partition interleavings, the repartition
 * shuffle, and the within-partition sort are all exercised. This is the
 * semantic property the grammar fuzz ([[JsFuzzSpec]]) cannot see:
 * compile-totality says nothing about the distributed runner folding the
 * same way the sequential semantics do.
 */
class JsDifferentialSpec extends SparkSpec {

  private implicit val jsEnc: Encoder[JsVal] = Encoders.javaSerialization[JsVal]

  /** Randomized event log: streams s-0..s-2, types tA/tB/tC (weighted),
    * JSON and non-JSON bodies, distinct positions, SHUFFLED row order. */
  private def genLog(rnd: scala.util.Random): DataFrame = {
    import spark.implicits._
    val n = 24 + rnd.nextInt(17)
    val rows = (0 until n).map { i =>
      val stream = s"s-${rnd.nextInt(3)}"
      val tpe = Seq("tA", "tA", "tB", "tC")(rnd.nextInt(4))
      val data =
        if (rnd.nextBoolean()) s"""{"k":${rnd.nextInt(5)}}""" else s"plain-$i"
      (stream, tpe, i.toLong, data)
    }
    rnd.shuffle(rows).toDF("stream", "event_type", "position", "data")
      .repartition(4) // several input partitions → real interleavings
  }

  private def norm(rows: Array[(String, JsVal)]): Map[String, Any] =
    rows.map { case (k, v) => k -> JsVal.toAny(v) }.toMap

  test("200 generated programs: distributed fold == sequential fold (states and emissions)") {
    (1 to 200).foreach { seed =>
      val rnd = new scala.util.Random(seed * 15485863L)
      val src = JsFuzzGen.genProgram(rnd)
      val p = JsProjection.compile(src, s"diff-$seed").projection
      val df = genLog(rnd)

      // sequential reference: identical ProjEvent rows, position order
      val events = ProjectionBatch.toProjEvents(df).collect().sortBy(_.position)
      val runner = new LocalRunner(p)
      val lastEmit = scala.collection.mutable.Map.empty[String, JsVal]
      events.iterator.filter(e => p.selector.matches(e.streamId)).foreach { e =>
        val key = p.partitionOf(e)
        runner.update(e).foreach(s => lastEmit(key) = s)
      }
      val expectStates: Map[String, Any] =
        if (p.isPartitioned) runner.states.map { case (k, v) => k -> JsVal.toAny(v) }
        else runner.state.map(s => "" -> JsVal.toAny(s)).toMap

      val gotStates = norm(ProjectionBatch.finalStates(p, df).collect())
      assert(gotStates == expectStates,
        s"seed $seed: finalStates diverged\nprogram:\n$src\ngot:  $gotStates\nwant: $expectStates")

      val gotEmitted = norm(ProjectionBatch.lastEmitted(p, df).collect())
      val expectEmitted = lastEmit.map { case (k, v) => k -> JsVal.toAny(v) }.toMap
      assert(gotEmitted == expectEmitted,
        s"seed $seed: lastEmitted diverged\nprogram:\n$src\ngot:  $gotEmitted\nwant: $expectEmitted")
    }
  }
}
