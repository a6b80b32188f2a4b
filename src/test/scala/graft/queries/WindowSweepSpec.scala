package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}

import graft.SparkSpec

/**
 * Repo-wide single-partition-window sweep: NO gate query may plan a
 * Window with an empty partition spec. A partitionBy-less window moves
 * its entire input into ONE task ("WARN WindowExec: No Partition
 * Defined") — the one shape that silently survives small-SF tests and
 * becomes the bottleneck at 100 TB. Global orderings that the engine
 * genuinely needs (training-epoch shuffles, activity deciles, delivery
 * rotation) ride `corpus.Ranking.globalRank` instead: range
 * repartition + per-range local rank + triangular-join offsets.
 *
 * The sweep walks the optimized LOGICAL plan of every SparkEntry gate
 * query (cached fixture relations are leaves there, so only the
 * query's own pipeline is audited — the discipline the physical-plan
 * string checks in QueryPlanSpec can't make repo-wide), plus the
 * persistent-subscription delivery plans for each dispatch strategy.
 */
class WindowSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def globalWindows(plan: LogicalPlan): Seq[LWindow] =
    plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }

  private def assertNoGlobalWindow(name: String, df: DataFrame): Unit = {
    val bad = globalWindows(df.queryExecution.optimizedPlan)
    assert(bad.isEmpty,
      s"$name plans ${bad.size} partitionBy-less window(s):\n" +
        bad.map(_.windowExpressions.mkString(", ")).mkString("\n") +
        s"\nfull plan:\n${df.queryExecution.optimizedPlan}")
  }

  test("no gate query plans a partitionBy-less window") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val bad = globalWindows(q(spark, dir).queryExecution.optimizedPlan)
      if (bad.nonEmpty)
        failures += s"$name: ${bad.map(_.windowExpressions.mkString(", ")).mkString("; ")}"
    }
    assert(failures.isEmpty,
      s"${failures.size} gate queries plan global windows:\n${failures.mkString("\n")}")
  }

  test("persistent-subscription delivery plans have no partitionBy-less window") {
    import java.nio.file.Files
    import graft.streaming.{PersistentSubscriptions => PS}
    import graft.log.Fixture
    val log = Fixture.events(spark, dir)
    for ((strategy, tag) <- Seq(PS.DispatchToSingle -> "single",
                                PS.RoundRobin -> "rr", PS.Pinned -> "pin")) {
      val psDir = Files.createTempDirectory(s"graft-sweep-$tag").toString
      PS.create(spark, psDir, "g", None, strategy = strategy, nowNanos = 1L)
      val d1 = PS.read(spark, psDir, log, "g", "c1", 10, nowNanos = 2L)
      assertNoGlobalWindow(s"ps-read-$tag", d1)
    }
  }
}
