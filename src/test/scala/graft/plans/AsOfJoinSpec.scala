package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def leftDf = Seq(
    ("a", 10L), ("a", 20L), ("a", 30L), ("b", 5L), ("c", 7L)
  ).toDF("k", "t")

  private def rightDf = Seq(
    ("a", 5L, "a5"), ("a", 10L, "a10"), ("a", 25L, "a25"),
    ("b", 9L, "b9"), ("d", 1L, "d1")
  ).toDF("rk", "rt", "v")

  test("strict as-of: latest right strictly before each left time; no match -> nulls") {
    val got = AsOf.join(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt", strict = true)
      .select(col("k"), col("t"), col("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      ("a", 10L, Some("a5")), ("a", 20L, Some("a10")), ("a", 30L, Some("a25")),
      ("b", 5L, None), ("c", 7L, None)))
  }

  test("non-strict as-of: ties join") {
    val got = AsOf.join(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt", strict = false)
      .select(col("k"), col("t"), col("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      ("a", 10L, Some("a10")), ("a", 20L, Some("a10")), ("a", 30L, Some("a25")),
      ("b", 5L, None), ("c", 7L, None)))
  }

  test("empty right side: all lefts survive with nulls") {
    val got = AsOf.join(leftDf, rightDf.limit(0), Seq("k"), Seq("rk"), "t", "rt")
      .select(col("k"), col("v")).collect()
    assert(got.length == 5 && got.forall(_.isNullAt(1)))
  }

  test("native operator == composed window form on the fixture log") {
    val ev = graft.log.Fixture.events(spark, "/root/testdata/sf0.001")
    val composed = graft.queries.RelationalQueries.queries("join_asof")(
      spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSeq
    val native = graft.queries.RelationalQueries.queries("join_asof_native")(
      spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSeq
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("plan: AsOfJoinExec with one co-partitioning shuffle per side, no SMJ, no window") {
    val df = graft.queries.RelationalQueries.queries("join_asof_native")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("AsOfJoin"), s"expected the native operator in:\n$plan")
    // own pipeline only — the cached fixture's revision window is embedded
    // in the InMemoryRelation build plan
    val own = plan.split("InMemoryTableScan")(0)
    assert(!own.contains("SortMergeJoin") && !own.contains("Window"),
      s"no composed-join machinery expected in:\n$own")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(own).length
    assert(hashExchanges <= 2,
      s"expected at most one key shuffle per side, found $hashExchanges in:\n$plan")
  }
}
