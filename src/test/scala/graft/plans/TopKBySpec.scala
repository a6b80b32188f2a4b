package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKBySpec extends SparkSpec {

  import spark.implicits._

  private def entries(rows: Seq[(Long, String)], k: Int, parts: Int): Seq[(Long, String)] =
    rows.toDF("n", "t").repartition(parts)
      .agg(call_function("graft_topk_by", col("n"), col("t"), lit(k)).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.score"), col("e.tag"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("keeps the k largest scores in rank order, any partitioning") {
    val rows = (1L to 100L).map(v => ((v * 37L) % 101L, s"t$v"))
    val want = rows.sortBy { case (s, t) => (-s, t) }.take(5)
    for (parts <- Seq(1, 4, 13)) {
      assert(entries(rows, 5, parts) == want, s"parts=$parts")
    }
  }

  test("score ties break to the binary-smallest tag") {
    val rows = Seq((7L, "zz"), (7L, "aa"), (7L, "mm"), (1L, "bb"))
    assert(entries(rows, 2, 3) == Seq((7L, "aa"), (7L, "mm")))
  }

  test("groups smaller than k return everything, ranked") {
    assert(entries(Seq((3L, "c"), (9L, "a")), 10, 1) == Seq((9L, "a"), (3L, "c")))
  }

  test("heap form equals the window form on the fixture (gate pair)") {
    val dir = "/root/testdata/sf0.001"
    val window = graft.queries.LogQueries.queries("top_types_per_stream")(spark, dir)
    val heap = graft.queries.LogQueries.queries("top_types_per_stream_heap")(spark, dir)
    assert(window.exceptAll(heap).count() === 0)
    assert(heap.exceptAll(window).count() === 0)
  }

  test("works from SQL text with default k") {
    Seq((5L, "x"), (2L, "y"), (8L, "z"), (1L, "w")).toDF("n", "t")
      .createOrReplaceTempView("tk_in")
    val got = spark.sql("select graft_topk_by(n, t) from tk_in")
      .select(explode(col("graft_topk_by(n, t)")))
      .collect().map(r => r.getStruct(0)).map(s => (s.getLong(0), s.getString(1))).toSeq
    assert(got == Seq((8L, "z"), (5L, "x"), (2L, "y")))
  }
}
