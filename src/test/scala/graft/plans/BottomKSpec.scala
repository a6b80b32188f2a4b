package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BottomKSpec extends SparkSpec {

  import spark.implicits._

  test("buffer keeps the k smallest distinct hashes with their values, any partitioning") {
    val rows = (1L to 1000L).map(v => ((v * 7919L) % 104729L, v.toDouble))
    val want = rows.sortBy(_._1).take(128).toMap
    for (parts <- Seq(1, 4, 13)) {
      val got = rows.toDF("h", "v").repartition(parts)
        .agg(call_function("graft_bottomk", col("h"), col("v"), lit(128)).as("sk"))
        .head().getMap[Long, Double](0)
      assert(got.toMap == want, s"parts=$parts")
    }
  }

  test("equal hashes resolve to the smallest value (order-independent tie rule)") {
    val rows = Seq((7L, 3.0), (7L, 1.0), (7L, 2.0), (1L, 9.0))
    for (parts <- Seq(1, 3)) {
      val got = rows.toDF("h", "v").repartition(parts)
        .agg(call_function("graft_bottomk", col("h"), col("v"), lit(8)))
        .head().getMap[Long, Double](0)
      assert(got.toMap == Map(1L -> 9.0, 7L -> 1.0), s"parts=$parts")
    }
  }

  test("matches the declarative order-by-hash limit-k sample") {
    val ev = graft.log.Fixture.events(spark, "/root/testdata/sf0.001")
    val h = call_function("graft_polyhash", col("position").cast("string"))
    val sketch = ev
      .agg(call_function("graft_bottomk", h, col("value"), lit(64)))
      .head().getMap[Long, Double](0).toMap
    val declarative = ev
      .select(h.as("h"), col("value"))
      .orderBy("h").limit(64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sketch == declarative)
  }

  test("works from SQL text with default k") {
    Seq((1L, 1.5), (2L, 2.5)).toDF("h", "v").createOrReplaceTempView("bk_in")
    val got = spark.sql("select graft_bottomk(h, v) from bk_in")
      .head().getMap[Long, Double](0)
    assert(got.toMap == Map(1L -> 1.5, 2L -> 2.5))
  }

  test("grouped sketches stay per-group and bounded") {
    val rows = (1L to 400L).map(v => (s"g${v % 4}", (v * 7919L) % 104729L, v.toDouble))
    val out = rows.toDF("g", "h", "v")
      .groupBy("g")
      .agg(call_function("graft_bottomk", col("h"), col("v"), lit(16)).as("sk"))
      .collect().map(r => r.getString(0) -> r.getMap[Long, Double](1).toMap).toMap
    assert(out.keySet == Set("g0", "g1", "g2", "g3"))
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val want = grp.map(t => (t._2, t._3)).sortBy(_._1).take(16).toMap
      assert(out(g) == want, s"group $g")
    }
  }
}
