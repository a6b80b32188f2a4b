package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvSpec extends SparkSpec {

  import spark.implicits._

  test("kmv buffer is the k smallest distinct values, any partitioning") {
    val vals = (1L to 1000L).map(v => (v * 7919L) % 104729L) // distinct, scrambled
    val dup = vals ++ vals.take(300) // duplicates must not inflate the sketch
    val want = vals.distinct.sorted.take(64)
    for (parts <- Seq(1, 4, 13)) {
      val got = dup.toDF("h").repartition(parts)
        .agg(call_function("graft_kmv", col("h"), lit(64)).as("kmv"))
        .head().getSeq[Long](0)
      assert(got == want, s"parts=$parts")
    }
  }

  test("groups smaller than k return the full distinct set, sorted") {
    val got = Seq(5L, 3L, 5L, 9L, 3L).toDF("h")
      .agg(call_function("graft_kmv", col("h"), lit(64)))
      .head().getSeq[Long](0)
    assert(got == Seq(3L, 5L, 9L))
  }

  test("works from SQL text with default k") {
    Seq(1L, 2L, 3L).toDF("h").createOrReplaceTempView("kmv_in")
    val got = spark.sql("select graft_kmv(h) from kmv_in").head().getSeq[Long](0)
    assert(got == Seq(1L, 2L, 3L))
  }

  test("estimate quality: within 35% of exact on uniform hashes") {
    val p = 2147483647L
    val n = 5000
    val hashes = (1 to n).map(i => (i.toLong * 2654435761L) % p).distinct
    val kmv = hashes.toDF("h")
      .agg(call_function("graft_kmv", col("h"), lit(64)))
      .head().getSeq[Long](0)
    assert(kmv.length == 64)
    val est = 63L * p / kmv.last
    assert(math.abs(est.toDouble - hashes.length) / hashes.length < 0.35,
      s"est $est vs exact ${hashes.length}")
  }

  test("non-foldable or null k is a clear analysis error, not an NPE") {
    Seq((1L, 2L)).toDF("h", "kcol").createOrReplaceTempView("kmv_badk")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select graft_kmv(h, kcol) from kmv_badk").collect()
    }
    assert(e1.getMessage.contains("graft_kmv"))
    assert(e1.getMessage.contains("foldable"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select graft_kmv(h, cast(null as int)) from kmv_badk").collect()
    }
    assert(e2.getMessage.contains("graft_kmv"))
  }
}
