package graft.corpus

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("stratified sampling is deterministic and respects per-stratum rates") {
    val d = docsDf((0L until 200L).map(i => (i, s"doc $i body", s"src${i % 2}")))
    val rates = Map("src0" -> 1000, "src1" -> 0)
    val kept = Sampling.stratified(d, "source", rates, salt = "s1")
    val sources = kept.select("source").distinct().collect().map(_.getString(0))
    assert(sources.toSeq == Seq("src0"), "rate-0 stratum must be dropped entirely")
    assert(kept.count() == 100, "rate-1000 stratum must be kept entirely")
    // same salt -> same sample; different salt -> independent draw
    val a = Sampling.stratified(d, "source", Map("src0" -> 500, "src1" -> 500), "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratified(d, "source", Map("src0" -> 500, "src1" -> 500), "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val c = Sampling.stratified(d, "source", Map("src0" -> 500, "src1" -> 500), "s2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same salt must reproduce the same sample")
    assert(a != c, "different salt must draw a different sample")
  }

  test("chunking partitions the token stream exactly") {
    val text = (1 to 70).map(i => s"t$i").mkString(" ")
    val d = docsDf(Seq((1L, text, "s")))
    val chunks = Chunking.chunkTable(d, chunkSize = 32).orderBy("chunk_idx").collect()
    assert(chunks.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(chunks.map(_.getLong(2)).toSeq == Seq(32L, 32L, 6L), "sizes must sum to the doc")
    // fingerprints match the polyhash of the reassembled chunk text
    val fp0 = d.select(call_function("graft_polyhash",
      lit((1 to 32).map(i => s"t$i").mkString(" ")))).head().getLong(0)
    assert(chunks(0).getLong(3) == fp0)
  }

  test("greedy packing: bins respect the budget, oversize docs get their own bin") {
    // token counts per doc: 100, 100, 100, 400(oversize), 50, 50
    val mk = (n: Int) => (1 to n).map(_ => "w").mkString(" ")
    val d = docsDf(Seq(
      (1L, mk(100), "a"), (2L, mk(100), "a"), (3L, mk(100), "a"),
      (4L, mk(400), "a"), (5L, mk(50), "a"), (6L, mk(50), "a"),
      (7L, mk(200), "b"), (8L, mk(200), "b")
    ))
    val packed = Packing.packGreedy(d, budget = 256L)
      .orderBy("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(packed.toSeq == Seq(
      ("a", 1L, 0L), ("a", 2L, 0L), // 100+100 <= 256
      ("a", 3L, 1L),                // +100 overflows -> new bin
      ("a", 4L, 2L),                // 400 > budget -> own bin
      ("a", 5L, 3L), ("a", 6L, 3L), // 50+50
      ("b", 7L, 0L),                // numbering restarts per source
      ("b", 8L, 1L)                 // 200+200 overflows
    ))
  }
}
