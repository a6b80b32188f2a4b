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

  test("fixed-size sampling draws exactly k per stratum, deterministically") {
    val d = docsDf((0L until 100L).map(i => (i, s"doc $i", s"src${i % 4}")))
    val a = Sampling.fixedSizePerStratum(d, "source", k = 3, salt = "h")
    assert(a.groupBy("source").count().collect().forall(_.getLong(1) == 3))
    val b = Sampling.fixedSizePerStratum(d, "source", k = 3, salt = "h")
    assert(a.select("doc_id").collect().map(_.getLong(0)).toSet ==
      b.select("doc_id").collect().map(_.getLong(0)).toSet, "same salt reproduces")
  }

  test("bigram LM score: repeated text scores high, unique text scores low") {
    val common = "the quick brown fox jumps"
    val d = docsDf(Seq(
      (1L, common, "s"), (2L, common, "s"), (3L, common, "s"),
      (4L, "zq xv wk yj pf", "s"), // bigrams seen once, contexts unique
      (5L, "one", "s")             // no bigrams
    ))
    val got = LmScore.bigramLmScores(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // docs 1-3: every bigram has C(w1,w2)=C(w1.)=3 -> P=1 -> 1e6
    // doc 4: every bigram is 1/1 -> also 1e6? No: contexts unique to doc 4,
    // so C=1/1 -> 1e6 too. Make doc 4 share contexts with different
    // successors instead: see assertion below on doc 6 semantics.
    assert(got.take(3).forall(_._3 == 1000000L))
    assert(got(4) == ((5L, 0L, 0L)), "no-bigram doc scores 0")
    // a doc reusing a common context with a rare successor scores lower
    val d2 = docsDf(Seq(
      (1L, "the cat sat", "s"), (2L, "the cat sat", "s"), (3L, "the dog sat", "s")))
    val g2 = LmScore.bigramLmScores(d2).orderBy("doc_id").collect()
      .map(_.getLong(2)).toSeq
    // "the cat": 2/3, "cat sat": 1/1 -> floor((666666+1000000)/2) = 833333
    // "the dog": 1/3, "dog sat": 1/1 -> floor((333333+1000000)/2) = 666666
    assert(g2 == Seq(833333L, 833333L, 666666L))
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

  test("globalRank is bit-identical to the single-partition window rank") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // ties in the leading order key force the cross-range tie-break path;
    // 4 shuffle partitions -> the range side genuinely splits
    val d = (0L until 500L).map(i => (i % 3, i * 37 % 101, i)).toDF("grp", "k", "id")
    val got = graft.corpus.Ranking.globalRank(d, Seq("grp"), Seq("k", "id"), "rk")
      .select("grp", "id", "rk").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("grp")).orderBy(col("k"), col("id"))
    val want = d.withColumn("rk", row_number().over(w).cast("long"))
      .select("grp", "id", "rk").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // ... and with no partition key at all (one global order)
    val g2 = graft.corpus.Ranking.globalRank(d, Seq.empty, Seq("k", "id"), "rk")
      .select("id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w2 = Window.orderBy(col("k"), col("id"))
    val want2 = d.withColumn("rk", row_number().over(w2).cast("long"))
      .select("id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g2 == want2)
  }
}
