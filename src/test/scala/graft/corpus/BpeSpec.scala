package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins graft.corpus.Bpe to the classic BPE semantics: overlapping pair
  * counts, (count desc, l asc, r asc) argmax, greedy left-to-right merge
  * application (reference: Sennrich et al. 2016 §3.2 learn_bpe). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.toDF("text").withColumn("doc_id", monotonically_increasing_id())

  test("first merge is the most frequent adjacent pair; counts are word-frequency weighted") {
    // "ababab" x1 contributes overlapping pairs; "cd" x3 (three docs)
    val out = Bpe.train(spark, corpus("ababab", "cd", "cd", "cd"), rounds = 1).collect()
    assert(out.length == 1)
    val r = out(0)
    // pairs in "ababab": (a,b)x3, (b,a)x2; "cd": (c,d)x1 per word but wc=3
    // → (a,b) wins with 3 (tie vs (c,d)=3 broken lexicographically: a < c)
    assert(r.getString(1) == "a" && r.getString(2) == "b" && r.getLong(3) == 3L)
  }

  test("greedy left-to-right application: aaaa collapses to (aa)(aa), aaa to (aa)(a)") {
    val words = Bpe.initialWords(corpus("aaaa aaa"))
      .withColumn("syms", Bpe.mergeExpr(col("syms"), "a", "a"))
      .select(col("syms")).as[Seq[String]].collect().toSet
    assert(words == Set(Seq("aa", "aa"), Seq("aa", "a")))
  }

  test("merged symbols participate in later rounds (Sennrich ladder)") {
    // classic example family: 'est' forms after two rounds on est-heavy corpus
    val docs = corpus("newest newest newest widest widest lowest")
    val merges = Bpe.train(spark, docs, rounds = 3).collect()
    assert(merges.length == 3)
    // round 1: (e,s) and (s,t) both appear 6x; (e,s) wins the tie (e < s)
    assert(merges(0).getString(1) == "e" && merges(0).getString(2) == "s")
    // round 2: (es,t) now counts 6 — the merged symbol is a first-class unit
    assert(merges(1).getString(1) == "es" && merges(1).getString(2) == "t")
    // corpus_symbols_after decreases by the number of applied merges each round
    val sizes = merges.map(_.getLong(4))
    assert(sizes.toSeq == sizes.sorted(Ordering[Long].reverse).toSeq)
  }

  // The text_bpe_train/apply ORACLE encodes symbol lists as chr(1)-joined
  // strings (a DuckDB-side encoding choice — the engine's array fold has
  // no such assumption). This pins that the fixture corpus the gate runs
  // on contains no U+0001, so the oracle's encoding provably covers the
  // full merge-application contract on the gated data.
  test("fixture corpus is U+0001-free (BPE oracle separator never collides)") {
    val n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").contains("\u0001")).count()
    assert(n == 0L)
  }

  test("empty and single-char corpora terminate with an empty merge table") {
    assert(Bpe.train(spark, corpus(), rounds = 2).count() == 0)
    assert(Bpe.train(spark, corpus("a b c", "a"), rounds = 2).count() == 0)
  }

  private def table(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, Long, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toSeq

  test("batched training produces the IDENTICAL merge table to sequential") {
    // the well-known batching subtlety: a merge changes neighbouring pair
    // counts, so only a provably non-interacting prefix may share one
    // snapshot. Stress it with tie-heavy, interaction-heavy random
    // corpora over tiny alphabets (the worst case for the safety rule)
    // plus the Sennrich ladder.
    val ladder = corpus("newest newest newest widest widest lowest")
    assert(table(Bpe.train(spark, ladder, rounds = 6))
      == table(Bpe.trainSequential(spark, ladder, rounds = 6)))
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abc"
      val words = Seq.fill(25)(
        Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(alphabet.length))).mkString)
      val docs = corpus(words.grouped(5).map(_.mkString(" ")).toSeq: _*)
      val batched = table(Bpe.train(spark, docs, rounds = 10))
      val seq = table(Bpe.trainSequential(spark, docs, rounds = 10))
      assert(batched == seq, s"seed $seed: batched $batched != sequential $seq")
    }
  }

  test("batching cuts driver rounds below the merge count on a skewed corpus") {
    // sharply decaying pair counts (the Zipfian shape of real text) let
    // the safe prefix take several merges per driver round
    val words = (0 until 8).flatMap { i =>
      Seq.fill(1 << (8 - i))(s"${('a' + 2 * i).toChar}${('b' + 2 * i).toChar}")
    }
    val docs = corpus(words.grouped(16).map(_.mkString(" ")).toSeq: _*)
    val out = Bpe.train(spark, docs, rounds = 8)
    assert(table(out) == table(Bpe.trainSequential(spark, docs, rounds = 8)))
    assert(out.count() == 8L)
    assert(Bpe.lastDriverRounds < 8,
      s"expected batching to need fewer driver rounds than merges, got ${Bpe.lastDriverRounds}")
  }
}
