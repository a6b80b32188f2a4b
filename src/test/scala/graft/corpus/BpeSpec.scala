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

  test("empty and single-char corpora terminate with an empty merge table") {
    assert(Bpe.train(spark, corpus(), rounds = 2).count() == 0)
    assert(Bpe.train(spark, corpus("a b c", "a"), rounds = 2).count() == 0)
  }
}
