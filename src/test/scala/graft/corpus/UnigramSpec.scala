package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec

import scala.util.Random

/** Pins graft.corpus.Unigram (SentencePiece-style unigram tokenizer,
  * Kudo 2018, deterministic min-token hard-EM variant): Viterbi
  * semantics and tie-break, char-fallback segmentability, and the
  * distributed train/apply against the pure-Scala sequential reference
  * on generated multi-partition corpora. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.toDF("text").withColumn("doc_id", monotonically_increasing_id())
      .withColumn("source", lit("s"))

  private def segmentWith(words: Seq[(String, Long)], vocab: Set[String],
                          maxLen: Int): Map[String, Seq[String]] = {
    val wt = words.toDF("w", "wc").repartition(3)
    val subs = Unigram.substringOccurrences(wt, maxLen)
    val v = vocab.toSeq.toDF("p")
    Unigram.segment(subs, v)
      .select(col("w"), col("pieces"))
      .as[(String, Seq[String])].collect().toMap
  }

  test("min-token Viterbi picks the fewest pieces; ties prefer the longest last piece") {
    // "aab" with {a, b, aa, ab}: [aa,b] and [a,ab] both cost 2; the
    // packed-min tie-break takes the SMALLEST back-pointer at the last
    // cell — the longest final piece — so [a, ab] wins.
    val seg = segmentWith(Seq(("aab", 1L)), Set("a", "b", "aa", "ab"), maxLen = 4)
    assert(seg("aab") == Seq("a", "ab"))
    // cost dominates the tie-break: "aaaa" with {a, aa} → [aa, aa], not chars
    val seg2 = segmentWith(Seq(("aaaa", 1L)), Set("a", "aa"), maxLen = 4)
    assert(seg2("aaaa") == Seq("aa", "aa"))
    // matches longer than maxLen are never generated
    val seg3 = segmentWith(Seq(("abcd", 1L)), Set("a", "b", "c", "d", "abcd"), maxLen = 3)
    assert(seg3("abcd") == Seq("a", "b", "c", "d"))
  }

  test("distributed Viterbi == sequential reference on random words and vocabs") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val alphabet = "abc"
      val words = (1 to 40).map { i =>
        ((1 to (1 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString,
          (1 + rnd.nextInt(5)).toLong)
      }.distinct.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val maxLen = 2 + rnd.nextInt(3)
      val multi = (1 to 12).map(_ =>
        (1 to (2 + rnd.nextInt(maxLen - 1)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
        .filter(_.length <= maxLen).toSet
      val vocab = alphabet.map(_.toString).toSet ++ multi
      val dist = segmentWith(words, vocab, maxLen)
      for ((w, _) <- words) {
        val seq = Unigram.segmentSequential(w, vocab, maxLen)
        assert(dist(w) == seq, s"trial $trial word '$w': dist ${dist(w)} vs seq $seq")
        assert(seq.mkString == w, s"pieces must concatenate back to '$w'")
      }
    }
  }

  test("Viterbi cost is exactly the minimum over ALL segmentations (brute force)") {
    // enumerate every 2^(n-1) cut pattern of random short words and pin
    // the sequential reference's token count to the true optimum — the
    // distributed fold is pinned to the reference by the tests above
    val rnd = new Random(29)
    for (_ <- 1 to 200) {
      val w = (1 to (1 + rnd.nextInt(8))).map(_ => "ab" (rnd.nextInt(2))).mkString
      val maxLen = 1 + rnd.nextInt(4)
      val multi = (1 to 6).map(_ =>
        (1 to (2 + rnd.nextInt(3))).map(_ => "ab" (rnd.nextInt(2))).mkString)
        .filter(_.length <= maxLen).toSet
      val vocab = Set("a", "b") ++ multi
      def cuts(n: Int): Seq[Seq[Int]] =
        (0 until (1 << (n - 1))).map(m =>
          (1 until n).filter(i => (m & (1 << (i - 1))) != 0) :+ n)
      val best = cuts(w.length).flatMap { cut =>
        val pieces = (0 +: cut).sliding(2).map { case Seq(s, e) => w.substring(s, e) }.toSeq
        if (pieces.forall(p => vocab.contains(p) && p.length <= maxLen)) Some(pieces.length)
        else None
      }.min // single chars always present → at least one valid segmentation
      val seq = Unigram.segmentSequential(w, vocab, maxLen)
      assert(seq.length == best,
        s"word '$w' vocab $vocab maxLen $maxLen: viterbi ${seq.length} tokens, optimum $best")
      assert(seq.mkString == w)
    }
  }

  test("distributed train == sequential reference (vocab, usage, ranks)") {
    val rnd = new Random(13)
    for (trial <- 1 to 3) {
      val lexicon = Seq("spark", "sparse", "parse", "park", "bar", "bars", "a", "ab")
      val texts = (1 to 30).map(_ =>
        (1 to (3 + rnd.nextInt(8))).map(_ => lexicon(rnd.nextInt(lexicon.length))).mkString(" "))
      val docs = texts.toDF("text").repartition(4)
        .withColumn("doc_id", monotonically_increasing_id())
      val (maxLen, seedSize, keepK, minFreq, rounds) = (4, 20, 6, 2L, 2)
      val dist = Unigram
        .train(docs, maxLen, seedSize, keepK, minFreq, rounds)
        .orderBy("rank")
        .as[(Long, String, Long, Long)].collect().toSeq
      val words = docs
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("wc"))
        .as[(String, Long)].collect().toSeq
      val seq = Unigram.trainSequential(words, maxLen, seedSize, keepK, minFreq, rounds)
      assert(dist == seq, s"trial $trial:\ndist: $dist\nseq:  $seq")
    }
  }

  test("distributed train == sequential on a web-shaped type table (hundreds of types, long words)") {
    // the fixture corpus has only 31 word types — this pins the DP and
    // the prune arithmetic on a vocabulary two orders larger, with word
    // lengths past the fixture's 8-char cap, across 8 partitions
    val rnd = new Random(41)
    val syllables = Seq("an", "ber", "cu", "dor", "el", "fin", "gra", "ho", "in", "jo")
    val words = (1 to 600).map { _ =>
      (1 to (1 + rnd.nextInt(5))).map(_ => syllables(rnd.nextInt(syllables.length))).mkString
    }.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val (maxLen, seedSize, keepK, minFreq, rounds) = (5, 150, 40, 3L, 2)
    val wt = words.toDF("w", "wc").repartition(8).localCheckpoint()
    val subs = Unigram.substringOccurrences(wt, maxLen)
    var vocab = Unigram.seedVocab(subs, seedSize, minFreq)
    for (_ <- 1 to rounds)
      vocab = Unigram.prune(vocab, Unigram.usage(Unigram.segment(subs, vocab)), keepK)
        .localCheckpoint()
    val finalUse = Unigram.usage(Unigram.segment(subs, vocab))
    val dist = vocab.join(finalUse, Seq("p"), "left")
      .select(col("p"), coalesce(col("usage"), lit(0L)).as("u"))
      .as[(String, Long)].collect().sortBy { case (p, u) => (-u, p) }.toSeq
    val seq = Unigram.trainSequential(words, maxLen, seedSize, keepK, minFreq, rounds)
      .map { case (_, p, _, u) => (p, u) }
    assert(dist == seq)
  }

  test("a word at the DP packing bound fails loudly, not silently") {
    // the packed cost*F+back encoding supports words under F chars; the
    // in-aggregate assert_true must surface, not corrupt tie-breaks
    val docs = corpus("x".repeat(Unigram.F.toInt))
    val e = intercept[Exception] {
      Unigram.wordTypes(docs).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("unigram DP supports words under")),
      s"expected the DP bound assert, got: $e")
  }

  test("single-character pieces survive every prune: any word stays segmentable") {
    // keepK = 0 prunes ALL multi-char pieces; training must still
    // produce a full character vocabulary and apply must still tokenize
    val docs = corpus("zebra quilt zebra", "quilt jazz")
    val vocab = Unigram.train(docs, maxLen = 4, seedSize = 10, keepK = 0,
        minFreq = 1, rounds = 2)
      .select("piece").as[String].collect().toSet
    assert(vocab == "zebraquiltj ".replace(" ", "").toSet.map((c: Char) => c.toString))
    val applied = Unigram.applyPerSource(docs, maxLen = 4, seedSize = 10,
      keepK = 0, minFreq = 1, rounds = 2).collect()
    // all-chars vocabulary → n_subwords == n_chars, compression 1000
    assert(applied.length == 1 && applied(0).getAs[Long]("compression_permille") == 1000L)
  }

  test("apply aggregates per source from one word-TYPE segmentation") {
    val docs = Seq(
      ("aa aa b", "s1"), ("aa b b", "s2"))
      .toDF("text", "source").withColumn("doc_id", monotonically_increasing_id())
    val out = Unigram.applyPerSource(docs, maxLen = 2, seedSize = 5,
        keepK = 2, minFreq = 1, rounds = 1)
      .orderBy("source").collect()
    // vocab keeps "aa" (usage 3 occurrences weighted) → each "aa" is 1 token
    val s1 = out(0)
    assert(s1.getAs[Long]("n_words") == 3 && s1.getAs[Long]("n_chars") == 5 &&
      s1.getAs[Long]("n_subwords") == 3)
    val s2 = out(1)
    assert(s2.getAs[Long]("n_subwords") == 3 && s2.getAs[Long]("compression_permille") == 750L)
  }
}
