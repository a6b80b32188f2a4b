package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec

import scala.util.Random

/** Pins graft.corpus.Wordpiece: maximal-munch semantics, the ##
  * continuation convention, char-fallback segmentability, the
  * distributed walk against the sequential reference, and the
  * greedy-vs-Viterbi contrast (greedy can only use MORE tokens). */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def segmentWith(words: Seq[(String, Long)], vocab: Set[String],
                          maxLen: Int): Map[String, Seq[String]] = {
    val wt = words.toDF("w", "wc").repartition(3)
    val subs = Unigram.substringOccurrences(wt, maxLen)
    val v = vocab.toSeq.toDF("p")
    Wordpiece.segment(subs, v)
      .select(col("w"), col("pieces"))
      .as[(String, Seq[String])].collect().toMap
  }

  test("maximal munch takes the longest match and marks continuations with ##") {
    // "unhappy" with initials {u, un, unhap} and continuations
    // {##h, ##a, ##p, ##y, ##happy}: greedy takes "unhap" (longest
    // initial), then char continuations — NOT the globally-nicer
    // un + ##happy.
    val vocab = Set("u", "n", "h", "a", "p", "y", "un", "unhap",
      "##n", "##h", "##a", "##p", "##y", "##happy")
    val seg = segmentWith(Seq(("unhappy", 1L)), vocab, maxLen = 6)
    assert(seg("unhappy") == Seq("unhap", "##p", "##y"))
    // with the long initial absent, greedy finds un + ##happy
    val seg2 = segmentWith(Seq(("unhappy", 1L)), vocab - "unhap", maxLen = 6)
    assert(seg2("unhappy") == Seq("un", "##happy"))
  }

  test("distributed greedy walk == sequential reference on random words and vocabs") {
    val rnd = new Random(11)
    for (trial <- 1 to 5) {
      val alphabet = "abc"
      val words = (1 to 40).map { _ =>
        ((1 to (1 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString,
          (1 + rnd.nextInt(5)).toLong)
      }.distinct.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val maxLen = 2 + rnd.nextInt(3)
      val multi = (1 to 12).flatMap { _ =>
        val p = (1 to (2 + rnd.nextInt(maxLen - 1)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        if (p.length <= maxLen) Seq(p, "##" + p) else Seq.empty
      }.toSet
      val vocab = alphabet.flatMap(c => Seq(c.toString, "##" + c)).toSet ++ multi
      val dist = segmentWith(words, vocab, maxLen)
      for ((w, _) <- words) {
        val seq = Wordpiece.segmentSequential(w, vocab, maxLen)
        assert(dist(w) == seq, s"trial $trial word '$w': dist ${dist(w)} vs seq $seq")
        assert(seq.map(_.stripPrefix("##")).mkString == w,
          s"pieces must concatenate back to '$w'")
      }
    }
  }

  test("corpus-built vocabulary segments every word (char fallback never strands)") {
    val docs = Seq("zebra quilt zebra jazz", "quilt jazzy zebra")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
      .withColumn("source", lit("s"))
    val report = Wordpiece.vocabReport(docs, maxLen = 4, initK = 3,
      contK = 3, minFreq = 1).collect()
    // total usage-weighted piece mass accounts for every word occurrence
    val applied = Wordpiece.applyPerSource(docs, maxLen = 4, initK = 3,
      contK = 3, minFreq = 1).collect()
    assert(applied.length == 1)
    assert(applied(0).getAs[Long]("n_words") == 7L)
    assert(report.map(_.getAs[Long]("usage")).sum ==
      applied(0).getAs[Long]("n_subwords"))
  }

  test("greedy never beats the min-token Viterbi on the same pieces") {
    // same RAW piece inventory for both tokenizers (wordpiece sees the
    // positional forms); greedy token counts must be >= Viterbi's
    val rnd = new Random(19)
    val words = (1 to 60).map { _ =>
      ((1 to (2 + rnd.nextInt(8))).map(_ => "ab" (rnd.nextInt(2))).mkString, 1L)
    }.distinct
    val maxLen = 4
    val raw = (1 to 10).map(_ =>
      (1 to (2 + rnd.nextInt(3))).map(_ => "ab" (rnd.nextInt(2))).mkString)
      .filter(_.length <= maxLen).toSet ++ Set("a", "b")
    val wpVocab = raw.flatMap(p => Seq(p, "##" + p))
    for ((w, _) <- words) {
      val greedy = Wordpiece.segmentSequential(w, wpVocab, maxLen)
      val viterbi = Unigram.segmentSequential(w, raw, maxLen)
      assert(greedy.length >= viterbi.length,
        s"'$w': greedy ${greedy.length} < viterbi ${viterbi.length}")
    }
  }
}
