package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec

/**
 * Pins the DoReMi-style multiplicative-weights domain reweighting
 * ([[Doremi]]): the distributed MW trajectory equals the sequential
 * reference over the same domain means, hard (low-LM-score) domains
 * gain weight monotonically relative to easy ones, and the update is
 * a genuine ITERATION (the mixture mean moves as weights move, so the
 * excess signal shrinks — not a one-shot ranking).
 */
class DoremiSpec extends SparkSpec {

  import spark.implicits._

  // The LM is trained on the corpus ITSELF, so "hard" means contexts
  // whose continuations VARY across the domain (P(w2|w1) small), not
  // rare words (a unique context predicts its unique continuation with
  // P=1 and scores the maximum). easy: a rigid aa->bb loop, every
  // bigram P=1; hard: the shared context zz fans out to nine different
  // continuations, P(.|zz)=1/9.
  private def corpus() = Seq(
    (1L, "easy", "aa bb aa bb aa bb aa bb"),
    (2L, "easy", "aa bb aa bb aa bb"),
    (3L, "easy", "aa bb aa bb"),
    (4L, "hard", "zz alpha zz beta zz gamma"),
    (5L, "hard", "zz delta zz epsilon zz zeta"),
    (6L, "hard", "zz eta zz theta zz iota")
  ).toDF("doc_id", "source", "text")

  test("distributed MW rounds == sequential reference on the same domain means") {
    val docs = corpus()
    val dm = Doremi.domainMeans(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val expect = Doremi.weightsSequential(dm, etaX1000 = 500, rounds = 3)
      .sortBy(_._1)
    val got = Doremi.domainWeights(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expect)
  }

  test("hard domains gain weight; the excess signal is iterative, not a one-shot ranking") {
    val docs = corpus()
    val w = Doremi.domainWeights(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    // the hard domain ends above its 1000 start and above the easy domain
    assert(w("hard")._1 > 1000L && w("easy")._1 == 1000L,
      s"hard domains must be upweighted, easy left at baseline: $w")
    assert(w("hard")._2 > w("easy")._2)
    // iteration matters: the 3-round trajectory differs from 3x the
    // one-round step compounded blindly (the mixture mean moves after
    // round 1, shrinking the excess), so rounds=3 weight < cube of the
    // round-1 multiplier applied statically
    val dm = Doremi.domainMeans(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val r1 = Doremi.weightsSequential(dm, 500, 1).find(_._1 == "hard").get._4
    val r3 = Doremi.weightsSequential(dm, 500, 3).find(_._1 == "hard").get._4
    val staticCompound = 1000L * r1 / 1000L * r1 / 1000L * r1 / 1000L
    assert(r3 < staticCompound,
      s"3 genuine rounds ($r3) must fall below the static compounding ($staticCompound)")
  }
}
