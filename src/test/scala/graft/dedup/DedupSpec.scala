package graft.dedup

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("ngram jaccard DF cutoff: hot boilerplate pruned from index, near-dups kept") {
    import spark.implicits._
    val boiler = "this document is provided as is without warranty"
    // 20 docs sharing only the boilerplate + 2 true near-dups
    val docs = ((0L until 20L).map(i => (i, s"$boiler unique$i alpha$i beta$i gamma$i delta$i")) ++ Seq(
      (100L, "rare tokens shared alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "rare tokens shared alpha beta gamma delta epsilon zeta eta iota")
    )).toDF("doc_id", "text")

    val noCutoff = Dedup.ngramJaccardPairs(docs, 300).collect()
    val cutoff = Dedup.ngramJaccardPairs(docs, 300, maxShingleDf = Some(5)).collect()
    // the true near-dup pair survives the cutoff with identical jaccard
    assert(cutoff.exists(r => r.getLong(0) == 100L && r.getLong(1) == 101L))
    val j0 = noCutoff.find(r => r.getLong(0) == 100L).map(_.getLong(2))
    val j1 = cutoff.find(r => r.getLong(0) == 100L).map(_.getLong(2))
    assert(j0 == j1, "cutoff must not change the Jaccard value, only candidate generation")
    // boilerplate-only pairs exceed DF 5 and disappear from candidates
    assert(!cutoff.exists(r => r.getLong(0) < 20L && r.getLong(1) < 20L))
  }

  test("line boilerplate: corpus-frequent spans flagged and stripped, rare text kept") {
    import spark.implicits._
    // 3 docs share the same 4-token license span; each has unique tail text
    val boiler = "provided as is without"
    val docs = Seq(
      (1L, s"$boiler warranty alpha bravo charlie delta"),
      (2L, s"$boiler warranty echo foxtrot golf hotel"),
      (3L, s"$boiler warranty india juliet kilo lima"),
      (4L, "entirely original words here nothing shared at all")
    ).toDF("doc_id", "text")

    // lines are 4-token spans: doc 1 = [boiler, "warranty alpha bravo charlie", "delta"]
    val rep = Dedup.lineBoilerplate(docs, wordsPerLine = 4, minDf = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep(1L) == ((3L, 1L))) // 3 lines, 1 boilerplate
    assert(rep(2L) == ((3L, 1L)))
    assert(rep(4L) == ((2L, 0L)))

    val clean = Dedup.stripBoilerplate(docs, wordsPerLine = 4, minDf = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(1L) == "warranty alpha bravo charlie delta") // order preserved
    assert(clean(4L) == "entirely original words here nothing shared at all")
    assert(!clean.values.exists(_.contains(boiler)))
  }

  test("exact span dedup: a verbatim 8-token passage is found across documents") {
    import spark.implicits._
    val passage = "the quick brown fox jumps over the lazy" // exactly 8 tokens
    val docs = Seq(
      (1L, s"alpha beta $passage gamma delta"),
      (2L, s"$passage completely different tail here now"),
      (3L, "nothing shared with anyone at all in this one ok")
    ).toDF("doc_id", "text")

    val spans = Dedup.duplicateSpans(docs, spanTokens = 8, minDocs = 2).collect()
    // the shared passage yields exactly one cross-doc span hash
    assert(spans.length == 1)
    assert(spans.head.getLong(1) == 2L && spans.head.getLong(2) == 2L)

    val prof = Dedup.spanDupProfile(docs, spanTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: 12 tokens -> 5 spans, 1 duplicated, covering 8 tokens
    assert(prof(1L) == ((5L, 1L, 8L)))
    assert(prof(2L)._2 == 1L && prof(2L)._3 == 8L)
    assert(prof(3L) == ((3L, 0L, 0L)))

    // interval merge: a shared 9-token run yields two overlapping
    // duplicated 8-spans (positions 2 and 3) covering 9 tokens, not 16
    val overl = Seq(
      (1L, "a1 the quick brown fox jumps over the lazy dog b1"),
      (2L, "a2 the quick brown fox jumps over the lazy dog b2")
    ).toDF("doc_id", "text")
    val cov = Dedup.spanDupProfile(overl, spanTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(cov(1L) == ((2L, 9L)), s"overlapping spans must merge: $cov") // tokens 2..10
  }

  test("duplicateClusters: transitive groups resolve to the min-id keeper") {
    import spark.implicits._
    // components: {1,2,3} via chain 1-2, 2-3; {10,11}; singletons absent
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // a longer chain exercises multi-round propagation
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("a", "b")
    val got2 = Dedup.duplicateClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == (0L to 6L).map(_ -> 0L).toMap)
  }

  test("prefix-filtered jaccard == full-index jaccard (lossless by theorem)") {
    import spark.implicits._
    val boiler = "this document is provided as is without warranty"
    val docs = ((0L until 20L).map(i => (i, s"$boiler unique$i alpha$i beta$i gamma$i delta$i")) ++ Seq(
      (100L, "rare tokens shared alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "rare tokens shared alpha beta gamma delta epsilon zeta eta iota"),
      (102L, "rare tokens shared alpha beta gamma delta epsilon zeta eta theta")
    )).toDF("doc_id", "text")
    val sets = Dedup.shingleSets(docs)
    for (t <- Seq(200L, 300L, 500L, 900L)) {
      val full = Dedup.ngramJaccardPairsFromSets(sets, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val pref = Dedup.ngramJaccardPairsPrefixFiltered(sets, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(pref == full, s"threshold $t: prefix filter lost/invented pairs")
    }
  }

  test("alternating-star clusters == propagation clusters (clique, chain, forest)") {
    import spark.implicits._
    def labels(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val a = Dedup.duplicateClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = Dedup.duplicateClustersAltStar(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a == b, s"star construction diverged from propagation: $a vs $b")
      b
    }
    // near-clique (the banding shape)
    assert(labels(Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L)).toDF("a", "b"))
      == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // a 30-node chain: diameter 30, the case the O(log n) construction is
    // for — propagation needs ~30 rounds here, the star loop a handful
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    assert(labels(chain) == (0L to 30L).map(_ -> 0L).toMap)
    // forest with shuffled ids and reversed pair order
    val forest = Seq((7L, 3L), (3L, 9L), (20L, 15L), (40L, 41L), (41L, 15L)).toDF("a", "b")
    assert(labels(forest) ==
      Map(3L -> 3L, 7L -> 3L, 9L -> 3L, 15L -> 15L, 20L -> 15L, 40L -> 15L, 41L -> 15L))
  }

  test("longest shared span finds passage length, ignores sub-threshold boilerplate") {
    import spark.implicits._
    // a 20-token passage shared by docs 1 and 2 at DIFFERENT offsets; an
    // 8-token boilerplate line shared by docs 1 and 3 (below minTokens=12)
    val passage = (1 to 20).map(i => s"p$i").mkString(" ")
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler one two $passage tail1 tail2"),
      (2L, s"lead1 $passage other words here"),
      (3L, s"$boiler completely different continuation of text")
    ).toDF("doc_id", "text")
    val runs = Dedup.longestSharedSpansFromPostings(Dedup.spanPostings(docs), minTokens = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(runs == Map((1L, 2L) -> 20L), s"got $runs")
    // the boilerplate pair IS present at an 8-token floor
    val all = Dedup.longestSharedSpansFromPostings(Dedup.spanPostings(docs), minTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(all((1L, 3L)) == 8L)
    assert(all((1L, 2L)) == 20L)
  }

  test("longest shared span: two disjoint shared passages are separate runs") {
    import spark.implicits._
    val p1 = (1 to 12).map(i => s"x$i").mkString(" ")
    val p2 = (1 to 14).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, s"$p1 mid1 mid2 mid3 $p2"),
      (2L, s"$p2 gap1 gap2 gap3 gap4 $p1")
    ).toDF("doc_id", "text")
    val r = Dedup.longestSharedSpansFromPostings(Dedup.spanPostings(docs), minTokens = 12)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(2) == 14L, s"longest must be the 14-token passage: $row")
    assert(row.getLong(3) == 2L, s"two maximal runs expected: $row")
  }

  test("minhash estimator panel: identical docs estimate and verify at 1000 exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "unrelated content entirely different words over here today now")
    ).toDF("doc_id", "text")
    val panel = Dedup.minhashEstimatePairsFromSets(Dedup.shingleSets(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // identical docs: every signature row matches, exact jaccard 1000, error 0
    assert(panel((1L, 2L)) == ((8L, 1000L, 1000L, 0L)))
    // the disjoint doc never becomes an LSH candidate of the pair
    assert(panel.keySet == Set((1L, 2L)))
  }

  test("sparse cosine: identical docs at exactly 1e6; stopword-only overlap pruned") {
    import spark.implicits._
    // rare-term docs identical up to token order (cosine ignores order);
    // doc 30 shares only ubiquitous tokens with everything else
    val common = "the of and is to"
    val docs = ((0L until 10L).map(i => (i, s"$common filler$i pad$i extra$i more$i")) ++ Seq(
      (20L, s"quantum lattice spectral manifold tensor eigen flux"),
      (21L, s"eigen flux tensor manifold spectral lattice quantum"),
      (30L, common)
    )).toDF("doc_id", "text")
    // 13 docs × 800‰ → df cap floor(10.4) = 10, pruning the df == 11 stopword set
    val pairs = Dedup.sparseCosinePairs(docs, thresholdCosSqX1e6 = 250000L, maxDfPermille = 800)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // identical multisets: dot² == na2·nb2 exactly → floor(1e6 · 1) == 1e6
    assert(pairs((20L, 21L)) == 1000000L)
    // `common` tokens have df == 11 > maxDf: docs sharing only those never
    // pair (each filler doc's other tokens are df == 1 < minDf)
    assert(pairs.keySet == Set((20L, 21L)), s"got ${pairs.keySet}")
  }

  test("simhash of identical docs is identical; hamming of disjoint docs > 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "completely different words entirely unrelated content here")
    ).toDF("doc_id", "text")
    val sh = Dedup.simhashes(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) > 0)
  }

  test("simhash band-frequency cut: drops exactly the pairs whose ONLY shared bands are hot") {
    // The unbounded 16-bit form's output is inherently quadratic
    // (birthday mass in a 65,536-point signature space) and is a
    // diagnostic only; the gate runs the DF-cut form. Semantics pin on a
    // real corpus slice: a pair survives the cut iff it shares at least
    // one band key whose posting list is within the cutoff.
    val sigs = Dedup.simhashSigs(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val cutoff = 4L
    val unbounded = Dedup.simhashPairsFromSigs(sigs, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val cut = Dedup.simhashPairsFromSigsDfCut(sigs, maxHamming = 1, maxBandFreq = cutoff)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // subset with identical hamming values (the cut changes candidate
    // generation, never the verified distance)
    cut.foreach { case (k, h) =>
      assert(unbounded.get(k).contains(h), s"dfcut invented or re-scored pair $k")
    }
    // reference hot-key set computed independently from the signatures
    val sigRows = sigs.collect().map(r => (r.getAs[Long]("id"),
      r.getAs[Long]("simhash"), r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    val postings = sigRows.flatMap { case (id, _, lo, hi) => Seq((0, lo) -> id, (1, hi) -> id) }
      .groupBy(_._1).view.mapValues(_.length).toMap
    def coolShared(a: Long, b: Long): Boolean = {
      val sa = sigRows.find(_._1 == a).get; val sb = sigRows.find(_._1 == b).get
      (sa._3 == sb._3 && postings((0, sa._3)) <= cutoff) ||
        (sa._4 == sb._4 && postings((1, sa._4)) <= cutoff)
    }
    unbounded.keys.foreach { case (a, b) =>
      assert(cut.contains((a, b)) == coolShared(a, b),
        s"pair ($a,$b): dfcut membership must equal shares-a-cool-band")
    }
    // the cut must actually bite on this corpus (hot keys exist at df > 4)
    assert(cut.size < unbounded.size, "expected the cutoff to prune at least one hot-band pair")
  }
}
