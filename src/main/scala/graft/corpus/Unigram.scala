package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization" —
 * the SentencePiece unigram model), as iterated Spark aggregations: the
 * second tokenizer-training family of the LLM pipeline next to [[Bpe]].
 * Where BPE grows a vocabulary bottom-up by merging, unigram training
 * starts from a LARGE seed vocabulary of candidate pieces and
 * iteratively (1) segments the corpus with the current vocabulary,
 * (2) counts each piece's usage, and (3) PRUNES to the best pieces —
 * the segment/count/prune EM skeleton of the original algorithm.
 *
 * Deterministic integer variant (exact-oracle discipline): the
 * segmentation step is hard-EM — a min-token Viterbi (fewest pieces
 * wins; among minimal segmentations the tie-break prefers the LONGEST
 * last piece at every DP cell, i.e. the smallest back-pointer) instead
 * of float log-likelihood Viterbi, and the M-step keeps the top-K
 * pieces by integer usage (word-frequency-weighted occurrence count in
 * the chosen segmentations, ties by piece text). Single-character
 * pieces are never pruned, so every word stays segmentable — the same
 * guarantee SentencePiece enforces via required characters. Every
 * quantity is an integer and every tie-break a total order, so the
 * whole 3-round computation replays exactly in the DuckDB oracle
 * (`text_unigram_train` / `text_unigram_apply`).
 *
 * Distributed shape (the 100 TB story): the corpus collapses ONCE to
 * the word-TYPE frequency table — one shuffle carrying word types, not
 * occurrences (map-side partial counts), exactly like [[Bpe]]. All
 * later passes run on that vocabulary-sized table: the substring
 * explode is |type| × O(len × maxPieceLen) rows, the candidate seed is
 * a top-K (`TakeOrderedAndProject`, no global sort materialized), and
 * each EM round is ONE broadcast join of the codebook-tier vocabulary
 * against the substring table, one word-keyed regroup (which carries
 * the word frequency — no rejoin against the type table), and one
 * partial-aggregated usage count. The Viterbi DP itself is a per-row column expression (nested
 * higher-order functions — no UDF, no driver participation): documents
 * are never re-read after the first collapse and the driver collects
 * nothing.
 *
 * DP encoding: `dp(i) = cost(i) * F + back(i)` packs the token count
 * and the chosen back-pointer into one BIGINT so a single `array_min`
 * picks both the minimal cost AND the tie-broken back-pointer — the
 * oracle mirrors the identical encoding, making the tie-break
 * bit-exact across engines. `F = 100000` bounds supported word length
 * at 100k chars (a whitespace token beyond that is not a word — the
 * corpus collapse may cap length upstream; cost ≤ length keeps
 * `cost*F + back` far below 2^63).
 *
 * Reference anchor: the reference engine ships no tokenizer (its JS
 * projection engine — eventstorm/internal/projections/projection.go —
 * folds events without any text analysis); this operator extends the
 * engine for training-data curation per the brief.
 */
object Unigram {

  /** DP pack factor: `cost * F + back`. */
  val F = 100000L

  /** Word-TYPE frequency table `(w, wc)` — the single corpus collapse.
    * The DP packing supports words under F chars (100k); a longer
    * "word" is whitespace-starved junk, and the guard rides inside the
    * aggregation (the Importance precedent) so the build fails LOUDLY
    * instead of silently corrupting the packed tie-break. */
  def wordTypes(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg((count(lit(1)) + coalesce(expr(
        s"""CAST(assert_true(length(w) < $F,
           |  'unigram DP supports words under $F chars') AS BIGINT)"""
          .stripMargin), lit(0L))).as("wc"))

  /** Every substring occurrence of every word type up to `maxLen`:
    * `(w, wc, s, e, p)` with 0-based start `s`, exclusive end `e`.
    * Vocabulary-sized × O(len × maxLen) — never corpus-sized. */
  def substringOccurrences(wt: DataFrame, maxLen: Int): DataFrame =
    wt.select(col("w"), col("wc"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), i ->
           |  transform(sequence(1, least($maxLen, length(w) - i + 1)), l ->
           |    named_struct('s', i - 1, 'e', i + l - 1,
           |                 'p', substring(w, i, l)))))""".stripMargin)).as("m"))
      .select(col("w"), col("wc"),
        col("m.s").as("s"), col("m.e").as("e"), col("m.p").as("p"))

  /** Seed vocabulary `(p)`: ALL single characters (never pruned,
    * guarantees segmentability) plus the top `seedSize` multi-char
    * substrings by corpus frequency (Σ wc × occurrence multiplicity,
    * ≥ `minFreq`), ties by piece text. The top-K plans as
    * `TakeOrderedAndProject` — no global sort materializes. */
  def seedVocab(subs: DataFrame, seedSize: Int, minFreq: Long): DataFrame = {
    val chars = subs.filter(col("e") - col("s") === 1).select("p").distinct()
    val multi = subs.filter(length(col("p")) >= 2)
      .groupBy("p").agg(sum(col("wc")).as("f"))
      .filter(col("f") >= minFreq)
      .orderBy(col("f").desc, col("p").asc)
      .limit(seedSize)
      .select("p")
    chars.union(multi)
  }

  /** Min-token Viterbi segmentation of every word type under `vocab`:
    * `(w, wc, pieces)`. One broadcast join (vocab is codebook-tier by
    * construction: ≤ seedSize + |alphabet|), one word-keyed regroup,
    * then the DP + backtrace as per-row column expressions. `wc` rides
    * the regroup as `min` (constant per word) — rejoining the word-type
    * table here would add a word-type-sized shuffle join per EM round
    * for a value the substring table already carries. Single-char
    * pieces always match, so no word type drops out of the regroup. */
  def segment(subs: DataFrame, vocab: DataFrame): DataFrame =
    segmented(subs.join(broadcast(vocab), "p"))

  /** [[segment]] under a DRIVER-HELD piece set — the EM loop's form. The
    * vocabulary is codebook-tier BY CONSTRUCTION (≤ seedSize + alphabet
    * entries at any corpus scale — the same tier as the k-means centroid
    * and PQ codebook collects), so the round's piece set rides the plan
    * as an InSet literal instead of a broadcast-join leg: no broadcast
    * build job and no join in the per-round plan. Equivalent to the
    * DataFrame form because vocab pieces are unique (an inner join on a
    * unique key is a semi-join). */
  def segment(subs: DataFrame, pieces: Seq[String]): DataFrame =
    segmented(subs.filter(col("p").isInCollection(pieces)))

  private def segmented(matched: DataFrame): DataFrame = {
    matched
      .groupBy("w")
      .agg(min(col("wc")).as("wc"),
        sort_array(collect_list(struct(col("s"), col("e")))).as("ms"))
      // dp(i) = min tokens for prefix of length i, packed with the
      // winning back-pointer; array_min over the packed value resolves
      // cost first, then smallest back-pointer = longest last piece.
      .withColumn("dp", expr(
        s"""aggregate(sequence(1, length(w)), array(cast(0 as bigint)),
           |  (dp, x) -> dp || array(array_min(transform(filter(ms, m -> m.e = x),
           |    m -> (element_at(dp, m.s + 1) div $F + 1) * $F + m.s))))""".stripMargin))
      // backtrace: state = [current position as string, pieces…];
      // each step replaces the position with its back-pointer and
      // prepends the piece it crossed; stops (no-op) at position 0.
      .withColumn("bt", expr(
        s"""aggregate(sequence(1, length(w)), array(cast(length(w) as string)),
           |  (st, x) -> if(cast(element_at(st, 1) as int) = 0, st,
           |    concat(
           |      array(
           |        cast(element_at(dp, cast(element_at(st, 1) as int) + 1) % $F as string),
           |        substring(w,
           |          cast(element_at(dp, cast(element_at(st, 1) as int) + 1) % $F as int) + 1,
           |          cast(element_at(st, 1) as int)
           |            - cast(element_at(dp, cast(element_at(st, 1) as int) + 1) % $F as int))),
           |      slice(st, 2, size(st) - 1))))""".stripMargin))
      .select(col("w"), col("wc"),
        expr("slice(bt, 2, size(bt) - 1)").as("pieces"))
  }

  /** Piece-usage counts of a segmentation, weighted by word frequency:
    * `(p, usage)` — partial-aggregated, vocabulary-sized. */
  def usage(seg: DataFrame): DataFrame =
    seg.select(col("wc"), explode(col("pieces")).as("p"))
      .groupBy("p").agg(sum(col("wc")).as("usage"))

  /** One prune round: keep all single chars + the top `keepK`
    * multi-char pieces by (usage desc, piece asc), usage > 0. */
  def prune(vocab: DataFrame, use: DataFrame, keepK: Int): DataFrame = {
    val chars = vocab.filter(length(col("p")) === 1)
    val multi = use.filter(length(col("p")) >= 2 && col("usage") > 0)
      .orderBy(col("usage").desc, col("p").asc)
      .limit(keepK)
      .select("p")
    chars.union(multi)
  }

  /** Shared seed + EM-round loop over a substring-occurrence table:
    * the single training path [[train]] and [[tokenCounts]] both ride
    * (so the two can't drift apart). The vocabulary is codebook-tier at
    * every stage (≤ seedSize + alphabet rows, bounded by construction
    * at ANY corpus scale), so each round holds it on the DRIVER and the
    * round is ONE action — the previous per-round
    * `coalesce(1).localCheckpoint()` + broadcast-build pair (3 jobs per
    * round) collapses to a single top-K collect, and the piece set
    * enters the next round's plan as an InSet literal. The collect is
    * exactly the top-K the checkpoint materialized; order is a total
    * order (usage desc, piece asc / freq desc, piece asc), so the piece
    * SET — all any consumer reads — is unchanged. */
  private def trainVocab(subs: DataFrame, seedSize: Int, keepK: Int,
                         minFreq: Long, rounds: Int): Seq[String] = {
    var pieces = seedVocab(subs, seedSize, minFreq)
      .collect().map(_.getString(0)).toIndexedSeq
    // single chars are never pruned: the char set is invariant across
    // rounds (exactly prune()'s chars leg)
    val chars = pieces.filter(_.length == 1)
    for (_ <- 1 to rounds) {
      val kept = usage(segment(subs, pieces))
        .filter(length(col("p")) >= 2 && col("usage") > 0)
        .orderBy(col("usage").desc, col("p").asc)
        .limit(keepK)
        .select("p")
        .collect().map(_.getString(0)).toIndexedSeq
      pieces = chars ++ kept
    }
    pieces
  }

  /** Train the unigram vocabulary: seed → `rounds` segment/count/prune
    * rounds → one final segmentation pass for reported usage. Returns
    * `(rank, piece, piece_len, usage)` — rank 1-based by (usage desc,
    * piece asc) via [[Ranking.globalRank]] (no partitionBy-less
    * window even for this codebook-tier table). */
  def train(docs: DataFrame, maxLen: Int = 6, seedSize: Int = 200,
            keepK: Int = 60, minFreq: Long = 2, rounds: Int = 2): DataFrame =
    trainFromTypes(wordTypes(docs), maxLen, seedSize, keepK, minFreq, rounds)

  /** [[train]] from an ALREADY-COLLAPSED word-type frequency table
    * `(w, wc)` — the entry point for callers that maintain the type
    * table as stored state (the streaming vocabulary twin
    * [[graft.streaming.StreamingVocab]]): training never re-reads the
    * corpus, only the vocabulary-scale type table. */
  def trainFromTypes(wt: DataFrame, maxLen: Int = 6, seedSize: Int = 200,
                     keepK: Int = 60, minFreq: Long = 2, rounds: Int = 2): DataFrame = {
    val subs = substringOccurrences(wt, maxLen).localCheckpoint()
    val pieces = trainVocab(subs, seedSize, keepK, minFreq, rounds)
    val finalUse = usage(segment(subs, pieces))
    // the trained piece set as a local relation (codebook-tier) for the
    // reported-usage outer join — no scan or checkpoint behind it
    val vocab = wt.sparkSession
      .createDataset(pieces)(org.apache.spark.sql.Encoders.STRING).toDF("p")
    val scored = vocab.join(finalUse, Seq("p"), "left")
      .select(col("p"), coalesce(col("usage"), lit(0L)).as("usage"))
      .withColumn("neg_usage", -col("usage"))
    Ranking.globalRank(scored, Seq.empty, Seq("neg_usage", "p"), "rank")
      .select(col("rank"), col("p").as("piece"),
        length(col("p")).cast("long").as("piece_len"), col("usage"))
  }

  /** Train on `docs` and return the per-word-TYPE token counts
    * `(w, n_tok)` under the trained vocabulary — the reusable inference
    * core ([[applyPerSource]] and the e2e tokenize pipeline both ride
    * it; the fold never runs per occurrence). */
  def tokenCounts(docs: DataFrame, maxLen: Int = 6, seedSize: Int = 200,
                  keepK: Int = 60, minFreq: Long = 2, rounds: Int = 2): DataFrame = {
    val subs = substringOccurrences(wordTypes(docs), maxLen).localCheckpoint()
    segment(subs, trainVocab(subs, seedSize, keepK, minFreq, rounds): Seq[String])
      .select(col("w"), size(col("pieces")).cast("long").as("n_tok"))
  }

  /** Tokenize the corpus with the trained vocabulary and report
    * per-source subword compression — the inference side, mirroring
    * `text_bpe_apply`'s shape: `(source, n_words, n_chars, n_subwords,
    * compression_permille)`. Per-word token counts come from ONE
    * segmentation of the word-TYPE table ([[tokenCounts]]), then join
    * the per-(source, word) frequency table — the fold never runs per
    * occurrence. */
  def applyPerSource(docs: DataFrame, maxLen: Int = 6, seedSize: Int = 200,
                     keepK: Int = 60, minFreq: Long = 2, rounds: Int = 2): DataFrame = {
    val tok = tokenCounts(docs, maxLen, seedSize, keepK, minFreq, rounds)
    val st = docs
      .select(col("source"), explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("source", "w").agg(count(lit(1)).as("swc"))
    st.join(tok, "w")
      .groupBy("source")
      .agg(sum(col("swc")).as("n_words"),
        sum(col("swc") * length(col("w"))).as("n_chars"),
        sum(col("swc") * col("n_tok")).as("n_subwords"))
      .withColumn("compression_permille",
        expr("(1000 * n_subwords) div n_chars"))
  }

  // ---------------------------------------------------------------------
  // Sequential reference (test-only): the same algorithm as plain Scala
  // over a collected word list — UnigramSpec pins the distributed train
  // and apply to it on several corpora, including adversarial tie cases.
  // ---------------------------------------------------------------------

  /** Min-token Viterbi with the packed tie-break, pure Scala. */
  private[graft] def segmentSequential(w: String, vocab: Set[String],
                                       maxLen: Int): Seq[String] = {
    val n = w.length
    val dp = new Array[Long](n + 1)
    for (i <- 1 to n) {
      var best = Long.MaxValue
      var s = math.max(0, i - math.max(maxLen, 1))
      // single chars are always in vocab, so a match always exists
      while (s < i) {
        if (vocab.contains(w.substring(s, i))) {
          val v = (dp(s) / F + 1) * F + s
          if (v < best) best = v
        }
        s += 1
      }
      dp(i) = best
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val back = (dp(pos) % F).toInt
      w.substring(back, pos) +=: out
      pos = back
    }
    out.toList
  }

  /** Sequential train: `(rank, piece, piece_len, usage)` rows. */
  private[graft] def trainSequential(words: Seq[(String, Long)], maxLen: Int,
                                     seedSize: Int, keepK: Int, minFreq: Long,
                                     rounds: Int): Seq[(Long, String, Long, Long)] = {
    val chars = words.flatMap(_._1.map(_.toString)).toSet
    val multiFreq = scala.collection.mutable.Map.empty[String, Long]
    for ((w, wc) <- words; i <- 0 until w.length;
         l <- 2 to math.min(maxLen, w.length - i))
      multiFreq(w.substring(i, i + l)) = multiFreq.getOrElse(w.substring(i, i + l), 0L) + wc
    val seed = multiFreq.toSeq.filter(_._2 >= minFreq)
      .sortBy { case (p, f) => (-f, p) }.take(seedSize).map(_._1)
    var vocab = chars ++ seed
    def useCount(v: Set[String]): Map[String, Long] = {
      val u = scala.collection.mutable.Map.empty[String, Long]
      for ((w, wc) <- words; p <- segmentSequential(w, v, maxLen))
        u(p) = u.getOrElse(p, 0L) + wc
      u.toMap
    }
    for (_ <- 1 to rounds) {
      val u = useCount(vocab)
      vocab = chars ++ u.toSeq
        .filter { case (p, n) => p.length >= 2 && n > 0 }
        .sortBy { case (p, n) => (-n, p) }.take(keepK).map(_._1)
    }
    val finalUse = useCount(vocab)
    vocab.toSeq
      .map(p => (p, finalUse.getOrElse(p, 0L)))
      .sortBy { case (p, u) => (-u, p) }
      .zipWithIndex
      .map { case ((p, u), i) => ((i + 1).toLong, p, p.length.toLong, u) }
  }
}
