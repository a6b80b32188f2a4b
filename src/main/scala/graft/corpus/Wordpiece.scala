package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * WordPiece-style greedy tokenization (Wu et al. 2016; the BERT
 * tokenizer's inference rule) — the third tokenizer family next to
 * [[Bpe]] (bottom-up merges) and [[Unigram]] (min-token Viterbi): a
 * fixed vocabulary of word-INITIAL pieces and `##`-marked CONTINUATION
 * pieces, applied by maximal munch — at each position take the LONGEST
 * vocab piece that matches, emit it, advance. Greedy is what production
 * BERT tokenizers run (it needs no DP), and its segmentations genuinely
 * differ from the Viterbi ones — the gate pair makes the contrast
 * measurable on the same corpus.
 *
 * Deterministic by construction: the vocabulary is frequency-seeded
 * with total-order tie-breaks (freq desc, piece asc), all single
 * characters are kept in both initial and continuation form (so every
 * word segments — the char-fallback BERT achieves via [UNK] never
 * fires), and maximal munch has no ties (longest match is unique).
 * Everything replays exactly in the DuckDB oracle
 * (`text_wordpiece_vocab` / `text_wordpiece_apply`).
 *
 * Distributed shape: identical to [[Unigram]] — ONE corpus collapse to
 * word types, substring occurrences vocabulary-sized, the vocab
 * codebook-tier and broadcast, the greedy walk a per-row fold over the
 * match list (no UDF, no driver). Positional keying does the
 * initial/continuation split for free: an occurrence at s=0 joins as
 * `p`, an interior one as `'##' || p`.
 *
 * Reference anchor: the reference ships no tokenizer (SURVEY §2.7);
 * training-data-pipeline surface per the brief.
 */
object Wordpiece {

  /** Piece key of a substring occurrence: `p` word-initially,
    * `##p` elsewhere — the WordPiece continuation convention. */
  private def pieceKey: Column =
    when(col("s") === 0, col("p")).otherwise(concat(lit("##"), col("p")))

  /** Frequency-seeded vocabulary `(p)` over keyed occurrences: ALL
    * single chars in both forms (segmentability guarantee) + the top
    * `initK` word-initial and top `contK` continuation multi-char
    * pieces by (Σ wc, piece asc), ≥ `minFreq`. */
  def vocab(subs: DataFrame, initK: Int, contK: Int, minFreq: Long): DataFrame = {
    val keyed = subs.select(pieceKey.as("p"), col("wc"),
      (col("e") - col("s")).as("len"), col("s"))
    val chars = keyed.filter(col("len") === 1).select("p").distinct()
    def top(cond: Column, k: Int) = keyed
      .filter(col("len") >= 2 && cond)
      .groupBy("p").agg(sum(col("wc")).as("f"))
      .filter(col("f") >= minFreq)
      .orderBy(col("f").desc, col("p").asc)
      .limit(k)
      .select("p")
    chars.union(top(col("s") === 0, initK)).union(top(col("s") > 0, contK))
  }

  /** Maximal-munch segmentation of every word type: `(w, wc, pieces)`
    * with `##` on continuations. One broadcast join of the keyed
    * occurrences against the vocab, one word-keyed regroup, then the
    * greedy walk as a per-row fold: the state is the cut-position list,
    * each step appends the FARTHEST match end at the current frontier
    * (maximal munch; single-char fallback guarantees progress). */
  def segment(subs: DataFrame, vocab: DataFrame): DataFrame =
    segmented(subs.select(col("w"), col("wc"), col("s"), col("e"), pieceKey.as("p"))
      .join(broadcast(vocab), "p"))

  /** [[segment]] under a DRIVER-HELD piece set (codebook-tier by
    * construction — ≤ initK + contK + 2·alphabet entries at any scale):
    * the vocab enters the plan as an InSet literal, no broadcast-build
    * job. Equivalent to the DataFrame form because vocab pieces are
    * unique (the three vocab legs are pairwise disjoint). */
  def segment(subs: DataFrame, pieces: Seq[String]): DataFrame =
    segmented(subs.select(col("w"), col("wc"), col("s"), col("e"), pieceKey.as("p"))
      .filter(col("p").isInCollection(pieces)))

  private def segmented(matched: DataFrame): DataFrame =
    matched
      .groupBy("w")
      .agg(min(col("wc")).as("wc"),
        sort_array(collect_list(struct(col("s"), col("e")))).as("ms"))
      .withColumn("cuts", expr(
        """aggregate(sequence(1, length(w)), array(cast(0 as bigint)),
          |  (st, x) -> if(element_at(st, -1) >= length(w), st,
          |    st || array(array_max(transform(
          |      filter(ms, m -> m.s = element_at(st, -1)), m -> cast(m.e as bigint))))))"""
          .stripMargin))
      .select(col("w"), col("wc"), expr(
        """transform(sequence(1, size(cuts) - 1), i ->
          |  if(element_at(cuts, i) = 0,
          |     substring(w, 1, cast(element_at(cuts, i + 1) as int)),
          |     '##' || substring(w, cast(element_at(cuts, i) as int) + 1,
          |       cast(element_at(cuts, i + 1) - element_at(cuts, i) as int))))"""
          .stripMargin).as("pieces"))

  /** Build the vocabulary and report it with usage under the greedy
    * segmentation: `(rank, piece, piece_len, usage)` — rank by
    * (usage desc, piece asc); piece_len counts the RAW piece (## is
    * marking, not content). */
  def vocabReport(docs: DataFrame, maxLen: Int = 6, initK: Int = 40,
                  contK: Int = 40, minFreq: Long = 2): DataFrame =
    vocabReportFromTypes(Unigram.wordTypes(docs), maxLen, initK, contK, minFreq)

  /** [[vocabReport]] from an already-collapsed word-type table `(w, wc)`
    * — the stored-state entry point (see [[Unigram.trainFromTypes]]);
    * the streaming vocabulary twin serves BOTH tokenizer families from
    * one maintained type table. */
  def vocabReportFromTypes(wt: DataFrame, maxLen: Int = 6, initK: Int = 40,
                           contK: Int = 40, minFreq: Long = 2): DataFrame = {
    val subs = Unigram.substringOccurrences(wt, maxLen)
      .localCheckpoint()
    // the codebook-tier vocab is DRIVER-HELD (see segment(subs, pieces)):
    // one collect replaces the checkpoint + broadcast-build jobs
    val pieces = vocab(subs, initK, contK, minFreq)
      .collect().map(_.getString(0)).toIndexedSeq
    val use = segment(subs, pieces)
      .select(col("wc"), explode(col("pieces")).as("p"))
      .groupBy("p").agg(sum(col("wc")).as("usage"))
    val v = wt.sparkSession
      .createDataset(pieces)(org.apache.spark.sql.Encoders.STRING).toDF("p")
    val scored = v.join(use, Seq("p"), "left")
      .select(col("p"), coalesce(col("usage"), lit(0L)).as("usage"))
      .withColumn("neg_usage", -col("usage"))
    Ranking.globalRank(scored, Seq.empty, Seq("neg_usage", "p"), "rank")
      .select(col("rank"), col("p").as("piece"),
        length(regexp_replace(col("p"), "^##", "")).cast("long").as("piece_len"),
        col("usage"))
  }

  /** Greedy-tokenize and report per-source subword compression — the
    * same panel shape as `text_unigram_apply`/`text_bpe_apply`, so the
    * three tokenizer families are directly comparable on one corpus. */
  def applyPerSource(docs: DataFrame, maxLen: Int = 6, initK: Int = 40,
                     contK: Int = 40, minFreq: Long = 2): DataFrame = {
    val subs = Unigram.substringOccurrences(Unigram.wordTypes(docs), maxLen)
      .localCheckpoint()
    val pieces = vocab(subs, initK, contK, minFreq)
      .collect().map(_.getString(0)).toIndexedSeq
    val tok = segment(subs, pieces)
      .select(col("w"), size(col("pieces")).cast("long").as("n_tok"))
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
  // Sequential reference (test-only): WordpieceSpec pins the distributed
  // greedy walk and vocab build to this.
  // ---------------------------------------------------------------------

  /** Maximal munch, pure Scala. `vocab` holds keyed pieces (## form for
    * continuations). */
  private[graft] def segmentSequential(w: String, vocab: Set[String],
                                       maxLen: Int): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      var l = math.min(maxLen, w.length - pos)
      var found = -1
      while (l >= 1 && found < 0) {
        val raw = w.substring(pos, pos + l)
        val key = if (pos == 0) raw else "##" + raw
        if (vocab.contains(key)) found = l
        l -= 1
      }
      require(found > 0, s"unsegmentable at $pos in '$w'")
      out += (if (pos == 0) w.substring(0, found)
              else "##" + w.substring(pos, pos + found))
      pos += found
    }
    out.toList
  }
}
