package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, Hashing}

/**
 * Verify-gate queries for the dedup suite over `documents`. The DuckDB
 * oracles recompute the identical integer hash pipelines (same polynomial
 * hashes mod the same prime, same banding), so candidate generation and
 * verification match exactly across engines.
 */
object DedupQueries {

  /** The deterministic 25% validation subset (signature tables key docs by
    * `id`); per-doc signatures are unchanged by the filter, so subset
    * results equal the parent pipeline restricted to subset docs. */
  private def sub4(sets: DataFrame): DataFrame = sets.filter(col("id") % 4 === 0)

  // the shingle-set / simhash signature passes are shared across the pair
  // queries via Tables' per-(session, dir) memo — computed once per corpus
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> { (s: SparkSession, dir: String) =>
      Dedup.exact(Tables.docs(s, dir)).orderBy("content_md5")
    },
    // NORMALIZED exact dedup — the variant every production pipeline
    // runs FIRST: lowercase, punctuation stripped, whitespace runs
    // collapsed, so trivially-reformatted copies (case, spacing,
    // trailing punctuation) collapse into one md5 group that raw
    // dedup_exact misses. Same map-only + one keys-shuffle plan; the
    // normalization is a codegen'd regexp chain, no UDF.
    "dedup_exact_norm" -> { (s: SparkSession, dir: String) =>
      val norm = regexp_replace(
        regexp_replace(lower(trim(col("text"))), "[.,!?;:]", ""), "\\s+", " ")
      Tables.docs(s, dir)
        .select(col("doc_id"), md5(norm).as("content_md5"))
        .groupBy("content_md5")
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy("content_md5")
    },
    "dedup_ngram_jaccard" -> { (s: SparkSession, dir: String) =>
      Dedup.ngramJaccardPairsFromSets(Tables.shingleSets(s, dir), thresholdX1000 = 300)
        .orderBy("a", "b")
    },
    "dedup_minhash_lsh" -> { (s: SparkSession, dir: String) =>
      Dedup.minhashLshPairsFromSets(Tables.shingleSets(s, dir), thresholdX1000 = 300)
        .orderBy("a", "b")
    },
    // prefix-filtered candidate generation, PROVABLY lossless (unlike the
    // DF cutoff): pinned to the full-index oracle verbatim
    "dedup_jaccard_prefix" -> { (s: SparkSession, dir: String) =>
      Dedup.ngramJaccardPairsPrefixFiltered(Tables.shingleSets(s, dir), thresholdX1000 = 300)
        .orderBy("a", "b")
    },
    // the petabyte-scale variant: hot shingles (df > 5) pruned from the
    // candidate index; Jaccard arithmetic unchanged
    "dedup_ngram_jaccard_dfcut" -> { (s: SparkSession, dir: String) =>
      Dedup.ngramJaccardPairsFromSets(Tables.shingleSets(s, dir), thresholdX1000 = 300,
        maxShingleDf = Some(5)).orderBy("a", "b")
    },
    // THRESHOLD SWEEP: the dedup-aggressiveness curve — for each Jaccard
    // cutoff 100‰..900‰, how many near-dup pairs fire and how many
    // documents they touch. This is the panel a curation run reads to
    // PICK its threshold before committing to a dedup pass. ONE pair
    // table (the exact inverted-index join at the loosest cutoff) is
    // computed, then fanned ≤9× by an array-filter explode — the sweep
    // costs one pair pass, not nine. Pair tables are near-dup-mass
    // sized, so the fan-out and both rollups are tiny at any corpus
    // scale; thresholds with zero surviving pairs drop out (both
    // engines by the same construction).
    "dedup_threshold_curve" -> { (s: SparkSession, dir: String) =>
      val ts = (100L to 900L by 100L).map(lit(_))
      // localCheckpoint: the pair table feeds TWO rollups — without it
      // the inverted-index self-join would execute twice (ReuseExchange
      // only dedups the shuffle subtrees, not the join above them)
      val base = Dedup
        .ngramJaccardPairsFromSets(Tables.shingleSets(s, dir), thresholdX1000 = 100)
        .select(col("a"), col("b"),
          explode(filter(array(ts: _*), t => col("jaccard_x1000") >= t)).as("threshold"))
        .localCheckpoint()
      val nPairs = base.groupBy("threshold").agg(count(lit(1)).as("n_pairs"))
      val nDocs = base
        .select(col("threshold"), explode(array(col("a"), col("b"))).as("doc"))
        .groupBy("threshold").agg(countDistinct(col("doc")).as("n_docs"))
      nPairs.join(nDocs, Seq("threshold")).orderBy("threshold")
    },
    // 16-bit simhash with the band-frequency (DF-cut) bound: posting
    // lists over `maxBandFreq` are birthday mass in the 8-bit band key
    // space, not near-dup clusters, and are dropped before the self-join
    // — candidate output is bounded by the band-key SPACE (512·c²/2),
    // not the corpus, so the gate stays sub-quadratic at any scale. The
    // unbounded 16-bit form's output is inherently ~n²/2^16 (identical-
    // signature birthday pairs — scale probe exp_rows 2.03) and is
    // demoted to a spec-pinned diagnostic (DedupSpec); the 62-bit wide
    // form below is the production shape.
    "dedup_simhash_dfcut" -> { (s: SparkSession, dir: String) =>
      Dedup.simhashPairsFromSigsDfCut(Tables.simhashSigs(s, dir),
        maxHamming = 1, maxBandFreq = 16).orderBy("a", "b")
    },
    // the corpus-scale width: 62-bit fingerprint, 4 × 16-bit bands,
    // hamming <= 3. The 16-bit form's pair output grows ~n² on the
    // natural sf ladder (scale_probe.json: 347,788 pairs at sf0.1 —
    // birthday collisions in an 8-bit band key, not near-dups); 16-bit
    // band keys cut that mass 256× while every hamming<=3 near-dup
    // still shares >= 1 band by pigeonhole.
    "dedup_simhash_wide" -> { (s: SparkSession, dir: String) =>
      Dedup.simhashPairsWideFromSigs(Tables.simhashWideSigs(s, dir), maxHamming = 3)
        .orderBy("a", "b")
    },
    // the step after pair generation: transitive duplicate groups, one
    // keeper per component (min id), over the minhash near-dup pairs
    "dedup_clusters" -> { (s: SparkSession, dir: String) =>
      Dedup.duplicateClusters(
        Dedup.minhashLshPairsFromSets(Tables.shingleSets(s, dir), thresholdX1000 = 300))
        .orderBy("id")
    },
    // triangles of the near-dup graph — the cluster-cohesion metric: a
    // clique-ish component (true duplicate group) is triangle-dense, a
    // chain (transitive false positives from banding) has none. Canonical
    // a<b pairs make each triangle enumerate exactly once as an ordered
    // wedge join (p1.b = p2.a) + closing-edge check — the node-iterator
    // algorithm; joins stay on the PAIR set (two shuffles of id pairs),
    // documents never move
    "graph_triangles" -> { (s: SparkSession, dir: String) =>
      val pairs = Dedup
        .minhashLshPairsFromSets(Tables.shingleSets(s, dir), thresholdX1000 = 300)
        .select("a", "b")
      val p2 = pairs.select(col("a").as("b"), col("b").as("c"))
      val p3 = pairs.select(col("a").as("a3"), col("b").as("c3"))
      pairs.join(p2, "b")
        .join(p3, col("a") === col("a3") && col("c") === col("c3"))
        .select(col("a"), col("b"), col("c"))
        .orderBy("a", "b", "c")
    },
    // LABEL PROPAGATION over the near-dup graph: seed 20% of docs with
    // their source label and flood majority-vote labels outward 3 rounds
    // (graft.sim.Graph.labelPropagate) — the weak-supervision op that
    // labels the unlabeled bulk of a corpus from a trusted subset. The
    // graph is the banded-minhash pair set (bounded candidates, never
    // all-pairs); each round costs one edges⋈labeled join + one
    // partial-aggregated vote count + a struct-min argmax (no window).
    // Frozen-once-assigned labels + (count desc, label asc) tie-break
    // make the flood deterministic and fully value-oracled.
    "graph_label_prop" -> { (s: SparkSession, dir: String) =>
      val pairs = Dedup
        .minhashLshPairsFromSets(Tables.shingleSets(s, dir), thresholdX1000 = 300)
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      val seeds = Tables.docs(s, dir).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("node"), col("source").as("label"))
      graft.sim.Graph.labelPropagate(edges, seeds, rounds = 3)
        .orderBy("node")
    },
    // INCREMENTAL cluster maintenance: yesterday's stored labeling (the
    // 90% "corpus" split) + today's delta pairs (new-vs-corpus band
    // collisions + new-vs-new) through Dedup.incrementalClusters — must
    // land on EXACTLY the full-recompute labeling (same recursive-CTE
    // oracle as dedup_clusters, verbatim). The standing corpus's banded
    // signatures and labels come from the Tables memo — at 100 TB they
    // ARE stored tables (that's the point of incremental maintenance),
    // so the warm measurement is the operation's real nightly cost: ONE
    // minhash pass over the arriving split, the delta pair joins, and
    // the star merge. QueryPlanSpec pins the warm pass count to exactly
    // 1 (the delta side).
    "dedup_clusters_incr" -> { (s: SparkSession, dir: String) =>
      val newSets = Tables.shingleSets(s, dir).filter(col("id") % 10 === 0)
      val newBanded = Dedup.bandedSignatures(newSets)
      val delta = Dedup
        .minhashLshPairsBetweenBanded(newBanded, newSets,
          Tables.oldBanded(s, dir), Tables.oldSets(s, dir), thresholdX1000 = 300)
        .unionByName(
          Dedup.minhashLshPairsFromBanded(newBanded, newSets, thresholdX1000 = 300))
      Dedup.incrementalClusters(Tables.oldLabels(s, dir), delta).orderBy("id")
    },
    // same clusters via alternating large-star/small-star (Kiveris et al.)
    // — O(log n) rounds instead of O(diameter); the variant to reach for
    // when components are chains, not the near-cliques banding produces.
    // Same oracle as dedup_clusters: both must produce the min-id labeling
    "dedup_clusters_ls" -> { (s: SparkSession, dir: String) =>
      Dedup.duplicateClustersAltStar(
        Dedup.minhashLshPairsFromSets(Tables.shingleSets(s, dir), thresholdX1000 = 300))
        .orderBy("id")
    },
    // DEDUP-RATE REPORT by source: what fraction of each source's docs
    // are near-dup cluster LOSERS (member ≠ keeper) — the per-source
    // quality dashboard a curation run publishes. The cluster table is
    // tiny (only docs that appear in a pair); documents join it by key
    // (broadcastable side), one rollup shuffle on source.
    // QUALITY-AWARE CANONICAL SELECTION: inside each near-dup cluster,
    // keep the HIGHEST-QUALITY member (tie → lowest id), not the lowest
    // id — what a curation pass actually wants (the best-written copy
    // survives, boilerplate-laden mirrors drop). The cluster table is
    // tiny (docs appearing in a pair); quality joins by doc key, the
    // per-cluster argmax is a struct-max aggregation (no window sort),
    // and the winner table broadcasts back. Fully value-oracled.
    "dedup_keep_best" -> { (s: SparkSession, dir: String) =>
      val clusters = Dedup.duplicateClusters(
        Dedup.minhashLshPairsFromSets(Tables.shingleSets(s, dir), thresholdX1000 = 300))
        .select(col("id"), col("keeper").as("cluster"))
      val q = Tables.docs(s, dir).select(col("doc_id"),
        graft.functions.TextFunctions.qualityScoreX1000(col("text")).as("qx"))
      val m = clusters.join(q, col("id") === col("doc_id"))
        .select(col("id"), col("cluster"), col("qx"))
      val best = m.groupBy(col("cluster"))
        .agg(max(struct(col("qx").as("qx"), (col("id") * lit(-1L)).as("nid"))).as("b"))
        .select(col("cluster").as("bc"),
          (col("b.nid") * lit(-1L)).as("best_id"))
      // merge, not broadcast: the winner table is one row per CLUSTER —
      // dup-mass sized, corpus-scale at real web dup rates (30-50% of
      // docs are near-dup members); the merge join rides the cluster
      // partitioning the argmax groupBy just produced
      m.join(best.hint("merge"), col("cluster") === col("bc"))
        .select(col("id"), col("cluster"), col("qx"), col("best_id"),
          when(col("id") === col("best_id"), 1L).otherwise(0L).as("keep"))
        .orderBy("id")
    },
    "dedup_rate_by_source" -> { (s: SparkSession, dir: String) =>
      val losers = Dedup.duplicateClusters(
        Dedup.minhashLshPairsFromSets(Tables.shingleSets(s, dir), thresholdX1000 = 300))
        .filter(col("id") =!= col("keeper"))
        .select(col("id"))
      Tables.docs(s, dir)
        // merge, not broadcast: the loser set is corpus-scale at real
        // web dup rates (same hazard class as the curation report tail)
        .join(losers.hint("merge"), col("doc_id") === col("id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), count(col("id")).as("n_dupes"),
          expr("(1000 * count(id)) div count(1)").as("dup_permille"))
        .orderBy("source")
    },
    // winnowing (MOSS) passage fingerprints: sorted distinct window-of-4
    // minima over the positional 3-gram hashes — local-overlap detection
    // at a ~2/(w+1) storage budget (map-only graft_winnow kernel)
    "dedup_winnow_fps" -> { (s: SparkSession, dir: String) =>
      Tables.winnowPostings(s, dir).orderBy("doc_id", "fp")
    },
    // shared-passage candidates: pairs sharing >= 5 winnow fingerprints
    // (inverted-index equality join on the fingerprint key — the same
    // posting-join family as dedup_ngram_jaccard, documents never move)
    "dedup_winnow_pairs" -> { (s: SparkSession, dir: String) =>
      graft.dedup.Winnow.sharedPairsFromPostings(Tables.winnowPostings(s, dir), minShared = 5)
        .orderBy("a", "b")
    },
    // fuzzy (edit-distance) near-dup: per-language, blocked on the
    // 8-char text prefix, exact Levenshtein over the 32-char head of the
    // candidates. The blocking join touches only same-prefix pairs (the
    // classic cheap-key → expensive-verify ladder: prefix equality →
    // DP edit distance); restricted to one language partition — dedup
    // runs per language in a real corpus, and it keeps the distance
    // ASCII-only (engines differ on multi-byte grapheme handling).
    // incremental ingest dedup: the arriving batch (doc_id % 10 == 0 —
    // a deterministic 10% stand-in for the nightly delta) deduped
    // AGAINST the standing corpus via the banded new×corpus join; per
    // new doc, how many corpus near-dups it has and the best match. At
    // scale the corpus banding is a stored index — only the batch side
    // is computed per ingest.
    "dedup_incremental" -> { (s: SparkSession, dir: String) =>
      val sets = Tables.shingleSets(s, dir)
      val fresh = sets.filter(col("id") % 10 === 0)
      val corpus = sets.filter(col("id") % 10 =!= 0)
      Dedup.minhashLshPairsBetween(fresh, corpus, thresholdX1000 = 300)
        .groupBy(col("a"))
        .agg(count(lit(1)).as("n_matches"), min(col("b")).as("first_match"),
          max(col("jaccard_x1000")).as("best_jaccard_x1000"))
        .select(col("a").as("doc_id"), col("n_matches"), col("first_match"),
          col("best_jaccard_x1000"))
        .orderBy("doc_id")
    },
    // CCNet-style line-grain boilerplate: per-doc line counts + how many
    // of its 4-token lines are corpus-frequent (df >= 3). The detection
    // report (the removal decision input).
    "dedup_lines" -> { (s: SparkSession, dir: String) =>
      Dedup.lineBoilerplateFromLines(Tables.docLines(s, dir), minDf = 3)
        .orderBy("doc_id")
    },
    // ... and the cleaning itself: documents with boilerplate lines
    // stripped, survivors rejoined in order
    "dedup_lines_strip" -> { (s: SparkSession, dir: String) =>
      Dedup.stripBoilerplateFromLines(Tables.docLines(s, dir), minDf = 3)
        .orderBy("doc_id")
    },
    // Lee-et-al-style EXACT substring dedup: verbatim 8-token spans
    // shared across documents, found as a posting-list aggregation (the
    // distributed stand-in for the suffix-array pass) — the span
    // blocklist plus the per-doc contamination profile
    "dedup_spans" -> { (s: SparkSession, dir: String) =>
      Dedup.duplicateSpansFromPostings(Tables.spanPostings(s, dir), minDocs = 2)
        .orderBy("span_h")
    },
    "dedup_span_profile" -> { (s: SparkSession, dir: String) =>
      Dedup.spanDupProfileFromPostings(Tables.spanPostings(s, dir))
        .orderBy("doc_id")
    },
    // ... and the WITHIN-document half: spans repeated >= 2 times inside
    // one document (self-boilerplate). Two partial-agg groupBys on
    // doc-local keys — map-side combine does almost all the work
    "dedup_spans_withindoc" -> { (s: SparkSession, dir: String) =>
      Dedup.withinDocRepeatsFromPostings(Tables.spanPostings(s, dir))
        .orderBy("doc_id")
    },
    // asymmetric containment (near-superset detection): intersection over
    // the SMALLER set — catches quoted-whole / concatenation cases whose
    // Jaccard is far below any dedup threshold. Same inverted-index join
    // plan (and memoized shingle sets) as dedup_ngram_jaccard
    "dedup_containment" -> { (s: SparkSession, dir: String) =>
      Dedup.containmentPairsFromSets(Tables.shingleSets(s, dir), thresholdX1000 = 600)
        .orderBy("a", "b")
    },
    // contamination DEPTH: longest run of consecutive matching 8-token
    // spans per doc pair (alignment-diagonal islands over the positional
    // posting join) — separates "share one boilerplate sentence" from
    // "one document embeds the other". Windows partition by (a, b,
    // diagonal); the span join is the inverted-index shape with the DF
    // cutoff as its scale knob
    "dedup_longest_span" -> { (s: SparkSession, dir: String) =>
      Dedup.longestSharedSpansFromPostings(Tables.spanPostings(s, dir), minTokens = 12)
        .orderBy("a", "b")
    },
    // the minhash family's drift alarm (sim_recall's role for the ANN
    // quantizers): per LSH candidate pair, signature-estimated vs exact
    // Jaccard with absolute error — estimator quality as a value-oracled
    // quantity, since both engines build identical integer signatures
    "dedup_minhash_estimate" -> { (s: SparkSession, dir: String) =>
      Dedup.minhashEstimatePairsFromSets(Tables.shingleSets(s, dir))
        .orderBy("a", "b")
    },
    // BANDED-LSH PAIR RECALL vs the exact inverted-index truth, per
    // similarity band — the third leg of the dedup drift-alarm family
    // (minhash_estimate gates the ESTIMATOR, sim_recall the ANN paths;
    // this gates CANDIDATE GENERATION itself): of the pairs the full
    // index proves ≥ threshold, what fraction did banding surface, and
    // where does it thin (recall must rise with the band — the LSH
    // S-curve made measurable). Composes the two memoized pair
    // generators; the left join keys on the (small) true pair set.
    "dedup_lsh_recall" -> { (s: SparkSession, dir: String) =>
      val truth = Dedup.ngramJaccardPairsFromSets(Tables.shingleSets(s, dir),
        thresholdX1000 = 300)
      val lsh = Dedup.minhashLshPairsFromSets(Tables.shingleSets(s, dir),
        thresholdX1000 = 300)
        .select(col("a"), col("b"), lit(1L).as("found"))
      truth.join(lsh, Seq("a", "b"), "left")
        .select(expr("jaccard_x1000 div 100").as("band"),
          coalesce(col("found"), lit(0L)).as("found"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_true"), sum(col("found")).as("n_found"))
        .select(col("band"), col("n_true"), col("n_found"),
          expr("(1000 * n_found) div n_true").as("recall_permille"))
        .orderBy("band")
    },
    // ---- deterministic 25% subset (doc_id % 4 == 0) scale-validation
    // forms: the parent pair/cluster oracles are quadratic DuckDB CTEs
    // that cannot finish at sf0.1; these keep candidate generation +
    // verification arithmetic IDENTICAL while shrinking the oracle's
    // join ~16x, so the family gets full value comparison at 10x scale
    // too (sf0.1 run record in STATUS.md), not just the sf0.01 gate.
    "dedup_ngram_jaccard_sub" -> { (s: SparkSession, dir: String) =>
      Dedup.ngramJaccardPairsFromSets(sub4(Tables.shingleSets(s, dir)), thresholdX1000 = 300)
        .orderBy("a", "b")
    },
    "dedup_minhash_lsh_sub" -> { (s: SparkSession, dir: String) =>
      Dedup.minhashLshPairsFromSets(sub4(Tables.shingleSets(s, dir)), thresholdX1000 = 300)
        .orderBy("a", "b")
    },
    "dedup_clusters_sub" -> { (s: SparkSession, dir: String) =>
      Dedup.duplicateClusters(
        Dedup.minhashLshPairsFromSets(sub4(Tables.shingleSets(s, dir)), thresholdX1000 = 300))
        .orderBy("id")
    },
    "dedup_clusters_ls_sub" -> { (s: SparkSession, dir: String) =>
      Dedup.duplicateClustersAltStar(
        Dedup.minhashLshPairsFromSets(sub4(Tables.shingleSets(s, dir)), thresholdX1000 = 300))
        .orderBy("id")
    },
    "graph_triangles_sub" -> { (s: SparkSession, dir: String) =>
      val pairs = Dedup
        .minhashLshPairsFromSets(sub4(Tables.shingleSets(s, dir)), thresholdX1000 = 300)
        .select("a", "b")
      val p2 = pairs.select(col("a").as("b"), col("b").as("c"))
      val p3 = pairs.select(col("a").as("a3"), col("b").as("c3"))
      pairs.join(p2, "b")
        .join(p3, col("a") === col("a3") && col("c") === col("c3"))
        .select(col("a"), col("b"), col("c"))
        .orderBy("a", "b", "c")
    },
    "dedup_simhash_dfcut_sub" -> { (s: SparkSession, dir: String) =>
      Dedup.simhashPairsFromSigsDfCut(sub4(Tables.simhashSigs(s, dir)),
        maxHamming = 1, maxBandFreq = 16).orderBy("a", "b")
    },
    "dedup_editdist" -> { (s: SparkSession, dir: String) =>
      import org.apache.spark.sql.functions.{col, levenshtein, substring}
      val t = Tables.docs(s, dir).filter(col("lang") === "en")
        .select(col("doc_id"), substring(col("text"), 1, 32).as("t32"),
          substring(col("text"), 1, 8).as("blk"))
      val l = t.select(col("blk"), col("doc_id").as("a"), col("t32").as("ta"))
      val r = t.select(col("blk").as("blk_b"), col("doc_id").as("b"), col("t32").as("tb"))
      l.join(r, col("blk") === col("blk_b") && col("a") < col("b"))
        .withColumn("dist", levenshtein(col("ta"), col("tb")).cast("long"))
        .filter(col("dist") <= 12)
        .select(col("a"), col("b"), col("dist"))
        .orderBy("a", "b")
    },
    // CONTENT-DEFINED CHUNKING dedup (LBFS/restic-style): boundaries
    // where an 8-char rolling hash % 64 == 0, so chunk edges synchronize
    // on content and shared passages produce identical chunks at ANY
    // offset — the blob/storage-level dedup complement of the token-span
    // family. Chunking is a pure map (one codepoint pass per doc);
    // only (md5, len) digests shuffle, never text.
    "dedup_cdc_chunks" -> { (s: SparkSession, dir: String) =>
      graft.dedup.Cdc.duplicatedChunks(Tables.docs(s, dir)).orderBy("chunk_md5")
    }
  )

  // ---- oracle SQL building blocks (mirror Hashing exactly) ----

  private val P = Hashing.P

  /** CTEs: toks → per-token hashes → distinct 3-gram shingle hashes.
    * (Body without the WITH keyword so callers can prepend RECURSIVE.) */
  /** Shared CTE prefix: per-doc token list + per-token rolling hashes —
    * the common root of the shingle (minhash) and winnow chains, exposed
    * so composite oracles (corpus funnel) can mount both tails on ONE
    * definition without CTE-name collisions. */
  private[queries] val tokHashCtes =
    s"""t AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents
       |), thc AS (
       |  SELECT doc_id, list_transform(toks, tk ->
       |    list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(string_split(tk, ''), c -> CAST(ascii(c) AS BIGINT))),
       |      (h, c) -> (h * 31 + c) % $P)) AS th
       |  FROM t
       |)""".stripMargin

  private val SHB =
    s"""$tokHashCtes, shs AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, greatest(len(th) - 2, 0) + 1),
       |      i -> ((th[i] * 31 + th[i+1]) % $P * 31 + th[i+2]) % $P)) AS sh
       |  FROM thc
       |)""".stripMargin

  private val SH = s"WITH $SHB"

  /** The winnow chain WITHOUT the shared token-hash prefix — mounts on
    * [[tokHashCtes]] (directly or via the minhash chain, which begins with
    * the same prefix) to end in `post(doc_id, fp)`. */
  private[queries] val winnowTail =
    s"""osh AS (
       |  SELECT doc_id,
       |    list_transform(range(1, greatest(len(th) - 2, 0) + 1),
       |      i -> ((th[i] * 31 + th[i+1]) % $P * 31 + th[i+2]) % $P) AS h
       |  FROM thc
       |), wf AS (
       |  SELECT doc_id,
       |    list_sort(list_distinct(list_transform(range(1, greatest(len(h) - 3, 1) + 1),
       |      j -> list_min(h[j:j+3])))) AS fps
       |  FROM osh WHERE len(h) >= 1
       |), post AS (
       |  SELECT doc_id, unnest(fps) AS fp FROM wf
       |)""".stripMargin

  /** Full winnow CTE chain (token-hash prefix + winnow tail) ending in
    * `post(doc_id, fp)` — the winnowing fingerprint postings: per-doc
    * positional (non-distinct) 3-gram hashes, window-of-4 minima, sorted
    * distinct per doc (mirrors Winnow.fingerprints exactly; docs with no
    * shingles contribute no postings on either engine). Public so the
    * decontamination oracle (CorpusQueries) can compose with it. */
  val winnowCtes = s"$tokHashCtes, $winnowTail"

  private val WN = s"WITH $winnowCtes"

  private val sigExprs: String =
    Hashing.minhashA.zip(Hashing.minhashB)
      .map { case (a, b) => s"list_min(list_transform(sh, h -> ($a * h + $b) % $P))" }
      .mkString("[", ",\n      ", "]")

  /** band → cand → pairs tail over a `sig(doc_id, sh, n, sig)` CTE —
    * shared by the full-corpus chain and the member-filtered one. */
  private val bandCandPairsCtes: String =
    s"""band AS (
       |  SELECT doc_id, u.band, sig[u.band * 2 + 1] AS r0, sig[u.band * 2 + 2] AS r1
       |  FROM sig, unnest([0, 1, 2, 3]) AS u(band)
       |), cand AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM band l JOIN band r
       |    ON l.band = r.band AND l.r0 = r.r0 AND l.r1 = r.r1 AND l.doc_id < r.doc_id
       |), pairs AS (
       |  SELECT a, b, jaccard_x1000 FROM (
       |    SELECT c.a, c.b,
       |      CAST(floor(1000.0 * len(list_intersect(x.sh, y.sh))
       |           / (x.n + y.n - len(list_intersect(x.sh, y.sh)))) AS BIGINT) AS jaccard_x1000
       |    FROM cand c JOIN sig x ON c.a = x.doc_id JOIN sig y ON c.b = y.doc_id
       |  ) WHERE jaccard_x1000 >= 300
       |)""".stripMargin

  /** CTE chain ending in `pairs(a, b, jaccard_x1000)` — the verified
    * minhash near-dup pairs (shared by dedup_minhash_lsh/dedup_clusters). */
  private[queries] val minhashPairCtes: String =
    s"""$SHB, sig AS (
       |  SELECT doc_id, sh, len(sh) AS n,
       |    $sigExprs AS sig
       |  FROM shs WHERE len(sh) > 0
       |), $bandCandPairsCtes""".stripMargin

  /** Same chain, pair generation restricted to the doc ids of
    * `$memberCte` (which must be defined earlier in the WITH list) — the
    * pipeline-composition form: per-doc signatures are corpus-independent,
    * so banding the full-corpus signature table filtered to a survivor
    * set equals re-running the whole chain on the survivors. Used by the
    * end-to-end curation oracle (CorpusQueries). */
  private[queries] def minhashPairCtesAmong(memberCte: String): String =
    s"""$SHB, sig AS (
       |  SELECT doc_id, sh, len(sh) AS n,
       |    $sigExprs AS sig
       |  FROM shs WHERE len(sh) > 0
       |    AND doc_id IN (SELECT doc_id FROM $memberCte)
       |), $bandCandPairsCtes""".stripMargin

  /** CTEs ending in lines(doc_id, line_no, line, lh) + hot(lh) — the
    * CCNet line grain: 4-token spans, md5 keys, df >= 3 hot set (mirrors
    * Dedup.docLines/lineBoilerplate; the line grid is length-driven, no
    * document-size cap). */
  private val LINES =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE length(text) > 0
      |), lines AS (
      |  SELECT doc_id,
      |    unnest(range(0, (len(ws) + 3) // 4)) AS line_no,
      |    unnest(list_transform(range(0, (len(ws) + 3) // 4),
      |      i -> array_to_string(ws[(i*4+1):((i+1)*4)], ' '))) AS line,
      |    unnest(list_transform(range(0, (len(ws) + 3) // 4),
      |      i -> md5(array_to_string(ws[(i*4+1):((i+1)*4)], ' ')))) AS lh
      |  FROM w WHERE len(ws) > 0
      |), hot AS (
      |  SELECT lh FROM lines GROUP BY lh HAVING count(DISTINCT doc_id) >= 3
      |)""".stripMargin

  /** CTEs ending in post(doc_id, span_h) — positional 8-token span hashes
    * (mirrors Dedup.spanPostings: same token hashes, same 8-step fold).
    * `private[queries]` so the span-grain decontamination oracle
    * (CorpusQueries) composes with the identical chain. */
  private[queries] val SPANS: String = {
    val fold = (1 until 8).foldLeft("th[i]")((acc, j) => s"(($acc) * 31 + th[i+$j]) % $P")
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents
       |), thc AS (
       |  SELECT doc_id, list_transform(toks, tk ->
       |    list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(string_split(tk, ''), c -> CAST(ascii(c) AS BIGINT))),
       |      (h, c) -> (h * 31 + c) % $P)) AS th
       |  FROM t
       |), sp AS (
       |  SELECT doc_id,
       |    list_transform(range(1, greatest(len(th) - 7, 0) + 1), i -> $fold) AS sps
       |  FROM thc
       |), post AS (
       |  SELECT doc_id, unnest(sps) AS span_h FROM sp
       |)""".stripMargin
  }

  private val simhashExpr: String =
    (0 until 16)
      .map(i =>
        s"(CASE WHEN list_sum(list_transform(th, h -> 2 * ((h >> $i) & 1) - 1)) > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")

  /** 62-bit simhash mirror: bits 0-30 vote on the token hash, 31-61 on
    * its multiplicative mix mod the same prime (Fast.simhash62Jvm). */
  private val simhashExpr62: String = {
    val lo = (0 until 31).map(i =>
      s"(CASE WHEN list_sum(list_transform(th, h -> 2 * ((h >> $i) & 1) - 1)) > 0 THEN ${1L << i} ELSE 0 END)")
    val hi = (0 until 31).map(i =>
      s"(CASE WHEN list_sum(list_transform(th, h -> 2 * ((((h * 2654435761) % 2147483647) >> $i) & 1) - 1)) > 0 THEN ${1L << (31 + i)} ELSE 0 END)")
    (lo ++ hi).mkString(" + ")
  }

  /** 8-term Horner rolling hash of the char window ending at position p —
    * the SQL mirror of [[graft.dedup.Cdc.chunkSpansJvm]]'s fold (DuckDB
    * ascii() yields the codepoint, matching the JVM codepoint loop). */
  private val cdcHornerSql: String =
    (0 until graft.dedup.Cdc.W).foldLeft("CAST(0 AS BIGINT)") { (acc, k) =>
      s"(($acc * 31 + ascii(substr(text, p - ${graft.dedup.Cdc.W - 1 - k}, 1))) % 2147483647)"
    }

  private val baseOracles: Map[String, String] = Map(
    "dedup_cdc_chunks" ->
      s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
         |pos AS (SELECT doc_id, text, n, unnest(range(8, n + 1)) AS p FROM d),
         |bnd AS (SELECT doc_id, p FROM pos WHERE ($cdcHornerSql) % 64 = 0),
         |bl AS (SELECT doc_id, list_sort(list(p)) AS bs FROM bnd GROUP BY 1),
         |db AS (
         |  SELECT d.doc_id, d.text, d.n,
         |    coalesce(bl.bs, CAST([] AS BIGINT[])) AS bs
         |  FROM d LEFT JOIN bl USING (doc_id)
         |), ix AS (
         |  SELECT doc_id, text, n, bs, unnest(range(1, len(bs) + 2)) AS i FROM db
         |), ch AS (
         |  SELECT doc_id,
         |    substr(text, (list_prepend(0, bs))[i] + 1,
         |      (list_append(bs, n))[i] - (list_prepend(0, bs))[i]) AS chunk
         |  FROM ix
         |  WHERE (list_append(bs, n))[i] >= (list_prepend(0, bs))[i] + 1
         |)
         |SELECT md5(chunk) AS chunk_md5, CAST(length(chunk) AS BIGINT) AS chunk_len,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, count(*) AS n_occ
         |FROM ch GROUP BY 1, 2 HAVING count(*) > 1
         |ORDER BY chunk_md5""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // DuckDB regexp_replace needs the 'g' flag for replace-all (Spark's
    // default)
    "dedup_exact_norm" ->
      """SELECT md5(regexp_replace(regexp_replace(lower(trim(text)),
        |    '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) AS content_md5,
        |  min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""$SH, inv AS (
         |  SELECT doc_id, len(sh) AS n, unnest(sh) AS h FROM shs WHERE len(sh) > 0
         |)
         |SELECT a, b, jaccard_x1000 FROM (
         |  SELECT l.doc_id AS a, r.doc_id AS b,
         |    CAST(floor(1000.0 * count(*) / (any_value(l.n) + any_value(r.n) - count(*))) AS BIGINT) AS jaccard_x1000
         |  FROM inv l JOIN inv r ON l.h = r.h AND l.doc_id < r.doc_id
         |  GROUP BY 1, 2
         |) WHERE jaccard_x1000 >= 300 ORDER BY a, b""".stripMargin,
    // same pair table at the loosest cutoff (100‰), swept over the nine
    // thresholds by the same fan-out construction as the Spark form
    "dedup_threshold_curve" ->
      s"""$SH, inv AS (
         |  SELECT doc_id, len(sh) AS n, unnest(sh) AS h FROM shs WHERE len(sh) > 0
         |), p AS (
         |  SELECT a, b, jaccard_x1000 FROM (
         |    SELECT l.doc_id AS a, r.doc_id AS b,
         |      CAST(floor(1000.0 * count(*) / (any_value(l.n) + any_value(r.n) - count(*))) AS BIGINT) AS jaccard_x1000
         |    FROM inv l JOIN inv r ON l.h = r.h AND l.doc_id < r.doc_id
         |    GROUP BY 1, 2
         |  ) WHERE jaccard_x1000 >= 100
         |), th AS (
         |  SELECT CAST(unnest([100, 200, 300, 400, 500, 600, 700, 800, 900]) AS BIGINT) AS threshold
         |), e AS (
         |  SELECT threshold, a, b FROM p, th WHERE jaccard_x1000 >= threshold
         |), ed AS (
         |  SELECT threshold, unnest([a, b]) AS doc FROM e
         |)
         |SELECT threshold, n_pairs, n_docs
         |FROM (SELECT threshold, count(*) AS n_pairs FROM e GROUP BY 1)
         |JOIN (SELECT threshold, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs
         |      FROM ed GROUP BY 1) USING (threshold)
         |ORDER BY threshold""".stripMargin,
    "dedup_ngram_jaccard_dfcut" ->
      s"""$SH, inv0 AS (
         |  SELECT doc_id, len(sh) AS n, unnest(sh) AS h FROM shs WHERE len(sh) > 0
         |), hot AS (
         |  SELECT h FROM inv0 GROUP BY h HAVING count(*) > 5
         |), inv AS (
         |  SELECT * FROM inv0 WHERE h NOT IN (SELECT h FROM hot)
         |), cand AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM inv l JOIN inv r ON l.h = r.h AND l.doc_id < r.doc_id
         |)
         |SELECT a, b, jaccard_x1000 FROM (
         |  SELECT c.a, c.b,
         |    CAST(floor(1000.0 * len(list_intersect(x.sh, y.sh))
         |         / (x.n + y.n - len(list_intersect(x.sh, y.sh)))) AS BIGINT) AS jaccard_x1000
         |  FROM cand c
         |  JOIN (SELECT doc_id, sh, len(sh) AS n FROM shs) x ON c.a = x.doc_id
         |  JOIN (SELECT doc_id, sh, len(sh) AS n FROM shs) y ON c.b = y.doc_id
         |) WHERE jaccard_x1000 >= 300 ORDER BY a, b""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $minhashPairCtes
         |SELECT a, b, jaccard_x1000 FROM pairs ORDER BY a, b""".stripMargin,
    // transitive closure over the symmetric near-dup graph; keeper = min
    // reachable id (mirrors Dedup.duplicateClusters' min-label fixpoint)
    "dedup_clusters" ->
      s"""WITH RECURSIVE $minhashPairCtes, edges AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION SELECT b, a FROM pairs
         |), reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
         |)
         |SELECT src AS id, least(src, min(dst)) AS keeper
         |FROM reach GROUP BY src ORDER BY id""".stripMargin,
    "graph_triangles" ->
      s"""WITH $minhashPairCtes
         |SELECT p1.a, p1.b, p2.b AS c
         |FROM pairs p1
         |JOIN pairs p2 ON p1.b = p2.a
         |JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b
         |ORDER BY 1, 2, 3""".stripMargin,
    // 3 unrolled vote/argmax/coalesce rounds mirroring labelPropagate:
    // same (count desc, label asc) tie-break, same frozen-label clamp
    "graph_label_prop" ->
      s"""WITH $minhashPairCtes, edges AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION ALL SELECT b, a FROM pairs
         |), nodes AS (
         |  SELECT DISTINCT src AS node FROM edges
         |), seeds AS (
         |  SELECT doc_id AS node, source AS label FROM documents WHERE doc_id % 5 = 0
         |), l0 AS (
         |  SELECT n.node, s.label FROM nodes n LEFT JOIN seeds s ON n.node = s.node
         |)${(1 to 3).map { i =>
              s""", v$i AS (
         |  SELECT e.dst AS node, q.label, count(*) AS c
         |  FROM edges e JOIN l${i - 1} q ON e.src = q.node
         |  WHERE q.label IS NOT NULL GROUP BY 1, 2
         |), b$i AS (
         |  SELECT node, min(label) AS new_label FROM (
         |    SELECT node, label, c, max(c) OVER (PARTITION BY node) AS mc FROM v$i
         |  ) WHERE c = mc GROUP BY node
         |), l$i AS (
         |  SELECT p.node, coalesce(p.label, b.new_label) AS label
         |  FROM l${i - 1} p LEFT JOIN b$i b ON p.node = b.node
         |)"""
            }.mkString}
         |SELECT node, label FROM l3 ORDER BY node""".stripMargin,
    // identical oracle by design: the star construction must land on the
    // same min-id component labeling as the propagation form
    "dedup_clusters_ls" ->
      s"""WITH RECURSIVE $minhashPairCtes, edges AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION SELECT b, a FROM pairs
         |), reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
         |)
         |SELECT src AS id, least(src, min(dst)) AS keeper
         |FROM reach GROUP BY src ORDER BY id""".stripMargin,
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $minhashPairCtes, edges AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION SELECT b, a FROM pairs
         |), reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
         |), cl AS (
         |  SELECT src AS id, least(src, min(dst)) AS cluster
         |  FROM reach GROUP BY src
         |), d2 AS (
         |  SELECT doc_id, text,
         |         string_split_regex(trim(lower(text)), '\\s+') AS toks
         |  FROM documents
         |), m AS (
         |  SELECT cl.id, cl.cluster, ${TextQueries.qualSql} AS qx
         |  FROM cl JOIN d2 ON cl.id = d2.doc_id
         |), bq AS (
         |  SELECT cluster, max(qx) AS best_qx FROM m GROUP BY 1
         |), bid AS (
         |  SELECT m.cluster, min(m.id) AS best_id
         |  FROM m JOIN bq ON m.cluster = bq.cluster AND m.qx = bq.best_qx
         |  GROUP BY 1
         |)
         |SELECT m.id, m.cluster, m.qx, bid.best_id,
         |  CAST(CASE WHEN m.id = bid.best_id THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM m JOIN bid ON m.cluster = bid.cluster ORDER BY m.id""".stripMargin,
    "dedup_rate_by_source" ->
      s"""WITH RECURSIVE $minhashPairCtes, edges AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION SELECT b, a FROM pairs
         |), reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
         |), losers AS (
         |  SELECT src AS id FROM reach GROUP BY src
         |  HAVING src <> least(src, min(dst))
         |)
         |SELECT source, count(*) AS n_docs,
         |  CAST(count(l.id) AS BIGINT) AS n_dupes,
         |  CAST((1000 * count(l.id)) // count(*) AS BIGINT) AS dup_permille
         |FROM documents d LEFT JOIN losers l ON d.doc_id = l.id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_winnow_fps" ->
      s"""$WN SELECT doc_id, fp FROM post ORDER BY doc_id, fp""",
    "dedup_winnow_pairs" ->
      s"""$WN
         |SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS n_shared
         |FROM post l JOIN post r ON l.fp = r.fp AND l.doc_id < r.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 5 ORDER BY a, b""".stripMargin,
    "dedup_incremental" ->
      s"""$SH, sig AS (
         |  SELECT doc_id, sh, len(sh) AS n,
         |    $sigExprs AS sig
         |  FROM shs WHERE len(sh) > 0
         |), band AS (
         |  SELECT doc_id, u.band, sig[u.band * 2 + 1] AS r0, sig[u.band * 2 + 2] AS r1
         |  FROM sig, unnest([0, 1, 2, 3]) AS u(band)
         |), cand AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM band l JOIN band r
         |    ON l.band = r.band AND l.r0 = r.r0 AND l.r1 = r.r1
         |   AND l.doc_id % 10 = 0 AND r.doc_id % 10 <> 0
         |), p AS (
         |  SELECT c.a, c.b,
         |    CAST(floor(1000.0 * len(list_intersect(x.sh, y.sh))
         |         / (x.n + y.n - len(list_intersect(x.sh, y.sh)))) AS BIGINT) AS j
         |  FROM cand c JOIN sig x ON c.a = x.doc_id JOIN sig y ON c.b = y.doc_id
         |)
         |SELECT a AS doc_id, count(*) AS n_matches, min(b) AS first_match,
         |       max(j) AS best_jaccard_x1000
         |FROM p WHERE j >= 300 GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_spans" ->
      s"""$SPANS
         |SELECT span_h, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
         |FROM post GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY span_h""".stripMargin,
    // covered_tokens = |union of duplicated [p, p+7] intervals| via the
    // same packed-integer interval-merge fold as the Spark side
    "dedup_span_profile" ->
      s"""$SPANS, postp AS (
         |  SELECT doc_id, unnest(range(1, len(sps) + 1)) AS p,
         |    unnest(list_transform(range(1, len(sps) + 1), i -> sps[i])) AS span_h
         |  FROM sp WHERE len(sps) > 0
         |), dup AS (
         |  SELECT span_h FROM postp GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         |), dp AS (
         |  SELECT p.doc_id, list_sort(list(p.p)) AS ps
         |  FROM postp p JOIN dup USING (span_h) GROUP BY 1
         |), cov AS (
         |  SELECT doc_id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), ps),
         |      (acc, p) -> (acc // 1000000
         |          + greatest(p + 7 - greatest(acc % 1000000, p - 1), 0)) * 1000000
         |        + greatest(acc % 1000000, p + 7)) // 1000000 AS covered
         |  FROM dp
         |), base AS (
         |  SELECT p.doc_id, count(*) AS n_spans,
         |    CAST(sum(CASE WHEN d.span_h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |  FROM postp p LEFT JOIN dup d USING (span_h)
         |  GROUP BY p.doc_id
         |)
         |SELECT b.doc_id, b.n_spans, b.n_dup,
         |  CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_tokens,
         |  CAST((1000 * b.n_dup) // b.n_spans AS BIGINT) AS dup_permille
         |FROM base b LEFT JOIN cov c USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin,
    "dedup_spans_withindoc" ->
      s"""$SPANS, pv AS (
         |  SELECT doc_id, span_h, count(*) AS occ FROM post GROUP BY 1, 2
         |)
         |SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_spans,
         |  count(*) AS n_values,
         |  CAST(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated_values,
         |  CAST(max(occ) AS BIGINT) AS max_occ,
         |  CAST((1000 * (sum(occ) - count(*))) // sum(occ) AS BIGINT) AS repeat_permille
         |FROM pv GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_containment" ->
      s"""$SH, inv AS (
         |  SELECT doc_id, len(sh) AS n, unnest(sh) AS h FROM shs WHERE len(sh) > 0
         |)
         |SELECT a, b, na, nb, cont_x1000 FROM (
         |  SELECT l.doc_id AS a, r.doc_id AS b,
         |    CAST(any_value(l.n) AS BIGINT) AS na, CAST(any_value(r.n) AS BIGINT) AS nb,
         |    CAST(floor(1000.0 * count(*) / least(any_value(l.n), any_value(r.n))) AS BIGINT)
         |      AS cont_x1000
         |  FROM inv l JOIN inv r ON l.h = r.h AND l.doc_id < r.doc_id
         |  GROUP BY 1, 2
         |) WHERE cont_x1000 >= 600 ORDER BY a, b""".stripMargin,
    // positional span postings (sp's list index IS the 1-based start
    // token; Spark's 0-based posexplode offset cancels in the diagonal),
    // islands per (a, b, diagonal), max run + 7 = longest shared tokens
    "dedup_longest_span" ->
      s"""$SPANS, postp AS (
         |  SELECT doc_id, unnest(range(1, len(sps) + 1)) AS pos,
         |    unnest(list_transform(range(1, len(sps) + 1), i -> sps[i])) AS span_h
         |  FROM sp WHERE len(sps) > 0
         |), m AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa,
         |    x.pos - y.pos AS diag
         |  FROM postp x JOIN postp y ON x.span_h = y.span_h AND x.doc_id < y.doc_id
         |), r AS (
         |  SELECT a, b, diag, pa,
         |    pa - row_number() OVER (PARTITION BY a, b, diag ORDER BY pa) AS grp
         |  FROM m
         |), runs AS (
         |  SELECT a, b, diag, grp, count(*) AS run_len FROM r GROUP BY 1, 2, 3, 4
         |)
         |SELECT a, b, CAST(max(run_len) + 7 AS BIGINT) AS longest_tokens,
         |  count(*) AS n_runs, CAST(sum(run_len) AS BIGINT) AS n_matches
         |FROM runs GROUP BY a, b HAVING max(run_len) + 7 >= 12
         |ORDER BY a, b""".stripMargin,
    // same signature/band/candidate chain as dedup_minhash_lsh, emitting
    // the estimator panel instead of the verified filter
    "dedup_minhash_estimate" ->
      s"""WITH $SHB, sig AS (
         |  SELECT doc_id, sh, len(sh) AS n,
         |    $sigExprs AS sig
         |  FROM shs WHERE len(sh) > 0
         |), band AS (
         |  SELECT doc_id, u.band, sig[u.band * 2 + 1] AS r0, sig[u.band * 2 + 2] AS r1
         |  FROM sig, unnest([0, 1, 2, 3]) AS u(band)
         |), cand AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM band l JOIN band r
         |    ON l.band = r.band AND l.r0 = r.r0 AND l.r1 = r.r1 AND l.doc_id < r.doc_id
         |), j AS (
         |  SELECT c.a, c.b,
         |    CAST(len(list_filter(range(1, 9), i -> x.sig[i] = y.sig[i])) AS BIGINT)
         |      AS n_match_rows,
         |    len(list_intersect(x.sh, y.sh)) AS c, x.n AS na, y.n AS nb
         |  FROM cand c JOIN sig x ON c.a = x.doc_id JOIN sig y ON c.b = y.doc_id
         |)
         |SELECT a, b, n_match_rows,
         |  CAST((1000 * n_match_rows) // 8 AS BIGINT) AS est_x1000,
         |  CAST(floor(1000.0 * c / (na + nb - c)) AS BIGINT) AS jaccard_x1000,
         |  CAST(abs((1000 * n_match_rows) // 8
         |       - CAST(floor(1000.0 * c / (na + nb - c)) AS BIGINT)) AS BIGINT) AS err_x1000
         |FROM j ORDER BY a, b""".stripMargin,
    // exact truth from the full inverted index; LSH candidates from the
    // shared banded-minhash CTEs; recall per true-jaccard band
    "dedup_lsh_recall" ->
      s"""WITH $minhashPairCtes, inv AS (
         |  SELECT doc_id, len(sh) AS n, unnest(sh) AS h FROM shs WHERE len(sh) > 0
         |), truth AS (
         |  SELECT a, b, jaccard_x1000 FROM (
         |    SELECT l.doc_id AS a, r.doc_id AS b,
         |      CAST(floor(1000.0 * count(*) / (any_value(l.n) + any_value(r.n) - count(*))) AS BIGINT)
         |        AS jaccard_x1000
         |    FROM inv l JOIN inv r ON l.h = r.h AND l.doc_id < r.doc_id
         |    GROUP BY 1, 2
         |  ) WHERE jaccard_x1000 >= 300
         |), jj AS (
         |  SELECT t.jaccard_x1000 // 100 AS band,
         |         CASE WHEN p.a IS NULL THEN 0 ELSE 1 END AS found
         |  FROM truth t LEFT JOIN pairs p ON t.a = p.a AND t.b = p.b
         |)
         |SELECT band, count(*) AS n_true, CAST(sum(found) AS BIGINT) AS n_found,
         |  CAST((1000 * sum(found)) // count(*) AS BIGINT) AS recall_permille
         |FROM jj GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_lines" ->
      s"""$LINES
         |SELECT l.doc_id, count(*) AS n_lines,
         |  CAST(sum(CASE WHEN h.lh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
         |  CAST((1000 * sum(CASE WHEN h.lh IS NOT NULL THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
         |    AS boiler_permille
         |FROM lines l LEFT JOIN hot h USING (lh)
         |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin,
    "dedup_lines_strip" ->
      s"""$LINES
         |SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS clean_text
         |FROM lines WHERE lh NOT IN (SELECT lh FROM hot)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_editdist" ->
      s"""WITH t AS (
         |  SELECT doc_id, substr(text, 1, 32) AS t32, substr(text, 1, 8) AS blk
         |  FROM documents WHERE lang = 'en'
         |)
         |SELECT x.doc_id AS a, y.doc_id AS b,
         |       CAST(levenshtein(x.t32, y.t32) AS BIGINT) AS dist
         |FROM t x JOIN t y ON x.blk = y.blk AND x.doc_id < y.doc_id
         |WHERE levenshtein(x.t32, y.t32) <= 12 ORDER BY a, b""".stripMargin,
    "dedup_simhash_wide" ->
      s"""$SH, sim AS (
         |  SELECT doc_id, $simhashExpr62 AS simhash FROM thc
         |), sb AS (
         |  SELECT doc_id, simhash, u.band, (simhash >> (u.band * 16)) & 65535 AS bk
         |  FROM sim, unnest([0, 1, 2, 3]) AS u(band)
         |)
         |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
         |  CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hamming
         |FROM sb l JOIN sb r ON l.band = r.band AND l.bk = r.bk AND l.doc_id < r.doc_id
         |WHERE bit_count(xor(l.simhash, r.simhash)) <= 3 ORDER BY a, b""".stripMargin,
    "dedup_simhash_dfcut" ->
      s"""$SH, sim AS (
         |  SELECT doc_id, $simhashExpr AS simhash FROM thc
         |), sb0 AS (
         |  SELECT doc_id, simhash, u.band,
         |    CASE WHEN u.band = 0 THEN simhash & 255 ELSE (simhash >> 8) & 255 END AS bk
         |  FROM sim, unnest([0, 1]) AS u(band)
         |), cool AS (
         |  SELECT band, bk FROM sb0 GROUP BY 1, 2 HAVING count(*) <= 16
         |), sb AS (
         |  SELECT sb0.* FROM sb0 JOIN cool USING (band, bk)
         |)
         |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
         |  CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hamming
         |FROM sb l JOIN sb r ON l.band = r.band AND l.bk = r.bk AND l.doc_id < r.doc_id
         |WHERE bit_count(xor(l.simhash, r.simhash)) <= 1 ORDER BY a, b""".stripMargin
  )

  /** Subset oracle = parent oracle with the corpus source filtered — the
    * only `FROM documents` in these chains is the tokenization CTE, so the
    * whole pipeline downstream is textually identical. */
  private def docs20(sql: String): String =
    sql.replace("FROM documents", "FROM documents WHERE doc_id % 4 = 0")

  val oracles: Map[String, String] = baseOracles ++
    Seq("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_clusters", "dedup_simhash_dfcut",
        "dedup_clusters_ls", "graph_triangles")
      .map(n => s"${n}_sub" -> docs20(baseOracles(n))) +
    // the prefix filter is lossless by theorem — identical oracle
    ("dedup_jaccard_prefix" -> baseOracles("dedup_ngram_jaccard")) +
    // incremental maintenance must land on the full-recompute labeling —
    // identical oracle by the star-edge equivalence
    ("dedup_clusters_incr" -> baseOracles("dedup_clusters"))
}
