package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.{Chunking, LmScore, Packing, Sampling}
import graft.dedup.{Dedup, Hashing}
import graft.functions.TextFunctions

/**
 * Verify-gate queries for the corpus-preparation operators
 * ([[graft.corpus]]): deterministic stratified sampling, mixture
 * planning, context-window chunking, greedy sequence packing, and
 * benchmark decontamination (winnowing-fingerprint overlap against a
 * held-out eval subset).
 */
object CorpusQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Fixture sampling rates: permille per source, varied deterministically
    * across the 20 fixture strata (47‰ … 893‰). */
  val sampleRates: Map[String, Int] =
    (0 until 20).map(i => s"src$i" -> 47 * (1 + i % 19)).toMap

  /** Fixture mixture weights (relative, need not sum to 1000). */
  val mixWeights: Map[String, Int] =
    (0 until 20).map(i => s"src$i" -> (10 + 3 * i)).toMap

  private def weightFor(source: org.apache.spark.sql.Column) =
    mixWeights.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (k, v)) => when(source === k, lit(v.toLong)).otherwise(acc)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deterministic stratified subsample: keep iff polyhash(doc_id#salt)
    // mod 1000 falls under the stratum's permille rate. Map-only filter —
    // reproducible across engines/retries (no RNG state), no shuffle
    "corpus_sample" -> { (s: SparkSession, dir: String) =>
      Sampling.stratified(docs(s, dir), "source", sampleRates, salt = "sample")
        .select(col("doc_id"), col("source"), col("bucket"))
        .orderBy("doc_id")
    },
    // mixture planning: per-source token budgets from relative domain
    // weights (target = weight/Σweights of the corpus tokens) + the epoch
    // factor each source needs to meet its budget. One partial-aggregated
    // shuffle on source + a broadcast 1-row totals join
    "corpus_mix" -> { (s: SparkSession, dir: String) =>
      val perSrc = docs(s, dir)
        .select(col("source"), size(Hashing.toks(col("text"))).cast("long").as("nt"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
        .withColumn("weight", weightFor(col("source")))
      val totals = perSrc.agg(
        sum("n_tokens").as("total_toks"), sum("weight").as("sum_w"))
      perSrc.crossJoin(broadcast(totals))
        .withColumn("target_tokens",
          floor(lit(1.0) * col("weight") * col("total_toks") / col("sum_w")).cast("long"))
        .select(
          col("source"), col("n_docs"), col("n_tokens"), col("weight"),
          col("target_tokens"),
          floor(lit(1000.0) * col("target_tokens") / col("n_tokens")).cast("long")
            .as("epochs_x1000"))
        .orderBy("source")
    },
    // context-window chunking: consecutive 32-token windows per document,
    // fingerprinted (map-only flatMap, codegen'd polyhash kernel)
    "text_chunks" -> { (s: SparkSession, dir: String) =>
      Chunking.chunkTable(docs(s, dir), chunkSize = 32)
        .orderBy("doc_id", "chunk_idx")
    },
    // greedy sequence packing into 256-token bins per source: sequential
    // fold over (source, doc_id) order — one shuffle + per-partition loop
    "corpus_pack" -> { (s: SparkSession, dir: String) =>
      Packing.packGreedy(docs(s, dir), budget = 256L)
        .orderBy("source", "doc_id")
    },
    // exactly-5-per-source deterministic holdout draw: rank by the full
    // salt hash within each stratum, keep the first 5 (one stratum-key
    // shuffle + window top-k)
    "corpus_sample_k" -> { (s: SparkSession, dir: String) =>
      Sampling.fixedSizePerStratum(docs(s, dir), "source", k = 5, salt = "holdout")
        .select(col("doc_id"), col("source"), col("rk"))
        .orderBy("source", "rk")
    },
    // corpus-trained bigram-LM quality score (perplexity proxy): mean
    // scaled conditional bigram frequency per doc; floor-scaled integers
    // before summing keep it engine-exact
    "text_lm_score" -> { (s: SparkSession, dir: String) =>
      LmScore.bigramLmScores(docs(s, dir)).orderBy("doc_id")
    },
    // DoReMi-style multiplicative-weights domain reweighting over the
    // bigram-LM hardness signal: 3 MW rounds on the per-domain summary
    // (one corpus pass total; rounds are domain-cardinality aggregates,
    // see graft.corpus.Doremi)
    "corpus_mix_doremi" -> { (s: SparkSession, dir: String) =>
      graft.corpus.Doremi.domainWeights(docs(s, dir)).orderBy("source")
    },
    // Deequ-style data-validation checks as data: one aggregation pass
    // computes every violation count, stack() pivots to one row per check.
    // At 100 TB this is the pre-training corpus gate a pipeline runs
    // before spending compute — a single partial-aggregated scan
    "corpus_checks" -> { (s: SparkSession, dir: String) =>
      docs(s, dir)
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_ids"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_null_text"),
          sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L)).as("n_chars_bad"),
          sum(when(col("lang").isNull || col("lang") === "", 1L).otherwise(0L)).as("n_null_lang"))
        .selectExpr(
          """stack(4,
            |  'doc_id_unique', n_rows - n_ids,
            |  'lang_nonempty', n_null_lang,
            |  'n_chars_consistent', n_chars_bad,
            |  'text_nonnull', n_null_text
            |) as (check, violations)""".stripMargin)
        .withColumn("passed", when(col("violations") === 0L, 1L).otherwise(0L))
        .orderBy("check")
    },
    // benchmark decontamination: corpus docs sharing >= 2 winnowing
    // fingerprints with any held-out eval doc (doc_id % 50 = 0 plays the
    // benchmark suite). The eval side is tiny by nature (a benchmark, not
    // a corpus) -> broadcast; the corpus side never shuffles
    // n-gram-grain decontamination: corpus docs sharing any VERBATIM
    // 8-token span with the held-out eval subset (doc_id % 10 = 0 plays
    // the benchmark suite) — the exact-substring complement of
    // text_decontam's winnowing overlap (which needs >= 2 sampled
    // fingerprints; a single verbatim 13-gram-style hit is the stricter
    // industry decontamination rule). Reuses the memoized span postings;
    // the eval side is tiny by nature -> broadcast, corpus never shuffles
    "text_decontam_ngram" -> { (s: SparkSession, dir: String) =>
      val posts = Tables.spanPostings(s, dir)
      val bench = posts.filter(col("id") % 10 === 0)
        .select(col("id").as("bench_id"), col("span_h")).distinct()
      posts.filter(col("id") % 10 =!= 0)
        .join(broadcast(bench), "span_h")
        .groupBy(col("id").as("doc_id"))
        .agg(countDistinct(col("span_h")).as("n_spans_hit"),
          countDistinct(col("bench_id")).as("n_bench_docs"))
        .orderBy("doc_id")
    },
    // sequence-length bucketing for training batches: power-of-two token
    // buckets (16..256) with per-bucket doc/token counts and the padding
    // waste a fixed-length batcher would pay. Map-only bucket assignment
    // (integer CASE chain — no libm log2), one partial-agg shuffle
    "corpus_length_buckets" -> { (s: SparkSession, dir: String) =>
      val nt = size(Hashing.toks(col("text"))).cast("long")
      val bucket = when(nt <= 16, 16L).when(nt <= 32, 32L).when(nt <= 64, 64L)
        .when(nt <= 128, 128L).otherwise(lit(256L))
      docs(s, dir)
        .select(nt.as("nt"), bucket.as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
        .withColumn("padding_tokens", col("bucket") * col("n_docs") - col("n_tokens"))
        .withColumn("waste_permille", expr("(1000 * padding_tokens) div (bucket * n_docs)"))
        .orderBy("bucket")
    },
    // deterministic epoch shuffle: global training order per epoch as a
    // rank over the salted id hash (epoch in the salt -> independent
    // orders), plus the round-robin shard each doc lands in. Reproducible
    // across engines/retries (no RNG). The rank is the DISTRIBUTED form
    // (Ranking.globalRank: range-repartition + per-range offsets) — a
    // per-epoch window would sort the whole corpus in one task
    "corpus_shuffle" -> { (s: SparkSession, dir: String) =>
      val keyed = docs(s, dir).select(col("doc_id"))
        .withColumn("epoch", explode(array(lit(0L), lit(1L))))
        .withColumn("h", call_function("graft_polyhash",
          concat(col("doc_id").cast("string"), lit("#e"), col("epoch").cast("string"))))
      graft.corpus.Ranking.globalRank(keyed, Seq("epoch"), Seq("h", "doc_id"), "ord")
        .withColumn("shard", pmod(col("ord") - 1, lit(8L)))
        .select(col("epoch"), col("doc_id"), col("ord"), col("shard"))
        .orderBy("epoch", "ord")
    },
    // per-domain document cap (FineWeb-style host-level limiting): keep
    // the top-5 docs per source by quality score — one stratum-key
    // shuffle + window top-k, same plan family as corpus_sample_k; at
    // scale pre-filter each stratum with the deterministic sampler so
    // the window's sort input stays bounded
    "corpus_domain_cap" -> { (s: SparkSession, dir: String) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality_x1000").desc, col("doc_id").asc)
      docs(s, dir)
        .select(col("doc_id"), col("source"),
          TextFunctions.qualityScoreX1000(col("text")).as("quality_x1000"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .orderBy("source", "rk")
    },
    // corpus distribution drift between two snapshots (doc_id parity
    // plays crawl A vs crawl B): per-token counts for both snapshots in
    // ONE partially-aggregated pass (conditional sums — the token key
    // shuffles once, not twice), 1-row totals broadcast back, drift =
    // |cnt_a·tot_b − cnt_b·tot_a| (cross-multiplied integer rate diff —
    // exact, no division), top-20 contributors via TakeOrdered (no
    // global sort). The alarm a pipeline fires when a new crawl's token
    // mix shifts against the corpus it's about to join
    "corpus_drift" -> { (s: SparkSession, dir: String) =>
      val toks = docs(s, dir)
        .select((col("doc_id") % 2 === 0).as("in_a"), Hashing.toks(col("text")).as("tk"))
      val counts = toks
        .select(col("in_a"), explode(col("tk")).as("tok"))
        .groupBy("tok")
        .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("cnt_a"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("cnt_b"))
      // totals from a per-doc size() scan — NOT by re-aggregating the
      // vocabulary table, which would pay the token shuffle twice
      val tot = toks.agg(
        sum(when(col("in_a"), size(col("tk")).cast("long")).otherwise(0L)).as("tot_a"),
        sum(when(!col("in_a"), size(col("tk")).cast("long")).otherwise(0L)).as("tot_b"))
      counts.crossJoin(broadcast(tot))
        .withColumn("drift", abs(col("cnt_a") * col("tot_b") - col("cnt_b") * col("tot_a")))
        .select("tok", "cnt_a", "cnt_b", "drift")
        .orderBy(col("drift").desc, col("tok").asc)
        .limit(20)
    },
    // the WHOLE curation pipeline as one funnel report: per source, how
    // many docs survive each cumulative stage — raw → quality (>= 550) →
    // exact-unique (min doc_id per content md5 among survivors) →
    // near-dup keeper (minus LSH cluster losers) → decontaminated (minus
    // docs sharing >= 2 winnow fps with the bench subset). One scan
    // computes all per-doc flags; the exact-keeper join shuffles 16-byte
    // md5 keys (NOT broadcast — at 100 TB the dup mass is unbounded);
    // the near-dup loser set is likewise corpus-scale at real web dup
    // rates (30-50% of docs) and shuffle-joins on doc id; only the
    // benchmark-overlap-sized contaminated set broadcasts; one rollup
    // shuffle on source. The report a curation run publishes to show
    // where the data went
    "corpus_funnel" -> { (s: SparkSession, dir: String) =>
      funnel(docs(s, dir), Tables.shingleSets(s, dir), Tables.winnowPostings(s, dir))
    },
    // the funnel on the deterministic 25% subset (doc_id % 4 == 0) — the
    // sf0.1 scale-validation form (the parent's minhash-cluster oracle is
    // recursive and cannot finish at sf0.1; same convention as the
    // dedup_*_sub family)
    "corpus_funnel_sub" -> { (s: SparkSession, dir: String) =>
      funnel(
        docs(s, dir).filter(col("doc_id") % 4 === 0),
        Tables.shingleSets(s, dir).filter(col("id") % 4 === 0),
        Tables.winnowPostings(s, dir).filter(col("doc_id") % 4 === 0))
    },
    // deterministic train/val/test split: stable hash-bucket assignment
    // (90/5/5) — map-only like corpus_sample, and STABLE under corpus
    // growth (a doc's split never changes when new data arrives), the
    // property that keeps eval sets uncontaminated across reruns
    "corpus_split" -> { (s: SparkSession, dir: String) =>
      Sampling.splitAssign(docs(s, dir), salt = "split", trainPermille = 900, valPermille = 50)
        .select(col("doc_id"), col("source"), col("bucket"), col("split"))
        .orderBy("doc_id")
    },
    // SPLIT LEAKAGE AUDIT: near-duplicate pairs that CROSS a train/val/
    // test boundary — the eval-contamination check every split must pass
    // before training (a val doc with a 97% train near-twin is a leaked
    // label). Composes the banded minhash pair generator (bounded
    // candidate set, never all-pairs) with the stable hash-bucket split;
    // the split table joins onto the pair set by doc id — at 100 TB the
    // pair set is the small side and the split assignment is a pure
    // map-side function, so the audit costs one LSH pass + two cheap
    // joins. Output: leak counts and worst-case similarity per split
    // pair — nonzero rows here quarantine the affected eval docs.
    "corpus_split_leakage" -> { (s: SparkSession, dir: String) =>
      val split = Sampling.splitAssign(docs(s, dir), salt = "split",
        trainPermille = 900, valPermille = 50)
        .select(col("doc_id"), col("split"))
      Dedup.minhashLshPairsFromSets(Tables.shingleSets(s, dir), thresholdX1000 = 300)
        .join(split.select(col("doc_id").as("a"), col("split").as("split_a")), "a")
        .join(split.select(col("doc_id").as("b"), col("split").as("split_b")), "b")
        .filter(col("split_a") =!= col("split_b"))
        .select(least(col("split_a"), col("split_b")).as("split_lo"),
          greatest(col("split_a"), col("split_b")).as("split_hi"),
          col("jaccard_x1000"))
        .groupBy(col("split_lo"), col("split_hi"))
        .agg(count(lit(1)).as("n_leaks"), max(col("jaccard_x1000")).as("max_jaccard_x1000"))
        .orderBy("split_lo", "split_hi")
    },
    // PER-SOURCE ADAPTIVE QUALITY GATE: a fixed corpus-wide quality
    // cutoff (corpus_curate's >= 550) over-prunes clean sources and
    // under-prunes noisy ones; the adaptive form sets each source's
    // threshold at its OWN sampled median. Stage 1 derives per-source
    // p50 from the bottom-k sample sketch (one partial-aggregated pass,
    // 128 (hash, value) pairs per source on the shuffle — no per-source
    // sort ever); stage 2 re-scans once with the tiny threshold table
    // broadcast into the scan. The sketch is a pure function of the
    // input set, so thresholds AND keep-counts are fully value-oracled —
    // the same determinism contract as agg_sampled_quantiles.
    "corpus_adaptive_quality" -> { (s: SparkSession, dir: String) =>
      // base feeds BOTH the per-source threshold sketch and the final
      // aggregation join: materialize the 3-column projection once so
      // the quality text kernel runs ONE corpus pass, not two (at scale
      // the checkpoint is ~24 bytes/doc vs a second full-text scan)
      val base = docs(s, dir).select(col("doc_id"), col("source"),
        TextFunctions.qualityScoreX1000(col("text")).as("q"))
        .localCheckpoint()
      val h = (Hashing.strHash(concat(col("doc_id").cast("string"), lit("#aq")))
        * lit(2654435761L)) % lit(2147483647L)
      val thr = base
        .select(col("source"), h.as("h"), col("q").cast("double").as("v"))
        .groupBy("source")
        .agg(call_function("graft_bottomk", col("h"), col("v"), lit(128)).as("sk"))
        .select(col("source"), array_sort(map_values(col("sk"))).as("vs"))
        .select(col("source"),
          element_at(col("vs"), expr("cast((size(vs) + 1) div 2 as int)"))
            .cast("long").as("thr_x1000"))
      base.join(broadcast(thr), "source")
        .groupBy("source")
        .agg(max(col("thr_x1000")).as("thr_x1000"),
          count(lit(1)).as("n_docs"),
          sum(when(col("q") >= col("thr_x1000"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy("source")
    },
    // bloom-pruned decontamination: SAME result contract as
    // text_decontam_ngram, different scale regime. There the bench side
    // broadcasts as a hash relation — right while the benchmark suite is
    // small. Here the bench span set is summarized as a BLOOM (~10
    // bits/key vs ~100 bytes/key for a broadcast hash table — three
    // orders of magnitude at a 1B-ngram eval registry), the corpus is
    // pruned MAP-SIDE by might_contain (no false negatives, so nothing
    // is lost), and only the surviving sliver pays the exact verify join
    // — forced to a shuffle (merge) join, the plan you'd run when
    // neither side broadcasts. Result is oracled identical to the exact
    // form: the bloom's false positives are eliminated by the join.
    // The 65536-item capacity states the registry's real cardinality
    // (~27k distinct bench spans at sf0.1) — unsized, Spark assumes 1M
    // items and builds a ~1 MiB filter that rides every downstream
    // stage's task binary (the 2.1 MiB task-binary bench warnings)
    "text_decontam_bloom" -> { (s: SparkSession, dir: String) =>
      Tables.spanPostings(s, dir).createOrReplaceTempView("graft_span_posts")
      s.sql(
        """WITH bench AS (
          |  SELECT DISTINCT id AS bench_id, span_h FROM graft_span_posts WHERE id % 10 = 0
          |), corp AS (
          |  SELECT id, span_h FROM graft_span_posts
          |  WHERE id % 10 <> 0
          |    AND graft_bloom_contains(
          |          (SELECT graft_bloom_agg(span_h, 65536) FROM graft_span_posts WHERE id % 10 = 0),
          |          span_h)
          |)
          |SELECT /*+ MERGE(b) */ c.id AS doc_id,
          |  count(DISTINCT c.span_h) AS n_spans_hit,
          |  count(DISTINCT b.bench_id) AS n_bench_docs
          |FROM corp c JOIN bench b ON c.span_h = b.span_h
          |GROUP BY c.id
          |ORDER BY doc_id""".stripMargin)
    },
    "text_decontam" -> { (s: SparkSession, dir: String) =>
      val posts = Tables.winnowPostings(s, dir)
      val bench = posts.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("bench_id"), col("fp"))
      posts.filter(col("doc_id") % 50 =!= 0)
        .join(broadcast(bench), "fp")
        .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bench_hits"), max("n_shared").as("max_shared"))
        .orderBy("doc_id")
    },
    // CROSS-SOURCE VOCABULARY OVERLAP (exact): pairwise Jaccard of the
    // per-source token vocabularies — the corpus-composition diagnostic
    // behind mixture planning. One distinct pass shuffles (source, tok)
    // once; the pair join is keyed on tok with fanout bounded by the
    // source count (≤ S rows per token per side), then collapses to S²/2
    // keys map-side. Vocabulary sizes are a tiny broadcast side.
    "corpus_overlap" -> { (s: SparkSession, dir: String) =>
      val t = docs(s, dir)
        .select(col("source"), explode(Hashing.toks(col("text"))).as("tok"))
        .distinct()
      val sizes = t.groupBy("source").agg(count(lit(1)).as("nv"))
      val a = t.select(col("source").as("source_a"), col("tok"))
      val b = t.select(col("source").as("source_b"), col("tok"))
      a.join(b, "tok").filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_common"))
        .join(broadcast(sizes.select(col("source").as("source_a"), col("nv").as("vocab_a"))), "source_a")
        .join(broadcast(sizes.select(col("source").as("source_b"), col("nv").as("vocab_b"))), "source_b")
        .select(col("source_a"), col("source_b"), col("vocab_a"), col("vocab_b"),
          col("n_common"),
          expr("(1000 * n_common) div (vocab_a + vocab_b - n_common)").as("jaccard_permille"))
        .orderBy("source_a", "source_b")
    },
    // CROSS-SOURCE OVERLAP VIA SKETCHES: the same pairwise intersection
    // estimated by inclusion–exclusion over per-source HLL sketches
    // (|A∩B| ≈ |A|+|B|−|A∪B|) — the form that works when vocabularies
    // are too large to join exactly: S sketches union pairwise on the
    // driver side of a groupBy, no token ever joins a token. Gate pins
    // every pair's estimate within tolerance of the exact overlap (same
    // contract as agg_sketch_union).
    "corpus_overlap_sketch" -> { (s: SparkSession, dir: String) =>
      val t = docs(s, dir)
        .select(col("source"), explode(Hashing.toks(col("text"))).as("tok"))
      val sk = t.groupBy("source").agg(
        hll_sketch_agg(col("tok"), lit(14)).as("sk"),
        count_distinct(col("tok")).as("exact_v"))
      val a = sk.select(col("source").as("source_a"), col("sk").as("sk_a"),
        col("exact_v").as("va"))
      val b = sk.select(col("source").as("source_b"), col("sk").as("sk_b"),
        col("exact_v").as("vb"))
      val pairs = a.crossJoin(b).filter(col("source_a") < col("source_b"))
        .select(col("source_a"), col("source_b"),
          hll_sketch_estimate(col("sk_a")).as("ea"),
          hll_sketch_estimate(col("sk_b")).as("eb"),
          hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("eu"))
      val exact = {
        val d = t.distinct()
        val x = d.select(col("source").as("source_a"), col("tok"))
        val y = d.select(col("source").as("source_b"), col("tok"))
        x.join(y, "tok").filter(col("source_a") < col("source_b"))
          .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_common"))
      }
      pairs.join(exact, Seq("source_a", "source_b"))
        .select(col("source_a"), col("source_b"),
          (col("ea") + col("eb") - col("eu")).as("est"), col("n_common"), col("eu"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(abs(col("est") - col("n_common")) <= col("eu") * lit(0.05) + col("n_common") * lit(0.10), 1L)
            .otherwise(0L)).as("n_ok"))
        .select(lit("hll_overlap").as("check"), col("n_pairs"), col("n_ok"))
    },
    // CROSS-SOURCE CONTAMINATION MATRIX: verbatim 8-token spans shared
    // between source pairs — the provenance audit that catches one crawl
    // mirroring another (and the source-grain rollup of the decontam
    // family). Distinct (source, span) FIRST bounds the self-join fanout
    // at the source cardinality regardless of span hotness; the
    // source-count table broadcasts back; overlap is permille of the
    // SMALLER side's span set.
    "corpus_source_contamination" -> { (s: SparkSession, dir: String) =>
      val src = docs(s, dir).select(col("doc_id").as("id"), col("source"))
      val spans = Tables.spanPostings(s, dir).join(src, "id")
        .select(col("source"), col("span_h")).distinct()
      val cnt = spans.groupBy("source").agg(count(lit(1)).as("n_spans"))
      val a = spans.toDF("source_a", "span_h")
      val b = spans.toDF("source_b", "span_h")
      a.join(b, "span_h").filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
        .join(broadcast(cnt.toDF("source_a", "a_spans")), "source_a")
        .join(broadcast(cnt.toDF("source_b", "b_spans")), "source_b")
        .select(col("source_a"), col("source_b"), col("n_shared"),
          col("a_spans"), col("b_spans"),
          expr("(1000 * n_shared) div least(a_spans, b_spans)").as("overlap_permille"))
        .orderBy("source_a", "source_b")
    },
    // TEMPERATURE-SCALED MIXTURE (the mC4/XLM-R multilingual sampling
    // rule, T=2): per-source sampling shares ∝ (token mass)^(1/2) — the
    // flattening that keeps low-resource sources represented. Exponent
    // 1/2 because IEEE sqrt is CORRECTLY ROUNDED (exp/ln p^α for general
    // α is libm-dependent and would drift cross-engine); the integer
    // weight is floor(sqrt(n)) and every share is exact integer permille
    // of the weight sum. One partial-agg shuffle on the source key; the
    // 1-row totals broadcast.
    "corpus_mix_temperature" -> { (s: SparkSession, dir: String) =>
      val perSrc = docs(s, dir)
        .select(col("source"), TextFunctions.tokenCount(col("text")).cast("long").as("nt"))
        .groupBy("source").agg(sum(col("nt")).as("n_toks"))
        .withColumn("w", floor(sqrt(col("n_toks").cast("double"))).cast("long"))
      val tot = perSrc.agg(sum(col("n_toks")).as("tot_toks"), sum(col("w")).as("tot_w"))
      perSrc.crossJoin(broadcast(tot))
        .select(col("source"), col("n_toks"), col("w"),
          expr("(1000 * n_toks) div tot_toks").as("raw_share_permille"),
          expr("(1000 * w) div tot_w").as("temp_share_permille"))
        .orderBy("source")
    },
    // DSIR IMPORTANCE RESAMPLING (Xie et al. 2023): score every document
    // by a hashed bag-of-token target-vs-raw likelihood ratio (target
    // domain = src0 here), then keep a deterministic hash-draw subset
    // with acceptance ∝ weight — the data-selection op between raw crawl
    // and training mix. Integer-exact mean-ratio variant (see
    // graft.corpus.Importance — log-sums are libm/order-dependent).
    // Scale: the two 256-bucket models partial-aggregate map-side and
    // BROADCAST back; the corpus never shuffles; acceptance is the
    // reproducible hash-threshold sampler.
    "corpus_importance" -> { (s: SparkSession, dir: String) =>
      graft.corpus.Importance.weights(docs(s, dir), targetSource = "src0")
        .orderBy("doc_id")
    },
    // THE END-TO-END CURATION PIPELINE as ONE query: normalize → exact
    // dedup (keeper = min id per normalized md5) → minhash-LSH clusters
    // AMONG the exact survivors → quality-aware keep-best per cluster →
    // quality gate (>= 550) → benchmark decontamination → temperature-
    // scaled mixture over the final token mass. Every stage is
    // individually oracled elsewhere; this gate pins the COMPOSITION
    // (stage order + survivor-set threading), where operator-boundary
    // bugs hide. Stage composition note: per-doc minhash signatures are
    // corpus-independent, so clustering "among survivors" = the full
    // signature table semi-joined to the survivor ids — the banding/
    // verify machinery is reused unchanged (the oracle mirrors this with
    // the member-filtered sig CTE). Scale shape: one doc scan computes
    // all per-doc stage flags; the exact-keeper join shuffles md5 keys
    // (merge hint — the keeper table is corpus-sized at 100 TB, never
    // broadcastable); survivor ids+quality are localCheckpointed once
    // (16 B/doc) and feed both the cluster pass and the keep-best argmax;
    // cluster losers and the per-cluster argmax are dup-mass sized —
    // corpus-scale at real web dup rates — and shuffle-join on doc/
    // cluster id (never broadcast); only the benchmark-overlap-sized
    // contaminated set broadcasts; the final rollup is one shuffle on
    // source + a 1-row totals broadcast.
    "corpus_e2e_curate" -> { (s: SparkSession, dir: String) =>
      e2eCurate(docs(s, dir), Tables.shingleSets(s, dir), Tables.winnowPostings(s, dir))
    },
    // the pipeline on the deterministic 25% subset (doc_id % 4 == 0) —
    // the sf0.1 scale-validation form (the parent's cluster oracle is
    // recursive and cannot finish at sf0.1; same convention as
    // corpus_funnel_sub)
    "corpus_e2e_curate_sub" -> { (s: SparkSession, dir: String) =>
      e2eCurate(
        docs(s, dir).filter(col("doc_id") % 4 === 0),
        Tables.shingleSets(s, dir).filter(col("id") % 4 === 0),
        Tables.winnowPostings(s, dir).filter(col("doc_id") % 4 === 0))
    }
  )

  /** The end-to-end curation pipeline over the given corpus slice (see
    * the `corpus_e2e_curate` entry for stage semantics and scale shape;
    * the metadata pass and report tail live in [[graft.corpus.Curation]],
    * shared verbatim with the streaming twin
    * [[graft.streaming.StreamingCuration]]). */
  private[graft] def e2eCurate(d: DataFrame, sets: DataFrame, posts: DataFrame): DataFrame = {
      val meta = graft.corpus.Curation.docMeta(d)
      val ek = meta.groupBy("h").agg(min("doc_id").as("keep_id"))
      // survivor ids are checkpointed once (8 B/doc) so the exact-dedup
      // shuffle is not recomputed inside the cluster pass
      val eIds = meta.join(ek, Seq("h"))
        .filter(col("doc_id") === col("keep_id"))
        .select(col("doc_id").as("id")).localCheckpoint()
      val labels = Dedup.duplicateClusters(
        Dedup.minhashLshPairsFromSets(
          sets.join(eIds, Seq("id"), "left_semi"), thresholdX1000 = 300))
      graft.corpus.Curation.report(meta, ek, labels, posts)
  }

  /** The per-source curation funnel over the given corpus slice (see the
    * `corpus_funnel` entry for the stage semantics and scale shape). */
  private def funnel(d: DataFrame, sets: DataFrame, posts: DataFrame): DataFrame = {
      val fl = d.select(col("doc_id"), col("source"), md5(col("text")).as("h"),
        (TextFunctions.qualityScoreX1000(col("text")) >= 550).as("q_ok"))
      val keepers = fl.filter(col("q_ok"))
        .groupBy("h").agg(min("doc_id").as("keep_id"))
      val nearLosers = graft.dedup.Dedup
        .duplicateClusters(graft.dedup.Dedup
          .minhashLshPairsFromSets(sets, thresholdX1000 = 300))
        .filter(col("id") =!= col("keeper")).select(col("id").as("nd_id"))
      val contam = {
        val bench = posts.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("bench_id"), col("fp"))
        posts.filter(col("doc_id") % 50 =!= 0)
          .join(broadcast(bench), "fp")
          .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
          .select(col("doc_id").as("ct_id")).distinct()
      }
      // merge hints: the keeper table is every distinct content hash of the
      // quality survivors, and the near-dup loser set is 30-50% of documents
      // at real web-corpus dup rates — both corpus-sized at 100 TB, never
      // broadcastable; fixture-scale stats would otherwise pick broadcasts
      fl.join(keepers.hint("merge"), Seq("h"), "left")
        .join(nearLosers.hint("merge"), col("doc_id") === col("nd_id"), "left")
        .join(broadcast(contam), col("doc_id") === col("ct_id"), "left")
        .withColumn("s2", col("q_ok") && col("doc_id") === col("keep_id"))
        .withColumn("s3", col("s2") && col("nd_id").isNull)
        .withColumn("s4", col("s3") && col("ct_id").isNull)
        .groupBy("source")
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("q_ok"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("s2"), 1L).otherwise(0L)).as("n_unique"),
          sum(when(col("s3"), 1L).otherwise(0L)).as("n_neardup_kept"),
          sum(when(col("s4"), 1L).otherwise(0L)).as("n_clean"))
        .orderBy("source")
  }

  /** Rolling polynomial hash of lower(trim(expr)) — graft_polyhash. */
  private def fpSql(expr: String): String =
    s"""list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(lower(trim($expr)), ''), c -> CAST(ascii(c) AS BIGINT))),
       |    (h, c) -> (h * 31 + c) % ${Hashing.P})""".stripMargin

  private def caseOver(col: String, m: Map[String, Int]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN $v" }
      .mkString(s"CASE $col ", " ", " ELSE 0 END")

  private val NT = """CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)"""

  /** DuckDB list literal of the quality score's stopword set (kept in sync
    * with [[TextFunctions.stopwords]] by construction). */
  private val stopList: String =
    TextFunctions.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Integer quality score over columns `(toks, text)` — mirrors
    * [[TextFunctions.qualityScoreX1000]] (length, stopword, punctuation
    * components, floor-scaled to x1000). */
  private val QUAL =
    s"""CAST(floor(1000.0 * (
       |       0.4 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
       |     + 0.3 * least(3.0 * CAST(len(list_filter(toks, t -> list_contains($stopList, t))) AS BIGINT)
       |         / greatest(len(toks), 1), 1.0)
       |     + 0.3 * (1.0 - least(5.0 * len(regexp_extract_all(text, '[.,!?;:]'))
       |         / greatest(length(text), 1), 1.0))
       |    )) AS BIGINT)""".stripMargin

  /** Subset oracle = parent oracle with every corpus read filtered to the
    * deterministic 25% (same convention as DedupQueries.docs20). */
  private def docs20(sql: String): String =
    sql.replace("FROM documents", "FROM documents WHERE doc_id % 4 = 0")

  private val baseOracles: Map[String, String] = Map(
    "corpus_overlap" ->
      s"""WITH t AS (
         |  SELECT DISTINCT source, tok FROM (
         |    SELECT source,
         |      unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |    FROM documents
         |  )
         |), s AS (SELECT source, count(*) AS nv FROM t GROUP BY 1),
         |c AS (
         |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
         |  FROM t a JOIN t b ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY 1, 2
         |)
         |SELECT source_a, source_b, x.nv AS vocab_a, y.nv AS vocab_b, n_common,
         |  (1000 * n_common) // (x.nv + y.nv - n_common) AS jaccard_permille
         |FROM c JOIN s x ON source_a = x.source JOIN s y ON source_b = y.source
         |ORDER BY source_a, source_b""".stripMargin,
    // the invariant, not the sketch internals: every pair's
    // inclusion–exclusion estimate lands within tolerance of the exact
    // overlap (n_ok == n_pairs); the pair count itself is data-derived
    "corpus_overlap_sketch" ->
      s"""WITH t AS (
         |  SELECT DISTINCT source, tok FROM (
         |    SELECT source,
         |      unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |    FROM documents
         |  )
         |), c AS (
         |  SELECT a.source AS sa, b.source AS sb
         |  FROM t a JOIN t b ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY 1, 2
         |)
         |SELECT 'hll_overlap' AS check, count(*) AS n_pairs, count(*) AS n_ok
         |FROM c""".stripMargin,
    "corpus_sample" ->
      s"""WITH b AS (
         |  SELECT doc_id, source,
         |    ${fpSql("doc_id::VARCHAR || '#sample'")} % 1000 AS bucket
         |  FROM documents
         |)
         |SELECT doc_id, source, bucket FROM b
         |WHERE bucket < ${caseOver("source", sampleRates)}
         |ORDER BY doc_id""".stripMargin,
    "corpus_mix" ->
      s"""WITH s AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum($NT) AS BIGINT) AS n_tokens,
         |         CAST(${caseOver("source", mixWeights)} AS BIGINT) AS weight
         |  FROM documents GROUP BY source
         |), tot AS (
         |  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_toks,
         |         CAST(sum(weight) AS BIGINT) AS sum_w
         |  FROM s
         |), sel AS (
         |  SELECT source, n_docs, n_tokens, weight,
         |    CAST(floor(1.0 * weight * total_toks / sum_w) AS BIGINT) AS target_tokens
         |  FROM s CROSS JOIN tot
         |)
         |SELECT source, n_docs, n_tokens, weight, target_tokens,
         |  CAST(floor(1000.0 * target_tokens / n_tokens) AS BIGINT) AS epochs_x1000
         |FROM sel ORDER BY source""".stripMargin,
    "text_chunks" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
         |  FROM documents
         |), e AS (
         |  SELECT doc_id, toks,
         |    unnest(range(0, CAST(ceil(len(toks) / 32.0) AS BIGINT))) AS i
         |  FROM d
         |), c AS (
         |  SELECT doc_id, i AS chunk_idx,
         |    toks[(i*32+1):least((i+1)*32, len(toks))] AS piece
         |  FROM e
         |)
         |SELECT doc_id, chunk_idx, CAST(len(piece) AS BIGINT) AS n_tokens,
         |  ${fpSql("array_to_string(piece, ' ')")} AS fp_chunk
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "corpus_pack" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT source, doc_id, $NT AS nt,
         |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         |  FROM documents
         |), r AS (
         |  SELECT source, doc_id, nt, rn, CAST(0 AS BIGINT) AS bin, nt AS fill
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.source, d.doc_id, d.nt, d.rn,
         |    CASE WHEN r.fill + d.nt <= 256 THEN r.bin ELSE r.bin + 1 END,
         |    CASE WHEN r.fill + d.nt <= 256 THEN r.fill + d.nt ELSE d.nt END
         |  FROM r JOIN d ON d.source = r.source AND d.rn = r.rn + 1
         |)
         |SELECT source, doc_id, nt AS n_tokens, bin FROM r
         |ORDER BY source, doc_id""".stripMargin,
    "corpus_sample_k" ->
      s"""WITH b AS (
         |  SELECT doc_id, source,
         |    ${fpSql("doc_id::VARCHAR || '#holdout'")} AS h
         |  FROM documents
         |), rk AS (
         |  SELECT doc_id, source,
         |    CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rk
         |  FROM b
         |)
         |SELECT doc_id, source, rk FROM rk WHERE rk <= 5
         |ORDER BY source, rk""".stripMargin,
    "text_lm_score" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
         |  FROM documents
         |), p AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(toks)), i -> {'w1': toks[i], 'w2': toks[i+1]})) AS pr
         |  FROM d WHERE len(toks) >= 2
         |), pp AS (
         |  SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2 FROM p
         |), big AS (
         |  SELECT w1, w2, count(*) AS c_big FROM pp GROUP BY 1, 2
         |), ctx AS (
         |  SELECT w1, CAST(sum(c_big) AS BIGINT) AS c_ctx FROM big GROUP BY 1
         |), terms AS (
         |  SELECT pp.doc_id,
         |    CAST(floor(1000000.0 * c_big / c_ctx) AS BIGINT) AS t
         |  FROM pp JOIN big USING (w1, w2) JOIN ctx USING (w1)
         |), agg AS (
         |  SELECT doc_id, count(*) AS n_bigrams, CAST(sum(t) AS BIGINT) AS s
         |  FROM terms GROUP BY 1
         |)
         |SELECT d.doc_id,
         |  coalesce(n_bigrams, 0) AS n_bigrams,
         |  coalesce(CAST(floor(1.0 * s / n_bigrams) AS BIGINT), 0) AS lm_x1e6
         |FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // the same per-doc LM chain collapsed to per-domain means, then the
    // three multiplicative-weights rounds unrolled — the wmean/excess/
    // update arithmetic is pure BIGINT div/greatest, replaying
    // Doremi.domainWeights bit-exactly
    "corpus_mix_doremi" -> {
      def round(n: Int, prev: String): String =
        s"""t$n AS (
           |  SELECT CAST(sum(w * mean_lm_x1e6) AS BIGINT) // CAST(sum(w) AS BIGINT) AS wmean
           |  FROM $prev
           |), dm$n AS (
           |  SELECT source, n_docs, mean_lm_x1e6,
           |    (w * (1000 + (500 * greatest(wmean - mean_lm_x1e6, 0)) // 1000000)) // 1000 AS w
           |  FROM $prev, t$n
           |)""".stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\\s+') AS toks
         |  FROM documents
         |), p AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(toks)), i -> {'w1': toks[i], 'w2': toks[i+1]})) AS pr
         |  FROM d WHERE len(toks) >= 2
         |), pp AS (
         |  SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2 FROM p
         |), big AS (
         |  SELECT w1, w2, count(*) AS c_big FROM pp GROUP BY 1, 2
         |), ctx AS (
         |  SELECT w1, CAST(sum(c_big) AS BIGINT) AS c_ctx FROM big GROUP BY 1
         |), terms AS (
         |  SELECT pp.doc_id,
         |    CAST(floor(1000000.0 * c_big / c_ctx) AS BIGINT) AS t
         |  FROM pp JOIN big USING (w1, w2) JOIN ctx USING (w1)
         |), agg AS (
         |  SELECT doc_id, count(*) AS n_bigrams, CAST(sum(t) AS BIGINT) AS s
         |  FROM terms GROUP BY 1
         |), perdoc AS (
         |  SELECT d.doc_id, d.source,
         |    coalesce(CAST(floor(1.0 * s / n_bigrams) AS BIGINT), 0) AS lm
         |  FROM d LEFT JOIN agg USING (doc_id)
         |), dm0 AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(lm) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_lm_x1e6,
         |    CAST(1000 AS BIGINT) AS w
         |  FROM perdoc GROUP BY 1
         |), ${round(1, "dm0")}, ${round(2, "dm1")}, ${round(3, "dm2")},
         |tf AS (SELECT CAST(sum(w) AS BIGINT) AS twf FROM dm3)
         |SELECT source, n_docs, mean_lm_x1e6, w AS w_mult,
         |  (1000 * w) // twf AS weight_permille
         |FROM dm3, tf ORDER BY source""".stripMargin
    },
    "corpus_checks" ->
      s"""WITH m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
         |         CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
         |         CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_bad,
         |         CAST(sum(CASE WHEN lang IS NULL OR lang = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_null_lang
         |  FROM documents
         |), checks AS (
         |  SELECT 'doc_id_unique' AS "check", n_rows - n_ids AS violations FROM m
         |  UNION ALL SELECT 'lang_nonempty', n_null_lang FROM m
         |  UNION ALL SELECT 'n_chars_consistent', n_chars_bad FROM m
         |  UNION ALL SELECT 'text_nonnull', n_null_text FROM m
         |)
         |SELECT "check", violations,
         |  CASE WHEN violations = 0 THEN CAST(1 AS BIGINT) ELSE 0 END AS passed
         |FROM checks ORDER BY "check"""".stripMargin,
    "text_decontam_ngram" ->
      s"""${DedupQueries.SPANS}, bench AS (
         |  SELECT DISTINCT doc_id AS bench_id, span_h FROM post WHERE doc_id % 10 = 0
         |), corp AS (
         |  SELECT doc_id, span_h FROM post WHERE doc_id % 10 <> 0
         |)
         |SELECT c.doc_id, count(DISTINCT c.span_h) AS n_spans_hit,
         |  count(DISTINCT b.bench_id) AS n_bench_docs
         |FROM corp c JOIN bench b USING (span_h)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "corpus_length_buckets" ->
      s"""WITH d AS (
         |  SELECT $NT AS nt FROM documents
         |), b AS (
         |  SELECT nt, CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
         |    WHEN nt <= 64 THEN 64 WHEN nt <= 128 THEN 128 ELSE 256 END AS bucket
         |  FROM d
         |)
         |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  CAST(bucket * count(*) - sum(nt) AS BIGINT) AS padding_tokens,
         |  CAST((1000 * (bucket * count(*) - sum(nt))) // (bucket * count(*)) AS BIGINT)
         |    AS waste_permille
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "corpus_shuffle" ->
      s"""WITH e AS (
         |  SELECT doc_id, unnest([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS epoch
         |  FROM documents
         |), h AS (
         |  SELECT doc_id, epoch,
         |    ${fpSql("doc_id::VARCHAR || '#e' || epoch::VARCHAR")} AS h
         |  FROM e
         |), r AS (
         |  SELECT epoch, doc_id,
         |    CAST(row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS BIGINT) AS ord
         |  FROM h
         |)
         |SELECT epoch, doc_id, ord, (ord - 1) % 8 AS shard
         |FROM r ORDER BY epoch, ord""".stripMargin,
    "corpus_domain_cap" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, text,
         |         string_split_regex(trim(lower(text)), '\\s+') AS toks
         |  FROM documents
         |), q AS (
         |  SELECT doc_id, source,
         |    $QUAL AS quality_x1000
         |  FROM d
         |), r AS (
         |  SELECT doc_id, source, quality_x1000,
         |    CAST(row_number() OVER (PARTITION BY source ORDER BY quality_x1000 DESC, doc_id)
         |      AS BIGINT) AS rk
         |  FROM q
         |)
         |SELECT doc_id, source, quality_x1000, rk FROM r WHERE rk <= 5
         |ORDER BY source, rk""".stripMargin,
    "corpus_drift" ->
      """WITH t AS (
        |  SELECT doc_id % 2 = 0 AS in_a,
        |         unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents
        |), c AS (
        |  SELECT tok,
        |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
        |    CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
        |  FROM t GROUP BY tok
        |), tot AS (
        |  SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a,
        |         CAST(sum(cnt_b) AS BIGINT) AS tot_b
        |  FROM c
        |)
        |SELECT tok, cnt_a, cnt_b,
        |  abs(cnt_a * tot_b - cnt_b * tot_a) AS drift
        |FROM c CROSS JOIN tot
        |ORDER BY drift DESC, tok LIMIT 20""".stripMargin,
    "corpus_funnel" ->
      s"""WITH RECURSIVE ${DedupQueries.minhashPairCtes}, edges AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION SELECT b, a FROM pairs
         |), reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
         |), losers AS (
         |  SELECT src AS id FROM reach GROUP BY src HAVING min(dst) < src
         |), ${DedupQueries.winnowTail}, bench AS (
         |  SELECT doc_id AS bench_id, fp FROM post WHERE doc_id % 50 = 0
         |), contam AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT c.doc_id FROM
         |      (SELECT doc_id, fp FROM post WHERE doc_id % 50 <> 0) c
         |      JOIN bench b USING (fp)
         |    GROUP BY c.doc_id, b.bench_id HAVING count(*) >= 2
         |  )
         |), fl AS (
         |  SELECT doc_id, source, md5(text) AS h, $QUAL >= 550 AS q_ok
         |  FROM (SELECT doc_id, source, text,
         |          string_split_regex(trim(lower(text)), '\\s+') AS toks
         |        FROM documents)
         |), keepers AS (
         |  SELECT h, min(doc_id) AS keep_id FROM fl WHERE q_ok GROUP BY h
         |), st AS (
         |  SELECT f.source, f.q_ok,
         |    f.q_ok AND f.doc_id = k.keep_id AS s2,
         |    f.q_ok AND f.doc_id = k.keep_id
         |      AND f.doc_id NOT IN (SELECT id FROM losers) AS s3,
         |    f.q_ok AND f.doc_id = k.keep_id
         |      AND f.doc_id NOT IN (SELECT id FROM losers)
         |      AND f.doc_id NOT IN (SELECT doc_id FROM contam) AS s4
         |  FROM fl f LEFT JOIN keepers k USING (h)
         |)
         |SELECT source, count(*) AS n_raw,
         |  CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |  CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |  CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_kept,
         |  CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
         |FROM st GROUP BY source ORDER BY source""".stripMargin,
    "corpus_split" ->
      s"""WITH b AS (
         |  SELECT doc_id, source,
         |    ${fpSql("doc_id::VARCHAR || '#split'")} % 1000 AS bucket
         |  FROM documents
         |)
         |SELECT doc_id, source, bucket,
         |  CASE WHEN bucket < 900 THEN 'train'
         |       WHEN bucket < 950 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    // replays the banded-minhash pair CTEs (shared verbatim with the
    // dedup_minhash_lsh oracle) against the same stable split buckets
    "corpus_split_leakage" ->
      s"""WITH ${DedupQueries.minhashPairCtes}, sp AS (
         |  SELECT doc_id,
         |    CASE WHEN ${fpSql("doc_id::VARCHAR || '#split'")} % 1000 < 900 THEN 'train'
         |         WHEN ${fpSql("doc_id::VARCHAR || '#split'")} % 1000 < 950 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents
         |)
         |SELECT least(x.split, y.split) AS split_lo,
         |       greatest(x.split, y.split) AS split_hi,
         |       count(*) AS n_leaks,
         |       CAST(max(jaccard_x1000) AS BIGINT) AS max_jaccard_x1000
         |FROM pairs p JOIN sp x ON p.a = x.doc_id JOIN sp y ON p.b = y.doc_id
         |WHERE x.split <> y.split
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // replays the bottom-128-by-mixed-hash sample per source (distinct
    // hash → min value, 128 smallest hashes, order statistic), then the
    // same threshold filter — sketch determinism makes the whole gate
    // value-comparable, exactly like agg_sampled_quantiles
    "corpus_adaptive_quality" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, text,
         |         string_split_regex(trim(lower(text)), '\\s+') AS toks
         |  FROM documents
         |), b AS (
         |  SELECT doc_id, source, $QUAL AS q FROM d
         |), t AS (
         |  SELECT source,
         |    (${fpSql("doc_id::VARCHAR || '#aq'")} * 2654435761) % 2147483647 AS h,
         |    CAST(q AS DOUBLE) AS v
         |  FROM b
         |), dd AS (
         |  SELECT source, h, min(v) AS v FROM t GROUP BY 1, 2
         |), r AS (
         |  SELECT source, v,
         |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |  FROM dd
         |), qq AS (
         |  SELECT source, v,
         |    row_number() OVER (PARTITION BY source ORDER BY v) AS vr,
         |    count(*) OVER (PARTITION BY source) AS ns
         |  FROM r WHERE rn <= 128
         |), thr AS (
         |  SELECT source,
         |    CAST(max(CASE WHEN vr = (ns + 1) // 2 THEN v END) AS BIGINT) AS thr_x1000
         |  FROM qq GROUP BY 1
         |)
         |SELECT b.source, max(thr.thr_x1000) AS thr_x1000, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN b.q >= thr.thr_x1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM b JOIN thr ON b.source = thr.source
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical oracle to text_decontam_ngram by design: the bloom is a
    // pre-filter with no false negatives; the verify join removes its
    // false positives, so the result must match the exact form
    "text_decontam_bloom" ->
      s"""${DedupQueries.SPANS}, bench AS (
         |  SELECT DISTINCT doc_id AS bench_id, span_h FROM post WHERE doc_id % 10 = 0
         |), corp AS (
         |  SELECT doc_id, span_h FROM post WHERE doc_id % 10 <> 0
         |)
         |SELECT c.doc_id, count(DISTINCT c.span_h) AS n_spans_hit,
         |  count(DISTINCT b.bench_id) AS n_bench_docs
         |FROM corp c JOIN bench b USING (span_h)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_decontam" ->
      s"""WITH ${DedupQueries.winnowCtes}, bench AS (
         |  SELECT doc_id AS bench_id, fp FROM post WHERE doc_id % 50 = 0
         |), corp AS (
         |  SELECT doc_id, fp FROM post WHERE doc_id % 50 <> 0
         |), hits AS (
         |  SELECT c.doc_id, b.bench_id, count(*) AS n_shared
         |  FROM corp c JOIN bench b USING (fp)
         |  GROUP BY 1, 2 HAVING count(*) >= 2
         |)
         |SELECT doc_id, count(*) AS n_bench_hits,
         |       CAST(max(n_shared) AS BIGINT) AS max_shared
         |FROM hits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // distinct (source, span) before the self-join, same as the Spark
    // plan; overlap permille of the smaller side
    "corpus_source_contamination" ->
      s"""${DedupQueries.SPANS}, src AS (
         |  SELECT doc_id AS id, source FROM documents
         |), dsp AS (
         |  SELECT DISTINCT s.source, p.span_h
         |  FROM post p JOIN src s ON p.doc_id = s.id
         |), cnt AS (
         |  SELECT source, count(*) AS n_spans FROM dsp GROUP BY source
         |), j AS (
         |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
         |  FROM dsp a JOIN dsp b ON a.span_h = b.span_h AND a.source < b.source
         |  GROUP BY 1, 2
         |)
         |SELECT j.source_a, j.source_b, n_shared,
         |  ca.n_spans AS a_spans, cb.n_spans AS b_spans,
         |  (1000 * n_shared) // least(ca.n_spans, cb.n_spans) AS overlap_permille
         |FROM j JOIN cnt ca ON ca.source = j.source_a
         |JOIN cnt cb ON cb.source = j.source_b
         |ORDER BY 1, 2""".stripMargin,
    // IEEE sqrt is correctly rounded, so floor(sqrt(n)) is engine-exact;
    // every share is integer permille of integer sums
    "corpus_mix_temperature" ->
      s"""WITH t AS (
         |  SELECT source, CAST(sum($NT) AS BIGINT) AS n_toks
         |  FROM documents GROUP BY source
         |), w AS (
         |  SELECT source, n_toks,
         |    CAST(floor(sqrt(CAST(n_toks AS DOUBLE))) AS BIGINT) AS w
         |  FROM t
         |), tot AS (
         |  SELECT CAST(sum(n_toks) AS BIGINT) AS tot_toks,
         |         CAST(sum(w) AS BIGINT) AS tot_w
         |  FROM w
         |)
         |SELECT source, n_toks, w,
         |  (1000 * n_toks) // tot_toks AS raw_share_permille,
         |  (1000 * w) // tot_w AS temp_share_permille
         |FROM w, tot ORDER BY source""".stripMargin,
    // replays Importance.weights' staged integer ratio arithmetic: same
    // smoothing, same div order, same hash-threshold acceptance draw
    "corpus_importance" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |  FROM documents
         |), tb AS (
         |  SELECT doc_id, source, ${fpSql("tok")} % 256 AS b FROM t
         |), raw AS (
         |  SELECT b, count(*) AS rc FROM tb GROUP BY b
         |), tgt AS (
         |  SELECT b, count(*) AS tc FROM tb WHERE source = 'src0' GROUP BY b
         |), tot AS (
         |  SELECT count(*) AS r_tot,
         |    count(*) FILTER (source = 'src0') AS t_tot
         |  FROM tb
         |), model AS (
         |  SELECT raw.b,
         |    (1000000 * (coalesce(tc, 0) + 1) * (r_tot + 256))
         |      // ((rc + 1) * (t_tot + 256)) AS s_x1e6
         |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot
         |), sc AS (
         |  SELECT doc_id, count(*) AS n_toks, CAST(sum(s_x1e6) AS BIGINT) AS s_sum
         |  FROM tb JOIN model USING (b) GROUP BY doc_id
         |)
         |SELECT doc_id, n_toks, s_sum // n_toks AS imp_x1e6,
         |  CAST(${fpSql("doc_id::VARCHAR || '#dsir'")} % 2000000 < s_sum // n_toks AS INT) AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,
    // the full pipeline composition, stage for stage: normalized-md5
    // keepers (ek/ex), the member-filtered minhash pair chain (sig
    // restricted to ex — per-doc signatures are corpus-independent, so
    // this equals re-running the chain on the survivors), recursive
    // transitive closure → quality-argmax keep-best, then the quality
    // cutoff, winnow-overlap decontamination, and the sqrt temperature
    // mix over the surviving token mass
    "corpus_e2e_curate" ->
      s"""WITH RECURSIVE fl AS (
         |  SELECT doc_id, source,
         |    md5(regexp_replace(regexp_replace(lower(trim(text)),
         |      '[.,!?;:]', '', 'g'), '\\s+', ' ', 'g')) AS h,
         |    $QUAL AS qx, CAST(len(toks) AS BIGINT) AS nt
         |  FROM (SELECT doc_id, source, text,
         |          string_split_regex(trim(lower(text)), '\\s+') AS toks
         |        FROM documents)
         |), ek AS (
         |  SELECT h, min(doc_id) AS keep_id FROM fl GROUP BY h
         |), ex AS (
         |  SELECT doc_id FROM fl JOIN ek USING (h) WHERE doc_id = keep_id
         |), ${DedupQueries.minhashPairCtesAmong("ex")}, edges AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION SELECT b, a FROM pairs
         |), reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, g.dst FROM reach r JOIN edges g ON r.dst = g.src
         |), cl AS (
         |  SELECT src AS id, least(src, min(dst)) AS cluster
         |  FROM reach GROUP BY src
         |), m AS (
         |  SELECT cl.id, cl.cluster, fl.qx FROM cl JOIN fl ON cl.id = fl.doc_id
         |), bq AS (
         |  SELECT cluster, max(qx) AS best_qx FROM m GROUP BY 1
         |), bid AS (
         |  SELECT m.cluster, min(m.id) AS best_id
         |  FROM m JOIN bq ON m.cluster = bq.cluster AND m.qx = bq.best_qx
         |  GROUP BY 1
         |), losers AS (
         |  SELECT m.id FROM m JOIN bid ON m.cluster = bid.cluster
         |  WHERE m.id <> bid.best_id
         |), ${DedupQueries.winnowTail}, bench AS (
         |  SELECT doc_id AS bench_id, fp FROM post WHERE doc_id % 50 = 0
         |), contam AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT c.doc_id FROM
         |      (SELECT doc_id, fp FROM post WHERE doc_id % 50 <> 0) c
         |      JOIN bench b USING (fp)
         |    GROUP BY c.doc_id, b.bench_id HAVING count(*) >= 2
         |  )
         |), st AS (
         |  SELECT f.source, f.nt,
         |    f.doc_id = k.keep_id AS s_exact,
         |    f.doc_id = k.keep_id
         |      AND f.doc_id NOT IN (SELECT id FROM losers) AS s_kb,
         |    f.doc_id = k.keep_id
         |      AND f.doc_id NOT IN (SELECT id FROM losers)
         |      AND f.qx >= 550 AS s_q,
         |    f.doc_id = k.keep_id
         |      AND f.doc_id NOT IN (SELECT id FROM losers)
         |      AND f.qx >= 550
         |      AND f.doc_id NOT IN (SELECT doc_id FROM contam) AS s_clean
         |  FROM fl f JOIN ek k USING (h)
         |), per AS (
         |  SELECT source, count(*) AS n_raw,
         |    CAST(sum(CASE WHEN s_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         |    CAST(sum(CASE WHEN s_kb THEN 1 ELSE 0 END) AS BIGINT) AS n_keepbest,
         |    CAST(sum(CASE WHEN s_q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |    CAST(sum(CASE WHEN s_clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
         |    CAST(sum(CASE WHEN s_clean THEN nt ELSE 0 END) AS BIGINT) AS n_toks
         |  FROM st GROUP BY source
         |), mx AS (
         |  SELECT per.*, CAST(floor(sqrt(CAST(n_toks AS DOUBLE))) AS BIGINT) AS w
         |  FROM per
         |), tw AS (
         |  SELECT CAST(sum(w) AS BIGINT) AS tot_w FROM mx
         |)
         |SELECT source, n_raw, n_exact, n_keepbest, n_quality, n_clean, n_toks, w,
         |  CASE WHEN tot_w = 0 THEN 0
         |       ELSE (1000 * w) // tot_w END AS temp_share_permille
         |FROM mx, tw ORDER BY source""".stripMargin
  )

  val oracles: Map[String, String] =
    baseOracles +
      ("corpus_funnel_sub" -> docs20(baseOracles("corpus_funnel"))) +
      ("corpus_e2e_curate_sub" -> docs20(baseOracles("corpus_e2e_curate")))
}
