package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming ingestion dedup — the streaming complement of the append
 * path's `(stream, uuid)` conflict check ([[graft.append.Appender]],
 * reference PK `backend.go:48`): when events arrive as an unbounded
 * stream (at-least-once transports redeliver), drop redeliveries before
 * they reach the log.
 *
 * Scale: `dropDuplicatesWithinWatermark` keeps one state row per key
 * only until the watermark passes its event time — state is bounded by
 * (arrival rate × lateness horizon), independent of log length. Plain
 * `dropDuplicates` on a stream would grow state forever; the watermarked
 * form is the only shape that survives an unbounded 100 TB ingest. The
 * contract is correspondingly bounded: a duplicate arriving after the
 * watermark has expired its original is re-admitted (exactly the
 * at-least-once window any bounded-state dedup has).
 */
object IngestDedup {

  /** Deduplicate a streaming event source on `(stream, uuid)` within the
    * watermark lateness horizon. */
  def dedupByUuid(src: DataFrame, eventTime: Column, withinWatermark: String): DataFrame =
    src
      .withColumn("event_time", eventTime)
      .withWatermark("event_time", withinWatermark)
      .dropDuplicatesWithinWatermark("stream", "uuid")

  /** Content-based variant: deduplicate on the codegen'd polynomial hash
    * of a payload column — catches *re-submitted identical content* under
    * fresh uuids (the streaming analogue of [[graft.dedup.Dedup.exact]]).
    * State is one 8-byte key per distinct document within the horizon. */
  def dedupByContent(src: DataFrame, payload: Column, eventTime: Column,
                     withinWatermark: String): DataFrame =
    src
      .withColumn("content_fp", call_function("graft_polyhash", payload))
      .withColumn("event_time", eventTime)
      .withWatermark("event_time", withinWatermark)
      .dropDuplicatesWithinWatermark("content_fp")

  /**
   * Stream-vs-corpus NEAR-duplicate candidate filter — the streaming form
   * of [[graft.dedup.Dedup.minhashLshPairsBetween]] (the nightly-ingest
   * dedup, run continuously): each arriving document is flagged
   * `near_dup_suspect` iff some MinHash band key collides with the static
   * corpus band table. Same banding as every batch dedup op, so the
   * candidate contract is identical: NO candidate-level false negatives
   * (a pair the batch LSH would surface always collides here), false
   * positives pass through flagged for the offline exact-Jaccard verify.
   *
   * Shape: the band keys are derived map-only on the stream (codegen'd
   * shingle/minhash kernels — no state, no watermark needed), then one
   * LEFT OUTER stream-static join per band against the distinct corpus
   * keys of that band. Stateless: no streaming aggregation, no
   * deduplication state; rows with too little text to shingle pass
   * un-flagged. Scale: the static side is (band, r0, r1) distinct — 24
   * bytes × bands per corpus doc; Spark broadcasts it while it fits and
   * shuffle-hash-joins each micro-batch against it beyond that; at PB
   * corpus size, swap the join for a per-band bloom filter pushed into
   * the batch — the stream-side derivation is unchanged.
   *
   * `corpusBands` is [[graft.dedup.Dedup.bandedSignatures]] output (build
   * once from the corpus shingle sets, persist, reuse across triggers).
   */
  /**
   * Build the benchmark span-hash bloom ONCE, batch-side, from the eval
   * registry's span postings ([[graft.dedup.Dedup.spanPostings]] of the
   * bench docs). The returned bytes are a routing-table-sized artifact
   * (~10 bits per bench n-gram — an IVF-codebook-class object, not data),
   * embedded as a LITERAL in the streaming filter so each micro-batch
   * probes it with zero state and zero joins.
   */
  def benchSpanBloom(benchSpans: DataFrame, spanCol: String = "span_h"): Array[Byte] =
    benchSpans.agg(expr(s"graft_bloom_agg($spanCol)").as("bf"))
      .head().getAs[Array[Byte]](0)

  /**
   * Streaming DECONTAMINATION filter — the ingest-time form of
   * `text_decontam_ngram`: flag each arriving document iff any verbatim
   * `spanTokens`-token span probably appears in the benchmark registry
   * (bloom probe — no false negatives, so a clean=false doc is GENUINELY
   * clean; suspects go to the offline exact verify, the same
   * flag-then-verify contract as [[nearDupSuspects]]).
   *
   * Shape: span hashes derive map-only from the codegen'd token-hash
   * kernel (an O(L) fold per doc — no re-tokenization per span), the
   * bloom rides the closure as a literal. Stateless, no watermark, no
   * stream-static join — the filter a 100 TB/day ingest can afford on
   * every document.
   */
  def decontamSuspects(stream: DataFrame, benchBloom: Array[Byte], spanTokens: Int = 8,
                      textCol: String = "text"): DataFrame = {
    import graft.dedup.Hashing
    val P = Hashing.P
    stream
      .withColumn("_th", Hashing.tokenHashes(col(textCol)))
      .withColumn("_m", size(col("_th")) - (spanTokens - 1))
      .withColumn("contam_suspect",
        when(col("_m") >= 1,
          exists(
            transform(sequence(lit(1), col("_m")),
              i => (1 until spanTokens).foldLeft(element_at(col("_th"), i)) {
                (acc, j) => (acc * 31L + element_at(col("_th"), i + lit(j))) % P
              }),
            s => call_function("graft_bloom_contains", lit(benchBloom), s)))
          .otherwise(lit(false)))
      .drop("_th", "_m")
  }

  def nearDupSuspects(stream: DataFrame, corpusBands: DataFrame,
                      textCol: String = "text"): DataFrame = {
    import graft.dedup.Hashing
    val sig = stream
      .withColumn("_sh", graft.functions.Fast.shingleHashesFast(col(textCol)))
      .withColumn("_sig",
        when(size(col("_sh")) > 0, graft.functions.Fast.minhashFast(col("_sh"))))
    val withKeys = (0 until Hashing.bands).foldLeft(sig) { (df, b) =>
      df.withColumn(s"_r0_$b", element_at(col("_sig"), b * Hashing.rowsPerBand + 1))
        .withColumn(s"_r1_$b", element_at(col("_sig"), b * Hashing.rowsPerBand + 2))
    }
    val hit = (0 until Hashing.bands).foldLeft(withKeys) { (df, b) =>
      val k = corpusBands.filter(col("band") === b)
        .select(col("r0").as(s"_c0_$b"), col("r1").as(s"_c1_$b")).distinct()
        .withColumn(s"_hit_$b", lit(1L))
      df.join(k,
        df(s"_r0_$b") <=> k(s"_c0_$b") && df(s"_r1_$b") <=> k(s"_c1_$b"),
        "left_outer")
        .drop(s"_c0_$b", s"_c1_$b")
    }
    val suspect = (0 until Hashing.bands)
      .map(b => col(s"_hit_$b").isNotNull)
      .reduce(_ || _)
    hit.withColumn("near_dup_suspect", suspect)
      .drop((0 until Hashing.bands).flatMap(b =>
        Seq(s"_r0_$b", s"_r1_$b", s"_hit_$b")) ++ Seq("_sh", "_sig"): _*)
  }
}
