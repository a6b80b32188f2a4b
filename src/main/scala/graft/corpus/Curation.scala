package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Shared stages of the end-to-end curation pipeline — the per-doc
 * metadata pass and the report tail (keep-best → quality gate →
 * decontamination → per-source funnel + temperature mix), factored so
 * the batch gate query (`corpus_e2e_curate`) and the streaming twin
 * ([[graft.streaming.StreamingCuration]]) run the IDENTICAL computation
 * over their respective state tables: the twins can only diverge in how
 * they arrive at (meta, exactKeep, labels, posts), never in what the
 * report does with them.
 */
object Curation {

  /** Per-doc curation metadata in ONE scan: normalized-content md5
    * (lowercase, punctuation stripped, whitespace collapsed — the
    * production pre-pass), integer quality score, token count. Pure
    * map — no shuffle; the codegen'd regexp chain and kernels do the
    * work. */
  def docMeta(d: DataFrame): DataFrame = {
    val norm = regexp_replace(
      regexp_replace(lower(trim(col("text"))), "[.,!?;:]", ""), "\\s+", " ")
    d.select(col("doc_id"), col("source"),
      md5(norm).as("h"),
      TextFunctions.qualityScoreX1000(col("text")).as("qx"),
      TextFunctions.tokenCount(col("text")).cast("long").as("nt"))
  }

  /**
   * The pipeline tail over its state tables:
   *
   *  - `meta`      — [[docMeta]] of every document seen,
   *  - `exactKeep` — (h, keep_id): min doc id per normalized md5,
   *  - `labels`    — (id, keeper): near-dup clusters AMONG the exact
   *                  survivors,
   *  - `posts`     — (doc_id, fp) winnow fingerprint postings.
   *
   * Stage flags are cumulative (exact keeper → cluster keep-best →
   * quality ≥ 550 → decontaminated); the report is the per-source
   * funnel plus the sqrt-temperature mixture share of the surviving
   * token mass. Scale shape: the exact-keeper join shuffles md5 keys
   * (merge hint — the keeper table is corpus-sized at 100 TB, never
   * broadcastable). The near-dup LOSER side gets the same treatment:
   * at real web-corpus dup rates 30-50% of documents are near-dup
   * losers (the C4/CCNet regime), so the loser set — and the per-
   * cluster argmax table feeding it — is corpus-scale and must
   * shuffle-join on doc/cluster id, never broadcast (fixture-scale
   * stats would pick a broadcast that OOMs every executor at 100 TB).
   * Only the genuinely benchmark-overlap-sized sides broadcast: the
   * bench posting set, the contaminated-id set, and the 1-row totals;
   * one rollup shuffle on source closes the report.
   */
  def report(meta: DataFrame, exactKeep: DataFrame, labels: DataFrame,
             posts: DataFrame): DataFrame = {
    val withExact = meta.join(exactKeep.hint("merge"), Seq("h"))
      .withColumn("s_exact", col("doc_id") === col("keep_id"))
    val m = labels.select(col("id"), col("keeper").as("cluster"))
      .join(meta.select(col("doc_id").as("id"), col("qx")), "id")
    val best = m.groupBy("cluster")
      .agg(max(struct(col("qx").as("qx"), (col("id") * lit(-1L)).as("nid"))).as("b"))
      .select(col("cluster"), (col("b.nid") * lit(-1L)).as("best_id"))
    // best is one row per CLUSTER — cluster count scales with dup mass,
    // i.e. corpus-scale at real dup rates; the merge join reuses the
    // cluster partitioning the groupBy just produced
    val losers = m.join(best.hint("merge"), "cluster")
      .filter(col("id") =!= col("best_id")).select(col("id").as("nd_id"))
    val contam = {
      val bench = posts.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("bench_id"), col("fp"))
      posts.filter(col("doc_id") % 50 =!= 0)
        .join(broadcast(bench), "fp")
        .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .select(col("doc_id").as("ct_id")).distinct()
    }
    val perSrc = withExact
      .join(losers.hint("merge"), col("doc_id") === col("nd_id"), "left")
      .withColumn("s_kb", col("s_exact") && col("nd_id").isNull)
      .withColumn("s_q", col("s_kb") && col("qx") >= 550)
      .join(broadcast(contam), col("doc_id") === col("ct_id"), "left")
      .withColumn("s_clean", col("s_q") && col("ct_id").isNull)
      .groupBy("source")
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("s_exact"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("s_kb"), 1L).otherwise(0L)).as("n_keepbest"),
        sum(when(col("s_q"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("s_clean"), 1L).otherwise(0L)).as("n_clean"),
        sum(when(col("s_clean"), col("nt")).otherwise(0L)).as("n_toks"))
    temperatureTail(perSrc)
  }

  /** The report's mixture tail over a per-source counter table
    * `(source, n_raw, n_exact, n_keepbest, n_quality, n_clean, n_toks)`:
    * sqrt-temperature weight, 1-row totals broadcast, permille share.
    * Shared by the batch report above and the delta-maintained serving
    * counters ([[graft.streaming.StreamingCuration.reportServed]]) so
    * the formula lives in exactly one place. */
  def temperatureTail(perSrcCounters: DataFrame): DataFrame = {
    val perSrc = perSrcCounters
      .withColumn("w", floor(sqrt(col("n_toks").cast("double"))).cast("long"))
    val tot = perSrc.agg(sum(col("w")).as("tot_w"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_raw"), col("n_exact"), col("n_keepbest"),
        col("n_quality"), col("n_clean"), col("n_toks"), col("w"),
        // a corpus where nothing survives curation has zero mixture
        // mass; its shares are 0, not a divide-by-zero
        when(col("tot_w") === 0L, 0L)
          .otherwise(expr("(1000 * w) div tot_w")).as("temp_share_permille"))
      .orderBy("source")
  }
}
