package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.log.Fixture
import graft.plans.Hll
import graft.streaming.Sessionize

/**
 * Event-analytics breadth over the canonical log: the product-analytics
 * shapes (funnels, cohort retention, Markov transitions, pivots) plus the
 * scale-infrastructure shapes (salted skew aggregation, mergeable-sketch
 * rollups, z-order layout keys, sequential decay folds, robust outlier
 * flagging). The reference has none of these (SURVEY.md §2.7 — it
 * delegates all analytics to Postgres); an analytics engine over an event
 * log must own them, and each comes with a full DuckDB value oracle.
 *
 * Common scale rule (same as RelationalQueries): the event log is the
 * only large input — no plan shuffles the full log more than once, window
 * partitionings are reused by the downstream aggregation, and per-stream
 * scalars ride broadcast joins.
 */
object AnalyticsQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = Fixture.events(s, dir)

  private def micros: Column = unix_micros(col("ts"))

  /** stream "user-<id>" → entity key (reverse of Fixture's mapping). */
  private def uid = substring(col("stream"), 6, 1000000).cast("long")

  /** Uniformized sketch hash: polyhash is a fine fingerprint but is NOT
    * equidistributed on [0, P) for short inputs (short strings only
    * reach ~31^len, and near-consecutive inputs hash near each other),
    * which wrecks order-statistics estimators (KMV's (k−1)·P/h_k read
    * h_k 2× too large on the fixture's "user-N" streams). One
    * multiplicative mix mod the same prime spreads the values; both
    * engines run the identical integer arithmetic. */
  private def sketchHash(c: Column): Column =
    (call_function("graft_polyhash", c) * lit(2654435761L)) % lit(2147483647L)

  /** DuckDB mirror of [[sketchHash]] over a SQL string expression
    * (pre-stripped — safe to interpolate into stripMargin oracles). */
  private def sketchHashSql(e: String): String =
    s"""(list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(string_split(lower(trim($e)), ''),
       |          c -> CAST(ascii(c) AS BIGINT))),
       |      (h, c) -> (h * 31 + c) % 2147483647) * 2654435761) % 2147483647"""
      .stripMargin

  /** KMV set-operation estimates from two stored 64-long sketches in
    * columns `ka`/`kb`: merged union sketch, θ union estimate, ρ
    * intersection survivors, intersection estimate, Jaccard permille —
    * all integer arithmetic, value-oracled by `agg_kmv_setops`. Shared
    * with the streaming twin ([[graft.streaming.StreamingKmv]]), whose
    * incrementally-maintained sketches feed the SAME panel — the
    * sketches are deterministic functions of the seen hash set, so
    * streaming-final == batch exactly (`StreamingSpec`). */
  private[graft] def kmvSetopsPanel(ab: DataFrame): DataFrame =
    ab
      .withColumn("merged",
        slice(array_sort(array_distinct(concat(col("ka"), col("kb")))), 1, 64))
      .withColumn("est_union",
        when(size(col("merged")) < 64, size(col("merged")).cast("long"))
          .otherwise(expr(
            "(CAST(63 AS BIGINT) * CAST(2147483647 AS BIGINT)) div greatest(element_at(merged, 64), CAST(1 AS BIGINT))")))
      .withColumn("rho",
        size(array_intersect(array_intersect(col("merged"), col("ka")), col("kb"))).cast("long"))
      .withColumn("est_intersect",
        when(size(col("merged")) < 64, col("rho"))
          .otherwise(expr("(rho * est_union) div 64")))
      .withColumn("jaccard_x1000", expr("(rho * 1000) div size(merged)"))
      .select(col("est_union"), col("rho"), col("est_intersect"), col("jaccard_x1000"))

  /** Z-order bit-interleave of two 4-bit bucket columns, as a SQL
    * expression string shared verbatim with the DuckDB oracle (same
    * operators, same arithmetic — the layout key must be engine-exact). */
  private[queries] def zExpr(ub: String, tb: String): String =
    (0 until 4)
      .flatMap(k => Seq(s"((($ub >> $k) & 1) << ${2 * k})", s"((($tb >> $k) & 1) << ${2 * k + 1})"))
      .mkString("(", " | ", ")")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // FUNNEL, per stream: earliest completion position of each step of
    // signup → view → click → purchase, every step strictly after the
    // previous step's completing event. One pass of CHAINED windows, all
    // on the same (stream × position) partitioning: c1 = earliest signup
    // strictly before the current row; a view row with c1 set completes
    // step 2; its running min (c2) gates step 3; and so on. The final
    // groupBy reuses the window's hash partitioning — ONE shuffle total,
    // no self-joins (the naive formulation is 3 self-joins of the log).
    "funnel_steps" -> { (s: SparkSession, dir: String) =>
      val wPrev = Window.partitionBy("stream").orderBy("position")
        .rowsBetween(Window.unboundedPreceding, -1)
      val d = ev(s, dir)
        .select(col("stream"), col("position"), col("event_type"))
        .withColumn("c1", min(when(col("event_type") === "signup", col("position"))).over(wPrev))
        .withColumn("v2", when(col("event_type") === "view" && col("c1").isNotNull, col("position")))
        .withColumn("c2", min(col("v2")).over(wPrev))
        .withColumn("v3", when(col("event_type") === "click" && col("c2").isNotNull, col("position")))
        .withColumn("c3", min(col("v3")).over(wPrev))
        .withColumn("v4", when(col("event_type") === "purchase" && col("c3").isNotNull, col("position")))
      d.groupBy(col("stream"))
        .agg(
          min(when(col("event_type") === "signup", col("position"))).as("p1"),
          min(col("v2")).as("p2"), min(col("v3")).as("p3"), min(col("v4")).as("p4"))
        .select(col("stream"),
          coalesce(col("p1"), lit(-1L)).as("p1"), coalesce(col("p2"), lit(-1L)).as("p2"),
          coalesce(col("p3"), lit(-1L)).as("p3"), coalesce(col("p4"), lit(-1L)).as("p4"),
          when(col("p4").isNotNull, 4L).when(col("p3").isNotNull, 3L)
            .when(col("p2").isNotNull, 2L).when(col("p1").isNotNull, 1L)
            .otherwise(0L).as("steps_completed"))
        .orderBy("stream")
    },
    // FUNNEL DROP-OFF: how many streams complete each step, with the
    // step-over-step conversion as exact integer permille ((1000*n) div
    // prev — engine-exact integer division, no float quotients). Derived
    // from the same chained-window pass, collapsed to ONE row then
    // stacked to a row per step: the whole funnel report is one job.
    "funnel_conversion" -> { (s: SparkSession, dir: String) =>
      val wPrev = Window.partitionBy("stream").orderBy("position")
        .rowsBetween(Window.unboundedPreceding, -1)
      val d = ev(s, dir)
        .select(col("stream"), col("position"), col("event_type"))
        .withColumn("c1", min(when(col("event_type") === "signup", col("position"))).over(wPrev))
        .withColumn("v2", when(col("event_type") === "view" && col("c1").isNotNull, col("position")))
        .withColumn("c2", min(col("v2")).over(wPrev))
        .withColumn("v3", when(col("event_type") === "click" && col("c2").isNotNull, col("position")))
        .withColumn("c3", min(col("v3")).over(wPrev))
        .withColumn("v4", when(col("event_type") === "purchase" && col("c3").isNotNull, col("position")))
      val per = d.groupBy(col("stream"))
        .agg(
          min(when(col("event_type") === "signup", col("position"))).as("p1"),
          min(col("v2")).as("p2"), min(col("v3")).as("p3"), min(col("v4")).as("p4"))
      per.agg(
        count(lit(1)).as("n0"),
        count(col("p1")).as("n1"), count(col("p2")).as("n2"),
        count(col("p3")).as("n3"), count(col("p4")).as("n4"))
        .select(expr(
          """stack(4,
            |  1L, 'signup',   n1, nvl((1000 * n1) div nullif(n0, 0), -1L),
            |  2L, 'view',     n2, nvl((1000 * n2) div nullif(n1, 0), -1L),
            |  3L, 'click',    n3, nvl((1000 * n3) div nullif(n2, 0), -1L),
            |  4L, 'purchase', n4, nvl((1000 * n4) div nullif(n3, 0), -1L)
            |) AS (step, step_name, n_streams, conv_permille)""".stripMargin))
        .orderBy("step")
    },
    // MARKOV TRANSITIONS: consecutive-event (from → to) counts per
    // stream order, with the per-from-type transition probability as
    // exact integer permille. One lag window + one aggregation sharing
    // the stream partitioning; the permille window runs over the
    // 25-row aggregate, not the log.
    "markov_transitions" -> { (s: SparkSession, dir: String) =>
      val w = Window.partitionBy("stream").orderBy("position")
      val wf = Window.partitionBy("from_type")
      ev(s, dir)
        .select(col("stream"), col("position"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(wf))
        .withColumn("permille", expr("(1000 * n) div tot"))
        .select(col("from_type"), col("to_type"), col("n"), col("permille"))
        .orderBy("from_type", "to_type")
    },
    // PIVOT (wide activity matrix): per-stream counts of each event type
    // as columns. The type list is declared (no discovery pass), so this
    // is ONE map-side partially-aggregated shuffle — the pivot expands
    // to count(CASE) columns, never a row explosion.
    "agg_pivot" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .groupBy(col("stream"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("stream"),
          col("click").as("n_click"), col("error").as("n_error"),
          col("purchase").as("n_purchase"), col("signup").as("n_signup"),
          col("view").as("n_view"),
          (col("click") + col("error") + col("purchase") + col("signup") + col("view")).as("n_total"))
        .orderBy("stream")
    },
    // COHORT RETENTION: streams grouped by first-active week (the
    // cohort), counted per week-offset of later activity. The log first
    // collapses to DISTINCT (stream, week) — a keys-only partial-agg
    // shuffle; the cohort assignment is a min-window over that already
    // small activity table; the final count touches activity rows, not
    // events. Integer week index from exact µs division.
    "retention_cohorts" -> { (s: SparkSession, dir: String) =>
      val act = ev(s, dir)
        .select(col("stream"), micros.as("tus"))
        .select(col("stream"), expr("tus div 604800000000").as("wk"))
        .distinct()
      val w = Window.partitionBy("stream")
      act.withColumn("cohort_wk", min(col("wk")).over(w))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(count(lit(1)).as("n_active")) // rows are distinct (stream, wk)
        .orderBy("cohort_wk", "week_offset")
    },
    // EWMA (decayed engagement), alpha = 1/2: e_0 = v_0;
    // e_i = floor((e_{i-1} + v_i) / 2) over the stream's events in
    // position order — an inherently SEQUENTIAL per-stream fold, executed
    // as ONE shuffle into per-stream sorted arrays folded by the
    // `aggregate` higher-order function (the same bounded-stream contract
    // as the projection fold engine; alpha = 1/2 keeps every step an
    // exact integer halving, so the fold is engine- and order-exact).
    "agg_ewma" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .select(col("stream"), col("position"),
          floor(col("value") * lit(1000.0)).cast("long").as("v"))
        .groupBy(col("stream"))
        .agg(sort_array(collect_list(struct(col("position"), col("v")))).as("seq"))
        .select(col("stream"), size(col("seq")).cast("long").as("n"),
          expr("""aggregate(seq, CAST(NULL AS BIGINT),
                 |  (acc, x) -> CASE WHEN acc IS NULL THEN x.v
                 |              ELSE CAST(floor((acc + x.v) / 2.0) AS BIGINT) END)""".stripMargin)
            .as("ewma_x1000"))
        .orderBy("stream")
    },
    // HOLT double exponential smoothing (level + trend forecasting, the
    // step up from agg_ewma): s_i = ⌊(v_i + s_{i-1} + b_{i-1})/2⌋,
    // b_i = ⌊(b_{i-1} + (s_i − s_{i-1}))/2⌋ — α = β = ½ keeps every step
    // an exact integer halving, so the sequential fold is engine-exact
    // (oracle: recursive CTE over the dense revision chain). Same
    // one-shuffle bounded-stream contract as agg_ewma; forecast is the
    // level+trend extrapolation of the final state.
    "agg_holt" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .select(col("stream"), col("position"),
          floor(col("value") * lit(1000.0)).cast("long").as("v"))
        .groupBy(col("stream"))
        .agg(sort_array(collect_list(struct(col("position"), col("v")))).as("seq"))
        .select(col("stream"), size(col("seq")).cast("long").as("n"),
          expr("""aggregate(seq, CAST(NULL AS STRUCT<s: BIGINT, b: BIGINT>),
                 |  (acc, x) -> CASE WHEN acc IS NULL
                 |    THEN named_struct('s', x.v, 'b', CAST(0 AS BIGINT))
                 |    ELSE named_struct(
                 |      's', CAST(floor((x.v + acc.s + acc.b) / 2.0) AS BIGINT),
                 |      'b', CAST(floor((acc.b
                 |             + (CAST(floor((x.v + acc.s + acc.b) / 2.0) AS BIGINT)
                 |                - acc.s)) / 2.0) AS BIGINT)) END)""".stripMargin)
            .as("st"))
        .select(col("stream"), col("n"), col("st.s").as("level_x1000"),
          col("st.b").as("trend_x1000"),
          (col("st.s") + col("st.b")).as("forecast_x1000"))
        .orderBy("stream")
    },
    // ROBUST OUTLIERS (median/MAD): per-stream events whose payload
    // deviates from the stream median by more than 3 MADs. All
    // arithmetic in doubled integers (d2 = 2·|dev|, mad4 = 4·MAD), so
    // the even-n midpoint interpolation stays exact on both engines.
    // Two grouped median passes + two joins, every one keyed on the
    // stream (the median tables are 1 row/stream — broadcast-size).
    "anomaly_mad" -> { (s: SparkSession, dir: String) =>
      val v = ev(s, dir).select(col("stream"), col("position"),
        floor(col("value") * lit(1000.0)).cast("long").as("v"))
      val med = v.groupBy(col("stream"))
        .agg(expr("CAST(2 * percentile(v, 0.5) AS BIGINT)").as("m2"))
      val d = v.join(broadcast(med), "stream")
        .withColumn("d2", abs(col("v") * 2 - col("m2")))
      val mad = d.groupBy(col("stream"))
        .agg(expr("CAST(2 * percentile(d2, 0.5) AS BIGINT)").as("mad4"))
      d.join(broadcast(mad), "stream")
        .groupBy(col("stream"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("d2") * 2 > col("mad4") * 3, 1L).otherwise(0L)).as("n_outliers"),
          max(col("d2")).as("max_d2"))
        .orderBy("stream")
    },
    // SALTED SKEW AGGREGATION: the two-stage (salt → partial → merge)
    // rewrite that survives a hot grouping key at 100 TB. Stage 1 groups
    // on (key, salt) — a hot key's rows spread over 16 reducers instead
    // of one; stage 2 merges the 16 partials per key. Results are pinned
    // equal to the direct single-stage aggregation (the oracle IS the
    // direct form). Integer milli-unit sums are shuffle-order-proof.
    "agg_salted_skew" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .select(col("event_type"), col("position"),
          floor(col("value") * lit(1000.0)).cast("long").as("vx"))
        .withColumn("salt", pmod(col("position"), lit(16L)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pn"), sum(col("vx")).as("pv"))
        .groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n"), sum(col("pv")).as("sum_value_x1000"))
        .orderBy("event_type")
    },
    // Z-ORDER LAYOUT KEYS: interleave the entity bucket and time bucket
    // into one space-filling-curve key — the layout column a 100 TB
    // table is range-partitioned/sorted by so that BOTH per-user and
    // per-time-range scans prune files (single-column sorts prune only
    // one dimension). Map-side bucketing + one tiny aggregation; the
    // interleave arithmetic is the same SQL text on both engines.
    "zorder_keys" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .select(uid.as("u"), micros.as("tus"))
        .select(pmod(col("u"), lit(16L)).as("ubucket"),
          pmod(expr("tus div 86400000000"), lit(16L)).as("tbucket"))
        .withColumn("z", expr(zExpr("ubucket", "tbucket")))
        .groupBy(col("z"), col("ubucket"), col("tbucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("z")
    },
    // HILBERT LAYOUT KEYS: the locality upgrade over zorder_keys — on a
    // Hilbert walk every consecutive key pair is an ADJACENT cell (no
    // Z-shape jumps), so a key range covers a tighter (user, day) blob
    // and range-partitioned files prune better on 2-sided predicates.
    // The per-level quadrant+rotation unrolling is emitted as staged
    // integer-CASE SQL shared verbatim with the oracle
    // (graft.plans.Hilbert) — engine-exact by construction;
    // HilbertSpec pins bijectivity and the adjacency property.
    "hilbert_keys" -> { (s: SparkSession, dir: String) =>
      val base = ev(s, dir)
        .select(uid.as("u"), micros.as("tus"))
        .select(pmod(col("u"), lit(16L)).as("ubucket"),
          pmod(expr("tus div 86400000000"), lit(16L)).as("tbucket"))
      graft.plans.Hilbert.stages("ubucket", "tbucket", 4)
        .foldLeft(base) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
        .groupBy(col("h"), col("ubucket"), col("tbucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("h")
    },
    // SAMPLED PER-GROUP QUANTILES via the bottom-k-by-hash sample sketch
    // (custom mergeable TypedImperativeAggregate, graft.plans
    // .BottomKSketch): per event type, a deterministic uniform sample of
    // k=128 rows (the k smallest polyhash(position) ranks) and the
    // sample's p25/p50/p90 of `value`. The sketch buffer is bounded (128
    // pairs), pre-combines map-side, and merges losslessly under any
    // partitioning — per-key quantile estimation in ONE aggregation pass
    // with k rows per group on the shuffle, where the exact form
    // (agg_value_stats / ts_percentile shapes) must sort every group.
    // Unlike reservoir sampling or t-digest the summary is a pure
    // function of the input set, so the sampled quantiles themselves are
    // value-oracled (DuckDB recomputes the identical sample and
    // order statistics), not tolerance-gated.
    "agg_sampled_quantiles" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .select(col("event_type"),
          sketchHash(col("position").cast("string")).as("h"),
          col("value"))
        .groupBy(col("event_type"))
        .agg(call_function("graft_bottomk", col("h"), col("value"), lit(128)).as("sk"),
          count(lit(1)).as("n_rows"))
        .select(col("event_type"), col("n_rows"),
          array_sort(map_values(col("sk"))).as("vs"))
        .select(col("event_type"), col("n_rows"),
          size(col("vs")).cast("long").as("n_sample"),
          element_at(col("vs"), expr("cast((size(vs) + 3) div 4 as int)")).as("p25"),
          element_at(col("vs"), expr("cast((size(vs) + 1) div 2 as int)")).as("p50"),
          element_at(col("vs"), expr("cast((9 * size(vs) + 9) div 10 as int)")).as("p90"))
        .orderBy("event_type")
    },
    // WINSORIZED STATS: clip each value to its type's SAMPLED [p10, p90]
    // band before aggregating — the outlier-robust mean every metrics
    // pipeline wants, composed from the sketch: stage 1 computes the
    // clip bounds from the bottom-k sample (k pairs per group, no
    // sort), stage 2 re-scans once with the 5-row bounds table
    // broadcast into the scan. Clipped values are integer-scaled
    // (floor(v·1000)) so the sums are exact longs — fully value-oracled
    // end to end including the clip counts.
    "agg_winsorized_stats" -> { (s: SparkSession, dir: String) =>
      val bounds = ev(s, dir)
        .select(col("event_type"),
          sketchHash(col("position").cast("string")).as("h"),
          col("value"))
        .groupBy(col("event_type"))
        .agg(call_function("graft_bottomk", col("h"), col("value"), lit(128)).as("sk"))
        .select(col("event_type"), array_sort(map_values(col("sk"))).as("vs"))
        .select(col("event_type"),
          element_at(col("vs"), expr("cast((size(vs) + 9) div 10 as int)")).as("lo"),
          element_at(col("vs"), expr("cast((9 * size(vs) + 9) div 10 as int)")).as("hi"))
      ev(s, dir)
        .select(col("event_type").as("et"), col("value"))
        .join(broadcast(bounds), col("et") === col("event_type"))
        .select(col("event_type"),
          floor(greatest(least(col("value"), col("hi")), col("lo")) * lit(1000.0))
            .cast("long").as("cx"),
          when(col("value") < col("lo"), 1L).otherwise(0L).as("clip_lo"),
          when(col("value") > col("hi"), 1L).otherwise(0L).as("clip_hi"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("cx")).as("sum_clipped_x1000"),
          sum(col("clip_lo")).as("n_clipped_lo"),
          sum(col("clip_hi")).as("n_clipped_hi"))
        .withColumn("mean_clipped_x1000", expr("sum_clipped_x1000 div n"))
        .orderBy("event_type")
    },
    // SAMPLED-QUANTILE ROLLUP: per-day bottom-k sketches re-merged into
    // the overall sample DECLARATIVELY (explode entries → min-v per hash
    // → 128 smallest hashes → order statistics) — the same pre-compute
    // pattern as agg_kmv_rollup: daily sketches are stored artifacts and
    // any coarser rollup derives from them without touching raw data.
    // Every step is a pure function of the input set, so the rolled-up
    // quantiles are value-oracled (the oracle replays the same per-day →
    // merge procedure).
    "agg_sampled_quantiles_rollup" -> { (s: SparkSession, dir: String) =>
      val h = sketchHash(col("position").cast("string"))
      val daily = ev(s, dir)
        .select(expr("unix_micros(ts) div 86400000000").as("day"), h.as("h"), col("value"))
        .groupBy(col("day"))
        .agg(call_function("graft_bottomk", col("h"), col("value"), lit(128)).as("sk"))
      val merged = daily
        .select(explode(map_entries(col("sk"))).as("e"))
        .select(col("e.key").as("h"), col("e.value").as("v"))
        .groupBy(col("h")).agg(min(col("v")).as("v"))
        .orderBy("h").limit(128)
      val stats = merged
        .agg(array_sort(collect_list(col("v"))).as("vs"))
        .select(size(col("vs")).cast("long").as("n_sample"),
          // empty-sample guard: the index expressions hit 0 on an empty
          // corpus and ANSI element_at(…, 0) throws — emit NULL panels
          expr("CASE WHEN size(vs) = 0 THEN NULL ELSE element_at(vs, cast((size(vs) + 3) div 4 as int)) END").as("p25"),
          expr("CASE WHEN size(vs) = 0 THEN NULL ELSE element_at(vs, cast((size(vs) + 1) div 2 as int)) END").as("p50"),
          expr("CASE WHEN size(vs) = 0 THEN NULL ELSE element_at(vs, cast((9 * size(vs) + 9) div 10 as int)) END").as("p90"))
      daily.agg(count(lit(1)).as("n_days")).crossJoin(stats)
    },
    // KMV DISTINCT SKETCH (custom mergeable TypedImperativeAggregate,
    // graft.plans.KmvSketch): per event type, the k=64 smallest distinct
    // stream hashes and the (k−1)·P/h_k estimate next to the exact
    // distinct. Buffers are bounded (64 longs) and merge losslessly
    // under ANY partitioning — the pre-aggregable distinct rollup — and
    // unlike HLL the summary is deterministic, so the estimate itself is
    // value-oracled, not tolerance-gated.
    "agg_kmv_distinct" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .select(col("event_type"),
          sketchHash(col("stream")).as("h"))
        .groupBy(col("event_type"))
        .agg(call_function("graft_kmv", col("h"), lit(64)).as("kmv"),
          countDistinct(col("h")).as("exact_distinct"))
        .select(col("event_type"), size(col("kmv")).cast("long").as("n_mins"),
          when(size(col("kmv")) < 64, size(col("kmv")).cast("long"))
            .otherwise(expr(
              "(CAST(63 AS BIGINT) * CAST(2147483647 AS BIGINT)) div greatest(element_at(kmv, 64), CAST(1 AS BIGINT))"))
            .as("est_distinct"),
          col("exact_distinct"))
        .orderBy("event_type")
    },
    // KMV ROLLUP: per-day KMV sketches re-aggregated into the overall
    // estimate DECLARATIVELY (flatten → distinct → sort → first k) —
    // the pre-compute pattern: daily sketches are stored artifacts, and
    // any coarser rollup (week, month, all-time) derives from them
    // without touching raw data. Deterministic end to end, so the
    // rolled-up estimate is value-oracled and must equal the direct
    // single-pass sketch ON THE SAME DATA (the lossless-merge property,
    // asserted by the oracle recomputing the direct form).
    "agg_kmv_rollup" -> { (s: SparkSession, dir: String) =>
      val daily = ev(s, dir)
        .select(micros.as("tus"), sketchHash(col("stream")).as("h"))
        .select(expr("tus div 86400000000").as("day"), col("h"))
        .groupBy(col("day"))
        .agg(call_function("graft_kmv", col("h"), lit(64)).as("kmv"))
      daily.agg(count(lit(1)).as("n_days"),
          slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))), 1, 64)
            .as("merged"))
        .select(col("n_days"),
          size(col("merged")).cast("long").as("n_mins"),
          when(size(col("merged")) < 64, size(col("merged")).cast("long"))
            .otherwise(expr(
              "(CAST(63 AS BIGINT) * CAST(2147483647 AS BIGINT)) div greatest(element_at(merged, 64), CAST(1 AS BIGINT))"))
            .as("est_distinct"))
        .drop("merged")
    },
    // KMV SET ALGEBRA: union, intersection and Jaccard ESTIMATES between
    // two populations' distinct-stream sketches — the sketch-tier
    // audience-overlap query ("how many streams click AND purchase")
    // that at 100 TB replaces an exact distinct-intersection (a full
    // shuffle of both sides) with arithmetic over two 64-long stored
    // summaries. Standard KMV estimators: θ = k-th min of the merged
    // sketch, ρ = |merged ∩ A ∩ B|, |A∪B| ≈ (k−1)·P/θ,
    // |A∩B| ≈ ρ·|A∪B|/k, J ≈ ρ/k — all integer arithmetic on the
    // deterministic sketches, so every estimate is value-oracled.
    "agg_kmv_setops" -> { (s: SparkSession, dir: String) =>
      val sk = ev(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          sketchHash(col("stream")).as("h"))
        .groupBy(col("event_type"))
        .agg(call_function("graft_kmv", col("h"), lit(64)).as("kmv"))
      val a = sk.filter(col("event_type") === "click").select(col("kmv").as("ka"))
      val b = sk.filter(col("event_type") === "purchase").select(col("kmv").as("kb"))
      kmvSetopsPanel(a.crossJoin(b)) // 1 row × 1 row
    },
    // MERGEABLE-SKETCH ROLLUP: per-day HLL sketches of distinct streams,
    // unioned into the overall estimate — the re-aggregation pattern
    // that makes distinct counts pre-computable at 100 TB (exact
    // distincts cannot roll up; sketches union losslessly). The gate
    // pins the unioned estimate within 10% of the exact distinct, same
    // contract as agg_approx_quality.
    "agg_sketch_union" -> { (s: SparkSession, dir: String) =>
      val daily = ev(s, dir)
        .select(micros.as("tus"), col("stream"))
        .select(expr("tus div 86400000000").as("day"), col("stream"))
        .groupBy(col("day"))
        .agg(hll_sketch_agg(col("stream")).as("sk"))
      val merged = daily.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"),
        count(lit(1)).as("n_days"))
      val exact = ev(s, dir).agg(countDistinct(col("stream")).as("exact"))
      merged.crossJoin(exact)
        .select(lit("hll_daily_union").as("check"), lit(1L).as("n_groups"),
          when(abs(col("approx") - col("exact")) <= col("exact") * lit(0.10), 1L)
            .otherwise(0L).as("n_ok"))
    },
    // DETERMINISTIC HLL (graft.plans.Hll): register-sketch distinct
    // count whose registers AND integer estimate replay bit-exactly in
    // the oracle — the stronger contract the datasketches forms above
    // cannot make (their registers are library-internal binaries, so
    // they gate a tolerance invariant only). p=9 → 512 registers; the
    // register build is one partial-aggregated groupBy-max, ≤512 rows
    // per group at ANY corpus size.
    "agg_hll_distinct" -> { (s: SparkSession, dir: String) =>
      val hashed = ev(s, dir)
        .select(col("event_type"), sketchHash(col("stream")).as("h"))
      val regs = Hll.registers(hashed, Seq("event_type"), "h", 9)
      val exact = hashed.groupBy("event_type")
        .agg(countDistinct(col("h")).as("exact_distinct"))
      Hll.estimate(regs, Seq("event_type"), 9)
        .join(exact, "event_type")
        .withColumn("err_permille",
          expr("(abs(est_hll - exact_distinct) * 1000) div greatest(exact_distinct, 1)"))
        .orderBy("event_type")
    },
    // HLL REGISTER ROLLUP: per-day register tables merged by
    // groupBy-max over buckets — max is associative, so the merged
    // sketch is EXACTLY the single-pass sketch and the gate pins
    // est_merged == est_direct as VALUES (the KMV rollup's
    // lossless-merge contract at fixed 2^p size). Daily register
    // tables are the storable artifact: week/month/all-time rollups
    // never touch raw data.
    "agg_hll_rollup" -> { (s: SparkSession, dir: String) =>
      val hashed = ev(s, dir)
        .select(micros.as("tus"), sketchHash(col("stream")).as("h"))
        .select(expr("tus div 86400000000").as("day"), col("h"))
      val daily = Hll.registers(hashed, Seq("day"), "h", 9)
      val merged = daily.groupBy("bucket").agg(max(col("r")).as("r"))
      val direct = Hll.registers(hashed, Seq.empty, "h", 9)
      Hll.estimate(merged, Seq.empty, 9)
        .select(col("est_hll").as("est_merged"))
        .crossJoin(daily.agg(countDistinct(col("day")).as("n_days")))
        .crossJoin(Hll.estimate(direct, Seq.empty, 9)
          .select(col("est_hll").as("est_direct")))
        .select(col("n_days"), col("est_merged"), col("est_direct"),
          when(col("est_merged") === col("est_direct"), 1L).otherwise(0L)
            .as("lossless"))
    },
    // HLL SET OPS: audience overlap from two register sketches — union
    // registers are the bucketwise max (exact sketch-union, no
    // re-scan), intersection by inclusion–exclusion on the integer
    // estimates, Jaccard in permille. The register-sketch mirror of
    // agg_kmv_setops, equally value-oracled; at 100 TB both pops'
    // sketches are stored artifacts and this query never touches raw
    // events.
    "agg_hll_setops" -> { (s: SparkSession, dir: String) =>
      val hashed = ev(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type").as("pop"), sketchHash(col("stream")).as("h"))
      val regs = Hll.registers(hashed, Seq("pop"), "h", 9).localCheckpoint()
      val per = Hll.estimate(regs, Seq("pop"), 9)
      val a = per.filter(col("pop") === "click").select(col("est_hll").as("est_a"))
      val b = per.filter(col("pop") === "purchase").select(col("est_hll").as("est_b"))
      val u = Hll.estimate(
          regs.groupBy("bucket").agg(max(col("r")).as("r")), Seq.empty, 9)
        .select(col("est_hll").as("est_union"))
      a.crossJoin(b).crossJoin(u) // three 1-row sides
        .withColumn("est_intersect",
          expr("greatest(est_a + est_b - est_union, CAST(0 AS BIGINT))"))
        .withColumn("jaccard_x1000",
          expr("(est_intersect * 1000) div greatest(est_union, 1)"))
    },
    // ROLLING 7-DAY DISTINCT over stored register tables — the
    // value-oracled form of the agg_rolling_wau_sketch promise ("at
    // 100 TB this rides per-day HLL sketches"): per-day registers (the
    // storable artifact) fan out to the ≤7 report days they serve, one
    // groupBy-max per (report day, bucket), one integer estimate per
    // day — raw events are read ONCE and the window arithmetic touches
    // only register rows (≤ 2^p per day). Exact WAU rides the same
    // fanout for the side-by-side error column.
    "agg_hll_rolling" -> { (s: SparkSession, dir: String) =>
      // ONE log scan: registers and the exact side both derive from the
      // DISTINCT (day, h) table (HLL registers are per-bucket maxima, so
      // deduplicating identical hashes first changes nothing; the exact
      // side already distinct'd) — the previous form scanned + hashed the
      // log twice (r16; measured 45 task-run-s across 3 full scans)
      val dh = ev(s, dir)
        .select(micros.as("tus"), sketchHash(col("stream")).as("h"))
        .select(expr("tus div 86400000000").as("day"), col("h"))
        .distinct().localCheckpoint()
      val daily = Hll.registers(dh, Seq("day"), "h", 9)
      val bounds = daily.agg(max(col("day")).as("d1"))
      val windowRegs = daily
        .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
          col("bucket"), col("r"))
        .groupBy("day", "bucket").agg(max(col("r")).as("r"))
      val exact = dh
        .select(explode(sequence(col("day"), col("day") + 6)).as("day"), col("h"))
        .groupBy("day").agg(countDistinct(col("h")).as("exact_wau"))
      Hll.estimate(windowRegs, Seq("day"), 9)
        .join(exact, "day")
        .join(broadcast(bounds))
        .filter(col("day") <= col("d1"))
        .select(col("day"), col("est_hll").as("wau_hll"), col("exact_wau"),
          expr("(abs(est_hll - exact_wau) * 1000) div greatest(exact_wau, 1)")
            .as("err_permille"))
        .orderBy("day")
    },
    // HLL PRECISION SWEEP: the same distinct count at p ∈ {4, 6, 8} —
    // ONE corpus scan builds all three register sets (each row explodes
    // to 3 (p, bucket, rho) triples, partial-max map-side → ≤336
    // register rows total; no corpus-scale materialization or re-scan),
    // every estimate value-oracled; the error column is the 1.04/√m
    // standard-error story made measurable (and the small-range
    // lc-table regime is exercised at p=8, where 256 registers put the
    // fixture counts under the 2.5m threshold).
    "agg_hll_precision" -> { (s: SparkSession, dir: String) =>
      val hashed = ev(s, dir).select(sketchHash(col("stream")).as("h"))
      val exact = hashed.agg(countDistinct(col("h")).as("exact_distinct"))
      val reg3 = Hll.registersMulti(hashed, "h", Seq(4, 6, 8)).localCheckpoint()
      Seq(4, 6, 8).map { p =>
        Hll.estimate(reg3.filter(col("p") === p.toLong).select("bucket", "r"),
            Seq.empty, p)
          .select(lit(p.toLong).as("p"), lit((1L << p)).as("m"),
            col("n_registers"), col("zeros"), col("est_hll"))
      }.reduce(_ unionAll _)
        .crossJoin(exact)
        .withColumn("err_permille",
          expr("(abs(est_hll - exact_distinct) * 1000) div greatest(exact_distinct, 1)"))
        .orderBy("p")
    }
  )

  private def EV = LogQueries.evCte

  val oracles: Map[String, String] = Map(
    "funnel_steps" ->
      s"""$EV, s0 AS (SELECT DISTINCT stream FROM ev),
         |s1 AS (SELECT stream, min(position) AS p1 FROM ev WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT e.stream, min(e.position) AS p2 FROM ev e JOIN s1 ON e.stream = s1.stream
         |       WHERE e.event_type = 'view' AND e.position > s1.p1 GROUP BY 1),
         |s3 AS (SELECT e.stream, min(e.position) AS p3 FROM ev e JOIN s2 ON e.stream = s2.stream
         |       WHERE e.event_type = 'click' AND e.position > s2.p2 GROUP BY 1),
         |s4 AS (SELECT e.stream, min(e.position) AS p4 FROM ev e JOIN s3 ON e.stream = s3.stream
         |       WHERE e.event_type = 'purchase' AND e.position > s3.p3 GROUP BY 1)
         |SELECT s0.stream,
         |  coalesce(p1, -1) AS p1, coalesce(p2, -1) AS p2,
         |  coalesce(p3, -1) AS p3, coalesce(p4, -1) AS p4,
         |  CAST(CASE WHEN p4 IS NOT NULL THEN 4 WHEN p3 IS NOT NULL THEN 3
         |       WHEN p2 IS NOT NULL THEN 2 WHEN p1 IS NOT NULL THEN 1
         |       ELSE 0 END AS BIGINT) AS steps_completed
         |FROM s0 LEFT JOIN s1 USING (stream) LEFT JOIN s2 USING (stream)
         |  LEFT JOIN s3 USING (stream) LEFT JOIN s4 USING (stream)
         |ORDER BY s0.stream""".stripMargin,
    "funnel_conversion" ->
      s"""$EV, s1 AS (SELECT stream, min(position) AS p1 FROM ev WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT e.stream, min(e.position) AS p2 FROM ev e JOIN s1 ON e.stream = s1.stream
         |       WHERE e.event_type = 'view' AND e.position > s1.p1 GROUP BY 1),
         |s3 AS (SELECT e.stream, min(e.position) AS p3 FROM ev e JOIN s2 ON e.stream = s2.stream
         |       WHERE e.event_type = 'click' AND e.position > s2.p2 GROUP BY 1),
         |s4 AS (SELECT e.stream, min(e.position) AS p4 FROM ev e JOIN s3 ON e.stream = s3.stream
         |       WHERE e.event_type = 'purchase' AND e.position > s3.p3 GROUP BY 1),
         |n AS (SELECT (SELECT count(DISTINCT stream) FROM ev) AS n0,
         |             (SELECT count(*) FROM s1) AS n1, (SELECT count(*) FROM s2) AS n2,
         |             (SELECT count(*) FROM s3) AS n3, (SELECT count(*) FROM s4) AS n4)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name, CAST(n1 AS BIGINT) AS n_streams,
         |         CAST(CASE WHEN n0 = 0 THEN -1 ELSE (1000 * n1) // n0 END AS BIGINT) AS conv_permille FROM n
         |  UNION ALL SELECT 2, 'view', CAST(n2 AS BIGINT),
         |         CAST(CASE WHEN n1 = 0 THEN -1 ELSE (1000 * n2) // n1 END AS BIGINT) FROM n
         |  UNION ALL SELECT 3, 'click', CAST(n3 AS BIGINT),
         |         CAST(CASE WHEN n2 = 0 THEN -1 ELSE (1000 * n3) // n2 END AS BIGINT) FROM n
         |  UNION ALL SELECT 4, 'purchase', CAST(n4 AS BIGINT),
         |         CAST(CASE WHEN n3 = 0 THEN -1 ELSE (1000 * n4) // n3 END AS BIGINT) FROM n
         |) ORDER BY step""".stripMargin,
    "markov_transitions" ->
      s"""$EV, t AS (
         |  SELECT event_type AS from_type,
         |         lead(event_type) OVER (PARTITION BY stream ORDER BY position) AS to_type
         |  FROM ev
         |), g AS (
         |  SELECT from_type, to_type, count(*) AS n FROM t
         |  WHERE to_type IS NOT NULL GROUP BY 1, 2
         |)
         |SELECT from_type, to_type, n,
         |  CAST((1000 * n) // (sum(n) OVER (PARTITION BY from_type)) AS BIGINT) AS permille
         |FROM g ORDER BY from_type, to_type""".stripMargin,
    "agg_pivot" ->
      s"""$EV SELECT stream,
         |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
         |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
         |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
         |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
         |  count(*) FILTER (WHERE event_type = 'view') AS n_view,
         |  count(*) AS n_total
         |FROM ev GROUP BY stream ORDER BY stream""".stripMargin,
    "retention_cohorts" ->
      s"""$EV, act AS (
         |  SELECT DISTINCT stream, epoch_us(ts) // 604800000000 AS wk FROM ev
         |), c AS (
         |  SELECT stream, wk, min(wk) OVER (PARTITION BY stream) AS cohort_wk FROM act
         |)
         |SELECT cohort_wk, wk - cohort_wk AS week_offset, count(*) AS n_active
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // sequential per-stream halving fold, stated sequentially (recursive
    // CTE over the dense revision chain — revision i+1 consumes i's fold)
    "agg_ewma" ->
      s"""${EV.replaceFirst("WITH ", "WITH RECURSIVE ")}, r AS (
         |  SELECT stream, revision, CAST(floor(value * 1000.0) AS BIGINT) AS v FROM ev
         |), f AS (
         |  SELECT stream, revision, v AS e FROM r WHERE revision = 0
         |  UNION ALL
         |  SELECT r.stream, r.revision, CAST(floor((f.e + r.v) / 2.0) AS BIGINT)
         |  FROM f JOIN r ON r.stream = f.stream AND r.revision = f.revision + 1
         |)
         |SELECT stream, CAST(max(revision) + 1 AS BIGINT) AS n,
         |       arg_max(e, revision) AS ewma_x1000
         |FROM f GROUP BY stream ORDER BY stream""".stripMargin,
    // the same sequential halving recursion with a two-field state
    "agg_holt" ->
      s"""${EV.replaceFirst("WITH ", "WITH RECURSIVE ")}, r AS (
         |  SELECT stream, revision, CAST(floor(value * 1000.0) AS BIGINT) AS v FROM ev
         |), f AS (
         |  SELECT stream, revision, v AS s, CAST(0 AS BIGINT) AS b
         |  FROM r WHERE revision = 0
         |  UNION ALL
         |  SELECT r.stream, r.revision,
         |    CAST(floor((r.v + f.s + f.b) / 2.0) AS BIGINT),
         |    CAST(floor((f.b
         |      + (CAST(floor((r.v + f.s + f.b) / 2.0) AS BIGINT) - f.s)) / 2.0) AS BIGINT)
         |  FROM f JOIN r ON r.stream = f.stream AND r.revision = f.revision + 1
         |)
         |SELECT stream, CAST(max(revision) + 1 AS BIGINT) AS n,
         |       arg_max(s, revision) AS level_x1000,
         |       arg_max(b, revision) AS trend_x1000,
         |       arg_max(s + b, revision) AS forecast_x1000
         |FROM f GROUP BY stream ORDER BY stream""".stripMargin,
    "anomaly_mad" ->
      s"""$EV, v AS (
         |  SELECT stream, CAST(floor(value * 1000.0) AS BIGINT) AS v FROM ev
         |), med AS (
         |  SELECT stream, CAST(2 * quantile_cont(v, 0.5) AS BIGINT) AS m2 FROM v GROUP BY 1
         |), d AS (
         |  SELECT v.stream, abs(v.v * 2 - med.m2) AS d2 FROM v JOIN med ON v.stream = med.stream
         |), mad AS (
         |  SELECT stream, CAST(2 * quantile_cont(d2, 0.5) AS BIGINT) AS mad4 FROM d GROUP BY 1
         |)
         |SELECT d.stream, count(*) AS n,
         |  CAST(sum(CASE WHEN d.d2 * 2 > mad.mad4 * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         |  max(d.d2) AS max_d2
         |FROM d JOIN mad ON d.stream = mad.stream
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle IS the direct (unsalted) aggregation — pinning the
    // two-stage rewrite's exact equivalence
    "agg_salted_skew" ->
      s"""$EV SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(floor(value * 1000.0) AS BIGINT)) AS BIGINT) AS sum_value_x1000
         |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,
    "zorder_keys" ->
      s"""$EV, b AS (
         |  SELECT CAST(substr(stream, 6) AS BIGINT) % 16 AS ubucket,
         |         (epoch_us(ts) // 86400000000) % 16 AS tbucket
         |  FROM ev
         |)
         |SELECT ${zExpr("ubucket", "tbucket")} AS z, ubucket, tbucket, count(*) AS n
         |FROM b GROUP BY 1, 2, 3 ORDER BY z""".stripMargin,
    "hilbert_keys" ->
      s"""$EV, b AS (
         |  SELECT CAST(substr(stream, 6) AS BIGINT) % 16 AS ubucket,
         |         (epoch_us(ts) // 86400000000) % 16 AS tbucket
         |  FROM ev
         |),
         |${graft.plans.Hilbert.sqlCtes("b", "ubucket", "tbucket", 4)}
         |SELECT h, ubucket, tbucket, count(*) AS n
         |FROM ${graft.plans.Hilbert.lastCte("ubucket", "tbucket", 4)}
         |GROUP BY 1, 2, 3 ORDER BY h""".stripMargin,
    // lossless merge pinned in the DATA: the oracle computes the DIRECT
    // single-pass k-minima over all days — the rollup of the per-day
    // sketches must coincide with it exactly
    "agg_kmv_rollup" ->
      s"""$EV, t AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day,
         |    ${sketchHashSql("stream")} AS h
         |  FROM ev
         |), g AS (
         |  SELECT count(DISTINCT day) AS n_days,
         |    list_slice(list_sort(list(DISTINCT h)), 1, 64) AS kmv
         |  FROM t
         |)
         |SELECT CAST(n_days AS BIGINT) AS n_days, CAST(len(kmv) AS BIGINT) AS n_mins,
         |  CAST(CASE WHEN len(kmv) < 64 THEN len(kmv)
         |    ELSE (CAST(63 AS BIGINT) * 2147483647) // greatest(kmv[64], 1) END AS BIGINT)
         |    AS est_distinct
         |FROM g""".stripMargin,
    // KMV is deterministic, so the ORACLE recomputes the k smallest
    // distinct hashes and the identical integer estimate — a sketch
    // whose values, not just tolerance, are pinned
    "agg_sampled_quantiles" ->
      s"""$EV, t AS (
         |  SELECT event_type,
         |    ${sketchHashSql("CAST(position AS VARCHAR)")} AS h,
         |    value AS v
         |  FROM ev
         |), d AS (
         |  SELECT event_type, h, min(v) AS v FROM t GROUP BY 1, 2
         |), r AS (
         |  SELECT event_type, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM d
         |), q AS (
         |  SELECT event_type, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS vr,
         |    count(*) OVER (PARTITION BY event_type) AS ns
         |  FROM r WHERE rn <= 128
         |), tot AS (SELECT event_type, count(*) AS n_rows FROM t GROUP BY 1)
         |SELECT q.event_type, max(tot.n_rows) AS n_rows,
         |  CAST(max(ns) AS BIGINT) AS n_sample,
         |  max(CASE WHEN vr = (ns + 3) // 4 THEN v END) AS p25,
         |  max(CASE WHEN vr = (ns + 1) // 2 THEN v END) AS p50,
         |  max(CASE WHEN vr = (9 * ns + 9) // 10 THEN v END) AS p90
         |FROM q JOIN tot ON q.event_type = tot.event_type
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_kmv_setops" ->
      s"""$EV, t AS (
         |  SELECT event_type,
         |    ${sketchHashSql("stream")} AS h
         |  FROM ev WHERE event_type IN ('click', 'purchase')
         |), g AS (
         |  SELECT event_type, list_slice(list_sort(list(DISTINCT h)), 1, 64) AS kmv
         |  FROM t GROUP BY 1
         |), ab AS (
         |  SELECT (SELECT kmv FROM g WHERE event_type = 'click') AS ka,
         |         (SELECT kmv FROM g WHERE event_type = 'purchase') AS kb
         |), m AS (
         |  SELECT ka, kb,
         |    list_slice(list_sort(list_distinct(list_concat(ka, kb))), 1, 64) AS merged
         |  FROM ab
         |), e AS (
         |  SELECT merged,
         |    CASE WHEN len(merged) < 64 THEN len(merged)
         |         ELSE (CAST(63 AS BIGINT) * 2147483647) // greatest(merged[64], 1)
         |    END AS est_union,
         |    len(list_intersect(list_intersect(merged, ka), kb)) AS rho
         |  FROM m
         |)
         |SELECT CAST(est_union AS BIGINT) AS est_union, CAST(rho AS BIGINT) AS rho,
         |  CAST(CASE WHEN len(merged) < 64 THEN rho
         |            ELSE (rho * est_union) // 64 END AS BIGINT) AS est_intersect,
         |  CAST((rho * 1000) // len(merged) AS BIGINT) AS jaccard_x1000
         |FROM e""".stripMargin,
    "agg_winsorized_stats" ->
      s"""$EV, t AS (
         |  SELECT event_type,
         |    ${sketchHashSql("CAST(position AS VARCHAR)")} AS h,
         |    value AS v
         |  FROM ev
         |), d AS (
         |  SELECT event_type, h, min(v) AS v FROM t GROUP BY 1, 2
         |), r AS (
         |  SELECT event_type, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM d
         |), q AS (
         |  SELECT event_type, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS vr,
         |    count(*) OVER (PARTITION BY event_type) AS ns
         |  FROM r WHERE rn <= 128
         |), b AS (
         |  SELECT event_type,
         |    max(CASE WHEN vr = (ns + 9) // 10 THEN v END) AS lo,
         |    max(CASE WHEN vr = (9 * ns + 9) // 10 THEN v END) AS hi
         |  FROM q GROUP BY 1
         |), c AS (
         |  SELECT e.event_type,
         |    CAST(floor(greatest(least(e.value, b.hi), b.lo) * 1000.0) AS BIGINT) AS cx,
         |    CASE WHEN e.value < b.lo THEN 1 ELSE 0 END AS clip_lo,
         |    CASE WHEN e.value > b.hi THEN 1 ELSE 0 END AS clip_hi
         |  FROM ev e JOIN b ON e.event_type = b.event_type
         |)
         |SELECT event_type, count(*) AS n,
         |  CAST(sum(cx) AS BIGINT) AS sum_clipped_x1000,
         |  CAST(sum(clip_lo) AS BIGINT) AS n_clipped_lo,
         |  CAST(sum(clip_hi) AS BIGINT) AS n_clipped_hi,
         |  CAST(sum(cx) // count(*) AS BIGINT) AS mean_clipped_x1000
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_sampled_quantiles_rollup" ->
      s"""$EV, t AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day,
         |    ${sketchHashSql("CAST(position AS VARCHAR)")} AS h,
         |    value AS v
         |  FROM ev
         |), d AS (
         |  SELECT day, h, min(v) AS v FROM t GROUP BY 1, 2
         |), r AS (
         |  SELECT day, h, v, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
         |  FROM d
         |), m AS (
         |  SELECT h, min(v) AS v FROM r WHERE rn <= 128 GROUP BY 1
         |), mr AS (
         |  SELECT h, v, row_number() OVER (ORDER BY h) AS rn FROM m
         |), q AS (
         |  SELECT v, row_number() OVER (ORDER BY v) AS vr, count(*) OVER () AS ns
         |  FROM mr WHERE rn <= 128
         |), nd AS (SELECT count(DISTINCT day) AS n_days FROM t)
         |SELECT max(nd.n_days) AS n_days, CAST(max(ns) AS BIGINT) AS n_sample,
         |  max(CASE WHEN vr = (ns + 3) // 4 THEN v END) AS p25,
         |  max(CASE WHEN vr = (ns + 1) // 2 THEN v END) AS p50,
         |  max(CASE WHEN vr = (9 * ns + 9) // 10 THEN v END) AS p90
         |FROM q, nd""".stripMargin,
    "agg_kmv_distinct" ->
      s"""$EV, t AS (
         |  SELECT event_type,
         |    ${sketchHashSql("stream")} AS h
         |  FROM ev
         |), g AS (
         |  SELECT event_type,
         |    list_slice(list_sort(list(DISTINCT h)), 1, 64) AS kmv,
         |    count(DISTINCT h) AS exact_distinct
         |  FROM t GROUP BY 1
         |)
         |SELECT event_type, CAST(len(kmv) AS BIGINT) AS n_mins,
         |  CAST(CASE WHEN len(kmv) < 64 THEN len(kmv)
         |    ELSE (CAST(63 AS BIGINT) * 2147483647) // greatest(kmv[64], 1) END AS BIGINT) AS est_distinct,
         |  exact_distinct
         |FROM g ORDER BY event_type""".stripMargin,
    // the invariant, not the sketch internals: the unioned estimate
    // lands within tolerance (n_ok == n_groups) — drift fails the gate
    "agg_sketch_union" ->
      """SELECT 'hll_daily_union' AS check, CAST(1 AS BIGINT) AS n_groups,
        |       CAST(1 AS BIGINT) AS n_ok""".stripMargin,
    // deterministic HLL: the oracle recomputes registers (bucket =
    // bottom p hash bits, rho via the identical minimal-width bin())
    // and the identical pure-BIGINT estimate — sketch VALUES pinned,
    // not a tolerance band (graft.plans.Hll builds this SQL from the
    // same constants as the Spark side)
    "agg_hll_distinct" ->
      s"""$EV, t AS (
         |  SELECT event_type, ${sketchHashSql("stream")} AS h
         |  FROM ev
         |), rb AS (
         |  SELECT event_type, ${Hll.registerSql("h", 9)}
         |  FROM t
         |), regs AS (
         |  SELECT event_type, bucket, max(rho) AS r FROM rb GROUP BY 1, 2
         |), agg AS (
         |  SELECT event_type, ${Hll.aggregateSql(9)}
         |  FROM regs GROUP BY 1
         |), est AS (
         |  SELECT event_type, n_registers, ${Hll.estimateSql(9)}
         |  FROM agg
         |), ex AS (
         |  SELECT event_type, count(DISTINCT h) AS exact_distinct FROM t GROUP BY 1
         |)
         |SELECT event_type, n_registers, zeros, est_hll,
         |  CAST(exact_distinct AS BIGINT) AS exact_distinct,
         |  (abs(est_hll - exact_distinct) * 1000) // greatest(exact_distinct, 1)
         |    AS err_permille
         |FROM est JOIN ex USING (event_type)
         |ORDER BY event_type""".stripMargin,
    // merged-vs-direct as VALUES: max over per-day registers must equal
    // the single-pass register (associativity) — the oracle computes
    // both paths independently and the lossless flag must be 1
    "agg_hll_rollup" ->
      s"""$EV, t AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day,
         |    ${sketchHashSql("stream")} AS h
         |  FROM ev
         |), rb AS (
         |  SELECT day, ${Hll.registerSql("h", 9)}
         |  FROM t
         |), daily AS (
         |  SELECT day, bucket, max(rho) AS r FROM rb GROUP BY 1, 2
         |), merged AS (
         |  SELECT bucket, max(r) AS r FROM daily GROUP BY 1
         |), magg AS (
         |  SELECT ${Hll.aggregateSql(9)} FROM merged
         |), mest AS (
         |  SELECT est_hll AS est_merged FROM (
         |    SELECT n_registers, ${Hll.estimateSql(9)} FROM magg)
         |), direct AS (
         |  SELECT bucket, max(rho) AS r FROM rb GROUP BY 1
         |), dagg AS (
         |  SELECT ${Hll.aggregateSql(9)} FROM direct
         |), dest AS (
         |  SELECT est_hll AS est_direct FROM (
         |    SELECT n_registers, ${Hll.estimateSql(9)} FROM dagg)
         |)
         |SELECT (SELECT CAST(count(DISTINCT day) AS BIGINT) FROM daily) AS n_days,
         |  est_merged, est_direct,
         |  CAST(CASE WHEN est_merged = est_direct THEN 1 ELSE 0 END AS BIGINT) AS lossless
         |FROM mest, dest""".stripMargin,
    // per-day registers fanned to their ≤7 report days, window max,
    // the identical integer estimate — rolling distinct as VALUES
    "agg_hll_rolling" ->
      s"""$EV, t AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day,
         |    ${sketchHashSql("stream")} AS h
         |  FROM ev
         |), rb AS (
         |  SELECT day, ${Hll.registerSql("h", 9)}
         |  FROM t
         |), daily AS (
         |  SELECT day, bucket, max(rho) AS r FROM rb GROUP BY 1, 2
         |), wreg AS (
         |  SELECT daily.day + w.range AS day, bucket, max(r) AS r
         |  FROM daily CROSS JOIN range(0, 7) w GROUP BY 1, 2
         |), est AS (
         |  SELECT day, n_registers, ${Hll.estimateSql(9)} FROM (
         |    SELECT day, ${Hll.aggregateSql(9)} FROM wreg GROUP BY 1)
         |), ex AS (
         |  SELECT dh.day + w.range AS day, count(DISTINCT h) AS exact_wau
         |  FROM (SELECT DISTINCT day, h FROM t) dh CROSS JOIN range(0, 7) w
         |  GROUP BY 1
         |), bd AS (SELECT max(day) AS d1 FROM daily)
         |SELECT day, est_hll AS wau_hll, CAST(exact_wau AS BIGINT) AS exact_wau,
         |  (abs(est_hll - exact_wau) * 1000) // greatest(exact_wau, 1) AS err_permille
         |FROM est JOIN ex USING (day), bd WHERE day <= d1
         |ORDER BY day""".stripMargin,
    // union = bucketwise max, intersection = inclusion–exclusion on the
    // SAME integer estimates — every figure value-pinned
    "agg_hll_setops" ->
      s"""$EV, t AS (
         |  SELECT event_type AS pop, ${sketchHashSql("stream")} AS h
         |  FROM ev WHERE event_type IN ('click', 'purchase')
         |), rb AS (
         |  SELECT pop, ${Hll.registerSql("h", 9)}
         |  FROM t
         |), regs AS (
         |  SELECT pop, bucket, max(rho) AS r FROM rb GROUP BY 1, 2
         |), per AS (
         |  SELECT pop, est_hll FROM (
         |    SELECT pop, n_registers, ${Hll.estimateSql(9)} FROM (
         |      SELECT pop, ${Hll.aggregateSql(9)} FROM regs GROUP BY 1))
         |), uni AS (
         |  SELECT est_hll AS est_union FROM (
         |    SELECT n_registers, ${Hll.estimateSql(9)} FROM (
         |      SELECT ${Hll.aggregateSql(9)} FROM (
         |        SELECT bucket, max(r) AS r FROM regs GROUP BY 1)))
         |)
         |SELECT a.est_hll AS est_a, b.est_hll AS est_b, est_union,
         |  greatest(a.est_hll + b.est_hll - est_union, CAST(0 AS BIGINT))
         |    AS est_intersect,
         |  (greatest(a.est_hll + b.est_hll - est_union, CAST(0 AS BIGINT)) * 1000)
         |    // greatest(est_union, 1) AS jaccard_x1000
         |FROM (SELECT est_hll FROM per WHERE pop = 'click') a,
         |     (SELECT est_hll FROM per WHERE pop = 'purchase') b, uni""".stripMargin,
    // one register build per precision over the same hashed scan; the
    // p=8 row exercises the linear-counting lookup regime
    "agg_hll_precision" -> {
      val perP = Seq(4, 6, 8).map { p =>
        s"""(SELECT CAST($p AS BIGINT) AS p, CAST(${1L << p} AS BIGINT) AS m,
           |  n_registers, zeros, est_hll FROM (
           |  SELECT n_registers, ${Hll.estimateSql(p)} FROM (
           |    SELECT ${Hll.aggregateSql(p)} FROM (
           |      SELECT bucket, max(rho) AS r FROM (
           |        SELECT ${Hll.registerSql("h", p)} FROM t) GROUP BY 1))))"""
          .stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""$EV, t AS (
         |  SELECT ${sketchHashSql("stream")} AS h FROM ev
         |), ex AS (
         |  SELECT count(DISTINCT h) AS exact_distinct FROM t
         |), sweep AS (
         |  $perP
         |)
         |SELECT p, m, n_registers, zeros, est_hll,
         |  CAST(exact_distinct AS BIGINT) AS exact_distinct,
         |  (abs(est_hll - exact_distinct) * 1000) // greatest(exact_distinct, 1)
         |    AS err_permille
         |FROM sweep, ex ORDER BY p""".stripMargin
    }
  )
}
