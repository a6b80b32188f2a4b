package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.log.Fixture
import graft.streaming.Sessionize

/**
 * Time-series and planning breadth over the canonical log: calendar
 * resampling with gap-fill (the feature-store shape), the balanced
 * range-shard planner a 100 TB backfill is driven by, value-distribution
 * summaries (fixed-bin histogram, activity deciles), and an iterative
 * graph computation (PageRank over the event-type transition graph) —
 * the join-agg iteration pattern Pregel-style engines specialize, shown
 * here as plain declarative Spark.
 *
 * Scale rules shared with the other packs: the event log is aggregated
 * to a coarse grain FIRST (one partial-aggregated shuffle); everything
 * downstream — grids, windows, rank iterations — runs on tables whose
 * size is bounded by cardinality (streams, days, event types), not by
 * log length. All emitted values are exact integers, so every query has
 * a full DuckDB value oracle.
 */
object SeriesQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = Fixture.events(s, dir)

  private def micros: Column = unix_micros(col("ts"))

  /** One PageRank step, shared by the 3 unrolled iterations: integer
    * arithmetic only ((rank·weight) div out-weight per edge, damping as
    * (85·x) div 100), so the fixpoint trajectory is engine-exact. Ranks
    * are normalized to sum 1e6, so the teleport term is (1-d)/N·1e6 =
    * 30000 and total mass is conserved up to integer-division leakage —
    * an invariant the spec pins. */
  private def prStep(nodes: DataFrame, edges: DataFrame, r: DataFrame): DataFrame = {
    val contrib = edges
      .join(r, edges("from_type") === r("node"))
      .select(col("to_type").as("node"), expr("(rank * n) div outw").as("c"))
      .groupBy(col("node"))
      .agg(sum(col("c")).as("cs"))
    nodes
      .join(contrib, Seq("node"), "left")
      .select(col("node"),
        (lit(30000L) + expr("(85 * nvl(cs, 0L)) div 100")).as("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CALENDAR RESAMPLE + GAP-FILL (LOCF): each stream's value series
    // re-gridded to one row per day between its first and last active
    // day, missing days carried forward from the last observation — the
    // feature-store/training-matrix shape. The log collapses to the
    // (stream, day) grain in ONE partial-aggregated shuffle (last obs of
    // a day = max_by(position) without a window sort); the calendar grid
    // (sequence + explode), the fill join, and the LOCF window all share
    // the stream partitioning, and every table after the first shuffle
    // is bounded by streams × days, not events.
    // OHLC RESAMPLE: per (stream, day) open/high/low/close of the value
    // series — the classic time-series downsample. Open/close are
    // first/last by append order via min/max over a (position, vx)
    // struct — NO window sort, the whole query is one partial-aggregated
    // shuffle on (stream, day), same trick as ts_gapfill's last-of-day
    "ts_ohlc" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .select(col("stream"), micros.as("tus"), col("position"),
          floor(col("value") * lit(1000.0)).cast("long").as("vx"))
        .select(col("stream"), expr("tus div 86400000000").as("day"),
          struct(col("position"), col("vx")).as("pv"), col("vx"))
        .groupBy(col("stream"), col("day"))
        .agg(
          min(col("pv")).getField("vx").as("open_x1000"),
          max(col("vx")).as("high_x1000"),
          min(col("vx")).as("low_x1000"),
          max(col("pv")).getField("vx").as("close_x1000"),
          count(lit(1)).as("n_events"))
        .orderBy("stream", "day")
    },
    // AUTOCORRELATION (lags 1..7) of the global daily event-count
    // series — the periodicity detector under forecast-model selection.
    // Integer-exact centering: with S = Σx and n = #days, use
    // (n·x_t − S) so no rational mean ever materializes; acf_x1000 =
    // (1000·Σ(n·x_t−S)(n·x_{t+l}−S)) div Σ(n·x_t−S)² (both engines
    // truncate toward zero). The daily series is day-cardinality-sized,
    // so the lag alignment is a tiny self-join on day+l (NO global
    // window); the 1-row denominator broadcasts.
    "ts_acf" -> { (s: SparkSession, dir: String) =>
      val daily = ev(s, dir).select(micros.as("tus"))
        .select(expr("tus div 86400000000").as("day"))
        .groupBy("day").agg(count(lit(1)).as("x"))
      val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      // the centered series is day-cardinality-sized (~30 rows) but feeds
      // the denominator AND both lag-join sides: without materialization
      // the full log scan + daily aggregation re-execute per consumer
      // (measured: SIX log scans in one query at sf0.1, 22 task-cpu-s —
      // r16, guide §3.3 "materialise an intermediate"); one tiny
      // localCheckpoint makes it one scan
      val c = daily.crossJoin(broadcast(tot))
        .select(col("day"), expr("n * x - sx").as("cx"))
        .localCheckpoint()
      val den = c.agg(sum(expr("cx * cx")).as("den"))
      val lagged = c
        .withColumn("l", explode(array((1 to 7).map(i => lit(i.toLong)): _*)))
        .withColumn("day2", col("day") + col("l"))
        .join(c.select(col("day").as("day2"), col("cx").as("cy")), "day2")
      lagged.groupBy("l")
        .agg(count(lit(1)).as("n_terms"), sum(expr("cx * cy")).as("num"))
        .crossJoin(broadcast(den))
        // a perfectly flat series has zero variance — no correlation to
        // report (and ANSI division would reject the degenerate row)
        .filter(col("den") =!= 0L)
        .select(col("l").as("lag"), col("n_terms"),
          expr("(1000 * num) div den").as("acf_x1000"))
        .orderBy("lag")
    },
    // SEASONAL-BASELINE ANOMALIES: each (day, hour) cell's event count
    // against its (dow, hour) seasonal baseline (the mean over all same
    // dow-hour cells), flagging cells ≥ 1.2× baseline — the alerting
    // layer ON TOP of agg_seasonality's profile, with the baseline
    // derived in-query. Integer throughout: deviation is
    // (1000·n·n_days) div total over the cell's history; the baseline
    // table is ≤168 rows and broadcasts back.
    "anomaly_seasonal" -> { (s: SparkSession, dir: String) =>
      // the (day, dow, hour) cell table is ≤ days×24 rows but feeds both
      // the baseline aggregation and the join-back side: materialized once
      // so the log scans once, not twice (r16; same move as ts_acf)
      val g = ev(s, dir).select(micros.as("tus"))
        .select(expr("tus div 86400000000").as("day"),
          expr("(tus div 3600000000) % 24").as("hour"))
        .withColumn("dow", expr("(day + 4) % 7"))
        .groupBy("day", "dow", "hour").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val base = g.groupBy("dow", "hour")
        .agg(sum(col("n")).as("tot"), count(lit(1)).as("n_days"))
      g.join(broadcast(base), Seq("dow", "hour"))
        .select(col("day"), col("dow"), col("hour"), col("n"),
          expr("(1000 * tot) div n_days").as("baseline_x1000"),
          expr("(1000 * n * n_days) div tot").as("dev_permille"))
        .filter(col("dev_permille") >= 1200L)
        .orderBy("day", "hour")
    },
    // SEASONALITY PROFILE: the (day-of-week × hour) activity heatmap —
    // the panel behind load forecasting and anomaly baselines. Day/hour
    // derive from pure integer epoch arithmetic ((days+4) % 7 pins
    // Sunday=0 off 1970-01-01 being a Thursday — no engine calendar/
    // locale involved); shares are integer permille of the global and
    // per-day totals. One ≤168-key partial-agg shuffle; the totals
    // broadcast back.
    "agg_seasonality" -> { (s: SparkSession, dir: String) =>
      val g = ev(s, dir).select(micros.as("tus"))
        .select(expr("((tus div 86400000000) + 4) % 7").as("dow"),
          expr("(tus div 3600000000) % 24").as("hour"))
        .groupBy("dow", "hour").agg(count(lit(1)).as("n"))
      val tot = g.agg(sum(col("n")).as("n_tot"))
      val dowTot = g.groupBy("dow").agg(sum(col("n")).as("n_dow"))
      g.join(broadcast(dowTot), "dow").crossJoin(broadcast(tot))
        .select(col("dow"), col("hour"), col("n"),
          expr("(1000 * n) div n_tot").as("share_permille"),
          expr("(1000 * n) div n_dow").as("dow_share_permille"))
        .orderBy("dow", "hour")
    },
    // PAA + SAX SYMBOLIZATION (Lin et al. 2003): each stream's value
    // series compresses to 8 equal-count segments (piecewise aggregate
    // approximation) and each segment gets a quartile symbol a–d — the
    // dimensionality reduction under whole-series similarity search and
    // motif mining at scale (series compare by their 8-char SAX words,
    // never raw points). Integer variant: segment assignment is rank
    // arithmetic ((idx·8) div n — the standard balanced split), segment
    // means are truncated integer division, and symbols come from a
    // PARTITIONED ntile over each stream's 8 segment means (rank-based
    // breakpoints instead of the float z-normal table — deterministic
    // cross-engine). One per-stream window for the index + one (stream,
    // seg) partial-agg shuffle; every window has a partition key.
    "ts_sax" -> { (s: SparkSession, dir: String) =>
      val wIdx = Window.partitionBy("stream").orderBy(col("tus"), col("position"))
      val wN = Window.partitionBy("stream")
      ev(s, dir)
        .select(col("stream"), micros.as("tus"), col("position"),
          floor(col("value") * lit(1000.0)).cast("long").as("v"))
        .withColumn("idx", row_number().over(wIdx).cast("long") - 1L)
        .withColumn("n", count(lit(1)).over(wN))
        .withColumn("seg", expr("(idx * 8) div n"))
        .groupBy(col("stream"), col("seg"))
        .agg(count(lit(1)).as("n_pts"), sum(col("v")).as("sum_v"))
        .withColumn("mean_v", expr("sum_v div n_pts"))
        .withColumn("sax", expr(
          "CASE ntile(4) OVER (PARTITION BY stream ORDER BY mean_v ASC, seg ASC) " +
            "WHEN 1 THEN 'a' WHEN 2 THEN 'b' WHEN 3 THEN 'c' ELSE 'd' END"))
        .select(col("stream"), col("seg"), col("n_pts"), col("sum_v"),
          col("mean_v"), col("sax"))
        .orderBy("stream", "seg")
    },
    "ts_gapfill" -> { (s: SparkSession, dir: String) =>
      val obs = ev(s, dir)
        .select(col("stream"), micros.as("tus"), col("position"),
          floor(col("value") * lit(1000.0)).cast("long").as("vx"))
        .select(col("stream"), expr("tus div 86400000000").as("day"),
          struct(col("position"), col("vx")).as("pv"))
        .groupBy(col("stream"), col("day"))
        .agg(max(col("pv")).getField("vx").as("vx"))
      val grid = obs.groupBy(col("stream"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("stream"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy("stream").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      grid.join(obs, Seq("stream", "day"), "left")
        .select(col("stream"), col("day"),
          last(col("vx"), ignoreNulls = true).over(w).as("v_x1000"),
          when(col("vx").isNotNull, 1L).otherwise(0L).as("observed"))
        .orderBy("stream", "day")
    },
    // BACKFILL SHARD PLANNER: split the global position range into 8
    // count-balanced shards — how a 100 TB backfill/re-index job is
    // parallelized. The naive form is ntile over a GLOBAL sort (one
    // reducer owns the whole log); this form computes the 7 interior
    // boundaries with percentile in one tiny aggregation, broadcasts the
    // single boundary row back, and assigns shards map-side — no global
    // sort anywhere. Boundary arithmetic (linear-interpolated quantile,
    // floored to BIGINT) is identical on both engines.
    "backfill_shards" -> { (s: SparkSession, dir: String) =>
      val pos = ev(s, dir).select(col("position"))
      val qs = (1 to 7).map(i => i / 8.0)
      // ONE percentile aggregate for all 7 boundaries (one sort buffer,
      // not seven), unpacked to scalar columns for the map-side CASE
      val bounds = pos
        .agg(expr(s"percentile(position, array(${qs.mkString(", ")}))").as("bs"))
        .select((1 to 7).map(i =>
          expr(s"CAST(floor(bs[${i - 1}]) AS BIGINT)").as(s"b$i")): _*)
      val shardExpr = (1 to 7)
        .map(i => s"(CASE WHEN position > b$i THEN 1 ELSE 0 END)")
        .mkString("CAST(", " + ", " AS BIGINT)")
      pos.join(broadcast(bounds))
        .select(col("position"), expr(shardExpr).as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), min(col("position")).as("min_pos"),
          max(col("position")).as("max_pos"))
        .orderBy("shard")
    },
    // COMPACTION BIN PLANNER: greedy small-file packing — the lakehouse
    // maintenance op that turns a day's worth of tiny per-shard files
    // into target-sized compaction groups. Files are modeled at the
    // (day, writer-shard) grain with a byte estimate from payload
    // lengths; within each day the running byte total div the target
    // size assigns the bin (greedy first-fit in shard order, the
    // deterministic textbook form). The window partitions BY DAY — its
    // input is bounded by writers-per-day (64 here), never by log
    // length, so the plan survives any corpus size; days pack in
    // parallel. Output: one row per (day, bin) = one compaction task.
    "log_compaction_bins" -> { (s: SparkSession, dir: String) =>
      val files = Fixture.raw(s, dir)
        .select(expr("unix_micros(ts) div 86400000000").as("day"),
          pmod(col("user_id"), lit(64L)).as("shard"),
          (length(col("props")).cast("long") + lit(64L)).as("bytes"))
        .groupBy(col("day"), col("shard"))
        .agg(sum(col("bytes")).as("bytes"))
      val w = Window.partitionBy("day").orderBy("shard")
      files
        .withColumn("cum", sum(col("bytes")).over(w))
        .withColumn("bin", expr("(cum - 1) div 4096"))
        .groupBy(col("day"), col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
          min(col("shard")).as("first_shard"), max(col("shard")).as("last_shard"))
        .orderBy("day", "bin")
    },
    // FIXED-BIN HISTOGRAM: per-event-type distribution of the payload
    // value over 10 equal-width bins of the GLOBAL range. The global
    // min/max is one tiny aggregation broadcast back into a map-side
    // bin assignment; one partial-aggregated shuffle on (type, bin).
    // Bin arithmetic is pure integer ((vx-mn)*10 div span) — engine-exact
    // including the max-value edge pinned into the top bin.
    "agg_histogram" -> { (s: SparkSession, dir: String) =>
      val v = ev(s, dir).select(col("event_type"),
        floor(col("value") * lit(1000.0)).cast("long").as("vx"))
      val rng = v.agg(min(col("vx")).as("mn"), max(col("vx")).as("mx"))
      v.join(broadcast(rng))
        .select(col("event_type"),
          least(lit(9L), expr("((vx - mn) * 10) div (mx - mn + 1)")).as("bin"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bin")
    },
    // ACTIVITY DECILES: streams ranked into 10 equal-count buckets by
    // event volume (the engagement-distribution report). The log first
    // collapses to one row per stream (partial-agg shuffle); the decile
    // then comes from `Ranking.globalRank` (range-repartition + local
    // row_number + range offsets) over the aggregate — NOT an ntile
    // window, which would move every stream row into ONE task (Spark
    // warns "No Partition Defined"; at a 100 TB stream cardinality that
    // task is the bottleneck). The bucket is ntile's exact integer
    // split (first n%10 buckets get one extra row), computed from the
    // rank — the DuckDB ntile oracle is unchanged. Deterministic
    // tie-break: the rank order includes the stream key.
    "agg_activity_deciles" -> { (s: SparkSession, dir: String) =>
      val per = ev(s, dir).groupBy(col("stream"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * lit(1000.0)).cast("long")).as("sv"))
      val ranked = graft.corpus.Ranking.globalRank(
        per, Seq.empty, Seq("n", "stream"), "rk")
      val tot = per.agg(count(lit(1)).as("ntot"))
      ranked.join(broadcast(tot))
        .withColumn("decile", expr(
          """CASE WHEN rk <= (ntot div 10 + 1) * (ntot % 10)
            |     THEN (rk - 1) div (ntot div 10 + 1) + 1
            |     ELSE (ntot % 10) + (rk - 1 - (ntot div 10 + 1) * (ntot % 10)) div (ntot div 10) + 1
            |END""".stripMargin).cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_streams"), min(col("n")).as("min_n"),
          max(col("n")).as("max_n"), sum(col("sv")).as("sum_value_x1000"))
        .orderBy("decile")
    },
    // DAILY ERROR RATE: errors per day as exact integer permille of the
    // day's volume — the SLO panel. Both counts come out of ONE
    // partial-aggregated pass (conditional sum, no second scan).
    "agg_error_rate" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .select(micros.as("tus"), col("event_type"))
        .select(expr("tus div 86400000000").as("day"), col("event_type"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))
        .select(col("day"), col("n"), col("n_errors"),
          expr("(1000 * n_errors) div n").as("error_permille"))
        .orderBy("day")
    },
    // DAY-OVER-DAY TRENDING: per-type daily volumes with the delta vs
    // the previous active day — the trend panel next to the histogram
    // and bands. One partial-aggregated shuffle collapses the log to
    // (day, type); the lag window runs over that tiny aggregate, keyed
    // by type (days per type, not events).
    "agg_trending" -> { (s: SparkSession, dir: String) =>
      val daily = ev(s, dir)
        .select(micros.as("tus"), col("event_type"))
        .select(expr("tus div 86400000000").as("day"), col("event_type"))
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily
        .withColumn("prev", coalesce(lag(col("n"), 1).over(w), lit(0L)))
        .select(col("day"), col("event_type"), col("n"),
          (col("n") - col("prev")).as("delta"))
        .orderBy("day", "event_type")
    },
    // FUNNEL TIME-TO-CONVERT: for streams completing the full
    // signup→view→click→purchase funnel (greedy first-match positions,
    // same semantics as funnel_steps/proj_funnel_stage), the elapsed µs
    // from first signup to converting purchase. Same chained-window
    // pass; the two timestamp lookups are joins on the UNIQUE position
    // (1 row/stream each side). Median is doubled (a+b — the only
    // interpolation-free exact form); all outputs integer µs.
    "agg_funnel_time" -> { (s: SparkSession, dir: String) =>
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
        .agg(min(when(col("event_type") === "signup", col("position"))).as("p1"),
          min(col("v4")).as("p4"))
        .filter(col("p4").isNotNull)
      val ts = ev(s, dir).select(col("position"), micros.as("tus"))
      per
        .join(ts.select(col("position").as("p1j"), col("tus").as("t1")), col("p1") === col("p1j"))
        .join(ts.select(col("position").as("p4j"), col("tus").as("t4")), col("p4") === col("p4j"))
        .select((col("t4") - col("t1")).as("dt"))
        .agg(count(lit(1)).as("n_converted"),
          expr("CAST(2 * percentile(dt, 0.5) AS BIGINT)").as("med2_us"),
          min(col("dt")).as("min_us"), max(col("dt")).as("max_us"))
    },
    // ROLLING ACTIVE USERS (DAU + 7-day WAU per day) — the engagement
    // report every product dashboard leads with. The log collapses to
    // the DISTINCT (stream, day) grain first (keys-only partial-agg
    // shuffle); each activity row then fans out map-side to the ≤7
    // report days it covers (explode on the SMALL activity table, never
    // the log), and the windowed distinct count runs per report day.
    // At 100 TB the same shape rides per-day HLL sketches unioned over
    // the trailing window (see agg_sketch_union); this is the exact
    // form, value-oracled.
    "agg_rolling_wau" -> { (s: SparkSession, dir: String) =>
      val act = ev(s, dir)
        .select(col("stream"), micros.as("tus"))
        .select(col("stream"), expr("tus div 86400000000").as("day"))
        .distinct()
      val bounds = act.agg(max(col("day")).as("d1"))
      val wau = act
        .select(col("stream"), explode(sequence(col("day"), col("day") + 6)).as("day"))
        .join(broadcast(bounds))
        .filter(col("day") <= col("d1"))
        .groupBy(col("day"))
        .agg(countDistinct(col("stream")).as("wau"))
      val dau = act.groupBy(col("day")).agg(countDistinct(col("stream")).as("dau"))
      wau.join(dau, Seq("day"), "left")
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("wau"))
        .orderBy("day")
    },
    // ... and the SKETCHED rolling WAU — the 100 TB form the comment
    // above promises: one HLL sketch per report day (RollingWau), fed by
    // the same map-side fan-out, servable incrementally (the streaming
    // path shares the fold — StreamingSpec pins incremental == batch).
    // The gate pins every day's estimate within 10% of the exact
    // distinct count (integer-arithmetic check, same contract as
    // agg_sketch_union).
    "agg_rolling_wau_sketch" -> { (s: SparkSession, dir: String) =>
      import s.implicits._
      val base = ev(s, dir).select(col("stream"), micros.as("tus"))
      // ONE log scan: the distinct (stream, day) activity table is
      // materialized once and feeds the bounds, the exact side AND the
      // sketch updates (HLL register updates are idempotent per value, so
      // sketching the distinct activity == sketching every event — r16;
      // the previous form scanned the log three times, 26 task-run-s)
      val act = base.select(col("stream"), expr("tus div 86400000000").as("day"))
        .distinct().localCheckpoint()
      val bounds = act.agg(max(col("day")).as("d1"))
      val exact = act
        .select(col("stream"), explode(sequence(col("day"), col("day") + 6)).as("day"))
        .groupBy(col("day")).agg(countDistinct(col("stream")).as("exact_wau"))
      val est = graft.streaming.RollingWau.estimatesBatch(
        act.select(explode(sequence(col("day"), col("day") + 6)).as("day"), col("stream"))
          .as[graft.streaming.WauUpdate]).toDF()
      est.join(exact, Seq("day"))
        .join(broadcast(bounds))
        .filter(col("day") <= col("d1"))
        .agg(count(lit(1)).as("n_days"),
          sum(when(abs(col("wau") - col("exact_wau")) * 10 <= col("exact_wau"), 1L)
            .otherwise(0L)).as("n_ok"))
        .select(lit("rolling_wau_hll").as("check"), col("n_days"), col("n_ok"))
    },
    // SESSION-PATH SIGNATURE: each stream's first 10 events as an
    // ordered "a->b->c" path string — the navigation-path report that
    // feeds funnel design (and the string form of markov_transitions'
    // edge list). The revision predicate (< 10) prunes BEFORE the
    // shuffle — a pushable range filter, so the grouped fold sees 10
    // rows/stream regardless of log size; the in-group order is made
    // explicit by sorting (position, type) structs inside the aggregate
    // (shuffle-order-proof, same contract as the projection fold).
    "agg_path_signature" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .filter(col("revision") < 10)
        .select(col("stream"), struct(col("position"), col("event_type")).as("pe"))
        .groupBy(col("stream"))
        .agg(sort_array(collect_list(col("pe"))).as("seq"))
        .select(col("stream"), size(col("seq")).cast("long").as("n"),
          array_join(expr("transform(seq, x -> x.event_type)"), "->").as("path"))
        .orderBy("stream")
    },
    // DAILY PERCENTILE BANDS (p50/p95 of the payload value per day ×
    // type) — the observability dashboard query. Percentiles are
    // DISCRETE order statistics (value at rank ceil(p·n)) — integer rank
    // arithmetic, no interpolation, so the result is engine-exact where
    // interpolated quantiles would drag IEEE evaluation order in. One
    // window pass (rank + count share the (day, type) partitioning) and
    // a groupBy that reuses the same keys — the log shuffles ONCE.
    "agg_latency_bands" -> { (s: SparkSession, dir: String) =>
      val base = ev(s, dir)
        .select(micros.as("tus"), col("event_type"),
          floor(col("value") * lit(1000.0)).cast("long").as("vx"))
        .select(expr("tus div 86400000000").as("day"), col("event_type"), col("vx"))
      val wo = Window.partitionBy("day", "event_type").orderBy("vx")
      val wc = Window.partitionBy("day", "event_type")
      base
        .withColumn("rn", row_number().over(wo).cast("long"))
        .withColumn("cnt", count(lit(1)).over(wc))
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(when(col("rn") === expr("(cnt + 1) div 2"), col("vx"))).as("p50_x1000"),
          max(when(col("rn") === expr("(19 * cnt + 19) div 20"), col("vx"))).as("p95_x1000"))
        .orderBy("day", "event_type")
    },
    // PAGERANK over the event-type transition graph (3 damped
    // iterations, d = 0.85): the iterative join-aggregate pattern of
    // graph engines, as plain DataFrame ops. The log is touched ONCE
    // (the lag-window transition extraction — same shape as
    // markov_transitions); every iteration joins rank ⋈ edges and
    // re-aggregates tables bounded by the type-graph size, not the log.
    // All rank arithmetic is scaled-integer (x1e6) with explicit div, so
    // the trajectory — not just the limit — is engine-exact.
    "graph_pagerank" -> { (s: SparkSession, dir: String) =>
      val w = Window.partitionBy("stream").orderBy("position")
      val trans = ev(s, dir)
        .select(col("stream"), col("position"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // materialize the (tiny) type graph — the log is scanned ONCE
      val nodes = trans.select(col("from_type").as("node"))
        .union(trans.select(col("to_type").as("node"))).distinct()
      val outw = trans.groupBy(col("from_type")).agg(sum(col("n")).as("outw"))
      val edges = trans.join(outw, "from_type")
      val nNodes = 5L // the declared event-type vocabulary (see agg_pivot)
      val r0 = nodes.select(col("node"), (lit(1000000L) / lit(nNodes)).cast("long").as("rank"))
      val r3 = prStep(nodes, edges, prStep(nodes, edges, prStep(nodes, edges, r0)))
      r3.orderBy("node")
    }
  )

  private def EV = LogQueries.evCte

  /** Oracle-side mirror of one PageRank step (same integer expressions). */
  private def prStepSql(prev: String, out: String): String =
    s"""$out AS (
       |  SELECT nd.node,
       |         30000 + (85 * coalesce(c.cs, 0)) // 100 AS rank
       |  FROM nodes nd LEFT JOIN (
       |    SELECT e.to_type AS node, sum((p.rank * e.n) // e.outw) AS cs
       |    FROM edges e JOIN $prev p ON e.from_type = p.node
       |    GROUP BY 1
       |  ) c ON nd.node = c.node
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ts_acf" ->
      s"""$EV, d AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS x
         |  FROM ev GROUP BY 1
         |), t AS (
         |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx FROM d
         |), c AS (
         |  SELECT day, n * x - sx AS cx FROM d, t
         |), dn AS (
         |  SELECT CAST(sum(cx * cx) AS BIGINT) AS den FROM c
         |), j AS (
         |  SELECT u.l AS lag, a.cx AS cx, b.cx AS cy
         |  FROM c a, unnest([1, 2, 3, 4, 5, 6, 7]) u(l), c b
         |  WHERE b.day = a.day + u.l
         |)
         |SELECT CAST(lag AS BIGINT) AS lag, count(*) AS n_terms,
         |  (1000 * CAST(sum(cx * cy) AS BIGINT)) // den AS acf_x1000
         |FROM j, dn WHERE den <> 0 GROUP BY lag, den ORDER BY lag""".stripMargin,
    "anomaly_seasonal" ->
      s"""$EV, g AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day,
         |    ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
         |    (epoch_us(ts) // 3600000000) % 24 AS hour,
         |    count(*) AS n
         |  FROM ev GROUP BY 1, 2, 3
         |), b AS (
         |  SELECT dow, hour, CAST(sum(n) AS BIGINT) AS tot, count(*) AS n_days
         |  FROM g GROUP BY 1, 2
         |)
         |SELECT g.day, g.dow, g.hour, n,
         |  (1000 * tot) // n_days AS baseline_x1000,
         |  (1000 * n * n_days) // tot AS dev_permille
         |FROM g JOIN b ON g.dow = b.dow AND g.hour = b.hour
         |WHERE (1000 * n * n_days) // tot >= 1200
         |ORDER BY g.day, g.hour""".stripMargin,
    "agg_seasonality" ->
      s"""$EV, g AS (
         |  SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
         |         (epoch_us(ts) // 3600000000) % 24 AS hour,
         |         count(*) AS n
         |  FROM ev GROUP BY 1, 2
         |), tot AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM g
         |), dt AS (
         |  SELECT dow, CAST(sum(n) AS BIGINT) AS n_dow FROM g GROUP BY dow
         |)
         |SELECT g.dow, g.hour, n,
         |  (1000 * n) // n_tot AS share_permille,
         |  (1000 * n) // n_dow AS dow_share_permille
         |FROM g JOIN dt ON g.dow = dt.dow, tot
         |ORDER BY g.dow, g.hour""".stripMargin,
    "ts_sax" ->
      s"""$EV, x AS (
         |  SELECT stream,
         |    CAST(row_number() OVER (PARTITION BY stream
         |      ORDER BY epoch_us(ts), position) - 1 AS BIGINT) AS idx,
         |    count(*) OVER (PARTITION BY stream) AS n,
         |    CAST(floor(value * 1000.0) AS BIGINT) AS v
         |  FROM ev
         |), g AS (
         |  SELECT stream, (idx * 8) // n AS seg,
         |    count(*) AS n_pts, CAST(sum(v) AS BIGINT) AS sum_v
         |  FROM x GROUP BY 1, 2
         |), m AS (
         |  SELECT stream, seg, n_pts, sum_v, sum_v // n_pts AS mean_v FROM g
         |)
         |SELECT stream, seg, n_pts, sum_v, mean_v,
         |  CASE ntile(4) OVER (PARTITION BY stream ORDER BY mean_v ASC, seg ASC)
         |    WHEN 1 THEN 'a' WHEN 2 THEN 'b' WHEN 3 THEN 'c' ELSE 'd' END AS sax
         |FROM m ORDER BY stream, seg""".stripMargin,
    "ts_ohlc" ->
      s"""$EV, m AS (
         |  SELECT stream, position, epoch_us(ts) // 86400000000 AS day,
         |         CAST(floor(value * 1000.0) AS BIGINT) AS vx
         |  FROM ev
         |)
         |SELECT stream, day,
         |  arg_min(vx, position) AS open_x1000,
         |  CAST(max(vx) AS BIGINT) AS high_x1000,
         |  CAST(min(vx) AS BIGINT) AS low_x1000,
         |  arg_max(vx, position) AS close_x1000,
         |  count(*) AS n_events
         |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ts_gapfill" ->
      s"""$EV, o AS (
         |  SELECT stream, epoch_us(ts) // 86400000000 AS day,
         |         arg_max(CAST(floor(value * 1000.0) AS BIGINT), position) AS vx
         |  FROM ev GROUP BY 1, 2
         |), b AS (
         |  SELECT stream, min(day) AS d0, max(day) AS d1 FROM o GROUP BY 1
         |), g AS (
         |  SELECT stream, unnest(generate_series(d0, d1)) AS day FROM b
         |), f AS (
         |  SELECT g.stream, g.day, o.vx,
         |         CASE WHEN o.vx IS NOT NULL THEN 1 ELSE 0 END AS obs
         |  FROM g LEFT JOIN o ON g.stream = o.stream AND g.day = o.day
         |)
         |SELECT stream, day,
         |  last_value(vx IGNORE NULLS) OVER (PARTITION BY stream ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_x1000,
         |  CAST(obs AS BIGINT) AS observed
         |FROM f ORDER BY stream, day""".stripMargin,
    "backfill_shards" ->
      s"""$EV, b AS (
         |  SELECT CAST(floor(quantile_cont(position, 0.125)) AS BIGINT) AS b1,
         |         CAST(floor(quantile_cont(position, 0.250)) AS BIGINT) AS b2,
         |         CAST(floor(quantile_cont(position, 0.375)) AS BIGINT) AS b3,
         |         CAST(floor(quantile_cont(position, 0.500)) AS BIGINT) AS b4,
         |         CAST(floor(quantile_cont(position, 0.625)) AS BIGINT) AS b5,
         |         CAST(floor(quantile_cont(position, 0.750)) AS BIGINT) AS b6,
         |         CAST(floor(quantile_cont(position, 0.875)) AS BIGINT) AS b7
         |  FROM ev
         |)
         |SELECT CAST((CASE WHEN position > b1 THEN 1 ELSE 0 END)
         |     + (CASE WHEN position > b2 THEN 1 ELSE 0 END)
         |     + (CASE WHEN position > b3 THEN 1 ELSE 0 END)
         |     + (CASE WHEN position > b4 THEN 1 ELSE 0 END)
         |     + (CASE WHEN position > b5 THEN 1 ELSE 0 END)
         |     + (CASE WHEN position > b6 THEN 1 ELSE 0 END)
         |     + (CASE WHEN position > b7 THEN 1 ELSE 0 END) AS BIGINT) AS shard,
         |  count(*) AS n, min(position) AS min_pos, max(position) AS max_pos
         |FROM ev, b GROUP BY 1 ORDER BY 1""".stripMargin,
    "log_compaction_bins" ->
      """WITH f AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, user_id % 64 AS shard,
        |         CAST(sum(len(props) + 64) AS BIGINT) AS bytes
        |  FROM events GROUP BY 1, 2
        |), c AS (
        |  SELECT day, shard, bytes,
        |         sum(bytes) OVER (PARTITION BY day ORDER BY shard) AS cum
        |  FROM f
        |)
        |SELECT day, CAST((cum - 1) // 4096 AS BIGINT) AS bin,
        |       count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS bin_bytes,
        |       min(shard) AS first_shard, max(shard) AS last_shard
        |FROM c GROUP BY 1, 2 ORDER BY day, bin""".stripMargin,
    "agg_histogram" ->
      s"""$EV, v AS (
         |  SELECT event_type, CAST(floor(value * 1000.0) AS BIGINT) AS vx FROM ev
         |), r AS (SELECT min(vx) AS mn, max(vx) AS mx FROM v)
         |SELECT event_type,
         |  least(9, ((vx - mn) * 10) // (mx - mn + 1)) AS bin, count(*) AS n
         |FROM v, r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_activity_deciles" ->
      s"""$EV, per AS (
         |  SELECT stream, count(*) AS n,
         |         CAST(sum(CAST(floor(value * 1000.0) AS BIGINT)) AS BIGINT) AS sv
         |  FROM ev GROUP BY 1
         |), d AS (
         |  SELECT n, sv, CAST(ntile(10) OVER (ORDER BY n, stream) AS BIGINT) AS decile FROM per
         |)
         |SELECT decile, count(*) AS n_streams, min(n) AS min_n, max(n) AS max_n,
         |       CAST(sum(sv) AS BIGINT) AS sum_value_x1000
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_error_rate" ->
      s"""$EV SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n,
         |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
         |  CAST((1000 * sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS error_permille
         |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_trending" ->
      s"""$EV, daily AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day, event_type, count(*) AS n
         |  FROM ev GROUP BY 1, 2
         |)
         |SELECT day, event_type, n,
         |  CAST(n - coalesce(lag(n) OVER (PARTITION BY event_type ORDER BY day), 0) AS BIGINT) AS delta
         |FROM daily ORDER BY day, event_type""".stripMargin,
    "agg_funnel_time" ->
      s"""$EV, s1 AS (SELECT stream, min(position) AS p1 FROM ev WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT e.stream, min(e.position) AS p2 FROM ev e JOIN s1 ON e.stream = s1.stream
         |       WHERE e.event_type = 'view' AND e.position > s1.p1 GROUP BY 1),
         |s3 AS (SELECT e.stream, min(e.position) AS p3 FROM ev e JOIN s2 ON e.stream = s2.stream
         |       WHERE e.event_type = 'click' AND e.position > s2.p2 GROUP BY 1),
         |s4 AS (SELECT e.stream, min(e.position) AS p4 FROM ev e JOIN s3 ON e.stream = s3.stream
         |       WHERE e.event_type = 'purchase' AND e.position > s3.p3 GROUP BY 1),
         |dt AS (
         |  SELECT epoch_us(e4.ts) - epoch_us(e1.ts) AS dt
         |  FROM s1 JOIN s4 USING (stream)
         |  JOIN ev e1 ON e1.position = s1.p1
         |  JOIN ev e4 ON e4.position = s4.p4
         |)
         |SELECT count(*) AS n_converted,
         |  CAST(2 * quantile_cont(dt, 0.5) AS BIGINT) AS med2_us,
         |  min(dt) AS min_us, max(dt) AS max_us
         |FROM dt""".stripMargin,
    "agg_rolling_wau" ->
      s"""$EV, act AS (
         |  SELECT DISTINCT stream, epoch_us(ts) // 86400000000 AS day FROM ev
         |), b AS (SELECT max(day) AS d1 FROM act),
         |x AS (
         |  SELECT stream, unnest(generate_series(day, day + 6)) AS day FROM act
         |), wau AS (
         |  SELECT day, count(DISTINCT stream) AS wau FROM x, b
         |  WHERE day <= d1 GROUP BY 1
         |), dau AS (
         |  SELECT day, count(DISTINCT stream) AS dau FROM act GROUP BY 1
         |)
         |SELECT day, coalesce(dau, 0) AS dau, wau
         |FROM wau LEFT JOIN dau USING (day) ORDER BY day""".stripMargin,
    // the invariant, not the sketch internals: every report day's HLL
    // estimate lands within tolerance (n_ok == n_days)
    "agg_rolling_wau_sketch" ->
      s"""$EV, act AS (
         |  SELECT DISTINCT stream, epoch_us(ts) // 86400000000 AS day FROM ev
         |), b AS (SELECT max(day) AS d1 FROM act),
         |fan AS (
         |  SELECT DISTINCT unnest(generate_series(day, day + 6)) AS day FROM act
         |), n AS (
         |  SELECT count(*) AS n_days FROM fan, b WHERE day <= d1
         |)
         |SELECT 'rolling_wau_hll' AS check,
         |  CAST(n_days AS BIGINT) AS n_days, CAST(n_days AS BIGINT) AS n_ok
         |FROM n""".stripMargin,
    "agg_path_signature" ->
      s"""$EV SELECT stream, count(*) AS n,
         |  string_agg(event_type, '->' ORDER BY position) AS path
         |FROM ev WHERE revision < 10
         |GROUP BY stream ORDER BY stream""".stripMargin,
    "agg_latency_bands" ->
      s"""$EV, v AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
         |         CAST(floor(value * 1000.0) AS BIGINT) AS vx
         |  FROM ev
         |), r AS (
         |  SELECT day, event_type, vx,
         |    CAST(row_number() OVER (PARTITION BY day, event_type ORDER BY vx) AS BIGINT) AS rn,
         |    count(*) OVER (PARTITION BY day, event_type) AS cnt
         |  FROM v
         |)
         |SELECT day, event_type, count(*) AS n,
         |  max(CASE WHEN rn = (cnt + 1) // 2 THEN vx END) AS p50_x1000,
         |  max(CASE WHEN rn = (19 * cnt + 19) // 20 THEN vx END) AS p95_x1000
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "graph_pagerank" ->
      s"""$EV, t AS (
         |  SELECT event_type AS from_type,
         |         lead(event_type) OVER (PARTITION BY stream ORDER BY position) AS to_type
         |  FROM ev
         |), tr AS (
         |  SELECT from_type, to_type, count(*) AS n FROM t
         |  WHERE to_type IS NOT NULL GROUP BY 1, 2
         |), nodes AS (
         |  SELECT from_type AS node FROM tr UNION SELECT to_type FROM tr
         |), ow AS (
         |  SELECT from_type, sum(n) AS outw FROM tr GROUP BY 1
         |), edges AS (
         |  SELECT tr.from_type, tr.to_type, tr.n, ow.outw
         |  FROM tr JOIN ow ON tr.from_type = ow.from_type
         |), r0 AS (
         |  SELECT node, 1000000 // 5 AS rank FROM nodes
         |), ${prStepSql("r0", "r1")}, ${prStepSql("r1", "r2")}, ${prStepSql("r2", "r3")}
         |SELECT node, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY node""".stripMargin
  )
}
