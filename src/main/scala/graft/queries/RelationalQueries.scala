package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.log.Fixture
import graft.streaming.Sessionize

/**
 * Relational breadth over the canonical event log: the join / OLAP shapes
 * the reference delegates entirely to PostgreSQL (SURVEY.md §2.7 documents
 * the absences — no joins, no set ops, no window functions) but that any
 * analytics engine over an event log must own. Each query is Spark-first
 * (broadcast the dimension, pre-aggregate the fact, window instead of
 * self-join where order makes it possible) with a full DuckDB value oracle.
 *
 * Scale notes are per query; the common rule: the event log is the only
 * input that is large, so no plan here ever shuffles the full log more
 * than once, and dimension tables ride broadcast joins.
 */
object RelationalQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = Fixture.events(s, dir)

  /** SCD2 validity segments of the per-stream event-type history
    * (gaps-and-islands, one stream shuffle) — shared by the snapshot
    * query and the as-of dimension join. */
  private def scd2Segments(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("stream").orderBy("position")
    ev(s, dir)
      .select(col("stream"), col("position"), col("revision"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull
          || col("event_type") =!= lag(col("event_type"), 1).over(w), 1L)
          .otherwise(0L))
      .withColumn("seg", sum(col("chg")).over(w))
      .groupBy(col("stream"), col("seg"), col("event_type"))
      .agg(min(col("position")).as("valid_from"),
        max(col("position")).as("valid_to"),
        count(lit(1)).as("n_events"))
  }

  private def micros: org.apache.spark.sql.Column = unix_micros(col("ts"))

  /** stream "user-<id>" → entity key (the reverse of Fixture's mapping). */
  private def uid = substring(col("stream"), 6, 1000000).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // AS-OF JOIN, window form: each purchase event picks up the same
    // stream's most recent PRIOR click. Because `position` is monotone
    // within the frame, max(position-of-click) over an unbounded-preceding
    // frame IS the as-of match — no join at all for the matching step, one
    // shuffle on the stream key. The payload fetch is then a self
    // equi-join on the matched position — exactly the link-resolution
    // self-join the reference declares but never implements
    // (`resolve_links`, transport/grpc/streams/extensions.go:24).
    "join_asof" -> { (s: SparkSession, dir: String) =>
      val w = Window.partitionBy("stream").orderBy("position")
        .rowsBetween(Window.unboundedPreceding, -1)
      val matched = ev(s, dir)
        .withColumn("last_click_pos",
          max(when(col("event_type") === "click", col("position"))).over(w))
        .filter(col("event_type") === "purchase" && col("last_click_pos").isNotNull)
        .select(col("position"), col("stream"), col("last_click_pos"))
      val clicked = ev(s, dir).select(
        col("position").as("last_click_pos"),
        floor(col("value") * lit(1000.0)).cast("long").as("click_value_x1000"))
      matched.join(clicked, "last_click_pos")
        .select(col("position"), col("stream"), col("last_click_pos"), col("click_value_x1000"))
        .orderBy("position")
    },
    // NATIVE AS-OF JOIN: the same latest-click-before-purchase semantics
    // as join_asof, but through the custom whole-operator
    // (graft.plans.AsOfJoinPlan/Exec via SparkSessionExtensions): one
    // co-partitioning shuffle per side + a streaming O(|L|+|R|) merge
    // holding ONE buffered right row — no window over the full log, no
    // M×N band. Shares join_asof's DuckDB oracle verbatim: the two
    // plans must produce identical rows.
    "join_asof_native" -> { (s: SparkSession, dir: String) =>
      val purchases = ev(s, dir).filter(col("event_type") === "purchase")
        .select(col("position"), col("stream"))
      val clicks = ev(s, dir).filter(col("event_type") === "click")
        .select(col("stream").as("cstream"), col("position").as("last_click_pos"),
          floor(col("value") * lit(1000.0)).cast("long").as("click_value_x1000"))
      graft.plans.AsOf.join(purchases, clicks,
          Seq("stream"), Seq("cstream"), "position", "last_click_pos", strict = true)
        .filter(col("last_click_pos").isNotNull)
        .select(col("position"), col("stream"), col("last_click_pos"),
          col("click_value_x1000"))
        .orderBy("position")
    },
    // INTERVAL (range) self-join: for each purchase, how many clicks the
    // same stream produced in the preceding 10 minutes. Logically a band
    // join (the oracle states it that way); executed as a SWEEP — one
    // sliding RANGE-frame window per stream. The band join materializes
    // every (purchase × in-band click) pair before aggregating (M×N per
    // stream); the sweep is one shuffle + one ordered pass with an O(1)
    // sliding frame, the plan that survives dense streams at 100 TB.
    // Exact integer µs on both engines; purchases with zero clicks kept.
    "join_interval" -> { (s: SparkSession, dir: String) =>
      val w = Window.partitionBy("stream").orderBy("tus")
        .rangeBetween(-600000000L, -1L)
      ev(s, dir)
        .select(col("stream"), col("position"), col("event_type"), micros.as("tus"))
        .withColumn("n_clicks_10m",
          count(when(col("event_type") === "click", lit(1))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("position"), col("stream"), col("n_clicks_10m"))
        .orderBy("position")
    },
    // BUCKETED INTERVAL JOIN: the same clicks-in-the-10-minutes-before-
    // purchase semantics as join_interval, executed as a pure EQUI-join —
    // the strategy when the sweep-line's per-stream sort is unavailable
    // (streaming state, or a partitioning pinned by a downstream op).
    // Each click replicates to ITS time bucket and the next (bucket width
    // = the window length, so every qualifying (click, purchase) pair
    // shares exactly ONE bucket — no double count by construction); each
    // purchase probes its own bucket; the exact range predicate filters
    // the 2×-replicated candidates. Shares join_interval's oracle
    // VERBATIM — exact equivalence is the contract.
    "join_interval_buckets" -> { (s: SparkSession, dir: String) =>
      val W = 600000000L // 10 minutes in µs = the bucket width
      val base = ev(s, dir)
        .select(col("stream"), col("position"), col("event_type"), micros.as("tus"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("stream"), col("position"), col("tus").as("tp"))
        .withColumn("bucket", expr(s"tp div $W"))
      val clicks = base.filter(col("event_type") === "click")
        .select(col("stream").as("cstream"), col("tus").as("tc"))
        .withColumn("bucket", explode(array(expr(s"tc div $W"), expr(s"tc div $W + 1"))))
      purchases.join(clicks,
          purchases("stream") === clicks("cstream") &&
            purchases("bucket") === clicks("bucket") &&
            col("tc") < col("tp") && col("tc") >= col("tp") - W,
          "left")
        .groupBy(col("stream"), col("position"))
        .agg(count(col("tc")).as("n_clicks_10m"))
        .select(col("position"), col("stream"), col("n_clicks_10m"))
        .orderBy("position")
    },
    // ANTI JOIN (data-quality: dimension rows never referenced by the
    // fact): customers with zero events. The log is first reduced to its
    // DISTINCT key set (a partial-aggregated shuffle of keys only — the
    // fact's payload never moves), and that small set is broadcast as the
    // anti-join probe; the dimension never shuffles either.
    "join_anti_customers" -> { (s: SparkSession, dir: String) =>
      val users = ev(s, dir).select(uid.as("uid")).distinct()
      s.read.parquet(s"$dir/customer.parquet")
        .join(broadcast(users), col("c_custkey") === col("uid"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },
    // SEMI JOIN: activity of one customer segment. The segment's key set
    // is a filtered dimension scan (tiny) broadcast to a map-side
    // left-semi over the log; the only shuffle is the pre-combined
    // per-type aggregate.
    "join_semi_segment" -> { (s: SparkSession, dir: String) =>
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      ev(s, dir).withColumn("uid", uid)
        .join(broadcast(cust), col("uid") === col("c_custkey"), "left_semi")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },
    // ROLLUP (hierarchical totals in one pass): per-(stream, type) counts,
    // per-stream subtotals, grand total. Spark expands each row into its
    // grouping sets map-side and partial-aggregates before the single
    // shuffle. NULL grouping keys are coalesced to a sentinel so the
    // output is total-order sortable on both engines.
    "agg_rollup" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .rollup(col("stream"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("stream"), lit("(all)")).as("stream"),
          coalesce(col("event_type"), lit("(all)")).as("event_type"),
          col("n"))
        .orderBy("stream", "event_type")
    },
    // Inter-event gap statistics per stream (lag window → integer µs
    // gaps → partial-aggregated stats): the latency/cadence profile of
    // each stream. One shuffle on the stream key shared by the window and
    // the aggregate (same partitioning, no exchange between them).
    "agg_interevent" -> { (s: SparkSession, dir: String) =>
      val w = Window.partitionBy("stream").orderBy(col("tus"), col("position"))
      ev(s, dir)
        .select(col("stream"), col("position"), micros.as("tus"))
        .withColumn("prev", lag(col("tus"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("gap", col("tus") - col("prev"))
        .groupBy(col("stream"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("sum_gap_us"),
          min(col("gap")).as("min_gap_us"), max(col("gap")).as("max_gap_us"))
        .orderBy("stream")
    },
    // WINDOW-FUNCTION SUITE: the full analytic-window surface an event
    // store's SQL tier owes its users — lag/lead, full-frame first/last,
    // rank vs dense_rank over a coarse value band (real ties), exact
    // integer percent-rank and cume_dist, partitioned ntile — in ONE
    // query. All five specs share the stream partitioning, so Catalyst
    // plans one exchange + per-spec sorts; every spec has a partition
    // key (the repo-wide WindowSweepSpec bans partitionBy-less windows).
    // Ratios are integer permille from rank/count arithmetic — no IEEE
    // percent_rank drift across engines.
    "window_functions" -> { (s: SparkSession, dir: String) =>
      val wPos = Window.partitionBy("stream").orderBy("position")
      val wFull = wPos.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wVb = Window.partitionBy("stream").orderBy(col("vb").desc)
      val wCume = wVb.rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("stream")
      ev(s, dir)
        .select(col("stream"), col("position"),
          floor(col("value") * lit(1000.0)).cast("long").as("v"))
        .withColumn("vb", expr("v div 100"))
        .withColumn("lag_v", lag(col("v"), 1).over(wPos))
        .withColumn("lead_v", lead(col("v"), 1).over(wPos))
        .withColumn("first_v", first(col("v")).over(wFull))
        .withColumn("last_v", last(col("v")).over(wFull))
        .withColumn("rk", rank().over(wVb).cast("long"))
        .withColumn("drk", dense_rank().over(wVb).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("pct_x1000",
          expr("CASE WHEN n > 1 THEN (1000 * (rk - 1)) div (n - 1) ELSE 0 END"))
        .withColumn("cume_n", count(lit(1)).over(wCume))
        .withColumn("cume_x1000", expr("(1000 * cume_n) div n"))
        .withColumn("quartile", ntile(4).over(wPos).cast("long"))
        .select(col("stream"), col("position"), col("v"), col("vb"),
          col("lag_v"), col("lead_v"), col("first_v"), col("last_v"),
          col("rk"), col("drk"), col("pct_x1000"), col("cume_x1000"), col("quartile"))
        .orderBy("stream", "position")
    },
    // Latest-state snapshot (read-model compaction): the newest event per
    // stream via max(struct(position, ...)) — a PARTIAL-aggregated
    // max_by, one combiner pass + one shuffle of 1 row per stream; no
    // window, no per-partition full sort. position is unique so the
    // struct comparison is decided by its first field.
    "snapshot_latest" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .groupBy(col("stream"))
        .agg(max(struct(col("position"), col("revision"), col("event_type"),
          floor(col("value") * lit(1000.0)).cast("long").as("value_x1000"))).as("s"))
        .select(col("stream"), col("s.position").as("position"),
          col("s.revision").as("revision"), col("s.event_type").as("event_type"),
          col("s.value_x1000").as("value_x1000"))
        .orderBy("stream")
    },
    // Incremental view maintenance: the snapshot is NOT rebuilt from the
    // full log — the stored snapshot-as-of-position-P (here: compacted
    // from events <= P) merges with only the delta (events > P) through
    // the same partial max_by. At scale the snapshot side is 1 row per
    // stream and the delta is the tail since the last checkpoint, so
    // maintenance cost tracks update volume, not log size. Result is
    // pinned equal to the full rebuild (same oracle as snapshot_latest).
    "snapshot_incremental" -> { (s: SparkSession, dir: String) =>
      // value is integer-scaled ONCE up front; both compaction passes
      // fold the already-exact rows (no float round-trips between passes)
      def compact(df: DataFrame): DataFrame =
        df.groupBy(col("stream"))
          .agg(max(struct(col("position"), col("revision"), col("event_type"),
            col("value_x1000"))).as("s"))
          .select(col("stream"), col("s.position").as("position"),
            col("s.revision").as("revision"), col("s.event_type").as("event_type"),
            col("s.value_x1000").as("value_x1000"))
      val p = 5000L
      val rows = ev(s, dir).select(col("stream"), col("position"), col("revision"),
        col("event_type"), floor(col("value") * lit(1000.0)).cast("long").as("value_x1000"))
      val snapshot = compact(rows.filter(col("position") <= p))
      val delta = rows.filter(col("position") > p)
      compact(snapshot.unionByName(delta)).orderBy("stream")
    },
    // CDC between snapshots: which streams changed between position P1
    // and P2, each with its new latest state and whether the stream is
    // NEW (born after P1) or UPDATED. The changed-set filter
    // (position > P1 on the compacted view) keeps the output
    // proportional to the delta's activity; the P1-membership probe is
    // a broadcast of distinct keys. This is the changelog a downstream
    // read model consumes to catch up from P1 to P2.
    "snapshot_delta" -> { (s: SparkSession, dir: String) =>
      val p1 = 200L
      val p2 = 10000L
      val rows = ev(s, dir)
        .filter(col("position") <= p2)
        .select(col("stream"), col("position"), col("revision"), col("event_type"))
      val at2 = rows.groupBy(col("stream"))
        .agg(max(struct(col("position"), col("revision"), col("event_type"))).as("s"))
        .select(col("stream"), col("s.position").as("position"),
          col("s.revision").as("revision"), col("s.event_type").as("event_type"))
      val seen1 = rows.filter(col("position") <= p1)
        .select(col("stream")).distinct().withColumn("existed", lit(1))
      at2.filter(col("position") > p1)
        .join(broadcast(seen1), Seq("stream"), "left")
        .select(col("stream"), col("position"), col("revision"), col("event_type"),
          when(col("existed").isNull, lit("new")).otherwise(lit("updated")).as("change"))
        .orderBy("stream")
    },
    // SCD2 HISTORY (gaps-and-islands): collapse each stream's run of
    // consecutive equal event_type into one validity interval
    // [valid_from, valid_to] with is_current on the last — the
    // slowly-changing-dimension table a warehouse builds from a change
    // log. One shuffle by stream; both windows and the segment groupBy
    // ride that same partitioning, and the is_current window runs over
    // the already-collapsed segments (rows = #segments, not #events).
    "snapshot_scd2" -> { (s: SparkSession, dir: String) =>
      scd2Segments(s, dir)
        .withColumn("is_current",
          when(col("valid_to") === max(col("valid_to"))
            .over(Window.partitionBy("stream")), 1L).otherwise(0L))
        .select(col("stream"), col("event_type"), col("valid_from"),
          col("valid_to"), col("n_events"), col("is_current"))
        .orderBy("stream", "valid_from")
    },
    // SCD2 AS-OF DIMENSION JOIN: each purchase event picks up the SCD2
    // validity segment current AT its position — the warehouse pattern
    // of joining a fact to a slowly-changing dimension at event time,
    // composed from two of the repo's own operators: snapshot_scd2's
    // segment table feeds the NATIVE as-of join (graft.plans.AsOf, one
    // co-partitioning shuffle per side + a streaming merge). Non-strict
    // as-of on valid_from ≡ point-in-interval containment here, because
    // validity segments tile each stream's positions — the oracle states
    // the interval-containment form and the two must agree row-for-row.
    "join_scd2_asof" -> { (s: SparkSession, dir: String) =>
      val purchases = ev(s, dir).filter(col("event_type") === "purchase")
        .select(col("position"), col("stream"))
      val segs = scd2Segments(s, dir)
        .select(col("stream").as("sstream"), col("event_type").as("seg_type"),
          col("valid_from"), col("valid_to"))
      graft.plans.AsOf.join(purchases, segs,
          Seq("stream"), Seq("sstream"), "position", "valid_from", strict = false)
        .select(col("position"), col("stream"), col("seg_type"),
          col("valid_from"), col("valid_to"))
        .orderBy("position")
    },
    // Retention-policy scan (EventStoreDB's $maxAge concept, absent in
    // the reference): per stream, how many events have aged past the
    // cutoff and the highest expired position — the truncation plan a
    // retention job executes. One partial-aggregated pass; exact
    // integer µs.
    "retention_candidates" -> { (s: SparkSession, dir: String) =>
      val cutoffUs = 1705276800000000L // 2024-01-15T00:00:00Z
      ev(s, dir)
        .select(col("stream"), col("position"), micros.as("tus"))
        .groupBy(col("stream"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("tus") < cutoffUs, 1L).otherwise(0L)).as("n_expired"),
          coalesce(max(when(col("tus") < cutoffUs, col("position"))), lit(-1L))
            .as("last_expired_position"))
        .orderBy("stream")
    },
    // SET OPERATIONS over stream key sets (SURVEY §2.7 absence owned):
    // streams that click but never purchase, and streams that do both.
    // Each branch reduces the log to a distinct key set FIRST (partial-agg
    // shuffles of keys only), so the set op itself touches #streams rows,
    // not #events.
    "set_ops_streams" -> { (s: SparkSession, dir: String) =>
      val clicks = ev(s, dir).filter(col("event_type") === "click")
        .select(col("stream")).distinct()
      val purchases = ev(s, dir).filter(col("event_type") === "purchase")
        .select(col("stream")).distinct()
      clicks.except(purchases).select(lit("clicks_minus_purchases").as("op"), col("stream"))
        .unionAll(clicks.intersect(purchases)
          .select(lit("clicks_and_purchases").as("op"), col("stream")))
        .orderBy("op", "stream")
    },
    // Exact per-stream median of the payload value (milli-units). The
    // doubled median (a+b for the even-n midpoint interpolation) is an
    // exact integer on both engines — float-interpolation-order-proof.
    // Exact `percentile` sorts per group; at 100 TB the same query rides
    // approx_percentile with a stated error bound — the exact form is the
    // verification baseline.
    "agg_median" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .select(col("stream"), floor(col("value") * lit(1000.0)).cast("long").as("v"))
        .groupBy(col("stream"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(2 * percentile(v, 0.5) AS BIGINT)").as("median_2x_1000"))
        .orderBy("stream")
    },
    // Daily-active aggregation: exact distinct streams + event volume per
    // UTC day (integer day index from µs — exact on both engines). The
    // distinct agg partial-aggregates (day, stream) pairs before the
    // shuffle; at 100 TB the same query rides approx_count_distinct.
    "agg_daily_active" -> { (s: SparkSession, dir: String) =>
      ev(s, dir)
        .select(micros.as("tus"), col("stream"))
        .select(expr("tus div 86400000000").as("day"), col("stream")) // exact integer division
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"), countDistinct(col("stream")).as("n_streams"))
        .orderBy("day")
    },
    // Approximation-quality gate (the "measure, don't guess" complement
    // of agg_daily_active / agg_median): at 100 TB those queries ride
    // approx_count_distinct and approx_percentile — this query runs the
    // approximate AND exact forms side by side and counts how many
    // groups the approximation lands within tolerance (HLL++: 10% of
    // exact; approx-percentile: exact below its accuracy threshold).
    // The oracle pins n_ok == n_groups, so approximation drift fails the
    // gate — the same monitoring pattern as sim_recall for ANN indexes.
    "agg_approx_quality" -> { (s: SparkSession, dir: String) =>
      val daily = ev(s, dir)
        .select(micros.as("tus"), col("stream"))
        .select(expr("tus div 86400000000").as("day"), col("stream"))
        .groupBy(col("day"))
        .agg(countDistinct(col("stream")).as("exact"),
          approx_count_distinct(col("stream")).as("approx"))
        .select(when(abs(col("approx") - col("exact")) <= col("exact") * lit(0.10), 1L)
          .otherwise(0L).as("ok"))
        .agg(count(lit(1)).as("n_groups"), sum(col("ok")).as("n_ok"))
        .select(lit("daily_distinct_hll").as("check"), col("n_groups"), col("n_ok"))
      val med = ev(s, dir)
        .select(col("stream"), floor(col("value") * lit(1000.0)).cast("long").as("v"))
        .groupBy(col("stream"))
        .agg(expr("percentile(v, 0.4)").as("q40"),
          expr("percentile(v, 0.6)").as("q60"),
          expr("approx_percentile(v, 0.5, 10000)").as("approx"))
        // the sketch returns an actual element; within its accuracy
        // guarantee that element's rank sits at the median, so it must
        // land inside the exact q40..q60 band (rank-based tolerance —
        // robust to wide gaps between adjacent order statistics)
        .select(when(col("approx") >= col("q40") && col("approx") <= col("q60"), 1L)
          .otherwise(0L).as("ok"))
        .agg(count(lit(1)).as("n_groups"), sum(col("ok")).as("n_ok"))
        .select(lit("median_approx").as("check"), col("n_groups"), col("n_ok"))
      daily.unionAll(med).orderBy("check")
    },
    // General OLAP over the star schema, pricing-summary shape: one
    // filtered scan of the big fact, map-side partial aggregation into 6
    // groups, one tiny shuffle. Money/quantity are floor-scaled to
    // integer centi-units PER ROW before summing (double sums are
    // addition-order-dependent; BIGINT sums are shuffle-order-proof).
    // The discounted amount is a fixed left-assoc double product — one
    // IEEE rounding per row, identical on any engine — floored before
    // the sum.
    "olap_pricing_summary" -> { (s: SparkSession, dir: String) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("count_order"),
          sum(floor(col("l_quantity") * lit(100.0)).cast("long")).as("sum_qty_x100"),
          sum(floor(col("l_extendedprice") * lit(100.0)).cast("long")).as("sum_base_x100"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
            .cast("long")).as("sum_disc_x100"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // General OLAP, shipping-priority shape (3-way join + top-k): the
    // segment-filtered customer key set BROADCASTS into the orders scan
    // (the only shuffle joins the two big tables on the order key), and
    // the final top-10 fuses into TakeOrderedAndProject — no global sort.
    "olap_top_orders" -> { (s: SparkSession, dir: String) =>
      val cut = lit("1998-01-01").cast("timestamp")
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
            .cast("long").as("rev_x100"))
      ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("rev_x100")).as("revenue_x100"))
        // date as integer days since epoch — TZ-free on both engines
        // (the parquet column is TIMESTAMP_NTZ; epoch-seconds casts would
        // drag the session timezone in)
        .select(col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
            .cast("long").as("odate_d"),
          col("o_orderpriority"), col("revenue_x100"))
        .orderBy(col("revenue_x100").desc, col("o_orderkey").asc)
        .limit(10)
    },
    // General OLAP, order-priority shape (EXISTS over the big fact): how
    // many Q1-1996 orders per priority contain at least one returned
    // line. The EXISTS side never carries payload: lineitem collapses to
    // DISTINCT order keys FIRST (a keys-only partial-agg shuffle —
    // dedup before the join, not after), then left-semi joins the
    // date-filtered orders on the order key. The count aggregation
    // reuses nothing heavy — it runs over the filtered-order slice.
    "olap_order_priority" -> { (s: SparkSession, dir: String) =>
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1996-04-01").cast("timestamp")
      val returned = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")).distinct()
      s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    // General OLAP, local-supplier-revenue shape (5-way star join): 1996
    // revenue per nation where supplier and customer share the nation,
    // within one region. Join DAG for scale: region→nation→supplier
    // collapse to ONE broadcast side (dims filter dims, smallest first);
    // the single big-big shuffle joins orders ⋈ lineitem on the order
    // key; customer is broadcast and the same-nation condition is
    // applied as a join predicate, never a post-filter on a wider
    // product. Money in floored centi-units per row before the sum.
    "olap_region_revenue" -> { (s: SparkSession, dir: String) =>
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      val natAsia = s.read.parquet(s"$dir/nation.parquet")
        .join(s.read.parquet(s"$dir/region.parquet")
          .filter(col("r_name") === "ASIA").select(col("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val supp = s.read.parquet(s"$dir/supplier.parquet")
        .join(broadcast(natAsia), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
            .cast("long").as("rev_x100"))
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
      ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_x100")).as("revenue_x100"), count(lit(1)).as("n_lines"))
        .orderBy(col("revenue_x100").desc, col("n_name").asc)
    },
    // General OLAP, promo-revenue-share shape (conditional share over a
    // dimension attribute): what fraction of one quarter's revenue came
    // from PROMO parts. The part dimension broadcasts into the single
    // filtered fact scan; both the conditional and total sums come out
    // of ONE aggregation (no second pass); the share is exact integer
    // permille of the two centi-unit sums.
    // CUBE REPORT: orders revenue by (nation × priority) with ALL
    // subtotal planes in one pass — the grouping-sets family (SURVEY
    // §2.7 OLAP breadth; agg_rollup covers the hierarchy form, this
    // covers the full lattice). Spark expands each input row into the 4
    // grouping sets MAP-SIDE and partial-aggregates before the single
    // shuffle, so the wire carries at most 4× the distinct group count,
    // never 4× the data. Dims broadcast into the fact scan. NULL group
    // markers are folded to 'ALL' (both dims are non-null in the data,
    // so the marker is unambiguous and the DuckDB CUBE mirrors exactly).
    "olap_cube" -> { (s: SparkSession, dir: String) =>
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
      val nat = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey"), col("n_name"))
      s.read.parquet(s"$dir/orders.parquet")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("o_orderpriority").as("priority"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
        .cube(col("nation"), col("priority"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("revenue_x100"))
        .select(coalesce(col("nation"), lit("ALL")).as("nation"),
          coalesce(col("priority"), lit("ALL")).as("priority"),
          col("n_orders"), col("revenue_x100"))
        .orderBy("nation", "priority")
    },
    // GROUPING SETS, mixed-plane form: one pass emitting two UNRELATED
    // report planes — revenue by nation, and revenue by (priority, year)
    // — the arbitrary-sets member of the grouping family next to
    // agg_rollup (hierarchy) and olap_cube (full lattice). Spark expands
    // each row into exactly the 2 requested sets map-side (not the 2^k
    // lattice) and partial-aggregates before the one shuffle. The plane
    // tag derives from which keys are non-null (all three are non-null
    // in the data, so the marker is unambiguous) — no engine-specific
    // GROUPING_ID convention to mirror.
    "olap_grouping_sets" -> { (s: SparkSession, dir: String) =>
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
      val nat = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey"), col("n_name"))
      s.read.parquet(s"$dir/orders.parquet")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("o_orderpriority").as("priority"),
          year(col("o_orderdate")).cast("long").as("yr"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
        .groupingSets(
          Seq(Seq(col("nation")), Seq(col("priority"), col("yr"))),
          col("nation"), col("priority"), col("yr"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("revenue_x100"))
        .select(
          when(col("nation").isNotNull, lit("by_nation"))
            .otherwise(lit("by_priority_year")).as("plane"),
          coalesce(col("nation"), lit("ALL")).as("nation"),
          coalesce(col("priority"), lit("ALL")).as("priority"),
          coalesce(col("yr"), lit(-1L)).as("yr"),
          col("n_orders"), col("revenue_x100"))
        .orderBy("plane", "nation", "priority", "yr")
    },
    // SALTED SKEW JOIN: the compile-time skew treatment for a big-big
    // SHUFFLE JOIN (the join complement of agg_salted_skew, and the tool
    // when AQE's runtime split can't fire — e.g. a partitioning pinned
    // by a downstream per-key operator). The probe side (lineitem)
    // carries a deterministic HASH salt covering all of [0,8) (a column
    // like l_linenumber ∈ [1,7] would leave one cell permanently empty
    // — 1/8 of the replicated build rows dead on the wire); the build
    // side (orders) explodes ×8 so every (key, salt) cell of a hot key
    // lands on its own reducer. The oracle is the DIRECT unsalted join —
    // exact equivalence is the contract, like agg_salted_skew. Cost: 8×
    // the BUILD side rows on the wire (orders here collapses to 2
    // columns), bought for an 8× reduction in worst-reducer row count on
    // the hot key — the right trade exactly when one order key
    // dominates.
    "join_salted_skew" -> { (s: SparkSession, dir: String) =>
      val S = 8
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"),
          pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(S)).cast("int").as("salt"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
            .cast("long").as("rev_x100"))
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .withColumn("salt", explode(array((0 until S).map(i => lit(i)): _*)))
      li.join(ord, li("l_orderkey") === ord("o_orderkey") && li("salt") === ord("salt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"), sum(col("rev_x100")).as("revenue_x100"))
        .orderBy("o_orderpriority")
    },
    // CUSTOMER ORDER DISTRIBUTION (TPC-H Q13 shape — the outer-join +
    // re-aggregation pattern): how many customers placed exactly k
    // orders, INCLUDING the zero-order customers only a LEFT join can
    // see. First level collapses orders to the customer grain (count of
    // the nullable join key counts matches only); second level is a
    // ≤max-orders-key rollup. The classic two-level histogram an
    // engagement dashboard reads.
    "olap_cust_order_dist" -> { (s: SparkSession, dir: String) =>
      val cust = s.read.parquet(s"$dir/customer.parquet").select(col("c_custkey"))
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_customers").desc, col("n_orders").desc)
    },
    // MIN-COST SUPPLIER (TPC-H Q2 shape, the correlated-subquery
    // pattern): for every part, the supplier selling it at the lowest
    // observed unit price — a per-group argmin executed as min(struct)
    // over the (part, supplier) aggregate (NO window sort, the
    // snapshot_latest trick), then part/supplier dims broadcast in.
    // Unit price is exact integer cents-per-unit (staged floors both
    // engines).
    "olap_min_cost_supplier" -> { (s: SparkSession, dir: String) =>
      val offers = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long").as("cents"),
          floor(col("l_quantity")).cast("long").as("units"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("cents")).as("cents"), sum(col("units")).as("units"),
          count(lit(1)).as("n_lines"))
        .filter(col("units") > 0L)
        .withColumn("cpu", expr("cents div units"))
      val best = offers
        .groupBy("l_partkey")
        .agg(min(struct(col("cpu"), col("l_suppkey"), col("n_lines"))).as("m"))
        .select(col("l_partkey"), col("m.l_suppkey").as("suppkey"),
          col("m.cpu").as("cents_per_unit"), col("m.n_lines").as("n_lines"))
      val part = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey"), col("p_type"))
      val supp = s.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey"), col("s_name"))
      best.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("suppkey") === col("s_suppkey"))
        .select(col("l_partkey").as("partkey"), col("p_type"), col("suppkey"),
          col("s_name"), col("cents_per_unit"), col("n_lines"))
        .orderBy("partkey")
    },
    // TOLERANCE-BOUNDED AS-OF JOIN (the financial asof variant): each
    // purchase matches its latest prior click ONLY if that click is
    // within 10 minutes — staleness beyond the tolerance yields no
    // match. Same sweep shape as join_interval (one RANGE-frame window
    // per stream, max of a (time, position) struct = latest-in-band);
    // the oracle states the band join + row_number form.
    "join_asof_tolerance" -> { (s: SparkSession, dir: String) =>
      val w = Window.partitionBy("stream").orderBy("tus")
        .rangeBetween(-600000000L, -1L)
      ev(s, dir)
        .select(col("stream"), col("position"), col("event_type"), micros.as("tus"))
        .withColumn("lc",
          max(when(col("event_type") === "click",
            struct(col("tus"), col("position")))).over(w))
        .filter(col("event_type") === "purchase" && col("lc").isNotNull)
        .select(col("position"), col("stream"),
          col("lc.position").as("click_pos"),
          (col("tus") - col("lc.tus")).as("staleness_us"))
        .orderBy("position")
    },
    // MARKET SHARE (TPC-H Q8 shape): within one region's customer market,
    // the per-year revenue share of a single supplier nation — the
    // two-level conditional-share report. Every dimension chain
    // (customer→nation→region; supplier→nation) collapses to a broadcast
    // key set; the one big-big shuffle joins lineitem to the filtered
    // orders; both the conditional and total sums come out of ONE
    // aggregation per year; the share is exact integer permille.
    "olap_market_share" -> { (s: SparkSession, dir: String) =>
      val lo = lit("1995-01-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      val nat = s.read.parquet(s"$dir/nation.parquet")
      val asiaCust = s.read.parquet(s"$dir/customer.parquet")
        .join(broadcast(nat.filter(col("n_regionkey") === 2)
          .select(col("n_nationkey"))), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("yr"))
      val supp = s.read.parquet(s"$dir/supplier.parquet")
        .join(broadcast(nat.select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
            .cast("long").as("rev_x100"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("yr"))
        .agg(
          sum(when(col("supp_nation") === "NATION_2", col("rev_x100")).otherwise(0L))
            .as("nation_x100"),
          sum(col("rev_x100")).as("total_x100"),
          count(lit(1)).as("n_lines"))
        .select(col("yr"), col("nation_x100"), col("total_x100"), col("n_lines"),
          expr("(1000 * nation_x100) div total_x100").as("share_permille"))
        .orderBy("yr")
    },
    "olap_promo_share" -> { (s: SparkSession, dir: String) =>
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1996-04-01").cast("timestamp")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .select(col("l_partkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
            .cast("long").as("rev_x100"))
      val part = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey"), col("p_type"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev_x100")).otherwise(0L)).as("promo_x100"),
          sum(col("rev_x100")).as("total_x100"),
          count(lit(1)).as("n_lines"))
        .select(col("promo_x100"), col("total_x100"), col("n_lines"),
          expr("(1000 * promo_x100) div total_x100").as("promo_permille"))
    },
    // General OLAP, returned-item-customer shape (aggregate-before-join):
    // 1996 revenue lost to returns, by customer, top 10. The fact is
    // aggregated to the customer grain BEFORE any dimension join — the
    // two big tables join once on the order key, collapse to custkey,
    // and only then do the (shrunken) per-customer rows meet customer ⋈
    // nation, both broadcast. Joining dims first would carry their
    // columns through the big shuffle for nothing.
    "olap_returned_customers" -> { (s: SparkSession, dir: String) =>
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
            .cast("long").as("rev_x100"))
      val perCust = ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev_x100")).as("lost_x100"), count(lit(1)).as("n_lines"))
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val nat = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey"), col("n_name"))
      perCust.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("lost_x100"), col("n_lines"))
        .orderBy(col("lost_x100").desc, col("c_custkey").asc)
        .limit(10)
    }
  )

  private def EV = LogQueries.evCte

  private val baseOracles: Map[String, String] = Map(
    "join_asof" ->
      s"""$EV, a AS (
         |  SELECT position, stream, event_type,
         |         max(CASE WHEN event_type = 'click' THEN position END)
         |           OVER (PARTITION BY stream ORDER BY position
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_pos
         |  FROM ev
         |)
         |SELECT a.position, a.stream, a.last_click_pos,
         |       CAST(floor(e.value * 1000.0) AS BIGINT) AS click_value_x1000
         |FROM a JOIN ev e ON a.last_click_pos = e.position
         |WHERE a.event_type = 'purchase'
         |ORDER BY a.position""".stripMargin,
    "join_interval" ->
      s"""$EV SELECT p.position, p.stream, count(c.position) AS n_clicks_10m
         |FROM ev p LEFT JOIN ev c
         |  ON c.stream = p.stream AND c.event_type = 'click'
         | AND epoch_us(c.ts) < epoch_us(p.ts)
         | AND epoch_us(c.ts) >= epoch_us(p.ts) - 600000000
         |WHERE p.event_type = 'purchase'
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // the band-join statement of the same semantics — the bucketed
    // rewrite must be exactly equivalent (join_interval's oracle verbatim)
    "join_interval_buckets" ->
      s"""$EV SELECT p.position, p.stream, count(c.position) AS n_clicks_10m
         |FROM ev p LEFT JOIN ev c
         |  ON c.stream = p.stream AND c.event_type = 'click'
         | AND epoch_us(c.ts) < epoch_us(p.ts)
         | AND epoch_us(c.ts) >= epoch_us(p.ts) - 600000000
         |WHERE p.event_type = 'purchase'
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "join_anti_customers" ->
      s"""$EV SELECT c_custkey, c_name FROM customer
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM ev WHERE CAST(substr(stream, 6) AS BIGINT) = c_custkey
         |) ORDER BY c_custkey""".stripMargin,
    "join_semi_segment" ->
      s"""$EV SELECT event_type, count(*) AS n FROM ev
         |WHERE EXISTS (
         |  SELECT 1 FROM customer
         |  WHERE c_custkey = CAST(substr(stream, 6) AS BIGINT)
         |    AND c_mktsegment = 'BUILDING'
         |) GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_rollup" ->
      s"""$EV SELECT coalesce(stream, '(all)') AS stream,
         |  coalesce(event_type, '(all)') AS event_type, count(*) AS n
         |FROM ev GROUP BY ROLLUP(stream, event_type) ORDER BY 1, 2""".stripMargin,
    "window_functions" ->
      s"""$EV, y AS (
         |  SELECT stream, position, CAST(floor(value * 1000.0) AS BIGINT) AS v,
         |         CAST(floor(value * 1000.0) AS BIGINT) // 100 AS vb
         |  FROM ev
         |)
         |SELECT stream, position, v, vb,
         |  lag(v, 1) OVER wp AS lag_v,
         |  lead(v, 1) OVER wp AS lead_v,
         |  first_value(v) OVER wf AS first_v,
         |  last_value(v) OVER wf AS last_v,
         |  CAST(rank() OVER wv AS BIGINT) AS rk,
         |  CAST(dense_rank() OVER wv AS BIGINT) AS drk,
         |  CASE WHEN count(*) OVER wn > 1
         |    THEN (1000 * (CAST(rank() OVER wv AS BIGINT) - 1)) // (count(*) OVER wn - 1)
         |    ELSE 0 END AS pct_x1000,
         |  (1000 * count(*) OVER wc) // (count(*) OVER wn) AS cume_x1000,
         |  CAST(ntile(4) OVER wp AS BIGINT) AS quartile
         |FROM y
         |WINDOW
         |  wp AS (PARTITION BY stream ORDER BY position),
         |  wf AS (PARTITION BY stream ORDER BY position
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
         |  wv AS (PARTITION BY stream ORDER BY vb DESC),
         |  wc AS (PARTITION BY stream ORDER BY vb DESC
         |         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wn AS (PARTITION BY stream)
         |ORDER BY stream, position""".stripMargin,
    // DuckDB sum(BIGINT) is HUGEINT — CAST back for schema parity
    "agg_interevent" ->
      s"""$EV, x AS (
         |  SELECT stream, position, epoch_us(ts) AS tus,
         |         lag(epoch_us(ts)) OVER (PARTITION BY stream ORDER BY epoch_us(ts), position) AS prev
         |  FROM ev
         |)
         |SELECT stream, count(*) AS n_gaps,
         |       CAST(sum(tus - prev) AS BIGINT) AS sum_gap_us,
         |       min(tus - prev) AS min_gap_us, max(tus - prev) AS max_gap_us
         |FROM x WHERE prev IS NOT NULL
         |GROUP BY stream ORDER BY stream""".stripMargin,
    "snapshot_latest" ->
      s"""$EV SELECT stream, position, revision, event_type,
         |  CAST(floor(value * 1000.0) AS BIGINT) AS value_x1000
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY stream ORDER BY position DESC) AS rk
         |  FROM ev
         |) WHERE rk = 1 ORDER BY stream""".stripMargin,
    // identical to the full rebuild by construction — that IS the pinned
    // invariant of incremental maintenance
    "snapshot_incremental" ->
      s"""$EV SELECT stream, position, revision, event_type,
         |  CAST(floor(value * 1000.0) AS BIGINT) AS value_x1000
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY stream ORDER BY position DESC) AS rk
         |  FROM ev
         |) WHERE rk = 1 ORDER BY stream""".stripMargin,
    "snapshot_scd2" ->
      s"""$EV, x AS (
         |  SELECT stream, position, event_type,
         |    CASE WHEN lag(event_type) OVER (PARTITION BY stream ORDER BY position)
         |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
         |  FROM ev
         |), y AS (
         |  SELECT *, sum(chg) OVER (PARTITION BY stream ORDER BY position) AS seg FROM x
         |), g AS (
         |  SELECT stream, seg, event_type, min(position) AS valid_from,
         |    max(position) AS valid_to, count(*) AS n_events
         |  FROM y GROUP BY 1, 2, 3
         |)
         |SELECT stream, event_type, valid_from, valid_to,
         |  CAST(n_events AS BIGINT) AS n_events,
         |  CAST(CASE WHEN valid_to = max(valid_to) OVER (PARTITION BY stream)
         |    THEN 1 ELSE 0 END AS BIGINT) AS is_current
         |FROM g ORDER BY stream, valid_from""".stripMargin,
    // the point-in-interval statement of the same join; the native
    // as-of execution must agree row-for-row
    "join_scd2_asof" ->
      s"""$EV, x AS (
         |  SELECT stream, position, event_type,
         |    CASE WHEN lag(event_type) OVER (PARTITION BY stream ORDER BY position)
         |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
         |  FROM ev
         |), y AS (
         |  SELECT *, sum(chg) OVER (PARTITION BY stream ORDER BY position) AS seg FROM x
         |), g AS (
         |  SELECT stream, seg, event_type, min(position) AS valid_from,
         |    max(position) AS valid_to
         |  FROM y GROUP BY 1, 2, 3
         |)
         |SELECT p.position, p.stream, g.event_type AS seg_type,
         |  g.valid_from, g.valid_to
         |FROM ev p JOIN g
         |  ON g.stream = p.stream
         | AND p.position BETWEEN g.valid_from AND g.valid_to
         |WHERE p.event_type = 'purchase'
         |ORDER BY p.position""".stripMargin,
    "snapshot_delta" ->
      s"""$EV, r AS (
         |  SELECT stream, position, revision, event_type FROM ev WHERE position <= 10000
         |), a2 AS (
         |  SELECT stream, position, revision, event_type FROM (
         |    SELECT *, row_number() OVER (PARTITION BY stream ORDER BY position DESC) AS rk
         |    FROM r
         |  ) WHERE rk = 1
         |), s1 AS (SELECT DISTINCT stream FROM r WHERE position <= 200)
         |SELECT a2.stream, a2.position, a2.revision, a2.event_type,
         |  CASE WHEN a2.stream IN (SELECT stream FROM s1) THEN 'updated' ELSE 'new' END AS change
         |FROM a2 WHERE a2.position > 200 ORDER BY a2.stream""".stripMargin,
    // DuckDB sum(BIGINT) is HUGEINT — CAST back for schema parity
    "retention_candidates" ->
      s"""$EV SELECT stream, count(*) AS n_events,
         |  CAST(sum(CASE WHEN epoch_us(ts) < 1705276800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_expired,
         |  coalesce(max(CASE WHEN epoch_us(ts) < 1705276800000000 THEN position END), -1) AS last_expired_position
         |FROM ev GROUP BY stream ORDER BY stream""".stripMargin,
    "set_ops_streams" ->
      s"""$EV, c AS (SELECT DISTINCT stream FROM ev WHERE event_type = 'click'),
         |p AS (SELECT DISTINCT stream FROM ev WHERE event_type = 'purchase')
         |SELECT 'clicks_minus_purchases' AS op, stream FROM (SELECT stream FROM c EXCEPT SELECT stream FROM p)
         |UNION ALL
         |SELECT 'clicks_and_purchases' AS op, stream FROM (SELECT stream FROM c INTERSECT SELECT stream FROM p)
         |ORDER BY op, stream""".stripMargin,
    "agg_median" ->
      s"""$EV SELECT stream, count(*) AS n,
         |  CAST(2 * quantile_cont(CAST(floor(value * 1000.0) AS BIGINT), 0.5) AS BIGINT) AS median_2x_1000
         |FROM ev GROUP BY stream ORDER BY stream""".stripMargin,
    "agg_daily_active" ->
      s"""$EV SELECT epoch_us(ts) // 86400000000 AS day,
         |  count(*) AS n_events, count(DISTINCT stream) AS n_streams
         |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle states the invariant: every group within tolerance
    // (n_ok == n_groups); a drifting approximation breaks the hash match
    "agg_approx_quality" ->
      s"""$EV, d AS (SELECT count(DISTINCT epoch_us(ts) // 86400000000) AS n FROM ev),
         |s AS (SELECT count(DISTINCT stream) AS n FROM ev)
         |SELECT 'daily_distinct_hll' AS check, CAST(d.n AS BIGINT) AS n_groups,
         |       CAST(d.n AS BIGINT) AS n_ok FROM d
         |UNION ALL
         |SELECT 'median_approx', CAST(s.n AS BIGINT), CAST(s.n AS BIGINT) FROM s
         |ORDER BY 1""".stripMargin,
    // DuckDB sum(BIGINT) is HUGEINT — CAST back for schema parity
    "olap_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS count_order,
         |  CAST(sum(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_x100,
         |  CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_base_x100,
         |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS sum_disc_x100
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "olap_top_orders" ->
      s"""SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS odate_d, o_orderpriority,
         |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_x100
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue_x100 DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "olap_order_priority" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
         |  AND EXISTS (SELECT 1 FROM lineitem
         |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "olap_region_revenue" ->
      s"""SELECT n_name,
         |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_x100,
         |  count(*) AS n_lines
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY 1 ORDER BY revenue_x100 DESC, n_name ASC""".stripMargin,
    "olap_cube" ->
      s"""SELECT coalesce(n_name, 'ALL') AS nation,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  count(*) AS n_orders,
         |  CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_x100
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY CUBE (n_name, o_orderpriority)
         |ORDER BY nation, priority""".stripMargin,
    "olap_grouping_sets" ->
      s"""SELECT
         |  CASE WHEN n_name IS NOT NULL THEN 'by_nation' ELSE 'by_priority_year' END AS plane,
         |  coalesce(n_name, 'ALL') AS nation,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  coalesce(CAST(year(o_orderdate) AS BIGINT), -1) AS yr,
         |  count(*) AS n_orders,
         |  CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_x100
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY GROUPING SETS ((n_name), (o_orderpriority, year(o_orderdate)))
         |ORDER BY plane, nation, priority, yr""".stripMargin,
    // the DIRECT (unsalted) join — the salted rewrite must be exactly
    // equivalent, same contract as agg_salted_skew
    "join_salted_skew" ->
      s"""SELECT o_orderpriority, count(*) AS n_lines,
         |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_x100
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "olap_cust_order_dist" ->
      s"""WITH pc AS (
         |  SELECT c_custkey, count(o_orderkey) AS n_orders
         |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |  GROUP BY 1
         |)
         |SELECT n_orders, count(*) AS n_customers
         |FROM pc GROUP BY 1 ORDER BY n_customers DESC, n_orders DESC""".stripMargin,
    "olap_min_cost_supplier" ->
      s"""WITH o AS (
         |  SELECT l_partkey, l_suppkey,
         |    CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS cents,
         |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS units,
         |    count(*) AS n_lines
         |  FROM lineitem GROUP BY 1, 2
         |), c AS (
         |  SELECT l_partkey, l_suppkey, cents // units AS cpu, n_lines
         |  FROM o WHERE units > 0
         |), b AS (
         |  SELECT l_partkey, l_suppkey, cpu, n_lines FROM (
         |    SELECT *, row_number() OVER (PARTITION BY l_partkey
         |      ORDER BY cpu, l_suppkey) AS rk
         |    FROM c
         |  ) WHERE rk = 1
         |)
         |SELECT l_partkey AS partkey, p_type, l_suppkey AS suppkey, s_name,
         |  cpu AS cents_per_unit, n_lines
         |FROM b JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |ORDER BY partkey""".stripMargin,
    // band join + row_number states the same latest-within-tolerance
    // semantics as the RANGE-frame sweep
    "join_asof_tolerance" ->
      s"""$EV SELECT position, stream, click_pos, staleness_us FROM (
         |  SELECT p.position, p.stream, c.position AS click_pos,
         |    epoch_us(p.ts) - epoch_us(c.ts) AS staleness_us,
         |    row_number() OVER (PARTITION BY p.position
         |      ORDER BY epoch_us(c.ts) DESC, c.position DESC) AS rk
         |  FROM ev p JOIN ev c ON c.stream = p.stream AND c.event_type = 'click'
         |    AND epoch_us(c.ts) < epoch_us(p.ts)
         |    AND epoch_us(c.ts) >= epoch_us(p.ts) - 600000000
         |  WHERE p.event_type = 'purchase'
         |) WHERE rk = 1 ORDER BY position""".stripMargin,
    "olap_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         |  CAST(sum(CASE WHEN sn.n_name = 'NATION_2'
         |    THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)
         |    ELSE 0 END) AS BIGINT) AS nation_x100,
         |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS total_x100,
         |  count(*) AS n_lines,
         |  CAST((1000 * sum(CASE WHEN sn.n_name = 'NATION_2'
         |    THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)
         |    ELSE 0 END)) // sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS share_permille
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey AND cn.n_regionkey = 2
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "olap_promo_share" ->
      s"""WITH j AS (
         |  SELECT p_type,
         |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS rev_x100
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
         |)
         |SELECT
         |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_x100 ELSE 0 END) AS BIGINT) AS promo_x100,
         |  CAST(sum(rev_x100) AS BIGINT) AS total_x100,
         |  count(*) AS n_lines,
         |  CAST((1000 * sum(CASE WHEN p_type = 'PROMO' THEN rev_x100 ELSE 0 END)) // sum(rev_x100) AS BIGINT) AS promo_permille
         |FROM j""".stripMargin,
    "olap_returned_customers" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS lost_x100,
         |  count(*) AS n_lines
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         |  AND l_returnflag = 'R'
         |GROUP BY 1, 2, 3
         |ORDER BY lost_x100 DESC, c_custkey ASC LIMIT 10""".stripMargin
  )

  // the native as-of operator must reproduce the composed form's rows
  // exactly — same oracle verbatim
  val oracles: Map[String, String] =
    baseOracles + ("join_asof_native" -> baseOracles("join_asof"))
}
