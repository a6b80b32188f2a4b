package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic HyperLogLog (Flajolet et al. 2007) as plain declarative
 * aggregation — the REGISTER-tier distinct sketch next to the
 * order-statistics tier ([[KmvSketch]]). The repo already uses Spark's
 * built-in datasketches HLL where only an accuracy INVARIANT is gated
 * (`agg_sketch_union`, `corpus_overlap_sketch`): that sketch's registers
 * are a library-internal binary and cannot be replayed by the oracle.
 * This variant exists for the stronger claim: registers AND estimate are
 * pure integer arithmetic over the shared `sketchHash`, so DuckDB
 * recomputes the sketch bit-exactly and the gate queries are fully
 * value-oracled (`agg_hll_distinct`, `agg_hll_rollup`,
 * `agg_hll_precision`) — no tolerance band anywhere.
 *
 * Shape (the 100 TB story): a register table is `(group, bucket, r)`
 * with `r = max rho` — a groupBy-max, the most pre-aggregable shape
 * there is (partial max map-side, 2^p rows per group TOTAL regardless of
 * corpus size). Register tables are storable artifacts: any coarser
 * rollup (day → week → all-time) is another groupBy-max over buckets
 * and gives EXACTLY the single-pass sketch (max is associative —
 * `agg_hll_rollup` gates merged == direct), the same lossless-merge
 * contract as the KMV rollup but at fixed 2^p size instead of k minima.
 *
 * Integer estimator: with hashes uniform on [0, 2^31): bucket = bottom
 * p bits, rho = leading-zero run of the remaining 31-p bits + 1
 * (computed via `bin()` string length — identical minimal-width
 * semantics in Spark and DuckDB). The harmonic mean is scaled by
 * 2^B (B = 32-p, so the smallest term 2^(B-rho) is exactly 1):
 *
 *   S  = Σ_present 2^(B-r)  +  (m - n_present) · 2^B
 *   Q  = (m² · 2^B · 2^10) div S          — 10 guard bits
 *   raw = (αnum · Q) div (αden · 2^10)        if Q ≤ qSafe
 *       = (αnum · (Q div 2^10)) div αden      otherwise (guard bits dropped)
 *   est = lc[V]  if V > 0 and 2·raw ≤ 5m  else raw
 *
 * Overflow bound: S ≥ m always (every register term is ≥ 1), so
 * Q ≤ m·2^42/m·… = 2^42 — but αnum·Q can still exceed 2^63 once the
 * sketch SATURATES (zeros = 0 and mean rho large pushes S below 2^B,
 * e.g. ~2M+ distinct hashes per group at p=9). Two defenses, mirrored
 * identically in [[estimateSql]] and [[estimateSequential]]:
 * α is carried as the REDUCED fraction (the general case shares a
 * factor 1000 — value-identical under the (k·a) div (k·b) = a div b
 * identity), and when Q > qSafe = (2^63-1) div αnum the 10 guard bits
 * are dropped from Q before the multiply (relative error ≤ 2^10/qSafe
 * < 1e-9 there — far below the 1.04/√m standard error). With the
 * reduction, αnum·(Q div 2^10) ≤ 7213·m·2^32 < 2^55 for every p ≤ 14,
 * so both engines run the identical BIGINT arithmetic with no wrap —
 * the two-step division is a ~0.1% quantization of the textbook
 * estimator, irrelevant next to its 1.04/√m standard error, and
 * bit-identical across engines, which is the property that matters.
 * The small-range (linear-counting) correction m·ln(m/V) is the one
 * non-integer: it is materialized ONCE as an integer lookup table
 * ([[lcTable]]) and the same literal integers are interpolated into the
 * oracle SQL, so no float crosses an engine boundary.
 *
 * Reference anchor: the reference has no sketches at all (all
 * aggregation is delegated to SQL — eventstorm/internal/backend/backend.go);
 * this is north-star scale surface per SURVEY §2.8.
 */
object Hll {

  /** Guard bits for the two-step integral division. */
  val GuardBits = 10

  /** α_m as an exact rational (αnum, αden): the standard small-m
    * constants, then 0.7213/(1 + 1.079/m) in thousandths. The general
    * case is REDUCED by the shared factor 1000 — (k·a) div (k·b) =
    * a div b, so every raw estimate is unchanged while αnum·Q gains
    * three decimal digits of 64-bit headroom (see the object doc's
    * overflow bound). */
  def alpha(m: Int): (Long, Long) = m match {
    case 16 => (673L, 1000L)
    case 32 => (697L, 1000L)
    case 64 => (709L, 1000L)
    case _  => (7213L * m, 10L * (1000L * m + 1079L))
  }

  /** Largest Q for which αnum·Q fits signed 64-bit; above it the guard
    * bits are dropped from Q before the multiply. */
  def qSafe(m: Int): Long = Long.MaxValue / alpha(m)._1

  /** Linear-counting table: lc(v) = round(m·ln(m/v)), v ∈ [1, m].
    * Computed once HERE; the oracle SQL interpolates these SAME
    * integers, so the correction is float-free across engines. */
  def lcTable(p: Int): IndexedSeq[Long] = {
    val m = 1 << p
    (1 to m).map(v => math.round(m * math.log(m.toDouble / v)))
  }

  /** Per-row bucket column: bottom p bits of the hash. */
  def bucketCol(h: String, p: Int): Column = col(h) % (1 << p)

  /** Per-row rho column: leading-zero run of the 31-p suffix bits + 1
    * (`bin()` has identical minimal-width semantics in both engines). */
  def rhoCol(h: String, p: Int): Column = {
    val maxRho = (32 - p).toLong
    val suffix = expr(s"$h div ${1 << p}")
    when(suffix === 0, lit(maxRho))
      .otherwise(lit(maxRho) - length(bin(suffix)))
  }

  /** Register table `(groupCols…, bucket, r)` from a pre-hashed column
    * (uniform on [0, 2^31), e.g. AnalyticsQueries.sketchHash): one
    * partial-aggregated groupBy-max, ≤ 2^p rows per group. */
  def registers(hashed: DataFrame, groupCols: Seq[String], h: String, p: Int): DataFrame =
    hashed
      .withColumn("bucket", bucketCol(h, p))
      .withColumn("rho", rhoCol(h, p))
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("r"))

  /** Multi-precision register table `(p, bucket, r)` in ONE pass: each
    * row explodes to one (p, bucket, rho) triple per precision and the
    * partial max combines map-side — the sweep never re-scans (or
    * materializes) the corpus, and the result is Σ 2^p rows TOTAL. */
  def registersMulti(hashed: DataFrame, h: String, ps: Seq[Int]): DataFrame =
    hashed
      .select(explode(array(ps.map(p =>
        struct(lit(p.toLong).as("p"), bucketCol(h, p).as("bucket"),
          rhoCol(h, p).as("rho"))): _*)).as("x"))
      .select(col("x.p").as("p"), col("x.bucket").as("bucket"), col("x.rho").as("rho"))
      .groupBy("p", "bucket")
      .agg(max(col("rho")).as("r"))

  /** Estimate from a register table: `(groupCols…, n_registers, zeros,
    * est_hll)`. All-BIGINT; see the object doc for the formula. */
  def estimate(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val b = 32 - p
    val (an, ad) = alpha(m)
    val lc = lcTable(p)
    val pow = expr(s"shiftleft(CAST(1 AS BIGINT), CAST($b - r AS INT))")
    val grouped =
      if (groupCols.isEmpty)
        regs.agg(count(lit(1)).as("n_registers"), sum(pow).as("s_present"))
      else regs.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("n_registers"), sum(pow).as("s_present"))
    grouped
      .withColumn("zeros", lit(m.toLong) - col("n_registers"))
      .withColumn("s_scaled", col("s_present") + col("zeros") * lit(1L << b))
      .withColumn("q",
        expr(s"CAST(${m.toLong * m * (1L << b) * (1L << GuardBits)} AS BIGINT) div s_scaled"))
      .withColumn("raw_est",
        when(col("q") > lit(qSafe(m)),
          expr(s"($an * (q div ${1L << GuardBits})) div $ad"))
          .otherwise(expr(s"($an * q) div (${ad * (1L << GuardBits)})")))
      .withColumn("est_hll",
        when(col("zeros") > 0 && col("raw_est") * 2 <= lit(5L * m),
          element_at(typedlit(lc), col("zeros").cast("int")))
          .otherwise(col("raw_est")))
      .select((groupCols.map(col) :+ col("n_registers") :+ col("zeros") :+ col("est_hll")): _*)
  }

  // ---------------------------------------------------------------------
  // Oracle-SQL mirrors: the same arithmetic as SQL text (DuckDB), built
  // from the SAME constants so nothing can drift. `h` is a pre-hashed
  // SQL expression on [0, 2^31).
  // ---------------------------------------------------------------------

  /** SQL for the per-row (bucket, rho) pair. */
  def registerSql(h: String, p: Int): String = {
    val m = 1 << p
    val maxRho = 32 - p
    s"""($h) % $m AS bucket,
       |    CASE WHEN ($h) // $m = 0 THEN CAST($maxRho AS BIGINT)
       |         ELSE CAST($maxRho AS BIGINT) - length(bin(($h) // $m)) END AS rho"""
      .stripMargin
  }

  /** SQL from an aggregated `(n_registers, s_present)` pair to
    * `zeros, est_hll` — interpolates the SAME lcTable integers and the
    * same precomputed power products as the Spark side (no in-SQL
    * multiplication of big literals). `raw` is inlined twice (the CASE
    * guard and its ELSE) — SQL has no local bindings outside CTEs. */
  def estimateSql(p: Int): String = {
    val m = 1 << p
    val b = 32 - p
    val (an, ad) = alpha(m)
    val lcList = lcTable(p).mkString("[", ",", "]")
    // Q, inlined wherever needed (SQL has no local bindings outside CTEs)
    val qE =
      s"""((${m.toLong * m * (1L << b) * (1L << GuardBits)}) //
         |        (s_present + (CAST($m AS BIGINT) - n_registers) * ${1L << b}))"""
        .stripMargin
    // saturated-sketch overflow guard, mirroring `estimate` bit-exactly:
    // above qSafe drop the guard bits before the alpha multiply
    val raw =
      s"""(CASE WHEN $qE > ${qSafe(m)}
         |      THEN ($an * ($qE // ${1L << GuardBits})) // $ad
         |      ELSE ($an * $qE) // ${ad * (1L << GuardBits)} END)""".stripMargin
    s"""CAST($m AS BIGINT) - n_registers AS zeros,
       |  CAST(CASE WHEN CAST($m AS BIGINT) - n_registers > 0
       |             AND 2 * ($raw) <= ${5L * m}
       |        THEN ($lcList)[CAST(CAST($m AS BIGINT) - n_registers AS INT)]
       |        ELSE $raw END AS BIGINT) AS est_hll"""
      .stripMargin
  }

  /** SQL from a register table (columns `bucket, r` + group keys) to
    * the `(n_registers, s_present)` aggregate pair. */
  def aggregateSql(p: Int): String =
    s"""CAST(count(*) AS BIGINT) AS n_registers,
       |    sum(CAST(1 AS BIGINT) << CAST(${32 - p} - r AS INT)) AS s_present"""
      .stripMargin

  // ---------------------------------------------------------------------
  // Sequential reference (test-only): HllSpec pins the distributed
  // register build + estimator to this on random hash sets.
  // ---------------------------------------------------------------------

  private[graft] def estimateSequential(hashes: Seq[Long], p: Int): (Long, Long, Long) = {
    val m = 1 << p
    val b = 32 - p
    val (an, ad) = alpha(m)
    val regs = new Array[Long](m)
    for (h <- hashes) {
      val bucket = (h % m).toInt
      val suffix = h / m
      val rho = if (suffix == 0) (32 - p).toLong
                else (32 - p).toLong - java.lang.Long.toBinaryString(suffix).length
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    val nPresent = regs.count(_ > 0).toLong
    val zeros = m - nPresent
    val s = regs.filter(_ > 0).map(r => 1L << (b - r)).sum + zeros * (1L << b)
    val q = (m.toLong * m * (1L << b) * (1L << GuardBits)) / s
    val raw = if (q > qSafe(m)) (an * (q >> GuardBits)) / ad
              else (an * q) / (ad * (1L << GuardBits))
    val est = if (zeros > 0 && 2 * raw <= 5L * m) lcTable(p)((zeros - 1).toInt) else raw
    (nPresent, zeros, est)
  }
}
