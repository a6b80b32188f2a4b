package graft.plans

/**
 * Hilbert space-filling-curve key for 2-D data layout — the locality
 * upgrade over the Z-order interleave (`AnalyticsQueries.zExpr`): on a
 * Hilbert walk EVERY consecutive pair of keys is an adjacent cell
 * (|Δx|+|Δy| = 1, no Z-shape "jumps"), so a range of keys covers a
 * tighter spatial blob and range-partitioned files prune better on
 * 2-sided predicates. Databricks exposes exactly this trade as
 * `OPTIMIZE ... ZORDER` vs Hilbert clustering.
 *
 * The xy→d unrolling (per-level quadrant digit + rotation) is emitted
 * as STAGED SQL column expressions — plain integer CASE arithmetic,
 * no engine-specific operators (XOR of the 2-bit quadrant digit is
 * rewritten as `CASE WHEN rx = 0 THEN ry ELSE 3 - ry END`) — so Spark
 * (`expr`) and the DuckDB oracle evaluate the IDENTICAL text per
 * stage: the layout key is engine-exact by construction, like zExpr.
 */
object Hilbert {

  /**
   * Staged column definitions computing the Hilbert index `h` of
   * (`xCol`, `yCol`) on a 2^bits × 2^bits grid. Returns (name, sqlExpr)
   * pairs to apply IN ORDER (each stage may reference earlier names);
   * the final stage is `("h", …)`.
   */
  def stages(xCol: String, yCol: String, bits: Int): Seq[(String, String)] = {
    val init = Seq(
      (s"hx0", xCol), (s"hy0", yCol), (s"hd0", "CAST(0 AS BIGINT)"))
    val steps = (0 until bits).flatMap { i =>
      val s = 1L << (bits - 1 - i) // level size: 2^(bits-1) … 1
      val (x, y, d) = (s"hx$i", s"hy$i", s"hd$i")
      val (rx, ry) = (s"hrx$i", s"hry$i")
      Seq(
        (rx, s"CASE WHEN ($x & $s) > 0 THEN 1 ELSE 0 END"),
        (ry, s"CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END"),
        // quadrant digit (3*rx) XOR ry without an XOR operator
        (s"hd${i + 1}",
          s"$d + ${s * s} * (CASE WHEN $rx = 0 THEN $ry ELSE 3 - $ry END)"),
        // rotate/flip the sub-square for the next level
        (s"hx${i + 1}",
          s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${s - 1} - $y ELSE $y END) ELSE $x END"),
        (s"hy${i + 1}",
          s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${s - 1} - $x ELSE $x END) ELSE $y END"))
    }
    init ++ steps :+ (("h", s"hd$bits"))
  }

  /** The same stages as one DuckDB CTE chain body: each stage becomes a
    * `SELECT *, expr AS name` layer over the previous. `from` is the
    * relation providing `xCol`/`yCol`. */
  def sqlCtes(from: String, xCol: String, yCol: String, bits: Int): String = {
    val ss = stages(xCol, yCol, bits)
    ss.zipWithIndex.map { case ((name, e), i) =>
      val src = if (i == 0) from else s"hst${i - 1}"
      s"hst$i AS (SELECT *, $e AS $name FROM $src)"
    }.mkString(",\n")
  }

  /** Name of the final CTE produced by [[sqlCtes]]. */
  def lastCte(xCol: String, yCol: String, bits: Int): String =
    s"hst${stages(xCol, yCol, bits).size - 1}"
}
