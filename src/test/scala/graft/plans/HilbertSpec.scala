package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HilbertSpec extends SparkSpec {

  import spark.implicits._

  private val bits = 4
  private val n = 1 << bits // 16x16 grid

  private lazy val grid = {
    val base = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("ubucket", "tbucket")
    Hilbert.stages("ubucket", "tbucket", bits)
      .foldLeft(base) { case (df, (nm, e)) => df.withColumn(nm, expr(e)) }
      .select(col("ubucket"), col("tbucket"), col("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
  }

  test("bijective: the 16x16 grid maps onto exactly 0..255") {
    assert(grid.values.toSeq.sorted == (0L until (n.toLong * n)).toSeq)
  }

  test("Hilbert walk: every consecutive key pair is an adjacent cell") {
    val byH = grid.map(_.swap)
    (0L until (n.toLong * n - 1)).foreach { h =>
      val (x1, y1) = byH(h)
      val (x2, y2) = byH(h + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between h=$h ($x1,$y1) and h=${h + 1} ($x2,$y2)")
    }
  }

  test("matches the textbook xy2d reference") {
    def xy2d(order: Int, x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = (1L << order) / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    grid.foreach { case ((x, y), h) =>
      assert(h == xy2d(bits, x, y), s"cell ($x,$y)")
    }
  }

  test("locality beats Z-order: max city-block jump between consecutive keys") {
    // Z-order's worst consecutive-key jump on a 16x16 grid crosses the
    // grid (e.g. h=2^k boundaries); Hilbert's is 1 by construction
    val zByH = (for (x <- 0L until n; y <- 0L until n) yield {
      val z = (0 until bits).foldLeft(0L)((acc, k) =>
        acc | (((x >> k) & 1) << (2 * k)) | (((y >> k) & 1) << (2 * k + 1)))
      z -> (x, y)
    }).toMap
    val zWorst = (0L until (n.toLong * n - 1)).map { h =>
      val (x1, y1) = zByH(h); val (x2, y2) = zByH(h + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(zWorst > 1, "Z-order has non-adjacent consecutive keys")
  }
}
