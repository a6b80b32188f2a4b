package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

import scala.util.Random

/** Pins graft.plans.Hll: register semantics (bucket/rho), the
  * pure-BIGINT estimator against the sequential reference on random
  * hash sets across partitionings, the lossless merge property, the
  * linear-counting regime, and estimator accuracy on known
  * cardinalities. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def estimateOf(hashes: Seq[Long], p: Int): (Long, Long, Long) = {
    val df = hashes.toDF("h").repartition(5)
    val row = Hll.estimate(Hll.registers(df, Seq.empty, "h", p), Seq.empty, p)
      .collect().head
    (row.getAs[Long]("n_registers"), row.getAs[Long]("zeros"), row.getAs[Long]("est_hll"))
  }

  test("rho is the leading-zero run of the suffix bits plus one") {
    // p=4, m=16: h = bucket + 16*suffix. suffix 0 -> rho = 28 (all 27
    // suffix bits zero + 1); suffix 1 -> 27; suffix 2,3 -> 26; the
    // largest 27-bit suffix -> 1.
    val cases = Seq(0L -> 28L, 1L -> 27L, 2L -> 26L, 3L -> 26L,
      4L -> 25L, (1L << 26) -> 1L, (1L << 26) + 5 -> 1L)
    val df = cases.map { case (suffix, _) => 3L + 16L * suffix }.toDF("h")
    val regs = Hll.registers(df, Seq.empty, "h", 4)
      .orderBy("bucket").collect()
    assert(regs.length == 1 && regs.head.getAs[Long]("bucket") == 3L)
    assert(regs.head.getAs[Long]("r") == 28L) // max rho wins the register
    // each rho individually (one row per distinct suffix, same bucket)
    for ((suffix, rho) <- cases) {
      val one = Hll.registers(Seq(3L + 16L * suffix).toDF("h"), Seq.empty, "h", 4)
        .collect().head
      assert(one.getAs[Long]("r") == rho, s"suffix $suffix: got ${one.getAs[Long]("r")}, want $rho")
    }
  }

  test("distributed estimate == sequential reference on random hash sets") {
    val rnd = new Random(17)
    for (trial <- 1 to 4; p <- Seq(4, 6, 9)) {
      val n = 1 + rnd.nextInt(3000)
      val hashes = Seq.fill(n)(rnd.nextLong().abs % 2147483647L)
      val seq = Hll.estimateSequential(hashes, p)
      val dist = estimateOf(hashes, p)
      assert(dist == seq, s"trial $trial p=$p n=$n: dist $dist vs seq $seq")
      // duplicated input must not move the sketch (insert idempotence)
      val dup = estimateOf(hashes ++ hashes, p)
      assert(dup == seq, s"trial $trial p=$p: duplication moved the sketch")
    }
  }

  test("register merge is lossless: max over split register tables == single pass") {
    val rnd = new Random(23)
    val hashes = Seq.fill(4000)(rnd.nextLong().abs % 2147483647L)
    val df = hashes.zipWithIndex
      .map { case (h, i) => (i % 7, h) }.toDF("part", "h")
    val daily = Hll.registers(df, Seq("part"), "h", 9)
    val merged = daily.groupBy("bucket").agg(max(col("r")).as("r"))
    val direct = Hll.registers(df.select("h"), Seq.empty, "h", 9)
    val a = Hll.estimate(merged, Seq.empty, 9).collect().head
    val b = Hll.estimate(direct, Seq.empty, 9).collect().head
    assert(a.getAs[Long]("est_hll") == b.getAs[Long]("est_hll"))
    assert(a.getAs[Long]("zeros") == b.getAs[Long]("zeros"))
  }

  test("small cardinalities ride the linear-counting table and stay near-exact") {
    val rnd = new Random(31)
    for (n <- Seq(1, 5, 40, 120)) {
      val hashes = Seq.fill(n)(rnd.nextLong().abs % 2147483647L).distinct
      val (_, zeros, est) = estimateOf(hashes, 9)
      assert(zeros > 0)
      // LC at m=512 is essentially exact this far under 2.5m
      assert(math.abs(est - hashes.size) <= math.max(2L, hashes.size / 10),
        s"n=${hashes.size}: est $est")
    }
  }

  test("estimator lands within ~3 standard errors across cardinalities") {
    val rnd = new Random(43)
    for ((n, p) <- Seq((2000, 9), (20000, 9), (5000, 6))) {
      val hashes = (1 to n).map(_ => rnd.nextLong().abs % 2147483647L).distinct
      val (_, _, est) = estimateOf(hashes, p)
      val se = 1.04 / math.sqrt((1 << p).toDouble)
      val rel = math.abs(est.toDouble - hashes.size) / hashes.size
      assert(rel <= 3 * se, s"n=${hashes.size} p=$p: est $est rel err $rel > ${3 * se}")
    }
  }

  test("one-pass multi-precision registers == per-precision register builds") {
    val rnd = new Random(59)
    val hashes = Seq.fill(3000)(rnd.nextLong().abs % 2147483647L)
    val df = hashes.toDF("h").repartition(4)
    val multi = Hll.registersMulti(df, "h", Seq(4, 6, 8))
      .collect().map(r => (r.getAs[Long]("p"), r.getAs[Long]("bucket"), r.getAs[Long]("r")))
      .toSet
    val perP = Seq(4, 6, 8).flatMap { p =>
      Hll.registers(df, Seq.empty, "h", p)
        .collect().map(r => (p.toLong, r.getAs[Long]("bucket"), r.getAs[Long]("r")))
    }.toSet
    assert(multi == perP)
  }

  test("saturated sketch (zeros = 0, large rho) stays in 64-bit and matches BigInt-exact") {
    val p = 9
    val m = 1 << p
    val (an, ad) = Hll.alpha(m)
    // every bucket at max rho (suffix 0): S = m, the smallest S possible —
    // the regime where the unreduced/unguarded multiply wrapped signed-64
    val sat = ((0 until m).map(_.toLong), m.toLong)
    // odd buckets one step down (suffix 1, rho = 31-p, term 2): S = 3m/2
    val mixed = ((0 until m).map(b => if (b % 2 == 0) b.toLong else b + m.toLong),
      m.toLong / 2 * 3)
    for ((hashes, s) <- Seq(sat, mixed)) {
      val seq = Hll.estimateSequential(hashes, p)
      val dist = estimateOf(hashes, p)
      assert(dist == seq, s"S=$s: dist $dist vs seq $seq")
      val (nPresent, zeros, est) = dist
      assert(nPresent == m && zeros == 0L)
      val q = (m.toLong * m * (1L << (32 - p)) * (1L << Hll.GuardBits)) / s
      assert(q > Hll.qSafe(m), "case must exercise the overflow-guard branch")
      // guard-dropped raw must stay positive (a wrap goes negative/garbage)
      // and within one guard-quantum of the BigInt-exact two-step division
      val exact = (BigInt(an) * q / (BigInt(ad) << Hll.GuardBits)).toLong
      assert(est > 0 && math.abs(est - exact) <= math.max(1L, exact >> 9),
        s"S=$s: est $est vs BigInt-exact $exact")
    }
  }

  test("oracle SQL builders interpolate the same constants (spot values)") {
    // alpha rationals and lc tables are shared objects; the SQL strings
    // must carry exactly them (catches a drifted rewrite of either side)
    // general-case alpha is the reduced rational (shared factor 1000
    // cancelled — value-identical under (k·a) div (k·b) = a div b)
    assert(Hll.alpha(16) == (673L, 1000L) && Hll.alpha(512)._1 == 7213L * 512L)
    assert(Hll.lcTable(4).head == math.round(16 * math.log(16.0)))
    val sql = Hll.estimateSql(9)
    assert(sql.contains(Hll.lcTable(9).mkString("[", ",", "]")))
    assert(sql.contains((Hll.alpha(512)._2 * (1L << Hll.GuardBits)).toString))
    assert(Hll.registerSql("h", 9).contains("% 512"))
  }
}
