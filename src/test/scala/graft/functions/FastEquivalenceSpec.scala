package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.dedup.Hashing
import graft.sim.Similarity

/**
 * The JVM kernels in [[Fast]] must be bit-identical to the declarative
 * Column implementations they replace on hot paths — the DuckDB oracles
 * assume one arithmetic, whichever implementation runs.
 */
class FastEquivalenceSpec extends SparkSpec {

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val text = Gen.listOfN(30, word).map(_.mkString(" "))

  test("strHash / fingerprint: JVM == Column == reference arithmetic") {
    import spark.implicits._
    val samples = (1 to 50).flatMap(i => text.sample) :+ "a" :+ "Hello,  World!  "
    val df = samples.toDF("text")
    val got = df.select(
      TextFunctions.fingerprint(col("text")).as("colv"),
      Fast.fingerprintFast(col("text")).as("jvm"),
      call_function("graft_polyhash", col("text")).as("native")
    ).collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch on ${r}")
      assert(r.getLong(0) == r.getLong(2), s"native expr mismatch on ${r}")
    }
    // the native expression must also work from SQL text and stay codegen'd
    df.createOrReplaceTempView("fp_docs")
    val sqlRes = spark.sql("select graft_polyhash(text) from fp_docs").collect()
    assert(sqlRes.map(_.getLong(0)).toSeq == got.map(_.getLong(0)).toSeq)
  }

  test("shingleHashes: JVM == Column incl. short docs") {
    import spark.implicits._
    val samples = Seq("one two", "one two three", "a b c d e f g", "") ++ (1 to 30).flatMap(_ => text.sample)
    val df = samples.toDF("text")
    val got = df.select(
      Hashing.shingleHashes(col("text")).as("colv"),
      Fast.shingleHashesFast(col("text")).as("jvm")
    ).collect()
    got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch on $r"))
  }

  test("winnow fingerprints: JVM == Column incl. short docs and repeats") {
    import spark.implicits._
    val samples = Seq("one two", "one two three", "a b c d e f g",
      "x y z x y z x y z x y z", "") ++ (1 to 30).flatMap(_ => text.sample)
    val df = samples.toDF("text")
    val got = df.select(
      graft.dedup.Winnow.fingerprints(col("text")).as("colv"),
      Fast.winnowFast(col("text")).as("jvm")
    ).collect()
    got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch on $r"))
  }

  test("minhash signature: JVM == Column") {
    import spark.implicits._
    val samples = (1 to 30).flatMap(_ => text.sample).filter(_.split("\\s+").length >= 3)
    val df = samples.toDF("text").select(Hashing.shingleHashes(col("text")).as("sh"))
    val got = df.select(
      Hashing.minhashSignature(col("sh")).as("colv"),
      Fast.minhashFast(col("sh")).as("jvm")
    ).collect()
    got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch on $r"))
  }

  test("simhash16: JVM == Column") {
    import spark.implicits._
    val samples = (1 to 30).flatMap(_ => text.sample)
    val df = samples.toDF("text")
    val got = df.select(
      Hashing.simhash16(col("text")).as("colv"),
      Fast.simhash16Fast(col("text")).as("jvm")
    ).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), s"mismatch on $r"))
  }

  test("simhash62: native expression == UDF tier; lower 16 of the low half == simhash16 votes") {
    import spark.implicits._
    val samples = (1 to 30).flatMap(_ => text.sample)
    val df = samples.toDF("text")
    val got = df.select(
      Fast.simhash62Fast(col("text")).as("native"),
      Fast.simhash62Udf(col("text")).as("udf"),
      Fast.simhash16Fast(col("text")).as("s16")
    ).collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch on $r")
      // bits 0-15 vote on the same token-hash bits as simhash16
      assert((r.getLong(0) & 0xFFFFL) == r.getLong(2), s"low-band mismatch on $r")
    }
  }

  test("LSH buckets: JVM == Column") {
    import spark.implicits._
    val vecs = (1 to 20).map(i => Array.tabulate(64)(j => ((i * 37 + j * 11) % 100 - 50) / 29.0f))
    val df = vecs.toDF("v")
    val got = df.select(
      Similarity.buckets(col("v"), 64).as("colv"),
      Fast.bucketsFast(col("v")).as("jvm")
    ).collect()
    got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch on $r"))
  }

  test("cdc chunks: native expression == UDF tier, incl. short and unicode docs") {
    import spark.implicits._
    val samples = Seq("", "short", "exactly8", "九個中文字符的測試文本", "a b c d e f g h i j") ++
      (1 to 30).flatMap(_ => text.sample)
    val df = samples.toDF("text")
    val got = df.select(
      call_function("graft_cdc_chunks", col("text")).as("native"),
      graft.dedup.Cdc.chunksUdf(col("text")).as("udf")
    ).collect()
    got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch on $r"))
    // and from SQL text
    df.createOrReplaceTempView("cdc_docs")
    val sqlRes = spark.sql("select graft_cdc_chunks(text) from cdc_docs").collect()
    assert(sqlRes.map(_.getSeq[String](0)).toSeq == got.map(_.getSeq[String](0)).toSeq)
  }

  test("dot/norm: JVM == Column (bit-exact doubles)") {
    import spark.implicits._
    val vecs = (1 to 20).map(i => Array.tabulate(64)(j => ((i * 31 + j * 7) % 100 - 50) / 37.0f))
    val df = vecs.zip(vecs.reverse).toDF("a", "b")
    val got = df.select(
      Similarity.dot(col("a"), col("b")).as("colv"),
      Fast.dotFast(col("a"), col("b")).as("jvm"),
      Similarity.norm(col("a")).as("coln"),
      Fast.normFast(col("a")).as("jvmn")
    ).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) == java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) == java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("intersect size: kernel == size(array_intersect) incl. empties, dups, zero key") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def arr(n: Int): Array[Long] =
      Array.fill(n)(rnd.nextLong() % 50)  // small domain forces overlaps + dups
    val pairs: Seq[(Array[Long], Array[Long])] =
      Seq(
        (Array.empty[Long], Array.empty[Long]),
        (Array.empty[Long], Array(1L, 2L)),
        (Array(0L, 1L, 2L), Array(0L, 3L)),          // zero key present both sides
        (Array(0L, 0L, 5L), Array(0L, 5L, 5L)),      // dups incl. zero
        (Array(7L), Array(7L, 7L, 7L))
      ) ++ (1 to 40).map(i => (arr(rnd.nextInt(200)), arr(rnd.nextInt(200))))
    val df = pairs.toDF("a", "b")
    val got = df.select(
      size(array_intersect(col("a"), col("b"))).as("ref"),
      Fast.intersectSizeFast(col("a"), col("b")).as("jvm")
    ).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), s"mismatch on $r"))
    // interpreted (non-codegen) path agrees too
    pairs.foreach { case (a, b) =>
      val ref = a.toSet.intersect(b.toSet).size
      assert(Fast.intersectSizeJvm(a, b) == ref, s"jvm mismatch on ${a.toSeq} vs ${b.toSeq}")
    }
  }

  test("intersect size: null-admitting element types == size(array_intersect), incl. null elements") {
    import spark.implicits._
    // Option[Long] elements -> ArrayType(LongType, containsNull = true):
    // the schema-dispatched null-aware path (what any parquet round-trip
    // of stored shingle state produces)
    val pairs: Seq[(Seq[Option[Long]], Seq[Option[Long]])] = Seq(
      (Seq(Some(1L), None, Some(2L)), Seq(Some(2L), Some(3L))),          // null one side
      (Seq(Some(1L), None), Seq(None, Some(9L))),                        // null both sides
      (Seq(None, None), Seq(None)),                                      // nulls only
      (Seq(Some(0L), None, Some(0L)), Seq(Some(0L), None)),              // zero key + nulls
      (Seq.empty, Seq(None)),
      (Seq(Some(4L), Some(5L)), Seq(Some(5L), Some(4L)))                 // no nulls, nullable type
    )
    val df = pairs.toDF("a", "b")
    val got = df.select(
      size(array_intersect(col("a"), col("b"))).as("ref"),
      Fast.intersectSizeFast(col("a"), col("b")).as("jvm")
    ).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), s"mismatch on $r"))
  }

  test("pinned intersect: identity value; single kernel site in a filtered join plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 30).map(_ =>
      (Array.fill(rnd.nextInt(60))(rnd.nextLong() % 30),
        Array.fill(rnd.nextInt(60))(rnd.nextLong() % 30)))
    val df = pairs.toDF("a", "b")
    // graft_pinned is the identity on values
    val got = df.select(
      size(array_intersect(col("a"), col("b"))).as("ref"),
      Fast.intersectSizeOnce(col("a"), col("b")).as("pinned")
    ).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), s"mismatch on $r"))
    // ... and it pins the kernel to ONE evaluation site: a verify-join
    // shape (filter + survivor projection both reading `c`) must carry
    // exactly one graft_intersect_size in the physical plan, NOT one in
    // the pushed join condition plus one in the projection
    val sets = pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a) }.toDF("id", "sh")
      .withColumn("n_sh", size(col("sh")).cast("long"))
    val cands = sets.select(col("id").as("a")).crossJoin(sets.select(col("id").as("b")))
      .filter(col("a") < col("b"))
    val verified = cands
      .join(sets.select(col("id").as("a"), col("sh").as("sha"), col("n_sh").as("na")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("shb"), col("n_sh").as("nb")), "b")
      .withColumn("c", Fast.intersectSizeOnce(col("sha"), col("shb")))
      .filter(col("c") * lit(1500L) >= lit(500L) * (col("na") + col("nb")))
      .withColumn("jaccard_x1000",
        floor(lit(1000.0) * col("c") / (col("na") + col("nb") - col("c"))).cast("long"))
      .select(col("a"), col("b"), col("jaccard_x1000"))
    val plan = verified.queryExecution.executedPlan.toString
    val kernelSites = "graft_intersect_size".r.findAllIn(plan).size
    assert(kernelSites == 1, s"expected 1 kernel site, got $kernelSites in:\n$plan")
    // values equal the unpinned form
    val unpinned = cands
      .join(sets.select(col("id").as("a"), col("sh").as("sha"), col("n_sh").as("na")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("shb"), col("n_sh").as("nb")), "b")
      .withColumn("c", Fast.intersectSizeFast(col("sha"), col("shb")))
      .filter(col("c") * lit(1500L) >= lit(500L) * (col("na") + col("nb")))
      .withColumn("jaccard_x1000",
        floor(lit(1000.0) * col("c") / (col("na") + col("nb") - col("c"))).cast("long"))
      .select(col("a"), col("b"), col("jaccard_x1000"))
    assert(verified.collect().map(_.toSeq).toSet == unpinned.collect().map(_.toSeq).toSet)
  }
}
