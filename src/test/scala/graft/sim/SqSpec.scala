package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val idx = Sq.build(emb, 64)
  private lazy val codes = Sq.codes(emb, idx).cache()

  test("codes are bytes: every element in [0, 255]") {
    val bad = codes.select(explode(col("code")).as("c"))
      .filter(col("c") < 0 || col("c") > 255)
    assert(bad.count() === 0)
  }

  test("range table covers the corpus: decode error bounded by delta/255 per dim") {
    // reconstruct each vector from its codes; |x - decode(code(x))| must
    // stay within one quantization step in every dimension
    val err = emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .join(codes.select(col("vec_id"), posexplode(col("code")).as(Seq("i", "c"))),
        Seq("vec_id", "i"))
      .select(col("i"), col("x").cast("double").as("x"), col("c"))
    val mn = spark.sparkContext.broadcast(idx.mn)
    val d = spark.sparkContext.broadcast(idx.mx.indices.map(idx.delta).toArray)
    import spark.implicits._
    val maxErr = err.as[(Int, Double, Int)].map { case (i, x, c) =>
      val step = d.value(i) / 255.0
      val dec = mn.value(i) + c * step
      math.abs(x - dec) / (if (step > 0) step else 1.0)
    }.reduce(math.max)
    assert(maxErr <= 1.0 + 1e-9, s"max decode error $maxErr steps")
  }

  test("ADC ranks the query vector itself first") {
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    val top = Sq.topKAdc(codes, idx, q, 1).head()
    assert(top.getLong(0) === 0L)
  }

  test("ADC top-10 overlaps the exact dot top-10 (recall >= 6/10)") {
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    val qA = array(q.map(lit): _*)
    val exact = emb.select(col("vec_id"),
        aggregate(zip_with(col("embedding"), qA, (x, y) => x.cast("double") * y),
          lit(0.0), (a, b) => a + b).as("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val adc = Sq.topKAdc(codes, idx, q, 10).collect().map(_.getLong(0)).toSet
    assert((exact & adc).size >= 6, s"recall ${(exact & adc).size}/10")
  }
}
