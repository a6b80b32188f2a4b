package graft.corpus

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {

  private val N = 512

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("gradientAtZero equals a single-threaded reference fold") {
    import spark.implicits._
    val rows = docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
    val want = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for ((_, lang, text) <- rows) {
      val y = if (lang == "en") 1L else 0L
      for (tok <- graft.functions.Fast.toksJvm(text)) {
        val f = graft.functions.Fast.strHashJvm(tok) % N
        val (g, n) = want.getOrElse(f, (0L, 0L))
        want(f) = (g + (1L - 2L * y), n + 1L)
      }
    }
    val got = Classifier.gradientAtZero(docs, N).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want.toMap)
  }

  test("full-batch GD: loss descends monotonically from ln 2 and beats the zero model") {
    // features are raw token counts, so per-doc margins scale with doc
    // length and the stable step size is ~1/mean(len²) — keep lr small
    val trained = Classifier.train(docs, N, epochs = 10, lr = 0.002)
    assert(trained.epochLoss.length == 10)
    // epoch-0 loss is the zero-weight model: exactly ln 2
    assert(math.abs(trained.epochLoss.head - math.log(2.0)) < 1e-12)
    // strict descent every epoch (full-batch GD at a stable lr)
    trained.epochLoss.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss did not descend: $a -> $b")
    }
    val finalLoss = Classifier.loss(docs, N, trained.weights)
    assert(finalLoss < trained.epochLoss.last)
    assert(finalLoss < math.log(2.0) * 0.98, s"final loss $finalLoss barely moved")
  }
}
