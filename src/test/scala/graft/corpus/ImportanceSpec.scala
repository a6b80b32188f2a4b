package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins graft.corpus.Importance's DSIR-style weighting: documents made of
  * target-domain vocabulary outweigh documents of target-absent
  * vocabulary, and the whole scoring is partitioning-independent. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("target-vocabulary documents outweigh target-absent ones") {
    val corpus = docs(
      (0L, "tgt", "alpha beta gamma alpha beta"),
      (1L, "tgt", "alpha gamma beta gamma"),
      (2L, "raw", "alpha beta gamma"),      // pure target vocab
      (3L, "raw", "zeta eta theta iota"))   // disjoint vocab
    val w = Importance.weights(corpus, targetSource = "tgt", buckets = 64)
      .select(col("doc_id"), col("imp_x1e6")).as[(Long, Long)].collect().toMap
    assert(w(2L) > w(3L))
    assert(w.values.forall(_ > 0L))
  }

  test("broadcast-model serving form equals the batch join form on its training corpus") {
    val rows = (0L until 30L).map(i =>
      (i, if (i % 3 == 0L) "tgt" else "raw", s"tok${i % 5} tok${i % 7} tok${i % 3} x$i"))
    val corpus = docs(rows: _*)
    val batch = Importance.weights(corpus, "tgt").orderBy("doc_id").collect().toSeq
    val served = Importance
      .score(corpus, Importance.model(corpus, "tgt"), unseenX1e6 = 0L)
      .orderBy("doc_id").collect().toSeq
    assert(batch == served)
  }

  test("streaming micro-batches score identically to the batch form (ingest-time gate)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = (0L until 20L).map(i =>
      (i, if (i % 4 == 0L) "tgt" else "raw", s"tok${i % 5} tok${i % 3} y$i"))
    val corpus = docs(rows: _*)
    val model = Importance.model(corpus, "tgt")
    val mem = MemoryStream[(Long, String)]
    val q = Importance.score(mem.toDF().toDF("doc_id", "text"), model, unseenX1e6 = 0L)
      .writeStream.format("memory").queryName("imp_scores").start()
    try {
      mem.addData(rows.take(12).map(r => (r._1, r._3)): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(12).map(r => (r._1, r._3)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("select * from imp_scores").orderBy("doc_id").collect().toSeq
    val batch = Importance.weights(corpus, "tgt").orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
  }

  test("keep flag is 0/1 and deterministic across partitionings") {
    val rows = (0L until 40L).map(i =>
      (i, if (i % 4 == 0L) "tgt" else "raw", s"tok${i % 5} tok${i % 7} tok${i % 3}"))
    val a = Importance.weights(docs(rows: _*).repartition(1), "tgt")
      .orderBy("doc_id").collect().toSeq
    val b = Importance.weights(docs(rows: _*).repartition(8), "tgt")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.forall(r => r.getInt(3) == 0 || r.getInt(3) == 1))
  }
}
