package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("chunks partition the document exactly") {
    import spark.implicits._
    for (text <- docs.select(col("text")).as[String].collect()) {
      val spans = Cdc.chunkSpansJvm(text)
      val n = text.codePoints().toArray.length
      assert(spans.head._1 == 1 && spans.last._2 == n)
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 == e1 + 1, "gap/overlap between chunks")
        case _ => ()
      }
      assert(Cdc.chunksJvm(text).mkString == text)
    }
  }

  test("every internal boundary satisfies the rolling-hash rule; no missed boundaries") {
    import spark.implicits._
    for (text <- docs.select(col("text")).as[String].collect().take(50)) {
      val cps = text.codePoints().toArray
      def h(p: Int): Long = { // 1-based window end
        var acc = 0L
        for (k <- p - Cdc.W until p) acc = (acc * 31L + cps(k)) % Hashing.P
        acc
      }
      val want = (Cdc.W to cps.length).filter(p => h(p) % Cdc.MOD == 0L).toSet
      val got = Cdc.chunkSpansJvm(text).map(_._2).toSet - cps.length
      assert(got == (want - cps.length), "boundary set mismatch")
    }
  }

  test("boundaries synchronize on content: a shared passage chunks identically at any offset") {
    // non-repetitive so distinct chunks stay distinct in the set compare
    val passage = (1 to 8).map(i =>
      s"sentence number $i carries unique words like alpha$i beta$i gamma$i.").mkString(" ")
    val a = "PREFIX-A " + passage + " SUFFIX-A"
    val b = "a completely different and much longer prefix sits here " + passage + " tail-b"
    val ca = Cdc.chunksJvm(a).toSet
    val cb = Cdc.chunksJvm(b).toSet
    val shared = ca.intersect(cb)
    // interior chunks of the shared passage must coincide despite the offset shift
    assert(shared.size >= 2, "no synchronized chunks across shifted copies")
    // boundary density is content-dependent (~1/64 uniform, less on a small
    // alphabet); require substantial — not majority — synchronized coverage
    assert(shared.map(_.length).sum >= passage.length / 4,
      "synchronized chunks cover too little of the shared passage")
  }

  test("duplicatedChunks distributed report matches a local fold") {
    import spark.implicits._
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val occ = scala.collection.mutable.Map.empty[(String, Int), (Set[Long], Long)]
    for ((id, text) <- rows; c <- Cdc.chunksJvm(text)) {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val key = (md, c.codePoints().toArray.length)
      val (ds, n) = occ.getOrElse(key, (Set.empty[Long], 0L))
      occ(key) = (ds + id, n + 1L)
    }
    val want = occ.collect { case ((md, len), (ds, n)) if n > 1 => (md, len.toLong, ds.size.toLong, n) }.toSet
    val got = Cdc.duplicatedChunks(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
  }
}
