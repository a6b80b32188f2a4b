package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Similarity
import graft.sim.Similarity._

/**
 * Verify-gate queries for similarity search over `embeddings`. Oracles
 * recompute the identical left-fold double arithmetic (same element order,
 * same casts) so cosine values match bit-for-bit across engines.
 */
object SimQueries {

  private val DIM = 64
  private val K = 10

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def queryRow(df: DataFrame): DataFrame = df.filter(col("vec_id") === 0)

  private def x1e6(df: DataFrame): DataFrame =
    df.withColumn("cos_x1e6", floor(col("cos") * lit(1000000.0)).cast("long")).drop("cos")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> { (s: SparkSession, dir: String) =>
      val e = emb(s, dir)
      x1e6(Similarity.topKBruteForce(e, queryRow(e), K))
    },
    "sim_topk_lsh" -> { (s: SparkSession, dir: String) =>
      val e = emb(s, dir)
      x1e6(Similarity.topKLsh(e, queryRow(e), K, DIM))
    },
    "dedup_embedding_cosine" -> { (s: SparkSession, dir: String) =>
      x1e6(Similarity.bruteForcePairs(emb(s, dir), 0.45)).orderBy("a", "b")
    },
    "sim_lsh_pairs" -> { (s: SparkSession, dir: String) =>
      x1e6(Similarity.lshPairs(emb(s, dir), 0.4, DIM)).orderBy("a", "b")
    },
    // IVF scale path (k-means routing; not SQL-expressible -> rows-only
    // check here; exactness vs brute force pinned by IvfSpec)
    "sim_topk_ivf" -> { (s: SparkSession, dir: String) =>
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
      x1e6(graft.sim.Ivf.build(e, nlist = 16).topK(q, K, nprobe = 4))
    }
  )

  // ---- oracle SQL (mirrors Similarity's fold order exactly) ----

  /** Left-fold dot product over two vector expressions. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0,
       |      list_transform(range(1, len($a) + 1),
       |        i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |      (s, p) -> s + p)""".stripMargin

  /** norms CTE: per-vector L2 norm. */
  private val N =
    s"""WITH n AS (
       |  SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings
       |)""".stripMargin

  private def hpList(t: Int, b: Int): String =
    Similarity.hyperplane(t, b, DIM).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  /** Signed projection onto hyperplane (t,b) of vector expr v. */
  private def projSql(v: String, t: Int, b: Int): String =
    s"""list_reduce(list_prepend(0.0,
       |      list_transform(range(1, len($v) + 1),
       |        i -> CAST($v[i] AS DOUBLE) * (${hpList(t, b)})[i])),
       |      (s, p) -> s + p)""".stripMargin

  private def bucketSql(v: String, t: Int): String =
    (0 until bitsPerTable)
      .map(b => s"(CASE WHEN ${projSql(v, t, b)} >= 0 THEN ${1L << b} ELSE 0 END)")
      .mkString("(", " + ", ")")

  private def bucketsSql(v: String): String =
    (0 until tables).map(t => bucketSql(v, t)).mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "sim_topk_bruteforce" ->
      s"""$N, q AS (SELECT embedding AS qv, nrm AS qn FROM n WHERE vec_id = 0)
         |SELECT vec_id,
         |  CAST(floor((${dotSql("embedding", "qv")} / (nrm * qn)) * 1000000.0) AS BIGINT) AS cos_x1e6
         |FROM n, q
         |ORDER BY (${dotSql("embedding", "qv")} / (nrm * qn)) DESC, vec_id ASC
         |LIMIT $K""".stripMargin,
    "sim_topk_lsh" ->
      s"""$N, bk AS (
         |  SELECT vec_id, embedding, nrm, ${bucketsSql("embedding")} AS bks FROM n
         |), q AS (SELECT embedding AS qv, nrm AS qn, bks AS qbks FROM bk WHERE vec_id = 0)
         |SELECT vec_id,
         |  CAST(floor((${dotSql("embedding", "qv")} / (nrm * qn)) * 1000000.0) AS BIGINT) AS cos_x1e6
         |FROM bk, q
         |WHERE bks[1] = qbks[1] OR bks[2] = qbks[2] OR bks[3] = qbks[3] OR bks[4] = qbks[4]
         |ORDER BY (${dotSql("embedding", "qv")} / (nrm * qn)) DESC, vec_id ASC
         |LIMIT $K""".stripMargin,
    "dedup_embedding_cosine" ->
      s"""$N
         |SELECT a, b, cos_x1e6 FROM (
         |  SELECT x.vec_id AS a, y.vec_id AS b,
         |    ${dotSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cos,
         |    CAST(floor((${dotSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm)) * 1000000.0) AS BIGINT) AS cos_x1e6
         |  FROM n x JOIN n y ON x.vec_id < y.vec_id
         |) WHERE cos >= 0.45 ORDER BY a, b""".stripMargin,
    "sim_lsh_pairs" ->
      s"""$N, bk AS (
         |  SELECT vec_id, embedding, nrm, ${bucketsSql("embedding")} AS bks FROM n
         |), bkx AS (
         |  SELECT vec_id, embedding, nrm, u.t, bks[u.t + 1] AS bucket
         |  FROM bk, unnest([0, 1, 2, 3]) AS u(t)
         |), cand AS (
         |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
         |  FROM bkx l JOIN bkx r ON l.t = r.t AND l.bucket = r.bucket AND l.vec_id < r.vec_id
         |)
         |SELECT a, b, cos_x1e6 FROM (
         |  SELECT c.a, c.b,
         |    ${dotSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cos,
         |    CAST(floor((${dotSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm)) * 1000000.0) AS BIGINT) AS cos_x1e6
         |  FROM cand c JOIN n x ON c.a = x.vec_id JOIN n y ON c.b = y.vec_id
         |) WHERE cos >= 0.4 ORDER BY a, b""".stripMargin
  )
}
