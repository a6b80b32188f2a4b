package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Integer-exact distributed Lloyd's k-means over an embedding corpus —
 * the clustering primitive under semantic dedup / corpus partitioning /
 * IVF codebook training, here as a fully ORACLE-CHECKABLE fixed-iteration
 * form (the MLlib KMeans in [[Ivf]] trains real codebooks but its float
 * arithmetic and init are not cross-engine reproducible; this one is).
 *
 * Determinism contract: coordinates quantize once to floor(x·1000) int64;
 * distances are exact integer sums of squared diffs; centroid updates are
 * per-dimension truncated integer means (sum div count — both engines
 * truncate toward zero); ties in the argmin break to the lowest centroid
 * id. Every step is therefore a pure function of the input SET —
 * partitioning- and order-independent.
 *
 * Scale shape (the plan that survives 100 TB): the centroid table is k
 * rows and BROADCASTS into a map-side assignment (corpus never shuffles
 * to assign); the update is one partial-aggregated (cid, dim) shuffle of
 * k·d cells; iterations are a driver loop over tiny plans. Empty clusters
 * drop out (their centroid has no members to average), mirrored by the
 * oracle's identical construction.
 */
object Kmeans {

  /** Squared L2 distance between two equal-length int64 array columns. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  /** Quantized corpus `(vec_id, qv: array<long>)`. */
  def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"), x => floor(x * lit(1000.0)).cast("long")).as("qv"))

  /** Map-side assignment of every vector to its nearest centroid:
    * `(vec_id, qv, cid, dist)`; ties break to the lowest cid. */
  def assign(q: DataFrame, centroids: DataFrame): DataFrame =
    q.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("qv"), col("cid"), sqDist(col("qv"), col("cv")).as("dist"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cid"), col("qv"))).as("m"))
      .select(col("vec_id"), col("m.qv").as("qv"), col("m.cid").as("cid"),
        col("m.dist").as("dist"))

  /** Farthest-point (Gonzalez k-center) seeding: seed 0 is the vector
    * with the LOWEST vec_id (a deterministic pick that exists on every
    * non-empty corpus — a literal id would silently return no seeds on
    * corpora whose ids don't start at 0);
    * each next seed is the vector FARTHEST from the chosen set (argmax
    * of min-distance, ties to the lowest vec_id) — the deterministic
    * spread-out init that replaces k-means++'s random draws. Returns
    * `(cid, seed_id, cv)`. Scale shape: the running min-distance column
    * updates map-side against the one new seed per round (broadcast as
    * a literal — codebook tier, d values); the argmax is a
    * TakeOrderedAndProject; the corpus never shuffles. On corpora with
    * fewer than k distinct vectors the trailing seeds repeat the
    * farthest point (mind 0) — degenerate but total, mirrored by the
    * oracle's identical construction. */
  def farthestSeeds(emb: DataFrame, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val q = quantized(emb)
    val first = q.orderBy(col("vec_id").asc).limit(1)
      .select(col("vec_id"), col("qv")).collect()
    val schema = StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("seed_id", LongType, nullable = false),
      StructField("cv", ArrayType(LongType, containsNull = false), nullable = false)))
    if (first.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val seeds = scala.collection.mutable.ArrayBuffer(
      (0L, first(0).getLong(0), first(0).getSeq[Long](1)))
    var cur = q.withColumn("mind",
      sqDist(col("qv"), typedLit(seeds(0)._3))).localCheckpoint()
    for (j <- 1L until k.toLong) {
      val far = cur.orderBy(col("mind").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("qv")).collect()(0)
      seeds += ((j, far.getLong(0), far.getSeq[Long](1)))
      if (j < k - 1)
        cur = cur.withColumn("mind",
          least(col("mind"), sqDist(col("qv"), typedLit(seeds.last._3))))
          .localCheckpoint()
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        seeds.toSeq.map { case (c, id, cv) => Row(c, id, cv) }, 1), schema)
  }

  /** `iters` full Lloyd steps (assign → recenter) from the first-k seed,
    * then the final assignment under the last centroids. */
  def lloydInt(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val q = quantized(emb)
    var centroids = q.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    for (_ <- 1 to iters) {
      centroids = assign(q, centroids)
        .select(col("cid"), posexplode(col("qv")))
        .toDF("cid", "pos", "v")
        .groupBy("cid", "pos")
        .agg(expr("sum(v) div count(1)").as("cv_i"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv_i")))),
          s => s.getField("cv_i")).as("cv"))
    }
    assign(q, centroids)
  }
}
