package graft.log

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._

/**
 * Hash-bucketed physical layout for the event log — the 100 TB storage
 * design the scan-path scale notes assume (SURVEY §4): the log is written
 * as parquet directory-partitioned by `bucket = polyhash(stream) mod N`,
 * so the reference's dominant access pattern — read ONE stream
 * (`backend.go:118-152`) — prunes to 1/N of the files at planning time
 * (`PartitionFilters`, no data read outside the stream's bucket), while
 * `$all` reads scan everything exactly as before.
 *
 * The bucket key is the engine's own `graft_polyhash` (deterministic,
 * codegen'd, computable driver-side via [[graft.functions.Fast]]), NOT an
 * internal Spark hash — both sides of the contract are public engine
 * surface. Within a bucket, files remain written in position order, so
 * parquet min/max row-group pruning on `position`/`revision` stacks on
 * top of the directory pruning.
 */
object PartitionedLog {

  /** Driver-side bucket of a stream id — must equal the Column-side
    * expression used by [[write]] (same polyhash kernel). */
  def bucketOf(stream: String, nBuckets: Int): Int =
    math.floorMod(graft.functions.Fast.strHashJvm(stream.trim.toLowerCase), nBuckets.toLong).toInt

  /** Write a canonical log hash-bucketed by stream. One shuffle on the
    * bucket key so each bucket directory gets ONE file per write: a
    * shuffle-free partitionBy would have every input task fan out a file
    * into every bucket it touches (tasks × buckets small files — at
    * local[32] × 64 buckets that is ~2k files and the write is dominated
    * by file open/close; at cluster scale it is a small-files explosion
    * the compactor then has to undo). Within a bucket, `sortWithinPartitions
    * (position)` preserves position-ordered row groups so parquet min/max
    * pruning on position/revision stacks on the directory pruning. */
  def write(log: DataFrame, dir: String, nBuckets: Int = 64,
            mode: String = "overwrite"): Unit = {
    log
      .withColumn("bucket",
        pmod(call_function("graft_polyhash", col("stream")), lit(nBuckets.toLong)))
      .repartition(nBuckets, col("bucket"))
      .sortWithinPartitions("position")
      .write.mode(mode).partitionBy("bucket").parquet(dir)
    // an EMPTY log writes no partition directories at all, leaving a
    // directory Spark cannot infer any schema from (open() would throw
    // UNABLE_TO_INFER_SCHEMA). Persist the schema as a zero-row file
    // under bucket=0 so the empty layout stays readable.
    if (log.isEmpty)
      log.limit(0).write.mode("append").parquet(s"$dir/bucket=0")
  }

  /** The partitioned log as a DataFrame (bucket column included). */
  def open(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /**
   * Small-file compaction — the maintenance job every append-heavy
   * bucketed layout needs. Each incremental [[write]] (mode=append) adds
   * one file per bucket, so after B batches every bucket directory holds
   * B small files and scan cost is dominated by file open/footer reads.
   * Compaction rewrites each bucket as a single position-sorted file
   * into a SHADOW directory (`dstDir`) which the caller swaps in — never
   * in place, so concurrent readers of the live directory are unharmed
   * (same swap discipline as the reference's Postgres vacuum analogue —
   * it inherits compaction from its backend; here we own it).
   *
   * Plan shape: one shuffle on the (already materialized) bucket column
   * — rows move only between files of the SAME bucket, the bucket
   * assignment is never recomputed, and the per-bucket sort restores the
   * position-ordered row groups that parquet min/max pruning rides.
   */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
              nBuckets: Int = 64): Unit =
    open(spark, srcDir)
      .repartition(nBuckets, col("bucket"))
      .sortWithinPartitions("position")
      .write.mode("overwrite").partitionBy("bucket").parquet(dstDir)

  /** Bit-interleave of two `bits`-wide bucket columns — the space-filling
    * z-curve key (same arithmetic as the `zorder_keys` gate query, kept
    * engine-exact). */
  private def zInterleave(ub: org.apache.spark.sql.Column,
                          tb: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column =
    (0 until bits)
      .map(k =>
        shiftleft(shiftright(ub, k).bitwiseAND(lit(1L)), 2 * k)
          .bitwiseOR(shiftleft(shiftright(tb, k).bitwiseAND(lit(1L)), 2 * k + 1)))
      .reduce(_ bitwiseOR _)

  /**
   * Z-order compaction: rewrite the log range-clustered by the interleaved
   * (stream-bucket, time-bucket) key, so BOTH per-entity and per-time-range
   * predicates prune row groups — a single-column sort clusters only one
   * dimension; the z-curve keeps each file's min/max tight in both.
   * `zorder_keys` computes the key; this writes the layout it promises.
   *
   * Plan shape: one range shuffle on `z` (each output file covers a
   * disjoint z interval), per-file sort, and the bucket columns
   * (`ubucket`/`tbucket`) are STORED so parquet footer min/max stats over
   * them drive row-group skipping under the original 2-column predicates
   * (pruning asserted by PartitionedLogSpec against the position-sorted
   * layout on the same data).
   */
  def zorderCompact(log: DataFrame, dstDir: String,
                    nFiles: Int = 8, bits: Int = 4): Unit =
    withZ(log, bits)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(dstDir)

  /** The log with its z-layout key and bucket columns materialized. */
  def withZ(log: DataFrame, bits: Int = 4): DataFrame = {
    val m = lit(1L << bits)
    val micros = unix_micros(col("ts"))
    log
      .withColumn("ubucket", pmod(call_function("graft_polyhash", col("stream")), m))
      .withColumn("tbucket", pmod(floor(micros / lit(86400000000L)).cast("long"), m))
      .withColumn("z", zInterleave(col("ubucket"), col("tbucket"), bits))
  }

  /**
   * Hilbert-curve compaction: same shape as [[zorderCompact]] — one range
   * shuffle on the layout key, per-file sort, bucket columns STORED for
   * parquet footer min/max skipping — but clustered by the Hilbert index
   * instead of the bit-interleave. On a Hilbert walk every consecutive
   * key pair is an ADJACENT grid cell (no Z-shape jumps), so each file's
   * key range covers a tighter spatial blob and 2-sided range predicates
   * (entity-range × time-range dashboards) prune more files than on the
   * Z layout of the same data (`PartitionedLogSpec` measures exactly
   * that, layouts serving identical results). Key arithmetic is
   * [[graft.plans.Hilbert]]'s staged integer-CASE SQL — the text the
   * `hilbert_keys` gate query shares verbatim with its DuckDB oracle.
   */
  def hilbertCompact(log: DataFrame, dstDir: String,
                     nFiles: Int = 8, bits: Int = 4): Unit =
    withH(log, bits)
      .repartitionByRange(nFiles, col("h"))
      .sortWithinPartitions("h")
      .write.mode("overwrite").parquet(dstDir)

  /** The log with its Hilbert layout key `h` and stored bucket columns
    * (`ubucket`, `tbucket`) materialized; staging columns dropped. */
  def withH(log: DataFrame, bits: Int = 4): DataFrame = {
    val m = lit(1L << bits)
    val micros = unix_micros(col("ts"))
    val base = log
      .withColumn("ubucket", pmod(call_function("graft_polyhash", col("stream")), m))
      .withColumn("tbucket", pmod(floor(micros / lit(86400000000L)).cast("long"), m))
    val stages = graft.plans.Hilbert.stages("ubucket", "tbucket", bits)
    val staged = stages.foldLeft(base) { case (df, (nm, e)) => df.withColumn(nm, expr(e)) }
    staged.drop(stages.map(_._1).filter(_ != "h"): _*)
  }

  /**
   * Bounded read over the partitioned layout: single-stream reads get the
   * bucket-equality predicate (directory pruning); `$all` reads scan all
   * buckets. Semantics are [[EventLog.read]] exactly; the bucket column is
   * dropped from the result.
   */
  def read(spark: SparkSession, dir: String, opts: ReadOptions,
           nBuckets: Int = 64): DataFrame = {
    val df = open(spark, dir)
    val pruned = opts.selector match {
      case OneStream(s) => df.filter(col("bucket") === lit(bucketOf(s, nBuckets)))
      case AllStreams   => df
    }
    EventLog.read(pruned, opts).drop("bucket")
  }
}
