package graft.log

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._

class PartitionedLogSpec extends SparkSpec {

  private val N = 8

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-plog").toString
    PartitionedLog.write(Fixture.events(spark, "/root/testdata/sf0.001"), d, nBuckets = N)
    d
  }

  test("single-stream read prunes to the stream's bucket at planning time") {
    val q = PartitionedLog.read(spark, dir,
      ReadOptions(OneStream("user-3"), Forwards, From(0)), nBuckets = N)
    val plan = q.queryExecution.executedPlan.toString()
    // directory pruning is visible in the scan: PartitionFilters on bucket
    assert(plan.contains("PartitionFilters"), plan)
    // attribute ids vary: match `bucket#<id> = <expected>`
    val expect = s"bucket#\\d+ = ${PartitionedLog.bucketOf("user-3", N)}".r
    assert(expect.findFirstIn(plan).isDefined, plan)
  }

  test("partitioned reads return exactly the unpartitioned results") {
    val base = Fixture.events(spark, "/root/testdata/sf0.001")
    for (opts <- Seq(
        ReadOptions(OneStream("user-3"), Forwards, From(0)),
        ReadOptions(OneStream("user-7"), Backwards, FromEnd, count = Some(5)),
        ReadOptions(AllStreams, Forwards, From(10), count = Some(20),
          filter = Some(PrefixFilter(OnEventType, Seq("cl")))))) {
      val want = EventLog.read(base, opts)
        .select("position", "stream", "revision").collect().toSeq
      val got = PartitionedLog.read(spark, dir, opts, nBuckets = N)
        .select("position", "stream", "revision").collect().toSeq
      assert(got == want, s"mismatch for $opts")
    }
  }

  test("buckets cover all streams; each stream lives in exactly one bucket") {
    val df = PartitionedLog.open(spark, dir)
    assert(df.count() == Fixture.events(spark, "/root/testdata/sf0.001").count())
    val multi = df.groupBy("stream").agg(countDistinct(col("bucket")).as("nb"))
      .filter(col("nb") =!= 1)
    assert(multi.count() == 0)
  }

  private def dataFiles(root: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    walk(new java.io.File(root))
  }

  test("compaction: B append batches collapse to one file per bucket, content identical") {
    val ev = Fixture.events(spark, "/root/testdata/sf0.001")
    val live = Files.createTempDirectory("graft-plog-live").toString
    // three incremental append batches — each leaves one file per bucket
    for (b <- 0 until 3)
      PartitionedLog.write(ev.filter(pmod(col("position"), lit(3)) === b), live,
        nBuckets = N, mode = "append")
    val before = dataFiles(live)
    assert(before.size > N, s"expected >$N small files pre-compaction, got ${before.size}")

    val shadow = Files.createTempDirectory("graft-plog-shadow").toString
    PartitionedLog.compact(spark, live, shadow, nBuckets = N)
    val after = dataFiles(shadow)
    assert(after.size == N, s"expected exactly $N compacted files, got ${after.size}")

    // content identical, and the compacted layout still serves pruned reads
    val a = PartitionedLog.open(spark, live)
      .select("position", "stream", "revision").orderBy("position").collect().toSeq
    val b = PartitionedLog.open(spark, shadow)
      .select("position", "stream", "revision").orderBy("position").collect().toSeq
    assert(a == b)
    val q = PartitionedLog.read(spark, shadow,
      ReadOptions(OneStream("user-3"), Forwards, From(0)), nBuckets = N)
    assert(q.queryExecution.executedPlan.toString().contains("PartitionFilters"))
    assert(q.count() > 0)
  }

  test("zorderCompact: 2-column range predicate reads fewer rows than a position-sorted layout") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val ev = Fixture.events(spark, "/root/testdata/sf0.001")
    val zDir = Files.createTempDirectory("graft-zorder").toString
    val pDir = Files.createTempDirectory("graft-posorder").toString
    PartitionedLog.zorderCompact(ev, zDir, nFiles = 8)
    // baseline: SAME columns, same file count, clustered by position only
    PartitionedLog.withZ(ev)
      .repartitionByRange(8, col("position"))
      .sortWithinPartitions("position")
      .write.mode("overwrite").parquet(pDir)

    // the 2-D predicate both per-entity and per-time dashboards issue
    def pred(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("ubucket") === 3L && col("tbucket").between(0L, 7L))
    def scannedRows(dir: String): (Long, Seq[Long]) = {
      val q = pred(spark.read.parquet(dir)).select("position")
      val rows = q.collect().map(_.getLong(0)).sorted.toSeq
      val scanned = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
      (scanned, rows)
    }
    val (zScanned, zRows) = scannedRows(zDir)
    val (pScanned, pRows) = scannedRows(pDir)
    assert(zRows == pRows, "layouts must serve identical results")
    assert(zRows.nonEmpty)
    // row-group stats on the stored bucket columns prune the z-clustered
    // files; the position-sorted layout has every file straddling all
    // bucket values, so nothing prunes
    assert(zScanned < pScanned,
      s"z-order must read fewer rows: z=$zScanned vs position=$pScanned")
  }

  test("hilbertCompact: square range predicates prune tighter than Z and position layouts") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val ev = Fixture.events(spark, "/root/testdata/sf0.001")
    val hDir = Files.createTempDirectory("graft-hilbert").toString
    val zDir = Files.createTempDirectory("graft-zorder2").toString
    val pDir = Files.createTempDirectory("graft-posorder2").toString
    PartitionedLog.hilbertCompact(ev, hDir, nFiles = 8)
    PartitionedLog.zorderCompact(ev, zDir, nFiles = 8)
    // baseline: same stored columns, same file count, position-clustered
    PartitionedLog.withZ(ev)
      .repartitionByRange(8, col("position"))
      .sortWithinPartitions("position")
      .write.mode("overwrite").parquet(pDir)

    // square entity-range × time-range blobs — the 2-sided dashboards
    // where the Hilbert walk's adjacency (no cross-grid Z jumps) keeps
    // each file's key range a tighter blob than the interleave
    val squares = Seq((0L, 3L, 0L, 3L), (4L, 7L, 4L, 7L),
      (2L, 5L, 2L, 5L), (5L, 8L, 8L, 11L), (0L, 3L, 12L, 15L))
    def scanned(dir: String, sq: (Long, Long, Long, Long)): (Long, Seq[Long]) = {
      val (u0, u1, t0, t1) = sq
      val q = spark.read.parquet(dir)
        .filter(col("ubucket").between(u0, u1) && col("tbucket").between(t0, t1))
        .select("position")
      val rows = q.collect().map(_.getLong(0)).sorted.toSeq
      val n = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
      (n, rows)
    }
    var hTot = 0L; var zTot = 0L; var pTot = 0L
    squares.foreach { sq =>
      val (h, hRows) = scanned(hDir, sq)
      val (z, zRows) = scanned(zDir, sq)
      val (p, pRows) = scanned(pDir, sq)
      assert(hRows == zRows && zRows == pRows, s"layouts must serve identical results for $sq")
      assert(hRows.nonEmpty, s"empty probe square $sq")
      hTot += h; zTot += z; pTot += p
    }
    assert(hTot < pTot, s"hilbert must beat the position layout: h=$hTot vs p=$pTot")
    assert(hTot < zTot, s"hilbert must beat the Z layout on square ranges: h=$hTot vs z=$zTot")
  }
}
