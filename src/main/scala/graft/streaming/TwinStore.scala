package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Persistence for the streaming twins' cross-trigger state tables
 * ([[StreamingClusters]], [[StreamingCuration]]) — the piece that was
 * previously an in-memory `localCheckpoint` union chain with a scaladoc
 * CLAIM that "at 100 TB this is a parquet/Delta table". The claim is now
 * an implementation: the twins speak three verbs and the store decides
 * where state lives.
 *
 *  - `append(name, delta)` — for APPEND-ONLY tables (doc metadata,
 *    winnow postings, corpus signature/band tables): the per-trigger
 *    write is delta-sized by construction.
 *  - `merge(name, keyCols, upserts, deleteKeys)` — for MERGED tables
 *    (exact-keeper map, label table, the survivor signature store under
 *    dethronement removals, the per-doc flag ledger): the keyed
 *    Delta/Iceberg-MERGE equivalent. The per-trigger WRITE is
 *    update-mass (the upsert rows and delete keys, nothing else); the
 *    parquet implementation is merge-on-read with periodic compaction.
 *  - `replace(name, df)` — for tables that are REBUILT whole each
 *    trigger and are small by construction (the O(sources) serving
 *    counters). Rewrites table mass; do not use it for state that grows
 *    with the corpus — that's what `merge` is for.
 *  - `load(spark, name)` — how a RESTARTED twin resumes: both twins
 *    lazily load every state table from the store before their first
 *    state access, so a new incarnation over an existing parquet root
 *    continues exactly where the last one stopped (`StreamingSpec`
 *    pins a mid-stream restart, with dethronements crossing the
 *    restart boundary, equal to the batch recompute).
 *
 * Every verb returns the CURRENT full table; callers never union state
 * themselves, so the in-memory and on-disk twins run the identical
 * maintenance logic (`StreamingSpec` pins streaming-final == batch
 * through BOTH implementations).
 *
 * RETENTION CONTRACT (all implementations): a DataFrame returned at
 * trigger T stays readable through trigger T+1's maintenance, and no
 * longer — the second subsequent merge/replace on the same table may
 * garbage-collect the files backing it. Callers must therefore
 * re-acquire each state table every trigger (the twins do: every verb
 * returns the current table and the twin replaces its held reference)
 * and must NOT hand returned DataFrames to long-lived consumers; a
 * serving layer reads through `load` at its own trigger cadence.
 */
trait TwinStore {
  /** Append `delta` to table `name`; returns the full current table. */
  def append(name: String, delta: DataFrame): DataFrame

  /** Keyed MERGE into table `name` — the Delta/Iceberg `MERGE INTO`
    * equivalent, and the only verb whose parquet write cost is
    * UPDATE-mass rather than table mass. Semantics:
    *
    *  - every key group present in `upserts` REPLACES the stored rows
    *    with that key (a key may span multiple rows — e.g. a doc's
    *    shingle set — and the whole group is swapped);
    *  - every key in `deleteKeys` is removed;
    *  - all other rows are untouched.
    *
    * Upsert and delete key sets within one call must be disjoint; a
    * deleted key MAY be re-upserted by a later merge (a doc can re-enter
    * the label table when a new arrival pairs with it after its previous
    * partner dethroned out). Returns the full current table. */
  def merge(name: String, keyCols: Seq[String], upserts: DataFrame,
            deleteKeys: Option[DataFrame]): DataFrame

  /** Replace table `name` with `df`; returns the stored table. Write
    * cost is table mass — reserve for tables that are small by
    * construction (see the class doc); growing merged state goes
    * through [[merge]]. */
  def replace(name: String, df: DataFrame): DataFrame

  /** The stored current table, if this store holds one — how a
    * RESTARTED twin resumes where the previous incarnation stopped
    * (None for a fresh store; always None for the in-memory store in a
    * new JVM, which is exactly why the parquet store exists). */
  def load(spark: SparkSession, name: String): Option[DataFrame]
}

/** In-memory store: `localCheckpoint` unions, lineage truncated per
  * trigger (the original twin shape — right for tests and for state that
  * fits the cluster's block managers). */
final class InMemoryTwinStore extends TwinStore {
  private val tables = scala.collection.mutable.Map.empty[String, DataFrame]

  override def append(name: String, delta: DataFrame): DataFrame = synchronized {
    val next = tables.get(name)
      .fold(delta.localCheckpoint())(t => t.unionByName(delta).localCheckpoint())
    tables(name) = next
    next
  }

  override def merge(name: String, keyCols: Seq[String], upserts: DataFrame,
                     deleteKeys: Option[DataFrame]): DataFrame = synchronized {
    val next = tables.get(name) match {
      case None => upserts.localCheckpoint()
      case Some(cur) =>
        val keyed = keyCols.map(col)
        val gone = deleteKeys.fold(upserts.select(keyed: _*))(
          d => upserts.select(keyed: _*).unionByName(d.select(keyed: _*)))
        cur.join(gone, keyCols, "left_anti").unionByName(upserts).localCheckpoint()
    }
    tables(name) = next
    next
  }

  override def replace(name: String, df: DataFrame): DataFrame = synchronized {
    val next = df.localCheckpoint()
    tables(name) = next
    next
  }

  override def load(spark: SparkSession, name: String): Option[DataFrame] =
    synchronized(tables.get(name))
}

/**
 * Parquet-backed store rooted at `root` — LOCAL-FILESYSTEM ONLY (paths
 * walk `java.io.File`; a cluster deployment swaps this class for a
 * Delta/Iceberg table keeping the same verb boundary).
 *
 *  - APPEND tables are a single directory the trigger appends one delta
 *    file-set to (state survives the JVM; a restarted twin re-reads it).
 *  - MERGED tables (`$name.m/`) are MERGE-ON-READ: each merge writes the
 *    upserts as one sequence-numbered delta file-set (`d<seq>`) and the
 *    delete keys as a tombstone file-set (`t<seq>`) — update-mass, the
 *    only state-proportional write being periodic COMPACTION: once the
 *    live delta count passes [[ParquetTwinStore.MaxDeltas]], the
 *    resolved table is folded into a new base (`base-v<seq>`) and the
 *    consumed files are garbage-collected ONE TRIGGER LATER (deferred
 *    GC, so a DataFrame handed out at trigger T survives trigger T+1 —
 *    the retention contract on [[TwinStore]]). Read resolution is
 *    last-writer-wins per key group (max file sequence), then tombstone
 *    anti-join — the standard MoR trade: update-mass writes for
 *    read-side resolution, amortized by compaction.
 *  - REPLACED tables are written to a fresh versioned directory per
 *    trigger, keeping the previous version alive until the NEXT replace
 *    (same retention window as merge), then deleted.
 */
final class ParquetTwinStore(root: String) extends TwinStore {
  import ParquetTwinStore.MaxDeltas

  private val versions = scala.collection.mutable.Map.empty[String, Long]
  private val mergeSeqs = scala.collection.mutable.Map.empty[String, Long]
  // files consumed by a compaction, physically deleted at the START of
  // the next merge on the same table (the deferred-GC half of the
  // retention contract)
  private val pendingRm = scala.collection.mutable.Map.empty[String, Seq[String]]

  private def rm(path: String): Unit = {
    def walk(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(walk)
      f.delete(): Unit
    }
    walk(new java.io.File(path))
  }

  /** Directories under `dir` whose name starts with `prefix` followed by
    * digits, as (sequence, path), ascending. */
  private def seqDirs(dir: String, prefix: String): Seq[(Long, String)] = {
    val fs = new java.io.File(dir).listFiles()
    if (fs == null) Seq.empty
    else fs.iterator.filter(_.isDirectory).map(_.getName)
      .filter(n => n.startsWith(prefix) && n.length > prefix.length &&
        n.drop(prefix.length).forall(_.isDigit))
      .map(n => (n.drop(prefix.length).toLong, s"$dir/$n"))
      .toSeq.sortBy(_._1)
  }

  /** A parquet dir readable by spark.read (has at least one data file). */
  private def hasData(path: String): Boolean = {
    val fs = new java.io.File(path).listFiles()
    fs != null && fs.exists(f => f.isFile && f.getName.startsWith("part-"))
  }

  /** Current version of a replace-table, surviving restarts: a fresh
    * store instance over an existing root scans for `name-v*` so its
    * next replace continues the sequence (instead of clobbering v1
    * while v3 is live). */
  private def currentVersion(name: String): Long =
    versions.getOrElseUpdate(name, {
      val fs = new java.io.File(root).listFiles()
      val prefix = s"$name-v"
      if (fs == null) 0L
      else fs.iterator.map(_.getName).filter(_.startsWith(prefix))
        .map(_.drop(prefix.length)).filter(_.forall(_.isDigit))
        .map(_.toLong).foldLeft(0L)(math.max)
    })

  /** Next merge sequence for a merged table, surviving restarts (scans
    * the table dir for the max seen base/delta/tombstone sequence). */
  private def nextMergeSeq(name: String): Long = {
    val dir = s"$root/$name.m"
    val cur = mergeSeqs.getOrElseUpdate(name,
      (seqDirs(dir, "base-v") ++ seqDirs(dir, "d") ++ seqDirs(dir, "t"))
        .map(_._1).foldLeft(0L)(math.max))
    mergeSeqs(name) = cur + 1L
    cur + 1L
  }

  /** Resolve a merged table: last-writer-wins per key group across
    * base + deltas (max file sequence), with tombstones PARTICIPATING
    * in the sequence order — a key is live iff its latest upsert is
    * newer than its latest tombstone, so deletion and re-insertion
    * interleave correctly. Returns None for a table with no live data
    * files. */
  private def resolveMerged(spark: SparkSession, name: String,
                            keyCols: Seq[String]): Option[DataFrame] = {
    val dir = s"$root/$name.m"
    val parts = (seqDirs(dir, "base-v") ++ seqDirs(dir, "d"))
      .filter(p => hasData(p._2))
    if (parts.isEmpty) return None
    val all = parts.map { case (seq, path) =>
        spark.read.parquet(path).withColumn("_mseq", lit(seq))
      }.reduce(_ unionByName _)
    val w = Window.partitionBy(keyCols.map(col): _*)
    val live = all.withColumn("_mmax", max(col("_mseq")).over(w))
      .filter(col("_mseq") === col("_mmax"))
      .drop("_mseq")
    val tombs = seqDirs(dir, "t").filter(p => hasData(p._2))
    if (tombs.isEmpty) Some(live.drop("_mmax"))
    else {
      val gone = tombs.map { case (seq, path) =>
          spark.read.parquet(path).withColumn("_tseq", lit(seq))
        }.reduce(_ unionByName _)
        .groupBy(keyCols.map(col): _*).agg(max(col("_tseq")).as("_tmax"))
      Some(live.join(gone, keyCols, "left")
        .filter(col("_tmax").isNull || col("_mmax") > col("_tmax"))
        .drop("_mmax", "_tmax"))
    }
  }

  /** Merged tables record their key columns in a `_keys` marker file so
    * a RESTARTED store can resolve them in [[load]] before the caller's
    * first merge supplies the key list. */
  private def keyMarker(name: String): java.io.File =
    new java.io.File(s"$root/$name.m/_keys")

  private def writeKeys(name: String, keyCols: Seq[String]): Unit = {
    val f = keyMarker(name)
    if (!f.exists()) {
      java.nio.file.Files.write(f.toPath,
        keyCols.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
  }

  private def readKeys(name: String): Option[Seq[String]] = {
    val f = keyMarker(name)
    if (!f.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8).split("\n").toSeq.filter(_.nonEmpty))
  }

  override def append(name: String, delta: DataFrame): DataFrame = synchronized {
    val dir = s"$root/$name"
    delta.write.mode("append").parquet(dir)
    delta.sparkSession.read.parquet(dir)
  }

  override def merge(name: String, keyCols: Seq[String], upserts: DataFrame,
                     deleteKeys: Option[DataFrame]): DataFrame = synchronized {
    val spark = upserts.sparkSession
    val dir = s"$root/$name.m"
    // deferred GC: files consumed by the PREVIOUS merge's compaction are
    // now past their retention window
    pendingRm.remove(name).foreach(_.foreach(rm))
    new java.io.File(dir).mkdirs()
    writeKeys(name, keyCols)
    val seq = nextMergeSeq(name)
    // the per-trigger write: update-mass by construction
    upserts.write.mode("overwrite").parquet(s"$dir/d$seq")
    deleteKeys.foreach(d =>
      d.select(keyCols.map(col): _*).write.mode("overwrite").parquet(s"$dir/t$seq"))

    val liveDeltas = seqDirs(dir, "d")
    if (liveDeltas.length >= MaxDeltas && resolveMerged(spark, name, keyCols).isDefined) {
      // compaction: fold the resolved table into a new base; consumed
      // files go to the deferred-GC list, not the floor (held DataFrames
      // from the previous trigger must survive this one)
      val resolved = resolveMerged(spark, name, keyCols).get
      val baseSeq = nextMergeSeq(name)
      resolved.write.mode("overwrite").parquet(s"$dir/base-v$baseSeq")
      val consumed = (seqDirs(dir, "base-v").filter(_._1 != baseSeq) ++
        liveDeltas ++ seqDirs(dir, "t")).map(_._2)
      pendingRm(name) = consumed
      // resolution over the fresh base alone (old files are still on
      // disk for retention, but excluded by reading the base directly)
      spark.read.parquet(s"$dir/base-v$baseSeq")
    } else {
      // materialize the resolution ONCE per merge: callers run several
      // actions per trigger against the returned table, and re-running
      // the last-writer-wins window per action would multiply the MoR
      // read amplification (durability still lives in the files — the
      // checkpoint is a per-trigger read cache, exactly what a real
      // MERGE's returned table version is). Empty-table degenerate case:
      // the empty upsert frame carries the right schema.
      resolveMerged(spark, name, keyCols).fold(upserts)(_.localCheckpoint())
    }
  }

  override def replace(name: String, df: DataFrame): DataFrame = synchronized {
    val v = currentVersion(name) + 1L
    df.write.mode("overwrite").parquet(s"$root/$name-v$v")
    versions(name) = v
    if (v >= 3L) rm(s"$root/$name-v${v - 2L}")
    df.sparkSession.read.parquet(s"$root/$name-v$v")
  }

  override def load(spark: SparkSession, name: String): Option[DataFrame] =
    synchronized {
      val mergedDir = new java.io.File(s"$root/$name.m")
      if (mergedDir.isDirectory)
        readKeys(name).flatMap(ks => resolveMerged(spark, name, ks))
      else {
        val plain = new java.io.File(s"$root/$name")
        if (plain.isDirectory) Some(spark.read.parquet(plain.getPath))
        else {
          val v = currentVersion(name)
          if (v > 0L) Some(spark.read.parquet(s"$root/$name-v$v")) else None
        }
      }
    }
}

object ParquetTwinStore {
  /** Live-delta count that triggers a merged-table compaction: per-
    * trigger cost stays update-mass for `MaxDeltas - 1` triggers, then
    * one trigger pays the (amortized) table-mass fold. */
  val MaxDeltas = 8
}
