package graft.streaming

import org.apache.spark.sql.DataFrame

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
 *  - `replace(name, df)` — for MERGED tables (exact-keeper map, label
 *    table, the survivor signature store under dethronement removals).
 *    The parquet implementation rewrites the table into a fresh
 *    versioned directory; a production deployment replaces this verb
 *    with a keyed Delta/Iceberg MERGE so the write cost is update-mass,
 *    not table mass — the verb boundary is exactly the MERGE boundary,
 *    which is why it exists.
 *  - `load(spark, name)` — how a RESTARTED twin resumes: both twins
 *    lazily load every state table from the store before their first
 *    state access, so a new incarnation over an existing parquet root
 *    continues exactly where the last one stopped (`StreamingSpec`
 *    pins a mid-stream restart, with dethronements crossing the
 *    restart boundary, equal to the batch recompute).
 *
 * Both verbs return the CURRENT full table; callers never union state
 * themselves, so the in-memory and on-disk twins run the identical
 * maintenance logic (`StreamingSpec` pins streaming-final == batch
 * through BOTH implementations).
 */
trait TwinStore {
  /** Append `delta` to table `name`; returns the full current table. */
  def append(name: String, delta: DataFrame): DataFrame

  /** Replace table `name` with `df`; returns the stored table. */
  def replace(name: String, df: DataFrame): DataFrame

  /** The stored current table, if this store holds one — how a
    * RESTARTED twin resumes where the previous incarnation stopped
    * (None for a fresh store; always None for the in-memory store in a
    * new JVM, which is exactly why the parquet store exists). */
  def load(spark: org.apache.spark.sql.SparkSession, name: String): Option[DataFrame]
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

  override def replace(name: String, df: DataFrame): DataFrame = synchronized {
    val next = df.localCheckpoint()
    tables(name) = next
    next
  }

  override def load(spark: org.apache.spark.sql.SparkSession, name: String): Option[DataFrame] =
    synchronized(tables.get(name))
}

/**
 * Parquet-backed store rooted at `root`: append-only tables are a single
 * directory the trigger appends one delta file-set to (state survives
 * the JVM; a restarted twin re-reads it); replaced tables are written to
 * a fresh versioned directory per trigger, keeping the previous version
 * alive until the NEXT replace (the caller's pre-replace DataFrame may
 * still be read inside the current trigger), then deleted.
 */
final class ParquetTwinStore(root: String) extends TwinStore {
  private val versions = scala.collection.mutable.Map.empty[String, Long]

  private def rm(path: String): Unit = {
    def walk(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(walk)
      f.delete(): Unit
    }
    walk(new java.io.File(path))
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

  override def append(name: String, delta: DataFrame): DataFrame = synchronized {
    val dir = s"$root/$name"
    delta.write.mode("append").parquet(dir)
    delta.sparkSession.read.parquet(dir)
  }

  override def replace(name: String, df: DataFrame): DataFrame = synchronized {
    val v = currentVersion(name) + 1L
    df.write.mode("overwrite").parquet(s"$root/$name-v$v")
    versions(name) = v
    if (v >= 3L) rm(s"$root/$name-v${v - 2L}")
    df.sparkSession.read.parquet(s"$root/$name-v$v")
  }

  override def load(spark: org.apache.spark.sql.SparkSession, name: String): Option[DataFrame] =
    synchronized {
      val plain = new java.io.File(s"$root/$name")
      if (plain.isDirectory) Some(spark.read.parquet(plain.getPath))
      else {
        val v = currentVersion(name)
        if (v > 0L) Some(spark.read.parquet(s"$root/$name-v$v")) else None
      }
    }
}
