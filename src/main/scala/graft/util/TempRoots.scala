package graft.util

/** Registry of query-owned temp roots, deleted at JVM exit — gate
  * queries that stage stored artifacts (the partitioned-log copy, the
  * stored-projection service dirs) create them under `java.io.tmpdir`
  * once per (session, sf-dir) and serve them for the JVM's lifetime;
  * without the exit hook every bench/verify JVM (the sweep runs
  * several: cold, warm, isolation, fresh-JVM escalation) strands its
  * roots in /tmp across rounds. Roots a returned DataFrame no longer
  * references are better deleted INLINE with [[rm]] (see
  * `StoreQueries.twinstore_resolve`, `ProjectionQueries.
  * proj_catalog_roundtrip`) — the hook is for roots that must outlive
  * the query call. */
object TempRoots {
  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val hookOnce: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(
      () => roots.forEach(rm(_)), "graft-temp-roots-rm"))

  /** Create a temp dir with the given name prefix and register it for
    * deletion at JVM exit. */
  def create(prefix: String): String = {
    hookOnce
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    roots.add(d): Unit
    d
  }

  /** Recursive best-effort delete (also usable inline, without
    * registration). */
  def rm(path: String): Unit = {
    def walk(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(walk)
      f.delete(): Unit
    }
    walk(new java.io.File(path))
  }
}
