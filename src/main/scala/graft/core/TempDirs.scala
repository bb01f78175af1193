package graft.core

/** Process-scoped scratch directories, deleted by a JVM shutdown hook so
  * repeated Verify/Bench runs don't accumulate staged sketch/store files.
  *
  * The scratch ROOT resolves from the Spark conf `graft.scratch.dir` when an
  * active session defines it, falling back to `java.io.tmpdir`. On a real
  * multi-node cluster the conf MUST point at a shared filesystem (object
  * store / HDFS) — executors have to read what the driver stages; the
  * tmpdir default is only correct for local mode. Explicit caller-chosen
  * staging paths are never registered for deletion.
  */
object TempDirs {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(deletePath)
    }))

  /** Scratch root: `graft.scratch.dir` (shared path on clusters) or tmpdir. */
  private def root: String =
    org.apache.spark.sql.SparkSession.getActiveSession
      .flatMap(s =>
        try s.conf.getOption("graft.scratch.dir")
        catch { case _: Exception => None })
      .getOrElse(System.getProperty("java.io.tmpdir"))

  /** A fresh scratch path (not yet created), removed at JVM exit. */
  def scratch(tag: String): String = {
    hookInstalled
    val p = s"$root/graft_${tag}_" + java.util.UUID.randomUUID().toString
    registered.add(p)
    p
  }

  /** Eagerly delete a path handed out by [[scratch]] and drop it from the
    * exit-hook registry — for scoped stages whose files are fully consumed
    * before JVM exit ([[Scratch.withStage]]). Safe on never-created paths.
    */
  def release(p: String): Unit = {
    registered.remove(p)
    deletePath(p)
  }

  /** Snapshot of the live scratch registry, for [[releaseSince]]. */
  def snapshot(): java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    registered.forEach(p => { s.add(p); () })
    s
  }

  /** Release every scratch path registered AFTER `snap` was taken — the
    * long-session lever: scratch is deleted only at JVM exit by default,
    * so a driver that runs many queries in one session (a sweep, a
    * long-lived service) accumulates it unboundedly — the round-17 sf10
    * sweep filled 77 GB of disk from four SEG-Y round-trip runs alone and
    * starved every query after it. ONLY safe when the frames produced
    * since the snapshot are fully consumed (counted/written), because a
    * returned lazy frame still scans its scratch.
    */
  def releaseSince(snap: java.util.Set[String]): Int = {
    var n = 0
    registered.forEach { p =>
      if (!snap.contains(p)) { release(p); n += 1 }
    }
    n
  }

  /** Best-effort recursive delete that understands non-local schemes (the
    * shared-filesystem scratch root case). */
  private def deletePath(p: String): Unit =
    try {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
      fs.delete(hp, true)
      ()
    } catch {
      case _: Throwable => deleteRecursively(new java.io.File(p))
    }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
