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

  /** Total on-disk bytes across still-registered scratch paths — the
    * footprint a sweep's per-query releases leave behind. Local-scheme
    * only (a `du` over registered dirs); non-existent paths count 0.
    */
  def liveBytes(): Long = {
    var total = 0L
    registered.forEach { p =>
      def size(f: java.io.File): Long =
        if (f.isDirectory)
          Option(f.listFiles()).map(_.map(size).sum).getOrElse(0L)
        else if (f.isFile) f.length()
        else 0L
      total += size(new java.io.File(p))
    }
    total
  }

  /** Best-effort recursive delete that understands non-local schemes (the
    * shared-filesystem scratch root case). The Hadoop conf comes from the
    * active session when one exists — a fresh `Configuration()` may lack
    * the session's object-store credentials, and a credential failure
    * falling through to the local-file branch would silently leak remote
    * scratch. */
  private def deletePath(p: String): Unit =
    try {
      val conf = org.apache.spark.sql.SparkSession.getActiveSession
        .flatMap(s => try Some(s.sessionState.newHadoopConf())
                      catch { case scala.util.control.NonFatal(_) => None })
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      fs.delete(hp, true)
      ()
    } catch {
      case scala.util.control.NonFatal(_) =>
        deleteRecursively(new java.io.File(p))
    }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
