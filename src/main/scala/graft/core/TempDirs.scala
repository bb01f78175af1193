package graft.core

/** Process-scoped scratch directories: created under java.io.tmpdir and
  * deleted by a JVM shutdown hook, so repeated Verify/Bench runs don't
  * accumulate staged sketch/store files on local disk. (On a cluster the
  * staging location is a real storage path chosen by the caller — explicit
  * paths are never registered for deletion.)
  */
object TempDirs {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(p => deleteRecursively(new java.io.File(p)))
    }))

  /** A fresh scratch path (not yet created), removed at JVM exit. */
  def scratch(tag: String): String = {
    hookInstalled
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_" +
      java.util.UUID.randomUUID().toString
    registered.add(p)
    p
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
