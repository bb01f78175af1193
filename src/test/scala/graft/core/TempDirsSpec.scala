package graft.core

import graft.SparkSpec

/** The scratch registry's sweep-facing surface: snapshot/releaseSince
  * (the per-query release bracket Bench/Verify/Scale all use) and
  * liveBytes (the post-sweep footprint line in the bench record).
  */
class TempDirsSpec extends SparkSpec {

  private def mkFile(dir: String, name: String, bytes: Int): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, name), new Array[Byte](bytes)): Unit
  }

  test("releaseSince deletes exactly the paths registered after the " +
    "snapshot and reports the count") {
    val before = TempDirs.scratch("tds_before")
    mkFile(before, "a.bin", 100)
    val snap = TempDirs.snapshot()
    val after1 = TempDirs.scratch("tds_after1")
    val after2 = TempDirs.scratch("tds_after2")
    mkFile(after1, "b.bin", 100)
    mkFile(after2, "c.bin", 100)
    val n = TempDirs.releaseSince(snap)
    assert(n == 2)
    assert(new java.io.File(before).exists(), "pre-snapshot path must survive")
    assert(!new java.io.File(after1).exists())
    assert(!new java.io.File(after2).exists())
    TempDirs.release(before)
  }

  test("liveBytes sums only still-registered scratch dirs (recursively), " +
    "and a release moves the footprint to zero") {
    val snap = TempDirs.snapshot()
    val p = TempDirs.scratch("tds_bytes")
    mkFile(p, "x.bin", 1024)
    mkFile(s"$p/sub", "y.bin", 512)
    val live = TempDirs.liveBytes()
    assert(live >= 1536, s"expected >= 1536 live bytes, got $live")
    TempDirs.releaseSince(snap): Unit
    assert(!new java.io.File(p).exists())
  }

  test("releaseSince is a no-op for an unchanged registry") {
    val snap = TempDirs.snapshot()
    assert(TempDirs.releaseSince(snap) == 0)
  }
}
