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
    assert(live.exists(_ >= 1536), s"expected >= 1536 live bytes, got $live")
    TempDirs.releaseSince(snap): Unit
    assert(!new java.io.File(p).exists())
  }

  test("liveBytes does not follow symlinks out of a scratch dir") {
    assume(!System.getProperty("os.name").toLowerCase.contains("win"))
    val snap = TempDirs.snapshot()
    val outside = java.nio.file.Files.createTempDirectory("tds_outside")
    java.nio.file.Files.write(
      outside.resolve("big.bin"), new Array[Byte](1 << 20)): Unit
    val p = TempDirs.scratch("tds_links")
    mkFile(p, "real.bin", 256)
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(p, "loop"), java.nio.file.Paths.get(p)): Unit
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(p, "out"), outside): Unit
    val live = TempDirs.liveBytes()
    // counts the 256-byte real file, not the 1 MB behind the symlink and
    // not an infinite loop through the self-link
    assert(live.exists(n => n >= 256 && n < (1 << 20)),
      s"symlinked bytes leaked into the footprint: $live")
    // drop the links before release so the measurement is what was under
    // test, not the deleter's own symlink handling
    java.nio.file.Files.delete(java.nio.file.Paths.get(p, "loop"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(p, "out"))
    TempDirs.releaseSince(snap): Unit
    java.nio.file.Files.delete(outside.resolve("big.bin"))
    java.nio.file.Files.delete(outside)
  }

  test("releaseSince is a no-op for an unchanged registry") {
    val snap = TempDirs.snapshot()
    assert(TempDirs.releaseSince(snap) == 0)
  }
}
