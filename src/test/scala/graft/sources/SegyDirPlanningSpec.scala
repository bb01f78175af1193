package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Directory-table PLANNING contracts (round-13 top ask): resolving a
  * many-member table must do O(1) driver FS round-trips — member header
  * reads fan out (Spark job above the threshold, bounded pool below) and
  * the gathered manifest caches across re-opens keyed by the listing
  * signature, so an unchanged directory re-plans from one `listStatus`.
  */
class SegyDirPlanningSpec extends SparkSpec {

  /** Hand-packed standard rev-1 member: 3600-byte fixed headers (ns=2,
    * format=5/IEEE32) + `n` traces with inline/crossline at the standard
    * offsets — written as raw bytes so fixture creation itself runs no
    * Spark jobs and the spec's job/read accounting stays clean.
    */
  private def writeMember(path: Path, inline0: Int, n: Int): Unit = {
    val ns = 2
    val buf = java.nio.ByteBuffer.allocate(3600 + n * (240 + ns * 4))
    buf.position(3200)                   // text header: zeros (ASCII-decodes)
    val bin = new Array[Byte](400)
    def putShort(off1: Int, v: Int): Unit = { // 1-based offset
      bin(off1 - 1) = ((v >> 8) & 0xff).toByte; bin(off1) = (v & 0xff).toByte
    }
    putShort(17, 2000)                   // sample interval
    putShort(21, ns)                     // samples per trace
    putShort(25, 5)                      // format 5 = IEEE float32
    putShort(301, 0x0100)                // rev 1.0
    buf.put(bin)
    for (i <- 0 until n) {
      val th = new Array[Byte](240)
      def putInt(off1: Int, v: Int): Unit = {
        th(off1 - 1) = (v >>> 24).toByte; th(off1) = ((v >>> 16) & 0xff).toByte
        th(off1 + 1) = ((v >>> 8) & 0xff).toByte; th(off1 + 2) = (v & 0xff).toByte
      }
      putInt(189, inline0 + i)           // inline
      putInt(193, 1000 + i)              // crossline
      buf.put(th)
      buf.putFloat((inline0 + i).toFloat)
      buf.putFloat(-(inline0 + i).toFloat)
    }
    Files.write(path, buf.array())
  }

  private def makeDir(nMembers: Int, tracesEach: Int = 2): String = {
    val dir = Files.createTempDirectory("segyplan")
    for (m <- 0 until nMembers)
      writeMember(dir.resolve(f"shot_$m%04d.sgy"), 100 * (m + 1), tracesEach)
    dir.toString
  }

  /** Force planning only (schema inference resolves memberInfos). */
  private def plan(dir: String): Unit =
    spark.read.format("segy").load(dir).schema

  test("many-member planning is distributed: zero serial driver header " +
      "reads, manifest built once, re-open is a pure cache hit") {
    val dir = makeDir(70) // above the default distribute threshold (64)
    val reads0 = SegyRead.driverHeaderReads.get()
    val builds0 = SegyDirManifest.builds.get()
    val hits0 = SegyDirManifest.hits.get()

    plan(dir)
    assert(SegyRead.driverHeaderReads.get() == reads0,
      "planning must not fall back to one serial driver standardInfo per member")
    assert(SegyDirManifest.builds.get() == builds0 + 1)
    assert(SegyDirManifest.lastBuildMode == "distributed")

    // unchanged directory: re-opens (fresh table instances) hit the cache
    plan(dir); plan(dir)
    assert(SegyDirManifest.builds.get() == builds0 + 1)
    assert(SegyDirManifest.hits.get() >= hits0 + 2)
    assert(SegyRead.driverHeaderReads.get() == reads0)
  }

  test("small directories gather on the bounded driver pool, also cached") {
    val dir = makeDir(4)
    val builds0 = SegyDirManifest.builds.get()
    val reads0 = SegyRead.driverHeaderReads.get()
    plan(dir)
    assert(SegyDirManifest.builds.get() == builds0 + 1)
    assert(SegyDirManifest.lastBuildMode == "pooled")
    assert(SegyRead.driverHeaderReads.get() == reads0)
    val hits0 = SegyDirManifest.hits.get()
    plan(dir)
    assert(SegyDirManifest.hits.get() == hits0 + 1)
  }

  test("a changed member invalidates the signature and rebuilds") {
    val dir = makeDir(5)
    plan(dir)
    val builds0 = SegyDirManifest.builds.get()
    // grow one member by a trace: size (and content) change
    writeMember(Paths.get(dir, "shot_0002.sgy"), 300, 3)
    plan(dir)
    assert(SegyDirManifest.builds.get() == builds0 + 1,
      "a member rewrite must miss the manifest cache and rebuild")
    // the rebuilt plan sees the extra trace
    val cnt = spark.read.format("segy").load(dir)
      .where(col("source_file").endsWith("shot_0002.sgy")).count()
    assert(cnt == 3)
  }

  test("the manifest LRU evicts past the member budget and re-gathers on " +
      "a later re-open (bounded driver memory across many surveys)") {
    // budget of 10 member rows; 4-member directories → at most 2 retained
    spark.conf.set("graft.segy.planning.manifestCacheMembers", "10")
    try {
      val dirs = Seq.fill(3)(makeDir(4))
      val evict0 = SegyDirManifest.evictions.get()
      dirs.foreach(plan)
      assert(SegyDirManifest.evictions.get() > evict0,
        "opening 12 member rows under a 10-row budget must evict")
      assert(dirs.count(SegyDirManifest.cachedDirs.contains) <= 2)
      // the most recent directory always survives, even under the budget
      assert(SegyDirManifest.cachedDirs.contains(dirs.last))
      // the evicted directory re-opens correctly: a fresh build, same plan
      val builds0 = SegyDirManifest.builds.get()
      val evicted = dirs.find(d => !SegyDirManifest.cachedDirs.contains(d)).get
      plan(evicted)
      assert(SegyDirManifest.builds.get() == builds0 + 1)
      assert(spark.read.format("segy").load(evicted).count() == 8)
    } finally spark.conf.unset("graft.segy.planning.manifestCacheMembers")
  }

  test("distributed planning reads values correctly end to end") {
    val dir = makeDir(70)
    val df = spark.read.format("segy").option("fields", "inline,crossline").load(dir)
    assert(df.count() == 140)
    val r = df.where(col("inline") === 700)
      .select(col("crossline"), element_at(col("samples"), 2)).head()
    assert(r.getLong(0) == 1000L && r.getFloat(1) == -700.0f)
    // per-file trace_index restarts at 0
    assert(df.where(col("trace_index") === 0).count() == 70)
  }
}
