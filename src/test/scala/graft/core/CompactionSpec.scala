package graft.core

import graft.SparkSpec

/** The shared staged-swap compaction helper behind the BM25/ANN index
  * compactors: reclustering is row-preserving, shrinks file counts,
  * leaves no staging dir, and refuses unknown keys before touching the
  * live table.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("recluster folds a fragmented table: fewer files, same rows, " +
      "key-clustered layout, no staging dir left") {
    val path = TempDirs.scratch("compaction_spec")
    // 20 one-row appends — the long-running-stream accumulation shape
    (0 until 20).foreach { i =>
      Seq((i.toLong % 4, i.toLong)).toDF("k", "v")
        .write.mode("append").parquet(path)
    }
    val rowsBefore = spark.read.parquet(path)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val (nBefore, nAfter) =
      Compaction.recluster(spark, path, Seq("k"), "graft.test.partBytes")
    assert(nBefore == 20 && nAfter < nBefore,
      s"recluster must shrink files ($nBefore -> $nAfter)")
    assert(spark.read.parquet(path)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString) == rowsBefore,
      "recluster is row-preserving")
    val parent = new java.io.File(path).listFiles().map(_.getName)
    assert(!parent.exists(_.contains("_compacting")),
      s"staging dir must be swapped away, saw ${parent.mkString(", ")}")
    // key-clustered: a pushed k = const filter prunes to a file subset
    val pruned = spark.read.parquet(path).where($"k" === 0L)
    assert(pruned.count() == 5L)
  }

  test("recluster carries hidden metadata dirs (in-table stream " +
      "checkpoints) across the swap") {
    val path = TempDirs.scratch("compaction_spec_hidden")
    (0 until 4).foreach { i =>
      Seq((i.toLong, i.toLong)).toDF("k", "v")
        .write.mode("append").parquet(path)
    }
    val ckpt = new java.io.File(s"$path/_stream_checkpoint/offsets")
    assert(ckpt.mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/_stream_checkpoint/offsets/0"), "v1")
    Compaction.recluster(spark, path, Seq("k"), "graft.test.partBytes"): Unit
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$path/_stream_checkpoint/offsets/0")) == "v1",
      "checkpoint contents must survive compaction")
    assert(spark.read.parquet(path).count() == 4L)
  }

  test("recluster refuses unknown keys without touching the live table") {
    val path = TempDirs.scratch("compaction_spec_badkey")
    Seq((1L, 2L)).toDF("k", "v").write.parquet(path)
    val e = intercept[IllegalArgumentException] {
      Compaction.recluster(spark, path, Seq("nope"), "graft.test.partBytes")
    }
    assert(e.getMessage.contains("nope"))
    assert(spark.read.parquet(path).count() == 1L,
      "failed recluster must leave the live table intact")
  }
}
