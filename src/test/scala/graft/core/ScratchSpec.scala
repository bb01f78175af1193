package graft.core

import graft.SparkSpec

/** The rebalance contract: spread a scan ONLY when its achievable
  * parallelism — min(scheduled splits, parquet row groups), from footer
  * metadata — is below the session's parallelism AND the table is big
  * enough (`graft.rebalance.minRows`) that single-task compute costs more
  * than the exchange. At real scale (many files × many row groups) it must
  * be the identity, adding no exchange to a big scan.
  */
class ScratchSpec extends SparkSpec {
  import spark.implicits._

  /** One parquet file of `rows` rows of incompressible (hex) text, with
    * `parquet.block.size` chosen so the file holds `rowGroupsTarget` row
    * groups (1 = the pyarrow mid-size-table pathology). Returns (dir,
    * fileSize). Incompressible so the size→split math is codec-stable.
    */
  private def writeFixture(tag: String, rows: Int, oneRowGroup: Boolean): (String, Long) = {
    val dir = TempDirs.scratch(s"rebalance_$tag")
    val df = spark.range(rows).selectExpr(
      "id",
      "concat(md5(string(id)), md5(string(id + 1)), md5(string(id + 2))) AS text")
      .coalesce(1)
    val writer =
      if (oneRowGroup) df.write
      else df.write.option("parquet.block.size", "16384")
    writer.mode("overwrite").parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    (dir, file.length())
  }

  /** Run `body` with openCostInBytes derived from the actual file size so
    * Spark schedules >= defaultParallelism byte-range splits over it —
    * layout-independent (a codec or writer change can't shrink the fixture
    * under the branch being tested).
    */
  private def withHollowSplits[T](fileSize: Long)(body: => T): T = {
    val target = spark.sparkContext.defaultParallelism
    val openCost = math.max(1L, fileSize / (target * 2L))
    val prev = spark.conf.getOption("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.openCostInBytes", openCost.toString)
    try body
    finally prev.fold(spark.conf.unset("spark.sql.files.openCostInBytes"))(
      v => spark.conf.set("spark.sql.files.openCostInBytes", v))
  }

  test("rebalance is the identity when the scan already plans enough " +
       "partitions") {
    val wide = spark.range(1000).repartition(16).toDF("x")
    assert(Scratch.rebalance(wide) eq wide) // same object, no new plan node
  }

  test("stageIfLarge skips the write for a small source and stages a " +
       "large one") {
    val src = spark.range(100).toDF("x")
    val derived = src.selectExpr("x * 2 AS y")
    // default 64 MB gate: a 100-row source stays un-staged (same object)
    assert(Scratch.stageIfLarge(derived, "t", src) eq derived)
    // force the gate to 0: the frame comes back re-opened from parquet
    spark.conf.set("graft.scratch.stageMinBytes", "0")
    try {
      val staged = Scratch.stageIfLarge(derived, "t", src)
      assert(!(staged eq derived))
      assert(staged.as[Long].collect().sorted.sameElements(
        (0L until 100L).map(_ * 2)))
    } finally spark.conf.unset("graft.scratch.stageMinBytes")
  }

  test("rebalance spreads a hollow-split file scan: one row group, many " +
       "scheduled byte-range splits") {
    // the sf10 documents pathology (bench/bm25_phases_sf10_r16.json): one
    // single-row-group file, >= target scheduled splits of which all but
    // one are EMPTY — only the split containing the row group's start
    // carries rows. No size cap applies (round 16's 2 GiB cap left a
    // bigger-file hole); the spread keys on footer row-group count alone.
    val (dir, size) = writeFixture("hollow", rows = 20000, oneRowGroup = true)
    withHollowSplits(size) {
      val scan = spark.read.parquet(dir)
      val target = spark.sparkContext.defaultParallelism
      assert(scan.inputFiles.length < target)
      assert(scan.rdd.getNumPartitions >= target,
        "fixture must schedule >= target splits for the guard branch")
      val out = Scratch.rebalance(scan)
      assert(!(out eq scan))
      assert(out.rdd.getNumPartitions == target)
      // below the row gate the spread is pure loss and the scan is kept
      spark.conf.set("graft.rebalance.minRows", "100000")
      try assert(Scratch.rebalance(scan) eq scan)
      finally spark.conf.unset("graft.rebalance.minRows")
    }
  }

  test("rebalance keeps a few-file scan whose row groups already cover " +
       "the session parallelism") {
    // many row groups in ONE file: every row group's start lands in some
    // split, so >= target splits bear data — round 16's file-count proxy
    // added a redundant exchange here; the footer count must not
    val (dir, size) = writeFixture("manyrg", rows = 20000, oneRowGroup = false)
    withHollowSplits(size) {
      val scan = spark.read.parquet(dir)
      val target = spark.sparkContext.defaultParallelism
      val groups = {
        val f = new java.io.File(dir).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          spark.sessionState.newHadoopConf())
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRowGroups.size finally r.close()
      }
      assert(groups >= target, s"fixture wrote only $groups row groups")
      assert(scan.rdd.getNumPartitions >= target)
      assert(Scratch.rebalance(scan) eq scan)
    }
  }

  test("rebalance keeps a tiny file-backed table single-task: below " +
       "minRows the exchange is pure loss") {
    // round 16 spread every few-file scan under 2 GiB, which cost
    // q_sq_codes 0.22->0.48 s at sf0.1 on a 2,000-row table; the footer
    // row count now keeps these as planned even when scheduled < target
    val (dir, _) = writeFixture("tiny", rows = 500, oneRowGroup = true)
    val scan = spark.read.parquet(dir)
    assert(scan.rdd.getNumPartitions <
      spark.sparkContext.defaultParallelism)
    assert(Scratch.rebalance(scan) eq scan)
  }

  test("rebalance leaves a frame above a shuffle alone: the exchange " +
       "already distributes the compute") {
    val (dir, size) = writeFixture("agg", rows = 20000, oneRowGroup = true)
    // AQE would coalesce the tiny shuffle to 1 partition and route the
    // frame into the scheduled-count rule; pin the shuffle width so the
    // test isolates the footer path's exchange-free check
    val prevCoalesce =
      spark.conf.getOption("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try withHollowSplits(size) {
      val agg = spark.read.parquet(dir)
        .groupBy($"id" % 32 as "g").count()
      // scheduled = shuffle partitions >= target; footer path must not
      // fire on the one-row-group leaf below the aggregate
      assert(agg.rdd.getNumPartitions >=
        spark.sparkContext.defaultParallelism)
      assert(Scratch.rebalance(agg) eq agg)
    } finally prevCoalesce.fold(
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled"))(
      v => spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", v))
  }

  test("rebalance's heavy gate: tokenize-weight callers spread tables " +
       "the vector gate keeps single-task") {
    // 2,000 rows sits between minRowsHeavy (512) and minRows (4096): a
    // shingle/tokenize consumer declares heavy = true and gets the
    // spread; a vector-kernel consumer does not
    val (dir, size) = writeFixture("heavy", rows = 2000, oneRowGroup = true)
    withHollowSplits(size) {
      val scan = spark.read.parquet(dir)
      assert(scan.rdd.getNumPartitions >=
        spark.sparkContext.defaultParallelism)
      assert(Scratch.rebalance(scan) eq scan)
      val out = Scratch.rebalance(scan, heavy = true)
      assert(!(out eq scan))
      assert(out.rdd.getNumPartitions ==
        spark.sparkContext.defaultParallelism)
    }
  }

  test("rebalance spreads a multi-file scan whose per-file row groups " +
       "still undercut the session parallelism") {
    // two one-row-group files: 2 data-bearing splits < target even though
    // the scheduler plans plenty of byte-range splits over them
    val dir = TempDirs.scratch("rebalance_twofiles")
    spark.range(20000).selectExpr(
      "id",
      "concat(md5(string(id)), md5(string(id + 1)), md5(string(id + 2))) AS text")
      .repartition(2).write.mode("overwrite").parquet(dir)
    val size = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    withHollowSplits(size) {
      val scan = spark.read.parquet(dir)
      val target = spark.sparkContext.defaultParallelism
      assert(scan.inputFiles.length == 2)
      assert(scan.rdd.getNumPartitions >= target)
      val out = Scratch.rebalance(scan)
      assert(!(out eq scan))
      assert(out.rdd.getNumPartitions == target)
    }
  }

  test("rebalance spreads a skew-row-group file: many tiny groups in one " +
       "split plus one giant group defeat the min(scheduled, rowGroups) " +
       "bound") {
    // the layout the r18 guard documented as its known optimism: dozens
    // of tiny row groups clustered in the file's FIRST byte-range split
    // followed by one giant group — rowGroups >= target and scheduled >=
    // target, yet only 2 splits contain a row-group midpoint. Built with
    // parquet-mr's row-group append (no writer emits this naturally,
    // which is why the old bound survived 3 rounds).
    import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
    import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
    val (tinyDir, _) = {
      val dir = TempDirs.scratch("rebalance_skew_tiny")
      spark.range(3000).selectExpr(
        "id",
        "concat(md5(string(id)), md5(string(id + 1)), md5(string(id + 2))) AS text")
        .coalesce(1).write.option("parquet.block.size", "4096")
        .mode("overwrite").parquet(dir)
      (dir, ())
    }
    val (giantDir, _) = writeFixture("skew_giant", rows = 40000,
      oneRowGroup = true)
    def partFile(dir: String) = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    val conf = spark.sessionState.newHadoopConf()
    val outDir = TempDirs.scratch("rebalance_skew")
    new java.io.File(outDir).mkdirs()
    val outPath = new org.apache.hadoop.fs.Path(s"$outDir/part-skew.parquet")
    val tinyIn = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(partFile(tinyDir)), conf)
    val (schema, kv) = {
      val r = ParquetFileReader.open(tinyIn)
      try (r.getFooter.getFileMetaData.getSchema,
           r.getFooter.getFileMetaData.getKeyValueMetaData)
      finally r.close()
    }
    val w = new ParquetFileWriter(HadoopOutputFile.fromPath(outPath, conf),
      schema, ParquetFileWriter.Mode.CREATE, 128L << 20, 0)
    w.start()
    w.appendFile(tinyIn)
    w.appendFile(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(partFile(giantDir)), conf))
    w.end(kv)
    val groups = {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(outPath, conf))
      try r.getRowGroups.size finally r.close()
    }
    val size = new java.io.File(outPath.toUri.getPath).length()
    val target = spark.sparkContext.defaultParallelism
    assert(groups >= target, s"fixture wrote only $groups row groups")
    withHollowSplits(size) {
      val scan = spark.read.parquet(outDir)
      assert(scan.rdd.getNumPartitions >= target,
        "fixture must schedule >= target splits")
      // old bound: min(scheduled, rowGroups) >= target -> would keep the
      // scan; the exact data-bearing count sees ~2 non-empty splits
      val out = Scratch.rebalance(scan)
      assert(!(out eq scan),
        "skewed row-group layout must trigger the spread")
      assert(out.rdd.getNumPartitions == target)
    }
  }

  test("rebalance repartitions a compact single-partition source up to " +
       "the session parallelism") {
    val narrow = spark.range(1000).coalesce(1).toDF("x")
    val out = Scratch.rebalance(narrow)
    assert(!(out eq narrow))
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // same rows, only redistributed
    assert(out.as[Long].collect().sorted.sameElements(0L until 1000L))
  }
}
