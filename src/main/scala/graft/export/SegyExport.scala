package graft.export

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{GlobalOrder, Masking, Projection}

/** The export driver (E1/E3/E5) — the Spark shape of
  * `converters/mdio.py:32-158`:
  * open → rechunk (E1) → header-project (P2) → mask (P4/P5) → bbox (P6) →
  * serialize (E3) → ordered commit (E4).
  *
  * E4's hierarchical part-file tree merge collapses into a range-partitioned
  * global sort + task-ordered committer: Spark's committer renames part
  * files in task order, so a sorted write IS the ordered concat.
  */
object SegyExport {

  /** E1: export rechunk — repartition into ~`targetMb` range partitions on
    * the export order keys (`segy/utilities.py:146-198` targets ~300 MB,
    * fastest-varying axis first).
    */
  def rechunkForExport(df: DataFrame, orderKeys: Seq[String],
                       totalBytes: Long, targetMb: Int = 300): DataFrame = {
    val parts = math.max(1, (totalBytes / (targetMb * 1024L * 1024L)).toInt)
    df.repartitionByRange(parts, orderKeys.map(col): _*)
      .sortWithinPartitions(orderKeys.map(col): _*)
  }

  /** E3: per-trace binary record — headers packed big-endian (4-byte ints in
    * spec order) followed by the serialized sample payload. Pure column
    * expressions over binary concat; a real SEG-Y writer swaps the payload
    * encoding, the plumbing is identical.
    */
  def serializeTraces(df: DataFrame, headerFields: Seq[String],
                      samplesCol: String): DataFrame = {
    // fixed 4-byte big-endian two's complement: the native pack writes the
    // low 32 bits directly (the documented mask semantics of this raw
    // layout), no hex-string round trip
    val headerBytes: Seq[Column] = headerFields.map(f =>
      graft.functions.BeBytesPack(col(f).cast("bigint"), 4, f,
        checked = false))
    val payload = col(samplesCol).cast("binary")
    df.withColumn("trace_record", concat((headerBytes :+ payload): _*))
      .withColumn("record_len", octet_length(col("trace_record")).cast("long"))
  }

  /** E2/E3 for REAL interop: serialize traces with STANDARD 240-byte
    * trace headers — each (field, column) pair packs a 2-/4-byte
    * big-endian signed int at its public rev-1 spec offset, every other
    * byte zero — followed by the sample payload (already encoded; see
    * [[ibmPayload]] for format 1). The inverse of
    * [[graft.sources.SegyRead.readStandardTraces]], pure column
    * expressions throughout.
    */
  def serializeStandardTraces(df: DataFrame,
                              fieldCols: Seq[(graft.sources.SegyRead.HeaderField, String)],
                              samplesCol: String): DataFrame = {
    require(fieldCols.nonEmpty, "need at least one header field")
    val sorted = fieldCols.sortBy(_._1.byteOffset)
    sorted.sliding(2).foreach {
      case Seq((a, _), (b, _)) =>
        require(a.byteOffset + a.bytes <= b.byteOffset,
          s"${a.name} and ${b.name} overlap in the 240-byte header")
      case _ =>
    }
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    var pos = 1 // 1-based next unwritten header byte
    sorted.foreach { case (f, c) =>
      if (f.byteOffset > pos)
        pieces += lit(Array.fill[Byte](f.byteOffset - pos)(0))
      pieces += beBytes(col(c), f.bytes, f.name, f.unsigned)
      pos = f.byteOffset + f.bytes
    }
    if (pos <= 240) pieces += lit(Array.fill[Byte](241 - pos)(0))
    df.withColumn("trace_record",
        concat((pieces :+ col(samplesCol).cast("binary")).toSeq: _*))
      .withColumn("record_len", octet_length(col("trace_record")).cast("long"))
  }

  /** A value packed as a `bytes`-wide big-endian word, failing LOUDLY on
    * overflow: a value outside the field's range would otherwise wrap
    * silently under the width mask (70000 in a 2-byte slot reads back as
    * 4464) — the one writer hazard no downstream check can catch. The
    * accepted range follows the field's declared signedness (mirroring
    * [[graft.sources.SegyRead.HeaderField]]): signed fields get
    * [−2^(8b−1), 2^(8b−1)−1], unsigned counts get [0, 2^(8b)−1] — a union
    * range would let e.g. 40000 pass a signed 2-byte check and read back
    * as −25536.
    */
  private def beBytes(c: Column, bytes: Int, name: String,
                      unsigned: Boolean = false): Column =
    graft.functions.BeBytesPack(c.cast("bigint"), bytes, name,
      unsigned = unsigned, checked = true)

  /** Integer sample payload (SEG-Y formats 2=int32, 3=int16, 8=int8): each
    * sample packed big-endian at its width, overflow-checked — the encode
    * inverse of [[graft.sources.SegyRead.intSamples]].
    */
  def intPayload(samples: Column, nSamples: Int, formatCode: Int): Column = {
    require(formatCode == 2 || formatCode == 3 || formatCode == 8,
      s"intPayload packs formats 2/3/8, got $formatCode (use ibmPayload for 1)")
    val w = graft.sources.SegyRead.bytesPerSample(formatCode)
    graft.functions.BeIntArrayPack(samples.cast("array<int>"), w, nSamples,
      s"format-$formatCode sample", checked = true)
  }

  /** Format-1 sample payload: each float IBM32-encoded by the native
    * [[graft.functions.IbmFloatEncode]] kernel and packed big-endian —
    * `nSamples` is fixed per file, so the concat is a literal-width plan.
    */
  def ibmPayload(samples: Column, nSamples: Int): Column =
    graft.functions.BeIntArrayPack(
      transform(samples, s => graft.functions.IbmFloatEncode(s)),
      4, nSamples, "ibm32 sample", checked = false)

  /** Format-6 sample payload (SEG-Y rev-2 IEEE float64): each double's RAW
    * bits ([[graft.functions.DoubleBits]] — NaN payloads survive) packed as
    * an 8-byte big-endian word. `hex` of a long is already the full 64-bit
    * two's-complement image, so no mask is needed; lpad covers the
    * leading-zero case. Encode inverse of
    * [[graft.sources.SegyRead.ieee64Samples]].
    */
  /** Format-5 sample payload (IEEE float32): each float's RAW bits
    * ([[graft.functions.FloatBits]] — NaN payloads survive) packed
    * big-endian by the array kernel. Encode inverse of
    * [[graft.sources.SegyRead.ieeeSamples]].
    */
  def ieee32Payload(samples: Column, nSamples: Int): Column =
    graft.functions.BeIntArrayPack(
      transform(samples, s => graft.functions.FloatBits(s)),
      4, nSamples, "ieee32 sample", checked = false)

  def ieee64Payload(samples: Column, nSamples: Int): Column =
    concat((1 to nSamples).map { i =>
      graft.functions.BeBytesPack(
        graft.functions.DoubleBits(element_at(samples, i)), 8,
        s"ieee64 sample_$i", checked = false)
    }: _*)

  /** The standard 400-byte binary header a real reader parses: sample
    * interval at bytes 17-18, samples per trace at 21-22, format code at
    * 25-26, revision word at 301-302 — the self-describing geometry
    * [[graft.sources.SegyRead.standardInfo]] reads back.
    */
  def standardBinaryHeader(nSamples: Int, sampleInterval: Int,
                           formatCode: Int,
                           revision: (Int, Int) = (1, 0)): Array[Byte] = {
    graft.sources.SegyRead.bytesPerSample(formatCode) // validates the code
    require(nSamples > 0 && nSamples <= 0xffff, s"nSamples $nSamples not in 1..65535")
    require(sampleInterval >= 0 && sampleInterval <= 0xffff,
      s"sampleInterval $sampleInterval not in 0..65535")
    val b = java.nio.ByteBuffer.allocate(400)
    b.putShort(16, sampleInterval.toShort)
    b.putShort(20, nSamples.toShort)
    b.putShort(24, formatCode.toShort)
    b.putShort(300, SegyHeaders.encodeRevision(revision._1, revision._2).toShort)
    b.array()
  }

  /** S6/E4: write a SEG-Y-shaped file — 3200-byte text header (EBCDIC when
    * the JVM has IBM037, ASCII otherwise), 400-byte binary header, then all
    * trace records in global order.
    *
    * The distributed part: each partition of the (range-sorted) record table
    * writes one numbered part file in parallel; the driver then concatenates
    * parts in partition order — exactly the reference's hierarchical merge
    * collapsed to its final sequential `concat_files` step
    * (`segy/blocked_io.py:214-303`, `segy/creation.py:236-263`).
    */
  def writeSegy(records: DataFrame, outFile: String,
                textHeader: Seq[String], binaryHeader: Array[Byte]): Unit = {
    require(binaryHeader.length == 400, "binary header must be 400 bytes")
    SegyHeaders.validateTextHeader(textHeader)
    val sess = records.sparkSession
    val conf = new org.apache.hadoop.conf.Configuration(
      sess.sparkContext.hadoopConfiguration)
    val outPath = new org.apache.hadoop.fs.Path(outFile)
    val confSer = new org.apache.spark.util.SerializableConfiguration(conf)
    val charset =
      try java.nio.charset.Charset.forName("IBM037")     // EBCDIC, like the reference
      catch { case _: Exception => java.nio.charset.StandardCharsets.US_ASCII }
    val head = textHeader.mkString.getBytes(charset) ++ binaryHeader
    // Both jobs below (per-partition byte counts, then the write) share
    // one RDD so their partitioning is identical; the sort SHUFFLE is
    // reused, but the reduce side — the sort and the per-sample encode
    // kernels (IBM32/IEEE/int packing are the expensive half of an
    // export) — re-executes in the second job. Below the size gate
    // (`graft.segy.cacheRecordsMaxBytes`, default 2 GiB) the serialized
    // records persist to the block manager instead, so the encode runs
    // once; above it the recompute stands (caching a 100 TB export would
    // re-write the whole payload through storage — the §8 anti-pattern).
    val recordsOnly = records.select("trace_record")
    val cacheMax = BigInt(sess.conf.get("graft.segy.cacheRecordsMaxBytes",
      (2L << 30).toString).toLong)
    val cached =
      if (recordsOnly.queryExecution.optimizedPlan.stats.sizeInBytes <= cacheMax)
        Some(recordsOnly.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else None
    val rdd = cached.getOrElse(recordsOnly).rdd
    try {

    val isPosix = outPath.getFileSystem(conf)
      .isInstanceOf[org.apache.hadoop.fs.LocalFileSystem]
    if (isPosix) {
      // POSIX path (local FS; also the shape for Lustre/NFS on a cluster):
      // every partition pwrite()s its slice of the FINAL file concurrently
      // at a precomputed byte offset — the file's bytes are written exactly
      // once, in parallel, with no parts dir and no driver-serial concat.
      // The sf1 scaling study measured the old write-parts-then-copy shape
      // spending 3× the file size in serial driver I/O (~12 s of a 16 s
      // export at 1.5 GB); this shape is bounded by device bandwidth alone.
      // Offsets come from a per-partition byte-count job that reuses the
      // sort shuffle (same lineage ⇒ the expensive sort is not recomputed).
      val sizes = rdd.mapPartitionsWithIndex { case (idx, it) =>
        var n = 0L
        it.foreach(r => n += r.getAs[Array[Byte]]("trace_record").length)
        Iterator.single((idx, n))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = sizes.scanLeft(head.length.toLong)(_ + _)
      val localFile = java.nio.file.Paths.get(outPath.toUri.getPath)
      Option(localFile.getParent)
        .foreach(java.nio.file.Files.createDirectories(_))
      val init = java.nio.channels.FileChannel.open(localFile,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      try init.write(java.nio.ByteBuffer.wrap(head)) finally init.close()
      val localPathStr = localFile.toString
      val offsetsB = sess.sparkContext.broadcast(offsets)
      rdd.mapPartitionsWithIndex { case (idx, it) =>
        val ch = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(localPathStr),
          java.nio.file.StandardOpenOption.WRITE)
        try {
          ch.position(offsetsB.value(idx))
          val os = new java.io.BufferedOutputStream(
            java.nio.channels.Channels.newOutputStream(ch), 1 << 20)
          it.foreach(r => os.write(r.getAs[Array[Byte]]("trace_record")))
          os.flush()
          require(ch.position() == offsetsB.value(idx + 1),
            s"partition $idx wrote ${ch.position() - offsetsB.value(idx)}B, " +
              s"counted ${offsetsB.value(idx + 1) - offsetsB.value(idx)}B")
        } finally ch.close()
        Iterator.single(1)
      }.count()
      offsetsB.destroy()
    } else {
      // object stores / HDFS: no positioned writes — parallel part files,
      // then a streamed driver concat in partition order, exactly the
      // reference's hierarchical merge collapsed to its final sequential
      // `concat_files` step (`segy/blocked_io.py:214-303`,
      // `segy/creation.py:236-263`). (A real S3 deployment would swap the
      // concat for a multipart-upload compose of the same parts.)
      val partsDir = outFile + ".parts"
      val nParts = rdd.mapPartitionsWithIndex { case (idx, it) =>
        val fs = new org.apache.hadoop.fs.Path(partsDir)
          .getFileSystem(confSer.value)
        val part = new org.apache.hadoop.fs.Path(f"$partsDir/part-$idx%05d")
        val os = fs.create(part, true)
        try it.foreach(r => os.write(r.getAs[Array[Byte]]("trace_record")))
        finally os.close()
        Iterator.single(1)
      }.count().toInt
      val fs = outPath.getFileSystem(conf)
      val os = fs.create(outPath, true)
      try {
        os.write(head)
        (0 until nParts).foreach { i =>
          val part = new org.apache.hadoop.fs.Path(f"$partsDir/part-$i%05d")
          if (fs.exists(part)) {
            val in = fs.open(part)
            try {
              val buf = new Array[Byte](1 << 20)
              var n = in.read(buf)
              while (n > 0) { os.write(buf, 0, n); n = in.read(buf) }
            } finally in.close()
          }
        }
      } finally os.close()
      fs.delete(new org.apache.hadoop.fs.Path(partsDir), true)
    }
    } finally { cached.foreach(_.unpersist()): Unit }
  }

  /** E5: the masked-export pipeline. Returns the globally ordered, masked,
    * projected trace table with a contiguous `seq` — what the part-file
    * writer consumes.
    */
  def maskedExport(df: DataFrame, mask: Column, dims: Seq[String],
                   headerFields: Seq[String], orderKeys: Seq[String]): DataFrame = {
    val selected = Masking.maskedSelect(df, mask, dims,
      (headerFields ++ orderKeys).distinct)
    val projected = Projection.projectToSpec(selected,
      (orderKeys ++ headerFields.filterNot(orderKeys.contains)).distinct)
    GlobalOrder.withGlobalSeq(projected, orderKeys)
  }
}
