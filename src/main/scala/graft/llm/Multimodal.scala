package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus the decode/feature/frame-sample stages a
  * training pipeline runs over them.
  *
  * The real decode (JPEG/PNG/audio codecs) is STUBBED — the container ships
  * no media libraries — behind `fakeDecodeFeatures`, a deterministic
  * hash-derived feature vector. Everything around the stub is real Spark
  * plumbing: binary columns, metadata structs, batch-shaped partition logic,
  * and codegen'd expressions, so swapping in a real codec is a one-function
  * change.
  */
object Multimodal {

  /** Wrap a text column as a binary payload + metadata struct — the schema a
    * real multimodal table would have (payload BLOB + typed sidecar).
    */
  def attachPayload(df: DataFrame, srcCol: String = "text"): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))
      .withColumn("meta", struct(
        octet_length(col(srcCol)).cast("long").as("n_bytes"),
        lit("text/plain").as("mime"),
        sha2(col(srcCol).cast("binary"), 256).as("digest")))

  /** STUB for media decode: a deterministic `dim`-length feature vector
    * derived from the payload digest (md5-60 of "sha256hex:i", scaled to
    * [−1, 1) — engine-agnostic, so the DuckDB oracle replicates the values
    * bit-for-bit). A real implementation would decode the payload bytes
    * (image/audio lib) and emit real features; the schema, partitioning and
    * batch shape are identical.
    */
  def fakeDecodeFeatures(payload: Column, dim: Int): Column = {
    val digest = sha2(payload.cast("binary"), 256)
    transform(sequence(lit(0), lit(dim - 1)), i => {
      val h = conv(substring(md5(concat(digest, lit(":"), i.cast("string"))), 1, 15),
        16, 10).cast("long")
      (h % 1000).cast("double") / 500.0 - 1.0
    })
  }

  /** Feature-extract stage over the payload table. */
  def withFeatures(df: DataFrame, dim: Int = 16): DataFrame =
    df.withColumn("features", fakeDecodeFeatures(col("payload"), dim))

  /** Batched decode over mapPartitions — the Scala analog of a Pandas-UDF
    * `mapInPandas` stage: payloads stream through in batches of `batchSize`
    * so a real codec amortizes its per-batch init (model load, JNI codec
    * handle) across the batch. The decode itself is STUBBED (deterministic
    * bytes→features hash); the schema, partitioning, batch shape and
    * iterator plumbing are exactly what a real decoder plugs into.
    */
  def decodeBatched(df: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val sess = df.sparkSession
    import sess.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // -- a real implementation initializes the codec HERE, once per batch
          batch.iterator.map { case (id, bytes) =>
            (id, stubDecodeJvm(bytes, dim), batch.length)
          }
        }
      }
      .toDF("doc_id", "features", "batch_size")
  }

  /** Resize stage (image-analog): deterministically downsample the payload
    * to `targetBytes` by stride sampling — the plumbing a real bilinear/
    * audio-resample kernel plugs into (same batched mapPartitions shape as
    * [[decodeBatched]]).
    */
  def resizeBatched(df: DataFrame, targetBytes: Int, batchSize: Int = 64): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val sess = df.sparkSession
    import sess.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val resized =
              if (bytes.isEmpty) Array.empty[Byte]
              else Array.tabulate(math.min(targetBytes, bytes.length)) { i =>
                bytes((i.toLong * bytes.length / math.min(targetBytes, bytes.length)).toInt)
              }
            (id, resized, resized.length)
          }
        }
      }
      .toDF("doc_id", "resized", "n_bytes_out")
  }

  /** STUB decoder (JVM side): the same md5-60-derived features as
    * [[fakeDecodeFeatures]], so the batched path is value-identical to the
    * column-expression path (asserted in MultimodalSpec).
    */
  private[llm] def stubDecodeJvm(bytes: Array[Byte], dim: Int): Array[Double] = {
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    val hexDigest = sha.map(b => f"$b%02x").mkString
    Array.tabulate(dim) { i =>
      val h = graft.functions.CrossHash.md5h60(s"$hexDigest:$i".getBytes("UTF-8"))
      (h % 1000).toDouble / 500.0 - 1.0
    }
  }

  // ------------------------------------------------- REAL decode: PPM P6

  /** A decoded PPM (P6) image: dimensions plus exact per-channel means
    * (integer pixel sums, one final IEEE division — deterministic).
    */
  final case class PpmImage(width: Int, height: Int,
                            meanR: Double, meanG: Double, meanB: Double)

  /** REAL image decode for the one raster format that needs no codec
    * library: binary PPM (`P6`) is an ASCII header (`P6`, width, height,
    * maxval, '#' comments allowed) followed by raw RGB bytes — pure byte
    * arithmetic, so this path is NOT a stub. JPEG/PNG/audio stay behind
    * [[fakeDecodeFeatures]] until codecs exist in the runtime; a real
    * pipeline swaps them into the same batched shape below.
    */
  private[llm] def decodePpmJvm(bytes: Array[Byte]): Option[PpmImage] = {
    var i = 0
    def skipWs(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else in = false
      }
    }
    def int(): Option[Int] = {
      skipWs()
      val start = i
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      if (i == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    i = 2
    for {
      w <- int(); h <- int(); maxv <- int()
      if w > 0 && h > 0 && maxv > 0 && maxv < 256 // 1 byte/channel only
      if i < bytes.length // the single whitespace byte after maxval
      _ = { i += 1 }
      if bytes.length - i >= w.toLong * h * 3
    } yield {
      var (sr, sg, sb) = (0L, 0L, 0L)
      val n = w * h
      var p = 0
      while (p < n) {
        val o = i + p * 3
        sr += bytes(o) & 0xff; sg += bytes(o + 1) & 0xff; sb += bytes(o + 2) & 0xff
        p += 1
      }
      PpmImage(w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }
  }

  /** Batched REAL decode over payload rows: PPM payloads parse to
    * dimensions + channel means, anything else yields `ok = false` with
    * null fields (a mixed-format corpus keeps flowing; route non-PPM rows
    * to their codec's stage). Same grouped-iterator shape as
    * [[decodeBatched]] — a real JPEG codec drops into the same loop.
    */
  def decodePpmBatched(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val sess = df.sparkSession
    import sess.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            decodePpmJvm(bytes) match {
              case Some(img) => (id, true, Some(img.width), Some(img.height),
                Some(img.meanR), Some(img.meanG), Some(img.meanB))
              case None => (id, false, None, None, None, None, None)
            }
          }
        }
      }
      .toDF("doc_id", "ok", "width", "height", "mean_r", "mean_g", "mean_b")
  }

  /** Frame sampling for a chunked (video-like) payload: take every `stride`-th
    * fixed-size chunk. Binary slicing via substr — no UDF, no decode.
    */
  def sampleFrames(df: DataFrame, chunkBytes: Int, stride: Int): DataFrame = {
    val nChunks = ceil(octet_length(col("payload")).cast("double") / chunkBytes).cast("int")
    val idxs = filter(sequence(lit(0), greatest(nChunks - 1, lit(0))),
      i => i % stride === 0)
    df.withColumn("frames",
      transform(idxs, i => col("payload").substr((i * chunkBytes + 1).cast("int"), lit(chunkBytes))))
      .withColumn("n_frames", size(col("frames")).cast("long"))
  }
}
