package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.{Ivf, Pq, Similarity, Sq}

/** Streaming ANN index maintenance: an arriving embedding stream appends to
  * the persisted IVF and/or PQ indexes between triggers, so searches see
  * new vectors within one trigger interval without any rebuild.
  *
  * Each micro-batch runs the same batch append operators
  * ([[Ivf.appendToIndex]] / [[Pq.appendToIndex]]) inside the foreachBatch
  * boundary — quantizer and codebooks stay fixed (the add-after-train
  * trade; rebuild out-of-band when recall decays). The foreachBatch
  * boundary is at-least-once on retry and an append retry would duplicate
  * candidate rows. Two guards: [[BatchMarkers]] records applied batchIds
  * per index, so a whole replayed micro-batch (crash between an append's
  * commit and the checkpoint offset commit) is skipped, not re-appended;
  * and `dedupKey` (default: the id column) keeps drop-duplicates state on
  * the row key ahead of the sink — the [[StreamingMdio]] pattern — which
  * absorbs source-level replays. The checkpoint (offsets + dedup state)
  * survives restarts.
  */
object StreamingAnn {

  /** Append an embedding stream to the index(es); at least one of
    * `ivfPath` / `pqPath` / `sqPath` must point at an existing built index.
    *
    * `compactEveryBatches = Some(n)` runs the matching `compactIndex`
    * ([[Ivf.compactIndex]] / [[Pq.compactIndex]] / [[Sq.compactIndex]])
    * on every present index after every n-th committed batch, INSIDE the
    * foreachBatch handler — appends and compactions serialize, satisfying
    * compact's writers-quiesced contract, and a forever-appending stream
    * keeps bounded file counts and live `cell IN (...)` row-group
    * skipping (the [[StreamingRetrieval.appendPostings]] pattern).
    */
  def appendToIndexes(stream: DataFrame,
                      ivfPath: Option[String] = None,
                      pqPath: Option[String] = None,
                      sqPath: Option[String] = None,
                      checkpoint: Option[String] = None,
                      dedupKey: Option[String] = Some("vec_id"),
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      trigger: Trigger = Trigger.AvailableNow(),
                      compactEveryBatches: Option[Int] = None): StreamingQuery = {
    require(ivfPath.isDefined || pqPath.isDefined || sqPath.isDefined,
      "StreamingAnn.appendToIndexes needs at least one index path")
    compactEveryBatches.foreach(n =>
      require(n > 0, s"compactEveryBatches must be positive, got $n"))
    val deduped = dedupKey.fold(stream)(k => stream.dropDuplicates(k))
    val ckpt = checkpoint.getOrElse(
      s"${ivfPath.orElse(pqPath).orElse(sqPath).get}/_stream_checkpoint")
    deduped.writeStream
      .trigger(trigger)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // a foreachBatch frame embeds the live stateful dedup operator;
        // one action per sink would re-execute that plan (and replay its
        // state-store updates) once per index. With multiple sinks,
        // materialize the batch once — persist is safe here because the
        // lifetime is bounded by this handler (every append completes
        // before unpersist), unlike the operator-level lazy frames
        // [[graft.core.Scratch]] exists for.
        val nSinks = Seq(ivfPath, pqPath, sqPath).count(_.isDefined)
        val b = if (nSinks > 1) batch.persist() else batch
        try {
          // each index records applied batchIds independently
          // ([[BatchMarkers]]): a replayed batch (crash between an
          // append's commit and the checkpoint offset commit) skips the
          // indexes it already reached and appends only to the ones it
          // didn't — re-appending would duplicate candidate rows
          val sid = BatchMarkers.streamId(ckpt)
          ivfPath.foreach(p => BatchMarkers.runOnce(batch.sparkSession, p,
            sid, batchId)(Ivf.appendToIndex(b, p, idCol, vecCol)): Unit)
          pqPath.foreach(p => BatchMarkers.runOnce(batch.sparkSession, p,
            sid, batchId)(Pq.appendToIndex(b, p, idCol, vecCol)): Unit)
          sqPath.foreach(p => BatchMarkers.runOnce(batch.sparkSession, p,
            sid, batchId)(Sq.appendToIndex(b, p, idCol, vecCol)): Unit)
        } finally if (nSinks > 1) { b.unpersist(); () }
        compactEveryBatches
          .filter(n => (batchId + 1) % n == 0)
          .foreach { _ =>
            val sess = batch.sparkSession
            ivfPath.foreach(p => Ivf.compactIndex(sess, p): Unit)
            pqPath.foreach(p => Pq.compactIndex(sess, p, idCol): Unit)
            sqPath.foreach(p => Sq.compactIndex(sess, p, idCol): Unit)
          }
      }
      .start()
  }

  /** Append an embedding stream's plane-LSH signatures to a persisted
    * signature table ([[Similarity.lshSignatures]] layout). Unlike the
    * fixed-quantizer IVF/PQ appends, the hyperplanes are a pure function
    * of (table, bits, dim) — bucket assignment never depends on the data
    * the index was built from — so the accumulated table after any append
    * sequence is IDENTICAL to a batch build over the union, and searches
    * stay exactly as good as a full rebuild (no add-after-train decay;
    * the q_stream_ann_lsh oracle row pins this). Same at-least-once
    * `dedupKey` guard as [[appendToIndexes]].
    */
  def appendSignatures(stream: DataFrame, sigPath: String,
                       bits: Int, tables: Int, dim: Int,
                       checkpoint: Option[String] = None,
                       dedupKey: Option[String] = Some("vec_id"),
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       trigger: Trigger = Trigger.AvailableNow(),
                       compactEveryBatches: Option[Int] = None,
                       lean: Boolean = false): StreamingQuery = {
    compactEveryBatches.foreach(n =>
      require(n > 0, s"compactEveryBatches must be positive, got $n"))
    val deduped = dedupKey.fold(stream)(k => stream.dropDuplicates(k))
    val ckpt = checkpoint.getOrElse(s"$sigPath/_stream_checkpoint")
    deduped.writeStream
      .trigger(trigger)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // lean = the vector-free (tbl, bucket, id) layout
        // ([[Similarity.lshSignaturesLean]]); the embeddings table the
        // lean search joins against must receive the same batches.
        // Replayed batchIds skip the append ([[BatchMarkers]] — the
        // markers live inside sigPath; rewriteInPlace carries them
        // across compaction swaps)
        BatchMarkers.runOnce(batch.sparkSession, sigPath,
            BatchMarkers.streamId(ckpt), batchId) {
          (if (lean) Similarity.lshSignaturesLean(batch, bits, tables, dim, idCol, vecCol)
           else Similarity.lshSignatures(batch, bits, tables, dim, idCol, vecCol))
            .write.mode("append").parquet(sigPath)
        }: Unit
        compactEveryBatches
          .filter(n => (batchId + 1) % n == 0)
          .foreach { _ =>
            Similarity.compactSignatures(batch.sparkSession, sigPath): Unit
          }
      }
      .start()
  }
}
