package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming state-store observability (round-13 ask #6): wall time and
  * driver heap say nothing about the metric that actually limits a
  * stream-forever deployment — STATE size. This listener captures each
  * streaming query's `stateOperators` progress metrics (rows held,
  * memory used) so the scale sweep can RECORD the bound the state caps
  * claim, and specs can ASSERT it under a hot-bucket flood.
  *
  * Passive and lossless to attach: progress events are already emitted;
  * registering costs nothing on the hot path.
  */
final class StateMetricsListener extends StreamingQueryListener {

  /** Per-query-run peaks, keyed by runId. */
  final case class StatePeak(numRowsTotal: Long, memoryUsedBytes: Long,
                             updatedRows: Long, batches: Long)

  private val peaks = new ConcurrentHashMap[java.util.UUID, StatePeak]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val ops = e.progress.stateOperators
    if (ops != null && ops.nonEmpty) {
      val rows = ops.map(_.numRowsTotal).sum
      val mem = ops.map(_.memoryUsedBytes).sum
      val upd = ops.map(_.numRowsUpdated).sum
      peaks.merge(e.progress.runId, StatePeak(rows, mem, upd, 1L),
        (a, b) => StatePeak(math.max(a.numRowsTotal, b.numRowsTotal),
          math.max(a.memoryUsedBytes, b.memoryUsedBytes),
          a.updatedRows + b.updatedRows, a.batches + b.batches))
    }
  }

  /** Aggregate peak across every run observed since the last [[drain]]:
    * (max state rows, max state memory bytes). (0, 0) when no stateful
    * stream ran.
    */
  def drain(): (Long, Long) = {
    var rows = 0L
    var mem = 0L
    val it = peaks.values().iterator()
    while (it.hasNext) {
      val p = it.next()
      rows = math.max(rows, p.numRowsTotal)
      mem = math.max(mem, p.memoryUsedBytes)
    }
    peaks.clear()
    (rows, mem)
  }
}

object StateMetrics {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): StateMetricsListener = {
    val l = new StateMetricsListener
    spark.streams.addListener(l)
    l
  }
}
