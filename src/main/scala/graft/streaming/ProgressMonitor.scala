package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Progress / lateness observability — the reference's
  * ProgressMonitorFunction (reference: functions/ProgressMonitorFunction
  * .scala:29-178: per-record lateness vs. the newest element seen,
  * counters for late/behind elements, throughput) re-expressed as Spark
  * `observe()` metrics: they ride the existing plan with zero extra
  * passes, surface per-micro-batch in `StreamingQueryProgress
  * .observedMetrics` (streaming) and via `QueryExecutionListener` (batch),
  * and add no shuffle.
  *
  * Divergence note: the reference compares each record to the newest
  * element seen so far (running max in operator state); observe() metrics
  * are single-pass aggregates, so the per-batch event-time SPAN
  * (max - min) is the lateness signal — the same quantity the reference's
  * "behind newest" counter bounds, aggregated per batch instead of per
  * record. Watermark position and input/processed rates come free in
  * `StreamingQueryProgress` next to these.
  */
object ProgressMonitor {

  /** Attach progress counters to an event frame: row count, min/max event
    * time, and event-time span (out-of-orderness bound) of the batch. */
  def observed(events: DataFrame, tsCol: String = "ts",
               name: String = "progress"): DataFrame =
    events.observe(
      name,
      count(lit(1)).as("n_rows"),
      min(unix_timestamp(col(tsCol))).as("min_event_sec"),
      max(unix_timestamp(col(tsCol))).as("max_event_sec"),
      (max(unix_timestamp(col(tsCol))) - min(unix_timestamp(col(tsCol))))
        .as("span_sec"))

  /** Per-batch history entry collected by [[LatenessListener]]:
    * the [[observed]] counters joined with the engine's watermark position
    * — together the per-batch form of the reference's lateness report
    * (ProgressMonitorFunction.scala:119-178: late/behind counters,
    * max-behindness, throughput; watermark + rates ride along in
    * `StreamingQueryProgress`). */
  final case class BatchStats(batchId: Long, nRows: Long,
                              minEventSec: Long, maxEventSec: Long,
                              spanSec: Long, watermarkSec: Long) {
    /** Rows' worst-case lateness bound vs the watermark when the batch was
      * planned: a batch whose min event time is behind the watermark
      * contains late data the windows may already have dropped. */
    def maxBehindWatermarkSec: Long = math.max(0L, watermarkSec - minEventSec)
  }

  /** [[StreamingQueryListener]] that accumulates [[BatchStats]] for ONE
    * named query — the push-based half of W12: `observe()` computes the
    * counters inside the plan (zero extra passes), this listener snapshots
    * them per micro-batch together with the watermark, off the hot path.
    * Register with `spark.streams.addListener`, remove when done (the
    * session is shared). Listener delivery is asynchronous — tests poll
    * [[snapshots]] until the expected row total arrives. */
  final class LatenessListener(queryName: String,
                               metricName: String = "progress")
    extends StreamingQueryListener {
    private val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[BatchStats]()

    def snapshots: Vector[BatchStats] = {
      val it = batches.iterator()
      val b = Vector.newBuilder[BatchStats]
      while (it.hasNext) b += it.next()
      b.result()
    }

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      if (p.name == queryName) {
        Option(p.observedMetrics.get(metricName)).foreach { row =>
          val n = row.getAs[Long]("n_rows")
          if (n > 0) { // empty batches carry null min/max
            val wm = Option(p.eventTime.get("watermark"))
              .map(s => java.time.Instant.parse(s).getEpochSecond).getOrElse(0L)
            batches.add(BatchStats(p.batchId, n,
              row.getAs[Long]("min_event_sec"), row.getAs[Long]("max_event_sec"),
              row.getAs[Long]("span_sec"), wm))
          }
        }
      }
    }
  }
}
