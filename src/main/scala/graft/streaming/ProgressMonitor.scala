package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
