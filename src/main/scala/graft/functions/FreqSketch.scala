package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable frequent-items sketch: Misra-Gries with `k` counters
  * (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS'12 — both public algorithms). The bounded-memory,
  * one-pass twin of an exact token-frequency groupBy: alongside HLL
  * (q79, distinct counts) and GK (q80, quantiles) this covers the third
  * classic reaggregatable sketch a 100 TB rollup needs, where exact
  * per-group frequency maps would hold unbounded state.
  *
  * Guarantees (pinned in FreqSketchSpec):
  *  - every item with true count > N/(k+1) is present in the sketch
  *    (no false negatives for heavy hitters);
  *  - each reported estimate undercounts by at most N/(k+1);
  *  - `merge` is a valid mergeable-summary combine: merging per-partition
  *    sketches preserves both bounds over the union stream (the property
  *    that makes it safe as a distributive Spark Aggregator).
  *
  * Buffer = (counter map of ≤ k entries, total items seen). The total
  * rides along so the error bound N/(k+1) is computable from the sketch
  * itself at finish time.
  */
final class FreqSketch(k: Int)
  extends Aggregator[String, FreqSketch.Buf, Map[String, Long]] {
  require(k >= 1, "k must be >= 1")

  import FreqSketch.Buf

  override def zero: Buf = Buf(Map.empty, 0L)

  /** Classic MG step: count if present or space free, else decrement all. */
  override def reduce(b: Buf, item: String): Buf = {
    val m = b.counts
    if (m.contains(item)) Buf(m.updated(item, m(item) + 1L), b.n + 1L)
    else if (m.size < k) Buf(m.updated(item, 1L), b.n + 1L)
    else {
      val dec = m.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      Buf(dec, b.n + 1L)
    }
  }

  /** Mergeable-summaries combine: sum counters, then subtract the
    * (k+1)-largest combined count from all and drop non-positives —
    * restores the ≤ k size bound while adding at most that offset of
    * additional undercount (Agarwal et al. §3.2). */
  override def merge(a: Buf, b: Buf): Buf = {
    val sum = (a.counts.keySet ++ b.counts.keySet).iterator
      .map(t => t -> (a.counts.getOrElse(t, 0L) + b.counts.getOrElse(t, 0L)))
      .toMap
    val out =
      if (sum.size <= k) sum
      else {
        // (k+1)-th largest value; subtracting it leaves ≤ k positives
        val kth = sum.valuesIterator.toArray.sortBy(-_)(Ordering.Long).apply(k)
        sum.view.mapValues(_ - kth).filter(_._2 > 0L).toMap
      }
    Buf(out, a.n + b.n)
  }

  override def finish(b: Buf): Map[String, Long] = b.counts

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object FreqSketch {
  /** MG state: surviving counters + total items observed. */
  case class Buf(counts: Map[String, Long], n: Long)
}
