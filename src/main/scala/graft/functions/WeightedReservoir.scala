package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One weighted-sample candidate: the Efraimidis–Spirakis key and the row
  * id it belongs to. */
final case class EsCand(score: Double, id: Long)

/** Bounded-state weighted reservoir (Efraimidis–Spirakis A-Res, 2006):
  * keep the k candidates with the largest keys score = ln(u)/w, u a
  * deterministic hash-uniform in (0,1], w the row's weight — the same
  * scoring construction as batch q82, so with hash-derived u the sample
  * is a pure function of the data (no RNG state, retry/engine-stable).
  *
  * The buffer is the k best candidates, kept sorted (score desc, id asc
  * for ties); `merge` is a bounded sorted-merge, so partial reservoirs
  * from any partitioning or micro-batch arrival order fold to the same
  * final sample — the Mergeable-Summaries property that makes a sampler
  * legal as streaming aggregation state (O(k) per group regardless of
  * stream length). Reference analogue: the reference has no sampler; this
  * extends its windowed-aggregation family (A1/A6) with the standard
  * training-pipeline eval-set sampler. */
final class WeightedReservoir(k: Int)
  extends Aggregator[EsCand, Seq[EsCand], Seq[Long]] {
  require(k >= 1, "k must be >= 1")

  private def best(xs: Seq[EsCand]): Seq[EsCand] =
    xs.sortBy(c => (-c.score, c.id)).take(k)

  override def zero: Seq[EsCand] = Vector.empty

  override def reduce(b: Seq[EsCand], a: EsCand): Seq[EsCand] =
    // cheap reject: a full buffer whose worst key beats `a` is unchanged
    if (b.length == k && {
        val w = b.last
        w.score > a.score || (w.score == a.score && w.id < a.id)
      }) b
    else best(b :+ a)

  override def merge(x: Seq[EsCand], y: Seq[EsCand]): Seq[EsCand] =
    best(x ++ y)

  /** Sample ids, best key first. */
  override def finish(b: Seq[EsCand]): Seq[Long] = b.map(_.id)

  override def bufferEncoder: Encoder[Seq[EsCand]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[EsCand]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
