package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF computing a MinHash signature by slot-wise minimum merge —
  * the engine's one custom `Aggregator` (SURVEY §2.10: the reference's
  * `MinHasher.combineAll` semantics, jobs/recommendations/
  * RecommendationUtils.scala:40-41, re-derived on [[Hashes]]).
  *
  * Exactly equivalent to the relational form ([[MinHash.signature]]'s
  * 64-min groupBy): same seeded family, same base hash — proven by
  * MinHashAggregatorSpec. The Aggregator form exists for typed
  * `KeyValueGroupedDataset` pipelines and for streaming aggregation where
  * a single merge-able buffer beats 64 separate agg expressions; the
  * relational form stays the oracle-checked default (whole-stage codegen
  * + map-side partial min).
  *
  * Buffer = one Array[Long] of `numHashes` running minima — associative,
  * commutative merge → Spark applies it map-side before the shuffle, so
  * each partition contributes one buffer per key regardless of row count.
  */
final class MinHashAggregator(numHashes: Int, seed: Long)
  extends Aggregator[String, Array[Long], Array[Long]] {

  private val fam = Hashes.family(numHashes, seed)

  /** Same base32 as the expression path: first 8 md5 hex chars as a long. */
  private def base32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4)
    java.lang.Long.parseLong(hex.map(b => f"$b%02x").mkString, 16)
  }

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], item: String): Array[Long] = {
    val x = base32(item)
    var i = 0
    while (i < numHashes) {
      val h = (x * fam(i)._1 + fam(i)._2) % Hashes.P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
