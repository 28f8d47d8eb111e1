package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE text near-dup configuration — one source of truth for the shingle
  * width, signature size, band layout, and hash seed shared by the batch
  * dedup stack (TextPack q31/q32/q105 and their DuckDB oracles) and the
  * streaming index ([[graft.streaming.DedupStream]]). A document's
  * signature is bit-identical wherever it is computed BECAUSE both sides
  * read these constants and this shingle builder; DedupStreamSpec pins the
  * parity (streaming bandRows signature == TextPack's batch signature). */
object TextLsh {
  val ShingleW: Int = 3    // shingle width (words)
  val NumHashes: Int = 64
  val Bands: Int = 16      // 16 bands x 4 rows: s-curve threshold ~0.5
  val Rows: Int = NumHashes / Bands
  val Seed: Long = 42L

  /** Distinct [[ShingleW]]-token shingles of a PRE-PROJECTED token-array
    * column (empty when too short). `t` must be an attribute, not the
    * `split(...)` expression itself: higher-order functions are
    * CodegenFallback, so any non-attribute the lambda body references is
    * RE-EVALUATED per element — with the split inlined, every shingle
    * re-split the whole document (O(n²·len) per doc; measured ~3× slower
    * on the shingle build at sf0.1). */
  def shinglesOf(t: Column): Column =
    when(size(t) >= ShingleW,
      array_distinct(transform(sequence(lit(1), size(t) - lit(ShingleW - 1)),
        i => concat_ws(" ", slice(t, i, lit(ShingleW))))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB equivalent of [[shinglesOf]] (1-based inclusive slices). */
  val sqlShingles: String =
    s"list_distinct([array_to_string(t[i:i+${ShingleW - 1}], ' ') " +
      s"FOR i IN range(1, len(t) - ${ShingleW - 2})])"
}
