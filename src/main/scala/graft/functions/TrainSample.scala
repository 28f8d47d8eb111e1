package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.xxhash64

/** Deterministic bounded sample for driver-side model training.
  *
  * K-means bootstrap (ActivityPack) and the IVF coarse quantizer
  * (SimilarityPack) train driver-side — the reference makes the same
  * parallelism-1 choice (UnusualActivityDetectionJob.scala:367,376) — but
  * a raw `collect()` of the full input dies at corpus scale. This caps the
  * collected set by HASH PRIORITY: order rows by `xxhash64(key)` (key as
  * tiebreak) and keep the first `cap`. Properties that matter for an
  * oracle-checked pipeline:
  *
  *   - deterministic: the sample is a pure function of the key column —
  *     independent of partitioning, row order, and cluster size, so the
  *     trained model (and its data-dependent oracle) is reproducible;
  *   - unbiased: xxhash64 scatters keys uniformly, so hash-priority top-N
  *     is a uniform random sample with a fixed seed;
  *   - scale-safe: orderBy+limit plans as TakeOrderedAndProject —
  *     per-partition heaps of `cap` rows, a single gather of ≤ cap rows,
  *     never a global sort;
  *   - exhaustive below the cap: when |input| ≤ cap the sample IS the
  *     input, so small-SF training is bit-identical to the uncapped form.
  */
object TrainSample {
  /** Default training cap — ~100 k points bounds the driver copy to a few
    * hundred MB at embedding dims that fit one task anyway. */
  val DEFAULT_CAP = 100000

  def apply(df: DataFrame, key: Column, cap: Int = DEFAULT_CAP): DataFrame =
    df.orderBy(xxhash64(key), key).limit(cap)
}
