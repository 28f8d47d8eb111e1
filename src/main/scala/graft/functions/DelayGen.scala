package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Normal-random event-delay generator (SURVEY §2.8 F11 — the reference's
  * out-of-orderness injector for simulated streams, reference:
  * utils/FlinkUtils.scala:313-323 `getNormalDelayMillis`: rejection-sample
  * gaussian(mean, sd) until the draw lands in [0, max]).
  *
  * Re-expressed WITHOUT an RNG: each row's delay is a pure function of a
  * key column and a seed — hash-derived uniforms fed through Box–Muller,
  * with the reference's rejection loop unrolled to a fixed attempt list
  * (`transform` over attempt indices, first in-range draw wins). That
  * determinism is the point of the redesign: a Flink RNG-per-operator
  * stream is unreproducible across restarts and parallelism changes,
  * while this generator gives EVERY run — batch oracle, streaming twin,
  * restarted job, different partitioning — the identical delay per event,
  * so out-of-orderness experiments are replayable evidence, not anecdotes.
  *
  * Scale shape: a map-only projection of codegen'd expressions (hash,
  * ln, cos, sqrt) — no UDF, no shuffle, no state; the rejection unroll is
  * K=16 straight-line candidate draws per row. At the reference defaults
  * (mean=max/4, sd=max/2) the accept window is z ∈ [−0.5, 1.5] → accept
  * ≈ 0.62 per draw, so P(all 16 rejected) ≈ 0.38^16 ≈ 2e-7 — and the
  * documented fallback then clamps the FIRST draw into range rather than
  * looping unboundedly (tighter windows should raise `attempts`).
  */
object DelayGen {

  private val M = 1L << 30 // uniform granularity: (h mod M + 0.5) / M ∈ (0,1)

  /** One hash-derived uniform in (0, 1): draw `slot` for `key` under
    * `seed`. The +0.5 centering keeps u strictly inside (0,1) so
    * ln(u) and the Box–Muller transform are always finite. */
  private def unif(key: Column, seed: Long, slot: Column): Column =
    (pmod(xxhash64(key, lit(seed), slot), lit(M)).cast("double") + 0.5) / M

  /** Standard-normal draw `k` (Box–Muller on uniforms 2k, 2k+1). */
  private def gauss(key: Column, seed: Long, k: Column): Column =
    sqrt(lit(-2.0) * log(unif(key, seed, k * 2))) *
      cos(lit(2.0 * math.Pi) * unif(key, seed, k * 2 + 1))

  /** Delay in milliseconds ~ N(mean, sd) truncated to [0, maxMs] — the
    * reference's rejection loop as a deterministic expression. `key`
    * should uniquely identify the row (e.g. the event id); rows with
    * equal keys get equal delays by design. */
  def normalDelayMs(key: Column, maxMs: Long,
                    mean: Double, sd: Double,
                    seed: Long = 42L, attempts: Int = 16): Column = {
    require(maxMs >= 0, s"maxMs must be >= 0, got $maxMs")
    require(sd >= 0, s"sd must be >= 0, got $sd")
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    val draws = transform(sequence(lit(0), lit(attempts - 1)),
      k => floor(gauss(key, seed, k) * sd + mean).cast("long"))
    val inRange = filter(draws, d => d >= 0 && d <= maxMs)
    // fallback (vanishingly rare): clamp the first draw into range
    coalesce(get(inRange, lit(0)),
      least(greatest(get(draws, lit(0)), lit(0L)), lit(maxMs)))
  }

  /** Reference-default parameterization: mean = max/4, sd = max/2
    * (FlinkUtils.scala:316-317 — "not too unrealistic skewed delay
    * distribution, maximum = mean + 1.5 sd"). */
  def normalDelayMs(key: Column, maxMs: Long): Column =
    normalDelayMs(key, maxMs, mean = maxMs / 4.0, sd = maxMs / 2.0)

  /** Adds `delayed_ts` = `tsCol` + per-row delay — the simulated
    * "observed at" time. Feeding a stream ordered by `tsCol` through a
    * sort on nothing (i.e. leaving arrival order = event order) and
    * watermarking on `delayed_ts` reproduces the reference's skewed
    * out-of-order arrival profile at any chosen severity. */
  def withDelayedTs(df: DataFrame, tsCol: String, keyCol: String,
                    maxMs: Long, mean: Double, sd: Double,
                    seed: Long = 42L): DataFrame =
    df.withColumn("delayed_ts",
      timestamp_millis(unix_millis(col(tsCol)) +
        normalDelayMs(col(keyCol), maxMs, mean, sd, seed)))
}
