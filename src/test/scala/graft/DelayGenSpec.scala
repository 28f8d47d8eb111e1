package graft

import graft.functions.DelayGen
import org.apache.spark.sql.functions._

/** F11 — the deterministic normal-delay generator (reference:
  * utils/FlinkUtils.scala:313-323). */
class DelayGenSpec extends GraftSuite {

  private val N = 20000

  private def delays(maxMs: Long, mean: Double, sd: Double, seed: Long = 42L) = {
    import spark.implicits._
    spark.range(N).toDF("id")
      .select(DelayGen.normalDelayMs(col("id"), maxMs, mean, sd, seed).as("d"))
      .as[Long].collect()
  }

  test("every delay lands in [0, max] (the reference's truncation contract)") {
    val ds = delays(maxMs = 1000, mean = 250.0, sd = 500.0) // reference defaults
    assert(ds.forall(d => d >= 0 && d <= 1000))
    // the truncated distribution still uses its range: both tails occupied
    assert(ds.exists(_ < 100))
    assert(ds.exists(_ > 900))
  }

  test("deterministic: same (key, seed) => same delay; new seed => new stream") {
    val a = delays(1000, 250.0, 500.0, seed = 7L)
    val b = delays(1000, 250.0, 500.0, seed = 7L)
    val c = delays(1000, 250.0, 500.0, seed = 8L)
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
  }

  test("loose truncation recovers the requested moments") {
    // max >> mean + 4 sd: truncation bites only the negative tail of a
    // distribution four sigmas above zero — effectively untruncated
    val ds = delays(maxMs = 100000, mean = 1000.0, sd = 200.0)
    val mean = ds.map(_.toDouble).sum / N
    val sd = math.sqrt(ds.map(d => (d - mean) * (d - mean)).sum / N)
    assert(math.abs(mean - 1000.0) < 3 * 200.0 / math.sqrt(N.toDouble) + 1,
      s"sample mean $mean drifted from 1000") // +1 absorbs the floor() bias
    assert(math.abs(sd - 200.0) < 10.0, s"sample sd $sd drifted from 200")
  }

  test("injected delays reorder an in-order stream (the out-of-orderness use)") {
    val delayed = DelayGen.withDelayedTs(
      Tables.events(spark, sf).orderBy(col("ts")),
      tsCol = "ts", keyCol = "event_id",
      maxMs = 3600000L, mean = 900000.0, sd = 1800000.0)
    val arrived = delayed.orderBy(col("ts"))
      .select(unix_millis(col("delayed_ts"))).collect().map(_.getLong(0))
    val inversions = arrived.sliding(2).count(w => w(1) < w(0))
    assert(inversions > 0, "hour-scale delays must reorder second-scale events")
    // and delayed_ts never precedes the event time (delay >= 0)
    val viol = delayed.filter(col("delayed_ts") < col("ts")).count()
    assert(viol === 0)
  }
}
