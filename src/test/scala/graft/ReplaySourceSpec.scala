package graft

import org.apache.spark.sql.functions._

/** The scaled event-time replay source (S1/S3): completeness at extreme
  * speedup, pacing at moderate speedup, and event-time-ordered release. */
class ReplaySourceSpec extends GraftSuite {

  private val fmt = classOf[graft.sources.ReplaySource].getName

  test("extreme speedup drains the full event set, row-identical to the batch read") {
    val q = spark.readStream.format(fmt)
      .option("path", sf).option("speedup", "1e15").load()
      .writeStream.format("memory").queryName("replay_full").start()
    try {
      q.processAllAvailable()
      val got = spark.table("replay_full")
      val src = Tables.events(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      assert(got.count() == src.count())
      assert(got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty,
        "replayed rows diverge from the batch read")
    } finally q.stop()
  }

  test("replayed stream through sliding stats equals the batch computation (reference replay contract)") {
    // the reference's core invariant: a replayed stream fed through the
    // windowed pipeline produces the batch answer (README.md:112's
    // determinism contract) — here: ReplaySource → slidingStats ==
    // batch slidingStats
    val q = graft.streaming.StreamOps.slidingStats(
        spark.readStream.format(fmt)
          .option("path", sf).option("speedup", "1e15").load())
      .writeStream.format("memory").queryName("replay_sliding")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("replay_sliding")
        .orderBy(col("wstart"), col("user_id")).collect()
      val batch = graft.operators.WindowPack.slidingStats(
          Tables.events(spark, sf), exactDistinct = false)
        .orderBy(col("wstart"), col("user_id")).collect()
      assert(streamed.length == batch.length)
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }

  test("moderate speedup paces the release: partial early, complete later, ts-ordered") {
    // choose speedup so the full replay takes ~4s of wall clock
    val bounds = Tables.events(spark, sf)
      .agg(min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts"))))
      .collect()(0)
    val spanSec = (bounds.getLong(1) - bounds.getLong(0)).max(1L)
    val speedup = spanSec / 4.0
    val total = Tables.events(spark, sf).count()
    val q = spark.readStream.format(fmt)
      .option("path", sf).option("speedup", speedup.toString).load()
      .writeStream.format("memory").queryName("replay_paced").start()
    try {
      // sample shortly after start while triggers fire on their own —
      // processAllAvailable would BLOCK until the paced replay fully
      // drains (every trigger finds newly released rows), so poll instead
      Thread.sleep(700)
      val early = spark.table("replay_paced").count()
      assert(early < total,
        s"replay released everything immediately ($early of $total)")
      // the released prefix must be an event-time prefix: its max ts stays
      // below the unreleased suffix's min ts
      if (early > 0) {
        val maxReleased = spark.table("replay_paced")
          .agg(max(unix_timestamp(col("ts")))).collect()(0).getLong(0)
        val frontierRank = Tables.events(spark, sf)
          .filter(unix_timestamp(col("ts")) <= maxReleased).count()
        assert(early <= frontierRank,
          s"released $early rows but only $frontierRank are within the frontier")
      }
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var n = early
      while (n < total && System.nanoTime() < deadline) {
        Thread.sleep(250)
        n = spark.table("replay_paced").count()
      }
      assert(n == total, s"replay stalled at $n of $total")
    } finally q.stop()
  }
}
