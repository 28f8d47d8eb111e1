package graft

import graft.streaming.{Ev, ScaledReplayOp}
import graft.streaming.ScaledReplayOp.Clock
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S4 — keyed mid-pipeline scaled replay (reference:
  * functions/ScaledReplayFunction.scala:15-66). The fake clock makes the
  * pacing decision deterministic; real time only drives re-invocation
  * (timeout polling), which the assertions wait out with bounded polls. */
class ScaledReplaySpec extends GraftSuite {

  private def ev(id: Long, user: Long, tsMs: Long): Ev =
    Ev(id, new java.sql.Timestamp(tsMs), user, "view", 1.0)

  /** Bounded poll until the sink holds `n` rows. */
  private def awaitCount(table: String, n: Long, timeoutMs: Long = 30000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (spark.table(table).count() < n
      && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(spark.table(table).count() >= n,
      s"sink $table stuck below $n rows after ${timeoutMs}ms")
  }

  test("frozen clock: due events emit, future events hold; advancing the clock releases them in order") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    FrozenClock.t.set(1000000L)
    val stream = MemoryStream[Ev]
    // key 1: events at t=0s, 60s, 120s of event time; speedup 60 → due
    // 1 wall-second apart under a real clock, instantly here via the fake
    val q = ScaledReplayOp.scaledReplay(stream.toDS(), speedup = 60.0,
        clock = new FrozenClockRef, maxPollMs = 25L)
      .writeStream.format("memory").queryName("s4_frozen")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, 1, 0L), ev(2, 1, 60000L), ev(3, 1, 120000L))
      // NOTE: processAllAvailable() is unusable here — with pending
      // timeouts the engine keeps scheduling no-data batches, so "all
      // available" never settles; the bounded sink polls stand in for it.
      awaitCount("s4_frozen", 1)
      Thread.sleep(300) // a few timer polls under the frozen clock
      // anchor = (wall 1000000, event 0); frontier = 0 → only event 1 due
      assert(spark.table("s4_frozen").as[Ev].collect().map(_.event_id).toSeq
        == Seq(1L), "only the anchor-time event may emit under a frozen clock")
      FrozenClock.t.addAndGet(1000L) // frontier → 60 000: event 2 comes due
      awaitCount("s4_frozen", 2)
      assert(spark.table("s4_frozen").as[Ev].collect().map(_.event_id).sorted
        .toSeq == Seq(1L, 2L), "event 3 (due at +2s scaled) must still hold")
      FrozenClock.t.addAndGet(10000L) // frontier far past everything
      awaitCount("s4_frozen", 3)
      val order = spark.table("s4_frozen").as[Ev].collect().map(_.event_id)
      assert(order.toSeq == Seq(1L, 2L, 3L), "per-key emission is event-time-ordered")
    } finally q.stop()
  }

  test("real clock, high speedup: complete, exactly-once, per-key ordered, and not faster than the scaled span") {
    import spark.implicits._
    // 3 keys × 20 events, 1 s apart in event time (span 19 s); speedup 40
    // → scaled span ≈ 475 ms of wall time
    val all = for (u <- 1L to 3L; k <- 0L until 20L)
      yield ev(u * 100 + k, u, k * 1000L)
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = ScaledReplayOp.scaledReplay(stream.toDS(), speedup = 40.0,
        maxPollMs = 25L)
      .writeStream.format("memory").queryName("s4_paced")
      .outputMode("append").start()
    val t0 = System.currentTimeMillis()
    try {
      stream.addData(all) // upstream floods; the operator must re-pace
      awaitCount("s4_paced", all.size.toLong)
      val wall = System.currentTimeMillis() - t0
      val rows = spark.table("s4_paced").as[Ev].collect()
      assert(rows.length == all.size && rows.map(_.event_id).distinct.length
        == all.size, "every event exactly once")
      // arrival order respects per-key event time (memory sink appends in
      // emission order; ids within a key were issued in ts order)
      for (u <- 1L to 3L) {
        val perKey = rows.map(_.event_id).filter(id => id / 100 == u)
        assert(perKey.sameElements(perKey.sorted), s"key $u emitted out of order")
      }
      assert(wall >= 400, s"replay finished in ${wall}ms — faster than the " +
        "scaled span, so events were not actually re-paced")
    } finally q.stop()
  }

  test("pending buffer survives a restart — the reference's own unfixed TODO (ScaledReplayFunction.scala:18)") {
    import spark.implicits._
    FrozenClock.t.set(5000000L)
    val base = Files.createTempDirectory("graft_s4").toString
    val inDir = s"$base/in"; val ckpt = s"$base/ckpt"; val outDir = s"$base/out"
    val events = Seq(ev(1, 7, 0L), ev(2, 7, 30000L), ev(3, 7, 60000L),
      ev(4, 7, 90000L))
    events.toDS().write.mode("append").parquet(inDir)

    val evSchema = spark.read.parquet(inDir).schema
    // every outDir read uses the explicit schema: a poll can catch the dir
    // mid-write (_temporary only, no committed parts), where inference throws
    def outCount(): Long =
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(outDir))) 0L
      else spark.read.schema(evSchema).parquet(outDir).count()
    def outIds(): Array[Long] =
      spark.read.schema(evSchema).parquet(outDir).as[Ev]
        .collect().map(_.event_id)

    def run(): org.apache.spark.sql.streaming.StreamingQuery = {
      val schema = evSchema
      val in = spark.readStream.schema(schema).parquet(inDir).as[Ev]
      ScaledReplayOp.scaledReplay(in, speedup = 60.0,
          clock = new FrozenClockRef, maxPollMs = 25L)
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Ev], _: Long) =>
          // the timer-driven no-data batches are empty; writing them would
          // leave part-less _SUCCESS dirs that break schema inference
          if (!b.isEmpty) b.write.mode("append").parquet(outDir)
        }.start()
    }

    val q1 = run()
    try {
      val d0 = System.currentTimeMillis() + 30000
      while (outCount() < 1 && System.currentTimeMillis() < d0) Thread.sleep(50)
      FrozenClock.t.addAndGet(500L) // frontier 30 000: release event 2
      val deadline = System.currentTimeMillis() + 30000
      while (outCount() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      Thread.sleep(500) // let the emitting batch's checkpoint commit land
    } finally q1.stop() // "crash" with events 3 and 4 still pending

    val mid = outIds().toSet
    assert(mid == Set(1L, 2L), s"pre-restart emissions: $mid")

    FrozenClock.t.addAndGet(10000L) // everything due after the restart
    // a restarted query runs no batch until data arrives (the liveness
    // contract in the scaladoc) — one fresh upstream event models the live
    // upstream this mid-pipeline operator sits in and triggers the batch
    // that fires the RECOVERED groups' expired timeouts
    Seq(ev(99, 999, 0L)).toDS().write.mode("append").parquet(inDir)
    val q2 = run()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (outIds().distinct.length < 5
        && System.currentTimeMillis() < deadline) Thread.sleep(50)
    } finally q2.stop()

    val ids = outIds().filter(_ != 99L)
    assert(ids.toSet == Set(1L, 2L, 3L, 4L),
      "pending events must be recovered from the checkpoint and emitted")
    // the recovered events emit in one clean post-restart batch → exactly
    // once (event 2's pre-"crash" batch is at-least-once by foreachBatch
    // contract; exactly-once end-to-end is the upsert sink's job, W10)
    assert(ids.count(_ == 3L) == 1 && ids.count(_ == 4L) == 1,
      "recovered events may not emit twice")
  }
}

/** Shared mutable time source for the frozen-clock tests (single local
  * JVM: executor threads read the same object). */
object FrozenClock { val t = new java.util.concurrent.atomic.AtomicLong(0L) }
final class FrozenClockRef extends Clock {
  override def nowMs(): Long = FrozenClock.t.get()
}
