package graft

import graft.operators.WindowPack
import graft.streaming.{Ev, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** q91's streaming twin: sessions closed by event-time timers must be
  * row-identical to the batch per-session staging. */
class FunnelStreamSpec extends GraftSuite {

  private def eventsTyped = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
  }

  test("closed streaming sessions equal the batch staging, gap-straddling batches included") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val all = eventsTyped
    val stream = MemoryStream[Ev]
    val q = StreamOps.sessionFunnel(
        stream.toDS().withWatermark("ts", "1 second"))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // in-order chunks (session assembly is watermark-bounded; order
      // WITHIN a chunk is irrelevant — the buffer sorts at close)
      all.grouped(all.length / 3 + 1)
        .foreach { c => stream.addData(c); q.processAllAvailable() }
      // two far-future sentinels advance the watermark and fire the timers
      val sentinelTs = new java.sql.Timestamp(all.last.ts.getTime + 30L * 86400 * 1000)
      stream.addData(Ev(999999999L, sentinelTs, -1L, "signup", 0.0))
      q.processAllAvailable()
      stream.addData(Ev(999999998L,
        new java.sql.Timestamp(sentinelTs.getTime + 86400000L), -1L, "signup", 0.0))
      q.processAllAvailable()

      val got = spark.table("funnel_stream")
        .filter(col("user_id") =!= -1L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .sortBy(t => (t._1, t._2))
      val want = WindowPack.funnelSessions(Tables.events(spark, sf))
        .select(col("user_id"), col("sess_start"), col("n_events"),
          when(col("tp").isNotNull, 3).when(col("tc").isNotNull, 2)
            .when(col("tv").isNotNull, 1).otherwise(0).as("stage"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .sortBy(t => (t._1, t._2))
      assert(got.length == want.length,
        s"${got.length} streamed sessions vs ${want.length} batch sessions")
      assert(got.sameElements(want))
      assert(want.exists(_._4 >= 1), "data exercises at least the view stage")
    } finally q.stop()
  }

  test("synthetic full funnel: stage-3 close, then a gap-straddling batch splits sessions") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000L
    def ev(id: Long, ms: Long, et: String) =
      Ev(id, new java.sql.Timestamp(ms), 42L, et, 1.0)
    val stream = MemoryStream[Ev]
    val q = StreamOps.sessionFunnel(
        stream.toDS().withWatermark("ts", "1 second"))
      .writeStream.format("memory").queryName("funnel_synth")
      .outputMode("append").start()
    try {
      // ONE batch carrying a complete funnel AND the first event of the
      // next session (>= 30 min later): the earlier session must close
      // immediately from the data itself, before any timer fires
      stream.addData(Seq(
        ev(1, t0, "view"), ev(2, t0 + 60000, "click"),
        ev(3, t0 + 120000, "purchase"),
        ev(4, t0 + 1800000 + 120000, "click")))
      q.processAllAvailable()
      val afterBatch = spark.table("funnel_synth").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
      assert(afterBatch.toSet ==
        Set((t0 / 1000, 3L, 3)), "gap-straddle closes the full funnel early")
      // sentinels fire the timer on the dangling click-only session
      stream.addData(ev(9, t0 + 40L * 86400000L, "signup")
        .copy(user_id = -1L))
      q.processAllAvailable()
      stream.addData(ev(10, t0 + 41L * 86400000L, "signup")
        .copy(user_id = -1L))
      q.processAllAvailable()
      val fin = spark.table("funnel_synth").filter(col("user_id") === 42L)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      assert(fin == Set((t0 / 1000, 3L, 3),
        ((t0 + 1920000) / 1000, 1L, 0)),
        s"timer-closed session wrong: $fin")
    } finally q.stop()
  }
}
