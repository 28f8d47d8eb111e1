package graft

import graft.streaming.{Ev, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** q138's streaming twin: the retention-cell delta stream must SUM to the
  * batch cohort matrix under any arrival order — including the hard case
  * where late data rewinds a user's first-active week and the whole cohort
  * row has to be retracted and re-keyed. */
class RetentionStreamSpec extends GraftSuite {

  private def eventsTyped = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
  }

  private def week(e: Ev): Long = Math.floorDiv(e.ts.getTime, 604800000L)

  private def expectedCells(evs: Seq[Ev]): Map[(Long, Long), Long] = {
    val weeks = evs.map(e => (e.user_id, week(e))).distinct
    val cohort = weeks.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    weeks.groupBy(t => (cohort(t._1), t._2 - cohort(t._1)))
      .view.mapValues(_.size.toLong).toMap
  }

  test("delta stream sums to the batch matrix; a late first week retracts and re-keys") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val all = eventsTyped
    // engineer a cohort shift: a multi-week user's entire first week is
    // held back to the FINAL micro-batch, so their cohort moves mid-stream
    val byUser = all.groupBy(_.user_id)
    val shifty = byUser.collect {
      case (u, evs) if evs.map(week).distinct.size >= 2 => u
    }.min
    val firstWeek = byUser(shifty).map(week).min
    val (held, early) = all.partition(e =>
      e.user_id == shifty && week(e) == firstWeek)
    assert(held.nonEmpty && early.exists(_.user_id == shifty))

    val stream = MemoryStream[Ev]
    val q = StreamOps.retentionDeltas(stream.toDS())
      .writeStream.format("memory").queryName("ret_deltas")
      .outputMode("append").start()
    try {
      early.grouped(early.length / 2 + 1)
        .foreach { c => stream.addData(c.reverse); q.processAllAvailable() }
      stream.addData(held); q.processAllAvailable()
      val deltas = spark.table("ret_deltas").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(deltas.exists(_._3 == -1L),
        "the held-back first week must force at least one retraction")
      val summed = deltas.groupBy(d => (d._1, d._2))
        .view.mapValues(_.map(_._3).sum).filter(_._2 != 0L).toMap
      assert(summed == expectedCells(all))
    } finally q.stop()
  }

  test("offset horizon bounds state and deltas; within-horizon cells still sum to batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val all = eventsTyped
    // horizon = half the observed max offset, so the cap is actually binding
    val maxOff = expectedCells(all).keys.map(_._2).max
    assume(maxOff >= 2, "need a multi-week span for a binding horizon")
    val h = maxOff / 2
    val stream = MemoryStream[Ev]
    val q = StreamOps.retentionDeltas(stream.toDS(), horizonWeeks = h)
      .writeStream.format("memory").queryName("ret_deltas_h")
      .outputMode("append").start()
    try {
      all.grouped(all.length / 3 + 1)
        .foreach { c => stream.addData(c.reverse); q.processAllAvailable() }
      val deltas = spark.table("ret_deltas_h").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(deltas.forall(_._2 <= h),
        s"no emitted cell may exceed the horizon: ${deltas.filter(_._2 > h).take(3).toSeq}")
      val summed = deltas.groupBy(d => (d._1, d._2))
        .view.mapValues(_.map(_._3).sum).filter(_._2 != 0L).toMap
      val want = expectedCells(all).filter(_._1._2 <= h)
      assert(summed == want,
        "within-horizon cells must equal the horizon-filtered batch matrix")
    } finally q.stop()
  }

  test("retention chain restarts from checkpoint; the post-restart late week still re-keys") {
    // The held-back first week arrives only AFTER a stop/restart: the
    // retraction can be emitted correctly ONLY if the per-user weeks-seen
    // state recovered from the checkpoint — recovery evidence and the
    // re-key path in one scenario. Sink = the keyed upsert store (update
    // mode), so retracted-to-zero cells persist as 0 and are filtered.
    import graft.sources.KeyedUpsertSink
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ret_rec").toString
    val in = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    val all = eventsTyped
    val byUser = all.groupBy(_.user_id)
    val shifty = byUser.collect {
      case (u, evs) if evs.map(week).distinct.size >= 2 => u
    }.min
    val firstWeek = byUser(shifty).map(week).min
    val (held, early) = all.partition(e =>
      e.user_id == shifty && week(e) == firstWeek)

    def runOnce(chunk: Seq[Ev]): Unit = {
      chunk.toDS().write.mode("append").parquet(in)
      val sch = spark.read.parquet(in).schema
      val q = StreamOps.retentionCells(
          spark.readStream.schema(sch).parquet(in).as[Ev])
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          // version = batchId (monotonic across checkpoint restarts) —
          // n_users itself is NOT monotonic once a retraction lowers it
          KeyedUpsertSink.upsert(spark, out, b.withColumn("version", lit(id)),
            Seq("cohort", "offset"), "version")
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(early) // "crash" before the user's true first week exists
    runOnce(held)  // restart: the late week must retract + re-key

    val got = spark.read.parquet(out)
      .filter(col("n_users") =!= 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expectedCells(all))
  }

  test("chained cells fold (fMGWS -> streaming sum) converges to the batch matrix") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val all = eventsTyped
    val stream = MemoryStream[Ev]
    val q = StreamOps.retentionCells(stream.toDS())
      .writeStream.format("memory").queryName("ret_cells")
      .outputMode("complete").start()
    try {
      all.grouped(all.length / 3 + 1)
        .foreach { c => stream.addData(c.reverse); q.processAllAvailable() }
      val got = spark.table("ret_cells").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap.filter(_._2 != 0L)
      assert(got == expectedCells(all))
    } finally q.stop()
  }
}
