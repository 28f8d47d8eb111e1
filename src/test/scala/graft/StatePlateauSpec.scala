package graft

import graft.jobs.PostStatisticsJob
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Sustained-load state boundedness of the chained Task-1 main: the
  * reply-resolved chain's aggregation state must be WATERMARK-BOUNDED —
  * evicting closed windows as the replay advances — not monotonically
  * growing. This pins the SoakBench discovery that a fMGWS upstream
  * freezes the propagated watermark (its output event times are
  * arbitrary), so without runResolved's re-declared watermark node the
  * downstream agg never evicts and its state grows without bound over a
  * sustained replay. */
final case class PlateauEv(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                           event_type: String, value: Double, props: String)

class StatePlateauSpec extends GraftSuite {

  test("runResolved: aggregation state evicts and plateaus over a month-long replay") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .collect().map(r => PlateauEv(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getString(5)))
      .sortBy(_.ts.getTime) // in-order arrival: the watermark advances steadily
    val stream = MemoryStream[PlateauEv]
    val out = java.nio.file.Files.createTempDirectory("plateau_o").toString + "/s"
    val ckpt = java.nio.file.Files.createTempDirectory("plateau_c").toString
    val q = PostStatisticsJob.runResolved(spark, stream.toDF(), out, ckpt)
    try {
      rows.grouped(rows.length / 25 + 1).foreach { c =>
        stream.addData(c); q.processAllAvailable()
      }
      val aggRows = q.recentProgress.toSeq
        .flatMap(p => p.stateOperators.find(_.operatorName == "stateStoreSave")
          .map(o => (o.numRowsTotal, o.numRowsRemoved)))
      assert(aggRows.nonEmpty, "no aggregation state samples")
      // eviction is live: closed windows were removed as the month replayed
      assert(aggRows.map(_._2).sum > 0,
        s"no rows ever evicted — state grows without bound: ${aggRows.take(30)}")
      assert(aggRows.map(_._1).sliding(2).exists {
        case Seq(a, b) => b < a
        case _ => false
      }, s"state total never decreased: ${aggRows.map(_._1).take(30)}")
      // bounded: the live window set at the end is far below the total
      // window count ever produced (the store keeps them all; state must not)
      val windowsEver = spark.read.parquet(out).count()
      val finalState = aggRows.last._1
      assert(finalState < windowsEver / 2,
        s"final state $finalState not bounded vs $windowsEver produced windows")
    } finally q.stop()
  }
}
