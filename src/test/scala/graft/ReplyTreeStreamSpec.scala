package graft

import graft.operators.GraphPack
import graft.streaming.{EdgeEvent, ReplyTreeOp}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming reply-tree (Plan A) vs. batch fixpoint (Plan B) equivalence —
  * the reference's BuildReplyTreeProcessFunctionITSuite invariants
  * (recursive descendant resolution, causality, exactly-once emission)
  * under adversarial arrival orders. */
class ReplyTreeStreamSpec extends GraftSuite {

  private lazy val edges: Seq[EdgeEvent] = {
    Tables.events(spark, sf)
      .select(col("event_id"), unix_timestamp(col("ts")).as("tsec"),
        when(col("event_type") === "click",
          col("event_id") - 1 - (regexp_extract(col("props"), "(\\d+)", 1).cast("long") % 4))
          .otherwise(lit(null)).as("parent_id"))
      .collect().map { r =>
        EdgeEvent(r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))
      }.toSeq
  }

  private lazy val batchResolved: Map[Long, (Long, Int, Boolean)] =
    GraphPack.queries("q45_reply_tree_roots")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getBoolean(3)))).toMap

  private def runStreaming(feed: Seq[Seq[EdgeEvent]], name: String): Map[Long, (Long, Int, Boolean)] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[EdgeEvent]
    val q = ReplyTreeOp.resolve(stream.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      feed.foreach { c => stream.addData(c); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getBoolean(3)))).toMap
    } finally q.stop()
  }

  test("streaming resolution equals the batch fixpoint (in-order feed)") {
    val got = runStreaming(edges.grouped(edges.length / 3 + 1).toSeq, "rt_inorder")
    assert(got == batchResolved)
  }

  test("streaming resolution equals the batch fixpoint (reverse order: children before parents)") {
    val got = runStreaming(edges.reverse.grouped(edges.length / 3 + 1).toSeq, "rt_reverse")
    assert(got == batchResolved)
  }

  test("streaming resolution equals the batch fixpoint (seeded shuffle across 5 batches)") {
    val r = new scala.util.Random(99)
    val shuffled = r.shuffle(edges)
    val got = runStreaming(shuffled.grouped(edges.length / 5 + 1).toSeq, "rt_shuffled")
    assert(got == batchResolved)
  }

  test("each event is emitted exactly once across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[EdgeEvent]
    val q = ReplyTreeOp.resolve(stream.toDS()).writeStream
      .format("memory").queryName("rt_once").outputMode("append").start()
    try {
      edges.reverse.grouped(edges.length / 4 + 1)
        .foreach { c => stream.addData(c); q.processAllAvailable() }
      val ids = spark.table("rt_once").select("event_id").collect().map(_.getLong(0))
      assert(ids.length == ids.distinct.length, "duplicate emission")
    } finally q.stop()
  }
}
