package graft

import graft.sources.KeyedUpsertSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** W9 checkpointing/recovery evidence: a streaming job is stopped mid-input
  * and restarted from its checkpoint; the final upsert table must equal the
  * batch recomputation — no loss, no duplicates (the reference's
  * exactly-once contract: FlinkStreamingJob.scala:69-97 checkpoints +
  * idempotent upserts). Also runs the stateful pipeline on the RocksDB
  * state store provider (reference's RocksDB backend, application.conf:106-114).
  */
class RecoverySpec extends GraftSuite {

  test("streaming agg resumes from checkpoint after a stop: result = batch, exactly-once") {
    val base = Files.createTempDirectory("graft_recovery").toString
    val inDir = s"$base/in"; val ckpt = s"$base/ckpt"; val outDir = s"$base/out"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val (h1, h2) = {
      val n = ev.count() / 2
      (ev.filter(col("event_id") < n), ev.filter(col("event_id") >= n))
    }
    h1.write.mode("append").parquet(inDir)

    def startQuery() = {
      val schema = spark.read.parquet(inDir).schema
      spark.readStream.schema(schema).parquet(inDir)
        .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("w.start")).as("wstart"), col("user_id"), col("n"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          KeyedUpsertSink.upsert(spark, outDir, batch, Seq("wstart", "user_id"), "n")
        }.start()
    }

    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop() // "crash" after half the input

    h2.write.mode("append").parquet(inDir)
    val q2 = startQuery() // restart from the same checkpoint
    try q2.processAllAvailable() finally q2.stop()

    val expected = ev
      .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("wstart"), col("user_id"), col("n"))
      .orderBy(col("wstart"), col("user_id")).collect()
    val got = spark.read.parquet(outDir)
      .orderBy(col("wstart"), col("user_id")).collect()
    assert(got.length == expected.length,
      s"got ${got.length}, expected ${expected.length}")
    assert(got.sameElements(expected))
  }

  test("stateful sliding agg runs on the RocksDB state store provider") {
    import spark.implicits._
    import graft.streaming.{Ev, StreamOps}
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val all = Tables.events(spark, sf)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev].collect().toSeq
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
      val q = StreamOps.slidingStats(stream.toDF())
        .writeStream.format("memory").queryName("rocksdb_out")
        .outputMode("complete").start()
      try {
        all.grouped(all.length / 2 + 1).foreach { c => stream.addData(c); q.processAllAvailable() }
        val streamed = spark.table("rocksdb_out").count()
        val batch = graft.operators.WindowPack
          .slidingStats(Tables.events(spark, sf), exactDistinct = false).count()
        assert(streamed == batch)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
