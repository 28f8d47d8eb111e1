package graft

import graft.operators.CurationPack
import graft.sources.KeyedUpsertSink
import graft.streaming.{ShardAssign, ShardDoc, ShardFillStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming greedy shard assignment ([[ShardFillStream]]) — the streaming
  * twin of q127's batch greedyFill. Pins batch/stream parity on the real
  * corpus, continuation of the file sequence across micro-batches, and
  * the oversized-doc branch. */
class ShardFillStreamSpec extends GraftSuite {

  private val Cap = 2000L

  /** sf0.001 documents as arrival events: doc_id order, one per minute —
    * arrival order == doc_id order, so the batch op (which sorts by
    * doc_id) must agree exactly. */
  private def shardDocs(n: Int): IndexedSeq[ShardDoc] = {
    import spark.implicits._
    val base = 1700000000000L
    Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars").cast("long"))
      .orderBy(col("doc_id")).limit(n)
      .as[(String, Long, Long)].collect()
      .map { case (src, id, nb) =>
        ShardDoc(src, new java.sql.Timestamp(base + id * 60000L), id, nb) }
      .toIndexedSeq
  }

  private def batchExpected(docs: Seq[ShardDoc]): Map[Long, Long] = {
    import spark.implicits._
    CurationPack.greedyFill(
        docs.map(d => (d.source, d.doc_id, d.n_bytes)).toDS(), Cap)
      .select(col("doc_id"), col("file_idx")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("streamed assignment equals the batch greedyFill on the real corpus") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = shardDocs(300)
    val stream = MemoryStream[ShardDoc]
    val q = ShardFillStream.assign(stream.toDS(), Cap)
      .writeStream.format("memory").queryName("shard_one")
      .outputMode("append").start()
    try {
      stream.addData(docs)
      q.processAllAvailable()
      val got = spark.table("shard_one").as[ShardAssign].collect()
        .map(a => a.doc_id -> a.file_idx).toMap
      assert(got == batchExpected(docs))
    } finally q.stop()
  }

  test("the file sequence continues across micro-batches (state carries fill)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = shardDocs(300)
    val stream = MemoryStream[ShardDoc]
    val q = ShardFillStream.assign(stream.toDS(), Cap)
      .writeStream.format("memory").queryName("shard_split")
      .outputMode("append").start()
    try {
      docs.grouped(docs.length / 5 + 1).foreach { c =>
        stream.addData(c); q.processAllAvailable()
      }
      val got = spark.table("shard_split").as[ShardAssign].collect()
        .map(a => a.doc_id -> a.file_idx).toMap
      // re-batching must not reset any source's open file: identical to
      // the single-batch (and hence the batch-operator) assignment
      assert(got == batchExpected(docs))
      assert(got.values.max > 0, "corpus never overflowed a file")
    } finally q.stop()
  }

  test("restart resumes the file sequence from the checkpointed fill (W9)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_shardfill").toString
    val inDir = s"$base/in"; val ckpt = s"$base/ckpt"; val outDir = s"$base/out"
    val docs = shardDocs(300)
    val half = docs(docs.length / 2).doc_id
    val (h1, h2) = docs.partition(_.doc_id < half)
    h1.toDS().write.mode("append").parquet(inDir)

    def startQuery() = {
      val schema = spark.read.parquet(inDir).schema
      ShardFillStream.assign(
          spark.readStream.schema(schema).parquet(inDir).as[ShardDoc], Cap)
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[ShardAssign], _: Long) =>
          KeyedUpsertSink.upsert(spark, outDir,
            batch.toDF().withColumn("v", col("file_idx")),
            Seq("doc_id"), "v")
        }.start()
    }

    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop() // "crash" mid-corpus
    h2.toDS().write.mode("append").parquet(inDir)
    val q2 = startQuery() // restart from the same checkpoint
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .select(col("doc_id"), col("file_idx")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the restarted half continues each source's file sequence — the whole
    // assignment equals the batch operator over the full corpus, and no
    // source restarted from file 0 mid-sequence
    assert(got == batchExpected(docs))
  }

  test("an oversized doc occupies its own file and the sequence moves on") {
    val t0 = new java.sql.Timestamp(1700000000000L)
    def doc(id: Long, nb: Long) =
      ShardDoc("s", new java.sql.Timestamp(t0.getTime + id), id, nb)
    val rows = Seq(doc(1, 900), doc(2, 5000), doc(3, 900), doc(4, 1000))
    val (st, out) = ShardFillStream.foldGroup(None, rows, Cap)
    assert(out.map(a => a.doc_id -> a.file_idx) ==
      Seq(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
    assert(st.contains(graft.streaming.ShardState(2L, 1900L)))
  }
}
