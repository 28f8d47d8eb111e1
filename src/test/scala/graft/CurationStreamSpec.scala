package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-legality of the curation layer's per-row decisions: the
  * deterministic hash sample (q64/q59's keep predicate) and the
  * repetition metrics (q57's per-doc ratios) are stateless projections,
  * so they run unchanged on a stream and MUST agree with the batch pass
  * row-for-row — the property that lets one curation definition serve
  * both the backfill and the ingest pipeline (the reference's
  * batch/stream determinism contract, README.md:112, applied to
  * curation). */
case class CurationDoc(doc_id: Long, text: String)

class CurationStreamSpec extends GraftSuite {

  test("hash-sample predicate and repetition metrics agree stream vs batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    def curate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val toks = split(col("text"), " ")
      df.select(col("doc_id"),
        (graft.functions.Hashes.base32(col("doc_id").cast("string")) % 100 < 10)
          .as("sampled"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 4)
          .as("distinct_ratio"))
    }

    val docs = (0L until 200L).map(i =>
      CurationDoc(i, Seq.fill((i % 7 + 3).toInt)(s"w${i % 11}").mkString(" ") + " tail"))

    val batch = curate(docs.toDF()).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getDouble(2))).toMap

    val stream = MemoryStream[CurationDoc]
    val q = curate(stream.toDF())
      .writeStream.format("memory").queryName("curation_stream_out")
      .outputMode("append").start()
    try {
      // deliver across several micro-batches — per-row decisions cannot
      // depend on batch boundaries
      docs.grouped(73).foreach { g => stream.addData(g); q.processAllAvailable() }
      val streamed = spark.table("curation_stream_out").collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getDouble(2))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (id, v) =>
        assert(v == batch(id), s"doc $id: stream $v != batch ${batch(id)}")
      }
      assert(batch.values.count(_._1) > 0, "sample predicate never fired")
    } finally q.stop()
  }
}
