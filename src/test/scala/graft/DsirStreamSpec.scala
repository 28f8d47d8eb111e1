package graft

import graft.operators.SamplingPack
import graft.streaming.DsirStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** q150's streaming twin: per-doc DSIR scores computed micro-batch by
  * micro-batch under the broadcast bootstrap ratio table must equal the
  * batch scoring pass — including across a mid-stream restart (scoring
  * is stateless per doc, so replay writes byte-identical rows and the
  * doc_id-keyed upsert absorbs them). */
class DsirStreamSpec extends GraftSuite {

  private def docCols = Seq("doc_id", "lang", "source", "text")

  test("streamed per-doc scores equal the batch scoring pass, across a restart") {
    val base = Files.createTempDirectory("graft_dsir").toString
    val in = s"$base/in"; val ckpt = s"$base/ckpt"
    val scoreOut = s"$base/scores"
    val docs = Tables.documents(spark, sf).select(docCols.map(col): _*)
    val all = docs.collect()
    val chunks = all.grouped(all.length / 3 + 1).toSeq
    val ratios = SamplingPack.dsirRatios(spark, sf)

    def runOnce(cs: Seq[Array[org.apache.spark.sql.Row]]): Unit = {
      cs.foreach { c =>
        spark.createDataFrame(
          spark.sparkContext.parallelize(c.toSeq), docs.schema)
          .write.mode("append").parquet(in)
      }
      val sch = spark.read.parquet(in).schema
      val q = DsirStream.run(spark,
        spark.readStream.schema(sch).parquet(in), ratios, scoreOut, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(chunks.take(2)) // "crash" mid-ingest
    runOnce(chunks.drop(2)) // restart from the checkpoint

    val got = spark.read.parquet(scoreOut)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_tokens"), col("w_micro"))
      .orderBy(col("doc_id")).collect()
    val want = SamplingPack.dsirScore(docs, ratios)
      .orderBy(col("doc_id")).collect()
    assert(got.length == want.length,
      s"${got.length} streamed docs vs ${want.length} batch docs")
    assert(got.sameElements(want))
    // and the batch top-K head of the same relation is what q150 reports
    val topBatch = SamplingPack.queries("q150_dsir_selection")(spark, sf)
      .select(col("doc_id"), col("w_micro")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val topStream = spark.read.parquet(scoreOut)
      .orderBy(col("w_micro").desc, col("doc_id"))
      .limit(topBatch.length)
      .select(col("doc_id"), col("w_micro")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(topStream.sameElements(topBatch),
      "the store's top-K must be q150's selection")
  }
}
