package graft.streaming

import graft.operators.SamplingPack
import graft.sources.KeyedUpsertSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming DSIR importance scoring — the live form of q150's scoring
  * pass (Xie et al. 2023): documents arriving on the ingest stream are
  * scored against a FIXED target/raw log-likelihood-ratio table trained
  * once from the static reference corpus ([[SamplingPack.dsirRatios]],
  * B buckets, broadcast to every micro-batch).
  *
  * After the bootstrap the operator is a STATELESS map: a doc's score
  * depends only on its own text ([[SamplingPack.dsirScore]] — the exact
  * code the batch query runs), so no keyed state, no watermark, and any
  * re-batching of the same docs yields byte-identical rows. Exactly-once
  * is therefore free: scores land in a doc_id-keyed monotonic-version
  * upsert store (W10/W11's sink contract), and a replayed micro-batch
  * rewrites identical values — DsirStreamSpec restarts mid-stream and
  * asserts the final store equals the batch per-doc scoring.
  *
  * Scale: per batch, one explode→bucket map + a B-row broadcast join +
  * a per-doc partial agg — no corpus-sized state anywhere; the ratio
  * table is B rows at any corpus size (the hashing trick), so the
  * bootstrap broadcast holds at 100 TB. */
object DsirStream {

  /** Start the scorer on a streaming documents frame (doc_id, lang,
    * source, text): per micro-batch, score docs under `ratios` and
    * upsert into `scoreOut` keyed by doc_id. `ratios` is materialized
    * once up front (B rows). */
  def run(spark: SparkSession, docs: DataFrame, ratios: DataFrame,
          scoreOut: String, ckpt: String): StreamingQuery = {
    val lr = ratios.localCheckpoint(true)
    docs.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        KeyedUpsertSink.upsert(spark, scoreOut,
          SamplingPack.dsirScore(b, lr).withColumn("version", lit(id)),
          Seq("doc_id"), "version")
      }.start()
  }
}
