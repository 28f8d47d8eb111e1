package graft.jobs

import graft.operators.RecommendationPack
import graft.sources.KeyedUpsertSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's Task 2 as a runnable streaming main (reference:
  * jobs/recommendations/RecommendationsJob.scala:23-196 — per-person
  * activity collected in sliding windows; for each ACTIVE person, look up
  * LSH candidates in the precomputed MinHash store, exclude known
  * persons, rank by estimated Jaccard similarity, upsert the top-5).
  *
  * Spark assembly: the static store — the full scored/ranked top-N
  * relation (the chain q53 verifies: features → MinHash → LSH buckets →
  * candidate pairs → exclude known → estimated-similarity top-5) — is
  * built ONCE in batch and cached, playing the role of the reference's
  * ElasticSearch indexes built by LoadStaticDataJob. The streaming side
  * windows the replayed events per user (the reference's activity
  * window, RecommendationsJob.scala:342-356) and, per micro-batch,
  * upserts the cached recommendations of exactly the users active in the
  * fired windows, versioned by window start — the reference's "recompute
  * recommendations for active persons at each window fire".
  *
  * Update mode (not append): the reference emits recommendations at every
  * window fire including early/updated ones; the monotonic wstart version
  * makes re-fires and replays idempotent — a user's recommendations carry
  * the start of their LATEST activity window.
  *
  * Scale: the activity window state is bounded by the watermark; the
  * per-batch join is active-users (small, one row per user per fired
  * window) against the cached ranked store — AQE broadcasts the batch
  * side. At 100 TB the static store is PrepJob's bucketed tables and the
  * ranked relation is persisted, not cached.
  */
object RecommendationsJob {

  /** Compose the job over an arbitrary (streaming) events frame —
    * injectable for tests; `main` wires the replay source. */
  def run(spark: SparkSession, events: DataFrame, sfDir: String, outDir: String,
          checkpointDir: String, watermark: String = "1 hour",
          windowSize: String = "4 hours"): StreamingQuery = {
    // static store: ranked top-N per user (built in batch, read warm)
    val recs = RecommendationPack.queries("q53_recommendations")(spark, sfDir)
      .cache()
    recs.count() // materialize before the stream starts

    val active = events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowSize).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_acts"))
      .select(unix_timestamp(col("w.start")).as("wstart"), col("user_id"))

    active.writeStream.outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val updates = recs.join(batch, "user_id")
        KeyedUpsertSink.upsert(batch.sparkSession, outDir, updates,
          Seq("user_id", "rank"), "wstart")
      }
      .start()
  }

  /** CLI: RecommendationsJob <sfDir> <outDir> <checkpointDir> [speedup] [runSeconds] */
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, ckpt) = (args(0), args(1), args(2))
    val speedup = args.lift(3).getOrElse("10000")
    val runSec = args.lift(4).map(_.toLong).getOrElse(Long.MaxValue)
    val spark = Jobs.session("recommendations")
    val events = Jobs.replayEvents(spark, sfDir, speedup)
    val q = run(spark, events, sfDir, outDir, ckpt)
    Jobs.await(q, runSec)
    q.stop(); spark.stop()
  }
}
