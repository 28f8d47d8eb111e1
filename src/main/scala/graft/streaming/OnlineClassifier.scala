package graft.streaming

import graft.operators.CurationPack
import graft.sources.KeyedUpsertSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Online continuation of the distributed batch perceptron
  * ([[CurationPack.trainPerceptron]]): each micro-batch runs a few more
  * declarative training epochs seeded with the carried weights, so the
  * model keeps learning as labeled data streams in — the mini-batch SGD
  * shape on the same no-driver-state aggregation plan.
  *
  * Model persistence follows the clustering job's store pattern
  * (jobs/ActivityDetectionJob.modelQuery; reference restores its model
  * from checkpointed state, reference: jobs/clustering/
  * ClassifyEventsFunction.scala:16-47): every batch's weights upsert into
  * `<outDir>/weights` keyed by a version that stays monotonic across
  * restarts (bootstrapped base + batchId), and [[bootstrap]] re-seeds
  * the driver-side ref from `max(version)` after a restart so training
  * CONTINUES instead of silently resetting to zero. The driver-side
  * weight ref holds nx longs — model-sized by design, like the k-means
  * model ref.
  */
object OnlineClassifier {

  /** (version, weights) — the latest trained state. */
  type WRef = java.util.concurrent.atomic.AtomicReference[Option[(Long, Vector[Long])]]
  def newWRef: WRef =
    new java.util.concurrent.atomic.AtomicReference(None)

  /** Recover the newest weights from the durable store (None on a cold
    * start; a corrupt store logs and falls back to cold — the same
    * visibility rule as the clustering bootstrap). */
  def bootstrap(spark: SparkSession, outDir: String, nx: Int): Option[(Long, Vector[Long])] = {
    val path = new org.apache.hadoop.fs.Path(s"$outDir/weights")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else scala.util.Try {
      spark.read.parquet(path.toString).collect()
        .map(r => (r.getAs[Long]("version"),
          Vector.tabulate(nx)(j => r.getAs[Long](s"w$j"))))
        .maxByOption(_._1)
    } match {
      case scala.util.Success(m) => m
      case scala.util.Failure(e) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"weight bootstrap from $path failed; starting from zero", e)
        None
    }
  }

  /** Start the training query over a streaming feature relation (columns
    * y ∈ {+1,−1} and x0..x{nx-1}, all BIGINT — the
    * [[CurationPack.trainPerceptron]] contract). Seed `latest` from
    * [[bootstrap]] before calling to survive restarts. */
  def run(spark: SparkSession, feats: DataFrame, nx: Int, outDir: String,
          checkpointDir: String, latest: WRef,
          epochsPerBatch: Int = 1): StreamingQuery = {
    // Version base captured at start-up: batchId alone restarts at 0 when a
    // query gets a fresh checkpoint, which would upsert OVER run-1 rows.
    // base+1+batchId stays monotonic across restarts in every case (same
    // checkpoint resumes batchId past the base; a fresh one starts past it).
    val base = latest.get().map(_._1).getOrElse(-1L)
    feats.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val prev = latest.get().map(_._2).getOrElse(Vector.fill(nx)(0L))
          val start = s.range(1).select(
            prev.zipWithIndex.map { case (v, j) => lit(v).as(s"w$j") }: _*)
          val row = CurationPack
            .trainPerceptronFrom(batch, start, nx, epochsPerBatch)
            .collect().head // 1 row of nx longs — model-sized by design
          val ws = Vector.tabulate(nx)(j => row.getLong(j))
          val version = base + 1L + batchId
          latest.set(Some((version, ws)))
          val update = s.range(1).select(
            lit(version).as("version") +:
              ws.zipWithIndex.map { case (v, j) => lit(v).as(s"w$j") }: _*)
          KeyedUpsertSink.upsert(s, s"$outDir/weights", update,
            Seq("version"), "version")
        }
      }
      .start()
  }
}
