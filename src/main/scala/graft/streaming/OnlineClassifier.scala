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
    * visibility rule as the clustering bootstrap). Only the max-version
    * ROW reaches the driver: the store retains one row per trained batch
    * over the job's lifetime, so collecting it whole would make driver
    * memory/startup cost grow without bound. */
  def bootstrap(spark: SparkSession, outDir: String, nx: Int): Option[(Long, Vector[Long])] = {
    val path = new org.apache.hadoop.fs.Path(s"$outDir/weights")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else scala.util.Try {
      val df = spark.read.parquet(path.toString)
      val vRow = df.agg(max(col("version"))).head()
      if (vRow.isNullAt(0)) None
      else {
        val v = vRow.getLong(0)
        val r = df.filter(col("version") === v).head()
        Some((v, Vector.tabulate(nx)(j => r.getAs[Long](s"w$j"))))
      }
    } match {
      case scala.util.Success(m) => m
      case scala.util.Failure(e) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"weight bootstrap from $path failed; starting from zero", e)
        None
    }
  }

  /** Version base bound to the CHECKPOINT's lifetime via a marker file
    * (LabelQualityJob.runBase pattern). A base re-read from the store on
    * every start is NOT replay-safe: foreachBatch is at-least-once, and a
    * same-checkpoint replay would mint a version past the stored max and
    * retrain on weights that already include the batch (double-training).
    * With the marker, a replay recomputes the SAME version — the run()
    * guard then skips it — while a fresh checkpoint against a surviving
    * store mints base = stored max, so training continues monotonically. */
  private def runBase(spark: SparkSession, ckpt: String, store: String): Long = {
    val marker = new org.apache.hadoop.fs.Path(s"$ckpt/graft-classifier-base")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      try in.readLong() finally in.close()
    } else {
      val storeP = new org.apache.hadoop.fs.Path(store)
      val base =
        if (fs.exists(storeP)) {
          val v = spark.read.parquet(store).agg(max(col("version"))).head()
          if (v.isNullAt(0)) -1L else v.getLong(0)
        } else -1L
      fs.mkdirs(marker.getParent)
      val out = fs.create(marker, false)
      try out.writeLong(base) finally out.close()
      base
    }
  }

  /** Start the training query over a streaming feature relation (columns
    * y ∈ {+1,−1} and x0..x{nx-1}, all BIGINT — the
    * [[CurationPack.trainPerceptron]] contract). Seed `latest` from
    * [[bootstrap]] before calling to survive restarts. */
  def run(spark: SparkSession, feats: DataFrame, nx: Int, outDir: String,
          checkpointDir: String, latest: WRef,
          epochsPerBatch: Int = 1): StreamingQuery = {
    // base+1+batchId stays monotonic across restarts in every case (same
    // checkpoint resumes batchId past the base; a fresh one starts past
    // the surviving store's max).
    val base = runBase(spark, checkpointDir, s"$outDir/weights")
    feats.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val version = base + 1L + batchId
        // Replay guard (exactly-once model CONTENT, not just monotonic
        // versions): a same-checkpoint replay recomputes the same version,
        // and the live/bootstrapped ref already holds it — retraining
        // would fold the batch into weights that already include it.
        if (!batch.isEmpty && latest.get().forall(_._1 < version)) {
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
