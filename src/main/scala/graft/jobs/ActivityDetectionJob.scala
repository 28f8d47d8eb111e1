package graft.jobs

import graft.functions.KMeans
import graft.sources.KeyedUpsertSink
import graft.streaming.{ClusterIn, ModelRow, StreamOps}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's Task 3 as a runnable streaming main (reference:
  * jobs/clustering/UnusualActivityDetectionJob.scala:34-136 — featurize
  * the event stream, maintain a K-means model over count/time-bounded
  * windows re-parameterized at runtime from a watched control file, and
  * classify each event against the latest model; models and metadata go
  * to their own outputs).
  *
  * Spark assembly — TWO cooperating queries over the replayed input
  * (the SURVEY §7.3 plan; ActivityPipelineSpec pins the composition
  * semantics), exposed separately as [[modelQuery]] / [[classifyQuery]]
  * and composed by [[run]]:
  *
  *  1. MODEL query: featurized points ∪ raw control lines →
  *     [[StreamOps.clusterWindows]] (event-time window, min-count
  *     extension, max-count early fire, fire-time parameters — A6/W4/W8)
  *     → upsert the model stream (with the reference's ClusterMetadata
  *     drift columns folded on, R3) keyed by version + publish the
  *     latest model to the classifier through a [[ModelRef]].
  *  2. CLASSIFY query: the same featurized stream, classified per
  *     micro-batch against the LATEST published model via broadcast
  *     centroid literals in a codegen'd argmin (J14, the q62 plan shape)
  *     → upsert keyed by event_id, versioned by the classifying model.
  *
  * Events arriving before the first model fires are dropped — the
  * reference's inner-join drop semantics (ClassifyEventsFunction
  * .scala:16-47). The two queries RACE on a shared live source exactly
  * like the reference's connected streams do; each classified row
  * records the model version it was scored under.
  *
  * Why two queries, not one: the reference chains its enrichment and
  * window operators inside one Flink job; Spark's planner forbids a
  * second flatMapGroupsWithState downstream of another stateful operator
  * in one query, so the model chain and the classify chain each run as
  * their own query against the shared source — same operators, same
  * state, with the model handed across via the driver (a few hundred
  * doubles; the reference broadcasts its model the same way). The
  * stateful CHAIN itself (per-user enrichment feeding the clustering
  * window) IS expressible in one query on the `transformWithState` API —
  * [[StreamOps.enrichedClusterChain]], parity-pinned in StreamingSpec;
  * only classification, which needs the model OUTSIDE the state group,
  * keeps the second query.
  *
  * Scale: clustering state is one bounded window buffer (≤ maxCount
  * points) in a single state group — the same parallelism-1 choice the
  * reference makes (UnusualActivityDetectionJob.scala:367,376);
  * classification is embarrassingly parallel (centroids are literals in a
  * codegen'd expression — no shuffle, no state).
  */
object ActivityDetectionJob {

  /** Latest published model: (version, model), handed from the model
    * query to the classifier (the reference's broadcast model channel). */
  type ModelRef = java.util.concurrent.atomic.AtomicReference[Option[(Int, KMeans.Model)]]
  def newModelRef: ModelRef =
    new java.util.concurrent.atomic.AtomicReference(None)

  /** Stateless per-event featurization shared by BOTH queries (the model
    * sees exactly the space it will classify): (value, type code, hour of
    * day) — the job's analogue of the reference's feature vector
    * (UnusualActivityDetectionJob.scala:421-450). */
  def featurize(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("ts"), col("user_id"),
      array(
        col("value"),
        when(col("event_type") === "purchase", 2.0)
          .when(col("event_type") === "click", 1.0).otherwise(0.0),
        hour(col("ts")).cast("double")).as("f"))

  /** Distributed nearest-centroid classification against model `m` —
    * centroid literals in a codegen'd argmin, the q62/J14 plan shape. */
  def classifyDf(feats: DataFrame, m: KMeans.Model, version: Int): DataFrame = {
    val dists = m.clusters.map { c =>
      c.centroid.zipWithIndex.map { case (x, i) =>
        val d = element_at(col("f"), i + 1) - x; d * d
      }.reduce(_ + _).as(s"d${c.index}")
    }
    val k = m.clusters.length
    val minCol = least((0 until k).map(i => col(s"d$i")): _*)
    val cluster = (1 until k).foldLeft(when(col("d0") === minCol, lit(0))) {
      (acc, i) => acc.when(col(s"d$i") === minCol, lit(i))
    }
    feats.select(col("event_id") +: col("user_id") +: col("f") +: dists: _*)
      .withColumn("cluster", cluster)
      .select(col("event_id"), col("user_id"), col("cluster"),
        sqrt(minCol).as("dist"), lit(version).as("model_version"))
  }

  private def toModel(m: ModelRow): KMeans.Model =
    KMeans.Model(m.centroids.zipWithIndex.map { case (c, i) =>
      KMeans.Cluster(i, c.toVector, m.weights(i))
    }.toVector)

  /** Recover the latest model from the durable store (`<outDir>/models`).
    * The reference restores its broadcast model from checkpointed state on
    * restart (reference: jobs/clustering/ClassifyEventsFunction.scala:16-47);
    * Spark's foreachBatch hands the model across queries through a
    * driver-side ref that a restart would otherwise reset to None — and
    * every event until the next window fire (up to a full 12 h window)
    * would be silently dropped even though the newest model sits in the
    * store. Seeding the ref from `max(version)` of the store closes that
    * hole; a handful of model rows, driver-side by design. */
  def bootstrapModel(spark: SparkSession, outDir: String): Option[(Int, KMeans.Model)] = {
    import spark.implicits._
    val path = new org.apache.hadoop.fs.Path(s"$outDir/models")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else scala.util.Try {
      spark.read.parquet(path.toString)
        .select("version", "n_points", "centroids", "weights", "labels",
          "avg_shift", "k_diff")
        .as[ModelRow].collect()
        .maxByOption(_.version)
        .map(m => (m.version, toModel(m)))
    } match {
      case scala.util.Success(m) => m
      case scala.util.Failure(e) =>
        // a CORRUPT store must be distinguishable from a cold start: the
        // pre-model drop window this bootstrap exists to close would
        // otherwise silently reopen on every restart
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"model bootstrap from $path failed; starting without a model", e)
        None
    }
  }

  /** The clustering-model query: featurized points ∪ control lines →
    * clusterWindows → model store (`<outDir>/models`, keyed by version,
    * drift metadata included) + publish to `latest`. */
  def modelQuery(spark: SparkSession, events: DataFrame, ctrl: Option[DataFrame],
                 outDir: String, checkpointDir: String, latest: ModelRef,
                 k: Int = 4, decay: Double = 0.2,
                 windowSizeMs: Long = 12 * 3600 * 1000L,
                 minCount: Int = 20, maxCount: Int = 200,
                 watermark: String = "1 hour"): StreamingQuery = {
    import spark.implicits._
    // the watermark node sits on the POINTS branch only: points alone
    // drive the event clock
    val pts = featurize(events)
      .select(col("ts"), col("f").as("point"), lit("").as("ctrl"))
      .withWatermark("ts", watermark)
    // control lines join the keyed stream BELOW the watermark node (S5/W8)
    // with a far-future event time: never dropped by the stateful
    // operator's late-row filter (which evicts anything at-or-behind the
    // watermark — an epoch-0 stamp dies there), never advancing the
    // watermark, and sorting after their discovery batch's points — a
    // parameter applies from the moment its file is picked up, the
    // reference's racing broadcast-channel semantics.
    val in = ctrl.map { c =>
        pts.unionByName(c.select(
          timestamp_seconds(lit(253402300799L)).as("ts"), // 9999-12-31
          array().cast("array<double>").as("point"),
          col("value").as("ctrl")))
      }.getOrElse(pts)
      .as[ClusterIn]

    StreamOps.clusterWindows(in, k, decay, windowSizeMs, minCount, maxCount)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[ModelRow], _: Long) =>
        val rows = batch.collect().sortBy(_.version) // a handful of models
        rows.lastOption.foreach(m => latest.set(Some((m.version, toModel(m)))))
        if (rows.nonEmpty)
          KeyedUpsertSink.upsert(spark, s"$outDir/models",
            spark.createDataset(rows.toIndexedSeq).toDF(), Seq("version"), "version")
      }
      .start()
  }

  /** The classification query: featurized events scored per micro-batch
    * against the latest published model → `<outDir>/classified` (keyed by
    * event_id, versioned by classifying model). */
  def classifyQuery(spark: SparkSession, events: DataFrame, outDir: String,
                    checkpointDir: String, latest: ModelRef): StreamingQuery =
    featurize(events)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        latest.get() match {
          case Some((ver, m)) =>
            KeyedUpsertSink.upsert(batch.sparkSession, s"$outDir/classified",
              classifyDf(batch, m, ver), Seq("event_id"), "model_version")
          case None => () // before the first model: dropped (J14 semantics)
        }
      }
      .start()

  /** The reference's SINGLE-JOB Task-3 chain as an alternative main
    * (reference: UnusualActivityDetectionJob wires per-person feature
    * enrichment into the clustering window inside one Flink job). Spark
    * 4's `transformWithState` makes that chain expressible as ONE
    * streaming query — [[StreamOps.enrichedClusterChain]]: per-user
    * frequency enrichment (stateful, re-declared event time) feeding the
    * global clustering window (stateful) — where the classic
    * `flatMapGroupsWithState` API forces [[run]]'s two-query composition.
    * The model store, bootstrap, and upsert semantics are identical to
    * [[modelQuery]]'s; the chain trains on the ENRICHED feature space
    * (value, log1p(per-user event count)), so classification against this
    * store composes via the same enrichment, not [[featurize]]. Requires
    * the RocksDB state store provider (TWS contract) — set on the session
    * here, as the job mains own their session. */
  def runTws(spark: SparkSession, events: DataFrame, outDir: String,
             checkpointDir: String, k: Int = 4, decay: Double = 0.2,
             windowSizeMs: Long = 12 * 3600 * 1000L,
             minCount: Int = 20, maxCount: Int = 200,
             watermark: String = "1 hour"): StreamingQuery = {
    import spark.implicits._
    // the provider conf is read at query START and frozen into the query's
    // checkpoint; restore the session's previous value afterwards so later
    // queries on the shared session keep their own backend (mirrors
    // runResolved's checkCorrectness handling)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val latest = newModelRef
      bootstrapModel(spark, outDir).foreach(m => latest.set(Some(m)))
      val evs = events
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .withWatermark("ts", watermark)
        .as[graft.streaming.Ev]
      StreamOps.enrichedClusterChain(evs, k, decay, windowSizeMs, minCount, maxCount)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$checkpointDir/model")
        .foreachBatch { (batch: Dataset[ModelRow], _: Long) =>
          val rows = batch.collect().sortBy(_.version) // a handful of models
          rows.lastOption.foreach(m => latest.set(Some((m.version, toModel(m)))))
          if (rows.nonEmpty)
            KeyedUpsertSink.upsert(spark, s"$outDir/models",
              spark.createDataset(rows.toIndexedSeq).toDF(), Seq("version"), "version")
        }
        .start()
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  /** Compose the full job (both queries, racing on the shared source —
    * production semantics). Returns (model query, classify query). */
  def run(spark: SparkSession, events: DataFrame, ctrl: Option[DataFrame],
          outDir: String, checkpointDir: String,
          k: Int = 4, decay: Double = 0.2,
          windowSizeMs: Long = 12 * 3600 * 1000L,
          minCount: Int = 20, maxCount: Int = 200,
          watermark: String = "1 hour"): (StreamingQuery, StreamingQuery) =
    run(spark, events, events, ctrl, outDir, checkpointDir, k, decay,
      windowSizeMs, minCount, maxCount, watermark)

  /** Same composition with the two queries' inputs separately injectable
    * (each chain reads the source through its own scan in production too;
    * tests sequence the two frames for a deterministic interleaving). */
  def run(spark: SparkSession, eventsModel: DataFrame, eventsClassify: DataFrame,
          ctrl: Option[DataFrame], outDir: String, checkpointDir: String,
          k: Int, decay: Double, windowSizeMs: Long,
          minCount: Int, maxCount: Int,
          watermark: String): (StreamingQuery, StreamingQuery) = {
    val latest = newModelRef
    bootstrapModel(spark, outDir).foreach(m => latest.set(Some(m)))
    val modelQ = modelQuery(spark, eventsModel, ctrl, outDir, s"$checkpointDir/model",
      latest, k, decay, windowSizeMs, minCount, maxCount, watermark)
    val classifyQ = classifyQuery(spark, eventsClassify, outDir,
      s"$checkpointDir/classify", latest)
    (modelQ, classifyQ)
  }

  /** CLI: ActivityDetectionJob <sfDir> <outDir> <checkpointDir>
    * [speedup] [runSeconds] [controlDir]. `controlDir` is the watched
    * S5 control-file directory (`k=`/`decay=`/`label:i=` lines). */
  /** CLI: ActivityDetectionJob <sfDir> <outDir> <checkpointDir> [speedup]
    * [runSeconds] [ctrlDir|tws] — pass `tws` as the 6th arg to run the
    * single-query transformWithState chain instead of the two-query
    * composition (mutually exclusive with a control dir). */
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, ckpt) = (args(0), args(1), args(2))
    val speedup = args.lift(3).getOrElse("10000")
    val runSec = args.lift(4).map(_.toLong).getOrElse(Long.MaxValue)
    val mode = args.lift(5)
    val spark = Jobs.session("activity-detection")
    val events = Jobs.replayEvents(spark, sfDir, speedup)
    if (mode.contains("tws")) {
      val q = runTws(spark, events, outDir, ckpt)
      Jobs.await(q, runSec)
      q.stop(); spark.stop()
    } else {
      val ctrl = mode.map(d => spark.readStream.text(d))
      val (modelQ, classifyQ) = run(spark, events, ctrl, outDir, ckpt)
      Jobs.await(modelQ, runSec)
      modelQ.stop(); classifyQ.stop(); spark.stop()
    }
  }
}
