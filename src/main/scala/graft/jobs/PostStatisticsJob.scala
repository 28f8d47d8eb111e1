package graft.jobs

import graft.sources.KeyedUpsertSink
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's Task 1 as a runnable streaming main (reference:
  * jobs/activeposts/ActivePostStatisticsJob.scala:20-92 — consume the
  * replayed event streams, compute 12 h / 30 min sliding per-key
  * statistics, and continuously upsert them into the result store keyed
  * so that newer statistics never lose to older ones).
  *
  * Spark assembly: scaled replay source (S1/S3) → watermark →
  * [[StreamOps.slidingStats]] (the SAME transform batch query q21's
  * family uses — batch/stream parity by construction) in update mode →
  * per-micro-batch [[KeyedUpsertSink]] merge keyed by (wstart, user_id).
  *
  * Ordering (the reference's W11 concern — it partitions its Kafka topic
  * by post id so ES sees per-post order, ActivePostStatisticsJob.scala
  * :69-80): here `n_events` is the upsert VERSION — it is monotonically
  * non-decreasing per (window, user) as events accumulate, so replayed or
  * reordered micro-batches can never overwrite newer statistics with
  * older ones, and re-running a batch is idempotent (W10).
  *
  * Scale: state is the sliding-window aggregation's (bounded by the
  * watermark); the upsert is one shuffle on the key per micro-batch. In
  * production the sink is a Delta/Iceberg MERGE (KeyedUpsertSink's
  * documented swap point) and the trigger interval amortizes it.
  */
object PostStatisticsJob {

  /** Compose the job over an arbitrary (streaming) events frame —
    * injectable for tests; `main` wires the replay source. */
  def run(spark: SparkSession, events: DataFrame, outDir: String,
          checkpointDir: String, watermark: String = "1 hour"): StreamingQuery =
    StreamOps.slidingStats(events.withWatermark("ts", watermark))
      .writeStream.outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        KeyedUpsertSink.upsert(batch.sparkSession, outDir, batch,
          Seq("wstart", "user_id"), "n_events")
      }
      .start()

  /** The reference's FULL Task-1 chain (ActivePostStatisticsJob.scala:48-66):
    * the comment stream is first resolved to its transitive root post by
    * the reply-tree builder, the resolved events rejoin the root events,
    * and the sliding statistics are computed PER ROOT POST — so a reply
    * deep in a thread counts toward its post's statistics, not its own id.
    *
    * Spark assembly: watermark → derive the edge relation (q45's
    * deterministic parent rule: 'click' events are replies) →
    * [[graft.streaming.ReplyTreeOp.resolveEvicting]] (roots resolve to
    * themselves, replies transitively; dangling replies evict at the
    * watermark like the reference's side-output drop) → the resolved
    * stream carries each event's own payload, so the SAME slidingStats
    * transform runs keyed by `root_id` — two chained stateful operators,
    * exactly the reference's process-function pipeline shape.
    *
    * Scale: the DEFAULT resolver is the scale-out frontier +
    * distributed-archive chain (`ReplyTreeOp.resolveScaleOut` — resolved
    * mapping state hash-partitioned across state partitions; promoted to
    * default in r10 after both-backend soaks showed wall parity and
    * identical final state, SCALE.md "scale-out resolver" rows).
    * `scaleOut = false` selects the reference-faithful single-group
    * resolver — the shape that mirrors the reference's one replicated
    * mapping, useful as a differential-testing fallback; the downstream
    * window agg and upsert shuffle on (window, root) as in [[run]].
    *
    * NOTE (r10 behavior change): the default flipped to `scaleOut = true`,
    * which also changes emission from continuous update-mode upserts to
    * append-on-window-close — a short or bounded stream can emit NOTHING
    * under the default until its windows close at the watermark. Callers
    * that need the old continuous-upsert behavior (e.g. bounded replay
    * tests — RecoverySpec does this) must pass `scaleOut = false`
    * explicitly. */
  def runResolved(spark: SparkSession, events: DataFrame, outDir: String,
                  checkpointDir: String, watermark: String = "1 hour",
                  scaleOut: Boolean = true): StreamingQuery = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val edges = events.withWatermark("ts", watermark)
      .select(col("event_id"), col("ts"),
        when(col("event_type") === "click",
          col("event_id") - 1
            - (regexp_extract(col("props"), "(\\d+)", 1).cast("long") % 4))
          .otherwise(lit(null).cast("long")).as("parent_id"),
        col("user_id"), col("event_type"))
      .as[graft.streaming.EdgeEventT]
    // scaleOut swaps the single-group resolver for the frontier +
    // distributed-archive chain (ReplyTreeOp.resolveScaleOut): same
    // resolved/dropped sets (ScaleOutReplyTreeSpec), resolved-map state
    // hash-partitioned instead of replicated into one group
    val tree =
      if (scaleOut) graft.streaming.ReplyTreeOp.resolveScaleOut(edges)
      else graft.streaming.ReplyTreeOp.resolveEvicting(edges)
    // RE-DECLARE the watermark on the resolver's output: the simulation
    // does not propagate the input watermark through a fMGWS (its output
    // event times are arbitrary), so without this node the downstream
    // aggregation's eviction watermark stays frozen at 0 and its state
    // grows monotonically — unbounded under sustained replay (caught by
    // the SoakBench plateau metric; pinned in StatePlateauSpec). For the
    // single-group resolver the same delay keeps the one-trigger-behind
    // loss window unchanged (a drained child is never behind the previous
    // batch's watermark — it would have been evicted). The scale-out
    // resolver's probe rows, by contrast, fire EXACTLY when the watermark
    // passes them, i.e. at-or-behind it — an equal downstream delay would
    // drop every slow-path row from the statistics, so the stats window
    // gets double the delay (covers any probe lag up to one batch of
    // event-time stride; beyond that is the documented allowed-lateness
    // drop).
    val resolved = tree
      .filter(!col("dropped"))
      .select(col("ts"), col("root_id"), col("event_type"))
      .withWatermark("ts", if (scaleOut) doubled(watermark) else watermark)
    // Spark rejects stateful-after-stateful by default because the upstream
    // operator may emit rows behind the global watermark. Here that is the
    // INTENDED semantics and the loss window is already bounded: the
    // resolver evicts any pending reply the watermark has passed (so a
    // reply can resolve at most one trigger behind the watermark), and the
    // reference accepts exactly the same drop through its own allowed
    // lateness (BuildReplyTreeProcessFunction's watermark eviction +
    // side output). Scope the opt-out to this query's startup
    // (StreamOps.startUnchecked).
    // Output cadence: the single-group chain upserts continuously (update
    // mode). A query holding MULTIPLE flatMapGroupsWithStates must itself
    // run in append mode (planner rule), so the scale-out chain emits each
    // window once, when the watermark closes it — which is the reference's
    // own firing semantics (Flink event-time windows fire on watermark
    // passage); windows still open at end-of-input stay unemitted.
    StreamOps.startUnchecked(spark) {
      StreamOps.slidingStatsBy(resolved, "root_id")
        .writeStream.outputMode(if (scaleOut) "append" else "update")
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          KeyedUpsertSink.upsert(batch.sparkSession, outDir, batch,
            Seq("wstart", "root_id"), "n_events")
        }
        .start()
    }
  }

  /** "N unit" → "2N unit" (e.g. "1 hour" → "2 hour"); non-trivial interval
    * strings pass through unchanged. */
  private[jobs] def doubled(w: String): String = w.trim.split("\\s+", 2) match {
    case Array(n, unit) if n.nonEmpty && n.forall(_.isDigit) =>
      s"${n.toLong * 2} $unit"
    case _ => w
  }

  /** CLI: PostStatisticsJob <sfDir> <outDir> <checkpointDir> [speedup] [runSeconds] [mode]
    * — mode `resolved` runs the full reply-resolved chain on the default
    * scale-out resolver (`resolved-scaleout` is a back-compat alias);
    * `resolved-singlegroup` selects the reference-faithful fallback. */
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, ckpt) = (args(0), args(1), args(2))
    val speedup = args.lift(3).getOrElse("10000")
    val runSec = args.lift(4).map(_.toLong).getOrElse(Long.MaxValue)
    val spark = Jobs.session("post-statistics")
    val events = Jobs.replayEvents(spark, sfDir, speedup)
    val q = args.lift(5) match {
      case Some("resolved") | Some("resolved-scaleout") =>
        runResolved(spark, events, outDir, ckpt)
      case Some("resolved-singlegroup") =>
        runResolved(spark, events, outDir, ckpt, scaleOut = false)
      case _ => run(spark, events, outDir, ckpt)
    }
    Jobs.await(q, runSec)
    q.stop(); spark.stop()
  }
}

/** Shared wiring for the three streaming job mains. */
private[jobs] object Jobs {
  /** Wait `runSec` seconds, or forever when the product would overflow
    * the millisecond clamp (runSeconds omitted = run-forever default). */
  def await(q: StreamingQuery, runSec: Long): Unit =
    if (runSec >= Long.MaxValue / 1000L) q.awaitTermination()
    else q.awaitTermination(runSec * 1000L)

  def session(name: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-$name")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The scaled replay of `<sfDir>/events.parquet` (S1/S3). */
  def replayEvents(spark: SparkSession, sfDir: String, speedup: String): DataFrame =
    spark.readStream.format(classOf[graft.sources.ReplaySource].getName)
      .option("path", sfDir).option("speedup", speedup).load()
}
