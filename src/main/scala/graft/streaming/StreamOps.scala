package graft.streaming

import graft.functions.KMeans
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Typed event for streaming ops (the reference's unified `Event` shape,
  * model/Events.scala:13, with the testdata column names). */
final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                    event_type: String, value: Double)

/** One enriched purchase (J11 output shape). */
final case class EnrichedPurchase(event_id: Long, user_id: Long, value: Double,
                                  prior_view_value: Double)

/** As-of state: last observed view per user (reference: value state in
  * AggregateFeaturesFunction.scala:38-45). */
final case class AsOfState(viewTs: Long, viewValue: Double)

/** Emitted cluster model row (reference: (ts, count, ClusterModel) emission,
  * KMeansClusterFunction.scala:230-281). */
final case class ModelRow(version: Int, n_points: Int, centroids: Seq[Seq[Double]],
                          weights: Seq[Double])

/** Clustering window state (reference: ListState buffer + previous model,
  * KMeansClusterFunction.scala:112-196). */
final case class ClusterState(buffer: Seq[Seq[Double]], centroids: Seq[Seq[Double]],
                              weights: Seq[Double], version: Int)

/** Structured-Streaming operators. Where the transform is shared with a
  * batch query (sliding stats), batch/stream parity holds by construction:
  * the SAME DataFrame function runs in both modes — Spark's incremental
  * planner is the only difference (SURVEY §2.9).
  */
object StreamOps {

  /** A1 sliding per-key statistics on a (possibly streaming) events frame —
    * the reference's flagship operator. Delegates to the same transform the
    * batch query q21 uses, with the streaming-legal (and 100 TB-scale)
    * approx distinct count. */
  def slidingStats(events: DataFrame): DataFrame =
    graft.operators.WindowPack.slidingStats(events, exactDistinct = false)

  /** Windowed distinct-user counts as DataSketches HLL — q79's streaming
    * twin. Sketch state is fixed-size per (window, type) group regardless
    * of cardinality (vs collect_set's linear state), and the stored
    * register state is a max-merge, so partial sketches from any partition
    * or micro-batch order converge to the same state — the property that
    * makes the estimate reaggregatable across a 1000-executor topology. */
  def sketchDistinct(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "4 hours"), col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("est_users"))
      .select(unix_timestamp(col("window.start")).as("wstart"),
        col("event_type"), col("est_users"))

  /** Windowed frequent-items census as a Misra-Gries sketch — q86's
    * streaming twin (the third sketch beside the HLL above and q80's GK).
    * State per window is O(k) counters regardless of key cardinality, and
    * the Aggregator's merge is the Mergeable-Summaries combine, so
    * micro-batch partials fold into the running state with the same
    * heavy-hitter-completeness / N/(k+1)-undercount bounds as one pass
    * (FreqSketchSpec pins the bounds; StreamingSpec pins them END-TO-END
    * through micro-batched arrival). Candidate SETS are arrival-order
    * sensitive — bounds, not byte-parity, are the stream/batch contract. */
  def freqSketch(events: DataFrame, k: Int = 8): DataFrame = {
    val mg = org.apache.spark.sql.functions.udaf(
      new graft.functions.FreqSketch(k))
    events
      .groupBy(window(col("ts"), "4 hours"))
      .agg(mg(col("event_type")).as("sk"), count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("wstart"),
        col("n"), map_keys(col("sk")).as("candidates"))
  }

  /** Session funnel under Structured Streaming — q91's streaming twin.
    * One session_window aggregation collects the stage events; the
    * ordered view→click→purchase minima are then per-row array folds
    * (filter/transform/array_min) over the session's own events, so the
    * funnel ordering logic runs AFTER the stateful agg on finalized (or
    * complete-mode current) sessions — state is exactly session_window's,
    * nothing custom. Per-session flags; batch and stream share this
    * transform, and StreamingSpec reconciles its totals with q91's
    * lag-gap cohort counts. */
  def funnelSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        sort_array(collect_list(when(col("event_type").isin("click", "purchase"),
          struct(col("ts").as("ets"), col("event_type").as("ety"))))).as("evs"))
      .withColumn("t_click", array_min(expr(
        "transform(filter(evs, e -> e.ety = 'click' AND t_view IS NOT NULL" +
          " AND e.ets >= t_view), e -> e.ets)")))
      .withColumn("t_purchase", array_min(expr(
        "transform(filter(evs, e -> e.ety = 'purchase' AND t_click IS NOT NULL" +
          " AND e.ets >= t_click), e -> e.ets)")))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("sess_start"),
        col("n_events"), col("t_view").isNotNull.as("reached_view"),
        col("t_click").isNotNull.as("reached_click"),
        col("t_purchase").isNotNull.as("reached_purchase"))

  /** Streaming exact dedup by content fingerprint within the watermark
    * horizon — streaming ingest dedup for a training-data pipeline; state
    * is bounded by the watermark (expired keys are dropped). */
  def dedup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("user_id", "event_type", "value")

  /** J11 as-of enrichment: append to each purchase the value of the user's
    * most recent prior view, 0.0 if none or staler than `maxAgeSec`
    * (reference: AggregateFeaturesFunction.scala:22-66 — last-value state
    * with staleness cutoff; like the reference, semantics are
    * arrival-order-dependent across micro-batches: state is updated as
    * events arrive; within a batch we sort by (ts, event_id)).
    */
  def asOfEnrich(events: Dataset[Ev], maxAgeSec: Long = 21600L): Dataset[EnrichedPurchase] = {
    implicit val stateEnc = Encoders.product[AsOfState]
    implicit val outEnc = Encoders.product[EnrichedPurchase]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[Ev], state: GroupState[AsOfState]) => {
          var last = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[EnrichedPurchase]
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            e.event_type match {
              case "view" =>
                last = Some(AsOfState(e.ts.getTime, e.value))
              case "purchase" =>
                val prior = last match {
                  case Some(AsOfState(vts, vv))
                    if e.ts.getTime - vts <= maxAgeSec * 1000 => vv
                  case _ => 0.0
                }
                out += EnrichedPurchase(e.event_id, user, e.value, prior)
              case _ => ()
            }
          }
          last.foreach(state.update)
          out.iterator
        })
  }

  /** [[asOfEnrich]] with event-time state eviction (W6/W7): a user's
    * last-view state carries an event-time timer at viewTs + maxAge — once
    * the watermark passes it the state is dropped (reference: state TTL +
    * event-time timers, FlinkUtils.scala:80-87, AggregateFeaturesFunction
    * .scala:57-65). Because the staleness cutoff already ignores views
    * older than maxAge, eviction changes NO output — it bounds state: the
    * store holds only users with a view inside the watermark horizon
    * (asserted on numRowsTotal in StreamingSpec).
    * Input must carry a watermark on `ts`.
    */
  def asOfEnrichTtl(events: Dataset[Ev], maxAgeSec: Long = 21600L): Dataset[EnrichedPurchase] = {
    implicit val stateEnc = Encoders.product[AsOfState]
    implicit val outEnc = Encoders.product[EnrichedPurchase]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[Ev], state: GroupState[AsOfState]) => {
          if (state.hasTimedOut) {
            state.remove() // watermark passed viewTs + maxAge: evict
            Iterator.empty
          } else {
            var last = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[EnrichedPurchase]
            it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              e.event_type match {
                case "view" =>
                  last = Some(AsOfState(e.ts.getTime, e.value))
                case "purchase" =>
                  val prior = last match {
                    case Some(AsOfState(vts, vv))
                      if e.ts.getTime - vts <= maxAgeSec * 1000 => vv
                    case _ => 0.0
                  }
                  out += EnrichedPurchase(e.event_id, user, e.value, prior)
                case _ => ()
              }
            }
            last.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.viewTs + maxAgeSec * 1000)
            }
            out.iterator
          }
        })
  }

  /** [[asOfEnrich]] on Spark 4's `transformWithState` API — the modern
    * stateful-processor form (arbitrary state via the handle, declarative
    * per-state TTL, RocksDB-backed). Semantics identical to
    * [[asOfEnrich]] (asserted in StreamingSpec); state is one
    * [[AsOfState]] value per user (fixed-size last-value state — it never
    * grows per key, so no TTL is configured; the API's declarative
    * `TTLConfig` is the knob a deployment whose KEY SPACE grows unboundedly
    * would turn on, at the cost of per-batch TTL-index maintenance in every
    * RocksDB commit — measured pathological on this workload's many tiny
    * micro-batches, and output-neutral anyway since the staleness cutoff
    * already ignores old views).
    * Requires the RocksDB state store provider (Spark's TWS contract).
    */
  class AsOfProcessor(maxAgeSec: Long)
    extends StatefulProcessor[Long, Ev, EnrichedPurchase] {
    @transient private var lastView: ValueState[AsOfState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastView = getHandle.getValueState[AsOfState]("lastView",
        Encoders.product[AsOfState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[EnrichedPurchase] = {
      var last = if (lastView.exists()) Some(lastView.get()) else None
      val out = scala.collection.mutable.ArrayBuffer.empty[EnrichedPurchase]
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        e.event_type match {
          case "view" =>
            last = Some(AsOfState(e.ts.getTime, e.value))
          case "purchase" =>
            val prior = last match {
              case Some(AsOfState(vts, vv))
                if e.ts.getTime - vts <= maxAgeSec * 1000 => vv
              case _ => 0.0
            }
            out += EnrichedPurchase(e.event_id, user, e.value, prior)
          case _ => ()
        }
      }
      last.foreach(lastView.update)
      out.iterator
    }
  }

  /** J11 as-of enrichment via [[AsOfProcessor]]/`transformWithState`. */
  def asOfEnrichTws(events: Dataset[Ev], maxAgeSec: Long = 21600L): Dataset[EnrichedPurchase] = {
    implicit val outEnc = Encoders.product[EnrichedPurchase]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new AsOfProcessor(maxAgeSec),
        TimeMode.None(), OutputMode.Append())
  }

  /** A6 count-bounded clustering window: buffer feature vectors in state;
    * when the buffer reaches `maxCount`, run seeded K-means (bootstrapped
    * from the previous model's centroids — reference: KMeansClusterFunction
    * "seeded by previous centroids"), decay-merge with the previous model
    * (F15), emit the new model, clear the buffer. Runs in ONE state group —
    * the same single-task semantics the reference enforces with
    * parallelism 1 (UnusualActivityDetectionJob.scala:367,376).
    * (The min-count/event-time-timer extension of the reference fires on a
    * timer too; count-trigger is the deterministic core.)
    */
  def countBoundedCluster(points: Dataset[Seq[Double]], k: Int, maxCount: Int,
                          decay: Double = 0.2): Dataset[ModelRow] = {
    implicit val stateEnc = Encoders.product[ClusterState]
    implicit val outEnc = Encoders.product[ModelRow]
    implicit val keyEnc = Encoders.scalaInt
    points.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Int, it: Iterator[Seq[Double]], state: GroupState[ClusterState]) => {
          var st = state.getOption.getOrElse(ClusterState(Nil, Nil, Nil, 0))
          var buf = st.buffer ++ it.map(_.toSeq).toSeq
          val out = scala.collection.mutable.ArrayBuffer.empty[ModelRow]
          while (buf.length >= maxCount) {
            val (window, rest) = buf.splitAt(maxCount)
            val pts = window.map(_.toVector)
            val init =
              if (st.centroids.isEmpty) KMeans.bootstrap(pts, k, seed = 137L)
              else st.centroids.map(_.toVector).toVector
            val clustered = KMeans.cluster(pts, init)
            val merged =
              if (st.centroids.isEmpty) clustered
              else KMeans.Model(st.centroids.indices.map(i =>
                KMeans.Cluster(i, st.centroids(i).toVector, st.weights(i))).toVector)
                .update(clustered, decay)
            val version = st.version + 1
            out += ModelRow(version, pts.length,
              merged.clusters.map(_.centroid.toSeq),
              merged.clusters.map(_.weight))
            st = ClusterState(Nil, merged.clusters.map(_.centroid.toSeq),
              merged.clusters.map(_.weight), version)
            buf = rest
          }
          state.update(st.copy(buffer = buf))
          out.iterator
        })
  }
}
