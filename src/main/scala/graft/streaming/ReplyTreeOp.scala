package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One edge event: a root (parent_id = None) or a reply pointing at its
  * parent (reference: RawCommentEvent with replyToPostId/replyToCommentId,
  * model/Events.scala:111-120). The trailing payload fields (defaulted for
  * pure-graph callers) ride along so a resolved event can feed downstream
  * per-root statistics without a stream-stream re-join — the reference's
  * comment payload travels through its tree builder the same way
  * (BuildReplyTreeProcessFunction emits whole enriched comments). `ts`
  * carries the exact µs event time; `tsec` stays the resolver's causality
  * clock. */
final case class EdgeEvent(event_id: Long, tsec: Long, parent_id: Option[Long],
                           user_id: Long = 0L, event_type: String = "",
                           ts: java.sql.Timestamp = null)

/** A resolved event: its transitive root, chain depth, whole-chain
  * causality flag. */
final case class ResolvedEvent(event_id: Long, root_id: Long, depth: Int, causal: Boolean)

/** Resolver state: resolved id → (root, depth, causal, tsec); pending
  * parent id → waiting children. */
final case class TreeState(resolved: Map[Long, (Long, Int, Boolean, Long)],
                           pending: Map[Long, Seq[EdgeEvent]])

/** Edge event with a real event-time column — the watermark carrier for
  * the evicting resolver. Payload fields as in [[EdgeEvent]]. */
final case class EdgeEventT(event_id: Long, ts: java.sql.Timestamp,
                            parent_id: Option[Long],
                            user_id: Long = 0L, event_type: String = "")

/** Evicting-resolver output: a resolved event (`dropped` false) or an
  * evicted dangling reply (`dropped` true, root/depth sentinel −1) — the
  * reference's main + side output collapsed onto one stream, split by the
  * caller with a filter (R3 side-output pattern). The trailing payload
  * columns (the event's own exact event time + attributes) let callers
  * window/aggregate the resolved stream directly; they append AFTER the
  * original five so positional consumers are unaffected. */
final case class TreeOut(event_id: Long, root_id: Long, depth: Int,
                         causal: Boolean, dropped: Boolean,
                         ts: java.sql.Timestamp = null,
                         user_id: Long = 0L, event_type: String = "")

/** Row flowing between the scale-out resolver's frontier and archive hops:
  * a resolved event on its way out (kind 0 — carrying `reg = true` until
  * the hop after its resolution point stores its entry), a probe for a
  * parent outside the frontier (kind 1, keyed by `parent_id`), or a
  * dropped row (kind 0, `dropped = true`, minted at the last hop). */
final case class TreeFlow(kind: Int, event_id: Long, parent_id: Long,
                          root_id: Long, depth: Int, causal: Boolean,
                          tsec: Long, reg: Boolean, dropped: Boolean,
                          ts: java.sql.Timestamp, user_id: Long,
                          event_type: String)

/** One archived resolution: the value type of the distributed archive
  * hops' per-event-id state. */
final case class ArchiveEntry(root_id: Long, depth: Int, causal: Boolean,
                              tsec: Long)

/** Streaming reply-tree resolution — SURVEY §7.4 Plan A (reference:
  * streams/BuildReplyTreeProcessFunction.scala:28-409). Events arrive in
  * any order across micro-batches; a reply whose parent is unknown parks in
  * pending state; when its parent resolves, the whole waiting subtree
  * resolves recursively (the reference's getDescendants:367-393), carrying
  * the causality check (child ts >= parent ts) down the chain. Emission is
  * incremental (append mode): an event is emitted exactly once, in the
  * micro-batch where its chain reaches a root.
  *
  * Runs as ONE state group — the reference's effective behavior too: its
  * mapping state is replicated across all workers via broadcast
  * (acknowledged at BuildReplyTreeProcessFunction.scala:207-214). The
  * scale-out variant partitions by root-affinity once resolved and keeps
  * only the unresolved frontier in the single group. Eviction of stale
  * pending entries (the reference's watermark-based dangling drop,
  * :288-317) is [[ReplyTreeOp.resolveEvicting]]: pending replies whose
  * event time the watermark has passed are dropped WITH their transitive
  * waiting children and side-output as `dropped` rows — pending state is
  * bounded by the watermark horizon instead of growing forever under
  * sustained dangling input.
  *
  * NOTE on the fully-partitioned form: a reply resolved in this batch must
  * be able to resolve ITS children, which wait under a different key —
  * that feedback edge cannot exist inside one streaming stateful operator
  * (no cycles in a streaming plan). Two distributed answers exist:
  * [[resolveScaleOut]] unrolls the feedback a bounded number of times
  * (frontier + chained archive hops — the resolved map lives in
  * hash-partitioned keyed state), and the per-micro-batch fixpoint against
  * a persisted mapping store partitioned by comment id — PipelineSpec's
  * end-to-end resolution job (`foreachBatch` + GraphPack fixpoint +
  * KeyedUpsertSink) — remains the unbounded-depth form. THIS operator is
  * the reference-faithful in-graph form (the reference replicates its
  * mapping state to every worker too,
  * BuildReplyTreeProcessFunction.scala:207-214).
  */
object ReplyTreeOp {

  def resolve(events: Dataset[EdgeEvent]): Dataset[ResolvedEvent] = {
    implicit val stateEnc = Encoders.product[TreeState]
    implicit val outEnc = Encoders.product[ResolvedEvent]
    implicit val keyEnc = Encoders.scalaInt
    events.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Int, it: Iterator[EdgeEvent], state: GroupState[TreeState]) => {
          var st = state.getOption.getOrElse(TreeState(Map.empty, Map.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[ResolvedEvent]

          // resolve `e` against parent entry `p`, then drain descendants
          def settle(e: EdgeEvent, p: (Long, Int, Boolean, Long)): Unit = {
            val entry = (p._1, p._2 + 1, p._3 && e.tsec >= p._4, e.tsec)
            st = st.copy(resolved = st.resolved + (e.event_id -> entry))
            out += ResolvedEvent(e.event_id, entry._1, entry._2, entry._3)
            drain(e.event_id)
          }

          // recursively resolve children waiting on `parentId`
          def drain(parentId: Long): Unit =
            st.pending.get(parentId).foreach { children =>
              st = st.copy(pending = st.pending - parentId)
              val p = st.resolved(parentId)
              // deterministic order: children settle by event id
              children.sortBy(_.event_id).foreach(c => settle(c, p))
            }

          it.toSeq.sortBy(_.event_id).foreach { e =>
            e.parent_id match {
              case None =>
                st = st.copy(resolved =
                  st.resolved + (e.event_id -> (e.event_id, 0, true, e.tsec)))
                out += ResolvedEvent(e.event_id, e.event_id, 0, causal = true)
                drain(e.event_id)
              case Some(pid) =>
                st.resolved.get(pid) match {
                  case Some(p) => settle(e, p)
                  case None =>
                    st = st.copy(pending = st.pending +
                      (pid -> (st.pending.getOrElse(pid, Nil) :+ e)))
                }
            }
          }
          state.update(st)
          out.iterator
        })
  }

  /** [[resolve]] + watermark-based dangling-reply eviction (reference:
    * BuildReplyTreeProcessFunction.evictDanglingReplies:288-317 — a pending
    * reply whose event time the watermark has passed will never find its
    * parent: drop it AND its transitive waiting children — getWithChildren
    * :301-303 — and report them on the side output, streams/package.scala
    * :287-298). Resolved rows carry `dropped = false`; evicted replies
    * `dropped = true`. Input must carry a watermark on `ts`.
    *
    * Eviction runs against the current watermark before each batch's rows
    * and in a timeout callback armed at the oldest pending reply's
    * timestamp, so state drains even when no further data arrives for the
    * group — pending size is bounded by the replies INSIDE the watermark
    * horizon. */
  def resolveEvicting(events: Dataset[EdgeEventT]): Dataset[TreeOut] = {
    implicit val stateEnc = Encoders.product[TreeState]
    implicit val outEnc = Encoders.product[TreeOut]
    implicit val keyEnc = Encoders.scalaInt
    events.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Int, it: Iterator[EdgeEventT], state: GroupState[TreeState]) => {
          var st = state.getOption.getOrElse(TreeState(Map.empty, Map.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[TreeOut]
          val wm = state.getCurrentWatermarkMs()

          def settle(e: EdgeEvent, p: (Long, Int, Boolean, Long)): Unit = {
            val entry = (p._1, p._2 + 1, p._3 && e.tsec >= p._4, e.tsec)
            st = st.copy(resolved = st.resolved + (e.event_id -> entry))
            out += TreeOut(e.event_id, entry._1, entry._2, entry._3,
              dropped = false, e.ts, e.user_id, e.event_type)
            drain(e.event_id)
          }

          def drain(parentId: Long): Unit =
            st.pending.get(parentId).foreach { children =>
              st = st.copy(pending = st.pending - parentId)
              val p = st.resolved(parentId)
              children.sortBy(_.event_id).foreach(c => settle(c, p))
            }

          // drop a lost reply and, transitively, everything waiting on it
          // (reference getWithChildren: children of a dropped reply are
          // dropped regardless of their own timestamps)
          val droppedIds = scala.collection.mutable.Set.empty[Long]
          def dropWithChildren(e: EdgeEvent): Unit = if (droppedIds.add(e.event_id)) {
            out += TreeOut(e.event_id, -1L, -1, causal = false, dropped = true,
              e.ts, e.user_id, e.event_type)
            st.pending.get(e.event_id).foreach { kids =>
              st = st.copy(pending = st.pending - e.event_id)
              kids.sortBy(_.event_id).foreach(dropWithChildren)
            }
          }

          def evict(): Unit = {
            val lost = st.pending.toSeq.sortBy(_._1).flatMap { case (pid, kids) =>
              kids.filter(_.tsec <= wm).sortBy(_.event_id).map(pid -> _)
            }
            lost.foreach { case (pid, e) =>
              if (!droppedIds.contains(e.event_id)) {
                val rest = st.pending.getOrElse(pid, Nil)
                  .filterNot(_.event_id == e.event_id)
                st = st.copy(pending =
                  if (rest.isEmpty) st.pending - pid else st.pending + (pid -> rest))
                dropWithChildren(e)
              }
            }
          }

          evict() // watermark advanced since the last invocation
          if (!state.hasTimedOut) {
            it.toSeq.sortBy(_.event_id).foreach { et =>
              val e = EdgeEvent(et.event_id, et.ts.getTime, et.parent_id,
                et.user_id, et.event_type, et.ts)
              e.parent_id match {
                case None =>
                  st = st.copy(resolved =
                    st.resolved + (e.event_id -> (e.event_id, 0, true, e.tsec)))
                  out += TreeOut(e.event_id, e.event_id, 0, causal = true,
                    dropped = false, e.ts, e.user_id, e.event_type)
                  drain(e.event_id)
                case Some(pid) =>
                  st.resolved.get(pid) match {
                    case Some(p) => settle(e, p)
                    case None =>
                      st = st.copy(pending = st.pending +
                        (pid -> (st.pending.getOrElse(pid, Nil) :+ e)))
                  }
              }
            }
          }
          state.update(st)
          // re-arm: evict as soon as the watermark passes the oldest
          // pending reply (nothing pending -> no timer needed)
          st.pending.valuesIterator.flatten.map(_.tsec).minOption.foreach(t =>
            state.setTimeoutTimestamp(math.max(t + 1, wm + 1)))
          out.iterator
        })
  }

  /** SCALE-OUT streaming resolution (SURVEY §7.4's sketch): the unbounded
    * resolved map — one entry per event EVER seen, the state that makes
    * [[resolveEvicting]]'s single group the lone non-distributed operator
    * in the library — moves into hash-partitioned keyed state; the single
    * group keeps only the watermark-bounded FRONTIER.
    *
    * Topology (one streaming query, `1 + hops` chained stateful operators):
    *
    *  1. [[frontier]] (single group): pending replies + entries resolved
    *     here within `recentHorizonMs` of event time. Parents inside the
    *     horizon resolve children immediately (the reference's fast path —
    *     virtually all traffic, since replies cluster near their parents);
    *     a reply whose parent is still unknown when the watermark passes
    *     the reply's own event time — [[resolveEvicting]]'s drop deadline —
    *     is forwarded as a PROBE instead of dropped.
    *  2. `hops` × [[archiveHop]] (keyed by event id, DISTRIBUTED): each
    *     resolved row registers its entry at the hop after its resolution
    *     point (exactly once across the chain); probes route to the
    *     partition owning the parent id and either resolve there or fall
    *     through to the next hop; the last hop turns unresolved probes into
    *     `dropped` rows.
    *
    * Equivalence to [[resolveEvicting]] (ScaleOutReplyTreeSpec): same
    * resolved set with identical (root, depth, causal) and same dropped
    * set, because a probe fires at exactly the moment resolveEvicting
    * would drop, and the archive holds precisely the events resolved by
    * then. Differences, both documented trade-offs of distributing the
    * state: (a) slow-path rows emit at their watermark deadline rather
    * than on parent arrival; (b) a lineage may cross at most `hops`
    * consecutive slow-path generations — generation k+1 of a
    * necro-revival chain (each generation arriving > horizon after its
    * parent) resolves at hop k+1, so chains deeper than `hops` such
    * generations drop. Fast-path generations (within the horizon) are
    * unlimited. At 100 TB, `hops` covers the p99.9 revival depth and the
    * per-micro-batch fixpoint job (PipelineSpec) remains the unbounded
    * answer.
    *
    * Callers must disable
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled` at
    * query start (probe rows are behind the watermark BY DESIGN — they
    * fire at the drop deadline; the loss semantics are the reference's own
    * allowed-lateness drop), the same scoped opt-out as
    * PostStatisticsJob.runResolved. Input must carry a watermark on `ts`.
    */
  def resolveScaleOut(events: Dataset[EdgeEventT], hops: Int = 3,
                      recentHorizonMs: Long = 6L * 3600 * 1000): Dataset[TreeOut] = {
    require(hops >= 1, "need at least one archive hop")
    val flows = (1 to hops).foldLeft(frontier(events, recentHorizonMs)) {
      (ds, i) => archiveHop(ds, last = i == hops)
    }
    flows.map(r => TreeOut(r.event_id, r.root_id, r.depth, r.causal,
      r.dropped, r.ts, r.user_id, r.event_type))(Encoders.product[TreeOut])
  }

  /** The single-group frontier: pending (watermark-bounded, as in
    * [[resolveEvicting]]) + recent resolutions (horizon-bounded). Overdue
    * pending replies leave as probes; resolved rows leave with
    * `reg = true` for the first archive hop. */
  private[streaming] def frontier(events: Dataset[EdgeEventT],
                                  horizonMs: Long): Dataset[TreeFlow] = {
    implicit val stateEnc = Encoders.product[TreeState]
    implicit val outEnc = Encoders.product[TreeFlow]
    implicit val keyEnc = Encoders.scalaInt
    events.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Int, it: Iterator[EdgeEventT], state: GroupState[TreeState]) => {
          var st = state.getOption.getOrElse(TreeState(Map.empty, Map.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[TreeFlow]
          val wm = state.getCurrentWatermarkMs()

          def settle(e: EdgeEvent, p: (Long, Int, Boolean, Long)): Unit = {
            val entry = (p._1, p._2 + 1, p._3 && e.tsec >= p._4, e.tsec)
            st = st.copy(resolved = st.resolved + (e.event_id -> entry))
            out += TreeFlow(0, e.event_id, e.parent_id.getOrElse(-1L),
              entry._1, entry._2, entry._3, e.tsec, reg = true,
              dropped = false, e.ts, e.user_id, e.event_type)
            drain(e.event_id)
          }

          def drain(parentId: Long): Unit =
            st.pending.get(parentId).foreach { children =>
              st = st.copy(pending = st.pending - parentId)
              val p = st.resolved(parentId)
              children.sortBy(_.event_id).foreach(c => settle(c, p))
            }

          // overdue pending replies become probes — the same deadline at
          // which resolveEvicting drops them, but here the archive gets
          // the last word. NOT transitive: children of a probed reply hit
          // their own deadlines later and probe for it by id.
          def probeOverdue(): Unit = {
            val due = st.pending.toSeq.sortBy(_._1).flatMap { case (pid, kids) =>
              kids.filter(_.tsec <= wm).sortBy(_.event_id).map(pid -> _)
            }
            due.foreach { case (pid, e) =>
              val rest = st.pending.getOrElse(pid, Nil)
                .filterNot(_.event_id == e.event_id)
              st = st.copy(pending =
                if (rest.isEmpty) st.pending - pid else st.pending + (pid -> rest))
              out += TreeFlow(1, e.event_id, pid, -1L, -1, causal = false,
                e.tsec, reg = false, dropped = false, e.ts, e.user_id, e.event_type)
            }
          }

          probeOverdue() // watermark advanced since the last invocation
          if (!state.hasTimedOut) {
            it.toSeq.sortBy(_.event_id).foreach { et =>
              val e = EdgeEvent(et.event_id, et.ts.getTime, et.parent_id,
                et.user_id, et.event_type, et.ts)
              e.parent_id match {
                case None =>
                  st = st.copy(resolved =
                    st.resolved + (e.event_id -> (e.event_id, 0, true, e.tsec)))
                  out += TreeFlow(0, e.event_id, -1L, e.event_id, 0,
                    causal = true, e.tsec, reg = true, dropped = false,
                    e.ts, e.user_id, e.event_type)
                  drain(e.event_id)
                case Some(pid) =>
                  st.resolved.get(pid) match {
                    case Some(p) => settle(e, p)
                    case None =>
                      st = st.copy(pending = st.pending +
                        (pid -> (st.pending.getOrElse(pid, Nil) :+ e)))
                  }
              }
            }
          }
          // horizon eviction: entries the watermark has outrun by more
          // than the horizon can no longer serve a fast-path child — any
          // later child probes the archive at its own deadline instead
          val stale = st.resolved.iterator
            .filter { case (_, (_, _, _, t)) => t + horizonMs <= wm }
            .map(_._1).toSeq
          if (stale.nonEmpty)
            st = st.copy(resolved = st.resolved -- stale)
          state.update(st)
          // re-arm for the earliest future obligation: a pending reply's
          // probe deadline or a recent entry's horizon expiry — state
          // drains even if the group never sees another row
          (st.pending.valuesIterator.flatten.map(_.tsec) ++
            st.resolved.valuesIterator.map(_._4 + horizonMs)).minOption
            .foreach(t => state.setTimeoutTimestamp(math.max(t + 1, wm + 1)))
          out.iterator
        })
  }

  /** One distributed archive hop: keyed state `event id → ArchiveEntry`.
    * Registrations (resolved rows with `reg = true`) store their entry
    * here and travel on with `reg = false`; probes keyed by `parent_id`
    * resolve against the entry or fall through (last hop: become
    * `dropped`). Registrations are applied before probes so a same-batch
    * upstream resolution serves this batch's probes — the archive is
    * exactly as current as the single group's map at the drop deadline. */
  private[streaming] def archiveHop(in: Dataset[TreeFlow],
                                    last: Boolean): Dataset[TreeFlow] = {
    implicit val stateEnc = Encoders.product[ArchiveEntry]
    implicit val outEnc = Encoders.product[TreeFlow]
    implicit val keyEnc = Encoders.scalaLong
    in.groupByKey(r => if (r.kind == 1) r.parent_id else r.event_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[TreeFlow], state: GroupState[ArchiveEntry]) => {
          val rows = it.toSeq
          val out = scala.collection.mutable.ArrayBuffer.empty[TreeFlow]
          rows.filter(r => r.kind == 0 && r.reg).sortBy(_.event_id).foreach { r =>
            if (!state.exists)
              state.update(ArchiveEntry(r.root_id, r.depth, r.causal, r.tsec))
            out += r.copy(reg = false)
          }
          rows.filter(r => r.kind == 0 && !r.reg).foreach(out += _)
          val entry = state.getOption
          rows.filter(_.kind == 1).sortBy(_.event_id).foreach { p =>
            entry match {
              case Some(en) =>
                out += TreeFlow(0, p.event_id, p.parent_id, en.root_id,
                  en.depth + 1, en.causal && p.tsec >= en.tsec, p.tsec,
                  reg = !last, dropped = false, p.ts, p.user_id, p.event_type)
              case None =>
                if (last)
                  out += p.copy(kind = 0, root_id = -1L, depth = -1,
                    causal = false, reg = false, dropped = true)
                else out += p
            }
          }
          out.iterator
        })
  }
}
