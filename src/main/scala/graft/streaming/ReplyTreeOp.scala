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
  * (no cycles in a streaming plan). The production-scale answer is the
  * per-micro-batch fixpoint against a persisted mapping store partitioned
  * by comment id — exactly PipelineSpec's end-to-end resolution job
  * (`foreachBatch` + GraphPack fixpoint + KeyedUpsertSink), which has no
  * single-group bottleneck; THIS operator is the reference-faithful
  * in-graph form (the reference replicates its mapping state to every
  * worker too, BuildReplyTreeProcessFunction.scala:207-214).
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
}
