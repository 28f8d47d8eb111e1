package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** S4 — keyed MID-PIPELINE scaled replay (reference:
  * functions/ScaledReplayFunction.scala:15-66 — a KeyedProcessFunction
  * that re-paces an already-flowing stream: each event is held until the
  * scaled clock `frontier(t) = eventStart + (wall_now − wallStart) ×
  * speedup` passes its event time; pending events wait in a scheduler
  * queue drained by timers).
  *
  * Spark-first shape: `flatMapGroupsWithState` with PROCESSING-TIME
  * timeouts — arriving events join a per-key pending buffer in group
  * state, due events emit in (event-time, id) order, and when the buffer
  * is non-empty a timeout re-invokes the group at the next due instant
  * (clamped to `maxPollMs`, the idle-poll bound; Spark's no-data
  * micro-batches keep timeouts firing between input batches). Two
  * deliberate divergences from the reference, both improvements:
  *
  *  - **Pending state is CHECKPOINTED.** The reference's own TODO
  *    (ScaledReplayFunction.scala:18-19, snapshotState left empty at
  *    :63-66) concedes its queue is lost on failure recovery; group state
  *    here rides the query checkpoint, so a restarted query resumes the
  *    replay where it stopped (spec-pinned).
  *  - **The pace anchor is per KEY, in state** (first event seen for the
  *    key), not a per-subtask `lazy val` — so rescaling or restarting
  *    cannot silently re-anchor the clock mid-replay.
  *
  * The injected-delay variant composes with [[graft.functions.DelayGen]]
  * (F11): add `delayed_ts` upstream and replay on it. Pacing granularity
  * is the micro-batch trigger — the documented cost of the micro-batch
  * model vs the reference's per-record timers; ordering and completeness
  * are exact, only emission instants quantize.
  *
  * Liveness contract: timeouts fire only when a batch runs. While the
  * query is RUNNING, Spark's no-data micro-batches keep batches coming
  * (stateful ops with processing timeouts always request another batch),
  * so a drained upstream still completes the replay. After a RESTART with
  * an idle upstream, no batch runs until data arrives — the recovered
  * pending buffer then resumes on the first upstream event (spec-pinned);
  * a mid-pipeline re-pacer normally sits under a live upstream, and a
  * strictly idle deployment can union a rate-source ticker for liveness.
  *
  * Scale: state per key = the events the UPSTREAM has produced ahead of
  * the scaled clock (identical to the reference's queue). Replay from a
  * paced source (S1/S3) keeps it near-empty; an unpaced upstream bounds
  * it by that source's read-ahead. The buffer lives in the state store —
  * RocksDB for larger-than-heap — and keys scale out with shuffle
  * partitions.
  */
object ScaledReplayOp {

  /** Injectable time source (tests freeze it; production = wall clock). */
  trait Clock extends Serializable { def nowMs(): Long }
  object WallClock extends Clock { override def nowMs(): Long = System.currentTimeMillis() }

  /** Per-key replay state: the pace anchor and the pending buffer. */
  final case class ReplayBuf(wallStartMs: Long, eventStartMs: Long,
                             pending: Seq[Ev])

  /** Re-pace `events` (keyed by user) to `speedup`× event time. Emits
    * every input exactly once, no earlier than its scaled due instant
    * (modulo trigger quantization). Emission is per-key
    * (event-time, event_id)-ordered among events that arrive AHEAD of
    * their due instant — the normal case under a read-ahead upstream; an
    * event arriving already past due emits on arrival, exactly as the
    * reference scheduler releases it (a late straggler cannot be
    * re-paced without unbounded holding).
    *
    * `maxPollMs` bounds the idle re-poll (the exact wait to the next due
    * instant is used when shorter); `anchorTtlMs` garbage-collects a
    * key's anchor after it has sat DRAINED that long — a later event for
    * the key then re-anchors, which bounds state by the number of keys
    * active within the TTL horizon instead of all keys ever seen.
    */
  def scaledReplay(events: Dataset[Ev], speedup: Double,
                   clock: Clock = WallClock,
                   maxPollMs: Long = 30000L,
                   anchorTtlMs: Long = 3600000L): Dataset[Ev] = {
    require(speedup > 0, s"speedup must be > 0, got $speedup")
    require(maxPollMs >= 1, s"maxPollMs must be >= 1, got $maxPollMs")
    require(anchorTtlMs >= 1, s"anchorTtlMs must be >= 1, got $anchorTtlMs")
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[ReplayBuf]
    implicit val outEnc = Encoders.product[Ev]
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(
        (_: Long, it: Iterator[Ev],
         state: org.apache.spark.sql.streaming.GroupState[ReplayBuf]) => {
          val now = clock.nowMs()
          val arrived = it.toSeq
          val st0 = state.getOption.getOrElse(ReplayBuf(
            now,
            if (arrived.isEmpty) now else arrived.map(_.ts.getTime).min,
            Seq.empty))
          if (state.hasTimedOut && arrived.isEmpty && st0.pending.isEmpty) {
            // drained key idle past the anchor TTL: evict the anchor
            state.remove()
            Iterator.empty
          } else {
            // the buffer is persisted sorted — only re-sort when new
            // events merged in (a no-op timer poll skips the O(n log n))
            val pending =
              if (arrived.isEmpty) st0.pending
              else (st0.pending ++ arrived).sortBy(e => (e.ts.getTime, e.event_id))
            val frontier = st0.eventStartMs +
              ((now - st0.wallStartMs) * speedup).toLong
            val (due, rest) = pending.partition(_.ts.getTime <= frontier)
            // skip the state rewrite when nothing changed (idle poll);
            // the re-armed timeout is the only thing that must persist
            if (arrived.nonEmpty || due.nonEmpty || !state.exists)
              state.update(ReplayBuf(st0.wallStartMs, st0.eventStartMs, rest))
            if (rest.nonEmpty) {
              // wall wait until the earliest pending event comes due
              val wait = math.ceil((rest.head.ts.getTime - frontier)
                / speedup).toLong
              state.setTimeoutDuration(math.max(1L, math.min(maxPollMs, wait)))
            } else {
              // drained: arm the GC timer instead of polling
              state.setTimeoutDuration(anchorTtlMs)
            }
            due.iterator
          }
        })
  }
}
