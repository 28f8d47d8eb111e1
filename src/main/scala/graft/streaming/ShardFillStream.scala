package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A document arriving on the ingest stream, bound for shard layout. */
final case class ShardDoc(source: String, ts: java.sql.Timestamp,
                          doc_id: Long, n_bytes: Long)

/** Per-source writer state: the currently-open file and its fill. */
final case class ShardState(fileIdx: Long, fill: Long)

/** One shard assignment: which output file this doc lands in. */
final case class ShardAssign(source: String, ts: java.sql.Timestamp,
                             doc_id: Long, n_bytes: Long, file_idx: Long)

/** Streaming twin of [[graft.operators.CurationPack.greedyFill]] (q127):
  * docs fill each source's open output file until the next would overflow
  * the cap, then a new file opens — assigned AS DOCS ARRIVE, so a
  * streaming ingest can route each document to its shard file without a
  * batch re-layout pass. Fed the same rows in the same order, the
  * assignment is BIT-IDENTICAL to the batch operator's (the q127 greedy
  * recurrence; parity pinned in ShardFillStreamSpec across re-batchings).
  *
  * Scale design: the keyed state is two longs per source — the open file
  * index and its fill — partitioned across executors by source exactly
  * like the batch op parallelizes groups. The same skew note applies: one
  * hyper-hot source funnels through one state partition; shard such a
  * source by a rotating sub-key upstream and let each sub-writer keep its
  * own file sequence.
  *
  * Ordering contract: within a micro-batch, arrival order is (ts, doc_id)
  * — deterministic under re-batching; ACROSS batches the recurrence
  * continues from the checkpointed (fileIdx, fill), so a restart resumes
  * the file sequence instead of reopening file 0 (the W9 recovery story).
  */
object ShardFillStream {

  /** The greedy transition: fold a batch of arrivals in (ts, doc_id)
    * order through the source's open-file state. Shared by the streaming
    * adapter and the spec's reference fold — one core, cannot drift. */
  private[graft] def foldGroup(st0: Option[ShardState], rows: Seq[ShardDoc],
                                   cap: Long): (Option[ShardState], Seq[ShardAssign]) = {
    var st = st0
    val out = scala.collection.mutable.ArrayBuffer.empty[ShardAssign]
    rows.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
      st = st match {
        case None => Some(ShardState(0L, r.n_bytes))
        case Some(ShardState(fi, fill)) =>
          if (fill + r.n_bytes > cap) Some(ShardState(fi + 1, r.n_bytes))
          else Some(ShardState(fi, fill + r.n_bytes))
      }
      out += ShardAssign(r.source, r.ts, r.doc_id, r.n_bytes, st.get.fileIdx)
    }
    (st, out.toSeq)
  }

  /** Keyed streaming assignment: one fMGWS group per source holding the
    * open-file state; emits one [[ShardAssign]] row per arriving doc. */
  def assign(docs: Dataset[ShardDoc], cap: Long): Dataset[ShardAssign] = {
    implicit val stateEnc = Encoders.product[ShardState]
    implicit val outEnc   = Encoders.product[ShardAssign]
    implicit val keyEnc   = Encoders.STRING
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, it: Iterator[ShardDoc], state: GroupState[ShardState]) => {
          val (st, out) = foldGroup(state.getOption, it.toSeq, cap)
          st.foreach(state.update)
          out.iterator
        })
  }
}
