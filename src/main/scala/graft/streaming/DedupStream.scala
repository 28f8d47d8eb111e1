package graft.streaming

import graft.functions.{MinHashSig, TextLsh}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** A document arriving on the ingest stream. */
final case class DocEv(doc_id: Long, ts: java.sql.Timestamp, text: String)

/** One (band-bucket, doc) row after signature banding. */
final case class BucketDoc(bkey: String, band: Int, doc_id: Long,
                           ts: java.sql.Timestamp, sig: Seq[Long])

/** Per-bucket index state: the bucket's canonical (first-seen) doc. */
final case class BucketState(firstDoc: Long, sig: Seq[Long])

/** Candidate emission: `cand_of` = the bucket's canonical doc (-1 when this
  * doc IS the canonical), `est_sim` = equal-slot signature fraction. */
final case class DedupCand(doc_id: Long, ts: java.sql.Timestamp, band: Int,
                           cand_of: Long, est_sim: Double)

/** Streaming incremental MinHash+LSH near-dup detection — the streaming
  * twin of q32 (batch LSH dedup) and q105 (incremental batch-vs-corpus
  * dedup): every arriving document is checked against the standing corpus
  * INDEX, never against the corpus itself.
  *
  * Same construction and constants as TextPack (64-slot signatures from
  * 3-token shingles via the codegen'd [[MinHashSig]]; 16 bands × 4 rows;
  * seeded [[Hashes.family]]), so a doc's streaming signature is
  * bit-identical to its batch one.
  *
  * Scale design: the keyed state is the LSH bucket index — one
  * (canonical doc_id, 64-slot signature) per non-empty bucket, partitioned
  * across executors by bucket key exactly like the batch inverted index is
  * partitioned by its shuffle. Arriving docs fan out to their 16 buckets
  * (map-side), meet only their own buckets' state (one shuffle on the
  * bucket key), and the per-bucket comparison is O(1): the signature
  * comparison against the canonical doc, not a posting-list join. The
  * index state is the PRODUCT (it persists as long as the corpus is
  * live, like the reference's externalized post-mapping state); the
  * skew analogue of the hot-shingle DF cap does not arise because a
  * bucket holds one canonical entry regardless of how many docs hash
  * into it.
  *
  * Emission contract (incremental, arrival-ordered like q105): the first
  * doc to reach a bucket becomes its canonical doc and is emitted with
  * cand_of = -1; every later doc in that bucket emits one candidate row
  * against the canonical. Within a micro-batch, arrival order is
  * (ts, doc_id) — deterministic under re-batching; a restart replays the
  * checkpointed index, so verdicts never regress (RecoverySpec pattern).
  */
object DedupStream {
  // the ONE shared text-LSH configuration (graft.functions.TextLsh) — the
  // batch/stream bit-identical-signature contract is by construction, and
  // DedupStreamSpec pins it against TextPack's batch signature build
  val NumHashes: Int = TextLsh.NumHashes
  val Bands: Int     = TextLsh.Bands
  val Rows: Int      = TextLsh.Rows
  val Seed: Long     = TextLsh.Seed

  private def shinglesOf(t: Column): Column = TextLsh.shinglesOf(t)

  /** Stage A (stateless, map-only): signature + band fan-out. Docs too
    * short to shingle produce no rows — they cannot collide. */
  def bandRows(docs: Dataset[DocEv]): Dataset[BucketDoc] = {
    implicit val enc = Encoders.product[BucketDoc]
    docs.toDF()
      .select(col("doc_id"), col("ts"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("ts"),
        MinHashSig.of(shinglesOf(col("t")), NumHashes, Seed).as("sig"))
      .filter(col("sig").isNotNull && size(col("sig")) === NumHashes)
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(sequence(lit(0), lit(Bands - 1))).as("band"))
      .select(
        concat_ws("-", col("band") +:
          (0 until Rows).map(r => expr(s"sig[int(band) * $Rows + $r]")): _*).as("bkey"),
        col("band").cast("int").as("band"), col("doc_id"), col("ts"), col("sig"))
      .as[BucketDoc]
  }

  /** The bucket transition shared by BOTH state-API forms (the
    * ClusterWindowLogic pattern — one core, two adapters, cannot drift):
    * fold a batch of arrivals in (ts, doc_id) order through the bucket's
    * canonical entry. */
  private[streaming] def foldBucket(st0: Option[BucketState], rows: Seq[BucketDoc])
      : (Option[BucketState], Seq[DedupCand]) = {
    var st = st0
    val out = scala.collection.mutable.ArrayBuffer.empty[DedupCand]
    rows.sortBy(b => (b.ts.getTime, b.doc_id)).foreach { b =>
      st match {
        case None =>
          st = Some(BucketState(b.doc_id, b.sig))
          out += DedupCand(b.doc_id, b.ts, b.band, -1L, 0.0)
        case Some(s0) if s0.firstDoc != b.doc_id =>
          // NOTE on redelivery: an at-least-once source that re-sends a
          // non-canonical doc re-emits its candidate rows (tracking emitted
          // docs per bucket would grow state per arrival — defeating the
          // one-entry-per-bucket design), so downstream consumers must be
          // duplicate-insensitive — [[verdicts]] aggregates with
          // max/collect_set only. A re-sent CANONICAL doc emits nothing
          // (its -1 row already committed with the batch that set the
          // state; exactly-once sinks keep it).
          val eq = b.sig.iterator.zip(s0.sig.iterator).count { case (x, y) => x == y }
          out += DedupCand(b.doc_id, b.ts, b.band, s0.firstDoc,
            eq.toDouble / NumHashes)
        case _ => () // replayed delivery of the canonical doc itself
      }
    }
    (st, out.toSeq)
  }

  /** Stage B (keyed index): one fMGWS group per LSH bucket holding the
    * canonical entry; emits a [[DedupCand]] row per (doc, bucket). */
  def candidates(docs: Dataset[DocEv]): Dataset[DedupCand] = {
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val outEnc   = Encoders.product[DedupCand]
    implicit val keyEnc   = Encoders.STRING
    bandRows(docs)
      .groupByKey(_.bkey)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, it: Iterator[BucketDoc], state: GroupState[BucketState]) => {
          val (st, out) = foldBucket(state.getOption, it.toSeq)
          st.foreach(state.update)
          out.iterator
        })
  }

  /** [[candidates]] on the transformWithState API. The declarative
    * `TTLConfig` is what makes this form the DEDUP-WITHIN-HORIZON
    * deployment: with a TTL, a bucket whose canonical entry hasn't been
    * touched for the horizon is dropped by the store itself, bounding the
    * index to recently-seen content (the NoTimeout fMGWS form keeps the
    * index forever — the persisted-corpus-index deployment). Requires the
    * RocksDB state store provider (Spark's TWS contract). */
  def candidatesTws(docs: Dataset[DocEv],
                    ttl: TTLConfig = TTLConfig.NONE): Dataset[DedupCand] = {
    implicit val outEnc = Encoders.product[DedupCand]
    implicit val keyEnc = Encoders.STRING
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    bandRows(docs)
      .groupByKey(_.bkey)
      .transformWithState(new BucketIndexProcessor(ttl), timeMode,
        OutputMode.Append())
  }

  /** The bucket-index [[StatefulProcessor]] — same [[foldBucket]] core as
    * the fMGWS form. */
  class BucketIndexProcessor(ttl: TTLConfig)
    extends StatefulProcessor[String, BucketDoc, DedupCand] {
    @transient private var canonical: ValueState[BucketState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      canonical = getHandle.getValueState[BucketState]("canonical",
        Encoders.product[BucketState], ttl)

    override def handleInputRows(bkey: String, rows: Iterator[BucketDoc],
                                 timerValues: TimerValues): Iterator[DedupCand] = {
      val st0 = if (canonical.exists()) Some(canonical.get()) else None
      val (st, out) = foldBucket(st0, rows.toSeq)
      st.foreach(canonical.update)
      out.iterator
    }
  }

  /** Stage C (windowed verdicts): per-doc rollup over the doc's ≤16
    * candidate rows — n_hits = distinct matched canonicals, best match by
    * estimated similarity (smallest canonical id on ties), duplicate iff
    * best_sim ≥ `simT`. The watermark
    * is RE-DECLARED on the fMGWS output (a flatMapGroupsWithState does not
    * propagate its input watermark — the r9 soak lesson, SCALE.md), so
    * the rollup state is evicted as windows close. */
  def verdicts(docs: Dataset[DocEv], simT: Double = 0.5,
               windowDur: String = "1 hour",
               watermark: String = "30 minutes"): DataFrame = {
    // tie-break: max(struct) picks highest est_sim, then highest -cand_of
    // = smallest canonical id. Matched rows always have est_sim ≥ 4/64 > 0
    // (the shared band's slots are equal by construction), so a doc's
    // canonical rows (est_sim = 0) never outrank a real match.
    candidates(docs)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("doc_id"))
      // n_hits counts DISTINCT matched canonicals (bounded by #bands), so
      // at-least-once redelivery of candidate rows cannot inflate it —
      // every aggregate here is duplicate-insensitive (see foldBucket)
      .agg(size(collect_set(when(col("cand_of") >= 0, col("cand_of")))).as("n_hits"),
        max(struct(col("est_sim"), (-col("cand_of")).as("nc"))).as("best"))
      .select(col("doc_id"), unix_timestamp(col("w.start")).as("w_start"),
        col("n_hits"),
        round(col("best.est_sim"), 4).as("best_sim"),
        (-col("best.nc")).cast("long").as("best_cand"),
        (col("best.est_sim") >= simT).as("is_dup"))
  }
}
