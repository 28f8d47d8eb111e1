package graft.streaming

import graft.operators.{CurationPack, TextPack}
import graft.sources.KeyedUpsertSink
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, ValueState}

/** A document arriving on the curation ingest stream. */
final case class CurDoc(doc_id: Long, lang: String, text: String)

/** A doc after the fingerprint index: `is_dup` = an identical text is
  * already canonical in the standing index. */
final case class DupTagged(doc_id: Long, lang: String, text: String,
                           is_dup: Boolean)

/** Streaming per-document curation VERDICT — the live form of q119, and
  * the front half of the CurateJob pipeline running on ingest instead of
  * on a materialized corpus: every arriving doc gets its C4-precedence
  * keep/drop decision (language → exact dedup → repetition → quality)
  * the moment it lands.
  *
  * Composition mirrors the batch verdict exactly, pass by pass:
  *  - exact dedup: a keyed fingerprint INDEX (md5(text) — the q30
  *    fingerprint), one canonical doc_id per distinct text, held in fMGWS
  *    state exactly like DedupStream's LSH bucket index. First-seen
  *    (smallest doc_id within a batch) is canonical; for the q105-style
  *    arrival-ordered contract this EQUALS batch q30's global-min rule
  *    whenever ingest is id-ordered (the spec's feed), and on out-of-order
  *    ingest verdicts never retract (the streaming contract DedupStream
  *    pins).
  *  - repetition + quality: [[CurationPack.repetitionOf]] /
  *    [[TextPack.qualityCoreOf]] run INSIDE each micro-batch — the exact
  *    batch code over the batch's docs (both are pure per-doc maps, so
  *    micro-batching cannot change their values).
  *  - precedence: [[CurationPack.c4Reason]] — the one shared expression.
  *
  * Exactly-once: a replayed micro-batch re-enters fMGWS with the same
  * pre-batch state (checkpoint-consistent), re-emits identical tags, and
  * the per-doc verdict is deterministic from (tag, text) — the
  * doc_id-keyed monotonic-version upsert absorbs the rewrite
  * (CurateStreamSpec restarts mid-ingest and asserts parity with q119).
  *
  * Scale: state is ONE long per distinct fingerprint, hash-partitioned
  * across state partitions (the persisted dedup index is the product,
  * like the reference's externalized post mapping); per batch the
  * repetition/quality passes are batch-sized. Text rides through the
  * fingerprint shuffle here for simplicity — at corpus scale ship
  * (fp, doc_id, lang) through the index and re-join text from the
  * batch-local frame, or from the docstore the manifest points at. */
object CurateStream {

  /** The fingerprint-index transition: tag each doc in the batch group
    * against (and into) the canonical entry. Smallest doc_id in a batch
    * wins an empty slot — q30's rule applied to what has arrived. */
  private[graft] def foldFp(st0: Option[Long], rows: Seq[CurDoc])
      : (Option[Long], Seq[DupTagged]) = {
    var st = st0
    val out = rows.sortBy(_.doc_id).map { dc =>
      st match {
        case None =>
          st = Some(dc.doc_id)
          DupTagged(dc.doc_id, dc.lang, dc.text, is_dup = false)
        case Some(c) =>
          DupTagged(dc.doc_id, dc.lang, dc.text, is_dup = dc.doc_id != c)
      }
    }
    (st, out)
  }

  /** Stage A (keyed index): one fMGWS group per text fingerprint. */
  def dupTags(docs: Dataset[CurDoc]): Dataset[DupTagged] = {
    implicit val stateEnc = Encoders.scalaLong
    implicit val outEnc   = Encoders.product[DupTagged]
    implicit val keyEnc   = Encoders.STRING
    implicit val rowEnc   = Encoders.tuple(Encoders.STRING,
      Encoders.scalaLong, Encoders.STRING, Encoders.STRING)
    val withFp = docs.toDF()
      .withColumn("fp", md5(col("text")))
      .select(col("fp"), col("doc_id"), col("lang"), col("text"))
    withFp.as[(String, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, it: Iterator[(String, Long, String, String)],
         state: GroupState[Long]) => {
          val (st, out) = foldFp(state.getOption,
            it.map(r => CurDoc(r._2, r._3, r._4)).toSeq)
          st.foreach(state.update)
          out.iterator
        })
  }

  /** [[dupTags]] on the transformWithState API — the J11/DedupStream
    * three-API-parity pattern: the same [[foldFp]] core on RocksDB
    * ValueState, plus a declarative `TTLConfig` that makes this form the
    * DEDUP-WITHIN-HORIZON deployment (an untouched fingerprint drops out
    * of the index after the horizon; the NoTimeout fMGWS form keeps the
    * index forever — the persisted-corpus-index deployment). */
  def dupTagsTws(docs: Dataset[CurDoc],
                 ttl: TTLConfig = TTLConfig.NONE): Dataset[DupTagged] = {
    implicit val outEnc = Encoders.product[DupTagged]
    implicit val keyEnc = Encoders.STRING
    implicit val rowEnc = Encoders.tuple(Encoders.STRING,
      Encoders.scalaLong, Encoders.STRING, Encoders.STRING)
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    docs.toDF()
      .withColumn("fp", md5(col("text")))
      .select(col("fp"), col("doc_id"), col("lang"), col("text"))
      .as[(String, Long, String, String)]
      .groupByKey(_._1)
      .transformWithState(new FpIndexProcessor(ttl), timeMode,
        OutputMode.Append())
  }

  /** The fingerprint-index [[StatefulProcessor]] — same [[foldFp]] core
    * as the fMGWS form. */
  class FpIndexProcessor(ttl: TTLConfig)
    extends StatefulProcessor[String, (String, Long, String, String), DupTagged] {
    @transient private var canonical: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      canonical = getHandle.getValueState[Long]("canonical",
        Encoders.scalaLong, ttl)

    override def handleInputRows(fp: String,
                                 rows: Iterator[(String, Long, String, String)],
                                 timerValues: TimerValues): Iterator[DupTagged] = {
      val st0 = if (canonical.exists()) Some(canonical.get()) else None
      val (st, out) = foldFp(st0,
        rows.map(r => CurDoc(r._2, r._3, r._4)).toSeq)
      st.foreach(canonical.update)
      out.iterator
    }
  }

  /** Per-batch verdict derivation — the batch q119 composition over one
    * micro-batch's tagged docs (shared by run and the spec). */
  def verdictsOf(tagged: DataFrame): DataFrame = {
    val docs = tagged.select(col("doc_id"), col("lang"), col("text"))
    val rep = CurationPack.repetitionOf(docs)
      .select(col("doc_id"), col("kept").as("rep_kept"))
    val qual = TextPack.qualityCoreOf(docs)
      .select(col("doc_id"), col("quality"))
    tagged.select(col("doc_id"), col("lang"), col("is_dup"))
      .join(rep, "doc_id").join(qual, "doc_id")
      .withColumn("reason", CurationPack.c4Reason(col("lang"), col("is_dup"),
        col("rep_kept"), col("quality")))
      .withColumn("keep", col("reason") === "keep")
      .select(col("doc_id"), col("reason"), col("keep"))
  }

  /** Start the live verdict pipeline: fingerprint-index tagging, then
    * per-batch repetition/quality scoring and the C4 verdict, upserted
    * into `verdictOut` keyed by doc_id. */
  def run(spark: SparkSession, docs: Dataset[CurDoc], verdictOut: String,
          ckpt: String): StreamingQuery =
    dupTags(docs).toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        KeyedUpsertSink.upsert(spark, verdictOut,
          verdictsOf(b).withColumn("version", lit(id)),
          Seq("doc_id"), "version")
      }.start()
}
