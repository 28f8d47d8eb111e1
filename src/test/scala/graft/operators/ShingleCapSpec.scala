package graft.operators

import graft.GraftSuite
import org.apache.spark.sql.functions._

/** The hot-shingle document-frequency cap (`graft.shingle.maxDocFreq`).
  *
  * A boilerplate-heavy corpus puts a near-identical header shingle in
  * (almost) every document; its posting list makes the pair self-join
  * quadratic in that one key. The cap must (a) bound every posting list
  * fed to the pair join, (b) kill the quadratic pair blowup the hot
  * shingle would cause, and (c) stay OFF by default so the oracle-checked
  * pair queries remain byte-exact. (Reference analogue: the reference
  * bounds LSH bucket width instead, jobs/preparation/
  * LoadStaticDataJob.scala:92-105 — same skew concern, different knob.)
  */
class ShingleCapSpec extends GraftSuite {

  private val N = 30

  /** N docs sharing one hot 3-gram ("aa bb cc"), otherwise disjoint. */
  private def writeCorpus(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shingle_cap").toString
    (0 until N).map { i =>
      (i.toLong, s"aa bb cc u${i}a u${i}b u${i}c u${i}d", "en", "synth", 30L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def withCap[A](cap: Option[Long])(body: => A): A = {
    cap match {
      case Some(c) => spark.conf.set(TextPack.MaxDocFreqKey, c.toString)
      case None    => spark.conf.unset(TextPack.MaxDocFreqKey)
    }
    try body finally spark.conf.unset(TextPack.MaxDocFreqKey)
  }

  test("default off: every-doc hot shingle produces the full quadratic pair base") {
    val d = writeCorpus()
    withCap(None) {
      // every pair of docs shares exactly the hot shingle -> C(N,2) pairs
      assert(TextPack.pairBase(spark, d).count() == N.toLong * (N - 1) / 2)
      val maxDf = TextPack.cappedShingleRows(spark, d)
        .groupBy("shingle").count().agg(max("count")).head().getLong(0)
      assert(maxDf == N, "uncapped posting lists keep the hot shingle")
    }
  }

  test("capped: posting lists are bounded and the hot-shingle pair blowup disappears") {
    val d = writeCorpus()
    withCap(Some(5L)) {
      val dfs = TextPack.cappedShingleRows(spark, d)
        .groupBy("shingle").count().select("count")
        .collect().map(_.getLong(0))
      assert(dfs.nonEmpty && dfs.forall(_ <= 5L),
        "no posting list may exceed the configured cap")
      // the only cross-doc shingle was the hot one -> zero candidate pairs
      assert(TextPack.pairBase(spark, d).count() == 0)
      // set sizes are measured over the capped universe: each doc keeps
      // its 4 unique-suffix shingles, losing exactly the hot one
      val sizes = TextPack.cappedShingleRows(spark, d)
        .groupBy("doc_id").count().select("count")
        .collect().map(_.getLong(0))
      assert(sizes.length == N && sizes.forall(_ == 4L))
    }
  }

  test("capped: q105 incremental dedup runs on the capped index and reports no false dups") {
    val d = writeCorpus()
    withCap(Some(5L)) {
      val out = TextPack.queries("q105_incremental_dedup")(spark, d)
      val rows = out.collect()
      assert(rows.nonEmpty, "hash-designated batch split must select some docs")
      assert(rows.forall(!_.getAs[Boolean]("is_dup")),
        "with the hot shingle capped away the otherwise-disjoint docs share nothing")
    }
  }

  test("cap does not disturb the oracle-checked pair relation when unset") {
    // q31 on the real sf0.001 corpus: run twice (unset both times) around a
    // capped run on the synthetic corpus — the cached shingle index must
    // not leak capped plans into the default path
    val want = TextPack.queries("q31_ngram_jaccard")(spark, sf).collect().toSet
    val d = writeCorpus()
    withCap(Some(1L))(TextPack.pairBase(spark, d).count())
    val got = TextPack.queries("q31_ngram_jaccard")(spark, sf).collect().toSet
    assert(got == want)
  }
}
