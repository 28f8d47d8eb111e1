package graft.operators

import graft.GraftSuite
import org.apache.spark.sql.functions._

/** The hot-token document-frequency cap for hybrid retrieval
  * (`graft.hybrid.maxDocFreq`).
  *
  * q89's lexical leg generates candidates from a (doc_id, token) posting
  * relation; a stopword-grade token present in (nearly) every document
  * makes per-query candidate volume O(|corpus|) — the same skew class as
  * TextPack's hot shingle, on the retrieval surface. The cap must
  * (a) bound every posting list fed to the candidate join, (b) kill the
  * hot-token candidate blowup, and (c) stay OFF by default so the
  * oracle-checked q89 remains byte-exact.
  */
class HybridCapSpec extends GraftSuite {

  private val N = 30

  /** N docs sharing one hot token, otherwise disjoint; embeddings for all
    * docs (vec_id = doc_id) so the semantic leg joins every candidate. */
  private def writeCorpus(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hybrid_cap").toString
    (0 until N).map { i =>
      (i.toLong, s"hot u${i}a u${i}b u${i}c", "en", "synth", 20L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (0 until N).map { i =>
      (i.toLong, Seq(1.0f, (i % 5).toFloat, ((i * 7) % 11).toFloat, 0.5f), i)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def withCap[A](cap: Option[Long])(body: => A): A = {
    cap match {
      case Some(c) => spark.conf.set(SimilarityPack.MaxTokDocFreqKey, c.toString)
      case None    => spark.conf.unset(SimilarityPack.MaxTokDocFreqKey)
    }
    try body finally spark.conf.unset(SimilarityPack.MaxTokDocFreqKey)
  }

  test("default off: the every-doc hot token reaches every candidate") {
    val d = writeCorpus()
    withCap(None) {
      val maxDf = SimilarityPack.cappedTokenRows(spark, d)
        .groupBy("tok").count().agg(max("count")).head().getLong(0)
      assert(maxDf == N, "uncapped posting lists keep the hot token")
      // doc 0 is the only query (doc_id % 100 == 0); via the hot token it
      // sees all N-1 candidates, fused down to the top 5
      val rows = SimilarityPack.queries("q89_hybrid_search")(spark, d).collect()
      assert(rows.length == 5)
      assert(rows.forall(_.getAs[Long]("shared") == 1L))
    }
  }

  test("capped: posting lists are bounded and the hot-token candidates disappear") {
    val d = writeCorpus()
    withCap(Some(5L)) {
      val dfs = SimilarityPack.cappedTokenRows(spark, d)
        .groupBy("tok").count().select("count")
        .collect().map(_.getLong(0))
      assert(dfs.nonEmpty && dfs.forall(_ <= 5L),
        "no posting list may exceed the configured cap")
      // the only cross-doc token was the hot one -> zero candidates
      assert(SimilarityPack.queries("q89_hybrid_search")(spark, d).count() == 0)
    }
  }

  test("cap does not disturb the oracle-checked q89 when unset") {
    val want = SimilarityPack.queries("q89_hybrid_search")(spark, sf).collect().toSet
    val d = writeCorpus()
    withCap(Some(1L))(SimilarityPack.queries("q89_hybrid_search")(spark, d).count())
    val got = SimilarityPack.queries("q89_hybrid_search")(spark, sf).collect().toSet
    assert(got == want)
  }

  test("malformed or non-positive cap values fail fast naming the conf key") {
    val d = writeCorpus()
    withCap(None) {
      spark.conf.set(SimilarityPack.MaxTokDocFreqKey, "10k")
      val e = intercept[IllegalArgumentException](
        SimilarityPack.cappedTokenRows(spark, d))
      assert(e.getMessage.contains(SimilarityPack.MaxTokDocFreqKey))
      spark.conf.set(SimilarityPack.MaxTokDocFreqKey, "0")
      val z = intercept[IllegalArgumentException](
        SimilarityPack.cappedTokenRows(spark, d))
      assert(z.getMessage.contains(SimilarityPack.MaxTokDocFreqKey))
    }
  }
}
