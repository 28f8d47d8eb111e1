package graft

import graft.operators.GraphPack
import graft.sources.KeyedUpsertSink
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Edge-case hardening: empty/degenerate inputs and repeat-run determinism
  * (shuffle order must never leak into results — every query ends in a
  * total order and hash constants are seeded). */
class EdgeCaseSpec extends GraftSuite {

  test("upsert sink accepts an empty update batch (stream with an empty micro-batch)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_empty_upsert").toString + "/t"
    val b1 = Seq((1L, 10L, 5L)).toDF("k", "v", "n")
    KeyedUpsertSink.upsert(spark, dir, b1, Seq("k"), "v")
    val empty = b1.filter(lit(false))
    KeyedUpsertSink.upsert(spark, dir, empty, Seq("k"), "v")
    val got = spark.read.parquet(dir).collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((1L, 10L)))
  }

  test("upsert sink bootstraps from a non-existent directory") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_boot_upsert").toString + "/fresh/nested"
    val b = Seq((7L, 1L, 2L)).toDF("k", "v", "n")
    KeyedUpsertSink.upsert(spark, dir, b, Seq("k"), "v")
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("reply-tree fixpoint on a reply-free input: every event is its own root") {
    // restrict to a slice with no clicks by filtering the edge derivation
    // upstream is not possible through the public query, so assert on the
    // real data's roots instead: depth-0 rows are exactly the non-clicks
    val resolved = GraphPack.queries("q45_reply_tree_roots")(spark, sf)
    val roots = resolved.filter(col("depth") === 0).count()
    val nonClicks = Tables.events(spark, sf).filter(col("event_type") =!= "click").count()
    assert(roots == nonClicks)
  }

  test("hash-bearing queries are identical across repeated runs (seeded determinism)") {
    Seq("q32_dedup_minhash_lsh", "q33_simhash", "q51_user_minhash", "q42_ann_lsh",
        "q44_dup_clusters", "q63_tfidf", "q64_sample_stratified", "q66_oov_filter")
      .foreach { q =>
        val fn = SparkEntry.queries(q)
        val a = fn(spark, sf).collect()
        val b = fn(spark, sf).collect()
        assert(a.sameElements(b), s"$q differs across runs")
      }
  }

  test("sliding stats on an empty frame yields an empty result, not an error") {
    val empty = Tables.events(spark, sf).filter(lit(false))
    assert(graft.operators.WindowPack.slidingStats(empty).count() == 0)
  }

  test("q137 on a dup-free corpus: notices purge only themselves") {
    // disjoint texts -> empty pair graph -> empty CC labeling; every seed
    // must still surface via the full-outer leg, clustered to its own id
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_edge_takedown").toString
    Seq((0L, "a b c d e f", "en", "s1", 11L),
        (1L, "g h i j k l", "en", "s1", 11L),
        (37L, "m n o p q r", "en", "s1", 11L),
        (74L, "s t u v w x", "en", "s1", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.PipelinePack.queries("q137_takedown")(spark, dir)
      .collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 37L, 74L))
    rows.foreach { r =>
      assert(r.getString(1) == "seed" && r.getLong(2) == r.getLong(0))
    }
  }

  test("q138 on a single-week corpus: one cell at full retention") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_edge_ret").toString
    val base = 1700000000000L // inside one epoch week
    (1 to 6).map(i => (i.toLong, new java.sql.Timestamp(base + i * 1000L),
        (i % 3).toLong, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = graft.operators.WindowPack
      .queries("q138_retention_cohorts")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) == 0L && r.getLong(2) == 3L && r.getLong(3) == 3L
      && r.getLong(4) == 1000000L)
  }

  test("q139 on an all-English corpus: empty candidate set, no failure") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_edge_bitext").toString
    Seq((0L, "a b c", "en", "s1", 5L), (25L, "d e f", "en", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((0L, Array(1.0f, 0.0f), 0), (25L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    assert(graft.operators.SimilarityPack
      .queries("q139_bitext_margin")(spark, dir).count() == 0)
  }

  test("q135 on a reply-free forest: no thread paths") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_edge_threads").toString
    (1 to 5).map(i => (i.toLong, new java.sql.Timestamp(1700000000000L + i),
        i.toLong, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    assert(GraphPack.queries("q135_thread_paths")(spark, dir).count() == 0)
  }

  test("driver t1 smoke: SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys and query keys are mutually consistent") {
    val qs = SparkEntry.queries.keySet
    // every query is oracle-checked: the three sketches graduated to
    // deterministic invariant outputs (q79's cross-engine HLL, q80/q86's
    // exact-stats + in-bound booleans), the media decode via its modular
    // polynomial checksum
    val sketchy = Set.empty[String]
    // static oracles (no sf dir known): the data-dependent q43/q62/q78
    // are additionally rows-only until Verify provides the sf context
    SparkEntry.oracleContext = None
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle without query: ${os -- qs}")
    assert(qs -- os == sketchy ++ Set("q43_ann_ivf", "q62_classified_docs",
      "q78_semantic_dedup", "q111_ann_recall", "q166_ivf_balance"),
      s"unexpected rows-only set: ${qs -- os}")
    // with the Verify context set, the data-dependent oracles join in
    SparkEntry.oracleContext = Some((spark, sf))
    try {
      val osDyn = SparkEntry.oracleSql.keySet
      assert(osDyn.subsetOf(qs))
      assert(qs -- osDyn == sketchy,
        s"unexpected rows-only set with context: ${qs -- osDyn}")
    } finally SparkEntry.oracleContext = None
  }
}
