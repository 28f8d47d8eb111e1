package graft

import graft.jobs.CurateJob
import graft.operators.{CurationPack, PipelinePack, TextPack}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The curation capstone must equal the composed batch queries it
  * chains: q119 verdicts, q142 cluster representatives, q127's greedy
  * shard recurrence — plus the conservation guarantees the audit table
  * exists to prove (every raw doc in exactly one reason bucket, shard
  * bytes == survivor bytes). */
class CurateJobSpec extends GraftSuite {

  private lazy val outDir = {
    val d = Files.createTempDirectory("graft_curate").toString
    CurateJob.run(spark, sf, d)
    d
  }

  test("decisions compose q119 verdicts with q142 representative policy") {
    val dec = spark.read.parquet(s"$outDir/decisions.parquet")
      .select(col("doc_id"), col("reason"), col("keep"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    // independent composition path: q119 rows + driver-side membership sets
    val verdict = CurationPack.queries("q119_curation_verdict")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    val reps = PipelinePack.queries("q142_cluster_reps")(spark, sf)
      .select(col("rep_doc")).collect().map(_.getLong(0)).toSet
    val members = PipelinePack.dupClusterLabels(spark, sf)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(dec.keySet == verdict.keySet, "one decision per raw doc")
    dec.foreach { case (id, (reason, keep)) =>
      val (vReason, vKeep) = verdict(id)
      val want =
        if (!vKeep) vReason
        else if (members.contains(id) && !reps.contains(id)) "near_dup_nonrep"
        else "keep"
      assert(reason == want, s"doc $id: got $reason, want $want")
      assert(keep == (want == "keep"))
    }
    assert(dec.values.exists(_._1 == "near_dup_nonrep"),
      "data exercises the cluster-loser path")
  }

  test("audit conserves the raw corpus; survivors match decisions") {
    val docs = Tables.documents(spark, sf)
      .agg(count(lit(1)), sum(col("n_chars")).cast("long")).head()
    val aud = spark.read.parquet(s"$outDir/audit.parquet")
      .agg(sum(col("n_docs")).cast("long"), sum(col("n_chars")).cast("long")).head()
    assert(aud.getLong(0) == docs.getLong(0), "every doc in exactly one bucket")
    assert(aud.getLong(1) == docs.getLong(1), "char mass conserved")
    val nKeep = spark.read.parquet(s"$outDir/audit.parquet")
      .filter(col("reason") === "keep").head().getLong(1)
    val surv = spark.read.parquet(s"$outDir/survivors.parquet").count()
    assert(surv == nKeep)
  }

  test("shards: greedy invariants hold and shard bytes equal survivor bytes") {
    val shards = spark.read.parquet(s"$outDir/shards.parquet")
    val surv = spark.read.parquet(s"$outDir/survivors.parquet")
    // conservation: every survivor in exactly one shard, byte-for-byte
    assert(shards.count() == surv.count())
    val sBytes = surv.agg(sum(col("n_chars")).cast("long")).head().getLong(0)
    val shBytes = shards.agg(sum(col("nb")).cast("long")).head().getLong(0)
    assert(shBytes == sBytes)
    // greedy recurrence per source, replayed on the driver (sf0.001 is
    // small): file advances exactly when the next doc would overflow
    val cap = CurationPack.SHARD_CAP
    shards.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).foreach { case (src, rows) =>
        var fileIdx = 0L; var fill = 0L; var first = true
        rows.sortBy(_._3).foreach { case (_, gotIdx, id, nb) =>
          if (!first && fill + nb > cap) { fileIdx += 1; fill = nb }
          else { fill += nb; first = false }
          assert(gotIdx == fileIdx, s"$src doc $id: file $gotIdx != $fileIdx")
        }
      }
  }

  test("datacard equals an independent re-aggregation of the decisions") {
    val dec = spark.read.parquet(s"$outDir/decisions.parquet")
    // independent SQL formulation over the decisions dump — conditional
    // aggregation so a source with ZERO kept docs still gets its row
    // (with NULL spread/mean), as the datacard must report it
    dec.createOrReplaceTempView("dec_t")
    val want = spark.sql(
      """SELECT source, count(*) AS n_raw,
        |  count(CASE WHEN keep THEN 1 END) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN n_tokens END) AS BIGINT) AS tot_tokens,
        |  min(CASE WHEN keep THEN n_tokens END) AS min_tokens,
        |  max(CASE WHEN keep THEN n_tokens END) AS max_tokens,
        |  count(CASE WHEN keep AND lang = 'en' THEN 1 END) AS n_en,
        |  (count(CASE WHEN keep THEN 1 END) * 10000) div count(*)
        |    AS keep_rate_bp,
        |  CASE WHEN count(CASE WHEN keep THEN 1 END) > 0 THEN
        |    CAST(sum(CASE WHEN keep
        |             THEN CAST(round(quality * 10000) AS BIGINT) END)
        |         AS BIGINT)
        |      div count(CASE WHEN keep THEN 1 END) END AS mean_quality_e4
        |FROM dec_t GROUP BY source ORDER BY source""".stripMargin).collect()
    val got = spark.read.parquet(s"$outDir/datacard.parquet")
      .orderBy(col("source")).collect()
    assert(got.sameElements(want))
    // quality scores ride q36's contract — spot-pin one survivor
    val q36 = TextPack.queries("q36_quality_score")(spark, sf)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val one = dec.filter(col("keep")).select(col("doc_id"), col("quality"))
      .head()
    assert(q36(one.getLong(0)) == one.getDouble(1))
  }
}
