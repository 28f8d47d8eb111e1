package graft.jobs

import graft.Tables
import graft.operators.RecommendationPack
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch feature-store preparation — the reference's data-prep job
  * (reference: jobs/preparation/LoadStaticDataJob.scala:16-137, which
  * loads person/forum features, MinHash signatures, LSH buckets, and
  * known-person lists into ElasticSearch before the streaming jobs run).
  * Here the store is BUCKETED PARQUET TABLES: the streaming/batch
  * consumers join them on their bucket key with zero shuffle on the
  * store side — the role ES point-lookups played, served by co-location
  * instead of a remote KV store (SURVEY §2.4 J2–J8 → native joins).
  *
  * Tables written (all under `<prefix>_`):
  *   user_features  (user_id, features sorted-csv, n_features) — bucketed
  *                  by user_id                                  [A4/U2]
  *   user_minhash   (user_id, m0..m63)             — bucketed by user_id
  *                  — the SAME signature module the online pipeline uses:
  *                  the reference's batch/stream MinHash determinism
  *                  contract (README.md:112)                    [F6]
  *   lsh_buckets    (band, bandkey, user_id)       — bucketed by bandkey
  *                  (the inverted index, one row per membership) [A5/F7]
  *   last_activity  (user_id, last_ts)             — bucketed by user_id
  *                  (J12's recency store / A8 rolling max)      [A8]
  *
  * At 100 TB, bucket counts scale with data (buckets ≈ store size /
  * target file size); consumers that join on the bucket key skip both
  * exchange AND sort (bucketBy + sortBy), exactly BucketingSpec's
  * measured zero-exchange plan.
  */
object PrepJob {

  def run(spark: SparkSession, sfDir: String, warehousePath: String,
          prefix: String = "prep", buckets: Int = 8): Unit = {
    def save(df: org.apache.spark.sql.DataFrame, name: String, key: String): Unit =
      df.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, key).sortBy(key)
        .option("path", s"$warehousePath/$name")
        .saveAsTable(s"${prefix}_$name")

    save(RecommendationPack.features(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(array_join(sort_array(collect_list(col("feature"))), ",").as("features"),
        count(lit(1)).as("n_features")),
      "user_features", "user_id")

    save(RecommendationPack.sig(spark, sfDir), "user_minhash", "user_id")

    save(RecommendationPack.sig(spark, sfDir)
      .select(col("user_id"),
        posexplode(array(RecommendationPack.bandKeyCols: _*))
          .as(Seq("band", "bandkey")))
      .select(col("band"), col("bandkey"), col("user_id")),
      "lsh_buckets", "bandkey")

    save(Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(max(unix_timestamp(col("ts"))).as("last_ts")),
      "last_activity", "user_id")
  }

  /** CLI entry: PrepJob <sfDir> <warehousePath> */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, out) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, out)
    spark.stop()
  }
}
