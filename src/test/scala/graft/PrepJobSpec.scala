package graft

import graft.jobs.PrepJob
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The feature-store prep job: contents must equal the online builders
  * (batch/stream determinism contract), and consumers joining on the
  * bucket key must get the zero-exchange plan the store exists for. */
class PrepJobSpec extends GraftSuite {

  test("prep store round-trips and bucket-key joins run without exchanges") {
    val tmp = Files.createTempDirectory("graft_prep").toString
    try {
      PrepJob.run(spark, sf, tmp, prefix = "preptest", buckets = 4)

      // contents: stored signatures == freshly built signatures (F6
      // determinism, reference README.md:112)
      val stored = spark.table("preptest_user_minhash")
      val fresh = graft.operators.RecommendationPack.sig(spark, sf)
      assert(stored.count() == fresh.count())
      assert(stored.exceptAll(fresh).isEmpty && fresh.exceptAll(stored).isEmpty,
        "stored minhash store drifted from the online signature builder")

      // the inverted index covers every user 16 times (one row per band)
      val bands = spark.table("preptest_lsh_buckets")
      assert(bands.groupBy(col("user_id")).count()
        .filter(col("count") =!= 16).count() == 0)

      // store-side join on the bucket key: features ⋈ minhash ⋈ last
      // activity with NO hash exchange (all three bucketed by user_id)
      val joined = spark.table("preptest_user_features")
        .join(spark.table("preptest_user_minhash"), "user_id")
        .join(spark.table("preptest_last_activity"), "user_id")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"feature-store join should be exchange-free:\n$plan")
    } finally {
      Seq("user_features", "user_minhash", "lsh_buckets", "last_activity")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS preptest_$t"))
    }
  }
}
