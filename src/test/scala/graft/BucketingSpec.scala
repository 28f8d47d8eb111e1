package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketed co-located joins — the pre-shuffle technique for joins run
  * repeatedly on the same key at 100 TB (SURVEY §4.1 "hash partitioning"
  * row; the builder directive's "bucketing for co-located joins"). Writing
  * both sides bucketed by the join key eliminates BOTH exchanges from a
  * sort-merge join; aggregation on the bucket key loses its exchange too. */
class BucketingSpec extends GraftSuite {

  test("join of two tables bucketed on the key runs with zero shuffle exchanges") {
    val tmp = Files.createTempDirectory("graft_bucket").toString
    val ev = Tables.events(spark, sf)
    try {
      ev.select(col("user_id"), col("event_id"), col("value"))
        .write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$tmp/a").saveAsTable("bk_a")
      ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$tmp/b").saveAsTable("bk_b")

      val joined = spark.table("bk_a").join(spark.table("bk_b"), "user_id")
        .filter(col("n") > 0)
      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      val agg = spark.table("bk_a").groupBy(col("user_id"))
        .agg(sum(col("value")).as("s"))
      agg.collect()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation still shuffles:\n$aggPlan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }
}
