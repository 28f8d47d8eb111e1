package graft

import org.apache.spark.sql.functions._

/** AQE runtime re-planning under skew — the second half of the engine's
  * skew story (SCALE.md): `Skew.salted*` is the declarative-rewrite half
  * (SkewSpec proves equivalence), this spec proves the RUNTIME half — a
  * hot join key re-planned by AdaptiveSparkPlanExec into a skew-split
  * sort-merge join, no query change needed. At 100 TB these compose:
  * salting for aggregations (where AQE cannot split a hash-agg key),
  * AQE skew-join for joins. */
class AqeSkewSpec extends GraftSuite {

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    import spark.implicits._
    val confs = Seq(
      // thresholds scaled down so local test data qualifies as "skewed":
      // a partition is split when > factor × median AND > threshold bytes
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // keep the join a sort-merge join (broadcast would hide the skew path)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: one pathologically hot key (0) carrying half the rows + a
      // uniform tail; right: uniform
      val left = spark.range(0, 200000)
        .select(when(col("id") % 2 =!= 0, col("id") % 1000).otherwise(0L).as("k"),
          concat(lit("payload-"), col("id")).as("pad"))
      val right = spark.range(0, 1000).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("name"))
      val joined = left.join(right, "k")
      // execute THIS dataset (count() would plan a separate query and leave
      // this one's adaptive plan unfinalized)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan isFinalPlan=true"),
        s"expected a finalized adaptive plan:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join (no skew=true):\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
