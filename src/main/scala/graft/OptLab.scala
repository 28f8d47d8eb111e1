package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-loop scratch bench for the optimization rounds: time ad-hoc variants
  * of a query side by side (same session/noop-sink contract as [[Bench]])
  * to attribute cost inside a plan before committing a rewrite. Variants
  * live in [[variants]] and are registered per experiment; this file is a
  * measurement tool, not part of the driver contract.
  */
object OptLab {
  type Q = (SparkSession, String) => DataFrame

  /** name -> variant builder; edit freely per experiment. */
  def variants: Seq[(String, Q)] = {
    import org.apache.spark.sql.functions._
    def q21body(s: SparkSession, d: String): DataFrame =
      Tables.events(s, d)
        .groupBy(expr("(unix_timestamp(ts) div 1800) * 1800").as("b0"),
          col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("b0"), col("user_id"), col("event_type"), col("n"),
          explode(sequence(lit(0), lit(23))).as("k"))
        .select((col("b0") - col("k") * 1800).as("wstart"), col("user_id"),
          col("event_type"), col("n"))
        .repartition(col("wstart"), col("user_id"))
        .groupBy(col("wstart"), col("user_id"), col("event_type"))
        .agg(sum(col("n")).as("n"))
        .groupBy(col("wstart"), col("user_id"))
        .agg(
          sum(col("n")).as("n_events"),
          sum(when(col("event_type") === "purchase", col("n")).otherwise(0L)).as("n_purchase"),
          sum(when(col("event_type") === "click", col("n")).otherwise(0L)).as("n_click"),
          count(lit(1)).as("n_types"))
    Seq(
      "q21_v1_noorder" -> ((s: SparkSession, d: String) => q21body(s, d)),
      "q21_v2_coalesce_sort" -> ((s: SparkSession, d: String) =>
        q21body(s, d).coalesce(1)
          .sortWithinPartitions(col("wstart"), col("user_id"))),
      "q21_v3_phase1_only" -> ((s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(expr("(unix_timestamp(ts) div 1800) * 1800").as("b0"),
            col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("b0"), col("user_id"), col("event_type"), col("n"),
            explode(sequence(lit(0), lit(23))).as("k"))
          .select((col("b0") - col("k") * 1800).as("wstart"), col("user_id"),
            col("event_type"), col("n"))),
      "q21_v4_orderby" -> ((s: SparkSession, d: String) =>
        q21body(s, d).orderBy(col("wstart"), col("user_id"))),
      "q21_v6_upart" -> ((s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(expr("(unix_timestamp(ts) div 1800) * 1800").as("b0"),
            col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .repartition(col("user_id"))
          .select(col("b0"), col("user_id"), col("event_type"), col("n"),
            explode(sequence(lit(0), lit(23))).as("k"))
          .select((col("b0") - col("k") * 1800).as("wstart"), col("user_id"),
            col("event_type"), col("n"))
          .groupBy(col("wstart"), col("user_id"), col("event_type"))
          .agg(sum(col("n")).as("n"))
          .groupBy(col("wstart"), col("user_id"))
          .agg(
            sum(col("n")).as("n_events"),
            sum(when(col("event_type") === "purchase", col("n")).otherwise(0L)).as("n_purchase"),
            sum(when(col("event_type") === "click", col("n")).otherwise(0L)).as("n_click"),
            count(lit(1)).as("n_types"))
          .orderBy(col("wstart"), col("user_id"))),
      "q61_v2_upart" -> ((s: SparkSession, d: String) =>
        Tables.events(s, d)
          .repartition(col("user_id"))
          .groupBy(window(col("ts"), "12 hours", "1 hour").as("w"), col("user_id"))
          .agg(count(lit(1)).as("frequency"))
          .select(unix_timestamp(col("w.start")).as("wstart"), col("user_id"), col("frequency"))
          .orderBy(col("wstart"), col("user_id"))),
      "q61_v1_current" -> ((s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "12 hours", "1 hour").as("w"), col("user_id"))
          .agg(count(lit(1)).as("frequency"))
          .select(unix_timestamp(col("w.start")).as("wstart"), col("user_id"), col("frequency"))
          .orderBy(col("wstart"), col("user_id"))),
      "q21_v5_rangepart" -> ((s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(expr("(unix_timestamp(ts) div 1800) * 1800").as("b0"),
            col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("b0"), col("user_id"), col("event_type"), col("n"),
            explode(sequence(lit(0), lit(23))).as("k"))
          .select((col("b0") - col("k") * 1800).as("wstart"), col("user_id"),
            col("event_type"), col("n"))
          .repartitionByRange(col("wstart"), col("user_id"))
          .groupBy(col("wstart"), col("user_id"), col("event_type"))
          .agg(sum(col("n")).as("n"))
          .groupBy(col("wstart"), col("user_id"))
          .agg(
            sum(col("n")).as("n_events"),
            sum(when(col("event_type") === "purchase", col("n")).otherwise(0L)).as("n_purchase"),
            sum(when(col("event_type") === "click", col("n")).otherwise(0L)).as("n_click"),
            count(lit(1)).as("n_types"))
          .orderBy(col("wstart"), col("user_id")))
    )
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all: Seq[(String, Q)] =
      variants ++ args.filter(SparkEntry.queries.contains)
        .map(n => n -> SparkEntry.queries(n))
    all.foreach { case (name, fn) => // warm: JIT + codegen + caches
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$name WARM-FAIL: ${e.getMessage}") }
    }
    all.foreach { case (name, fn) =>
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t0) / 1e9)
      }
      val b = times.minBy(_._2)
      println(f"$name%-40s best=${b._2}%.3f plan=${b._1}%.3f  runs=${times.map(t => f"${t._2}%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
