package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-loop scratch bench for the optimization rounds: time ad-hoc variants
  * of a query side by side (same session/noop-sink contract as [[Bench]])
  * to attribute cost inside a plan before committing a rewrite. Variants
  * live in [[variants]] and are registered per experiment; this file is a
  * measurement tool, not part of the driver contract.
  *
  * Policy (r11 advice): "now" baselines call the PRODUCTION operators so
  * the lab cannot drift from what ships; only genuinely divergent variants
  * (alternate plans still under evaluation) are written out inline here.
  */
object OptLab {
  type Q = (SparkSession, String) => DataFrame

  /** name -> variant builder; edit freely per experiment. */
  def variants: Seq[(String, Q)] = {
    import org.apache.spark.sql.functions._
    def dp(s: SparkSession) = s.sparkContext.defaultParallelism

    // --- q21/q61/q22: does parallelizing the 1-task scan stage pay? ---
    // Divergent variants only: the "_rr" forms prepend a round-robin
    // repartition of the scan; the "now" baselines are the production
    // queries themselves (pass the query name on the command line).
    def q61body(ev: DataFrame): DataFrame =
      ev.groupBy(window(col("ts"), "12 hours", "1 hour").as("w"), col("user_id"))
        .agg(count(lit(1)).as("frequency"))
        .select(unix_timestamp(col("w.start")).as("wstart"), col("user_id"), col("frequency"))
        .orderBy(col("wstart"), col("user_id"))
    def q21body(ev: DataFrame): DataFrame =
      ev.groupBy(expr("(unix_timestamp(ts) div 1800) * 1800").as("b0"),
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
        .orderBy(col("wstart"), col("user_id"))
    def q22body(ev: DataFrame): DataFrame =
      ev.groupBy(window(col("ts"), "4 hours").as("w"), col("user_id"))
        .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
          count(lit(1)).as("n"))
        .select(unix_timestamp(col("w.start")).as("wstart"), col("user_id"),
          col("types"), col("n"))
        .orderBy(col("wstart"), col("user_id"))

    // _lc variants: materialize the (small) agg output before the final
    // global sort so the range-partitioner's sampling pass scans an
    // in-memory relation instead of re-executing the aggregation.
    def lcSort(df: DataFrame, cols: String*): DataFrame =
      df.localCheckpoint().orderBy(cols.map(col): _*)
    def q61lc(ev: DataFrame): DataFrame =
      lcSort(ev.groupBy(window(col("ts"), "12 hours", "1 hour").as("w"), col("user_id"))
        .agg(count(lit(1)).as("frequency"))
        .select(unix_timestamp(col("w.start")).as("wstart"), col("user_id"), col("frequency")),
        "wstart", "user_id")
    def q21lc(ev: DataFrame): DataFrame =
      lcSort(ev.groupBy(expr("(unix_timestamp(ts) div 1800) * 1800").as("b0"),
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
          count(lit(1)).as("n_types")),
        "wstart", "user_id")
    def q22lc(ev: DataFrame): DataFrame =
      lcSort(ev.groupBy(window(col("ts"), "4 hours").as("w"), col("user_id"))
        .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
          count(lit(1)).as("n"))
        .select(unix_timestamp(col("w.start")).as("wstart"), col("user_id"),
          col("types"), col("n")),
        "wstart", "user_id")

    // staged decomposition of q21/q61
    def q21p1(ev: DataFrame): DataFrame =
      ev.groupBy(expr("(unix_timestamp(ts) div 1800) * 1800").as("b0"),
          col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
    def q21p2(ev: DataFrame): DataFrame =
      q21p1(ev)
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
    def q61p1(ev: DataFrame): DataFrame =
      ev.groupBy(window(col("ts"), "12 hours", "1 hour").as("w"), col("user_id"))
        .agg(count(lit(1)).as("frequency"))
        .select(unix_timestamp(col("w.start")).as("wstart"), col("user_id"), col("frequency"))

    // v2: repartition the COLLAPSED (b0,u,t) rows by user BEFORE the ×24
    // fan-out — hash(u) satisfies every downstream grouping, so the fanned
    // stream never crosses the wire (one |p1|-row exchange instead of a
    // 24·|p1|-row one).
    def q21v2(s: SparkSession, ev: DataFrame): DataFrame =
      ev.groupBy(expr("(unix_timestamp(ts) div 1800) * 1800").as("b0"),
          col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .repartition(dp(s), col("user_id"))
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
        .orderBy(col("wstart"), col("user_id"))
    // v3: v2 with the raw scan shuffled straight to hash(u) (no phase-1
    // partial agg before a shuffle at all — one exchange fewer).
    def q21v3(s: SparkSession, ev: DataFrame): DataFrame =
      ev.repartition(dp(s), col("user_id"))
        .groupBy(expr("(unix_timestamp(ts) div 1800) * 1800").as("b0"),
          col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
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
        .orderBy(col("wstart"), col("user_id"))

    Seq(
      "q21_now" -> ((s: SparkSession, d: String) => q21body(Tables.events(s, d))),
      "q21_v2" -> ((s: SparkSession, d: String) => q21v2(s, Tables.events(s, d))),
      "q21_v3" -> ((s: SparkSession, d: String) => q21v3(s, Tables.events(s, d)))
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
