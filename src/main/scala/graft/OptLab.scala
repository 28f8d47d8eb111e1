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
    import org.apache.spark.sql.expressions.Window
    def dp(s: SparkSession) = s.sparkContext.defaultParallelism

    // --- q21/q61/q22: does parallelizing the 1-task scan stage pay? ---
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
    def q61body(ev: DataFrame): DataFrame =
      ev.groupBy(window(col("ts"), "12 hours", "1 hour").as("w"), col("user_id"))
        .agg(count(lit(1)).as("frequency"))
        .select(unix_timestamp(col("w.start")).as("wstart"), col("user_id"), col("frequency"))
        .orderBy(col("wstart"), col("user_id"))
    def q22body(ev: DataFrame): DataFrame =
      ev.groupBy(window(col("ts"), "4 hours").as("w"), col("user_id"))
        .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
          count(lit(1)).as("n"))
        .select(unix_timestamp(col("w.start")).as("wstart"), col("user_id"),
          col("types"), col("n"))
        .orderBy(col("wstart"), col("user_id"))

    // --- q115 pagerank: SHJ in the loop / cost of the final sort ---
    def replyEdges(s: SparkSession, d: String): (DataFrame, DataFrame) = {
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"))
      val rep = operators.GraphPack.edges(s, d).filter(col("parent_id").isNotNull)
        .select(col("event_id"), col("parent_id"))
      val re = rep
        .join(ev.as("c"), rep("event_id") === col("c.event_id"))
        .join(ev.as("p"), rep("parent_id") === col("p.event_id"))
        .select(col("c.user_id").as("src"), col("p.user_id").as("dst"))
      (re, ev.select(col("user_id").as("node")).distinct())
    }
    def pageRankShj(edges: DataFrame, nodes: DataFrame, iters: Int = 5): DataFrame = {
      val PR_SCALE = 1000000000L; val PR_DNUM = 17L; val PR_DDEN = 20L
      val e = edges.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      val ew = e.join(
          e.groupBy(col("src")).agg(sum(col("w")).cast("long").as("tw")),
          "src").repartition(col("src")).cache()
      val withN = nodes.crossJoin(broadcast(
        nodes.agg(count(lit(1)).as("n_nodes"))))
        .repartition(col("node")).cache()
      val r0 = withN.select(col("node"),
        expr(s"$PR_SCALE div n_nodes").cast("long").as("rank"))
      (1 to iters).foldLeft(r0) { (r, _) =>
        val cin = ew.join(r.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
          .select(col("dst").as("node"),
            expr(s"($PR_DNUM * rank * w) div ($PR_DDEN * tw)").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).cast("long").as("cin"))
        withN.join(cin.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"),
            (expr(s"${(PR_DDEN - PR_DNUM) * PR_SCALE} div ($PR_DDEN * n_nodes)")
              + coalesce(col("cin"), lit(0L))).cast("long").as("rank"))
      }
    }

    // --- q89 hybrid search: attribute shared-agg vs cosine-join vs windows ---
    import operators.SimilarityPack
    def hybShared(s: SparkSession, d: String): DataFrame = {
      val dt = SimilarityPack.cappedTokenRows(s, d).cache()
      dt.filter(col("doc_id") % SimilarityPack.HYB_QMOD === 0
          && col("doc_id") < SimilarityPack.HYB_QCAP)
        .select(col("doc_id").as("qid"), col("tok")).as("q")
        .join(dt.as("c"), col("q.tok") === col("c.tok")
          && col("qid") =!= col("c.doc_id"))
        .groupBy(col("qid"), col("c.doc_id").as("cid"))
        .agg(count(lit(1)).as("shared"))
    }
    def hybCand(s: SparkSession, d: String): DataFrame = {
      val e = SimilarityPack.vecs(s, d)
      hybShared(s, d)
        .join(e.select(col("vec_id").as("qid"), col("v").as("qv"),
          col("norm").as("qn")), "qid")
        .join(e.select(col("vec_id").as("cid"), col("v").as("cv"),
          col("norm").as("cn")), "cid")
        .withColumn("cos6", round(
          graft.functions.VecDot.of(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    }

    // --- q120 quantized ANN: vec_dot over double codes vs zip_with fold ---
    def q120VecDot(s: SparkSession, d: String): DataFrame = {
      val e = SimilarityPack.vecs(s, d)
      val gmax = e.agg(
        max(expr("array_max(transform(v, x -> abs(x / norm)))")).as("gmax"))
      val qz = e.crossJoin(broadcast(gmax))
        .withColumn("qv", expr(
          """transform(v, x -> GREATEST(CAST(-127 AS DOUBLE),
            |  LEAST(CAST(127 AS DOUBLE), FLOOR(x / norm * 127.0D / gmax))))""".stripMargin))
        .select(col("vec_id"), col("qv"))
      val probes = qz.filter(SimilarityPack.annPanel(col("vec_id")))
        .select(col("vec_id").as("qid"), col("qv").as("pq"))
      val w = Window.partitionBy(col("qid")).orderBy(col("dotq").desc, col("nid"))
      qz.join(broadcast(probes), col("vec_id") =!= col("qid"))
        .withColumn("dotq",
          graft.functions.VecDot.of(col("pq"), col("qv")).cast("long"))
        .select(col("qid"), col("vec_id").as("nid"), col("dotq"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= SimilarityPack.TOP_K)
        .select(col("qid"), col("rank"), col("nid"), col("dotq"))
        .orderBy(col("qid"), col("rank"))
    }

    // --- q131 / q172: pre-filter the orders side of the fact shuffle ---
    def q131Pre(s: SparkSession, d: String): DataFrame = {
      val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100).cast("long")
      val promo = Tables.part(s, d).filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val supps = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val asiaCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d).as("cn")),
          col("c_nationkey") === col("cn.n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("cn.n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val ordersAsia = Tables.orders(s, d)
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"))
      Tables.lineitem(s, d)
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supps), col("l_suppkey") === col("s_suppkey"))
        .join(ordersAsia, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_1", cents).otherwise(0L))
          .cast("long").as("nation1_cents"),
          sum(cents).cast("long").as("total_cents"),
          count(lit(1)).as("n_items"))
        .withColumn("share_ppm",
          expr("(nation1_cents * 1000000) div total_cents"))
        .orderBy(col("o_year"))
    }
    def q172Pre(s: SparkSession, d: String): DataFrame = {
      val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100).cast("long")
      val nations = Seq("NATION_3", "NATION_8")
      val supp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin(nations: _*))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin(nations: _*))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ordersNat = Tables.orders(s, d)
        .join(broadcast(cust), col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .join(broadcast(supp), col("s_suppkey") === col("l_suppkey"))
        .join(ordersNat, col("o_orderkey") === col("l_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .withColumn("l_year", year(col("l_shipdate")).cast("long"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(cents).cast("long").as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }

    Seq(
      "ev_scan" -> ((s: SparkSession, d: String) => Tables.events(s, d)),
      "q61_now" -> ((s: SparkSession, d: String) => q61body(Tables.events(s, d))),
      "q61_rr" -> ((s: SparkSession, d: String) =>
        q61body(Tables.events(s, d).repartition(dp(s)))),
      "q21_now" -> ((s: SparkSession, d: String) => q21body(Tables.events(s, d))),
      "q21_rr" -> ((s: SparkSession, d: String) =>
        q21body(Tables.events(s, d).repartition(dp(s)))),
      "q22_now" -> ((s: SparkSession, d: String) => q22body(Tables.events(s, d))),
      "q22_rr" -> ((s: SparkSession, d: String) =>
        q22body(Tables.events(s, d).repartition(dp(s)))),
      "pr_now" -> ((s: SparkSession, d: String) => {
        val (re, nodes) = replyEdges(s, d)
        operators.GraphPack.pageRank(re, nodes)
          .select(col("node").as("user_id"), col("rank"))
          .orderBy(col("user_id"))
      }),
      "pr_noorder" -> ((s: SparkSession, d: String) => {
        val (re, nodes) = replyEdges(s, d)
        operators.GraphPack.pageRank(re, nodes)
          .select(col("node").as("user_id"), col("rank"))
      }),
      "pr_shj" -> ((s: SparkSession, d: String) => {
        val (re, nodes) = replyEdges(s, d)
        pageRankShj(re, nodes)
          .select(col("node").as("user_id"), col("rank"))
          .orderBy(col("user_id"))
      }),
      "h_shared" -> ((s: SparkSession, d: String) => hybShared(s, d)),
      "h_cand" -> ((s: SparkSession, d: String) => hybCand(s, d)),
      "sq_vecdot" -> ((s: SparkSession, d: String) => q120VecDot(s, d)),
      "ms_pre" -> ((s: SparkSession, d: String) => q131Pre(s, d)),
      "vs_pre" -> ((s: SparkSession, d: String) => q172Pre(s, d))
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
