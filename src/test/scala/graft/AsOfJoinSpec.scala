package graft

import graft.plans.AsOfJoinOp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom as-of join operator stack: correctness vs an equivalent
  * window-function computation, no-match semantics, tie-breaks, and the
  * planner-inserted exchange/sort shape. */
class AsOfJoinSpec extends GraftSuite {

  import spark.implicits._

  private def asofSmall(tol: Long) = {
    val trades = Seq(
      (1L, 10L, 100L), (2L, 10L, 105L), (3L, 10L, 200L),
      (4L, 20L, 50L), (5L, 30L, 10L)
    ).toDF("trade_id", "sym", "tsec")
    val quotes = Seq(
      (10L, 99L, 1.0, 900L), (10L, 104L, 2.0, 901L), (10L, 104L, 3.0, 902L),
      (20L, 70L, 9.0, 903L), (30L, 9L, 5.0, 904L)
    ).toDF("q_sym", "q_tsec", "px", "q_id")
    AsOfJoinOp.asof(trades, quotes, "sym", "tsec", "q_sym", "q_tsec", "q_id", tol)
      .select(col("trade_id"), col("px"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
  }

  test("latest strictly-prior row wins, ties break to the largest tie column") {
    val got = asofSmall(tol = 1000L)
    assert(got(1L) == Some(1.0))  // only the 99-quote is prior to 100
    assert(got(2L) == Some(3.0))  // two quotes at 104: larger q_id wins
    assert(got(3L) == Some(3.0))  // still the latest at 104
    assert(got(4L) == None)       // quote at 70 is in the future of 50
    assert(got(5L) == Some(5.0))
  }

  test("tolerance cuts off stale matches; strict inequality excludes same-second rows") {
    val got = asofSmall(tol = 3L)
    assert(got(1L) == Some(1.0))  // 100-99 = 1 <= 3
    assert(got(2L) == Some(3.0))  // 105-104 = 1
    assert(got(3L) == None)       // 200-104 = 96 > 3
    val strict = {
      val l = Seq((1L, 1L, 100L)).toDF("id", "k", "t")
      val r = Seq((1L, 100L, 7.0, 1L)).toDF("rk", "rt", "v", "ri")
      AsOfJoinOp.asof(l, r, "k", "t", "rk", "rt", "ri", 10L).collect()(0)
    }
    assert(strict.isNullAt(strict.length - 2) || strict.isNullAt(4),
      "same-second right row must NOT match (strict <)")
  }

  test("as-of exec equals the window-function formulation on real events") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("tsec"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_timestamp(col("ts")).as("v_tsec"),
        col("value").as("v_value"), col("event_id").as("v_eid"))
    val custom = AsOfJoinOp.asof(purchases, views,
        "user_id", "tsec", "v_user", "v_tsec", "v_eid", 21600L)
      .select(col("event_id"), col("v_value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // window formulation: views and purchases interleaved per user by
    // (tsec, is-view-first at equal tsec? strict < means views at the same
    // second are EXCLUDED, so order views before purchases breaks exactly
    // nothing: sort by (tsec, isPurchase) and use a strict frame)
    val tagged = views
      .select(col("v_user").as("user_id"), col("v_tsec").as("tsec"),
        col("v_value"), col("v_eid").as("ord"), lit(0).as("kind"), lit(0L).as("event_id"))
      .unionByName(purchases.select(col("user_id"), col("tsec"),
        lit(null).cast("double").as("v_value"), col("event_id").as("ord"),
        lit(1).as("kind"), col("event_id")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsec"), col("kind"), col("ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = tagged
      .withColumn("pv", last(when(col("kind") === 0, col("v_value")), ignoreNulls = true).over(w))
      .withColumn("pvt", last(when(col("kind") === 0, col("tsec")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      // strict <: a view at the SAME second sorts before the purchase and
      // lands in the frame — drop it via the time test below
      .select(col("event_id"),
        when(col("pvt").isNotNull && col("pvt") < col("tsec")
          && col("tsec") - col("pvt") <= 21600, col("pv")).as("pv"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(custom.keySet == expected.keySet)
    val diffs = custom.keySet.filter(k => custom(k) != expected(k))
    assert(diffs.isEmpty, s"${diffs.size} diverge, e.g. ${diffs.take(3).map(k => (k, custom(k), expected(k)))}")
  }

  test("randomized as-of join matches a brute-force reference (3 seeds, dense key collisions)") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // few keys + coarse times force heavy same-key/same-second collisions
      val lefts = (1 to 200).map(i =>
        (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(300).toLong))
      val rights = (1 to 300).map(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(300).toLong, rnd.nextInt(1000) / 10.0, i.toLong))
      val tol = 50L
      val got = AsOfJoinOp.asof(
          lefts.toDF("id", "k", "t"), rights.toDF("rk", "rt", "v", "ri"),
          "k", "t", "rk", "rt", "ri", tol)
        .select("id", "v").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val exp = lefts.map { case (id, k, t) =>
        val cands = rights.filter(r => r._1 == k && r._2 < t && t - r._2 <= tol)
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(r => (r._2, r._4))._3))
      }.toMap
      assert(got.size == exp.size)
      val bad = exp.keySet.filter(k => got(k) != exp(k))
      assert(bad.isEmpty,
        s"seed $seed: ${bad.size} diverge, e.g. ${bad.take(3).map(k => (k, got(k), exp(k)))}")
    }
  }

  test("planner inserts exchanges and per-partition sorts around AsOfJoinExec") {
    val l = Seq((1L, 1L, 100L)).toDF("id", "k", "t")
    val r = Seq((1L, 90L, 7.0, 1L)).toDF("rk", "rt", "v", "ri")
    val df = AsOfJoinOp.asof(l, r, "k", "t", "rk", "rt", "ri", 100L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in explain output
    assert(plan.contains("AsOfJoin "), s"custom exec missing:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"no co-partitioning:\n$plan")
    assert(plan.contains("Sort ["), s"no per-partition sort:\n$plan")
  }

  test("exec reports SQL metrics: output rows and matched rows") {
    val l = Seq((1L, 1L, 100L), (2L, 1L, 500L), (3L, 2L, 100L))
      .toDF("id", "k", "t")
    val r = Seq((1L, 90L, 7.0, 1L)).toDF("rk", "rt", "v", "ri")
    val df = AsOfJoinOp.asof(l, r, "k", "t", "rk", "rt", "ri", 100L)
    df.collect()
    // AQE hides the operator tree behind leaf QueryStageExec wrappers —
    // descend through them explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findExec(p: SparkPlan): Option[graft.plans.AsOfJoinExec] = p match {
      case e: graft.plans.AsOfJoinExec => Some(e)
      case a: AdaptiveSparkPlanExec => findExec(a.executedPlan)
      case q: QueryStageExec => findExec(q.plan)
      case other => other.children.view.flatMap(findExec(_)).headOption
    }
    val exec = findExec(df.queryExecution.executedPlan)
      .getOrElse(fail("AsOfJoinExec not found in executed plan"))
    assert(exec.metrics("numOutputRows").value == 3L)
    // only (id=1) matches: id=2 is beyond tolerance, id=3 is another key
    assert(exec.metrics("numMatched").value == 1L)
  }
}
