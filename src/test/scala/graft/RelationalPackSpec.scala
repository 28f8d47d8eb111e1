package graft

import graft.operators.RelationalPack

class RelationalPackSpec extends GraftSuite {

  test("every query returns rows at sf0.001 with matching oracle key") {
    RelationalPack.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0 || name == "q06_join_anti", s"$name returned no rows")
      assert(RelationalPack.oracle.contains(name), s"$name lacks oracle SQL")
    }
  }

  test("q01 aggregation invariant: count_order sums to filtered lineitem count") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    val q1 = RelationalPack.queries("q01_agg_basic")(spark, sf)
    val total = q1.agg(sum("count_order")).collect()(0).getLong(0)
    assert(total == li)
  }

  test("semi + anti partition customer table") {
    import org.apache.spark.sql.functions._
    val semi = RelationalPack.queries("q05_join_semi")(spark, sf)
      .agg(sum("n_customers_with_orders")).collect()(0).getLong(0)
    val anti = RelationalPack.queries("q06_join_anti")(spark, sf)
      .collect().map(_.getLong(1)).sum
    val all = Tables.customer(spark, sf).count()
    assert(semi + anti == all)
  }

  test("q09 top-n emits at most 5 per segment, descending") {
    val rows = RelationalPack.queries("q09_topn")(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val prices = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q13 rolling max is >= every event ts per user") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(max(unix_timestamp(col("ts"))).as("m"))
    val got = RelationalPack.queries("q13_rolling_max")(spark, sf)
    val joined = got.join(ev, "user_id")
      .filter(col("last_ts") =!= col("m")).count()
    assert(joined == 0)
  }
}
