package graft

import graft.operators.RelationalPack
import org.apache.spark.sql.functions.{col, expr, lit}

class RelationalPackSpec extends GraftSuite {

  test("q132 rollup hierarchy reconciles: details sum to subtotals sum to the grand total") {
    val rows = RelationalPack.queries("q132_rollup")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val detail = rows.filter(_._3 == 0L)
    val sub = rows.filter(_._3 == 1L)
    val grand = rows.filter(_._3 == 3L)
    assert(grand.length == 1)
    assert(detail.map(_._4).sum == grand.head._4)
    assert(sub.map(_._4).sum == grand.head._4)
    assert(detail.map(_._5).sum == grand.head._5)
    // each subtotal equals its detail slice
    sub.foreach { case (rf, _, _, cents, n) =>
      val mine = detail.filter(_._1 == rf)
      assert(mine.map(_._4).sum == cents && mine.map(_._5).sum == n)
    }
    // cube = rollup + the column-wise (gid=2) sets, identical elsewhere
    val cube = RelationalPack.queries("q133_cube")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(cube.filter(_._3 != 2L).sortBy(t => (t._3, t._1, t._2)).toSeq ==
      rows.sortBy(t => (t._3, t._1, t._2)).toSeq)
    val byStatus = cube.filter(_._3 == 2L)
    assert(byStatus.nonEmpty)
    byStatus.foreach { case (_, ls, _, cents, n) =>
      val mine = detail.filter(_._2 == ls)
      assert(mine.map(_._4).sum == cents && mine.map(_._5).sum == n)
    }
  }

  test("every query returns rows at sf0.001 with matching oracle key") {
    RelationalPack.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0 || name == "q06_join_anti", s"$name returned no rows")
      assert(RelationalPack.oracle.contains(name), s"$name lacks oracle SQL")
    }
  }

  test("q75 top-10 revenue orders are the true argmax set") {
    import org.apache.spark.sql.functions._
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
      .cast("long")
    val truth = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      .join(Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, sf)
          .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey")).agg(sum(cents).as("rev"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy { case (k, r) => (-r, k) }.take(10)
    val got = RelationalPack.queries("q75_shipping_priority")(spark, sf)
      .select(col("o_orderkey"), col("revenue_cents")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toSeq == truth.toSeq)
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("q76 returns exactly the orders whose quantity sum exceeds the cut") {
    import org.apache.spark.sql.functions._
    val expect = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("q"))
      .filter(col("q") > 250)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = RelationalPack.queries("q76_big_orders")(spark, sf)
      .select(col("o_orderkey"), col("total_qty")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("q80 exact quantiles match a local sort; GK rank-bound booleans hold") {
    import org.apache.spark.sql.functions._
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (k, rs) =>
        k -> rs.map(_.getDouble(1)).sorted
      }
    val got = RelationalPack.queries("q80_quantile_sketch")(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == byType.keySet)
    got.foreach { r =>
      val vals = byType(r.getString(0)); val n = vals.length
      assert(r.getAs[Long]("n") == n)
      // kth-smallest with k = ceil(q*n) — the discrete quantile the query
      // and its oracle both emit
      def kth(q: Double): Double = vals(math.ceil(q * n).toInt - 1)
      assert(r.getAs[Double]("p50_exact") == kth(0.5))
      assert(r.getAs[Double]("p90_exact") == kth(0.9))
      // the in-query rank audit of the GK sketch must have passed
      assert(r.getAs[Boolean]("p50_ok"), s"${r.getString(0)} p50 outside bound")
      assert(r.getAs[Boolean]("p90_ok"), s"${r.getString(0)} p90 outside bound")
    }
  }

  test("q79 HLL estimates land within the m=256 error bound of exact distinct counts") {
    import org.apache.spark.sql.functions._
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    val got = RelationalPack.queries("q79_hll_distinct")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("m_used"), r.getAs[Long]("est_users"))).toMap
    assert(got.keySet == exact.keySet + "ALL")
    (exact + ("ALL" -> exactAll)).foreach { case (k, n) =>
      val (mUsed, est) = got(k)
      // deterministic m=256 HLL: linear counting in the small range,
      // raw harmonic estimator above it — 3 sigma ≈ 3*1.04/sqrt(256) ≈ 20%
      // (the old DataSketches lgK=12 impl claimed 3% but was not
      // oracle-checkable; determinism is the tradeoff)
      assert(math.abs(est - n) <= math.max(2L, (0.20 * n).toLong),
        s"$k: est $est vs exact $n")
      // register state is plausible: used buckets can't exceed distinct keys
      assert(mUsed <= math.min(256L, n))
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

  test("q149 small-quantity revenue equals a driver recompute; single scan, per-part windows") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_returnflag"),
        col("l_quantity").cast("long"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val perPart = li.groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._3).sum)).toMap
    val want = li.filter { case (pk, _, qty, _) =>
      val (n, s) = perPart(pk); 5 * qty * n < s
    }.groupBy(_._2).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._4).sum)).toMap
    val got = RelationalPack.queries("q149_small_qty_revenue")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"$got vs $want")
    assert(got.nonEmpty)
    val plan = RelationalPack.queries("q149_small_qty_revenue")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"per-part threshold must ride a window, not a self-join re-scan:\n$plan")
  }

  test("q148 dormant premium equals a driver recompute; threshold matches the float avg") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"),
        expr("CAST(floor(c_acctbal * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").cast("long")).collect().map(_.getLong(0)).toSet
    val pos = cust.map(_._3).filter(_ > 0)
    val (n, s) = (pos.length.toLong, pos.sum)
    val want = cust
      .filter { case (ck, _, cents) => cents * n > s && !urgent(ck) }
      .groupBy(_._2 % 5).view.mapValues { rs =>
        (rs.length.toLong, rs.map(_._3).sum)
      }.toMap
    val got = RelationalPack.queries("q148_dormant_premium")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"$got vs $want")
    assert(got.nonEmpty)
    // the integer cross-multiplication is the same predicate as the float
    // mean on this data (cents*n > s  ⟺  cents > s/n)
    val mean = s.toDouble / n
    cust.foreach { case (_, _, cents) =>
      assert((cents * n > s) == (cents > mean))
    }
  }

  test("q147 sole-late suppliers equal a driver-side exists/not-exists recompute") {
    val l = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        // the TPC-H dates are TIMESTAMP_NTZ; session tz is UTC so the
        // cast relabels the same instant
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").as("ship"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("od"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val suppsByOrder = l.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val late = l.filter(r => r._3 > r._4 + 60L * 86400 * 1000000)
    val lateSuppsByOrder = late.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val counted = late.filter { case (ok, sk, _, _) =>
      suppsByOrder(ok).exists(_ != sk) && lateSuppsByOrder(ok) == Set(sk)
    }.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val names = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = counted.toSeq.map { case (sk, n) => (names(sk), n) }
      .sortBy { case (nm, n) => (-n, nm) }.take(20)
    val got = RelationalPack.queries("q147_waiting_suppliers")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"$got vs $want")
    assert(got.nonEmpty, "the 60-day threshold must fire at sf0.001")
  }

  test("q154 order-count distribution equals a driver recompute; zero bucket present") {
    val custs = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
    val perCust = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey").cast("long")).collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = custs.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = RelationalPack.queries("q154_order_count_dist")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"$got vs $want")
    // the Q13 trap: customers whose every order fails the filter (or who
    // have no orders) must land in the zero bucket, not vanish
    assert(got.getOrElse(0L, 0L) ==
      custs.count(c => !perCust.contains(c)).toLong)
  }

  test("q158 returned-item revenue equals a driver recompute; top-20 exact") {
    val orders = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-04-01").cast("timestamp"))
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_name"), col("c_nationkey").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val nations = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").cast("long"),
        expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perCust = li.flatMap { case (ok, c) => orders.get(ok).map(_ -> c) }
      .groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).sum, rs.length.toLong)).toMap
    val want = perCust.toSeq
      .sortBy { case (ck, (rev, _)) => (-rev, ck) }.take(20)
    val got = RelationalPack.queries("q158_returned_items")(spark, sf).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (r, (ck, (rev, n))) =>
      assert(r.getLong(0) == ck)
      assert(r.getString(1) == cust(ck)._1)
      assert(r.getString(2) == nations(cust(ck)._2))
      assert(r.getLong(3) == rev)
      assert(r.getLong(4) == n)
    }
  }

  test("q155 top supplier equals a driver recompute over exact cents") {
    val rev = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
      .select(col("l_suppkey").cast("long"),
        expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val mx = rev.values.max
    val want = rev.filter(_._2 == mx).keys.toSeq.sorted
    val got = RelationalPack.queries("q155_top_supplier")(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == want)
    got.foreach(r => assert(r.getLong(2) == mx))
  }

  test("q167 priority census equals a driver recompute; counts once per order") {
    val returned = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").cast("long"))
      .collect().map(_.getLong(0)).toSet
    val want = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
      .select(col("o_orderkey").cast("long"), col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(o => returned.contains(o._1))          // membership, not join:
      .groupBy(_._2).view.mapValues(_.length.toLong) // 5 lines still = 1 order
      .toMap
    val got = RelationalPack.queries("q167_priority_census")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"$got vs $want")
    assert(got.size > 1, "census spans priorities")
  }

  test("q168 ship-delay census equals a driver recompute incl. negative buckets") {
    val od = Tables.orders(spark, sf)
      .select(col("o_orderkey").cast("long"),
        expr("CAST(datediff(o_orderdate, DATE '1970-01-01') AS LONG)"),
        col("o_orderpriority"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val want = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").cast("long"),
        expr("CAST(datediff(l_shipdate, DATE '1970-01-01') AS LONG)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (ok, sd) => od.get(ok).map { case (odn, pr) =>
        (math.floor((sd - odn) / 30.0).toLong,
          pr == "1-URGENT" || pr == "2-HIGH")
      } }
      .groupBy(_._1).view
      .mapValues(rs => (rs.count(_._2).toLong, rs.count(!_._2).toLong)).toMap
    val got = RelationalPack.queries("q168_ship_delay_census")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    assert(got.keys.min < 0L, "negative delays exercise the floor-vs-div trap")
  }

  test("q169 disjunctive revenue equals a driver recompute; every clause fires") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey").cast("long"), col("p_brand"),
        col("p_size").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_partkey").cast("long"), col("l_quantity"),
        expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def clause(brand: String, sz: (Long, Long), qt: (Double, Double))(
        pk: Long, q: Double): Boolean =
      parts.get(pk).exists { case (b, s) =>
        b == brand && s >= sz._1 && s <= sz._2 && q >= qt._1 && q <= qt._2 }
    val c1 = clause("Brand#1", (1L, 15L), (1.0, 20.0)) _
    val c2 = clause("Brand#2", (10L, 30L), (15.0, 35.0)) _
    val c3 = clause("Brand#3", (20L, 50L), (30.0, 50.0)) _
    val hits = rows.filter { case (pk, q, _) =>
      c1(pk, q) || c2(pk, q) || c3(pk, q) }
    val got = RelationalPack.queries("q169_disjunctive_revenue")(spark, sf).head()
    assert(got.getLong(0) == hits.map(_._3).sum)
    assert(got.getLong(1) == hits.length.toLong)
    Seq(c1, c2, c3).foreach { c =>
      assert(rows.exists { case (pk, q, _) => c(pk, q) }, "a clause never fired")
    }
  }

  test("q172 volume shipping equals a driver recompute; both directions live") {
    val nk = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sup = Tables.supplier(spark, sf)
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long"))
      .collect().map(r => r.getLong(0) -> nk(r.getLong(1))).toMap
    val cst = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .collect().map(r => r.getLong(0) -> nk(r.getLong(1))).toMap
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Set("NATION_3", "NATION_8")
    val want = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .select(col("l_orderkey").cast("long"), col("l_suppkey").cast("long"),
        expr("CAST(year(l_shipdate) AS LONG)"),
        expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"))
      .collect()
      .map(r => (sup(r.getLong(1)), cst(ord(r.getLong(0))), r.getLong(2), r.getLong(3)))
      .filter(t => two(t._1) && two(t._2) && t._1 != t._2)
      .groupBy(t => (t._1, t._2, t._3)).view
      .mapValues(rs => (rs.map(_._4).sum, rs.length.toLong)).toMap
    val got = RelationalPack.queries("q172_volume_shipping")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
    assert(got.keys.map(_._1).toSet == two, "both flow directions live")
  }

  test("q173 product profit equals a driver recompute over exact cents") {
    val nk = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sup = Tables.supplier(spark, sf)
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long"))
      .collect().map(r => r.getLong(0) -> nk(r.getLong(1))).toMap
    val promo = Tables.part(spark, sf).filter(col("p_type") === "PROMO")
      .select(col("p_partkey").cast("long"), col("p_retailprice"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val yearOf = Tables.orders(spark, sf)
      .select(col("o_orderkey").cast("long"),
        expr("CAST(year(o_orderdate) AS LONG)"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"),
        col("l_suppkey").cast("long"), col("l_quantity"),
        expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"))
      .collect()
      .flatMap { r =>
        promo.get(r.getLong(1)).map { rp =>
          val cost = math.floor(r.getDouble(3) * rp * 10).toLong
          ((sup(r.getLong(2)), yearOf(r.getLong(0))), r.getLong(4) - cost)
        }
      }
      .groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).sum, rs.length.toLong)).toMap
    val got = RelationalPack.queries("q173_product_profit")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    assert(got.nonEmpty && got.keys.map(_._1).toSet.size > 1)
  }
}
