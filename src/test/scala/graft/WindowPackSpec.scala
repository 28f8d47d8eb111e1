package graft

import graft.operators.WindowPack
import org.apache.spark.sql.functions._

class WindowPackSpec extends GraftSuite {

  test("every window query returns rows at sf0.001 with matching oracle key") {
    WindowPack.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(WindowPack.oracle.contains(name), s"$name lacks oracle SQL")
    }
  }

  // Reference invariant (PostStatisticsFunctionITSuite.scala:140-149 style):
  // summing a sliding window's counters over all windows = events × windows-per-event.
  test("q21 sliding window fan-out: sum(n_events) = 24 * |events|") {
    val n = Tables.events(spark, sf).count()
    val total = WindowPack.queries("q21_sliding_stats")(spark, sf)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == 24 * n, s"expected ${24 * n}, got $total")
  }

  test("q20 tumbling windows partition events exactly once") {
    val n = Tables.events(spark, sf).count()
    val total = WindowPack.queries("q20_tumbling_stats")(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(total == n)
  }

  test("q24 sessions: no intra-session gap >= 30 min, starts are per-user sorted") {
    val rows = WindowPack.queries("q24_session_window")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val starts = rs.map(_._2)
      assert(starts.sorted.sameElements(starts))
      // consecutive sessions of one user start >= 30 min apart
      starts.zip(starts.tail).foreach { case (a, b) => assert(b - a >= 1800) }
    }
  }

  test("q91 funnel: stage counts are monotone and sessions reconcile with q24") {
    import org.apache.spark.sql.functions._
    val rows = WindowPack.queries("q91_funnel")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, v, c, p) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(s >= v && v >= c && c >= p, s"cohort ${r.getLong(0)} not monotone")
    }
    // total sessions across cohorts == q24's session count (same gap rule)
    val totalSessions = rows.map(_.getLong(1)).sum
    val q24Sessions = WindowPack.queries("q24_session_window")(spark, sf).count()
    assert(totalSessions === q24Sessions,
      s"funnel sessionization drifted from session_window: $totalSessions != $q24Sessions")
  }

  test("q23 as-of join: prior view value is 0 when no view precedes") {
    val df = WindowPack.queries("q23_asof_join")(spark, sf)
    // every purchase appears exactly once
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(df.count() == purchases)
  }

  test("q138 retention cells equal a driver-side cohort recomputation") {
    val uw = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_timestamp(ts)").as("sec")).collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 604800L)))
      .distinct
    val cohort = uw.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = uw.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .view.mapValues(_.size.toLong).toMap
    val rows = WindowPack.queries("q138_retention_cohorts")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == cells.keySet)
    rows.foreach { case ((c, o), (n, size, ppm)) =>
      assert(n == cells((c, o)), s"cell ($c,$o)")
      assert(size == cells((c, 0L)), s"cohort $c size")
      assert(ppm == 1000000L * n / size)
      assert(ppm >= 0 && ppm <= 1000000L,
        "retention can never exceed the cohort (offset-0 covers everyone)")
    }
  }

  test("q140 RFM quintiles equal a driver-side exact-ntile recomputation") {
    val per = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_timestamp(ts)").as("sec"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .collect().groupBy(_.getLong(0)).map { case (u, rs) =>
        u -> (Math.floorDiv(rs.map(_.getLong(1)).max, 86400L),
          rs.length.toLong,
          Math.floorDiv(rs.map(_.getLong(2)).sum, 100L))
      }
    // SQL-standard NTILE: the first total%5 buckets get one extra row
    def quintiles(vals: Map[Long, Long]): Map[Long, Long] = {
      val sorted = vals.toSeq.sortBy { case (u, v) => (v, u) }.map(_._1)
      val (total, cs, big) = (sorted.size, sorted.size / 5, sorted.size % 5)
      val sizes = Seq.fill(big)(cs + 1) ++ Seq.fill(5 - big)(cs)
      sizes.zipWithIndex.foldLeft((Map.empty[Long, Long], 0)) {
        case ((acc, off), (sz, i)) =>
          (acc ++ sorted.slice(off, off + sz).map(_ -> (i + 1L)), off + sz)
      }._1
    }
    val rq = quintiles(per.map { case (u, t) => u -> t._1 }.toMap)
    val fq = quintiles(per.map { case (u, t) => u -> t._2 }.toMap)
    val mq = quintiles(per.map { case (u, t) => u -> t._3 }.toMap)
    val rows = WindowPack.queries("q140_rfm_segments")(spark, sf).collect()
    assert(rows.length == per.size)
    rows.foreach { r =>
      val u = r.getLong(0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == per(u), s"user $u dims")
      assert(r.getLong(4) == rq(u) && r.getLong(5) == fq(u)
        && r.getLong(6) == mq(u), s"user $u quintiles")
      assert(r.getLong(7) == rq(u) * 100 + fq(u) * 10 + mq(u))
    }
  }

  test("q145 stage latencies equal a driver recompute and reconcile with q91") {
    val sess = WindowPack.funnelSessions(Tables.events(spark, sf))
      .select(col("user_id"), col("first_us"),
        expr("unix_micros(tv)").as("v"), expr("unix_micros(tc)").as("c"))
      .collect()
    val want = sess.flatMap { r =>
      val cohort = r.getLong(0) % 10
      val sv = if (r.isNullAt(2)) Nil else Seq((cohort, "start_view",
        Math.floorDiv(r.getLong(2) - r.getLong(1), 60000000L)))
      val vc = if (r.isNullAt(3)) Nil else Seq((cohort, "view_click",
        Math.floorDiv(r.getLong(3) - r.getLong(2), 60000000L)))
      sv ++ vc
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = WindowPack.queries("q145_stage_latency")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got == want)
    // cell totals reconcile with q91's stage counts: one start_view row
    // per session with a view, one view_click row per ordered click
    val q91 = WindowPack.queries("q91_funnel")(spark, sf).collect()
    assert(got.filter(_._1._2 == "start_view").values.sum ==
      q91.map(_.getLong(2)).sum)
    assert(got.filter(_._1._2 == "view_click").values.sum ==
      q91.map(_.getLong(3)).sum)
    got.keys.foreach { case (_, _, m) => assert(m >= 0) }
  }

  test("q146 A/B evaluation equals a driver recompute; synthetic skew goes significant") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val flags = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val fv = es.collect { case (_, "view", t) => t }.minOption
      fv.map(v => (u % 2, if (es.exists { case (_, et, t) =>
        et == "purchase" && t > v && t <= v + 86400000000L }) 1L else 0L))
    }
    val (na, ca) = (flags.count(_._1 == 0).toLong,
      flags.filter(_._1 == 0).map(_._2).sum)
    val (nb, cb) = (flags.count(_._1 == 1).toLong,
      flags.filter(_._1 == 1).map(_._2).sum)
    val row = WindowPack.queries("q146_ab_experiment")(spark, sf).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == (na, ca, nb, cb))
    val d = ca * nb - cb * na
    val lhs = BigInt(2500) * BigInt(d) * BigInt(d) * BigInt(na + nb)
    val rhs = BigInt(9604) * BigInt(na) * BigInt(nb) * BigInt(ca + cb) *
      BigInt(na + nb - ca - cb)
    assert(row.getBoolean(6) == (lhs > rhs))

    // synthetic 90% vs 10% conversion, 100 users per variant: the
    // significant branch must fire (the uniform corpus never does)
    val t0 = 1700000000000L
    val synth = (0 until 200).flatMap { u =>
      val converts = if (u % 2 == 0) (u / 2) % 10 < 9 else (u / 2) % 10 < 1
      val view = (u.toLong * 10 + 1, new java.sql.Timestamp(t0 + u * 1000L),
        u.toLong, "view", 1.0)
      val purchase = (u.toLong * 10 + 2,
        new java.sql.Timestamp(t0 + u * 1000L + 60000L),
        u.toLong, "purchase", 1.0)
      if (converts) Seq(view, purchase) else Seq(view)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val s = WindowPack.abEval(synth, 86400000000L).collect()(0)
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
      == (100L, 90L, 100L, 10L))
    assert(s.getLong(4) == 900000L && s.getLong(5) == 100000L)
    assert(s.getBoolean(6), "90% vs 10% at n=100 must be significant")
  }

  test("q143 transitions equal a driver-side consecutive-pair recomputation") {
    val byUser = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("tus"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val pairs = byUser.values.flatMap { evs =>
      val s = evs.sortBy(e => (e._2, e._3))
      s.zip(s.tail).collect {
        case (a, b) if b._2 - a._2 < 1800000000L => (a._4, b._4)
      }
    }.toSeq
    val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totals = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rows = WindowPack.queries("q143_event_transitions")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == counts.keySet)
    rows.foreach { case ((f, t), (n, tot, ppm)) =>
      assert(n == counts((f, t)), s"($f,$t) count")
      assert(tot == totals(f), s"$f total")
      assert(ppm == 1000000L * n / tot)
    }
    // shares per from_type sum to ~1e6 (floor loses < |alphabet| ppm each)
    rows.toSeq.groupBy(_._1._1).foreach { case (f, rs) =>
      val s = rs.map(_._2._3).sum
      assert(s <= 1000000L && s > 1000000L - rs.size, s"$f share sum $s")
    }
  }

  test("q144 anomalies equal a driver-side integer 3-sigma recomputation") {
    val buckets = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val flagged = buckets.groupBy(_._1._1).flatMap { case (_, bs) =>
      val xs = bs.values.toSeq
      val (nb, s, q) = (xs.size.toLong, xs.sum, xs.map(x => x * x).sum)
      bs.collect {
        case ((t, h), x) if (nb * x - s) * (nb * x - s) > 9 * (nb * q - s * s) =>
          (t, h) -> (x, if (nb * x - s > 0) "high" else "low")
      }
    }
    val rows = WindowPack.queries("q144_count_anomaly")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(rows == flagged)
    assert(rows.nonEmpty, "synthetic data should surface at least one 3-sigma hour")
  }

  test("batch and streaming share the sliding-stats transform") {
    // WindowPack.slidingStats is the single definition used by both paths;
    // spot-check it agrees with q21 (modulo ordering).
    val a = WindowPack.slidingStats(Tables.events(spark, sf))
      .orderBy(col("wstart"), col("user_id")).collect()
    val b = WindowPack.queries("q21_sliding_stats")(spark, sf).collect()
    assert(a.sameElements(b))
  }
}
