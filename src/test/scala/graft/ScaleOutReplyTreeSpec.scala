package graft

import graft.streaming.{EdgeEventT, ReplyTreeOp, TreeOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** The scale-out reply-tree resolver (frontier + distributed archive hops,
  * ReplyTreeOp.resolveScaleOut) against the single-group evicting resolver
  * it re-partitions: same resolved set (root, depth, causal), same dropped
  * set, under in-order / reverse / shuffled arrival — plus the property
  * the whole design exists for: archive state rows hash-distribute across
  * state partitions instead of sitting in one group. */
class ScaleOutReplyTreeSpec extends GraftSuite {

  private def withOptOut[A](body: => A): A =
    graft.streaming.StreamOps.startUnchecked(spark)(body)

  private def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** Drive `events` through a resolver in the given chunks; returns
    * (resolved map, dropped ids). A far-future root nudge drains every
    * deadline at the end. */
  private def run(name: String,
                  mk: org.apache.spark.sql.Dataset[EdgeEventT] => org.apache.spark.sql.Dataset[TreeOut],
                  feed: Seq[Seq[EdgeEventT]],
                  nudgeSecs: Seq[Long],
                  checkpoint: Option[String] = None)
  : (Map[Long, (Long, Int, Boolean)], Set[Long]) = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[EdgeEventT]
    val writer = mk(stream.toDS().withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName(name).outputMode("append")
    val q: StreamingQuery =
      checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
    try {
      feed.foreach { c => stream.addData(c); q.processAllAvailable() }
      nudgeSecs.zipWithIndex.foreach { case (s, i) =>
        stream.addData(EdgeEventT(90000000L + i, t(s), None))
        q.processAllAvailable()
      }
      val rows = spark.table(name).collect()
        .filter(_.getLong(0) < 90000000L)
      val resolved = rows.filter(!_.getBoolean(4))
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getBoolean(3)))).toMap
      val dropped = rows.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
      assert(rows.length == resolved.size + dropped.size, "duplicate emission")
      (resolved, dropped)
    } finally q.stop()
  }

  private lazy val natural: Seq[EdgeEventT] = {
    import org.apache.spark.sql.functions._
    Tables.events(spark, sf)
      .select(col("event_id"), unix_timestamp(col("ts")).as("tsec"),
        when(col("event_type") === "click",
          col("event_id") - 1 - (regexp_extract(col("props"), "(\\d+)", 1).cast("long") % 4))
          .otherwise(lit(null)).as("parent_id"))
      .collect().map { r =>
        EdgeEventT(r.getLong(0), t(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))
      }.toSeq
  }

  private def evictingBaseline(feed: Seq[Seq[EdgeEventT]], nudges: Seq[Long], name: String) =
    run(name, ds => ReplyTreeOp.resolveEvicting(ds), feed, nudges)

  test("scale-out equals the single-group resolver on the natural graph (3 arrival orders)") {
    withOptOut {
      val maxSec = natural.map(_.ts.getTime / 1000).max
      val nudges = Seq(maxSec + 50000L, maxSec + 100000L, maxSec + 200000L)
      val orders = Seq(
        "inorder"  -> natural,
        "reverse"  -> natural.reverse,
        "shuffled" -> new scala.util.Random(7).shuffle(natural))
      orders.foreach { case (label, seq) =>
        val feed = seq.grouped(seq.length / 3 + 1).toSeq
        val base = evictingBaseline(feed, nudges, s"so_base_$label")
        val got = run(s"so_got_$label",
          ds => ReplyTreeOp.resolveScaleOut(ds), feed, nudges)
        assert(got._1 == base._1, s"$label: resolved sets diverge")
        assert(got._2 == base._2, s"$label: dropped sets diverge")
      }
    }
  }

  /** A chain whose every generation is forced onto the SLOW path: after
    * each generation, a watermark-driving nudge root (id >= 91000000,
    * filtered from results) pushes the watermark past the previous
    * generation's horizon expiry — evicting it from the frontier's recent
    * map — and then past the next generation's own event time, firing its
    * probe. Generation k therefore resolves at archive hop k. */
  private def slowChain(generations: Int): Seq[Seq[EdgeEventT]] = {
    val events = (0 until generations).map { g =>
      EdgeEventT(g + 1L, t(20000L * (g + 1)),
        if (g == 0) None else Some(g.toLong))
    }
    events.zipWithIndex.flatMap { case (e, g) =>
      // nudge watermark (2h delay) past this generation's ts + 1h horizon
      val nudge = EdgeEventT(91000000L + g, t(20000L * (g + 1) + 11000 + 7200), None)
      Seq(Seq(e), Seq(nudge))
    }
  }

  test("slow path: children of horizon-evicted parents resolve through the archive hops") {
    withOptOut {
      // hops=3 resolves three consecutive slow generations under a root —
      // each via a probe against a different archive hop — with exactly
      // the tuples the single-group resolver (which never evicts its
      // resolved map) produces on the same feed.
      val feed = slowChain(4) // root + 3 slow generations
      val base = evictingBaseline(feed, Seq(), "so_slow_base")
      val got = run("so_slow_got",
        ds => ReplyTreeOp.resolveScaleOut(ds, hops = 3,
          recentHorizonMs = 3600 * 1000L), feed, Seq())
      assert(base._1 == Map(
        1L -> ((1L, 0, true)), 2L -> ((1L, 1, true)),
        3L -> ((1L, 2, true)), 4L -> ((1L, 3, true))))
      assert(got._1 == base._1, "slow-path chain diverged")
      assert(got._2.isEmpty && base._2.isEmpty)
    }
  }

  test("documented hop bound: a 4th consecutive slow generation drops with hops=3") {
    withOptOut {
      val got = run("so_hopbound",
        ds => ReplyTreeOp.resolveScaleOut(ds, hops = 3,
          recentHorizonMs = 3600 * 1000L), slowChain(5), Seq())
      assert(got._1.keySet == Set(1L, 2L, 3L, 4L))
      assert(got._2 == Set(5L), "generation hops+1 must drop, not dangle")
    }
  }

  test("dangling replies drop with the same set as the single-group resolver") {
    withOptOut {
      // X waits on a parent that never comes; C waits on X — both must
      // drop (C's probe finds no archived X).
      val maxSec = natural.map(_.ts.getTime / 1000).max
      val x = EdgeEventT(5000001L, t(maxSec + 10), Some(-999L))
      val c = EdgeEventT(5000002L, t(maxSec + 5000), Some(5000001L))
      val feed = natural.grouped(natural.length / 3 + 1).toSeq :+ Seq(x, c)
      val nudges = Seq(maxSec + 50000L, maxSec + 100000L, maxSec + 200000L)
      val base = evictingBaseline(feed, nudges, "so_dangle_base")
      val got = run("so_dangle_got",
        ds => ReplyTreeOp.resolveScaleOut(ds), feed, nudges)
      assert(got._1 == base._1)
      assert(got._2 == base._2)
      assert(got._2.contains(5000001L) && got._2.contains(5000002L))
    }
  }

  test("archive survives a restart: a post-restart probe resolves against recovered hop state") {
    // Run 1 resolves root 100 at the frontier (registered in hop 1) and
    // drives the watermark far enough that the 6h recent horizon evicts
    // 100 from the frontier's own map. After the "crash", a reply to 100
    // arrives: it can only resolve through a probe against the ARCHIVE
    // state recovered from the checkpoint — the frontier no longer knows
    // the parent.
    import spark.implicits._
    withOptOut {
      val base = java.nio.file.Files.createTempDirectory("so_restart").toString
      val in = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
      new java.io.File(in).mkdirs()
      val sch = "event_id long, ts timestamp, parent_id long, user_id long, event_type string"
      val cols = Seq("event_id", "ts", "parent_id", "user_id", "event_type")
      val H = 3600L
      def row(id: Long, sec: Long, parent: java.lang.Long) =
        (id, t(sec), parent, 0L, "")
      def runOnce(chunk: Seq[(Long, java.sql.Timestamp, java.lang.Long, Long, String)]): Unit = {
        chunk.toDF(cols: _*).write.mode("append").parquet(in)
        val edges = spark.readStream.schema(sch).parquet(in)
          .withWatermark("ts", "1 hour").as[EdgeEventT]
        val q = ReplyTreeOp.resolveScaleOut(edges).writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[TreeOut], _: Long) =>
            b.write.mode("append").parquet(out)
          }.start()
        try q.processAllAvailable() finally q.stop() // "crash" between chunks
      }
      // roots 100 (t=1000) and 200 (t=+10h): the second drives the
      // watermark past 100's horizon expiry, evicting it from the frontier
      runOnce(Seq(row(100, 1000, null), row(200, 1000 + 10 * H, null)))
      // reply 101 -> 100 (t=+12h) parks, then root 300 (t=+14h) pushes the
      // watermark past it -> probe -> must hit hop-1's RECOVERED entry
      runOnce(Seq(row(101, 1000 + 12 * H, 100L), row(300, 1000 + 14 * H, null)))
      val rows = spark.read.parquet(out)
        .select("event_id", "root_id", "depth", "causal", "dropped")
        .distinct().collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getBoolean(3), r.getBoolean(4))))
        .toMap
      assert(rows(100) == ((100L, 0, true, false)))
      assert(rows(200) == ((200L, 0, true, false)))
      assert(rows(300) == ((300L, 0, true, false)))
      assert(rows.get(101).contains((100L, 1, true, false)),
        s"reply must resolve via the recovered archive, got ${rows.get(101)}")
      assert(rows.size == 4)
    }
  }

  test("archive state rows distribute across >=2 state partitions (the point of the design)") {
    withOptOut {
      val dir = java.nio.file.Files.createTempDirectory("so_dist").toString
      val maxSec = natural.map(_.ts.getTime / 1000).max
      val (resolved, _) = run("so_dist",
        ds => ReplyTreeOp.resolveScaleOut(ds),
        natural.grouped(natural.length / 3 + 1).toSeq,
        Seq(maxSec + 50000L, maxSec + 200000L),
        checkpoint = Some(dir))
      // four stateful operators: the frontier (single group — ALL its
      // state in one partition) and three archive hops (entries
      // hash-partitioned by event id). Operator ids are an internal
      // planning order, so classify each store by shape instead.
      val meta = spark.read.format("state-metadata").load(dir)
      val opIds = meta.select("operatorId").collect()
        .map(_.get(0).toString.toLong).distinct.sorted
      assert(opIds.length == 4, s"expected frontier + 3 hops, got ${opIds.toSeq}")
      val stores = opIds.map { op =>
        val df = spark.read.format("statestore")
          .option("operatorId", op).load(dir)
        (op, df.count(), df.select("partition_id").distinct().count())
      }
      // the frontier's single group = exactly one state row in one partition
      assert(stores.count { case (_, rows, parts) => rows == 1 && parts == 1 } >= 1,
        s"no single-group frontier store found: ${stores.toSeq}")
      // the busiest archive hop holds the fast-path registrations and must
      // span multiple state partitions — the property the design exists for
      val (_, archRows, archParts) = stores.maxBy(_._2)
      assert(archParts >= 2,
        s"archive state sits in $archParts partition(s) — not distributed: ${stores.toSeq}")
      // every RESOLVED event's entry is archived exactly once across the
      // chain (dropped events never register; the 2 end nudges do; the
      // frontier's own single row is excluded)
      val archived = stores.map(_._2).sum - 1
      assert(archived == resolved.size + 2,
        s"expected one archive entry per resolved event (${resolved.size} + 2 nudges), got $archived (stores=${stores.toSeq})")
      assert(archRows >= resolved.size,
        s"fast-path registrations missing from the busiest hop: ${stores.toSeq}")
    }
  }
}
