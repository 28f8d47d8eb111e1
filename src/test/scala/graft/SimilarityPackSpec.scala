package graft

import graft.operators.SimilarityPack
import org.apache.spark.sql.functions._

class SimilarityPackSpec extends GraftSuite {

  test("every similarity query returns rows at sf0.001 with matching oracle key") {
    // data-dependent centroids: upgraded to hash checks by
    // SimilarityPack.dynamicOracle at Verify time, pinned below here
    val rowsOnly = Set("q43_ann_ivf", "q78_semantic_dedup", "q111_ann_recall",
      "q166_ivf_balance")
    SimilarityPack.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(SimilarityPack.oracle.contains(name) || rowsOnly(name),
        s"$name lacks oracle SQL")
    }
  }

  test("q40 emits exactly top-k per query, cosine descending") {
    val rows = SimilarityPack.queries("q40_cosine_topk")(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length == 10)
      val cs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q41 near-dups all meet the threshold and cosine is symmetric-bounded") {
    val rows = SimilarityPack.queries("q41_embed_neardup")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.4 && r.getDouble(2) <= 1.0)
      assert(r.getLong(0) < r.getLong(1))
    }
  }

  test("q41 refuses inputs above the all-pairs cap (O(n²) contract)") {
    import spark.implicits._
    // the sf0.001 embeddings table is > 10 rows, so a 10-row cap must trip
    val e = graft.Tables.embeddings(spark, sf)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm", lit(1.0))
    val ex = intercept[IllegalArgumentException] {
      SimilarityPack.embedNearDup(e, maxN = 10L)
    }
    assert(ex.getMessage.contains("O(n²)"))
    assert(ex.getMessage.contains("q42"), "error must name the scale path")
    // default cap admits the test corpus
    assert(SimilarityPack.queries("q41_embed_neardup")(spark, sf).count() > 0)
  }

  test("q42 ANN rescoring agrees with the exact cosine of q40 on shared pairs") {
    val exact = SimilarityPack.queries("q40_cosine_topk")(spark, sf)
      .select(col("qid"), col("nid"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = SimilarityPack.queries("q42_ann_lsh")(spark, sf)
      .select(col("qid"), col("nid"), col("cos")).collect()
    val shared = ann.flatMap { r =>
      exact.get((r.getLong(0), r.getLong(1))).map(e => (e, r.getDouble(2)))
    }
    assert(shared.nonEmpty, "ANN found none of the exact top-k (bucket starvation)")
    shared.foreach { case (e, a) => assert(e == a, s"exact=$e ann=$a") }
  }

  test("q43 IVF equals a driver-side reimplementation (exact within probed cells)") {
    import graft.functions.KMeans
    import graft.operators.SimilarityPack.ivfCentroids
    val cents = ivfCentroids(spark, sf)
    val vecsLocal = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toVector).toMap
    def cell(v: Vector[Double]): Int =
      cents.indices.minBy(i => KMeans.sqDist(cents(i), v))
    def cos(a: Vector[Double], b: Vector[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val cellsOf = vecsLocal.map { case (id, v) => id -> cell(v) }
    val expected = vecsLocal.keys.filter(_ % 50 == 0).flatMap { qid =>
      val qv = vecsLocal(qid)
      val probed = cents.indices
        .sortBy(i => (KMeans.sqDist(cents(i), qv) * -2 / -2, i)) // dist asc, cell asc
        .sortBy(i => (KMeans.sqDist(cents(i), qv), i)).take(2).toSet
      vecsLocal.keys.filter(n => n != qid && probed(cellsOf(n)))
        .map(n => (qid, n, math.rint(cos(qv, vecsLocal(n)) * 1e6) / 1e6))
        .toSeq.sortBy { case (_, n, c) => (-c, n) }.take(10)
        .zipWithIndex.map { case ((q, n, c), r) => (q, r + 1, n) }
    }.toSet
    val got = SimilarityPack.queries("q43_ann_ivf")(spark, sf)
      .select(col("qid"), col("rank"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected, s"diff: ${(got -- expected).take(5)} / ${(expected -- got).take(5)}")
  }

  test("q78 semantic dedup equals a driver-side reimplementation") {
    import graft.functions.KMeans
    import graft.operators.SimilarityPack.ivfCentroids
    val cents = ivfCentroids(spark, sf)
    val vecsLocal = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toVector).toMap
    def cos(a: Vector[Double], b: Vector[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // same rounding Spark's round() applies: HALF_UP at 6 decimals
    def r6(x: Double): Double =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cellsOf = vecsLocal.map { case (id, v) =>
      id -> cents.indices.minBy(i => KMeans.sqDist(cents(i), v))
    }
    val expected = vecsLocal.keys.map { id =>
      val dups = vecsLocal.keys.filter(j => j < id && cellsOf(j) == cellsOf(id) &&
        r6(cos(vecsLocal(j), vecsLocal(id))) >= 0.35)
      id -> dups.size.toLong
    }.toMap
    val got = SimilarityPack.queries("q78_semantic_dedup")(spark, sf)
      .select(col("vec_id"), col("n_dups"), col("dropped")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == vecsLocal.size, "one verdict row per vector")
    got.foreach { case (id, n, dropped) =>
      assert(n == expected(id), s"vec $id: n_dups $n vs ${expected(id)}")
      assert(dropped == (n > 0), s"vec $id: dropped flag inconsistent")
    }
    assert(got.exists(_._3), "threshold chosen so the dup set is non-empty")
  }

  test("q139 bitext margin equals a driver-side margin recomputation") {
    val langs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecsLocal = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toVector)
      .toMap
    def cos(a: Vector[Double], b: Vector[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r6(x: Double): Double =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def micro(x: Double): Long =
      BigDecimal.valueOf(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val en = vecsLocal.keys.filter(id => langs(id) == "en").toSeq
    val qs = vecsLocal.keys
      .filter(id => langs(id) != "en" && id % 25 == 0).toSeq
    val rows = SimilarityPack.queries("q139_bitext_margin")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(rows.keySet == qs.toSet, "one row per bounded query")
    qs.foreach { qid =>
      val ranked = en.map(nid => (nid, r6(cos(vecsLocal(qid), vecsLocal(nid)))))
        .sortBy { case (nid, c) => (-c, nid) }
      val top = ranked.take(4)
      val (srcLang, nid, c4, num, den, nTop) = rows(qid)
      assert(srcLang == langs(qid))
      assert(nid == top.head._1, s"q $qid top-1 neighbor")
      assert(c4 == BigDecimal.valueOf(top.head._2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(nTop == top.size.toLong)
      assert(num == micro(top.head._2) * top.size)
      assert(den == top.map(t => micro(t._2)).sum)
    }
    // margin discriminates: at least one query's top-1 stands out (num > den/k
    // scaled), i.e. the pair table is not all-flat
    assert(qs.exists { qid =>
      val (_, _, _, num, den, _) = rows(qid); num > den
    }, "at least one query has above-mean top-1 contrast")
  }

  test("q89 hybrid fusion: RRF recomputes from the component ranks, top-5 per query") {
    val rows = SimilarityPack.queries("q89_hybrid_search")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.length <= 5, s"query $qid returned ${rs.length} rows")
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length))
      rs.foreach { r =>
        val exp = BigDecimal(1.0 / (60 + r.getInt(4)) + 1.0 / (60 + r.getInt(5)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(6) - exp) < 1e-9,
          s"query $qid candidate ${r.getLong(2)}: rrf drifted")
        assert(r.getLong(3) >= 1, "candidate must share at least one token")
      }
      // fused order follows (rrf desc, cid): rank 1 has the max rrf
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(6))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q40 plan broadcasts the query side (no shuffle of the corpus)") {
    // the probe form: q40's own plan is a memoized-RDD scan (annMemo), so
    // the broadcast shape is asserted on the BUILD — bpeProbeRound1's style
    val plan = SimilarityPack.bruteTopKProbe(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast join:\n$plan")
  }

  test("q111 recall matches a driver-side set-intersection recomputation") {
    def sets(name: String): Map[Long, Set[Long]] =
      SimilarityPack.queries(name)(spark, sf)
        .select(col("qid"), col("nid")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val truth = sets("q40_cosine_topk")
    val byIdx = Map("lsh" -> sets("q42_ann_lsh"), "ivf" -> sets("q43_ann_ivf"))
    val out = SimilarityPack.queries("q111_ann_recall")(spark, sf).collect()
    assert(out.length == 2 * truth.size, "one row per (index, query)")
    assert(out.map(_.getString(0)).toSet == Set("lsh", "ivf"))
    out.foreach { r =>
      val (idx, qid, hits, tk, bp) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val expect = byIdx(idx).getOrElse(qid, Set.empty).intersect(truth(qid)).size
      assert(hits == expect, s"$idx/$qid: hits $hits != $expect")
      assert(tk == truth(qid).size)
      assert(bp == hits * 10000 / tk && bp >= 0 && bp <= 10000)
    }
    // the eval's oracle rides the same dynamic (centroid-literal) path as q43
    assert(SimilarityPack.dynamicOracle(spark, sf).contains("q111_ann_recall"))
  }

  test("q120 integer dots equal a driver-side symmetric quantizer; recall@10 high") {
    val raw = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // same IEEE op order as the plan: sequential-fold norm, /norm, *127/gmax
    val normed = raw.view.mapValues { v =>
      val n = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
      v.map(_ / n)
    }.toMap
    val gmax = normed.values.flatMap(_.map(math.abs)).max
    val codes = normed.view.mapValues(_.map(x =>
      math.max(-127.0, math.min(127.0, math.floor(x * 127.0 / gmax))).toLong)).toMap
    val out = SimilarityPack.queries("q120_quantized_ann")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (qid, nid, dotq) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val expect = codes(qid).lazyZip(codes(nid)).map(_ * _).sum
      assert(dotq == expect, s"($qid,$nid): $dotq != $expect")
    }
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length == 10)
      val dots = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(dots.zip(dots.tail).forall { case (a, b) => a >= b })
    }
    // the compression must not wreck the ranking: recall@10 vs q40's
    // float cosine ground truth (measured 0.95 at sf0.001/0.01)
    val truth = SimilarityPack.queries("q40_cosine_topk")(spark, sf)
      .select(col("qid"), col("nid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = out.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = truth.map { case (q, t) => got(q).intersect(t).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 $mean < 0.8")
  }

  test("q128 per-dimension stats equal a driver-side recomputation") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1000.0).toLong))
    val dims = vecs.head.length
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = SimilarityPack.queries("q128_embedding_stats")(spark, sf).collect()
    assert(out.length == dims)
    out.foreach { r =>
      val d = r.getLong(0).toInt
      val col = vecs.map(_(d))
      assert(r.getLong(1) == vecs.length)
      assert(r.getLong(2) == col.count(_ == 0L))
      assert(r.getLong(3) == col.min && r.getLong(4) == col.max)
      val (s1, s2, n) = (col.sum, col.map(q => q * q).sum, col.length.toLong)
      assert(r.getDouble(5) == r4(s1.toDouble / n))
      assert(r.getDouble(6) ==
        r4(math.sqrt((n * s2 - s1 * s1).toDouble / (n * n).toDouble)))
    }
  }

  test("q126 nDCG equals a driver-side recomputation over the LSH ranking") {
    val labels = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ranked = SimilarityPack.queries("q42_ann_lsh")(spark, sf)
      .select(col("qid"), col("rank").cast("long"), col("nid")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq).toMap
    def gain(r: Long): Long =
      math.floor(1000000.0 * math.log(2.0) / math.log(r.toDouble + 1.0)).toLong
    val out = SimilarityPack.queries("q126_ndcg")(spark, sf).collect()
    // one row per query vector (vec_id % 50), even if LSH retrieved nothing
    assert(out.map(_.getLong(0)).toSet ==
      labels.keySet.filter(_ % 50 == 0))
    out.foreach { r =>
      val (qid, nRel, hits, dcg, idcg, ppm) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nRel == labels.values.count(_ == labels(qid)) - 1)
      val rs = ranked.getOrElse(qid, Seq.empty).zipWithIndex
        .filter { case (nid, _) => labels(nid) == labels(qid) }
      assert(hits == rs.size)
      assert(dcg == rs.map { case (_, i) => gain(i + 1L) }.sum)
      assert(idcg == (1L to math.min(10L, nRel)).map(gain).sum)
      assert(ppm == (if (idcg > 0) 1000000L * dcg / idcg else 0L))
      assert(dcg <= idcg && ppm >= 0 && ppm <= 1000000L)
    }
  }

  test("q156 embedding drift equals a driver-side PSI recomputation; PSI >= 0") {
    val vecsLocal = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toVector)
    // same seeded construction as the pack's projection planes
    val rnd = new scala.util.Random(7)
    val planes = IndexedSeq.fill(4 * 8, 64)(if (rnd.nextBoolean()) 1.0 else -1.0)
    def sig0(v: Vector[Double]): Int =
      (0 until 8).map { b =>
        if (v.zip(planes(b)).map { case (x, p) => x * p }.sum > 0) 1 << b else 0
      }.sum
    val bySig = vecsLocal.groupBy { case (_, v) => sig0(v) }
    val tA = vecsLocal.count(_._1 % 2 == 0).toLong
    val tB = vecsLocal.size - tA
    val want = bySig.map { case (sig, vs) =>
      val cA = vs.count(_._1 % 2 == 0).toLong
      val cB = vs.size - cA
      val pa = (cA + 1).toDouble / (tA + 256).toDouble
      val pb = (cB + 1).toDouble / (tB + 256).toDouble
      sig.toLong -> (cA, cB, math.floor((pa - pb) * math.log(pa / pb) * 1e6).toLong)
    }
    val got = SimilarityPack.queries("q156_embedding_drift")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"$got vs $want")
    got.values.foreach { case (_, _, psi) => assert(psi >= 0L) }
    assert(got.size > 1, "the 256-bucket histogram must spread")
  }

  test("q151 hard negatives equal a driver-side mining recomputation") {
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecsLocal = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toVector)
      .toMap
    def cos(a: Vector[Double], b: Vector[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def cMicro(x: Double): Long = {
      val r6 = BigDecimal.valueOf(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal.valueOf(r6 * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val anchors = vecsLocal.keys.filter(id => id % 50 == 0 && id < 5000).toSeq
    val got = SimilarityPack.queries("q151_hard_negatives")(spark, sf)
      .collect().groupBy(_.getLong(0))
    assert(got.keySet == anchors.toSet, "one group per bounded anchor")
    anchors.foreach { qid =>
      val others = vecsLocal.keys.filter(_ != qid).toSeq
      val cm = others.map(o => o -> cMicro(cos(vecsLocal(qid), vecsLocal(o)))).toMap
      val posBest = others.filter(o => labels(o) == labels(qid)).map(cm).max
      val negs = others.filter(o => labels(o) != labels(qid))
        .sortBy(o => (-cm(o), o)).take(5)
      val rs = got(qid).sortBy(_.getInt(1))
      assert(rs.length == negs.size)
      rs.zip(negs).zipWithIndex.foreach { case ((r, nid), i) =>
        assert(r.getInt(1) == i + 1)
        assert(r.getLong(2) == nid, s"anchor $qid rank ${i + 1}")
        assert(r.getLong(3) == cm(nid))
        assert(r.getLong(4) == posBest)
        val expCat =
          if (cm(nid) >= posBest) "hard"
          else if (cm(nid) >= posBest - 50000L) "semi_hard"
          else "easy"
        assert(r.getString(5) == expCat)
      }
    }
  }

  test("q166 IVF balance equals a driver recompute; dead cells reported") {
    import graft.functions.KMeans
    import graft.operators.SimilarityPack.ivfCentroids
    val cents = ivfCentroids(spark, sf)
    val vecsLocal = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toVector)
    val hist = vecsLocal
      .map { case (_, v) => cents.indices.minBy(i => (KMeans.sqDist(cents(i), v), i)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = vecsLocal.length.toLong
    val rows = SimilarityPack.queries("q166_ivf_balance")(spark, sf).collect()
    assert(rows.length == cents.length, "one row per cell, dead cells included")
    rows.foreach { r =>
      val n = hist.getOrElse(r.getLong(0).toInt, 0L)
      assert(r.getLong(1) == n, s"cell ${r.getLong(0)}")
      assert(r.getLong(2) == n * 1000000L / total)
      assert(r.getBoolean(3) == (n * cents.length > 2 * total))
      assert(r.getBoolean(4) == (n == 0L))
    }
    assert(rows.map(_.getLong(1)).sum == total, "occupancy partitions the corpus")
  }
}
