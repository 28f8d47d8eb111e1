package graft

import graft.operators.SamplingPack
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantics pins for the statistics/sampling pack (q81-q86). The DuckDB
  * oracle gate re-checks SQL parity; these tests pin the math against
  * independent in-JVM recomputation and the bloom-prune no-op contract. */
class SamplingPackSpec extends GraftSuite {

  private def q(name: String): DataFrame =
    SamplingPack.queries(name)(spark, sf)

  /** base32 reimplemented independently (same construction as Hashes). */
  private def base32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("q81: top-1 matches an independent exact count; shares consistent") {
    val rows = q("q81_heavy_hitters").collect()
    assert(rows.length === 20)
    assert(rows.map(_.getInt(0)).toSeq === (1 to 20))
    // independent recomputation off the raw text, driver-side
    val counts = Tables.documents(spark, sf).select(col("text")).collect()
      .iterator.flatMap(_.getString(0).split(" ")).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expTop = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    assert(rows.map(r => (r.getString(1), r.getLong(2))).toSeq === expTop)
    val tot = counts.values.sum.toDouble
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getLong(2) / tot) < 1e-6)
    }
  }

  test("q82: selected set equals brute-force Efraimidis-Spirakis keys") {
    val rows = q("q82_weighted_sample").collect()
    assert(rows.length === 20)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exp = docs.map { case (id, w) =>
      val u = (base32(id.toString) % 1000000L + 1L).toDouble / 1000000.0
      val key8 = BigDecimal(math.log(u) / w)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, key8)
    }.sortBy { case (id, k) => (-k, id) }.take(20).map(_._1).toSeq
    assert(rows.map(_.getLong(1)).toSeq === exp)
  }

  test("q83: per-doc score matches driver-side recomputation; sums exact") {
    val rows = q("q83_lm_quality").collect()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val counts = docs.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val t = counts.values.sum
    val v = counts.size
    val lp = counts.map { case (tok, c) =>
      tok -> math.floor(math.log((c + 1).toDouble / (t + v)) * 1e6).toLong
    }
    val exp = docs.map { case (id, ts) => id -> ts.map(lp).sum }.toMap
    assert(rows.length === docs.length)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(r.fieldIndex("sum_lp_micro")) === exp(id), s"doc $id")
      val n = r.getLong(r.fieldIndex("n_tokens"))
      val avg = exp(id).toDouble / (n * 1e6)
      assert(math.abs(r.getDouble(r.fieldIndex("avg_logprob")) - avg) < 1e-3)
    }
  }

  test("q84: largest source keeps everything; rates match sqrt recomputation") {
    val rows = q("q84_mix_temperature").collect()
    val tot = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    val mx = tot.values.max
    rows.foreach { r =>
      val expRate =
        math.floor(10000 * math.sqrt(r.getLong(2).toDouble) / math.sqrt(mx.toDouble)).toLong
      assert(r.getLong(r.fieldIndex("rate_bp")) === expRate)
      assert(r.getLong(r.fieldIndex("n_kept")) <= r.getLong(1))
      assert(r.getLong(r.fieldIndex("kept_tokens")) <= r.getLong(2))
    }
    assert(rows.filter(_.getLong(2) == mx)
      .forall(r => r.getLong(r.fieldIndex("rate_bp")) == 10000L))
  }

  test("q85: bloom prune is a no-op on the output (exact-confirm contract)") {
    // exact recomputation with NO bloom stage, same span/hash/split defs
    val toks = split(col("text"), " ")
    val spans = Tables.documents(spark, sf)
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), ((size(col("t")) - 1) / 6).cast("long"))).as("k"))
      .select(col("doc_id"),
        graft.functions.Hashes.base60(
          concat_ws(" ", slice(col("t"), col("k") * 6 + 1, lit(6)))).as("h"))
    val split5 = Tables.documents(spark, sf).select(col("doc_id"),
      (graft.functions.Hashes.base32(col("doc_id").cast("string")) % 5 === 0).as("is_test"))
    val tagged = spans.join(split5, "doc_id")
    val train = tagged.filter(!col("is_test")).select(col("h")).distinct()
      .withColumn("hit", lit(1))
    val exp = tagged.filter(col("is_test"))
      .join(train, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), count(col("hit")).as("n_hit"))
      .withColumn("contaminated", col("n_hit") > 0)
      .select("doc_id", "n_spans", "n_hit", "contaminated")
      .orderBy("doc_id").collect().toSeq
    val got = q("q85_bloom_decontam")
      .select("doc_id", "n_spans", "n_hit", "contaminated")
      .orderBy("doc_id").collect().toSeq
    assert(got === exp)
    assert(got.exists(_.getLong(2) > 0), "corpus should have some contamination")
  }

  test("q87: outlier set matches an exact-integer-moments recomputation") {
    val rows = q("q87_outlier_events").collect()
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = ev.groupBy(_._2)
    val expected = ev.filter { case (_, t, v) =>
      val cents = byType(t).map(x => math.floor(x._3 * 100).toLong)
      val n = cents.length.toLong
      val s1 = cents.sum
      val s2 = cents.map(c => c * c).sum
      val mu = s1.toDouble / n
      val sigma = math.sqrt((s2.toDouble - s1.toDouble * s1 / n) / (n - 1))
      val c = math.floor(v * 100).toLong
      sigma > 0 && math.abs(BigDecimal((c - mu) / sigma)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) > 3.0
    }.map(_._1).toSet
    assert(rows.map(_.getLong(0)).toSet === expected)
    assert(expected.nonEmpty, "fixture should contain some |z|>3 outliers")
  }

  test("q88: audit counters match driver-side recomputation") {
    val r = q("q88_schema_audit").head()
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("props"), col("value"),
        unix_timestamp(col("ts")).as("es"), col("event_type"), col("user_id"))
      .collect()
    assert(r.getLong(r.fieldIndex("n_rows")) === ev.length.toLong)
    assert(r.getLong(r.fieldIndex("null_props")) ===
      ev.count(_.isNullAt(1)).toLong)
    assert(r.getLong(r.fieldIndex("bad_value")) ===
      ev.count(x => x.getDouble(2) < 0 || x.getDouble(2).isNaN).toLong)
    assert(r.getLong(r.fieldIndex("ts_oob")) ===
      ev.count(x => x.getLong(3) < 1704067200L || x.getLong(3) >= 1735689600L).toLong)
    assert(r.getLong(r.fieldIndex("n_types")) ===
      ev.map(_.getString(4)).distinct.length.toLong)
    assert(r.getLong(r.fieldIndex("n_users")) ===
      ev.map(_.getLong(5)).distinct.length.toLong)
  }

  test("q86: one row per source; the in-query MG audit passes everywhere") {
    val rows = q("q86_freq_sketch").collect()
    val nSources = Tables.documents(spark, sf)
      .select(countDistinct(col("source"))).head().getLong(0)
    assert(rows.length.toLong === nSources)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_tokens")) > 0)
      assert(r.getLong(r.fieldIndex("n_heavy")) >= 0)
      assert(r.getBoolean(r.fieldIndex("covered")),
        "sketch candidates must cover every true heavy hitter")
      assert(r.getBoolean(r.fieldIndex("bounds_ok")),
        "sketch estimates must stay within the N/(k+1) undercount bound")
    }
  }

  test("q101: overlap matrix matches driver-side span-set intersection") {
    val rows = q("q101_source_overlap").collect()
    assert(rows.nonEmpty, "synthetic corpus should share spans across sources")
    // driver recomputation: per-source distinct span TEXTS (6-token spans)
    val spanSets = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.flatMap { r =>
        val t = r.getString(1).split(" ")
        t.grouped(6).map(_.mkString(" "))
      }.toSet).toMap
    rows.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      assert(s1 < s2, "pairs must be canonical (s1 < s2)")
      val (a, b) = (spanSets(s1), spanSets(s2))
      assert(r.getLong(2) == a.size.toLong && r.getLong(3) == b.size.toLong)
      assert(r.getLong(4) == a.intersect(b).size.toLong,
        s"shared-span drift for ($s1, $s2)")
      val jac = a.intersect(b).size.toDouble / a.union(b).size
      assert(math.abs(r.getDouble(5) - jac) < 1e-6)
    }
    // every pair with a nonempty intersection is present
    val expectedPairs = spanSets.keys.toSeq.sorted.combinations(2)
      .filter { case Seq(x, y) => spanSets(x).intersect(spanSets(y)).nonEmpty }
      .size
    assert(rows.length == expectedPairs)
  }

  test("q110: sketch estimates sit within HLL error of the exact overlap matrix") {
    // accuracy contract of the sketch twin: with m=256 registers the
    // asymptotic standard error is 1.04/sqrt(256) ~ 6.5%, but the sf0.001
    // span sets (~300-600 distinct) sit squarely in the classic
    // raw-estimate bias region (m < n < 5m — the zone HLL++'s empirical
    // bias table exists for; Heule et al., EDBT 2013), where the plain
    // Flajolet construction overestimates by up to ~25%. The test's job is
    // to catch WRONG constructions (order-of-magnitude drift), so assert
    // 35% on the cardinalities and 40% of the UNION on the overlap (the
    // overlap's error scales with the set sizes, not the overlap itself)
    val spanSets = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.flatMap { r =>
        val t = r.getString(1).split(" ")
        t.grouped(6).map(_.mkString(" "))
      }.toSet).toMap
    val rows = q("q110_overlap_sketch").collect()
    assert(rows.length == spanSets.size * (spanSets.size - 1) / 2,
      "sketch matrix must cover every source pair")
    rows.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      val (a, b) = (spanSets(s1), spanSets(s2))
      val (est1, est2, estU, estO) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      def close(est: Long, exact: Int) =
        math.abs(est - exact) <= math.max(3, 0.35 * exact)
      assert(close(est1, a.size), s"($s1,$s2) est1=$est1 exact=${a.size}")
      assert(close(est2, b.size), s"($s1,$s2) est2=$est2 exact=${b.size}")
      val u = a.union(b).size
      assert(close(estU, u), s"($s1,$s2) estU=$estU exact=$u")
      assert(math.abs(estO - a.intersect(b).size) <= math.max(3, 0.40 * u),
        s"($s1,$s2) overlap est $estO vs exact ${a.intersect(b).size} (union $u)")
    }
  }

  test("q102: vocabulary profile matches driver-side token counting") {
    val rows = q("q102_vocab_growth").collect()
    val bySrc = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.flatMap(_.getString(1).split(" "))
        .groupBy(identity).view.mapValues(_.length).toMap).toMap
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val counts = bySrc(r.getString(0))
      assert(r.getLong(1) == counts.values.sum.toLong, "token total drift")
      assert(r.getLong(2) == counts.size.toLong, "type count drift")
      assert(r.getLong(3) == counts.values.count(_ == 1).toLong, "hapax drift")
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0)
    }
  }

  test("q103: split is a pure key function — independent recomputation, full coverage, sane ratios") {
    val rows = q("q103_stratified_split").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length.toLong == nDocs, "every doc gets exactly one split")
    // independent recomputation from the row key alone
    rows.foreach { r =>
      val b = base32(s"${r.getString(1)}#${r.getLong(0)}") % 10
      val want = if (b < 8) "train" else if (b == 8) "val" else "test"
      assert(r.getString(2) == want, s"doc ${r.getLong(0)} split drift")
    }
    val bySplit = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") + bySplit("test"),
      s"8/1/1 buckets must dominate: $bySplit")
    // determinism across builds (re-runs and cluster layouts can't move docs)
    assert(q("q103_stratified_split").collect().toSeq == rows.toSeq)
  }

  test("q106: keyness scores match independent G² recomputation; only over-represented tokens rank") {
    val rows = q("q106_source_keyness").collect()
    // independent driver-side recomputation from raw text
    val toks = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").map(r.getString(0) -> _))
    val st = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ns = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nn = toks.length.toLong
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length),
        "ranks must be contiguous from 1")
    }
    rows.foreach { r =>
      val (src, tok, a) = (r.getString(0), r.getString(2), r.getLong(3))
      assert(st((src, tok)) == a, "in-source count drift")
      assert(r.getLong(4) == ct(tok) - a, "out-of-source count drift")
      assert(a * nn > ns(src) * ct(tok), "ranked token not over-represented")
      val b = ct(tok) - a
      val g2 = 2.0 * (a * math.log(a.toDouble * nn / (ns(src).toDouble * ct(tok))) +
        (if (b > 0) b * math.log(b.toDouble * nn / (ct(tok).toDouble * (nn - ns(src)))) else 0.0))
      assert(math.abs(r.getDouble(5) - g2) < 1e-3, s"G² drift for ($src,$tok)")
      assert(r.getDouble(5) >= 0.0, "G² of a binomial split is non-negative")
    }
  }

  test("q107: slope recovers a planted exact power law; corpus slopes are sane") {
    import spark.implicits._
    // planted Zipf corpus: token t_r appears round(1000/r) times, r=1..50 —
    // ln f = ln C - 1·ln r, so the fitted slope must be ≈ -1
    val text = (1 to 50).flatMap(r => Seq.fill(math.round(1000.0 / r).toInt)(f"t$r%02d"))
    val planted = java.nio.file.Files.createTempDirectory("zipf").toString
    Seq(("zipf", text.mkString(" ")))
      .toDF("source", "text").withColumn("doc_id", lit(1L))
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$planted/documents.parquet")
    val fit = q2(planted)("q107_zipf_slope").collect()
    assert(fit.length == 1)
    assert(math.abs(fit(0).getDouble(3) - (-1.0)) < 0.05,
      s"planted slope ${fit(0).getDouble(3)} != -1")
    assert(fit(0).getDouble(4) > 0.99, "planted fit must be near-perfect")
    // real corpus: slope negative, r2 a valid share, moments consistent
    q("q107_zipf_slope").collect().foreach { r =>
      assert(r.getDouble(3) < 0.0, "frequency must fall with rank")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(1) > 0 && r.getLong(2) >= r.getLong(1))
    }
  }

  private def q2(dir: String)(name: String): DataFrame =
    SamplingPack.queries(name)(spark, dir)

  test("q104: leakage counts partition the near-dup pair base") {
    val rows = q("q104_split_leakage").collect()
    val nPairs = graft.operators.TextPack.queries("q31_ngram_jaccard")(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nPairs,
      "every near-dup pair lands in exactly one split-pair cell")
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "split pair must be canonical")
    }
  }

  test("q123 epoch plan: integer arithmetic, cap semantics, budget conservation") {
    val rows = q("q123_epoch_plan").collect()
    val denom = rows.map(r =>
      math.floor(math.sqrt(r.getAs[Long]("tot_tokens").toDouble) * 1000.0).toLong).sum
    val budget = 2L * rows.map(_.getAs[Long]("tot_tokens")).sum
    var finalSum = 0L
    rows.foreach { r =>
      val tot = r.getAs[Long]("tot_tokens")
      val w = math.floor(math.sqrt(tot.toDouble) * 1000.0).toLong
      assert(r.getAs[Long]("weight_bp") == 10000L * w / denom)
      val planned = budget * w / denom
      assert(r.getAs[Long]("planned_tokens") == planned)
      val em = planned * 1000L / tot
      assert(r.getAs[Long]("epochs_milli") == em)
      assert(r.getAs[Boolean]("capped") == (em > 2000L))
      val fin = r.getAs[Long]("final_tokens")
      assert(fin == (if (em > 2000L) tot * 2000L / 1000L else planned))
      assert(fin <= planned, "cap can only shrink the draw")
      finalSum += fin
    }
    // floors only ever under-shoot: the plan never exceeds the budget
    assert(finalSum <= budget)
    // the synthetic corpus straddles the cap — both branches are live
    assert(rows.exists(_.getAs[Boolean]("capped")) &&
      rows.exists(!_.getAs[Boolean]("capped")))
  }

  test("q157 mixture reweight equals a driver-side EG-step recomputation") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").toSeq))
    val allToks = docs.flatMap(_._2)
    val tc = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tTok, vSize) = (allToks.length.toLong, tc.size.toLong)
    val lp = tc.map { case (t, c) =>
      t -> math.floor(math.log((c + 1).toDouble / (tTok + vSize).toDouble) * 1e6).toLong
    }
    val perSrc = docs.groupBy(_._1).view.mapValues { ds =>
      val ts = ds.flatMap(_._2)
      (ts.length.toLong, ts.map(lp).sum)
    }.toMap
    val tAll = perSrc.values.map(_._1).sum
    val lpAll = perSrc.values.map(_._2).sum
    val stepped = perSrc.map { case (src, (tS, lpS)) =>
      val excess = math.floor(lpAll.toDouble / tAll.toDouble
        - lpS.toDouble / tS.toDouble).toLong
      val w0 = 1000000L * tS / tAll
      val v = math.floor(w0.toDouble * math.exp(0.1 * excess.toDouble / 1e6)).toLong
      src -> (tS, w0, excess, v)
    }
    val vSum = stepped.values.map(_._4).sum
    val rows = SamplingPack.queries("q157_mixture_reweight")(spark, sf).collect()
    assert(rows.length == stepped.size)
    rows.foreach { r =>
      val (tS, w0, excess, v) = stepped(r.getString(0))
      assert(r.getLong(1) == tS)
      assert(r.getLong(2) == w0)
      assert(r.getLong(3) == excess)
      assert(r.getLong(4) == v)
      assert(r.getLong(5) == 1000000L * v / vSum)
    }
    // the step must actually move mass: unless all sources score equally,
    // some w1 differs from its w0
    assert(rows.exists(r => r.getLong(5) != r.getLong(2)))
  }

  test("q150 DSIR: weights match a driver-side recomputation; top-K order exact") {
    val rows = q("q150_dsir_selection").collect()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
    val B = 1024L
    val bucketed = docs.map { case (id, lang, ts) =>
      (id, lang, ts.map(t => base32(t) % B))
    }
    val cRaw = bucketed.flatMap(_._3).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val cT = bucketed.filter(_._2 == "en").flatMap(_._3).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val (tRaw, tT) = (cRaw.values.sum, cT.values.sum)
    val lr = cRaw.keys.map { b =>
      b -> math.floor(math.log(
        (cT.getOrElse(b, 0L) + 1).toDouble * (tRaw + B).toDouble
          / ((cRaw(b) + 1).toDouble * (tT + B).toDouble)) * 1e6).toLong
    }.toMap
    val w = bucketed.map { case (id, _, bs) => id -> bs.map(lr).sum }.toMap
    val expTop = w.toSeq.sortBy { case (id, wm) => (-wm, id) }.take(50)
    assert(rows.length === expTop.length)
    rows.zip(expTop).foreach { case (r, (id, wm)) =>
      assert(r.getLong(r.fieldIndex("doc_id")) === id)
      assert(r.getLong(r.fieldIndex("w_micro")) === wm, s"doc $id")
    }
    // the selection must actually lean toward the target distribution:
    // selected docs score above the corpus mean weight
    val meanAll = w.values.sum.toDouble / w.size
    val meanSel = expTop.map(_._2).sum.toDouble / expTop.size
    assert(meanSel > meanAll)
  }
}
