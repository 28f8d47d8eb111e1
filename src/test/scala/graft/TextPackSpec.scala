package graft

import graft.functions.Hashes
import graft.operators.TextPack
import org.apache.spark.sql.functions._

class TextPackSpec extends GraftSuite {

  test("every text query returns rows at sf0.001 with matching oracle key") {
    TextPack.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(TextPack.oracle.contains(name), s"$name lacks oracle SQL")
    }
  }

  test("base32 hash is pinned cross-engine (DuckDB parity contract)") {
    import spark.implicits._
    // value verified against DuckDB: ('0x'||substr(md5('abc'),1,8))::BIGINT
    val got = Seq("abc").toDF("s").select(Hashes.base32(col("s"))).collect()(0).getLong(0)
    assert(got == 2416005272L)
  }

  test("LSH candidates achieve full recall on high-similarity pairs") {
    // every pair q31 confirms at jaccard >= 0.5 must be surfaced by the
    // banded MinHash pipeline (16 bands x 4 rows => ~100% @ s >= 0.9,
    // planted dups are ~0.99)
    val exact = TextPack.queries("q31_ngram_jaccard")(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextPack.queries("q32_dedup_minhash_lsh")(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "no planted near-dup pairs found")
    assert(exact.subsetOf(lsh), s"LSH missed ${exact -- lsh}")
    assert(lsh.subsetOf(exact), s"LSH emitted unverified pairs ${lsh -- exact}")
  }

  test("MinHash estimate approximates exact Jaccard (reference error-bound invariant)") {
    // reference: RecommendationUtilsTestSuite.scala:8-38 asserts |est - jac|
    // small for 100 hashes; with 64 hashes stddev ~ sqrt(s(1-s)/64) ~ 0.06
    // at s=0.5 — allow 4 sigma.
    val rows = TextPack.queries("q32_dedup_minhash_lsh")(spark, sf)
      .select("est_sim", "jac").collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 0.25,
        s"est=${r.getDouble(0)} jac=${r.getDouble(1)}")
    }
  }

  test("exact dedup marks exactly n_docs - n_distinct_texts rows as dups") {
    val docs = Tables.documents(spark, sf)
    val expected = docs.count() - docs.select("text").distinct().count()
    val dups = TextPack.queries("q30_dedup_exact")(spark, sf)
      .filter(col("is_dup")).count()
    assert(dups == expected)
  }

  test("simhash near-dup pairs include all near-identical (jaccard>=0.95) pairs") {
    // simhash over unigram token sets is noisy for very short docs (a ~10
    // token doc flips bits easily), so the guarantee is scoped to
    // near-identical pairs — the planted dups sit at ~0.99.
    val planted = TextPack.queries("q31_ngram_jaccard")(spark, sf)
      .filter(col("jac") >= 0.95)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = TextPack.queries("q34_simhash_neardup")(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(sim), s"simhash missed ${planted -- sim}")
  }

  test("q105: incremental matches == full pair base restricted to batch×corpus") {
    // The incremental path must find EXACTLY the q31 near-dup pairs that
    // straddle the batch/corpus boundary — no misses (a daily ingest can't
    // leak dups) and no corpus×corpus or batch×batch pairs (those are
    // yesterday's work / next batch's work).
    def isNew(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = java.lang.Long.parseLong(
        md.digest(id.toString.getBytes("UTF-8")).take(4)
          .map(b => f"$b%02x").mkString, 16)
      h % 5 == 0
    }
    val full = TextPack.queries("q31_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val straddling = full.flatMap { case (i, j, jac) =>
      (isNew(i), isNew(j)) match {
        case (true, false) => Some((i, j, jac))
        case (false, true) => Some((j, i, jac))
        case _             => None // both-new or both-corpus: out of scope
      }
    }
    val rows = TextPack.queries("q105_incremental_dedup")(spark, sf).collect()
    rows.foreach(r => assert(isNew(r.getLong(0)), "corpus doc in batch output"))
    val got = rows.filter(_.getBoolean(4))
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val want = straddling.groupBy(_._1).map { case (b, ms) =>
      val bestJac = ms.map(_._3).max
      b -> (ms.length.toLong, bestJac,
        ms.filter(_._3 == bestJac).map(_._2).min)
    }
    assert(got == want, "incremental result drifts from the batch×corpus restriction")
    // non-dup batch docs are still reported (the keep verdict), with sentinels
    rows.filterNot(_.getBoolean(4)).foreach { r =>
      assert(r.getLong(1) == 0L && r.getDouble(2) == 0.0 && r.getLong(3) == -1L)
    }
  }

  test("q108: BPE pair counts equal a brute-force recount; top-20 is the true argmax prefix") {
    import org.apache.spark.sql.functions._
    // brute force: every adjacent char pair of every word OCCURRENCE
    val truth = Tables.documents(spark, sf).select(col("text")).collect()
      .flatMap(_.getString(0).toLowerCase.split(" "))
      .filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val got = TextPack.queries("q108_bpe_pairs")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == math.min(20, truth.size))
    got.foreach { case (p, n) => assert(truth(p) == n, s"pair $p: $n vs ${truth(p)}") }
    // the reported pairs are exactly the top-20 of the true distribution
    val want = truth.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == want)
  }

  test("single-pass text queries compile to shuffle-free plans") {
    // q35/q36 are per-row scoring passes: no Exchange may appear before the
    // final presentation sort (scale guard: a shuffle here would be a bug).
    Seq("q35_langid_markers", "q36_quality_score").foreach { q =>
      val df = TextPack.queries(q)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      // exactly one Exchange: the rangepartitioning of the final orderBy
      assert(exchanges <= 1, s"$q has $exchanges exchanges:\n$plan")
    }
  }

  /** Driver-side greedy reference trainer: count adjacent pairs weighted
    * by word freq, pick (n desc, pair asc), apply by a greedy
    * left-to-right scan — the textbook BPE step. Returns the per-round
    * merge records and the final vocabulary state. */
  private def greedyBpe(rounds: Int)
      : (Seq[(Long, String, String, Long)], Map[Vector[String], Long]) = {
    var vocab: Map[Vector[String], Long] = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("w")).collect()
      .map(_.getString(0)).filter(_.length >= 2)
      .groupMapReduce(w => w.map(_.toString).toVector)(_ => 1L)(_ + _)
    val merges = (1 to rounds).map { r =>
      val counts = vocab.toSeq.flatMap { case (syms, wc) =>
        syms.zip(syms.tail).map(p => (s"${p._1} ${p._2}", wc))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val (pair, n) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val Array(x, y) = pair.split(" ")
      vocab = vocab.toSeq.map { case (syms, wc) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
            out += x + y; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), wc)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      (r.toLong, pair, x + y, n)
    }
    (merges, vocab)
  }

  test("q113 BPE merges equal a driver-side greedy reference trainer") {
    // matching the reference trainer proves the two-pass literal-replace
    // distributed form implements true greedy merging on real data
    val (expect, _) = greedyBpe(5)
    val got = TextPack.queries("q113_bpe_merges")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == expect)
  }

  test("q118 applied segmentations equal the greedy trainer's final state") {
    val (_, vocab) = greedyBpe(5)
    val expect = vocab.toSeq
      .map { case (syms, wc) =>
        (syms.mkString, wc, syms.mkString(" "), syms.length.toLong) }
      .sortBy { case (w, wc, _, _) => (-wc, w) }.take(20)
    val got = TextPack.queries("q118_bpe_apply")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == expect)
  }

  test("q125 per-language fertility equals the greedy trainer's measurement") {
    val (_, vocab) = greedyBpe(5)
    val nSym = vocab.map { case (syms, _) => syms.mkString -> syms.length.toLong }
    val perLang = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).toLowerCase.split(" ")
        .filter(_.length >= 2).map(w => (r.getString(0), w)))
      .groupBy(identity).view.mapValues(_.length.toLong)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = perLang.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1).map {
      case (lang, ws) =>
        val words = ws.map(_._2).sum
        val syms = ws.map { case ((_, w), c) => c * nSym(w) }.sum
        val chars = ws.map { case ((_, w), c) => c * w.length }.sum
        (lang, words, syms, chars,
          r4(syms.toDouble / words), r4(chars.toDouble / syms))
    }
    val got = TextPack.queries("q125_bpe_fertility")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expect)
    // merges only ever shrink a word's symbol string
    got.foreach { case (_, words, syms, chars, fert, cps) =>
      assert(syms <= chars && words <= syms)
      assert(fert >= 1.0 && cps >= 1.0)
    }
  }

  test("q112 funnel stages are consistent with the dedup queries they compose") {
    val out = TextPack.queries("q112_dedup_funnel")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.getString(1)).toSeq ==
      Seq("raw", "exact", "minhash_lsh", "simhash"))
    val docs = out.map(_.getLong(2)); val toks = out.map(_.getLong(3))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b }, "docs monotone")
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b }, "tokens monotone")

    // stage 0 = the raw corpus; stage 1 = q30's keep-first survivors
    val raw = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(docs(0) == raw.size && toks(0) == raw.values.sum)
    val s1 = TextPack.queries("q30_dedup_exact")(spark, sf).collect()
      .filter(!_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(docs(1) == s1.size && toks(1) == s1.toSeq.map(raw).sum)

    // stage 2/3: drop j iff a smaller-id partner survived the previous stage
    def survivors(pairsQ: String, prev: Set[Long]): Set[Long] = {
      val drop = TextPack.queries(pairsQ)(spark, sf)
        .select(col("i"), col("j")).collect()
        .filter(r => prev(r.getLong(0))).map(_.getLong(1)).toSet
      prev -- drop
    }
    val s2 = survivors("q32_dedup_minhash_lsh", s1)
    assert(docs(2) == s2.size && toks(2) == s2.toSeq.map(raw).sum)
    val s3 = survivors("q34_simhash_neardup", s2)
    assert(docs(3) == s3.size && toks(3) == s3.toSeq.map(raw).sum)
  }

  test("q160 threshold sweep reconciles with q32's verified pairs; monotone in t") {
    val pairs = TextPack.queries("q32_dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(1),
        math.round(r.getDouble(3) * 10000).toLong))
    val want = Seq(5000L, 6000L, 7000L, 8000L, 9000L).flatMap { t =>
      val qual = pairs.filter(_._2 >= t)
      if (qual.isEmpty) None
      else Some(t -> (qual.length.toLong, qual.map(_._1).distinct.length.toLong))
    }.toMap
    val got = TextPack.queries("q160_dedup_threshold_sweep")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"$got vs $want")
    // tightening the threshold can only shrink the drop set
    val byT = got.toSeq.sortBy(_._1)
    byT.sliding(2).foreach {
      case Seq((_, (p1, d1)), (_, (p2, d2))) => assert(p2 <= p1 && d2 <= d1)
      case _ =>
    }
  }
}
