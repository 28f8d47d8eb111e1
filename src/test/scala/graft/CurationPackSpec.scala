package graft

import graft.operators.{CurationPack, TextPack}
import org.apache.spark.sql.functions._

class CurationPackSpec extends GraftSuite {

  test("every curation query returns rows at sf0.001 with matching oracle key") {
    CurationPack.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(CurationPack.oracle.contains(name), s"$name lacks oracle SQL")
    }
  }

  test("decontamination ratios are bounded and the split is disjoint") {
    val rows = CurationPack.queries("q55_decontaminate")(spark, sf).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_shingles"); val hit = r.getAs[Long]("n_hit")
      val c = r.getAs[Double]("contamination")
      assert(hit >= 0 && hit <= n)
      assert(c >= 0.0 && c <= 1.0)
      assert(r.getAs[Boolean]("flagged") == (c >= 0.6))
    }
    // eval docs are a strict subset: every doc_id here must hash into the split
    val testIds = rows.map(_.getAs[Long]("doc_id")).toSet
    val allTest = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        (graft.functions.Hashes.base32(col("doc_id").cast("string")) % 5 === 0)
          .as("t"))
      .collect().filter(_.getAs[Boolean]("t")).map(_.getAs[Long]("doc_id")).toSet
    assert(testIds.subsetOf(allTest))
  }

  test("boilerplate accounting: chunks partition the doc, clean <= total") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CurationPack.queries("q56_boilerplate")(spark, sf).collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nChunks = r.getAs[Long]("n_chunks")
      val clean = r.getAs[Long]("clean_tokens")
      assert(nChunks == (docs(id) - 1) / 10 + 1, s"doc $id chunk count")
      assert(clean <= docs(id) && clean >= 0)
      assert(r.getAs[Long]("n_boiler") <= nChunks)
    }
  }

  test("span dedup keeps exactly one copy of every span and reassembles in order") {
    import spark.implicits._
    val rows = CurationPack.queries("q77_span_dedup")(spark, sf).collect()
    // corpus-wide: kept spans across all docs == distinct span texts
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val spansOf = docs.map { case (id, t) =>
      id -> t.grouped(6).map(_.mkString(" ")).toVector
    }
    val distinctSpans = spansOf.values.flatten.toSet
    assert(rows.map(_.getAs[Long]("n_kept")).sum == distinctSpans.size,
      "total kept == corpus-distinct spans")
    // per doc: first corpus occurrence (min doc_id, then position) survives,
    // later copies don't; new_text is the kept spans joined in order
    val firstOwner = spansOf.toSeq.sortBy(_._1)
      .flatMap { case (id, sp) => sp.zipWithIndex.map { case (s, k) => (s, id, k) } }
      .groupBy(_._1).map { case (s, occ) => s -> occ.minBy(o => (o._2, o._3)) }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val sp = spansOf(id)
      val kept = sp.zipWithIndex.filter { case (s, k) =>
        firstOwner(s)._2 == id && firstOwner(s)._3 == k
      }.map(_._1)
      assert(r.getAs[Long]("n_spans") == sp.size, s"doc $id span count")
      assert(r.getAs[Long]("n_kept") == kept.size, s"doc $id kept count")
      assert(r.getAs[String]("new_text") == kept.mkString(" "), s"doc $id text")
    }
    assert(rows.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_spans")),
      "the corpus contains at least one removed duplicate span")
  }

  test("span dedup matches a reference implementation on a randomized corpus") {
    import spark.implicits._
    // tiny vocab + short docs: guaranteed duplicate spans, ragged tails,
    // docs shorter than one span, within-doc repeats
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("a", "b", "c")
    val docs = (0L until 60L).map { id =>
      id -> Vector.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
    }
    val dir = java.nio.file.Files.createTempDirectory("spandedup").toString
    docs.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val spansOf = docs.map { case (id, t) =>
      id -> t.grouped(6).map(_.mkString(" ")).toVector
    }.toMap
    val firstOwner = spansOf.toSeq.sortBy(_._1)
      .flatMap { case (id, sp) => sp.zipWithIndex.map { case (s, k) => (s, id, k) } }
      .groupBy(_._1).map { case (s, occ) => s -> occ.minBy(o => (o._2, o._3)) }
    val rows = CurationPack.queries("q77_span_dedup")(spark, dir).collect()
    assert(rows.length == docs.length)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val kept = spansOf(id).zipWithIndex.filter { case (s, k) =>
        firstOwner(s)._2 == id && firstOwner(s)._3 == k
      }.map(_._1)
      assert(r.getAs[Long]("n_spans") == spansOf(id).size)
      assert(r.getAs[Long]("n_kept") == kept.size, s"doc $id kept count")
      assert(r.getAs[String]("new_text") == kept.mkString(" "), s"doc $id text")
    }
    assert(rows.map(_.getAs[Long]("n_kept")).sum < rows.map(_.getAs[Long]("n_spans")).sum,
      "vocab chosen so duplicates must exist")
  }

  test("repetition filter: a pathological repeat doc fails, varied doc passes") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam ham"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "solo") // single token: no bigrams — ratio must be 0, not NULL
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("curation").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CurationPack.queries("q57_repetition_filter")(spark, dir).collect()
    val out = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("kept")).toMap
    assert(!out(1L), "repeat-dominated doc must be filtered")
    assert(out(2L), "all-distinct doc must be kept")
    val solo = rows.find(_.getAs[Long]("doc_id") == 3L).get
    assert(solo.getAs[Double]("dup_bigram_ratio") == 0.0,
      "no-bigram doc must score 0, not NULL")
    assert(!solo.isNullAt(solo.fieldIndex("kept")))
  }

  test("sequence packing: per-source intervals are contiguous and seq spans consistent") {
    val rows = CurationPack.queries("q58_pack_sequences")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      var pos = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("start_pos") == pos, "gap in packed token stream")
        pos += r.getAs[Long]("n_tokens")
        val first = r.getAs[Long]("first_seq"); val last = r.getAs[Long]("last_seq")
        assert(first == r.getAs[Long]("start_pos") / 128)
        assert(last == (pos - 1) / 128)
        assert(r.getAs[Long]("n_seqs") == last - first + 1 && first <= last)
      }
    }
  }

  test("q122 batch padding equals a driver-side recomputation; sorting never hurts here") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split(" ").length.toLong))
    def expect(sorted: Boolean): Map[(String, String), (Long, Long, Long, Long)] =
      docs.groupBy(_._1).map { case (src, ds) =>
        val ordered =
          if (sorted) ds.sortBy(t => (t._3, t._2)) else ds.sortBy(_._2)
        val batches = ordered.map(_._3).grouped(8).toSeq
        val tokens = batches.map(_.sum).sum
        val padded = batches.map(b => b.length * b.max).sum
        (src, if (sorted) "length_sorted" else "arrival") ->
          (batches.length.toLong, tokens, padded, (padded - tokens) * 1000000L / padded)
      }
    val exp = expect(sorted = false) ++ expect(sorted = true)
    val got = CurationPack.queries("q122_batch_padding")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == exp)
    // on this corpus (as on any length-varying one) the sort pays for itself
    val bySrc = got.groupBy(_._1._1)
    assert(bySrc.forall { case (_, m) =>
      m.collectFirst { case ((_, "length_sorted"), v) => v._4 }.get <=
        m.collectFirst { case ((_, "arrival"), v) => v._4 }.get
    })
  }

  test("domain rebalance: rates are exact integer floors and kept <= docs") {
    val rows = CurationPack.queries("q59_domain_rebalance")(spark, sf).collect()
    val minTok = rows.map(_.getAs[Long]("tot_tokens")).min
    rows.foreach { r =>
      assert(r.getAs[Long]("rate_bp") == 10000L * minTok / r.getAs[Long]("tot_tokens"))
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
    // the smallest source keeps everything it hashes under 10000 — i.e. all
    assert(rows.exists(r => r.getAs[Long]("rate_bp") == 10000L))
  }

  test("globalNtile equals reference ntile on randomized corpora (ties, all n, remainder cases)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // sizes straddle total % n == 0 and != 0; values collide heavily so
    // the per-value blocks hold many rows (the tie path)
    for (total <- Seq(1, 3, 4, 7, 40, 101); n <- Seq(2, 4, 5)) {
      val rows = (1 to total)
        .map(i => (i.toLong, (rnd.nextInt(5) / 10.0), rnd.nextInt(100).toLong))
      val df = rows.toDF("doc_id", "quality", "n_tokens")
      val got = CurationPack.globalNtile(df, "quality", "doc_id", n)
        .select(col("doc_id"), col("bucket")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: deal the (quality, doc_id)-sorted ids into n ntile
      // buckets, first total%n buckets one larger
      val sorted = rows.sortBy(t => (t._2, t._1)).map(_._1)
      val (q, rr) = (total / n, total % n)
      var idx = 0
      val expect = (1 to n).flatMap { b =>
        val sz = if (b <= rr) q + 1 else q
        val slice = sorted.slice(idx, idx + sz); idx += sz
        slice.map(_ -> b.toLong)
      }.toMap
      assert(got == expect, s"total=$total n=$n diverged")
    }
  }

  test("greedyFill handles oversized items and randomized sizes like the reference greedy") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val cap = 100L
    // sizes include items LARGER than the cap — each must occupy its own
    // file (a branch the real corpus never exercises under q127's cap)
    val rows = for (g <- Seq("a", "b", "c"); i <- 1 to 40) yield
      (g, i.toLong, if (rnd.nextInt(10) == 0) 150L + rnd.nextInt(100)
                    else 1L + rnd.nextInt(60))
    val got = CurationPack.greedyFill(rows.toDS(), cap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3))
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (g, ds) =>
      var fi = 0L; var fill = 0L; var first = true
      ds.sortBy(_._2).map { case (_, id, nb) =>
        if (!first && fill + nb > cap) { fi += 1; fill = nb }
        else { fill += nb; first = false }
        (g, fi, id, nb)
      }
    }.sortBy(t => (t._1, t._3))
    assert(got.toSeq == expect)
    // oversized items always sit alone in their file
    got.groupBy(t => (t._1, t._2)).foreach { case (_, fs) =>
      if (fs.exists(_._4 > cap)) assert(fs.length == 1)
    }
  }

  test("q129 datacard totals reconcile with the passes it composes") {
    val rows = CurationPack.queries("q129_datacard")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("ntok")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length)
    val dupTotal = graft.operators.TextPack
      .queries("q30_dedup_exact")(spark, sf).collect()
      .count(_.getAs[Boolean]("is_dup"))
    assert(rows.map(_.getAs[Long]("n_dup")).sum == dupTotal)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = docs.filter(_._1 == src)
      assert(r.getAs[Long]("n_docs") == mine.length)
      assert(r.getAs[Long]("tot_tokens") == mine.map(_._3).sum)
      assert(r.getAs[Long]("min_tokens") == mine.map(_._3).min)
      assert(r.getAs[Long]("max_tokens") == mine.map(_._3).max)
      assert(r.getAs[Long]("n_en") == mine.count(_._2 == "en"))
      assert(r.getAs[Long]("dup_rate_bp") ==
        r.getAs[Long]("n_dup") * 10000 / r.getAs[Long]("n_docs"))
      val mq = r.getAs[Long]("mean_quality_e4")
      assert(mq >= 0 && mq <= 10000, s"quality mean out of [0,1]: $mq")
    }
  }

  test("q127 shard fill equals a driver-side greedy recomputation; caps respected") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expect = docs.toSeq.sortBy(_._1).flatMap { case (src, ds) =>
      val files = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var fill = 0L
      ds.foreach { case (_, _, nb) =>
        if (files.nonEmpty && fill + nb > 2000L) { files += ((1L, nb)); fill = nb }
        else if (files.isEmpty) { files += ((1L, nb)); fill = nb }
        else {
          val (n, b) = files.last; files(files.length - 1) = (n + 1, b + nb)
          fill += nb
        }
      }
      files.zipWithIndex.map { case ((n, b), i) =>
        (src, i.toLong, n, b, b * 1000000L / 2000L) }
    }
    val got = CurationPack.queries("q127_shard_fill")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect, s"shard layout diverges")
    // no file exceeds the cap unless it holds a single oversized doc
    got.foreach { case (_, _, nDocs, bytes, _) =>
      assert(bytes <= 2000L || nDocs == 1L)
    }
    // file indices are dense per source
    got.groupBy(_._1).foreach { case (_, fs) =>
      assert(fs.map(_._2).sorted.toSeq == (0L until fs.length).toSeq)
    }
  }

  test("q124 curriculum buckets equal a driver-side global ntile") {
    val rows = CurationPack.queries("q124_curriculum")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == Seq(1L, 2L, 3L, 4L),
      "buckets must be 1..4 in order")
    // independent recomputation: sort the corpus by (quality, doc_id) on
    // the driver and deal rows into 4 ntile buckets the SQL-standard way
    val docs = graft.operators.TextPack
      .queries("q36_quality_score")(spark, sf)
      .select(col("doc_id"), col("n_tokens").cast("long"), col("quality"))
      .collect()
      .map(r => (r.getDouble(2), r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._1, t._2))
    val total = docs.length
    val (qq, rr) = (total / 4, total % 4)
    val sizes = (1 to 4).map(i => if (i <= rr) qq + 1 else qq)
    var idx = 0
    val expected = sizes.zipWithIndex.map { case (sz, i) =>
      val slice = docs.slice(idx, idx + sz); idx += sz
      (i + 1L, sz.toLong, slice.map(_._3).sum,
        slice.head._1, slice.last._1)
    }
    val got = rows.map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("tot_tokens"), r.getAs[Double]("q_min"),
      r.getAs[Double]("q_max"))).toSeq
    assert(got == expected, s"bucket stats diverge:\n$got\n$expected")
    // staging is monotone: bucket i's max quality <= bucket i+1's min
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._5 <= b._4, s"quality order broken between ${a._1} and ${b._1}")
    }
  }

  /** Raw (item, label) rating multiset recomputed on the driver. */
  private lazy val ratings: Seq[(Long, String)] =
    Tables.events(spark, sf)
      .select(regexp_extract(col("props"), "(\\d+)", 1).cast("long"),
        col("event_type"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))

  test("q134 label vote equals a driver-side recomputation") {
    val byItem = ratings.groupBy(_._1)
    val expected = byItem.toSeq.flatMap { case (item, rs) =>
      val counts = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = rs.size.toLong
      if (n < 2) None
      else {
        val (topLabel, topCount) =
          counts.toSeq.minBy { case (l, c) => (-c, l) }
        val agree = counts.valuesIterator.map(c => c * (c - 1)).sum
        Some((item, n, counts.size.toLong, topLabel, topCount,
          1000000L * agree / (n * (n - 1))))
      }
    }.sortBy(_._1)
    val got = CurationPack.queries("q134_label_vote")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    got.foreach { case (_, n, _, _, topC, ppm) =>
      assert(topC <= n && ppm >= 0 && ppm <= 1000000L)
    }
  }

  test("q136 kappa components reconcile with q134's per-item table") {
    val Array(row) = CurationPack.queries("q136_fleiss_kappa")(spark, sf).collect()
    val (nItems, nRatings, po, pe, kNum, kDen) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5))
    val perItem = CurationPack.queries("q134_label_vote")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(nItems == perItem.length)
    assert(nRatings == perItem.map(_._2).sum)
    assert(po == perItem.map(_._3).sum / perItem.length)
    // P_e from label totals over the qualifying items
    val qual = perItem.map(_._1).toSet
    val labelTot = ratings.filter(r => qual(r._1)).groupBy(_._2)
      .view.mapValues(_.size.toLong).values.toSeq
    val tot = labelTot.sum
    assert(pe == 1000000L * labelTot.map(c => c * c).sum / (tot * tot))
    assert(kNum == po - pe && kDen == 1000000L - pe)
  }

  test("q141 rater quality reconciles with q134's adjudicated winners") {
    val winners = CurationPack.queries("q134_label_vote")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getString(3), r.getLong(1)))
      .toMap // item -> (top_label, n_ratings)
    // per-rater recompute over qualifying items from the raw event stream
    val perRater = Tables.events(spark, sf)
      .select(regexp_extract(col("props"), "(\\d+)", 1).cast("long"),
        col("user_id"), col("event_type"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .filter(r => winners.contains(r._1))
      .groupBy(_._2).view.mapValues { rs =>
        val agree = rs.count(r => winners(r._1)._1 == r._3).toLong
        (rs.size.toLong, agree)
      }.toMap
    val got = CurationPack.queries("q141_rater_quality")(spark, sf)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == perRater.keySet)
    got.foreach { case (rater, (n, agree, ppm)) =>
      assert((n, agree) == perRater(rater), s"rater $rater")
      assert(ppm == 1000000L * agree / n)
    }
    // global reconciliation: every rating of a qualifying item is judged
    // exactly once, and total agreement is the sum of winner counts
    assert(got.values.map(_._1).sum == winners.values.map(_._2).sum)
  }

  test("q152 k-anonymity audit equals a driver-side recomputation") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) / 1000.0).toLong))
    val full = cust.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val gen = cust.groupBy(c => (c._1, c._2)).view.mapValues(_.length.toLong).toMap
    val rows = CurationPack.queries("q152_kanon_audit")(spark, sf).collect()
    assert(rows.length == full.size)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getString(1), r.getLong(2))
      assert(r.getLong(3) == full(key), s"class $key")
      assert(r.getBoolean(4) == (full(key) < 5L))
      assert(r.getLong(5) == gen((key._1, key._2)))
      assert(r.getBoolean(6) == (gen((key._1, key._2)) < 5L))
    }
    // the audit discriminates: generalization strictly reduces the
    // number of at-risk classes on this data
    val atRiskFull = rows.count(_.getBoolean(4))
    val atRiskGen = rows.count(_.getBoolean(6))
    assert(atRiskFull > 0 && atRiskGen < atRiskFull)
  }

  test("q159 l-diversity equals a driver-side recomputation; both branches live") {
    val pr = Tables.orders(spark, sf)
      .select(col("o_custkey").cast("long"), col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val dom = pr.keys.map(_._1).toSeq.distinct.map { ck =>
      ck -> pr.filter(_._1._1 == ck).toSeq
        .map { case ((_, p), n) => (p, n) }
        .minBy { case (p, n) => (-n, p) }._1
    }.toMap
    val want = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"),
        col("c_mktsegment")).collect()
      .map(r => (r.getLong(1), r.getString(2),
        dom.getOrElse(r.getLong(0), "none")))
      .groupBy(c => (c._1, c._2)).view
      .mapValues(cs => (cs.length.toLong, cs.map(_._3).distinct.length.toLong))
      .toMap
    val rows = CurationPack.queries("q159_ldiversity_audit")(spark, sf).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (n, l) = want((r.getLong(0), r.getString(1)))
      assert(r.getLong(2) == n)
      assert(r.getLong(3) == l)
      assert(r.getBoolean(4) == (l < 3L))
    }
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)))
  }

  test("q165 t-closeness equals an exact BigInt driver recomputation") {
    // per-customer dominant priority (q159's relation)
    val pr = Tables.orders(spark, sf)
      .select(col("o_custkey").cast("long"), col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val dom = pr.keys.map(_._1).toSeq.distinct.map { ck =>
      ck -> pr.filter(_._1._1 == ck).toSeq
        .map { case ((_, p), n) => (p, n) }
        .minBy { case (p, n) => (-n, p) }._1
    }.toMap
    val rows0 = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"),
        col("c_mktsegment")).collect()
      .map(r => (r.getLong(1), r.getString(2),
        dom.getOrElse(r.getLong(0), "none")))
    val nT = BigInt(rows0.length)
    val nV = rows0.groupBy(_._3).view.mapValues(c => BigInt(c.length)).toMap
    val want = rows0.groupBy(c => (c._1, c._2)).view.mapValues { cs =>
      val nC = BigInt(cs.length)
      val nCv = cs.groupBy(_._3).view.mapValues(c => BigInt(c.length)).toMap
      // Σ over ALL global values: absent ones contribute |0 - n_v·n_c|
      val num = nV.map { case (v, nv) =>
        (nCv.getOrElse(v, BigInt(0)) * nT - nv * nC).abs
      }.sum
      (nC, BigInt(1000000) * num / (BigInt(2) * nC * nT))
    }.toMap
    val rows = CurationPack.queries("q165_tcloseness_audit")(spark, sf).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (n, ppm) = want((r.getLong(0), r.getString(1)))
      assert(BigInt(r.getLong(2)) == n)
      assert(BigInt(r.getLong(3)) == ppm,
        s"class (${r.getLong(0)}, ${r.getString(1)}): ${r.getLong(3)} vs $ppm")
      assert(r.getBoolean(4) == (ppm > BigInt(300000)))
    }
    // the audit is informative only if TVD actually varies across classes
    assert(rows.map(_.getLong(3)).distinct.length > 1)
  }

  test("q170 packing curve equals a driver recompute; utilization rises with L until truncation") {
    val ntoks = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0))
    val rows = CurationPack.queries("q170_packing_curve")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(64L, 128L, 256L, 512L))
    rows.foreach { r =>
      val l = r.getLong(0)
      val kept = ntoks.map(n => math.min(n, l)).sum
      assert(r.getLong(1) == ntoks.length.toLong)
      assert(r.getLong(2) == ntoks.count(_ > l).toLong)
      assert(r.getLong(3) == kept)
      assert(r.getLong(4) == ntoks.length * l - kept)
      assert(r.getLong(5) == kept * 1000000L / (ntoks.length * l))
    }
    // the curve is informative: both regimes live (some truncation at the
    // smallest L, some padding waste at the largest)
    assert(rows.head.getLong(2) > 0L, "no doc exceeds the smallest L")
    assert(rows.last.getLong(5) < 1000000L, "no padding at the largest L")
  }

  test("q171 quality curve equals a driver recompute; monotone and discriminating") {
    val perDoc = TextPack.queries("q36_quality_score")(spark, sf)
      .select(col("n_tokens").cast("long"),
        expr("CAST(round(quality * 10000) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nDocs = perDoc.length.toLong
    val nToks = perDoc.map(_._1).sum
    val rows = CurationPack.queries("q171_quality_curve")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq ==
      Seq(5000L, 5500L, 6000L, 6200L, 6500L, 7000L))
    rows.foreach { r =>
      val t = r.getLong(0)
      val kept = perDoc.filter(_._2 >= t)
      assert(r.getLong(1) == kept.length.toLong)
      assert(r.getLong(2) == kept.map(_._1).sum)
      assert(r.getLong(3) == kept.length * 1000000L / nDocs)
      assert(r.getLong(4) == kept.map(_._1).sum * 1000000L / nToks)
    }
    // kept mass is non-increasing in t, and the sweep actually separates
    val keptSeq = rows.map(_.getLong(1)).toSeq
    assert(keptSeq.zip(keptSeq.tail).forall { case (a, b) => a >= b })
    assert(keptSeq.distinct.length > 1, "thresholds do not discriminate")
  }

  test("q153 reliability bins partition the scored corpus exactly") {
    val scored = CurationPack.queries("q114_perceptron")(spark, sf)
      .select(col("y"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sMin = scored.map(_._2).min
    val sMax = scored.map(_._2).max
    def bin(s: Long): Long = ((s - sMin) * 10L) / (sMax - sMin + 1L)
    val byBin = scored.groupBy(c => bin(c._2))
    val rows = CurationPack.queries("q153_reliability")(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.length == byBin.size)
    rows.foreach { r =>
      val b = r.getLong(0)
      val g = byBin(b)
      assert(r.getLong(1) == g.length.toLong, s"bin $b n")
      assert(r.getLong(2) == g.count(_._1 == 1L).toLong, s"bin $b n_pos")
      assert(r.getLong(3) == g.map(_._2).sum, s"bin $b sum_score")
      assert(r.getLong(4) == g.map(_._2).min && r.getLong(5) == g.map(_._2).max)
      assert(r.getLong(6) == 1000000L * g.count(_._1 == 1L) / g.length)
    }
    // bins are ordered and disjoint on the score axis
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(5) < b.getLong(4))
      case _ =>
    }
    // totals reconcile with the corpus
    assert(rows.map(_.getLong(1)).sum == scored.length.toLong)
    assert(rows.map(_.getLong(2)).sum == scored.count(_._1 == 1L).toLong)
  }
}
