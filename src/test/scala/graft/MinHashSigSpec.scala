package graft

import graft.functions.{Hashes, MinHash, MinHashSig}
import org.apache.spark.sql.functions._

/** The native one-pass MinHash signature expression: exact equality with
  * the relational explode→min-agg build, plan shape (map-only, codegen),
  * SQL registration via GraftExtensions. */
class MinHashSigSpec extends GraftSuite {

  private val mh = MinHash(numHashes = 64, bands = 16, seed = 42L)

  private def shingles = {
    val toks = split(col("text"), " ")
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - lit(2)),
        i => concat_ws(" ", slice(toks, i, lit(3))))))
      .otherwise(array().cast("array<string>"))
  }

  test("expression signature equals the relational explode+aggregate signature") {
    val docs = Tables.documents(spark, sf)
    val exprSig = docs
      .select(col("doc_id"), MinHashSig.of(shingles, 64, 42L).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val aggSig = mh.signature(
        docs.select(col("doc_id"), explode(shingles).as("sh")), "doc_id", "sh")
      .select(col("doc_id"), mh.sigArray.as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(exprSig.keySet == aggSig.keySet)
    exprSig.foreach { case (id, sig) =>
      assert(sig == aggSig(id), s"doc $id signatures diverge")
    }
  }

  test("base-hash parity: expression slot 0 matches the pinned md5 contract") {
    import spark.implicits._
    // base32('abc') = 2416005272 (pinned in TextPackSpec against DuckDB);
    // slot_i of a one-element set must be (a_i*x + b_i) mod P exactly
    val fam = Hashes.family(64, 42L)
    val got = Seq(Seq("abc")).toDF("arr")
      .select(MinHashSig.of(col("arr"), 64, 42L).as("sig"))
      .collect()(0).getSeq[Long](0)
    fam.zipWithIndex.foreach { case ((a, b), i) =>
      assert(got(i) == (a * 2416005272L + b) % Hashes.P)
    }
  }

  test("unicode elements hash identically to the relational md5 path") {
    import spark.implicits._
    // multi-byte UTF-8: the kernel hashes UTF8String bytes, Spark's md5()
    // hashes the same bytes — slot 0 must agree exactly
    val words = Seq("héllo wörld", "日本語", "emoji 🚀 test")
    val viaExpr = words.map { w =>
      Seq(Seq(w)).toDF("arr")
        .select(MinHashSig.of(col("arr"), 64, 42L)).collect()(0).getSeq[Long](0).head
    }
    val fam = Hashes.family(64, 42L)
    val viaBuiltin = words.map { w =>
      val x = Seq(w).toDF("s").select(Hashes.base32(col("s"))).collect()(0).getLong(0)
      (fam.head._1 * x + fam.head._2) % Hashes.P
    }
    assert(viaExpr == viaBuiltin)
  }

  test("empty and all-null element sets yield NULL (filtered like the agg path)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("x y z"))
    ).toDF("id", "arr")
      .select(col("id"), MinHashSig.of(col("arr"), 64, 42L).as("sig"))
    val rows = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows(1L), "empty set must produce NULL")
    assert(!rows(2L))
  }

  test("signature build is a map-only plan: no exchange, inside codegen") {
    val docs = Tables.documents(spark, sf)
    val df = docs.select(col("doc_id"), MinHashSig.of(shingles, 64, 42L).as("sig"))
      .filter(col("sig").isNotNull)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signature pass must not shuffle:\n$plan")
    // whole-stage codegen spans print as *(n) — the project must be inside one
    assert(plan.contains("*("), s"expected whole-stage codegen:\n$plan")
  }

  test("minhash_sig is callable from SQL via GraftExtensions") {
    // the shared test session is built with
    // spark.sql.extensions=graft.GraftExtensions (SparkTestBase)
    val row = spark.sql(
      "SELECT minhash_sig(array('abc')) AS sig").collect()(0)
    val fam = Hashes.family(64, 42L)
    assert(row.getSeq[Long](0).head == (fam.head._1 * 2416005272L + fam.head._2) % Hashes.P)
  }
}
