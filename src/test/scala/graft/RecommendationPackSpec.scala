package graft

import graft.operators.RecommendationPack
import org.apache.spark.sql.functions._

class RecommendationPackSpec extends GraftSuite {

  test("every recommendation query returns rows at sf0.001 with matching oracle key") {
    RecommendationPack.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(RecommendationPack.oracle.contains(name), s"$name lacks oracle SQL")
    }
  }

  test("recommendations: at most 5 per user, similarity descending, no self/known") {
    val rows = RecommendationPack.queries("q53_recommendations")(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      assert(rs.length <= 5)
      val sims = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      rs.foreach { r =>
        val c = r.getLong(2)
        assert(c != u, "self-recommendation")
        assert(math.abs(u - c) > 2, s"known user recommended: $u -> $c")
        assert(r.getDouble(3) >= 0.2)
      }
    }
  }

  test("estimated similarity approximates exact feature-set Jaccard (reference invariant)") {
    // reference: RecommendationUtilsTestSuite.scala:8-38 (error <= 0.015 at
    // 100 hashes on big sets; 64 hashes + small sets => 4-sigma ~ 0.25)
    val feats = RecommendationPack.queries("q50_user_features")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1).split(",").toSet).toMap
    val rows = RecommendationPack.queries("q53_recommendations")(spark, sf).collect()
    rows.foreach { r =>
      val (u, c, est) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val (a, b) = (feats(u), feats(c))
      val jac = a.intersect(b).size.toDouble / a.union(b).size
      assert(math.abs(est - jac) <= 0.25, s"u=$u c=$c est=$est jac=$jac")
    }
  }

  test("class-member cap bounds the expansion of a pathological giant duplicate class") {
    // every user sharing one signature is the degenerate regime the cap
    // exists for: without it one member list is a single row holding the
    // whole user set and its pair expansion is quadratic
    import spark.implicits._
    val n = 10000
    val giant = (0 until n).map(u => (u.toLong, 0L))
    val small = Seq((n.toLong, n.toLong), (n + 1L, n.toLong), (n + 2L, n.toLong))
    val userCls = (giant ++ small).toDF("user_id", "cls")
    val clsSims = Seq((0L, n.toLong, 0.5)).toDF("ucls", "ccls", "est_sim")
    val cap = 100
    val out = RecommendationPack.expandClassPairs(clsSims, userCls, cap).collect()
    assert(out.length <= cap * small.length,
      s"giant class expanded to ${out.length} pairs despite cap $cap")
    assert(out.nonEmpty, "cap must truncate, not drop, the class")
    // deterministic truncation: the cap SMALLEST member ids survive
    assert(out.map(_.getLong(0)).forall(_ < cap),
      "capped member list is not the deterministic smallest-id prefix")
  }

  test("LSH buckets only contain users that really share a band signature") {
    // bucket membership is symmetric: every bucket lists >= 2 users and the
    // total bucket membership bounds the candidate pair count
    val rows = RecommendationPack.queries("q52_lsh_buckets")(spark, sf).collect()
    rows.foreach { r => assert(r.getLong(3) >= 2) }
  }
}
