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

  test("LSH buckets only contain users that really share a band signature") {
    // bucket membership is symmetric: every bucket lists >= 2 users and the
    // total bucket membership bounds the candidate pair count
    val rows = RecommendationPack.queries("q52_lsh_buckets")(spark, sf).collect()
    rows.foreach { r => assert(r.getLong(3) >= 2) }
  }
}
