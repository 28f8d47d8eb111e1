package graft

import graft.operators.SimilarityPack
import org.apache.spark.sql.functions._

class SimilarityPackSpec extends GraftSuite {

  test("every similarity query returns rows at sf0.001 with matching oracle key") {
    SimilarityPack.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(SimilarityPack.oracle.contains(name), s"$name lacks oracle SQL")
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

  test("q40 plan broadcasts the query side (no shuffle of the corpus)") {
    val plan = SimilarityPack.queries("q40_cosine_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast join:\n$plan")
  }
}
