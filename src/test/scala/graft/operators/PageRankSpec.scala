package graft.operators

import graft.GraftSuite
import org.apache.spark.sql.functions._

/** [[GraphPack.pageRank]] — integer micro-unit weighted PageRank.
  *
  * All rank values are exact BIGINTs (floor division throughout), so the
  * assertions below are equalities, not tolerances. Base teleport mass per
  * node is floor((1-d)·SCALE / N) = floor(3·SCALE / (20·N)).
  */
class PageRankSpec extends GraftSuite {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long],
                  iters: Int = GraphPack.PR_ITERS): Map[Long, Long] =
    GraphPack.pageRank(edges.toDF("src", "dst"), nodes.toDF("node"), iters)
      .as[(Long, Long)].collect().toMap

  test("a node with no in-links holds exactly the teleport base") {
    // A→B, B→A, C→B: C receives nothing, so after any iteration its rank
    // is exactly floor(3·SCALE / (20·3))
    val r = run(Seq((1L, 2L), (2L, 1L), (3L, 2L)), Seq(1L, 2L, 3L))
    val base = 3 * GraphPack.PR_SCALE / (20 * 3)
    assert(r(3L) == base)
    // B has two in-links (A's and C's full out-mass), A only B's
    assert(r(2L) > r(1L) && r(1L) > r(3L))
  }

  test("total mass never exceeds the initial SCALE (dangling mass leaks)") {
    // B is dangling: its damped mass leaves the system each iteration
    val r = run(Seq((1L, 2L), (3L, 2L)), Seq(1L, 2L, 3L))
    assert(r.values.sum <= GraphPack.PR_SCALE)
    assert(r.values.sum > 0)
  }

  test("isolated nodes keep the base; multi-edges act as weights") {
    // two A→B edges vs one A→C edge: B draws 2/3 of A's damped mass
    val r = run(Seq((1L, 2L), (1L, 2L), (1L, 3L)), Seq(1L, 2L, 3L, 4L))
    assert(r(2L) > r(3L))
    assert(r(4L) == 3 * GraphPack.PR_SCALE / (20 * 4))
  }

  test("ranks are invariant under input partitioning (integer exactness)") {
    val edges = (0L until 40L).map(i => (i % 7, (i * 3) % 7))
    val nodes = (0L until 7L).toSeq
    val a = run(edges, nodes)
    val b = GraphPack.pageRank(
        edges.toDF("src", "dst").repartition(13),
        nodes.toDF("node").repartition(3), GraphPack.PR_ITERS)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("zero iterations returns the uniform start vector") {
    val r = run(Seq((1L, 2L)), Seq(1L, 2L), iters = 0)
    assert(r == Map(1L -> GraphPack.PR_SCALE / 2, 2L -> GraphPack.PR_SCALE / 2))
  }
}
