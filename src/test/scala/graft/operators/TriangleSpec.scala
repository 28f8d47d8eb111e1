package graft.operators

import graft.GraftSuite
import org.apache.spark.sql.functions._

/** [[GraphPack.triangleStats]] — degree-ordered triangle counting.
  * All outputs are exact BIGINTs, so assertions are equalities.
  */
class TriangleSpec extends GraftSuite {

  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    GraphPack.triangleStats(
        edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
          .distinct.toDF("a", "b"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (n, d, t, c) => n -> (d, t, c) }.toMap

  test("K4: every node sits in 3 of the 4 triangles with coefficient 1") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val r = stats(k4)
    assert(r.size == 4)
    r.values.foreach { case (d, t, c) =>
      assert(d == 3 && t == 3 && c == 1000000L)
    }
  }

  test("a path has no triangles; coefficient is 0") {
    val r = stats(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(r.values.forall(_._2 == 0L))
    assert(r(2L) == ((2L, 0L, 0L)))
  }

  test("one triangle with a pendant: the hub's coefficient drops to 1/3") {
    // triangle 1-2-3 plus pendant 3-4: node 3 has deg 3, one triangle,
    // coef = 2*1/(3*2) = 1/3 → 333333 ppm (floor)
    val r = stats(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(r(1L) == ((2L, 1L, 1000000L)))
    assert(r(3L) == ((3L, 1L, 333333L)))
    assert(r(4L) == ((1L, 0L, 0L)))
  }

  test("counts are invariant under input partitioning and edge direction") {
    val edges = (0L until 60L).map(i => (i % 9, (i * 5 + 2) % 9))
      .filter { case (x, y) => x != y }
    val a = stats(edges)
    val b = GraphPack.triangleStats(
        edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
          .distinct.toDF("a", "b").repartition(11))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (n, d, t, c) => n -> (d, t, c) }.toMap
    assert(a == b)
    // flipping raw direction before canonicalization changes nothing
    val c = stats(edges.map { case (x, y) => (y, x) })
    assert(a == c)
  }
}
