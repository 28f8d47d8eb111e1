package graft

import graft.functions.KMeans
import graft.functions.KMeans.{Cluster, Model}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-logic tests mirroring the reference's KMeansClusteringTestSuite /
  * ClusterModelTestSuite (seeded determinism, ensureK repair, decay blend). */
class KMeansSpec extends AnyFunSuite {

  private val blobA = (0 until 20).map(i => Vector(0.0 + i * 0.01, 0.0))
  private val blobB = (0 until 20).map(i => Vector(10.0 + i * 0.01, 10.0))

  test("lloyd's converges to the two blob means on separated data") {
    val m = KMeans.cluster(blobA ++ blobB, Vector(Vector(1.0, 1.0), Vector(9.0, 9.0)))
    val cs = m.clusters.sortBy(_.centroid.head)
    assert(math.abs(cs(0).centroid(0) - 0.095) < 1e-9)
    assert(cs(0).centroid(1) == 0.0 && cs(1).centroid(1) == 10.0)
    assert(cs(0).weight == 20.0 && cs(1).weight == 20.0)
  }

  test("bootstrap is deterministic and yields k distinct centroids") {
    val pts = (0 until 100).map(i => Vector(i.toDouble, (i * 7 % 13).toDouble))
    val a = KMeans.bootstrap(pts, 4)
    val b = KMeans.bootstrap(pts, 4)
    assert(a == b)
    assert(a.distinct.length == 4)
  }

  test("ensureK splits the heaviest cluster when k grows (weight halves)") {
    val cs = Vector(Cluster(0, Vector(1.0, 1.0), 10.0), Cluster(1, Vector(5.0, 5.0), 2.0))
    val grown = KMeans.ensureK(cs, 3)
    assert(grown.length == 3)
    assert(grown.map(_.index) == Vector(0, 1, 2))
    // the 10.0-weight cluster split into two 5.0 halves with +/- eps offsets
    val halves = grown.filter(_.weight == 5.0)
    assert(halves.length == 2)
    assert(halves.map(_.centroid).distinct.length == 2)
  }

  test("ensureK keeps the k heaviest when k shrinks (reference T2)") {
    val cs = Vector(Cluster(0, Vector(1.0), 1.0), Cluster(1, Vector(2.0), 5.0),
      Cluster(2, Vector(3.0), 3.0))
    val shrunk = KMeans.ensureK(cs, 2)
    assert(shrunk.map(_.weight).sorted == Vector(3.0, 5.0))
  }

  test("decayed update blends centroids by decayed weights (reference F15)") {
    val old = Model(Vector(Cluster(0, Vector(0.0), 4.0)))
    val upd = Model(Vector(Cluster(0, Vector(10.0), 2.0)))
    val merged = old.update(upd, decay = 0.5)
    // ow = 4*0.5 = 2; w = 2+2 = 4; centroid = (0*2 + 10*2)/4 = 5
    assert(merged.clusters.head.weight == 4.0)
    assert(merged.clusters.head.centroid == Vector(5.0))
  }

  test("classify returns the nearest centroid") {
    val m = Model(Vector(Cluster(0, Vector(0.0, 0.0), 1.0), Cluster(1, Vector(10.0, 10.0), 1.0)))
    assert(m.classify(Vector(1.0, 1.0)).index == 0)
    assert(m.classify(Vector(9.0, 9.0)).index == 1)
  }

  test("clustering is invariant across repeated runs (seeded determinism)") {
    val pts = (0 until 50).map(i => Vector((i * 31 % 17).toDouble, (i * 13 % 11).toDouble))
    val m1 = KMeans.cluster(pts, KMeans.bootstrap(pts, 3))
    val m2 = KMeans.cluster(pts, KMeans.bootstrap(pts, 3))
    assert(m1 == m2)
  }
}
