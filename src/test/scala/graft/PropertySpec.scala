package graft

import graft.functions.KMeans
import graft.streaming.ControlParams
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants over the pure modules (SURVEY §5 "ScalaCheck
  * for bucketing/topN/set-op properties"). Raw ScalaCheck Prop/Test API
  * (the scalatest bridge artifact is not in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val pointGen: Gen[Vector[Double]] =
    Gen.listOfN(3, Gen.chooseNum(-100.0, 100.0)).map(_.toVector)

  test("ensureK always yields exactly k clusters with indices 0..k-1, splits preserve weight") {
    val clusterGen = for {
      c <- pointGen
      w <- Gen.chooseNum(0.1, 50.0)
    } yield KMeans.Cluster(0, c, w)
    check(Prop.forAll(Gen.nonEmptyListOf(clusterGen), Gen.choose(1, 8)) { (cs, k) =>
      val fixed = KMeans.ensureK(cs.toVector, k)
      fixed.length == k &&
        fixed.map(_.index) == (0 until k).toVector &&
        (cs.length > k ||
          math.abs(fixed.map(_.weight).sum - cs.map(_.weight).sum) < 1e-6)
    })
  }

  test("classify returns a centroid at minimal distance (argmin property)") {
    check(Prop.forAll(Gen.nonEmptyListOf(pointGen), pointGen) { (cents, p) =>
      val m = KMeans.Model(cents.toVector.zipWithIndex.map { case (c, i) =>
        KMeans.Cluster(i, c, 1.0)
      })
      KMeans.sqDist(m.classify(p).centroid, p) == cents.map(c => KMeans.sqDist(c, p)).min
    })
  }

  test("decayed update: weight = oldWeight*decay + newWeight; centroid inside the blend segment") {
    check(Prop.forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.1, 100.0),
      Gen.chooseNum(0.1, 100.0), pointGen, pointGen) { (decay, ow, nw, oc, nc) =>
      val merged = KMeans.Model(Vector(KMeans.Cluster(0, oc, ow)))
        .update(KMeans.Model(Vector(KMeans.Cluster(0, nc, nw))), decay)
      math.abs(merged.clusters.head.weight - (ow * decay + nw)) < 1e-9 &&
        merged.clusters.head.centroid.zipWithIndex.forall { case (v, i) =>
          v >= math.min(oc(i), nc(i)) - 1e-9 && v <= math.max(oc(i), nc(i)) + 1e-9
        }
    })
  }

  test("k-means clustering assigns every point: weights sum to the point count") {
    check(Prop.forAll(Gen.listOfN(30, pointGen), Gen.choose(1, 5)) { (pts, k) =>
      val m = KMeans.cluster(pts, KMeans.bootstrap(pts, k))
      m.clusters.map(_.weight).sum == pts.length.toDouble
    }, n = 50)
  }

  test("control-param parse: k/decay round-trip, '='-free garbage errors, comments nothing") {
    check(Prop.forAll(Gen.choose(1, 999)) { k =>
      ControlParams.parse(s"k=$k").contains(ControlParams.K(k))
    })
    check(Prop.forAll(Gen.chooseNum(0.0, 1.0)) { d =>
      ControlParams.parse(s"decay=$d").contains(ControlParams.Decay(d))
    })
    check(Prop.forAll(Gen.alphaStr.suchThat(s => s.nonEmpty && !s.startsWith("#"))) { s =>
      ControlParams.parse(s) match {
        case Some(ControlParams.ParseError(_, _)) => true
        case _ => false
      }
    })
    assert(ControlParams.parse("# anything").isEmpty)
    assert(ControlParams.parse("").isEmpty)
  }
}
