package graft

import graft.functions.{KMeans, KMeansDistributed}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's (the above-cap training path) against the
  * bit-exact driver path it replaces at scale. */
class KMeansDistributedSpec extends GraftSuite {

  import spark.implicits._

  /** 400 points around 4 well-separated centers, deterministic. */
  private def blobs: Seq[(Long, Seq[Double])] = {
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0), Seq(10.0, 10.0))
    (0 until 400).map { i =>
      val c = centers(i % 4)
      // deterministic sub-unit jitter from the index
      (i.toLong, Seq(c(0) + (i % 7) * 0.1, c(1) + (i % 5) * 0.1))
    }
  }

  test("distributed Lloyd's matches the driver path from the same initial centroids") {
    val data = blobs
    val df = data.toDF("id", "v")
    val pts = data.map(_._2.toVector)
    val init = KMeans.bootstrap(pts, 4, seed = 137L)
    val driver = KMeans.cluster(pts, init)
    val dist = KMeansDistributed.cluster(df, col("v"), init)
    assert(dist.clusters.map(_.weight) == driver.clusters.map(_.weight),
      "assignment counts must match exactly")
    driver.clusters.zip(dist.clusters).foreach { case (a, b) =>
      a.centroid.zip(b.centroid).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9, s"centroid divergence: $x vs $y")
      }
    }
  }

  test("train() above the cap runs distributed over ALL rows, seeded from the capped sample") {
    val data = blobs
    val df = data.toDF("id", "v")
    val cap = 50
    val m = KMeansDistributed.train(df, col("id"), col("v"), k = 4, cap = cap)
    assert(m.clusters.length == 4)
    // trained on the FULL input, not just the sample: weights sum to n
    assert(m.clusters.map(_.weight).sum == data.length.toDouble)
    // parity with the driver algorithm on the full input from the same
    // seeded-sample bootstrap (the algorithm contract, wherever Lloyd's
    // local optimum lands)
    val samplePts = graft.functions.TrainSample(
        df.select(col("id"), col("v")), col("id"), cap)
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toVector).toSeq
    val want = KMeans.cluster(data.map(_._2.toVector),
      KMeans.bootstrap(samplePts, 4, seed = 137L))
    assert(m.clusters.map(_.weight) == want.clusters.map(_.weight))
    m.clusters.zip(want.clusters).foreach { case (a, b) =>
      a.centroid.zip(b.centroid).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9, s"centroid divergence: $x vs $y")
      }
    }
    // deterministic bootstrap: retraining reproduces the model to fp noise
    val m2 = KMeansDistributed.train(df, col("id"), col("v"), k = 4, cap = cap)
    m.clusters.zip(m2.clusters).foreach { case (a, b) =>
      assert(a.weight == b.weight)
      a.centroid.zip(b.centroid).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9)
      }
    }
  }

  test("train() at or below the cap is bit-identical to the driver construction") {
    val data = blobs
    val df = data.toDF("id", "v")
    val m = KMeansDistributed.train(df, col("id"), col("v"), k = 4) // default cap ≫ 400
    val pts = data.sortBy(_._1).map(_._2.toVector)
    val want = KMeans.cluster(pts, KMeans.bootstrap(pts, 4, seed = 137L))
    assert(m == want, "below-cap path must be the exact driver model")
  }

  test("empty clusters keep their centroid (k-repair parity with the driver path)") {
    // k=3 over 2 tight blobs: one centroid starves; both paths must hold it
    val data = (0 until 60).map(i =>
      (i.toLong, Seq(if (i % 2 == 0) 0.0 else 50.0, 0.0 + (i % 3) * 0.01)))
    val df = data.toDF("id", "v")
    val pts = data.map(_._2.toVector)
    val init = Vector(Vector(0.0, 0.0), Vector(50.0, 0.0), Vector(200.0, 200.0))
    val driver = KMeans.cluster(pts, init)
    val dist = KMeansDistributed.cluster(df, col("v"), init)
    assert(driver.clusters(2).centroid == Vector(200.0, 200.0))
    assert(dist.clusters(2).centroid == Vector(200.0, 200.0))
    assert(dist.clusters.map(_.weight) == driver.clusters.map(_.weight))
  }
}
