package graft.operators

import graft.GraftSuite
import org.apache.spark.sql.functions._

/** [[CurationPack.trainPerceptron]] — distributed batch classifier
  * training as declarative aggregates (the quality-classifier capability:
  * learn a cheap linear filter from labels, score the corpus with it).
  */
class PerceptronSpec extends GraftSuite {

  import spark.implicits._

  /** (y, x0=1, x1) rows. */
  private def feat(rows: Seq[(Long, Long)]) =
    rows.toDF("y", "x1").select(col("y"), lit(1L).as("x0"), col("x1"))

  test("separable data is fully classified after a few epochs") {
    // y = +1 iff x1 is large — wide margin, so batch updates converge fast
    val f = feat(Seq.tabulate(20)(i =>
      if (i % 2 == 0) (1L, 15L + i) else (-1L, 2L + i % 5))).cache()
    val w = CurationPack.trainPerceptron(f, 2, epochs = 20)
    val margins = f.crossJoin(broadcast(w))
      .select((col("y") * CurationPack.perceptronScore(2)).as("m"))
      .as[Long].collect()
    assert(margins.forall(_ > 0), s"unseparated margins: ${margins.toSeq}")
  }

  test("weights are invariant under input partitioning (integer exactness)") {
    val rows = Seq.tabulate(50)(i => ((i % 3) * 2 - 1L + (if (i % 3 == 2) -1L else 0L), i.toLong))
      .map { case (y, x) => (if (y >= 0) 1L else -1L, x) }
    val a = CurationPack.trainPerceptron(feat(rows), 2, 5).collect().head
    val b = CurationPack.trainPerceptron(feat(rows).repartition(17), 2, 5)
      .collect().head
    assert(a == b)
  }

  test("epoch 1 from zero weights sums every y*x (all margins are 0)") {
    val rows = Seq((1L, 3L), (1L, 5L), (-1L, 2L))
    val w = CurationPack.trainPerceptron(feat(rows), 2, 1).collect().head
    assert(w.getLong(0) == 1L + 1L - 1L)       // Σ y·x0
    assert(w.getLong(1) == 3L + 5L - 2L)       // Σ y·x1
  }

  test("zero epochs returns the zero vector") {
    val w = CurationPack.trainPerceptron(feat(Seq((1L, 1L))), 2, 0).collect().head
    assert(w.getLong(0) == 0L && w.getLong(1) == 0L)
  }
}
