package graft

import graft.operators.ActivityPack
import org.apache.spark.sql.functions._

class ActivityPackSpec extends GraftSuite {

  test("every activity query returns rows at sf0.001") {
    ActivityPack.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("q61 sliding frequency fan-out: sum(frequency) = 12 * |events|") {
    val n = Tables.events(spark, sf).count()
    val total = ActivityPack.queries("q61_activity_frequency")(spark, sf)
      .agg(sum("frequency")).collect()(0).getLong(0)
    assert(total == 12 * n)
  }

  test("seeded model is deterministic across builds (reference Random(137) fixture)") {
    val m1 = ActivityPack.model(spark, sf)
    val m2 = ActivityPack.model(spark, sf)
    assert(m1 == m2)
    assert(m1.clusters.length == 4)
    assert(m1.clusters.map(_.weight).sum == Tables.documents(spark, sf).count().toDouble)
  }

  test("distributed classification agrees with the driver-side model") {
    val m = ActivityPack.model(spark, sf)
    val feats = ActivityPack.queries("q60_text_features")(spark, sf).collect()
      .map(r => r.getLong(0) -> Vector(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val classified = ActivityPack.queries("q62_classified_docs")(spark, sf).collect()
    classified.foreach { r =>
      val (id, cl) = (r.getLong(0), r.getInt(1))
      assert(cl == m.classify(feats(id)).index, s"doc $id classified differently")
      assert(r.getDouble(2) >= 0.0)
    }
    assert(classified.map(_.getInt(1)).distinct.sorted.forall(c => c >= 0 && c < 4))
  }
}
