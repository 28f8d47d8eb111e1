package graft

import graft.functions.{MinHash, MinHashAggregator}
import org.apache.spark.sql.functions._

class MinHashAggregatorSpec extends GraftSuite {

  test("typed Aggregator signature equals the relational 64-min groupBy exactly") {
    import spark.implicits._
    val mh = MinHash(numHashes = 64, bands = 16, seed = 42L)
    val items = Tables.events(spark, sf)
      .select(col("user_id"), concat(lit("E"), col("event_type")).as("feature"))
      .distinct()

    val relational = mh.signature(items, "user_id", "feature")
      .select(col("user_id"), mh.sigArray.as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap

    val agg = udaf(new MinHashAggregator(64, 42L))
    val typed = items.groupBy(col("user_id"))
      .agg(agg(col("feature")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap

    assert(typed.keySet == relational.keySet)
    typed.foreach { case (u, sig) =>
      assert(sig == relational(u), s"signature mismatch for user $u")
    }
  }

  test("aggregator merge is order-independent (map-side combine safety)") {
    val a = new MinHashAggregator(16, 7L)
    val items = Seq("x", "y", "z", "w", "v")
    val oneShot = items.foldLeft(a.zero)(a.reduce)
    val split = a.merge(
      items.take(2).foldLeft(a.zero)(a.reduce),
      items.drop(2).foldLeft(a.zero)(a.reduce))
    assert(oneShot.toSeq == split.toSeq)
    val reversed = items.reverse.foldLeft(a.zero)(a.reduce)
    assert(oneShot.toSeq == reversed.toSeq)
  }
}
