package graft

import graft.functions.FreqSketch
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Misra-Gries guarantees q86 relies on (the sketch itself is not
  * oracle-checkable — candidate sets are stream-order sensitive):
  * heavy-hitter completeness, bounded undercount, and mergeability. */
class FreqSketchSpec extends AnyFunSuite {

  private def runSeq(sk: FreqSketch, items: Seq[String]): FreqSketch.Buf =
    items.foldLeft(sk.zero)(sk.reduce)

  /** Zipf-ish deterministic stream: token t_i appears ~N/i times. */
  private def stream: Seq[String] = {
    val parts = (1 to 40).flatMap(i => Seq.fill(1200 / i)(s"t$i"))
    // deterministic interleave (no RNG): spread by round-robin position
    parts.zipWithIndex.sortBy { case (_, ix) => (ix * 2654435761L) % 100003 }
      .map(_._1)
  }

  private def exact(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("every item with count > N/(k+1) survives; undercount <= N/(k+1)") {
    for (k <- Seq(4, 8, 16)) {
      val sk = new FreqSketch(k)
      val buf = runSeq(sk, stream)
      val truth = exact(stream)
      val n = stream.size.toLong
      val bound = n / (k + 1)
      assert(buf.n === n)
      assert(buf.counts.size <= k)
      truth.filter(_._2 > bound).keys.foreach { t =>
        assert(buf.counts.contains(t), s"k=$k lost heavy hitter $t")
      }
      buf.counts.foreach { case (t, est) =>
        assert(est <= truth(t), s"k=$k overcounted $t")
        assert(truth(t) - est <= bound, s"k=$k undercount of $t exceeds N/(k+1)")
      }
    }
  }

  test("merge of per-chunk sketches preserves both bounds over the union") {
    val k = 8
    val sk = new FreqSketch(k)
    val chunks = stream.grouped(997).map(c => runSeq(sk, c)).toSeq
    val mergedLtr = chunks.reduceLeft(sk.merge)
    val mergedTree = chunks.grouped(2)
      .map(g => g.reduceLeft(sk.merge)).reduceLeft(sk.merge)
    val truth = exact(stream)
    val n = stream.size.toLong
    val bound = n / (k + 1)
    for (m <- Seq(mergedLtr, mergedTree)) {
      assert(m.n === n)
      assert(m.counts.size <= k)
      truth.filter(_._2 > bound).keys.foreach { t =>
        assert(m.counts.contains(t), s"merge lost heavy hitter $t")
      }
      m.counts.foreach { case (t, est) =>
        assert(est <= truth(t) && truth(t) - est <= bound)
      }
    }
  }

  test("distributed q86 audit agrees with a local exact recount") {
    import org.apache.spark.sql.functions._
    val spark = SparkTestBase.spark
    val out = graft.operators.SamplingPack.queries("q86_freq_sketch")(
      spark, SparkTestBase.sf).collect()
    val exactCounts = Tables.documents(spark, SparkTestBase.sf)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").count().collect()
      .groupBy(_.getString(0))
    assert(out.nonEmpty)
    out.foreach { r =>
      val src = r.getString(r.fieldIndex("source"))
      val n = r.getLong(r.fieldIndex("n_tokens"))
      // n_heavy equals the locally recomputed heavy-hitter count, and the
      // in-query coverage/undercount audit of the sketch passed
      val heavy = exactCounts(src).count(_.getLong(2) * 9 > n) // k=8
      assert(r.getLong(r.fieldIndex("n_heavy")) == heavy.toLong)
      assert(r.getBoolean(r.fieldIndex("covered")),
        s"source $src: candidates missed a true heavy hitter")
      assert(r.getBoolean(r.fieldIndex("bounds_ok")),
        s"source $src: an estimate left the undercount bound")
    }
  }
}
