package graft

import graft.operators.MultimodalPack
import org.apache.spark.sql.functions._

class MultimodalPackSpec extends GraftSuite {

  test("every multimodal query returns rows at sf0.001") {
    MultimodalPack.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("media table: binary payload + typed metadata schema") {
    val m = MultimodalPack.media(spark, sf)
    val sch = m.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
    assert(m.select("kind").distinct().count() == 3)
  }

  test("stub decode is deterministic and covers every media row (q71)") {
    val a = MultimodalPack.queries("q71_media_decode")(spark, sf).collect()
    val b = MultimodalPack.queries("q71_media_decode")(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.length == Tables.documents(spark, sf).count())
    a.foreach { r =>
      assert(r.getInt(2) == 224 && r.getInt(3) == 224) // resize target
      assert(r.getLong(4) > 0)                          // n_bytes
    }
  }

  test("decode checksum matches a driver-side recomputation (plumbing carries bytes intact)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val decoded = MultimodalPack.queries("q71_media_decode")(spark, sf).collect()
    decoded.take(50).foreach { r =>
      val bytes = docs(r.getLong(0)).getBytes("UTF-8")
      var crc = 0L
      bytes.foreach(b => crc = (crc * 31 + (b & 0xff)) % MultimodalPack.CRC_MOD)
      assert(r.getLong(5) == crc, s"checksum drift for media ${r.getLong(0)}")
      assert(r.getLong(4) == bytes.length.toLong)
    }
  }

  test("decode plan reads only the needed columns and has no shuffle") {
    val plan = MultimodalPack.queries("q71_media_decode")(spark, sf)
      .queryExecution.executedPlan.toString
    // mapPartitions decode must not shuffle (orderBy adds the final sort
    // exchange only)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"decode path shuffles:\n$plan")
  }
}
