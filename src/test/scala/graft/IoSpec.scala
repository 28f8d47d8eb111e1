package graft

import graft.sources.{CsvTables, KeyedUpsertSink}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class IoSpec extends GraftSuite {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("pipe-CSV round-trip preserves the events table (S6/F1/F3)") {
    val dir = tmpDir("graft_csv")
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    // props contains '{"k": 69}' — no pipes, safe unquoted? it has spaces and
    // braces; csv writer quotes as needed
    ev.coalesce(1).write.mode("overwrite")
      .option("sep", "|").option("header", "true").csv(dir)

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val back = CsvTables.readPipeCsv(spark, dir, schema)

    val a = Tables.events(spark, sf)
      .select(col("event_id"), unix_timestamp(col("ts")).as("t"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .orderBy(col("event_id")).collect()
    val b = back
      .select(col("event_id"), unix_timestamp(col("ts")).as("t"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .orderBy(col("event_id")).collect()
    assert(a.sameElements(b))
  }

  test("tag-set literal parse (F2): bracket lists, spaces, empty") {
    import spark.implicits._
    val df = Seq("[12, 34]", "[7]", "[]", "[ ]").toDF("raw")
      .select(CsvTables.parseTagSet(col("raw")).as("tags"))
    val got = df.collect().map(_.getSeq[Int](0).toList)
    assert(got.toList == List(List(12, 34), List(7), Nil, Nil))
  }

  test("keyed upsert sink: last-write-wins by version, stale writes ignored, replay idempotent") {
    import spark.implicits._
    val dir = tmpDir("graft_upsert") + "/stats"
    val b1 = Seq((1L, 100L, 5L), (2L, 100L, 7L)).toDF("post_id", "window_end", "n")
    KeyedUpsertSink.upsert(spark, dir, b1, Seq("post_id"), "window_end")

    // newer window for post 1, stale (older) for post 2
    val b2 = Seq((1L, 200L, 9L), (2L, 50L, 1L)).toDF("post_id", "window_end", "n")
    KeyedUpsertSink.upsert(spark, dir, b2, Seq("post_id"), "window_end")

    val got = spark.read.parquet(dir).orderBy("post_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List((1L, 200L, 9L), (2L, 100L, 7L)))

    // exact replay of b2 must not change anything (idempotence, W10)
    KeyedUpsertSink.upsert(spark, dir, b2, Seq("post_id"), "window_end")
    val again = spark.read.parquet(dir).orderBy("post_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(again == got)
  }

  test("ORC round-trip preserves the events table (columnar sink beyond parquet)") {
    val dir = tmpDir("graft_orc") + "/events"
    val src = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("JSON-lines round-trip with explicit schema (semi-structured interchange)") {
    val dir = tmpDir("graft_json") + "/events"
    val src = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value", "props")
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
