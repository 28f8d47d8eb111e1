package graft.sources

import graft.streaming.Ev
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Kafka wiring for the engine's event streams — the reference's S2
  * consumer / K1 producer surface (reference:
  * utils/kafka/KafkaTopic.scala:52-78, utils/FlinkUtils.scala:190-272)
  * re-expressed on Spark's Kafka connector.
  *
  * The connector (`spark-sql-kafka-0-10`) binds at RUNTIME via
  * `format("kafka")`, so this module compiles and ships without it; a
  * deployment adds the connector jar (`--packages
  * org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>`). The wire
  * codec is JSON (this distribution carries no spark-avro module; the
  * reference's Avro schemas, utils/avro/AvroUtils.scala:36-55, map to
  * `from_avro`/`to_avro` the same way when it is present). Everything
  * below the `load()` — the codec columns and the key layout — is plain
  * Catalyst and is unit-tested without a broker (KafkaCodecSpec).
  *
  * Reference semantics preserved:
  *  - earliest start + `read_committed` isolation
  *    (utils/FlinkUtils.scala:264-272);
  *  - per-key partition ordering on write: key = the entity id, Kafka's
  *    default partitioner hashes it, so one post's updates stay ordered
  *    within a partition (utils/kafka/HashPartitioner.scala:11-20 /
  *    application.conf:236-240) — and the downstream keyed upsert sink is
  *    order-independent anyway (monotonic-version MERGE, W11).
  */
object KafkaIO {

  /** Wire schema of one event (epoch-millis timestamp — the reference
    * serializes dates as epoch millis, utils/avro/AvroUtils.scala:36-55). */
  val wireSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Event → JSON wire value (the `to_json` half of the codec). */
  def encode(ev: Column*): Column = to_json(struct(ev: _*))

  /** Columns encoding an [[Ev]]-shaped frame onto the wire: key = user_id
    * (per-user partition ordering), value = JSON of the wire schema. */
  def wireColumns(df: DataFrame): DataFrame =
    df.select(
      col("user_id").cast("string").as("key"),
      encode(
        col("event_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("user_id"), col("event_type"), col("value")).as("value"))

  /** Wire value → typed [[Ev]] columns (the `from_json` half). Malformed
    * rows surface as null-field structs under `from_json`'s PERMISSIVE
    * mode and are dropped by the required-field filter — the reference
    * routes deserialization failures to a side output
    * (streams/package.scala:287-298); callers wanting that behavior split
    * on the same predicate before this projection. */
  def decoded(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), wireSchema).as("p"))
      .filter(wireSchema.fieldNames
        .map(f => col(s"p.$f").isNotNull).reduce(_ && _))
      .select(col("p.event_id").as("event_id"),
        timestamp_millis(col("p.ts_ms")).as("ts"),
        col("p.user_id").as("user_id"),
        col("p.event_type").as("event_type"),
        col("p.value").as("value"))

  def decodedTyped(raw: DataFrame): Dataset[Ev] = {
    val s = raw.sparkSession
    import s.implicits._
    decoded(raw).as[Ev]
  }

  /** S2: streaming consumer — earliest offsets, read-committed isolation. */
  def readEvents(spark: SparkSession, servers: String, topic: String): DataFrame =
    decoded(spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("kafka.isolation.level", "read_committed")
      .load())

  /** K1: streaming producer — keyed for per-entity partition ordering;
    * exactly-once end-to-end = checkpoint + the idempotent keyed upsert
    * downstream (W10/W11), the same contract the reference reaches with
    * transactional writes + deterministic doc ids. */
  def writeEvents(events: DataFrame, servers: String, topic: String,
                  checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    wireColumns(events).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
}
