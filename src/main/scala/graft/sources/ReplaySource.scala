package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Scaled event-time REPLAY source — the reference's signature simulation
  * mechanism (reference: streams/SpeedupParquetSource ancestry:
  * utils/ParseUtils + jobs/preparation/measure/ReadLikeEventsFromKafkaJob
  * .scala:27-42 — records are released when scaled wall-clock time reaches
  * their event time; `data.speedup-factor=10000` in application.conf:23)
  * re-expressed as a DataSource V2 `MicroBatchStream`:
  *
  *   frontier(t) = min_event_time + (wall_now − wall_start) × speedup
  *   offset(t)   = #events with ts ≤ frontier(t)
  *
  * Each micro-batch receives exactly the events whose (sorted) event time
  * the scaled clock has passed, so downstream watermarks/windows see the
  * same out-of-orderness profile as the original stream, compressed by
  * `speedup` — the property the reference's experiments rely on.
  *
  * Options: `path` (an sf dir with events.parquet), `speedup` (double).
  *
  * Scale/test note: this source exists for REPLAY SEMANTICS (S1/S3) —
  * the event set is loaded once, sorted by event time, and held on the
  * driver (fine for simulation inputs; the reference replays files the
  * same way). Production-volume ingestion is Kafka's job (S2/K1) — the
  * pacing contract demonstrated here is source-independent.
  */
class ReplaySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-replay"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplaySource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ReplayTable(properties.get("path"),
      Option(properties.get("speedup")).map(_.toDouble).getOrElse(10000.0))
}

object ReplaySource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** (event_id, ts_micros, user_id, event_type, value, props) */
  type Ev = (Long, Long, Long, String, Double, String)

  def load(path: String): Array[Ev] = {
    val spark = SparkSession.active
    graft.Tables.events(spark, path)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect()
      .map { r =>
        val t = r.getTimestamp(1)
        val micros = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
        (r.getLong(0), micros, r.getLong(2), r.getString(3), r.getDouble(4),
          r.getString(5))
      }
      .sortBy(e => (e._2, e._1))
  }
}

final class ReplayTable(path: String, speedup: Double)
  extends Table with SupportsRead {
  override def name(): String = s"graft-replay($path, x$speedup)"
  override def schema(): StructType = ReplaySource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ReplaySource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ReplayMicroBatchStream(path, speedup)
      }
    }
}

final case class ReplayOffset(released: Long) extends Offset {
  override def json(): String = released.toString
}

final class ReplayMicroBatchStream(path: String, speedup: Double)
  extends MicroBatchStream {
  private lazy val events: Array[ReplaySource.Ev] = ReplaySource.load(path)
  private lazy val minTsMicros: Long = if (events.isEmpty) 0L else events(0)._2
  // the scaled clock starts at the first offset request (stream start)
  private lazy val wallStartNanos: Long = System.nanoTime()

  override def initialOffset(): Offset = ReplayOffset(0L)

  override def latestOffset(): Offset = {
    val elapsedMicros = (System.nanoTime() - wallStartNanos) / 1000L
    // saturate: extreme speedups must clamp to "everything", not overflow
    val scaled = elapsedMicros.toDouble * speedup
    val frontier =
      if (scaled >= (Long.MaxValue - minTsMicros).toDouble) Long.MaxValue
      else minTsMicros + scaled.toLong
    // events sorted by ts: releasable prefix = all with ts <= frontier
    var lo = 0
    var hi = events.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (events(mid)._2 <= frontier) lo = mid + 1 else hi = mid
    }
    ReplayOffset(lo.toLong)
  }

  override def deserializeOffset(json: String): Offset =
    ReplayOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].released.toInt
    val e = end.asInstanceOf[ReplayOffset].released.toInt
    if (e <= s) Array.empty
    else events.slice(s, e).grouped(8192)
      .map(chunk => ReplayPartition(chunk): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ReplayReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class ReplayPartition(rows: Array[ReplaySource.Ev]) extends InputPartition

final class ReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[ReplayPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val e = rows(i)
        new GenericInternalRow(Array[Any](e._1, e._2, e._3,
          UTF8String.fromString(e._4), e._5, UTF8String.fromString(e._6)))
      }
      override def close(): Unit = ()
    }
  }
}
