package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media record (the STUB decoder's output shape). */
final case class DecodedMedia(media_id: Long, kind: String, out_w: Int, out_h: Int,
                              n_bytes: Long, checksum: Long)

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata — the training-pipeline pattern for non-text data.
  *
  * The media table derives deterministically from `documents` (payload =
  * UTF-8 bytes of the text standing in for an encoded image; kind/meta from
  * doc_id) so the schema work — binary column + metadata struct +
  * per-partition batched decode — is real and testable without codec
  * libraries.
  *
  * DECODE IS A STUB: `decodeStub` below fakes pixel decoding with
  * deterministic arithmetic on the payload bytes. In production it is the
  * only piece to replace (JPEG/PNG decode + resize inside the same
  * `mapPartitions` loop; in PySpark the same shape is `mapInPandas` with an
  * Arrow batch per iteration). Everything around it — column pruning
  * (payload only read when needed), partition-wise iteration, typed output
  * Encoder — is the real scale path: decode is CPU-bound, so throughput
  * scales with executors × cores, state is zero, and no shuffle occurs.
  */
object MultimodalPack {
  type Q = (SparkSession, String) => DataFrame

  private val TARGET_W = 224
  private val TARGET_H = 224

  /** The media table: media_id, kind, payload binary, meta struct. */
  def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("doc_id") % 1920 + 1).cast("int").as("width"),
        (col("doc_id") % 1080 + 1).cast("int").as("height"),
        (col("n_chars") * 40).as("duration_ms")).as("meta"))

  /** Checksum modulus: keeps `crc*31 + byte` inside Int64 on engines with
    * non-wrapping integer overflow (DuckDB BIGINT errors on overflow where
    * the JVM wraps), so the polynomial is cross-engine exact. */
  private[graft] val CRC_MOD = 1000000007L

  /** STUB decoder — deterministic fake of an image decode + resize.
    * Replace with a real codec in production; the signature (bytes in,
    * fixed-size features out) and the batched per-partition call pattern
    * are the contract. The checksum is a base-31 polynomial mod
    * [[CRC_MOD]] over the payload bytes — reproducible in any engine with
    * a list fold (the q71 oracle computes it with DuckDB's list_reduce),
    * which upgrades the decode query from rows-only to hash-checked. */
  private def decodeStub(id: Long, kind: String, payload: Array[Byte]): DecodedMedia = {
    var crc = 0L
    var i = 0
    while (i < payload.length) {
      crc = (crc * 31 + (payload(i) & 0xff)) % CRC_MOD; i += 1
    }
    DecodedMedia(id, kind, TARGET_W, TARGET_H, payload.length.toLong, crc)
  }

  /** Typed partition-wise decode of a media frame (real plumbing, stub
    * kernel). */
  def decodeAll(mediaDf: DataFrame): Dataset[DecodedMedia] = {
    implicit val enc = Encoders.product[DecodedMedia]
    mediaDf.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        // one iterator pass per partition — the batch boundary a real codec
        // would amortize its setup over (cf. Arrow batches in mapInPandas)
        rows.map(r => decodeStub(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
      }
  }

  val queries: Map[String, Q] = Map(
    // Binary-column metadata scan: octet length + typed metadata struct
    // fields — fully oracle-checked (the binary column IS relational data).
    "q70_media_metadata" -> ((s, d) =>
      media(s, d).select(
        col("media_id"), col("kind"),
        length(col("payload")).as("n_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.duration_ms").as("duration_ms"))
        .orderBy(col("media_id"))),

    // Per-kind decode shape: decoded features (stubbed kernel, real
    // distributed plumbing). Hash-checked: the stub checksum is a modular
    // polynomial DuckDB reproduces with list_reduce over the text's
    // code points (payload = UTF-8 of ASCII text, so bytes == ord()).
    "q71_media_decode" -> ((s, d) =>
      decodeAll(media(s, d)).toDF()
        .select(col("media_id"), col("kind"), col("out_w"), col("out_h"),
          col("n_bytes"), col("checksum"))
        .orderBy(col("media_id"))),

    // Frame sampling for video media: every 256-byte "frame" (deterministic
    // chunking of the payload — a real sampler would seek keyframes), one
    // row per sampled frame. explode() fan-out is the real plan shape.
    "q72_frame_sample" -> ((s, d) =>
      media(s, d).filter(col("kind") === "video")
        .select(col("media_id"),
          posexplode(sequence(lit(0),
            floor(length(col("payload")).cast("long") / 256).cast("long"))).as(Seq("frame_no", "off")))
        .select(col("media_id"), col("frame_no"),
          (col("off") * 256).as("byte_offset"))
        .orderBy(col("media_id"), col("frame_no")))
  )

  val oracle: Map[String, String] = Map(
    "q70_media_metadata" ->
      """SELECT doc_id AS media_id,
        |  ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
        |  octet_length(encode(text)) AS n_bytes,
        |  (doc_id % 1920 + 1)::INT AS width,
        |  (doc_id % 1080 + 1)::INT AS height,
        |  n_chars * 40 AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,

    "q71_media_decode" ->
      s"""SELECT doc_id AS media_id,
         |  ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
         |  $TARGET_W AS out_w, $TARGET_H AS out_h,
         |  octet_length(encode(text)) AS n_bytes,
         |  CASE WHEN length(text) = 0 THEN 0::BIGINT
         |    ELSE list_reduce(
         |      list_prepend(0::BIGINT,
         |        [ord(c)::BIGINT for c in string_split(text, '')]),
         |      (acc, x) -> (acc * 31 + x) % $CRC_MOD)
         |  END AS checksum
         |FROM documents ORDER BY media_id""".stripMargin,

    "q72_frame_sample" ->
      """SELECT media_id, frame_no, frame_no * 256 AS byte_offset
        |FROM (
        |  SELECT media_id, unnest(range(0, n_bytes // 256 + 1)) AS frame_no
        |  FROM (
        |    SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
        |    FROM documents WHERE ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] = 'video'
        |  )
        |) ORDER BY media_id, frame_no""".stripMargin
  )
}
