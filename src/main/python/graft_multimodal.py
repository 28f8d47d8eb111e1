"""PySpark twin of graft.operators.MultimodalPack — the `mapInPandas` form.

The Scala pack (src/main/scala/graft/operators/MultimodalPack.scala) carries
the tested implementation; this module shows the same pipeline the way a
Python-side training stack would run it: Arrow-batched Pandas UDFs over
`mapInPandas`, with the codec kernel stubbed exactly like the Scala
`decodeStub` (this environment ships no image/audio libraries — and no
pyspark on the engine classpath, so this file is reference plumbing, kept
in lock-step with the Scala pack by the shared stub arithmetic; the Scala
spec MultimodalPackSpec pins the numbers).

Contract notes (the parts that matter at 100 TB):
  - `mapInPandas` receives an ITERATOR of pandas.DataFrames (one per Arrow
    batch, `spark.sql.execution.arrow.maxRecordsPerBatch` rows each). A real
    codec amortizes its setup across a batch — initialize it once per
    partition, outside the batch loop, exactly where `_codec_setup` sits.
  - The input frame is column-pruned upstream: select ONLY (media_id, kind,
    payload) before mapInPandas, so the parquet scan never materializes
    unused metadata columns.
  - Decode is stateless and CPU-bound: no shuffle, no state, linear scaling
    with executors x cores. Batch size is the only memory knob (payload
    bytes x maxRecordsPerBatch resident per task).
  - Output is a fixed, declared schema — Spark validates it, and the
    result is a normal DataFrame for downstream relational work.

Run shape (untested here, standard pyspark):

    df = media(spark, sf_dir)
    decoded = df.select("media_id", "kind", "payload") \
                .mapInPandas(decode_batches, schema=DECODED_SCHEMA)
"""

DECODED_SCHEMA = ("media_id long, kind string, out_w int, out_h int, "
                  "n_bytes long, checksum long")

TARGET_W, TARGET_H = 224, 224
MASK64 = (1 << 64) - 1


def _codec_setup():
    """Per-partition codec initialization point.

    In production: construct the JPEG/PNG decoder, audio resampler, or
    ffmpeg context here — once per partition, NOT once per row or batch.
    The stub needs no state, so this returns None.
    """
    return None


def _decode_stub(payload: bytes) -> int:
    """Deterministic fake decode — byte-identical to the Scala
    MultimodalPack.decodeStub rolling checksum (crc = crc*31 + byte over
    the payload, 64-bit wrapping), so both language twins are pinned by
    the same fixtures."""
    crc = 0
    for b in payload:
        crc = (crc * 31 + b) & MASK64
    # interpret as signed 64-bit to match Scala's Long overflow
    return crc - (1 << 64) if crc >= (1 << 63) else crc


def decode_batches(batches):
    """mapInPandas kernel: Iterator[pd.DataFrame] -> Iterator[pd.DataFrame].

    One yield per incoming Arrow batch keeps peak memory at one batch;
    never materialize the whole iterator.
    """
    import pandas as pd  # local import: executors only

    _codec = _codec_setup()  # noqa: F841 — handle for a real codec
    for pdf in batches:
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "out_w": TARGET_W,
            "out_h": TARGET_H,
            "n_bytes": pdf["payload"].map(len),
            "checksum": pdf["payload"].map(_decode_stub),
        })


FRAME_BYTES = 256


def frame_sample(media_df):
    """q72 twin: per-video frame sampling via explode — pure relational
    fan-out, no UDF needed in either language."""
    from pyspark.sql import functions as F
    return (media_df
            .filter(F.col("kind") == "video")
            .select("media_id",
                    F.posexplode(
                        F.sequence(F.lit(0),
                                   F.floor(F.length("payload") / FRAME_BYTES)))
                    .alias("frame_no", "off"))
            .select("media_id", "frame_no",
                    (F.col("off") * FRAME_BYTES).alias("byte_offset")))
