"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (the part that matters at 100 TB):
- A media column is `binary` payload + a `struct` of typed metadata
  (media_type, width/height or sample_rate/duration, codec). Parquet
  stores the binary column contiguously; metadata predicates (codec,
  size) push down WITHOUT touching payload bytes — select metadata
  columns only and the scan never reads the blobs.
- Decode / feature-extraction run as Arrow-batched Pandas UDFs over
  mapInPandas: payloads stream through Python in bounded batches
  (spark.sql.execution.arrow.maxRecordsPerBatch controls memory), one
  pass, no shuffle.
- The actual codec work (PIL/ffmpeg/librosa) is STUBBED — those libs are
  not in this container. The stubs are deterministic so the plumbing
  (schema, partitioning, UDF signatures, batch shapes) is fully testable;
  swap `_decode_image_stub` for a real decoder in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, "
    "meta struct<media_type:string, width:int, height:int, "
    "sample_rate:int, n_frames:int, codec:string>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, mean_luma double, "
    "phash bigint"
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive the typed metadata struct for raw binary payloads. Real
    pipelines sniff container headers; the stub derives deterministic
    pseudo-metadata from payload length/bytes so downstream partition
    and filter logic is exercised honestly."""
    ln = F.length(F.col(payload_col))
    return df.withColumn(
        "meta",
        F.struct(
            F.when(ln % 3 == 0, "image/png")
            .when(ln % 3 == 1, "audio/wav")
            .otherwise("video/mp4")
            .alias("media_type"),
            (F.pmod(F.crc32(F.col(payload_col)), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.crc32(F.col(payload_col)), F.lit(1080)) + 1).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (ln % 300 + 1).cast("int").alias("n_frames"),
            F.lit("stub").alias("codec"),
        ),
    )


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decoder: deterministic fake 8×8 grayscale "image" derived from
    payload bytes. Production: PIL.Image.open(io.BytesIO(payload)).
    Raises on empty payload like a real decoder would."""
    if not payload:
        raise ValueError("empty media payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = -(-64 // len(arr))  # ceil-div: tile payload to ≥64 bytes
    return np.tile(arr, reps)[:64].reshape(8, 8)


def extract_image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode + feature-extract via mapInPandas: per batch, decode each
    payload (stub), emit (dims, mean luminance, perceptual-hash-ish
    bits). The Spark-side shape — iterator of Arrow batches in, bounded
    batches out, payload column dropped from the output — is the real
    production plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for media_id, payload in zip(batch["media_id"], batch[payload_col]):
                img = _decode_image_stub(bytes(payload))
                mean = float(img.mean())
                bits = (img.flatten() > img.mean()).astype(np.uint64)
                phash = int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
                phash = phash - (1 << 64) if phash >= (1 << 63) else phash
                out.append(
                    {
                        "media_id": media_id,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "mean_luma": mean,
                        "phash": phash,
                    }
                )
            yield pd.DataFrame(out)

    return df.select("media_id", payload_col).mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explode frame indices 0..n_frames
    step `every_nth` — pure expression fan-out; the (stubbed) per-frame
    decode would run in a downstream mapInPandas. Demonstrates the
    explode-then-decode shape that keeps frame parallelism in Spark."""
    return (
        df.select("media_id", F.col("meta.n_frames").alias("n_frames"))
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))),
        )
    )
