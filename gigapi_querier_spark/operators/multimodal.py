"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY/BASELINE north star): media travels as an opaque ``binary``
column with a struct of metadata beside it; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so the
payload never crosses the Python boundary row-at-a-time.

The actual codecs (PIL/libsndfile/ffmpeg) are NOT in this container, so
``decode_image`` below raises ``NotImplementedError`` unless
``fake_decode=True``, which substitutes a deterministic stand-in (derived
from the payload's md5) — the Spark-side plumbing (schema, batching,
partition behavior) is real and tested either way.

Scale: mapInPandas streams Arrow batches per partition — constant memory,
no collect, no shuffle; partition count alone controls parallelism.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema of a multimodal asset column-group.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feat_hash", StringType()),
    ]
)


def to_assets(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap an existing binary (or string) column as an asset column-group."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decoder: pseudo width/height and
    a feature hash derived from the payload digest."""
    digest = hashlib.md5(payload).hexdigest()
    width = 64 + int(digest[:4], 16) % 1024
    height = 64 + int(digest[4:8], 16) % 1024
    return width, height, digest[:16]


def decode_features(df: DataFrame, fake_decode: bool = False) -> DataFrame:
    """Decode assets and emit per-asset features via mapInPandas.

    With ``fake_decode=False`` this raises at execution time — the real
    decoder (PIL et al.) is not installed in this environment; the
    surrounding plan, schema and batch shape are the production ones.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "image/audio codecs not available in this environment; "
                    "pass fake_decode=True for the deterministic stand-in"
                )
            decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feat_hash": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
    ]
)


def resize(df: DataFrame, width: int, height: int, fake_decode: bool = False) -> DataFrame:
    """Resize stage via mapInPandas: payload → decoded → resized → re-encoded.

    The codec is stubbed (no imaging libs in this environment): with
    ``fake_decode=True`` the 'resized' payload is a deterministic digest
    chain carrying the target dims; without it, NotImplementedError at
    execution — the distributed plumbing (schema, Arrow batching,
    per-partition streaming) is the production shape either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "image codecs not available; pass fake_decode=True"
                )
            resized = [
                hashlib.md5(bytes(p) + f":{width}x{height}".encode()).digest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized,
                    "n_bytes": [len(r) for r in resized],
                    "checksum": [r.hex() for r in resized],
                    "target_w": width,
                    "target_h": height,
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: emit one row per N-byte stride of the
    payload — the explode-per-asset plumbing a video frame sampler uses.
    Output: (asset_id, frame_no, byte_offset)."""
    n = F.greatest((F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n - 1)
    return df.select(
        "asset_id",
        F.explode(idx).alias("frame_no"),
    ).withColumn("byte_offset", F.col("frame_no").cast("long") * every_n_bytes)
