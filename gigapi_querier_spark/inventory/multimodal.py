"""Multimodal coverage (operators/multimodal.py). The fixtures carry no
real media, so assets are synthesized from ``documents.text`` bytes —
the binary-column plumbing (casts, octet_length, md5-of-blob, mapInPandas
batch shape) is what's under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gigapi_querier_spark.inventory import register
from gigapi_querier_spark.operators import multimodal as M
from gigapi_querier_spark.sources import load_tables


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return M.to_assets(t["documents"], "doc_id", "text", "image")


@register(
    "multimodal_asset_meta",
    oracle="""
SELECT doc_id                        AS asset_id,
       'image'                       AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text)                     AS checksum
FROM documents
""",
)
def multimodal_asset_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _assets(spark, sf_dir).drop("payload")


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id AS asset_id,
       CAST(unnest(range(0, greatest(octet_length(encode(text)) // 64, 1))) AS INT)
         AS frame_no,
       CAST(unnest(range(0, greatest(octet_length(encode(text)) // 64, 1))) * 64 AS BIGINT)
         AS byte_offset
FROM documents
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.frame_sample(_assets(spark, sf_dir), every_n_bytes=64)


# mapInPandas decode stage: the feature extraction itself is a deterministic
# stand-in (md5-derived), but it runs inside the real Arrow-batched
# distributed plan. feat_hash = md5(payload)[:16] is SQL-reproducible, so
# this gets a full oracle despite the Python stage.
@register(
    "multimodal_decode_features",
    oracle="""
SELECT doc_id                                            AS asset_id,
       'image'                                           AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT)        AS n_bytes,
       CAST(64 + (('0x' || substring(md5(text), 1, 4))::INT % 1024) AS INT)  AS width,
       CAST(64 + (('0x' || substring(md5(text), 5, 4))::INT % 1024) AS INT)  AS height,
       substring(md5(text), 1, 16)                       AS feat_hash
FROM documents
""",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.decode_features(_assets(spark, sf_dir), fake_decode=True)
