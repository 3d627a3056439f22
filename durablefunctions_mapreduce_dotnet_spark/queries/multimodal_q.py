"""Multimodal-column queries: binary payloads + typed metadata, with the
decode step as an Arrow-batched mapInPandas (deterministic fake — the
container has no media libs; see operators.multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_binary, decode_image_meta
from ..sources.readers import read_table


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over a binary table — the plan must never
    deserialize payload bytes for this query shape."""
    b = attach_binary(read_table(spark, sf_dir, "documents"))
    return b.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.origin").alias("origin"),
    )


_MULTIMODAL_META_SQL = """
SELECT doc_id, 'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       source AS origin
FROM documents
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake decode (deterministic, byte-derived): mirrored
    in SQL because the fake derives width/height from payload bytes."""
    b = attach_binary(read_table(spark, sf_dir, "documents"))
    return decode_image_meta(b)


_MULTIMODAL_DECODE_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST((ascii(substr(text, 1, 1)) % 64 + 1) * 16 AS INTEGER) AS width,
       CAST((octet_length(encode(text)) % 64 + 1) * 16 AS INTEGER) AS height,
       1 AS n_frames
FROM documents
"""


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_decode": q_multimodal_decode,
}
ORACLES = {
    "multimodal_meta": _MULTIMODAL_META_SQL,
    "multimodal_decode": _MULTIMODAL_DECODE_SQL,
}
