"""Driver-facing multimodal query: runs the full binary-column
pipeline (documents -> fake media -> JVM frame fan-out -> Arrow-
batched decode) and returns per-media stats the DuckDB oracle can
recompute from the documents table alone.  Feature values themselves
are codec output (not SQL-expressible); the oracle checks the
plumbing invariants — frame counts from metadata, payload byte
lengths — which is exactly what must not break at scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from musicflow_spark.operators.multimodal import (
    FakeCodec,
    decode_frames,
    extract_features,
    fake_media_from_documents,
    sample_frames,
)
from musicflow_spark.queries.registry import Query
from musicflow_spark.sources.catalog import read_table


def media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    media = fake_media_from_documents(docs, "video")
    frames = decode_frames(sample_frames(media, every_ms=1000), FakeCodec(), dim=4)
    feats = extract_features(media, FakeCodec(), dim=4)
    per_media = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return (
        per_media.join(feats.select("media_id", "n_bytes"), "media_id")
        .select(F.col("media_id").alias("doc_id"), "n_frames", "n_bytes")
    )


MEDIA_FRAME_STATS_SQL = """
SELECT doc_id,
       (n_chars * 40) // 1000 + 1           AS n_frames,
       octet_length(encode(text))            AS n_bytes
FROM documents
ORDER BY doc_id
"""

QUERIES = [
    Query(
        "media_frame_stats",
        "ext: multimodal binary columns (frame fan-out + Arrow decode)",
        media_frame_stats,
        MEDIA_FRAME_STATS_SQL,
    ),
]
