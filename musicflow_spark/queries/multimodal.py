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
from musicflow_spark.queries.portable import pround
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

def media_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup of OPAQUE binary payloads (ext): group by
    (md5, byte length) of the media payload itself — the first pass
    every multimodal ingest runs (identical re-uploads, mirrored
    assets) before any decode, because it needs no codec and prunes
    the expensive perceptual tiers.  First-occurrence-wins keeper,
    copy count per content group.  The hash is computed JVM-side over
    the binary column; at 100 TB this is one map pass + one shuffle
    keyed by the 16-byte digest (+ length as a free collision guard).
    The oracle replays the digest over the same utf-8 payload bytes."""
    docs = read_table(spark, sf_dir, "documents")
    media = fake_media_from_documents(docs, "image")
    return (
        media.select(
            "media_id",
            F.md5("payload").alias("content_md5"),
            F.length("payload").alias("n_bytes"),
        )
        .groupBy("content_md5", "n_bytes")
        .agg(
            F.min("media_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


MEDIA_BINARY_DEDUP_SQL = """
-- DuckDB's md5 takes VARCHAR and hashes its utf-8 bytes — exactly the
-- payload bytes fake_media_from_documents encodes
SELECT md5(text) AS content_md5,
       octet_length(encode(text)) AS n_bytes,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1, 2
"""


FEATURE_DIM = 4


def media_feature_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level check of the Arrow decode path (ext): the
    FakeCodec's feature vector is a seeded sha256 expansion of the
    payload bytes, which DuckDB can replay (`sha256` + hex-slice +
    the same exact power-of-two float arithmetic) — so the oracle
    hash-checks the ACTUAL floats coming back through mapInPandas,
    not just frame counts and byte lengths.  Certifies Arrow binary
    round-tripping, batch iteration, and the codec seam end to end;
    swap FakeCodec for a real library and this query (not its oracle)
    still runs unchanged."""
    docs = read_table(spark, sf_dir, "documents")
    media = fake_media_from_documents(docs, "image")
    feats = extract_features(media, FakeCodec(), dim=FEATURE_DIM)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        *[
            pround(F.col("feature")[i].cast("double"), 6).alias(f"f{i}")
            for i in range(FEATURE_DIM)
        ],
    )


def _media_feature_values_oracle_sql() -> str:
    # the engine stores features as float32 (FEATURE_SCHEMA): replay
    # that quantization with a REAL round-trip BEFORE the portable
    # round, or .5-boundary values diverge (same contract as the
    # gram-moments oracle)
    cols = ",\n       ".join(
        "round(CAST(CAST((('0x' || substr(hx, {o}, 8))::BIGINT / 4294967296.0)"
        " * 2.0 - 1.0 AS REAL) AS DOUBLE)"
        " * 1000000.0) / 1000000.0 AS f{i}".format(o=1 + 8 * i, i=i)
        for i in range(FEATURE_DIM)
    )
    return f"""
WITH h AS (
  -- COALESCE matches extract_features' `payload or b''` on NULL text
  SELECT doc_id, sha256('0:image' || COALESCE(text, '')) AS hx FROM documents)
SELECT doc_id,
       {cols}
FROM h
"""


QUERIES = [
    Query(
        "media_binary_dedup",
        "ext: opaque-payload exact content dedup (digest + length groups, first-occurrence keeper)",
        media_binary_dedup,
        MEDIA_BINARY_DEDUP_SQL,
    ),
    Query(
        "media_frame_stats",
        "ext: multimodal binary columns (frame fan-out + Arrow decode)",
        media_frame_stats,
        MEDIA_FRAME_STATS_SQL,
    ),
    Query(
        "media_feature_values",
        "ext: multimodal decode value-level certification (sha256-replayable codec)",
        media_feature_values,
        _media_feature_values_oracle_sql(),
    ),
]
