"""Multimodal plumbing tests: binary payload + metadata columns,
Arrow-batched decode stages, JVM-side frame fan-out.  The codec is a
deterministic fake (no image/audio libs in this container); every
Spark-side contract — schemas, batching, partitioning, composition —
is exercised for real."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    FakeCodec,
    LibraryCodec,
    decode_frames,
    extract_features,
    fake_media_from_documents,
    media_repartition,
    resize_media,
    sample_frames,
)
from musicflow_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


def _shape(schema):
    # (name, type) pairs — nullability differs between literal-built
    # frames and the declared contract and is not part of it
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


@pytest.fixture(scope="module")
def media(spark):
    docs = read_table(spark, SF_DIR, "documents").limit(100)
    return fake_media_from_documents(docs, "video").localCheckpoint(eager=True)


def test_media_schema_and_payload(media):
    assert _shape(media.schema) == _shape(MEDIA_SCHEMA)
    row = media.orderBy("media_id").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["sample_rate"] == 16_000


def test_extract_features_deterministic(media):
    codec = FakeCodec(seed=7)
    out = extract_features(media, codec, dim=8)
    assert _shape(out.schema) == _shape(FEATURE_SCHEMA)
    rows1 = {r["media_id"]: r for r in out.collect()}
    rows2 = {r["media_id"]: r for r in extract_features(media, codec, dim=8).collect()}
    assert len(rows1) == 100
    some = next(iter(rows1))
    assert rows1[some]["feature"] == rows2[some]["feature"]  # run-stable
    assert len(rows1[some]["feature"]) == 8
    assert all(-1.0 <= v <= 1.0 for v in rows1[some]["feature"])
    # digest really is the payload digest (plumbing moves bytes intact)
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert rows1[some]["digest"] == hashlib.sha256(src[some]).hexdigest()
    assert rows1[some]["n_bytes"] == len(src[some])


def test_resize_composes_and_updates_meta(media):
    codec = FakeCodec()
    resized = resize_media(media, codec, 64, 48)
    assert _shape(resized.schema) == _shape(MEDIA_SCHEMA)
    row = resized.first()
    assert (row["meta"]["width"], row["meta"]["height"]) == (64, 48)
    assert len(row["payload"]) == 32  # fake resize emits a digest
    # composes: features over resized media still runs end-to-end
    assert extract_features(resized, codec, dim=4).count() == 100


def test_frame_sampling_counts_are_exact(media):
    frames = sample_frames(media, every_ms=1000)
    got = (
        frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    durations = {r["media_id"]: r["meta"]["duration_ms"] for r in media.collect()}
    for r in got:
        assert r["n"] == durations[r["media_id"]] // 1000 + 1


def test_decode_frames_distinct_per_frame(media):
    frames = sample_frames(media.limit(5), every_ms=1000)
    feats = decode_frames(frames, FakeCodec(), dim=4).collect()
    by_media: dict = {}
    for r in feats:
        by_media.setdefault(r["media_id"], set()).add(tuple(r["feature"]))
    # each sampled frame gets its own feature vector (frame_ms is
    # folded into the decode input)
    for mid, vecs in by_media.items():
        assert len(vecs) > 1


def test_media_repartition_bounds_partition_bytes(media):
    out = media_repartition(media, target_partition_bytes=10_000)
    total = media.agg(F.sum(F.length("payload"))).collect()[0][0]
    assert out.rdd.getNumPartitions() == total // 10_000 + 1


def test_library_codec_is_a_marked_stub(media):
    with pytest.raises(Exception) as ei:
        extract_features(media.limit(1), LibraryCodec(), dim=4).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_extract_features_arrow_equals_pandas_tier(media):
    """The mapInArrow tier must reproduce the mapInPandas tier
    row-for-row (same codec, same batches' worth of rows)."""
    from musicflow_spark.operators.multimodal import extract_features_arrow

    codec = FakeCodec(seed=7)
    want = {
        r["media_id"]: (r["n_bytes"], r["digest"], r["feature"])
        for r in extract_features(media, codec, dim=6).collect()
    }
    got = {
        r["media_id"]: (r["n_bytes"], r["digest"], r["feature"])
        for r in extract_features_arrow(media, codec, dim=6).collect()
    }
    assert got == want
