"""fan_out width-policy tests (r13 interpreted divisor, r14 codec
divisor): the helper must widen narrow frames, no-op on already-wide
frames (the production-scale safety property), respect the divisor
cap, and never change row content."""

from __future__ import annotations

from pyspark.sql import functions as F

from musicflow_spark.operators.fanout import (
    CODEC_STAGE_DIVISOR,
    INTERPRETED_STAGE_DIVISOR,
    fan_out,
)


def test_fan_out_widens_narrow_frame(spark):
    df = spark.range(100).coalesce(1)
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_fan_out_noops_on_wide_frame(spark):
    wide = spark.range(100).repartition(
        spark.sparkContext.defaultParallelism * 2
    )
    out = fan_out(wide)
    # already wider than the target: NO extra exchange is added
    assert out is wide


def test_fan_out_divisor_caps_width(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(100).coalesce(1)
    for divisor in (2, 4):
        out = fan_out(df, divisor=divisor)
        assert out.rdd.getNumPartitions() == max(1, par // divisor)


def test_divisors_are_positive_ints():
    assert INTERPRETED_STAGE_DIVISOR >= 1
    assert CODEC_STAGE_DIVISOR >= 1


def test_fan_out_preserves_rows(spark):
    df = spark.range(1000).withColumn("v", F.col("id") * 3)
    out = fan_out(df, divisor=CODEC_STAGE_DIVISOR)
    assert sorted(r["v"] for r in out.collect()) == [i * 3 for i in range(1000)]


def test_codec_tier_rows_invariant_to_width(spark):
    # the r14 codec width cap must not change what the codec emits:
    # same docs through the fused phash tier at two explicit widths
    from musicflow_spark.operators.multimodal import phash_bands_from_docs

    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    narrow = phash_bands_from_docs(docs.coalesce(1))
    wide = phash_bands_from_docs(docs.repartition(8))
    n = {r["media_id"]: list(r["bands"]) for r in narrow.collect()}
    w = {r["media_id"]: list(r["bands"]) for r in wide.collect()}
    assert n == w and len(n) == 40
