"""Count-min sketch: fixed-size mergeable frequency summaries as
native DataFrame compositions.

A CMS is a depth×width counter grid; item x increments counter
(i, h_i(x) % width) for each of the depth hash rows, and its
estimated frequency is the MIN of its depth counters — an
overestimate by construction (collisions only add), within
eps·N (eps ≈ e/width) with probability 1 - exp(-depth).

Spark-first shape: the grid is just a (row, bucket) → cnt DataFrame
of at most depth·width rows, built by ONE map-side-combined groupBy
over the exploded per-row bucket pairs — no UDFs, no driver state.
Partial sketches (per source, per day, per partition) merge by
summing counters, which is exactly a second groupBy — the property
that makes CMS the scale path for streaming/incremental frequency
tracking where exact per-key counts would need unbounded state.

Hashing uses the engine-portable 60-bit md5 hash
(operators/dedup.py::portable_hash60) seeded per row, so an oracle
can replay bucket assignment bit-for-bit if it ever needs to; the
registered query only needs the soundness gates.

Beyond-reference extension (the reference has no sketches; its
aggregation surface is exact GROUP BYs, e.g.
/root/reference/dbt/analyses/most_saved_channels.sql) — part of the
LLM-pipeline operator family alongside HLL and quantile sketches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from musicflow_spark.operators.dedup import portable_hash60

CMS_DEPTH = 4
CMS_WIDTH = 2048


def _bucket(key: Column, row: int, width: int) -> Column:
    """Row-seeded portable bucket: pmod keeps it in [0, width)."""
    return F.pmod(
        portable_hash60(F.concat(F.lit(f"cms{row}|"), key)), F.lit(width)
    ).cast("int")


def cms_pairs(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """One (row, bucket) record per hash row per input record — the
    pre-aggregation stream shape.  Works on streaming DataFrames too:
    feed ``cms_pairs(stream, k).withColumn("cnt", lit(1).cast("long"))`` into
    ``streaming.foreach_batch_rollup_merge(path, ["row", "bucket"])``
    and the materialized table IS the corpus CMS, maintained
    incrementally with no state store (counter merge is exact integer
    addition — see tests/test_streaming.py)."""
    key = F.col(key_col).cast("string")
    return df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _bucket(key, i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb")
    ).select("rb.row", "rb.bucket")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Sketch a key column into (row, bucket, cnt) — ≤ depth·width
    rows regardless of input size.  One shuffle; the map-side partial
    aggregate already collapses each partition to ≤ depth·width
    counter rows, so the exchange moves a fixed-size payload."""
    if depth < 1 or width < 1:
        raise ValueError(f"need depth, width >= 1, got {depth}/{width}")
    return (
        cms_pairs(df, key_col, depth, width)
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge partial sketches by summing counters — the mergeability
    that lets 1000 executors (or 1000 days) sketch independently and
    combine in one tiny aggregate."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: re-derive the
    depth (row, bucket) coordinates, broadcast-join the counter grid
    (≤ depth·width rows — always broadcastable), take the per-key MIN.

    Returns ``keys`` with ``out_col`` appended.  Keys absent from the
    sketched stream get the collision mass of their buckets (CMS
    semantics: estimates are never below the true count, which is 0).
    ``keys`` rows must be distinct (they become the output grain) and
    must not already contain the grid's working columns."""
    clash = {"row", "bucket", "cnt", out_col} & set(keys.columns)
    if clash - {out_col} or out_col in keys.columns:
        raise ValueError(f"keys dataframe column clash: {sorted(clash)}")
    key = F.col(key_col).cast("string")
    probed = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _bucket(key, i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("*", "rb.row", "rb.bucket").drop("rb")
    hit = probed.join(F.broadcast(sketch), ["row", "bucket"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("long"))
    )
    others = [c for c in keys.columns]
    return (
        hit.groupBy(*others)
        .agg(F.min("cnt").alias(out_col))
    )
