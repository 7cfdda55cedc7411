"""Tests for the Z-order layout operator (operators/layout.py)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from musicflow_spark.operators.layout import (
    column_bounds,
    morton_key,
    zorder_write,
)
from musicflow_spark.sources.catalog import read_table

N_FILES = 8


def _file_spans(path: str, col: str) -> list[tuple[int, int]]:
    """(min, max) of ``col`` per output parquet file, from footer
    stats — the same metadata a scan planner prunes on."""
    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append((lo, hi))
    return spans


def test_zorder_write_preserves_rows_and_skips_on_both_cols(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
    )
    path = str(tmp_path / "events_z")
    zorder_write(ev, path, ["user_id", "value_cents"], N_FILES, bits=10)

    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert (
        back.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]
    )

    # data skipping: for EACH z-order column, a point/range predicate
    # must be able to prune most files on footer stats alone — i.e.
    # the per-file spans cover well under files x full_range
    for col in ("user_id", "value_cents"):
        lo = ev.agg(F.min(col)).first()[0]
        hi = ev.agg(F.max(col)).first()[0]
        spans = _file_spans(path, col)
        assert len(spans) == N_FILES
        covered = sum(s_hi - s_lo for s_lo, s_hi in spans)
        # a random (unsorted) layout gives ~N_FILES x full span;
        # z-order must do at least 2x better than that on both columns
        assert covered < (hi - lo) * N_FILES / 2, (col, covered, hi - lo)


def test_morton_key_interleaves_known_values(spark):
    df = spark.createDataFrame([(0, 0), (3, 0), (0, 3), (3, 3)], "x long, y long")
    bounds = {"x": (0, 3), "y": (0, 3)}
    got = [
        r.k
        for r in df.select(morton_key(["x", "y"], bounds, bits=2).alias("k"))
        .orderBy("k")
        .collect()
    ]
    # 2-bit morton over (x,y): (0,0)=0, (3,0)=0b0101=5, (0,3)=0b1010=10, (3,3)=15
    assert got == [0, 5, 10, 15]


def test_column_bounds_scalar(spark):
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    )
    assert column_bounds(df, ["a", "b"]) == {"a": (0, 99), "b": (0, 198)}


def test_morton_key_wide_span_no_overflow(spark):
    # epoch-micros-sized spans must not wrap the scaling arithmetic
    # (a (x-lo)*65535 long multiply would); extremes map to the
    # all-zeros / all-ones keys
    span = 10**15
    df = spark.createDataFrame([(0, 0), (span, span)], "x long, y long")
    bounds = {"x": (0, span), "y": (0, span)}
    got = sorted(
        r.k
        for r in df.select(morton_key(["x", "y"], bounds, bits=16).alias("k")).collect()
    )
    assert got == [0, (1 << 32) - 1]
    assert all(k >= 0 for k in got)
