"""Quantile-histogram sketch invariants (operators/qsketch.py):
grid boundedness, exact merge invariance over arbitrary splits, the
one-bin-width error bound vs numpy's exact discrete quantiles, the
rank gates, and edge cases (constant column, n_bins=1, validation)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.qsketch import (
    hist_bounds,
    hist_merge,
    hist_partials,
    hist_quantiles,
    hist_rank_gates,
)

N_BINS = 32  # narrow grid so estimates are genuinely approximate
QS_BP = (1000, 2500, 5000, 7500, 9000, 9900, 10000)


def _vals():
    # deterministic, skewed, with repeats and a null
    rng = [(i * i * 7919) % 100003 for i in range(400)]
    return [(i % 7, v) for i, v in enumerate(rng)] + [(0, None)]


@pytest.fixture(scope="module")
def valdf(spark):
    return spark.createDataFrame(_vals(), "grp int, v long")


def _exact_disc(vals, q_bp):
    """Smallest value whose rank reaches ceil(q·N/10000)."""
    s = sorted(vals)
    target = math.ceil(q_bp * len(s) / 10000)
    return s[target - 1]


def test_grid_bounded_and_mass_conserved(valdf):
    bounds = hist_bounds(valdf, "v")
    sk = hist_partials(valdf, "v", bounds, N_BINS).collect()
    assert len(sk) <= N_BINS
    assert all(0 <= r["bin"] < N_BINS for r in sk)
    n_nonnull = valdf.filter(F.col("v").isNotNull()).count()
    assert sum(r["cnt"] for r in sk) == n_nonnull


def test_merge_invariance_over_splits(valdf):
    bounds = hist_bounds(valdf, "v")
    direct = {
        (r["bin"],): r["cnt"]
        for r in hist_partials(valdf, "v", bounds, N_BINS).collect()
    }
    # split by group into 7 partials, merge — must be bit-identical
    parts = [
        hist_partials(valdf.filter(F.col("grp") == g), "v", bounds, N_BINS)
        for g in range(7)
    ]
    merged = {(r["bin"],): r["cnt"] for r in hist_merge(*parts).collect()}
    assert merged == direct
    # per-group partials collapsed by hist_merge give the same again
    grouped = hist_partials(valdf, "v", bounds, N_BINS, part_cols=("grp",))
    assert {
        (r["bin"],): r["cnt"] for r in hist_merge(grouped).collect()
    } == direct


def test_error_bound_vs_numpy_and_gates(valdf):
    vals = [v for _, v in _vals() if v is not None]
    bounds = hist_bounds(valdf, "v")
    sketch = hist_partials(valdf, "v", bounds, N_BINS)
    qs = hist_quantiles(sketch, bounds, QS_BP, N_BINS)
    rows = {r["q_bp"]: r for r in qs.collect()}
    assert set(rows) == set(QS_BP)
    lo, hi = min(vals), max(vals)
    w = (hi - lo) // N_BINS + 1
    for q_bp, r in rows.items():
        exact = _exact_disc(vals, q_bp)
        assert r["target_rank"] == math.ceil(q_bp * len(vals) / 10000)
        assert r["w"] == w
        # upper-edge estimate: never below the true discrete
        # quantile, above it by strictly less than one bin width
        assert exact <= r["est"] < exact + w
    gates = hist_rank_gates(valdf, "v", qs).collect()
    assert len(gates) == len(QS_BP)
    assert all(g["rank_ok"] and g["bin_ok"] for g in gates)


def test_matches_numpy_percentile_shape(valdf):
    # est is within one bin width of numpy's 'lower' percentile too
    vals = np.array([v for _, v in _vals() if v is not None])
    bounds = hist_bounds(valdf, "v")
    sketch = hist_partials(valdf, "v", bounds, N_BINS)
    rows = hist_quantiles(sketch, bounds, (5000,), N_BINS).collect()
    est = rows[0]["est"]
    w = rows[0]["w"]
    med = np.percentile(vals, 50, method="lower")
    assert abs(est - med) <= w


def test_constant_column_single_bin(spark):
    df = spark.createDataFrame([(42,)] * 10, "v long")
    bounds = hist_bounds(df, "v")
    sk = hist_partials(df, "v", bounds, N_BINS).collect()
    assert len(sk) == 1 and sk[0]["bin"] == 0 and sk[0]["cnt"] == 10
    qs = hist_quantiles(
        hist_partials(df, "v", bounds, N_BINS), bounds, (5000,), N_BINS
    ).collect()
    # w = 1, upper edge of bin 0 is the value itself: exact answer
    assert qs[0]["est"] == 42 and qs[0]["w"] == 1


def test_single_bin_grid(valdf):
    bounds = hist_bounds(valdf, "v")
    sk = hist_partials(valdf, "v", bounds, 1).collect()
    assert len(sk) == 1 and sk[0]["bin"] == 0


def test_validation(spark):
    df = spark.createDataFrame([(1,)], "v long")
    bounds = hist_bounds(df, "v")
    with pytest.raises(ValueError, match="n_bins"):
        hist_partials(df, "v", bounds, 0)
    with pytest.raises(ValueError, match="at least one"):
        hist_quantiles(hist_partials(df, "v", bounds, 4), bounds, ())
    with pytest.raises(ValueError, match="basis points"):
        hist_quantiles(hist_partials(df, "v", bounds, 4), bounds, (0,))
    with pytest.raises(ValueError, match="basis points"):
        hist_quantiles(hist_partials(df, "v", bounds, 4), bounds, (10001,))
    with pytest.raises(ValueError, match="at least one sketch"):
        hist_merge()


def test_integer_width_exact_past_double_precision(spark):
    """Width and bin index stay integer-exact at a 2^53-adjacent
    domain, where the double-division path would round: w must equal
    (hi-lo) // n_bins + 1 and every value's bin must match Python's
    integer arithmetic bit-for-bit."""
    from musicflow_spark.operators.qsketch import _with_width

    lo, hi = 2**53 - 11, 2**53 + 101  # straddles the double-exactness edge
    vals = [lo, lo + 1, lo + 57, hi - 1, hi]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    n_bins = 7
    bounds = hist_bounds(df, "v")
    row = _with_width(bounds, n_bins).collect()[0]
    assert row.lo == lo and row.hi == hi
    assert row.w == (hi - lo) // n_bins + 1
    got = {
        r.bin: r.cnt
        for r in hist_partials(df, "v", bounds, n_bins=n_bins).collect()
    }
    w = (hi - lo) // n_bins + 1
    want = {}
    for v in vals:
        b = (v - lo) // w
        want[b] = want.get(b, 0) + 1
    assert got == want
    assert all(0 <= b < n_bins for b in got)


def test_grouped_quantiles_match_per_group_reference(valdf):
    """The grouped form on a shared global grid must equal running
    the global form separately on each group's rows (same bounds
    frame), and gates hold per group."""
    bounds = hist_bounds(valdf, "v")
    sk = hist_partials(valdf, "v", bounds, N_BINS, part_cols=("grp",))
    qs = hist_quantiles(sk, bounds, (2500, 7500), N_BINS, group_cols=("grp",))
    got = {
        (r["grp"], r["q_bp"]): (r["target_rank"], r["est"], r["w"])
        for r in qs.collect()
    }
    for g in range(7):
        sub = valdf.filter(F.col("grp") == g)
        ref = hist_quantiles(
            hist_partials(sub, "v", bounds, N_BINS), bounds, (2500, 7500), N_BINS
        ).collect()
        for r in ref:
            assert got[(g, r["q_bp"])] == (r["target_rank"], r["est"], r["w"])
    gates = hist_rank_gates(valdf, "v", qs, group_cols=("grp",)).collect()
    assert len(gates) == 14
    assert all(r["rank_ok"] and r["bin_ok"] for r in gates)
