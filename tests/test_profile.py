"""Table-profile operator: exact tier vs a hand-computed reference,
approx tier pinned to exact within sketch accuracy, one-job plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.profile import profile_approx, profile_exact


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "a", None),
        (2, "a", 1.5),
        (3, "b", 1.5),
        (4, None, 2.5),
        (4, None, None),
    ]
    return spark.createDataFrame(rows, "id long, s string, v double")


def _m(df):
    return {r["column"]: (r["n_rows"], r["n_nonnull"], r["n_distinct"]) for r in df.collect()}


def test_exact_profile_values(frame):
    got = _m(profile_exact(frame))
    assert got == {
        "id": (5, 5, 4),
        "s": (5, 3, 2),   # nulls excluded from both counts
        "v": (5, 3, 2),
    }


def test_exact_profile_col_subset_and_validation(frame):
    assert set(_m(profile_exact(frame, ["s"]))) == {"s"}
    with pytest.raises(ValueError, match="non-empty"):
        profile_exact(frame, [])
    with pytest.raises(ValueError, match="non-empty"):
        profile_approx(frame, [])


def test_approx_profile_matches_exact_on_fixture(frame):
    # tiny cardinalities: the HLL sketch is exact here, and the
    # schema/row shape must match the exact tier row for row
    assert _m(profile_approx(frame)) == _m(profile_exact(frame))


def test_approx_profile_single_job_no_expand(frame):
    plan = (
        profile_approx(frame)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan  # the whole point of the approx tier


def test_approx_within_rsd_on_real_table(spark, sf_dir):
    from musicflow_spark.sources.catalog import read_table

    df = read_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    exact = _m(profile_exact(df, cols))
    approx = _m(profile_approx(df, cols, rsd=0.02))
    for c in cols:
        assert approx[c][:2] == exact[c][:2]
        assert abs(approx[c][2] - exact[c][2]) <= max(10, exact[c][2] * 0.05)
