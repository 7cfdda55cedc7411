"""One-pass table profiling — the completeness/cardinality summary a
warehouse keeps per table (null fractions, distinct counts), in the
deequ / dbt-profiler shape: one row out per column.

Two tiers, one output schema (column, n_rows, n_nonnull, n_distinct):

- ``profile_exact``: ``count(DISTINCT col)`` per column.  Multiple
  exact distincts in one aggregate make Catalyst EXPAND the input
  (one duplicated stream per distinct column), so the scan cost is
  x(k+1) for k columns — the certification tier, oracle-replayable.
- ``profile_approx``: ``approx_count_distinct`` per column — every
  sketch rides the SAME single aggregation pass (no expand, map-side
  partials), the tier you run on a 100 TB table.  Tests pin it to
  the exact tier at the sketch's documented rsd.

Both profile the whole frame in ONE job: the per-column stats land in
one wide aggregate row, then a literal-array inline explodes it to
the long format — no per-column scans, no driver loop over queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _profile(df: DataFrame, cols: list[str] | None, distinct_agg) -> DataFrame:
    cols = list(cols) if cols is not None else df.columns
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(distinct_agg(c).alias(f"_nd_{c}"))
    wide = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nn_{c}").alias("n_nonnull"),
            F.col(f"_nd_{c}").alias("n_distinct"),
        )
        for c in cols
    ]
    return wide.select(F.inline(F.array(*entries)))


def profile_exact(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact profile: (column, n_rows, n_nonnull, n_distinct) per
    column, one aggregation job (k-way EXPAND under the hood)."""
    return _profile(df, cols, lambda c: F.countDistinct(F.col(c)))


def profile_approx(
    df: DataFrame, cols: list[str] | None = None, rsd: float = 0.02
) -> DataFrame:
    """Sketch profile: identical schema, ``approx_count_distinct``
    cardinalities — single pass, no expand; the 100 TB tier."""
    return _profile(df, cols, lambda c: F.approx_count_distinct(F.col(c), rsd=rsd))
