"""Mergeable quantile sketch: fixed-bin integer histograms as native
DataFrame compositions.

The sketch is a ``n_bins``-bucket equi-width histogram over an
integer value domain: bin(v) = (v - lo) div w with
w = (hi - lo) div n_bins + 1, so every value lands in [0, n_bins)
with no clamping branch.  A quantile q is answered from the merged
histogram by cumulative rank: the smallest bin whose running count
reaches ceil(q·N), reported as that bin's inclusive upper edge —
an overestimate of the true discrete quantile by strictly less than
one bin width, the classic equi-width histogram bound.

Spark-first shape: a partial sketch is ONE map-side-combined groupBy
producing ≤ n_bins counter rows per grouping (day, source,
partition); partials merge by summing counters — a second tiny
groupBy — so 1000 executors (or 1000 days) sketch independently and
combine without rescanning raw data.  Merge is exact integer
addition: merged-from-partials equals built-directly bit for bit,
which is what lets the registered query build per-day partials while
its DuckDB oracle bins the whole table in one pass and still
hash-match.  Quantile extraction runs on the ≤ n_bins-row sketch
(window cumsum over a broadcastable frame), never on raw data.

Completes the mergeable-sketch family beside HLL (distinct counts,
queries/approx.py::hll_mergeable_daily) and CMS / approx_top_k
(frequencies, operators/cms.py): distincts, frequencies, quantiles.
Beyond-reference extension — the reference's aggregation surface is
exact GROUP BYs (e.g. /root/reference/dbt/analyses/
most_saved_channels.sql); at 100 TB the sketch is the only way to
keep per-day quantile state small enough to re-merge per query.

Everything is integer arithmetic on BIGINT cents — no floats, no
RNG — so an ANSI-SQL oracle replays the whole path exactly.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HIST_BINS = 256

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_identifier(val_col: str) -> str:
    """Both binning forms interpolate ``val_col`` into raw SQL; only a
    plain identifier is safe there (backtick-needing names would
    mis-parse, arbitrary strings would inject)."""
    if not _IDENT_RE.match(val_col):
        raise ValueError(f"val_col must be a plain SQL identifier, got {val_col!r}")
    return val_col


def hist_bounds(df: DataFrame, val_col: str) -> DataFrame:
    """1-row (lo, hi, n) frame over the non-null values — the only
    full-data pass besides the binning groupBy itself.  Kept as a
    DataFrame (broadcast into the plan), never collected."""
    v = F.col(val_col)
    return df.filter(v.isNotNull()).agg(
        F.min(v).cast("long").alias("lo"),
        F.max(v).cast("long").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )


def _bin_expr(val_col: str) -> F.Column:
    """Bin index under the (lo, w) columns joined in from bounds.
    Integer ``div`` — the double-division path would go inexact past
    2^53.  ``val_col`` must be a plain SQL identifier."""
    return F.expr(f"({_check_identifier(val_col)} - lo) div w").cast("long")


def _with_width(bounds: DataFrame, n_bins: int) -> DataFrame:
    """bounds + integer bin width w = (hi-lo) div n_bins + 1, which
    guarantees lo + n_bins·w > hi (every value fits unclamped).
    Integer ``div`` like everything else in the module: the floored
    double quotient diverges from the oracle's ``//`` once hi-lo
    approaches 2^53."""
    return bounds.withColumn(
        "w", (F.expr(f"(hi - lo) div cast({int(n_bins)} as bigint)") + F.lit(1)).cast("long")
    )


def hist_partials(
    df: DataFrame,
    val_col: str,
    bounds: DataFrame,
    n_bins: int = HIST_BINS,
    part_cols: Sequence[str] = (),
) -> DataFrame:
    """Partial sketches: (part_cols..., bin, cnt), ≤ n_bins counter
    rows per partial regardless of input size.  One shuffle whose
    map-side partial aggregate already collapses each task to the
    counter grid; ``bounds`` is a 1-row broadcast."""
    if n_bins < 1:
        raise ValueError(f"need n_bins >= 1, got {n_bins}")
    keys = [*part_cols, "bin"]
    return (
        df.filter(F.col(val_col).isNotNull())
        .join(F.broadcast(_with_width(bounds, n_bins)))
        .select(*part_cols, _bin_expr(val_col).alias("bin"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_pairs_fixed(
    df: DataFrame,
    val_col: str,
    lo: int,
    hi: int,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """Streaming-shaped variant: bin under a FIXED domain [lo, hi]
    given as literals — a stream cannot make the data-dependent
    bounds pre-pass, so the caller pins the domain up front (the
    standard fixed-domain histogram contract; out-of-domain values
    clamp to the edge bins rather than being dropped).  ``val_col``
    must be a plain SQL identifier — like ``_bin_expr`` it is
    interpolated into a SQL expression, so a name needing backtick
    quoting is rejected up front rather than silently mis-parsed.
    Map-only
    (bin, cnt=1) pairs: feed
    ``hist_pairs_fixed(stream, c, lo, hi)`` into
    ``streaming.foreach_batch_rollup_merge(path, ["bin"])`` and the
    materialized table IS the corpus histogram, maintained
    incrementally with no state store — counter merge is exact
    integer addition, so the streamed grid equals the one-pass batch
    build counter-for-counter (see tests/test_qsketch.py)."""
    if n_bins < 1:
        raise ValueError(f"need n_bins >= 1, got {n_bins}")
    if hi < lo:
        raise ValueError(f"need lo <= hi, got [{lo}, {hi}]")
    _check_identifier(val_col)
    w = (hi - lo) // n_bins + 1
    # integer div end-to-end (same 2^53 rationale as _bin_expr)
    bin_sql = (
        f"(least(greatest(cast({val_col} as bigint), cast({lo} as bigint)),"
        f" cast({hi} as bigint)) - cast({lo} as bigint)) div cast({w} as bigint)"
    )
    return (
        df.filter(F.col(val_col).isNotNull())
        .select(
            F.expr(bin_sql).cast("long").alias("bin"),
            F.lit(1).cast("long").alias("cnt"),
        )
    )


def hist_build_fixed(
    df: DataFrame,
    val_col: str,
    lo: int,
    hi: int,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """Batch twin of the fixed-domain form: the streamed rollup-merge
    of ``hist_pairs_fixed`` converges to exactly this."""
    return (
        hist_pairs_fixed(df, val_col, lo, hi, n_bins)
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Merge partials by summing counters — exact integer addition,
    so any split of the input yields the identical merged sketch."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0].select("bin", "cnt")
    for s in sketches[1:]:
        out = out.unionByName(s.select("bin", "cnt"))
    return out.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    bounds: DataFrame,
    qs_bp: Sequence[int],
    n_bins: int = HIST_BINS,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Answer quantiles from the merged sketch: for each q (basis
    points), target rank ceil(q·N / 10000), estimate = inclusive
    upper edge lo + (bin+1)·w - 1 of the smallest bin whose running
    count reaches the target.  The true discrete quantile lies in
    that bin, so ``est - w < true ≤ est``.

    With ``group_cols`` the sketch must carry those columns (built
    via ``hist_partials(part_cols=group_cols)``) and quantiles are
    answered per group over the SHARED global grid — the scale idiom:
    one (lo, w) definition means per-group, per-day, per-source
    partials all merge and compare on the same bins.  N is taken from
    the sketch itself (per-group counter sum), so the bounds frame
    contributes only the grid.

    Runs entirely on the ≤ n_bins-row-per-group sketch: a window
    cumsum ordered by bin (partitioned by group — tiny partitions of
    the sketch, never the data), then a per-(group, q) min over
    qualifying bins.  Output: (group_cols..., q_bp, target_rank,
    est, w) — w rides along so the rank-gate pass can bound the
    error without recomputing the width."""
    if not qs_bp:
        raise ValueError("need at least one quantile")
    bad = [q for q in qs_bp if not 0 < q <= 10000]
    if bad:
        raise ValueError(f"quantile basis points must be in (0, 10000]: {bad}")
    gcols = list(group_cols)
    wgrp = Window.partitionBy(*gcols)
    cum = sketch.withColumn(
        "cum",
        F.sum("cnt").over(wgrp.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("n_grp", F.sum("cnt").over(wgrp))
    qf = F.explode(
        F.array(*[F.lit(int(q)) for q in qs_bp])
    ).alias("q_bp")
    return (
        cum.join(F.broadcast(_with_width(bounds, n_bins).select("lo", "w")))
        .select(*gcols, "bin", "cum", "lo", "w", "n_grp", qf)
        .withColumn(
            # ceil(q·N / 10000) in pure integer arithmetic: the double
            # path loses exactness once q_bp·N tops 2^53 (N ≈ 1e12 —
            # squarely in 100 TB territory).
            "target_rank",
            F.expr("(q_bp * n_grp + 9999) div 10000").cast("long"),
        )
        .filter(F.col("cum") >= F.col("target_rank"))
        .groupBy(*gcols, "q_bp", "target_rank")
        .agg(F.min("bin").alias("bin"), F.first("lo").alias("lo"), F.first("w").alias("w"))
        .select(
            *gcols,
            "q_bp",
            "target_rank",
            (F.col("lo") + (F.col("bin") + 1) * F.col("w") - 1).alias("est"),
            "w",
        )
    )


def hist_rank_gates(
    df: DataFrame,
    val_col: str,
    quantiles: DataFrame,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact soundness gates recomputed from the RAW data: for each
    quantile row, ``rank_ok`` asserts count(v ≤ est) ≥ target (the
    estimate does not undershoot) and ``bin_ok`` asserts
    count(v ≤ est - w) < target (the true quantile sits inside the
    reported bin, i.e. the error is < one bin width).  One
    conditional-aggregation pass over the data — the certification
    tier; the sketch itself never needs it.

    ``quantiles`` is the hist_quantiles output (carries w; for the
    grouped form pass the same ``group_cols`` so each row gates
    against its own group's values)."""
    v = F.col(val_col)
    gcols = list(group_cols)
    joined = df.filter(v.isNotNull()).join(
        F.broadcast(quantiles), gcols if gcols else None
    )
    gates = joined.groupBy(*gcols, "q_bp", "target_rank", "est", "w").agg(
        F.sum(F.when(v <= F.col("est"), 1).otherwise(0)).alias("n_le_est"),
        F.sum(F.when(v <= F.col("est") - F.col("w"), 1).otherwise(0)).alias("n_le_prev"),
    )
    return gates.select(
        *gcols,
        "q_bp",
        "target_rank",
        "est",
        (F.col("n_le_est") >= F.col("target_rank")).alias("rank_ok"),
        (F.col("n_le_prev") < F.col("target_rank")).alias("bin_ok"),
    )
