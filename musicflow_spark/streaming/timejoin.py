"""Streaming temporal joins: the stream-side twins of
operators/timejoin.py — enrich an event stream against a static (or
slowly-changing, periodically re-broadcast) dimension of timestamped
rows or intervals.

The batch as-of union-merge window does not stream (a window over an
unbounded key cannot finalize), so the streaming form decomposes
differently: stream-static LEFT join on the key with the temporal
predicate pushed into the join condition (stream-static joins accept
arbitrary conditions), then a watermarked per-event ``max_by``
aggregation collapses the candidate matches to the single latest one.
State is bounded by the watermark — each event's group finalizes and
evicts once the watermark passes its timestamp.

The bucketed range join is stateless in streaming form: the bucket
explode happens on the static interval side, the stream side derives
its one bucket in a map, and the equi-join + exact filter needs no
state at all — pairs emit as they arrive.

The overlap join is the one genuinely stream-STREAM member: two
unbounded interval streams, watermarks on both start columns, and a
declared max interval length that turns the overlap predicate into
the time-range constraint Spark's join-state eviction needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from musicflow_spark.operators.timejoin import micros, range_join_bucketed


def asof_join_stream(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    *,
    watermark: str = "2 hours",
    suffix: str = "_right",
) -> DataFrame:
    """Stream-static as-of join (backward, inclusive): every stream
    row matched to the latest static row with ``right_ts <=
    left_ts`` on the same key; unmatched rows keep nulls.

    ``right`` must be static and deduplicated on (key, ts) — same
    determinism contract as the batch operator.  Emits in append mode
    once the watermark passes the event's timestamp (the grouping
    includes the event-time column, so groups finalize exactly once).

    Scale: the static side broadcasts (dimension-sized by contract —
    an unbounded right side needs stream-stream joins with their own
    watermark bookkeeping, a different operator); stream state is one
    in-flight group per event inside the watermark horizon."""
    payload_cols = [c for c in right.columns if c != right_on]
    renamed = {c: (c + suffix if c in left.columns else c) for c in payload_cols}
    r = right.select(
        F.col(right_on).alias("__k__"),
        micros(right, right_ts).alias("__rt__"),
        F.struct(*[F.col(c).alias(renamed[c]) for c in payload_cols]).alias(
            "__payload__"
        ),
    )
    lt = micros(left, left_ts)
    joined = (
        left.withWatermark(left_ts, watermark)
        .join(
            F.broadcast(r),
            (F.col(left_on) == F.col("__k__")) & (F.col("__rt__") <= lt),
            "left",
        )
    )
    agg = joined.groupBy(left_ts, *[c for c in left.columns if c != left_ts]).agg(
        F.max_by("__payload__", "__rt__").alias("__m__")
    )
    out_payload = [F.col("__m__")[renamed[c]].alias(renamed[c]) for c in payload_cols]
    return agg.select(*left.columns, *out_payload)


def overlap_join_stream(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    *,
    max_len: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-STREAM interval overlap join: pairs from two unbounded
    interval streams with equal keys and intersecting half-open spans
    (``l.lo < r.hi AND r.lo < l.hi``).  ``how='left'`` keeps left
    intervals with no overlap partner, null-padded once the watermark
    proves none can still arrive.

    Unlike the batch twin (operators/timejoin.py::
    overlap_join_bucketed) there is no bucket explode — a stream-stream
    inner join emits each qualifying pair exactly once as both rows
    arrive — but Spark must know when a buffered interval can never
    match future arrivals, or join state grows forever.  That bound
    comes from a declared maximum interval length ``max_len`` (both
    sides): if every span is at most L, overlap implies
    ``l.lo - L < r.lo < l.lo + L``, a time-range constraint between
    the two watermarked start columns that Spark's state-eviction
    analysis consumes directly.  State per side is then wm horizon +
    2L of intervals per key — constant for a steady stream.

    The length contract is enforced, not assumed: intervals longer
    than ``max_len`` are dropped (deterministically, on both the
    stream and any batch replay) rather than silently losing matches
    to early state eviction.  Column names of the two sides must be
    disjoint (rename before calling — streams have no auto-suffix).

    Both ``*_lo``/``*_hi`` must be timestamp columns (event time);
    the exact-micros LONG form the batch operator accepts cannot
    carry a watermark.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"column names must be disjoint, both sides have {clash}")
    l = left.filter(
        F.col(left_hi) <= F.col(left_lo) + F.expr(f"INTERVAL {max_len}")
    ).withWatermark(left_lo, watermark)
    r = right.filter(
        F.col(right_hi) <= F.col(right_lo) + F.expr(f"INTERVAL {max_len}")
    ).withWatermark(right_lo, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        # half-open overlap
        & (F.col(left_lo) < F.col(right_hi))
        & (F.col(right_lo) < F.col(left_hi))
        # the state-eviction bound between the two event-time columns
        & (F.col(right_lo) > F.col(left_lo) - F.expr(f"INTERVAL {max_len}"))
        & (F.col(right_lo) < F.col(left_lo) + F.expr(f"INTERVAL {max_len}"))
    )
    return l.join(r, cond, "left_outer" if how == "left" else "inner")


def asof_join_stream_stream(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    *,
    horizon: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
    tiebreak: str | None = None,
) -> DataFrame:
    """Stream-STREAM as-of join: every left event matched to the
    LATEST right event at-or-before it on the same key, looking back
    at most ``horizon`` — the two-unbounded-sides version of
    :func:`asof_join_stream` (whose right side must be static).

    Decomposition: a watermarked stream-stream inner join over the
    bounded window ``l.ts - horizon < r.ts <= l.ts`` produces all
    candidate matches (state evicted by the time-range bound exactly
    as in the overlap join), then a per-left-event ``max_by`` keyed
    by the left row collapses candidates to the single latest one —
    Spark's multi-stateful-operator support (join -> windowed agg in
    append mode) finalizes each left group once the watermark passes
    its timestamp.  ``how='inner'`` drops a left event with NO right
    match inside the horizon; ``how='left'`` keeps it null-padded
    (the join emits the padded row once the watermark proves no match
    can still arrive, and the null candidate flows through ``max_by``
    untouched).  Either way, matches older than ``horizon`` do not
    exist — the unbounded-lookback form needs the static-side
    operator or a batch backfill (a documented contract, not a
    silent behavior).

    The bounded lookback is what makes the state finite.  Ties among
    right rows with equal (key, ts) resolve arbitrarily unless
    ``tiebreak`` names a right column that completes the total order
    (max_by then compares struct(right_ts, tiebreak) — struct
    ordering is lexicographic, so the highest tiebreak wins within a
    ts tie); without it, pre-dedup the right stream if it can carry
    duplicates (the family contract, same as the batch operator).
    Column names must be disjoint; both ts columns must be event-time
    timestamps."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"column names must be disjoint, both sides have {clash}")
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) > F.col(left_ts) - F.expr(f"INTERVAL {horizon}"))
    )
    joined = l.join(r, cond, "left_outer" if how == "left" else "inner")
    payload = F.struct(*[F.col(c) for c in right.columns]).alias("__cand__")
    order_key = (
        F.col(f"__cand__.{right_ts}")
        if tiebreak is None
        else F.struct(
            F.col(f"__cand__.{right_ts}"), F.col(f"__cand__.{tiebreak}")
        )
    )
    agg = joined.select(*left.columns, payload).groupBy(
        *left.columns
    ).agg(F.max_by("__cand__", order_key).alias("__m__"))
    return agg.select(
        *left.columns, *[F.col(f"__m__.{c}").alias(c) for c in right.columns]
    )


def range_join_stream(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    point_ts: str,
    interval_lo: str,
    interval_hi: str,
    *,
    bucket_us: int | None = None,
) -> DataFrame:
    """Stream-static point-in-interval join: stateless — the interval
    side (static) explodes over its buckets, the stream side maps to
    its one bucket, and the equi-join + exact range filter emit pairs
    as events arrive.  Identical semantics to the batch operator on
    the same inputs (the convergence test's definition of correct)."""
    kwargs = {} if bucket_us is None else {"bucket_us": bucket_us}
    return range_join_bucketed(
        points,
        intervals,
        point_key=point_key,
        interval_key=interval_key,
        point_ts=point_ts,
        interval_lo=interval_lo,
        interval_hi=interval_hi,
        **kwargs,
    )
