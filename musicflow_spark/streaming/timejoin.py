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
