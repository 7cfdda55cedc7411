"""Temporal joins Spark lacks as built-ins: as-of join and bucketed
range (interval) join — the two workhorse joins of event/market-data
pipelines, expressed in shapes that survive 100 TB.

As-of join (each left row matched to the latest right row at-or-before
its timestamp) is usually written as a correlated subquery or a
windowed self-join; both collapse at scale.  The scalable shape is the
*union-merge*: tag both inputs, union them, and run ONE window ordered
by (ts, side) per key — a single hash shuffle on the key, sort within
partitions, no join node at all.  This is the same merge the
single-node engines (pandas ``merge_asof``, DuckDB ``ASOF JOIN``) do,
re-expressed as a Spark window so it distributes by key.

Range join (point-in-interval) naively becomes a key-equi-join whose
per-key fan-out is interval_count x point_count; when keys are few or
intervals long, the bucketed form bounds it: explode each interval
over the fixed-width time buckets it covers, bucket the points once,
and equi-join on (key, bucket) before the exact range filter.  Each
point lives in exactly ONE bucket, so no post-join dedup is needed.
Bucket width trades replication (long intervals -> many buckets) for
join selectivity; choose it near the median interval length.

Reference parity: MusicFlow has no temporal joins (batch ELT over
API snapshots) — this module is part of the training-data /
event-pipeline extension surface the engine targets beyond the
reference (see SURVEY §2 "ext").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: microseconds per day — day arithmetic stays in exact integer space
US_PER_DAY = 86_400_000_000

_NTZ_EPOCH = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def micros(df: DataFrame, col: str) -> Column:
    """Exact epoch-microseconds of a time column as LONG, independent
    of the session timezone for BOTH timestamp flavors: LTZ already
    stores epoch micros (``unix_micros``), NTZ diffs against the naive
    epoch literal (``timestampdiff`` never consults a timezone).
    Session-tz-dependent casts between the two flavors are exactly the
    bug this avoids — a driver session need not run in UTC.  LONG
    columns pass through (already micros)."""
    dt = dict(df.dtypes)[col]
    if dt == "timestamp":
        return F.unix_micros(F.col(col))
    if dt == "timestamp_ntz":
        return F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {col})")
    if dt in ("bigint", "long"):
        return F.col(col)
    raise TypeError(f"column {col!r} has non-time type {dt}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """Match every left row to the single nearest right row per key:
    the latest right row with ``right_ts <= left_ts`` (backward, the
    default) or the earliest with ``right_ts >= left_ts`` (forward).
    Unmatched left rows keep nulls — left-outer semantics, exactly one
    output row per left row.

    Ties among right rows with identical (key, ts) are resolved by the
    row latest in the scan order, which is NOT deterministic — if the
    right side can hold duplicate (key, ts) pairs, pre-dedup it (e.g.
    a row_number window keeping the max tiebreak key); the registered
    ``events_asof_order`` query shows the pattern.

    Plan shape: union both sides -> one window partitioned by key,
    ordered by (ts, side) -> filter back to left rows.  ONE hash
    exchange on the key + an in-partition sort; no join node, no
    correlated subquery, no per-key fan-out.  Hot keys land in one
    task each (same caveat as any keyed window) — at 100 TB, salt the
    key and replicate the right side per salt if one key dominates
    (SCALE.md "as-of join").
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload_cols = [c for c in right.columns if c != right_on]
    clash = [c for c in payload_cols if c in left.columns]
    renamed = {c: (c + suffix if c in clash else c) for c in payload_cols}

    # right rows carry their payload as ONE struct (null on left rows):
    # last(struct) can then never leap-frog a legitimately-null payload
    # field back to an older right row.
    payload = F.struct(
        *[F.col(c).alias(renamed[c]) for c in payload_cols]
    ).alias("__payload__")
    # both sides order on exact epoch-micros longs: comparing an LTZ
    # left ts to an NTZ right ts directly would silently coerce through
    # the session timezone.
    r = right.select(
        F.col(right_on).alias("__k__"),
        micros(right, right_ts).alias("__t__"),
        F.lit(1).alias("__side__"),
        payload,
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
    )
    l = left.select(
        F.col(left_on).alias("__k__"),
        micros(left, left_ts).alias("__t__"),
        F.lit(0).alias("__side__"),
        F.lit(None).cast(r.schema["__payload__"].dataType).alias("__payload__"),
        *left.columns,
    )

    # backward scans time ascending; forward scans descending so the
    # "last right row seen" is the earliest at-or-after match.  With
    # exact matches allowed, right rows sort BEFORE left rows on equal
    # ts (side desc); strict mode flips that so equal-ts right rows are
    # not yet visible to the left row.
    ts_ord = F.col("__t__").asc() if direction == "backward" else F.col("__t__").desc()
    side_ord = (
        F.col("__side__").desc() if allow_exact_matches else F.col("__side__").asc()
    )
    w = (
        Window.partitionBy("__k__")
        .orderBy(ts_ord, side_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = r.unionByName(l).withColumn(
        "__m__", F.last("__payload__", ignorenulls=True).over(w)
    )
    out_payload = [
        F.col("__m__")[renamed[c]].alias(renamed[c]) for c in payload_cols
    ]
    return (
        matched.filter(F.col("__side__") == 0)
        .select(*left.columns, *out_payload)
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    point_ts: str,
    interval_lo: str,
    interval_hi: str,
    *,
    bucket_us: int = US_PER_DAY,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows on key equality plus
    ``lo <= ts < hi`` (half-open), without a theta-join blow-up.

    Each interval explodes over the bucket indices it covers
    (``floor(lo/b) .. floor((hi-1us)/b)``); each point computes its one
    bucket; the join is a plain equi-join on (key, bucket) with the
    exact range predicate as a post-filter.  A point's bucket is
    unique, so every qualifying (point, interval) pair appears exactly
    once — no dedup stage.  Empty intervals (hi <= lo) are dropped
    before the explode (Spark's ``sequence`` would otherwise count
    DOWN).  Catalyst pushes the equi-join through AQE like any other
    shuffle join; replication factor is ceil(interval_len / bucket).

    ``how='left'`` keeps unmatched intervals (null point columns) —
    implemented as the inner form + an anti-joined pad, so the hot
    path stays an equi-join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bucket_us < 1:
        raise ValueError(f"bucket_us must be >= 1, got {bucket_us}")

    lo_us = micros(intervals, interval_lo)
    hi_us = micros(intervals, interval_hi)
    iv = (
        intervals.filter(hi_us > lo_us)
        .withColumn("__lo_us__", lo_us)
        .withColumn("__hi_us__", hi_us)
        .withColumn(
            "__b__",
            F.explode(
                F.sequence(
                    F.expr(f"__lo_us__ div {bucket_us}"),
                    F.expr(f"(__hi_us__ - 1) div {bucket_us}"),
                )
            ),
        )
    )
    pt = points.withColumn("__t_us__", micros(points, point_ts)).withColumn(
        "__b__", F.expr(f"__t_us__ div {bucket_us}")
    )
    cond = (
        (pt[point_key] == iv[interval_key])
        & (pt["__b__"] == iv["__b__"])
        & (pt["__t_us__"] >= iv["__lo_us__"])
        & (pt["__t_us__"] < iv["__hi_us__"])
    )
    inner = pt.join(iv, cond).drop("__b__", "__t_us__", "__lo_us__", "__hi_us__")
    if how == "inner":
        return inner
    matched_keys = inner.select(*intervals.columns).distinct()
    pad = intervals.join(matched_keys, intervals.columns, "left_anti").select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in points.schema.fields],
        *intervals.columns,
    )
    return inner.unionByName(pad)


def overlap_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    *,
    bucket_us: int = US_PER_DAY,
) -> DataFrame:
    """Interval x interval overlap join: all (left, right) pairs with
    equal keys whose half-open spans intersect
    (``l.lo < r.hi AND r.lo < l.hi``), without a theta join and
    without a dedup stage.

    Interval x interval is harder than the point-in-interval case
    above: a pair of long intervals can share MANY buckets, so a naive
    bucket equi-join emits it once per shared bucket and needs a
    distinct() — a second full shuffle of the (potentially huge) pair
    stream.  The standard fix (bin-based interval joins in the
    MapReduce/Flink literature) makes emission unique by construction:
    both sides explode over the buckets they cover, the equi-join runs
    on (key, bucket), and a pair is KEPT only in the single bucket
    containing ``greatest(l.lo, r.lo)``.  If the intervals overlap,
    the later start lies inside both spans, so that bucket is covered
    by both sides — every overlapping pair survives in exactly one
    bucket and the distinct() disappears.

    Plan shape: two explodes (map-side, replication factor
    ceil(len/bucket)) + ONE shuffle equi-join on (key, bucket) + a
    post-filter.  Skewed keys shard across buckets, so a hot key no
    longer lands in a single task the way a key-only equi-join would.
    Choose ``bucket_us`` near the median interval length: wider
    buckets cut replication but fatten each join group.

    ``*_lo``/``*_hi`` accept timestamp, timestamp_ntz, or exact
    epoch-microsecond LONG columns (see :func:`micros`); empty
    intervals (``hi <= lo``) are dropped before the explode.  Column
    names of the two sides must be disjoint (rename before calling —
    same contract as the stream twin; self-joins alias one side).
    """
    if bucket_us < 1:
        raise ValueError(f"bucket_us must be >= 1, got {bucket_us}")
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"column names must be disjoint, both sides have {clash}")

    def exploded(df: DataFrame, lo: str, hi: str, tag: str) -> DataFrame:
        lo_us, hi_us = micros(df, lo), micros(df, hi)
        return (
            df.filter(hi_us > lo_us)
            .withColumn(f"__lo{tag}__", lo_us)
            .withColumn(f"__hi{tag}__", hi_us)
            .withColumn(
                f"__b{tag}__",
                F.explode(
                    F.sequence(
                        F.expr(f"__lo{tag}__ div {bucket_us}"),
                        F.expr(f"(__hi{tag}__ - 1) div {bucket_us}"),
                    )
                ),
            )
        )

    l = exploded(left, left_lo, left_hi, "l")
    r = exploded(right, right_lo, right_hi, "r")
    cond = (
        (l[left_key] == r[right_key])
        & (l["__bl__"] == r["__br__"])
        # half-open overlap...
        & (l["__lol__"] < r["__hir__"])
        & (r["__lor__"] < l["__hil__"])
        # ...emitted only in the bucket holding the later start
        & (
            F.expr(f"greatest(__lol__, __lor__) div {bucket_us}")
            == l["__bl__"]
        )
    )
    return l.join(r, cond).drop(
        "__bl__", "__br__", "__lol__", "__hil__", "__lor__", "__hir__"
    )


def days_between(df: DataFrame, end_ts: str, start_ts: str) -> Column:
    """Whole 86400-second windows between two time columns of ``df``,
    as exact integer floor-division of the microsecond difference — no
    double rounding, no calendar-day semantics (``datediff`` counts
    midnight crossings, a different function), and no session-tz
    dependence even when the operands are different timestamp flavors
    (each converts through :func:`micros` independently)."""
    diff = micros(df, end_ts) - micros(df, start_ts)
    # exact floor division on longs: subtract the (always-positive)
    # pmod remainder, then divide the exact multiple — the quotient is
    # an integer far below 2^53, so the double division is exact.
    return ((diff - F.pmod(diff, F.lit(US_PER_DAY))) / US_PER_DAY).cast("long")
