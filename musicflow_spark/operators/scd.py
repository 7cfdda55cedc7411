"""Slowly-changing-dimension maintenance (SCD Type 2).

The reference warehouse rebuilds its dimension marts from scratch each
dbt run (`dbt/models/marts/*.sql` are full-refresh tables); at 100 TB
a dimension rebuild is a full shuffle of history, so the engine needs
the incremental form: keep every historical version of a dimension row
with a ``[valid_from, valid_to)`` interval, and fold a new snapshot of
the source into that history touching only the keys that changed —
dbt's *snapshot* / ``MERGE`` semantics, re-expressed as pure
DataFrame set algebra.

Scale shape: one equi-shuffle of the OPEN rows against the update
batch (closed history is untouched — at scale it lives in separate
partitions and is not even read), plus an anti-join for brand-new
keys.  No window, no global ordering, no Python.  When the update
batch is dimension-sized, Spark's AQE broadcasts it and the whole
merge is shuffle-free on the history side.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(snapshot: DataFrame, batch_id: int = 0) -> DataFrame:
    """Seed a Type-2 history from an initial snapshot: every row open,
    ``valid_from = batch_id``, ``valid_to`` null (= current)."""
    return snapshot.select(
        "*",
        F.lit(batch_id).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    batch_id: int,
) -> DataFrame:
    """Fold one update batch into a Type-2 history.

    ``history`` carries ``key``, ``tracked``..., ``valid_from``,
    ``valid_to`` (null = open row).  ``updates`` carries ``key`` +
    ``tracked`` (at most one row per key — enforce upstream).  Rules:

    - changed key (any tracked column differs, null-safe): the open
      row closes (``valid_to = batch_id``) and a new open row with the
      update's values appears (``valid_from = batch_id``);
    - unchanged key: untouched (NO new version — dbt `check` strategy);
    - brand-new key: inserted open with ``valid_from = batch_id``;
    - keys absent from the batch: untouched (missing ≠ deleted).

    Closed rows pass through unread-and-unchanged, so an at-scale
    layout that partitions history by ``valid_to IS NULL`` only ever
    rewrites the open partition.
    """
    cols = [key, *tracked]
    upd = updates.select(
        F.col(key),
        *[F.col(c).alias(f"__u_{c}__") for c in tracked],
        F.lit(True).alias("__present__"),
    )
    # ONE pass over history: closed rows ride the same left join (they
    # can never re-close — the `open` guard below), so the history
    # child appears once in the plan instead of once per branch.
    j = history.join(upd, key, "left")
    open_ = F.col("valid_to").isNull()
    diff = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.col(f"__u_{c}__")) for c in tracked],
    )
    changed = open_ & F.coalesce(F.col("__present__"), F.lit(False)) & diff

    passthrough = j.filter(~changed).select(*cols, "valid_from", "valid_to")
    close_now = j.filter(changed).select(
        *cols,
        "valid_from",
        F.lit(batch_id).cast("long").alias("valid_to"),
    )
    reopen = j.filter(changed).select(
        F.col(key),
        *[F.col(f"__u_{c}__").alias(c) for c in tracked],
        F.lit(batch_id).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    brand_new = scd2_init(
        updates.select(*cols).join(
            history.select(key).distinct(), key, "left_anti"
        ),
        batch_id,
    )
    return (
        passthrough.unionByName(close_now)
        .unionByName(reopen)
        .unionByName(brand_new)
    )


def scd2_apply_batches(
    history: DataFrame,
    batches: list[tuple[int, DataFrame]],
    key: str,
    tracked: list[str],
) -> DataFrame:
    """Fold ``(batch_id, updates)`` batches into the history in order,
    materializing between batches.  Each batch in a real deployment is
    a separate refresh job that writes the history table before the
    next reads it; this helper reproduces that boundary with
    ``localCheckpoint`` (swap for a table write on a cluster — see
    SCALE.md).  The boundary is also load-bearing locally: chaining
    two merges in ONE lazy plan trips a Spark planner defect
    (`PartitioningCollection requires all of its partitionings have
    the same numPartitions` from the union-of-joins feeding another
    join), which the materialization sidesteps."""
    for batch_id, updates in batches:
        history = scd2_merge(history, updates, key, tracked, batch_id)
        history = history.localCheckpoint(eager=False)
    return history


def merge_partial_rollups(partials: list[DataFrame], keys: list[str]) -> DataFrame:
    """Combine pre-aggregated rollup partials into one rollup — the
    incremental-materialization step: yesterday's aggregate table +
    today's delta aggregate re-aggregate by the same keys instead of
    recomputing history.  Only ALGEBRAIC aggregates survive this
    (sums/counts/min/max re-aggregate; averages must ride as
    sum+count).  Every non-key column is summed and keeps its name, so
    ``merge(recompute(parts)) == recompute(whole)`` exactly for
    integer measures.
    """
    unioned = reduce(lambda a, b: a.unionByName(b), partials)
    val_cols = [c for c in unioned.columns if c not in keys]
    return unioned.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in val_cols]
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Symmetric snapshot reconciliation via FULL OUTER join: classify
    every key as added / removed / changed / unchanged between two
    table versions — the regression-diff every pipeline migration
    needs (reference analogue: the full-refresh dbt rebuild implicitly
    trusts the new snapshot; this operator makes the delta explicit).

    Returns one row per key: (*keys, diff_status, old_<c>/new_<c> for
    each compare column, nulls where the side is absent).  Comparison
    is null-safe (``eqNullSafe``), so a NULL→value transition counts
    as changed, not unchanged.

    Scale: the full outer join shuffles both sides on the key — at
    100 TB prefer bucketed snapshots on the same key so the join is
    co-located; output is key-grain (no fan-out).
    """
    if not compare_cols:
        raise ValueError(
            "compare_cols must be non-empty; for presence-only diffing "
            "pass a key column (added/removed/unchanged, never changed)"
        )
    o = old.select(
        *keys,
        F.lit(1).alias("_old_present"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("_new_present"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, keys, "full_outer")
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
    )
    status = (
        F.when(F.col("_old_present").isNull(), F.lit("added"))
        .when(F.col("_new_present").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out_cols = (
        keys
        + [status.alias("diff_status")]
        + [c for pair in (
            (f"old_{cc}", f"new_{cc}") for cc in compare_cols
        ) for c in pair]
    )
    return j.select(*out_cols)
