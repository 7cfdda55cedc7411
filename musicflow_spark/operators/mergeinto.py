"""MERGE INTO (upsert-with-delete) as a single full-outer join — the
warehouse mutation primitive the reference sidesteps by full-refreshing
every BigQuery table per run (``dags/setup_dag.py`` load = truncate +
append, reference S2).  At 100 TB a full refresh is off the table;
the idiomatic Spark shape is ONE full-outer join on the merge key and
a row-local CASE per output column — exactly what Delta/Iceberg MERGE
compiles to when no file-pruning metadata applies.

Semantics (ANSI / Delta ``MERGE INTO base USING updates ON key``):

- matched & ``delete_when``            -> row dropped
- matched otherwise                    -> ``update_set`` columns replaced,
                                          others carried from base
- not matched by base (updates-only)   -> inserted via ``insert_set``
- not matched by source (base-only)    -> carried unchanged

Scale notes (100 TB):
- exactly one shuffle (the full-outer hash join on the key); with
  base and updates both bucketed by the key (``sources/catalog.py``
  bucketBy write path) the exchange disappears entirely;
- all branch logic is row-local CASE — whole-stage codegen, no second
  pass, no window;
- AQE skew-join splits oversized key partitions at runtime; the
  updates side is typically delta-sized, so AQE usually downgrades
  the join to broadcast on its own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_B, _U = "__merge_b__", "__merge_u__"


def merge_into(
    base: DataFrame,
    updates: DataFrame,
    on: list[str],
    update_set: dict[str, Column] | None = None,
    delete_when: Column | None = None,
    insert_set: dict[str, Column] | None = None,
) -> DataFrame:
    """Merge ``updates`` into ``base`` on key columns ``on``; returns
    the post-merge table with ``base``'s schema (key columns included).

    ``update_set`` / ``insert_set`` map base column name -> expression
    over the JOINED row (base columns + updates columns); unlisted
    base columns are carried (update) or NULL (insert).  ``insert_set``
    must cover the key columns' values via the updates side
    (they are taken from the updates key automatically).  Non-key
    column names of ``updates`` must not collide with ``base``'s —
    rename on the way in (keeps every branch expression unambiguous).
    """
    update_set = update_set or {}
    insert_set = insert_set or {}
    collide = (set(base.columns) & set(updates.columns)) - set(on)
    if collide:
        raise ValueError(f"rename updates columns colliding with base: {collide}")

    b = base.withColumn(_B, F.lit(True))
    u = updates.withColumn(_U, F.lit(True))
    joined = b.join(u, on=on, how="full_outer")
    matched = F.col(_B).isNotNull() & F.col(_U).isNotNull()

    if delete_when is not None:
        # ANSI/Delta: a NULL `WHEN MATCHED AND cond THEN DELETE` condition
        # does NOT fire — the row falls through to update/carry.  Without
        # the coalesce, 3-valued logic makes ~(matched & NULL) = NULL and
        # the filter silently drops the row.
        fires = matched & F.coalesce(delete_when, F.lit(False))
        joined = joined.filter(~fires)

    out_cols = []
    for c in base.columns:
        if c in on:
            # full-outer join coalesces the key columns already
            out_cols.append(F.col(c).alias(c))
            continue
        carried = F.col(c)
        updated = update_set.get(c, carried)
        inserted = insert_set.get(c, F.lit(None).cast(base.schema[c].dataType))
        out_cols.append(
            F.when(F.col(_U).isNull(), carried)      # base-only
            .when(F.col(_B).isNull(), inserted)       # updates-only
            .otherwise(updated)                        # matched
            .alias(c)
        )
    return joined.select(*out_cols)
