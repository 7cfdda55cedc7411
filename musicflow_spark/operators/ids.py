"""Surrogate-id assignment at scale (SURVEY §2 W1).

The reference's ``row_number() over (order by ...)``
(log_for_tableau.sql:98) is fine on dimension-sized frames but a
global window forces ALL rows through one partition — the classic
100 TB cliff.  ``surrogate_ids`` reproduces the same deterministic
dense 1-based numbering with no global sort:

1. range-repartition on the order columns (cluster-wide sort order
   across partitions, parallel within),
2. count rows per partition — an O(num_partitions) driver aggregate,
   NOT a data collect — and prefix-sum the offsets,
3. per-partition ``row_number`` (parallel window) + broadcast offset.

This is the DataFrame form of ``zipWithIndex``: same two-pass shape,
but the ordering is an explicit column contract instead of partition
luck, so the result provably equals the single-partition
``row_number`` on the same total order (oracle-checked by the
``part_surrogate_ids`` query and the equality test).

``opaque_ids`` is the cheaper cousin for when only uniqueness matters:
``monotonically_increasing_id`` assigns partition-local counters with
no shuffle at all, at the price of gaps and no order meaning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def surrogate_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "surrogate_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based ids equal to
    ``row_number() over (order by *order_cols)`` without a global
    single-partition window.

    ``order_cols`` must be a deterministic total order (include a
    tiebreak chain down to a unique key — same contract the oracle's
    ``ORDER BY`` has); with ties, numbering within the tie would be
    engine-dependent.

    The partitioned frame is materialized (localCheckpoint) before
    the count pass: range-boundary sampling is not bitwise
    deterministic across jobs, and the offsets MUST describe the same
    partitioning the final window sees.  On a real cluster swap the
    localCheckpoint for ``persist(DISK_ONLY)`` (see SCALE.md).
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ordered = (
        df.repartitionByRange(parts, *cols)
        .withColumn("__pid__", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # one row per partition — bounded by the partition count, never the data
    counts = ordered.groupBy("__pid__").agg(F.count(F.lit(1)).alias("__n__")).collect()
    offsets, acc = [], 0
    for pid, n in sorted((r["__pid__"], r["__n__"]) for r in counts):
        offsets.append((pid, acc))
        acc += n
    omap = df.sparkSession.createDataFrame(offsets, "__pid__ int, __off__ long")
    w = Window.partitionBy("__pid__").orderBy(*cols)
    return (
        ordered.join(F.broadcast(omap), "__pid__")
        .withColumn(id_col, (F.row_number().over(w) + F.col("__off__")).cast("long"))
        .drop("__pid__", "__off__")
    )


def opaque_ids(df: DataFrame, id_col: str = "row_id") -> DataFrame:
    """Unique-but-gappy 64-bit ids with ZERO shuffle:
    ``monotonically_increasing_id`` packs (partition id, local
    counter) into one long.  The right tool when downstream only
    needs a join key, not an ordering — at 100 TB this is free where
    surrogate_ids still pays one range shuffle."""
    return df.withColumn(id_col, F.monotonically_increasing_id())


def ntile_scaled(
    df: DataFrame,
    n: int,
    order_cols: list[str],
    out_col: str = "bucket",
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY order_cols)`` without the global
    single-partition window NTILE normally forces: global dense row
    numbers come from ``surrogate_ids`` (range repartition +
    parallel per-partition window + broadcast offsets) and the bucket
    is NTILE's closed form — with N = q·n + r rows, the first r
    buckets hold q+1 rows:

        bucket(rn) = (rn-1) div (q+1) + 1            if rn ≤ r·(q+1)
                     r + (rn - r·(q+1) - 1) div q + 1 otherwise

    which is exactly the ANSI NTILE contract, so an oracle using the
    engine's native ``ntile(n)`` with the SAME total order (tiebreak
    chain included — ``order_cols`` must be a total order) matches
    bit-for-bit.  The row count N is one driver-side aggregate
    action, same cost class as surrogate_ids' per-partition count
    pass."""
    total = df.count()
    q, r = divmod(total, n)
    cutoff = r * (q + 1)
    bucket = (
        f"case when __rn__ <= {cutoff} then (__rn__ - 1) div {q + 1} + 1 "
        f"else {r} + (__rn__ - {cutoff} - 1) div {max(q, 1)} + 1 end"
    )
    return (
        surrogate_ids(df, order_cols, "__rn__")
        .withColumn(out_col, F.expr(bucket).cast("int"))
        .drop("__rn__")
    )
