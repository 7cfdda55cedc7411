"""Adaptive scan fan-out for CPU-dense map stages.

Several of the engine's heaviest per-row operators (shingling, media
decode, Arrow kernels, edit-distance verification) sit directly on a
parquet scan or on a small AQE-coalesced exchange.  Scan and coalesce
parallelism are BYTE-derived (``maxPartitionBytes`` /
``openCostInBytes`` / ``advisoryPartitionSizeInBytes``), so a
small-but-expensive frame — one row group, a few MB — arrives as ONE
partition and the whole map stage runs on a single core while the
rest of the cluster idles (guide §2.5 input skew, §6 split sizing).
AQE cannot help here: it only coalesces DOWN, and it sizes by bytes,
not by downstream CPU.

``fan_out`` repartitions round-robin to the session's default
parallelism ONLY when the frame's planned partition count is below
it.  At production scale the scan already yields thousands of splits
and the helper is a no-op — no shuffle is ever added to a big input.
The round-robin exchange is deterministic under retry
(``spark.sql.execution.sortBeforeRepartition`` stays on) and
result-neutral at every call site (downstream keyed shuffles and
aggregations re-key anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition to ``factor * defaultParallelism``
    when (and only when) the frame currently plans fewer partitions.

    The partition probe compiles the physical plan but runs no job.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
