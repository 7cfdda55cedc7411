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

import os

from pyspark.sql import DataFrame

#: Width divisor for ALLOCATION-HEAVY interpreted stages (higher-order
#: function lambdas — shingling, signature folds — evaluate interpreted
#: and allocate per element).  Running such a stage at full session
#: width makes every young-gen GC pause convoy ALL concurrent tasks, so
#: measured per-task time inflates ~10x and wall clock gets WORSE than
#: quarter width (sf0.1, local[32]: jaccard/minhash/incremental/winnow
#: at width 32 = 1.81/1.85/3.0/1.32 s vs width 8 = 1.15/1.68/1.68/1.12 s;
#: width 0 i.e. no fan-out = 2.45/2.75/2.32/1.48 s).  Expressed as a
#: FRACTION of defaultParallelism (not an absolute count) and
#: env-overridable so a cluster profile can re-derive it; at production
#: split counts fan_out no-ops entirely and the divisor is moot.
INTERPRETED_STAGE_DIVISOR = int(os.environ.get("SPARK_GRAFT_FANOUT_DIVISOR", "4"))

#: Width divisor for PYTHON CODEC map stages (mapInPandas/mapInArrow
#: kernels running pure-Python codecs: PNG/WAV/RVID encode+decode).
#: Each task is a separate Python worker process; at full session
#: width the worker fleet + the JVM oversubscribe the host and the
#: per-task time inflates several-fold (r13 driver scaling block:
#: media_phash_neardup 2.17 s at 32 cores vs 0.99 s at 8 — ratio
#: 0.46; media_audio_neardup 0.62).  Same remedy as the interpreted
#: shingle stages: run the stage at a fraction of defaultParallelism.
#: Env-overridable for cluster profiles; at production split counts
#: fan_out no-ops and the divisor is moot.
CODEC_STAGE_DIVISOR = int(os.environ.get("SPARK_GRAFT_CODEC_DIVISOR", "4"))


def fan_out(df: DataFrame, factor: int = 1, divisor: int = 1) -> DataFrame:
    """Round-robin repartition to ``factor * defaultParallelism //
    divisor`` when (and only when) the frame currently plans fewer
    partitions.  Pass ``divisor=INTERPRETED_STAGE_DIVISOR`` for
    allocation-heavy interpreted map stages (see the constant's note).

    The partition probe compiles the physical plan but runs no job.
    Streaming frames pass through untouched: `.rdd` is illegal on
    them, and micro-batch width is the source's concern anyway.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = max(1, sc.defaultParallelism * factor // max(1, divisor))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
